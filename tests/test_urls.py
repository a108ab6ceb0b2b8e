"""URL canonicalization: hand-pinned forms, idempotence, direct
Spark↔DuckDB parity over the rule table, URL-keyed dedup."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline.urls import (
    canonicalize_url_col,
    canonicalize_url_sql,
    dedup_by_url,
)

CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM:80/Path/?utm_source=x",
     "http://example.com/Path"),
    ("https://example.com:443/a/b/?x=1&utm_medium=m&y=2#frag",
     "https://example.com/a/b/?x=1&y=2"),
    ("https://example.com/?fbclid=abc", "https://example.com"),
    ("https://example.com/?gclid=1&msclkid=2&mc_eid=3",
     "https://example.com"),
    ("https://example.com/?utm_a=1&utm_b=2&keep=3",
     "https://example.com/?keep=3"),
    ("https://example.com/?keep=1&utm_a=2", "https://example.com/?keep=1"),
    ("  http://example.com/x  ", "http://example.com/x"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),  # real port
    ("https://example.com:80/x", "https://example.com:80/x"),  # wrong scheme
    ("example.com/path/", "example.com/path"),  # schemeless passthrough
    ("ftp://Files.Example.com/A", "ftp://files.example.com/A"),
    ("http://example.com/CaseSensitive/Path",
     "http://example.com/CaseSensitive/Path"),  # path case preserved
    ("http://example.com/", "http://example.com"),
    ("http://www.example.com", "http://example.com"),
]


def test_canonicalize_hand_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i LONG, url STRING"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonicalize_url_col("url").alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (CASES[i][0], got[i], want)


def test_canonicalize_idempotent(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i LONG, url STRING"
    )
    once = df.select("i", canonicalize_url_col("url").alias("c"))
    twice = once.select("i", canonicalize_url_col("c").alias("c2"))
    rows = once.join(twice, "i").collect()
    for r in rows:
        assert r["c"] == r["c2"]


def test_canonicalize_sql_parity(spark):
    """The DuckDB rendering of the SAME rule table must agree with the
    Spark Column chain on every fixture URL (plus NULL)."""
    raws = [raw for raw, _ in CASES]
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(raws)] + [(len(raws), None)],
        "i LONG, url STRING",
    )
    got_spark = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonicalize_url_col("url").alias("c")
        ).collect()
    }
    con = duckdb.connect()
    values = ", ".join(
        f"({i}, '{r}')" for i, r in enumerate(raws)
    ) + f", ({len(raws)}, NULL)"
    sql = (
        f"WITH d(i, url) AS (VALUES {values}) "
        f"SELECT i, {canonicalize_url_sql('url')} AS c FROM d"
    )
    got_duck = {int(i): c for i, c in con.sql(sql).fetchall()}
    assert got_spark == got_duck


def test_dedup_by_url(spark):
    rows = [
        (1, "http://www.example.com/a?utm_source=x", "first"),
        (2, "HTTP://EXAMPLE.COM:80/a", "dup of 1"),
        (3, "http://example.com/b", "unique"),
        (4, None, "null kept"),
        (5, None, "null kept too"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, url STRING, note STRING")
    out = dedup_by_url(df)
    kept = {r["doc_id"]: r["url_canonical"] for r in out.collect()}
    assert set(kept) == {1, 3, 4, 5}  # 2 deduped; NULLs never dropped
    assert kept[1] == "http://example.com/a"
    assert kept[4] is None
    assert "note" in out.columns  # payload columns survive


def test_mix_url_dedup_stage(spark):
    from same_same_spark.pipeline.mix import MixConfig, prepare_training_corpus

    rows = [
        (1, "http://www.example.com/a?utm_source=x", "body one"),
        (2, "http://example.com/a", "body two"),          # url dup of 1
        (3, "http://example.com/b", "body one"),          # text dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, url STRING, text STRING")
    cfg = MixConfig(url_col="url", exact=True)
    assert cfg.stages() == ["url_dedup", "exact_dedup"]
    out = sorted(r["doc_id"] for r in prepare_training_corpus(df, cfg).collect())
    # url dedup drops 2; exact text dedup then drops 3 (same body as 1)
    assert out == [1]
    assert "url_canonical" not in prepare_training_corpus(df, cfg).columns


def test_url_host_and_per_domain_quota(spark):
    from same_same_spark.pipeline.sampling import sample_quota
    from same_same_spark.pipeline.urls import url_host_col

    rows = [(i, f"http://WWW.site{i % 3}.com:80/p{i}?utm_s=x", f"t{i}")
            for i in range(60)] + [(60, "no-scheme", "t"), (61, None, "t")]
    df = spark.createDataFrame(rows, "doc_id LONG, url STRING, text STRING")
    hosts = df.withColumn("host", url_host_col("url"))
    got = {r["doc_id"]: r["host"] for r in hosts.collect()}
    assert got[0] == "site0.com" and got[1] == "site1.com"
    assert got[60] == "" and got[61] is None
    # per-domain doc budget (expected-rate cap, deterministic hash
    # filter): each site has 20 docs, quota 5 -> keep rate 0.25
    quotas = {f"site{i}.com": 5.0 for i in range(3)}
    capped = sample_quota(
        hosts, quotas, strata_col="host", id_col="doc_id", seed="domain",
    )
    per = {r["host"]: r["n"] for r in
           capped.groupBy("host").agg(F.count("*").alias("n")).collect()}
    for i in range(3):
        assert 0 < per[f"site{i}.com"] < 20  # reduced, not emptied
    assert per[""] == 1 and per[None] == 1  # no quota -> kept
    # deterministic: same seed, same survivors
    again = sample_quota(
        hosts, quotas, strata_col="host", id_col="doc_id", seed="domain",
    )
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
