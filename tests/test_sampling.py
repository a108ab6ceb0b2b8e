"""Deterministic sampling: fractions, strata, split assignment."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline import sampling


def _ids(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_sample_fraction_rate_and_determinism(spark):
    df = _ids(spark)
    a = sampling.sample_fraction(df, 0.3, seed="s1")
    n1, n2 = a.count(), sampling.sample_fraction(df, 0.3, seed="s1").count()
    assert n1 == n2  # fully deterministic
    assert 0.25 < n1 / 2000 < 0.35  # ~binomial around 0.3
    # different seed → different (but similarly sized) sample
    b = sampling.sample_fraction(df, 0.3, seed="s2")
    ids_a = {r["doc_id"] for r in a.collect()}
    ids_b = {r["doc_id"] for r in b.collect()}
    assert ids_a != ids_b


def test_sample_fraction_is_nested_by_rate(spark):
    # hash thresholding ⇒ the 10% sample is a subset of the 30% sample
    df = _ids(spark)
    small = {r["doc_id"] for r in sampling.sample_fraction(df, 0.1, seed="s").collect()}
    big = {r["doc_id"] for r in sampling.sample_fraction(df, 0.3, seed="s").collect()}
    assert small <= big


def test_sample_stratified_rates(spark):
    df = _ids(spark).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("zz")
    )
    out = sampling.sample_stratified(
        df, {"en": 0.5}, strata_col="lang", seed="m"
    )
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}  # default_fraction=0 drops unlisted strata
    frac = out.count() / 1000
    assert 0.4 < frac < 0.6


def test_assign_splits_stable_under_growth(spark):
    small = sampling.assign_splits(_ids(spark, 500), seed="sp")
    big = sampling.assign_splits(_ids(spark, 2000), seed="sp")
    s = {r["doc_id"]: r["split"] for r in small.collect()}
    b = {r["doc_id"]: r["split"] for r in big.collect()}
    assert all(b[i] == s[i] for i in s)  # no doc migrates as corpus grows
    counts = {r["split"]: r["c"] for r in big.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_sampling_oracle_parity(spark):
    df = _ids(spark, 300).withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de")
    )
    got = sorted(
        r["doc_id"]
        for r in sampling.sample_stratified(
            df, {"en": 0.4, "de": 0.2}, seed="p"
        ).collect()
    )
    con = duckdb.connect()
    con.register("d", df.toPandas())
    where = sampling.sample_stratified_sql("lang", "doc_id", {"en": 0.4, "de": 0.2}, seed="p")
    oracle = sorted(r[0] for r in con.execute(f"SELECT doc_id FROM d WHERE {where}").fetchall())
    assert got == oracle  # literally the same rows in both engines

    sp = {r["doc_id"]: r["split"] for r in sampling.assign_splits(df, seed="q").collect()}
    expr = sampling.assign_splits_sql("doc_id", seed="q")
    osp = dict(con.execute(f"SELECT doc_id, {expr} FROM d").fetchall())
    assert sp == osp


def test_sampling_sql_quotes_escaped(spark):
    # stratum values and seeds containing single quotes must produce
    # valid, equivalent SQL (language/domain strata like "o'odham")
    df = _ids(spark, 120).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "o'odham").otherwise("de")
    )
    fr = {"o'odham": 0.5, "de": 0.25}
    got = sorted(
        r["doc_id"]
        for r in sampling.sample_stratified(df, fr, seed="s'd").collect()
    )
    con = duckdb.connect()
    con.register("d", df.toPandas())
    where = sampling.sample_stratified_sql("lang", "doc_id", fr, seed="s'd")
    oracle = sorted(
        r[0] for r in con.execute(f"SELECT doc_id FROM d WHERE {where}").fetchall()
    )
    assert got == oracle and got  # same rows, and the sample is non-empty


def test_sample_quota_doc_counts(spark):
    df = _ids(spark, 400).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de")
    )
    out = sampling.sample_quota(
        df, {"en": 50}, strata_col="lang", seed="q"
    )
    counts = {
        r["lang"]: r["c"]
        for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    # en capped near 50 (hash sampling: expected value, not exact);
    # de has no quota -> kept whole by default
    assert 30 <= counts["en"] <= 70 and counts["de"] == 200
    # default_keep=False drops unquoted strata entirely
    dropped = sampling.sample_quota(
        df, {"en": 50}, strata_col="lang", seed="q", default_keep=False
    )
    assert dropped.filter(F.col("lang") == "de").count() == 0
    # quota above the stratum size keeps everything (rate clamps at 1)
    all_en = sampling.sample_quota(
        df, {"en": 10_000}, strata_col="lang", seed="q"
    )
    assert all_en.filter(F.col("lang") == "en").count() == 200


def test_sample_quota_token_budget(spark):
    df = _ids(spark, 300).withColumn("lang", F.lit("en")).withColumn(
        "n_tokens", (F.col("doc_id") % 7 + 1).cast("double")
    )
    total = df.agg(F.sum("n_tokens")).collect()[0][0]
    budget = total / 4.0
    out = sampling.sample_quota(
        df, {"en": budget}, strata_col="lang", seed="t",
        weight_col="n_tokens",
    )
    kept = out.agg(F.sum("n_tokens")).collect()[0][0]
    assert budget * 0.5 <= kept <= budget * 1.6  # ~budget in expectation


def test_sample_quota_oracle_parity(spark):
    df = _ids(spark, 250).withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de")
    )
    got = sorted(
        r["doc_id"]
        for r in sampling.sample_quota(
            df, {"en": 30, "de": 40}, strata_col="lang", seed="p"
        ).collect()
    )
    con = duckdb.connect()
    con.register("d", df.toPandas())
    sql = sampling.sample_quota_sql(
        "d", {"en": 30, "de": 40}, strata_col="lang", seed="p"
    )
    oracle = sorted(r[0] for r in con.execute(sql).fetchall())
    assert got == oracle and got


def test_sample_quota_null_stratum_kept_by_default(spark):
    # NULL stratum values are "strata without a quota": kept whole by
    # default (null-safe join), dropped with default_keep=False
    df = _ids(spark, 40).withColumn(
        "lang",
        F.when(F.col("doc_id") % 2 == 0, "en").otherwise(F.lit(None)),
    )
    out = sampling.sample_quota(df, {"en": 1000}, seed="n")
    assert out.filter(F.col("lang").isNull()).count() == 20
    out2 = sampling.sample_quota(
        df, {"en": 1000}, seed="n", default_keep=False
    )
    assert out2.filter(F.col("lang").isNull()).count() == 0
    # SQL twin agrees on the null-stratum rows
    con = duckdb.connect()
    con.register("d", df.toPandas())
    sql = sampling.sample_quota_sql("d", {"en": 1000}, seed="n")
    oracle = sorted(r[0] for r in con.execute(sql).fetchall())
    assert oracle == sorted(r["doc_id"] for r in out.collect())


def test_sample_quota_null_weights_do_not_bypass_cap(spark):
    # a quoted stratum whose weights are all NULL keeps NOTHING — an
    # unverifiable budget must not silently keep the whole stratum
    df = _ids(spark, 30).withColumn("lang", F.lit("web")).withColumn(
        "n_tokens", F.lit(None).cast("double")
    )
    out = sampling.sample_quota(
        df, {"web": 1e9}, seed="w", weight_col="n_tokens"
    )
    assert out.count() == 0


def test_sample_quota_sql_rejects_expressions(spark):
    with pytest.raises(ValueError, match="bare column"):
        sampling.sample_quota_sql("d", {"en": 1}, id_col="upper(doc_id)")


def test_sampling_validation(spark):
    df = _ids(spark, 10)
    with pytest.raises(ValueError):
        sampling.sample_fraction(df, 1.5)
    with pytest.raises(ValueError):
        sampling.sample_stratified(df, {"en": -0.1})
    with pytest.raises(ValueError):
        sampling.assign_splits(df, test_frac=0.7, val_frac=0.6)


# ---------------------------------------------------------------------------
# per-domain cap over canonical URL hosts
# ---------------------------------------------------------------------------


def _host_df(spark, n_big=200, n_small=10):
    """One giant host, two small hosts (with canonicalization noise),
    plus rows no domain can be attributed to."""
    rows = []
    for i in range(n_big):
        rows.append((i, f"https://big.example.com/p/{i}"))
    for i in range(n_small):
        rows.append((1000 + i, f"HTTPS://WWW.small-a.example.org/x/{i}"))
        rows.append((2000 + i, f"https://small-b.example.org:443/y/{i}"))
    rows.append((9001, None))
    rows.append((9002, "no-scheme.example.com/path"))
    return spark.createDataFrame(rows, "doc_id LONG, url STRING")


def test_sample_host_cap_semantics(spark):
    df = _host_df(spark)
    out = sampling.sample_host_cap(df, 20, seed="hc").collect()
    by_host: dict = {}
    for r in out:
        by_host.setdefault(r["url_host"], set()).add(r["doc_id"])
    # small hosts under the cap keep EVERYTHING (rate clamps at 1),
    # canonicalization noise (WWW./:443) collapsed into the bare host
    assert len(by_host["small-a.example.org"]) == 10
    assert len(by_host["small-b.example.org"]) == 10
    # the giant host is sampled down to ~cap docs (binomial around 20)
    big = by_host["big.example.com"]
    assert 5 <= len(big) <= 45 and len(big) < 200
    # unattributable rows pass through whole: NULL url and no-authority
    assert 9001 in by_host.get(None, set())
    assert 9002 in by_host.get("", set())
    # ... and are dropped when asked
    strict = sampling.sample_host_cap(
        df, 20, seed="hc", keep_unknown=False
    ).collect()
    ids = {r["doc_id"] for r in strict}
    assert 9001 not in ids and 9002 not in ids
    # deterministic: the same call keeps literally the same rows
    again = {
        r["doc_id"]
        for r in sampling.sample_host_cap(df, 20, seed="hc").collect()
    }
    assert again == {r["doc_id"] for r in out}


def test_sample_host_cap_token_budget(spark):
    df = _host_df(spark).withColumn(
        "w", F.when(F.col("doc_id") < 1000, 100.0).otherwise(1.0)
    )
    out = sampling.sample_host_cap(df, 2000.0, seed="tb", weight_col="w")
    big = out.filter(F.col("url_host") == "big.example.com")
    kept_w = big.agg(F.sum("w")).collect()[0][0] or 0.0
    # big host totals 20_000 weight -> rate 0.1, expected kept ~2000
    assert 500 <= kept_w <= 4500
    # small hosts total 10 weight each -> kept whole
    assert out.filter(F.col("url_host") == "small-a.example.org").count() == 10


def test_sample_host_cap_growth_stability(spark):
    # growing OTHER hosts never changes an unchanged host's kept set
    small = _host_df(spark, n_big=120, n_small=5)
    big = _host_df(spark, n_big=120, n_small=40)
    kept_small = {
        r["doc_id"]
        for r in sampling.sample_host_cap(small, 15, seed="g").collect()
        if r["url_host"] == "big.example.com"
    }
    kept_big = {
        r["doc_id"]
        for r in sampling.sample_host_cap(big, 15, seed="g").collect()
        if r["url_host"] == "big.example.com"
    }
    assert kept_small == kept_big


def test_sample_host_cap_null_weights_do_not_bypass_cap(spark):
    df = _host_df(spark, n_big=30, n_small=2).withColumn(
        "w", F.lit(None).cast("double")
    )
    out = sampling.sample_host_cap(df, 1e9, seed="nw", weight_col="w")
    # every attributed host has a NULL total -> keeps nothing; the
    # unattributable rows still pass through
    assert {r["doc_id"] for r in out.collect()} == {9001, 9002}


def test_sample_host_cap_oracle_parity(spark):
    df = _host_df(spark)
    got = sorted(
        (r["doc_id"], r["url_host"])
        for r in sampling.sample_host_cap(df, 20, seed="op").collect()
    )
    con = duckdb.connect()
    con.register("d", df.toPandas())
    sql = sampling.sample_host_cap_sql("d", 20, seed="op")
    oracle = sorted(
        (r[0], r[1])
        for r in con.execute(
            f"SELECT doc_id, url_host FROM ({sql})"
        ).fetchall()
    )
    assert got == oracle and got


def test_sample_host_cap_validation(spark):
    df = _host_df(spark, n_big=3, n_small=1)
    with pytest.raises(ValueError, match=">= 0"):
        sampling.sample_host_cap(df, -1)
    with pytest.raises(ValueError, match="bare column"):
        sampling.sample_host_cap_sql("d", 1, id_col="upper(doc_id)")


def test_sample_host_cap_rejects_existing_url_host(spark):
    df = _host_df(spark, n_big=2, n_small=1).withColumn(
        "url_host", F.lit("x")
    )
    with pytest.raises(ValueError, match="url_host"):
        sampling.sample_host_cap(df, 5)


# ------------------------------------------------------------------
# language-mixture sampling (temperature + UniMax)
# ------------------------------------------------------------------

def _mix_df(spark):
    rows = []
    did = 0
    for lang, n in (("en", 400), ("fr", 80), ("de", 30), ("zh", 10)):
        for _ in range(n):
            rows.append((did, lang, 100 + (did % 7)))
            did += 1
    rows.append((did, None, 50))  # NULL stratum
    return spark.createDataFrame(
        rows, "doc_id LONG, lang STRING, n_tokens LONG"
    )


def test_temperature_rates_properties(spark):
    import math

    from same_same_spark.pipeline.sampling import mix_allocation

    df = _mix_df(spark)
    alloc = mix_allocation(df, 200.0, allocator="temperature", alpha=0.3)
    rates = {s: r for s, _t, r in alloc}
    totals = {s: t for s, t, _r in alloc}
    # low-resource strata get relatively MORE of the budget than
    # proportional sampling would give
    assert rates["zh"] > rates["en"]
    # budgets sum to <= budget (caps at 1.0 can only shrink the total)
    spent = sum(rates[s] * totals[s] for s in rates)
    assert spent <= 200.0 + 1e-6
    # alpha=1 reduces to proportional: equal rates everywhere (< 1)
    prop = mix_allocation(df, 200.0, allocator="temperature", alpha=1.0)
    prates = {s: r for s, _t, r in prop if s is not None}
    assert len(set(round(r, 12) for r in prates.values())) == 1
    # exact expected rate for zh under the pinned fold
    live = [(s, t) for s, t, _ in alloc if s is not None or True]
    z = 0.0
    for s, t, _ in alloc:
        z = z + math.pow(t, 0.3)
    want_zh = min(1.0, 200.0 * math.pow(totals["zh"], 0.3) / z / totals["zh"])
    assert rates["zh"] == want_zh


def test_unimax_waterfill_exact(spark):
    from same_same_spark.pipeline.sampling import mix_allocation

    df = _mix_df(spark)
    # budget 200 docs over totals {en:400, fr:80, de:30, zh:10, None:1}:
    # ascending [1, 10, 30, 80, 400] -> full-keep 1, 10, 30 (41 spent),
    # remaining 159 split over {fr, en}: fair 79.5 < 80 -> both capped
    alloc = mix_allocation(df, 200.0, allocator="unimax")
    rates = {s: r for s, _t, r in alloc}
    assert rates[None] == 1.0 and rates["zh"] == 1.0 and rates["de"] == 1.0
    assert rates["fr"] == (200.0 - 41.0) / 2 / 80.0
    assert rates["en"] == (200.0 - 41.0) / 2 / 400.0
    # budget >= corpus -> everything kept
    all_kept = mix_allocation(df, 10_000.0, allocator="unimax")
    assert all(r == 1.0 for _s, _t, r in all_kept)


def test_language_mix_sample_matches_rates(spark):
    from same_same_spark.pipeline.sampling import (
        hash_uniform_col,
        mix_allocation,
        sample_language_mix,
    )
    from pyspark.sql import functions as F

    df = _mix_df(spark)
    alloc = mix_allocation(df, 150.0, allocator="unimax")
    rates = {s: r for s, _t, r in alloc}
    kept = sample_language_mix(
        df, 150.0, allocator="unimax", seed="t"
    ).collect()
    u = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id", hash_uniform_col(F.col("doc_id"), "t").alias("u")
        ).collect()
    }
    want = {
        r["doc_id"]
        for r in df.collect()
        if u[r["doc_id"]] < rates[r["lang"]]
    }
    assert {r["doc_id"] for r in kept} == want
    # deterministic
    again = sample_language_mix(df, 150.0, allocator="unimax", seed="t")
    assert {r["doc_id"] for r in again.collect()} == want


def test_language_mix_validation_and_dead_strata(spark):
    import pytest as _pytest

    from same_same_spark.pipeline.sampling import (
        mix_allocation,
        sample_language_mix,
    )

    df = _mix_df(spark)
    with _pytest.raises(ValueError):
        mix_allocation(df, 0.0)
    with _pytest.raises(ValueError):
        mix_allocation(df, 10.0, allocator="nope")
    # NULL weights -> stratum rated 0, kept nothing
    from pyspark.sql import functions as F

    df2 = df.withColumn(
        "n_tokens",
        F.when(F.col("lang") == "fr", F.lit(None)).otherwise(
            F.col("n_tokens")
        ),
    )
    alloc = mix_allocation(
        df2, 1000.0, allocator="unimax", weight_col="n_tokens"
    )
    rates = {s: r for s, _t, r in alloc}
    assert rates["fr"] == 0.0
    kept = sample_language_mix(
        df2, 1000.0, allocator="unimax", weight_col="n_tokens"
    ).collect()
    assert all(r["lang"] != "fr" for r in kept)


def test_language_mix_non_string_strata(spark):
    from same_same_spark.pipeline.sampling import (
        mix_allocation,
        sample_language_mix,
    )

    rows = [(i, i % 3, 10) for i in range(90)]
    df = spark.createDataFrame(
        rows, "doc_id LONG, region INT, n_tokens LONG"
    )
    alloc = mix_allocation(
        df, 30.0, allocator="unimax", strata_col="region"
    )
    assert {s for s, _t, _r in alloc} == {0, 1, 2}
    kept = sample_language_mix(
        df, 30.0, allocator="unimax", strata_col="region", seed="i"
    ).collect()
    # int strata must join (non-zero keep; rate = 10/30 per region)
    assert 0 < len(kept) < 90
    per = {}
    for r in kept:
        per[r["region"]] = per.get(r["region"], 0) + 1
    assert set(per) <= {0, 1, 2}
