"""Ninth round-5 session agg wave: multi_terms, diversified_sampler,
date_range, change_point, frequent_pairs — python brute-force
differentials (the DuckDB twins are pinned by entry:*)."""

from __future__ import annotations

import collections
import itertools
import math

import pytest
from pyspark.sql import functions as F

from same_same_spark.text.tokenizer import tokenize_py

QUERIES = [(0, "fast merge join"), (1, "vector table index")]


@pytest.fixture(scope="module")
def doc_rows(documents):
    return [
        (r["doc_id"], r["text"], r["lang"], r["source"])
        for r in documents.select("doc_id", "text", "lang", "source").collect()
    ]


def _match_ids(doc_rows, qtext):
    terms = set(tokenize_py(qtext))
    return {
        did
        for did, text, _l, _s in doc_rows
        if terms & set(tokenize_py(text or ""))
    }


def test_multi_terms_vs_brute(spark, documents, doc_rows):
    from same_same_spark.operators.facets import multi_terms_facets

    got = multi_terms_facets(
        documents, QUERIES, ["lang", "source"], topn=4,
        id_col="doc_id", text_col="text",
    ).collect()
    by_q = collections.defaultdict(list)
    for r in got:
        by_q[r["query_id"]].append((r["rank"], r["key"], r["doc_count"]))
    for qid, qtext in QUERIES:
        ids = _match_ids(doc_rows, qtext)
        cnt = collections.Counter(
            f"{lang}|{src}"
            for did, _t, lang, src in doc_rows
            if did in ids and lang is not None and src is not None
        )
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        gotq = sorted(by_q[qid])
        assert [(k, c) for _r, k, c in gotq] == want


def test_multi_terms_null_fields_excluded(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta", "en", "web"),
            (2, "alpha beta", None, "web"),
            (3, "alpha beta", "en", None),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING",
    )
    from same_same_spark.operators.facets import multi_terms_facets

    got = multi_terms_facets(
        df, [(0, "alpha")], ["lang", "source"], topn=10,
        id_col="doc_id", text_col="text",
    ).collect()
    assert [(r["key"], r["doc_count"]) for r in got] == [("en|web", 1)]


def test_diversified_sampler_caps_per_value(spark, documents, doc_rows):
    from same_same_spark.bm25 import scored_matches
    from same_same_spark.operators.facets import (
        diversified_sampler_terms_facets,
    )

    m = 2
    shard = 15
    scored = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in scored_matches(
            documents, QUERIES, id_col="doc_id", text_col="text"
        ).collect()
    }
    source_of = {did: src for did, _t, _l, src in doc_rows}
    lang_of = {did: lang for did, _t, lang, _s in doc_rows}
    want = {}
    for qid, _qtext in QUERIES:
        rows = sorted(
            (
                (-round(s * 1e9) / 1e9, did)
                for (q, did), s in scored.items()
                if q == qid
            ),
        )
        kept, per_val = [], collections.Counter()
        for negs, did in rows:
            v = source_of[did]
            if v is not None:
                if per_val[v] >= m:
                    continue
                per_val[v] += 1
            kept.append((negs, did))
        sample = [did for _n, did in sorted(kept)[:shard]]
        cnt = collections.Counter(
            lang_of[d] for d in sample if lang_of[d] is not None
        )
        want[qid] = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = diversified_sampler_terms_facets(
        documents, QUERIES, "lang", "source",
        max_docs_per_value=m, shard_size=shard, topn=5,
        id_col="doc_id", text_col="text",
    ).collect()
    by_q = collections.defaultdict(list)
    for r in got:
        by_q[r["query_id"]].append((r["rank"], r["value"], r["doc_count"]))
    for qid, _ in QUERIES:
        assert [(v, c) for _r, v, c in sorted(by_q[qid])] == want[qid]


def test_diversified_sampler_null_dedup_bypasses_cap(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "x", "en"),
            (2, "alpha beta", "x", "en"),
            (3, "alpha", "x", "en"),
            (4, "alpha alpha", None, "fr"),
            (5, "alpha alpha alpha", None, "fr"),
        ],
        "doc_id LONG, text STRING, src STRING, lang STRING",
    )
    from same_same_spark.operators.facets import (
        diversified_sampler_terms_facets,
    )

    got = diversified_sampler_terms_facets(
        df, [(0, "alpha")], "lang", "src",
        max_docs_per_value=1, shard_size=10, topn=5,
        id_col="doc_id", text_col="text",
    ).collect()
    # src=x contributes exactly 1 doc; both NULL-src docs survive
    counts = {r["value"]: r["doc_count"] for r in got}
    assert counts == {"fr": 2, "en": 1}


def test_date_range_edges_and_zero_buckets(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-10 00:00:00"),
            (2, "2024-01-15 00:00:00"),  # exactly on edge -> upper bucket
            (3, "2024-01-20 12:00:00"),
            (4, None),
        ],
        "event_id LONG, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from same_same_spark.operators.events import date_range_buckets

    out = {
        r["bucket"]: r["doc_count"]
        for r in date_range_buckets(
            df, ["2024-01-15 00:00:00", "2024-02-01 00:00:00"]
        ).collect()
    }
    assert out == {0: 1, 1: 2, 2: 0}
    with pytest.raises(ValueError):
        date_range_buckets(df, ["2024-02-01 00:00:00", "2024-01-01 00:00:00"])


def test_change_point_step_series(spark):
    rows = [(i, 10) for i in range(10)] + [(i, 50) for i in range(10, 20)]
    df = spark.createDataFrame(rows, "bucket INT, doc_count LONG")
    from same_same_spark.operators.events import change_point

    got = change_point(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r["change_at"] == 10
    assert r["before_mean"] == 10.0 and r["after_mean"] == 50.0
    # gain at the true step: k(m1-m)^2 + (n-k)(m2-m)^2 = 10*400 + 10*400
    assert r["gain"] == pytest.approx(8000.0)


def test_change_point_vs_brute_grouped(spark):
    import random

    rng = random.Random(7)
    rows = []
    for g in ("a", "b"):
        for i in range(30):
            base = 5 if (g == "a" and i < 12) or (g == "b" and i < 20) else 25
            rows.append((g, i, base + rng.randint(0, 3)))
    df = spark.createDataFrame(rows, "g STRING, bucket INT, doc_count LONG")
    from same_same_spark.operators.events import change_point

    got = {
        r["g"]: (r["change_at"], r["before_mean"], r["after_mean"], r["gain"])
        for r in change_point(df, group_cols=["g"]).collect()
    }
    for g in ("a", "b"):
        series = [v for gg, _i, v in rows if gg == g]
        n = len(series)
        m = sum(series) / n
        best = None
        for k in range(1, n):
            m1 = sum(series[:k]) / k
            m2 = sum(series[k:]) / (n - k)
            gain = k * (m1 - m) ** 2 + (n - k) * (m2 - m) ** 2
            key = (-round(gain * 1e9) / 1e9, k)
            if best is None or key < best[0]:
                best = (key, (k, m1, m2, gain))
        k, m1, m2, gain = best[1]
        assert got[g][0] == k
        assert got[g][1] == pytest.approx(m1, abs=1e-9)
        assert got[g][2] == pytest.approx(m2, abs=1e-9)
        assert got[g][3] == pytest.approx(gain, abs=1e-6)


def test_change_point_single_bucket_emits_nothing(spark):
    df = spark.createDataFrame([(0, 5)], "bucket INT, doc_count LONG")
    from same_same_spark.operators.events import change_point

    assert change_point(df).collect() == []


def test_frequent_pairs_vs_brute(spark, documents, doc_rows):
    from same_same_spark.operators.itemsets import frequent_pairs

    min_support = 0.12
    got = frequent_pairs(
        documents, min_support, top_n=25, id_col="doc_id", text_col="text"
    ).collect()
    n = len(doc_rows)
    minsup = math.ceil(min_support * n)
    cnt = collections.Counter()
    for _did, text, _l, _s in doc_rows:
        toks = sorted(set(tokenize_py(text or "")))
        for a, b in itertools.combinations(toks, 2):
            cnt[(a, b)] += 1
    want = sorted(
        ((k, c) for k, c in cnt.items() if c >= minsup),
        key=lambda kv: (-kv[1], kv[0]),
    )[:25]
    assert [
        ((r["item_a"], r["item_b"]), r["doc_count"])
        for r in sorted(
            got, key=lambda r: (-r["doc_count"], r["item_a"], r["item_b"])
        )
    ] == want
    for r in got:
        assert r["support"] == pytest.approx(r["doc_count"] / n, abs=1e-12)


def test_frequent_pairs_validation(spark, documents):
    from same_same_spark.operators.itemsets import frequent_pairs

    with pytest.raises(ValueError):
        frequent_pairs(documents, 0.0)
    with pytest.raises(ValueError):
        frequent_pairs(documents, 0.5, top_n=0)
