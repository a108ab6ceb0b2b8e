"""Temporal decay, vector search, hybrid scoring — reference parity."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from same_same_spark.operators.hybrid import HybridWeight, advanced_search
from same_same_spark.operators.temporal import (
    DECAY_LAMBDAS,
    age_col,
    apply_decay_col,
    decay_factor_col,
    resolve_doc_time,
)
from same_same_spark.operators.vector import (
    cosine_col,
    euclidean_col,
    search_by_embedding,
)

UTC = dt.timezone.utc


# ---------- vector semantics (models/vector.go + memory_test.go) ----------

def test_search_basic_orthogonal_vectors(spark):
    """memory_test.go:29-54: query [1,0,0] over orthogonal unit vectors,
    topK=2 ⇒ exactly 2 rows, v1 first."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    res = search_by_embedding(df, [1.0, 0.0, 0.0], k=2).collect()
    assert len(res) == 2
    assert res[0]["vec_id"] == 1
    assert res[0]["score"] == pytest.approx(1.0)


def test_dimension_mismatch_returns_empty(spark):
    """memory_test.go:56-71: query dim ≠ stored dim ⇒ 0 results."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    assert search_by_embedding(df, [1.0, 2.0], k=10).collect() == []


def test_cosine_zero_norm_is_zero(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"
    )
    assert df.select(cosine_col("a", "b").alias("c")).first()["c"] == 0.0


def test_cosine_and_euclidean_values(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"
    )
    row = df.select(
        cosine_col("a", "b").alias("c"), euclidean_col("a", "b").alias("e")
    ).first()
    dot = 4 + 10 + 18
    assert row["c"] == pytest.approx(dot / (math.sqrt(14) * math.sqrt(77)), abs=1e-12)
    assert row["e"] == pytest.approx(math.sqrt(27), abs=1e-12)


def test_euclidean_dim_mismatch_is_inf(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0], [1.0, 2.0, 3.0])], "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"
    )
    assert math.isinf(df.select(euclidean_col("a", "b").alias("e")).first()["e"])


def test_arrow_method_matches_builtin(spark, embeddings):
    q = embeddings.orderBy("vec_id").first()["embedding"]
    a = search_by_embedding(embeddings, q, k=10, method="builtin").collect()
    b = search_by_embedding(embeddings, q, k=10, method="arrow").collect()
    assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
    for ra, rb in zip(a, b):
        assert ra["score"] == pytest.approx(rb["score"], abs=1e-9)
    assert a[0]["vec_id"] == 0  # self-similarity wins


# ---------- temporal decay (models/temporal.go) ----------

def test_decay_factor_one_year(spark):
    """strong λ=0.5 ⇒ e^-0.5 ≈ 0.6065 after exactly one year."""
    ref = dt.datetime(2025, 1, 1, tzinfo=UTC)
    doc = ref - dt.timedelta(hours=24 * 365.25)
    df = spark.createDataFrame([(doc, ref)], "doc TIMESTAMP, ref TIMESTAMP")
    for strength, lam in DECAY_LAMBDAS.items():
        got = df.select(
            decay_factor_col(F.col("doc"), F.col("ref"), lam).alias("d")
        ).first()["d"]
        assert got == pytest.approx(math.exp(-lam), abs=1e-12), strength


def test_future_docs_do_not_decay(spark):
    ref = dt.datetime(2025, 1, 1, tzinfo=UTC)
    doc = ref + dt.timedelta(days=400)  # future (temporal.go:116-118)
    df = spark.createDataFrame([(doc, ref)], "doc TIMESTAMP, ref TIMESTAMP")
    got = df.select(
        apply_decay_col(F.lit(0.9), F.col("doc"), F.col("ref"), 0.5).alias("s")
    ).first()["s"]
    assert got == pytest.approx(0.9, abs=1e-12)


def test_resolve_doc_time_fallback_chain(spark):
    created = dt.datetime(2020, 5, 1, tzinfo=UTC)
    updated = dt.datetime(2021, 6, 1, tzinfo=UTC)
    df = spark.createDataFrame(
        [
            ({"created_at": "2019-03-01T10:00:00Z"}, created, updated),
            ({}, created, updated),
            ({"created_at": "not-a-date"}, None, updated),
        ],
        "metadata MAP<STRING,STRING>, created_at TIMESTAMP, updated_at TIMESTAMP",
    )
    got = df.select(resolve_doc_time().alias("t")).collect()
    assert got[0]["t"] == dt.datetime(2019, 3, 1, 10, 0)
    assert got[1]["t"] == dt.datetime(2020, 5, 1)
    assert got[2]["t"] == dt.datetime(2021, 6, 1)


def test_age_buckets(spark):
    ref = dt.datetime(2025, 1, 1, tzinfo=UTC)
    rows = [
        (ref - dt.timedelta(days=800), "2 years ago"),
        (ref - dt.timedelta(days=400), "1 year ago"),
        (ref - dt.timedelta(days=62), "2 months ago"),
        (ref - dt.timedelta(days=3), "3 days ago"),
        (ref - dt.timedelta(hours=5), "5 hours ago"),
        (ref - dt.timedelta(minutes=10), "just now"),
    ]
    df = spark.createDataFrame(
        [(t, ref) for t, _ in rows], "doc TIMESTAMP, ref TIMESTAMP"
    )
    got = [r["age"] for r in df.select(age_col(F.col("doc"), F.col("ref")).alias("age")).collect()]
    assert got == [want for _, want in rows]


# ---------- hybrid / advanced search ----------

def test_hybrid_weight_validation():
    HybridWeight(0.7, 0.3).validate()
    with pytest.raises(ValueError):
        HybridWeight(0.8, 0.3).validate()
    with pytest.raises(ValueError):
        HybridWeight(-0.1, 1.1).validate()


def test_advanced_search_filters_then_scores(spark, documents):
    res = advanced_search(
        documents, "fast merge join", k=5,
        filters={"lang": {"eq": "en"}},
        id_col="doc_id", text_col="text", metadata_col=None,
    )
    rows = res.collect()
    assert 0 < len(rows) <= 5
    langs = {
        r["lang"]
        for r in documents.join(
            res.select("doc_id"), "doc_id"
        ).select("lang").collect()
    }
    assert langs == {"en"}


def test_advanced_search_hybrid_blend_adds_constant(spark, documents):
    plain = advanced_search(
        documents, "fast merge join", k=5,
        filters={"lang": {"eq": "en"}},
        id_col="doc_id", text_col="text", metadata_col=None,
    ).collect()
    blended = advanced_search(
        documents, "fast merge join", k=5,
        filters={"lang": {"eq": "en"}},
        hybrid=HybridWeight(0.7, 0.3),
        id_col="doc_id", text_col="text", metadata_col=None,
    ).collect()
    # survivors all carry metadata score 1.0 ⇒ blend = 0.7·s + 0.3
    plain_by_id = {r["doc_id"]: r["score"] for r in plain}
    for r in blended:
        assert r["score"] == pytest.approx(
            0.7 * plain_by_id[r["doc_id"]] + 0.3, abs=1e-9
        )


def test_advanced_search_empty_query_raises(spark, documents):
    with pytest.raises(ValueError):
        advanced_search(documents, "", k=5, id_col="doc_id", text_col="text")


# ---------------------------------------------------------------------------
# reciprocal-rank fusion
# ---------------------------------------------------------------------------


def test_rrf_fuse_hand_case(spark):
    from same_same_spark.operators.hybrid import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id INT, doc_id LONG, rank INT",
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id INT, doc_id LONG, rank INT",
    )
    out = {r["doc_id"]: (r["rank"], r["score"])
           for r in rrf_fuse([a, b], k=4, rrf_k=60).collect()}
    # doc 11 appears in both lists -> highest fused score
    assert out[11][0] == 1
    assert abs(out[11][1] - (1 / 62 + 1 / 61)) < 1e-12
    assert out[10][0] == 2          # 1/61 beats 1/62 (doc 13) and 1/63
    assert out[13][0] == 3
    assert out[12][0] == 4
    # weights flip the order: downweight list a
    w = {r["doc_id"]: r["rank"]
         for r in rrf_fuse([a, b], k=4, weights=[0.1, 1.0]).collect()}
    assert w[13] < w[10]


def test_rrf_fuse_differential(spark):
    import random

    from same_same_spark.operators.hybrid import rrf_fuse

    rng = random.Random(3)
    lists = []
    pylists = []
    for _ in range(3):
        rows = []
        for q in range(4):
            docs = rng.sample(range(50), 10)
            rows += [(q, d, i + 1) for i, d in enumerate(docs)]
        lists.append(spark.createDataFrame(
            rows, "query_id INT, doc_id LONG, rank INT"
        ))
        pylists.append(rows)
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in rrf_fuse(lists, k=5, rrf_k=60).collect()
    }
    scores: dict[tuple[int, int], float] = {}
    for rows in pylists:
        for q, d, rk in rows:
            scores[(q, d)] = scores.get((q, d), 0.0) + 1.0 / (60 + rk)
    exp = {}
    for q in range(4):
        ranked = sorted(
            ((round(s, 9), d) for (qq, d), s in scores.items() if qq == q),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        for i, (s, d) in enumerate(ranked, start=1):
            exp[(q, i)] = (d, s)
    assert got == exp


def test_rrf_fuse_validation(spark):
    import pytest as _pytest

    from same_same_spark.operators.hybrid import rrf_fuse

    with _pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])
    a = spark.createDataFrame(
        [(0, 1, 1)], "query_id INT, doc_id LONG, rank INT"
    )
    with _pytest.raises(ValueError, match="one weight"):
        rrf_fuse([a, a], weights=[1.0])
