"""Differential tests for the 3-level tournament top-k
(operators/topk.topk_per_query) against a pure-Python reference under
the engine's pinned total order (round(score, 9) DESC, doc_id ASC)."""

from __future__ import annotations

import random

from same_same_spark.operators.topk import topk_per_query


def _reference_topk(rows, k):
    """(query_id, doc_id, score) rows -> {(qid, rank): (doc_id, score)}."""
    by_q: dict[int, list] = {}
    for qid, did, score in rows:
        by_q.setdefault(qid, []).append((did, score))
    out = {}
    for qid, cand in by_q.items():
        cand.sort(key=lambda t: (-round(t[1], 9), t[0]))
        for rank, (did, score) in enumerate(cand[:k], start=1):
            out[(qid, rank)] = (did, score)
    return out


def _run(spark, rows, k, parts=None, salts=32):
    df = spark.createDataFrame(
        rows, "query_id INT, doc_id LONG, score DOUBLE"
    )
    if parts:
        df = df.repartition(parts)
    want = _reference_topk(rows, k)
    for prune in (True, False):
        got = {
            (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
            for r in topk_per_query(
                df, k, salts=salts, arrow_prune=prune
            ).collect()
        }
        assert got == want, f"arrow_prune={prune}"


def test_topk_random_differential(spark):
    rng = random.Random(7)
    # duplicate scores across docs force the doc_id ASC tie-break;
    # scores differing only at the 10th decimal force the round(…, 9)
    rows = []
    for qid in range(5):
        for did in rng.sample(range(1000), 120):
            base = rng.choice([0.25, 0.5, 0.75, 1.0])
            jitter = rng.choice([0.0, 1e-10, -1e-10, 1e-6])
            rows.append((qid, did, base + jitter))
    for parts in (1, 7):
        _run(spark, rows, k=10, parts=parts)


def test_topk_k_exceeds_matches(spark):
    rows = [(0, 3, 1.0), (0, 1, 1.0), (1, 9, 0.5)]
    _run(spark, rows, k=10)


def test_topk_zero_scores_stay_positive_zero(spark):
    # 0.0 - 0.0 must sort as +0.0 (not -0.0) so zero-score docs order
    # purely by doc_id
    rows = [(0, i, 0.0) for i in (5, 2, 9, 1)]
    _run(spark, rows, k=3)


def test_topk_more_salts_than_rows(spark):
    rows = [(0, 1, 0.9), (0, 2, 0.8)]
    _run(spark, rows, k=2, salts=64)


def test_topk_null_scores_agree_across_prune_paths(spark):
    # Spark's ascending struct sort puts a NULL key FIRST (rank 1);
    # the Arrow prune must order NULLs identically or results become
    # partitioning-dependent
    rows = [(0, i, float(i)) for i in range(1, 9)]
    df = spark.createDataFrame(
        rows, "query_id INT, doc_id LONG, score DOUBLE"
    ).unionByName(
        spark.sql("SELECT 0 query_id, 99L doc_id, CAST(NULL AS DOUBLE) score")
    )
    for parts in (1, 4):
        outs = []
        for prune in (True, False):
            got = [
                (r["rank"], r["doc_id"])
                for r in topk_per_query(
                    df.repartition(parts), 3, arrow_prune=prune
                ).orderBy("rank").collect()
            ]
            outs.append(got)
        assert outs[0] == outs[1]
        assert outs[0][0] == (1, 99)  # NULL score ranks first
