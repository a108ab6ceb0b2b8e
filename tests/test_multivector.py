"""Late-interaction MaxSim (operators/multivector.py)."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from same_same_spark.operators.multivector import maxsim_topk


def _r9(x):
    return round(x * 1e9) / 1e9


@pytest.fixture(scope="module")
def doc_vecs(spark, embeddings):
    dv = embeddings.select(
        (F.col("vec_id") / 4).cast("long").alias("doc_id"), "embedding"
    )
    rows = [
        (r["doc_id"], [float(x) for x in r["embedding"]])
        for r in dv.collect()
    ]
    return dv, rows


def test_maxsim_matches_brute(spark, doc_vecs):
    dv, rows = doc_vecs
    q0 = rows[0][1]
    q1 = rows[5][1]
    queries = [(0, [q0, q1]), (1, [q1])]
    got = maxsim_topk(dv, queries, k=6).collect()
    by_doc = collections.defaultdict(list)
    for did, vec in rows:
        by_doc[did].append(vec)
    by_q = collections.defaultdict(list)
    for r in got:
        by_q[r["query_id"]].append(r)
    for qid, qvs in queries:
        scores = {}
        for did, vecs in by_doc.items():
            s = 0.0
            for qv in qvs:
                best = max(
                    sum(a * b for a, b in zip(qv, dvv)) for dvv in vecs
                )
                s += best
            scores[did] = s
        want = sorted(scores.items(), key=lambda kv: (-_r9(kv[1]), kv[0]))[:6]
        mine = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["doc_id"] for r in mine] == [d for d, _s in want]
        for r, (_d, s) in zip(mine, want):
            assert r["score"] == pytest.approx(s, rel=1e-9)


def test_maxsim_single_vector_reduces_to_dot_ranking(spark, doc_vecs):
    dv, rows = doc_vecs
    q = rows[3][1]
    got = maxsim_topk(dv, [(0, [q])], k=5).collect()
    by_doc = collections.defaultdict(list)
    for did, vec in rows:
        by_doc[did].append(vec)
    brute = sorted(
        (
            (did, max(sum(a * b for a, b in zip(q, v)) for v in vecs))
            for did, vecs in by_doc.items()
        ),
        key=lambda kv: (-_r9(kv[1]), kv[0]),
    )[:5]
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == [
        d for d, _ in brute
    ]


def test_maxsim_dim_mismatch_contributes_zero(spark):
    dv = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (1, [0.5, 0.5, 0.0]),  # mismatched dim vs the query
            (2, [0.1, 0.1]),
        ],
        "doc_id LONG, embedding ARRAY<DOUBLE>",
    )
    got = maxsim_topk(dv, [(0, [[1.0, 1.0]])], k=5).collect()
    scores = {r["doc_id"]: r["score"] for r in got}
    # doc 1's mismatched vector scores 0; the matched one wins the max
    assert scores[1] == pytest.approx(1.0)
    assert scores[2] == pytest.approx(0.2)
    # all-mismatched doc still appears, at score 0
    only_bad = spark.createDataFrame(
        [(9, [1.0, 2.0, 3.0])], "doc_id LONG, embedding ARRAY<DOUBLE>"
    )
    got2 = maxsim_topk(only_bad, [(0, [[1.0, 1.0]])], k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in got2] == [(9, 0.0)]


def test_maxsim_validation(spark, doc_vecs):
    dv, _rows = doc_vecs
    with pytest.raises(ValueError, match="at least one vector"):
        maxsim_topk(dv, [(0, [])])


def test_maxsim_null_vectors_dropped(spark):
    dv = spark.createDataFrame(
        [(1, [1.0, 0.0]), (1, None), (2, None)],
        "doc_id LONG, embedding ARRAY<DOUBLE>",
    )
    got = maxsim_topk(dv, [(0, [[1.0, 1.0]])], k=5).collect()
    # doc 2's only vector is NULL -> absent; doc 1 scores its real one
    assert [(r["doc_id"], r["score"]) for r in got] == [(1, 1.0)]
