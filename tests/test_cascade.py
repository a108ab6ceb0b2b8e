"""Tiered BQ->SQ8->exact cascade: full-width identity vs an
independent numpy brute force, subset discipline, guards, plan."""

from __future__ import annotations

import numpy as np
import pytest

from same_same_spark.pipeline.cascade import cascade_topk


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(7)
    arr = rng.uniform(-1.0, 1.0, size=(60, 8)).round(3)
    rows = [(i, [float(x) for x in arr[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    return df, arr


def _brute_l2_ranks(arr, qids, k):
    out = {}
    for q in qids:
        d = ((arr - arr[q]) ** 2).sum(axis=1)
        order = sorted(range(len(arr)), key=lambda i: (round(d[i], 9), i))
        out[q] = [(i, d[i]) for i in order[:k]]
    return out


def test_cascade_full_width_is_exact(vecs):
    """shortlist = refine = corpus size: the quantized tiers cannot
    drop anyone, so the cascade is rank-identical to brute L2
    (independent numpy re-derivation)."""
    df, arr = vecs
    queries = [(q, [float(x) for x in arr[q]]) for q in (0, 1, 2)]
    got = cascade_topk(df, queries, k=5, shortlist=60, refine=60).collect()
    want = _brute_l2_ranks(arr, [0, 1, 2], 5)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for q in (0, 1, 2):
        rows = sorted(by_q[q], key=lambda r: r.rank)
        assert [r.vec_id for r in rows] == [i for i, _ in want[q]]
        for r, (_, d) in zip(rows, want[q]):
            assert abs(r.dist - d) < 1e-9


def test_cascade_narrow_tiers_subset_and_self_hit(vecs):
    """Realistic widths: results are a subset of the corpus ids, ranks
    are 1..k, and the query's own vector (Hamming 0, SQ dist minimal)
    always survives to rank 1 with dist 0."""
    df, arr = vecs
    queries = [(3, [float(x) for x in arr[3]])]
    got = sorted(
        cascade_topk(df, queries, k=3, shortlist=12, refine=6).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in got] == [1, 2, 3]
    assert got[0].vec_id == 3 and abs(got[0].dist) < 1e-12


def test_cascade_guards(vecs):
    df, _ = vecs
    q = [(0, [0.0] * 8)]
    with pytest.raises(ValueError, match="k <= refine <= shortlist"):
        cascade_topk(df, q, k=6, shortlist=10, refine=5)
    with pytest.raises(ValueError, match="k <= refine <= shortlist"):
        cascade_topk(df, q, k=2, shortlist=5, refine=10)


def test_cascade_plan_shape(vecs):
    df, arr = vecs
    queries = [(0, [float(x) for x in arr[0]])]
    p = (
        cascade_topk(df, queries, k=3, shortlist=12, refine=6)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowExec" not in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    # shortlist/refine ids broadcast back against codes/vectors
    assert "BroadcastHashJoin" in p
