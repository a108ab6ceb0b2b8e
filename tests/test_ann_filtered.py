"""Filtered k-NN: the pre-filter contract and the IVF-filtered
identity (recall governed by nprobe exactly as unfiltered)."""

from __future__ import annotations

import pytest

from same_same_spark.pipeline.ann import (
    brute_topk,
    brute_topk_filtered,
    centroids_by_label,
    ivf_topk_filtered,
)


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    )


def _key(rows):
    return sorted(
        (r["query_id"], r["vec_id"], r["rank"], round(r["score"], 9))
        for r in rows
    )


def test_prefilter_differs_from_postfilter(spark, emb):
    """The operator's reason to exist: post-filtering an unfiltered
    top-k under-returns when the filter removes top neighbors."""
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter("vec_id IN (0, 1, 2)").collect()
    ]
    pred = "label % 2 = 0"
    pre = brute_topk_filtered(emb, queries, pred, k=5).collect()
    post = [
        r
        for r in brute_topk(emb, queries, k=5).collect()
        # emulate post-filter: keep only even-label survivors
    ]
    labels = {
        int(r["vec_id"]): int(r["label"]) for r in emb.collect()
    }
    post = [r for r in post if labels[int(r["vec_id"])] % 2 == 0]
    # pre-filter always returns k rows per query (enough even-label
    # vectors exist); post-filter returns fewer for some query
    per_q_pre = {q: 0 for q, _ in queries}
    per_q_post = {q: 0 for q, _ in queries}
    for r in pre:
        per_q_pre[r["query_id"]] += 1
    for r in post:
        per_q_post[r["query_id"]] += 1
    assert all(v == 5 for v in per_q_pre.values())
    assert any(v < 5 for v in per_q_post.values())
    # every pre-filter row passes the predicate
    assert all(labels[int(r["vec_id"])] % 2 == 0 for r in pre)


def test_ivf_filtered_matches_brute_at_full_probe(spark, emb):
    """With nprobe covering every centroid the filtered IVF path is
    rank- and score-identical to filtered brute force; at nprobe=1 it
    is a subset drawn from probed cells only."""
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter("vec_id IN (0, 1)").collect()
    ]
    cents = centroids_by_label(emb)
    pred = "label >= 1"
    full = ivf_topk_filtered(
        emb, queries, cents, pred, k=5, nprobe=len(cents)
    ).collect()
    brute = brute_topk_filtered(emb, queries, pred, k=5).collect()
    assert _key(full) == _key(brute) and full

    narrow = ivf_topk_filtered(
        emb, queries, cents, pred, k=5, nprobe=1
    ).collect()
    brute_ids = {(r["query_id"], r["vec_id"]) for r in brute}
    assert len(narrow) <= len(brute)
    # rows it does return score no higher than the true best
    best = {r["query_id"]: r["score"] for r in brute if r["rank"] == 1}
    for r in narrow:
        assert r["score"] <= best[r["query_id"]] + 1e-12
