"""Similarity search: brute-force baseline, LSH, IVF."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline import ann


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _qvecs(emb, ids=(0, 1)):
    rows = emb.filter(F.col("vec_id").isin(*ids)).select("vec_id", "embedding").collect()
    by_id = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    return [(int(i), by_id[i]) for i in ids]


def test_brute_self_hit(spark, emb):
    queries = _qvecs(emb)
    out = ann.brute_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, vec in queries:
        rows = sorted(by_q[qid], key=lambda r: r["rank"])
        assert rows[0]["vec_id"] == qid  # self is the best match
        assert abs(rows[0]["score"] - 1.0) < 1e-9
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        scores = [round(r["score"], 9) for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_signature_parity(spark, emb):
    """JVM signature == driver-side numpy signature (same planes)."""
    sample = emb.limit(8).select("vec_id", "embedding").collect()
    df = spark.createDataFrame(
        [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in sample],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    got = {
        r["vec_id"]: r["sig"]
        for r in df.select(
            "vec_id", ann.signature_col(F.col("embedding"), 8).alias("sig")
        ).collect()
    }
    for r in sample:
        expected = ann._signature_py([float(x) for x in r["embedding"]], 8)
        assert got[r["vec_id"]] == expected


def test_lsh_is_subset_of_brute_with_exact_scores(spark, emb):
    queries = _qvecs(emb)
    brute = ann.brute_topk(emb, queries, k=50).collect()
    brute_scores = {(r["query_id"], r["vec_id"]): r["score"] for r in brute}
    lsh = ann.lsh_topk(emb, queries, k=10, n_planes=8, max_hamming=2).collect()
    assert len(lsh) > 0
    for r in lsh:
        key = (r["query_id"], r["vec_id"])
        if key in brute_scores:
            assert abs(r["score"] - brute_scores[key]) < 1e-12
    # the query's own vector is always in its own bucket → rank-1 self hit
    by_q = {}
    for r in lsh:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, _ in queries:
        best = min(by_q[qid], key=lambda r: r["rank"])
        assert best["vec_id"] == qid


def test_ivf_full_probe_equals_brute(spark, emb):
    queries = _qvecs(emb)
    cents = ann.centroids_by_label(emb)
    assert len(cents) >= 2
    brute = ann.brute_topk(emb, queries, k=5).collect()
    ivf = ann.ivf_topk(emb, queries, cents, k=5, nprobe=len(cents)).collect()

    def key(rows):
        return sorted(
            (r["query_id"], r["vec_id"], round(r["score"], 9), r["rank"]) for r in rows
        )

    assert key(ivf) == key(brute)


def test_ivf_partial_probe_subset(spark, emb):
    queries = _qvecs(emb, ids=(2,))
    cents = ann.centroids_by_label(emb)
    full = {r["vec_id"] for r in ann.brute_topk(emb, queries, k=500).collect()}
    part = ann.ivf_topk(emb, queries, cents, k=5, nprobe=2).collect()
    assert 0 < len(part) <= 5
    assert {r["vec_id"] for r in part} <= full


# ---------------------------------------------------------------------------
# persisted ANN store (pipeline.ann_store)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ann_dir(spark, emb, tmp_path_factory):
    from same_same_spark.pipeline import ann_store

    out = str(tmp_path_factory.mktemp("ann") / "store")
    ann_store.build_ann_index(
        emb, out, n_planes=8, centroids=ann.centroids_by_label(emb)
    )
    return out


def test_persisted_lsh_equals_querytime(spark, emb, ann_dir):
    from same_same_spark.pipeline import ann_store

    queries = _qvecs(emb)

    def key(rows):
        return sorted(
            (r["query_id"], r["vec_id"], round(r["score"], 9), r["rank"])
            for r in rows
        )

    got = ann_store.lsh_topk_persisted(
        spark, ann_dir, queries, k=10, max_hamming=1
    ).collect()
    want = ann.lsh_topk(emb, queries, k=10, n_planes=8, max_hamming=1).collect()
    assert key(got) == key(want)


def test_persisted_ivf_equals_querytime(spark, emb, ann_dir):
    from same_same_spark.pipeline import ann_store

    queries = _qvecs(emb)
    cents = ann.centroids_by_label(emb)

    def key(rows):
        return sorted(
            (r["query_id"], r["vec_id"], round(r["score"], 9), r["rank"])
            for r in rows
        )

    got = ann_store.ivf_topk_persisted(
        spark, ann_dir, queries, k=5, nprobe=3
    ).collect()
    want = ann.ivf_topk(emb, queries, cents, k=5, nprobe=3).collect()
    assert key(got) == key(want)


def test_persisted_probe_is_partition_pruned(spark, emb, ann_dir):
    """The probe scan must read only the probed sig= partitions —
    partition pruning is the whole point of persisting the structure."""
    queries = _qvecs(emb)
    from same_same_spark.pipeline import ann_store

    df = ann_store.lsh_topk_persisted(spark, ann_dir, queries, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the sig filter must appear inside PartitionFilters, not (only) as
    # a post-scan row filter
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "sig" in m.group(1)


def test_kmeans_centroids_and_ivf_recall(spark, emb, tmp_path):
    """MLlib KMeans centers drive IVF: shape sanity + recall@5 vs the
    exact brute-force baseline over all 500 vectors."""
    from same_same_spark.pipeline import ann_store

    cents = ann_store.kmeans_centroids(emb, n_centroids=8, seed=13)
    assert len(cents) == 8
    assert all(len(v) == 64 and np.isfinite(v).all() for _, v in cents)

    queries = _qvecs(emb, ids=(0, 1, 2, 3, 4))
    brute = ann.brute_topk(emb, queries, k=5).collect()
    ivf = ann.ivf_topk(emb, queries, cents, k=5, nprobe=3).collect()
    top = lambda rows: {(r["query_id"], r["vec_id"]) for r in rows}
    inter = top(ivf) & top(brute)
    recall = len(inter) / len(top(brute))
    # nprobe=3 of 8 cells: expect high recall on clustered synthetic data
    assert recall >= 0.6, f"recall@5 {recall:.2f}"


def test_persisted_kmeans_ivf_recall_meets_querytime_bound(
    spark, emb, tmp_path
):
    """VERDICT r2 #8: the PRODUCTION configuration — MLlib-KMeans
    centroids + persisted partition-pruned probes — must clear the same
    recall@5 bound the query-time KMeans path is held to, and stay
    partition-pruned while doing it."""
    import re

    from same_same_spark.pipeline import ann_store

    out = str(tmp_path / "kmeans_store")
    # centroids=None → kmeans_centroids(seeded) is the store default
    ann_store.build_ann_index(emb, out, n_planes=8, n_centroids=8, seed=13)
    queries = _qvecs(emb, ids=(0, 1, 2, 3, 4))
    brute = ann.brute_topk(emb, queries, k=5).collect()
    probe = ann_store.ivf_topk_persisted(spark, out, queries, k=5, nprobe=3)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1)  # pruned, not full-scan
    got = probe.collect()
    top = lambda rows: {(r["query_id"], r["vec_id"]) for r in rows}
    recall = len(top(got) & top(brute)) / len(top(brute))
    # same bound as test_kmeans_centroids_and_ivf_recall (nprobe=3 of 8)
    assert recall >= 0.6, f"persisted-KMeans recall@5 {recall:.2f}"


def test_persisted_ivf_probe_is_partition_pruned(spark, emb, ann_dir):
    from same_same_spark.pipeline import ann_store

    df = ann_store.ivf_topk_persisted(spark, ann_dir, _qvecs(emb), k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1)


def test_refresh_centroids_after_churn(spark, emb, tmp_path):
    """Append + delete, then re-cluster: the refreshed store's IVF
    probe equals a fresh build over the survivors with the same
    centroids (generation flip, tombstones compacted out, batch log
    preserved); a crash-window orphan generation stays invisible."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from same_same_spark.pipeline import ann as ann_ops
    from same_same_spark.pipeline import ann_store

    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    survivors = emb.filter(~F.col("vec_id").isin(2, 4))
    inc = str(tmp_path / "inc")
    ann_store.build_ann_index(
        first, inc, n_planes=8, centroids=ann_ops.centroids_by_label(first)
    )
    ann_store.append_ann_index(rest, inc, batch="b1")
    ann_store.delete_from_ann_index(spark, inc, [2, 4])

    new_cents = ann_ops.centroids_by_label(survivors)
    m = ann_store.refresh_centroids(spark, inc, centroids=new_cents)
    assert m["ivf_dir"] == "ivf-1" and m["centroids_dir"] == "centroids-1"
    assert not os.path.exists(os.path.join(inc, "ivf"))  # swept
    # tombstoned rows compacted out of the rewritten structure
    raw = spark.read.parquet(os.path.join(inc, "ivf-1"))
    assert raw.filter(F.col("vec_id").isin(2, 4)).count() == 0
    assert set(
        r["batch"] for r in raw.select("batch").distinct().collect()
    ) == {"base", "b1"}

    fresh = str(tmp_path / "fresh")
    ann_store.build_ann_index(
        survivors, fresh, n_planes=8, centroids=new_cents
    )
    queries = _qvecs(emb)
    norm = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in rows
    )
    got = ann_store.ivf_topk_persisted(spark, inc, queries, k=5, nprobe=3)
    want = ann_store.ivf_topk_persisted(spark, fresh, queries, k=5, nprobe=3)
    assert norm(got.collect()) == norm(want.collect())

    # crash window: an orphan generation without the manifest flip
    before = norm(
        ann_store.ivf_topk_persisted(spark, inc, queries, k=5).collect()
    )
    shutil.copytree(os.path.join(inc, "ivf-1"), os.path.join(inc, "ivf-2"))
    manifest = json.load(open(os.path.join(inc, "manifest.json")))
    assert manifest["ivf_dir"] == "ivf-1"
    after = norm(
        ann_store.ivf_topk_persisted(spark, inc, queries, k=5).collect()
    )
    assert before == after
