"""Incremental PQ mirror of the mutable ANN store (pipeline/pq_mirror)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline import ann as ann_ops
from same_same_spark.pipeline import ann_store, pq_mirror
from same_same_spark.pipeline.pq import pq_adc_topk, pq_encode


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _qvecs(emb, ids=(0, 1)):
    rows = (
        emb.filter(F.col("vec_id").isin(*ids))
        .select("vec_id", "embedding")
        .collect()
    )
    by_id = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    return [(int(i), by_id[i]) for i in ids]


def _norm(rows):
    return sorted(
        (r["query_id"], r["rank"], r["vec_id"], round(r["dist"], 9))
        for r in rows
    )


def _mk(spark, emb, tmp_path, split_col_mod=2):
    """Store over the even-id half + an empty mirror bound to it."""
    first = emb.filter(F.col("vec_id") % split_col_mod == 0)
    ann_dir = str(tmp_path / "ann")
    ann_store.build_ann_index(
        first, ann_dir, n_planes=8,
        centroids=ann_ops.centroids_by_label(emb),
    )
    pq_dir = str(tmp_path / "pq")
    pq_mirror.init_pq_mirror(
        spark, ann_dir, pq_dir, m=8, n_codes=8, seed=21
    )
    return ann_dir, pq_dir, first


def test_sync_then_probe_equals_direct_adc(spark, emb, tmp_path):
    ann_dir, pq_dir, first = _mk(spark, emb, tmp_path)
    rep = pq_mirror.sync_pq_mirror(
        spark, ann_dir, pq_dir, log=lambda *_: None
    )
    assert rep == {"mode": "incremental", "batches": ["base"]}
    # re-sync is a cheap no-op
    assert pq_mirror.sync_pq_mirror(
        spark, ann_dir, pq_dir, log=lambda *_: None
    )["mode"] == "noop"
    queries = _qvecs(emb)
    # probing EVERY cell == plain ADC over the same codes/codebooks
    pm = pq_mirror._load_mirror(pq_dir)
    books = pq_mirror._load_codebooks(spark, pq_dir, pm)
    got = pq_mirror.pq_mirror_topk(
        spark, ann_dir, pq_dir, queries, k=5, nprobe=10**6
    ).collect()
    want = pq_adc_topk(
        pq_encode(
            first.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("emb"),
            ),
            books, embedding_col="emb",
        ),
        books, queries, k=5,
    ).collect()
    assert _norm(got) == _norm(want)


def test_append_folds_only_the_new_batch(spark, emb, tmp_path):
    ann_dir, pq_dir, _ = _mk(spark, emb, tmp_path)
    pq_mirror.sync_pq_mirror(spark, ann_dir, pq_dir, log=lambda *_: None)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    ann_store.append_ann_index(rest, ann_dir, batch="b1")
    # appended but unsynced: bounded staleness — the probe still runs
    # over the committed batches and cannot see b1's ids yet
    queries = _qvecs(emb, ids=(1,))  # an odd id: its vector is in b1
    before = pq_mirror.pq_mirror_topk(
        spark, ann_dir, pq_dir, queries, k=5, nprobe=10**6
    ).collect()
    assert all(r["vec_id"] % 2 == 0 for r in before)
    rep = pq_mirror.sync_pq_mirror(
        spark, ann_dir, pq_dir, log=lambda *_: None
    )
    assert rep == {"mode": "incremental", "batches": ["b1"]}
    # only the new batch's partition dirs were written this sync
    gen_dir = pq_mirror._codes_dir(pq_dir, 0)
    assert sorted(
        d for d in os.listdir(gen_dir) if d.startswith("batch=")
    ) == ["batch=b1", "batch=base"]
    after = pq_mirror.pq_mirror_topk(
        spark, ann_dir, pq_dir, queries, k=5, nprobe=10**6
    ).collect()
    assert after[0]["vec_id"] == 1 and round(after[0]["dist"], 6) >= 0.0
    # lineage recorded per sync token (full batch list hashed in)
    import hashlib

    digest = hashlib.md5(b"b1").hexdigest()[:12]
    assert os.path.exists(
        os.path.join(
            pq_dir, "_lineage", f"sync-incremental-g0-{digest}.json"
        )
    )


def test_deletes_visible_before_any_sync(spark, emb, tmp_path):
    ann_dir, pq_dir, _ = _mk(spark, emb, tmp_path)
    pq_mirror.sync_pq_mirror(spark, ann_dir, pq_dir, log=lambda *_: None)
    queries = _qvecs(emb, ids=(0,))
    top = pq_mirror.pq_mirror_topk(
        spark, ann_dir, pq_dir, queries, k=3, nprobe=10**6
    ).collect()
    victim = int(top[0]["vec_id"])
    ann_store.delete_from_ann_index(spark, ann_dir, [victim])
    now = pq_mirror.pq_mirror_topk(
        spark, ann_dir, pq_dir, queries, k=3, nprobe=10**6
    ).collect()
    assert victim not in {r["vec_id"] for r in now}  # no sync needed


def test_compact_requires_resync_then_rebuilds(spark, emb, tmp_path):
    ann_dir, pq_dir, _ = _mk(spark, emb, tmp_path)
    pq_mirror.sync_pq_mirror(spark, ann_dir, pq_dir, log=lambda *_: None)
    ann_store.delete_from_ann_index(spark, ann_dir, [0, 2])
    ann_store.compact_ann_index(spark, ann_dir)
    queries = _qvecs(emb, ids=(4,))
    with pytest.raises(ValueError, match="rewritten"):
        pq_mirror.pq_mirror_topk(
            spark, ann_dir, pq_dir, queries, k=3, nprobe=10**6
        )
    rep = pq_mirror.sync_pq_mirror(
        spark, ann_dir, pq_dir, log=lambda *_: None
    )
    assert rep["mode"] == "rebuild"
    pm = pq_mirror._load_mirror(pq_dir)
    assert pm["gen"] == 1
    assert not os.path.exists(pq_mirror._codes_dir(pq_dir, 0))  # swept
    rows = pq_mirror.pq_mirror_topk(
        spark, ann_dir, pq_dir, queries, k=3, nprobe=10**6
    ).collect()
    ids = {r["vec_id"] for r in rows}
    assert rows and 0 not in ids and 2 not in ids


def test_refine_reranks_by_exact_cosine(spark, emb, tmp_path):
    ann_dir, pq_dir, first = _mk(spark, emb, tmp_path)
    pq_mirror.sync_pq_mirror(spark, ann_dir, pq_dir, log=lambda *_: None)
    queries = _qvecs(emb, ids=(0,))
    out = pq_mirror.pq_mirror_topk(
        spark, ann_dir, pq_dir, queries, k=3, nprobe=10**6, refine=True
    ).collect()
    assert out[0]["vec_id"] == 0  # exact re-rank restores the self-hit
    assert abs(out[0]["score"] - 1.0) < 1e-9
    scores = [round(r["score"], 9) for r in sorted(out, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_partition_pruned_probe_plan(spark, emb, tmp_path):
    ann_dir, pq_dir, _ = _mk(spark, emb, tmp_path)
    pq_mirror.sync_pq_mirror(spark, ann_dir, pq_dir, log=lambda *_: None)
    queries = _qvecs(emb, ids=(0,))
    df = pq_mirror.pq_mirror_topk(
        spark, ann_dir, pq_dir, queries, k=3, nprobe=2
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the code scan carries centroid_id partition filters (pruned read)
    assert "centroid_id" in plan and "PartitionFilters: []" not in plan.split(
        "parquet"
    )[0]
    rows = df.collect()
    assert 0 < len(rows) <= 3


def test_crash_window_between_write_and_flip(spark, emb, tmp_path):
    """A sync that wrote batch dirs but died before the manifest flip
    leaves the mirror serving the old view; a blind retry lands the
    batch exactly once."""
    ann_dir, pq_dir, _ = _mk(spark, emb, tmp_path)
    pq_mirror.sync_pq_mirror(spark, ann_dir, pq_dir, log=lambda *_: None)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    ann_store.append_ann_index(rest, ann_dir, batch="b1")
    # simulate the crash: run the sync, then roll the MANIFEST back
    pm_before = pq_mirror._load_mirror(pq_dir)
    pq_mirror.sync_pq_mirror(spark, ann_dir, pq_dir, log=lambda *_: None)
    pq_mirror._flip_mirror(pq_dir, pm_before)  # flip "never happened"
    queries = _qvecs(emb, ids=(1,))
    stale = pq_mirror.pq_mirror_topk(
        spark, ann_dir, pq_dir, queries, k=5, nprobe=10**6
    ).collect()
    assert all(r["vec_id"] % 2 == 0 for r in stale)  # leftovers invisible
    rep = pq_mirror.sync_pq_mirror(
        spark, ann_dir, pq_dir, log=lambda *_: None
    )
    assert rep == {"mode": "incremental", "batches": ["b1"]}
    rows = pq_mirror.pq_mirror_topk(
        spark, ann_dir, pq_dir, queries, k=5, nprobe=10**6
    ).collect()
    by_id = {}
    for r in rows:
        by_id[r["vec_id"]] = by_id.get(r["vec_id"], 0) + 1
    assert by_id.get(1) == 1  # landed exactly once, not doubled


def test_init_requires_batch_layout(spark, emb, tmp_path):
    legacy = str(tmp_path / "legacy")
    ann_store.build_ann_index(
        emb.limit(20), legacy, n_planes=8,
        centroids=ann_ops.centroids_by_label(emb),
    )
    m = ann_store._load_manifest(legacy)
    del m["batches"]
    ann_store._write_manifest(legacy, m)
    with pytest.raises(ValueError, match="batch layout"):
        pq_mirror.init_pq_mirror(spark, legacy, str(tmp_path / "pq"))


def test_noop_sync_sweeps_stale_generation(spark, emb, tmp_path):
    """A rebuild that crashed between flip and sweep leaves the old
    codes-<gen>; the next (no-op) sync must finish the sweep."""
    ann_dir, pq_dir, _ = _mk(spark, emb, tmp_path)
    pq_mirror.sync_pq_mirror(spark, ann_dir, pq_dir, log=lambda *_: None)
    ann_store.delete_from_ann_index(spark, ann_dir, [0])
    ann_store.compact_ann_index(spark, ann_dir)
    pq_mirror.sync_pq_mirror(spark, ann_dir, pq_dir, log=lambda *_: None)
    stale = pq_mirror._codes_dir(pq_dir, 0)
    os.makedirs(stale, exist_ok=True)  # resurrect: "sweep never ran"
    rep = pq_mirror.sync_pq_mirror(
        spark, ann_dir, pq_dir, log=lambda *_: None
    )
    assert rep["mode"] == "noop"
    assert not os.path.exists(stale)
