"""Persisted ANN index: precomputed LSH/IVF structures, pruned probes.

The query-time-only paths in :mod:`same_same_spark.pipeline.ann`
recompute signatures / centroid assignments over the full vector table
per batch — fine as correctness baselines, a full scan at 100 TB. This
module is the scale path the reference lacks entirely (its search is an
O(n) scan per query, ``internal/storage/search/search.go:16-29``):

- :func:`build_ann_index` computes each vector's sign signature and
  nearest-centroid assignment ONCE at ingest and writes two parquet
  tables **partitioned by** ``sig`` / ``centroid_id``;
- :func:`lsh_topk_persisted` / :func:`ivf_topk_persisted` answer a
  query batch by reading ONLY the partitions the query probes —
  Spark's partition pruning turns the probe into a handful of
  directory reads (asserted in ``tests/test_plans.py``), so query cost
  scales with cell size, not corpus size.

Centroids come from MLlib KMeans (:func:`kmeans_centroids`, seeded) by
default; any ``(centroid_id, vector)`` list can be supplied instead —
the oracle-checked entries feed deterministic per-label means so the
DuckDB twin can reproduce them exactly, while KMeans quality is
asserted separately via recall-vs-brute in ``tests/test_ann.py``.

The store is MUTABLE under the index's manifest-gated liveness
discipline: :func:`append_ann_index` writes a batch as new
``batch=<name>`` partition dirs then flips the manifest (crash before
the flip → probes never see it; blind retries are idempotent), and
:func:`delete_from_ann_index` tombstones ids that every probe
anti-joins out (exact — scoring never sees a deleted vector).
Re-appending live or tombstoned ids is refused loudly. Centroids are
never recomputed by append — rebuild when the data distribution
drifts, the standard IVF contract.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from same_same_spark.metrics import MetricsWindow
from same_same_spark.operators.vector import cosine_col
from same_same_spark.pipeline.ann import (
    _ranked,
    _signature_py,
    assign_centroids,
    signature_col,
)


def kmeans_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    embedding_col: str = "embedding",
    seed: int = 13,
    max_iter: int = 20,
) -> list[tuple[int, list[float]]]:
    """Seeded MLlib KMeans centers over the embedding column.

    Replaces the per-label-mean stand-in for real corpora (no labels);
    k-means|| init + Lloyd iterations, all distributed. Returns the
    same ``(centroid_id, vector)`` shape every IVF function accepts.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        array_to_vector(
            F.col(embedding_col).cast("array<double>")
        ).alias("features")
    )
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="features"
    ).fit(feat)
    return [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]


def build_ann_index(
    df: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    n_planes: int = 8,
    centroids: list[tuple[int, list[float]]] | None = None,
    n_centroids: int = 16,
    seed: int = 13,
    pq_codebooks: list[list[list[float]]] | None = None,
) -> dict:
    """Persist LSH + IVF structures for the vector table.

    Layout::

        <out>/lsh/sig=<S>/...          (vec_id, emb)   partitioned
        <out>/ivf/centroid_id=<C>/...  (vec_id, emb[, codes])
        <out>/centroids/               (centroid_id, cvec)
        <out>/codebooks/               (s, c, code)    pq only
        <out>/manifest.json

    One pass computes signatures (pure column math) and one
    broadcast-join pass assigns centroids; both writes are partitioned
    so probes prune. At 100 TB the partition count is n_planes-bounded
    (2^8 = 256 LSH cells) / n_centroids-bounded — each cell is a
    splittable parquet directory, never a single hot file.

    ``pq_codebooks`` stores PQ codes IN the IVF cells (one map-only
    encode folded into the same write — no extra pass, no join):
    :func:`pq_cell_topk` then ADC-scores probes over the compressed
    column, with optional exact re-rank against the in-cell vectors.
    One store serves cosine probes AND compressed probes, and every
    mutation (append/delete/compact/refresh) maintains the codes —
    this drops the separate PQ mirror (and its sync staleness /
    second copy) from the 100-TB serving story.
    """
    from same_same_spark.pipeline.pq import _check_codebooks, pq_encode

    spark = df.sparkSession
    e = df.select(
        F.col(id_col),
        F.col(embedding_col).cast("array<double>").alias("emb"),
    )
    if centroids is None:
        centroids = kmeans_centroids(
            e, n_centroids=n_centroids, embedding_col="emb", seed=seed
        )

    # batch is the OUTER partition level: append batches land as new
    # batch=<token> dirs, visible only once the manifest lists them —
    # the same manifest-gated liveness discipline as the index's groups
    lsh = e.withColumn("sig", signature_col(F.col("emb"), n_planes))
    assigned = assign_centroids(e, centroids, id_col=id_col, embedding_col="emb")
    if pq_codebooks is not None:
        _check_codebooks(pq_codebooks)
        assigned = pq_encode(
            assigned, pq_codebooks, id_col=id_col, embedding_col="emb",
            extra_cols=["emb", "centroid_id"],
        )
    with MetricsWindow(spark) as mw:
        lsh.withColumn("batch", F.lit("base")).write.mode(
            "overwrite"
        ).partitionBy("batch", "sig").parquet(f"{out_dir}/lsh")
        assigned.withColumn("batch", F.lit("base")).write.mode(
            "overwrite"
        ).partitionBy("batch", "centroid_id").parquet(f"{out_dir}/ivf")

    cdf = spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "centroid_id INT, cvec ARRAY<DOUBLE>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/centroids")
    if pq_codebooks is not None:
        _write_codebooks(spark, f"{out_dir}/codebooks", pq_codebooks)

    manifest = {
        "n_planes": n_planes,
        "n_centroids": len(centroids),
        "n_vectors": e.count(),
        "id_col": id_col,
        "batches": ["base"],
        "tomb_gen": 0,
    }
    if pq_codebooks is not None:
        manifest["pq"] = {
            "m": len(pq_codebooks), "n_codes": len(pq_codebooks[0]),
        }
        manifest["codebooks_dir"] = "codebooks"
    write_store_lineage(
        out_dir, "build-base",
        {"op": "build", "rows": manifest["n_vectors"], "exec": mw.totals()},
    )
    _write_manifest(out_dir, manifest)
    return manifest


def _write_codebooks(
    spark: SparkSession, path: str, codebooks: list[list[list[float]]]
) -> None:
    spark.createDataFrame(
        [
            (s, c, [float(x) for x in code])
            for s, cb in enumerate(codebooks)
            for c, code in enumerate(cb)
        ],
        "s INT, c INT, code ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _load_store_codebooks(
    spark: SparkSession, ann_dir: str, m: dict
) -> list[list[list[float]]]:
    """Codebooks of a PQ-enabled store, reassembled in (s, c) order."""
    pq = m.get("pq")
    if not pq:
        raise ValueError(
            "store has no in-cell PQ codes — build with pq_codebooks= "
            "or upgrade with attach_pq_codes"
        )
    rows = spark.read.parquet(
        f"{ann_dir}/{m.get('codebooks_dir', 'codebooks')}"
    ).collect()
    books: list[dict[int, list[float]]] = [{} for _ in range(pq["m"])]
    for r in rows:
        books[int(r["s"])][int(r["c"])] = [float(x) for x in r["code"]]
    return [[sub[c] for c in range(pq["n_codes"])] for sub in books]


def _check_batch_name(batch: str) -> None:
    """Spark percent-escapes '=', ':', '%', … in partition VALUES, so
    any such name would desync the written dir from the cleanup/read
    paths — restrict to a charset that round-trips verbatim."""
    import re

    if not batch or batch.startswith(".") or not re.fullmatch(
        r"[A-Za-z0-9_\-.]+", batch
    ):
        raise ValueError(
            f"bad batch name {batch!r} — use [A-Za-z0-9_-.], no leading dot"
        )


def _write_manifest(ann_dir: str, manifest: dict) -> None:
    tmp = os.path.join(ann_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(ann_dir, "manifest.json"))


def write_store_lineage(store_dir: str, name: str, record: dict) -> None:
    """Per-mutation lineage record (the stores' counterpart to the
    index's per-group records): ``<store>/_lineage/<name>.json``,
    written atomically BEFORE the manifest flip like every other
    commit artifact — keyed by the mutation's token/generation so a
    blind retry overwrites rather than duplicates."""
    import time

    d = os.path.join(store_dir, "_lineage")
    os.makedirs(d, exist_ok=True)
    record = dict(record, ts=time.time())
    tmp = os.path.join(d, f"{name}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(record, f, indent=2)
    os.replace(tmp, os.path.join(d, f"{name}.json"))


def append_ann_index(
    df: DataFrame,
    ann_dir: str,
    batch: str,
    embedding_col: str = "embedding",
) -> dict:
    """Append a vector batch to a persisted store — crash-safe.

    The batch writes as new ``batch=<name>`` partition dirs under both
    structures, THEN the manifest flips to list it: a crash before the
    flip leaves dirs no probe reads (probes filter to the manifest's
    batch list), and a blind retry of the same batch name first removes
    the uncommitted leftovers, then rewrites. Retrying an
    already-committed batch is a no-op (idempotent orchestrators).

    Ids must be new: appending an id that is live or tombstoned would
    serve it twice / resurrect it — both refused loudly (one broadcast
    anti-join each, batch-sized). Centroids are NOT recomputed (cells
    drift only if the data distribution does — rebuild when recall
    drops; same contract as any IVF system).
    """
    import shutil

    m = _load_manifest(ann_dir)
    if "batches" not in m:
        raise ValueError(
            "store predates the batch layout — rebuild with build_ann_index"
        )
    if batch in m["batches"]:
        return m  # committed already — idempotent retry
    _check_batch_name(batch)
    spark = df.sparkSession
    id_col = m["id_col"]
    for sub in ("lsh", "ivf"):
        shutil.rmtree(
            os.path.join(ann_dir, _sub_dir(m, sub), f"batch={batch}"),
            ignore_errors=True,
        )

    e = df.select(
        F.col(id_col),
        F.col(embedding_col).cast("array<double>").alias("emb"),
    )
    n_rows, n_ids, n_distinct = e.agg(
        F.count(F.lit(1)), F.count(id_col), F.count_distinct(id_col)
    ).first()
    if n_ids < n_rows:
        raise ValueError(f"append batch contains {n_rows - n_ids} NULL id(s)")
    if n_distinct < n_rows:
        raise ValueError(
            f"append batch contains duplicate ids "
            f"({n_rows - n_distinct} extra row(s)) — a committed duplicate "
            "would be served twice forever"
        )
    if n_rows == 0:
        # empty micro-batch (routine under foreachBatch): commit the
        # token so retries are no-ops, write nothing
        m = dict(m)
        m["batches"] = list(m["batches"]) + [batch]
        _write_manifest(ann_dir, m)
        return m
    live_ids = _live_vectors(spark, ann_dir, m, "lsh").select(id_col)
    tomb = _tomb_ids(spark, ann_dir, m)
    n_live = live_ids.join(F.broadcast(e.select(id_col)), id_col).count()
    if n_live:
        raise ValueError(f"append batch contains {n_live} id(s) already live")
    if tomb is not None:
        n_dead = tomb.join(F.broadcast(e.select(id_col)), id_col).count()
        if n_dead:
            raise ValueError(
                f"append batch contains {n_dead} tombstoned id(s) — "
                "deleted ids stay deleted until compact_ann_index "
                "folds the tombstones out (or the store is rebuilt)"
            )

    lsh = e.withColumn(
        "sig", signature_col(F.col("emb"), m["n_planes"])
    ).withColumn("batch", F.lit(batch))
    assigned = assign_centroids(
        e, _load_centroids(spark, ann_dir), id_col=id_col, embedding_col="emb"
    ).withColumn("batch", F.lit(batch))
    if m.get("pq"):
        # PQ-enabled store: the appended cells carry codes too (the
        # same map-only encode as build — appends never leave a batch
        # that pq_cell_topk can't score)
        from same_same_spark.pipeline.pq import pq_encode

        assigned = pq_encode(
            assigned, _load_store_codebooks(spark, ann_dir, m),
            id_col=id_col, embedding_col="emb",
            extra_cols=["emb", "centroid_id", "batch"],
        )
    with MetricsWindow(spark) as mw:
        lsh.write.mode("append").partitionBy("batch", "sig").parquet(
            f"{ann_dir}/{_sub_dir(m, 'lsh')}"
        )
        assigned.write.mode("append").partitionBy(
            "batch", "centroid_id"
        ).parquet(f"{ann_dir}/{_sub_dir(m, 'ivf')}")

    n_new = spark.read.parquet(
        f"{ann_dir}/{_sub_dir(m, 'lsh')}/batch={batch}"
    ).count()
    write_store_lineage(
        ann_dir, f"append-{batch}",
        {"op": "append", "batch": batch, "rows": int(n_new),
         "exec": mw.totals()},
    )
    m = dict(m)
    m["batches"] = list(m["batches"]) + [batch]
    m["n_vectors"] = int(m["n_vectors"]) + int(n_new)
    _write_manifest(ann_dir, m)
    return m


def delete_from_ann_index(
    spark: SparkSession, ann_dir: str, ids: list
) -> dict:
    """Tombstone ids — probes anti-join them out (exact: scoring never
    sees a deleted vector). One tiny parquet per generation; the
    manifest flip makes the new generation live atomically, and stale
    generations are swept after. Re-appending a tombstoned id is
    refused until :func:`compact_ann_index` folds the tombstones out
    (or the store is rebuilt)."""
    m = _load_manifest(ann_dir)
    if "batches" not in m:
        raise ValueError(
            "store predates the batch layout — rebuild with build_ann_index"
        )
    gen = int(m.get("tomb_gen") or 0) + 1
    id_col = m["id_col"]
    prev = _tomb_ids(spark, ann_dir, m)
    id_dt = spark.read.parquet(f"{ann_dir}/{_sub_dir(m, 'lsh')}").schema[
        id_col
    ].dataType.simpleString()
    new = spark.createDataFrame([(i,) for i in ids], f"{id_col} {id_dt}")
    allt = prev.unionByName(new).distinct() if prev is not None else new.distinct()
    allt.coalesce(1).write.mode("overwrite").parquet(
        f"{ann_dir}/tomb-{gen}"
    )
    m = dict(m)
    m["tomb_gen"] = gen
    _write_manifest(ann_dir, m)
    _sweep_ann_dirs(ann_dir, m)
    return m


def _tomb_ids(spark: SparkSession, ann_dir: str, m: dict) -> DataFrame | None:
    gen = int(m.get("tomb_gen") or 0)
    if not gen:
        return None
    return spark.read.parquet(f"{ann_dir}/tomb-{gen}")


def _sub_dir(m: dict, sub: str) -> str:
    """Current directory for a structure — ``ivf`` moves generations on
    centroid refresh or compaction, ``lsh`` (signature-stable) only on
    compaction."""
    if sub == "ivf":
        return m.get("ivf_dir", "ivf")
    return m.get("lsh_dir", "lsh")


def _live_vectors(
    spark: SparkSession, ann_dir: str, m: dict, sub: str
) -> DataFrame:
    """The structure's rows restricted to committed batches and live
    (non-tombstoned) ids. Batch + probe filters are both partition
    columns, so the scan stays partition-pruned."""
    v = spark.read.parquet(f"{ann_dir}/{_sub_dir(m, sub)}")
    if "batches" in m:
        v = v.filter(F.col("batch").isin(list(m["batches"])))
    tomb = _tomb_ids(spark, ann_dir, m)
    if tomb is not None:
        v = v.join(F.broadcast(tomb), m["id_col"], "left_anti")
    return v


def refresh_centroids(
    spark: SparkSession,
    ann_dir: str,
    centroids: list[tuple[int, list[float]]] | None = None,
    n_centroids: int = 16,
    seed: int = 13,
) -> dict:
    """Re-cluster and re-assign the IVF structure — the answer to
    centroid drift after many appends/deletes. New centroids (MLlib
    KMeans over the LIVE vectors by default, or caller-supplied) and
    the full re-assignment write to fresh ``ivf-<gen>`` /
    ``centroids-<gen>`` dirs, THEN the manifest flips both pointers
    atomically; stale generations are swept after. A crash mid-write
    leaves probes on the old generation. Rows keep their original
    ``batch`` value (the append log stays meaningful); tombstoned rows
    are dropped here — deletes are terminal, so the rewrite is the
    natural place to compact them out. LSH is signature-stable and
    untouched."""
    m = _load_manifest(ann_dir)
    if "batches" not in m:
        raise ValueError(
            "store predates the batch layout — rebuild with build_ann_index"
        )
    gen = int(m.get("ivf_gen", 0)) + 1
    id_col = m["id_col"]
    # carry every non-derived column through the rewrite (batch keeps
    # the append log meaningful; codes — when the store is PQ-enabled —
    # are a function of the raw vector, not of the coarse assignment,
    # so re-clustering leaves them valid verbatim)
    live = _live_vectors(spark, ann_dir, m, "ivf").drop("centroid_id")
    carry = [c for c in live.columns if c not in (id_col, "emb")]
    if centroids is None:
        centroids = kmeans_centroids(
            live, n_centroids=n_centroids, embedding_col="emb", seed=seed
        )
    assigned = assign_centroids(
        live.select(id_col, "emb"), centroids, id_col=id_col,
        embedding_col="emb",
    ).join(live.select(id_col, *carry), id_col)
    new_ivf = f"ivf-{gen}"
    new_cent = f"centroids-{gen}"
    with MetricsWindow(spark) as mw:
        assigned.write.mode("overwrite").partitionBy(
            "batch", "centroid_id"
        ).parquet(f"{ann_dir}/{new_ivf}")
    cdf = spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "centroid_id INT, cvec ARRAY<DOUBLE>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{ann_dir}/{new_cent}")
    write_store_lineage(
        ann_dir, f"refresh-{gen}",
        {"op": "refresh_centroids", "n_centroids": len(centroids),
         "exec": mw.totals()},
    )
    m = dict(m)
    m["ivf_gen"] = gen
    m["ivf_dir"] = new_ivf
    m["centroids_dir"] = new_cent
    m["n_centroids"] = len(centroids)
    _write_manifest(ann_dir, m)
    _sweep_ann_dirs(ann_dir, m)
    return m


def compact_ann_index(spark: SparkSession, ann_dir: str) -> dict:
    """Compact tombstones out of BOTH structures — the delete-heavy
    maintenance path (the LSH/IVF counterpart to
    :func:`~same_same_spark.pipeline.hnsw.repair_hnsw_store`).

    Live rows rewrite to fresh ``lsh-<gen>`` / ``ivf-<gen>`` dirs
    (rows keep their original ``batch`` and ``sig``/``centroid_id``
    partition values — the append log and probe pruning survive
    unchanged; centroids are NOT recomputed, that's
    :func:`refresh_centroids`), THEN one manifest flip moves both
    pointers and clears the tombstones atomically. One scan per
    structure: ``n_vectors`` counts the WRITTEN parquet (the repo's
    count-the-written-rows rule), not a second live scan. After
    compaction probes skip the anti-join entirely and
    previously-deleted ids may be re-appended. A crash mid-write
    leaves probes on the old generation and a retry compacts again; a
    crash between the flip and the sweep is collected by the next
    call's no-op path. Compacting a store down to zero live vectors
    is refused (an empty structure dir is unreadable — rebuild
    instead) and the empty generation dirs are removed before the
    refusal."""
    import shutil

    m = _load_manifest(ann_dir)
    if "batches" not in m:
        raise ValueError(
            "store predates the batch layout — rebuild with build_ann_index"
        )
    if not int(m.get("tomb_gen") or 0):
        # nothing tombstoned — idempotent no-op; still collect orphan
        # dirs a crash between a prior flip and its sweep left behind
        _sweep_ann_dirs(ann_dir, m)
        return m
    lsh_gen = int(m.get("lsh_gen", 0)) + 1
    ivf_gen = int(m.get("ivf_gen", 0)) + 1
    new_lsh, new_ivf = f"lsh-{lsh_gen}", f"ivf-{ivf_gen}"

    live_lsh = _live_vectors(spark, ann_dir, m, "lsh")
    n_dead = _tomb_ids(spark, ann_dir, m).count()
    with MetricsWindow(spark) as mw:
        live_lsh.write.mode("overwrite").partitionBy("batch", "sig").parquet(
            f"{ann_dir}/{new_lsh}"
        )
        _live_vectors(spark, ann_dir, m, "ivf").write.mode(
            "overwrite"
        ).partitionBy("batch", "centroid_id").parquet(f"{ann_dir}/{new_ivf}")
    # explicit schema: an all-deleted store writes zero part files and
    # a schemaless read of the empty dir would crash instead of
    # counting 0
    n_live = (
        spark.read.schema(live_lsh.schema)
        .parquet(f"{ann_dir}/{new_lsh}")
        .count()
    )
    if n_live == 0:
        for d in (new_lsh, new_ivf):
            shutil.rmtree(os.path.join(ann_dir, d), ignore_errors=True)
        raise ValueError(
            "compaction would leave the store empty — rebuild instead"
        )
    write_store_lineage(
        ann_dir, f"compact-{lsh_gen}",
        {"op": "compact", "live_rows": int(n_live),
         "tombstones_cleared": int(n_dead), "exec": mw.totals()},
    )

    m = dict(m)
    m["lsh_gen"], m["lsh_dir"] = lsh_gen, new_lsh
    m["ivf_gen"], m["ivf_dir"] = ivf_gen, new_ivf
    m["tomb_gen"] = 0
    m["n_vectors"] = int(n_live)
    _write_manifest(ann_dir, m)
    _sweep_ann_dirs(ann_dir, m)
    return m


def _sweep_ann_dirs(ann_dir: str, m: dict) -> None:
    """Remove structure/tombstone generation dirs the manifest no
    longer references — shared by every mutation's post-flip cleanup
    AND the no-op retry paths, so a crash between a flip and its sweep
    can't leak superseded dirs forever."""
    import shutil

    keep = {
        _sub_dir(m, "lsh"),
        _sub_dir(m, "ivf"),
        m.get("centroids_dir", "centroids"),
        m.get("codebooks_dir", "codebooks"),
    }
    if int(m.get("tomb_gen") or 0):
        keep.add(f"tomb-{m['tomb_gen']}")
    for d in os.listdir(ann_dir):
        if d in keep:
            continue
        if (
            d == "lsh" or d.startswith("lsh-")
            or d == "ivf" or d.startswith("ivf-")
            or d == "centroids" or d.startswith("centroids-")
            or d == "codebooks" or d.startswith("codebooks-")
            or d.startswith("tomb-")
        ):
            shutil.rmtree(os.path.join(ann_dir, d), ignore_errors=True)


# centroid tables are tiny (n_centroids × dim) and probed on every IVF
# batch — cache per (ann_dir, manifest mtime) like the index broker's
# term dictionary, with superseded keys evicted on rebuild
_CENTROID_CACHE: dict[tuple[str, float], list[tuple[int, list[float]]]] = {}


def _load_manifest(ann_dir: str) -> dict:
    with open(os.path.join(ann_dir, "manifest.json")) as f:
        return json.load(f)


def _load_centroids(
    spark: SparkSession, ann_dir: str
) -> list[tuple[int, list[float]]]:
    key = (ann_dir, os.path.getmtime(os.path.join(ann_dir, "manifest.json")))
    for stale in [k for k in _CENTROID_CACHE if k[0] == ann_dir and k != key]:
        del _CENTROID_CACHE[stale]
    if key not in _CENTROID_CACHE:
        cdir = _load_manifest(ann_dir).get("centroids_dir", "centroids")
        _CENTROID_CACHE[key] = [
            (int(r["centroid_id"]), list(r["cvec"]))
            for r in spark.read.parquet(f"{ann_dir}/{cdir}").collect()
        ]
    return _CENTROID_CACHE[key]


def _query_frame(
    spark: SparkSession, queries: list[tuple[int, list[float]]]
) -> DataFrame:
    return spark.createDataFrame(
        [(qid, [float(x) for x in vec]) for qid, vec in queries],
        "query_id INT, qvec ARRAY<DOUBLE>",
    )


def _hamming_ball(sig: int, n_planes: int, radius: int) -> list[int]:
    """All signatures within hamming ≤ radius of ``sig`` (small: the
    probe set for r=1 over 8 planes is 9 of 256 cells)."""
    out = {sig}
    frontier = {sig}
    for _ in range(radius):
        frontier = {
            s ^ (1 << p) for s in frontier for p in range(n_planes)
        }
        out |= frontier
    return sorted(out)


def lsh_topk_persisted(
    spark: SparkSession,
    ann_dir: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    max_hamming: int = 1,
) -> DataFrame:
    """LSH probe against the persisted index — a partition-pruned read.

    Per query: signature driver-side (tiny), probe cells = hamming ball
    around it; the parquet scan reads ONLY those ``sig=`` partitions.
    Result is identical to :func:`ann.lsh_topk` over the same vectors.
    """
    m = _load_manifest(ann_dir)
    n_planes, id_col = m["n_planes"], m["id_col"]
    qsigs = {qid: _signature_py(vec, n_planes) for qid, vec in queries}
    probe_cells = sorted(
        {
            s
            for qsig in qsigs.values()
            for s in _hamming_ball(qsig, n_planes, max_hamming)
        }
    )
    # (query_id, sig) probe pairs — the join re-applies the per-query
    # hamming constraint inside the pruned read
    probe_pairs = [
        (qid, s)
        for qid, qsig in qsigs.items()
        for s in _hamming_ball(qsig, n_planes, max_hamming)
    ]
    probes = spark.createDataFrame(probe_pairs, "query_id INT, sig BIGINT")

    vectors = _live_vectors(spark, ann_dir, m, "lsh").filter(
        F.col("sig").isin(probe_cells)  # partition pruning
    )
    scored = (
        vectors.join(F.broadcast(probes), "sig")
        .join(F.broadcast(_query_frame(spark, queries)), "query_id")
        .filter(F.size("emb") == F.size("qvec"))
        .select(
            "query_id",
            id_col,
            cosine_col(F.col("emb"), F.col("qvec")).alias("score"),
        )
    )
    return _ranked(scored, k, id_col)


def ivf_topk_persisted(
    spark: SparkSession,
    ann_dir: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 3,
) -> DataFrame:
    """IVF probe against the persisted index — a partition-pruned read.

    Query→centroid sims are computed driver-side over the tiny centroid
    table; the vector scan reads only the probed ``centroid_id=``
    partitions. Identical to :func:`ann.ivf_topk` with the same
    centroids.
    """
    m = _load_manifest(ann_dir)
    id_col = m["id_col"]
    cents = _load_centroids(spark, ann_dir)

    probe_pairs: list[tuple[int, int]] = []
    for qid, qvec in queries:
        q = np.asarray(qvec, dtype=np.float64)
        qn = np.linalg.norm(q)
        sims = []
        for cid, cvec in cents:
            c = np.asarray(cvec, dtype=np.float64)
            denom = qn * np.linalg.norm(c)
            sims.append(
                (round(float(q @ c / denom) if denom else 0.0, 9), -cid)
            )
        sims.sort(reverse=True)
        probe_pairs.extend((qid, -negcid) for _, negcid in sims[:nprobe])
    probes = spark.createDataFrame(probe_pairs, "query_id INT, centroid_id INT")

    vectors = _live_vectors(spark, ann_dir, m, "ivf").filter(
        F.col("centroid_id").isin(sorted({c for _, c in probe_pairs}))
    )
    scored = (
        vectors.join(F.broadcast(probes), "centroid_id")
        .join(F.broadcast(_query_frame(spark, queries)), "query_id")
        .filter(F.size("emb") == F.size("qvec"))
        .select(
            "query_id",
            id_col,
            cosine_col(F.col("emb"), F.col("qvec")).alias("score"),
        )
    )
    return _ranked(scored, k, id_col)


# ---------------------------------------------------------------------------
# In-cell PQ codes — compressed probes over the SAME mutable store
# ---------------------------------------------------------------------------


def attach_pq_codes(
    spark: SparkSession,
    ann_dir: str,
    codebooks: list[list[list[float]]],
) -> dict:
    """Upgrade an existing store in place: rewrite the live IVF
    generation with a ``codes`` column (one map-only encode pass over
    the committed batches) so :func:`pq_cell_topk` can probe it.

    Same commit shape as :func:`compact_ann_index`: new ``ivf-<gen>``
    + ``codebooks-<gen>`` dirs land first, ONE manifest flip makes
    both live, stale generations are swept after. Rows keep their
    ``batch`` / ``centroid_id`` values and tombstoned rows are copied
    verbatim (this is an encoding upgrade, not a compaction — liveness
    stays manifest-gated exactly as before). A blind retry after the
    flip is a no-op; already-PQ stores return unchanged.
    """
    from same_same_spark.pipeline.pq import _check_codebooks, pq_encode

    m = _load_manifest(ann_dir)
    if "batches" not in m:
        raise ValueError(
            "store predates the batch layout — rebuild with build_ann_index"
        )
    if m.get("pq"):
        _sweep_ann_dirs(ann_dir, m)  # collect a crashed flip's orphans
        return m
    _check_codebooks(codebooks)
    gen = int(m.get("ivf_gen", 0)) + 1
    new_ivf, new_books = f"ivf-{gen}", f"codebooks-{gen}"
    id_col = m["id_col"]

    rows = spark.read.parquet(f"{ann_dir}/{_sub_dir(m, 'ivf')}").filter(
        F.col("batch").isin(list(m["batches"]))
    )
    encoded = pq_encode(
        rows, codebooks, id_col=id_col, embedding_col="emb",
        extra_cols=["emb", "centroid_id", "batch"],
    )
    with MetricsWindow(spark) as mw:
        encoded.write.mode("overwrite").partitionBy(
            "batch", "centroid_id"
        ).parquet(f"{ann_dir}/{new_ivf}")
    _write_codebooks(spark, f"{ann_dir}/{new_books}", codebooks)
    write_store_lineage(
        ann_dir, f"attach-pq-{gen}",
        {"op": "attach_pq_codes", "m": len(codebooks),
         "n_codes": len(codebooks[0]), "exec": mw.totals()},
    )
    m = dict(m)
    m["ivf_gen"], m["ivf_dir"] = gen, new_ivf
    m["codebooks_dir"] = new_books
    m["pq"] = {"m": len(codebooks), "n_codes": len(codebooks[0])}
    _write_manifest(ann_dir, m)
    _sweep_ann_dirs(ann_dir, m)
    return m


def pq_cell_topk(
    spark: SparkSession,
    ann_dir: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 3,
    *,
    rerank: bool = False,
    refine_factor: int = 4,
) -> DataFrame:
    """ADC probe over the mutable store's own in-cell PQ codes.

    Same probe rule as the persisted IVF-PQ store and its mirror
    (:func:`~same_same_spark.pipeline.pq._probe_pairs` — ONE
    definition), same partition-pruned read as
    :func:`ivf_topk_persisted` (batch + centroid_id are partition
    columns), same bounded-tournament ranking as every top-k here.
    Appends/deletes/compaction/refresh are visible immediately — there
    is no mirror to sync. ``(query_id, id, dist, rank)`` round-9 ASC;
    with ``rerank=True`` the top ``refine_factor × k`` ADC candidates
    re-rank by exact cosine against the in-cell full-precision
    vectors: ``(query_id, id, score, rank)``.
    """
    from same_same_spark.pipeline.pq import (
        _adc_rank,
        _exact_rerank,
        _probe_pairs,
    )

    m = _load_manifest(ann_dir)
    id_col = m["id_col"]
    codebooks = _load_store_codebooks(spark, ann_dir, m)
    cents = _load_centroids(spark, ann_dir)
    probe_pairs = _probe_pairs(cents, queries, nprobe)
    probes = spark.createDataFrame(
        probe_pairs, "query_id INT, centroid_id INT"
    )
    cells = _live_vectors(spark, ann_dir, m, "ivf").filter(
        F.col("centroid_id").isin(sorted({c for _, c in probe_pairs}))
    )
    adc_k = k if not rerank else max(k, refine_factor * k)
    out = _adc_rank(
        cells.join(F.broadcast(probes), "centroid_id"),
        codebooks, queries, adc_k, id_col,
    )
    if not rerank:
        return out
    return _exact_rerank(
        spark, out, queries,
        cells.select(F.col(id_col), F.col("emb")), k, id_col,
        id_col_refine=id_col, embedding_col_refine="emb",
    )
