"""Incremental PQ mirror of a mutable ANN store.

``ann_store.py`` owns the full-precision IVF structure and its whole
mutation matrix (append / delete / compact / refresh); ``pq.py``'s
persisted store compresses a SNAPSHOT. This module closes the gap the
pq docstring promised ("a PQ mirror re-derives … with one pq_encode
pass over the changed cells"): a codes-only mirror that tracks the
store's manifest and folds exactly what changed.

Contract — who is visible when:

- **Appends** become visible after :func:`sync_pq_mirror`, which
  encodes ONLY the new ``batch=`` partitions (a bounded pass over the
  appended vectors, never the corpus). Until then probes serve the
  mirror's committed batch list — bounded staleness, stated in the
  probe's docstring.
- **Deletes** are visible IMMEDIATELY without a sync: the probe
  anti-joins the SOURCE manifest's current tombstones (tombstone sets
  are tiny; honoring them at read time costs one broadcast). The
  mirror stores no tombstone state of its own.
- **Compaction / centroid refresh** rewrite the source's IVF structure
  wholesale (cells move, dead rows vanish, previously-deleted ids may
  re-append). The mirror detects the source's ``ivf`` directory
  generation moving and refuses to probe until a sync, which
  re-encodes everything into a new mirror generation — the honest
  cost, since the source itself just rewrote every cell.

Commit discipline mirrors the stores': codes land under
``codes-<gen>/batch=<b>/centroid_id=<c>/`` BEFORE one atomic manifest
rename; incremental folds first remove any uncommitted leftovers of
the batches they are about to write (blind-retry safe); stale
generations are swept after the flip; every mutation writes a
token-keyed lineage record.

Scale: sync cost is O(appended vectors) or O(live vectors) after a
structural rewrite — the same shapes the source's own mutations paid.
Probes read only the probed ``centroid_id=`` partitions of committed
batches (partition-pruned on both levels) and score m-byte codes, the
whole point of mirroring at 100 TB.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from same_same_spark.metrics import MetricsWindow
from same_same_spark.pipeline.ann_store import (
    _load_centroids,
    _load_manifest,
    _sub_dir,
    _tomb_ids,
    write_store_lineage,
)
from same_same_spark.pipeline.pq import (
    _adc_rank,
    _check_codebooks,
    _exact_rerank,
    pq_encode,
    train_pq_codebooks,
)

_MANIFEST = "pq_mirror.json"

__all__ = ["init_pq_mirror", "sync_pq_mirror", "pq_mirror_topk"]


def _codes_dir(pq_dir: str, gen: int) -> str:
    return os.path.join(pq_dir, f"codes-{gen:06d}")


def _load_mirror(pq_dir: str) -> dict:
    with open(os.path.join(pq_dir, _MANIFEST)) as f:
        return json.load(f)


def _flip_mirror(pq_dir: str, m: dict) -> None:
    tmp = os.path.join(pq_dir, f".{_MANIFEST}.tmp")
    with open(tmp, "w") as f:
        json.dump(m, f, indent=2)
    os.replace(tmp, os.path.join(pq_dir, _MANIFEST))


def _sweep_mirror(pq_dir: str, live_gen: int) -> None:
    for d in glob.glob(os.path.join(pq_dir, "codes-*")):
        if d != _codes_dir(pq_dir, live_gen):
            shutil.rmtree(d, ignore_errors=True)


def _load_codebooks(spark: SparkSession, pq_dir: str, pm: dict):
    rows = spark.read.parquet(os.path.join(pq_dir, "codebooks")).collect()
    books: list[dict[int, list[float]]] = [{} for _ in range(pm["m"])]
    for r in rows:
        books[int(r["s"])][int(r["c"])] = [float(x) for x in r["code"]]
    return [[sub[c] for c in range(pm["n_codes"])] for sub in books]


def init_pq_mirror(
    spark: SparkSession,
    ann_dir: str,
    pq_dir: str,
    *,
    m: int = 8,
    n_codes: int = 16,
    codebooks: list[list[list[float]]] | None = None,
    seed: int = 13,
) -> dict:
    """Create an empty mirror bound to ``ann_dir``. Codebooks train
    once here (per-subspace seeded KMeans over the store's CURRENT
    live vectors) or come from the caller; appended batches encode
    with the same books — codebook drift, like the source's centroid
    drift, means re-init (the same contract as any PQ system). The
    first :func:`sync_pq_mirror` folds every committed batch."""
    am = _load_manifest(ann_dir)
    if "batches" not in am:
        raise ValueError(
            "source store predates the batch layout — rebuild it first"
        )
    if codebooks is None:
        live = spark.read.parquet(
            f"{ann_dir}/{_sub_dir(am, 'ivf')}"
        ).filter(F.col("batch").isin(list(am["batches"])))
        tomb = _tomb_ids(spark, ann_dir, am)
        if tomb is not None:
            live = live.join(F.broadcast(tomb), am["id_col"], "left_anti")
        codebooks = train_pq_codebooks(
            live, m=m, n_codes=n_codes, embedding_col="emb", seed=seed
        )
    _check_codebooks(codebooks)
    os.makedirs(pq_dir, exist_ok=True)
    spark.createDataFrame(
        [
            (s, c, [float(x) for x in code])
            for s, cb in enumerate(codebooks)
            for c, code in enumerate(cb)
        ],
        "s INT, c INT, code ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(pq_dir, "codebooks")
    )
    mirror = {
        "source": os.path.abspath(ann_dir),
        "id_col": am["id_col"],
        "m": len(codebooks),
        "n_codes": len(codebooks[0]),
        "gen": 0,
        "batches": [],
        "src_ivf_dir": _sub_dir(am, "ivf"),
    }
    _flip_mirror(pq_dir, mirror)
    return mirror


def sync_pq_mirror(
    spark: SparkSession, ann_dir: str, pq_dir: str, log=print
) -> dict:
    """Fold source changes into the mirror.

    - new committed batches → encode ONLY those ``batch=`` partitions
      (appended into the live generation after removing any
      uncommitted leftovers of the same batches — blind-retry safe);
    - the source's ``ivf`` dir moved (compact / centroid refresh) or
      batches disappeared → re-encode every committed batch into a
      NEW generation, flip, sweep;
    - nothing changed → cheap no-op (manifest reads only).

    Returns ``{"mode": "noop"|"incremental"|"rebuild",
    "batches": [...]}``.
    """
    am = _load_manifest(ann_dir)
    pm = _load_mirror(pq_dir)
    id_col = pm["id_col"]
    src_ivf = _sub_dir(am, "ivf")
    src_batches = list(am["batches"])
    rebuilt = src_ivf != pm["src_ivf_dir"] or not set(
        pm["batches"]
    ) <= set(src_batches)
    added = [b for b in src_batches if b not in pm["batches"]]
    if not rebuilt and not added:
        # a rebuild that crashed between flip and sweep leaves a stale
        # generation; no-op retries finish the sweep (the stores' rule)
        _sweep_mirror(pq_dir, int(pm["gen"]))
        log("[pq-mirror] up to date")
        return {"mode": "noop", "batches": []}

    books = _load_codebooks(spark, pq_dir, pm)
    todo = src_batches if rebuilt else added
    gen = int(pm["gen"]) + 1 if rebuilt else int(pm["gen"])
    out_dir = _codes_dir(pq_dir, gen)
    if not rebuilt:
        # remove uncommitted leftovers of exactly the batches we are
        # about to (re)write — a crashed previous sync can't double-add
        for b in todo:
            shutil.rmtree(
                os.path.join(out_dir, f"batch={b}"), ignore_errors=True
            )

    src = spark.read.parquet(f"{ann_dir}/{src_ivf}").filter(
        F.col("batch").isin(todo)
    )
    # keep (batch, centroid_id) attached through the encode so the
    # mirror's partition values equal the source's
    keyed = src.select(id_col, "emb", "batch", "centroid_id")
    codes = pq_encode(
        keyed, books, id_col=id_col, embedding_col="emb"
    ).join(keyed.select(id_col, "batch", "centroid_id"), id_col)
    with MetricsWindow(spark) as mw:
        codes.write.mode("append" if not rebuilt else "overwrite").partitionBy(
            "batch", "centroid_id"
        ).parquet(out_dir)
    mode = "rebuild" if rebuilt else "incremental"
    # token = hash of the FULL batch list: a name-prefix truncation
    # would let two distinct syncs collide and overwrite each other's
    # lineage, breaking the one-record-per-mutation identity
    import hashlib

    digest = hashlib.md5(",".join(sorted(todo)).encode()).hexdigest()[:12]
    token = f"sync-{mode}-g{gen}-{digest}"
    write_store_lineage(
        pq_dir, token,
        {"op": f"pq_mirror_{mode}", "batches": sorted(todo),
         "exec": mw.totals()},
    )
    pm = dict(pm)
    pm.update(gen=gen, batches=src_batches, src_ivf_dir=src_ivf)
    _flip_mirror(pq_dir, pm)
    # sweep after EVERY flip: an incremental sync after a crashed
    # rebuild (flip landed, sweep didn't) must still clear the old gen
    _sweep_mirror(pq_dir, gen)
    log(f"[pq-mirror] {mode}: {sorted(todo)} (gen {gen})")
    return {"mode": mode, "batches": sorted(todo)}


def pq_mirror_topk(
    spark: SparkSession,
    ann_dir: str,
    pq_dir: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 3,
    *,
    refine: bool = False,
    refine_factor: int = 4,
) -> DataFrame:
    """Probe the mirror: query→centroid cosines pick ``nprobe`` cells
    driver-side from the SOURCE's centroid table, the code scan reads
    only those ``centroid_id=`` partitions of the mirror's committed
    batches, rows score by ADC, and the source's CURRENT tombstones
    are anti-joined out — deletes take effect before any sync.

    Serves the mirror's committed batch list (appends need a sync —
    bounded staleness by contract). Refuses when the source's IVF
    structure was rewritten under the mirror (compact / refresh):
    cell contents moved, so stale codes could resurrect deleted rows —
    run :func:`sync_pq_mirror` first. ``refine=True`` re-ranks the
    bounded ADC candidate set by exact cosine against the source's own
    full-precision rows in the probed cells."""
    from same_same_spark.pipeline.pq import _probe_pairs

    am = _load_manifest(ann_dir)
    pm = _load_mirror(pq_dir)
    src_ivf = _sub_dir(am, "ivf")
    if src_ivf != pm["src_ivf_dir"]:
        raise ValueError(
            "source IVF structure was rewritten (compact/refresh) — "
            "sync_pq_mirror before probing"
        )
    id_col = pm["id_col"]
    books = _load_codebooks(spark, pq_dir, pm)
    # the manifest's centroid generation (refresh_centroids moves it);
    # probe rule = pq.py's ONE shared definition
    probe_pairs = _probe_pairs(
        _load_centroids(spark, ann_dir), queries, nprobe
    )
    probes = spark.createDataFrame(
        probe_pairs, "query_id INT, centroid_id INT"
    )
    codes = (
        spark.read.parquet(_codes_dir(pq_dir, int(pm["gen"])))
        .filter(F.col("batch").isin(list(pm["batches"])))
        .filter(
            F.col("centroid_id").isin(sorted({c for _, c in probe_pairs}))
        )
    )
    tomb = _tomb_ids(spark, ann_dir, am)
    if tomb is not None:
        codes = codes.join(F.broadcast(tomb), id_col, "left_anti")
    adc_k = k if not refine else max(k, refine_factor * k)
    out = _adc_rank(
        codes.join(F.broadcast(probes), "centroid_id"),
        books, queries, adc_k, id_col,
    )
    if not refine:
        return out.filter(F.col("rank") <= k)
    # the candidates all live in probed cells, so the re-rank scan
    # prunes the same centroid_id partitions the code scan did
    vecs = (
        spark.read.parquet(f"{ann_dir}/{src_ivf}")
        .filter(F.col("batch").isin(list(am["batches"])))
        .filter(
            F.col("centroid_id").isin(sorted({c for _, c in probe_pairs}))
        )
    )
    if tomb is not None:
        vecs = vecs.join(F.broadcast(tomb), id_col, "left_anti")
    return _exact_rerank(
        spark, out, queries, vecs, k, id_col,
        id_col_refine=id_col, embedding_col_refine="emb",
    )
