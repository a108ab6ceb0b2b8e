"""Index mutations: tombstoned deletes over the append-only layout.

The reference mutates its store in place (``PUT/DELETE /vectors/{id}``,
``internal/handlers/vector.go:110-166``); the index here is append-only
(immutable shard groups + streamed delta compaction), so deletes are
**tombstones**: :func:`delete_docs` runs one distributed pass over the
shard table to measure exactly what the deleted docs contributed —
per-term df, doc count, total doc length — and persists a COMPLETE
artifact set into a fresh generation-named directory
(``manifest.tomb_dirname()``, e.g. ``tombstones-3``):

    <index_dir>/tombstones-G/ids/        deleted doc ids (parquet)
    <index_dir>/tombstones-G/df_delta/   (term, df_removed)
    <index_dir>/tombstones-G/stats.json  {n_removed, sum_dl_removed,
                                          n_total, sum_dl_total}

The generation is flipped by the atomic manifest rename — like
``stats_gen`` — so a crash anywhere inside a SECOND delete leaves the
first delete's artifacts being served intact (never a mixed-generation
directory; the old in-place overwrite failed exactly that way).

Query time (:mod:`same_same_spark.index.query`) then (a) drops deleted
postings at decode, and (b) recomputes N, avgdl and per-term idf from
the adjusted stats — so post-delete search is rank- AND score-identical
to a fresh build over the corpus minus the deleted docs (tested), no
shard rewrite needed. Updates = delete + re-ingest under a new doc id
(streamed delta compaction); when tombstones grow large relative to the
corpus, :func:`rewrite_touched_groups` re-compacts ONLY the shard
groups that contain tombstoned docs (O(touched groups), untouched
files left alone), and :func:`rewrite_compacted` does the full
defragmenting fold.

Scale notes: the pass is one applyInPandas over the shard table
cogrouped by bucket (the same shape as a query, touching every posting
once); the deleted-id set is broadcast via closure — bounded by delete
volume, the same budget class as the driver-side idf cache.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from same_same_spark.index import codec
from same_same_spark.index.build import IndexManifest

_TOMB_SCHEMA = (
    "term STRING, df_removed LONG, n_removed LONG, sum_dl_removed LONG, "
    "n_total LONG, sum_dl_total LONG"
)


def load_tombstones(index_dir: str) -> dict | None:
    """Tombstone artifacts, or None when the index has no deletes.

    The MANIFEST is authoritative (``has_tombstones``): compaction
    clears the flag in its atomic manifest flip, so tombstone files
    left behind by a crash mid-cleanup are ignored rather than
    double-subtracted against freshly rebuilt stats.

    Returns ``{"ids": sorted int64 ndarray, "df_delta": {term: n},
    "n_removed", "sum_dl_removed", "n_total", "sum_dl_total"}``.
    """
    manifest = IndexManifest.load(index_dir)
    if not manifest.has_tombstones:
        return None
    tomb_dir = os.path.join(index_dir, manifest.tomb_dirname())
    stats_path = os.path.join(tomb_dir, "stats.json")
    if not os.path.exists(stats_path):
        return None
    with open(stats_path) as f:
        stats = json.load(f)
    import pyarrow.parquet as pq

    ids = (
        pq.read_table(os.path.join(tomb_dir, "ids"))
        .column("doc_id")
        .to_numpy()
        .astype(np.int64)
    )
    dd = pq.read_table(os.path.join(tomb_dir, "df_delta"))
    df_delta = dict(
        zip(dd.column("term").to_pylist(), dd.column("df_removed").to_pylist())
    )
    return {"ids": np.sort(ids), "df_delta": df_delta, **stats}


def _sweep_tomb_dirs(index_dir: str, keep: str | None) -> None:
    """Remove every tombstone generation directory except ``keep``
    (a dirname, or None to remove them all). Mirrors the stats-gen
    sweep: superseded generations from crashed runs must not leak."""
    import glob as _glob
    import shutil

    candidates = _glob.glob(os.path.join(index_dir, "tombstones-*")) + [
        os.path.join(index_dir, "tombstones")
    ]
    for d in candidates:
        base = os.path.basename(d)
        if base == keep or not os.path.isdir(d):
            continue
        shutil.rmtree(d, ignore_errors=True)


def _rewrite_fn(deleted_sorted: np.ndarray):
    """Per-bucket pass: rebuild the bucket as ONE group — union doclens
    minus deleted docs, posting lists merged across groups and
    re-encoded against the new position space."""

    def rewrite(pdf):
        import pandas as pd

        from same_same_spark.index.build import _SHARD_COLS

        bucket = int(pdf["bucket"].iloc[0])
        base = {c: None for c in _SHARD_COLS}

        groups: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        input_bytes = 0
        for _, row in pdf[pdf["kind"] == "d"].iterrows():
            groups[int(row["grp"])] = (
                codec.decode_doc_ids(bytes(row["doc_bytes"]), row["n"]),
                codec.varint_decode(
                    bytes(row["tf_bytes"]), row["n"]
                ).astype(np.int64),
            )
            input_bytes += int(row["input_bytes"] or 0)

        def kept(ids: np.ndarray) -> np.ndarray:
            if not len(deleted_sorted) or not len(ids):
                return np.ones(len(ids), dtype=bool)
            p = np.searchsorted(deleted_sorted, ids)
            p[p >= len(deleted_sorted)] = len(deleted_sorted) - 1
            return deleted_sorted[p] != ids

        id_parts, dl_parts = [], []
        for ids_g, dls_g in groups.values():
            m = kept(ids_g)
            id_parts.append(ids_g[m])
            dl_parts.append(dls_g[m])
        all_ids = np.concatenate(id_parts) if id_parts else np.empty(0, np.int64)
        all_dls = np.concatenate(dl_parts) if dl_parts else np.empty(0, np.int64)
        order = np.argsort(all_ids, kind="stable")
        d_sorted = all_ids[order]
        dl_vals = all_dls[order]

        rows: list[dict] = []
        if len(d_sorted):
            rows.append(
                {
                    **base,
                    "bucket": bucket,
                    "kind": "d",
                    "n": len(d_sorted),
                    "doc_bytes": codec.encode_doc_ids(d_sorted),
                    "tf_bytes": codec.varint_encode(dl_vals.astype(np.uint64)),
                    "sum_dl": int(dl_vals.sum()),
                    "input_bytes": input_bytes,
                }
            )
        by_term: dict[str, list] = {}
        for _, row in pdf[pdf["kind"] == "p"].iterrows():
            by_term.setdefault(row["term"], []).append(row)
        for term in sorted(by_term):
            dparts, tparts = [], []
            for row in by_term[term]:
                pos, tf = codec.decode_posting_list(row)
                ids_g = groups[int(row["grp"])][0]
                d = ids_g[pos]
                m = kept(d)
                dparts.append(d[m])
                tparts.append(tf[m])
            d = np.concatenate(dparts)
            t = np.concatenate(tparts)
            if not len(d):
                continue
            o = np.argsort(d, kind="stable")
            positions = np.searchsorted(d_sorted, d[o])
            enc = codec.encode_posting_list(
                positions, t[o], dl_vals[positions]
            )
            rows.append(
                {**base, "bucket": bucket, "kind": "p", "term": term, **enc}
            )
        return pd.DataFrame(rows, columns=_SHARD_COLS)

    return rewrite


def rewrite_compacted(spark: SparkSession, index_dir: str, log=print):
    """Rewrite the index as a single fresh shard group: fold every
    group together, drop tombstoned docs for good, rebuild stats and
    the manifest, clear tombstones. The periodic maintenance pass that
    keeps delete masks and streaming-compaction group counts bounded —
    equivalent to a fresh build over the surviving corpus (tested)
    without re-reading any source text.

    Crash-safe ordering: the new group is written under a fresh name,
    stats are rebuilt, the manifest (atomic rename) flips readers to
    the new group, and only then are old group dirs and tombstones
    removed — a crash at any point leaves a readable index.
    """
    import shutil

    from same_same_spark.index.build import SHARD_SCHEMA, IndexManifest

    # consume pending committed delta batches BEFORE touching groups —
    # folding a committed delta group away would strand its unarchived
    # batches and a later fold would re-ingest them
    manifest = recover_delta_folds(spark, index_dir, log=log)
    tomb = load_tombstones(index_dir)
    deleted = tomb["ids"] if tomb is not None else np.empty(0, np.int64)

    old_groups = list(manifest.groups)
    shard_paths = [
        os.path.join(index_dir, "shards", f"group-{g}") for g in old_groups
    ]
    gen = 0
    for g in old_groups:
        if g.startswith("c"):
            gen = max(gen, int(g[1:].split("-")[0]) + 1)
    new_name = f"c{gen}-0000"
    dst = os.path.join(index_dir, "shards", f"group-{new_name}")

    rewritten = (
        spark.read.parquet(*shard_paths)
        .groupBy("bucket")
        .applyInPandas(_rewrite_fn(np.sort(deleted)), SHARD_SCHEMA)
        .withColumn("grp", F.lit(0).cast("int"))
    )
    tmp = dst + ".tmp"
    rewritten.write.mode("overwrite").parquet(tmp)
    if os.path.exists(dst):
        import shutil as _sh

        _sh.rmtree(dst)
    os.replace(tmp, dst)

    out = _finalize_groups(
        spark,
        index_dir,
        manifest,
        new_groups=[new_name],
        remove_groups=old_groups,
        lineage={
            new_name: {
                "group": new_name,
                "kind": "tombstone-compaction",
                "folded_groups": old_groups,
                "dropped_docs": int(len(deleted)),
            }
        },
    )
    log(
        f"[rewrite] folded {len(old_groups)} groups, dropped "
        f"{len(deleted)} tombstoned docs -> group {new_name}"
    )
    return out


def _finalize_groups(
    spark: SparkSession,
    index_dir: str,
    manifest,
    new_groups: list[str],
    remove_groups: list[str],
    lineage: dict[str, dict],
    keep_groups: list[str] | None = None,
    next_grp: int | None = None,
    keep_tombstones: bool = False,
):
    """Shared commit tail for EVERY group-set change (tombstone
    compactions and delta folds): rebuild stats over the surviving
    group set, write lineage, atomically flip the manifest, then remove
    superseded group dirs (and tombstones unless ``keep_tombstones``).
    Crash-safe: the versioned stats dir and lineage records land before
    the manifest rename, so until the rename readers see the old
    (groups, stats, tombstones) triple; after it, the new one.
    """
    import shutil

    groups = (keep_groups or []) + new_groups
    if groups:
        paths = [
            os.path.join(index_dir, "shards", f"group-{g}") for g in groups
        ]
        new_df = spark.read.parquet(*paths)
        drow = (
            new_df.filter(F.col("kind") == "d")
            .agg(F.sum("n").alias("n_docs"), F.sum("sum_dl").alias("sum_dl"))
            .collect()[0]
        )
        n_docs = int(drow["n_docs"] or 0)
        sum_dl = int(drow["sum_dl"] or 0)
        avgdl = float(sum_dl) / n_docs if n_docs else 0.0
        term_stats = (
            new_df.filter(F.col("kind") == "p")
            .groupBy("term")
            .agg(F.sum("n").alias("df"))
            .withColumn(
                "idf",
                F.log(
                    1.0
                    + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ),
            )
        )
    else:
        # every document tombstoned: empty but valid (and searchable
        # as empty) index — stats must be rewritten too, not left stale
        n_docs, avgdl, sum_dl = 0, 0.0, 0
        term_stats = spark.createDataFrame(
            [], "term STRING, df LONG, idf DOUBLE"
        )
    # versioned stats: new generation written first; the manifest
    # rename below flips readers to (new groups, new stats, tombstones
    # cleared) in ONE atomic step
    new_stats_gen = manifest.stats_gen + 1
    stats_dir = os.path.join(index_dir, f"stats-{new_stats_gen}")
    stats_tmp = stats_dir + ".tmp"
    term_stats.repartition(1).write.mode("overwrite").parquet(stats_tmp)
    shutil.rmtree(stats_dir, ignore_errors=True)
    os.replace(stats_tmp, stats_dir)
    srow = (
        spark.read.parquet(stats_dir)
        .agg(F.count(F.lit(1)), F.sum("df"))
        .collect()[0]
    )
    # lineage records land before the flip — for delta folds they are
    # the durable marker that the new group covers its source batches
    lineage_dir = os.path.join(index_dir, "_lineage")
    os.makedirs(lineage_dir, exist_ok=True)
    for name, rec in lineage.items():
        rec = dict(rec)
        rec.setdefault("docs", n_docs)
        tmpf = os.path.join(lineage_dir, f"group-{name}.json.tmp")
        with open(tmpf, "w") as f:
            json.dump(rec, f)
        os.replace(tmpf, os.path.join(lineage_dir, f"group-{name}.json"))
    out = IndexManifest(
        n_docs=n_docs,
        avgdl=avgdl,
        k1=manifest.k1,
        b=manifest.b,
        num_buckets=manifest.num_buckets,
        n_terms=int(srow[0]),
        n_postings=int(srow[1] or 0),
        groups=groups,
        next_grp=manifest.alloc_grp() if next_grp is None else next_grp,
        stats_gen=new_stats_gen,
        has_tombstones=manifest.has_tombstones if keep_tombstones else False,
        tomb_gen=manifest.tomb_gen,
        sum_dl=sum_dl,
    )
    out.save(index_dir)  # atomic flip: readers now see the new group set
    if not keep_tombstones:
        _sweep_tomb_dirs(index_dir, keep=None)
    # sweep EVERY superseded stats generation, not just the immediate
    # predecessor — a crash between a past flip and its cleanup would
    # otherwise leak that generation forever
    import glob as _glob

    for d in _glob.glob(os.path.join(index_dir, "stats-*")):
        base = os.path.basename(d)
        if base.endswith(".tmp"):
            continue
        try:
            gen = int(base.split("-", 1)[1])
        except ValueError:
            continue
        if gen < new_stats_gen:
            shutil.rmtree(d, ignore_errors=True)
    if new_stats_gen > 0:
        shutil.rmtree(os.path.join(index_dir, "stats"), ignore_errors=True)
    for g in remove_groups:
        shutil.rmtree(
            os.path.join(index_dir, "shards", f"group-{g}"),
            ignore_errors=True,
        )
    return out


def _probe_fn(deleted_sorted: np.ndarray):
    """Doclens-only pass: how many tombstoned docs live in each shard
    row's group? Decodes doc arrays only — never postings."""

    def probe(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                ids_g = codec.decode_doc_ids(
                    bytes(row["doc_bytes"]), row["n"]
                )
                p = np.searchsorted(ids_g, deleted_sorted)
                valid = p < len(ids_g)
                hits = int(
                    (ids_g[p[valid]] == deleted_sorted[valid]).sum()
                )
                out.append((row["path"], hits, int(row["n"])))
            yield pd.DataFrame(out, columns=["path", "hits", "n_docs"])

    return probe


def rewrite_touched_groups(spark: SparkSession, index_dir: str, log=print):
    """Incremental tombstone compaction: rewrite ONLY the shard groups
    that actually contain tombstoned docs, leaving every clean group's
    files untouched.

    A document lives in exactly one ``(bucket, group)``, so deletes
    concentrated in a few ingestion batches (the common case: retention
    windows, bad-batch rollbacks) touch few groups — rewriting those
    alone turns compaction cost from O(index) into O(touched groups).
    The probe pass decodes doclens arrays only (≈8 bytes/doc, no
    posting bytes); each touched group is then rebuilt through the same
    :func:`_rewrite_fn` as the full fold, keeping its original ``grp``
    int so untouched groups' position spaces stay valid.

    Same crash-safe ordering as :func:`rewrite_compacted`: new dirs are
    written and renamed first, the manifest flip is atomic, and old
    dirs + tombstones are removed only after the flip. Equivalent to a
    fresh build over the surviving corpus (tested).
    """
    import shutil

    from same_same_spark.index.build import SHARD_SCHEMA, IndexManifest

    # consume pending committed delta batches first (see
    # recover_delta_folds: group renames would strand them)
    manifest = recover_delta_folds(spark, index_dir, log=log)
    tomb = load_tombstones(index_dir)
    if tomb is None:
        log("[rewrite] no tombstones — nothing to do")
        return manifest
    if not tomb["n_removed"]:
        # tombstone records exist but matched nothing — clear them.
        # Flag first (atomic manifest save), then files; the save also
        # bumps the mtime that keys the query-side caches.
        manifest.has_tombstones = False
        manifest.save(index_dir)
        _sweep_tomb_dirs(index_dir, keep=None)
        log("[rewrite] tombstones matched no documents — cleared")
        return manifest
    deleted_sorted = np.sort(np.asarray(tomb["ids"], dtype=np.int64))

    # 1. probe: per-group tombstone counts from doclens rows only
    shard_root = os.path.join(index_dir, "shards")
    paths = [os.path.join(shard_root, f"group-{g}") for g in manifest.groups]
    probe_rows = (
        spark.read.parquet(*paths)
        .filter(F.col("kind") == "d")
        .select("n", "doc_bytes", F.input_file_name().alias("path"))
        .mapInPandas(
            _probe_fn(deleted_sorted), "path STRING, hits LONG, n_docs LONG"
        )
        .groupBy("path")
        .agg(F.sum("hits").alias("hits"), F.sum("n_docs").alias("n_docs"))
        .collect()
    )
    hits_by_group: dict[str, int] = {}
    docs_by_group: dict[str, int] = {}
    for r in probe_rows:
        # parquet part files sit directly under .../shards/group-NAME/;
        # parse from the file's parent dir (an index_dir containing
        # '/group-' elsewhere must not confuse the mapping)
        parent = os.path.basename(os.path.dirname(r["path"]))
        name = parent[len("group-"):]
        hits_by_group[name] = hits_by_group.get(name, 0) + int(r["hits"])
        docs_by_group[name] = docs_by_group.get(name, 0) + int(r["n_docs"])
    touched = sorted(g for g in manifest.groups if hits_by_group.get(g, 0))
    kept = [g for g in manifest.groups if g not in set(touched)]
    if not touched:
        # tombstoned ids not present in any group (already gone)
        manifest.has_tombstones = False
        manifest.save(index_dir)  # flag + mtime bump -> caches refresh
        _sweep_tomb_dirs(index_dir, keep=None)
        return manifest

    # 2. rewrite each touched group in place-by-name-bump, keeping grp
    gen = 0
    for g in manifest.groups:
        if g.startswith("c"):
            gen = max(gen, int(g[1:].split("-")[0]) + 1)
    new_names: list[str] = []
    lineage: dict[str, dict] = {}
    seq = 0
    for g in touched:
        # a group whose EVERY doc is tombstoned needs no rewrite at all
        # (the probe already knows its doc count) — just drop it
        if hits_by_group[g] >= docs_by_group.get(g, 0):
            log(f"[rewrite] group {g} fully tombstoned — dropped")
            continue
        src = os.path.join(shard_root, f"group-{g}")
        src_df = spark.read.parquet(src)
        gi = src_df.select("grp").first()["grp"]
        rewritten = (
            src_df.groupBy("bucket")
            .applyInPandas(_rewrite_fn(deleted_sorted), SHARD_SCHEMA)
            .withColumn("grp", F.lit(int(gi)).cast("int"))
        )
        new_name = f"c{gen}-{seq:04d}"
        seq += 1
        dst = os.path.join(shard_root, f"group-{new_name}")
        tmp = dst + ".tmp"
        rewritten.write.mode("overwrite").parquet(tmp)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        os.replace(tmp, dst)
        new_names.append(new_name)
        lineage[new_name] = {
            "group": new_name,
            "kind": "tombstone-compaction-incremental",
            "rewritten_from": g,
            "dropped_docs": int(hits_by_group[g]),
        }

    out = _finalize_groups(
        spark,
        index_dir,
        manifest,
        new_groups=new_names,
        remove_groups=touched,
        lineage=lineage,
        keep_groups=kept,
    )
    log(
        f"[rewrite] incremental: {len(touched)}/{len(manifest.groups)} "
        f"groups rewritten ({len(kept)} untouched), dropped "
        f"{int(tomb['n_removed'])} tombstoned docs"
    )
    return out


def _measure_fn(deleted_sorted: np.ndarray):
    """Per-bucket pass: what do the deleted docs contribute?"""

    def measure(pdf):
        import pandas as pd

        term_rows: list[tuple] = []
        n_rem = dl_rem = n_tot = dl_tot = 0
        # group position spaces first ('d' rows), then posting rows
        del_pos: dict[int, np.ndarray] = {}
        for _, row in pdf[pdf["kind"] == "d"].iterrows():
            ids_g = codec.decode_doc_ids(bytes(row["doc_bytes"]), row["n"])
            dls_g = codec.varint_decode(
                bytes(row["tf_bytes"]), row["n"]
            ).astype(np.int64)
            p = np.searchsorted(ids_g, deleted_sorted)
            valid = p < len(ids_g)
            p = p[valid]
            p = p[ids_g[p] == deleted_sorted[valid]]
            del_pos[int(row["grp"])] = p
            n_tot += int(row["n"])
            dl_tot += int(row["sum_dl"])
            n_rem += len(p)
            dl_rem += int(dls_g[p].sum())
        for _, row in pdf[pdf["kind"] == "p"].iterrows():
            dp = del_pos.get(int(row["grp"]))
            if dp is None or len(dp) == 0:
                continue
            pos, _tf = codec.decode_posting_list(row)
            idx = np.searchsorted(dp, pos)
            idx[idx >= len(dp)] = len(dp) - 1
            hits = int((dp[idx] == pos).sum())
            if hits:
                term_rows.append((row["term"], hits, 0, 0, 0, 0))
        term_rows.append((None, 0, n_rem, dl_rem, n_tot, dl_tot))
        return pd.DataFrame(
            term_rows,
            columns=[
                "term", "df_removed", "n_removed", "sum_dl_removed",
                "n_total", "sum_dl_total",
            ],
        )

    return measure


def delete_docs(
    spark: SparkSession, index_dir: str, doc_ids, log=print
) -> dict:
    """Tombstone ``doc_ids`` (idempotent: re-measures the union of all
    tombstoned ids in one distributed pass) and refresh the artifacts.
    Returns the loaded tombstone dict."""
    manifest = IndexManifest.load(index_dir)
    prior = load_tombstones(index_dir)
    all_ids = np.unique(
        np.concatenate(
            [
                np.asarray(list(doc_ids), dtype=np.int64),
                prior["ids"] if prior is not None else np.empty(0, np.int64),
            ]
        )
    )

    shard_paths = [
        os.path.join(index_dir, "shards", f"group-{g}")
        for g in manifest.groups
    ]
    measured = (
        spark.read.parquet(*shard_paths)
        .groupBy("bucket")
        .applyInPandas(_measure_fn(all_ids), _TOMB_SCHEMA)
        .groupBy("term")
        .agg(
            F.sum("df_removed").alias("df_removed"),
            F.sum("n_removed").alias("n_removed"),
            F.sum("sum_dl_removed").alias("sum_dl_removed"),
            F.sum("n_total").alias("n_total"),
            F.sum("sum_dl_total").alias("sum_dl_total"),
        )
    )

    # generation-versioned artifact set: EVERYTHING lands in a fresh
    # tombstones-{gen} directory (staged via .tmp + atomic dir rename)
    # and only the manifest save below points readers at it — so a
    # crash anywhere inside a repeat delete keeps serving the previous
    # generation complete, never a half-overwritten mix.
    import shutil

    new_gen = manifest.tomb_gen + 1
    tomb_dir = os.path.join(index_dir, f"tombstones-{new_gen}")
    tomb_tmp = tomb_dir + ".tmp"
    shutil.rmtree(tomb_tmp, ignore_errors=True)
    # a same-named dir from a crash after the rename but before the
    # manifest save is unreferenced garbage — replace it
    shutil.rmtree(tomb_dir, ignore_errors=True)
    os.makedirs(tomb_tmp)
    df_delta = measured.filter(
        F.col("term").isNotNull() & (F.col("df_removed") > 0)
    ).select("term", "df_removed")
    df_delta.repartition(1).write.mode("overwrite").parquet(
        os.path.join(tomb_tmp, "df_delta")
    )
    ids_df = spark.createDataFrame(
        [(int(i),) for i in all_ids], "doc_id LONG"
    )
    ids_df.repartition(1).write.mode("overwrite").parquet(
        os.path.join(tomb_tmp, "ids")
    )
    srow = (
        measured.filter(F.col("term").isNull())
        .agg(
            F.sum("n_removed"), F.sum("sum_dl_removed"),
            F.sum("n_total"), F.sum("sum_dl_total"),
        )
        .collect()[0]
    )
    stats = {
        "n_removed": int(srow[0] or 0),
        "sum_dl_removed": int(srow[1] or 0),
        "n_total": int(srow[2] or 0),
        "sum_dl_total": int(srow[3] or 0),
    }
    with open(os.path.join(tomb_tmp, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    os.replace(tomb_tmp, tomb_dir)
    # generation + flag flip + manifest mtime bump (query-side caches
    # key on mtime); the artifact set is complete before this save, so
    # a crash before it simply means THIS delete never happened — the
    # prior generation (if any) stays live and intact
    manifest.has_tombstones = True
    manifest.tomb_gen = new_gen
    manifest.save(index_dir)
    _sweep_tomb_dirs(index_dir, keep=manifest.tomb_dirname())
    log(
        f"[delete] tombstoned {len(all_ids)} ids "
        f"({stats['n_removed']} present in index)"
    )
    return load_tombstones(index_dir)


def _read_batch_token(batch_dir: str) -> str | None:
    p = os.path.join(batch_dir, "_batch_token")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return f.read().strip()


def recover_delta_folds(spark: SparkSession, index_dir: str, log=print):
    """Finish or archive delta folds interrupted by a crash; returns the
    (possibly updated) manifest.

    MUST run before anything that renames or removes groups (both
    tombstone compactions call it, as does ``compact_deltas`` itself):
    the fold protocol's durable marker is its lineage record plus the
    group's presence on disk/manifest, and a compaction that folds a
    committed delta group away would otherwise strand that group's
    still-unarchived batches, which a later fold would then re-ingest.

    Decision table per delta-compaction lineage record with pending
    source batches (content-verified by the ``_batch_token`` written at
    ingest — batch NAMES repeat after a checkpoint reset):

    - group on disk but not in the manifest → the commit crashed
      between lineage and manifest flip; finish it, then archive;
    - group in the manifest → the archive step crashed; archive;
    - group in neither → the record predates a compaction that (having
      run this recovery first) already archived the real batches — the
      pending same-named batches are NEW data; leave them for a fresh
      fold.
    """
    import glob as _glob
    import shutil

    from same_same_spark.index.build import IndexManifest

    manifest = IndexManifest.load(index_dir)
    deltas_dir = os.path.join(index_dir, "_stage", "deltas")
    done_dir = os.path.join(index_dir, "_stage", "deltas_compacted")
    pending = {
        os.path.basename(p): p
        for p in _glob.glob(os.path.join(deltas_dir, "batch-*"))
    }
    if not pending:
        return manifest
    lineage_dir = os.path.join(index_dir, "_lineage")
    for rec_path in sorted(
        _glob.glob(os.path.join(lineage_dir, "group-*.json"))
    ):
        with open(rec_path) as f:
            rec = json.load(f)
        if rec.get("kind") != "delta-compaction":
            continue
        tokens = rec.get("batch_tokens", {})
        g = rec["group"]
        committed = g in manifest.groups
        covered = []
        for b in rec.get("source_batches", []):
            p = pending.get(b)
            if p is None:
                continue
            tok_rec, tok_now = tokens.get(b), _read_batch_token(p)
            if tok_rec is not None and tok_rec == tok_now:
                covered.append(b)  # positive content-token match
                continue
            if tok_rec is None and tok_now is None and committed:
                # Legacy pre-token-protocol record whose fold COMMITTED
                # (group live in the manifest) and a token-less pending
                # batch of the same name: the old archive behavior is
                # the only one that can't DUPLICATE documents (leaving
                # it pending would refold a committed batch). The
                # residual risk — a checkpoint reset reusing the name
                # for NEW legacy-format data — is unprovable either
                # way, so claim it LOUDLY. A token-CARRYING pending
                # batch was written by token-era code and is never
                # claimed by a legacy record.
                log(
                    f"[recover] WARNING: archiving token-less batch {b}"
                    f" claimed by legacy lineage record of committed"
                    f" group {g}; if this batch is NEW data that reused"
                    f" the name after a checkpoint reset, re-stage it"
                )
                covered.append(b)
                continue
            # Otherwise only a POSITIVE content-token match covers a
            # batch: after a checkpoint reset, same-named batches are
            # NEW data, and archiving them unfolded would silently lose
            # documents. Uncommitted legacy folds simply refold —
            # idempotent, the new group gets a fresh name.
        if not covered:
            continue
        on_disk = os.path.exists(
            os.path.join(index_dir, "shards", f"group-{g}")
        )
        if g not in manifest.groups and on_disk:
            log(f"[recover] finishing interrupted delta fold -> group {g}")
            manifest = _finalize_groups(
                spark, index_dir, manifest,
                new_groups=[g], remove_groups=[], lineage={},
                keep_groups=manifest.groups,
                next_grp=max(manifest.alloc_grp(), int(g) + 1),
                keep_tombstones=True,
            )
        if g in manifest.groups:
            os.makedirs(done_dir, exist_ok=True)
            for b in covered:
                os.replace(pending.pop(b), os.path.join(done_dir, b))
                log(f"[recover] archived already-folded batch {b}")
    return manifest
