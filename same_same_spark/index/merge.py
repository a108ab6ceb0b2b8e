"""Index merge: combine independently-built indexes into one.

THE web-scale build strategy (the reference's single in-memory store
has no equivalent; this is Spark-native territory): partition a 100-TB
corpus, run ``build_index`` on each partition CONCURRENTLY (separate
jobs, separate clusters, separate days), then merge the results into
one queryable index. Merging never touches raw text — it re-registers
each source shard group under a fresh ``grp`` int (one partition-local
read→write per group, no shuffle: the parquet rows stream through with
a new ``grp`` literal) and commits the union through the shared
crash-safe tail (:func:`~same_same_spark.index.mutate._finalize_groups`:
stats rebuilt over all groups, lineage, ONE atomic manifest flip), so
post-merge search is rank- and score-identical to a fresh build over
the union corpus (tested).

Why the ``grp`` rewrite is necessary: within one index every group
carries a distinct ``grp`` int — the query cogroup pairs posting rows
with their group's position space by (bucket, grp). Two independent
builds both start at grp 0, so their rows would collide if read
together unchanged. The rewrite is the cheapest possible fix (a
column-literal substitution during a straight parquet copy); the
alternative — a query-side remap table — would tax every search
forever to save one copy at merge time.

Preconditions (validated): same num_buckets (doc→bucket hashing must
agree), same tokenizer/layout versions and BM25 parameters, sources
compacted (no tombstones, no pending delta batches), and — caller's
contract, same as ``compact_deltas`` — doc_ids disjoint across all
participants (parallel partition builds satisfy this by construction).

Crash safety: copied group dirs land before the manifest flip and are
unreferenced garbage until it; a rerun re-copies into the same names
(the allocator only advances IN the flip) with mode=overwrite, so a
merge interrupted anywhere can simply be re-run.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from same_same_spark.index.build import IndexManifest


class IndexMergeError(ValueError):
    """Sources are incompatible with the destination index."""


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise IndexMergeError(msg)


def _check_compatible(dest: IndexManifest, src: IndexManifest, sdir: str):
    _require(
        src.num_buckets == dest.num_buckets,
        f"{sdir}: num_buckets {src.num_buckets} != {dest.num_buckets} — "
        "doc→bucket hashing would disagree",
    )
    _require(
        src.tokenizer_version == dest.tokenizer_version,
        f"{sdir}: tokenizer_version {src.tokenizer_version} != "
        f"{dest.tokenizer_version}",
    )
    _require(
        src.layout_version == dest.layout_version,
        f"{sdir}: layout_version {src.layout_version} != "
        f"{dest.layout_version}",
    )
    _require(
        (src.k1, src.b) == (dest.k1, dest.b),
        f"{sdir}: BM25 params ({src.k1}, {src.b}) != "
        f"({dest.k1}, {dest.b})",
    )
    _require(
        not src.has_tombstones,
        f"{sdir}: has live tombstones — run rewrite_touched_groups/"
        "rewrite_compacted on the source first",
    )


def _no_pending_deltas(sdir: str) -> None:
    import glob as _glob

    pending = _glob.glob(
        os.path.join(sdir, "_stage", "deltas", "batch-*")
    )
    _require(
        not pending,
        f"{sdir}: {len(pending)} unfolded delta batch(es) — run "
        "compact_deltas on the source first",
    )


def merge_indexes(
    spark: SparkSession,
    dest_dir: str,
    src_dirs: list[str],
    log=print,
) -> IndexManifest:
    """Merge every index in ``src_dirs`` INTO ``dest_dir``.

    Returns the destination's post-merge manifest. Sources are read,
    never modified. Idempotent under retry after a crash (see module
    docstring). Cost: one partition-local parquet copy per source
    group + the stats rebuild every group-set change pays.
    """
    from same_same_spark.index.mutate import (
        _finalize_groups,
        recover_delta_folds,
    )

    # protocol: anything touching the group set settles pending folds
    # first; merge only ADDS groups but must start from a consistent
    # manifest (a half-committed fold could otherwise allocate the
    # same grp ints this merge is about to take)
    dest = recover_delta_folds(spark, dest_dir, log=log)
    _require(
        not dest.has_tombstones,
        f"{dest_dir}: destination has live tombstones — compact first "
        "(merged stats must not double-apply tombstone deltas)",
    )

    sources: list[tuple[str, IndexManifest]] = []
    for sdir in src_dirs:
        sm = IndexManifest.load(sdir)
        _check_compatible(dest, sm, sdir)
        _no_pending_deltas(sdir)
        sources.append((sdir, sm))

    next_grp = dest.alloc_grp()
    new_groups: list[str] = []
    lineage: dict[str, dict] = {}
    t0 = time.time()
    for sdir, sm in sources:
        for g in sm.groups:
            gname = f"{next_grp:04d}"
            while gname in dest.groups:  # legacy-allocator guard
                next_grp += 1
                gname = f"{next_grp:04d}"
            src_path = os.path.join(sdir, "shards", f"group-{g}")
            dst_path = os.path.join(
                dest_dir, "shards", f"group-{gname}"
            )
            (
                spark.read.parquet(src_path)
                .withColumn("grp", F.lit(next_grp).cast("int"))
                .write.mode("overwrite")
                .parquet(dst_path)
            )
            lineage[gname] = {
                "group": gname,
                "kind": "index-merge",
                "source_index": sdir,
                "source_group": g,
                "docs": sm.n_docs,
                "wall_sec": time.time() - t0,
            }
            new_groups.append(gname)
            next_grp += 1
            log(f"[merge] {sdir}:group-{g} -> group-{gname}")

    if not new_groups:
        log("[merge] nothing to merge (sources have no groups)")
        return dest
    out = _finalize_groups(
        spark, dest_dir, dest,
        new_groups=new_groups, remove_groups=[],
        lineage=lineage,
        keep_groups=dest.groups,
        next_grp=next_grp,
        keep_tombstones=True,  # dest verified tombstone-free above
    )
    log(
        f"[merge] committed {len(new_groups)} groups from "
        f"{len(sources)} source index(es): n_docs={out.n_docs}, "
        f"postings={out.n_postings}"
    )
    return out
