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
(the allocator only advances IN the flip) with mode=overwrite. A rerun
AFTER the flip is recognized by the source content token committed in
each group's lineage record and skipped — so a merge interrupted (or
blindly retried by an orchestrator) at ANY point can simply be re-run
without duplicating documents.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from same_same_spark.index.build import IndexManifest
from same_same_spark.metrics import MetricsWindow


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


def _source_token(sm: IndexManifest, sdir: str) -> str:
    """Content fingerprint of a source index (path-independent): a
    retried merge recognizes a source it already committed even if the
    directory moved. Besides the manifest's aggregate counts, the
    bytes of the (tiny) stats parquet are folded in — the term→df
    distribution distinguishes two different doc sets whose aggregate
    counts happen to coincide (plausible for symmetric shards)."""
    import glob as _glob
    import hashlib
    import json as _json

    h = hashlib.md5()
    h.update(
        _json.dumps(
            {
                "n_docs": sm.n_docs,
                "sum_dl": sm.sum_dl,
                "n_postings": sm.n_postings,
                "n_terms": sm.n_terms,
                "num_buckets": sm.num_buckets,
                "groups": sorted(sm.groups),
                "tokenizer_version": sm.tokenizer_version,
            },
            sort_keys=True,
        ).encode()
    )
    stats_dir = os.path.join(sdir, sm.stats_dirname())
    for p in sorted(_glob.glob(os.path.join(stats_dir, "*.parquet"))):
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _already_merged(
    dest_dir: str, dest: IndexManifest, token: str
) -> bool:
    """Decision table over committed ``index-merge`` lineage records
    carrying ``token`` (mirrors ``recover_delta_folds``):

    - no records → not merged;
    - a record's group is ON DISK but NOT in the manifest → the commit
      was interrupted between lineage write and manifest flip — NOT
      merged (the rerun re-copies the same names, since the allocator
      only advances in the flip, and recommits);
    - otherwise (groups live in the manifest, or consumed by a later
      compaction that removed both dir and manifest entry) → merged.
    """
    import glob as _glob
    import json as _json

    recs = []
    for p in _glob.glob(
        os.path.join(dest_dir, "_lineage", "group-*.json")
    ):
        with open(p) as f:
            rec = _json.load(f)
        if (
            rec.get("kind") == "index-merge"
            and rec.get("source_token") == token
        ):
            recs.append(rec)
    if not recs:
        return False
    for rec in recs:
        g = rec["group"]
        on_disk = os.path.exists(
            os.path.join(dest_dir, "shards", f"group-{g}")
        )
        if g not in dest.groups and on_disk:
            return False
    return True


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


def _settle_index(spark: SparkSession, idir: str, log) -> IndexManifest:
    """Bring an index to the merge-ready state (no pending delta
    batches, no live tombstones) by running its own compactions IN
    PLACE. Only called under ``auto_compact=True`` — the default merge
    contract keeps sources strictly read-only, so settling is an
    explicit opt-in. Both steps are the same crash-safe operations a
    caller would run by hand (``compact_deltas`` folds staged batches;
    ``rewrite_touched_groups`` rewrites only tombstoned groups), so a
    crash mid-settle leaves the index exactly as recoverable as those
    operations always leave it."""
    import glob as _glob

    from same_same_spark.index.build import compact_deltas
    from same_same_spark.index.mutate import rewrite_touched_groups

    pending = _glob.glob(
        os.path.join(idir, "_stage", "deltas", "batch-*")
    )
    if pending:
        log(
            f"[merge] {idir}: auto-compacting {len(pending)} "
            "staged delta batch(es)"
        )
        compact_deltas(spark, idir, log=log)
    m = IndexManifest.load(idir)
    if m.has_tombstones:
        log(f"[merge] {idir}: auto-compacting tombstones")
        rewrite_touched_groups(spark, idir, log=log)
        m = IndexManifest.load(idir)
    return m


def merge_indexes(
    spark: SparkSession,
    dest_dir: str,
    src_dirs: list[str],
    log=print,
    auto_compact: bool = False,
) -> IndexManifest:
    """Merge every index in ``src_dirs`` INTO ``dest_dir``.

    Returns the destination's post-merge manifest. Sources are read,
    never modified — unless ``auto_compact=True``, which settles any
    participant that still has staged delta batches or live tombstones
    by running its own crash-safe compactions in place first (the
    exact ``compact_deltas`` / ``rewrite_touched_groups`` calls the
    default contract asks the caller to run by hand). Settling never
    applies to an already-merged source: growth staged into a source
    AFTER its merge committed is skipped with a warning — fold it into
    the destination (or a fresh index) instead, because compacting and
    re-merging the grown source would duplicate its original docs.
    Idempotent under retry at EVERY crash window:
    before the manifest flip a rerun simply re-copies into the same
    group names; after it, the committed lineage records carry each
    source's content token, so a rerun recognizes already-merged
    sources and skips them instead of duplicating their documents
    (the post-commit-crash retry an orchestrator will eventually
    issue). Cost: one partition-local parquet copy per source group +
    the stats rebuild every group-set change pays.
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
    if auto_compact:
        # settles BOTH staged deltas and tombstones (no-op when clean)
        dest = _settle_index(spark, dest_dir, log)
    _require(
        not dest.has_tombstones,
        f"{dest_dir}: destination has live tombstones — compact first "
        "(merged stats must not double-apply tombstone deltas)",
    )

    # the destination must not be a source (it would duplicate its own
    # corpus), and listing a source twice would duplicate that source
    dest_real = os.path.realpath(dest_dir)
    seen_real: set[str] = set()
    sources: list[tuple[str, IndexManifest]] = []
    for sdir in src_dirs:
        real = os.path.realpath(sdir)
        _require(
            real != dest_real,
            f"{sdir}: the destination cannot also be a source",
        )
        _require(
            real not in seen_real,
            f"{sdir}: source listed more than once",
        )
        seen_real.add(real)
        # the already-merged check MUST precede any settling: staged
        # deltas don't touch the manifest, so a blind retry of a
        # committed merge still sees the committed token even if the
        # source gained batches since — settling first would change the
        # token and re-copy (= duplicate) every already-merged doc
        sm = IndexManifest.load(sdir)
        if _already_merged(dest_dir, dest, _source_token(sm, sdir)):
            import glob as _glob

            pending = _glob.glob(
                os.path.join(sdir, "_stage", "deltas", "batch-*")
            )
            if pending:
                # skip is still right (a blind retry must stay
                # idempotent), but say loudly that the growth was NOT
                # merged: post-merge growth belongs in its own index
                # (or staged into the destination) — compacting and
                # re-merging this source would duplicate its original
                # documents (doc_ids are no longer disjoint with dest)
                log(
                    f"[merge] WARNING {sdir}: already merged — skipped, "
                    f"but it carries {len(pending)} staged delta "
                    "batch(es) that were NOT merged; stage post-merge "
                    "growth into the destination or a fresh index"
                )
            else:
                log(
                    f"[merge] {sdir}: already merged (token match) — "
                    "skipped"
                )
            continue
        if auto_compact:
            sm = _settle_index(spark, sdir, log)
        _check_compatible(dest, sm, sdir)
        _no_pending_deltas(sdir)
        sources.append((sdir, sm))

    next_grp = dest.alloc_grp()
    new_groups: list[str] = []
    lineage: dict[str, dict] = {}
    for sdir, sm in sources:
        tok = _source_token(sm, sdir)
        for g in sm.groups:
            gname = f"{next_grp:04d}"
            while gname in dest.groups:  # legacy-allocator guard
                next_grp += 1
                gname = f"{next_grp:04d}"
            src_path = os.path.join(sdir, "shards", f"group-{g}")
            dst_path = os.path.join(
                dest_dir, "shards", f"group-{gname}"
            )
            t_g = time.time()
            with MetricsWindow(spark) as mw:
                (
                    spark.read.parquet(src_path)
                    .withColumn("grp", F.lit(next_grp).cast("int"))
                    .write.mode("overwrite")
                    .parquet(dst_path)
                )
            g_docs = (
                spark.read.parquet(dst_path)
                .filter(F.col("kind") == "d")
                .agg(F.sum("n"))
                .collect()[0][0]
            )
            lineage[gname] = {
                "group": gname,
                "kind": "index-merge",
                "source_index": sdir,
                "source_group": g,
                "source_token": tok,
                "docs": int(g_docs or 0),
                "wall_sec": time.time() - t_g,
                # execution counters for the copy job (a healthy merge
                # shuffles nothing — shuffle_write_bytes stays 0)
                "exec": mw.totals(),
            }
            new_groups.append(gname)
            next_grp += 1
            log(f"[merge] {sdir}:group-{g} -> group-{gname}")

    if not new_groups:
        log("[merge] nothing to merge (sources empty or already merged)")
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
