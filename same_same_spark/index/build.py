"""Inverted-index build: single-pass, document-sharded, resumable.

Architecture (north rule — see BASELINE.json): a Dean-style
document-sharded index. Each document hashes to a bucket
(``pmod(xxhash64(doc_id), num_buckets)``); one shuffle moves raw docs to
their bucket and EVERYTHING else happens partition-locally inside a
``mapInArrow`` worker per bucket partition:

    tokenize (pyarrow.compute C++ kernels, X1 semantics — text never
    materializes as Python strings) →
    (doc, term) tf counts (dictionary-encode + lexsort, pure numpy) →
    per-term delta+varint posting blocks with (max_tf, min_dl)
    block metadata → one doclens row per bucket (with sum_dl and the
    bucket's shuffled input_bytes, the per-partition shuffle metric).

Why this shape at 100 TB:

- **One pass over content, one shuffle of raw docs.** The naive plan
  (explode → groupBy(doc,term) → repartition(term or bucket)) shuffles
  the *posting* table twice — ~30× more rows than documents. Measured
  locally that plan was memory-bandwidth-bound and stopped scaling with
  cores; this one is CPU-bound in the Arrow workers and scales.
- **Bucket sharding is the skew story.** A hot term ("import", "func")
  has its postings split across *all* buckets — no single task ever
  owns a hot term's full posting list, which is what explicit salting
  achieves in a term-sharded build, for free.
- **Stats decoupled.** Block metadata is stats-free (codec), so df/idf,
  N and avgdl are derived *after* the pass from the tiny encoded table
  (sum of per-row counts) — no second content scan.
- **Resume.** Buckets are processed in groups (the checkpoint unit);
  each group commits a lineage record with per-partition metrics
  (docs, postings, bytes, postings/sec). A killed build redoes only
  uncommitted groups (each group pass re-reads the source and keeps its
  buckets — resume granularity trades re-scan cost, default is one
  group = zero overhead). The reference restarts ingest from zero
  (``ingestor.go:231-234``).

Shard layout ``<out>/shards/group-XXXX/``: unified rows with
``kind='p'`` (one per (bucket, term): compressed posting list) and
``kind='d'`` (one per bucket: doc ids + doc lengths + sum_dl).
``<out>/stats`` holds (term, df, idf); ``manifest.json`` freezes corpus
stats, BM25 params, layout + tokenizer versions.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT
from same_same_spark.metrics import MetricsWindow, skew_summary
from same_same_spark.index import codec
from same_same_spark.text.tokenizer import (
    MIN_TOKEN_LEN,
    SPLIT_PATTERN,
    STOPWORDS,
    STRIP_PATTERN,
)

# v3: per-block doc codec tag (varint | FOR bit-pack)
# v4: posting lists store POSITIONS into the (bucket, group)'s sorted
#     doc-id array instead of raw xxhash64 ids — deltas shrink from
#     ~2^43 to ~n_bucket_docs/df so FOR bit-packing fires on nearly
#     every block (~0.6 B/doc measured vs ~7 B/doc raw), and the
#     scorer's dl lookup becomes direct indexing instead of a
#     searchsorted per posting. Each shard row carries `grp` (the shard
#     group that owns its position space); the per-(bucket, group)
#     doclens row still stores raw sorted ids — n_docs entries total vs
#     ~30x more postings.
LAYOUT_VERSION = 4
TOKENIZER_VERSION = "x1-v1"

SHARD_SCHEMA = (
    "bucket INT, kind STRING, term STRING, n INT, "
    "doc_bytes BINARY, tf_bytes BINARY, "
    "block_off_doc ARRAY<INT>, block_off_tf ARRAY<INT>, "
    "block_last_doc ARRAY<LONG>, block_max_tf ARRAY<INT>, "
    "block_min_dl ARRAY<INT>, sum_dl LONG, input_bytes LONG"
)

_SHARD_COLS = [
    "bucket", "kind", "term", "n", "doc_bytes", "tf_bytes",
    "block_off_doc", "block_off_tf", "block_last_doc", "block_max_tf",
    "block_min_dl", "sum_dl", "input_bytes",
]


@dataclass
class IndexManifest:
    n_docs: int
    avgdl: float
    k1: float
    b: float
    num_buckets: int
    n_terms: int
    n_postings: int
    layout_version: int = LAYOUT_VERSION
    tokenizer_version: str = TOKENIZER_VERSION
    groups: list[str] = field(default_factory=list)
    # Monotonic allocator for shard-group `grp` ints AND delta-group
    # names. NEVER derived from len(groups): compaction can rename or
    # drop groups, and a shrunk list would re-issue a live grp int /
    # dir name (position-space collision in the query cogroup). -1 =
    # legacy manifest, fall back to len(groups).
    next_grp: int = -1
    # Stats generation: the manifest references its stats directory by
    # name ("stats" for gen 0, "stats-{gen}" after), so stats and group
    # set flip ATOMICALLY with the manifest rename — a crash between a
    # stats rewrite and the manifest flip can never pair new stats with
    # old groups/tombstones.
    stats_gen: int = 0
    # Tombstones are live only when the manifest says so: compaction
    # clears this flag IN the atomic flip, so a crash before the
    # tombstone files are actually removed leaves them ignored, not
    # double-subtracted against the freshly rebuilt stats.
    has_tombstones: bool = False
    # Tombstone generation, versioned like stats_gen: every delete
    # writes a COMPLETE artifact set (ids, df_delta, stats.json) into a
    # fresh "tombstones-{gen}" dir and the manifest flip points readers
    # at it atomically. Without this, a second delete overwriting the
    # live dir in place could crash mid-write and leave mixed-generation
    # artifacts being served (the flag is still true from the first
    # delete). Monotonic — never reset, it only names directories.
    # 0 = legacy unversioned dir name "tombstones".
    tomb_gen: int = 0
    # Exact total token count (sum of doc lengths). avgdl alone cannot
    # reconstruct it without float rounding; the tombstone-adjusted
    # query path needs the exact integer. -1 = legacy manifest.
    sum_dl: int = -1

    def alloc_grp(self) -> int:
        return self.next_grp if self.next_grp >= 0 else len(self.groups)

    def stats_dirname(self) -> str:
        return "stats" if self.stats_gen == 0 else f"stats-{self.stats_gen}"

    def tomb_dirname(self) -> str:
        return (
            "tombstones" if self.tomb_gen == 0
            else f"tombstones-{self.tomb_gen}"
        )

    def save(self, index_dir: str) -> None:
        tmp = os.path.join(index_dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=2)
        os.replace(tmp, os.path.join(index_dir, "manifest.json"))

    @staticmethod
    def load(index_dir: str) -> "IndexManifest":
        with open(os.path.join(index_dir, "manifest.json")) as f:
            data = json.load(f)
        if "has_tombstones" not in data:
            # legacy manifest written before the flag existed: the
            # tombstone files themselves are authoritative — defaulting
            # to False would silently resurrect deleted docs
            data["has_tombstones"] = os.path.exists(
                os.path.join(index_dir, "tombstones", "stats.json")
            )
        return IndexManifest(**data)


def bucket_col(doc_id_col, num_buckets: int):
    return F.pmod(F.xxhash64(doc_id_col), F.lit(num_buckets)).cast("int")


_SHARD_ARROW_SCHEMA = None  # built lazily (pyarrow import inside workers)


def _shard_arrow_schema():
    import pyarrow as pa

    global _SHARD_ARROW_SCHEMA
    if _SHARD_ARROW_SCHEMA is None:
        _SHARD_ARROW_SCHEMA = pa.schema(
            [
                ("bucket", pa.int32()),
                ("kind", pa.string()),
                ("term", pa.string()),
                ("n", pa.int32()),
                ("doc_bytes", pa.binary()),
                ("tf_bytes", pa.binary()),
                ("block_off_doc", pa.list_(pa.int32())),
                ("block_off_tf", pa.list_(pa.int32())),
                ("block_last_doc", pa.list_(pa.int64())),
                ("block_max_tf", pa.list_(pa.int32())),
                ("block_min_dl", pa.list_(pa.int32())),
                ("sum_dl", pa.int64()),
                ("input_bytes", pa.int64()),
            ]
        )
    return _SHARD_ARROW_SCHEMA


def _encode_one_bucket(bucket: int, ids, texts) -> tuple[list[dict], int]:
    """Encode one bucket: Arrow-native tokenize (pyarrow.compute C++
    kernels — no Python string objects ever materialize) → numpy tf
    grouping → posting codec. Returns (rows, input_bytes)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    input_bytes = int(pc.sum(pc.binary_length(texts)).as_py() or 0)
    cleaned = pc.replace_substring_regex(
        pc.utf8_lower(texts), pattern=STRIP_PATTERN, replacement=" "
    )
    toks = pc.split_pattern_regex(cleaned, pattern=SPLIT_PATTERN)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    mask = pc.and_(
        pc.greater_equal(pc.utf8_length(flat), MIN_TOKEN_LEN),
        pc.invert(pc.is_in(flat, value_set=pa.array(sorted(STOPWORDS)))),
    )
    flat = pc.filter(flat, mask)
    rowidx = pc.filter(parent, mask).to_numpy().astype(np.int64)
    dl = np.bincount(rowidx, minlength=len(ids)).astype(np.int64)

    rows: list[dict] = []
    base = {c: None for c in _SHARD_COLS}
    order = np.argsort(ids, kind="stable")
    rows.append(
        {
            **base,
            "bucket": bucket,
            "kind": "d",
            "n": len(ids),
            "doc_bytes": codec.encode_doc_ids(ids[order]),
            "tf_bytes": codec.varint_encode(dl[order].astype(np.uint64)),
            "sum_dl": int(dl.sum()),
            "input_bytes": input_bytes,
        }
    )
    # layout v4: postings index into the sorted doc array above
    pos_of = np.empty(len(ids), dtype=np.int64)
    pos_of[order] = np.arange(len(ids), dtype=np.int64)

    if len(rowidx):
        dct = pc.dictionary_encode(flat)
        codes = dct.indices.to_numpy().astype(np.int64)
        uniq = np.asarray(dct.dictionary.to_pylist(), dtype=object)
        # re-rank codes so terms emit in sorted order — parquet row-group
        # min/max stats on `term` then prune query scans (the dictionary
        # comes back in first-appearance order)
        sort_order = np.argsort(uniq)
        rank = np.empty(len(uniq), dtype=np.int64)
        rank[sort_order] = np.arange(len(uniq))
        codes = rank[codes]
        uniq = uniq[sort_order]
        doc_rep = pos_of[rowidx]
        dl_rep = dl[rowidx]
        order2 = np.lexsort((doc_rep, codes))
        c = codes[order2]
        dr = doc_rep[order2]
        dlr = dl_rep[order2]
        change = np.empty(len(c), dtype=bool)
        change[0] = True
        change[1:] = (c[1:] != c[:-1]) | (dr[1:] != dr[:-1])
        gstarts = np.flatnonzero(change)
        gends = np.append(gstarts[1:], len(c))
        tf = (gends - gstarts).astype(np.int64)
        g_code = c[gstarts]
        g_doc = dr[gstarts]
        g_dl = dlr[gstarts]
        tchange = np.empty(len(g_code), dtype=bool)
        tchange[0] = True
        tchange[1:] = g_code[1:] != g_code[:-1]
        tstarts = np.flatnonzero(tchange)
        tends = np.append(tstarts[1:], len(g_code))
        for s, e in zip(tstarts, tends):
            row = codec.encode_posting_list(g_doc[s:e], tf[s:e], g_dl[s:e])
            rows.append(
                {
                    **base,
                    "bucket": bucket,
                    "kind": "p",
                    "term": uniq[g_code[s]],
                    **row,
                }
            )
    return rows, input_bytes


def _encode_partition_fn(id_col: str, text_col: str):
    """mapInArrow partition worker.

    The partition was hash-partitioned on `bucket`, so it holds one or
    more COMPLETE buckets; batches are accumulated (Arrow, compact) and
    each bucket is encoded independently. Text never becomes Python
    strings — tokenization runs entirely in pyarrow C++ kernels, which
    both cuts CPU ~2x vs pandas str ops and keeps per-bucket memory at
    ~the raw text size (the bucket-sizing knob for 100 TB:
    ``num_buckets ≈ corpus_bytes / ~256MB``).
    """

    def encode(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        batch_list = [b for b in batches if b.num_rows]
        if not batch_list:
            return
        tbl = pa.Table.from_batches(batch_list)
        schema = _shard_arrow_schema()
        buckets = tbl["bucket"].combine_chunks().unique().to_pylist()
        for bucket in sorted(buckets):
            sub = tbl.filter(pc.equal(tbl["bucket"], bucket))
            ids = sub[id_col].to_numpy().astype(np.int64)
            texts = pc.coalesce(sub[text_col], pa.scalar("")).combine_chunks()
            rows, _ = _encode_one_bucket(int(bucket), ids, texts)
            cols = {name: [r[name] for r in rows] for name in _SHARD_COLS}
            yield pa.RecordBatch.from_pydict(cols, schema=schema)

    return encode


def _encode_delta_bucket_rows(pdf) -> list[dict]:
    """Encode one bucket of staged rows (doc_id, term, tf, dl) into
    shard rows — the compaction twin of :func:`_encode_one_bucket`
    (which starts from raw text).

    Staged batches carry one ``term IS NULL`` row per document (written
    by ``streaming.stream_doc_ingest``) so doclens cover every ingested
    doc — including zero-token docs that emit no posting rows; the
    fresh-build path counts those with dl=0 and compaction must too, or
    N/avgdl diverge and every BM25 score shifts. Older batches without
    doc rows fall back to postings-derived doclens.
    """
    import pandas as pd

    bucket = int(pdf["bucket"].iloc[0])
    is_doc_row = pdf["term"].isna()
    doc_pdf = pdf[is_doc_row]
    pdf = pdf[~is_doc_row].sort_values(["term", "doc_id"], kind="mergesort")
    terms = pdf["term"].to_numpy()
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)

    rows: list[dict] = []
    base = {c: None for c in _SHARD_COLS}

    if len(doc_pdf):
        # authoritative per-doc rows: every doc, zero-token included
        dd = doc_pdf["doc_id"].to_numpy(dtype=np.int64)
        dv = doc_pdf["dl"].to_numpy(dtype=np.int64)
        order = np.argsort(dd, kind="stable")
        d_sorted, first_idx = np.unique(dd[order], return_index=True)
        dl_vals = dv[order][first_idx]
    else:
        # legacy fallback: doclens from distinct (doc_id, dl) postings
        d_sorted = np.sort(np.unique(doc_ids))
        dl_by_doc = pd.Series(dls, index=doc_ids)
        dl_map = dl_by_doc.groupby(level=0).first()
        dl_vals = dl_map.loc[d_sorted].to_numpy(dtype=np.int64)
    rows.append(
        {
            **base,
            "bucket": bucket,
            "kind": "d",
            "n": len(d_sorted),
            "doc_bytes": codec.encode_doc_ids(d_sorted),
            "tf_bytes": codec.varint_encode(dl_vals.astype(np.uint64)),
            "sum_dl": int(dl_vals.sum()),
            "input_bytes": 0,
        }
    )

    # layout v4: postings index into this group's sorted doc array
    positions = np.searchsorted(d_sorted, doc_ids)
    uniq, starts = np.unique(terms, return_index=True)
    ends = np.append(starts[1:], len(terms))
    for t, s, e in zip(uniq, starts, ends):
        row = codec.encode_posting_list(positions[s:e], tfs[s:e], dls[s:e])
        rows.append({**base, "bucket": bucket, "kind": "p", "term": t, **row})
    return rows


def compact_deltas(spark, index_dir: str, log=print) -> IndexManifest:
    """Fold streamed posting deltas into the index as a new shard group.

    Reads ``<index_dir>/_stage/deltas/batch-*`` (written by
    ``streaming.stream_doc_ingest``: rows (doc_id, term, tf, dl,
    bucket)), encodes them per bucket into ``shards/group-NNNN``, then
    rebuilds the stats table and the manifest over ALL groups — so
    df/idf/N/avgdl equal a fresh build over the union corpus, and
    search results are rank-identical to it (tested). Contract: delta
    doc_ids are NEW documents (append-only; dedup upstream — the
    reference's overwrite-by-id semantics belong to the mutable store,
    not the index).

    Crash-safe ordering: group dir (atomic rename) → lineage record
    naming its source batches → stats + manifest flip → batch archive.
    A rerun after a crash at ANY point either refolds (no lineage yet:
    orphan dir replaced, batches untouched), finishes the commit
    (lineage but no manifest entry: group dir is complete), or just
    archives (manifest entry present) — streamed documents can neither
    be lost nor double-counted.
    """
    import glob as _glob

    from same_same_spark.index.mutate import (
        _finalize_groups,
        _read_batch_token,
        recover_delta_folds,
    )

    deltas_dir = os.path.join(index_dir, "_stage", "deltas")
    done_dir = os.path.join(index_dir, "_stage", "deltas_compacted")

    # finish/archive any fold a crash interrupted before folding anew
    manifest = recover_delta_folds(spark, index_dir, log=log)

    batch_dirs = sorted(_glob.glob(os.path.join(deltas_dir, "batch-*")))
    if not batch_dirs:
        log("[compact] no deltas to fold")
        return manifest

    new_grp = manifest.alloc_grp()
    gname = f"{new_grp:04d}"
    dst = os.path.join(index_dir, "shards", f"group-{gname}")
    # collision guard for legacy allocators: never reuse a LIVE name
    while gname in manifest.groups:
        new_grp += 1
        gname = f"{new_grp:04d}"
        dst = os.path.join(index_dir, "shards", f"group-{gname}")
    if os.path.exists(dst):
        # orphan from a crash before its lineage record: replace it
        shutil.rmtree(dst)
    staged = spark.read.parquet(*batch_dirs)

    import pandas as pd

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=_SHARD_COLS)
        return pd.DataFrame(
            _encode_delta_bucket_rows(pdf), columns=_SHARD_COLS
        )

    t0 = time.time()
    enc = (
        staged.repartition(manifest.num_buckets, "bucket")
        .groupBy("bucket")
        .applyInPandas(encode, SHARD_SCHEMA)
        .withColumn("grp", F.lit(new_grp).cast("int"))
    )
    tmp = dst + ".tmp"
    enc.write.mode("overwrite").parquet(tmp)
    os.replace(tmp, dst)

    # commit: lineage (durable batch marker) -> stats + manifest flip
    # (shared tail, preserves tombstones) -> archive consumed batches
    g_docs = (
        spark.read.parquet(dst)
        .filter(F.col("kind") == "d")
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    record = {
        "group": gname,
        "kind": "delta-compaction",
        "source_batches": [os.path.basename(b) for b in batch_dirs],
        "batch_tokens": {
            os.path.basename(b): _read_batch_token(b)
            for b in batch_dirs
            if _read_batch_token(b) is not None
        },
        "docs": int(g_docs or 0),
        "wall_sec": time.time() - t0,
    }
    out = _finalize_groups(
        spark, index_dir, manifest,
        new_groups=[gname], remove_groups=[],
        lineage={gname: record},
        keep_groups=manifest.groups,
        next_grp=new_grp + 1, keep_tombstones=True,
    )
    os.makedirs(done_dir, exist_ok=True)
    for b in batch_dirs:
        os.replace(b, os.path.join(done_dir, os.path.basename(b)))
    log(f"[compact] folded {len(batch_dirs)} delta batches into group {gname}")
    return out


def _dir_size(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def build_index(
    docs_df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "content",
    num_buckets: int = 32,
    group_size: int | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    overwrite: bool = False,
    log=print,
) -> IndexManifest:
    """Build (or resume building) the index at ``out_dir``.

    ``group_size`` buckets are encoded per checkpointed job (default:
    all buckets — one pass, no re-scan; smaller groups buy finer resume
    granularity at the cost of one source scan per group).
    """
    spark = docs_df.sparkSession
    if group_size is None:
        group_size = num_buckets
    if overwrite and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    manifest_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(manifest_path):
        return IndexManifest.load(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    lineage_dir = os.path.join(out_dir, "_lineage")
    os.makedirs(lineage_dir, exist_ok=True)

    bucketed = docs_df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(text_col).alias(text_col),
    ).withColumn("bucket", bucket_col(F.col(id_col), num_buckets))

    groups = [
        list(range(g, min(g + group_size, num_buckets)))
        for g in range(0, num_buckets, group_size)
    ]
    committed = {
        fn[len("group-"):-len(".json")]
        for fn in os.listdir(lineage_dir)
        if fn.startswith("group-") and fn.endswith(".json")
    }

    for gi, buckets in enumerate(groups):
        gname = f"{gi:04d}"
        dst = os.path.join(out_dir, "shards", f"group-{gname}")
        if gname in committed:
            log(f"[build] group {gname} already committed — skipping (resume)")
            continue
        if os.path.exists(dst):  # partial write from a killed run
            shutil.rmtree(dst)
        t0 = time.time()
        part = bucketed if len(groups) == 1 else bucketed.filter(
            F.col("bucket").isin(buckets)
        )
        enc = part.repartition(len(buckets), "bucket").mapInArrow(
            _encode_partition_fn(id_col, text_col), SHARD_SCHEMA
        ).withColumn("grp", F.lit(gi).cast("int"))
        tmp = dst + ".tmp"
        with MetricsWindow(spark) as mw:
            enc.write.mode("overwrite").parquet(tmp)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(tmp, dst)

        # lineage record with per-partition metrics (north rule) — read
        # back only the tiny metadata columns of the encoded output
        g_df = spark.read.parquet(dst)
        agg = (
            g_df.groupBy("bucket")
            .agg(
                F.sum(F.when(F.col("kind") == "p", 1).otherwise(0)).alias("terms"),
                F.sum(F.when(F.col("kind") == "p", F.col("n"))).alias("postings"),
                F.sum(F.when(F.col("kind") == "d", F.col("n"))).alias("docs"),
                F.sum(
                    F.when(F.col("kind") == "d", F.col("input_bytes"))
                ).alias("input_bytes"),
            )
            .collect()
        )
        per_bucket = {
            str(r["bucket"]): {
                "terms": int(r["terms"] or 0),
                "postings": int(r["postings"] or 0),
                "docs": int(r["docs"] or 0),
                "shuffle_input_bytes": int(r["input_bytes"] or 0),
            }
            for r in agg
        }
        wall = time.time() - t0
        n_post_g = sum(v["postings"] for v in per_bucket.values())
        n_docs_g = sum(v["docs"] for v in per_bucket.values())
        exec_parts = mw.task_detail()
        record = {
            "group": gname,
            "buckets": buckets,
            "per_bucket": per_bucket,
            "docs": n_docs_g,
            "postings": n_post_g,
            "bytes": _dir_size(dst),
            "wall_sec": wall,
            "docs_per_sec": n_docs_g / max(wall, 1e-9),
            "postings_per_sec": n_post_g / max(wall, 1e-9),
            # execution-side counters for the encode job (shuffle
            # bytes, spill) + per-partition task rows of its heaviest
            # stage — the skew evidence the north rule asks for
            "exec": mw.totals(),
            "exec_partitions": exec_parts,
            "skew": skew_summary(exec_parts),
        }
        tmpf = os.path.join(lineage_dir, f"group-{gname}.json.tmp")
        with open(tmpf, "w") as f:
            json.dump(record, f)
        os.replace(tmpf, os.path.join(lineage_dir, f"group-{gname}.json"))
        log(
            f"[build] group {gname} committed: {n_docs_g} docs, "
            f"{n_post_g} postings, {wall:.1f}s "
            f"({record['postings_per_sec']:.0f} postings/s)"
        )

    # ---- stats + manifest (over the tiny encoded table, one job) ----
    shard_paths = [
        os.path.join(out_dir, "shards", f"group-{i:04d}")
        for i in range(len(groups))
    ]
    shards = spark.read.parquet(*shard_paths)
    drow = (
        shards.filter(F.col("kind") == "d")
        .agg(F.sum("n").alias("n_docs"), F.sum("sum_dl").alias("sum_dl"))
        .collect()[0]
    )
    n_docs = int(drow["n_docs"] or 0)
    avgdl = float(drow["sum_dl"] or 0) / n_docs if n_docs else 0.0

    term_stats = (
        shards.filter(F.col("kind") == "p")
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
    term_stats.repartition(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "stats")
    )
    srow = (
        spark.read.parquet(os.path.join(out_dir, "stats"))
        .agg(F.count(F.lit(1)), F.sum("df"))
        .collect()[0]
    )

    manifest = IndexManifest(
        n_docs=n_docs,
        avgdl=avgdl,
        k1=k1,
        b=b,
        num_buckets=num_buckets,
        n_terms=int(srow[0]),
        n_postings=int(srow[1] or 0),
        groups=[f"{i:04d}" for i in range(len(groups))],
        next_grp=len(groups),
        sum_dl=int(drow["sum_dl"] or 0),
    )
    manifest.save(out_dir)
    log(f"[build] manifest committed: {manifest}")
    return manifest
