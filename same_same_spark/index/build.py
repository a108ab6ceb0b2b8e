"""Inverted-index build: staged, bucket-sharded, resumable.

Pipeline (north rule — see BASELINE.json):

1. **Stage** — tokenize (JVM column expr) → explode → (doc, term, tf, dl)
   postings with map-side combine; assign ``bucket = pmod(xxhash64(doc_id),
   num_buckets)``. Bucket-sharding *is* the explicit salt for skewed
   tokens: a hot term's postings ("import", "func") are split across all
   buckets, so no single shuffle partition or encode task owns a hot
   term. Staged postings + per-doc lengths land in
   ``<out>/_stage/`` partitioned by bucket (partition pruning for the
   encode pass); term→df/idf stats land in ``<out>/stats``.
2. **Encode** — buckets are processed in *groups* (the checkpoint unit).
   Per group: ``groupBy(bucket, term).applyInPandas`` runs the numpy
   codec (delta+varint blocks, block-max metadata) and
   ``groupBy(bucket)`` encodes doc lengths. Each group writes to a temp
   dir, is atomically renamed into place, and then commits a lineage
   record ``<out>/_lineage/group-XXXX.json`` with per-partition metrics
   (docs, postings, bytes, wall seconds, postings/sec).
3. **Manifest** — ``<out>/manifest.json`` freezes corpus stats
   (N, avgdl), BM25 params, layout + tokenizer versions.

**Resume**: a killed build re-runs only work units whose lineage record
is missing (the anti-join of the group work-list against committed
lineage); a group dir without its lineage record is torn down and
re-encoded. The reference has nothing like this — a killed ingest
restarts from zero (``ingestor.go:231-234``).

Scale notes: the only corpus-wide shuffles are the stage groupBy
(map-side combined) and the encode groupBy on (bucket, term) — both key
spaces are uniform by construction. No ``collect()`` touches anything
proportional to corpus size.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
from dataclasses import asdict, dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT
from same_same_spark.index import codec
from same_same_spark.stats import doc_term_freqs, tokenized

LAYOUT_VERSION = 1
TOKENIZER_VERSION = "x1-v1"

POSTINGS_SCHEMA = (
    "bucket INT, term STRING, n INT, doc_bytes BINARY, tf_bytes BINARY, "
    "block_off_doc ARRAY<INT>, block_off_tf ARRAY<INT>, "
    "block_last_doc ARRAY<LONG>, block_max_wtf ARRAY<FLOAT>"
)
DOCLENS_SCHEMA = "bucket INT, n_docs INT, doc_bytes BINARY, dl_bytes BINARY"


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

    def save(self, index_dir: str) -> None:
        tmp = os.path.join(index_dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=2)
        os.replace(tmp, os.path.join(index_dir, "manifest.json"))

    @staticmethod
    def load(index_dir: str) -> "IndexManifest":
        with open(os.path.join(index_dir, "manifest.json")) as f:
            return IndexManifest(**json.load(f))


def bucket_col(doc_id_col, num_buckets: int):
    return F.pmod(F.xxhash64(doc_id_col), F.lit(num_buckets)).cast("int")


def _encode_postings_fn(avgdl: float, k1: float, b: float):
    """Per-BUCKET encoder: one applyInPandas group per bucket (not per
    term) — thousands of tiny per-term groups cost more in Arrow/pandas
    framing than the codec itself. Inside the group, terms are sliced
    out of one sorted array (numpy boundaries, no pandas groupby)."""
    import numpy as np

    _COLS = [
        "bucket", "term", "n", "doc_bytes", "tf_bytes",
        "block_off_doc", "block_off_tf", "block_last_doc", "block_max_wtf",
    ]

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=_COLS)
        bucket = int(pdf["bucket"].iloc[0])
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        terms = pdf["term"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy()
        tfs = pdf["tf"].to_numpy()
        dls = pdf["dl"].to_numpy()
        uniq, starts = np.unique(terms, return_index=True)
        ends = np.append(starts[1:], len(terms))
        rows = []
        for t, s, e in zip(uniq, starts, ends):
            row = codec.encode_posting_list(
                doc_ids[s:e], tfs[s:e], dls[s:e], avgdl, k1, b
            )
            rows.append({"bucket": bucket, "term": t, **row})
        return pd.DataFrame(rows, columns=_COLS)

    return encode


def _encode_doclens_fn():
    import numpy as np

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                columns=["bucket", "n_docs", "doc_bytes", "dl_bytes"]
            )
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        d = pdf["doc_id"].to_numpy()[order]
        dl = pdf["dl"].to_numpy()[order].astype(np.uint64)
        return pd.DataFrame(
            [
                {
                    "bucket": int(pdf["bucket"].iloc[0]),
                    "n_docs": len(d),
                    "doc_bytes": codec.encode_doc_ids(d),
                    "dl_bytes": codec.varint_encode(dl),
                }
            ]
        )

    return encode


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
    group_size: int = 8,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    overwrite: bool = False,
    log=print,
) -> IndexManifest:
    """Build (or resume building) the index at ``out_dir``."""
    spark = docs_df.sparkSession
    if overwrite and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    manifest_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(manifest_path):
        return IndexManifest.load(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)

    stage_dir = os.path.join(out_dir, "_stage")
    stage_marker = os.path.join(stage_dir, "_STAGE_DONE.json")

    # ---- Stage 1: tokenize + postings + stats (one checkpoint unit) ----
    #
    # Exactly ONE pass over raw content (the tokenize+explode write);
    # everything else (N, avgdl, df/idf, posting counts) is derived from
    # the narrow staged table — at 100 TB the content pass dominates, so
    # don't take it twice.
    if not os.path.exists(stage_marker):
        t0 = time.time()
        n_docs = docs_df.count()  # cheap: parquet row-group counts / range
        tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
        postings = doc_term_freqs(tok).withColumn(
            "bucket", bucket_col(F.col("doc_id"), num_buckets)
        )
        (
            postings.repartition(num_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(stage_dir, "postings"))
        )
        staged = spark.read.parquet(os.path.join(stage_dir, "postings"))
        # avgdl over ALL docs (zero-token docs contribute 0 to the dl sum
        # and appear in n_docs, matching stats.corpus_stats exactly).
        sum_dl = (
            staged.groupBy("doc_id").agg(F.first("dl").alias("dl"))
            .agg(F.sum("dl")).collect()[0][0]
        ) or 0
        avgdl = float(sum_dl) / n_docs if n_docs else 0.0
        term_stats = staged.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        term_stats = term_stats.withColumn(
            "idf",
            F.log(
                1.0
                + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ),
        )
        term_stats.repartition(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "stats")
        )
        srow = (
            spark.read.parquet(os.path.join(out_dir, "stats"))
            .agg(F.count(F.lit(1)), F.sum("df"))
            .collect()[0]
        )
        stage_info = {
            "n_docs": n_docs,
            "avgdl": avgdl,
            "n_postings": int(srow[1] or 0),
            "n_terms": int(srow[0]),
            "wall_sec": time.time() - t0,
            "docs_per_sec": n_docs / max(time.time() - t0, 1e-9),
        }
        with open(stage_marker + ".tmp", "w") as f:
            json.dump(stage_info, f)
        os.replace(stage_marker + ".tmp", stage_marker)
        log(f"[build] stage done: {stage_info}")
    else:
        with open(stage_marker) as f:
            stage_info = json.load(f)
        log(f"[build] stage resumed from checkpoint: {stage_info}")

    avgdl = stage_info["avgdl"]

    # ---- Stage 2: encode groups (resumable work units) ----
    groups = [
        list(range(g, min(g + group_size, num_buckets)))
        for g in range(0, num_buckets, group_size)
    ]
    lineage_dir = os.path.join(out_dir, "_lineage")
    committed = {
        fn[len("group-"):-len(".json")]
        for fn in os.listdir(lineage_dir)
        if fn.startswith("group-") and fn.endswith(".json")
    }
    staged = spark.read.parquet(os.path.join(stage_dir, "postings"))

    for gi, buckets in enumerate(groups):
        gname = f"{gi:04d}"
        post_dst = os.path.join(out_dir, "postings", f"group-{gname}")
        dlen_dst = os.path.join(out_dir, "doclens", f"group-{gname}")
        if gname in committed:
            log(f"[build] group {gname} already committed — skipping (resume)")
            continue
        # a dir without lineage = partial write from a killed run: tear down
        for d in (post_dst, dlen_dst):
            if os.path.exists(d):
                shutil.rmtree(d)
        t0 = time.time()
        part = staged.filter(F.col("bucket").isin(buckets))
        enc = part.groupBy("bucket").applyInPandas(
            _encode_postings_fn(avgdl, k1, b), POSTINGS_SCHEMA
        )
        post_tmp = post_dst + ".tmp"
        enc.write.mode("overwrite").parquet(post_tmp)

        dlens = (
            part.select("bucket", "doc_id", "dl")
            .distinct()
            .groupBy("bucket")
            .applyInPandas(_encode_doclens_fn(), DOCLENS_SCHEMA)
        )
        dlen_tmp = dlen_dst + ".tmp"
        dlens.write.mode("overwrite").parquet(dlen_tmp)

        os.makedirs(os.path.dirname(post_dst), exist_ok=True)
        os.makedirs(os.path.dirname(dlen_dst), exist_ok=True)
        os.replace(post_tmp, post_dst)
        os.replace(dlen_tmp, dlen_dst)

        # lineage record with per-partition metrics (north rule)
        g_post = spark.read.parquet(post_dst)
        per_bucket = {
            str(r["bucket"]): {"terms": r["terms"], "postings": r["postings"]}
            for r in g_post.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("terms"), F.sum("n").alias("postings"))
            .collect()
        }
        wall = time.time() - t0
        n_post_g = int(sum(v["postings"] for v in per_bucket.values()))
        record = {
            "group": gname,
            "buckets": buckets,
            "per_bucket": per_bucket,
            "postings": n_post_g,
            "bytes": _dir_size(post_dst) + _dir_size(dlen_dst),
            "wall_sec": wall,
            "postings_per_sec": n_post_g / max(wall, 1e-9),
        }
        tmp = os.path.join(lineage_dir, f"group-{gname}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, os.path.join(lineage_dir, f"group-{gname}.json"))
        log(
            f"[build] group {gname} committed: {n_post_g} postings, "
            f"{wall:.1f}s ({record['postings_per_sec']:.0f} postings/s)"
        )

    manifest = IndexManifest(
        n_docs=stage_info["n_docs"],
        avgdl=avgdl,
        k1=k1,
        b=b,
        num_buckets=num_buckets,
        n_terms=stage_info["n_terms"],
        n_postings=stage_info["n_postings"],
        groups=[f"{i:04d}" for i in range(len(groups))],
    )
    manifest.save(out_dir)
    log(f"[build] manifest committed: {manifest}")
    return manifest
