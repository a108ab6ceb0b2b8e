"""Structured Streaming ingestion.

Watermark + tumbling-window aggregation for event streams, and
micro-batch incremental posting-delta ingestion for the index build —
``foreachBatch`` writes each batch's postings to
``<index_dir>/_stage/deltas/batch-NNNN`` with a lineage record, the
exact shape the batch builder checkpoints with
(:mod:`same_same_spark.index.build`), so a later compaction run encodes
deltas and committed stage data identically.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from same_same_spark.index.build import bucket_col
from same_same_spark.stats import doc_term_freqs, tokenized

EVENTS_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def stream_events_hourly(
    events_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of the batch ``events_hourly`` query: tumbling
    1-hour windows × event_type with late-data handling.

    Feed any streaming DataFrame with the events schema; returns the
    windowed aggregate (append-able once the watermark passes).
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "avg_value",
        )
    )


def read_events_stream(
    spark: SparkSession, path: str, max_files: int = 10
) -> DataFrame:
    """File-source event stream (JSON lines directory)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .json(path)
    )


def stage_delta_batch(
    batch_df: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "content",
    num_buckets: int = 32,
    batch_name: str | None = None,
) -> str:
    """Synchronously stage ONE document batch as a posting delta — the
    exact on-disk shape :func:`stream_doc_ingest` writes per
    micro-batch (doclens NULL-term rows so zero-token docs still count
    toward N/avgdl, posting rows, bucket column, content ``_batch_token``)
    — so a later :func:`~same_same_spark.index.build.compact_deltas`
    folds API-staged and streamed batches identically. Returns the
    batch dir path.

    Contract (same as the streamed path): doc_ids must be NEW to the
    index — ``api.upsert`` tombstones + compacts overwritten ids away
    first. ``num_buckets`` must equal the target index's manifest value.
    """
    import uuid as _uuid

    deltas_dir = os.path.join(index_dir, "_stage", "deltas")
    os.makedirs(deltas_dir, exist_ok=True)
    name = batch_name or f"batch-api-{_uuid.uuid4().hex[:12]}"
    tok = tokenized(batch_df, id_col=id_col, text_col=text_col).withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    doc_rows = tok.select(
        "doc_id",
        F.lit(None).cast("string").alias("term"),
        F.lit(0).cast("long").alias("tf"),
        "dl",
    )
    postings = doc_rows.unionByName(
        doc_term_freqs(tok).select("doc_id", "term", "tf", "dl")
    ).withColumn("bucket", bucket_col(F.col("doc_id"), num_buckets))
    dst = os.path.join(deltas_dir, name)
    postings.write.mode("overwrite").parquet(dst)
    # content identity: names can repeat (streaming checkpoint resets);
    # fold recovery archives only on a POSITIVE token match
    with open(os.path.join(dst, "_batch_token"), "w") as f:
        f.write(f"{name}-{_uuid.uuid4().hex}")
    return dst


def stream_doc_ingest(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "content",
    num_buckets: int = 32,
    trigger_available_now: bool = True,
):
    """Incrementally ingest a document stream into staged posting deltas.

    Each micro-batch: tokenize → (doc, term, tf, dl) → bucket → append
    ``_stage/deltas/batch-NNNN`` + lineage record with per-batch metrics
    (docs/sec, postings — the A4 ingest-stats contract). Spark's
    streaming checkpoint makes batch replay idempotent: a re-run batch
    overwrites its own delta dir before re-committing lineage.

    Returns the started StreamingQuery; callers ``awaitTermination``.
    """
    deltas_dir = os.path.join(index_dir, "_stage", "deltas")
    lineage_dir = os.path.join(index_dir, "_lineage_stream")
    os.makedirs(deltas_dir, exist_ok=True)
    os.makedirs(lineage_dir, exist_ok=True)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        # Replay guard beyond the checkpoint: if compaction already
        # archived this batch, rewriting it would let the NEXT compaction
        # fold the same documents twice (double-counting N/df). A batch
        # that compaction has consumed is final.
        done = os.path.join(
            index_dir, "_stage", "deltas_compacted", f"batch-{batch_id:06d}"
        )
        if os.path.exists(done):
            return
        dst = stage_delta_batch(
            batch_df, index_dir, id_col=id_col, text_col=text_col,
            num_buckets=num_buckets, batch_name=f"batch-{batch_id:06d}",
        )
        written = batch_df.sparkSession.read.parquet(dst)
        n_postings = written.filter(F.col("term").isNotNull()).count()
        n_docs = written.select("doc_id").distinct().count()
        wall = time.time() - t0
        record = {
            "batch_id": batch_id,
            "docs": n_docs,
            "postings": n_postings,
            "wall_sec": wall,
            "docs_per_sec": n_docs / max(wall, 1e-9),
        }
        tmp = os.path.join(lineage_dir, f"batch-{batch_id:06d}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, os.path.join(lineage_dir, f"batch-{batch_id:06d}.json"))

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_exact(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Cross-micro-batch exact dedup as a custom STATEFUL operator
    (``applyInPandasWithState``): the first document to arrive with a
    given ``sha256(text)`` anywhere in the stream survives; every later
    copy — same batch or any later batch — is dropped.

    The state key is the content hash, so state is hash-partitioned and
    uniformly distributed (the same argument as the batch
    :func:`~same_same_spark.pipeline.dedup.exact_dedup_groups` shuffle);
    per-key state is one boolean-sized record ("seen"), giving
    O(distinct contents) total state. This is the streaming twin of the
    batch exact dedup and the shape any custom stateful training-data
    operator takes here (keyed state + Arrow batches in/out).

    Semantics note: survivors are FIRST-ARRIVAL (within one batch the
    minimum id, across batches whichever batch came first) — equal to
    the batch twin's min-id rule only when earlier batches carry the
    smaller ids. Streams have an arrival order; frozen tables don't.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = f"{id_col} LONG, content_sha STRING, {text_col} STRING"
    state_schema = "seen BOOLEAN"

    def dedup_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        batches = [p for p in pdfs if len(p)]
        if state.exists or not batches:
            return iter(())  # hash already seen, or no data for the key
        # first batch containing this content: keep the minimum id
        # (deterministic within-batch tie-break, matching batch dedup)
        rows = pd.concat(batches, ignore_index=True)
        keep = rows.sort_values(id_col).iloc[[0]]
        state.update((True,))
        return iter([keep[[id_col, "content_sha", text_col]]])

    hashed = docs_stream.withColumn(
        "content_sha", F.sha2(F.col(text_col), 256)
    )
    # NoTimeout on purpose: a timed-out "seen" record would let a later
    # duplicate through, breaking exactness. State is one boolean per
    # DISTINCT content — bounding it is a retention-policy decision a
    # caller must make by re-keying, not a default this operator should
    # silently apply.
    return hashed.groupBy("content_sha").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
