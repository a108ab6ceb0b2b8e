"""Session-window aggregation — batch AND Structured Streaming.

The per-event companion (`operators/events.sessionize`) assigns dense
session indexes with lag + running sum; that shape needs the whole
key history, so it is a batch operator. THIS module is the streaming
answer: Spark's native ``session_window`` merges per-key event
windows incrementally inside the state store, so sessions aggregate
correctly across micro-batches, late data within the watermark is
folded into its session, and state is bounded by open sessions (the
watermark closes them).

Boundary semantics are pinned identical to ``sessionize``: an event
exactly ``gap`` after its predecessor EXTENDS the session; a strictly
greater gap starts a new one (test_sessions differential-proves the
two produce the same session partitioning on the same input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["session_window_agg"]


def session_window_agg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    *,
    value_col: str | None = None,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-session aggregates via ``F.session_window``.

    Works unchanged on a batch DataFrame or a streaming one; when the
    input is streaming and ``watermark`` is set, the event-time
    watermark is applied first so append-mode sinks can finalize
    sessions (complete/update modes work without it). Returns
    ``(key, session_start, session_end, last_event_ts, n_events
    [, sum_value])`` where ``session_end`` is Spark's window end
    (``last_event_ts + gap``) — the session-window contract.

    Scale: the groupBy is keyed by (key, merged window); Spark's
    session-merging aggregation is the purpose-built operator for
    this (state bounded by OPEN sessions per key, not history), which
    is exactly what a 100-TB clickstream needs — the batch lag/sum
    sessionizer would carry unbounded per-key state in a stream.
    """
    base = events
    if events.isStreaming and watermark is not None:
        base = events.withWatermark(ts_col, watermark)
    gap = f"{gap_seconds} seconds"
    aggs = [
        F.max(ts_col).alias("last_event_ts"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    out = base.groupBy(
        F.col(key_col), F.session_window(ts_col, gap)
    ).agg(*aggs)
    return out.select(
        key_col,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "last_event_ts",
        "n_events",
        *(["sum_value"] if value_col is not None else []),
    )
