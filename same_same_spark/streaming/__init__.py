"""Structured Streaming paths.

The reference is strictly request/response over mutable in-memory state
(SURVEY.md §2.7: no streams anywhere); these modules give the rebuild
its streaming story:

- :func:`~same_same_spark.streaming.ingest.stream_events_hourly` — the
  streaming twin of the batch ``events_hourly`` query (watermark +
  tumbling window),
- :func:`~same_same_spark.streaming.ingest.stream_doc_ingest` —
  incremental index ingestion: each micro-batch appends a staged
  posting delta + a lineage record (the streaming continuation of the
  batch build's checkpoint scheme).
- :func:`~same_same_spark.streaming.sessions.session_window_agg` —
  native ``session_window`` aggregation (batch + streaming), the
  incremental twin of ``operators/events.sessionize``.
"""

from same_same_spark.streaming.ingest import (  # noqa: F401
    stream_doc_ingest,
    stream_events_hourly,
)
from same_same_spark.streaming.sessions import (  # noqa: F401
    session_window_agg,
)
