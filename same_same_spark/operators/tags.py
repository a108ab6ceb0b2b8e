"""X10 — tags splitting.

Reference: ``internal/handlers/advanced_search.go:95-158`` (a hand-rolled
comma split + trim that drops empties) and
``internal/storage/local/adapter.go:298-318``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_tags_col(tags: Column | str) -> Column:
    """Comma-split → trim each → drop empties. NULL input → empty array."""
    c = F.col(tags) if isinstance(tags, str) else tags
    arr = F.transform(F.split(c, ","), lambda t: F.trim(t))
    cleaned = F.filter(arr, lambda t: F.length(t) > 0)
    return F.coalesce(cleaned, F.array().cast("array<string>"))


def split_tags_sql(col_expr: str) -> str:
    """DuckDB twin of :func:`split_tags_col`."""
    return (
        f"CASE WHEN {col_expr} IS NULL THEN []::VARCHAR[] ELSE "
        f"list_filter(list_transform(string_split({col_expr}, ','), "
        f"t -> trim(t)), t -> length(t) > 0) END"
    )
