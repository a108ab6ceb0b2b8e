"""X7/X8/X9 — temporal decay, document-time resolution, age buckets.

Reference: ``internal/models/temporal.go`` and
``internal/storage/memory/temporal_search.go``.

- decay: ``score × e^(−λ·Δt_years)``; Δt clamped at 0 (future docs don't
  decay — temporal.go:116-118); Δt_years = seconds / 31,557,600
  (hours / (24·365.25), temporal.go:113),
- λ presets strong/medium/weak/none = 0.5/0.1/0.01/0 (temporal.go:79-92),
- document time: metadata[time_field] as RFC3339 → created_at →
  updated_at → now (temporal_search.go:84-104),
- age buckets: years (365.25 d) / months (30.44 d) / days / hours /
  "just now" (temporal.go:151-187).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECAY_LAMBDAS = {"strong": 0.5, "medium": 0.1, "weak": 0.01, "none": 0.0}
SECONDS_PER_YEAR = 24 * 365.25 * 3600  # 31,557,600


def delta_years_col(doc_time: Column, ref_time: Column) -> Column:
    """Δt in years, clamped ≥ 0, microsecond-precise."""
    dt = (F.unix_micros(ref_time) - F.unix_micros(doc_time)) / F.lit(1e6)
    return F.greatest(F.lit(0.0), dt / F.lit(SECONDS_PER_YEAR))


def decay_factor_col(
    doc_time: Column, ref_time: Column, lam: float
) -> Column:
    if lam == 0.0:
        return F.lit(1.0)
    return F.exp(F.lit(-lam) * delta_years_col(doc_time, ref_time))


def apply_decay_col(
    score: Column, doc_time: Column, ref_time: Column, lam: float
) -> Column:
    if lam == 0.0:
        return score  # temporal.go:108-110
    return score * decay_factor_col(doc_time, ref_time, lam)


def resolve_doc_time(
    metadata_col: str | None = "metadata",
    time_field: str = "created_at",
    created_at: str | None = "created_at",
    updated_at: str | None = "updated_at",
) -> Column:
    """metadata[field] (RFC3339) → created_at → updated_at → now."""
    candidates: list[Column] = []
    if metadata_col is not None:
        candidates.append(
            F.try_to_timestamp(
                F.col(metadata_col).getItem(time_field),
                F.lit("yyyy-MM-dd'T'HH:mm:ssXXX"),
            )
        )
    if created_at is not None:
        candidates.append(F.col(created_at))
    if updated_at is not None:
        candidates.append(F.col(updated_at))
    candidates.append(F.current_timestamp())
    return F.coalesce(*candidates)


def age_col(doc_time: Column, ref_time: Column) -> Column:
    """Human-readable age bucket (presentation; temporal.go:151-187)."""
    hours = (F.unix_micros(ref_time) - F.unix_micros(doc_time)) / F.lit(3.6e9)
    years = F.floor(hours / F.lit(24 * 365.25)).cast("long")
    months = F.floor(hours / F.lit(24 * 30.44)).cast("long")
    days = F.floor(hours / F.lit(24.0)).cast("long")
    hrs = F.floor(hours).cast("long")

    def plural(n: Column, unit: str) -> Column:
        return F.when(n == 1, F.lit(f"1 {unit} ago")).otherwise(
            F.concat(n.cast("string"), F.lit(f" {unit}s ago"))
        )

    return (
        F.when(years > 0, plural(years, "year"))
        .when(months > 0, plural(months, "month"))
        .when(days > 0, plural(days, "day"))
        .when(hrs > 0, plural(hrs, "hour"))
        .otherwise(F.lit("just now"))
    )
