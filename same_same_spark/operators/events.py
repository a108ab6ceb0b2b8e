"""Event-time operators: as-of join and gap sessionization.

The reference engine has no event-time layer (its temporal support is
the decay scorer, `internal/search/temporal.go`); these are the two
standard event-table operators a Spark-side analytics engine needs on
top of it (`events` table: SURVEY §1 / TESTDATA.md):

- :func:`asof_join` — for each left row, the single most recent right
  row with the same key and ``right_ts <= left_ts`` (``backward``; or
  the earliest ``right_ts >= left_ts`` for ``forward``). Implemented
  as ONE union + ONE per-key shuffle: both sides are tagged and
  unioned, and a per-key running ``last(payload, ignorenulls=True)``
  over a rows frame carries the latest right payload onto every left
  row. No join explosion, no range-condition sort-merge: the cost is
  a single sort within each key partition, the same plan at 10^2 or
  10^12 rows (a genuinely hot key is the caller's salting problem —
  as-of semantics need per-key total order, so salting must split on
  time ranges, not hash).
- :func:`sessionize` — classic gap-based sessions: a new session
  starts when the gap to the previous event of the same key exceeds
  ``gap_seconds``. One per-key shuffle; ``lag`` + running sum over a
  rows frame, both streaming within the sorted partition.

Both use *partitioned* windows only (never the unpartitioned rank
windows banned by VERDICT r2 #3): each window key is the natural
parallelism unit, so the plan scales horizontally with keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "auto_date_histogram",
    "bucket_script",
    "cumulative_cardinality",
    "date_histogram",
    "interval_join",
    "moving_fn",
    "normalize_buckets",
    "pipeline_aggs",
    "rate_buckets",
    "serial_diff",
    "sessionize",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    *,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_tiebreak: str | None = None,
    prefix: str = "matched_",
) -> DataFrame:
    """As-of join ``left`` to ``right`` on ``on`` within event time.

    Returns every ``left`` row (left-outer semantics) plus
    ``{prefix}{right_ts}`` and ``{prefix}{c}`` for each payload column
    ``c`` in ``right_cols`` (default: every right column except ``on``
    and ``right_ts``), NULL where no right row qualifies.

    - ``direction='backward'`` — latest right row with
      ``right_ts <= left_ts`` (DuckDB/pandas ``merge_asof`` default).
    - ``direction='forward'`` — earliest right row with
      ``right_ts >= left_ts``.
    - ``tolerance_seconds`` — additionally require
      ``|left_ts - right_ts| <= tolerance``; misses become NULL.
    - ``right_tiebreak`` — column ordering right rows that share an
      exact ``(key, ts)``; backward picks the greatest, forward the
      smallest, so the result is deterministic. Without it, callers
      must guarantee right-side ``(key, ts)`` uniqueness.

    Plan: unionByName → one Exchange on ``on`` → one sort per key →
    running first/last over a rows frame. Nothing quadratic, nothing
    driver-side.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    if right_ts in right_cols or len(set(right_cols)) != len(right_cols):
        raise ValueError(
            "right_cols must be distinct and must not repeat right_ts "
            f"(it is always returned as {prefix}{right_ts})"
        )
    overlap = [f"{prefix}{c}" for c in [right_ts, *right_cols]]
    clash = set(overlap) & set(left.columns)
    if clash:
        raise ValueError(f"prefixed right columns clash with left: {clash}")

    payload = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    if right_tiebreak is not None:
        tb: Column = F.col(right_tiebreak)
        # Left rows never compete on the tiebreak (side differs), but
        # the union needs a type-compatible column.
        left_tb = F.lit(None).cast(right.schema[right_tiebreak].dataType)
    else:
        tb = F.lit(0)
        left_tb = F.lit(0)
    # NULL keys never match (standard join semantics — DuckDB's ASOF
    # agrees); dropping null-key right rows up front also keeps them
    # out of the window's null partition, so null-key left rows come
    # back with a NULL match instead of pairing with each other.
    r = right.filter(
        F.col(on).isNotNull() & F.col(right_ts).isNotNull()
    ).select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        payload.alias("__p"),
    )
    l = left.select(
        *left.columns,
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        left_tb.alias("__tb"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # Right rows sort BEFORE the left row at an equal ts (side 0<1)
        # so `right_ts <= left_ts` is inclusive; among equal right ts
        # the running last() keeps the greatest tiebreak.
        w = (
            Window.partitionBy("__key")
            .orderBy(F.asc("__t"), F.asc("__side"), F.asc("__tb"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__p", ignorenulls=True).over(w)
    else:
        # Mirror image: at an equal ts the left row sorts first
        # (side 1 mapped below 0 via descending), right rows follow;
        # first() over the following frame takes the smallest
        # (ts, tiebreak) right row.
        w = (
            Window.partitionBy("__key")
            .orderBy(F.asc("__t"), F.desc("__side"), F.asc("__tb"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first("__p", ignorenulls=True).over(w)

    # A NULL left timestamp compares NULL against every right_ts in
    # SQL semantics → never a match (it would otherwise sort
    # nulls-first and, in forward mode, see every right row in its
    # following frame).
    out = u.withColumn(
        "__m", F.when(F.col("__t").isNotNull(), matched)
    ).filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        gap_us = F.abs(
            F.unix_micros(F.col("__t"))
            - F.unix_micros(F.col("__m.__ts"))
        )
        out = out.withColumn(
            "__m",
            F.when(
                gap_us <= F.lit(int(round(tolerance_seconds * 1_000_000))),
                F.col("__m"),
            ),
        )
    proj = [F.col(c) for c in left.columns]
    proj.append(F.col("__m.__ts").alias(f"{prefix}{right_ts}"))
    proj.extend(F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_cols)
    return out.select(*proj)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    *,
    lookback_seconds: float,
    lookahead_seconds: float = 0.0,
    right_cols: list[str] | None = None,
    prefix: str = "r_",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time interval join: every (left, right) pair with the same
    key and ``left_ts - lookback <= right_ts <= left_ts + lookahead``
    (bounds inclusive). Inner semantics — ALL qualifying pairs, where
    :func:`asof_join` keeps only the latest one (the as-of match is
    always the max-``right_ts`` row of this join's backward window; a
    test pins that relationship).

    Works on batch AND streaming inputs: with two streams this is
    Spark's watermarked stream-stream join — the time-range condition
    is what lets the state store evict rows once the watermark passes
    ``lookback + watermark``, so state stays bounded (the reason
    streams get an interval join rather than an unbounded as-of).

    Right columns come back ``prefix``-renamed; the right timestamp is
    always included as ``{prefix}{right_ts}``.
    """
    if lookback_seconds < 0 or lookahead_seconds < 0:
        raise ValueError("lookback/lookahead must be >= 0")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    if right_ts in right_cols or len(set(right_cols)) != len(right_cols):
        raise ValueError(
            "right_cols must be distinct and must not repeat right_ts"
        )
    clash = {f"{prefix}{c}" for c in [right_ts, *right_cols]} & set(
        left.columns
    )
    if clash:
        raise ValueError(f"prefixed right columns clash with left: {clash}")

    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r_src = (
        right.withWatermark(right_ts, watermark)
        if right.isStreaming
        else right
    )
    r = r_src.select(
        F.col(on).alias("__rk"),
        F.col(right_ts).alias(f"{prefix}{right_ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    rt = F.col(f"{prefix}{right_ts}")
    lt = F.col(left_ts)
    # fixed-point formatting: f"{x}" renders tiny/huge floats in
    # scientific notation, which INTERVAL syntax rejects (1e-05 -> parse
    # error); sub-microsecond remainders are below timestamp resolution
    back = f"{float(lookback_seconds):.6f}"
    ahead = f"{float(lookahead_seconds):.6f}"
    cond = (
        (F.col(on) == F.col("__rk"))
        & (rt >= lt - F.expr(f"INTERVAL '{back}' SECOND"))
        & (rt <= lt + F.expr(f"INTERVAL '{ahead}' SECOND"))
    )
    return l.join(r, cond, "inner").drop("__rk")


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    *,
    order_cols: list[str] | None = None,
    session_col: str = "session_idx",
) -> DataFrame:
    """Assign gap-based session indexes per key.

    A new session starts at the first event of a key and whenever the
    gap to the previous event of the same key STRICTLY exceeds
    ``gap_seconds`` (an exactly-``gap`` pause continues the session).
    Sessions are numbered 1..n per key in event order; ``order_cols``
    break exact-timestamp ties deterministically (pass the event id).

    One per-key shuffle; ``lag`` + running sum stream through the
    sorted partition (rows frames, bounded state). Gap math is in
    integer microseconds so Spark and any SQL twin agree bit-exactly.
    """
    order = [F.asc(ts_col)] + [F.asc(c) for c in (order_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    gap_us = int(round(gap_seconds * 1_000_000))
    is_new = F.when(
        prev.isNull() | ((us - prev) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    running = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        session_col, F.sum(is_new).over(running).cast("bigint")
    )


_DH_STEPS = {
    "minute": "interval 1 minute",
    "hour": "interval 1 hour",
    "day": "interval 1 day",
    "week": "interval 7 days",
    "month": "interval 1 month",
    "year": "interval 1 year",
}
# lower bound on a bucket's width in seconds, for the breaker
_DH_MIN_SECONDS = {
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
    "month": 28 * 86400,
    "year": 365 * 86400,
}


def date_histogram(
    events_df: DataFrame,
    unit: str,
    time_col: str = "ts",
    group_col: str | None = None,
    max_buckets: int = 65536,
) -> DataFrame:
    """Date-histogram aggregation — Elasticsearch's ``date_histogram``
    with calendar intervals: per (optional group ×) ``date_trunc(unit)``
    bucket counts, EVERY bucket between each group's first and last
    event emitted (``min_doc_count=0`` zero-fill — the fixed-shape
    series a dashboard renders; the engine's ``events_hourly`` tumbling
    aggregate is the sparse cousin). NULL timestamps excluded.

    Returns ([group STRING,] bucket TIMESTAMP, doc_count LONG).

    The zero-fill walks TIMESTAMP sequences with calendar INTERVAL
    steps (month/year buckets are non-uniform — epoch arithmetic can't
    generate them; both engines agree on calendar stepping), generated
    from each group's BOUNDS row only. The ES too-many-buckets breaker
    bounds the span via each unit's minimum width, riding inside the
    sequence bound expression (an unused assert_true projection would
    be pruned — see facets.histogram_facets).
    """
    if unit not in _DH_STEPS:
        raise ValueError(
            f"unit must be one of {sorted(_DH_STEPS)}, got {unit!r}"
        )
    gcols = [group_col] if group_col else []
    ev = events_df.select(
        *[F.col(c).cast("string").alias(c) for c in gcols],
        F.date_trunc(unit, F.col(time_col)).alias("bucket"),
    ).filter(F.col("bucket").isNotNull())
    counted = ev.groupBy(*gcols, "bucket").agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    span_sec = (
        F.unix_seconds(F.col("hi")) - F.unix_seconds(F.col("lo"))
    ).cast("double")
    hi_checked = F.when(
        F.assert_true(
            span_sec / F.lit(float(_DH_MIN_SECONDS[unit]))
            < F.lit(float(max_buckets)),
            F.lit(
                f"date_histogram span exceeds max_buckets={max_buckets} "
                f"at unit={unit!r}; widen the unit"
            ),
        ).isNull(),
        F.col("hi"),
    )
    shape = (
        counted.groupBy(*gcols)
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            *gcols,
            F.explode(
                F.sequence(
                    F.col("lo"), hi_checked, F.expr(_DH_STEPS[unit])
                )
            ).alias("bucket"),
        )
    )
    return shape.join(counted, gcols + ["bucket"], "left").select(
        *gcols,
        "bucket",
        F.coalesce(F.col("doc_count"), F.lit(0)).cast("long").alias(
            "doc_count"
        ),
    )


def duckdb_date_histogram_sql(
    table: str,
    unit: str,
    time_col: str = "ts",
    group_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`date_histogram` (generate_series with a
    calendar INTERVAL step vs Spark's sequence explode)."""
    if unit not in _DH_STEPS:
        raise ValueError(
            f"unit must be one of {sorted(_DH_STEPS)}, got {unit!r}"
        )
    step = _DH_STEPS[unit].replace("interval ", "INTERVAL ")
    g = f"CAST({group_col} AS VARCHAR) AS grp, " if group_col else ""
    gsel = "grp, " if group_col else ""
    gout = f"{group_col}, " if group_col else ""
    gb = "grp, " if group_col else ""
    join_g = "s.grp = c.grp AND " if group_col else ""
    out_g = f"s.grp AS {group_col}, " if group_col else ""
    return f"""
WITH ev AS (
  SELECT {g}date_trunc('{unit}', {time_col}) AS bucket
  FROM {table}
  WHERE {time_col} IS NOT NULL
),
counted AS (
  SELECT {gsel}bucket, count(*)::BIGINT AS doc_count
  FROM ev GROUP BY {gb}bucket
),
bounds AS (
  SELECT {gsel}min(bucket) AS lo, max(bucket) AS hi
  FROM counted {"GROUP BY grp" if group_col else ""}
),
shape AS (
  SELECT {gsel}unnest(generate_series(lo, hi, {step})) AS bucket
  FROM bounds
)
SELECT {out_g}s.bucket AS bucket,
       coalesce(c.doc_count, 0)::BIGINT AS doc_count
FROM shape s
LEFT JOIN counted c ON {join_g}s.bucket = c.bucket
"""


def pipeline_aggs(
    series_df: DataFrame,
    value_col: str = "doc_count",
    order_col: str = "bucket",
    group_cols: list[str] | None = None,
    window: int = 7,
) -> DataFrame:
    """Pipeline aggregations — ES's ``cumulative_sum`` / ``derivative``
    / ``moving_fn`` (avg) over a bucketed series (normally the output
    of :func:`date_histogram`, whose breaker bounds every group's
    bucket count).

    Pinned semantics (cross-engine, re-derived in
    :func:`duckdb_pipeline_aggs_sql`):

    - buckets order by ``order_col`` ASC within each group (the series
      must carry distinct order values per group — date_histogram's
      zero-fill guarantees it);
    - ``cumulative_sum`` = inclusive running sum of ``value_col``
      (BIGINT);
    - ``derivative`` = value − previous bucket's value, NULL on each
      group's first bucket (ES emits no derivative there);
    - ``moving_avg`` = mean of the trailing ``min(i+1, window)``
      values INCLUDING the current bucket (DOUBLE).

    Scale shape: windows PARTITIONED by the group columns — the same
    per-key pattern as :func:`sessionize` (never the banned
    unpartitioned rank window); all three functions stream within the
    sorted partition, and a partition's row count is bounded by the
    histogram breaker. A global series (no groups) partitions on a
    non-foldable constant (Spark 4's EliminateWindowPartitions folds a
    LITERAL key into an unpartitioned window — see sessionize's notes)
    and is bounded by the same breaker.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    gcols = list(group_cols or [])
    if gcols:
        part = [F.col(c) for c in gcols]
    else:
        # non-foldable constant: survives EliminateWindowPartitions
        part = [F.when(F.col(order_col).isNotNull(), F.lit(0))]
    ordered = Window.partitionBy(*part).orderBy(F.col(order_col).asc())
    cum = ordered.rowsBetween(Window.unboundedPreceding, 0)
    trail = ordered.rowsBetween(-(window - 1), 0)
    v = F.col(value_col)
    return series_df.select(
        *gcols,
        order_col,
        value_col,
        F.sum(v).over(cum).cast("long").alias("cumulative_sum"),
        (v - F.lag(v, 1).over(ordered)).cast("long").alias("derivative"),
        F.avg(v).over(trail).cast("double").alias("moving_avg"),
    )


def duckdb_pipeline_aggs_sql(
    series_sql: str,
    value_col: str = "doc_count",
    order_col: str = "bucket",
    group_cols: list[str] | None = None,
    window: int = 7,
) -> str:
    """DuckDB twin of :func:`pipeline_aggs` over the series produced by
    ``series_sql`` (a full SELECT, e.g. the date_histogram twin)."""
    gcols = list(group_cols or [])
    part = f"PARTITION BY {', '.join(gcols)} " if gcols else ""
    gsel = "".join(f"{c}, " for c in gcols)
    return f"""
WITH series AS ({series_sql})
SELECT {gsel}{order_col}, {value_col},
       sum({value_col}) OVER (
         {part}ORDER BY {order_col} ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )::BIGINT AS cumulative_sum,
       ({value_col} - lag({value_col}, 1) OVER (
         {part}ORDER BY {order_col} ASC
       ))::BIGINT AS derivative,
       avg({value_col}) OVER (
         {part}ORDER BY {order_col} ASC
         ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW
       )::DOUBLE AS moving_avg
FROM series
"""


def bucket_selector(
    series_df: DataFrame,
    min_value: float | None = None,
    max_value: float | None = None,
    value_col: str = "doc_count",
) -> DataFrame:
    """ES ``bucket_selector`` for the comparison-script family: keep
    buckets whose ``value_col`` lies in the inclusive
    ``[min_value, max_value]`` range (either side open when None —
    ES's ubiquitous ``params.v >= X`` / ``<= Y`` scripts; arbitrary
    scripts are out of scope by design). NULL values never match.
    A plain filter — Catalyst pushes it into whatever produced the
    series."""
    if min_value is None and max_value is None:
        raise ValueError("bucket_selector needs min_value or max_value")
    v = F.col(value_col)
    cond = v.isNotNull()
    if min_value is not None:
        cond = cond & (v >= F.lit(float(min_value)))
    if max_value is not None:
        cond = cond & (v <= F.lit(float(max_value)))
    return series_df.filter(cond)


def bucket_sort(
    series_df: DataFrame,
    size: int,
    sort_col: str = "doc_count",
    order_col: str = "bucket",
    group_cols: list[str] | None = None,
    from_: int = 0,
    ascending: bool = False,
) -> DataFrame:
    """ES ``bucket_sort``: re-order a parent aggregation's buckets by a
    metric and truncate — "top ``size`` buckets per group", with
    ``from_`` pagination.

    Pinned semantics (cross-engine, re-derived per-entry with a
    row_number window in DuckDB):

    - order within each group by ``(round(sort_col, 9) DESC|ASC,
      order_col ASC)`` (the engine's pinned tie rule);
    - ``bucket_rank`` = the bucket's absolute 1-based position in that
      order; rows with rank in ``(from_, from_ + size]`` survive.

    Returns the group columns + ``order_col`` + ``sort_col`` +
    ``bucket_rank INT``.

    Scale shape: the bounded tournament (struct sort_array/slice per
    partition, then per group) — never a rank window on data rows;
    buffers hold <= from_ + size entries per (group, partition).
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if from_ < 0:
        raise ValueError(f"from_ must be >= 0, got {from_}")
    gcols = list(group_cols or [])
    keep = from_ + size
    key = F.round(F.col(sort_col).cast("double"), 9)
    entry = F.struct(
        (key if ascending else -key).alias("k"),
        F.col(order_col).alias("o"),
        F.col(sort_col).alias("v"),
    )
    local = (
        series_df.withColumn("part", F.spark_partition_id())
        .groupBy(*gcols, "part")
        .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, keep).alias("c"))
    )
    if gcols:
        merged = local.groupBy(*gcols)
    else:
        # non-foldable constant key (see pipeline_aggs' notes)
        merged = local.groupBy(
            F.when(F.col("part").isNotNull(), F.lit(0)).alias("__g")
        )
    top = merged.agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("c"))), 1, keep
        ).alias("top")
    )
    out = top.select(
        *gcols, F.posexplode("top").alias("pos", "s")
    ).select(
        *gcols,
        F.col("s.o").alias(order_col),
        F.col("s.v").alias(sort_col),
        (F.col("pos") + 1).cast("int").alias("bucket_rank"),
    )
    return out.filter(F.col("bucket_rank") > from_)


def serial_diff(
    series_df: DataFrame,
    lag: int = 1,
    value_col: str = "doc_count",
    order_col: str = "bucket",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """ES ``serial_diff`` pipeline aggregation: ``value − value[lag
    buckets earlier]`` within each group's ordered bucket series —
    the seasonal-differencing cousin of :func:`pipeline_aggs`'s
    ``derivative`` (which is the ``lag=1`` special case). Each group's
    first ``lag`` buckets emit NULL (ES emits no value there).

    Scale shape: one ``lag`` over the same partitioned-ordered window
    as :func:`pipeline_aggs` — group-partitioned (or the non-foldable
    constant for a global series), streaming within the sorted
    partition, bounded by the histogram breaker.
    """
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    gcols = list(group_cols or [])
    if gcols:
        part = [F.col(c) for c in gcols]
    else:
        part = [F.when(F.col(order_col).isNotNull(), F.lit(0))]
    ordered = Window.partitionBy(*part).orderBy(F.col(order_col).asc())
    v = F.col(value_col)
    return series_df.select(
        *gcols,
        order_col,
        value_col,
        (v - F.lag(v, lag).over(ordered)).cast("long").alias(
            "serial_diff"
        ),
    )


def duckdb_serial_diff_sql(
    series_sql: str,
    lag: int = 1,
    value_col: str = "doc_count",
    order_col: str = "bucket",
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`serial_diff`."""
    gcols = list(group_cols or [])
    part = f"PARTITION BY {', '.join(gcols)} " if gcols else ""
    gsel = "".join(f"{c}, " for c in gcols)
    return f"""
WITH series AS ({series_sql})
SELECT {gsel}{order_col}, {value_col},
       ({value_col} - lag({value_col}, {int(lag)}) OVER (
         {part}ORDER BY {order_col} ASC
       ))::BIGINT AS serial_diff
FROM series
"""


_NORM_METHODS = ("rescale_0_1", "percent_of_sum", "zscore", "softmax")


def normalize_buckets(
    series_df: DataFrame,
    method: str,
    value_col: str = "doc_count",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """ES ``normalize`` pipeline aggregation: rescale each group's
    bucket values by a whole-series statistic. Pinned methods
    (cross-engine, re-derived in :func:`duckdb_normalize_sql`):

    - ``rescale_0_1`` = ``(v - min) / (max - min)``; NULL when the
      series is constant (zero range — ES's divide-by-zero hole,
      pinned NULL here);
    - ``percent_of_sum`` = ``v / sum(v)``; NULL when the sum is 0;
    - ``zscore`` = ``(v - avg) / stddev_pop``; NULL when the stddev
      is 0;
    - ``softmax`` = ``exp(v) / sum(exp(v))`` (bounded inputs only —
      counts beyond ~700 overflow DOUBLE exp; the histogram series
      this runs on are doc counts of that magnitude in pathological
      corpora, caller's guard).

    Scale shape: ONE window aggregate over the full group partition
    (bounded by the histogram breaker) computing the series statistics
    alongside each row — no second pass, no join; group-partitioned
    (non-foldable constant for a global series).
    """
    if method not in _NORM_METHODS:
        raise ValueError(
            f"method must be one of {_NORM_METHODS}, got {method!r}"
        )
    gcols = list(group_cols or [])
    if gcols:
        part = [F.col(c) for c in gcols]
    else:
        part = [F.when(F.col(value_col).isNotNull(), F.lit(0))]
    whole = Window.partitionBy(*part)
    v = F.col(value_col).cast("double")
    if method == "rescale_0_1":
        norm = F.try_divide(
            v - F.min(v).over(whole),
            F.max(v).over(whole) - F.min(v).over(whole),
        )
    elif method == "percent_of_sum":
        norm = F.try_divide(v, F.sum(v).over(whole))
    elif method == "zscore":
        norm = F.try_divide(
            v - F.avg(v).over(whole), F.stddev_pop(v).over(whole)
        )
    else:  # softmax
        norm = F.try_divide(F.exp(v), F.sum(F.exp(v)).over(whole))
    return series_df.select(
        "*", norm.cast("double").alias("normalized")
    )


def duckdb_normalize_sql(
    series_sql: str,
    method: str,
    value_col: str = "doc_count",
    order_col: str = "bucket",
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`normalize_buckets` — the same whole-
    partition window statistics; DuckDB raises on /0 where Spark's
    try_divide yields NULL, so every denominator routes through
    nullif."""
    if method not in _NORM_METHODS:
        raise ValueError(
            f"method must be one of {_NORM_METHODS}, got {method!r}"
        )
    gcols = list(group_cols or [])
    part = (
        f"PARTITION BY {', '.join(gcols)}" if gcols else "PARTITION BY 1"
    )
    gsel = "".join(f"{c}, " for c in gcols)
    v = f"CAST({value_col} AS DOUBLE)"
    if method == "rescale_0_1":
        expr = (
            f"({v} - min({v}) OVER w)"
            f" / nullif(max({v}) OVER w - min({v}) OVER w, 0)"
        )
    elif method == "percent_of_sum":
        expr = f"{v} / nullif(sum({v}) OVER w, 0)"
    elif method == "zscore":
        expr = (
            f"({v} - avg({v}) OVER w)"
            f" / nullif(stddev_pop({v}) OVER w, 0)"
        )
    else:
        expr = f"exp({v}) / nullif(sum(exp({v})) OVER w, 0)"
    return f"""
WITH series AS ({series_sql})
SELECT {gsel}{order_col}, {value_col},
       ({expr})::DOUBLE AS normalized
FROM series
WINDOW w AS ({part})
"""


def cumulative_cardinality(
    events_df: DataFrame,
    unit: str,
    key_col: str,
    time_col: str = "ts",
    max_buckets: int = 65536,
) -> DataFrame:
    """ES ``cumulative_cardinality`` pipeline aggregation: per
    date-histogram bucket, the number of DISTINCT keys seen in ANY
    bucket up to and including it — the "total users to date" curve
    (ES runs it on merged HLL sketches and is approximate; this is
    EXACT, the engine's percentiles-agg precedent).

    Pinned semantics (re-derived in
    :func:`duckdb_cumulative_cardinality_sql`): NULL keys and NULL
    timestamps are excluded; buckets zero-fill between the first and
    last event (the :func:`date_histogram` shape), so a bucket with no
    NEW keys still emits the running total.

    Scale shape: a key appears in the distinct-reduction ONCE (groupBy
    key → min bucket — the heavy shuffle, keyed uniformly by the key
    column); first-seen counts per bucket are then
    histogram-cardinality rows, and the running sum is one ordered
    window over the bounded zero-filled series. State never holds a
    key set — cardinality folds to counts before the window.
    """
    shape = date_histogram(
        events_df, unit, time_col=time_col, max_buckets=max_buckets
    )
    first_seen = (
        events_df.filter(
            F.col(key_col).isNotNull() & F.col(time_col).isNotNull()
        )
        .groupBy(F.col(key_col))
        .agg(
            F.min(F.date_trunc(unit, F.col(time_col))).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_keys"))
    )
    joined = shape.join(first_seen, "bucket", "left").select(
        "bucket",
        "doc_count",
        F.coalesce(F.col("new_keys"), F.lit(0)).cast("long").alias(
            "new_keys"
        ),
    )
    ordered = (
        Window.partitionBy(
            F.when(F.col("bucket").isNotNull(), F.lit(0))
        )
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "bucket",
        "doc_count",
        "new_keys",
        F.sum("new_keys").over(ordered).cast("long").alias(
            "cumulative_cardinality"
        ),
    )


def duckdb_cumulative_cardinality_sql(
    table: str,
    unit: str,
    key_col: str,
    time_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`cumulative_cardinality`."""
    hist = duckdb_date_histogram_sql(table, unit, time_col=time_col)
    return f"""
WITH shape AS ({hist}),
first_seen AS (
  SELECT bucket, count(*)::BIGINT AS new_keys
  FROM (
    SELECT {key_col}, min(date_trunc('{unit}', {time_col})) AS bucket
    FROM {table}
    WHERE {key_col} IS NOT NULL AND {time_col} IS NOT NULL
    GROUP BY {key_col}
  ) GROUP BY bucket
)
SELECT s.bucket, s.doc_count,
       coalesce(f.new_keys, 0)::BIGINT AS new_keys,
       sum(coalesce(f.new_keys, 0)) OVER (
         ORDER BY s.bucket ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )::BIGINT AS cumulative_cardinality
FROM shape s LEFT JOIN first_seen f ON s.bucket = f.bucket
"""


_BUCKET_SCRIPT_OPS = ("+", "-", "*", "/")


def bucket_script(
    series_df: DataFrame,
    left_col: str,
    op: str,
    right_col: str,
    out_col: str = "script_value",
) -> DataFrame:
    """ES ``bucket_script`` for the binary-arithmetic script family:
    combine two sibling metrics per bucket (``params.a / params.b``
    etc. — the click-through-rate shape; arbitrary Painless is out of
    scope by design, the :func:`bucket_selector` precedent). Division
    by zero and NULL operands yield NULL (ES skips the bucket; NULL
    here keeps the series shape fixed). A plain projection — Catalyst
    folds it into whatever produced the series.
    """
    if op not in _BUCKET_SCRIPT_OPS:
        raise ValueError(
            f"op must be one of {_BUCKET_SCRIPT_OPS}, got {op!r}"
        )
    a = F.col(left_col).cast("double")
    b = F.col(right_col).cast("double")
    if op == "/":
        val = F.try_divide(a, b)
    elif op == "+":
        val = a + b
    elif op == "-":
        val = a - b
    else:
        val = a * b
    return series_df.select(
        "*", val.cast("double").alias(out_col)
    )


_AUTO_DH_LADDER = ("minute", "hour", "day", "week", "month", "year")


def _auto_dh_bucket_count(lo, hi, unit: str) -> int:
    """Zero-filled bucket count between trunc(lo) and trunc(hi)
    inclusive — EXACT integer formulas shared (spelled identically)
    with the SQL twin, so the unit choice is cross-engine."""
    from datetime import datetime, timedelta, timezone

    def _epoch(dt: datetime) -> int:
        return int(dt.replace(tzinfo=timezone.utc).timestamp())

    if unit == "minute":
        return _epoch(hi) // 60 - _epoch(lo) // 60 + 1
    if unit == "hour":
        return _epoch(hi) // 3600 - _epoch(lo) // 3600 + 1
    if unit == "day":
        return _epoch(hi) // 86400 - _epoch(lo) // 86400 + 1
    if unit == "week":
        def monday(d: datetime) -> datetime:
            d0 = d.replace(hour=0, minute=0, second=0, microsecond=0)
            return d0 - timedelta(days=d0.weekday())

        return (_epoch(monday(hi)) - _epoch(monday(lo))) // 604800 + 1
    if unit == "month":
        return (
            (hi.year * 12 + hi.month) - (lo.year * 12 + lo.month) + 1
        )
    return hi.year - lo.year + 1  # year


def auto_date_histogram(
    events_df: DataFrame,
    target_buckets: int,
    time_col: str = "ts",
    group_col: str | None = None,
    max_buckets: int = 65536,
) -> DataFrame:
    """ES ``auto_date_histogram``: pick the FINEST calendar interval
    from the pinned ladder (minute → hour → day → week → month →
    year) whose zero-filled bucket count stays <= ``target_buckets``,
    then emit that :func:`date_histogram` tagged with the chosen unit
    (column ``interval_unit``). If even yearly bucketing exceeds the
    target, yearly is used (ES's coarsest-rung behavior).

    Pinned semantics (cross-engine, re-derived in
    :func:`duckdb_auto_date_histogram_sql`): the bucket count that
    drives the choice is computed from the GLOBAL non-NULL time
    bounds via exact integer formulas (epoch-quotient diffs for the
    fixed-width units, calendar arithmetic for month/year) — one tiny
    bounds aggregate collected driver-side (2 scalars, the lm_buckets
    eager-cut precedent), so the choice is deterministic and the SQL
    twin re-derives it inside the query. With ``group_col`` the unit
    is still chosen from the global bounds (ES picks ONE interval for
    the whole response), then applied per group.

    An events table with no non-NULL timestamps yields no rows.
    """
    if target_buckets < 1:
        raise ValueError(
            f"target_buckets must be >= 1, got {target_buckets}"
        )
    bounds = (
        events_df.filter(F.col(time_col).isNotNull())
        .agg(
            F.min(time_col).alias("lo"), F.max(time_col).alias("hi")
        )
        .collect()[0]
    )
    spark = events_df.sparkSession
    gfield = f"{group_col} STRING, " if group_col else ""
    if bounds["lo"] is None:
        return spark.createDataFrame(
            [],
            f"interval_unit STRING, {gfield}bucket TIMESTAMP, "
            "doc_count LONG",
        )
    unit = _AUTO_DH_LADDER[-1]
    for u in _AUTO_DH_LADDER:
        if _auto_dh_bucket_count(bounds["lo"], bounds["hi"], u) <= (
            target_buckets
        ):
            unit = u
            break
    hist = date_histogram(
        events_df,
        unit,
        time_col=time_col,
        group_col=group_col,
        max_buckets=max_buckets,
    )
    return hist.select(F.lit(unit).alias("interval_unit"), "*")


def duckdb_auto_date_histogram_sql(
    table: str,
    target_buckets: int,
    time_col: str = "ts",
    group_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`auto_date_histogram` — the unit choice is
    re-derived INSIDE the query (same exact integer bucket-count
    formulas over the same global bounds; DuckDB ``//`` floor-divides
    where ``/`` would float-divide), and all six unit histograms union
    behind a filter on the chosen unit."""
    g = f"{group_col}, " if group_col else ""
    branches = "\nUNION ALL\n".join(
        f"SELECT '{u}' AS interval_unit, {g}bucket, doc_count "
        f"FROM ({duckdb_date_histogram_sql(table, u, time_col=time_col, group_col=group_col)})"
        for u in _AUTO_DH_LADDER
    )
    fineness = ", ".join(
        f"('{u}', {i})" for i, u in enumerate(_AUTO_DH_LADDER)
    )
    return f"""
WITH bounds AS (
  SELECT min({time_col}) AS lo, max({time_col}) AS hi
  FROM {table} WHERE {time_col} IS NOT NULL
),
counts AS (
  SELECT u.unit, u.fineness,
    CASE u.unit
      WHEN 'minute' THEN CAST(epoch(hi) AS BIGINT) // 60
                         - CAST(epoch(lo) AS BIGINT) // 60 + 1
      WHEN 'hour' THEN CAST(epoch(hi) AS BIGINT) // 3600
                       - CAST(epoch(lo) AS BIGINT) // 3600 + 1
      WHEN 'day' THEN CAST(epoch(hi) AS BIGINT) // 86400
                      - CAST(epoch(lo) AS BIGINT) // 86400 + 1
      WHEN 'week' THEN (CAST(epoch(date_trunc('week', hi)) AS BIGINT)
                        - CAST(epoch(date_trunc('week', lo)) AS BIGINT))
                       // 604800 + 1
      WHEN 'month' THEN (year(hi) * 12 + month(hi))
                        - (year(lo) * 12 + month(lo)) + 1
      ELSE year(hi) - year(lo) + 1
    END AS n
  FROM (VALUES {fineness}) AS u(unit, fineness), bounds
),
choice AS (
  SELECT coalesce(
    (SELECT unit FROM counts
     WHERE n <= {int(target_buckets)}
     ORDER BY fineness ASC LIMIT 1),
    'year'
  ) AS unit
)
SELECT * FROM (
{branches}
) WHERE interval_unit = (SELECT unit FROM choice)
"""


_RATE_SECONDS = {
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def rate_buckets(
    events_df: DataFrame,
    unit: str,
    rate_unit: str,
    time_col: str = "ts",
    value_col: str | None = None,
    group_col: str | None = None,
    max_buckets: int = 65536,
) -> DataFrame:
    """ES ``rate`` aggregation inside a date histogram: each bucket's
    count (or ``value_col`` sum) rescaled to a per-``rate_unit`` rate
    — "events per hour" on daily buckets.

    Pinned semantics (re-derived in :func:`duckdb_rate_sql`): both
    units must be FIXED-WIDTH (minute/hour/day/week — month/year have
    no constant width, ES rejects most calendar combinations too);
    ``rate = value / (bucket_seconds / rate_seconds)`` exactly; the
    zero-filled histogram shape is :func:`date_histogram`'s. With
    ``value_col``, NULL values contribute 0 (ES sums over present
    values) and the emitted ``value`` is the bucket sum.

    A plain projection over the histogram — no new shuffles.
    """
    for u, role in ((unit, "unit"), (rate_unit, "rate_unit")):
        if u not in _RATE_SECONDS:
            raise ValueError(
                f"{role} must be fixed-width {sorted(_RATE_SECONDS)}, "
                f"got {u!r}"
            )
    hist = date_histogram(
        events_df,
        unit,
        time_col=time_col,
        group_col=group_col,
        max_buckets=max_buckets,
    )
    if value_col is not None:
        gcols = [group_col] if group_col else []
        sums = (
            events_df.filter(F.col(time_col).isNotNull())
            .groupBy(
                *[F.col(c).cast("string").alias(c) for c in gcols],
                F.date_trunc(unit, F.col(time_col)).alias("bucket"),
            )
            .agg(
                F.sum(F.coalesce(F.col(value_col), F.lit(0.0)))
                .cast("double")
                .alias("value")
            )
        )
        hist = hist.join(sums, gcols + ["bucket"], "left").select(
            *gcols,
            "bucket",
            "doc_count",
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
        )
        v = F.col("value")
    else:
        v = F.col("doc_count").cast("double")
    factor = _RATE_SECONDS[unit] / _RATE_SECONDS[rate_unit]
    return hist.select(
        "*", (v / F.lit(float(factor))).alias("rate")
    )


def duckdb_rate_sql(
    table: str,
    unit: str,
    rate_unit: str,
    time_col: str = "ts",
    value_col: str | None = None,
    group_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`rate_buckets`."""
    for u in (unit, rate_unit):
        if u not in _RATE_SECONDS:
            raise ValueError(f"fixed-width units only, got {u!r}")
    hist = duckdb_date_histogram_sql(
        table, unit, time_col=time_col, group_col=group_col
    )
    g = f"{group_col}, " if group_col else ""
    factor = _RATE_SECONDS[unit] / _RATE_SECONDS[rate_unit]
    if value_col is None:
        return f"""
WITH hist AS ({hist})
SELECT {g}bucket, doc_count,
       (doc_count::DOUBLE / {factor!r})::DOUBLE AS rate
FROM hist
"""
    join_g = f"h.{group_col} = s.{group_col} AND " if group_col else ""
    hg = f"h.{group_col}, " if group_col else ""
    sg = f"CAST({group_col} AS VARCHAR) AS {group_col}, " if group_col else ""
    return f"""
WITH hist AS ({hist}),
sums AS (
  SELECT {sg}date_trunc('{unit}', {time_col}) AS bucket,
         sum(coalesce({value_col}, 0.0))::DOUBLE AS value
  FROM {table}
  WHERE {time_col} IS NOT NULL
  GROUP BY {"1, 2" if group_col else "1"}
)
SELECT {hg}h.bucket, h.doc_count,
       coalesce(s.value, 0.0) AS value,
       (coalesce(s.value, 0.0) / {factor!r})::DOUBLE AS rate
FROM hist h
LEFT JOIN sums s ON {join_g}h.bucket = s.bucket
"""


_MOVING_FNS = ("min", "max", "sum", "avg")


def moving_fn(
    series_df: DataFrame,
    fn: str,
    window: int,
    shift: int = 0,
    value_col: str = "doc_count",
    order_col: str = "bucket",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """ES ``moving_fn`` with the built-in function family: apply
    ``min``/``max``/``sum``/``avg`` over a sliding window of PRIOR
    buckets — unlike :func:`pipeline_aggs`'s ``moving_avg`` (which
    pins the trailing-INCLUSIVE window), this is ES-faithful: the
    default window is the ``window`` buckets BEFORE the current one,
    current excluded; ``shift`` slides it forward (``shift=1`` brings
    the current bucket in, ES's documented knob). A bucket whose
    window is empty (the series head) emits NULL.

    Scale shape: one frame over the same group-partitioned ordered
    window as every pipeline agg, bounded by the histogram breaker.
    """
    if fn not in _MOVING_FNS:
        raise ValueError(f"fn must be one of {_MOVING_FNS}, got {fn!r}")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    gcols = list(group_cols or [])
    if gcols:
        part = [F.col(c) for c in gcols]
    else:
        part = [F.when(F.col(order_col).isNotNull(), F.lit(0))]
    frame = (
        Window.partitionBy(*part)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(-window + shift, -1 + shift)
    )
    agg = getattr(F, fn)(F.col(value_col)).over(frame)
    out_type = "double" if fn == "avg" else "long"
    return series_df.select(
        *gcols,
        order_col,
        value_col,
        agg.cast(out_type).alias(f"moving_{fn}"),
    )


def duckdb_moving_fn_sql(
    series_sql: str,
    fn: str,
    window: int,
    shift: int = 0,
    value_col: str = "doc_count",
    order_col: str = "bucket",
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`moving_fn`."""
    if fn not in _MOVING_FNS:
        raise ValueError(f"fn must be one of {_MOVING_FNS}, got {fn!r}")
    gcols = list(group_cols or [])
    part = f"PARTITION BY {', '.join(gcols)} " if gcols else ""
    gsel = "".join(f"{c}, " for c in gcols)
    lo, hi = window - shift, 1 - shift
    # BOTH bounds need the sign flip — shift > window pushes even the
    # lower bound past the current row ('-1 PRECEDING' is invalid SQL)
    lo_frame = f"{lo} PRECEDING" if lo > 0 else f"{-lo} FOLLOWING"
    hi_frame = f"{hi} PRECEDING" if hi > 0 else f"{-hi} FOLLOWING"
    cast = "DOUBLE" if fn == "avg" else "BIGINT"
    return f"""
WITH series AS ({series_sql})
SELECT {gsel}{order_col}, {value_col},
       {fn}({value_col}) OVER (
         {part}ORDER BY {order_col} ASC
         ROWS BETWEEN {lo_frame} AND {hi_frame}
       )::{cast} AS moving_{fn}
FROM series
"""


def date_range_buckets(
    events_df: DataFrame,
    edges: list[str],
    time_col: str = "ts",
) -> DataFrame:
    """Date-range aggregation (Elasticsearch's ``date_range``):
    fixed-shape half-open time buckets ``[from, to)`` with unbounded
    first/last ends, EVERY bucket emitted (zero counts included);
    NULL timestamps excluded. ``edges`` = ascending inner edge
    timestamps as ``'YYYY-MM-DD HH:MM:SS'`` strings.

    Returns (bucket INT, from_ts TIMESTAMP nullable, to_ts TIMESTAMP
    nullable, doc_count LONG).

    Scale shape: one when-chain bucket assignment + one grouped count
    (map-side combine), the literal shape broadcast back — the
    :func:`same_same_spark.operators.facets.range_facets` pattern on
    the time axis.
    """
    if sorted(edges) != list(edges) or len(set(edges)) != len(edges):
        raise ValueError("edges must be strictly ascending and distinct")
    spark = events_df.sparkSession
    ts = F.col(time_col).cast("timestamp")
    rows = events_df.filter(ts.isNotNull()).select(ts.alias("t"))
    bounds: list[str | None] = [None] + list(edges) + [None]
    buckets = [
        (i, bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)
    ]
    bucket_expr = F.lit(len(buckets) - 1)
    for i, (_, _lo, hi) in reversed(list(enumerate(buckets[:-1]))):
        bucket_expr = F.when(
            F.col("t") < F.lit(hi).cast("timestamp"), F.lit(i)
        ).otherwise(bucket_expr)
    counted = (
        rows.withColumn("bucket", bucket_expr)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    shape = spark.createDataFrame(
        [(i, lo, hi) for i, lo, hi in buckets],
        "bucket INT, lo STRING, hi STRING",
    ).select(
        "bucket",
        F.col("lo").cast("timestamp").alias("from_ts"),
        F.col("hi").cast("timestamp").alias("to_ts"),
    )
    return (
        F.broadcast(shape)
        .join(counted, "bucket", "left")
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "from_ts",
            "to_ts",
            F.coalesce(F.col("doc_count"), F.lit(0))
            .cast("long")
            .alias("doc_count"),
        )
    )


def duckdb_date_range_sql(
    table: str,
    edges: list[str],
    time_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`date_range_buckets` (bucket re-derived
    with the independent closed form: count of edges <= t)."""
    bounds: list[str | None] = [None] + list(edges) + [None]
    lits = [
        "NULL" if b is None else f"TIMESTAMP '{b}'" for b in bounds
    ]
    brows = ", ".join(
        f"({i}, CAST({lits[i]} AS TIMESTAMP), "
        f"CAST({lits[i + 1]} AS TIMESTAMP))"
        for i in range(len(bounds) - 1)
    )
    elist = ", ".join(f"TIMESTAMP '{e}'" for e in edges)
    return f"""
WITH rows_ AS (
  SELECT {time_col} AS t FROM {table} WHERE {time_col} IS NOT NULL
),
assigned AS (
  SELECT len(list_filter([{elist}], e -> e <= t)) AS bucket FROM rows_
),
counted AS (
  SELECT bucket, count(*)::BIGINT AS doc_count FROM assigned GROUP BY bucket
),
shape AS (SELECT * FROM (VALUES {brows}) AS s(bucket, from_ts, to_ts))
SELECT s.bucket::INTEGER AS bucket, s.from_ts, s.to_ts,
       coalesce(c.doc_count, 0)::BIGINT AS doc_count
FROM shape s LEFT JOIN counted c ON s.bucket = c.bucket
"""


def change_point(
    series_df: DataFrame,
    value_col: str = "doc_count",
    order_col: str = "bucket",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Change-point detection over a bucketed series (the deterministic
    re-expression of Elasticsearch's ``change_point`` agg — ES runs
    p-value tests whose internals aren't reproducible; this engine
    pins the classical exact criterion instead).

    Pinned semantics (cross-engine, re-derived in
    :func:`duckdb_change_point_sql`):

    - buckets order by ``order_col`` ASC within each group;
    - every split k (1 <= k < n, k = left-segment size) scores
      ``gain(k) = k*(m1-m)^2 + (n-k)*(m2-m)^2`` — the between-segment
      sum of squares (the exact SSE reduction of a two-mean fit);
    - the change point is the FIRST bucket of the right segment at the
      argmax gain, ties broken by the smallest such bucket
      (``round(gain, 9) DESC, change_at ASC``);
    - groups with fewer than 2 buckets emit no row.

    Returns ([group cols...,] change_at = ``order_col``'s type,
    before_mean DOUBLE, after_mean DOUBLE, gain DOUBLE).

    Scale shape: prefix sums over the same partitioned-ordered window
    as :func:`pipeline_aggs` (bounded by the histogram breaker), then
    ONE ``min(struct)`` per group picks the argmax — no second sort,
    no collect.
    """
    gcols = list(group_cols or [])
    if gcols:
        part = [F.col(c) for c in gcols]
    else:
        part = [F.when(F.col(order_col).isNotNull(), F.lit(0))]
    ordered = Window.partitionBy(*part).orderBy(F.col(order_col).asc())
    cum = ordered.rowsBetween(Window.unboundedPreceding, 0)
    whole = Window.partitionBy(*part)
    v = F.col(value_col).cast("double")
    pref = series_df.select(
        *gcols,
        F.col(order_col),
        F.sum(v).over(cum).alias("ls"),
        F.count(F.lit(1)).over(cum).alias("k"),
        F.sum(v).over(whole).alias("ts"),
        F.count(F.lit(1)).over(whole).alias("n"),
        F.lead(F.col(order_col), 1).over(ordered).alias("change_at"),
    ).filter(F.col("k") < F.col("n"))
    m = F.col("ts") / F.col("n")
    m1 = F.col("ls") / F.col("k")
    m2 = (F.col("ts") - F.col("ls")) / (F.col("n") - F.col("k"))
    gain = (
        F.col("k") * (m1 - m) * (m1 - m)
        + (F.col("n") - F.col("k")) * (m2 - m) * (m2 - m)
    )
    scored = pref.select(
        *gcols,
        F.struct(
            (F.lit(0.0) - F.round(gain, 9)).alias("ng"),
            F.col("change_at").alias("change_at"),
            m1.alias("before_mean"),
            m2.alias("after_mean"),
            gain.alias("gain"),
        ).alias("s"),
    )
    if gcols:
        best = scored.groupBy(*gcols).agg(F.min("s").alias("s"))
    else:
        best = scored.agg(F.min("s").alias("s")).filter(
            F.col("s").isNotNull()
        )
    return best.select(
        *gcols,
        F.col("s.change_at").alias("change_at"),
        F.col("s.before_mean").alias("before_mean"),
        F.col("s.after_mean").alias("after_mean"),
        F.col("s.gain").alias("gain"),
    )


def duckdb_change_point_sql(
    series_sql: str,
    value_col: str = "doc_count",
    order_col: str = "bucket",
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`change_point`."""
    gcols = list(group_cols or [])
    part = f"PARTITION BY {', '.join(gcols)} " if gcols else ""
    gsel = "".join(f"{c}, " for c in gcols)
    grp = f"PARTITION BY {', '.join(gcols)}" if gcols else ""
    return f"""
WITH series AS ({series_sql}),
pref AS (
  SELECT {gsel}{order_col},
         sum(CAST({value_col} AS DOUBLE)) OVER (
           {part}ORDER BY {order_col} ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS ls,
         count(*) OVER (
           {part}ORDER BY {order_col} ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS k,
         sum(CAST({value_col} AS DOUBLE)) OVER ({part.strip() or ''}) AS ts,
         count(*) OVER ({part.strip() or ''}) AS n,
         lead({order_col}, 1) OVER (
           {part}ORDER BY {order_col} ASC
         ) AS change_at
  FROM series
),
gains AS (
  SELECT {gsel}change_at,
         ls / k AS before_mean,
         (ts - ls) / (n - k) AS after_mean,
         (k * (ls / k - ts / n) * (ls / k - ts / n)
          + (n - k) * ((ts - ls) / (n - k) - ts / n)
                    * ((ts - ls) / (n - k) - ts / n)) AS gain
  FROM pref WHERE k < n
),
ranked AS (
  SELECT {gsel}change_at, before_mean, after_mean, gain,
         row_number() OVER (
           {grp}
           ORDER BY round(gain, 9) DESC, change_at ASC
         ) AS rn
  FROM gains
)
SELECT {gsel}change_at, before_mean, after_mean, gain
FROM ranked WHERE rn = 1
"""
