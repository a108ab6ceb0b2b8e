"""Deterministic sampling for training-data mixes: hash-based fraction
sampling, per-stratum (language / source / domain) rates, and
train/val/test split assignment.

The reference engine has no sampling (it serves top-k queries); these
are the operators a 100-TB pipeline needs to compose a training mix
("3% of web, 30% of code, 3 epochs of wiki") and carve held-out splits.

Design for scale — every operator here is a *stateless per-row filter*:

- the keep/drop decision is ``hash60(seed | id) / 2^60 < fraction`` —
  no shuffle, no sort, no sampling state, no ``sample()``
  non-determinism; it composes with predicate pushdown and partition
  pruning, and re-running on a grown corpus keeps every previously
  kept row (ids hash the same), which makes incremental mixes stable.
- exact-count sampling (``limit(n)`` after a global sort) is
  deliberately NOT offered: a total order over 100 TB is a cluster-wide
  sort for a property ("exactly n rows") training mixes don't need —
  fraction semantics give n·(1 ± ε) with ε → 0 at scale.
- the md5-60bit scheme (:func:`~same_same_spark.pipeline.dedup.hash60_col`)
  is computed bit-identically by Spark and DuckDB, so every operator is
  oracle-checkable: both engines keep literally the same rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from same_same_spark.pipeline.dedup import hash60_col, hash60_sql

_DENOM = float(2**60)


def _sql_lit(s: str) -> str:
    """A DuckDB single-quoted string literal (quotes doubled)."""
    return "'" + s.replace("'", "''") + "'"


def hash_uniform_col(key: Column | str, seed: str = "") -> Column:
    """Deterministic uniform in [0, 1) from a row key.

    ``hash60(seed || '|' || key) / 2^60`` — the same bigint and the
    same IEEE division in both engines, so thresholds compare
    identically (no epsilon needed).
    """
    c = F.col(key) if isinstance(key, str) else key
    return hash60_col(F.concat(F.lit(seed + "|"), c.cast("string"))) / F.lit(
        _DENOM
    )


def hash_uniform_sql(key_expr: str, seed: str = "") -> str:
    """DuckDB twin of :func:`hash_uniform_col`."""
    h = hash60_sql(f"{_sql_lit(seed + '|')} || ({key_expr})::VARCHAR")
    return f"({h} / {2**60}.0)"


def sample_fraction(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, keyed by ``id_col``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_uniform_col(id_col, seed) < F.lit(fraction))


def stratum_fraction_col(
    strata_col: Column | str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> Column:
    """Per-row sampling rate looked up from the stratum value."""
    c = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    out = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        out = F.when(c == value, F.lit(float(frac))).otherwise(out)
    return out


def sample_stratified(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the training-mix operator:
    ``fractions`` maps stratum value → keep rate; strata not listed get
    ``default_fraction``. Pure filter: no shuffle at any scale."""
    rate = stratum_fraction_col(strata_col, fractions, default_fraction)
    return df.filter(hash_uniform_col(id_col, seed) < rate)


def sample_stratified_sql(
    strata_expr: str,
    id_expr: str,
    fractions: dict[str, float],
    seed: str = "",
    default_fraction: float = 0.0,
) -> str:
    """DuckDB twin of the :func:`sample_stratified` WHERE clause."""
    rate = repr(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        rate = (
            f"CASE WHEN {strata_expr} = {_sql_lit(value)} THEN {float(frac)!r} "
            f"ELSE {rate} END"
        )
    return f"{hash_uniform_sql(id_expr, seed)} < ({rate})"


def sample_quota(
    df: DataFrame,
    quotas: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "",
    weight_col: str | None = None,
    default_keep: bool = True,
) -> DataFrame:
    """Budget-capped sampling: keep each stratum under a QUOTA — a doc
    count (``weight_col=None``) or any additive budget such as total
    tokens (``weight_col="n_tokens"``). This is how real mixes are
    specified ("at most 50 B tokens of web, all of wiki").

    Two passes, both cheap: (1) one groupBy(strata) totals pass (rows
    = #strata, broadcastable), (2) the same zero-shuffle hash filter
    as :func:`sample_stratified` with per-stratum rate
    ``min(1, quota / total)``. Expected kept weight ≈ quota; exact
    caps would need a per-stratum total order (a cluster-wide sort
    whose determinism mixes don't require). Strata without a quota —
    including a NULL stratum value (the join is null-safe) — are kept
    whole (``default_keep=True``) or dropped. A QUOTED stratum whose
    total weight is NULL or ≤ 0 (e.g. every weight NULL after an
    upstream failure) keeps NOTHING: an unverifiable budget must not
    silently bypass the cap. Deterministic in (seed, id): growing the
    corpus only dilutes rates, it never un-keeps a kept doc for an
    unchanged stratum total. ``strata_col``/``id_col`` are bare column
    names (not expressions), as in the SQL twin.
    """
    w = (
        F.lit(1.0)
        if weight_col is None
        else F.col(weight_col).cast("double")
    )
    totals = (
        df.groupBy(F.col(strata_col).alias("_stratum"))
        .agg(F.sum(w).alias("_total"))
    )
    rate = F.lit(None).cast("double")
    for value, quota in sorted(quotas.items()):
        if quota < 0:
            raise ValueError(f"quota for {value!r} must be >= 0")
        rate = F.when(
            F.col("_stratum") == value,
            F.when(
                F.col("_total").isNull() | (F.col("_total") <= 0),
                F.lit(0.0),
            ).otherwise(
                F.least(F.lit(1.0), F.lit(float(quota)) / F.col("_total"))
            ),
        ).otherwise(rate)
    rates = totals.select(
        "_stratum", F.coalesce(rate, F.lit(1.0 if default_keep else 0.0))
        .alias("_rate")
    )
    joined = df.join(
        F.broadcast(rates),
        df[strata_col].eqNullSafe(rates["_stratum"]),
        "left",
    )
    return (
        joined.filter(
            hash_uniform_col(F.col(id_col), seed)
            < F.coalesce(F.col("_rate"), F.lit(0.0))
        )
        .drop("_stratum", "_rate")
    )


def sample_quota_sql(
    rel: str,
    quotas: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "",
    weight_expr: str | None = None,
    default_keep: bool = True,
) -> str:
    """DuckDB twin of :func:`sample_quota` (full SELECT over ``rel``).

    ``strata_col``/``id_col`` are bare COLUMN NAMES (they get
    ``d.``-qualified in the join); ``weight_expr`` may be any
    expression over ``rel``'s columns.
    """
    for name, val in (("strata_col", strata_col), ("id_col", id_col)):
        if not val.isidentifier():
            raise ValueError(
                f"{name} must be a bare column name, got {val!r}"
            )
    w = "1.0" if weight_expr is None else f"({weight_expr})::DOUBLE"
    rate = "NULL"
    for value, quota in sorted(quotas.items()):
        rate = (
            f"CASE WHEN _stratum = {_sql_lit(value)} THEN "
            f"(CASE WHEN _total IS NULL OR _total <= 0 THEN 0.0 "
            f"ELSE least(1.0, {float(quota)!r} / _total) END) "
            f"ELSE {rate} END"
        )
    default = "1.0" if default_keep else "0.0"
    return f"""
WITH totals AS (
  SELECT {strata_col} AS _stratum, sum({w}) AS _total
  FROM {rel} GROUP BY 1
),
rates AS (
  SELECT _stratum, coalesce({rate}, {default}) AS _rate FROM totals
)
SELECT d.* FROM {rel} d
LEFT JOIN rates r ON d.{strata_col} IS NOT DISTINCT FROM r._stratum
WHERE {hash_uniform_sql('d.' + id_col, seed)} < coalesce(r._rate, 0.0)
"""


def sample_host_cap(
    df: DataFrame,
    cap: float,
    url_col: str = "url",
    id_col: str = "doc_id",
    seed: str = "",
    weight_col: str | None = None,
    keep_unknown: bool = True,
) -> DataFrame:
    """Uniform per-domain budget over canonical URL hosts — the
    RefinedWeb/C4 crawl policy "no single domain may exceed N docs /
    N tokens", applied to EVERY host (unlike :func:`sample_quota`,
    which caps only the strata named in its dict).

    Two passes: (1) one groupBy(host) totals pass — cardinality =
    #registrable hosts, millions at crawl scale, so the rate table is
    JOINED (not broadcast; AQE picks broadcast when it happens to be
    small and handles the hot-host skew the join key inherits), and
    (2) the same zero-state hash filter as the other samplers with
    per-host rate ``min(1, cap / total)``. Expected kept weight per
    host ≈ ``cap``. A host whose total weight is NULL or ≤ 0 keeps
    nothing (an unverifiable budget must not bypass the cap — the
    :func:`sample_quota` rule). Rows whose URL yields no host (NULL
    url, no authority) can't be attributed to a domain: kept whole by
    default, dropped with ``keep_unknown=False``. Deterministic in
    (seed, id): growth in OTHER hosts never un-keeps a kept doc.

    Returns the surviving rows with an added ``url_host`` column (feed
    it onward as a stratum). ``url_col``/``id_col`` are bare column
    names, as in the SQL twin :func:`sample_host_cap_sql`.
    """
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    if "url_host" in df.columns:
        # the SQL twin's `SELECT *, ... AS url_host` would error here;
        # silently replacing a caller's column must not diverge from it
        raise ValueError("input already has a url_host column")
    from same_same_spark.pipeline.urls import url_host_col

    w = (
        F.lit(1.0)
        if weight_col is None
        else F.col(weight_col).cast("double")
    )
    base = df.withColumn("url_host", url_host_col(url_col))
    unknown = F.col("url_host").isNull() | (F.col("url_host") == "")
    known = base.filter(~unknown)
    totals = known.groupBy(F.col("url_host").alias("_host")).agg(
        F.sum(w).alias("_total")
    )
    rates = totals.select(
        "_host",
        F.when(
            F.col("_total").isNull() | (F.col("_total") <= 0), F.lit(0.0)
        )
        .otherwise(
            F.least(F.lit(1.0), F.lit(float(cap)) / F.col("_total"))
        )
        .alias("_rate"),
    )
    kept = (
        known.join(rates, known["url_host"] == rates["_host"])
        .filter(hash_uniform_col(F.col(id_col), seed) < F.col("_rate"))
        .drop("_host", "_rate")
    )
    if keep_unknown:
        return kept.unionByName(base.filter(unknown))
    return kept


def sample_host_cap_sql(
    rel: str,
    cap: float,
    url_col: str = "url",
    id_col: str = "doc_id",
    seed: str = "",
    weight_expr: str | None = None,
    keep_unknown: bool = True,
) -> str:
    """DuckDB twin of :func:`sample_host_cap` (full SELECT over
    ``rel``, which may be a parenthesized subquery). Emits ``rel``'s
    columns plus ``url_host``."""
    for name, val in (("url_col", url_col), ("id_col", id_col)):
        if not val.isidentifier():
            raise ValueError(
                f"{name} must be a bare column name, got {val!r}"
            )
    from same_same_spark.pipeline.urls import url_host_sql

    w = "1.0" if weight_expr is None else f"({weight_expr})::DOUBLE"
    unknown = (
        f"UNION ALL SELECT * FROM b WHERE url_host IS NULL "
        f"OR url_host = ''"
        if keep_unknown
        else ""
    )
    return f"""
WITH b AS (
  SELECT *, {url_host_sql(url_col)} AS url_host FROM {rel}
),
known AS (
  SELECT * FROM b WHERE url_host IS NOT NULL AND url_host <> ''
),
rates AS (
  SELECT url_host AS _host,
         CASE WHEN sum({w}) IS NULL OR sum({w}) <= 0 THEN 0.0
              ELSE least(1.0, {float(cap)!r} / sum({w})) END AS _rate
  FROM known GROUP BY 1
)
SELECT k.* FROM known k JOIN rates r ON k.url_host = r._host
WHERE {hash_uniform_sql('k.' + id_col, seed)} < r._rate
{unknown}
"""


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    test_frac: float = 0.1,
    val_frac: float = 0.1,
    seed: str = "split",
) -> DataFrame:
    """Add a ``split`` column (train/val/test) by hash thresholding:
    u < test_frac → test, u < test_frac + val_frac → val, else train.
    Membership is a pure function of (seed, id): stable across runs,
    re-partitioning, and corpus growth — a doc never migrates between
    splits, which is the property held-out sets actually require."""
    if test_frac < 0 or val_frac < 0 or test_frac + val_frac > 1:
        raise ValueError("need test_frac, val_frac >= 0 and sum <= 1")
    u = hash_uniform_col(id_col, seed)
    return df.withColumn(
        "split",
        F.when(u < F.lit(test_frac), F.lit("test"))
        .when(u < F.lit(test_frac + val_frac), F.lit("val"))
        .otherwise(F.lit("train")),
    )


def assign_splits_sql(
    id_expr: str,
    test_frac: float = 0.1,
    val_frac: float = 0.1,
    seed: str = "split",
) -> str:
    """DuckDB twin of the :func:`assign_splits` split expression."""
    u = hash_uniform_sql(id_expr, seed)
    return (
        f"CASE WHEN {u} < {float(test_frac)!r} THEN 'test' "
        f"WHEN {u} < {float(test_frac + val_frac)!r} THEN 'val' "
        f"ELSE 'train' END"
    )


# ---------------------------------------------------------------------------
# Language-mixture sampling: mC4 temperature (alpha) + UniMax waterfilling
# ---------------------------------------------------------------------------

def _mix_groups(
    df: DataFrame, strata_col: str, weight_col: str | None
) -> list[tuple[object, float]]:
    """Collect the bounded (stratum, total_weight) table, sorted by
    ``(stratum ASC, NULLS FIRST)`` — the ONE pinned order every float
    fold below walks, so driver math and the SQL twins agree
    term-for-term. Groups with NULL/non-positive totals are kept in
    the list (allocators rate them 0 — the unverifiable-budget rule).
    """
    w = (
        F.lit(1.0)
        if weight_col is None
        else F.col(weight_col).cast("double")
    )
    rows = (
        df.groupBy(F.col(strata_col).alias("_stratum"))
        .agg(F.sum(w).alias("_total"))
        .collect()
    )
    # native value ordering (NULL first) — matches the SQL twins'
    # ORDER BY _stratum ASC NULLS FIRST for strings AND numerics
    # (the second key is only ever compared among non-None values)
    return sorted(
        ((r["_stratum"], r["_total"]) for r in rows),
        key=lambda kv: (kv[0] is not None, kv[0]),
    )


def mix_allocation(
    df: DataFrame,
    budget: float,
    allocator: str = "temperature",
    alpha: float = 0.3,
    strata_col: str = "lang",
    weight_col: str | None = None,
) -> list[tuple[object, float, float]]:
    """Per-stratum sampling allocation for a weight ``budget`` —
    the multilingual-mixing step every large pretraining corpus runs.

    Allocators (both public algorithms):

    - ``"temperature"`` — mC4/XLM-R alpha-sampling (Xue et al. 2021;
      Conneau et al. 2020): stratum share ``q_g = c_g^alpha / Z`` with
      ``Z = sum_h c_h^alpha`` folded SEQUENTIALLY over the pinned
      stratum order; budget ``b_g = budget * q_g``; rate
      ``min(1, budget * c_g^alpha / Z / c_g)`` (expression order
      pinned). ``alpha`` < 1 up-samples low-resource strata; 1 =
      proportional; 0 = equal budgets.
    - ``"unimax"`` — UniMax (Chung et al. 2023) with max one epoch
      (docs can't repeat in a sample): waterfill ascending totals —
      every stratum gets ``min(c_g, t)`` where the threshold ``t``
      makes the budgets sum to ``budget``; small strata keep
      everything, the cap binds only on large ones. Closed form over
      the sorted prefix sums (see the SQL twin); with integer-valued
      weights every number here is EXACT (prefix sums < 2^53).

    Strata with NULL or non-positive totals get rate 0 (the
    :func:`sample_quota` unverifiable-budget rule); a NULL stratum
    value is its own group. Returns [(stratum, total, rate)] in the
    pinned stratum order — the bounded table callers broadcast.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if allocator not in ("temperature", "unimax"):
        raise ValueError(f"unknown allocator {allocator!r}")
    import math as _math

    groups = _mix_groups(df, strata_col, weight_col)
    live = [(s, t) for s, t in groups if t is not None and t > 0]
    dead = [(s, t) for s, t in groups if t is None or t <= 0]
    out: dict[object, float] = {s: 0.0 for s, _ in dead}
    U = float(budget)
    if allocator == "temperature":
        a = float(alpha)
        z = 0.0
        for _s, t in live:  # pinned stratum order
            z = z + _math.pow(t, a)
        for s, t in live:
            out[s] = min(1.0, U * _math.pow(t, a) / z / t)
    else:
        # sort ascending by (total, stratum) — the waterfilling order
        asc = sorted(
            live, key=lambda kv: (kv[1], kv[0] is not None, kv[0])
        )
        k = len(asc)
        # full-keep prefix: group i (1-based) keeps everything iff
        # c_i * (k - i + 1) <= U - P_{i-1}  (P = running prefix sum)
        P = 0.0
        j = 0
        Pj = 0.0
        for i, (_s, c) in enumerate(asc, start=1):
            if c * (k - i + 1) <= U - P:
                j = i
                Pj = P + c
            P = P + c
        for i, (s, c) in enumerate(asc, start=1):
            if i <= j:
                out[s] = 1.0
            elif j == k:
                out[s] = 1.0
            else:
                t = (U - Pj) / (k - j)
                out[s] = min(1.0, t / c)
    totals = dict(groups)
    return [(s, totals[s], out[s]) for s, _t in groups]


def sample_language_mix(
    df: DataFrame,
    budget: float,
    allocator: str = "temperature",
    alpha: float = 0.3,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "",
    weight_col: str | None = None,
) -> DataFrame:
    """Sample the corpus to a language mixture (see
    :func:`mix_allocation`): the bounded rate table broadcast-joins
    back (null-safe) and the same zero-state hash filter as
    :func:`sample_stratified` keeps each row iff
    ``hash_uniform(seed, id) < rate`` — deterministic in (seed, id),
    one totals pass + one filter pass, no second shuffle.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = df.sparkSession
    alloc = mix_allocation(
        df, budget, allocator=allocator, alpha=alpha,
        strata_col=strata_col, weight_col=weight_col,
    )
    # rate table typed from the DATAFRAME's stratum field — a
    # hardcoded STRING would silently mis-join non-string strata
    stratum_field = df.schema[strata_col]
    rates = spark.createDataFrame(
        [(s, r) for s, _t, r in alloc],
        StructType([
            StructField("_stratum", stratum_field.dataType, True),
            StructField("_rate", DoubleType(), False),
        ]),
    )
    joined = df.join(
        F.broadcast(rates),
        df[strata_col].eqNullSafe(rates["_stratum"]),
        "left",
    )
    return (
        joined.filter(
            hash_uniform_col(F.col(id_col), seed)
            < F.coalesce(F.col("_rate"), F.lit(0.0))
        )
        .drop("_stratum", "_rate")
    )


def _mix_totals_cte(
    rel: str, strata_col: str, weight_expr: str | None
) -> str:
    w = "1.0" if weight_expr is None else f"({weight_expr})::DOUBLE"
    return (
        f"totals AS (\n"
        f"  SELECT {strata_col} AS _stratum, sum({w}) AS _total\n"
        f"  FROM {rel} GROUP BY 1\n"
        f")"
    )


def temperature_rates_sql(
    rel: str,
    budget: float,
    alpha: float = 0.3,
    strata_col: str = "lang",
    weight_expr: str | None = None,
) -> str:
    """DuckDB twin of ``mix_allocation(allocator='temperature')`` —
    re-derives Z with a SEQUENTIAL fold over the pinned stratum order
    (``list_aggregate`` of the ordered list; the driver's python loop
    folds identically), rates with the pinned expression order.
    Returns (stratum, total, rate) rows."""
    U = float(budget)
    a = float(alpha)
    return f"""
WITH {_mix_totals_cte(rel, strata_col, weight_expr)},
z AS (
  SELECT list_aggregate(
    list(pow(_total, {a!r}) ORDER BY _stratum ASC NULLS FIRST), 'sum'
  ) AS z
  FROM totals WHERE _total IS NOT NULL AND _total > 0
)
SELECT t._stratum AS stratum, t._total AS total,
       CASE WHEN t._total IS NULL OR t._total <= 0 THEN 0.0
            ELSE least(1.0, {U!r} * pow(t._total, {a!r}) / z.z / t._total)
       END AS rate
FROM totals t CROSS JOIN z
ORDER BY t._stratum ASC NULLS FIRST
"""


def unimax_rates_sql(
    rel: str,
    budget: float,
    strata_col: str = "lang",
    weight_expr: str | None = None,
) -> str:
    """DuckDB twin of ``mix_allocation(allocator='unimax')`` — the
    waterfilling threshold re-derived via sorted prefix sums:
    full-keep iff ``c_i * (k - i + 1) <= U - P_{i-1}``, then
    ``t = (U - P_j) / (k - j)``. Returns (stratum, total, rate)."""
    U = float(budget)
    return f"""
WITH {_mix_totals_cte(rel, strata_col, weight_expr)},
live AS (
  SELECT _stratum, _total FROM totals
  WHERE _total IS NOT NULL AND _total > 0
),
ordered AS (
  SELECT _stratum, _total,
         row_number() OVER (
           ORDER BY _total ASC, _stratum ASC NULLS FIRST
         ) AS i,
         sum(_total) OVER (
           ORDER BY _total ASC, _stratum ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS p,
         count(*) OVER () AS k
  FROM live
),
marked AS (
  SELECT *, (_total * (k - i + 1) <= {U!r} - (p - _total)) AS full_keep
  FROM ordered
),
thresh AS (
  SELECT coalesce(max(i) FILTER (full_keep), 0) AS j,
         coalesce(max(p) FILTER (full_keep), 0.0) AS pj,
         max(k) AS k
  FROM marked
)
SELECT t._stratum AS stratum, t._total AS total,
       CASE WHEN t._total IS NULL OR t._total <= 0 THEN 0.0
            WHEN m.i <= th.j OR th.j = th.k THEN 1.0
            ELSE least(1.0, (({U!r} - th.pj) / (th.k - th.j)) / t._total)
       END AS rate
FROM totals t
LEFT JOIN marked m ON t._stratum IS NOT DISTINCT FROM m._stratum
CROSS JOIN thresh th
ORDER BY t._stratum ASC NULLS FIRST
"""


def sample_language_mix_sql(
    rel: str,
    budget: float,
    allocator: str = "temperature",
    alpha: float = 0.3,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "",
    weight_expr: str | None = None,
) -> str:
    """DuckDB twin of :func:`sample_language_mix` (full SELECT)."""
    if allocator == "temperature":
        rates = temperature_rates_sql(
            rel, budget, alpha=alpha, strata_col=strata_col,
            weight_expr=weight_expr,
        )
    else:
        rates = unimax_rates_sql(
            rel, budget, strata_col=strata_col, weight_expr=weight_expr
        )
    return f"""
WITH rates AS ({rates})
SELECT d.* FROM {rel} d
LEFT JOIN rates r ON d.{strata_col} IS NOT DISTINCT FROM r.stratum
WHERE {hash_uniform_sql('d.' + id_col, seed)} < coalesce(r.rate, 0.0)
"""
