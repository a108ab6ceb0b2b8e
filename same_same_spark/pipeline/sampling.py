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
