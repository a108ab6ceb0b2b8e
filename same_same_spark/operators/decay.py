"""Function-score decay — Elasticsearch's ``function_score`` decay
family (``gauss`` / ``exp`` / ``linear``) over an arbitrary numeric
field, multiplied into the BM25 relevance score.

A beyond-reference fulltext feature generalizing the engine's X7
temporal decay (``operators/temporal.py`` — exponential over event
AGE with its own half-life parameterization) to ES's three
origin/scale/offset/decay-parameterized shapes over ANY numeric
column ("prefer docs near 500 chars", "downrank far-away prices").

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_decay_sql`; all ES formulas verbatim):

- ``d = max(0, |v - origin| - offset)`` — inside the offset radius the
  multiplier is exactly 1;
- ``gauss``:  ``exp(-d^2 / (2 sigma^2))`` with
  ``sigma^2 = -scale^2 / (2 ln(decay))``;
- ``exp``:    ``exp(lambda d)`` with ``lambda = ln(decay) / scale``;
- ``linear``: ``max(0, (s - d) / s)`` with ``s = scale / (1 - decay)``;
- each shape satisfies the family contract multiplier(origin ± scale +
  offset) == decay;
- a NULL field value decays by exactly 1.0 (ES: docs missing the field
  are unaffected);
- final = ``bm25 · multiplier``, pinned total order
  ``(round(final, 9) DESC, doc_id ASC)``, top-k.

The shape constants (sigma^2 / lambda / s) are computed DRIVER-SIDE in
Python and embedded as double literals in both engines, so the column
expression is the same closed form on both sides.

Scale shape: the decay is one column expression on the scored match
set — zero extra joins, zero extra shuffles on top of the BM25 plan;
ranking through the bounded tournament.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT, scored_matches
from same_same_spark.operators.topk import topk_per_query

_FNS = ("gauss", "exp", "linear")


def _shape_const(fn: str, scale: float, decay: float) -> float:
    """The per-shape constant, ES's formulas verbatim."""
    if fn == "gauss":
        return -(scale * scale) / (2.0 * math.log(decay))  # sigma^2
    if fn == "exp":
        return math.log(decay) / scale  # lambda
    return scale / (1.0 - decay)  # linear: s


def decay_multiplier_col(
    v, origin: float, scale: float, offset: float, decay: float, fn: str
):
    """The decay multiplier as a Spark column over ``v`` (NULL → 1.0)."""
    c = float(_shape_const(fn, scale, decay))
    d = F.greatest(
        F.lit(0.0), F.abs(v - F.lit(float(origin))) - F.lit(float(offset))
    )
    if fn == "gauss":
        m = F.exp(-(d * d) / F.lit(2.0 * c))
    elif fn == "exp":
        m = F.exp(F.lit(c) * d)
    else:
        m = F.greatest(F.lit(0.0), (F.lit(c) - d) / F.lit(c))
    return F.when(v.isNull(), F.lit(1.0)).otherwise(m)


def decay_score(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
    fn: str = "gauss",
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k BM25 × decay for (query_id, text) queries.

    Returns (query_id INT, doc_id, score DOUBLE, bm25 DOUBLE,
    multiplier DOUBLE, rank INT).
    """
    if fn not in _FNS:
        raise ValueError(f"fn must be one of {_FNS}, got {fn!r}")
    if not scale > 0:
        raise ValueError("scale must be > 0")
    if not 0.0 < decay < 1.0:
        raise ValueError("decay must be in (0, 1)")
    if offset < 0:
        raise ValueError("offset must be >= 0")
    scored = scored_matches(
        docs_df, queries, id_col=id_col, text_col=text_col, k1=k1, b=b
    )
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("double").alias("__v"),
    )
    combined = (
        scored.join(meta, "doc_id")
        .withColumn(
            "multiplier",
            decay_multiplier_col(
                F.col("__v"), origin, scale, offset, decay, fn
            ),
        )
        .withColumn("bm25", F.col("score"))
        .withColumn("score", F.col("bm25") * F.col("multiplier"))
        .select("query_id", "doc_id", "score", "bm25", "multiplier")
    )
    top = topk_per_query(
        combined.select("query_id", "doc_id", "score"), k
    )
    return top.join(
        combined.select("query_id", "doc_id", "bm25", "multiplier"),
        ["query_id", "doc_id"],
    ).select("query_id", "doc_id", "score", "bm25", "multiplier", "rank")


def duckdb_decay_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    value_col: str,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
    fn: str = "gauss",
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`decay_score` — the same driver-computed
    shape constant embedded as a literal, so both engines evaluate one
    identical closed form."""
    from same_same_spark.bm25 import duckdb_scored_sql

    if fn not in _FNS:
        raise ValueError(f"fn must be one of {_FNS}, got {fn!r}")
    c = float(_shape_const(fn, scale, decay))
    d_expr = (
        f"greatest(0.0, abs(CAST(m.{value_col} AS DOUBLE) - "
        f"{float(origin)}) - {float(offset)})"
    )
    if fn == "gauss":
        m_expr = f"exp(-(({d_expr}) * ({d_expr})) / {2.0 * c})"
    elif fn == "exp":
        m_expr = f"exp({c} * ({d_expr}))"
    else:
        m_expr = f"greatest(0.0, ({c} - ({d_expr})) / {c})"
    inner = duckdb_scored_sql(table, id_col, text_col, queries, k1=k1, b=b)
    return f"""
WITH scored AS ({inner}),
combined AS (
  SELECT s.query_id, s.doc_id,
         s.score AS bm25,
         CASE WHEN m.{value_col} IS NULL THEN 1.0
              ELSE {m_expr} END AS multiplier
  FROM scored s JOIN {table} m ON s.doc_id = m.{id_col}
),
final AS (
  SELECT query_id, doc_id, bm25 * multiplier AS score, bm25, multiplier,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(bm25 * multiplier, 9) DESC, doc_id ASC
         ) AS rank
  FROM combined
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       round(bm25, {round_score}) AS bm25,
       round(multiplier, {round_score}) AS multiplier,
       rank::INTEGER AS rank
FROM final WHERE rank <= {k}
"""
