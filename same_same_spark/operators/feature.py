"""Feature-boost queries — ES ``rank_feature`` and ``distance_feature``.

Beyond-reference relevance features (the reference weighs text only —
``internal/storage/search/search.go:16-42``): static document signals
(pagerank-ish scores, lengths, recency) folded into the text score the
way ES's bool-should combine does it:

    score(q, d) = BM25(q, d) + boost * S(feature(d))

with the signal clamped to a bounded contribution so it can tilt but
never drown the text relevance.

Pinned semantics (cross-engine, re-derived in the duckdb twins):

- only docs MATCHING the text query appear (the feature clause alone
  never matches — the standard ``must: text, should: rank_feature``
  shape);
- a NULL feature contributes 0 (the doc still matches the text);
- ``rank_feature`` functions over x = the feature value (ES requires
  positive features; non-positive x contributes 0 like NULL):
  - ``saturation``: S = x / (x + pivot)                (pivot > 0)
  - ``log``:        S = ln(scaling_factor + x)         (factor >= 1)
  - ``sigmoid``:    S = x^a / (x^a + pivot^a)          (a > 0)
- ``distance_feature``: S = pivot / (pivot + |x - origin|) — x may be
  any numeric (epoch micros for dates);
- top-k under the engine's pinned total order.

Scale shape: one ``scored_matches`` plan (broadcast query terms), the
feature joined from the doc side as a column expression (Catalyst
prunes the scan to id + feature), bounded tournament. Zero new
shuffles beyond the match-set aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT, scored_matches
from same_same_spark.operators.topk import topk_per_query

_FUNCTIONS = ("saturation", "log", "sigmoid")


def _rank_feature_S(x: Column, function: str, pivot, exponent) -> Column:
    if function == "saturation":
        return x / (x + F.lit(float(pivot)))
    if function == "log":
        return F.log(F.lit(float(pivot)) + x)
    # sigmoid
    xa = F.pow(x, F.lit(float(exponent)))
    pa = F.lit(float(pivot) ** float(exponent))
    return xa / (xa + pa)


def _boosted(
    docs_df, queries, id_col, text_col, k1, b, contribution: Column, k: int
) -> DataFrame:
    base = scored_matches(
        docs_df, queries, id_col=id_col, text_col=text_col, k1=k1, b=b
    )
    feat = docs_df.select(
        F.col(id_col).alias("doc_id"), contribution.alias("__contrib")
    )
    combined = base.join(feat, "doc_id").select(
        "query_id",
        "doc_id",
        (F.col("score") + F.coalesce(F.col("__contrib"), F.lit(0.0))).alias(
            "score"
        ),
    )
    return topk_per_query(combined, k)


def rank_feature_topk(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    feature_col: str,
    function: str = "saturation",
    pivot: float = 1.0,
    exponent: float = 2.0,
    boost: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k text search boosted by a positive static feature (ES
    ``rank_feature``; see module pin). Returns (query_id INT, doc_id,
    score DOUBLE, rank INT)."""
    if function not in _FUNCTIONS:
        raise ValueError(f"function must be one of {_FUNCTIONS}")
    if pivot <= 0:
        raise ValueError(f"pivot must be > 0, got {pivot}")
    if function == "log" and pivot < 1.0:
        raise ValueError("log scaling_factor (pivot) must be >= 1")
    if function == "sigmoid" and exponent <= 0:
        raise ValueError(f"exponent must be > 0, got {exponent}")
    x = F.col(feature_col).cast("double")
    contrib = F.when(
        x.isNotNull() & (x > 0.0),
        F.lit(float(boost)) * _rank_feature_S(x, function, pivot, exponent),
    ).otherwise(F.lit(0.0))
    return _boosted(
        docs_df, queries, id_col, text_col, k1, b, contrib, k
    )


def distance_feature_topk(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    feature_col: str,
    origin: float,
    pivot: float,
    boost: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k text search boosted by proximity of a numeric field to an
    origin (ES ``distance_feature``; see module pin)."""
    if pivot <= 0:
        raise ValueError(f"pivot must be > 0, got {pivot}")
    x = F.col(feature_col).cast("double")
    contrib = F.when(
        x.isNotNull(),
        F.lit(float(boost))
        * (F.lit(float(pivot)) / (F.lit(float(pivot)) + F.abs(x - F.lit(float(origin))))),
    ).otherwise(F.lit(0.0))
    return _boosted(
        docs_df, queries, id_col, text_col, k1, b, contrib, k
    )


def _duckdb_boosted(
    table: str,
    id_col: str,
    text_col: str,
    queries,
    contrib_sql: str,
    k: int,
    k1: float,
    b: float,
    round_score: int,
) -> str:
    from same_same_spark.bm25 import duckdb_scored_sql

    inner = duckdb_scored_sql(table, id_col, text_col, queries, k1=k1, b=b)
    return f"""
WITH base AS ({inner}),
combined AS (
  SELECT s.query_id, s.doc_id,
         s.score + coalesce({contrib_sql}, 0.0) AS score
  FROM base s JOIN {table} d ON s.doc_id = d.{id_col}
),
ranked AS (
  SELECT query_id, doc_id, score, row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(score, 9) DESC, doc_id ASC
  ) AS rank
  FROM combined
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""


def duckdb_rank_feature_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries,
    feature_col: str,
    function: str = "saturation",
    pivot: float = 1.0,
    exponent: float = 2.0,
    boost: float = 1.0,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`rank_feature_topk`."""
    x = f"CAST(d.{feature_col} AS DOUBLE)"
    if function == "saturation":
        s = f"{x} / ({x} + {float(pivot)!r})"
    elif function == "log":
        s = f"ln({float(pivot)!r} + {x})"
    else:
        s = (
            f"pow({x}, {float(exponent)!r}) / "
            f"(pow({x}, {float(exponent)!r}) + "
            f"{float(pivot) ** float(exponent)!r})"
        )
    contrib = (
        f"CASE WHEN {x} IS NOT NULL AND {x} > 0.0 "
        f"THEN {float(boost)!r} * ({s}) ELSE 0.0 END"
    )
    return _duckdb_boosted(
        table, id_col, text_col, queries, contrib, k, k1, b, round_score
    )


def duckdb_distance_feature_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries,
    feature_col: str,
    origin: float,
    pivot: float,
    boost: float = 1.0,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`distance_feature_topk`."""
    x = f"CAST(d.{feature_col} AS DOUBLE)"
    contrib = (
        f"CASE WHEN {x} IS NOT NULL THEN {float(boost)!r} * "
        f"({float(pivot)!r} / ({float(pivot)!r} + "
        f"abs({x} - {float(origin)!r}))) ELSE 0.0 END"
    )
    return _duckdb_boosted(
        table, id_col, text_col, queries, contrib, k, k1, b, round_score
    )
