"""Multi-field match query — Elasticsearch's ``multi_match``.

A beyond-reference fulltext feature (ES's most-used query type; the
reference scores one flat text field —
``internal/storage/search/search.go:16-42``): one query string scored
against SEVERAL document fields, each field its own independent
"index" (its own tokenization, document frequencies and length norm,
exactly Lucene's per-field statistics), combined per document:

- ``best_fields`` (the ES default): dis-max over the per-field scores
  — ``max_f + tie_breaker * (sum_f - max_f)``;
- ``most_fields``: plain sum of the per-field scores;
- (``cross_fields`` is the OTHER family — blended per-term statistics
  — and is served by :mod:`same_same_spark.operators.bm25f`.)

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_multi_match_sql`):

- per field, the engine's pinned BM25 over THAT field's corpus stats
  (per-field avgdl; df from the field's matched set), then scaled by
  the field's boost; a zero boost drops the field entirely;
- per (query, doc) the combine above over fields with >= 1 matched
  term (an unmatched field scores 0 and never lowers max or sum);
- top-k under ``(round(score, 9) DESC, doc_id ASC)``.

Scale shape: one ``scored_matches`` plan per field (broadcast query
terms, map-side combined tf aggregate) — in a real deployment each
field IS a separate posting index, so per-field passes are the
correct physical shape, not overhead; the combine is one extra
map-side ``groupBy (query, doc)`` over already-keyed rows and ranking
is the bounded tournament. No WindowExec, no cartesians.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT, scored_matches
from same_same_spark.operators.topk import topk_per_query

_MODES = ("best_fields", "most_fields")


def multi_match_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    fields: dict[str, float],
    mode: str = "best_fields",
    tie_breaker: float = 0.0,
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k multi_match for ``fields`` = {field column: boost}.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT).
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    if not fields:
        raise ValueError("fields must be non-empty")
    if any(boost < 0 for boost in fields.values()):
        raise ValueError("field boosts must be non-negative")

    live = {f: w for f, w in sorted(fields.items()) if w > 0}
    spark = docs_df.sparkSession
    if not live:
        return spark.createDataFrame(
            [], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
        )
    per_field = [
        scored_matches(
            docs_df, queries, id_col=id_col, text_col=f, k1=k1, b=b
        ).select(
            "query_id",
            "doc_id",
            (F.lit(float(w)) * F.col("score")).alias("score"),
        )
        for f, w in live.items()
    ]
    unioned = reduce(lambda a, c: a.unionByName(c), per_field)
    if mode == "most_fields":
        combine = F.sum("score").alias("score")
    else:
        combine = (
            F.max("score")
            + F.lit(float(tie_breaker)) * (F.sum("score") - F.max("score"))
        ).alias("score")
    combined = unioned.groupBy("query_id", "doc_id").agg(combine)
    return topk_per_query(combined, k)


def duckdb_multi_match_sql(
    table: str,
    id_col: str,
    queries: list[tuple[int, str]],
    fields: dict[str, float],
    mode: str = "best_fields",
    tie_breaker: float = 0.0,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    prelude_ctes: str = "",
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`multi_match_search`.

    Per-field scores come from the one pinned ``duckdb_scored_sql``
    fragment instantiated per field (each with its OWN corpus stats);
    ``prelude_ctes`` (e.g. ``"docs_f AS (...), "``) lets callers feed a
    derived-fields table, mirroring the bm25f twin."""
    from same_same_spark.bm25 import duckdb_scored_sql

    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    live = {f: w for f, w in sorted(fields.items()) if w > 0}
    branches = "\n  UNION ALL\n  ".join(
        f"SELECT query_id, doc_id, {float(w)!r} * score AS score FROM (\n"
        + duckdb_scored_sql(table, id_col, f, queries, k1=k1, b=b)
        + "\n)"
        for f, w in live.items()
    )
    if mode == "most_fields":
        combine = "sum(score)"
    else:
        combine = (
            f"max(score) + {float(tie_breaker)!r} * (sum(score) - max(score))"
        )
    return f"""
WITH {prelude_ctes}per_field AS (
  {branches}
),
combined AS (
  SELECT query_id, doc_id, {combine} AS score
  FROM per_field GROUP BY 1, 2
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
