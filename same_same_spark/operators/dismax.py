"""Disjunction-max query — best-clause scoring with a tie breaker.

A beyond-reference fulltext feature (Lucene/Elasticsearch ``dis_max``
query; the reference scores one flat term bag —
``internal/storage/search/search.go:16-42``): a query is a LIST of
clauses; a document's score is its best clause's score plus
``tie_breaker`` times the rest, so a doc matching one clause very well
beats a doc matching several clauses weakly (the classic multi-field
"best_fields" semantics).

Pinned semantics (cross-engine, re-derived in :func:`duckdb_dismax_sql`):

- each clause is an independent query string scored with the engine's
  pinned BM25 (clauses with no X1 tokens contribute nothing);
- a doc is matched iff >= 1 clause matches it; per (query, doc) with
  per-clause scores ``s_1..s_m`` over the MATCHED clauses only,

      score = max(s_i) + tie_breaker * (sum(s_i) - max(s_i))

  (an unmatched clause scores 0 and never lowers max or sum, so
  restricting to matched clauses is exact);
- ``tie_breaker`` must lie in [0, 1] (0 = pure dis-max, 1 = plain
  sum-of-clauses); top-k under ``(round(score, 9) DESC, doc_id ASC)``.

Scale shape: clauses ride the SAME single-pass plan as
``bm25.score_queries`` — all (query, clause) pairs are encoded into one
composite query id driver-side, so the corpus is tokenized and joined
ONCE for the whole batch; the dis-max combine is one extra map-side
``groupBy (query, doc)`` over rows already keyed by doc. Zero new
shuffles versus a plain BM25 batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT, scored_matches
from same_same_spark.operators.topk import topk_per_query

# Composite-id stride: clause_uid = query_id * _STRIDE + clause_index.
# Mirrors the cuid encoding in operators/chunk.py; callers' query ids
# must stay below INT32_MAX / _STRIDE.
_STRIDE = 1000


def _clause_uids(
    queries: list[tuple[int, list[str]]]
) -> list[tuple[int, str]]:
    uids: list[tuple[int, str]] = []
    for qid, clauses in queries:
        if qid < 0 or qid >= (2**31) // _STRIDE:
            raise ValueError(f"query_id {qid} out of composite-id range")
        if len(clauses) > _STRIDE:
            raise ValueError(f"query {qid}: more than {_STRIDE} clauses")
        uids.extend(
            (qid * _STRIDE + i, text) for i, text in enumerate(clauses)
        )
    return uids


def dismax_search(
    docs_df: DataFrame,
    queries: list[tuple[int, list[str]]],
    tie_breaker: float = 0.0,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k dis-max over (query_id, [clause strings]) queries.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT).
    """
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    per_clause = scored_matches(
        docs_df,
        _clause_uids(queries),
        id_col=id_col,
        text_col=text_col,
        k1=k1,
        b=b,
    )
    combined = (
        per_clause.withColumn(
            "qid", F.floor(F.col("query_id") / _STRIDE).cast("int")
        )
        .groupBy("qid", "doc_id")
        .agg(
            (
                F.max("score")
                + F.lit(float(tie_breaker))
                * (F.sum("score") - F.max("score"))
            ).alias("score")
        )
        .withColumnRenamed("qid", "query_id")
    )
    return topk_per_query(combined, k)


def duckdb_dismax_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, list[str]]],
    tie_breaker: float = 0.0,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`dismax_search` (score compared at 6dp).

    The clause encoding is shared driver-side code; the per-clause BM25
    comes from the one pinned ``duckdb_scored_sql`` fragment, so the
    differential checks the dis-max combine + ranking."""
    from same_same_spark.bm25 import duckdb_scored_sql

    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    inner = duckdb_scored_sql(
        table, id_col, text_col, _clause_uids(queries), k1=k1, b=b
    )
    return f"""
WITH per_clause AS ({inner}),
combined AS (
  SELECT query_id // {_STRIDE} AS query_id, doc_id,
         max(score) + {float(tie_breaker)!r} * (sum(score) - max(score))
           AS score
  FROM per_clause
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score, row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(score, 9) DESC, doc_id ASC
  ) AS rank
  FROM combined
)
SELECT query_id::INTEGER AS query_id, doc_id,
       round(score, {round_score}) AS score, rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""
