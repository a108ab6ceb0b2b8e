"""Field collapsing — at most one (best) result per field value.

A beyond-reference fulltext feature (Elasticsearch's ``collapse`` /
Lucene grouping): a search over a crawl corpus wants the top-k HOSTS,
not ten hits from one host.

Pinned semantics (cross-engine, re-derived in :func:`duckdb_collapse_sql`):

- group key = the collapse column's value as a STRING; NULL values form
  ONE group of their own (Elasticsearch's missing-value behavior);
- each group's representative = its best row under the engine's pinned
  total order ``(round(score, 9) DESC, doc_id ASC)``;
- the result = top-k representatives under the same order, rank 1..k,
  with the group value attached.

Scale shape: the per-group best is a ``min(struct(...))`` aggregate —
CONSTANT state per group (never a collect_list of the group's rows),
map-side combined, one shuffle on (query, value); the representative
set (≤ distinct values per query) then rides the bounded
:func:`~same_same_spark.operators.topk.topk_per_query` tournament.
A hot group (one host with millions of hits) costs its partial
aggregates, not a buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.operators.topk import neg_rounded_score, topk_per_query


def collapse_topk(
    scored: DataFrame,
    meta_df: DataFrame,
    collapse_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Collapse (query_id, doc_id, score) rows to one best row per
    (query, ``collapse_col`` value) and return the top-k groups.

    ``meta_df`` maps ``id_col`` → ``collapse_col``. Returns (query_id,
    doc_id, score DOUBLE, rank INT, ``collapse_col`` STRING).
    """
    meta = meta_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(collapse_col).cast("string").alias("__cval"),
    )
    best = (
        scored.join(meta, "doc_id")
        .withColumn(
            "__entry",
            F.struct(
                neg_rounded_score(F.col("score")).alias("nk"),
                F.col("doc_id").alias("doc_id"),
                F.col("score").alias("score"),
            ),
        )
        .groupBy("query_id", "__cval")
        .agg(F.min("__entry").alias("best"))
        .select(
            "query_id",
            F.col("best.doc_id").alias("doc_id"),
            F.col("best.score").alias("score"),
            "__cval",
        )
    )
    top = topk_per_query(best.select("query_id", "doc_id", "score"), k)
    # re-attach the group value by (query, doc) — a doc sits in exactly
    # one group, so the join is key-unique (never on the float score)
    return top.join(
        best.select("query_id", "doc_id", "__cval"), ["query_id", "doc_id"]
    ).select(
        "query_id",
        "doc_id",
        "score",
        "rank",
        F.col("__cval").alias(collapse_col),
    )


def duckdb_collapse_sql(
    scored_sql: str,
    table: str,
    id_col: str,
    collapse_col: str,
    k: int,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`collapse_topk`: ``scored_sql`` must yield
    (query_id, doc_id, score). Window-function re-derivation (group
    best via row_number per (query, value), then a second ranking)."""
    return f"""
WITH scored AS ({scored_sql}),
tagged AS (
  SELECT s.query_id, s.doc_id, s.score,
         CAST(d.{collapse_col} AS VARCHAR) AS {collapse_col}
  FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
),
grp_best AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id, {collapse_col}
    ORDER BY round(score, 9) DESC, doc_id ASC
  ) AS grn
  FROM tagged
),
ranked AS (
  SELECT query_id, doc_id, score, {collapse_col}, row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(score, 9) DESC, doc_id ASC
  ) AS rank
  FROM grp_best WHERE grn = 1
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank, {collapse_col}
FROM ranked WHERE rank <= {k}
"""
