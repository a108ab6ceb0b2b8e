"""Parent/child joins — ES ``has_child`` / ``has_parent`` queries
re-expressed over the chunk layer.

The reference stores flat documents only; ES's join field models a
1-N relation inside one index. This engine's natural relation is
document → passage chunks (`operators/chunk.py` — the same
deterministic geometry passage retrieval uses), so:

- ``has_child_topk``: rank PARENTS by their matching children —
  children score with chunk-level BM25 (the chunk corpus is the
  statistics universe, as in :func:`~same_same_spark.operators.chunk.
  passage_topk`), a parent's score folds its matching children under
  ``score_mode`` (``max`` / ``sum`` / ``avg`` — ES's modes; ``none``
  = pure existence filter, parents score 0 and rank by id), and
  ``min_children`` requires at least that many matching children
  (ES ``min_children``);
- ``has_parent_topk``: rank CHILDREN by their parent's match —
  parents score with document-level BM25; every chunk of a matching
  parent returns carrying the parent score (ES ``score`` mode),
  ranked ``(round(score,9) DESC, cuid ASC)``.

Both ride the bounded tournament (no windows); the child→parent fold
is one grouped aggregation with map-side combine. The duckdb twins
recompose the chunk SQL + the verified BM25 scored fragment and
re-derive the folds relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT, scored_matches
from same_same_spark.operators.chunk import chunk_documents, chunk_sql
from same_same_spark.operators.topk import topk_per_query

_SCORE_MODES = ("max", "sum", "avg", "none")


def _chunks_cuid(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    overlap: int,
    max_chunks: int,
) -> DataFrame:
    return chunk_documents(
        df, id_col=id_col, text_col=text_col, size=size, overlap=overlap,
        max_chunks=max_chunks,
    ).withColumn(
        "cuid",
        F.col(id_col).cast("long") * F.lit(max_chunks) + F.col("chunk_id"),
    )


def has_child_topk(
    df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    score_mode: str = "max",
    min_children: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 200,
    overlap: int = 50,
    max_chunks: int = 4096,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Parents ranked by their matching chunk children (see module
    pin). Returns (query_id INT, <id_col> LONG, n_children LONG,
    score DOUBLE, rank INT)."""
    if score_mode not in _SCORE_MODES:
        raise ValueError(f"score_mode must be one of {_SCORE_MODES}")
    if min_children < 1:
        raise ValueError(f"min_children must be >= 1, got {min_children}")
    chunks = _chunks_cuid(df, id_col, text_col, size, overlap, max_chunks)
    child_scores = scored_matches(
        chunks, queries, id_col="cuid", text_col="chunk_text", k1=k1, b=b
    )
    per_parent = (
        child_scores.select(
            "query_id",
            F.floor(F.col("doc_id") / max_chunks).alias("parent_id"),
            "score",
        )
        .groupBy("query_id", "parent_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_children"),
            F.max("score").alias("s_max"),
            F.sum("score").alias("s_sum"),
            F.avg("score").alias("s_avg"),
        )
        .filter(F.col("n_children") >= F.lit(min_children))
    )
    score = {
        "max": F.col("s_max"),
        "sum": F.col("s_sum"),
        "avg": F.col("s_avg"),
        "none": F.lit(0.0),
    }[score_mode]
    scored = per_parent.select(
        "query_id",
        F.col("parent_id").alias("doc_id"),
        score.alias("score"),
        "n_children",
    )
    top = topk_per_query(
        scored.select("query_id", "doc_id", "score"), k
    )
    return top.join(
        scored.select("query_id", "doc_id", "n_children"),
        ["query_id", "doc_id"],
    ).select(
        "query_id",
        F.col("doc_id").alias(id_col),
        "n_children",
        "score",
        "rank",
    )


def duckdb_has_child_sql(
    table: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    score_mode: str = "max",
    min_children: int = 1,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    size: int = 200,
    overlap: int = 50,
    max_chunks: int = 4096,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`has_child_topk`."""
    from same_same_spark.bm25 import duckdb_scored_sql

    sub = (
        f"(SELECT doc_id * {max_chunks} + chunk_id AS cuid,"
        " chunk_text FROM ("
        + chunk_sql(
            table, id_expr=id_expr, text_expr=text_expr, size=size,
            overlap=overlap, max_chunks=max_chunks,
        )
        + "))"
    )
    inner = duckdb_scored_sql(sub, "cuid", "chunk_text", queries)
    agg = {
        "max": "max(score)",
        "sum": "sum(score)",
        "avg": "avg(score)",
        "none": "0.0",
    }[score_mode]
    return f"""
WITH child AS ({inner}),
folded AS (
  SELECT query_id, (doc_id // {max_chunks}) AS parent_id,
         count(*)::BIGINT AS n_children, {agg} AS score
  FROM child GROUP BY 1, 2
  HAVING count(*) >= {min_children}
),
ranked AS (
  SELECT query_id, parent_id, n_children, score, row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(score, 9) DESC, parent_id ASC
  ) AS rank
  FROM folded
)
SELECT query_id, parent_id AS doc_id, n_children,
       round(score, {round_score}) AS score, rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""


def has_parent_topk(
    df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 200,
    overlap: int = 50,
    max_chunks: int = 4096,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Chunk children of matching parents, carrying the parent's
    document-level BM25 score (see module pin). Returns (query_id INT,
    <id_col> LONG, chunk_id INT, score DOUBLE, rank INT)."""
    parent_scores = scored_matches(
        df, queries, id_col=id_col, text_col=text_col, k1=k1, b=b
    ).select(
        "query_id", F.col("doc_id").alias("parent_id"), "score"
    )
    chunks = _chunks_cuid(df, id_col, text_col, size, overlap, max_chunks)
    children = chunks.select(
        F.col(id_col).cast("long").alias("parent_id"), "cuid"
    ).join(parent_scores, "parent_id")
    top = topk_per_query(
        children.select(
            "query_id", F.col("cuid").alias("doc_id"), "score"
        ),
        k,
    )
    cuid = F.col("doc_id")
    return top.select(
        "query_id",
        F.floor(cuid / max_chunks).alias(id_col),
        F.pmod(cuid, F.lit(max_chunks)).cast("int").alias("chunk_id"),
        "score",
        "rank",
    )


def duckdb_has_parent_sql(
    table: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    size: int = 200,
    overlap: int = 50,
    max_chunks: int = 4096,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`has_parent_topk`."""
    from same_same_spark.bm25 import duckdb_scored_sql

    inner = duckdb_scored_sql(table, id_expr, text_expr, queries)
    chunks = chunk_sql(
        table, id_expr=id_expr, text_expr=text_expr, size=size,
        overlap=overlap, max_chunks=max_chunks,
    )
    return f"""
WITH parent AS ({inner}),
chunks AS ({chunks}),
children AS (
  SELECT p.query_id,
         c.doc_id * {max_chunks} + c.chunk_id AS cuid,
         p.score
  FROM chunks c JOIN parent p ON p.doc_id = c.doc_id
),
ranked AS (
  SELECT query_id, cuid, score, row_number() OVER (
    PARTITION BY query_id ORDER BY round(score, 9) DESC, cuid ASC
  ) AS rank
  FROM children
)
SELECT query_id, (cuid // {max_chunks}) AS doc_id,
       (cuid % {max_chunks})::INT AS chunk_id,
       round(score, {round_score}) AS score, rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""
