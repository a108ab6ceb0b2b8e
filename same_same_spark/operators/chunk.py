"""Document chunking + passage retrieval.

The reference retrieves whole documents (one BM25/vector score per
doc, ``internal/storage/search/search.go``); long-document corpora
retrieve better over fixed-size overlapping windows. This module adds
that as a composition of existing verified pieces:

- :func:`chunk_documents` — pure-column windowing: chunk ``c`` of a
  doc covers chars ``[c·step, c·step + size)`` with
  ``step = size − overlap``; a doc gets
  ``1 + ceil((len − size)/step)`` chunks (one if ``len ≤ size``), so
  the final window always reaches the end of the doc and consecutive
  windows share ``overlap`` chars. NULL/empty docs yield no chunks
  (the scan-time empty-text skip, ``files.go`` parity). No UDF —
  ``sequence``/``explode``/``substr`` stay in whole-stage codegen.
- :func:`passage_topk` — top-k PASSAGES for a query batch: each chunk
  becomes a synthetic retrieval unit ``cuid = doc_id·max_chunks +
  chunk_id`` and scores through the verified
  :func:`~same_same_spark.bm25.score_queries` unchanged (bounded
  tournament top-k, broadcast query terms); the winning cuids decode
  back to ``(doc_id, chunk_id)``. BM25 stats (N, avgdl, df) are
  CHUNK-level by construction — the standard passage-retrieval
  formulation.

Document-level answers pool passages client-side (a doc's score is
its best passage — the first appearance of each doc in the ranked
passage list); the exact-union caveats live in the tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT, score_queries
from same_same_spark.text.tokenizer import duckdb_tokens_sql  # noqa: F401

__all__ = ["chunk_documents", "chunk_sql", "passage_topk", "passage_topk_sql"]


def _check_geometry(size: int, overlap: int) -> int:
    if size <= 0 or overlap < 0 or overlap >= size:
        raise ValueError(f"bad chunk geometry size={size} overlap={overlap}")
    return size - overlap


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 200,
    overlap: int = 50,
    max_chunks: int = 4096,
) -> DataFrame:
    """``(<id_col>, chunk_id, chunk_start, chunk_text)`` — one row per
    window. ``max_chunks`` truncates pathological documents (both
    engines identically); at the default geometry that is ~600 KB of
    text per doc."""
    step = _check_geometry(size, overlap)
    ln = F.length(text_col).cast("long")
    n = F.when(ln <= size, F.lit(1).cast("long")).otherwise(
        F.lit(1) + F.ceil((ln - size) / F.lit(step)).cast("long")
    )
    n = F.least(n, F.lit(max_chunks).cast("long"))
    return (
        df.filter(ln > 0)
        .withColumn(
            "chunk_id",
            F.explode(F.sequence(F.lit(0), (n - 1).cast("int"))),
        )
        .withColumn(
            "chunk_start", F.col("chunk_id").cast("long") * F.lit(step)
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.col("chunk_start"),
            F.col(text_col)
            .substr((F.col("chunk_start") + 1).cast("int"), F.lit(size))
            .alias("chunk_text"),
        )
    )


def chunk_sql(
    table: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    size: int = 200,
    overlap: int = 50,
    max_chunks: int = 4096,
) -> str:
    """DuckDB twin of :func:`chunk_documents` (a plain SELECT — wrap or
    compose freely)."""
    step = _check_geometry(size, overlap)
    return f"""
SELECT {id_expr} AS doc_id,
       i AS chunk_id,
       i * {step} AS chunk_start,
       substr({text_expr}, (i * {step} + 1)::INT, {size}) AS chunk_text
FROM {table},
     unnest(range(least(
       CASE WHEN length({text_expr}) <= {size} THEN 1
            ELSE 1 + ceil((length({text_expr}) - {size})
                          / {step}.0)::BIGINT END,
       {max_chunks}))) AS u(i)
WHERE length({text_expr}) > 0
"""


def passage_topk(
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
    """Top-k passages per query:
    ``(query_id, <id_col>, chunk_id, score, rank)`` under the pinned
    order (round(score,9) DESC, cuid ASC). Requires numeric
    non-negative doc ids (the cuid encoding)."""
    chunks = chunk_documents(
        df, id_col=id_col, text_col=text_col, size=size, overlap=overlap,
        max_chunks=max_chunks,
    ).withColumn(
        "cuid",
        F.col(id_col).cast("long") * F.lit(max_chunks) + F.col("chunk_id"),
    )
    scored = score_queries(
        chunks, queries, k=k, id_col="cuid", text_col="chunk_text",
        k1=k1, b=b,
    )
    cuid = F.col("doc_id")  # score_queries names its id column doc_id
    return scored.select(
        "query_id",
        F.floor(cuid / max_chunks).alias(id_col),
        F.pmod(cuid, F.lit(max_chunks)).cast("int").alias("chunk_id"),
        "score",
        "rank",
    )


def passage_topk_sql(
    table: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    size: int = 200,
    overlap: int = 50,
    max_chunks: int = 4096,
) -> str:
    """DuckDB twin of :func:`passage_topk`: the chunk subquery feeds
    the verified BM25 oracle generator, cuids decode in the outer
    select."""
    from same_same_spark.bm25 import duckdb_bm25_sql

    sub = (
        "(SELECT doc_id * "
        f"{max_chunks} + chunk_id AS cuid, chunk_text FROM ("
        + chunk_sql(
            table, id_expr=id_expr, text_expr=text_expr, size=size,
            overlap=overlap, max_chunks=max_chunks,
        )
        + "))"
    )
    inner = duckdb_bm25_sql(sub, "cuid", "chunk_text", queries, k=k)
    return f"""
SELECT query_id,
       (doc_id // {max_chunks}) AS doc_id,
       (doc_id % {max_chunks})::INT AS chunk_id,
       score, rank
FROM ({inner})
"""
