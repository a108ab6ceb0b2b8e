"""Percolation — Elasticsearch's percolate query, the reverse of
search: a REGISTERED set of queries is matched against incoming
documents ("which alerts fire for this doc?").

A beyond-reference fulltext feature: the reference only searches docs
by ad-hoc queries (``internal/storage/search/search.go:16-42``); the
percolator inverts the relation, the backbone of alerting/routing
pipelines (and, at training-data scale, of rule-based document
classification: each registered query is a labeled routing rule).

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_percolate_sql`):

- a registered query is (query_id, text); its distinct X1 tokens are
  its terms; a query with no tokens never matches (ES rejects empty
  percolator queries);
- match = the doc contains EVERY distinct term of the query (ES match
  query with ``operator: and`` — the strict percolator default shape);
- each matching (query, doc) pair carries the engine's pinned BM25
  score over the query's terms (what ES reports when percolation is
  combined with scoring);
- output is the full match RELATION (query_id INT, doc_id,
  score DOUBLE) — a classification table, deliberately un-truncated.

Scale shape: registered queries broadcast (they are the small side by
definition — an alert table); coverage = one map-side-combined count
over the matched postings; score rides the SAME aggregate — one
shuffle total, no per-query passes. Percolating a STREAM is this same
operator inside ``foreachBatch`` (the registered table is static and
stays broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import (
    B_DEFAULT,
    K1_DEFAULT,
    bm25_weight_col,
    idf_col,
)
from same_same_spark.stats import corpus_stats, doc_term_freqs, tokenized
from same_same_spark.text.tokenizer import tokenize_py


def percolate(
    docs_df: DataFrame,
    registered: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Match every registered query against every doc (operator=and).

    Returns (query_id INT, doc_id, score DOUBLE) — one row per
    (registered query, doc containing ALL its terms).
    """
    spark = docs_df.sparkSession
    qrows = [
        (qid, term, len(set(tokenize_py(text))))
        for qid, text in registered
        for term in sorted(set(tokenize_py(text)))
    ]
    empty = spark.createDataFrame(
        [], "query_id INT, doc_id LONG, score DOUBLE"
    )
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)
    if not qrows or cs.avgdl == 0:
        return empty
    qterms = spark.createDataFrame(
        qrows, "query_id INT, term STRING, m_distinct INT"
    )
    postings = doc_term_freqs(tok)  # (doc_id, term, tf, dl)
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    dfs = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        matched.join(F.broadcast(dfs), "term")
        .withColumn("idf", idf_col(F.col("df"), cs.n_docs))
        .withColumn(
            "w",
            bm25_weight_col(
                F.col("tf"), F.col("dl"), F.col("idf"), cs.avgdl, k1, b
            ),
        )
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.first("m_distinct").alias("m_distinct"),
            F.sum("w").alias("score"),
        )
        .filter(F.col("n_terms") == F.col("m_distinct"))
    )
    return scored.select("query_id", "doc_id", "score")


def duckdb_percolate_sql(
    table: str,
    id_col: str,
    text_col: str,
    registered: list[tuple[int, str]],
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`percolate` (score compared at 6dp; the
    all-terms coverage gate re-derived with a HAVING over distinct
    matched terms)."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    qrows = []
    for qid, text in registered:
        terms = sorted(set(tokenize_py(text)))
        for term in terms:
            qrows.append(f"({qid}, '{term}', {len(terms)})")
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL, NULL) LIMIT 0"
    score_expr = (
        f"sum(s.idf * t.tf * ({k1} + 1.0) / "
        f"(t.tf + {k1} * (1.0 - {b} + {b} * t.dl / c.avgdl)))"
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
docstat AS (SELECT doc_id, len(tokens) AS dl FROM toks),
corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM docstat),
tfc AS (
  SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
  FROM (
    SELECT t.doc_id, unnest(t.tokens) AS term, d.dl
    FROM toks t JOIN docstat d ON t.doc_id = d.doc_id
  )
  GROUP BY doc_id, term
),
qt AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term, m)),
dfs AS (
  SELECT term, count(*) AS df FROM tfc
  WHERE term IN (SELECT DISTINCT term FROM qt)
  GROUP BY term
),
idf AS (
  SELECT d.term, ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM dfs d, corpus c
)
SELECT q.query_id, t.doc_id,
       round({score_expr}, {round_score}) AS score
FROM tfc t
JOIN qt q ON t.term = q.term
JOIN idf s ON t.term = s.term
CROSS JOIN corpus c
GROUP BY q.query_id, t.doc_id, q.m
HAVING count(DISTINCT t.term) = q.m
"""
