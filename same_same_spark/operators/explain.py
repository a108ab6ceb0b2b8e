"""Score explanation — Elasticsearch's ``_explain`` API: the per-term
breakdown of WHY a document scored what it scored for a query.

The debugging companion of :mod:`~same_same_spark.operators.termvectors`
(what the analyzer produced) — this one decomposes the pinned BM25
model itself: every (query, doc, term) contribution with the exact
inputs (tf, dl, df, idf, the weight), and the per-term weights sum to
the engine's score for that (query, doc) BY CONSTRUCTION (same
expressions, same aggregation — pinned in tests).

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_explain_sql`):

- for each (query, requested doc): one row per query term PRESENT in
  the doc with (term, tf LONG, dl LONG, df LONG, idf DOUBLE,
  weight DOUBLE); absent terms contribute nothing and emit no row
  (ES's explanation likewise lists only matching clauses);
- df/idf are CORPUS-wide (the same statistics the scorer used);
- a requested doc matching no term of a query emits no rows.

Scale shape: requested (query_id, doc_id) pairs broadcast (an explain
call inspects a handful of hits); the posting pass ships only the
requested docs' rows, then joins the bounded corpus-stats table —
one bounded join chain, no ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import (
    B_DEFAULT,
    K1_DEFAULT,
    bm25_weight_col,
    idf_col,
    query_terms_df,
)
from same_same_spark.stats import corpus_stats, doc_term_freqs, tokenized
from same_same_spark.text.tokenizer import tokenize_py


def explain_scores(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    pairs: list[tuple[int, object]],
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Explain the pinned BM25 score of each requested (query, doc).

    ``pairs`` = the (query_id, doc_id) hits to explain. Returns
    (query_id INT, doc_id, term STRING, tf LONG, dl LONG, df LONG,
    idf DOUBLE, weight DOUBLE).
    """
    if not pairs:
        raise ValueError("pairs must be non-empty")
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)
    qterms = query_terms_df(spark, queries)
    postings = doc_term_freqs(tok)
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    dfs = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    pdf = spark.createDataFrame(
        sorted(set(pairs)),
        f"query_id INT, doc_id {dict(tok.dtypes)['doc_id']}",
    )
    return (
        matched.join(F.broadcast(pdf), "doc_id")
        .join(F.broadcast(qterms), ["query_id", "term"])
        .join(F.broadcast(dfs), "term")
        .withColumn("idf", idf_col(F.col("df"), cs.n_docs))
        .withColumn(
            "weight",
            bm25_weight_col(
                F.col("tf"), F.col("dl"), F.col("idf"), cs.avgdl, k1, b
            ),
        )
        .select(
            "query_id",
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("dl").cast("long").alias("dl"),
            F.col("df").cast("long").alias("df"),
            "idf",
            "weight",
        )
    )


def duckdb_explain_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    pairs: list[tuple[int, object]],
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_float: int = 6,
) -> str:
    """DuckDB twin of :func:`explain_scores` (floats at 6dp)."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    qrows = [
        f"({qid}, '{term}')"
        for qid, text in queries
        for term in sorted(set(tokenize_py(text)))
    ]
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL) LIMIT 0"
    prows = ", ".join(
        f"({qid}, {did})" for qid, did in sorted(set(pairs))
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
qt AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)),
prs AS (SELECT * FROM (VALUES {prows}) AS v(query_id, doc_id)),
dfs AS (
  SELECT term, count(*) AS df FROM tfc
  WHERE term IN (SELECT DISTINCT term FROM qt)
  GROUP BY term
)
SELECT p.query_id, t.doc_id, t.term,
       t.tf::BIGINT AS tf, t.dl::BIGINT AS dl, d.df::BIGINT AS df,
       round(ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5)),
             {round_float}) AS idf,
       round(ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))
             * t.tf * ({k1} + 1.0)
             / (t.tf + {k1} * (1.0 - {b} + {b} * t.dl / c.avgdl)),
             {round_float}) AS weight
FROM tfc t
JOIN prs p ON t.doc_id = p.doc_id
JOIN qt q ON t.term = q.term AND q.query_id = p.query_id
JOIN dfs d ON t.term = d.term
CROSS JOIN corpus c
"""
