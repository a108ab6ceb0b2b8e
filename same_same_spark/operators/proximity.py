"""Proximity search — all query terms within a bounded token window.

A beyond-reference fulltext feature (the unordered cousin of
:mod:`same_same_spark.operators.phrase`): a phrase query demands the
terms consecutively in order; a proximity query only demands that they
co-occur within ``len(terms) + slop`` token positions, any order.

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_proximity_sql`):

- query terms = DISTINCT X1 tokens of the query, ``m = |terms|``;
- window width ``W = m + slop``;
- the window START SET of a doc with ``n`` tokens is
  ``1 .. max(n - W + 1, 1)`` — one truncated window when the doc is
  shorter than W (so a 3-token doc containing all 3 terms of a W=5
  query still matches, exactly once);
- the doc matches iff some window ``slice(tokens, i, W)`` CONTAINS all
  m distinct terms (unordered, duplicates irrelevant); ``n_windows`` =
  number of matching starts; docs with ``n < m`` and zero-token queries
  match nothing;
- ranking among matching docs: BM25 over the distinct terms (the
  engine's pinned model, true global df), total order
  ``(round(score, 9) DESC, doc_id ASC)``, top-k.

Scale shape (same argument as phrase search): candidates = docs
carrying ALL distinct terms, found on the exploded posting rows via a
broadcast term join; the O(n · W) window scan runs JVM-side on
CANDIDATES ONLY, never the rest of the corpus. The oracle scans every
doc brute-force, so the candidate prefilter is part of what the
differential checks. Top-k uses the bounded tournament.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import (
    B_DEFAULT,
    K1_DEFAULT,
    bm25_weight_col,
    idf_col,
)
from same_same_spark.operators.topk import topk_per_query
from same_same_spark.stats import corpus_stats, doc_term_freqs, tokenized
from same_same_spark.text.tokenizer import tokenize_py


def window_count_col(
    tokens: Column, qterms: Column, width: Column
) -> Column:
    """Number of start offsets ``i`` in ``1..max(n - W + 1, 1)`` where
    ``slice(tokens, i, W)`` contains every element of ``qterms``. Pure
    JVM column math; 0 when the doc is shorter than the term set or the
    term set is empty."""
    m = F.size(qterms)
    n = F.size(tokens)
    starts = F.sequence(
        F.lit(1), F.greatest(n - width + F.lit(1), F.lit(1))
    )
    hits = F.size(
        F.filter(
            starts,
            lambda i: F.forall(
                qterms,
                lambda t: F.array_contains(F.slice(tokens, i, width), t),
            ),
        )
    )
    return F.when((m > 0) & (n >= m), hits).otherwise(F.lit(0))


def proximity_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    slop: int = 2,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k proximity search for (query_id, text) queries.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT,
    n_windows INT) — rank 1..k per query over docs where some
    ``|terms| + slop`` token window contains all distinct query terms.
    """
    if slop < 0:
        raise ValueError("slop must be >= 0")
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)

    qsets = [(qid, sorted(set(tokenize_py(text)))) for qid, text in queries]
    qterm_rows = [
        (qid, term, len(terms))
        for qid, terms in qsets
        for term in terms
    ]
    empty = spark.createDataFrame(
        [],
        "query_id INT, doc_id LONG, score DOUBLE, rank INT, n_windows INT",
    )
    if not qterm_rows or cs.avgdl == 0:
        return empty
    qterms = spark.createDataFrame(
        qterm_rows, "query_id INT, term STRING, m_distinct INT"
    )
    qarr = spark.createDataFrame(
        [(qid, terms, len(terms) + slop) for qid, terms in qsets if terms],
        "query_id INT, qterms ARRAY<STRING>, width INT",
    )

    postings = doc_term_freqs(tok)  # (doc_id, term, tf, dl)
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term", "inner"
    )
    dfs = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    cand = (
        matched.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.first("m_distinct").alias("m_distinct"),
        )
        .filter(F.col("n_terms") == F.col("m_distinct"))
        .select("query_id", "doc_id")
    )

    verified = (
        cand.join(tok.select("doc_id", "tokens"), "doc_id")
        .join(F.broadcast(qarr), "query_id")
        .withColumn(
            "n_windows",
            window_count_col(
                F.col("tokens"), F.col("qterms"), F.col("width")
            ),
        )
        .filter(F.col("n_windows") > 0)
        .select("query_id", "doc_id", "n_windows")
    )

    scored = (
        matched.join(F.broadcast(dfs), "term")
        .withColumn("idf", idf_col(F.col("df"), cs.n_docs))
        .withColumn(
            "w",
            bm25_weight_col(
                F.col("tf"), F.col("dl"), F.col("idf"), cs.avgdl, k1, b
            ),
        )
        .join(F.broadcast(qterms.select("query_id", "term")), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
        .join(verified.select("query_id", "doc_id"), ["query_id", "doc_id"])
    )

    top = topk_per_query(scored, k)
    return top.join(verified, ["query_id", "doc_id"], "inner").select(
        "query_id",
        "doc_id",
        "score",
        "rank",
        F.col("n_windows").cast("int").alias("n_windows"),
    )


def duckdb_proximity_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    slop: int = 2,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`proximity_search` (score compared at 6dp).

    Independent re-derivation: every doc's window set is scanned with
    ``list_filter(range(...))`` + ``list_has_all`` — no candidate
    prefilter — so the Spark candidate plumbing is verified by the
    differential."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    qt_rows, qa_rows = [], []
    for qid, text in queries:
        terms = sorted(set(tokenize_py(text)))
        for term in terms:
            qt_rows.append(f"({qid}, '{term}')")
        if terms:
            lits = ", ".join(f"'{t}'" for t in terms)
            qa_rows.append(
                f"({qid}, [{lits}], {len(terms)}, {len(terms) + slop})"
            )
    qvalues = ", ".join(qt_rows) if qt_rows else "(NULL, NULL) LIMIT 0"
    avalues = (
        ", ".join(qa_rows) if qa_rows else "(NULL, NULL, NULL, NULL) LIMIT 0"
    )
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
qt AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)),
qa AS (SELECT * FROM (VALUES {avalues}) AS v(query_id, terms, m, w)),
dfs AS (
  SELECT tfc.term, count(*) AS df FROM tfc
  WHERE tfc.term IN (SELECT DISTINCT term FROM qt)
  GROUP BY tfc.term
),
idf AS (
  SELECT d.term, ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM dfs d, corpus c
),
hits AS (
  SELECT q.query_id, t.doc_id,
         CASE WHEN len(t.tokens) >= q.m THEN len(list_filter(
           range(1, greatest(len(t.tokens) - q.w + 1, 1) + 1),
           i -> list_has_all(list_slice(t.tokens, i, i + q.w - 1), q.terms)
         )) ELSE 0 END AS n_windows
  FROM toks t CROSS JOIN qa q
),
verified AS (
  SELECT query_id, doc_id, n_windows FROM hits WHERE n_windows > 0
),
scored AS (
  SELECT q.query_id, t.doc_id, {score_expr} AS score
  FROM tfc t
  JOIN qt q ON t.term = q.term
  JOIN idf s ON t.term = s.term
  CROSS JOIN corpus c
  GROUP BY q.query_id, t.doc_id
),
ranked AS (
  SELECT s.query_id, s.doc_id, s.score, v.n_windows,
         row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY round(s.score, 9) DESC, s.doc_id ASC
         ) AS rank
  FROM scored s
  JOIN verified v ON s.query_id = v.query_id AND s.doc_id = v.doc_id
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank, n_windows::INTEGER AS n_windows
FROM ranked WHERE rank <= {k}
"""
