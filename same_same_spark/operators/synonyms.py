"""Synonym expansion at query time — Elasticsearch's synonym filter.

A beyond-reference fulltext feature: the reference matches literal
tokens only (``internal/storage/search/search.go:16-42``); production
search rewrites each query term to its synonym group before scoring.

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_synonym_sql`):

- a synonym table is a list of groups, each group a list of surface
  forms; every form must X1-tokenize to EXACTLY ONE token (validated
  driver-side — multi-token or stopword-only forms raise ValueError);
  a token may belong to several groups;
- expansion: a query term t expands to the UNION of every group
  containing t, plus t itself; the expansion happens IN THE ENGINE
  (broadcast join of query terms → groups → members), not driver-side,
  so it is part of the differential;
- the expanded term set per query is DISTINCT (a term reachable both
  literally and through a group contributes once — Elasticsearch's
  synonym-graph dedup);
- ``score(q, d) = Σ_{t ∈ expanded(q)} w(t, d)`` with the pinned BM25
  ``w``; top-k under ``(round(score, 9) DESC, doc_id ASC)``.

Scale shape: the synonym table is dictionary-sized (thousands of
groups) — it broadcasts, the two expansion joins are broadcast hash
joins on the (tiny) query-term side, and the scoring plan is exactly
``bm25.score_queries``'s: one broadcast posting join, df from the
matched set, bounded tournament. Synonyms add ZERO corpus shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from same_same_spark.bm25 import (
    B_DEFAULT,
    K1_DEFAULT,
    bm25_weight_col,
    idf_col,
    query_terms_df,
)
from same_same_spark.operators.topk import topk_per_query
from same_same_spark.stats import corpus_stats, doc_term_freqs, tokenized
from same_same_spark.text.tokenizer import tokenize_py


def synonym_rows(groups: list[list[str]]) -> list[tuple[int, str]]:
    """Validated (group_id, token) rows for a synonym-group list.

    Deterministic: group ids are list positions, member tokens
    deduplicated and sorted within a group.
    """
    rows: list[tuple[int, str]] = []
    for gid, group in enumerate(groups):
        toks: set[str] = set()
        for form in group:
            t = tokenize_py(form)
            if len(t) != 1:
                raise ValueError(
                    f"synonym form {form!r} must tokenize to exactly one "
                    f"X1 token (got {t!r})"
                )
            toks.add(t[0])
        if len(toks) < 2:
            raise ValueError(
                f"synonym group {group!r} collapses to fewer than two "
                "distinct tokens"
            )
        rows.extend((gid, t) for t in sorted(toks))
    return rows


def expanded_query_terms(
    spark: SparkSession,
    queries: list[tuple[int, str]],
    groups: list[list[str]],
) -> DataFrame:
    """(query_id, term) — each query's distinct X1 tokens unioned with
    every member of every synonym group a token belongs to. The
    expansion is two broadcast joins over the engine-side synonym
    table."""
    qterms = query_terms_df(spark, queries)
    rows = synonym_rows(groups)
    if not rows:
        return qterms
    syn = spark.createDataFrame(rows, "gid INT, term STRING")
    via_groups = (
        qterms.join(F.broadcast(syn), "term")
        .select("query_id", "gid")
        .join(F.broadcast(syn), "gid")
        .select("query_id", "term")
    )
    return qterms.unionByName(via_groups).distinct()


def synonym_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    groups: list[list[str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k BM25 over synonym-expanded queries.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT).
    """
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)
    if cs.avgdl == 0:
        return spark.createDataFrame(
            [], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
        )
    qx = expanded_query_terms(spark, queries, groups)

    postings = doc_term_freqs(tok)
    matched = postings.join(
        F.broadcast(qx.select("term").distinct()), "term", "inner"
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
        .join(F.broadcast(qx), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    return topk_per_query(scored, k)


def duckdb_synonym_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    groups: list[list[str]],
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`synonym_search`: the synonym table is the
    same VALUES literal, but the EXPANSION is re-derived in SQL (two
    joins + a distinct union), so expansion semantics sit under the
    differential."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    qrows = [
        f"({qid}, '{term}')"
        for qid, text in queries
        for term in sorted(set(tokenize_py(text)))
    ]
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL) LIMIT 0"
    srows = [f"({gid}, '{t}')" for gid, t in synonym_rows(groups)]
    svalues = ", ".join(srows) if srows else "(NULL, NULL) LIMIT 0"
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
syn AS (SELECT * FROM (VALUES {svalues}) AS v(gid, term)),
qx AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id, term FROM qt
    UNION ALL
    SELECT q.query_id, m.term
    FROM qt q JOIN syn s ON q.term = s.term
    JOIN syn m ON s.gid = m.gid
  )
),
dfs AS (
  SELECT tfc.term, count(*) AS df FROM tfc
  WHERE tfc.term IN (SELECT DISTINCT term FROM qx)
  GROUP BY tfc.term
),
idf AS (
  SELECT d.term, ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM dfs d, corpus c
),
scored AS (
  SELECT q.query_id, t.doc_id, {score_expr} AS score
  FROM tfc t
  JOIN qx q ON t.term = q.term
  JOIN idf s ON t.term = s.term
  CROSS JOIN corpus c
  GROUP BY q.query_id, t.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score, row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(score, 9) DESC, doc_id ASC
  ) AS rank
  FROM scored
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""
