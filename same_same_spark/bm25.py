"""BM25 scoring — the frozen-corpus re-expression of the reference's
TF-IDF + cosine linear scan (``internal/storage/search/search.go:16-42``).

Two execution paths share these definitions:

- :func:`score_queries` here — the *naive* path: pure DataFrame ops
  (explode/join/groupBy/window). Exact, index-free; used for differential
  testing, filtered search (reference filters during the scan), and as the
  DuckDB-oracle-matched implementation.
- ``same_same_spark.index.query`` — the production path over the
  compressed posting-list index; rank-identical by construction and
  verified against this one in tests.

Scoring model (pinned; documented because the goldens depend on it):

- ``idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))``   (Lucene BM25 idf,
  always positive),
- ``w(t, d)  = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))``,
- ``score(q, d) = Σ_{t ∈ distinct_tokens(q)} w(t, d)``,
- defaults ``k1 = 1.2``, ``b = 0.75``,
- total result order: ``(round(score, 9) DESC, doc_id ASC)`` — the
  reference's unstable sort (search.go:31-42) makes ties nondeterministic;
  we pin them (SURVEY §7.3). Rounding to 1e-9 before ranking makes the
  order reproducible across engines/summation orders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from same_same_spark.stats import corpus_stats, doc_term_freqs, tokenized
from same_same_spark.text.tokenizer import tokenize_py

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def idf_col(df_count: Column, n_docs: float) -> Column:
    return F.log(
        1.0 + (F.lit(float(n_docs)) - df_count + 0.5) / (df_count + 0.5)
    )


def bm25_weight_col(
    tf: Column, dl: Column, idf: Column, avgdl: float,
    k1: float = K1_DEFAULT, b: float = B_DEFAULT,
) -> Column:
    denom = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dl / F.lit(float(avgdl))
    )
    return idf * tf * F.lit(k1 + 1.0) / denom


def query_terms_df(
    spark: SparkSession, queries: list[tuple[int, str]]
) -> DataFrame:
    """(query_id, term) — distinct X1 tokens per query, built driver-side
    (queries are tiny; this side is always broadcast)."""
    rows = [
        (qid, term)
        for qid, text in queries
        for term in sorted(set(tokenize_py(text)))
    ]
    return spark.createDataFrame(rows or [], "query_id INT, term STRING")


def score_queries(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Naive exact BM25 top-k for a batch of queries.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT), rank 1..k per
    query under the pinned total order.

    Plan shape (scale notes): one explode+groupBy over the corpus
    (map-side combined), a *broadcast* join against the tiny query-term
    set — so only matched postings survive, df for exactly those terms is
    computed from the matched set (every doc containing a query term is
    present post-join, so per-term counts are the true global df) — and a
    tournament top-k
    (:func:`same_same_spark.operators.topk.topk_per_query`): an exact
    Arrow-batch pre-prune keeps ≤ k rows per (batch, query) BEFORE any
    shuffle, so the top-k wire traffic and every aggregation buffer are
    bounded by batches·k per query — unlike the per-query rank window
    this replaced, which landed ALL of a query's matched docs on one
    task.
    """
    scored = scored_matches(
        docs_df, queries, id_col=id_col, text_col=text_col,
        k1=k1, b=b, stats=stats,
    )

    from same_same_spark.operators.topk import topk_per_query

    return topk_per_query(scored, k)


def scored_matches(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """The FULL scored match set behind :func:`score_queries`:
    (query_id INT, doc_id, score DOUBLE), one row per (query, doc with
    >= 1 query term) — no ranking, no truncation. Callers that need
    top-k feed this to ``topk_per_query``; pagination feeds it to
    ``search_after``."""
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = (
        corpus_stats(tok)
        if stats is None
        else type("CS", (), {"n_docs": stats[0], "avgdl": stats[1]})
    )
    if cs.avgdl == 0:
        return spark.createDataFrame(
            [], "query_id INT, doc_id LONG, score DOUBLE"
        )

    postings = doc_term_freqs(tok)  # (doc_id, term, tf, dl)
    qterms = query_terms_df(spark, queries)

    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term", "inner"
    )
    # Global df per query term, derived from the matched postings
    # (complete by construction — no second corpus pass).
    dfs = matched.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )

    return (
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
        .agg(F.sum("w").alias("score"))
    )


def duckdb_bm25_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int | None = 6,
) -> str:
    """DuckDB SQL computing the *same* result as :func:`score_queries`
    (modulo float rounding — callers compare ``round(score, 6)``).

    Self-contained CTE chain; tokenization via
    :func:`same_same_spark.text.tokenizer.duckdb_tokens_sql`.
    """
    inner = duckdb_scored_sql(table, id_col, text_col, queries, k1=k1, b=b)
    sel_score = (
        f"round(score, {round_score}) AS score" if round_score is not None
        else "score"
    )
    return f"""
WITH scored AS ({inner}),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, 9) DESC, doc_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, doc_id, {sel_score}, rank
FROM ranked WHERE rank <= {k}
"""


def duckdb_scored_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> str:
    """DuckDB twin of :func:`scored_matches`: the FULL (query_id,
    doc_id, score) match set, unranked and untruncated."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    qrows = []
    for qid, text in queries:
        for term in sorted(set(tokenize_py(text))):
            qrows.append(f"({qid}, '{term}')")
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL) LIMIT 0"
    score_expr = (
        f"sum(s.idf * t.tf * ({k1} + 1.0) / "
        f"(t.tf + {k1} * (1.0 - {b} + {b} * t.dl / c.avgdl)))"
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
docstat AS (
  SELECT doc_id, len(tokens) AS dl FROM toks
),
corpus AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM docstat
),
tf AS (
  SELECT doc_id, unnest(tokens) AS term FROM toks
),
tfc AS (
  SELECT t.doc_id, t.term, count(*) AS tf, any_value(d.dl) AS dl
  FROM tf t JOIN docstat d ON t.doc_id = d.doc_id
  GROUP BY t.doc_id, t.term
),
qt AS (
  SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)
),
dfs AS (
  SELECT tfc.term, count(*) AS df
  FROM tfc
  WHERE tfc.term IN (SELECT DISTINCT term FROM qt)
  GROUP BY tfc.term
),
idf AS (
  SELECT d.term, ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM dfs d, corpus c
),
scored AS (
  SELECT q.query_id, t.doc_id, {score_expr} AS score
  FROM tfc t
  JOIN qt q ON t.term = q.term
  JOIN idf s ON t.term = s.term
  CROSS JOIN corpus c
  GROUP BY q.query_id, t.doc_id
)
SELECT query_id, doc_id, score FROM scored
"""
