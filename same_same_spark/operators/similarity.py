"""LM similarities — query-likelihood scoring with Dirichlet or
Jelinek-Mercer smoothing (Zhai & Lafferty 2001; Lucene's
``LMDirichletSimilarity`` / ``LMJelinekMercerSimilarity``, selectable
in ES as ``"similarity": "LMDirichlet"`` / ``"LMJelinekMercer"``).

The engine's second relevance model next to BM25: where BM25 reasons
about term saturation, the language-model family scores the
probability the document "generated" the query, smoothing each term's
in-document estimate with the collection model. The reference engine
has a single hard-coded scorer (``internal/storage/search/search.go``);
real engines let the field choose its similarity — this operator is
that surface.

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_dirichlet_sql`):

- collection model ``p(t|C) = ttf(t) / total_tokens`` (total term
  frequency over the corpus / sum of all document lengths);
- per (query, doc, term) with ``tf > 0``::

      w = max(0, ln(1 + tf / (mu * p(t|C))) + ln(mu / (dl + mu)))

  (Lucene clamps each term's contribution at 0 — without the clamp a
  very common term in a long doc scores negative and a doc could be
  punished for containing a query term);
- ``score(q, d) = Σ_{t ∈ q} w``; docs matching no query term are
  absent; ``mu > 0`` (default 2000, Lucene's default);
- top-k under the pinned ``(round(score, 9) DESC, doc_id ASC)``.

Jelinek-Mercer (:func:`jm_search`) swaps the per-term weight for::

    w = ln(1 + ((1 - λ) · tf / dl) / (λ · p(t|C)))

with ``λ ∈ (0, 1]`` (default 0.1, Lucene's default for short
queries). The log1p argument is non-negative by construction, so JM
needs no clamp — every matching term contributes ≥ 0. Same plan
shape, same pinned ordering; the DuckDB twin is
:func:`duckdb_jm_sql` (local differential in ``tests/test_relevance_extras.py`` —
the driver registry carries the Dirichlet entry, JM rides the same
verified statistics pipeline with its own cross-engine test).

Scale shape: identical to the naive BM25 path — one tokenize/explode
with map-side combine, the tiny query-term table broadcast, ttf for
exactly the query terms derived from the matched posting set (every
occurrence of a query term is in it), one bounded tournament top-k.
The only extra statistic vs BM25 is ``total_tokens`` (one scalar from
the same corpus-stats pass the engine already makes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import query_terms_df
from same_same_spark.operators.topk import topk_per_query
from same_same_spark.stats import doc_term_freqs, tokenized
from same_same_spark.text.tokenizer import duckdb_tokens_sql, tokenize_py

MU_DEFAULT = 2000.0


def dirichlet_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    mu: float = MU_DEFAULT,
) -> DataFrame:
    """LM-Dirichlet top-k for a batch of queries.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT).
    """
    if mu <= 0:
        raise ValueError(f"mu must be > 0, got {mu}")
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    total_tokens = (tok.agg(F.sum("dl").alias("t")).first()["t"]) or 0
    if total_tokens == 0:
        return spark.createDataFrame(
            [], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
        )

    postings = doc_term_freqs(tok)  # (doc_id, term, tf, dl)
    qterms = query_terms_df(spark, queries)
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term", "inner"
    )
    # ttf per query term from the matched set (complete by
    # construction: every posting of a query term survived the join).
    ttfs = matched.groupBy("term").agg(F.sum("tf").alias("ttf"))

    p_c = F.col("ttf") / F.lit(float(total_tokens))
    w = F.greatest(
        F.lit(0.0),
        F.log(F.lit(1.0) + F.col("tf") / (F.lit(float(mu)) * p_c))
        + F.log(F.lit(float(mu)) / (F.col("dl") + F.lit(float(mu)))),
    )
    scored = (
        matched.join(F.broadcast(ttfs), "term")
        .withColumn("w", w)
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    return topk_per_query(scored, k)


def jm_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    lambda_: float = 0.1,
) -> DataFrame:
    """LM Jelinek-Mercer top-k for a batch of queries.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT).
    """
    if not 0.0 < lambda_ <= 1.0:
        raise ValueError(f"lambda_ must be in (0, 1], got {lambda_}")
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    total_tokens = (tok.agg(F.sum("dl").alias("t")).first()["t"]) or 0
    if total_tokens == 0:
        return spark.createDataFrame(
            [], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
        )

    postings = doc_term_freqs(tok)
    qterms = query_terms_df(spark, queries)
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term", "inner"
    )
    ttfs = matched.groupBy("term").agg(F.sum("tf").alias("ttf"))

    p_c = F.col("ttf") / F.lit(float(total_tokens))
    lam = F.lit(float(lambda_))
    w = F.log(
        F.lit(1.0)
        + ((F.lit(1.0) - lam) * F.col("tf") / F.col("dl")) / (lam * p_c)
    )
    scored = (
        matched.join(F.broadcast(ttfs), "term")
        .withColumn("w", w)
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    return topk_per_query(scored, k)


def duckdb_jm_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    lambda_: float = 0.1,
) -> str:
    """DuckDB twin of :func:`jm_search` (ttf from the full token
    stream); callers compare ``round(score, 6)``."""
    qrows = []
    for qid, text in queries:
        for term in sorted(set(tokenize_py(text))):
            qrows.append(f"({qid}, '{term}')")
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL) LIMIT 0"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
corpus AS (
  SELECT sum(len(tokens)) AS total_tokens FROM toks
),
tf AS (
  SELECT t.doc_id, u.term, count(*) AS tf,
         any_value(len(t.tokens)) AS dl
  FROM toks t, unnest(t.tokens) AS u(term)
  GROUP BY t.doc_id, u.term
),
qt AS (
  SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)
),
ttfs AS (
  SELECT term, sum(tf) AS ttf FROM tf GROUP BY term
),
weights AS (
  SELECT f.doc_id, f.term,
         ln(1.0 + ((1.0 - {lambda_}) * f.tf / f.dl)
                  / ({lambda_} * (s.ttf / c.total_tokens))) AS w
  FROM tf f JOIN ttfs s ON f.term = s.term, corpus c
),
scored AS (
  SELECT q.query_id, w.doc_id, sum(w.w) AS score
  FROM weights w JOIN qt q ON w.term = q.term
  GROUP BY q.query_id, w.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, 9) DESC, doc_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, doc_id, round(score, 6) AS score, rank
FROM ranked WHERE rank <= {k}
"""


def duckdb_dirichlet_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    mu: float = MU_DEFAULT,
) -> str:
    """DuckDB twin of :func:`dirichlet_search` — ttf re-derived from
    the full token stream (vs Spark's matched-set derivation); callers
    compare ``round(score, 6)``."""
    qrows = []
    for qid, text in queries:
        for term in sorted(set(tokenize_py(text))):
            qrows.append(f"({qid}, '{term}')")
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL) LIMIT 0"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
corpus AS (
  SELECT sum(len(tokens)) AS total_tokens FROM toks
),
tf AS (
  SELECT t.doc_id, u.term, count(*) AS tf,
         any_value(len(t.tokens)) AS dl
  FROM toks t, unnest(t.tokens) AS u(term)
  GROUP BY t.doc_id, u.term
),
qt AS (
  SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)
),
ttfs AS (
  SELECT term, sum(tf) AS ttf FROM tf GROUP BY term
),
weights AS (
  SELECT f.doc_id, f.term,
         greatest(0.0,
           ln(1.0 + f.tf / ({mu} * (s.ttf / c.total_tokens)))
           + ln({mu} / (f.dl + {mu}))) AS w
  FROM tf f JOIN ttfs s ON f.term = s.term, corpus c
),
scored AS (
  SELECT q.query_id, w.doc_id, sum(w.w) AS score
  FROM weights w JOIN qt q ON w.term = q.term
  GROUP BY q.query_id, w.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, 9) DESC, doc_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, doc_id, round(score, 6) AS score, rank
FROM ranked WHERE rank <= {k}
"""
