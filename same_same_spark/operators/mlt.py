"""More-like-this — document-as-query retrieval.

The reference is a similarity engine ("same-same"): given an item, find
items like it. Its semantic path embeds the document and runs cosine
(``internal/storage/search/search.go:16-42``); this operator is the
LEXICAL twin the fulltext engine side needs (Lucene's MoreLikeThis
shape): pick the source document's most characteristic terms, run them
as a BM25 query, exclude the source itself.

Pinned semantics (cross-engine, re-derived in :func:`duckdb_mlt_sql`):

- candidate query terms = the source doc's distinct X1 tokens;
- term salience = ``tf(t, src) * idf(t)`` with the engine's pinned
  Lucene idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``;
- selected terms = top ``max_terms`` under
  ``(round(salience, 9) DESC, term ASC)``;
- result = BM25 top-k of the selected terms over the corpus MINUS the
  source doc, pinned order ``(round(score, 9) DESC, doc_id ASC)``.

Scale shape: the source docs are a tiny driver-side id list, so their
posting rows are a pushed-down filter; df is computed once for exactly
the source docs' terms from the full posting set (one shuffle, same
argument as ``score_queries``); per-source term selection is a bounded
``sort_array``/``slice`` (a source doc has at most dl distinct terms —
no WindowExec); the selected (source, term) set is broadcast back for
scoring and the final top-k goes through the bounded tournament.
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
from same_same_spark.operators.topk import topk_per_query
from same_same_spark.stats import corpus_stats, doc_term_freqs, tokenized


def more_like_this(
    docs_df: DataFrame,
    source_ids: list[int],
    k: int = 10,
    max_terms: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k similar docs per source doc id.

    Returns (query_id = the source doc id, doc_id, score DOUBLE,
    rank INT). A source id with no tokens (or absent from the corpus)
    yields no rows. Non-numeric (e.g. string) ids are accepted —
    they pass through to the id-typed isin filter untouched.
    """
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)
    if cs.avgdl == 0 or not source_ids:
        return spark.createDataFrame(
            [], "query_id LONG, doc_id LONG, score DOUBLE, rank INT"
        )
    try:
        ids = sorted(set(int(i) for i in source_ids))
    except (TypeError, ValueError):
        ids = sorted(set(source_ids))

    postings = doc_term_freqs(tok)  # (doc_id, term, tf, dl)
    src = postings.filter(F.col("doc_id").isin(ids)).select(
        F.col("doc_id").alias("query_id"), "term",
        F.col("tf").alias("src_tf"),
    )
    # df for exactly the source docs' terms, from the full posting set.
    dfs = postings.join(
        F.broadcast(src.select("term").distinct()), "term", "semi"
    ).groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    sal = src.join(F.broadcast(dfs), "term").withColumn(
        "salience", F.col("src_tf") * idf_col(F.col("df"), cs.n_docs)
    )
    # Bounded per-source term selection: (0.0 - round(sal, 9), term) ASC
    # == (salience DESC, term ASC); a doc has <= dl distinct terms.
    entry = F.struct(
        (F.lit(0.0) - F.round(F.col("salience"), 9)).alias("nk"),
        F.col("term").alias("term"),
    )
    selected = (
        sal.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(entry)), 1, max_terms
            ).alias("top_terms")
        )
        .select(
            "query_id",
            F.explode(F.transform("top_terms", lambda s: s["term"])).alias(
                "term"
            ),
        )
    )

    matched = postings.join(
        F.broadcast(selected.select("term").distinct()), "term"
    )
    qdfs = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        matched.join(F.broadcast(qdfs), "term")
        .withColumn("idf", idf_col(F.col("df"), cs.n_docs))
        .withColumn(
            "w",
            bm25_weight_col(
                F.col("tf"), F.col("dl"), F.col("idf"), cs.avgdl, k1, b
            ),
        )
        .join(F.broadcast(selected), "term")
        .filter(F.col("doc_id") != F.col("query_id"))  # exclude self
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    out = topk_per_query(scored, k)
    # normalize numeric source ids to LONG (the documented schema);
    # string ids pass through untouched (ANSI would refuse the cast)
    if dict(out.dtypes)["query_id"] in ("tinyint", "smallint", "int", "bigint"):
        out = out.withColumn("query_id", F.col("query_id").cast("long"))
    return out


def duckdb_mlt_sql(
    table: str,
    id_col: str,
    text_col: str,
    source_ids: list[int],
    k: int = 10,
    max_terms: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`more_like_this` (score compared at 6dp)."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    ids = sorted(set(int(i) for i in source_ids))
    id_list = ", ".join(str(i) for i in ids) or "NULL"
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
src AS (
  SELECT doc_id AS query_id, term, tf AS src_tf
  FROM tfc WHERE doc_id IN ({id_list})
),
src_dfs AS (
  SELECT term, count(*) AS df FROM tfc
  WHERE term IN (SELECT DISTINCT term FROM src)
  GROUP BY term
),
sal AS (
  SELECT s.query_id, s.term,
         s.src_tf * ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5)) AS salience
  FROM src s JOIN src_dfs d ON s.term = d.term CROSS JOIN corpus c
),
selected AS (
  SELECT query_id, term FROM (
    SELECT query_id, term, row_number() OVER (
      PARTITION BY query_id
      ORDER BY round(salience, 9) DESC, term ASC
    ) AS rn
    FROM sal
  ) WHERE rn <= {max_terms}
),
qdfs AS (
  SELECT term, count(*) AS df FROM tfc
  WHERE term IN (SELECT DISTINCT term FROM selected)
  GROUP BY term
),
idf AS (
  SELECT d.term, ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM qdfs d, corpus c
),
scored AS (
  SELECT q.query_id, t.doc_id, {score_expr} AS score
  FROM tfc t
  JOIN selected q ON t.term = q.term
  JOIN idf s ON t.term = s.term
  CROSS JOIN corpus c
  WHERE t.doc_id <> q.query_id
  GROUP BY q.query_id, t.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score, row_number() OVER (
    PARTITION BY query_id ORDER BY round(score, 9) DESC, doc_id ASC
  ) AS rank
  FROM scored
)
SELECT query_id::BIGINT AS query_id, doc_id,
       round(score, {round_score}) AS score, rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""
