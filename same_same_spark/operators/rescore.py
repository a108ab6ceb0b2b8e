"""Query rescoring — Elasticsearch's ``rescore`` block: re-rank the
top ``window_size`` hits of a cheap primary query with a more
expensive secondary query, combine the scores, emit the final top-k.

A beyond-reference fulltext feature: the reference ranks once with its
bag-of-words scorer (``internal/storage/search/search.go:16-42``);
production search surfaces run match → match_phrase rescoring to get
phrase precision without paying phrase cost on the full corpus.

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_rescore_sql`):

- primary = the engine's pinned BM25 over the query's distinct X1
  terms (``bm25.scored_matches``); the rescore WINDOW is the top
  ``window_size`` docs under the pinned total order
  ``(round(primary, 9) DESC, doc_id ASC)``;
- secondary = the same text as an EXACT PHRASE, scored Lucene
  PhraseQuery-style on window docs only: ``tf`` = the number of
  contiguous phrase occurrences (the adjacency count phrase_search
  pins), ``idf`` = the sum of the phrase's DISTINCT terms' idfs,
  plugged into the SAME BM25 weight formula; a window doc without the
  phrase scores 0;
- final = ``query_weight * primary + rescore_weight * secondary``
  (Elasticsearch's default ``score_mode: total``), ranked within the
  window under ``(round(final, 9) DESC, doc_id ASC)``, top-k.

Scale shape: the primary pass is the ordinary scored-matches plan; the
window is bounded (queries × window_size rows — a tournament, never a
WindowExec) and BROADCAST back against the token table, so phrase
verification touches exactly the window docs' token arrays (the whole
point of rescoring: the expensive operator runs on a bounded set). The
final re-rank is a tournament over ≤ window_size rows per query.
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
    scored_matches,
)
from same_same_spark.operators.phrase import phrase_count_col
from same_same_spark.operators.topk import topk_per_query
from same_same_spark.stats import corpus_stats, doc_term_freqs, tokenized
from same_same_spark.text.tokenizer import tokenize_py


def rescore_topk(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """BM25 → phrase-rescore → top-k for (query_id, text) queries.

    Returns (query_id INT, doc_id, score DOUBLE, primary_score DOUBLE,
    rescore_score DOUBLE, rank INT) — ``score`` is the combined final,
    rank 1..k per query within the rescore window.
    """
    if window_size < k:
        raise ValueError(
            f"window_size={window_size} must be >= k={k} (ES contract: "
            "the final page comes out of the rescored window)"
        )
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)
    empty = spark.createDataFrame(
        [],
        "query_id INT, doc_id LONG, score DOUBLE, primary_score DOUBLE, "
        "rescore_score DOUBLE, rank INT",
    )
    if cs.avgdl == 0:
        return empty

    scored = scored_matches(
        docs_df, queries, id_col=id_col, text_col=text_col,
        k1=k1, b=b, stats=(cs.n_docs, cs.avgdl),
    )
    window = topk_per_query(scored, window_size).select(
        "query_id", "doc_id", F.col("score").alias("primary_score")
    )

    # Σ idf over each query's DISTINCT terms (Lucene PhraseQuery idf).
    qterms = query_terms_df(spark, queries)
    dfs = (
        doc_term_freqs(tok)
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    qidf = (
        qterms.join(dfs, "term")
        .withColumn("idf", idf_col(F.col("df"), cs.n_docs))
        .groupBy("query_id")
        .agg(F.sum("idf").alias("qidf"))
    )
    qtoks_rows = [
        (qid, toks)
        for qid, toks in ((qid, tokenize_py(t)) for qid, t in queries)
        if toks
    ]
    if not qtoks_rows:
        return empty
    qtoks = spark.createDataFrame(
        qtoks_rows, "query_id INT, phrase_toks ARRAY<STRING>"
    )

    joined = (
        tok.select("doc_id", "tokens")
        .join(F.broadcast(window), "doc_id")
        .join(F.broadcast(qtoks), "query_id")
        .join(F.broadcast(qidf), "query_id")
        .withColumn(
            "n_matches",
            phrase_count_col(F.col("tokens"), F.col("phrase_toks")),
        )
        .withColumn(
            "rescore_score",
            F.when(
                F.col("n_matches") > 0,
                bm25_weight_col(
                    F.col("n_matches").cast("double"),
                    F.size("tokens"),
                    F.col("qidf"),
                    cs.avgdl,
                    k1,
                    b,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "score",
            F.lit(float(query_weight)) * F.col("primary_score")
            + F.lit(float(rescore_weight)) * F.col("rescore_score"),
        )
        .select(
            "query_id", "doc_id", "score", "primary_score",
            "rescore_score",
        )
    )
    top = topk_per_query(
        joined.select("query_id", "doc_id", "score"), k
    )
    return top.join(
        joined.select(
            "query_id", "doc_id", "primary_score", "rescore_score"
        ),
        ["query_id", "doc_id"],
    ).select(
        "query_id", "doc_id", "score", "primary_score",
        "rescore_score", "rank",
    )


def duckdb_rescore_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`rescore_topk` (floats compared at 6dp).

    Independent re-derivation: window selection via a window function
    over the full scored set (vs Spark's bounded tournament), phrase
    counts via unprefiltered list-slice scans, Σidf recomputed from its
    own CTE chain."""
    from same_same_spark.bm25 import duckdb_scored_sql
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    inner = duckdb_scored_sql(
        table, id_col, text_col, queries, k1=k1, b=b
    )
    qt_rows, ph_rows = [], []
    for qid, text in queries:
        toks = tokenize_py(text)
        for term in sorted(set(toks)):
            qt_rows.append(f"({qid}, '{term}')")
        if toks:
            lits = ", ".join(f"'{t}'" for t in toks)
            ph_rows.append(f"({qid}, [{lits}], {len(toks)})")
    qvalues = ", ".join(qt_rows) if qt_rows else "(NULL, NULL) LIMIT 0"
    pvalues = (
        ", ".join(ph_rows) if ph_rows else "(NULL, NULL, NULL) LIMIT 0"
    )
    return f"""
WITH scored AS ({inner}),
rtoks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
rdocstat AS (SELECT doc_id, len(tokens) AS dl FROM rtoks),
rcorpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM rdocstat),
rqt AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)),
rphrases AS (SELECT * FROM (VALUES {pvalues}) AS v(query_id, ptoks, m)),
rdfs AS (
  SELECT term, count(*) AS df FROM (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM rtoks
  )
  WHERE term IN (SELECT DISTINCT term FROM rqt)
  GROUP BY term
),
rqidf AS (
  SELECT q.query_id,
         sum(ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))) AS qidf
  FROM rqt q JOIN rdfs d ON q.term = d.term CROSS JOIN rcorpus c
  GROUP BY q.query_id
),
win AS (
  SELECT query_id, doc_id, score AS primary_score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, 9) DESC, doc_id ASC
         ) AS wrank
  FROM scored QUALIFY wrank <= {window_size}
),
counted AS (
  SELECT w.query_id, w.doc_id, w.primary_score,
         CASE WHEN len(t.tokens) >= p.m THEN len(list_filter(
           range(1, len(t.tokens) - p.m + 2),
           i -> list_slice(t.tokens, i, i + p.m - 1) = p.ptoks
         )) ELSE 0 END AS n_matches,
         len(t.tokens) AS dl
  FROM win w
  JOIN rtoks t ON w.doc_id = t.doc_id
  JOIN rphrases p ON w.query_id = p.query_id
),
combined AS (
  SELECT c.query_id, c.doc_id, c.primary_score,
         CASE WHEN c.n_matches > 0 THEN
           q.qidf * c.n_matches * ({k1} + 1.0) /
           (c.n_matches + {k1} * (1.0 - {b} + {b} * c.dl / r.avgdl))
         ELSE 0.0 END AS rescore_score
  FROM counted c
  JOIN rqidf q ON c.query_id = q.query_id
  CROSS JOIN rcorpus r
),
final AS (
  SELECT query_id, doc_id,
         {float(query_weight)} * primary_score
           + {float(rescore_weight)} * rescore_score AS score,
         primary_score, rescore_score,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round({float(query_weight)} * primary_score
             + {float(rescore_weight)} * rescore_score, 9) DESC,
             doc_id ASC
         ) AS rank
  FROM combined
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       round(primary_score, {round_score}) AS primary_score,
       round(rescore_score, {round_score}) AS rescore_score,
       rank::INTEGER AS rank
FROM final WHERE rank <= {k}
"""
