"""Fuzzy term queries — edit-distance query rewrite over BM25.

A beyond-reference fulltext feature (Lucene's FuzzyQuery): each query
term also matches vocabulary terms within a bounded Levenshtein
distance, down-weighted by how far they are.

Pinned semantics (cross-engine, re-derived in :func:`duckdb_fuzzy_sql`):

- query terms = DISTINCT X1 tokens of the query text;
- per query term, the expansion set = vocabulary terms with
  ``levenshtein(qterm, term) <= max_edits`` (plain unit-cost
  Levenshtein — Spark ``F.levenshtein`` and DuckDB ``levenshtein``
  agree), ranked ``(distance ASC, df DESC, term ASC)`` and truncated to
  ``max_expansions`` (the deterministic cap is part of the contract);
- similarity weight ``sim = 1 - distance / length(qterm)`` (double
  division; X1 terms have length >= 3, so with max_edits <= 2 sim stays
  positive);
- doc score = Σ over (query term, expansion) pairs of
  ``sim * bm25_weight(expansion term, doc)`` — a vocabulary term
  reachable from two query terms contributes once PER QUERY TERM, like
  Lucene's per-term rewrite; df is the expansion term's true global df;
- total order ``(round(score, 9) DESC, doc_id ASC)``, top-k.

Scale shape: candidate generation is the SymSpell deletion-key HASH
join from :mod:`same_same_spark.operators.spell` (never a cross join
against the vocabulary); the oracle deliberately brute-forces the
vocab × query-term cross join, so the deletion-key recall theorem is
verified AT THE RETRIEVAL LEVEL by this differential. Expansion caps
use the bounded tournament, the posting join broadcasts
≤ query-terms × max_expansions rows, and top-k goes through
:func:`~same_same_spark.operators.topk.topk_per_query`.
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
from same_same_spark.operators.spell import _deletions_py, deletion_keys_col
from same_same_spark.operators.topk import topk_per_query
from same_same_spark.stats import (
    corpus_stats,
    doc_term_freqs,
    term_doc_freqs,
    tokenized,
)
from same_same_spark.text.tokenizer import tokenize_py


def fuzzy_expansions(
    vocab_df: DataFrame,
    query_terms: list[tuple[int, str]],
    max_edits: int = 1,
    max_expansions: int = 10,
) -> DataFrame:
    """Expansion table for (query_id, qterm) pairs against a (term, df)
    vocabulary: (query_id INT, qterm STRING, term STRING, df LONG,
    distance INT, sim DOUBLE), capped per (query_id, qterm)."""
    spark = vocab_df.sparkSession
    pairs = sorted(set(query_terms))
    qrows = [
        (qid, q, key)
        for qid, q in pairs
        for key in _deletions_py(q, max_edits)
    ]
    if not qrows:
        return spark.createDataFrame(
            [],
            "query_id INT, qterm STRING, term STRING, df LONG, "
            "distance INT, sim DOUBLE",
        )
    qkeys = spark.createDataFrame(
        qrows, "query_id INT, qterm STRING, key STRING"
    )
    vkeys = vocab_df.select(
        F.col("term"),
        F.col("df").cast("long").alias("df"),
        F.explode(deletion_keys_col(F.col("term"), max_edits)).alias("key"),
    )
    cand = (
        vkeys.join(F.broadcast(qkeys), "key")
        .select("query_id", "qterm", "term", "df")
        .distinct()
        .withColumn(
            "distance", F.levenshtein(F.col("qterm"), F.col("term"))
        )
        .filter(F.col("distance") <= max_edits)
    )
    entry = F.struct(
        F.col("distance").alias("d"),
        (-F.col("df")).alias("negdf"),
        F.col("term").alias("term"),
        F.col("df").alias("df"),
    )
    local = (
        cand.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "qterm", "part")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(entry)), 1, max_expansions
            ).alias("c")
        )
    )
    return (
        local.groupBy("query_id", "qterm")
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("c"))),
                1,
                max_expansions,
            ).alias("top")
        )
        .select("query_id", "qterm", F.explode("top").alias("s"))
        .select(
            "query_id",
            "qterm",
            F.col("s.term").alias("term"),
            F.col("s.df").alias("df"),
            F.col("s.d").cast("int").alias("distance"),
        )
        .withColumn(
            "sim",
            F.lit(1.0)
            - F.col("distance").cast("double")
            / F.length("qterm").cast("double"),
        )
    )


def fuzzy_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_edits: int = 1,
    max_expansions: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k fuzzy search for (query_id, text) queries.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT).
    """
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)
    qterm_pairs = [
        (qid, t)
        for qid, text in queries
        for t in sorted(set(tokenize_py(text)))
    ]
    empty = spark.createDataFrame(
        [], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
    )
    if not qterm_pairs or cs.avgdl == 0:
        return empty

    expansions = fuzzy_expansions(
        term_doc_freqs(tok), qterm_pairs, max_edits, max_expansions
    )
    scored = (
        doc_term_freqs(tok)
        .join(F.broadcast(expansions), "term")
        .withColumn("idf", idf_col(F.col("df"), cs.n_docs))
        .withColumn(
            "w",
            F.col("sim")
            * bm25_weight_col(
                F.col("tf"), F.col("dl"), F.col("idf"), cs.avgdl, k1, b
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    return topk_per_query(scored, k)


def duckdb_fuzzy_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_edits: int = 1,
    max_expansions: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`fuzzy_search` (score compared at 6dp) —
    deliberately the BRUTE-FORCE vocab × query-term cross join, so the
    Spark side's SymSpell deletion-key recall is exactly what the
    differential verifies."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    pairs = sorted(
        {
            (qid, t)
            for qid, text in queries
            for t in set(tokenize_py(text))
        }
    )
    qvalues = (
        ", ".join(f"({qid}, '{t}')" for qid, t in pairs)
        if pairs
        else "(NULL, NULL) LIMIT 0"
    )
    score_expr = (
        f"sum(e.sim * ln(1.0 + (c.n - e.df + 0.5) / (e.df + 0.5)) "
        f"* t.tf * ({k1} + 1.0) / "
        f"(t.tf + {k1} * (1.0 - {b} + {b} * t.dl / c.avgdl)))"
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
docstat AS (SELECT doc_id, len(tokens) AS dl FROM toks),
corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM docstat),
vocab AS (
  SELECT term, count(*) AS df
  FROM (SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks)
  GROUP BY term
),
q AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, qterm)),
cand AS (
  SELECT q.query_id, q.qterm, v.term, v.df,
         levenshtein(q.qterm, v.term) AS distance
  FROM q CROSS JOIN vocab v
  WHERE levenshtein(q.qterm, v.term) <= {max_edits}
),
expand_ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id, qterm
    ORDER BY distance ASC, df DESC, term ASC
  ) AS rn
  FROM cand
),
expanded AS (
  SELECT query_id, qterm, term, df, distance,
         1.0 - distance / CAST(length(qterm) AS DOUBLE) AS sim
  FROM expand_ranked WHERE rn <= {max_expansions}
),
tfc AS (
  SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
  FROM (
    SELECT t.doc_id, unnest(t.tokens) AS term, d.dl
    FROM toks t JOIN docstat d ON t.doc_id = d.doc_id
  )
  GROUP BY doc_id, term
),
scored AS (
  SELECT e.query_id, t.doc_id, {score_expr} AS score
  FROM tfc t JOIN expanded e ON t.term = e.term
  CROSS JOIN corpus c
  GROUP BY e.query_id, t.doc_id
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
