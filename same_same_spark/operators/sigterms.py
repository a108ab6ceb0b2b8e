"""Significant-terms aggregation — terms over-represented in a query's
match set vs the background corpus.

A beyond-reference fulltext feature (Elasticsearch's
``significant_terms`` aggregation): given a query, surface the terms
whose document frequency INSIDE the match set is anomalously high
relative to their corpus-wide frequency — "what is this result set
about, beyond the words I searched for". The reference stops at ranked
hits (``internal/storage/search/search.go:16-42``).

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_sigterms_sql`):

- match set of query q: docs containing >= 1 of q's distinct X1 tokens
  (the engine's bag-of-words match semantics, shared with facets);
- ``fg_count(q, t)`` = matched docs of q containing term t (presence,
  not tf); ``bg_count(t)`` = corpus docs containing t (global df);
  ``m = |match set|``, ``n = |corpus|``;
- candidate terms: every term of every matched doc EXCEPT q's own
  query terms (they trivially top any foreground measure), with
  ``fg_count >= min_doc_count`` and ``fg_pct > bg_pct`` where
  ``fg_pct = fg_count/m``, ``bg_pct = bg_count/n``;
- score = JLH (Elasticsearch's default heuristic):
  ``(fg_pct - bg_pct) * (fg_pct / bg_pct)`` — the absolute-lift ×
  relative-lift product;
- top-n per query under ``(round(score, 9) DESC, term ASC)``, rank
  1..n; zero-token queries yield no rows.

Scale shape: one distinct (doc, term) presence relation feeds BOTH
counters — foreground via a semi-style join against the (query, doc)
match set (shuffle bounded by the matched docs' postings), background
via a map-side-combined ``groupBy(term)`` (the same aggregate an index
build's term-statistics pass produces; at index-backed scale you would
read ``df`` from the persisted stats parquet instead of recomputing).
The fg×bg join keys on ``term`` AFTER both sides are aggregated —
posting-count rows, never raw postings. Match-set sizes are a
queries-cardinality broadcast. Top-n uses the bounded
sort_array/slice tournament (no WindowExec); nothing buffers a
query's full candidate-term list in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import query_terms_df
from same_same_spark.stats import tokenized


def significant_terms(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    topn: int = 10,
    min_doc_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Top-n significant terms per query over the match set.

    Returns (query_id INT, term STRING, fg_count LONG, bg_count LONG,
    score DOUBLE, rank INT).
    """
    spark = docs_df.sparkSession
    qterms = query_terms_df(spark, queries)
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)

    # Distinct (doc, term) presence rows — the one corpus-wide relation
    # both counters derive from.
    pairs = tok.select(
        "doc_id", F.explode(F.array_distinct("tokens")).alias("term")
    )

    matched = (
        pairs.join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    msize = matched.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("m")
    )
    n_docs = F.broadcast(
        tok.agg(F.count(F.lit(1)).alias("n"))
    )

    fg = (
        matched.join(pairs, "doc_id")
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("fg_count"))
        # the query's own terms trivially dominate any foreground
        # measure — exclude them (broadcast anti join on the tiny set)
        .join(F.broadcast(qterms), ["query_id", "term"], "left_anti")
        .filter(F.col("fg_count") >= F.lit(int(min_doc_count)))
    )
    bg = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("bg_count"))

    scored = (
        fg.join(bg, "term")
        .join(F.broadcast(msize), "query_id")
        .crossJoin(n_docs)
        .withColumn("fg_pct", F.col("fg_count") / F.col("m"))
        .withColumn("bg_pct", F.col("bg_count") / F.col("n"))
        .filter(F.col("fg_pct") > F.col("bg_pct"))
        .withColumn(
            "score",
            (F.col("fg_pct") - F.col("bg_pct"))
            * (F.col("fg_pct") / F.col("bg_pct")),
        )
    )

    # Bounded tournament top-n per query under
    # (round(score, 9) DESC, term ASC) — the facets.py shape.
    entry = F.struct(
        (F.lit(0.0) - F.round("score", 9)).alias("nk"),
        F.col("term").alias("term"),
        F.col("fg_count").alias("fg_count"),
        F.col("bg_count").alias("bg_count"),
        F.col("score").alias("score"),
    )
    local = (
        scored.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "part")
        .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, topn).alias("c"))
    )
    merged = local.groupBy("query_id").agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("c"))), 1, topn
        ).alias("top")
    )
    return merged.select(
        "query_id", F.posexplode("top").alias("pos", "s")
    ).select(
        "query_id",
        F.col("s.term").alias("term"),
        F.col("s.fg_count").cast("long").alias("fg_count"),
        F.col("s.bg_count").cast("long").alias("bg_count"),
        F.col("s.score").alias("score"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


def duckdb_sigterms_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    topn: int = 10,
    min_doc_count: int = 2,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`significant_terms` (window-function ranking
    vs Spark's bounded tournament; score compared at 6dp)."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql, tokenize_py

    qrows = [
        f"({qid}, '{term}')"
        for qid, text in queries
        for term in sorted(set(tokenize_py(text)))
    ]
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL) LIMIT 0"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
pairs AS (
  SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks
),
corpus AS (SELECT count(*) AS n FROM toks),
qt AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)),
matched AS (
  SELECT DISTINCT q.query_id, p.doc_id
  FROM pairs p JOIN qt q ON p.term = q.term
),
msize AS (
  SELECT query_id, count(*) AS m FROM matched GROUP BY query_id
),
fg AS (
  SELECT m.query_id, p.term, count(*)::BIGINT AS fg_count
  FROM matched m JOIN pairs p ON m.doc_id = p.doc_id
  GROUP BY m.query_id, p.term
),
fgx AS (
  SELECT f.* FROM fg f
  WHERE NOT EXISTS (
    SELECT 1 FROM qt q
    WHERE q.query_id = f.query_id AND q.term = f.term
  ) AND f.fg_count >= {int(min_doc_count)}
),
bg AS (
  SELECT term, count(*)::BIGINT AS bg_count FROM pairs GROUP BY term
),
scored AS (
  SELECT f.query_id, f.term, f.fg_count, b.bg_count,
         ((f.fg_count * 1.0 / s.m) - (b.bg_count * 1.0 / c.n))
           * ((f.fg_count * 1.0 / s.m) / (b.bg_count * 1.0 / c.n))
           AS score
  FROM fgx f
  JOIN bg b ON f.term = b.term
  JOIN msize s ON f.query_id = s.query_id
  CROSS JOIN corpus c
  WHERE (f.fg_count * 1.0 / s.m) > (b.bg_count * 1.0 / c.n)
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(score, 9) DESC, term ASC
  ) AS rank
  FROM scored
)
SELECT query_id, term, fg_count, bg_count,
       round(score, {round_score}) AS score, rank::INTEGER AS rank
FROM ranked WHERE rank <= {topn}
"""
