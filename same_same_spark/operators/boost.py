"""Query-time term boosting — Lucene's ``term^boost`` syntax over BM25.

A beyond-reference fulltext feature: the reference weighs every query
term equally (``internal/storage/search/search.go:16-42``); real query
languages let the caller re-weight terms at query time
(``title^2 body``). Pinned semantics (cross-engine, re-derived in
:func:`duckdb_boosted_sql`):

- a query string splits on whitespace into chunks; a chunk may carry a
  trailing ``^<float>`` boost (default 1.0; the boost must parse as a
  non-negative float, else ValueError driver-side);
- the chunk's term part tokenizes with X1 (it may yield several tokens
  — e.g. ``foo-bar^2`` boosts both ``foo`` and ``bar`` — or none, in
  which case the chunk contributes nothing);
- per (query, term) the effective boost is the SUM over occurrences
  (Lucene's duplicate-term behavior: ``foo^2 foo`` scores like two
  clauses, total weight 3.0); a zero effective boost drops the term
  from matching entirely;
- ``score(q, d) = Σ_t boost(q, t) · w(t, d)`` with the engine's pinned
  BM25 ``w``; top-k under ``(round(score, 9) DESC, doc_id ASC)``.

Scale shape: identical to ``bm25.score_queries`` — boosts ride the
(tiny, driver-built, broadcast) query-term table as one extra column;
one broadcast posting join, df from the matched set, bounded
tournament top-k. Boosting adds ZERO new shuffles.
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
from same_same_spark.text.tokenizer import tokenize_py


def parse_boosted_query(text: str) -> dict[str, float]:
    """{term: effective_boost} for one query string (driver-side).

    Deterministic: terms sort lexicographically in the returned dict.
    Raises ValueError on a malformed boost suffix.
    """
    boosts: dict[str, float] = {}
    for chunk in text.split():
        term_part, sep, boost_part = chunk.rpartition("^")
        if sep:
            try:
                boost = float(boost_part)
            except ValueError:
                raise ValueError(
                    f"malformed boost in query chunk {chunk!r}"
                ) from None
            if boost < 0:
                raise ValueError(
                    f"negative boost in query chunk {chunk!r}"
                )
        else:
            term_part, boost = chunk, 1.0
        for term in tokenize_py(term_part):
            boosts[term] = boosts.get(term, 0.0) + boost
    return {
        t: b for t, b in sorted(boosts.items()) if b > 0.0
    }


def boosted_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k boosted BM25 for (query_id, "term^2 other") query strings.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT).
    """
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)

    qrows = [
        (qid, term, boost)
        for qid, text in queries
        for term, boost in parse_boosted_query(text).items()
    ]
    empty = spark.createDataFrame(
        [], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
    )
    if not qrows or cs.avgdl == 0:
        return empty
    qterms = spark.createDataFrame(
        qrows, "query_id INT, term STRING, boost DOUBLE"
    )

    postings = doc_term_freqs(tok)
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term", "inner"
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
        .agg(F.sum(F.col("boost") * F.col("w")).alias("score"))
    )
    return topk_per_query(scored, k)


def duckdb_boosted_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`boosted_search` (score compared at 6dp).

    Boost parsing is shared driver-side code (:func:`parse_boosted_query`
    emits the same (query, term, boost) table into the SQL literal), so
    the differential checks the weighted scoring + ranking."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    qrows = [
        f"({qid}, '{term}', {boost!r})"
        for qid, text in queries
        for term, boost in parse_boosted_query(text).items()
    ]
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL, NULL) LIMIT 0"
    score_expr = (
        f"sum(q.boost * s.idf * t.tf * ({k1} + 1.0) / "
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
qt AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term, boost)),
dfs AS (
  SELECT tfc.term, count(*) AS df FROM tfc
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


def boosting_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str, str]],
    k: int = 10,
    negative_boost: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """ES ``boosting`` query: rank by the positive query's BM25 score,
    DEMOTING (not excluding) docs that also match the negative query.

    Pinned semantics (cross-engine, re-derived in
    :func:`duckdb_boosting_sql`):

    - ``queries`` rows are ``(query_id, positive_text,
      negative_text)``; the match set and base score are the engine's
      pinned BM25 over the positive terms (a doc matching ONLY
      negative terms never appears — ES's rule);
    - a doc containing >= 1 of the query's distinct negative X1 terms
      has its score multiplied by ``negative_boost`` (one multiplier
      regardless of how many negative terms hit — ES applies the
      factor once);
    - ``negative_boost`` must be in [0, 1] (0 = sink demoted docs to
      score 0 but keep them; ES requires a non-negative factor and
      > 1 would invert the query's intent — rejected here);
    - top-k under ``(round(score, 9) DESC, doc_id ASC)``.

    Scale shape: the positive side is ``scored_matches``'s one
    broadcast-posting-join plan; the negative side adds ONE more
    broadcast term join producing a (query, doc) demotion set that
    left-joins onto the scored matches before the bounded tournament.
    No new shuffle families.
    """
    from same_same_spark.bm25 import query_terms_df, scored_matches
    from same_same_spark.stats import tokenized

    if not 0.0 <= negative_boost <= 1.0:
        raise ValueError(
            f"negative_boost must be in [0, 1], got {negative_boost}"
        )
    spark = docs_df.sparkSession
    pos = scored_matches(
        docs_df,
        [(qid, p) for qid, p, _ in queries],
        id_col=id_col,
        text_col=text_col,
        k1=k1,
        b=b,
    )
    neg_terms = query_terms_df(
        spark, [(qid, n) for qid, _, n in queries]
    )
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    demoted = (
        tok.select(
            "doc_id", F.explode(F.array_distinct("tokens")).alias("term")
        )
        .join(F.broadcast(neg_terms), "term")
        .select("query_id", "doc_id")
        .distinct()
        .withColumn("neg_hit", F.lit(True))
    )
    scored = pos.join(demoted, ["query_id", "doc_id"], "left").select(
        "query_id",
        "doc_id",
        F.when(
            F.col("neg_hit").isNotNull(),
            F.col("score") * F.lit(float(negative_boost)),
        )
        .otherwise(F.col("score"))
        .alias("score"),
    )
    return topk_per_query(scored, k)


def duckdb_boosting_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str, str]],
    k: int = 10,
    negative_boost: float = 0.5,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`boosting_search` (score at 6dp)."""
    from same_same_spark.bm25 import duckdb_scored_sql
    from same_same_spark.text.tokenizer import (
        duckdb_tokens_sql,
        tokenize_py,
    )

    inner = duckdb_scored_sql(
        table,
        id_col,
        text_col,
        [(qid, p) for qid, p, _ in queries],
        k1=k1,
        b=b,
    )
    nrows = [
        f"({qid}, '{term}')"
        for qid, _, n in queries
        for term in sorted(set(tokenize_py(n)))
    ]
    nvalues = ", ".join(nrows) if nrows else "(NULL, NULL) LIMIT 0"
    return f"""
WITH pos AS ({inner}),
ntoks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
nq AS (SELECT * FROM (VALUES {nvalues}) AS v(query_id, term)),
demoted AS (
  SELECT DISTINCT q.query_id, t.doc_id
  FROM (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM ntoks
  ) t JOIN nq q ON t.term = q.term
),
boosted AS (
  SELECT p.query_id, p.doc_id,
         CASE WHEN d.doc_id IS NOT NULL
              THEN p.score * {float(negative_boost)!r}
              ELSE p.score END AS score
  FROM pos p
  LEFT JOIN demoted d
    ON p.query_id = d.query_id AND p.doc_id = d.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score, row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(score, 9) DESC, doc_id ASC
  ) AS rank
  FROM boosted
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank
FROM ranked WHERE rank <= {int(k)}
"""
