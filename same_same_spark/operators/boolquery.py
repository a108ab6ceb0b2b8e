"""Boolean query search — must / should / must_not over BM25.

A beyond-reference fulltext feature (Lucene's BooleanQuery shape): the
reference scores every query as a bag of words
(``internal/storage/search/search.go:16-42``); real search surfaces
need required terms, optional scoring terms, and exclusions.

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_bool_sql`):

- each clause string tokenizes with X1; clause term sets are DISTINCT
  tokens (``must``, ``should``, ``must_not``);
- candidates: docs containing ALL must terms (when ``must`` is
  non-empty) or at least ONE should term (when ``must`` tokenizes
  empty), minus docs containing ANY must_not term;
- ``minimum_should_match`` (Elasticsearch semantics): a candidate must
  additionally contain >= that many DISTINCT should terms. The
  effective requirement per query is ``max(msm, 1)`` when must is
  empty (a pure-should query always needs one match), ``msm`` when
  must is non-empty, and 0 when the should set is empty (the knob is
  ignored without should clauses, as in Elasticsearch); a query whose
  should set is SMALLER than its requirement matches nothing (no
  clamping);
- score = BM25 (the engine's pinned model) over the distinct union of
  must + should terms, restricted to candidates;
- total order ``(round(score, 9) DESC, doc_id ASC)``, top-k;
- a query whose must AND should both tokenize empty yields no rows.

Scale shape: everything happens on the exploded posting rows via ONE
broadcast join against the (tiny) clause-term table — the must filter
is a per-(query, doc) count compared to the clause size, the exclusion
is a broadcast anti join, and df for scoring comes from the matched
postings (true global df, the ``score_queries`` argument). Top-k goes
through the bounded tournament; no WindowExec, no per-doc token-array
rescans at all (boolean semantics never need positions).
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


def boolean_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str, str, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    minimum_should_match: int = 0,
) -> DataFrame:
    """Top-k boolean search for (query_id, must, should, must_not)
    clause triples. Returns (query_id INT, doc_id, score DOUBLE,
    rank INT)."""
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)

    qrows = []  # (query_id, term, role)
    m_counts: dict[int, int] = {}
    s_required: dict[int, int] = {}
    for qid, must, should, must_not in queries:
        m = sorted(set(tokenize_py(must)))
        s = sorted(set(tokenize_py(should)))
        x = sorted(set(tokenize_py(must_not)))
        m_counts[qid] = len(m)
        s_eff = [t for t in s if t not in m]
        s_required[qid] = (
            0 if not s_eff
            else (max(minimum_should_match, 1) if not m
                  else minimum_should_match)
        )
        for t in m:
            qrows.append((qid, t, "must"))
        for t in s:
            if t not in m:
                qrows.append((qid, t, "should"))
        for t in x:
            qrows.append((qid, t, "not"))
    empty = spark.createDataFrame(
        [], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
    )
    if not qrows or cs.avgdl == 0:
        return empty
    qterms = spark.createDataFrame(
        qrows, "query_id INT, term STRING, role STRING"
    )

    postings = doc_term_freqs(tok)  # (doc_id, term, tf, dl)
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term", "inner"
    )
    dfs = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    hits = matched.join(F.broadcast(qterms), "term")
    # candidate gate: per (query, doc) — all must terms present, or
    # (no must terms) at least one should term; never any not term.
    gate = (
        hits.groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.when(F.col("role") == "must", 1).otherwise(0)
            ).alias("n_must"),
            F.sum(
                F.when(F.col("role") == "should", 1).otherwise(0)
            ).alias("n_should"),
            F.sum(
                F.when(F.col("role") == "not", 1).otherwise(0)
            ).alias("n_not"),
        )
    )
    m_df = spark.createDataFrame(
        [
            (qid, n, s_required[qid])
            for qid, n in sorted(m_counts.items())
        ],
        "query_id INT, m_required INT, s_required INT",
    )
    cand = (
        gate.join(F.broadcast(m_df), "query_id")
        .filter(
            (F.col("n_not") == 0)
            & (
                (F.col("m_required") == 0)
                | (F.col("n_must") == F.col("m_required"))
            )
            & (F.col("n_should") >= F.col("s_required"))
        )
        .select("query_id", "doc_id")
    )

    scored = (
        hits.filter(F.col("role") != "not")
        .join(F.broadcast(dfs), "term")
        .withColumn("idf", idf_col(F.col("df"), cs.n_docs))
        .withColumn(
            "w",
            bm25_weight_col(
                F.col("tf"), F.col("dl"), F.col("idf"), cs.avgdl, k1, b
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
        .join(cand, ["query_id", "doc_id"], "inner")
    )
    return topk_per_query(scored, k)


def duckdb_bool_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str, str, str]],
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
    minimum_should_match: int = 0,
) -> str:
    """DuckDB twin of :func:`boolean_search` (score compared at 6dp)."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    qrows, mrows = [], []
    for qid, must, should, must_not in queries:
        m = sorted(set(tokenize_py(must)))
        s = sorted(set(tokenize_py(should)))
        x = sorted(set(tokenize_py(must_not)))
        s_eff = [t for t in s if t not in m]
        s_req = (
            0 if not s_eff
            else (max(minimum_should_match, 1) if not m
                  else minimum_should_match)
        )
        mrows.append(f"({qid}, {len(m)}, {s_req})")
        for t in m:
            qrows.append(f"({qid}, '{t}', 'must')")
        for t in s:
            if t not in m:
                qrows.append(f"({qid}, '{t}', 'should')")
        for t in x:
            qrows.append(f"({qid}, '{t}', 'not')")
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL, NULL) LIMIT 0"
    mvalues = ", ".join(mrows) if mrows else "(NULL, NULL, NULL) LIMIT 0"
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
qt AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term, role)),
mreq AS (SELECT * FROM (VALUES {mvalues})
         AS v(query_id, m_required, s_required)),
dfs AS (
  SELECT tfc.term, count(*) AS df FROM tfc
  WHERE tfc.term IN (SELECT DISTINCT term FROM qt)
  GROUP BY tfc.term
),
idf AS (
  SELECT d.term, ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM dfs d, corpus c
),
gate AS (
  SELECT q.query_id, t.doc_id,
         sum(CASE WHEN q.role = 'must' THEN 1 ELSE 0 END) AS n_must,
         sum(CASE WHEN q.role = 'should' THEN 1 ELSE 0 END) AS n_should,
         sum(CASE WHEN q.role = 'not' THEN 1 ELSE 0 END) AS n_not
  FROM tfc t JOIN qt q ON t.term = q.term
  GROUP BY q.query_id, t.doc_id
),
cand AS (
  SELECT g.query_id, g.doc_id
  FROM gate g JOIN mreq m ON g.query_id = m.query_id
  WHERE g.n_not = 0
    AND (m.m_required = 0 OR g.n_must = m.m_required)
    AND g.n_should >= m.s_required
),
scored AS (
  SELECT q.query_id, t.doc_id, {score_expr} AS score
  FROM tfc t
  JOIN qt q ON t.term = q.term AND q.role <> 'not'
  JOIN idf s ON t.term = s.term
  CROSS JOIN corpus c
  GROUP BY q.query_id, t.doc_id
),
ranked AS (
  SELECT sc.query_id, sc.doc_id, sc.score, row_number() OVER (
    PARTITION BY sc.query_id
    ORDER BY round(sc.score, 9) DESC, sc.doc_id ASC
  ) AS rank
  FROM scored sc JOIN cand cd
    ON sc.query_id = cd.query_id AND sc.doc_id = cd.doc_id
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""


def terms_set_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    msm_col: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """ES ``terms_set`` query: the minimum_should_match comes FROM the
    document — "match if the doc holds at least ``msm_col``-many of
    the query's terms" (the tags/skills-matching workhorse).

    Pinned semantics (cross-engine, re-derived in
    :func:`duckdb_terms_set_sql`):

    - per (query, doc): n = how many of the query's m distinct X1
      terms the doc contains; the doc matches iff
      ``n >= greatest(1, least(msm_col(d), m))`` — the ubiquitous
      ``Math.min(params.num_terms, doc[field])`` script idiom, floored
      at 1 so a zero/negative field never matches everything;
    - a NULL ``msm_col`` never matches (ES requires the field);
    - matches score with the engine's pinned BM25 over the query
      terms, pinned total order.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT,
    n_matched INT).

    Scale shape: the same single broadcast-posting-join plan as
    boolean_search; the per-doc requirement joins from the doc side as
    one pruned column.
    """
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)
    qrows = [
        (qid, term, len(set(tokenize_py(text))))
        for qid, text in queries
        for term in sorted(set(tokenize_py(text)))
    ]
    empty = spark.createDataFrame(
        [],
        "query_id INT, doc_id LONG, score DOUBLE, rank INT, n_matched INT",
    )
    if not qrows or cs.avgdl == 0:
        return empty
    qterms = spark.createDataFrame(
        qrows, "query_id INT, term STRING, m INT"
    )
    postings = doc_term_freqs(tok)
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term", "inner"
    )
    dfs = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    hits = matched.join(F.broadcast(qterms), "term")

    msm = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(msm_col).cast("int").alias("__msm"),
    )
    gated = (
        hits.groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.first("m").alias("m"),
        )
        .join(msm, "doc_id")
        .filter(
            F.col("__msm").isNotNull()
            & (
                F.col("n_matched")
                >= F.greatest(F.lit(1), F.least(F.col("__msm"), F.col("m")))
            )
        )
        .select("query_id", "doc_id", "n_matched")
    )
    scored = (
        hits.join(F.broadcast(dfs), "term")
        .withColumn("idf", idf_col(F.col("df"), cs.n_docs))
        .withColumn(
            "w",
            bm25_weight_col(
                F.col("tf"), F.col("dl"), F.col("idf"), cs.avgdl, k1, b
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
        .join(gated.select("query_id", "doc_id"), ["query_id", "doc_id"])
    )
    top = topk_per_query(scored, k)
    return top.join(gated, ["query_id", "doc_id"], "inner").select(
        "query_id",
        "doc_id",
        "score",
        "rank",
        F.col("n_matched").cast("int").alias("n_matched"),
    )


def duckdb_terms_set_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    msm_col: str,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
    prelude_ctes: str = "",
) -> str:
    """DuckDB twin of :func:`terms_set_search` (score at 6dp).
    ``prelude_ctes`` (e.g. ``"docs_ts AS (...), "``) lets callers feed
    a derived-msm table."""
    from same_same_spark.bm25 import duckdb_scored_sql
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    qrows = [
        f"({qid}, '{term}', {len(set(tokenize_py(text)))})"
        for qid, text in queries
        for term in sorted(set(tokenize_py(text)))
    ]
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL, NULL) LIMIT 0"
    inner = duckdb_scored_sql(table, id_col, text_col, queries, k1=k1, b=b)
    return f"""
WITH {prelude_ctes}tok3 AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
qt3 AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term, m)),
gate AS (
  SELECT q.query_id, t.doc_id, count(*)::INTEGER AS n_matched,
         any_value(q.m) AS m
  FROM (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM tok3
  ) t JOIN qt3 q ON t.term = q.term
  GROUP BY 1, 2
),
matched AS (
  SELECT g.query_id, g.doc_id, g.n_matched
  FROM gate g JOIN {table} d ON g.doc_id = d.{id_col}
  WHERE d.{msm_col} IS NOT NULL
    AND g.n_matched >= greatest(1, least(d.{msm_col}::INTEGER, g.m))
),
scored AS ({inner}),
ranked AS (
  SELECT s.query_id, s.doc_id, s.score, m.n_matched, row_number() OVER (
    PARTITION BY s.query_id
    ORDER BY round(s.score, 9) DESC, s.doc_id ASC
  ) AS rank
  FROM scored s
  JOIN matched m ON s.query_id = m.query_id AND s.doc_id = m.doc_id
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank, n_matched
FROM ranked WHERE rank <= {k}
"""
