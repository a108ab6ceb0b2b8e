"""Ordered span-near queries — Lucene's ``SpanNearQuery(inOrder=true)``
/ Elasticsearch ``span_near``: the query terms must appear IN ORDER
with at most ``slop`` extra positions inside the matched span.

Completes the engine's positional family: phrase = in-order slop 0
(``operators/phrase.py``), proximity = unordered window
(``operators/proximity.py``), span-near = in-order with gaps.

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_span_near_sql`):

- the query's X1 token SEQUENCE t1..tm (duplicates kept in order) must
  embed into the doc's token sequence at strictly increasing positions
  i1 < ... < im with ``im - i1 + 1 - m <= slop``;
- ``n_spans`` counts the start positions i1 (occurrences of t1) whose
  GREEDY completion — each later term taking its EARLIEST occurrence
  after the previous match — fits the slop budget. Greedy minimizes im
  for a given i1, so a start is counted iff ANY valid embedding begins
  there (the greedy test is exact, not a heuristic);
- candidates (docs containing every distinct term) are BM25-ranked
  exactly like the phrase/proximity family, rank restricted to
  matches, pinned total order.

Scale shape: identical to phrase search — candidates from the posting
join (all-terms coverage), the positional verification runs as PURE
JVM column math (a fold over the query's term array; per-term position
lists are bounded by tf) on candidate docs only; single-term queries
degrade to exact term match. Scoring/ranking reuse the shared
machinery (one scored relation, bounded tournament).
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


def span_count_col(
    tokens: Column, qtoks: Column, slop: Column
) -> Column:
    """Number of in-order embeddings' start positions of ``qtoks`` in
    ``tokens`` within the slop budget (see module pin). Pure JVM column
    math: positions of the first term filtered by a greedy fold over
    the remaining terms."""
    n = F.size(tokens)
    m = F.size(qtoks)
    idxs = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))

    def positions_of(term):
        return F.filter(
            idxs, lambda x: F.element_at(tokens, x) == term
        )

    starts = positions_of(F.element_at(qtoks, 1))
    rest = F.slice(qtoks, 2, F.greatest(m - 1, F.lit(0)))

    def greedy_end(s):
        return F.aggregate(
            rest,
            s,
            lambda acc, t: F.array_min(
                F.filter(
                    idxs,
                    lambda x: (F.element_at(tokens, x) == t) & (x > acc),
                )
            ),
        )

    hits = F.size(
        F.filter(
            starts,
            lambda s: greedy_end(s).isNotNull()
            & (greedy_end(s) - s + 1 - m <= slop),
        )
    )
    return F.when((m > 0) & (n >= m), hits).otherwise(F.lit(0))


def span_near_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    slop: int = 2,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k ordered span-near search for (query_id, text) queries.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT,
    n_spans INT).
    """
    if slop < 0:
        raise ValueError("slop must be >= 0")
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)

    qtoks_rows = [(qid, tokenize_py(text)) for qid, text in queries]
    qterm_rows = [
        (qid, term, len(set(toks)))
        for qid, toks in qtoks_rows
        for term in sorted(set(toks))
    ]
    empty = spark.createDataFrame(
        [],
        "query_id INT, doc_id LONG, score DOUBLE, rank INT, n_spans INT",
    )
    if not qterm_rows or cs.avgdl == 0:
        return empty
    qterms = spark.createDataFrame(
        qterm_rows, "query_id INT, term STRING, m_distinct INT"
    )
    qarr = spark.createDataFrame(
        [(qid, toks) for qid, toks in qtoks_rows if toks],
        "query_id INT, qtoks ARRAY<STRING>",
    )

    postings = doc_term_freqs(tok)
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
            "n_spans",
            span_count_col(
                F.col("tokens"), F.col("qtoks"), F.lit(int(slop))
            ),
        )
        .filter(F.col("n_spans") > 0)
        .select("query_id", "doc_id", "n_spans")
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
        F.col("n_spans").cast("int").alias("n_spans"),
    )


def duckdb_span_near_sql(
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
    """DuckDB twin of :func:`span_near_search`.

    Independent re-derivation: the greedy chain is UNROLLED per query
    into nested list_min(list_filter(...)) expressions over per-term
    position lists (vs Spark's generic fold over the term array), with
    no candidate prefilter — both the fold semantics and the candidate
    plumbing are under differential."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    qt_rows = []
    span_branches = []
    for qid, text in queries:
        toks = tokenize_py(text)
        for term in sorted(set(toks)):
            qt_rows.append(f"({qid}, '{term}')")
        if not toks:
            continue
        m = len(toks)

        def pos(term):
            return (
                "list_filter(range(1, len(t.tokens) + 1), "
                f"i -> t.tokens[i] = '{term}')"
            )

        chain = "s"
        for term in toks[1:]:
            chain = (
                f"list_min(list_filter({pos(term)}, "
                f"x -> x > ({chain})))"
            )
        cond = (
            f"({chain}) IS NOT NULL AND ({chain}) - s + 1 - {m} <= {slop}"
        )
        span_branches.append(
            f"  SELECT {qid} AS query_id, t.doc_id,\n"
            f"         len(list_filter({pos(toks[0])}, s -> {cond}))\n"
            f"           AS n_spans\n"
            f"  FROM toks t"
        )
    qvalues = ", ".join(qt_rows) if qt_rows else "(NULL, NULL) LIMIT 0"
    spans_sql = (
        "\n  UNION ALL\n".join(span_branches)
        if span_branches
        else "  SELECT NULL, NULL, NULL LIMIT 0"
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
dfs AS (
  SELECT term, count(*) AS df FROM tfc
  WHERE term IN (SELECT DISTINCT term FROM qt)
  GROUP BY term
),
idf AS (
  SELECT d.term, ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM dfs d, corpus c
),
spans AS (
{spans_sql}
),
verified AS (
  SELECT query_id, doc_id, n_spans FROM spans WHERE n_spans > 0
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
  SELECT s.query_id, s.doc_id, s.score, v.n_spans,
         row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY round(s.score, 9) DESC, s.doc_id ASC
         ) AS rank
  FROM scored s
  JOIN verified v ON s.query_id = v.query_id AND s.doc_id = v.doc_id
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank, n_spans::INTEGER AS n_spans
FROM ranked WHERE rank <= {k}
"""


def span_first_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    end: int,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """ES ``span_first`` with the query terms as ``span_or``: a doc
    matches iff ANY of the query's distinct X1 terms occurs within the
    first ``end`` token positions (1-based, inclusive — ES's
    ``end`` boundary on the span's end for single-term spans).

    Pinned semantics (cross-engine, re-derived in
    :func:`duckdb_span_first_sql`):

    - ``first_pos`` = the earliest position <= ``end`` holding a query
      term; docs with none don't match;
    - matching docs are scored with the engine's FULL pinned BM25 of
      the query (rank restricted to matches — the phrase/span family
      contract), pinned total order.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT,
    first_pos INT).

    Scale shape: candidates come from the broadcast posting join (only
    docs holding >= 1 query term are ever touched); the position probe
    is pure JVM column math over a ``min(end, dl)``-bounded prefix.
    """
    if end < 1:
        raise ValueError(f"end must be >= 1, got {end}")
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)

    qterm_rows = [
        (qid, term)
        for qid, text in queries
        for term in sorted(set(tokenize_py(text)))
    ]
    empty = spark.createDataFrame(
        [],
        "query_id INT, doc_id LONG, score DOUBLE, rank INT, first_pos INT",
    )
    if not qterm_rows or cs.avgdl == 0:
        return empty
    qterms = spark.createDataFrame(qterm_rows, "query_id INT, term STRING")
    qarr = spark.createDataFrame(
        [
            (qid, sorted({t for q, t in qterm_rows if q == qid}))
            for qid in sorted({q for q, _ in qterm_rows})
        ],
        "query_id INT, qset ARRAY<STRING>",
    )

    postings = doc_term_freqs(tok)
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term", "inner"
    )
    dfs = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    cand = (
        matched.join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )

    prefix = F.sequence(
        F.lit(1), F.least(F.size("tokens"), F.lit(int(end)))
    )
    hits = F.filter(
        prefix,
        lambda i: F.array_contains(
            F.col("qset"), F.element_at(F.col("tokens"), i)
        ),
    )
    verified = (
        cand.join(tok.select("doc_id", "tokens"), "doc_id")
        .join(F.broadcast(qarr), "query_id")
        .withColumn(
            "first_pos",
            F.when(F.size(hits) > 0, F.element_at(hits, 1)),
        )
        .filter(F.col("first_pos").isNotNull())
        .select("query_id", "doc_id", "first_pos")
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
        .join(F.broadcast(qterms), "term")
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
        F.col("first_pos").cast("int").alias("first_pos"),
    )


def duckdb_span_first_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    end: int,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`span_first_search` (score at 6dp). The
    position probe re-derives via unnest(range) + min() instead of the
    Spark-side bounded-prefix filter."""
    from same_same_spark.bm25 import duckdb_scored_sql
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    if end < 1:
        raise ValueError(f"end must be >= 1, got {end}")
    qrows = []
    for qid, text in queries:
        for term in sorted(set(tokenize_py(text))):
            qrows.append(f"({qid}, '{term}')")
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL) LIMIT 0"
    inner = duckdb_scored_sql(table, id_col, text_col, queries, k1=k1, b=b)
    return f"""
WITH toks2 AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
qt2 AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)),
firstpos AS (
  SELECT q.query_id, t.doc_id, min(u.pos)::INTEGER AS first_pos
  FROM toks2 t,
       unnest(range(1, len(t.tokens) + 1)) AS u(pos)
  JOIN qt2 q ON t.tokens[u.pos] = q.term
  WHERE u.pos <= {int(end)}
  GROUP BY 1, 2
),
scored AS ({inner}),
ranked AS (
  SELECT s.query_id, s.doc_id, s.score, f.first_pos, row_number() OVER (
    PARTITION BY s.query_id
    ORDER BY round(s.score, 9) DESC, s.doc_id ASC
  ) AS rank
  FROM scored s
  JOIN firstpos f ON s.query_id = f.query_id AND s.doc_id = f.doc_id
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank, first_pos
FROM ranked WHERE rank <= {k}
"""
