"""Phrase search — adjacency-verified fulltext retrieval.

A beyond-reference fulltext feature completing the BM25 engine's query
surface (the reference's scan, ``internal/storage/search/search.go:16-42``,
treats a query as a bag of words; a phrase query additionally requires
the words CONSECUTIVELY, in order).

Pinned semantics (cross-engine, both sides re-derived in
``duckdb_phrase_sql``):

- phrase tokens = X1 tokens of the phrase text IN ORDER, duplicates
  kept (``tokenize_py``) — so adjacency is defined over the same
  filtered token sequence both engines produce;
- a document matches iff its token sequence contains the phrase token
  list as a contiguous subsequence; ``n_matches`` = number of start
  offsets (overlaps count);
- a phrase that tokenizes to ZERO tokens matches nothing;
- ranking among matching docs: BM25 over the phrase's DISTINCT terms
  (identical model to :mod:`same_same_spark.bm25`), pinned total order
  ``(round(score, 9) DESC, doc_id ASC)``.

Scale shape: candidate docs = docs containing ALL distinct phrase terms,
found on the exploded posting rows via a broadcast term join + an
all-terms count — the per-doc token ARRAYS are only re-examined for the
candidates (the slice-compare verification is JVM column math, no
Python), never for the rest of the corpus. df for scoring comes from the
matched postings (true global df, same argument as
:func:`same_same_spark.bm25.score_queries`); top-k goes through the
bounded tournament (:func:`~same_same_spark.operators.topk.topk_per_query`)
so no task ever holds one query's full match list.
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


def phrase_count_col(tokens: Column, phrase_toks: Column) -> Column:
    """Number of start offsets where ``phrase_toks`` occurs contiguously
    in ``tokens`` (both ARRAY<STRING> columns). Pure JVM column math.

    Guarded so ``F.sequence`` never sees a descending range (Spark
    infers step -1 when start > stop) and an empty phrase yields 0.
    """
    m = F.size(phrase_toks)
    n = F.size(tokens)
    starts = F.sequence(F.lit(1), n - m + F.lit(1))
    hits = F.size(
        F.filter(starts, lambda i: F.slice(tokens, i, m) == phrase_toks)
    )
    return F.when((m > 0) & (n >= m), hits).otherwise(F.lit(0))


def phrase_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k phrase search for a batch of phrase queries.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT,
    n_matches INT) — rank 1..k per query over the docs whose token
    sequence contains the phrase contiguously.
    """
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
        "query_id INT, doc_id LONG, score DOUBLE, rank INT, n_matches INT",
    )
    if not qterm_rows or cs.avgdl == 0:
        return empty
    qterms = spark.createDataFrame(
        qterm_rows, "query_id INT, term STRING, m_distinct INT"
    )
    qtoks = spark.createDataFrame(
        [(qid, toks) for qid, toks in qtoks_rows if toks],
        "query_id INT, phrase_toks ARRAY<STRING>",
    )

    postings = doc_term_freqs(tok)  # (doc_id, term, tf, dl)
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term", "inner"
    )
    # True global df for exactly the phrase terms (every doc containing
    # one is present post-join; postings are unique per (doc, term)).
    dfs = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    # Candidates: docs carrying ALL of a query's distinct terms.
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

    # Adjacency verification — token arrays re-read for candidates only.
    verified = (
        cand.join(tok.select("doc_id", "tokens"), "doc_id")
        .join(F.broadcast(qtoks), "query_id")
        .withColumn(
            "n_matches",
            phrase_count_col(F.col("tokens"), F.col("phrase_toks")),
        )
        .filter(F.col("n_matches") > 0)
        .select("query_id", "doc_id", "n_matches")
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
    # Attach n_matches to the bounded (≤ queries·k rows) result; every
    # row of `top` is in `verified` by construction (inner semi above).
    return top.join(verified, ["query_id", "doc_id"], "inner").select(
        "query_id",
        "doc_id",
        "score",
        "rank",
        F.col("n_matches").cast("int").alias("n_matches"),
    )


def duckdb_phrase_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB SQL computing the same result as :func:`phrase_search`
    (score compared at ``round(score, 6)``).

    Independent re-derivation: DuckDB scans every doc's token list with
    ``list_filter(range(...))`` slice compares — no candidate
    prefilter — so the Spark candidate plumbing is part of what the
    differential checks.
    """
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    qt_rows, ph_rows = [], []
    for qid, text in queries:
        toks = tokenize_py(text)
        for term in sorted(set(toks)):
            qt_rows.append(f"({qid}, '{term}')")
        if toks:
            lits = ", ".join(f"'{t}'" for t in toks)
            ph_rows.append(f"({qid}, [{lits}], {len(toks)})")
    qvalues = ", ".join(qt_rows) if qt_rows else "(NULL, NULL) LIMIT 0"
    pvalues = ", ".join(ph_rows) if ph_rows else "(NULL, NULL, NULL) LIMIT 0"
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
tfc AS (
  SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
  FROM (
    SELECT t.doc_id, unnest(t.tokens) AS term, d.dl
    FROM toks t JOIN docstat d ON t.doc_id = d.doc_id
  )
  GROUP BY doc_id, term
),
qt AS (
  SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)
),
phrases AS (
  SELECT * FROM (VALUES {pvalues}) AS v(query_id, ptoks, m)
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
hits AS (
  SELECT p.query_id, t.doc_id,
         CASE WHEN len(t.tokens) >= p.m THEN len(list_filter(
           range(1, len(t.tokens) - p.m + 2),
           i -> list_slice(t.tokens, i, i + p.m - 1) = p.ptoks
         )) ELSE 0 END AS n_matches
  FROM toks t CROSS JOIN phrases p
),
verified AS (
  SELECT query_id, doc_id, n_matches FROM hits WHERE n_matches > 0
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
  SELECT s.query_id, s.doc_id, s.score, v.n_matches,
         row_number() OVER (
           PARTITION BY s.query_id
           ORDER BY round(s.score, 9) DESC, s.doc_id ASC
         ) AS rank
  FROM scored s
  JOIN verified v ON s.query_id = v.query_id AND s.doc_id = v.doc_id
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank, n_matches::INTEGER AS n_matches
FROM ranked WHERE rank <= {k}
"""


def _parse_mpp_queries(
    queries: list[tuple[int, str]]
) -> list[tuple[int, list[str], str]]:
    """(query_id, fixed X1 tokens, prefix) per query — the prefix is
    the last whitespace chunk normalized through X1's character class
    only (no stopword/length drop); empty-prefix queries drop."""
    from same_same_spark.text.tokenizer import _STRIP_RE

    parsed = []
    for qid, text in queries:
        chunks = (text or "").split()
        if not chunks:
            continue
        prefix = _STRIP_RE.sub("", chunks[-1].lower())
        if not prefix:
            continue
        parsed.append((qid, tokenize_py(" ".join(chunks[:-1])), prefix))
    return parsed


def match_phrase_prefix_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = 50,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """ES ``match_phrase_prefix`` — search-as-you-type: the query's
    LAST X1 token is a prefix; a doc matches where the fixed tokens
    occur contiguously immediately followed by a prefix completion.

    Pinned semantics (cross-engine, re-derived in
    :func:`duckdb_match_phrase_prefix_sql`):

    - the PREFIX is the query's last whitespace chunk, lowercased with
      non-[a-z] runs stripped (X1's character class) but WITHOUT the
      stopword/length drop — short prefixes are the point of
      search-as-you-type ("ch" must complete); fixed = the X1 tokens
      of everything before it; an empty normalized prefix yields
      nothing (parse shared driver-side, the boost-parse precedent);
    - completions = corpus-vocabulary terms starting with the prefix,
      capped at ``max_expansions`` under ``(df DESC, term ASC)`` — the
      engine's ONE expansion rule (wildcard/suggest); an empty
      completion set matches nothing (the ES contract);
    - ``n_matches`` counts start positions i with
      ``tokens[i..i+m-1] == fixed`` and ``tokens[i+m]`` in the
      completion set (m = 0 → any completion position);
    - score = the engine's BM25 over fixed terms ∪ the completions
      PRESENT in the doc (the synonym-union scoring rule), df from the
      corpus vocabulary; rank restricted to matches, pinned order.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT,
    n_matches INT).

    Scale shape: the completion expansion rides the wildcard vocab
    machinery (bounded tournament over the term dictionary); candidates
    come from the broadcast posting join (all fixed terms + >= 1
    completion); adjacency verification is the phrase family's pure
    JVM column math on candidates only.
    """
    from same_same_spark.operators.wildcard import expand_patterns
    from same_same_spark.stats import term_doc_freqs

    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)
    empty = spark.createDataFrame(
        [],
        "query_id INT, doc_id LONG, score DOUBLE, rank INT, n_matches INT",
    )
    parsed = _parse_mpp_queries(queries)
    if not parsed or cs.avgdl == 0:
        return empty
    vocab = term_doc_freqs(tok)

    # The expansion and the fixed-term dfs are BOUNDED (queries x
    # max_expansions / queries x terms) — collect them eagerly (the
    # lm_buckets cut-table precedent) so the returned plan references
    # tiny literal frames instead of re-running the vocab pattern scan
    # once per consumer (measured: 11 BroadcastNestedLoopJoin subtrees
    # without this).
    exp_local = sorted(
        (int(r["query_id"]), r["term"], int(r["df"]))
        for r in expand_patterns(
            vocab, [(qid, p + "*") for qid, _, p in parsed],
            max_expansions,
        ).collect()
    )
    fixed_terms = sorted(
        {term for _, fixed, _ in parsed for term in fixed}
    )
    fixed_dfs = (
        {
            r["term"]: int(r["df"])
            for r in vocab.filter(F.col("term").isin(fixed_terms))
            .select("term", "df").collect()
        }
        if fixed_terms
        else {}
    )
    fixed_local = sorted(
        {
            (qid, term, fixed_dfs[term])
            for qid, fixed, _ in parsed
            for term in fixed
            if term in fixed_dfs
        }
    )
    qterm_rows = sorted(set(exp_local) | set(fixed_local))
    if not qterm_rows:
        return empty
    qterms = spark.createDataFrame(
        qterm_rows, "query_id INT, term STRING, df LONG"
    )
    expanded = spark.createDataFrame(
        exp_local or [], "query_id INT, term STRING, df LONG"
    )
    fixed_df = spark.createDataFrame(
        fixed_local or [], "query_id INT, term STRING, df LONG"
    )

    qfix = spark.createDataFrame(
        [(qid, fixed, len(set(fixed))) for qid, fixed, _ in parsed],
        "query_id INT, fixed ARRAY<STRING>, m_fixed_distinct INT",
    )
    exp_by_q: dict[int, list[str]] = {}
    for qid, term, _ in exp_local:
        exp_by_q.setdefault(qid, []).append(term)
    qexp = spark.createDataFrame(
        [(qid, sorted(ts)) for qid, ts in sorted(exp_by_q.items())],
        "query_id INT, exp ARRAY<STRING>",
    )

    postings = doc_term_freqs(tok)
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term", "inner"
    )
    hits = matched.join(F.broadcast(qterms), "term")  # carries df
    # candidates: all distinct fixed terms present AND >= 1 completion.
    # A term can be BOTH (query "apple app*": 'apple' is fixed and a
    # completion) — the flags are independent, never complementary.
    roles = hits.join(
        F.broadcast(
            fixed_df.select("query_id", "term").withColumn(
                "is_fixed", F.lit(True)
            )
        ),
        ["query_id", "term"],
        "left",
    ).join(
        F.broadcast(
            expanded.select("query_id", "term").withColumn(
                "is_exp", F.lit(True)
            )
        ),
        ["query_id", "term"],
        "left",
    )
    cand = (
        roles.groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.when(F.col("is_fixed"), 1).otherwise(0)
            ).alias("n_fixed"),
            F.sum(
                F.when(F.col("is_exp"), 1).otherwise(0)
            ).alias("n_exp"),
        )
        .join(F.broadcast(qfix.select("query_id", "m_fixed_distinct")),
              "query_id")
        .filter(
            (F.col("n_fixed") == F.col("m_fixed_distinct"))
            & (F.col("n_exp") >= 1)
        )
        .select("query_id", "doc_id")
    )

    m = F.size("fixed")
    starts = F.sequence(F.lit(1), F.size("tokens") - m)
    count_expr = F.when(
        F.size("tokens") > m,
        F.size(
            F.filter(
                starts,
                lambda i: (
                    (m == 0)
                    | (F.slice(F.col("tokens"), i, m) == F.col("fixed"))
                )
                & F.array_contains(
                    F.col("exp"), F.element_at(F.col("tokens"), i + m)
                ),
            )
        ),
    ).otherwise(F.lit(0))
    verified = (
        cand.join(tok.select("doc_id", "tokens"), "doc_id")
        .join(F.broadcast(qfix.select("query_id", "fixed")), "query_id")
        .join(F.broadcast(qexp), "query_id")
        .withColumn("n_matches", count_expr)
        .filter(F.col("n_matches") > 0)
        .select("query_id", "doc_id", "n_matches")
    )

    scored = (
        hits.withColumn("idf", idf_col(F.col("df"), cs.n_docs))
        .withColumn(
            "w",
            bm25_weight_col(
                F.col("tf"), F.col("dl"), F.col("idf"), cs.avgdl, k1, b
            ),
        )
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
        F.col("n_matches").cast("int").alias("n_matches"),
    )


def duckdb_match_phrase_prefix_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = 50,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`match_phrase_prefix_search` (score at
    6dp). Completions re-derive via starts_with + a row_number window
    (vs Spark's RLIKE bounded tournament — the wildcard differential);
    adjacency via list_filter slice compares."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    prows, frows = [], []
    for qid, fixed, prefix in _parse_mpp_queries(queries):
        prows.append(f"({qid}, '{prefix}')")
        lits = ", ".join(f"'{t}'" for t in fixed)
        fixed_sql = f"[{lits}]" if lits else "[]::VARCHAR[]"
        frows.append(f"({qid}, {fixed_sql}, {len(fixed)})")
    pvalues = ", ".join(prows) if prows else "(NULL, NULL) LIMIT 0"
    fvalues = ", ".join(frows) if frows else "(NULL, NULL, NULL) LIMIT 0"
    score_expr = (
        f"sum(ln(1.0 + (c.n - e.df + 0.5) / (e.df + 0.5)) "
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
pats AS (SELECT * FROM (VALUES {pvalues}) AS v(query_id, prefix)),
fixedv AS (SELECT * FROM (VALUES {fvalues}) AS v(query_id, fixed, m)),
expand_ranked AS (
  SELECT p.query_id, v.term, v.df, row_number() OVER (
    PARTITION BY p.query_id
    ORDER BY v.df DESC, v.term ASC
  ) AS rn
  FROM pats p JOIN vocab v ON starts_with(v.term, p.prefix)
),
expanded AS (
  SELECT query_id, term, df FROM expand_ranked
  WHERE rn <= {max_expansions}
),
exp_arr AS (
  SELECT query_id, list(term ORDER BY term) AS exp FROM expanded
  GROUP BY query_id
),
qterms AS (
  SELECT query_id, term, df FROM expanded
  UNION
  SELECT f.query_id, u.term, v.df
  FROM fixedv f, unnest(f.fixed) AS u(term)
  JOIN vocab v ON v.term = u.term
),
tfc AS (
  SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
  FROM (
    SELECT t.doc_id, unnest(t.tokens) AS term, d.dl
    FROM toks t JOIN docstat d ON t.doc_id = d.doc_id
  )
  GROUP BY doc_id, term
),
hits AS (
  SELECT f.query_id, t.doc_id,
         CASE WHEN len(t.tokens) > f.m THEN len(list_filter(
           range(1, len(t.tokens) - f.m + 1),
           i -> (f.m = 0 OR list_slice(t.tokens, i, i + f.m - 1) = f.fixed)
                AND list_contains(e.exp, t.tokens[i + f.m])
         )) ELSE 0 END AS n_matches
  FROM toks t
  CROSS JOIN fixedv f
  JOIN exp_arr e ON e.query_id = f.query_id
),
verified AS (
  SELECT query_id, doc_id, n_matches FROM hits WHERE n_matches > 0
),
scored AS (
  SELECT e.query_id, t.doc_id, {score_expr} AS score
  FROM tfc t JOIN qterms e ON t.term = e.term
  CROSS JOIN corpus c
  GROUP BY e.query_id, t.doc_id
),
ranked AS (
  SELECT s.query_id, s.doc_id, s.score, v.n_matches, row_number() OVER (
    PARTITION BY s.query_id
    ORDER BY round(s.score, 9) DESC, s.doc_id ASC
  ) AS rank
  FROM scored s
  JOIN verified v ON s.query_id = v.query_id AND s.doc_id = v.doc_id
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank, n_matches::INTEGER AS n_matches
FROM ranked WHERE rank <= {k}
"""
