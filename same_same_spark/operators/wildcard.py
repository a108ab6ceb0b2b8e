"""Wildcard / prefix term queries — Lucene's MultiTermQuery shape.

A beyond-reference fulltext feature: the reference scores a query as a
bag of exact words (``internal/storage/search/search.go:16-42``); real
search surfaces also need ``tok*`` prefix and ``t?ble`` wildcard terms.

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_wildcard_sql`):

- a query string is a whitespace-separated set of PATTERNS, lowercased;
  the allowed alphabet is ``[a-z*?]`` (X1 terms are pure lowercase
  letters) — ``*`` matches any (possibly empty) run of letters, ``?``
  exactly one letter; any other character raises;
- each pattern expands against the corpus vocabulary: the matching
  terms ranked by ``(df DESC, term ASC)``, truncated to
  ``max_expansions`` (Lucene's top-terms blended rewrite — the
  DETERMINISTIC cap is part of the contract, so both engines agree on
  which terms survive a hot pattern);
- a query scores the DISTINCT union of its patterns' expansions in
  OR mode: BM25 (the engine's pinned model, true global df) summed over
  the expanded terms present in the doc;
- total order ``(round(score, 9) DESC, doc_id ASC)``, top-k; a query
  whose patterns expand to nothing yields no rows.

Scale shape: the vocabulary is one ``explode`` + ``groupBy`` over the
corpus (map-side combined — the same aggregate every stats pass uses);
pattern matching is a broadcast nested-loop of the TINY pattern table
against vocab rows — a linear, fully parallel term-dictionary scan,
exactly Lucene's cost model for a leading-wildcard term (documented
hazard there too). Expansion is capped by the bounded sort_array/slice
tournament (never a WindowExec), the posting join is a broadcast of
≤ patterns × max_expansions terms, and top-k goes through
:func:`~same_same_spark.operators.topk.topk_per_query`.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import (
    B_DEFAULT,
    K1_DEFAULT,
    bm25_weight_col,
    idf_col,
)
from same_same_spark.operators.topk import topk_per_query
from same_same_spark.stats import (
    corpus_stats,
    doc_term_freqs,
    term_doc_freqs,
    tokenized,
)

_PATTERN_RE = re.compile(r"^[a-z*?]+$")

# regexp query mode: the cross-engine-safe subset. Term regexes run
# under BOTH Java regex (Spark RLIKE) and RE2 (DuckDB regexp_matches);
# the two agree on this POSIX-ish core — literals, ., classes (incl.
# ranges and ^-negation), alternation, grouping, greedy quantifiers —
# over the [a-z]+ term alphabet, and disagree outside it (backrefs,
# lookaround, possessive quantifiers, escape shorthands, dangling
# braces). The validator whitelists the core and rejects the rest.
_REGEX_CHARS_RE = re.compile(r"^[a-z0-9.*+?|()\[\]{},^-]+$")
_QUANTIFIER_RE = re.compile(r"\{\d+(,\d*)?\}")


def glob_to_regex(pattern: str) -> str:
    """Anchored regex for a ``[a-z*?]`` glob. Spelled with explicit
    ``[a-z]`` classes (never ``.``) so Java regex and RE2 cannot
    disagree on any input."""
    if not _PATTERN_RE.match(pattern):
        raise ValueError(
            f"wildcard pattern {pattern!r}: only [a-z*?] allowed"
        )
    parts = []
    for ch in pattern:
        if ch == "*":
            parts.append("[a-z]*")
        elif ch == "?":
            parts.append("[a-z]")
        else:
            parts.append(ch)
    return "^" + "".join(parts) + "$"


def validate_term_regex(pattern: str) -> str:
    """Validate a term regex against the cross-engine-safe subset and
    return its anchored form ``^(?:pattern)$`` (a regexp query matches
    WHOLE terms, Lucene's RegexpQuery contract).

    Rejected (each a documented Java-vs-RE2 divergence hazard):
    ``\\`` escapes, ``(?`` special groups, explicit ``^``/``$`` anchors
    (``^`` is allowed only as class negation immediately after ``[``),
    empty classes ``[]``, and any ``{`` ``}`` ``,`` or digit outside a
    well-formed ``{m}`` / ``{m,}`` / ``{m,n}`` quantifier.
    """
    if not pattern or len(pattern) > 200:
        raise ValueError(
            f"term regex {pattern!r}: must be 1..200 characters"
        )
    if "\\" in pattern:
        raise ValueError(
            f"term regex {pattern!r}: backslash escapes are not in the "
            "cross-engine-safe subset"
        )
    if not _REGEX_CHARS_RE.match(pattern):
        raise ValueError(
            f"term regex {pattern!r}: only [a-z0-9.*+?|(){{}}[],^-] "
            "allowed"
        )
    if "(?" in pattern:
        raise ValueError(
            f"term regex {pattern!r}: (?...) groups are not in the "
            "cross-engine-safe subset"
        )
    if "[]" in pattern:
        raise ValueError(
            f"term regex {pattern!r}: empty character class (engines "
            "disagree on []-handling)"
        )
    # ^ only as class negation right after [
    for i, ch in enumerate(pattern):
        if ch == "^" and (i == 0 or pattern[i - 1] != "["):
            raise ValueError(
                f"term regex {pattern!r}: ^ is only allowed as class "
                "negation (the pattern is implicitly anchored)"
            )
    # digits/,/{/} legal only inside a well-formed bounded quantifier —
    # Java throws on a dangling {, RE2 treats it as a literal.
    residue = _QUANTIFIER_RE.sub("", pattern)
    if any(c in residue for c in "{},0123456789"):
        raise ValueError(
            f"term regex {pattern!r}: braces, commas and digits are "
            "only allowed inside a {{m}}/{{m,n}} quantifier"
        )
    anchored = f"^(?:{pattern})$"
    try:
        re.compile(anchored)
    except re.error as exc:
        raise ValueError(f"term regex {pattern!r}: {exc}") from None
    return anchored


def expand_regex_rows(
    vocab_df: DataFrame,
    rows: list[tuple[int, str, str]],
    max_expansions: int = 50,
) -> DataFrame:
    """Expand (query_id, pattern_key, anchored_regex) rows against a
    (term, df) vocabulary. Returns the DISTINCT per-query union
    (query_id INT, term STRING, df LONG): each pattern's matches capped
    at ``max_expansions`` under ``(df DESC, term ASC)`` first, then
    unioned. Shared engine for the glob and regexp query modes."""
    spark = vocab_df.sparkSession
    if not rows:
        return spark.createDataFrame(
            [], "query_id INT, term STRING, df LONG"
        )
    pats_df = spark.createDataFrame(
        rows, "query_id INT, pattern STRING, regex STRING"
    )
    matched = (
        vocab_df.select("term", F.col("df").cast("long").alias("df"))
        .crossJoin(F.broadcast(pats_df))
        .filter(F.expr("term RLIKE regex"))
    )
    entry = F.struct(
        (-F.col("df")).alias("negdf"),
        F.col("term").alias("term"),
        F.col("df").alias("df"),
    )
    local = (
        matched.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "pattern", "part")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(entry)), 1, max_expansions
            ).alias("c")
        )
    )
    return (
        local.groupBy("query_id", "pattern")
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("c"))),
                1,
                max_expansions,
            ).alias("top")
        )
        .select("query_id", F.explode("top").alias("s"))
        .select(
            "query_id",
            F.col("s.term").alias("term"),
            F.col("s.df").alias("df"),
        )
        .distinct()
    )


def expand_patterns(
    vocab_df: DataFrame,
    patterns: list[tuple[int, str]],
    max_expansions: int = 50,
) -> DataFrame:
    """Expand (query_id, glob) patterns against a (term, df) vocabulary.

    Returns the DISTINCT per-query union (query_id INT, term STRING,
    df LONG): each pattern's matches capped at ``max_expansions`` under
    ``(df DESC, term ASC)`` first, then unioned.
    """
    prows = sorted(
        {(qid, p.lower()) for qid, text in patterns for p in text.split()}
    )
    return expand_regex_rows(
        vocab_df,
        [(qid, p, glob_to_regex(p)) for qid, p in prows],
        max_expansions,
    )


def expand_regexes(
    vocab_df: DataFrame,
    queries: list[tuple[int, str]],
    max_expansions: int = 50,
) -> DataFrame:
    """Expand (query_id, regex) queries — ONE validated term regex per
    query (Lucene RegexpQuery: a single whole-term pattern, unlike the
    whitespace-split glob mode) — against a (term, df) vocabulary."""
    prows = sorted({(qid, p.strip().lower()) for qid, p in queries})
    return expand_regex_rows(
        vocab_df,
        [(qid, p, validate_term_regex(p)) for qid, p in prows],
        max_expansions,
    )


def wildcard_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = 50,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k wildcard search for (query_id, pattern-set) queries.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT).
    """
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)
    empty = spark.createDataFrame(
        [], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
    )
    if cs.avgdl == 0:
        # validate patterns even on an empty corpus (pinned contract)
        for qid, text in queries:
            for p in text.lower().split():
                glob_to_regex(p)
        return empty

    expanded = expand_patterns(
        term_doc_freqs(tok), queries, max_expansions
    )
    return _score_expanded(tok, cs, expanded, k, k1, b)


def _score_expanded(tok, cs, expanded, k, k1, b):
    """BM25-sum the (query_id, term, df) expansion union, top-k."""
    scored = (
        doc_term_freqs(tok)
        .join(F.broadcast(expanded), "term")
        .withColumn("idf", idf_col(F.col("df"), cs.n_docs))
        .withColumn(
            "w",
            bm25_weight_col(
                F.col("tf"), F.col("dl"), F.col("idf"), cs.avgdl, k1, b
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    return topk_per_query(scored, k)


def regexp_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = 50,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k regexp search — ONE whole-term regex per query (Lucene's
    RegexpQuery), validated into the cross-engine-safe subset by
    :func:`validate_term_regex`, expanded against the corpus vocabulary
    under the same deterministic ``(df DESC, term ASC)`` cap as the
    glob mode, BM25-scored over the expansion union.

    Returns (query_id INT, doc_id, score DOUBLE, rank INT).
    """
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    cs = corpus_stats(tok)
    if cs.avgdl == 0:
        for _, p in queries:
            validate_term_regex(p.strip().lower())
        return spark.createDataFrame(
            [], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
        )
    expanded = expand_regexes(
        term_doc_freqs(tok), queries, max_expansions
    )
    return _score_expanded(tok, cs, expanded, k, k1, b)


def wildcard_search_indexed(
    spark,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = 50,
    prune: bool = True,
    merge: str = "auto",
) -> DataFrame:
    """Wildcard search through the compressed posting index.

    Patterns expand against the index's term-statistics table — the
    engine's term dictionary, the same structure Lucene's
    MultiTermQuery walks — and the expanded OR-query runs the block-max
    read path (:func:`same_same_spark.index.query.search_batch`).
    Rank-identical to :func:`wildcard_search` over the same corpus: the
    index BM25 path is rank-identical to the naive scorer, and the
    expansion cap orders by the SAME (df DESC, term ASC) key over equal
    df values (tombstone-adjusted below, so deletes don't skew the cap
    either).

    Scale shape: the dictionary scan is a bounded parquet read of the
    stats table (n_terms rows, no posting data touched); the collected
    expansion is ≤ patterns × max_expansions rows (a bounded driver
    list, like every query batch).
    """
    expanded = expand_patterns(
        index_vocab(spark, index_dir), queries, max_expansions
    )
    return _search_expanded_indexed(
        spark, index_dir, expanded, k, prune, merge
    )


def regexp_search_indexed(
    spark,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = 50,
    prune: bool = True,
    merge: str = "auto",
) -> DataFrame:
    """Regexp search through the compressed posting index — the regexp
    twin of :func:`wildcard_search_indexed`: patterns expand against
    the tombstone-adjusted term dictionary, the expanded OR-query runs
    the block-max read path. Rank-identical to :func:`regexp_search`
    over the same corpus (same argument as the glob mode)."""
    expanded = expand_regexes(
        index_vocab(spark, index_dir), queries, max_expansions
    )
    return _search_expanded_indexed(
        spark, index_dir, expanded, k, prune, merge
    )


def index_vocab(spark, index_dir: str) -> DataFrame:
    """The index's term dictionary as a (term, df) relation,
    tombstone-adjusted so deletes can't skew expansion caps."""
    from same_same_spark.index.query import (
        _load_manifest,
        _load_tombstones,
    )

    manifest = _load_manifest(index_dir)
    stats = spark.read.parquet(
        f"{index_dir}/{manifest.stats_dirname()}"
    ).select("term", "df")
    tomb = _load_tombstones(index_dir)
    if tomb is not None and tomb["n_removed"]:
        dd = tomb["df_delta"]
        if dd:
            delta = spark.createDataFrame(
                list(dd.items()), "term STRING, df_delta LONG"
            )
            stats = (
                stats.join(F.broadcast(delta), "term", "left")
                .withColumn(
                    "df",
                    F.col("df") - F.coalesce(F.col("df_delta"), F.lit(0)),
                )
                .filter(F.col("df") > 0)
                .select("term", "df")
            )
    return stats


def _search_expanded_indexed(
    spark, index_dir: str, expanded: DataFrame, k, prune, merge
) -> DataFrame:
    """Collect the bounded expansion union and run the index read path."""
    from same_same_spark.index.query import search_batch

    by_q: dict[int, list[str]] = {}
    for r in expanded.collect():  # bounded: patterns × max_expansions
        by_q.setdefault(r["query_id"], []).append(r["term"])
    equeries = [
        (qid, " ".join(sorted(terms)))
        for qid, terms in sorted(by_q.items())
    ]
    if not equeries:
        return spark.createDataFrame(
            [], "query_id INT, doc_id LONG, score DOUBLE, rank INT"
        )
    return search_batch(
        spark, index_dir, equeries, k=k, prune=prune, merge=merge
    )


def duckdb_wildcard_sql(
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
    """DuckDB twin of :func:`wildcard_search` (score compared at 6dp).

    Independent re-derivation: expansion ranks with a window function
    over a ``regexp_matches`` join (vs Spark's bounded tournament over
    an RLIKE nested loop), so cap determinism is part of what the
    differential checks.
    """
    prows = sorted(
        {(qid, p.lower()) for qid, text in queries for p in text.split()}
    )
    return _duckdb_expanded_sql(
        table,
        id_col,
        text_col,
        [(qid, glob_to_regex(p)) for qid, p in prows],
        k,
        max_expansions,
        k1,
        b,
        round_score,
    )


def duckdb_regexp_sql(
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
    """DuckDB twin of :func:`regexp_search` — the same independent
    re-derivation as the glob twin, but the regex reaching RE2 is the
    USER's pattern (validated subset), so the differential additionally
    checks Java-vs-RE2 agreement on every pattern an entry pins."""
    prows = sorted({(qid, p.strip().lower()) for qid, p in queries})
    return _duckdb_expanded_sql(
        table,
        id_col,
        text_col,
        [(qid, validate_term_regex(p)) for qid, p in prows],
        k,
        max_expansions,
        k1,
        b,
        round_score,
    )


def _duckdb_expanded_sql(
    table: str,
    id_col: str,
    text_col: str,
    regex_rows: list[tuple[int, str]],
    k: int,
    max_expansions: int,
    k1: float,
    b: float,
    round_score: int,
) -> str:
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    pvalues = (
        ", ".join(f"({qid}, '{rx}')" for qid, rx in regex_rows)
        if regex_rows
        else "(NULL, NULL) LIMIT 0"
    )
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
pats AS (SELECT * FROM (VALUES {pvalues}) AS v(query_id, regex)),
expand_ranked AS (
  SELECT p.query_id, p.regex, v.term, v.df, row_number() OVER (
    PARTITION BY p.query_id, p.regex
    ORDER BY v.df DESC, v.term ASC
  ) AS rn
  FROM pats p JOIN vocab v ON regexp_matches(v.term, p.regex)
),
expanded AS (
  SELECT DISTINCT query_id, term, df
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
