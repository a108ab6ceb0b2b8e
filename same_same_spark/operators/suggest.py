"""Completion suggester — prefix autocompletion over the corpus vocab.

ES's completion suggester, re-expressed over the engine's existing
verified pieces: candidates come from the SAME glob-expansion engine
behind wildcard search (``wildcard.expand_patterns`` with the pattern
``<prefix>*``) against the corpus (term, df) vocabulary, ranked by
corpus evidence — ES ranks by an indexed weight; document frequency is
this engine's analog (the term suggester's ``frequency`` mode). The
fuzzy-prefix variant of the ES suggester is the existing
``spell.suggest_terms`` (SymSpell).

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_suggest_completions_sql`):

- a prefix is ONE literal token: it is lowercased and must match
  ``[a-z0-9]+`` (glob metacharacters or whitespace → ValueError — ES
  prefixes are literal, not patterns);
- candidates = vocabulary terms starting with the prefix with
  ``df >= min_df`` (the prefix term itself included when it is a
  corpus term);
- rank 1..topn per prefix under ``(df DESC, term ASC)``.

Scale shape: identical to wildcard expansion — the tiny prefix table
broadcasts against the bounded (term, df) vocabulary, each prefix's
matches cap at ``topn`` inside a partition-bounded sort_array/slice
tournament BEFORE any shuffle (no WindowExec), and the final
posexplode emits ≤ topn rows per prefix.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.operators.spell import vocab_from_docs
from same_same_spark.operators.wildcard import expand_patterns
from same_same_spark.text.tokenizer import duckdb_tokens_sql

_PREFIX_RE = re.compile(r"^[a-z0-9]+$")


def suggest_completions(
    docs_df: DataFrame,
    prefixes: list[tuple[int, str]],
    topn: int = 5,
    id_col: str = "doc_id",
    text_col: str = "content",
    min_df: int = 1,
) -> DataFrame:
    """Top-n completions per prefix.

    Returns (sug_id INT, term STRING, df LONG, rank INT), rank 1..topn
    per prefix under (df DESC, term ASC).
    """
    if topn < 1:
        raise ValueError(f"topn must be >= 1, got {topn}")
    norm: list[tuple[int, str]] = []
    for sid, p in prefixes:
        p = p.lower()
        if not _PREFIX_RE.match(p):
            raise ValueError(
                f"prefix must be one literal [a-z0-9]+ token, got {p!r}"
            )
        norm.append((sid, p))

    vocab = vocab_from_docs(docs_df, id_col=id_col, text_col=text_col)
    if min_df > 1:
        vocab = vocab.filter(F.col("df") >= min_df)
    expanded = expand_patterns(
        vocab, [(sid, p + "*") for sid, p in norm], max_expansions=topn
    )
    # expand_patterns already keeps each prefix's best-topn under
    # (df DESC, term ASC); re-sorting the ≤ topn survivors assigns rank.
    entry = F.struct(
        (-F.col("df")).alias("negdf"),
        F.col("term").alias("term"),
        F.col("df").alias("df"),
    )
    merged = expanded.groupBy("query_id").agg(
        F.slice(F.sort_array(F.collect_list(entry)), 1, topn).alias("top")
    )
    return merged.select(
        F.col("query_id").alias("sug_id"),
        F.posexplode("top").alias("pos", "s"),
    ).select(
        "sug_id",
        F.col("s.term").alias("term"),
        F.col("s.df").alias("df"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


def duckdb_suggest_completions_sql(
    table: str,
    id_col: str,
    text_col: str,
    prefixes: list[tuple[int, str]],
    topn: int = 5,
    min_df: int = 1,
) -> str:
    """DuckDB twin of :func:`suggest_completions` — independently
    derived: a LIKE prefix join + row_number window (vs Spark's regex
    expansion + bounded tournament)."""
    rows = ", ".join(
        f"({sid}, '{p.lower()}')" for sid, p in prefixes
    ) or "(NULL, NULL) LIMIT 0"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
vocab AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  GROUP BY term
  HAVING count(DISTINCT doc_id) >= {min_df}
),
p AS (
  SELECT * FROM (VALUES {rows}) AS v(sug_id, prefix)
),
cand AS (
  SELECT p.sug_id, v.term, v.df,
         row_number() OVER (
           PARTITION BY p.sug_id ORDER BY v.df DESC, v.term ASC
         ) AS rank
  FROM vocab v JOIN p ON v.term LIKE p.prefix || '%'
)
SELECT sug_id::INTEGER AS sug_id, term, df, rank::INTEGER AS rank
FROM cand WHERE rank <= {topn}
"""
