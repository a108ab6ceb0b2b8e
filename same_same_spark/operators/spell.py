"""Query spell suggestion — SymSpell deletion-neighborhood matching.

A beyond-reference fulltext feature: a query term that is not (or is
rarely) in the corpus vocabulary gets "did you mean" suggestions drawn
from the vocabulary, ranked by edit distance then corpus evidence.

Pinned semantics (cross-engine):

- candidate pool = the corpus vocabulary (X1 terms) with document
  frequency ``df``;
- a vocabulary term is a suggestion for a query term iff
  ``levenshtein(query_term, term) <= max_edits`` (plain Levenshtein —
  unit-cost insert/delete/substitute; Spark ``F.levenshtein`` and DuckDB
  ``levenshtein`` agree);
- ranking per query term: ``(distance ASC, df DESC, term ASC)``,
  truncated to ``topn``. A term present in the vocabulary suggests
  itself at distance 0 (rank 1 unless something ties impossibly).

Scale shape (why this is not a cross join): SymSpell's theorem — if
``lev(a, b) <= d`` then ``a`` and ``b`` share at least one string
reachable by at most ``d`` single-character DELETIONS from each — turns
candidate generation into a HASH JOIN on deletion keys. The vocabulary
side explodes each term into its ``O(L^d)`` deletion variants (bounded:
a length-L term yields ``1 + L + L(L-1)/2`` keys at d=2); the query side
(driver-side, tiny) does the same; candidates = key-equality matches,
then the exact ``levenshtein`` filter keeps no false positives. The
oracle deliberately brute-forces the cross join instead, so the
deletion-key recall (the theorem's promise) is exactly what the
differential checks. Top-n per query term uses the bounded
sort_array/slice tournament — no ``WindowExec``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from same_same_spark.stats import term_doc_freqs, tokenized


def _del1_col(s: Column) -> Column:
    """Array of the strings reachable by deleting exactly one char."""
    return F.when(
        F.length(s) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(
                F.substring(s, F.lit(1), i - F.lit(1)),
                F.substring(s, i + F.lit(1), F.length(s)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def deletion_keys_col(term: Column, max_edits: int) -> Column:
    """Distinct deletion-neighborhood keys of ``term`` up to
    ``max_edits`` deletions (the term itself included). Pure column
    math; supports max_edits in {1, 2}."""
    if max_edits not in (1, 2):
        raise ValueError("deletion_keys_col supports max_edits in {1, 2}")
    d1 = _del1_col(term)
    parts = [F.array(term), d1]
    if max_edits == 2:
        parts.append(F.flatten(F.transform(d1, _del1_col)))
    return F.array_distinct(F.concat(*parts))


def _deletions_py(term: str, max_edits: int) -> list[str]:
    """Driver-side twin of :func:`deletion_keys_col` (query terms are a
    tiny list). Same key set by construction: both enumerate every
    <= max_edits single-char deletion."""
    out = {term}
    frontier = {term}
    for _ in range(max_edits):
        frontier = {
            s[:i] + s[i + 1:] for s in frontier for i in range(len(s))
        }
        out |= frontier
    return sorted(out)


def vocab_from_docs(
    docs_df: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """(term, df) — the suggestion pool, straight from the corpus."""
    return term_doc_freqs(tokenized(docs_df, id_col=id_col, text_col=text_col))


def suggest_terms(
    vocab_df: DataFrame,
    query_terms: list[str],
    max_edits: int = 2,
    topn: int = 3,
) -> DataFrame:
    """Top-n spelling suggestions per query term.

    ``vocab_df``: (term STRING, df BIGINT-ish). Returns (query_term
    STRING, suggestion STRING, distance INT, df LONG, rank INT), rank
    1..topn per query term under (distance ASC, df DESC, term ASC).
    """
    spark = vocab_df.sparkSession
    qrows = [
        (q, key)
        for q in sorted(set(query_terms))
        for key in _deletions_py(q, max_edits)
    ]
    if not qrows:
        return spark.createDataFrame(
            [],
            "query_term STRING, suggestion STRING, distance INT, "
            "df LONG, rank INT",
        )
    qkeys = spark.createDataFrame(qrows, "query_term STRING, key STRING")

    vkeys = vocab_df.select(
        F.col("term"),
        F.col("df").cast("long").alias("df"),
        F.explode(deletion_keys_col(F.col("term"), max_edits)).alias("key"),
    )
    cand = (
        vkeys.join(F.broadcast(qkeys), "key")
        .select("query_term", "term", "df")
        .distinct()
        .withColumn(
            "distance", F.levenshtein(F.col("query_term"), F.col("term"))
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
        .groupBy("query_term", "part")
        .agg(
            F.slice(F.sort_array(F.collect_list(entry)), 1, topn).alias("c")
        )
    )
    merged = local.groupBy("query_term").agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("c"))), 1, topn
        ).alias("top")
    )
    return merged.select(
        "query_term", F.posexplode("top").alias("pos", "s")
    ).select(
        "query_term",
        F.col("s.term").alias("suggestion"),
        F.col("s.d").cast("int").alias("distance"),
        F.col("s.df").alias("df"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


def duckdb_suggest_sql(
    table: str,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    max_edits: int = 2,
    topn: int = 3,
) -> str:
    """DuckDB twin of vocab_from_docs + suggest_terms — deliberately the
    BRUTE-FORCE cross join (every vocab term × every query term through
    ``levenshtein``), so the Spark side's SymSpell deletion-key recall
    is exactly what the differential verifies."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    qs = sorted(set(query_terms))
    qvalues = ", ".join(f"('{q}')" for q in qs) if qs else "(NULL) LIMIT 0"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
vocab AS (
  SELECT term, count(*) AS df
  FROM (SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks)
  GROUP BY term
),
q AS (SELECT * FROM (VALUES {qvalues}) AS v(query_term)),
cand AS (
  SELECT q.query_term, v.term AS suggestion,
         levenshtein(q.query_term, v.term) AS distance, v.df
  FROM q CROSS JOIN vocab v
  WHERE levenshtein(q.query_term, v.term) <= {max_edits}
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_term
    ORDER BY distance ASC, df DESC, suggestion ASC
  ) AS rank
  FROM cand
)
SELECT query_term, suggestion, distance::INTEGER AS distance,
       df::BIGINT AS df, rank::INTEGER AS rank
FROM ranked WHERE rank <= {topn}
"""
