"""Term vectors — Elasticsearch's ``_termvectors`` API with
``term_statistics: true``: for requested docs, every term's in-doc
frequency and positions plus its CORPUS-wide document frequency and
total term frequency.

A beyond-reference introspection surface: the reference exposes only
aggregate counts (``internal/storage/local/local.go`` corpus stats);
real engines let users inspect exactly what the analyzer produced for
one document and how its terms weigh corpus-wide — the debugging
companion of every relevance question.

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_term_vectors_sql`):

- per (requested doc, distinct X1 term): ``tf`` (in-doc count),
  ``positions`` = the 1-based token offsets as a comma-joined string
  (deterministic; ES returns a position list), ``df`` = number of
  corpus docs containing the term, ``ttf`` = total occurrences across
  the corpus — both CORPUS-wide even though only requested docs are
  expanded;
- unknown doc ids yield no rows; a requested empty doc yields no rows
  (it has no terms).

Scale shape: the requested id set broadcasts (a handful of docs by
definition); positions come from ONE posexplode+groupBy over the
requested docs only; the corpus-side df/ttf aggregate is restricted to
the requested docs' terms via a broadcast semi join before grouping —
the corpus pass ships only matching posting rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.stats import doc_term_freqs, tokenized


def term_vectors(
    docs_df: DataFrame,
    doc_ids: list,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Term vectors for the requested doc ids.

    Returns (doc_id, term STRING, tf LONG, positions STRING,
    df LONG, ttf LONG).
    """
    if not doc_ids:
        raise ValueError("doc_ids must be non-empty")
    spark = docs_df.sparkSession
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    req = spark.createDataFrame(
        [(i,) for i in sorted(set(doc_ids))],
        tok.select("doc_id").schema,
    )
    reqtok = tok.join(F.broadcast(req), "doc_id")
    local = (
        reqtok.select(
            "doc_id", F.posexplode("tokens").alias("pos", "term")
        )
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.col("pos") + 1)),
                    lambda p: p.cast("string"),
                ),
                ",",
            ).alias("positions"),
        )
    )
    terms = local.select("term").distinct()
    stats = (
        doc_term_freqs(tok)
        .join(F.broadcast(terms), "term")
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("ttf"),
        )
    )
    return local.join(F.broadcast(stats), "term").select(
        "doc_id", "term", "tf", "positions", "df", "ttf"
    )


def duckdb_term_vectors_sql(
    table: str,
    id_col: str,
    text_col: str,
    doc_ids: list,
) -> str:
    """DuckDB twin of :func:`term_vectors` (positions re-derived with a
    list_filter over 1-based ranges vs Spark's posexplode)."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    ids = ", ".join(str(i) for i in sorted(set(doc_ids)))
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
req AS (SELECT * FROM toks WHERE doc_id IN ({ids})),
local_ AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf,
         list_aggregate(list_sort(list(pos)), 'string_agg', ',')
           AS positions
  FROM (
    SELECT doc_id, unnest(tokens) AS term,
           generate_subscripts(tokens, 1) AS pos
    FROM req
  )
  GROUP BY doc_id, term
),
corpus_tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  GROUP BY doc_id, term
),
stats AS (
  SELECT term, count(*)::BIGINT AS df,
         CAST(sum(tf) AS BIGINT) AS ttf
  FROM corpus_tf
  WHERE term IN (SELECT DISTINCT term FROM local_)
  GROUP BY term
)
SELECT l.doc_id, l.term, l.tf, l.positions, s.df, s.ttf
FROM local_ l JOIN stats s ON l.term = s.term
"""
