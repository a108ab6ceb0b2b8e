"""Corpus statistics — the frozen-corpus state the reference mutates live.

The reference's TF-IDF embedder rebuilds vocabulary as queries arrive
(``tfidf.go:175-183`` — queries mutate scores). We freeze corpus
statistics at index-build time into two small artifacts:

- corpus-level: ``N`` (doc count) and ``avgdl`` (mean token count),
- term-level: per-term document frequency ``df`` with the reference's
  vocabulary-pruning semantics (``tfidf.go:102-125``): keep terms with
  ``df >= min_df`` and ``df/N <= max_df`` ratio, order by df descending,
  truncate to ``max_features``. Go map iteration makes the reference's
  equal-df tie order nondeterministic; we define the total order
  ``(df DESC, term ASC)``.

Everything here is plain groupBy/agg — partial (map-side) aggregation,
column pruning and pushdown are Catalyst's job.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.text.tokenizer import tokens_col


def tokenized(df: DataFrame, id_col: str = "doc_id", text_col: str = "content") -> DataFrame:
    """(id, tokens ARRAY<STRING>, dl INT) — one row per document."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(text_col).alias("tokens"),
    ).withColumn("dl", F.size("tokens"))


def doc_term_freqs(tok_df: DataFrame) -> DataFrame:
    """(doc_id, term, tf, dl) — exploded posting rows.

    explode → groupBy is a single shuffle with map-side combine; the
    ``first(dl)`` is exact because dl is functionally dependent on doc_id.
    """
    return (
        tok_df.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float


def corpus_stats(tok_df: DataFrame) -> CorpusStats:
    """N and avgdl over *all* docs (zero-token docs count toward both)."""
    row = tok_df.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"] or 0.0))


def term_doc_freqs(tok_df: DataFrame) -> DataFrame:
    """(term, df) — document frequency; dedup-within-doc via array_distinct
    before the explode (reference's ``seen`` set, tfidf.go:92-99), which
    keeps the shuffle narrow (one row per distinct (doc, term))."""
    return (
        tok_df.select(F.explode(F.array_distinct("tokens")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def prune_vocabulary(
    df_table: DataFrame,
    n_docs: int,
    min_df: int = 1,
    max_df_ratio: float = 0.95,
    max_features: int | None = 5000,
) -> DataFrame:
    """A2 — reference vocabulary pruning with a deterministic tie-break.

    Defaults mirror ``tfidf.go:30-33`` (min_df=1, max_df=0.95,
    max_features=5000).
    """
    out = df_table.filter(
        (F.col("df") >= min_df)
        & ((F.col("df") / F.lit(float(n_docs))) <= max_df_ratio)
    )
    if max_features is not None:
        out = out.orderBy(F.desc("df"), F.asc("term")).limit(max_features)
    return out
