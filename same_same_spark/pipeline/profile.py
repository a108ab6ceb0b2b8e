"""Corpus profiling: the per-stratum statistics a dataset card needs.

One aggregation pass produces, per stratum (language / source /
domain): document count, token totals/means, EXACT token-count
quantiles, mean quality score, and the exact-duplicate rate — the
numbers every training-data release publishes ("X docs, Y tokens,
median length Z, dup rate W%").

Scale shape: one groupBy on the stratum column. Exact quantiles use
``percentile`` (Spark's exact implementation — a per-group sort;
strata counts are language-sized, i.e. millions of docs per group at
most, and the sorted values are single longs). For pathologically hot
strata swap in ``percentile_approx`` — the column expression is the
only change. The duplicate rate hashes content through the repo's one
sanctioned cross-engine scheme
(:func:`~same_same_spark.pipeline.dedup.hash60_col`), so DuckDB
computes the identical value (60-bit collisions undercount distincts
by ~n²/2⁶¹ — immaterial for card statistics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from same_same_spark.pipeline.dedup import hash60_col, hash60_sql
from same_same_spark.pipeline.textqc import (
    quality_cols,
    quality_sql,
    token_count_sql,
    ws_token_count_col,
)


def corpus_profile(
    df: DataFrame,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum dataset-card stats:

    ``(stratum, n_docs, total_tokens, mean_tokens, p50_tokens,
    p90_tokens, mean_quality, n_distinct_texts, dup_rate)``.

    ``dup_rate`` = 1 − distinct/total: the fraction of docs that are
    byte-identical copies of another doc in the same stratum.
    """
    toks = ws_token_count_col(text_col).alias("n_tokens")
    quality = quality_cols(text_col)["quality_score"].alias("q")
    rows = df.select(
        F.col(strata_col).alias("stratum"),
        toks,
        quality,
        hash60_col(F.col(text_col)).alias("content_h60"),
    )
    out = rows.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.avg("n_tokens").alias("mean_tokens"),
        F.percentile(F.col("n_tokens"), F.lit(0.5)).alias("p50_tokens"),
        F.percentile(F.col("n_tokens"), F.lit(0.9)).alias("p90_tokens"),
        F.avg("q").alias("mean_quality"),
        F.countDistinct("content_h60").alias("n_distinct_texts"),
    )
    return out.withColumn(
        "dup_rate",
        F.lit(1.0) - F.col("n_distinct_texts") / F.col("n_docs"),
    )


def corpus_profile_sql(
    rel: str, strata_expr: str = "lang", text_expr: str = "text"
) -> str:
    """DuckDB twin of :func:`corpus_profile` (same column names).

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` both compute
    the exact linear-interpolated quantile, so the values agree to
    float rounding.
    """
    tc = token_count_sql(text_expr)["ws_tokens"]
    q = quality_sql(text_expr)["quality_score"]
    return f"""
WITH rows_ AS (
  SELECT {strata_expr} AS stratum,
         ({tc})::BIGINT AS n_tokens,
         ({q}) AS q,
         {hash60_sql(text_expr)} AS content_h60
  FROM {rel}
)
SELECT stratum,
       count(*) AS n_docs,
       sum(n_tokens) AS total_tokens,
       avg(n_tokens) AS mean_tokens,
       quantile_cont(n_tokens, 0.5) AS p50_tokens,
       quantile_cont(n_tokens, 0.9) AS p90_tokens,
       avg(q) AS mean_quality,
       count(DISTINCT content_h60) AS n_distinct_texts,
       1.0 - count(DISTINCT content_h60) / count(*)::DOUBLE AS dup_rate
FROM rows_
GROUP BY stratum
"""
