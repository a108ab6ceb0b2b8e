"""Benchmark decontamination: flag training documents that share
n-grams with an evaluation set.

The standard LLM-pipeline step the reference engine has no equivalent
for (it serves search, not corpus hygiene): before training, every doc
that contains a long-enough n-gram from any benchmark prompt/answer is
flagged (and usually dropped) so eval numbers measure generalization,
not memorization. GPT-3-style 13-gram overlap is ``n=13``; the default
here is ``n=8`` (stricter, catches paraphrase-adjacent reuse).

Design for scale:

- eval sets are SMALL (10³–10⁶ shingles) next to a 100-TB corpus, so
  the distinct eval shingles are hashed to 60-bit ints
  (:func:`~same_same_spark.pipeline.dedup.hash60_col` — fixed-width
  join keys, compact broadcast) and **broadcast**: the train side is
  one explode + a map-side hash-join + one groupBy(id) — a single
  shuffle keyed by doc id, uniformly distributed, no skew.
- the 2⁻⁶⁰ hash-collision false-positive rate is deterministic and
  cross-engine identical (same md5-60bit scheme both sides), so the
  operator stays oracle-checkable; a collision can only ever FLAG a
  clean doc (conservative direction for decontamination).
- pass ``broadcast_eval=False`` for a pathologically large eval side:
  the same plan with a shuffle join.

Short-document semantics inherit
:func:`~same_same_spark.pipeline.dedup.word_shingles_col`: a doc with
fewer than ``n`` tokens contributes its whole token sequence as one
shingle, so tiny eval prompts still match verbatim copies (and only
verbatim copies) of themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.pipeline.dedup import (
    hash60_col,
    hash60_sql,
    word_shingles_col,
    word_shingles_sql,
)
from same_same_spark.text.tokenizer import duckdb_tokens_sql

DEFAULT_N = 8


def eval_shingle_hashes(
    eval_df: DataFrame, text_col: str = "text", n: int = DEFAULT_N
) -> DataFrame:
    """Distinct 60-bit shingle hashes of the eval set: ``(sh BIGINT)``."""
    return (
        eval_df.select(
            F.explode(word_shingles_col(text_col, n)).alias("shingle")
        )
        .select(hash60_col(F.col("shingle")).alias("sh"))
        .distinct()
    )


def contamination_flags(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-train-doc contamination report:
    ``(id, n_shingles, n_hit_shingles, hit_frac, contaminated)``.

    A doc is contaminated iff ≥ 1 of its distinct ``n``-gram shingles
    appears anywhere in the eval set. ``hit_frac`` (hits / doc's
    distinct shingles, 0.0 for shingle-less docs) supports
    threshold-based policies; ``contaminated`` is the strict any-hit
    flag.
    """
    ev = eval_shingle_hashes(eval_df, eval_text_col, n)
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = train_df.select(
        F.col(id_col),
        F.explode_outer(word_shingles_col(text_col, n)).alias("shingle"),
    ).select(
        id_col, hash60_col(F.col("shingle")).alias("sh")
    )
    per_doc = (
        tr.join(ev.select(F.col("sh").alias("ev_sh")),
                tr["sh"] == F.col("ev_sh"), "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("sh")).alias("n_shingles"),
            F.count(F.col("ev_sh")).alias("n_hit_shingles"),
        )
    )
    return per_doc.select(
        id_col,
        "n_shingles",
        "n_hit_shingles",
        F.when(F.col("n_shingles") > 0,
               F.col("n_hit_shingles") / F.col("n_shingles"))
        .otherwise(F.lit(0.0)).alias("hit_frac"),
        (F.col("n_hit_shingles") > 0).alias("contaminated"),
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    max_hit_frac: float = 0.0,
) -> DataFrame:
    """The surviving training corpus: drops every doc whose hit_frac
    exceeds ``max_hit_frac`` (default 0.0 = strict any-hit drop).
    Returns ``train_df``'s full rows, filtered."""
    flags = contamination_flags(
        train_df, eval_df, n=n, id_col=id_col, text_col=text_col,
        eval_text_col=eval_text_col,
    )
    keep = flags.filter(F.col("hit_frac") <= max_hit_frac).select(id_col)
    return train_df.join(keep, id_col, "left_semi")


def contamination_sql(
    train_rel: str,
    eval_rel: str,
    n: int = DEFAULT_N,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    eval_text_expr: str = "text",
) -> str:
    """DuckDB twin of :func:`contamination_flags` (same column names;
    round ``hit_frac`` yourself if comparing floats)."""
    return f"""
WITH ev_toks AS (
  SELECT {duckdb_tokens_sql(eval_text_expr)} AS toks FROM {eval_rel}
),
ev_sh AS (
  SELECT DISTINCT {hash60_sql('s')} AS ev_sh FROM (
    SELECT unnest({word_shingles_sql('toks', n)}) AS s FROM ev_toks
  )
),
tr_toks AS (
  SELECT {id_expr} AS doc_id, {duckdb_tokens_sql(text_expr)} AS toks
  FROM {train_rel}
),
tr_sh AS (
  SELECT doc_id, {hash60_sql('s')} AS sh FROM (
    SELECT doc_id, unnest({word_shingles_sql('toks', n)}) AS s
    FROM tr_toks
  )
),
joined AS (
  SELECT t.doc_id, t.sh, e.ev_sh
  FROM tr_sh t LEFT JOIN ev_sh e ON t.sh = e.ev_sh
),
agg AS (
  -- IS NOT DISTINCT FROM: a NULL train id must group with its own
  -- shingle rows exactly as Spark's groupBy(id) does
  SELECT d.doc_id,
         count(j.sh) AS n_shingles,
         count(j.ev_sh) AS n_hit_shingles
  FROM (SELECT DISTINCT doc_id FROM tr_toks) d
  LEFT JOIN joined j ON d.doc_id IS NOT DISTINCT FROM j.doc_id
  GROUP BY d.doc_id
)
SELECT doc_id, n_shingles, n_hit_shingles,
       CASE WHEN n_shingles > 0
            THEN n_hit_shingles / n_shingles::DOUBLE ELSE 0.0 END
         AS hit_frac,
       n_hit_shingles > 0 AS contaminated
FROM agg
"""
