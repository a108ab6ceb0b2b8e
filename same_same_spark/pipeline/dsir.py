"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
distribution looks like a curated TARGET corpus.

The importance weight of a document under the hashed bag-of-n-grams
model is::

    log w(doc) = Σ_buckets count_doc[b] · (log p_target[b] − log p_raw[b])

with both distributions estimated over ``n_buckets`` hash buckets and
Laplace-smoothed. DSIR then samples without replacement by Gumbel
top-k: rank by ``log w + g`` where ``g = −ln(−ln u)`` and ``u`` is this
package's deterministic per-doc hash uniform — so selection is a pure
function of (corpora, seed), reproducible across runs and engines.

Scale shape — the same one :mod:`decontam` proved out:

- the two bucket-distribution passes are ``explode → groupBy(bucket)``
  with map-side combine; state is ``n_buckets`` rows (default 2¹⁶),
  broadcastable by construction and INDEPENDENT of corpus size;
- scoring is one broadcast join from exploded doc n-grams to the
  bucket-weight table plus a per-doc sum — no corpus-keyed shuffle
  beyond the per-doc aggregation;
- top-k selection rides the bounded tournament
  (:func:`~same_same_spark.operators.topk.topk_per_query`), never a
  global sort; fraction-style selection is a pure filter against a
  caller-supplied threshold.

Cross-engine: n-grams come from the shared shingle machinery
(:func:`~same_same_spark.pipeline.dedup.word_shingles_col` — X1
tokens, n-word shingles, DISTINCT per doc, 60-bit md5 hashes), so a
DuckDB oracle re-derives bucket counts, log-weights, Gumbel noise and
the final ranking from the same parquet. Distinct-per-doc shingles
make the estimator a set-of-n-grams variant (each doc votes each
n-gram once) — a deliberate reuse of the package's one pinned shingle
definition rather than a second subtly-different tokenizer.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.pipeline.dedup import (
    hash60_col,
    hash60_sql,
    word_shingles_col,
    word_shingles_sql,
)
from same_same_spark.pipeline.sampling import hash_uniform_col, hash_uniform_sql

__all__ = [
    "bucket_counts",
    "corpus_divergence",
    "dsir_log_weights",
    "dsir_topk",
    "dsir_sql_ctes",
    "corpus_divergence_sql",
]

DEFAULT_N = 2
DEFAULT_BUCKETS = 1 << 16


def _bucket_col(text_col: str, n: int, n_buckets: int):
    """Exploded (doc → bucket) rows: 60-bit shingle hash mod buckets.

    ``pmod`` keeps the bucket non-negative (hash60 is non-negative
    already, but the contract is explicit)."""
    sh = F.explode(word_shingles_col(text_col, n)).alias("shingle")
    return sh, F.pmod(hash60_col(F.col("shingle")), F.lit(n_buckets)).alias(
        "bucket"
    )


def bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = DEFAULT_N,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """``(bucket, cnt)`` — hashed n-gram counts over the corpus (one
    explode + one groupBy with partial aggregation; ≤ n_buckets rows
    out)."""
    sh, bucket = _bucket_col(text_col, n, n_buckets)
    return (
        df.select(sh)
        .select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str = "text",
    n: int = DEFAULT_N,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-raw-doc importance log-weight:
    ``(id, n_grams, log_w)`` with
    ``log_w = Σ_b count_doc[b]·(ln p̂_target[b] − ln p̂_raw[b])`` and
    ``p̂`` the add-``alpha`` estimate over ``n_buckets``. Docs with no
    n-grams carry ``log_w = 0`` (no evidence — gate them on length
    elsewhere, the LM-gate convention)."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    spark = raw_df.sparkSession
    tgt = bucket_counts(target_df, target_text_col, n, n_buckets)
    raw = bucket_counts(raw_df, text_col, n, n_buckets)
    # Materialize the joined bucket table ONCE (≤ 2·n_buckets rows —
    # driver memory is bounded by the caller's n_buckets choice, the
    # lm_buckets eager-cuts precedent) and derive the normalizer
    # totals from those SAME rows: one pass over each corpus total,
    # where lazy/eager totals branches would re-run the corpus
    # explodes (measured 2 extra passes at bench scale).
    joined = (
        tgt.selectExpr("bucket", "cnt AS t_cnt")
        .join(raw.selectExpr("bucket", "cnt AS r_cnt"), "bucket", "full")
        .collect()
    )
    t_total = float(sum(r["t_cnt"] or 0 for r in joined))
    r_total = float(sum(r["r_cnt"] or 0 for r in joined))
    const = math.log(r_total + alpha * n_buckets) - math.log(
        t_total + alpha * n_buckets
    )
    weights = spark.createDataFrame(
        [
            (
                int(r["bucket"]),
                math.log((r["t_cnt"] or 0) + alpha)
                - math.log((r["r_cnt"] or 0) + alpha)
                + const,
            )
            for r in joined
        ],
        "bucket LONG, lw DOUBLE",
    )
    sh, bucket = _bucket_col(text_col, n, n_buckets)
    doc_buckets = raw_df.select(
        F.col(id_col), F.explode_outer(word_shingles_col(text_col, n)).alias("shingle")
    ).select(
        id_col,
        F.pmod(hash60_col(F.col("shingle")), F.lit(n_buckets)).alias("bucket"),
    )
    return (
        doc_buckets.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.coalesce(F.sum("lw"), F.lit(0.0)).alias("log_w"),
        )
    )


def corpus_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col_a: str = "text",
    text_col_b: str = "text",
    n: int = DEFAULT_N,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> dict[str, float]:
    """Distribution drift between two corpora over the SAME smoothed
    hashed-n-gram model DSIR selects with: returns ``{"kl_ab",
    "kl_ba", "js"}`` (nats; JS uses the standard ½-mixture). The
    standard dataset-card diagnostic for "did this month's crawl move
    away from the reference mix".

    Shape: the two ``bucket_counts`` corpus passes are the only
    distributed work; the divergences reduce driver-side over the
    collected ≤ 2·n_buckets-row joined table, with the (B − seen)
    all-empty buckets folded in closed form (they share one smoothed
    probability pair)."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    a = bucket_counts(df_a, text_col_a, n, n_buckets)
    b = bucket_counts(df_b, text_col_b, n, n_buckets)
    joined = (
        a.selectExpr("bucket", "cnt AS a_cnt")
        .join(b.selectExpr("bucket", "cnt AS b_cnt"), "bucket", "full")
        .collect()
    )
    a_total = float(sum(r["a_cnt"] or 0 for r in joined))
    b_total = float(sum(r["b_cnt"] or 0 for r in joined))
    za = a_total + alpha * n_buckets
    zb = b_total + alpha * n_buckets
    kl_ab = kl_ba = js = 0.0
    for r in joined:
        pa = ((r["a_cnt"] or 0) + alpha) / za
        pb = ((r["b_cnt"] or 0) + alpha) / zb
        m = 0.5 * (pa + pb)
        kl_ab += pa * math.log(pa / pb)
        kl_ba += pb * math.log(pb / pa)
        js += 0.5 * pa * math.log(pa / m) + 0.5 * pb * math.log(pb / m)
    empty = n_buckets - len(joined)
    if empty:
        pa = alpha / za
        pb = alpha / zb
        m = 0.5 * (pa + pb)
        kl_ab += empty * pa * math.log(pa / pb)
        kl_ba += empty * pb * math.log(pb / pa)
        js += empty * (
            0.5 * pa * math.log(pa / m) + 0.5 * pb * math.log(pb / m)
        )
    return {"kl_ab": kl_ab, "kl_ba": kl_ba, "js": js}


def corpus_divergence_sql(
    rel: str = "documents",
    a_where: str = "TRUE",
    b_where: str = "TRUE",
    n: int = DEFAULT_N,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> str:
    """DuckDB twin of :func:`corpus_divergence` (full one-row SELECT:
    ``kl_ab, kl_ba, js`` rounded to 6dp), with the all-empty-bucket
    remainder folded in the same closed form."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    toks = duckdb_tokens_sql("text")
    shingles = word_shingles_sql("toks", n)
    g = (
        f"SELECT {hash60_sql('g')} % {n_buckets} AS bucket "
        f"FROM (SELECT unnest({shingles}) AS g "
        f"FROM (SELECT {toks} AS toks FROM {rel} WHERE {{where}}))"
    )
    return f"""
WITH acnt AS (
  SELECT bucket, count(*) AS cnt FROM ({g.format(where=a_where)}) GROUP BY 1
),
bcnt AS (
  SELECT bucket, count(*) AS cnt FROM ({g.format(where=b_where)}) GROUP BY 1
),
j AS (
  SELECT coalesce(a.cnt, 0)::DOUBLE AS a_cnt,
         coalesce(b.cnt, 0)::DOUBLE AS b_cnt
  FROM acnt a FULL JOIN bcnt b ON a.bucket = b.bucket
),
z AS (
  SELECT coalesce(sum(a_cnt), 0) + {alpha!r} * {n_buckets} AS za,
         coalesce(sum(b_cnt), 0) + {alpha!r} * {n_buckets} AS zb,
         {n_buckets} - count(*) AS empty
  FROM j
),
p AS (
  SELECT (a_cnt + {alpha!r}) / za AS pa, (b_cnt + {alpha!r}) / zb AS pb
  FROM j, z
  UNION ALL
  SELECT {alpha!r} / za AS pa, {alpha!r} / zb AS pb
  FROM z, unnest(range(1, empty + 1)) AS u(i)
)
SELECT round(sum(pa * ln(pa / pb)), 6) AS kl_ab,
       round(sum(pb * ln(pb / pa)), 6) AS kl_ba,
       round(sum(0.5 * pa * ln(pa / ((pa + pb) / 2))
                 + 0.5 * pb * ln(pb / ((pa + pb) / 2))), 6) AS js
FROM p
"""


def dsir_topk(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str = "text",
    n: int = DEFAULT_N,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    seed: str = "dsir",
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel top-k importance resampling: rank docs by
    ``score = log_w/temperature + g`` with deterministic per-doc
    Gumbel noise ``g = −ln(−ln(hash_uniform(seed|id)))`` and keep the
    top ``k`` through the bounded tournament. ``temperature → 0``
    approaches argmax selection; Xie et al.'s sampled-without-
    replacement scheme is exactly this ranking. Returns
    ``(id, score, rank)`` — the perturbed objective itself, so the
    weight plan executes exactly ONCE (joining log_w back would re-run
    the distribution passes; re-derive it as
    ``(score − g)·temperature``, or join
    :func:`dsir_log_weights` yourself, when the raw weight matters)."""
    from same_same_spark.operators.topk import topk_per_query

    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    lw = dsir_log_weights(
        raw_df, target_df, id_col, text_col, target_text_col,
        n, n_buckets, alpha,
    )
    u = hash_uniform_col(F.col(id_col), seed)
    gumbel = -F.log(-F.log(u))
    scored = lw.select(
        F.lit(0).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        (F.col("log_w") / F.lit(float(temperature)) + gumbel).alias("score"),
    )
    return topk_per_query(scored, k).select(
        F.col("doc_id").alias(id_col), "score", "rank"
    )


def dsir_sql_ctes(
    raw_rel: str = "documents",
    target_where: str = "TRUE",
    raw_where: str = "TRUE",
    n: int = DEFAULT_N,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> str:
    """DuckDB CTE fragment ending in ``dsir(doc_id, n_grams, log_w)``
    — the oracle twin of :func:`dsir_log_weights` with the target and
    raw corpora carved out of one relation by WHERE clauses."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    toks = duckdb_tokens_sql("text")
    shingles = word_shingles_sql("toks", n)
    return f"""
tokd AS (SELECT doc_id, {toks} AS toks FROM {raw_rel}),
rawdocs AS (SELECT doc_id FROM {raw_rel} WHERE {raw_where}),
grams AS (
  SELECT doc_id, {hash60_sql('g')} % {n_buckets} AS bucket
  FROM (SELECT doc_id, unnest({shingles}) AS g FROM tokd
        WHERE doc_id IN (SELECT doc_id FROM rawdocs))
),
tgrams AS (
  SELECT {hash60_sql('g')} % {n_buckets} AS bucket
  FROM (SELECT doc_id, unnest({shingles}) AS g FROM tokd
        WHERE doc_id IN (SELECT doc_id FROM {raw_rel} WHERE {target_where}))
),
tcnt AS (SELECT bucket, count(*) AS cnt FROM tgrams GROUP BY 1),
rcnt AS (SELECT bucket, count(*) AS cnt FROM grams GROUP BY 1),
totals AS (
  SELECT (SELECT coalesce(sum(cnt), 0) FROM tcnt) AS t_total,
         (SELECT coalesce(sum(cnt), 0) FROM rcnt) AS r_total
),
w AS (
  SELECT coalesce(t.bucket, r.bucket) AS bucket,
         ln(coalesce(t.cnt, 0) + {alpha!r})
         - ln(coalesce(r.cnt, 0) + {alpha!r})
         + ln(r_total + {alpha!r} * {n_buckets})
         - ln(t_total + {alpha!r} * {n_buckets}) AS lw
  FROM tcnt t FULL JOIN rcnt r ON t.bucket = r.bucket, totals
),
dsir AS (  -- left-join from the doc list: zero-gram docs -> (0, 0.0),
           -- exactly the Spark side's explode_outer semantics
  SELECT rd.doc_id, count(g.bucket)::BIGINT AS n_grams,
         coalesce(sum(w.lw), 0.0) AS log_w
  FROM rawdocs rd
  LEFT JOIN grams g ON g.doc_id = rd.doc_id
  LEFT JOIN w ON w.bucket = g.bucket
  GROUP BY 1
)
"""
