"""Token-bigram language-model perplexity scoring — CCNet-style
quality filtering (Wenzek et al. 2020: score every document with a
small LM trained on a curated reference corpus; keep/bucket by
perplexity). The reference engine has no LM surface; this extends the
training-data pipeline the same way dedup/textqc do.

Model: add-alpha-smoothed token bigrams over X1 tokens (the frozen
tokenizer — so LM scores, BM25, and the index all see one token
stream):

    logp(w2 | w1) = ln((c(w1,w2) + alpha) / (c(w1) + alpha * V))

with V = distinct unigrams in the training slice. Out-of-vocabulary
events fall out naturally (missing counts coalesce to 0 — the
classic add-alpha floor), so scoring needs no UNK rewrite pass.

Spark-first shape / 100-TB notes:

- Training counts come from ONE pass over the (small, curated)
  reference slice: tokens stay JVM-side (`tokens_col`), bigrams are
  ``arrays_zip(slice, slice)`` — no UDF, no Python.
- Scoring is two joins (bigram, unigram) + one groupBy(doc).  The LM
  is reference-corpus-sized — CCNet's point is that it is SMALL — so
  both joins broadcast and the only shuffle is the per-doc mean.
  With a huge LM the same plan degrades gracefully to shuffle joins.
- The per-doc mean log-prob is the score; ``avg_logp`` is the
  cross-engine-stable quantity (|lp| ≤ ln-scale, identical to 6dp in
  DuckDB).  ``perplexity = exp(-avg_logp)`` is derived and carried
  for humans — exp amplifies last-ulp noise, so oracle comparisons
  pin avg_logp, not perplexity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from same_same_spark.text.tokenizer import duckdb_tokens_sql, tokens_col

__all__ = [
    "BigramLM",
    "KneserNeyLM",
    "train_bigram_lm",
    "train_kn_lm",
    "lm_perplexity",
    "lm_perplexity_sql",
    "kn_perplexity_sql",
    "lm_buckets",
    "lm_buckets_sql",
]

ALPHA_DEFAULT = 0.5
KN_DISCOUNT_DEFAULT = 0.75


@dataclass
class BigramLM:
    """Counts of a trained bigram LM. ``unigrams``: (w1, c1);
    ``bigrams``: (w1, w2, c2); ``vocab_size``: distinct w1 count.
    ``broadcast=True`` (the CCNet small-reference contract) hints both
    joins to broadcast."""

    unigrams: DataFrame
    bigrams: DataFrame
    vocab_size: int
    alpha: float = ALPHA_DEFAULT
    broadcast: bool = True


@dataclass
class KneserNeyLM:
    """Interpolated Kneser–Ney bigram LM (Kneser & Ney 1995; the
    smoothing CCNet's KenLM models actually use, vs :class:`BigramLM`'s
    add-alpha baseline)::

        P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
                   + D·N₁₊(w1,·)/c(w1·) · P_cont(w2)      c(w1·) > 0
        P(w2|w1) = P_cont(w2)                              unseen w1

    with ``c(w1·)`` the bigram marginal, ``N₁₊(w1,·)`` the distinct
    continuations of ``w1``, and the continuation distribution floored
    by one add-alpha UNK slot so unseen words keep finite mass::

        P_cont(w2) = (N₁₊(·,w2) + alpha) / (N₁₊(·,·) + alpha·(V+1))

    Tables: ``bigrams`` (w1, w2, c2), ``contexts`` (w1, c1m, n_fwd),
    ``continuations`` (w2, n_bwd); scalars ``n1p_total`` (distinct
    bigram count) and ``vocab_size``. All counts are exact one-pass
    aggregates over the (small, curated) reference slice."""

    bigrams: DataFrame
    contexts: DataFrame
    continuations: DataFrame
    n1p_total: float
    vocab_size: int
    discount: float = KN_DISCOUNT_DEFAULT
    alpha: float = ALPHA_DEFAULT
    broadcast: bool = True


def _bigram_pairs(tok_arr: Column) -> Column:
    """(w1, w2) structs for consecutive token pairs — pure column
    math: zip the array against itself shifted by one."""
    n = F.size(tok_arr)
    return F.arrays_zip(
        F.slice(tok_arr, 1, n - 1).alias("w1"),
        F.slice(tok_arr, 2, n - 1).alias("w2"),
    )


def train_bigram_lm(
    train_df: DataFrame,
    text_col: str = "text",
    alpha: float = ALPHA_DEFAULT,
    broadcast: bool = True,
) -> BigramLM:
    """One pass over the reference slice → unigram + bigram counts.
    Deterministic: counts are exact, no sampling, no RNG."""
    toks = train_df.select(tokens_col(text_col).alias("t")).filter(
        F.size("t") > 0
    )
    uni = (
        toks.select(F.explode("t").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("double").alias("c1"))
    )
    bi = (
        toks.filter(F.size("t") > 1)
        .select(F.explode(_bigram_pairs(F.col("t"))).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c2"))
    )
    return BigramLM(
        unigrams=uni,
        bigrams=bi,
        vocab_size=int(uni.count()),
        alpha=float(alpha),
        broadcast=broadcast,
    )


def train_kn_lm(
    train_df: DataFrame,
    text_col: str = "text",
    discount: float = KN_DISCOUNT_DEFAULT,
    alpha: float = ALPHA_DEFAULT,
    broadcast: bool = True,
) -> KneserNeyLM:
    """One pass over the reference slice → bigram counts + the three
    Kneser–Ney statistics tables (context marginals/fan-outs, backward
    continuation counts). Deterministic exact counts, like
    :func:`train_bigram_lm`."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    toks = train_df.select(tokens_col(text_col).alias("t")).filter(
        F.size("t") > 0
    )
    bi = (
        toks.filter(F.size("t") > 1)
        .select(F.explode(_bigram_pairs(F.col("t"))).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c2"))
    )
    contexts = bi.groupBy("w1").agg(
        F.sum("c2").alias("c1m"),
        F.count(F.lit(1)).cast("double").alias("n_fwd"),
    )
    continuations = bi.groupBy("w2").agg(
        F.count(F.lit(1)).cast("double").alias("n_bwd")
    )
    n1p_total = float(bi.count())
    vocab_size = int(
        toks.select(F.explode("t").alias("w")).select("w").distinct().count()
    )
    return KneserNeyLM(
        bigrams=bi,
        contexts=contexts,
        continuations=continuations,
        n1p_total=n1p_total,
        vocab_size=vocab_size,
        discount=float(discount),
        alpha=float(alpha),
        broadcast=broadcast,
    )


def _kn_lp(lm: KneserNeyLM) -> Column:
    """Per-bigram-event Kneser–Ney log-probability from the joined
    (c2, c1m, n_fwd, n_bwd) columns — NULLs = unseen."""
    p_cont = (
        F.coalesce(F.col("n_bwd"), F.lit(0.0)) + F.lit(lm.alpha)
    ) / F.lit(lm.n1p_total + lm.alpha * (lm.vocab_size + 1))
    c1m = F.coalesce(F.col("c1m"), F.lit(0.0))
    seen = (
        F.greatest(
            F.coalesce(F.col("c2"), F.lit(0.0)) - F.lit(lm.discount),
            F.lit(0.0),
        )
        / c1m
        + F.lit(lm.discount) * F.coalesce(F.col("n_fwd"), F.lit(0.0)) / c1m
        * p_cont
    )
    return F.log(F.when(c1m > 0, seen).otherwise(p_cont)).alias("lp")


def lm_perplexity(
    df: DataFrame,
    lm: "BigramLM | KneserNeyLM",
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Score every document: (id, *keep_cols, n_bigrams, avg_logp,
    perplexity). ``keep_cols`` are per-doc-constant columns (e.g. a
    stratum) carried through the aggregation.

    Docs with fewer than two tokens have no bigram events —
    ``n_bigrams = 0`` and NULL scores (they carry no LM evidence; gate
    them on length, not perplexity). They arrive via a UNION of the
    short-doc branch, not a corpus-wide join back — ids are assumed
    unique per row (the corpus contract everywhere in this package),
    so the only shuffle in the whole plan is the per-doc mean.
    avg_logp is rounded to 6dp (the cross-engine contract); perplexity
    derives from the UNrounded mean and is informational.
    """
    keep = list(keep_cols or [])
    toks = df.select(
        F.col(id_col), *[F.col(c) for c in keep],
        tokens_col(text_col).alias("t"),
    )
    pairs = (
        toks.filter(F.size("t") > 1)
        .select(
            id_col, *keep, F.explode(_bigram_pairs(F.col("t"))).alias("p")
        )
        .select(
            id_col, *keep,
            F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"),
        )
    )
    hint = F.broadcast if lm.broadcast else (lambda d: d)
    if isinstance(lm, KneserNeyLM):
        joined = (
            pairs.join(hint(lm.bigrams), ["w1", "w2"], "left")
            .join(hint(lm.contexts), ["w1"], "left")
            .join(hint(lm.continuations), ["w2"], "left")
        )
        lp = _kn_lp(lm)
    else:
        joined = pairs.join(hint(lm.bigrams), ["w1", "w2"], "left").join(
            hint(lm.unigrams), ["w1"], "left"
        )
        lp = (
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0.0)) + F.lit(lm.alpha))
                / (
                    F.coalesce(F.col("c1"), F.lit(0.0))
                    + F.lit(lm.alpha * lm.vocab_size)
                )
            )
        ).alias("lp")
    scored = (
        joined.select(id_col, *keep, lp)
        .groupBy(id_col)
        .agg(
            *[F.first(c).alias(c) for c in keep],  # per-doc constants
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("lp").alias("_avg_lp"),
        )
        .select(
            id_col, *keep,
            F.col("n_bigrams"),
            F.round(F.col("_avg_lp"), 6).alias("avg_logp"),
            F.round(F.exp(-F.col("_avg_lp")), 6).alias("perplexity"),
        )
    )
    no_evidence = toks.filter(
        F.size("t") < 2  # size(NULL array) = -1 lands here too
    ).select(
        id_col, *keep,
        F.lit(0).cast("long").alias("n_bigrams"),
        F.lit(None).cast("double").alias("avg_logp"),
        F.lit(None).cast("double").alias("perplexity"),
    )
    return scored.unionByName(no_evidence)


def lm_buckets(
    df: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str | None = None,
) -> DataFrame:
    """CCNet head/middle/tail: per-stratum (or global) perplexity
    terciles. ``head`` = the least-perplexed third (avg_logp at or
    above the 2/3 cut), ``tail`` = the most perplexed; docs without LM
    evidence get a NULL bucket. Cut points are EXACT interpolated
    percentiles (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, the
    corpus_profile contract) of the 6dp-rounded avg_logp, so both
    engines derive identical cuts and identical buckets. The cuts are
    derived EAGERLY — one scoring pass collapsed to #strata rows and
    collected at call time (the same driver-side pattern as the IVF
    probe's centroid sims) — so the returned plan re-scores exactly
    once when consumed: two corpus passes total, never a
    double-branched lazy plan with duplicated exchanges."""
    keep = [strata_col] if strata_col else []
    scored = lm_perplexity(
        df, lm, id_col=id_col, text_col=text_col, keep_cols=keep
    )
    key = F.col(strata_col) if strata_col else F.lit(1)
    cuts_agg = (
        scored.filter(F.col("avg_logp").isNotNull())
        .groupBy(key.alias("_k"))
        .agg(
            F.percentile(F.col("avg_logp"), F.lit(1.0 / 3)).alias("_c1"),
            F.percentile(F.col("avg_logp"), F.lit(2.0 / 3)).alias("_c2"),
        )
    )
    cuts = df.sparkSession.createDataFrame(
        cuts_agg.collect(), cuts_agg.schema
    )
    left = scored.withColumn("_k", key)
    bc = F.broadcast(cuts)
    joined = left.join(
        bc,
        left["_k"].eqNullSafe(bc["_k"]),  # NULL strata are strata too
        "left",
    )
    bucket = (
        F.when(F.col("avg_logp").isNull(), F.lit(None).cast("string"))
        .when(F.col("avg_logp") >= F.col("_c2"), F.lit("head"))
        .when(F.col("avg_logp") >= F.col("_c1"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return joined.select(
        id_col, *keep, "n_bigrams", "avg_logp", bucket.alias("bucket")
    )


def _lm_score_ctes(
    table: str,
    id_expr: str,
    text_expr: str,
    train_where: str,
    alpha: float,
) -> str:
    """Shared CTE chain: train the counts relationally and score every
    doc — ends with ``sc(doc_id, n_bigrams, avg_logp)`` (one row per
    doc, NULL scores for <2-token docs)."""
    t = duckdb_tokens_sql(text_expr)
    return f"""
WITH tr AS (
  SELECT {t} AS t FROM {table} WHERE {train_where}
),
uni AS (
  SELECT w1, count(*)::DOUBLE AS c1
  FROM (SELECT unnest(t) AS w1 FROM tr WHERE len(t) > 0)
  GROUP BY 1
),
v AS (SELECT count(*)::DOUBLE AS vs FROM uni),
bi AS (
  SELECT w1, w2, count(*)::DOUBLE AS c2
  FROM (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM tr, unnest(range(1, len(t))) AS u(i)
  )
  GROUP BY 1, 2
),
docs AS (
  SELECT {id_expr} AS doc_id, {t} AS t FROM {table}
),
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM docs, unnest(range(1, len(t))) AS u(i)
),
scored AS (
  SELECT p.doc_id,
         ln((coalesce(b.c2, 0) + {alpha})
            / (coalesce(u.c1, 0) + {alpha} * (SELECT vs FROM v))) AS lp
  FROM pairs p
  LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
  LEFT JOIN uni u ON u.w1 = p.w1
),
agg AS (
  SELECT doc_id, count(*) AS n_bigrams, avg(lp) AS avg_lp
  FROM scored GROUP BY 1
),
sc AS (
  SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
         round(a.avg_lp, 6) AS avg_logp
  FROM (SELECT DISTINCT {id_expr} AS doc_id FROM {table}) d
  LEFT JOIN agg a ON a.doc_id = d.doc_id
)"""


def lm_perplexity_sql(
    table: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
    train_where: str = "doc_id % 10 = 0",
    alpha: float = ALPHA_DEFAULT,
) -> str:
    """DuckDB twin of :func:`lm_perplexity` — selects the
    cross-engine-stable columns only (perplexity = exp of the mean is
    last-ulp-amplifying, so the oracle pins avg_logp)."""
    ctes = _lm_score_ctes(table, id_expr, text_expr, train_where, alpha)
    return f"{ctes}\nSELECT doc_id, n_bigrams, avg_logp FROM sc"


def kn_perplexity_sql(
    table: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
    train_where: str = "doc_id % 10 = 0",
    discount: float = KN_DISCOUNT_DEFAULT,
    alpha: float = ALPHA_DEFAULT,
) -> str:
    """DuckDB twin of :func:`lm_perplexity` over a
    :class:`KneserNeyLM` — re-derives the bigram counts, context
    marginals/fan-outs, continuation counts, the UNK-floored
    continuation distribution, and the interpolated KN probability
    with the same operation grouping as the Column expression."""
    t = duckdb_tokens_sql(text_expr)
    d = float(discount)
    a = float(alpha)
    p_cont = (
        f"((coalesce(n.n_bwd, 0) + {a!r}) / "
        f"((SELECT n1p FROM tot) + {a!r} * ((SELECT vs FROM vocab) + 1)))"
    )
    return f"""
WITH tr AS (
  SELECT {t} AS t FROM {table} WHERE {train_where}
),
bi AS (
  SELECT w1, w2, count(*)::DOUBLE AS c2
  FROM (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM tr, unnest(range(1, len(t))) AS u(i)
  )
  GROUP BY 1, 2
),
ctx AS (
  SELECT w1, sum(c2) AS c1m, count(*)::DOUBLE AS n_fwd FROM bi GROUP BY 1
),
cont AS (SELECT w2, count(*)::DOUBLE AS n_bwd FROM bi GROUP BY 1),
tot AS (SELECT count(*)::DOUBLE AS n1p FROM bi),
vocab AS (
  SELECT count(DISTINCT w)::DOUBLE AS vs
  FROM (SELECT unnest(t) AS w FROM tr WHERE len(t) > 0)
),
docs AS (
  SELECT {id_expr} AS doc_id, {t} AS t FROM {table}
),
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM docs, unnest(range(1, len(t))) AS u(i)
),
scored AS (
  SELECT p.doc_id,
         ln(CASE WHEN coalesce(x.c1m, 0) > 0
                 THEN greatest(coalesce(b.c2, 0) - {d!r}, 0) / x.c1m
                      + {d!r} * coalesce(x.n_fwd, 0) / x.c1m * {p_cont}
                 ELSE {p_cont} END) AS lp
  FROM pairs p
  LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
  LEFT JOIN ctx x ON x.w1 = p.w1
  LEFT JOIN cont n ON n.w2 = p.w2
),
agg AS (
  SELECT doc_id, count(*) AS n_bigrams, avg(lp) AS avg_lp
  FROM scored GROUP BY 1
)
SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
       round(a.avg_lp, 6) AS avg_logp
FROM (SELECT DISTINCT {id_expr} AS doc_id FROM {table}) d
LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


def lm_buckets_sql(
    table: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
    train_where: str = "doc_id % 10 = 0",
    alpha: float = ALPHA_DEFAULT,
    strata_expr: str | None = None,
) -> str:
    """DuckDB twin of :func:`lm_buckets` — same scoring CTEs, then
    per-stratum (or global) exact tercile cuts over the rounded
    avg_logp and the identical >=-boundary bucket CASE."""
    ctes = _lm_score_ctes(table, id_expr, text_expr, train_where, alpha)
    strat = strata_expr if strata_expr else "1"
    # name the output stratum column like the Spark side (bare column
    # identifiers only — the entry contract)
    strat_out = f"st.stratum AS {strata_expr}, " if strata_expr else ""
    return f"""{ctes},
strat AS (
  SELECT sc.doc_id, sc.n_bigrams, sc.avg_logp, s.stratum
  FROM sc JOIN (
    SELECT DISTINCT {id_expr} AS doc_id, {strat} AS stratum FROM {table}
  ) s ON s.doc_id = sc.doc_id
),
cuts AS (
  SELECT stratum,
         quantile_cont(avg_logp, {1.0 / 3!r}) AS c1,
         quantile_cont(avg_logp, {2.0 / 3!r}) AS c2
  FROM strat WHERE avg_logp IS NOT NULL GROUP BY 1
)
SELECT st.doc_id, {strat_out}st.n_bigrams, st.avg_logp,
       CASE WHEN st.avg_logp IS NULL THEN NULL
            WHEN st.avg_logp >= c.c2 THEN 'head'
            WHEN st.avg_logp >= c.c1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM strat st
LEFT JOIN cuts c ON c.stratum IS NOT DISTINCT FROM st.stratum
"""
