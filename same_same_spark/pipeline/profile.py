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

import glob
import json
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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
       sum(n_tokens)::BIGINT AS total_tokens,
       avg(n_tokens) AS mean_tokens,
       quantile_cont(n_tokens, 0.5) AS p50_tokens,
       quantile_cont(n_tokens, 0.9) AS p90_tokens,
       avg(q) AS mean_quality,
       count(DISTINCT content_h60) AS n_distinct_texts,
       1.0 - count(DISTINCT content_h60) / count(*)::DOUBLE AS dup_rate
FROM rows_
GROUP BY stratum
"""


# ---------------------------------------------------------------------------
# Incremental dataset-card maintenance
#
# A training-data release is not profiled once: batches land, bad
# batches are rolled back, and the card must stay current WITHOUT
# re-scanning 100 TB per update. The store below keeps three exactly
# mergeable state tables, so each update touches only the new batch
# plus state that is O(strata + distinct lengths + distinct contents)
# — never the raw corpus:
#
#   scalars  (stratum, n_docs, total_tokens, sum_quality)   — tiny
#   lengths  (stratum, n_tokens, cnt)                        — small:
#            an EXACT histogram of per-doc token counts; distinct doc
#            lengths are bounded by the max doc length, not by corpus
#            size, so exact interpolated quantiles survive any scale
#   hashes   (stratum, content_h60, cnt)                     — the big
#            one, O(distinct contents): exact duplicate accounting
#            (the state is ~9 bytes/distinct doc — index-sized, not
#            corpus-sized)
#
# ``distinct_mode='sketch'`` swaps the hashes table for ONE mergeable
# HLL sketch per stratum (Spark's DataSketches hll_sketch_agg /
# hll_union_agg): state drops from O(distinct docs) to O(strata) —
# ~4 KB per stratum at ANY corpus size — at the cost of ~2% distinct
# estimation error (exact while a stratum stays in the sketch's sparse
# range) and no delete support (sketches aren't invertible; deletes
# raise). Exact mode stays the default and the oracle-checked path.
#
# Appends ADD counts; deletes SUBTRACT them (counts, not sets, so
# deleting one copy of a duplicated text keeps the other). Every state
# table merges by groupBy-sum, so the card derived from the store is
# EXACTLY the card `corpus_profile` computes over the surviving corpus
# (floats to summation order; tested).
#
# Commit protocol (same shape as the index manifest): new-generation
# dirs are written first and are unreferenced garbage until
# `profile_manifest.json` is atomically replaced; stale generations
# are swept on the next update. A crash mid-update leaves the previous
# generation fully live.
# ---------------------------------------------------------------------------

_PROFILE_MANIFEST = "profile_manifest.json"
_STATE_TABLES = ("scalars", "lengths", "hashes", "sketches")


def _profile_manifest_load(store_dir: str) -> dict:
    with open(os.path.join(store_dir, _PROFILE_MANIFEST)) as f:
        return json.load(f)


def _profile_manifest_flip(store_dir: str, manifest: dict) -> None:
    tmp = os.path.join(store_dir, f".{_PROFILE_MANIFEST}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(store_dir, _PROFILE_MANIFEST))


def _gen_dir(store_dir: str, table: str, gen: int) -> str:
    return os.path.join(store_dir, f"{table}-{gen:06d}")


def _sweep_stale_gens(store_dir: str, live_gen: int) -> None:
    """Remove state dirs from any generation other than the live one:
    orphans of a crashed update (newer gen, manifest never flipped) or
    leftovers of a completed one (older gen)."""
    for table in _STATE_TABLES:
        for d in glob.glob(os.path.join(store_dir, f"{table}-*")):
            if d != _gen_dir(store_dir, table, live_gen):
                shutil.rmtree(d, ignore_errors=True)


def _batch_state(
    df: DataFrame, strata_col: str, text_col: str, sign: int,
    distinct_mode: str = "exact",
) -> dict[str, DataFrame]:
    """The three partial-aggregate tables for one batch, with counts
    multiplied by ``sign`` (+1 append, −1 delete). Single derivation
    site — the same expressions :func:`corpus_profile` uses, so store
    and batch profile cannot diverge."""
    rows = df.select(
        F.col(strata_col).alias("stratum"),
        ws_token_count_col(text_col).alias("n_tokens"),
        quality_cols(text_col)["quality_score"].alias("q"),
        hash60_col(F.col(text_col)).alias("content_h60"),
    )
    s = F.lit(sign)
    out = {
        "scalars": rows.groupBy("stratum").agg(
            (s * F.count(F.lit(1))).alias("n_docs"),
            (s * F.sum("n_tokens")).alias("total_tokens"),
            (s.cast("double") * F.sum("q")).alias("sum_quality"),
        ),
        # NULL-text docs have NULL n_tokens / content_h60; Spark's
        # percentile and countDistinct (the corpus_profile side of the
        # card==batch identity) ignore NULL inputs, so NULL rows must
        # never enter the histogram or the distinct state — the card
        # re-derives the non-null doc count as sum(cnt) of this table.
        "lengths": rows.filter(F.col("n_tokens").isNotNull())
        .groupBy("stratum", "n_tokens")
        .agg((s * F.count(F.lit(1))).alias("cnt")),
    }
    hashed = rows.filter(F.col("content_h60").isNotNull())
    if distinct_mode == "sketch":
        out["sketches"] = hashed.groupBy("stratum").agg(
            F.hll_sketch_agg("content_h60").alias("sk")
        )
    else:
        out["hashes"] = hashed.groupBy("stratum", "content_h60").agg(
            (s * F.count(F.lit(1))).alias("cnt")
        )
    return out


def profile_store_init(
    spark: SparkSession,
    store_dir: str,
    strata_col: str = "lang",
    text_col: str = "text",
    distinct_mode: str = "exact",
) -> None:
    """Create an empty profile store (generation 0).

    ``distinct_mode='sketch'`` keeps one HLL sketch per stratum
    instead of the exact content-hash counts — O(strata) state at any
    corpus size, ~2% distinct error, no deletes (see module notes)."""
    if distinct_mode not in ("exact", "sketch"):
        raise ValueError(f"unknown distinct_mode: {distinct_mode!r}")
    os.makedirs(store_dir, exist_ok=True)
    empty = spark.createDataFrame(
        [], "stratum STRING, n_docs LONG, total_tokens LONG, "
        "sum_quality DOUBLE",
    )
    empty.write.mode("overwrite").parquet(
        _gen_dir(store_dir, "scalars", 0)
    )
    spark.createDataFrame(
        [], "stratum STRING, n_tokens LONG, cnt LONG"
    ).write.mode("overwrite").parquet(_gen_dir(store_dir, "lengths", 0))
    if distinct_mode == "sketch":
        spark.createDataFrame(
            [], "stratum STRING, sk BINARY"
        ).write.mode("overwrite").parquet(
            _gen_dir(store_dir, "sketches", 0)
        )
    else:
        spark.createDataFrame(
            [], "stratum STRING, content_h60 LONG, cnt LONG"
        ).write.mode("overwrite").parquet(_gen_dir(store_dir, "hashes", 0))
    _profile_manifest_flip(
        store_dir,
        {
            "version": 1,
            "generation": 0,
            "strata_col": strata_col,
            "text_col": text_col,
            "distinct_mode": distinct_mode,
        },
    )


def profile_store_update(
    spark: SparkSession,
    store_dir: str,
    df: DataFrame,
    delete: bool = False,
    log=print,
) -> None:
    """Fold a batch of appended (or, with ``delete=True``, removed)
    documents into the store. Cost: one aggregation over the batch +
    a groupBy-sum merge with each state table — no corpus rescan.

    Deletes must pass the documents being removed (their text is
    needed to subtract the right histogram/hash counts); deleting a
    document the store never saw raises rather than silently
    corrupting the card.
    """
    m = _profile_manifest_load(store_dir)
    mode = m.get("distinct_mode", "exact")
    if delete and mode == "sketch":
        raise ValueError(
            "profile_store_update(delete=True) is unsupported in "
            "sketch mode — HLL sketches are not invertible; use "
            "distinct_mode='exact' for corpora with deletes"
        )
    gen, new_gen = m["generation"], m["generation"] + 1
    _sweep_stale_gens(store_dir, gen)

    batch = _batch_state(
        df, m["strata_col"], m["text_col"], -1 if delete else 1,
        distinct_mode=mode,
    )
    merged: dict[str, DataFrame] = {}
    for table, delta in batch.items():
        old = spark.read.parquet(_gen_dir(store_dir, table, gen))
        if table == "sketches":
            # sketches merge by HLL union, not by count sums
            merged[table] = (
                old.unionByName(delta)
                .groupBy("stratum")
                .agg(F.hll_union_agg("sk").alias("sk"))
            )
            continue
        keys = [c for c in delta.columns
                if c not in ("n_docs", "total_tokens", "sum_quality",
                             "cnt")]
        vals = [c for c in delta.columns if c not in keys]
        merged[table] = (
            old.unionByName(delta)
            .groupBy(*keys)
            .agg(*[F.sum(c).alias(c) for c in vals])
        )

    count_col = {"scalars": "n_docs", "lengths": "cnt", "hashes": "cnt"}
    for table, out in merged.items():
        if table in count_col:
            out = out.filter(F.col(count_col[table]) != 0)
        out.write.mode("overwrite").parquet(
            _gen_dir(store_dir, table, new_gen)
        )

    if delete:
        # a delete of unseen docs drives some count negative — refuse.
        # Validated from the just-written (unreferenced) new-gen
        # parquet so the expensive batch aggregation runs exactly once;
        # on failure the orphan dirs are swept and the manifest never
        # flips, leaving the previous generation fully live.
        neg = (
            spark.read.parquet(_gen_dir(store_dir, "hashes", new_gen))
            .filter(F.col("cnt") < 0).limit(1).count()
            + spark.read.parquet(
                _gen_dir(store_dir, "scalars", new_gen)
            ).filter(F.col("n_docs") < 0).limit(1).count()
        )
        if neg:
            _sweep_stale_gens(store_dir, gen)
            raise ValueError(
                "profile_store_update(delete=True): batch contains "
                "documents the store never counted"
            )

    m["generation"] = new_gen
    _profile_manifest_flip(store_dir, m)
    _sweep_stale_gens(store_dir, new_gen)
    log(
        f"[profile-store] gen {gen} -> {new_gen} "
        f"({'delete' if delete else 'append'})"
    )


def _join_strata(a: DataFrame, b: DataFrame, how: str = "inner") -> DataFrame:
    """Join on ``stratum`` with NULL-safe equality: a NULL stratum
    (docs with no language tag — common in real corpora) is a stratum
    like any other in ``groupBy``, so the card joins must not drop it
    the way plain ``join(..., "stratum")`` would. ``how='left'`` keeps
    strata absent from ``b`` (e.g. all-NULL-text strata, which have no
    histogram or hash rows)."""
    out = a.join(b, a["stratum"].eqNullSafe(b["stratum"]), how)
    return out.drop(b["stratum"])


def _hist_quantile_aggs(pos: Column, cum: Column, v: Column, tag: str):
    """Aggregate pieces of an exact interpolated quantile over a
    cumulative histogram: the value at 1-based position ``k`` is the
    first histogram value whose cumulative count reaches ``k``."""
    return [
        F.min(F.when(cum >= F.floor(pos), v)).alias(f"_lo_{tag}"),
        F.min(F.when(cum >= F.ceil(pos), v)).alias(f"_hi_{tag}"),
        F.first(pos).alias(f"_pos_{tag}"),
    ]


def _hist_quantile_value(tag: str, name: str) -> Column:
    """Spark ``percentile``'s own interpolation, term for term —
    ``(higher−pos)·lo + (pos−lower)·hi`` with an early return at
    integer positions — so the histogram-derived quantile is
    bit-compatible with the per-group-sort batch profile."""
    pos = F.col(f"_pos_{tag}")
    lo = F.col(f"_lo_{tag}").cast("double")
    hi = F.col(f"_hi_{tag}").cast("double")
    return (
        F.when(F.floor(pos) == F.ceil(pos), lo)
        .otherwise((F.ceil(pos) - pos) * lo + (pos - F.floor(pos)) * hi)
        .alias(name)
    )


def profile_store_card(
    spark: SparkSession, store_dir: str
) -> DataFrame:
    """The dataset card from store state alone — same schema and same
    values as :func:`corpus_profile` over the surviving corpus, but
    computed from O(state) not O(corpus).

    Quantiles come from the exact length histogram via a per-stratum
    cumulative window (histogram rows per stratum are bounded by
    distinct doc lengths — thousands, not corpus-sized)."""
    m = _profile_manifest_load(store_dir)
    gen = m["generation"]
    scalars = spark.read.parquet(_gen_dir(store_dir, "scalars", gen))
    lengths = spark.read.parquet(_gen_dir(store_dir, "lengths", gen))
    if m.get("distinct_mode", "exact") == "sketch":
        distinct = spark.read.parquet(
            _gen_dir(store_dir, "sketches", gen)
        ).select(
            "stratum",
            F.hll_sketch_estimate("sk").alias("n_distinct_texts"),
        )
    else:
        distinct = (
            spark.read.parquet(_gen_dir(store_dir, "hashes", gen))
            .groupBy("stratum")
            .agg(F.count(F.lit(1)).alias("n_distinct_texts"))
        )

    # NULL-text docs contribute to n_docs (and sum_quality — quality
    # of NULL text is a defined constant) but have NULL n_tokens /
    # content_h60, which Spark's percentile / avg / countDistinct all
    # ignore. The card mirrors that exactly: the non-null doc count is
    # sum(cnt) of the histogram itself (NULL rows never enter state;
    # the defensive filters also cover pre-fix stores), quantile
    # positions and mean_tokens divide by it, and strata with no
    # histogram/hash rows at all survive via left joins.
    lengths = lengths.filter(F.col("n_tokens").isNotNull())
    w = (
        Window.partitionBy("stratum")
        .orderBy("n_tokens")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("stratum").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = lengths.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n_len", F.sum("cnt").over(w_all)
    )
    pos50 = F.lit(1) + (F.col("n_len") - 1) * F.lit(0.5)
    pos90 = F.lit(1) + (F.col("n_len") - 1) * F.lit(0.9)
    quant = (
        h.groupBy("stratum")
        .agg(
            *_hist_quantile_aggs(pos50, F.col("cum"),
                                 F.col("n_tokens"), "p50"),
            *_hist_quantile_aggs(pos90, F.col("cum"),
                                 F.col("n_tokens"), "p90"),
            F.sum("cnt").alias("n_len"),
        )
        .select(
            "stratum",
            _hist_quantile_value("p50", "p50_tokens"),
            _hist_quantile_value("p90", "p90_tokens"),
            "n_len",
        )
    )

    # clamp: an HLL estimate can overshoot by its error band, and a
    # distinct count above n_docs (or a negative dup_rate) is nonsense
    # on a published card; the exact path never exceeds n_docs, so the
    # clamp is a no-op there
    n_distinct = F.least(
        F.coalesce(F.col("n_distinct_texts"), F.lit(0)), F.col("n_docs")
    )
    n_len = F.coalesce(F.col("n_len"), F.lit(0))
    return (
        _join_strata(
            _join_strata(scalars, quant, "left"), distinct, "left"
        )
        .select(
            "stratum",
            "n_docs",
            "total_tokens",
            F.when(
                n_len > 0, F.col("total_tokens") / n_len
            ).alias("mean_tokens"),
            "p50_tokens",
            "p90_tokens",
            (F.col("sum_quality") / F.col("n_docs")).alias(
                "mean_quality"
            ),
            n_distinct.alias("n_distinct_texts"),
            (F.lit(1.0) - n_distinct / F.col("n_docs")).alias(
                "dup_rate"
            ),
        )
    )
