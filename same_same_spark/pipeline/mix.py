"""End-to-end training-corpus preparation: the composition a 100-TB
pipeline actually runs before tokenization.

Stage order (each optional, each a module this package already ships):

1. quality gate   — :func:`~same_same_spark.pipeline.textqc.quality_cols`
   composite score threshold (pure column math),
2. C4 doc gate    — :func:`~same_same_spark.pipeline.textqc.c4_doc_flags`
   keep decision,
2b. LM gate       — :func:`~same_same_spark.pipeline.lm.lm_perplexity`
   CCNet-style perplexity threshold against a bigram LM trained on a
   caller-supplied curated reference slice (``lm_ref_df``),
3. span strip     — :func:`~same_same_spark.pipeline.spans.remove_shared_spans`
   byte-identical boilerplate removal, one canonical copy kept (so
   docs differing only by headers collapse into exact dups below),
4. exact dedup    — :func:`~same_same_spark.pipeline.dedup.exact_dedup`
   (one shuffle on sha256),
5. fuzzy dedup    — MinHash-LSH pairs →
   :func:`~same_same_spark.pipeline.dedup.connected_components` →
   keep each cluster's minimum id,
6. decontamination — :func:`~same_same_spark.pipeline.decontam.decontaminate`
   against an eval set (broadcast shingle hashes; only when the caller
   passes ``eval_df``),
6b. DSIR selection — :func:`~same_same_spark.pipeline.dsir.dsir_topk`
   target-matched importance resampling (only when the caller passes
   ``dsir_target_df`` and ``cfg.dsir_k``; like the LM gate, building
   its weight table runs eager aggregations at plan-construction
   time),
6c. per-domain caps — :func:`~same_same_spark.pipeline.sampling.sample_host_cap`
   uniform host budgets over canonical URLs (``cfg.host_cap``),
6d. language mixture — :func:`~same_same_spark.pipeline.sampling.sample_language_mix`
   temperature/UniMax budget allocation over ``cfg.strata_col``
   (``cfg.mix_budget``; eager bounded totals, like the DSIR table),
7. mix sampling   — :func:`~same_same_spark.pipeline.sampling.sample_stratified`
   per-stratum rates (zero-shuffle hash filter),
8. split columns  — :func:`~same_same_spark.pipeline.sampling.assign_splits`,
9. packing        — :func:`~same_same_spark.pipeline.pack.pack_sequences`
   layout columns (shard, pack_id, pack_offset, crosses_boundary)
   for the surviving docs.

Everything stays one lazy DataFrame plan until the caller acts (one
exception: handing the LM gate a raw reference DataFrame trains its
counts eagerly at plan-construction time — pass a pre-trained
``BigramLM`` to stay fully lazy), so
Catalyst sees the whole pipeline at once: the quality/C4 gates are
plain filters that push into the scan, dedup joins happen on already
gated (smaller) data, and the sampling filter costs nothing extra.
Stage ordering matters at scale — cheap per-row gates BEFORE the
shuffling dedup stages is the difference between shuffling 100 TB and
shuffling what survives the gates.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.pipeline import dedup as dedup_ops
from same_same_spark.pipeline import sampling as sampling_ops
from same_same_spark.pipeline import textqc as textqc_ops


@dataclass(frozen=True)
class MixConfig:
    """Configuration for :func:`prepare_training_corpus`."""

    id_col: str = "doc_id"
    text_col: str = "text"
    # URL-keyed dedup (pipeline/urls.dedup_by_url): when the corpus
    # carries a URL column, this is the FIRST stage — RefinedWeb's
    # pre-content dedup drops recrawls before any text math runs.
    url_col: str | None = None
    # intra-document repeated-line removal (textqc.dedup_lines_cols):
    # runs FIRST so quality / C4 / LM metrics and every dedup hash see
    # the cleaned text. Pure column math, no shuffle.
    dedup_lines: bool = False
    # CROSS-document repeated-line removal (textqc.dedup_lines_global,
    # C4's global line rule): each distinct trimmed line keeps only its
    # corpus-wide first occurrence. Runs right after the intra-doc pass
    # (which it subsumes semantically but costs two shuffles, so both
    # stay independent opt-ins); lines shorter than
    # global_line_min_chars are exempt (code braces are structure).
    dedup_lines_global: bool = False
    global_line_min_chars: int = 0
    min_quality: float | None = None
    c4_gate: bool = False
    c4_min_sentences: int = 3
    exact: bool = True
    fuzzy_threshold: float | None = None
    minhash_n_hashes: int = 16
    minhash_bands: int = 8
    shingle_n: int = 3
    # DSIR data selection (pipeline/dsir.dsir_topk): keep the dsir_k
    # docs whose hashed-n-gram distribution best matches the target
    # corpus passed as prepare_training_corpus(dsir_target_df=...),
    # Gumbel-resampled at dsir_temperature. Runs after dedup/decontam
    # (select from the cleaned pool) and before the domain caps.
    dsir_k: int | None = None
    dsir_temperature: float = 1.0
    dsir_n_buckets: int = 1 << 16
    # uniform per-domain budget (sampling.sample_host_cap): cap every
    # canonical URL host at this many docs (host_cap_weight_col=None)
    # or this much additive weight (e.g. "n_tokens"). Requires
    # url_col; runs right before the stratified mix sampling — domain
    # budgets are sampling policy, applied to the deduped survivors.
    host_cap: float | None = None
    host_cap_weight_col: str | None = None
    # language-mixture sampling (sampling.sample_language_mix): sample
    # the survivors to a WEIGHT budget via mC4 temperature (alpha) or
    # UniMax waterfilling over strata_col. Runs right before the
    # explicit per-stratum fractions (both are sampling policy;
    # fractions is the manual override). Like the DSIR/LM gates, the
    # bounded per-stratum totals aggregate runs EAGERLY at
    # plan-construction time — the returned plan itself stays a
    # single-reference hash filter (not a self-referencing stage).
    mix_budget: float | None = None
    mix_allocator: str = "temperature"
    mix_alpha: float = 0.3
    mix_weight_col: str | None = None
    fractions: dict[str, float] | None = None
    strata_col: str = "lang"
    default_fraction: float = 0.0
    test_frac: float = 0.0
    val_frac: float = 0.0
    seed: str = "mix"
    max_cc_iter: int = 30
    # decontamination runs only when prepare_training_corpus receives
    # an eval_df; these tune its shingle width and drop threshold
    decontam_n: int = 8
    decontam_max_hit_frac: float = 0.0
    # span-level dedup ACTION (pipeline/spans.py): strip byte-identical
    # shared spans (license headers, boilerplate) keeping one canonical
    # copy. Runs after the cheap gates and BEFORE exact dedup, so docs
    # that differed only by boilerplate collapse into exact duplicates
    # the next stage removes.
    # CCNet-style LM quality gate: runs only when
    # prepare_training_corpus receives lm_ref_df (the curated reference
    # slice the bigram LM trains on); keeps docs with
    # perplexity <= lm_max_perplexity. Docs with <2 tokens carry no LM
    # evidence and pass through — gate those on length/quality instead.
    lm_max_perplexity: float | None = None
    lm_alpha: float = 0.5
    strip_spans: bool = False
    span_unit: str = "line"
    span_k: int = 8  # gram width when span_unit="gram" (char-exact mode)
    span_min_df: int = 3
    span_min_chars: int = 20
    # sequence packing (pipeline/pack.py): attach each surviving doc's
    # deterministic (shard, pack_id, pack_offset) training-window
    # position as the LAST stage (layout over exactly the docs that
    # made the cut)
    pack_seq_len: int | None = None
    pack_shards: int = 256

    def stages(
        self,
        with_decontam: bool = False,
        with_lm: bool = False,
        with_dsir: bool = False,
    ) -> list[str]:
        out = []
        if self.url_col is not None:
            out.append("url_dedup")
        if self.dedup_lines:
            out.append("line_dedup")
        if self.dedup_lines_global:
            out.append("global_line_dedup")
        if self.min_quality is not None:
            out.append("quality")
        if self.c4_gate:
            out.append("c4")
        if with_lm and self.lm_max_perplexity is not None:
            out.append("lm")
        if self.strip_spans:
            out.append("span_strip")
        if self.exact:
            out.append("exact_dedup")
        if self.fuzzy_threshold is not None:
            out.append("fuzzy_dedup")
        if with_decontam:
            out.append("decontam")
        if with_dsir and self.dsir_k is not None:
            out.append("dsir")
        if self.host_cap is not None:
            out.append("host_cap")
        if self.mix_budget is not None:
            out.append("lang_mix")
        if self.fractions is not None:
            out.append("sample")
        if self.test_frac or self.val_frac:
            out.append("split")
        if self.pack_seq_len is not None:
            out.append("pack")
        return out


# Stages whose output references their own input more than once
# (``out = join(out, f(out))`` shapes). Each one DOUBLES (or worse) the
# upstream plan subtree when the pipeline stays lazy — see the
# ``scratch_dir`` note in :func:`prepare_training_corpus`.
_SELF_REFERENCING_STAGES = frozenset({
    "global_line_dedup", "lm", "span_strip", "exact_dedup",
    "fuzzy_dedup", "dsir", "host_cap",
})


def prepare_training_corpus(
    df: DataFrame,
    cfg: MixConfig,
    eval_df: DataFrame | None = None,
    stats: dict | None = None,
    lm_ref_df: DataFrame | None = None,
    dsir_target_df: DataFrame | None = None,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Run the configured stages; returns the surviving rows with all
    input columns (+ ``split`` when splits are configured).
    ``eval_df`` (columns incl. ``text``) switches on the
    decontamination stage after dedup; ``lm_ref_df`` switches on the
    CCNet perplexity gate when ``cfg.lm_max_perplexity`` is set —
    pass either the curated reference slice (a DataFrame; training its
    counts is ONE eager aggregation at plan-construction time) or an
    already-trained :class:`~same_same_spark.pipeline.lm.BigramLM` to
    keep plan construction fully lazy and reuse one model across
    calls. ``stats`` (optional dict)
    receives the fuzzy-dedup connected-components round count
    (``{"cc_rounds": n}``) — observability for scale benchmarks, no
    extra Spark actions.

    ``scratch_dir`` — the SCALE lever. Most heavy stages are
    self-referencing (``out = join(out, f(out))``: the LM keep-set,
    fuzzy survivors, DSIR selection, host-cap totals, the global line
    dedup keep join …). Left lazy, every such stage doubles the
    upstream plan subtree, so an 8-stage configuration re-executes the
    input scan and the early gates ~2^8 times inside ONE action —
    measured: a 7-stage prefix of a 10k-doc corpus ran in ~46 s while
    the full lazy pipeline on the same input needed >15 min. Spark's
    ReusedExchange only collapses identical *exchange* subtrees and
    does not rescue these shapes. Passing ``scratch_dir`` inserts a
    materialization barrier (write parquet + re-read, under a unique
    per-call subdirectory) after each self-referencing stage: upstream
    work becomes linear in the stage count — each barrier costs one
    write of the CURRENT survivor set — which is exactly how a
    large-scale operator checkpoints a multi-stage curation pipeline.
    Results are value-identical with and without (pinned in
    tests/test_mix.py); the default stays fully lazy.
    """
    configured = set(
        cfg.stages(
            with_decontam=eval_df is not None,
            with_lm=lm_ref_df is not None,
            with_dsir=dsir_target_df is not None,
        )
    )
    n_self_ref = len(configured & _SELF_REFERENCING_STAGES)
    if scratch_dir is None and n_self_ref >= 5:
        import warnings

        warnings.warn(
            f"prepare_training_corpus: {n_self_ref} self-referencing "
            "stages configured with no scratch_dir — the lazy plan tree "
            "doubles per such stage (Catalyst planning alone can OOM the "
            "driver near 7+). Pass scratch_dir= to insert stage barriers.",
            stacklevel=2,
        )

    barrier_dir = None
    if scratch_dir is not None:
        import os
        import tempfile

        os.makedirs(scratch_dir, exist_ok=True)
        barrier_dir = tempfile.mkdtemp(prefix="mix_", dir=scratch_dir)

    def _barrier(cur: DataFrame, stage: str) -> DataFrame:
        if barrier_dir is None or stage not in _SELF_REFERENCING_STAGES:
            return cur
        path = f"{barrier_dir}/{stage}"
        cur.write.mode("overwrite").parquet(path)
        return cur.sparkSession.read.parquet(path)

    out = df
    if cfg.url_col is not None:
        from same_same_spark.pipeline.urls import dedup_by_url

        out = dedup_by_url(
            out, url_col=cfg.url_col, id_col=cfg.id_col
        ).drop("url_canonical")
    if cfg.dedup_lines:
        out = out.withColumn(
            cfg.text_col,
            textqc_ops.dedup_lines_cols(cfg.text_col)["text_line_deduped"],
        )
    if cfg.dedup_lines_global:
        cleaned = textqc_ops.dedup_lines_global(
            out, cfg.id_col, cfg.text_col,
            min_line_chars=cfg.global_line_min_chars,
        ).select(
            cfg.id_col, F.col("text_global_deduped").alias("__gtext")
        )
        out = (
            out.join(cleaned, cfg.id_col)
            .withColumn(cfg.text_col, F.col("__gtext"))
            .drop("__gtext")
        )
        out = _barrier(out, "global_line_dedup")
    if cfg.min_quality is not None:
        score = textqc_ops.quality_cols(cfg.text_col)["quality_score"]
        out = out.filter(score >= F.lit(cfg.min_quality))
    if cfg.c4_gate:
        keep = textqc_ops.c4_doc_flags(
            cfg.text_col, min_sentences=cfg.c4_min_sentences
        )["c4_keep"]
        out = out.filter(keep)
    if lm_ref_df is not None and cfg.lm_max_perplexity is not None:
        from same_same_spark.pipeline.lm import (
            BigramLM,
            KneserNeyLM,
            lm_perplexity,
            train_bigram_lm,
        )

        model = (
            lm_ref_df
            if isinstance(lm_ref_df, (BigramLM, KneserNeyLM))
            else train_bigram_lm(
                lm_ref_df, text_col=cfg.text_col, alpha=cfg.lm_alpha
            )
        )
        keep_ids = (
            lm_perplexity(out, model, id_col=cfg.id_col, text_col=cfg.text_col)
            .filter(
                F.col("perplexity").isNull()
                | (F.col("perplexity") <= F.lit(cfg.lm_max_perplexity))
            )
            .select(cfg.id_col)
        )
        out = out.join(keep_ids, cfg.id_col, "left_semi")
        out = _barrier(out, "lm")
    if cfg.strip_spans:
        from same_same_spark.pipeline.spans import remove_shared_spans

        out = remove_shared_spans(
            out, cfg.id_col, cfg.text_col, unit=cfg.span_unit,
            k=cfg.span_k, min_df=cfg.span_min_df,
            min_span_chars=cfg.span_min_chars,
        )
        out = _barrier(out, "span_strip")
    if cfg.exact:
        out = dedup_ops.exact_dedup(out, cfg.id_col, cfg.text_col)
        out = _barrier(out, "exact_dedup")
    if cfg.fuzzy_threshold is not None:
        # collapse_identical: this consumer only needs the CLUSTERS
        # (keep min id per component), so signature-identical groups —
        # e.g. floods of short docs that tokenize identically — emit
        # linear star edges instead of a k²/2 clique. Same survivors;
        # see minhash_candidate_pairs.
        pairs = dedup_ops.minhash_dedup_pairs(
            out,
            cfg.id_col,
            cfg.text_col,
            threshold=cfg.fuzzy_threshold,
            n_hashes=cfg.minhash_n_hashes,
            bands=cfg.minhash_bands,
            shingle_n=cfg.shingle_n,
            collapse_identical=True,
        )
        cc_stats: dict | None = {} if stats is not None else None
        clusters = dedup_ops.dedup_clusters(
            out, pairs, cfg.id_col, max_iter=cfg.max_cc_iter,
            stats=cc_stats,
        )
        survivors = clusters.filter(
            F.col("cluster_id") == F.col(cfg.id_col)
        ).select(cfg.id_col)
        out = out.join(survivors, cfg.id_col, "left_semi")
        if stats is not None and cc_stats is not None:
            stats["cc_rounds"] = cc_stats.get("rounds")
        out = _barrier(out, "fuzzy_dedup")
    if eval_df is not None:
        from same_same_spark.pipeline.decontam import decontaminate

        out = decontaminate(
            out, eval_df, n=cfg.decontam_n, id_col=cfg.id_col,
            text_col=cfg.text_col,
            max_hit_frac=cfg.decontam_max_hit_frac,
        )
    if dsir_target_df is not None and cfg.dsir_k is not None:
        from same_same_spark.pipeline.dsir import dsir_topk

        picked = dsir_topk(
            out, dsir_target_df, k=cfg.dsir_k, id_col=cfg.id_col,
            text_col=cfg.text_col, target_text_col=cfg.text_col,
            n_buckets=cfg.dsir_n_buckets,
            temperature=cfg.dsir_temperature, seed=cfg.seed + ":dsir",
        ).select(cfg.id_col)
        out = out.join(picked, cfg.id_col, "left_semi")
        out = _barrier(out, "dsir")
    if cfg.host_cap is not None:
        if cfg.url_col is None:
            raise ValueError("MixConfig.host_cap requires url_col")
        out = sampling_ops.sample_host_cap(
            out,
            cfg.host_cap,
            url_col=cfg.url_col,
            id_col=cfg.id_col,
            seed=cfg.seed + ":host",
            weight_col=cfg.host_cap_weight_col,
        ).drop("url_host")
        out = _barrier(out, "host_cap")
    if cfg.mix_budget is not None:
        out = sampling_ops.sample_language_mix(
            out,
            cfg.mix_budget,
            allocator=cfg.mix_allocator,
            alpha=cfg.mix_alpha,
            strata_col=cfg.strata_col,
            id_col=cfg.id_col,
            seed=cfg.seed + ":langmix",
            weight_col=cfg.mix_weight_col,
        )
    if cfg.fractions is not None:
        out = sampling_ops.sample_stratified(
            out,
            cfg.fractions,
            strata_col=cfg.strata_col,
            id_col=cfg.id_col,
            seed=cfg.seed,
            default_fraction=cfg.default_fraction,
        )
    if cfg.test_frac or cfg.val_frac:
        out = sampling_ops.assign_splits(
            out,
            id_col=cfg.id_col,
            test_frac=cfg.test_frac,
            val_frac=cfg.val_frac,
            seed=cfg.seed + ":split",
        )
    if cfg.pack_seq_len is not None:
        from same_same_spark.pipeline.pack import pack_sequences

        layout = pack_sequences(
            out, cfg.pack_seq_len, id_col=cfg.id_col,
            text_col=cfg.text_col, n_shards=cfg.pack_shards,
            seed=cfg.seed + ":pack",
        ).drop("n_tokens")
        out = out.join(layout, cfg.id_col)
    return out


def mix_report(
    df: DataFrame,
    cfg: MixConfig,
    eval_df: DataFrame | None = None,
    lm_ref_df: DataFrame | None = None,
    dsir_target_df: DataFrame | None = None,
) -> dict[str, int]:
    """Row counts after each configured stage (one Spark action per
    stage — a diagnostic for notebooks and tests, NOT part of the lazy
    production plan; run it on a sample at scale)."""
    with_d = eval_df is not None
    with_lm = lm_ref_df is not None
    if with_lm and cfg.lm_max_perplexity is not None:
        # train ONCE up front — otherwise every stage count at or
        # after "lm" would re-run the training aggregation
        from same_same_spark.pipeline.lm import (
            BigramLM,
            KneserNeyLM,
            train_bigram_lm,
        )

        if not isinstance(lm_ref_df, (BigramLM, KneserNeyLM)):
            lm_ref_df = train_bigram_lm(
                lm_ref_df, text_col=cfg.text_col, alpha=cfg.lm_alpha
            )
    order = cfg.stages(
        with_decontam=with_d, with_lm=with_lm,
        with_dsir=dsir_target_df is not None,
    )
    counts: dict[str, int] = {"input": df.count()}
    for i, stage in enumerate(order):
        keep = set(order[: i + 1])
        partial = _truncated(cfg, keep)
        ev = eval_df if "decontam" in keep else None
        lref = lm_ref_df if "lm" in keep else None
        tgt = dsir_target_df if "dsir" in keep else None
        counts[stage] = prepare_training_corpus(
            df, partial, ev, lm_ref_df=lref, dsir_target_df=tgt
        ).count()
    return counts


def _truncated(cfg: MixConfig, keep: set[str]) -> MixConfig:
    """A copy of ``cfg`` with every stage not in ``keep`` disabled.

    Only the stage-disabling fields are overridden (via
    :func:`dataclasses.replace`), so fields added to
    :class:`MixConfig` later are carried through unchanged instead of
    silently reverting to defaults in :func:`mix_report`. (The
    decontam stage is toggled by ``mix_report`` withholding
    ``eval_df``, not by a cfg field — the caller derives both from ONE
    stage-order computation.)"""
    return replace(
        cfg,
        dedup_lines=cfg.dedup_lines and "line_dedup" in keep,
        dedup_lines_global=(
            cfg.dedup_lines_global and "global_line_dedup" in keep
        ),
        min_quality=cfg.min_quality if "quality" in keep else None,
        c4_gate=cfg.c4_gate and "c4" in keep,
        strip_spans=cfg.strip_spans and "span_strip" in keep,
        exact=cfg.exact and "exact_dedup" in keep,
        fuzzy_threshold=cfg.fuzzy_threshold if "fuzzy_dedup" in keep else None,
        host_cap=cfg.host_cap if "host_cap" in keep else None,
        mix_budget=cfg.mix_budget if "lang_mix" in keep else None,
        fractions=cfg.fractions if "sample" in keep else None,
        test_frac=cfg.test_frac if "split" in keep else 0.0,
        val_frac=cfg.val_frac if "split" in keep else 0.0,
        pack_seq_len=cfg.pack_seq_len if "pack" in keep else None,
    )
