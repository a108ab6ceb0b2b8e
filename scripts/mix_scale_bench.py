#!/usr/bin/env python
"""Training-pipeline scale smoke, v2 (VERDICT r4 #6): run the FULL
``prepare_training_corpus`` pipeline — line dedup (intra + global),
quality gate, CCNet LM gate, gram-mode span strip, exact + fuzzy
(MinHash-LSH → connected components) dedup, DSIR selection, and the
per-host cap — on millions of documents with realistic duplication,
and record the evidence a 100-TB operator needs: total wall + shuffle
bytes for the full pipeline, a per-stage breakdown (cumulative-prefix
runs: stage cost = prefix delta), CC round count, LSH candidate
count, and dedup recall on the planted pairs.

Corpus: ``generate_corpus(n_base)`` (deterministic synthetic code
docs) with THREE extra per-doc unique keyword-led lines ∪ exact copies
of every 8th doc (new ids) ∪ near-copies of every 8th+1 doc (one
appended token) — ~25% duplication — plus a synthetic ``url`` column
with a skewed host distribution (~1200 uniform hosts + one hot host
holding ~5% of the corpus) so host_cap has real skew to cut. LM
reference / DSIR target = disjoint deterministic slices of the base
corpus.

The unique lines matter — and must be unique in TOKEN space, not just
as line strings: ``generate_corpus`` draws statement lines from small
pools, so corpus-wide first-occurrence line dedup
(``dedup_lines_global``) guts almost every document down to its unique
lines — and if those only differ by DIGITS (which the X1 tokenizer
strips) the residues become near-identical in shingle space and the
LSH candidate set goes quadratic (measured: hung/OOM at 10-30k docs).
See ``_base_docs`` for the letters-only payload fix.

The pipeline runs with ``scratch_dir`` stage barriers (``run_mix``):
at this stage count the fully lazy plan is not even plannable — the
self-referencing stages double the plan subtree each, and Catalyst
OOMs the driver before any data moves.

``dup_recall`` is measured at a prefix that EXCLUDES the two
content-mutating stages (``global_line_dedup`` and ``span_strip``):
an exact/near copy shares every line (and every corpus-common gram)
with its original, so those stages strip the copy to (near-)empty
residue BEFORE document dedup ever sees the pair — correct end-to-end
removal, but it would make a recall metric about MinHash banding
vacuous (nothing left to recall). The gates-only prefix keeps the
planted pairs intact, so the number reported here is the banding's
own recall.

Writes BENCH/mix_scale.json. Run with the machine otherwise idle.
Env knobs: MIX_SCALE_DOCS (full-run total, default 5_000_000),
MIX_STAGE_DOCS (per-stage breakdown total, default MIX_SCALE_DOCS/10 —
the cumulative-prefix loop costs ~#stages × a full run, so it runs at
reduced scale by design; the full-scale run is the no-OOM evidence),
SPARK_GRAFT_CPUS, MIX_SCALE_BANDS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from dataclasses import replace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOTAL = int(os.environ.get("MIX_SCALE_DOCS", "5000000"))
STAGE_TOTAL = int(os.environ.get("MIX_STAGE_DOCS", str(max(TOTAL // 10, 1))))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 16 hashes × 4 bands of 4 rows: per-band collision probability is
# jaccard^4 — the 100-TB throughput setting (8×2 stays the
# CORRECTNESS setting, recall exactly 1, pinned in test_dedup); the
# recall this setting actually achieves is measured below, not assumed.
BANDS = int(os.environ.get("MIX_SCALE_BANDS", "4"))
# CCNet-style gate threshold: generous enough that the gate scores the
# whole corpus (the cost being measured) while dropping only the tail;
# the calibration run (100k docs) put p50 bigram perplexity of this
# corpus at ~40-80 and p99 well under 1000.
LM_MAX_PPL = float(os.environ.get("MIX_SCALE_LM_PPL", "1000"))


def _base_docs(spark, n_base: int):
    """The deterministic base corpus (re-derivable for pair maps):
    generated docs + 3 per-doc unique keyword-led lines (see module
    docstring for why the unique lines are load-bearing).

    The unique payload is LETTERS-ONLY (hex digits translated a-p):
    the X1 tokenizer strips digits, so a hex payload is unique as a
    LINE STRING but tokenizes to near-nothing — after global line
    dedup removes the pool-shared body lines, every doc's residue then
    carries the SAME few tokens, thousands of near-identical (but not
    byte-identical) MinHash signatures land in every LSH bucket, and
    the candidate set goes quadratic (measured: the full-pipeline run
    hung at fuzzy_dedup on 10k docs). One globally-unique ≥3-letter
    TOKEN per line keeps post-dedup residues mutually distinct in
    shingle space, so banding stays linear."""
    from pyspark.sql import functions as F

    from same_same_spark.corpus import doc_id_col, generate_corpus

    base = generate_corpus(spark, n_base, seed=7).select(
        doc_id_col(), F.col("content").alias("text")
    )
    uniq = F.concat_ws(
        "\n",
        *[
            F.concat(
                F.lit("func uq"), F.lit(k),
                F.translate(
                    F.lower(
                        F.hex(F.xxhash64("doc_id", F.lit(f"uline{k}")))
                    ),
                    "0123456789",
                    "ghijklmnop",
                ),
                F.lit(" ()"),
            )
            for k in range(3)
        ],
    )
    return base.withColumn("text", F.concat("text", F.lit("\n"), uniq))


def _mk_corpus(spark, n_base: int, path: str):
    """base ∪ exact dups ∪ near dups, with skewed synthetic urls."""
    from pyspark.sql import functions as F

    base = _base_docs(spark, n_base)
    exact_dups = base.filter(F.pmod(F.col("doc_id"), F.lit(8)) == 0).select(
        F.xxhash64("doc_id", F.lit("exact-dup")).alias("doc_id"), "text"
    )
    near_dups = base.filter(F.pmod(F.col("doc_id"), F.lit(8)) == 1).select(
        F.xxhash64("doc_id", F.lit("near-dup")).alias("doc_id"),
        F.concat("text", F.lit(" trailingmarker")).alias("text"),
    )
    docs = base.unionByName(exact_dups).unionByName(near_dups)
    # skewed hosts: ~1200 uniform + every 20th doc on one hot host
    host = F.when(
        F.pmod(F.col("doc_id"), F.lit(20)) == 3, F.lit(0)
    ).otherwise(F.pmod(F.xxhash64("doc_id", F.lit("host")), F.lit(1200)))
    docs = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://h"), F.abs(host).cast("string"),
            F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
        ),
    )
    # skewed languages (~70/15/10/5) so the lang_mix budget has a head
    # to cap and a tail to keep whole
    lslot = F.abs(F.pmod(F.xxhash64("doc_id", F.lit("lang")), F.lit(20)))
    docs = docs.withColumn(
        "lang",
        F.when(lslot < 14, F.lit("en"))
        .when(lslot < 17, F.lit("fr"))
        .when(lslot < 19, F.lit("de"))
        .otherwise(F.lit("zh")),
    )
    docs.write.mode("overwrite").parquet(path)


def _full_cfg(n_docs: int):
    from same_same_spark.pipeline.mix import MixConfig

    return MixConfig(
        url_col="url",
        dedup_lines=True,
        dedup_lines_global=True,
        global_line_min_chars=8,
        min_quality=0.05,
        lm_max_perplexity=LM_MAX_PPL,
        strip_spans=True,
        span_unit="gram",
        span_k=8,
        span_min_df=3,
        span_min_chars=20,
        exact=True,
        fuzzy_threshold=0.9,
        minhash_n_hashes=16,
        minhash_bands=BANDS,
        shingle_n=3,
        max_cc_iter=30,
        dsir_k=int(n_docs * 0.6),
        host_cap=float(max(n_docs // 600, 100)),
        # language-mixture budget sized against the pipeline's measured
        # ~12-13% survivorship (the stage sees ~n/8 docs, so a 6%
        # budget caps the en head at roughly half while the zh tail
        # keeps ~everything); temperature 0.3
        mix_budget=float(int(n_docs * 0.06)),
        mix_allocator="temperature",
        mix_alpha=0.3,
    )


def _truncate_full(cfg, keep: set[str]):
    """Cumulative-prefix config: disable every stage not in ``keep``
    (mix._truncated plus the stages this smoke adds on top)."""
    from same_same_spark.pipeline.mix import _truncated

    out = _truncated(cfg, keep)
    return replace(
        out,
        url_col=cfg.url_col if (
            "url_dedup" in keep or "host_cap" in keep
        ) else None,
        dedup_lines_global=(
            cfg.dedup_lines_global and "global_line_dedup" in keep
        ),
        dsir_k=cfg.dsir_k if "dsir" in keep else None,
        lm_max_perplexity=(
            cfg.lm_max_perplexity if "lm" in keep else None
        ),
    )


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from same_same_spark import get_spark
    from same_same_spark.metrics import MetricsWindow
    from same_same_spark.pipeline import dedup as dedup_ops
    from same_same_spark.pipeline import textqc as textqc_ops
    from same_same_spark.pipeline.lm import train_bigram_lm
    from same_same_spark.pipeline.mix import prepare_training_corpus

    spark = get_spark(
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS * 2, TOTAL // 20000),
    )
    scratch = tempfile.mkdtemp(prefix="mix_scale_")

    def run_mix(*args, **kw):
        """prepare_training_corpus(...).count() with stage barriers
        (scratch_dir) — the way a large-scale operator runs the
        multi-stage pipeline; fully lazy, the self-referencing stages
        double the plan subtree per stage and a 10-stage configuration
        OOMs the DRIVER in Catalyst planning (measured at 20k docs —
        data size is irrelevant, the plan tree itself explodes). The
        per-call scratch is deleted right after the action."""
        sd = tempfile.mkdtemp(prefix="stage_", dir=scratch)
        try:
            return prepare_training_corpus(
                *args, **kw, scratch_dir=sd
            )
        finally:
            import atexit  # dir removed after the caller's action below
            atexit.register(shutil.rmtree, sd, ignore_errors=True)
    exec_keys = (
        "shuffle_write_bytes", "shuffle_read_bytes",
        "memory_spill_bytes", "disk_spill_bytes", "input_bytes",
    )

    def run_total(total: int, per_stage: bool, extras: bool = True) -> dict:
        n_base = int(total / 1.25)
        corpus_path = os.path.join(scratch, f"docs_{total}.parquet")
        _mk_corpus(spark, n_base, corpus_path)
        docs = spark.read.parquet(corpus_path)
        n_docs = docs.count()
        cfg = _full_cfg(n_docs)
        # references: disjoint deterministic slices of the base ids,
        # materialized (the LM trains once up front; DSIR's two target
        # distribution passes are part of the measured pipeline)
        lm_ref_path = os.path.join(scratch, f"lmref_{total}.parquet")
        tgt_path = os.path.join(scratch, f"tgt_{total}.parquet")
        docs.filter(F.pmod(F.col("doc_id"), F.lit(97)) == 5).write.mode(
            "overwrite"
        ).parquet(lm_ref_path)
        docs.filter(F.pmod(F.col("doc_id"), F.lit(89)) == 7).write.mode(
            "overwrite"
        ).parquet(tgt_path)
        lm_ref = spark.read.parquet(lm_ref_path)
        target = spark.read.parquet(tgt_path)
        t0 = time.time()
        model = train_bigram_lm(lm_ref, text_col="text")
        lm_train_sec = time.time() - t0

        stage_rows = []
        if per_stage:
            order = cfg.stages(with_lm=True, with_dsir=True)
            prev_wall, prev_exec = 0.0, {k: 0 for k in exec_keys}
            for i, stage in enumerate(order):
                keep = set(order[: i + 1])
                partial = _truncate_full(cfg, keep)
                lref = model if "lm" in keep else None
                tgt = target if "dsir" in keep else None
                with MetricsWindow(spark) as mw:
                    t0 = time.time()
                    n = run_mix(
                        docs, partial, lm_ref_df=lref, dsir_target_df=tgt
                    ).count()
                    wall = time.time() - t0
                tot = mw.totals()
                stage_rows.append({
                    "stage": stage,
                    "survivors": n,
                    "prefix_wall_sec": round(wall, 2),
                    "stage_wall_sec": round(wall - prev_wall, 2),
                    "stage_shuffle_write_bytes": int(
                        tot.get("shuffle_write_bytes", 0)
                        - prev_exec["shuffle_write_bytes"]
                    ),
                })
                prev_wall = wall
                prev_exec = {k: int(tot.get(k, 0)) for k in exec_keys}

        stats: dict = {}
        with MetricsWindow(spark) as mw:
            t0 = time.time()
            survivors = run_mix(
                docs, cfg, stats=stats, lm_ref_df=model,
                dsir_target_df=target,
            ).count()
            wall = time.time() - t0
        totals = mw.totals()

        if not extras:
            return {
                "n_docs": n_docs,
                "n_base": n_base,
                "n_planted_dups": n_docs - n_base,
                "survivors": survivors,
                "removed": n_docs - survivors,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
                "lm_train_sec": round(lm_train_sec, 2),
                "cc_rounds": stats.get("cc_rounds"),
                "exec": {k: int(totals.get(k, 0)) for k in exec_keys},
                "stages": stage_rows,
            }

        # dedup recall on the planted pairs, measured at a prefix
        # ending at fuzzy_dedup that EXCLUDES the two content-MUTATING
        # stages (global_line_dedup strips a copy's every line;
        # span_strip removes the pool-shared body grams both pair
        # members carry — either way document dedup then sees residues,
        # not the planted overlap, and the number stops being about
        # MinHash banding) and the later selection stages (dsir /
        # host_cap drop docs for non-dedup reasons and would inflate
        # a survivors-based recall). Eligibility = both members reach
        # the dedup stages (pass every earlier gate).
        dd_keep = {
            "url_dedup", "line_dedup", "quality",
            "lm", "exact_dedup", "fuzzy_dedup",
        }
        dd_cfg = _truncate_full(cfg, dd_keep)
        # exact base-id set: re-derive the deterministic base corpus
        # (base ids are xxhash values — ~half the PLANTED ids would
        # also pass any sign/range filter on the union)
        base = _base_docs(spark, n_base).select("doc_id")
        pair_map = (
            base.filter(F.pmod(F.col("doc_id"), F.lit(8)) == 0)
            .select(
                F.col("doc_id").alias("orig_id"),
                F.xxhash64("doc_id", F.lit("exact-dup")).alias("dup_id"),
            )
            .unionByName(
                base.filter(F.pmod(F.col("doc_id"), F.lit(8)) == 1).select(
                    F.col("doc_id").alias("orig_id"),
                    F.xxhash64("doc_id", F.lit("near-dup")).alias("dup_id"),
                )
            )
        )
        pre_dedup_keep = dd_keep - {"exact_dedup", "fuzzy_dedup"}
        gate_ids = run_mix(
            docs, _truncate_full(cfg, pre_dedup_keep), lm_ref_df=model
        ).select("doc_id")
        eligible = pair_map.join(
            gate_ids.select(F.col("doc_id").alias("orig_id")), "orig_id"
        ).join(gate_ids.select(F.col("doc_id").alias("dup_id")), "dup_id")
        n_eligible = eligible.count()
        dd_ids = run_mix(
            docs, dd_cfg, lm_ref_df=model
        ).select("doc_id")
        both_survive = (
            eligible.join(
                dd_ids.select(F.col("doc_id").alias("orig_id")), "orig_id"
            )
            .join(dd_ids.select(F.col("doc_id").alias("dup_id")), "dup_id")
            .count()
        )

        # peak LSH candidate count (untimed; the scale-killer to
        # watch) under collapse_identical — the mode the pipeline's
        # fuzzy stage actually runs (the raw clique count is
        # quadratic-by-definition on identical-signature floods)
        gated = docs.filter(
            textqc_ops.quality_cols("text")["quality_score"]
            >= cfg.min_quality
        )
        n_candidates = dedup_ops.minhash_candidate_pairs(
            gated, "doc_id", "text",
            n_hashes=cfg.minhash_n_hashes, bands=cfg.minhash_bands,
            shingle_n=cfg.shingle_n, collapse_identical=True,
        ).count()

        return {
            "n_docs": n_docs,
            "n_base": n_base,
            "n_planted_dups": n_docs - n_base,
            "survivors": survivors,
            "removed": n_docs - survivors,
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(n_docs / wall, 1),
            "lm_train_sec": round(lm_train_sec, 2),
            "cc_rounds": stats.get("cc_rounds"),
            "planted_pairs_gate_eligible": n_eligible,
            "planted_pairs_missed": both_survive,
            "dup_recall": round(1.0 - both_survive / max(n_eligible, 1), 6),
            "lsh_candidate_pairs": n_candidates,
            "exec": {k: int(totals.get(k, 0)) for k in exec_keys},
            "stages": stage_rows,
        }

    # evidence block derived from the ACTUAL cfg instance so a future
    # _full_cfg edit cannot silently diverge from what is published
    cfg_doc = _full_cfg(TOTAL)
    out = {
        "version": 3,
        "cpus": CPUS,
        "config": {
            "bands": cfg_doc.minhash_bands,
            "n_hashes": cfg_doc.minhash_n_hashes,
            "shingle_n": cfg_doc.shingle_n,
            "fuzzy_threshold": cfg_doc.fuzzy_threshold,
            "min_quality": cfg_doc.min_quality,
            "lm_max_perplexity": cfg_doc.lm_max_perplexity,
            "span_unit": cfg_doc.span_unit,
            "span_k": cfg_doc.span_k,
            "dsir_frac": round(cfg_doc.dsir_k / TOTAL, 3),
            "host_cap": cfg_doc.host_cap,
            "dedup_lines_global": cfg_doc.dedup_lines_global,
            "global_line_min_chars": cfg_doc.global_line_min_chars,
            "mix_budget_frac": round(cfg_doc.mix_budget / TOTAL, 3),
            "mix_allocator": cfg_doc.mix_allocator,
            "mix_alpha": cfg_doc.mix_alpha,
            "stage_list_note": (
                "per-stage rows measured at the reduced MIX_STAGE_DOCS "
                "scale (cumulative-prefix runs cost ~#stages x a full "
                "run); the full-scale run is the wall/shuffle/no-OOM "
                "evidence; dup_recall measured at the prefix without "
                "the content-mutating stages (see script docstring)"
            ),
        },
        "full": None,
        "per_stage": None,
    }
    def _write():
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "mix_scale.json"), "w") as f:
            json.dump(out, f, indent=2)

    t_all = time.time()
    if STAGE_TOTAL and STAGE_TOTAL < TOTAL:
        # full-scale run FIRST (and checkpoint the json after it) so
        # the headline evidence survives a cut-short session; the
        # reduced-scale run then adds the per-stage breakdown only —
        # recall/candidate evidence comes from the full-scale run
        out["full"] = run_total(TOTAL, per_stage=False)
        out["total_bench_sec"] = round(time.time() - t_all, 1)
        _write()
        out["per_stage"] = run_total(STAGE_TOTAL, per_stage=True,
                                     extras=False)
    else:
        out["full"] = run_total(TOTAL, per_stage=True)
        out["per_stage"] = out["full"]
    out["total_bench_sec"] = round(time.time() - t_all, 1)
    _write()
    print(json.dumps(out))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
