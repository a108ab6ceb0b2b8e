#!/usr/bin/env python
"""Training-pipeline scale smoke (VERDICT r3 #3): run
``prepare_training_corpus`` with quality gate + exact dedup + fuzzy
(MinHash-LSH → connected components) dedup on ≥5M documents with
realistic duplication, and record the evidence a 100-TB operator needs:
wall time, shuffle bytes (from the executor status store), CC
iteration count, and the peak LSH candidate-pair count.

Corpus: ``generate_corpus(n_base)`` (deterministic synthetic code
docs) ∪ exact copies of every 8th doc (new ids) ∪ near-copies of every
8th+1 doc (one appended token — caught by shingle MinHash, not by
sha). ~25% duplication, the shape a crawled corpus actually has.

Writes BENCH/mix_scale.json. Run with the machine otherwise idle;
MIX_SCALE_DOCS overrides the total (default 5_000_000).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOTAL = int(os.environ.get("MIX_SCALE_DOCS", "5000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 16 hashes × 4 bands of 4 rows: per-band collision probability is
# jaccard^4, so random cross-doc similarity (~0.2-0.4 for same-language
# code) produces ~0.2%-2.5% of the false candidates the oracle-pinned
# 8×2 banding does, while planted near-dups (jaccard ≈ 1) still collide
# with probability ≥ 0.999 across 4 bands — measured as `dup_recall`
# below, not assumed. 8×2 stays the CORRECTNESS setting (recall exactly
# 1, pinned in test_dedup); 4×4 is the 100-TB throughput setting.
BANDS = int(os.environ.get("MIX_SCALE_BANDS", "4"))


def main() -> None:
    from pyspark.sql import functions as F

    from same_same_spark import get_spark
    from same_same_spark.corpus import doc_id_col, generate_corpus
    from same_same_spark.metrics import MetricsWindow
    from same_same_spark.pipeline import dedup as dedup_ops
    from same_same_spark.pipeline.mix import MixConfig, prepare_training_corpus

    spark = get_spark(
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS * 2, TOTAL // 20000),
    )
    n_base = int(TOTAL / 1.25)
    base = generate_corpus(spark, n_base, seed=7).select(
        doc_id_col(), F.col("content").alias("text")
    )
    # duplicate-id derivation: fresh deterministic ids for the copies
    # (xxhash of the original id + a tag — 64-bit collision odds are
    # negligible at this scale, and exact dedup's min-id rule is
    # indifferent to which member survives)
    exact_dups = base.filter(F.pmod(F.col("doc_id"), F.lit(8)) == 0).select(
        F.xxhash64("doc_id", F.lit("exact-dup")).alias("doc_id"), "text"
    )
    near_dups = base.filter(F.pmod(F.col("doc_id"), F.lit(8)) == 1).select(
        F.xxhash64("doc_id", F.lit("near-dup")).alias("doc_id"),
        F.concat("text", F.lit(" trailingmarker")).alias("text"),
    )
    # materialize to parquet (untimed): the pipeline's joins re-evaluate
    # their input many times — a real corpus is a parquet scan, not a
    # generator expression, so the timed window should measure the
    # pipeline against the same shape
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="mix_scale_")
    corpus_path = os.path.join(scratch, "docs.parquet")
    base.unionByName(exact_dups).unionByName(near_dups).write.mode(
        "overwrite"
    ).parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    n_docs = docs.count()

    cfg = MixConfig(
        min_quality=0.05,
        exact=True,
        fuzzy_threshold=0.9,
        minhash_n_hashes=16,
        minhash_bands=BANDS,
        shingle_n=3,
        max_cc_iter=30,
    )

    # peak candidate count — the LSH self-join's output BEFORE exact
    # Jaccard verification, measured outside the timed window (it is
    # the scale-killer to watch: bounded-bucket joins keep it linear
    # in true-duplicate count, not quadratic in corpus size)
    gated = docs.filter(
        __import__(
            "same_same_spark.pipeline.textqc", fromlist=["quality_cols"]
        ).quality_cols("text")["quality_score"]
        >= cfg.min_quality
    )
    t0 = time.time()
    n_candidates = dedup_ops.minhash_candidate_pairs(
        gated, "doc_id", "text",
        n_hashes=cfg.minhash_n_hashes, bands=cfg.minhash_bands,
        shingle_n=cfg.shingle_n,
    ).count()
    t_candidates = time.time() - t0

    stats: dict = {}
    with MetricsWindow(spark) as mw:
        t0 = time.time()
        survivors = prepare_training_corpus(docs, cfg, stats=stats).count()
        wall = time.time() - t0
    totals = mw.totals()

    # dup_recall measured on the PLANTED pairs only (untimed recompute):
    # a pair counts as recalled iff it collapsed — i.e. NOT both members
    # survive. Restricted to pairs whose BOTH members pass the quality
    # gate, so gate drops (and any natural base-corpus dedup) can't
    # inflate the number past what fuzzy/exact dedup actually did.
    from same_same_spark.pipeline import textqc as textqc_ops

    surv_ids = prepare_training_corpus(docs, cfg).select("doc_id")
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
    passed = docs.filter(
        textqc_ops.quality_cols("text")["quality_score"] >= cfg.min_quality
    ).select("doc_id")
    eligible = pair_map.join(
        passed.select(F.col("doc_id").alias("orig_id")), "orig_id"
    ).join(passed.select(F.col("doc_id").alias("dup_id")), "dup_id")
    n_eligible = eligible.count()
    both_survive = (
        eligible.join(
            surv_ids.select(F.col("doc_id").alias("orig_id")), "orig_id"
        )
        .join(surv_ids.select(F.col("doc_id").alias("dup_id")), "dup_id")
        .count()
    )

    n_planted = n_docs - n_base
    out = {
        "n_docs": n_docs,
        "n_base": n_base,
        "n_planted_dups": n_planted,
        "survivors": survivors,
        "removed": n_docs - survivors,
        "planted_pairs_gate_eligible": n_eligible,
        "planted_pairs_missed": both_survive,
        "dup_recall": round(1.0 - both_survive / max(n_eligible, 1), 6),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "cc_rounds": stats.get("cc_rounds"),
        "max_cc_iter": cfg.max_cc_iter,
        "lsh_candidate_pairs": n_candidates,
        "candidate_count_sec": round(t_candidates, 2),
        "cpus": CPUS,
        "exec": {
            k: totals.get(k)
            for k in (
                "shuffle_write_bytes",
                "shuffle_read_bytes",
                "memory_spill_bytes",
                "disk_spill_bytes",
                "input_bytes",
            )
        },
        "config": {
            "min_quality": cfg.min_quality,
            "fuzzy_threshold": cfg.fuzzy_threshold,
            "n_hashes": cfg.minhash_n_hashes,
            "bands": cfg.minhash_bands,
            "shingle_n": cfg.shingle_n,
        },
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "mix_scale.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
