#!/usr/bin/env python
"""End-to-end demo: everything a same-same user does, on Spark.

Runs against the sf0.001 test tables (~500 docs) in under a minute::

    python examples/pipeline_demo.py [sf_dir]

1. build the compressed posting index (resumable, per-group lineage),
2. BM25 top-k through the index + the same query via the API façade,
3. hybrid + temporal + filtered search,
4. prepare a training corpus: quality gate → dedup → decontamination →
   stratified mix → splits,
5. profile the result (dataset-card stats).
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from pyspark.sql import functions as F

    from same_same_spark import get_spark
    from same_same_spark.api import SameSameSpark
    from same_same_spark.index.build import build_index
    from same_same_spark.index.query import search_batch
    from same_same_spark.pipeline.mix import MixConfig, mix_report
    from same_same_spark.pipeline.profile import corpus_profile

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # 1. index build
    idx = os.path.join(tempfile.mkdtemp(prefix="demo-"), "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)

    # 2. retrieval: raw index API and the façade
    print("-- BM25 top-5 (index) --")
    for r in search_batch(
        spark, idx, [(0, "fast merge join sort")], k=5
    ).collect():
        print(f"  #{r['rank']} doc {r['doc_id']}  score={r['score']:.4f}")

    api = SameSameSpark(docs, id_col="doc_id", text_col="text",
                        index_dir=idx)

    # 3. hybrid / filtered search
    print("-- filtered search (lang = 'en', global corpus stats) --")
    flt = {"lang": {"eq": "en"}}
    for r in api.advanced_search(
        "vector table scan", filters=flt, k=3, global_stats=True
    ).collect():
        print(f"  doc {r['doc_id']}  score={r['score']:.4f}")

    # 4. training-corpus preparation (one lazy plan per stage count)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    cfg = MixConfig(
        min_quality=0.7,
        exact=True,
        fuzzy_threshold=0.9,
        fractions={"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25},
        default_fraction=0.25,
        test_frac=0.1, val_frac=0.1, seed="demo",
    )
    print("-- training-mix stage counts --")
    for stage, n in mix_report(
        docs.select("doc_id", "text", "lang"), cfg, eval_df
    ).items():
        print(f"  {stage:12s} {n}")

    # 5. dataset card
    print("-- corpus profile --")
    for r in corpus_profile(docs).orderBy("stratum").collect():
        print(
            f"  {r['stratum']}: {r['n_docs']} docs, "
            f"{r['total_tokens']} tokens, p50={r['p50_tokens']:.0f}, "
            f"dup_rate={r['dup_rate']:.3f}"
        )

    # 6. the same card maintained INCREMENTALLY: fold two batches and
    # a delete into the persisted store, read the card from state alone
    from pyspark.sql import functions as F

    from same_same_spark.pipeline.profile import (
        profile_store_card,
        profile_store_init,
        profile_store_update,
    )

    store = tempfile.mkdtemp(prefix="demo_pstore_")
    profile_store_init(spark, store)
    half = docs.select("doc_id", "text", "lang")
    profile_store_update(spark, store, half.filter(F.col("doc_id") % 2 == 0),
                         log=lambda *_: None)
    profile_store_update(spark, store, half.filter(F.col("doc_id") % 2 == 1),
                         log=lambda *_: None)
    profile_store_update(spark, store, half.filter(F.col("doc_id") % 10 == 0),
                         delete=True, log=lambda *_: None)
    print("-- incremental card (2 appends + 1 delete, no rescan) --")
    for r in profile_store_card(spark, store).orderBy("stratum").collect():
        print(
            f"  {r['stratum']}: {r['n_docs']} docs, "
            f"{r['total_tokens']} tokens, p50={r['p50_tokens']:.0f}"
        )

    # 7. graph ANN: HNSW top-3 for one query vector — candidates from
    # per-partition graphs, exact cosine re-rank (rank-identical to the
    # brute scan whenever candidates cover the true top-k)
    from same_same_spark.pipeline.hnsw import hnsw_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    print("-- HNSW top-3 (query = vec 0) --")
    for r in hnsw_topk(emb, [(0, qvec)], k=3).orderBy("rank").collect():
        print(f"  #{r['rank']} vec {r['vec_id']}  cos={r['score']:.4f}")

    # 8. exact substring overlap: longest common substring per near-dup
    # candidate pair (suffix automaton)
    from same_same_spark.pipeline.dedup import minhash_dedup_pairs
    from same_same_spark.pipeline.lcs import lcs_pairs

    cand = minhash_dedup_pairs(docs, threshold=0.9).select("id_a", "id_b")
    top = (
        lcs_pairs(docs, cand)
        .orderBy(F.desc("lcs_len"), "id_a", "id_b")
        .limit(3)
        .collect()
    )
    print("-- longest shared substrings among near-dup pairs --")
    for r in top:
        print(
            f"  docs {r['id_a']}/{r['id_b']}: {r['lcs_len']} chars "
            f"(a@{r['a_start']}, b@{r['b_start']})"
        )

    # 9. passage retrieval: fixed-size overlapping windows scored with
    # chunk-level BM25 — finds the concentrated match inside a doc
    from same_same_spark.operators.chunk import passage_topk

    print("-- top passages for 'fast merge join sort' --")
    hits = passage_topk(
        docs, [(0, "fast merge join sort")], k=3, size=120, overlap=30
    )
    for r in hits.orderBy("rank").collect():
        print(
            f"  #{r['rank']} doc {r['doc_id']} chunk {r['chunk_id']}"
            f"  score={r['score']:.4f}"
        )

    # 10. LM quality scoring: CCNet-style bigram perplexity against a
    # reference slice — the score the mix pipeline's lm gate thresholds
    from same_same_spark.pipeline.lm import lm_perplexity, train_bigram_lm

    model = train_bigram_lm(docs.filter(F.col("doc_id") % 10 == 0))
    print("-- highest/lowest-perplexity docs (bigram LM) --")
    scored = lm_perplexity(docs, model).filter("avg_logp IS NOT NULL")
    for r in scored.orderBy(F.desc("perplexity")).limit(2).collect():
        print(f"  doc {r['doc_id']}  ppl={r['perplexity']:.1f}  (worst)")
    for r in scored.orderBy("perplexity").limit(2).collect():
        print(f"  doc {r['doc_id']}  ppl={r['perplexity']:.1f}  (best)")

    # 11. delete-heavy ANN maintenance: tombstone two vectors, then
    # edge-repair the persisted graph store — dead nodes leave the
    # adjacency, beams shrink back, deleted ids may re-append
    from same_same_spark.pipeline.hnsw import (
        build_hnsw_store,
        delete_from_hnsw_store,
        hnsw_topk_persisted,
        repair_hnsw_store,
    )

    store_dir = tempfile.mkdtemp() + "/hnsw"
    build_hnsw_store(emb, store_dir, n_graphs=2)
    delete_from_hnsw_store(spark, store_dir, [0, 7])
    m = repair_hnsw_store(spark, store_dir)
    print(
        f"-- HNSW store after delete+repair: {m['n_vectors']} live "
        f"vectors, tombstones cleared --"
    )
    for r in (
        hnsw_topk_persisted(spark, store_dir, [(0, qvec)], k=3)
        .orderBy("rank")
        .collect()
    ):
        print(f"  #{r['rank']} vec {r['vec_id']}  cos={r['score']:.4f}")

    # 12. compressed vectors: IVF-PQ store, ADC probe + exact re-rank
    from same_same_spark.pipeline.ann import centroids_by_label
    from same_same_spark.pipeline.pq import build_pq_store, pq_topk_persisted

    pq_dir = tempfile.mkdtemp() + "/pq"
    cents = centroids_by_label(emb)
    build_pq_store(emb, pq_dir, centroids=cents, m=8, n_codes=8)
    print("-- IVF-PQ probe (compressed codes) + exact re-rank --")
    for r in (
        pq_topk_persisted(
            spark, pq_dir, [(0, qvec)], k=3, nprobe=3,
            refine_df=emb, refine_factor=4,
        )
        .orderBy("rank")
        .collect()
    ):
        print(f"  #{r['rank']} vec {r['vec_id']}  cos={r['score']:.4f}")

    # 13. event-time: sessionize + as-of join + RRF fusion
    from same_same_spark.operators.events import asof_join, sessionize
    from same_same_spark.operators.hybrid import rrf_fuse

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    sess = sessionize(ev, "user_id", "ts", 21600, order_cols=["event_id"])
    n_sessions = sess.select("user_id", "session_idx").distinct().count()
    clicks = ev.filter("event_type = 'click'")
    purch = (
        ev.filter("event_type = 'purchase'")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("rid"))
    )
    joined = asof_join(clicks, purch, on="user_id", right_cols=["rid"])
    matched = joined.filter("matched_rid IS NOT NULL").count()
    print(
        f"-- event time: {n_sessions} sessions (6h gap); "
        f"{matched}/{clicks.count()} clicks matched a prior purchase --"
    )
    from same_same_spark.bm25 import score_queries
    from same_same_spark.operators.tfidf import tfidf_topk

    q = [(0, "fast merge join sort")]
    fused = rrf_fuse(
        [
            score_queries(
                docs, q, k=10, id_col="doc_id", text_col="text"
            ).select("query_id", "doc_id", "rank"),
            tfidf_topk(
                docs, q, k=10, id_col="doc_id", text_col="text"
            ).select("query_id", "doc_id", "rank"),
        ],
        k=3,
    )
    print("-- RRF fusion of BM25 + TF-IDF --")
    for r in fused.orderBy("rank").collect():
        print(f"  #{r['rank']} doc {r['doc_id']}  rrf={r['score']:.5f}")

    # 14. interval join (the stream-stream shape), per-domain caps, OPQ
    from same_same_spark.operators.events import interval_join
    from same_same_spark.pipeline.sampling import sample_host_cap

    pairs = interval_join(
        clicks.select("event_id", "user_id", "ts"),
        purch.withColumnRenamed("rid", "event_id"),
        on="user_id", lookback_seconds=21600, right_cols=["event_id"],
    ).count()
    hosts = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 3 == 0, "hub.example.com").otherwise(
                F.concat(F.lit("s"), (F.col("doc_id") % 9).cast("string"),
                         F.lit(".example.org"))
            ),
            F.lit("/"), F.col("doc_id").cast("string"),
        ),
    )
    capped = sample_host_cap(hosts, 5, seed="demo")
    print(
        f"-- interval join: {pairs} (click,purchase) pairs in 6h; "
        f"host cap 5 docs/domain: {docs.count()} -> {capped.count()} --"
    )

    import numpy as np

    from same_same_spark.pipeline import opq as opq_ops

    rng = np.random.RandomState(1)
    sample = rng.randn(128, 2) @ rng.randn(2, 8) + 0.1 * rng.randn(128, 8)
    R, books = opq_ops.train_opq(sample, m=2, n_codes=4, n_iter=3, seed=2)
    e_pq = opq_ops.quantization_error(
        sample, np.eye(8).tolist(),
        [[[float(v) for v in c] for c in cb] for cb in books],
    )
    e_opq = opq_ops.quantization_error(sample, R, books)
    print(f"-- OPQ rotation: quantization MSE {e_pq:.3f} -> {e_opq:.3f} --")

    # geo: nearest events + a grid heatmap over hash-derived points
    from same_same_spark.operators import geo as geo_ops

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    lat, lon = geo_ops.synth_point_cols(F.col("event_id"))
    pts = ev.select(
        F.col("event_id").alias("id"), lat.alias("lat"), lon.alias("lon")
    )
    near = geo_ops.geo_distance_topk(pts, 48.8566, 2.3522, 3).collect()
    cells = geo_ops.geohash_grid(pts, 2, 3).collect()
    print(
        "-- geo: 3 nearest to Paris "
        + ", ".join(f"{r['id']}@{r['distance_km']:.0f}km" for r in near)
        + " | top geohash cells "
        + ", ".join(f"{r['cell']}({r['doc_count']})" for r in cells)
        + " --"
    )

    # language-mixture sampling: temperature vs UniMax budgets
    from same_same_spark.pipeline import sampling as sampling_ops

    for allocator in ("temperature", "unimax"):
        alloc = sampling_ops.mix_allocation(
            docs, 250.0, allocator=allocator, alpha=0.3
        )
        rates = ", ".join(f"{s}={r:.2f}" for s, _t, r in alloc)
        print(f"-- {allocator} mix rates (budget 250): {rates} --")

    # federated search: two half indexes, exact global stats
    from same_same_spark.index.query import search_federated

    fed_base = tempfile.mkdtemp(prefix="demo-fed-")
    for name, part in (
        ("even", docs.filter(F.col("doc_id") % 2 == 0)),
        ("odd", docs.filter(F.col("doc_id") % 2 == 1)),
    ):
        build_index(
            part, f"{fed_base}/{name}", id_col="doc_id", text_col="text",
            num_buckets=2, log=lambda *_: None,
        )
    fed = search_federated(
        spark, [f"{fed_base}/even", f"{fed_base}/odd"],
        [(0, "fast merge join sort")], k=3,
    ).collect()
    print(
        "-- federated (2 indexes, exact global stats): "
        + ", ".join(f"#{r['rank']} doc {r['doc_id']}" for r in fed)
        + " --"
    )

if __name__ == "__main__":
    main(*sys.argv[1:])
