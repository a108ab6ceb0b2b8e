#!/usr/bin/env python
"""Parallel-build + merge evidence: shard the corpus, build each shard,
merge, and compare against a single monolithic build.

Writes BENCH/merge.json showing (a) the merge itself is a small
fraction of build cost (it re-registers groups, no shuffle, one stats
rebuild) and (b) the merged index is search-identical to the single
build — the numbers behind the parallel build strategy merge_job.py
deploys (summarized by hand in BENCH/BASELINE.md — update that table
when rerunning). Run with the machine otherwise idle.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = 500_000
SHARDS = 4
BUCKETS = 32
QUERIES = [
    (0, "import handler config parse"),
    (1, "func return error nil"),
    (2, "class def self init"),
]


def main() -> None:
    from pyspark.sql import functions as F

    from same_same_spark import get_spark
    from same_same_spark.corpus import doc_id_col, generate_corpus
    from same_same_spark.index.build import build_index
    from same_same_spark.index.merge import merge_indexes
    from same_same_spark.index.query import search_batch

    spark = get_spark(master="local[16]", shuffle_partitions=32)
    docs = generate_corpus(spark, N_DOCS).withColumn("doc_id", doc_id_col())
    base = tempfile.mkdtemp(prefix="mergebench-")
    quiet = lambda *_: None  # noqa: E731

    # JIT warm-up through the identical code path (host protocol)
    build_index(docs.limit(20_000), os.path.join(base, "warm"),
                id_col="doc_id", text_col="content",
                num_buckets=BUCKETS, log=quiet)

    t0 = time.time()
    mono = os.path.join(base, "mono")
    build_index(docs, mono, id_col="doc_id", text_col="content",
                num_buckets=BUCKETS, log=quiet)
    t_mono = time.time() - t0

    shard_dirs = []
    t_shards = []
    for s in range(SHARDS):
        d = os.path.join(base, f"shard{s}")
        t1 = time.time()
        build_index(
            docs.filter(F.pmod(F.col("doc_id"), F.lit(SHARDS)) == s), d,
            id_col="doc_id", text_col="content",
            num_buckets=BUCKETS, log=quiet,
        )
        t_shards.append(time.time() - t1)
        shard_dirs.append(d)

    t2 = time.time()
    merged = merge_indexes(spark, shard_dirs[0], shard_dirs[1:], log=quiet)
    t_merge = time.time() - t2

    def canon(rows):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in rows
        )

    got = canon(search_batch(spark, shard_dirs[0], QUERIES, k=10).collect())
    want = canon(search_batch(spark, mono, QUERIES, k=10).collect())
    identical = got == want

    result = {
        "n_docs": N_DOCS,
        "shards": SHARDS,
        "mono_build_sec": round(t_mono, 2),
        "shard_build_sec": [round(t, 2) for t in t_shards],
        "max_shard_build_sec": round(max(t_shards), 2),
        "merge_sec": round(t_merge, 2),
        "merge_frac_of_mono": round(t_merge / t_mono, 3),
        "merged_n_docs": merged.n_docs,
        "search_identical_to_mono": identical,
    }
    print(json.dumps(result))
    assert identical, "merged search diverged from monolithic build"

    out = os.path.join(REPO, "BENCH", "merge.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
