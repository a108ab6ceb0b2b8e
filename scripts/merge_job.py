#!/usr/bin/env python
"""spark-submit entrypoint for merging independently-built indexes.

The companion to ``build_job.py`` for the parallel build strategy:
shard a huge corpus by any predicate (day, repo range, partition
glob), run one ``build_job.py`` per shard CONCURRENTLY (separate
clusters or queued jobs), then combine the results::

    spark-submit --py-files same_same_spark.zip scripts/merge_job.py \
        --dest /indexes/full --src /indexes/day1 /indexes/day2 ...

The merge is a per-group, shuffle-free parquet copy plus one stats
rebuild and an atomic manifest flip; post-merge search is rank- and
score-identical to a single build over the union corpus
(tests/test_merge.py). Interrupted merges are safe to re-run.
Sources must share bucket count / tokenizer / BM25 params and be
compacted (no tombstones or pending deltas); doc ids must be disjoint
across participants — true by construction for partition builds.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dest", required=True,
                    help="destination index (sources are merged INTO "
                         "it; its own docs stay; must NOT be listed "
                         "under --src)")
    ap.add_argument("--src", required=True, nargs="+",
                    help="source index directories (read-only; each "
                         "listed once)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from same_same_spark.index.merge import merge_indexes

    spark = SparkSession.builder.appName("same_same_merge").getOrCreate()
    t0 = time.time()
    manifest = merge_indexes(spark, args.dest, args.src)
    wall = time.time() - t0
    print(json.dumps({
        "n_docs": manifest.n_docs,
        "n_terms": manifest.n_terms,
        "n_postings": manifest.n_postings,
        "groups": len(manifest.groups),
        "wall_sec": round(wall, 2),
        "dest": args.dest,
        "merged": args.src,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
