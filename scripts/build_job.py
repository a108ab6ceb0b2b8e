#!/usr/bin/env python
"""spark-submit entrypoint for the index build (north star: the build
runs via ``spark-submit --py-files`` on a multi-executor cluster).

Usage::

    spark-submit --py-files same_same_spark.zip scripts/build_job.py \
        --input /path/to/corpus --format parquet \
        --out /path/to/index --buckets 4096 --groups 8

On a cluster, add ``--master`` / executor sizing flags to spark-submit;
the job code is identical. ``--buckets`` sizes shards
(≈ corpus_bytes / 256MB); ``--groups`` sets resume granularity.
Re-running with the same ``--out`` resumes from committed lineage.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="corpus table path/name")
    ap.add_argument("--format", default="parquet", help="parquet|iceberg|...")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--groups", type=int, default=None,
                    help="buckets per resumable group (default: all)")
    ap.add_argument("--id-col", default=None,
                    help="existing doc id column; default derives "
                         "xxhash64(repo,path,commit)")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--langs", default=None, help="comma list to keep")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from same_same_spark.corpus import doc_id_col
    from same_same_spark.index.build import build_index
    from same_same_spark.sources.corpus_table import read_corpus

    spark = SparkSession.builder.appName("same_same_build").getOrCreate()
    langs = args.langs.split(",") if args.langs else None
    docs = read_corpus(spark, args.input, fmt=args.format, langs=langs)
    id_col = args.id_col
    if id_col is None:
        docs = docs.withColumn("doc_id", doc_id_col())
        id_col = "doc_id"

    t0 = time.time()
    manifest = build_index(
        docs,
        args.out,
        id_col=id_col,
        text_col=args.text_col,
        num_buckets=args.buckets,
        group_size=args.groups,
    )
    wall = time.time() - t0
    print(json.dumps({
        "n_docs": manifest.n_docs,
        "n_terms": manifest.n_terms,
        "n_postings": manifest.n_postings,
        "avgdl": manifest.avgdl,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(manifest.n_docs / max(wall, 1e-9), 1),
        "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
