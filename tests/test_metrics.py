"""Execution metrics (metrics.py): per-stage and per-partition
shuffle/input counters read from Spark's AppStatusStore, and their
emission in the build's lineage records (north rule: docs/sec,
postings/sec, shuffle bytes per partition)."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from same_same_spark.metrics import MetricsWindow, stage_metrics


def test_metrics_window_captures_shuffle(spark):
    with MetricsWindow(spark) as mw:
        (
            spark.range(200_000)
            .withColumn("k", F.col("id") % 97)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
    totals = mw.totals()
    assert totals["shuffle_write_bytes"] > 0
    assert totals["shuffle_read_bytes"] > 0
    assert totals["num_complete_tasks"] > 0
    # per-partition rows for the heaviest stage, partition-indexed
    tasks = mw.task_detail()
    assert tasks and all("shuffle_write_bytes" in t for t in tasks)
    assert [t["partition"] for t in tasks] == sorted(
        t["partition"] for t in tasks
    )
    # everything is plain-JSON (lineage records are json.dump'd)
    json.dumps({"stages": mw.stages(), "tasks": tasks})


def test_metrics_window_excludes_prior_stages(spark):
    spark.range(10_000).groupBy((F.col("id") % 3).alias("k")).count().collect()
    before = {s["stage_id"] for s in stage_metrics(spark)}
    with MetricsWindow(spark) as mw:
        spark.range(1_000).count()
    assert all(s["stage_id"] not in before for s in mw.stages())


def test_build_lineage_carries_exec_metrics(spark, tmp_path):
    from same_same_spark.index.build import build_index

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    out = str(tmp_path / "idx")
    build_index(docs, out, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    recs = sorted(glob.glob(os.path.join(out, "_lineage", "group-*.json")))
    assert recs
    with open(recs[0]) as f:
        rec = json.load(f)
    # throughput metrics (pre-existing) + execution counters (new)
    assert rec["docs_per_sec"] > 0 and rec["postings_per_sec"] > 0
    assert rec["exec"]["shuffle_write_bytes"] > 0
    assert rec["exec"]["num_complete_tasks"] > 0
    parts = rec["exec_partitions"]
    assert parts and {p["partition"] for p in parts} == set(
        range(len(parts))
    )


def test_skew_summary_in_build_lineage(spark, tmp_path):
    from same_same_spark.index.build import build_index
    from same_same_spark.metrics import skew_summary

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    out = str(tmp_path / "idx")
    build_index(docs, out, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    rec = json.load(
        open(sorted(glob.glob(os.path.join(out, "_lineage",
                                           "group-*.json")))[0])
    )
    sk = rec["skew"]
    assert sk["n_partitions"] == len(rec["exec_partitions"])
    # xxhash64 bucketing spreads a uniform corpus evenly: the hot
    # partition stays within a small factor of the median
    assert 1.0 <= sk["input_max_over_median"] < 3.0
    assert skew_summary([]) == {}


def test_skew_summary_uses_lower_median():
    from same_same_spark.metrics import skew_summary

    rows = [
        {"partition": 0, "executor_run_time_ms": 1,
         "shuffle_read_bytes": 0, "input_records": 1},
        {"partition": 1, "executor_run_time_ms": 100,
         "shuffle_read_bytes": 0, "input_records": 100},
    ]
    sk = skew_summary(rows)
    # upper-middle would pick the max and report 1.0 — fully blind
    assert sk["runtime_max_over_median"] == 100.0
    assert sk["shuffle_read_max_over_median"] == 1.0  # all-zero guard
