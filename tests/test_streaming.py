"""Structured Streaming: windowed events + incremental index ingest."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from same_same_spark.streaming import stream_doc_ingest, stream_events_hourly
from same_same_spark.streaming.ingest import read_events_stream


def _write_events_json(path, events):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_stream_events_hourly_matches_batch(spark, tmp_path):
    events = [
        {"event_id": 1, "ts": "2024-01-01T00:10:00", "user_id": 1,
         "event_type": "click", "value": 2.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:40:00", "user_id": 2,
         "event_type": "click", "value": 4.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-01-01T01:10:00", "user_id": 1,
         "event_type": "view", "value": 1.0, "props": "{}"},
    ]
    src = str(tmp_path / "events")
    _write_events_json(src, events)

    stream = read_events_stream(spark, src)
    assert stream.isStreaming
    agg = stream_events_hourly(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_hourly")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["avg_value"])
        for r in spark.sql("SELECT * FROM ev_hourly").collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 01:00:00", "view")] == (1, 1.0)


def test_stream_doc_ingest_deltas_and_lineage(spark, tmp_path):
    docs = [
        {"doc_id": 1, "content": "alpha bravo charlie alpha"},
        {"doc_id": 2, "content": "bravo delta echo"},
    ]
    src = str(tmp_path / "docs")
    os.makedirs(src)
    with open(os.path.join(src, "d0.json"), "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")

    stream = (
        spark.readStream.schema("doc_id LONG, content STRING")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    idx = str(tmp_path / "idx")
    q = stream_doc_ingest(
        stream, idx, checkpoint_dir=str(tmp_path / "ckpt"), num_buckets=4
    )
    q.awaitTermination(120)

    deltas = os.listdir(os.path.join(idx, "_stage", "deltas"))
    assert len(deltas) >= 1
    staged = spark.read.parquet(
        os.path.join(idx, "_stage", "deltas", deltas[0])
    )
    got = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in staged.collect()
    }
    assert got[(1, "alpha")] == 2
    assert got[(2, "delta")] == 1
    assert set(staged.columns) == {"doc_id", "term", "tf", "dl", "bucket"}

    lineage = os.listdir(os.path.join(idx, "_lineage_stream"))
    assert len(lineage) == len(deltas)
    with open(os.path.join(idx, "_lineage_stream", sorted(lineage)[0])) as f:
        rec = json.load(f)
    assert rec["docs"] == 2 and rec["postings"] == len(got)
