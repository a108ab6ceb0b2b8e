"""session_window_agg: batch differential vs the lag/sum sessionizer,
plus an actual Structured Streaming run across micro-batches."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from same_same_spark.operators.events import sessionize
from same_same_spark.streaming.sessions import session_window_agg


def test_session_window_matches_sessionize_on_events(spark, events):
    """The native session_window and the lag/sum sessionizer must cut
    the SAME sessions on the real events table (boundary semantics
    pinned: diff == gap extends, diff > gap splits)."""
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    gap = 21600
    a = session_window_agg(
        ev, "user_id", "ts", gap, value_col="value", watermark=None
    )
    got_a = {
        (r["user_id"], str(r["session_start"])): (
            r["n_events"], str(r["last_event_ts"]), round(r["sum_value"], 6)
        )
        for r in a.collect()
    }
    s = sessionize(ev, "user_id", "ts", gap, order_cols=["event_id"])
    b = s.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("last_event_ts"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
    got_b = {
        (r["user_id"], str(r["session_start"])): (
            r["n_events"], str(r["last_event_ts"]), round(r["sum_value"], 6)
        )
        for r in b.collect()
    }
    assert got_a == got_b
    assert len(got_a) > events.select("user_id").distinct().count()


def test_session_window_gap_boundary(spark):
    rows = [
        ("u", "2024-01-01T00:00:00"),
        ("u", "2024-01-01T00:10:00"),  # exactly gap -> same session
        ("u", "2024-01-01T00:20:01"),  # gap + 1s -> new session
    ]
    df = spark.createDataFrame(rows, "k STRING, s STRING").select(
        "k", F.col("s").cast("timestamp").alias("ts")
    )
    out = session_window_agg(df, "k", "ts", 600, watermark=None)
    got = sorted((str(r["session_start"]), r["n_events"])
                 for r in out.collect())
    assert got == [("2024-01-01 00:00:00", 2), ("2024-01-01 00:20:01", 1)]


def test_session_window_streaming_merges_across_batches(spark, tmp_path):
    """Two micro-batches; the second extends a session opened by the
    first AND adds a brand-new one — the merged result must equal the
    batch run over the union."""
    src = str(tmp_path / "sev")
    os.makedirs(src)
    b1 = [
        {"k": "u", "s": "2024-01-01T00:00:00", "v": 1.0},
        {"k": "u", "s": "2024-01-01T00:05:00", "v": 2.0},
        {"k": "w", "s": "2024-01-01T02:00:00", "v": 5.0},
    ]
    b2 = [
        {"k": "u", "s": "2024-01-01T00:09:00", "v": 3.0},  # extends
        {"k": "u", "s": "2024-01-01T09:00:00", "v": 4.0},  # new session
    ]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for e in b1:
            f.write(json.dumps(e) + "\n")
    with open(os.path.join(src, "b2.json"), "w") as f:
        for e in b2:
            f.write(json.dumps(e) + "\n")

    def prep(df):
        return df.select(
            "k", F.col("s").cast("timestamp").alias("ts"), "v"
        )

    stream = (
        spark.readStream.schema("k STRING, s STRING, v DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    agg = session_window_agg(prep(stream), "k", "ts", 600, value_col="v")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_merge")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], str(r["session_start"])): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sess_merge").collect()
    }
    batch = session_window_agg(
        prep(spark.read.schema("k STRING, s STRING, v DOUBLE").json(src)),
        "k", "ts", 600, value_col="v", watermark=None,
    )
    exp = {
        (r["k"], str(r["session_start"])): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == exp
    assert got[("u", "2024-01-01 00:00:00")] == (3, 6.0)
    assert got[("u", "2024-01-01 09:00:00")] == (1, 4.0)
    assert got[("w", "2024-01-01 02:00:00")] == (1, 5.0)
