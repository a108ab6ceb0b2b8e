"""Event-time operators: as-of join + sessionization.

asof_join is differential-tested against pandas.merge_asof (an
independent, widely-trusted implementation) on randomized data, plus
hand-built edge cases for ties, tolerance, forward direction, and
keys with no right rows. sessionize is checked against a pure-Python
reference fold.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from same_same_spark.operators.events import asof_join, sessionize

T0 = datetime(2024, 1, 1)


def _ts(minutes: float) -> datetime:
    return T0 + timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def left_right(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts(10)),
            (2, "u", _ts(20)),
            (3, "u", _ts(5)),
            (4, "v", _ts(15)),
            (5, "w", _ts(30)),  # key with no right rows
        ],
        "event_id LONG, user STRING, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (100, "u", _ts(8), 1.0),
            (101, "u", _ts(20), 2.0),  # exact tie with left event 2
            (102, "u", _ts(25), 3.0),
            (103, "v", _ts(1), 4.0),
        ],
        "rid LONG, user STRING, ts TIMESTAMP, amount DOUBLE",
    )
    return left, right


def test_asof_backward_basic(left_right):
    left, right = left_right
    out = asof_join(
        left, right, on="user", right_cols=["rid", "amount"],
        right_tiebreak="rid",
    )
    got = {r["event_id"]: (r["matched_rid"], r["matched_amount"])
           for r in out.collect()}
    assert got == {
        1: (100, 1.0),   # 8 <= 10
        2: (101, 2.0),   # inclusive: right at exactly 20 matches
        3: (None, None),  # nothing at or before 5
        4: (103, 4.0),
        5: (None, None),  # key w has no right rows
    }
    assert out.count() == left.count()  # left-outer: every left row once


def test_asof_forward(left_right):
    left, right = left_right
    out = asof_join(
        left, right, on="user", right_cols=["rid"], direction="forward",
        right_tiebreak="rid",
    )
    got = {r["event_id"]: r["matched_rid"] for r in out.collect()}
    assert got == {1: 101, 2: 101, 3: 100, 4: None, 5: None}


def test_asof_tolerance(left_right):
    left, right = left_right
    out = asof_join(
        left, right, on="user", right_cols=["rid"],
        tolerance_seconds=3 * 60, right_tiebreak="rid",
    )
    got = {r["event_id"]: r["matched_rid"] for r in out.collect()}
    # event 1 at t=10 matches right at t=8 (2 min <= 3 min); the rest
    # either match exactly (0 min) or had no match at all.
    assert got == {1: 100, 2: 101, 3: None, 4: None, 5: None}
    tight = asof_join(
        left, right, on="user", right_cols=["rid"],
        tolerance_seconds=60, right_tiebreak="rid",
    )
    got2 = {r["event_id"]: r["matched_rid"] for r in tight.collect()}
    assert got2[1] is None and got2[2] == 101


def test_asof_equal_ts_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(10))], "event_id LONG, k STRING, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [(7, "k", _ts(10)), (9, "k", _ts(10)), (8, "k", _ts(10))],
        "rid LONG, k STRING, ts TIMESTAMP",
    )
    back = asof_join(left, right, on="k", right_cols=["rid"],
                     right_tiebreak="rid")
    assert back.collect()[0]["matched_rid"] == 9  # greatest tiebreak
    fwd = asof_join(left, right, on="k", right_cols=["rid"],
                    direction="forward", right_tiebreak="rid")
    assert fwd.collect()[0]["matched_rid"] == 7  # smallest tiebreak


def test_asof_differential_vs_pandas(spark):
    """Randomized differential vs pandas.merge_asof, both directions."""
    import random

    rng = random.Random(42)
    lrows = [
        (i, f"k{rng.randrange(5)}", _ts(rng.randrange(10_000) / 10))
        for i in range(300)
    ]
    # distinct (key, ts) per right row so no-tiebreak semantics are
    # well-defined in both engines
    seen = set()
    rrows = []
    for j in range(200):
        k, m = f"k{rng.randrange(5)}", rng.randrange(10_000)
        if (k, m) in seen:
            continue
        seen.add((k, m))
        rrows.append((1000 + j, k, _ts(m / 10), float(j)))
    left = spark.createDataFrame(
        lrows, "event_id LONG, k STRING, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        rrows, "rid LONG, k STRING, ts TIMESTAMP, amount DOUBLE"
    )
    lpd = pd.DataFrame(lrows, columns=["event_id", "k", "ts"])
    rpd = pd.DataFrame(rrows, columns=["rid", "k", "ts", "amount"])
    for direction in ("backward", "forward"):
        got = asof_join(
            left, right, on="k", right_cols=["rid", "amount"],
            direction=direction,
        ).toPandas().sort_values("event_id").reset_index(drop=True)
        exp = pd.merge_asof(
            lpd.sort_values("ts"), rpd.sort_values("ts"),
            on="ts", by="k", direction=direction, suffixes=("", "_r"),
        ).sort_values("event_id").reset_index(drop=True)
        assert list(got["matched_rid"].fillna(-1).astype(int)) == list(
            exp["rid"].fillna(-1).astype(int)
        ), direction


def test_asof_rejects_bad_args(left_right):
    left, right = left_right
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="user", direction="nearest")
    with pytest.raises(ValueError, match="clash"):
        asof_join(left, right, on="user", right_cols=["rid"], prefix="")


def test_asof_plan_single_exchange(left_right):
    """The whole as-of is ONE shuffle: exactly one Exchange on the key
    (plus AQE reads), no Join node at all."""
    left, right = left_right
    out = asof_join(left, right, on="user", right_cols=["rid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def _sessions_py(rows, gap_s):
    """Reference fold: rows = [(key, ts, id)] -> {id: session_idx}."""
    out = {}
    bykey: dict[str, list] = {}
    for k, ts, i in rows:
        bykey.setdefault(k, []).append((ts, i))
    for k, evs in bykey.items():
        evs.sort()
        idx, prev = 0, None
        for ts, i in evs:
            if prev is None or (ts - prev).total_seconds() > gap_s:
                idx += 1
            out[i] = idx
            prev = ts
    return out


def test_sessionize_gaps_and_boundary(spark):
    rows = [
        ("u", _ts(0), 1),
        ("u", _ts(30), 2),    # exactly the 30-min gap → SAME session
        ("u", _ts(61), 3),    # 31 min → new session
        ("u", _ts(62), 4),
        ("v", _ts(0), 5),
    ]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, id LONG")
    out = sessionize(df, "k", "ts", gap_seconds=1800, order_cols=["id"])
    got = {r["id"]: r["session_idx"] for r in out.collect()}
    assert got == _sessions_py(rows, 1800) == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_random_differential(spark):
    import random

    rng = random.Random(7)
    rows = [
        (f"k{rng.randrange(8)}", _ts(rng.randrange(5000)), i)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, id LONG")
    out = sessionize(df, "k", "ts", gap_seconds=600, order_cols=["id"])
    got = {r["id"]: r["session_idx"] for r in out.collect()}
    # ts collisions within a key are possible; the reference sorts by
    # (ts, id) exactly like order_cols=["id"]
    assert got == _sessions_py(rows, 600)
    # session indexes are dense 1..n per key
    per_key = (
        out.groupBy("k")
        .agg(F.max("session_idx").alias("mx"),
             F.countDistinct("session_idx").alias("n"))
        .collect()
    )
    for r in per_key:
        assert r["mx"] == r["n"]


def test_asof_null_keys_and_timestamps(spark):
    """SQL semantics: NULL keys and NULL timestamps never match, in
    either direction (DuckDB ASOF / pandas drop them the same way)."""
    left = spark.createDataFrame(
        [(1, None, _ts(10)), (2, "k", None), (3, "k", _ts(10))],
        "event_id LONG, k STRING, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(7, "k", _ts(5)), (8, None, _ts(1)), (9, "k", None)],
        "rid LONG, k STRING, ts TIMESTAMP",
    )
    for direction in ("backward", "forward"):
        out = {r["event_id"]: r["matched_rid"]
               for r in asof_join(left, right, on="k", right_cols=["rid"],
                                  direction=direction,
                                  right_tiebreak="rid").collect()}
        assert out[1] is None   # null left key
        assert out[2] is None   # null left ts
        # the only legal match: left 3 at t=10 vs right 7 at t=5
        assert out[3] == (7 if direction == "backward" else None)
        assert len(out) == 3    # left-outer: nothing dropped


def test_asof_rejects_right_ts_in_right_cols(left_right):
    left, right = left_right
    with pytest.raises(ValueError, match="right_ts"):
        asof_join(left, right, on="user", right_cols=["ts", "rid"])


# ---------------------------------------------------------------------------
# interval join (batch + stream-stream)
# ---------------------------------------------------------------------------


def test_interval_join_batch_semantics(spark, left_right):
    from same_same_spark.operators.events import interval_join

    left, right = left_right
    out = interval_join(
        left, right, on="user", lookback_seconds=10 * 60,
        right_cols=["rid"],
    )
    pairs = {(r["event_id"], r["r_rid"]) for r in out.collect()}
    # event 1 @10: right @8 (2min back) qualifies; @20/@25 are future
    # event 2 @20: right @20 (0) and NOT @8 (12min back > 10min)
    # event 3 @5: nothing at/before within 10min
    # event 4 @15 (v): right @1 is 14min back -> out of window
    assert pairs == {(1, 100), (2, 101)}
    # inclusive lower bound: exactly-lookback matches
    edge = interval_join(
        left, right, on="user", lookback_seconds=2 * 60, right_cols=["rid"],
    )
    assert (1, 100) in {(r["event_id"], r["r_rid"]) for r in edge.collect()}


def test_interval_join_contains_asof_match(spark, left_right):
    """asof_join's backward match is always the max-right_ts row of the
    interval join's backward window."""
    from same_same_spark.operators.events import asof_join, interval_join

    left, right = left_right
    window_s = 30 * 60
    iv = interval_join(
        left, right, on="user", lookback_seconds=window_s,
        right_cols=["rid"],
    )
    by_event = {}
    for r in iv.collect():
        by_event.setdefault(r["event_id"], []).append(
            (r["r_ts"], r["r_rid"])
        )
    asof = asof_join(
        left, right, on="user", right_cols=["rid"],
        tolerance_seconds=window_s, right_tiebreak="rid",
    )
    for r in asof.collect():
        if r["matched_rid"] is None:
            assert r["event_id"] not in by_event
        else:
            assert max(by_event[r["event_id"]])[1] == r["matched_rid"]


def test_interval_join_stream_stream(spark, tmp_path):
    """Real watermarked stream-stream join across micro-batches equals
    the batch interval join over the union."""
    import json
    import os

    from same_same_spark.operators.events import interval_join

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(lsrc)
    os.makedirs(rsrc)
    lrows = [
        {"eid": 1, "k": "u", "s": "2024-01-01T01:00:00"},
        {"eid": 2, "k": "u", "s": "2024-01-01T02:00:00"},
        {"eid": 3, "k": "v", "s": "2024-01-01T03:00:00"},
    ]
    rrows = [
        {"rid": 7, "k": "u", "s": "2024-01-01T00:55:00"},
        {"rid": 8, "k": "u", "s": "2024-01-01T01:58:00"},
        {"rid": 9, "k": "v", "s": "2024-01-01T02:00:00"},  # 1h before eid 3
    ]
    with open(os.path.join(lsrc, "a.json"), "w") as f:
        for e in lrows:
            f.write(json.dumps(e) + "\n")
    for i, e in enumerate(rrows):
        with open(os.path.join(rsrc, f"b{i}.json"), "w") as f:
            f.write(json.dumps(e) + "\n")

    def prep(df, idc):
        return df.select(
            idc, "k", F.col("s").cast("timestamp").alias("ts")
        )

    lstream = prep(
        spark.readStream.schema("eid LONG, k STRING, s STRING")
        .option("maxFilesPerTrigger", 1).json(lsrc),
        "eid",
    )
    rstream = prep(
        spark.readStream.schema("rid LONG, k STRING, s STRING")
        .option("maxFilesPerTrigger", 1).json(rsrc),
        "rid",
    )
    joined = interval_join(
        lstream, rstream, on="k", lookback_seconds=600, right_cols=["rid"],
        watermark="2 hours",
    )
    q = (
        joined.writeStream.format("memory").queryName("ivj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["eid"], r["r_rid"])
           for r in spark.sql("SELECT * FROM ivj").collect()}
    lbatch = prep(
        spark.read.schema("eid LONG, k STRING, s STRING").json(lsrc), "eid"
    )
    rbatch = prep(
        spark.read.schema("rid LONG, k STRING, s STRING").json(rsrc), "rid"
    )
    exp = {
        (r["eid"], r["r_rid"])
        for r in interval_join(
            lbatch, rbatch, on="k", lookback_seconds=600,
            right_cols=["rid"],
        ).collect()
    }
    assert got == exp == {(1, 7), (2, 8)}


def test_interval_join_validation(spark, left_right):
    from same_same_spark.operators.events import interval_join

    left, right = left_right
    with pytest.raises(ValueError, match=">= 0"):
        interval_join(left, right, on="user", lookback_seconds=-1)
    with pytest.raises(ValueError, match="right_ts"):
        interval_join(
            left, right, on="user", lookback_seconds=1,
            right_cols=["ts"],
        )


def test_interval_join_lookahead_and_tiny_bounds(spark, left_right):
    from same_same_spark.operators.events import interval_join

    left, right = left_right
    # forward window: purchases up to 10 minutes AFTER the click
    out = interval_join(
        left, right, on="user", lookback_seconds=0,
        lookahead_seconds=10 * 60, right_cols=["rid"],
    )
    pairs = {(r["event_id"], r["r_rid"]) for r in out.collect()}
    # event 1 @10: rights @20 (+10min, inclusive) and NOT @25 (+15)
    assert (1, 101) in pairs and (1, 102) not in pairs
    # fractional sub-second bounds must not hit the INTERVAL parser's
    # scientific-notation trap (regression: 1e-05 -> ParseException)
    tiny = interval_join(
        left, right, on="user", lookback_seconds=1e-05,
        right_cols=["rid"],
    )
    assert tiny.count() >= 0  # plan parses and runs


# ---------------------------------------------------------------------------
# date_histogram
# ---------------------------------------------------------------------------

def test_date_histogram_zero_fill_and_units(spark):
    from datetime import datetime

    from same_same_spark.operators.events import date_histogram

    rows = [
        ("a", datetime(2024, 1, 1, 10, 5)),
        ("a", datetime(2024, 1, 1, 10, 55)),
        ("a", datetime(2024, 1, 4, 3, 0)),
        ("b", datetime(2024, 1, 2, 0, 0)),
        ("b", None),
    ]
    df = spark.createDataFrame(rows, "event_type STRING, ts TIMESTAMP")
    out = {
        (r["event_type"], str(r["bucket"])): r["doc_count"]
        for r in date_histogram(df, "day", group_col="event_type").collect()
    }
    # group a spans Jan 1..4 -> 4 buckets incl. two zero days; group b
    # has one bucket; the NULL ts row is excluded
    assert out == {
        ("a", "2024-01-01 00:00:00"): 2,
        ("a", "2024-01-02 00:00:00"): 0,
        ("a", "2024-01-03 00:00:00"): 0,
        ("a", "2024-01-04 00:00:00"): 1,
        ("b", "2024-01-02 00:00:00"): 1,
    }
    # ungrouped hourly: Jan 1 10:00 .. Jan 4 03:00 inclusive
    hourly = date_histogram(df, "hour").collect()
    assert len(hourly) == 66  # 3 days * 24 - 10 + 3 + 1
    assert sum(r["doc_count"] for r in hourly) == 4


def test_date_histogram_guards(spark):
    from datetime import datetime

    from same_same_spark.operators.events import date_histogram

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1)), ("a", datetime(2031, 1, 1))],
        "event_type STRING, ts TIMESTAMP",
    )
    with pytest.raises(ValueError):
        date_histogram(df, "fortnight")
    # 7 years of minutes >> 65536 buckets -> the breaker trips
    with pytest.raises(Exception, match="max_buckets"):
        date_histogram(df, "minute").collect()


def test_pipeline_aggs_hand_computed(spark):
    from datetime import datetime

    from same_same_spark.operators.events import pipeline_aggs

    t = lambda d: datetime(2024, 1, d)
    rows = [
        ("A", t(1), 3), ("A", t(2), 0), ("A", t(3), 5), ("A", t(4), 2),
        ("B", t(1), 1), ("B", t(2), 4),
    ]
    series = spark.createDataFrame(
        rows, "event_type STRING, bucket TIMESTAMP, doc_count LONG"
    )
    out = pipeline_aggs(
        series, group_cols=["event_type"], window=2
    ).collect()
    got = {
        (r.event_type, r.bucket.day): (
            r.cumulative_sum, r.derivative, r.moving_avg
        )
        for r in out
    }
    assert got[("A", 1)] == (3, None, 3.0)
    assert got[("A", 2)] == (3, -3, 1.5)
    assert got[("A", 3)] == (8, 5, 2.5)
    assert got[("A", 4)] == (10, -3, 3.5)
    assert got[("B", 1)] == (1, None, 1.0)
    assert got[("B", 2)] == (5, 3, 2.5)


def test_pipeline_aggs_global_series_partition_survives(spark):
    """No group columns: the constant partition key must survive
    EliminateWindowPartitions (Spark 4 folds LITERAL keys into an
    unpartitioned window — the banned shape)."""
    from datetime import datetime

    from same_same_spark.operators.events import pipeline_aggs

    series = spark.createDataFrame(
        [(datetime(2024, 1, d), d) for d in (1, 2, 3)],
        "bucket TIMESTAMP, doc_count LONG",
    )
    out = pipeline_aggs(series, window=3)
    rows = out.collect()
    assert [r.cumulative_sum for r in sorted(rows, key=lambda r: r.bucket)] \
        == [1, 3, 6]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # window is still partitioned (on the non-foldable constant)
    assert "Window" in plan
    assert "windowspecdefinition(CASE" in plan.replace(" ", "")[:100000] or \
        "CASE WHEN" in plan

    with pytest.raises(ValueError, match="window"):
        pipeline_aggs(series, window=0)


# ---------------------------------------------------------------------------
# serial_diff / normalize / cumulative_cardinality / bucket_script
# ---------------------------------------------------------------------------

def _series_df(spark):
    rows = [
        ("a", 1, 10), ("a", 2, 13), ("a", 3, 11), ("a", 4, 20),
        ("b", 1, 5), ("b", 2, 5),
    ]
    return spark.createDataFrame(
        rows, "grp STRING, bucket INT, doc_count LONG"
    )


def test_serial_diff_lag2_hand_computed(spark):
    from same_same_spark.operators.events import serial_diff

    out = {
        (r["grp"], r["bucket"]): r["serial_diff"]
        for r in serial_diff(
            _series_df(spark), lag=2, order_col="bucket",
            group_cols=["grp"],
        ).collect()
    }
    assert out == {
        ("a", 1): None, ("a", 2): None,
        ("a", 3): 1, ("a", 4): 7,
        ("b", 1): None, ("b", 2): None,
    }
    with pytest.raises(ValueError, match="lag must be"):
        serial_diff(_series_df(spark), lag=0)


def test_normalize_methods_hand_computed(spark):
    import math

    from same_same_spark.operators.events import normalize_buckets

    df = _series_df(spark)
    a = [10.0, 13.0, 11.0, 20.0]

    got = {
        (r["grp"], r["bucket"]): r["normalized"]
        for r in normalize_buckets(
            df, "rescale_0_1", group_cols=["grp"]
        ).collect()
    }
    for i, v in enumerate(a):
        assert got[("a", i + 1)] == pytest.approx((v - 10) / 10)
    # constant series -> zero range -> NULL
    assert got[("b", 1)] is None and got[("b", 2)] is None

    got = {
        (r["grp"], r["bucket"]): r["normalized"]
        for r in normalize_buckets(
            df, "percent_of_sum", group_cols=["grp"]
        ).collect()
    }
    assert got[("a", 4)] == pytest.approx(20 / 54)
    assert got[("b", 1)] == pytest.approx(0.5)

    got = {
        (r["grp"], r["bucket"]): r["normalized"]
        for r in normalize_buckets(
            df, "zscore", group_cols=["grp"]
        ).collect()
    }
    mean = sum(a) / 4
    std = math.sqrt(sum((v - mean) ** 2 for v in a) / 4)
    assert got[("a", 1)] == pytest.approx((10 - mean) / std)
    assert got[("b", 1)] is None  # zero stddev

    got = {
        (r["grp"], r["bucket"]): r["normalized"]
        for r in normalize_buckets(
            df, "softmax", group_cols=["grp"]
        ).collect()
    }
    z = sum(math.exp(v) for v in a)
    assert got[("a", 4)] == pytest.approx(math.exp(20.0) / z)

    with pytest.raises(ValueError, match="method must be"):
        normalize_buckets(df, "rank")


def test_normalize_global_series_no_groups(spark):
    from same_same_spark.operators.events import normalize_buckets

    df = _series_df(spark).drop("grp")
    # global: all 6 rows normalize against the ONE series total
    rows = normalize_buckets(df, "percent_of_sum").collect()
    total = 10 + 13 + 11 + 20 + 5 + 5
    assert sorted(r["normalized"] for r in rows) == pytest.approx(
        sorted(v / total for v in (10, 13, 11, 20, 5, 5))
    )
    assert sum(r["normalized"] for r in rows) == pytest.approx(1.0)


def test_cumulative_cardinality_hand_computed(spark):
    from datetime import datetime

    from same_same_spark.operators.events import cumulative_cardinality

    rows = [
        (1, datetime(2024, 1, 1, 9)),
        (2, datetime(2024, 1, 1, 10)),
        (1, datetime(2024, 1, 2, 9)),    # repeat: not new
        (None, datetime(2024, 1, 2, 9)),  # NULL key excluded
        (3, datetime(2024, 1, 4, 1)),
        (2, None),                        # NULL ts excluded
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    out = {
        str(r["bucket"]): (
            r["doc_count"], r["new_keys"], r["cumulative_cardinality"]
        )
        for r in cumulative_cardinality(df, "day", "user_id").collect()
    }
    # note: doc_count includes the NULL-key row (histogram semantics)
    assert out == {
        "2024-01-01 00:00:00": (2, 2, 2),
        "2024-01-02 00:00:00": (2, 0, 2),   # zero-NEW bucket emits
        "2024-01-03 00:00:00": (0, 0, 2),   # zero-fill bucket
        "2024-01-04 00:00:00": (1, 1, 3),
    }


def test_cumulative_cardinality_duckdb_differential(spark):
    import duckdb

    from same_same_spark.operators.events import (
        cumulative_cardinality,
        duckdb_cumulative_cardinality_sql,
    )

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    got = sorted(
        (str(r["bucket"]), r["doc_count"], r["new_keys"],
         r["cumulative_cardinality"])
        for r in cumulative_cardinality(ev, "day", "user_id").collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    want = sorted(
        (str(b), d, n, c)
        for b, d, n, c in con.sql(
            duckdb_cumulative_cardinality_sql("events", "day", "user_id")
        ).fetchall()
    )
    assert got == want


def test_bucket_script_ops_and_null(spark):
    from same_same_spark.operators.events import bucket_script

    df = spark.createDataFrame(
        [(1, 10, 4), (2, 3, 0), (3, None, 5)],
        "bucket INT, a LONG, b LONG",
    )
    by = {
        r["bucket"]: r["script_value"]
        for r in bucket_script(df, "a", "/", "b").collect()
    }
    assert by[1] == pytest.approx(2.5)
    assert by[2] is None  # /0 -> NULL
    assert by[3] is None  # NULL operand -> NULL
    by = {
        r["bucket"]: r["script_value"]
        for r in bucket_script(df, "a", "-", "b").collect()
    }
    assert by[1] == 6.0
    with pytest.raises(ValueError, match="op must be"):
        bucket_script(df, "a", "%", "b")


# ---------------------------------------------------------------------------
# auto_date_histogram
# ---------------------------------------------------------------------------

def test_auto_date_histogram_picks_finest_fitting_unit(spark):
    from datetime import datetime

    from same_same_spark.operators.events import auto_date_histogram

    # 3 days of data: minute count ~4320 > 50, hour 72 > 50, day 4 <= 50
    rows = [
        (datetime(2024, 1, 1, 0, 5),),
        (datetime(2024, 1, 2, 12, 0),),
        (datetime(2024, 1, 4, 0, 1),),
        (None,),
    ]
    df = spark.createDataFrame(rows, "ts TIMESTAMP")
    out = auto_date_histogram(df, 50).collect()
    assert {r["interval_unit"] for r in out} == {"day"}
    assert len(out) == 4  # Jan 1..4 zero-filled
    assert sum(r["doc_count"] for r in out) == 3
    # target 100 fits hourly: Jan 1 00:00 .. Jan 4 00:00 = 73 buckets
    out = auto_date_histogram(df, 100).collect()
    assert {r["interval_unit"] for r in out} == {"hour"}
    assert len(out) == 73


def test_auto_date_histogram_coarsest_fallback_and_empty(spark):
    from datetime import datetime

    from same_same_spark.operators.events import auto_date_histogram

    df = spark.createDataFrame(
        [(datetime(2020, 1, 1),), (datetime(2024, 6, 1),)],
        "ts TIMESTAMP",
    )
    # even yearly (5 buckets) exceeds target 3 -> yearly regardless
    out = auto_date_histogram(df, 3).collect()
    assert {r["interval_unit"] for r in out} == {"year"}
    assert len(out) == 5
    # no non-NULL timestamps -> no rows
    empty = spark.createDataFrame([(None,)], "ts TIMESTAMP")
    assert auto_date_histogram(empty, 10).collect() == []
    import pytest as _pt
    with _pt.raises(ValueError, match="target_buckets"):
        auto_date_histogram(df, 0)


def test_auto_date_histogram_duckdb_differential(spark):
    import duckdb

    from same_same_spark.operators.events import (
        auto_date_histogram,
        duckdb_auto_date_histogram_sql,
    )

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    for target in (10, 100, 2000, 10**6):
        got = sorted(
            (r["interval_unit"], str(r["bucket"]), r["doc_count"])
            for r in auto_date_histogram(ev, target).collect()
        )
        want = sorted(
            (u, str(b), d)
            for u, b, d in con.sql(
                duckdb_auto_date_histogram_sql("events", target)
            ).fetchall()
        )
        assert got == want, f"target={target}"


# ---------------------------------------------------------------------------
# rate / moving_fn / t_test
# ---------------------------------------------------------------------------

def test_rate_buckets_counts_and_value(spark):
    from datetime import datetime

    from same_same_spark.operators.events import rate_buckets

    rows = [
        (datetime(2024, 1, 1, 3), 10.0),
        (datetime(2024, 1, 1, 9), 14.0),
        (datetime(2024, 1, 2, 0), None),   # NULL value counts as 0
        (datetime(2024, 1, 3, 12), 6.0),
    ]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, value DOUBLE")
    got = {
        str(r["bucket"]): (r["doc_count"], r["rate"])
        for r in rate_buckets(df, "day", "hour").collect()
    }
    assert got == {
        "2024-01-01 00:00:00": (2, 2 / 24),
        "2024-01-02 00:00:00": (1, 1 / 24),
        "2024-01-03 00:00:00": (1, 1 / 24),
    }
    got = {
        str(r["bucket"]): (r["value"], r["rate"])
        for r in rate_buckets(df, "day", "hour", value_col="value").collect()
    }
    assert got == {
        "2024-01-01 00:00:00": (24.0, 1.0),
        "2024-01-02 00:00:00": (0.0, 0.0),
        "2024-01-03 00:00:00": (6.0, 0.25),
    }
    with pytest.raises(ValueError, match="fixed-width"):
        rate_buckets(df, "month", "day")


def test_moving_fn_excludes_current_and_shift(spark):
    from same_same_spark.operators.events import moving_fn

    df = spark.createDataFrame(
        [(1, 10), (2, 13), (3, 11), (4, 20)], "bucket INT, doc_count LONG"
    )
    got = {
        r["bucket"]: r["moving_max"]
        for r in moving_fn(df, "max", window=2).collect()
    }
    # window = the 2 buckets BEFORE current (ES default, shift=0)
    assert got == {1: None, 2: 10, 3: 13, 4: 13}
    got = {
        r["bucket"]: r["moving_sum"]
        for r in moving_fn(df, "sum", window=2, shift=1).collect()
    }
    # shift=1 slides the window to include the current bucket
    assert got == {1: 10, 2: 23, 3: 24, 4: 31}
    with pytest.raises(ValueError, match="fn must be"):
        moving_fn(df, "median", window=2)


def test_moving_fn_duckdb_differential(spark):
    import duckdb

    from same_same_spark.operators.events import (
        date_histogram,
        duckdb_date_histogram_sql,
        duckdb_moving_fn_sql,
        moving_fn,
    )

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    series = date_histogram(ev, "day", group_col="event_type")
    got = sorted(
        (r["event_type"], str(r["bucket"]), r["doc_count"], r["moving_sum"])
        for r in moving_fn(
            series, "sum", window=3, group_cols=["event_type"]
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    want = sorted(
        (g, str(b), d, m)
        for g, b, d, m in con.sql(
            duckdb_moving_fn_sql(
                duckdb_date_histogram_sql(
                    "events", "day", group_col="event_type"
                ),
                "sum", window=3, group_cols=["event_type"],
            )
        ).fetchall()
    )
    assert got == want


def test_moving_fn_shift_past_window_duckdb(spark):
    """Review-pass regression: shift > window pushes BOTH frame bounds
    past the current row — the twin must render FOLLOWING, not a
    negative PRECEDING."""
    import duckdb

    from same_same_spark.operators.events import (
        duckdb_moving_fn_sql,
        moving_fn,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 13), (3, 11), (4, 20)], "bucket INT, doc_count LONG"
    )
    got = {
        r["bucket"]: r["moving_max"]
        for r in moving_fn(df, "max", window=1, shift=2).collect()
    }
    assert got == {1: 13, 2: 11, 3: 20, 4: None}
    con = duckdb.connect()
    con.register("series_tbl", df.toPandas())
    want = dict(
        con.sql(
            duckdb_moving_fn_sql(
                "SELECT * FROM series_tbl", "max", window=1, shift=2
            )
        ).df()[["bucket", "moving_max"]].itertuples(index=False)
    )
    assert {b: (None if v != v else v) for b, v in want.items()} == {
        b: (float(v) if v is not None else None) for b, v in got.items()
    }
