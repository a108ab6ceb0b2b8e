"""Streaming continuous vector top-k: two-micro-batch run pinned
rank- and score-identical to batch brute force over the union;
mid-stream emissions reflect only what has arrived."""

from __future__ import annotations

import json
import math
import os

from same_same_spark.pipeline.ann import brute_topk
from same_same_spark.streaming.topk import latest_topk, stream_vector_topk


def _write_batches(tmp_path, batches):
    src = str(tmp_path / "vecs")
    os.makedirs(src)
    for i, batch in enumerate(batches):
        p = os.path.join(src, f"v{i}.json")
        with open(p, "w") as f:
            for d in batch:
                f.write(json.dumps(d) + "\n")
        os.utime(p, (1_700_000_000 + i * 60,) * 2)
    return src


def test_stream_topk_final_state_equals_batch_brute(spark, tmp_path):
    b0 = [
        {"vec_id": 1, "embedding": [1.0, 0.0, 0.0]},
        {"vec_id": 2, "embedding": [0.9, 0.1, 0.0]},
        {"vec_id": 3, "embedding": [0.0, 1.0, 0.0]},
        {"vec_id": 9, "embedding": [1.0, 0.0]},  # dim mismatch: ignored
    ]
    b1 = [
        {"vec_id": 4, "embedding": [0.99, 0.0, 0.01]},  # new best arrives
        {"vec_id": 5, "embedding": [0.0, 0.0, 1.0]},
    ]
    src = _write_batches(tmp_path, (b0, b1))
    queries = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]

    stream = (
        spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = stream_vector_topk(stream, queries, k=3)
    q = (
        out.writeStream.format("memory")
        .queryName("stream_topk_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    emissions = spark.sql("SELECT * FROM stream_topk_out")

    # two batches carried rows for every query -> seq reaches 2
    assert emissions.groupBy("query_id").max("seq").collect()[0][1] == 2
    final = {
        (r.query_id, r.rank): (r.vec_id, r.score)
        for r in latest_topk(emissions).collect()
    }
    union = spark.createDataFrame(
        [(d["vec_id"], d["embedding"]) for d in b0 + b1],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    want = {
        (r.query_id, r.rank): (r.vec_id, r.score)
        for r in brute_topk(union, queries, k=3).collect()
    }
    assert set(final) == set(want)
    for key, (vid, score) in want.items():
        assert final[key][0] == vid
        assert math.isclose(final[key][1], score, rel_tol=1e-12)

    # the seq=1 emission must rank ONLY batch-0 arrivals (vec 4 absent)
    first = {
        (r.query_id, r.rank): r.vec_id
        for r in emissions.filter("seq = 1").collect()
    }
    assert first[(0, 1)] == 1 and 4 not in {
        v for (q_, _), v in first.items() if q_ == 0
    }


def test_stream_topk_guard(spark, tmp_path):
    import pytest

    src = str(tmp_path / "empty")
    os.makedirs(src)
    stream = spark.readStream.schema(
        "vec_id LONG, embedding ARRAY<DOUBLE>"
    ).json(src)
    with pytest.raises(ValueError, match="k must be"):
        stream_vector_topk(stream, [(0, [1.0])], k=0)
