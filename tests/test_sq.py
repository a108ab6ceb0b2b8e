"""SQ8 scalar quantization: exact trainer bounds, pinned integer
encode (clamp / round-half-up / constant-dim), asymmetric top-k vs a
numpy decode-and-rank reference, reconstruction error bound."""

from __future__ import annotations

import math

import numpy as np
import pytest

from same_same_spark.pipeline.sq import sq_encode, sq_topk, train_sq_params


@pytest.fixture(scope="module")
def tiny_vecs(spark):
    rows = [
        (0, [0.0, 10.0, 5.0]),
        (1, [1.0, 10.0, -5.0]),
        (2, [0.5, 10.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def test_train_sq_params_exact_bounds(tiny_vecs):
    mins, steps = train_sq_params(tiny_vecs)
    assert mins == [0.0, 10.0, -5.0]
    assert steps[0] == pytest.approx(1.0 / 255.0)
    assert steps[1] == 0.0  # constant dimension
    assert steps[2] == pytest.approx(10.0 / 255.0)


def test_train_sq_params_guards(spark, tiny_vecs):
    empty = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>")
    with pytest.raises(ValueError, match="empty"):
        train_sq_params(empty)
    mixed = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    with pytest.raises(ValueError, match="mixed"):
        train_sq_params(mixed)


def test_sq_encode_hand_computed(tiny_vecs):
    mins, steps = train_sq_params(tiny_vecs)
    rows = {
        r.vec_id: list(r.codes)
        for r in sq_encode(tiny_vecs, mins, steps).collect()
    }
    # dim0: x=0 -> 0; x=1 -> 255; x=0.5 -> floor(127.5+0.5)=128 (half-up)
    assert [rows[0][0], rows[1][0], rows[2][0]] == [0, 255, 128]
    # constant dim -> code 0 everywhere
    assert [rows[i][1] for i in range(3)] == [0, 0, 0]
    # dim2: min -5 step 10/255; x=-5 -> 0; x=5 -> 255; x=0 -> 128
    assert [rows[0][2], rows[1][2], rows[2][2]] == [255, 0, 128]


def test_sq_reconstruction_error_bounded(spark):
    rng = np.random.default_rng(7)
    data = rng.normal(size=(50, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    mins, steps = train_sq_params(df)
    codes = {
        r.vec_id: np.array(r.codes)
        for r in sq_encode(df, mins, steps).collect()
    }
    m, s = np.array(mins), np.array(steps)
    for i, row in enumerate(data):
        err = np.abs(row.astype(np.float64) - (m + codes[i] * s))
        # half-up rounding keeps every dim within step/2 (+1 ulp slack)
        assert (err <= s / 2 + 1e-12).all()


def test_sq_topk_matches_numpy_decode_rank(spark):
    rng = np.random.default_rng(11)
    data = rng.normal(size=(40, 6)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    mins, steps = train_sq_params(df)
    coded = sq_encode(df, mins, steps)
    queries = [(0, [float(x) for x in data[0]]),
               (1, [float(x) for x in data[17]])]
    got = sq_topk(coded, mins, steps, queries, k=5).collect()

    codes = {
        r.vec_id: np.array(r.codes)
        for r in coded.collect()
    }
    m, s = np.array(mins), np.array(steps)
    for qid, qv in queries:
        q = np.array(qv, dtype=np.float64)
        dists = {
            i: float(((q - (m + c * s)) ** 2).sum())
            for i, c in codes.items()
        }
        ref = sorted(dists.items(), key=lambda kv: (round(kv[1], 9), kv[0]))
        mine = sorted(
            [(r.vec_id, r.dist, r.rank) for r in got if r.query_id == qid],
            key=lambda t: t[2],
        )
        assert [v for v, _, _ in mine] == [i for i, _ in ref[:5]]
        for (vid, dist, _), (ri, rd) in zip(mine, ref):
            assert dist == pytest.approx(rd, abs=1e-9)
    # self-query: the query's own code must rank 1 (distance minimal)
    assert [r.vec_id for r in got if r.query_id == 0 and r.rank == 1] == [0]


def test_sq_topk_query_dim_guard(spark, tiny_vecs):
    mins, steps = train_sq_params(tiny_vecs)
    coded = sq_encode(tiny_vecs, mins, steps)
    with pytest.raises(ValueError, match="dims"):
        sq_topk(coded, mins, steps, [(0, [1.0, 2.0])], k=2)
