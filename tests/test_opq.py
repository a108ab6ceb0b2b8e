"""Optimized Product Quantization (pipeline/opq.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline import opq
from same_same_spark.pipeline.pq import _subspace_bounds


def _correlated(n=240, d=16, seed=5):
    """Anisotropic sample: a low-rank latent mix + small noise — the
    data shape plain PQ handles badly and OPQ exists for."""
    rng = np.random.RandomState(seed)
    latent = rng.randn(n, d // 4)
    mix = rng.randn(d // 4, d)
    return latent @ mix + 0.05 * rng.randn(n, d)


def test_train_is_deterministic_and_orthogonal():
    X = _correlated()
    R1, B1 = opq.train_opq(X, m=4, n_codes=8, seed=3)
    R2, B2 = opq.train_opq(X, m=4, n_codes=8, seed=3)
    assert R1 == R2 and B1 == B2
    Rm = np.asarray(R1)
    assert np.allclose(Rm @ Rm.T, np.eye(len(R1)), atol=1e-9)


def test_opq_beats_plain_pq_on_correlated_data():
    X = _correlated()
    m, n_codes = 4, 8
    R, books = opq.train_opq(X, m=m, n_codes=n_codes, seed=3)
    # plain-PQ baseline: identity rotation, same k-means protocol
    rng = np.random.RandomState(3)
    plain = [
        [
            [float(v) for v in code]
            for code in opq._kmeans_np(X[:, lo:hi], n_codes, rng, 10)
        ]
        for lo, hi in _subspace_bounds(X.shape[1], m)
    ]
    ident = np.eye(X.shape[1]).tolist()
    err_opq = opq.quantization_error(X, R, books)
    err_pq = opq.quantization_error(X, ident, plain)
    assert err_opq < err_pq  # the point of the rotation


def test_rotation_preserves_distances():
    X = _correlated(n=40)
    R, _ = opq.train_opq(X, m=4, n_codes=4, n_iter=3, seed=9)
    a = opq.rotate_vector(R, list(X[0]))
    b = opq.rotate_vector(R, list(X[1]))
    orig = float(((X[0] - X[1]) ** 2).sum())
    rot = sum((x - y) ** 2 for x, y in zip(a, b))
    assert abs(orig - rot) < 1e-9 * max(1.0, orig)


def test_rotate_literal_and_pandas_bit_equal(spark):
    X = _correlated(n=30, d=16)
    R, _ = opq.train_opq(X, m=4, n_codes=4, n_iter=2, seed=1)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    lit = {
        r["vec_id"]: r["emb_rot"]
        for r in opq.rotate(df, R, max_literal_floats=10**6).collect()
    }
    pnd = {
        r["vec_id"]: r["emb_rot"] for r in opq.rotate_pandas(df, R).collect()
    }
    assert lit == pnd  # exact doubles, both strategies


def test_rotate_dispatches_to_pandas_for_large_d(spark):
    X = _correlated(n=20, d=16)
    R = np.eye(16).tolist()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = opq.rotate(df, R, max_literal_floats=4)  # 256 > 4 -> Arrow
    assert "mapInPandas" in out._jdf.queryExecution().analyzed().toString() \
        or out.count() == 20  # plan probe is best-effort; values must hold
    got = {r["vec_id"]: r["emb_rot"] for r in out.collect()}
    assert got[0] == [float(v) for v in X[0]]


def test_opq_adc_matches_numpy_reference(spark):
    X = _correlated(n=60, d=8, seed=11)
    m, n_codes, k = 2, 4, 5
    R, books = opq.train_opq(X, m=m, n_codes=n_codes, n_iter=3, seed=2)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    codes_df = opq.opq_encode(df, R, books)
    queries = [(0, list(map(float, X[0]))), (1, list(map(float, X[1])))]
    got = [
        (r["query_id"], r["rank"], r["vec_id"], round(r["dist"], 6))
        for r in opq.opq_adc_topk(codes_df, R, books, queries, k=k)
        .orderBy("query_id", "rank").collect()
    ]
    # independent numpy reference: rotate, encode, ADC via LUT sums
    Rm = np.asarray(R)
    Bm = [np.asarray(cb) for cb in books]
    Y = X @ Rm.T
    codes = opq._encode_np(Y, Bm)
    bounds = _subspace_bounds(8, m)
    exp = []
    for qid, qv in queries:
        yq = np.asarray(qv) @ Rm.T
        lut = [
            ((yq[lo:hi][None, :] - Bm[s]) ** 2).sum(axis=1)
            for s, (lo, hi) in enumerate(bounds)
        ]
        dist = np.zeros(len(X))
        for s in range(m):
            dist += lut[s][codes[:, s]]
        order = sorted(range(len(X)), key=lambda i: (round(dist[i], 9), i))
        exp.extend(
            (qid, rank + 1, i, round(float(dist[i]), 6))
            for rank, i in enumerate(order[:k])
        )
    assert got == exp


def test_opq_composes_with_persisted_pq_store(spark, tmp_path):
    """Rotation in front of build_pq_store: the store probes rotated
    queries exactly like a plain-PQ store probes raw ones."""
    from same_same_spark.pipeline.pq import build_pq_store, pq_topk_persisted

    X = _correlated(n=50, d=8, seed=4)
    R, books = opq.train_opq(X, m=2, n_codes=4, n_iter=2, seed=6)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    rotated = opq.rotate(df, R).withColumnRenamed("emb_rot", "embedding")
    out_dir = str(tmp_path / "opq_store")
    build_pq_store(
        rotated, out_dir, codebooks=books, n_centroids=4, seed=8
    )
    q = [(0, opq.rotate_vector(R, list(map(float, X[0]))))]
    rows = pq_topk_persisted(spark, out_dir, q, k=3, nprobe=4).collect()
    assert len(rows) == 3
    assert rows[0]["vec_id"] == 0  # the query's own vector wins


def test_rotation_validation():
    with pytest.raises(ValueError, match="square"):
        opq.rotate_vector([[1.0, 0.0]], [1.0, 2.0])
    with pytest.raises(ValueError, match="dim"):
        opq.rotate_vector([[1.0, 0.0], [0.0, 1.0]], [1.0])
    with pytest.raises(ValueError, match="2-D"):
        opq.train_opq([1.0, 2.0], m=1, n_codes=1)
    with pytest.raises(ValueError, match="not divisible"):
        opq.train_opq(np.zeros((10, 6)), m=4, n_codes=2)
