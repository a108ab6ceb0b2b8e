"""Binary quantization: exact midrange trainer, hand-computed bit
packing, Hamming top-k vs a numpy popcount reference, exact re-rank
identity vs brute force, and the encode Python/Spark twin."""

from __future__ import annotations

import numpy as np
import pytest

from same_same_spark.pipeline.bq import (
    bq_encode,
    bq_encode_py,
    bq_rerank_topk,
    bq_topk,
    train_bq_thresholds,
)


@pytest.fixture(scope="module")
def tiny_vecs(spark):
    rows = [
        (0, [0.0, 10.0, 5.0]),
        (1, [1.0, 10.0, -5.0]),
        (2, [0.5, 10.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def test_train_thresholds_midrange(tiny_vecs):
    thr = train_bq_thresholds(tiny_vecs)
    assert thr == [0.5, 10.0, 0.0]


def test_train_thresholds_guards(spark):
    empty = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>")
    with pytest.raises(ValueError, match="empty"):
        train_bq_thresholds(empty)
    mixed = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    with pytest.raises(ValueError, match="mixed"):
        train_bq_thresholds(mixed)


def test_bq_encode_hand_computed(tiny_vecs):
    thr = train_bq_thresholds(tiny_vecs)
    rows = {
        r.vec_id: list(r.words)
        for r in bq_encode(tiny_vecs, thr).collect()
    }
    # strict >: 0.0>0.5 F, 10>10 F, 5>0 T  -> bits 0,0,1 -> word 4
    # 1.0>0.5 T, 10>10 F, -5>0 F           -> bits 1,0,0 -> word 1
    # 0.5>0.5 F, 10>10 F, 0>0 F            -> 0
    assert rows == {0: [4], 1: [1], 2: [0]}


def test_bq_encode_py_matches_spark(spark):
    rng = np.random.default_rng(3)
    data = rng.normal(size=(30, 70)).astype(np.float32)  # > one word
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    thr = train_bq_thresholds(df)
    spark_words = {
        r.vec_id: list(r.words) for r in bq_encode(df, thr).collect()
    }
    assert len(spark_words[0]) == 3  # ceil(70/32)
    for i, row in enumerate(data):
        assert bq_encode_py([float(x) for x in row], thr) == spark_words[i]


def test_bq_topk_matches_numpy_hamming(spark):
    rng = np.random.default_rng(11)
    data = rng.normal(size=(40, 48)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    thr = train_bq_thresholds(df)
    coded = bq_encode(df, thr)
    queries = [(0, [float(x) for x in data[0]]),
               (1, [float(x) for x in data[17]])]
    got = bq_topk(coded, thr, queries, k=5).collect()

    t = np.array(thr)
    bits = {i: (row.astype(np.float64) > t) for i, row in enumerate(data)}
    for qid, qv in queries:
        qb = np.array(qv, dtype=np.float64) > t
        hams = {i: int((qb != b).sum()) for i, b in bits.items()}
        ref = sorted(hams.items(), key=lambda kv: (kv[1], kv[0]))
        mine = sorted(
            [(r.vec_id, r.hamming, r.rank) for r in got if r.query_id == qid],
            key=lambda x: x[2],
        )
        assert [(v, h) for v, h, _ in mine] == ref[:5]
    # self-query at hamming 0 ranks first
    assert [r.vec_id for r in got if r.query_id == 0 and r.rank == 1] == [0]


def test_bq_rerank_exact_identity(spark):
    """With shortlist == corpus size the re-rank must equal exact
    brute-force L2 top-k (binary stage only shortlists, never lies)."""
    rng = np.random.default_rng(23)
    data = rng.normal(size=(35, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    thr = train_bq_thresholds(df)
    coded = bq_encode(df, thr)
    queries = [(0, [float(x) for x in data[5]])]
    got = bq_rerank_topk(
        coded, df, thr, queries, k=4, shortlist=35
    ).collect()

    q = data[5].astype(np.float64)
    dists = {
        i: float(((q - row.astype(np.float64)) ** 2).sum())
        for i, row in enumerate(data)
    }
    ref = sorted(dists.items(), key=lambda kv: (round(kv[1], 9), kv[0]))[:4]
    mine = sorted(got, key=lambda r: r.rank)
    assert [r.vec_id for r in mine] == [i for i, _ in ref]
    for r, (_, rd) in zip(mine, ref):
        assert r.dist == pytest.approx(rd, abs=1e-9)


def test_bq_guards(spark, tiny_vecs):
    thr = train_bq_thresholds(tiny_vecs)
    coded = bq_encode(tiny_vecs, thr)
    with pytest.raises(ValueError, match="dims"):
        bq_topk(coded, thr, [(0, [1.0, 2.0])], k=2)
    with pytest.raises(ValueError, match="shortlist"):
        bq_rerank_topk(coded, tiny_vecs, thr,
                       [(0, [0.0, 0.0, 0.0])], k=5, shortlist=2)
    with pytest.raises(ValueError, match="dims"):
        bq_encode_py([1.0], thr)


def test_bq_duckdb_twin_exact(spark):
    """Whole-chain differential: SQL-derived thresholds + encode +
    Hamming rank vs the Spark chain — every compared value an
    integer."""
    import duckdb

    from same_same_spark.pipeline.bq import duckdb_bq_topk_sql

    rng = np.random.default_rng(41)
    data = rng.normal(size=(25, 40)).astype(np.float32)
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(data)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    thr = train_bq_thresholds(df)
    coded = bq_encode(df, thr)
    queries = [(0, rows[0][1]), (7, rows[7][1])]
    got = {
        (r.query_id, r.rank): (r.vec_id, r.hamming)
        for r in bq_topk(coded, thr, queries, k=6).collect()
    }

    con = duckdb.connect()
    import pandas as pd

    pdf = pd.DataFrame(
        {"vec_id": [i for i, _ in rows],
         "embedding": [v for _, v in rows]}
    )
    con.register("embeddings", pdf)
    sql = duckdb_bq_topk_sql(
        "embeddings", "vec_id", "embedding", None, None,
        k=6, dim=40, query_ids=[0, 7],
    )
    want = {
        (int(r.query_id), int(r.rank)): (int(r.vec_id), int(r.hamming))
        for r in con.sql(sql).df().itertuples()
    }
    assert got == want
