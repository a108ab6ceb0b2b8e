"""Residual quantization (pipeline/rq.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline.rq import (
    duckdb_rq_sql,
    rq_adc_topk,
    rq_decode,
    rq_encode,
    rq_encode_rows,
    train_rq_codebooks,
)


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.RandomState(7)
    latent = rng.randn(192, 4)
    mix = rng.randn(4, 16)
    sample = latent @ mix + 0.05 * rng.randn(192, 16)
    books = train_rq_codebooks(sample, levels=3, n_codes=8, seed=11)
    return sample, books


def test_training_is_deterministic(fixture):
    sample, books = fixture
    again = train_rq_codebooks(sample, levels=3, n_codes=8, seed=11)
    assert books == again
    other = train_rq_codebooks(sample, levels=3, n_codes=8, seed=12)
    assert books != other


def test_error_decreases_per_level(fixture):
    sample, books = fixture
    X = sample[:80]
    errs = []
    for levels in (1, 2, 3):
        codes, _ = rq_encode_rows(X, books[:levels])
        recon = np.array(
            [rq_decode(books[:levels], list(c)) for c in codes]
        )
        errs.append(float(((X - recon) ** 2).sum(axis=1).mean()))
    assert errs[0] > errs[1] > errs[2]


def test_recon_norm2_matches_decode(fixture):
    sample, books = fixture
    X = sample[:40]
    codes, norm2 = rq_encode_rows(X, books)
    for i in range(len(X)):
        recon = rq_decode(books, list(codes[i]))
        want = 0.0
        for v in recon:
            want = want + v * v
        assert norm2[i] == want  # same association order -> bit-equal


def test_adc_identity_and_rank(spark, fixture):
    sample, books = fixture
    rows = [(i, [float(v) for v in sample[i]]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id LONG, emb ARRAY<DOUBLE>")
    codes_df = rq_encode(df, books, id_col="vec_id", embedding_col="emb")
    queries = [(0, rows[0][1]), (1, rows[5][1])]
    out = rq_adc_topk(codes_df, books, queries, k=7, id_col="vec_id")
    got = out.collect()
    codes_all = {
        r["vec_id"]: (list(r["codes"]), r["recon_norm2"])
        for r in codes_df.collect()
    }
    for qid, qv in queries:
        q = np.asarray(qv)
        dists = {
            vid: float(((q - np.asarray(rq_decode(books, cs))) ** 2).sum())
            for vid, (cs, _n2) in codes_all.items()
        }
        mine = sorted(
            (r for r in got if r["query_id"] == qid),
            key=lambda r: r["rank"],
        )
        brute = sorted(
            dists.items(), key=lambda kv: (round(kv[1] * 1e9) / 1e9, kv[0])
        )[:7]
        assert [r["vec_id"] for r in mine] == [v for v, _ in brute]
        for r in mine:
            # the norm2-form ADC equals ||q - recon||^2 up to association
            assert r["dist"] == pytest.approx(
                dists[r["vec_id"]], rel=1e-9, abs=1e-9
            )


def test_spark_encoder_matches_reference_rows(spark, fixture):
    sample, books = fixture
    rows = [(i, [float(v) for v in sample[i]]) for i in range(30)]
    df = spark.createDataFrame(
        rows, "vec_id LONG, emb ARRAY<DOUBLE>"
    ).repartition(4)
    got = {
        r["vec_id"]: (list(r["codes"]), r["recon_norm2"])
        for r in rq_encode(
            df, books, id_col="vec_id", embedding_col="emb"
        ).collect()
    }
    X = np.asarray([v for _i, v in rows])
    codes, norm2 = rq_encode_rows(X, books)
    for idx, (i, _v) in enumerate(rows):
        assert got[i][0] == list(codes[idx])
        assert got[i][1] == norm2[idx]


def test_validation(fixture):
    _sample, books = fixture
    with pytest.raises(ValueError, match="2-D"):
        train_rq_codebooks([1.0, 2.0], 2, 4)
    with pytest.raises(ValueError, match="levels"):
        train_rq_codebooks(np.zeros((10, 4)), 0, 2)
    with pytest.raises(ValueError, match="ragged"):
        rq_encode_rows(np.zeros((2, 16)), [books[0], books[1][:3]])
    with pytest.raises(ValueError, match="codes"):
        rq_decode(books, [0, 1])


def test_oracle_parity_small(spark, fixture):
    import duckdb

    sample, books = fixture
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    emb16 = emb.select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, 16).alias(
            "emb"
        ),
    )
    codes_df = rq_encode(emb16, books, id_col="vec_id", embedding_col="emb")
    qrows = {
        r["vec_id"]: list(map(float, r["emb"]))
        for r in emb16.filter(F.col("vec_id").isin([0, 1, 2])).collect()
    }
    queries = [(int(i), qrows[i]) for i in sorted(qrows)]
    out = rq_adc_topk(codes_df, books, queries, k=5, id_col="vec_id")
    a = sorted(
        (r["query_id"], r["vec_id"], round(r["dist"], 6), r["rank"])
        for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf}/embeddings.parquet'"
    )
    b = sorted(
        tuple(x)
        for x in con.execute(
            duckdb_rq_sql("embeddings", books, [0, 1, 2], k=5)
        ).fetchall()
    )
    assert a == b
