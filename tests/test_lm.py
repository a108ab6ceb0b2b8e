"""Bigram-LM perplexity scoring (pipeline/lm.py): differential against
a pure-Python reference model, DuckDB twin parity, and the short-doc /
OOV contracts."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline.lm import (
    lm_perplexity,
    lm_perplexity_sql,
    train_bigram_lm,
)
from same_same_spark.text.tokenizer import tokenize_py

ALPHA = 0.5


def _py_lm(train_texts: list[str]):
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for t in train_texts:
        toks = tokenize_py(t)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    return uni, bi, len(uni)


def _py_score(text: str, uni, bi, V):
    toks = tokenize_py(text)
    if len(toks) < 2:
        return 0, None
    lps = [
        math.log(
            (bi.get((a, b), 0) + ALPHA) / (uni.get(a, 0) + ALPHA * V)
        )
        for a, b in zip(toks, toks[1:])
    ]
    return len(lps), sum(lps) / len(lps)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_lm_matches_pure_python(spark, docs):
    sample = docs.filter(F.col("doc_id") < 60)
    train = sample.filter(F.col("doc_id") % 10 == 0)
    lm = train_bigram_lm(train, alpha=ALPHA)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in lm_perplexity(sample, lm).collect()
    }
    train_texts = [r["text"] for r in train.select("text").collect()]
    uni, bi, V = _py_lm(train_texts)
    assert V == lm.vocab_size
    rows = sample.select("doc_id", "text").collect()
    assert len(got) == len(rows)
    for r in rows:
        n, avg = _py_score(r["text"] or "", uni, bi, V)
        gn, gavg = got[r["doc_id"]]
        assert gn == n, r["doc_id"]
        if avg is None:
            assert gavg is None
        else:
            assert gavg == pytest.approx(round(avg, 6), abs=2e-6)


def test_lm_short_doc_and_oov(spark):
    train = spark.createDataFrame(
        [(0, "alpha beta gamma alpha beta")], "doc_id LONG, text STRING"
    )
    lm = train_bigram_lm(train, alpha=ALPHA)
    score_df = spark.createDataFrame(
        [
            (1, "alpha beta"),          # seen bigram
            (2, "zzzz qqqq"),           # fully OOV bigram
            (3, "alpha"),               # one token → no events
            (4, ""),                    # empty
            (5, None),                  # NULL text
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r for r in lm_perplexity(score_df, lm).collect()}
    assert len(got) == 5
    V = lm.vocab_size
    assert got[1]["avg_logp"] == pytest.approx(
        round(math.log((2 + ALPHA) / (2 + ALPHA * V)), 6), abs=2e-6
    )
    assert got[2]["avg_logp"] == pytest.approx(
        round(math.log(ALPHA / (ALPHA * V)), 6), abs=2e-6
    )
    # seen text scores strictly better than OOV text
    assert got[1]["avg_logp"] > got[2]["avg_logp"]
    assert got[1]["perplexity"] < got[2]["perplexity"]
    for d in (3, 4, 5):
        assert got[d]["n_bigrams"] == 0
        assert got[d]["avg_logp"] is None and got[d]["perplexity"] is None


def test_lm_duckdb_twin_parity(spark, docs):
    sample = docs.filter(F.col("doc_id") < 120)
    lm = train_bigram_lm(
        sample.filter(F.col("doc_id") % 10 == 0), alpha=ALPHA
    )
    got = sorted(
        (r["doc_id"], r["n_bigrams"], r["avg_logp"])
        for r in lm_perplexity(sample, lm).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "WHERE doc_id < 120"
    )
    want = sorted(
        (int(a), int(b), None if c is None else float(c))
        for a, b, c in con.sql(lm_perplexity_sql(alpha=ALPHA)).fetchall()
    )
    assert len(got) == len(want)
    for (gd, gn, ga), (wd, wn, wa) in zip(got, want):
        assert (gd, gn) == (wd, wn)
        if wa is None:
            assert ga is None
        else:
            assert ga == pytest.approx(wa, abs=2e-6)


def test_lm_buckets_terciles_and_twin(spark, docs):
    """head/middle/tail: bucket sizes near n/3 per stratum, boundary
    semantics pinned against the DuckDB twin value-for-value, NULL
    bucket for no-evidence docs."""
    from same_same_spark.pipeline.lm import lm_buckets, lm_buckets_sql

    sample = docs.filter(F.col("doc_id") < 200)
    lm = train_bigram_lm(
        sample.filter(F.col("doc_id") % 10 == 0), alpha=ALPHA
    )
    got_df = lm_buckets(sample, lm, strata_col="lang")
    got = sorted(
        (r["doc_id"], r["lang"], r["n_bigrams"], r["avg_logp"], r["bucket"])
        for r in got_df.collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "WHERE doc_id < 200"
    )
    want = sorted(
        (int(a), b, int(c), None if d is None else float(d), e)
        for a, b, c, d, e in con.sql(
            lm_buckets_sql(alpha=ALPHA, strata_expr="lang")
        ).fetchall()
    )
    assert len(got) == len(want) == 200
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[2] == w[2] and g[4] == w[4]
        if w[3] is None:
            assert g[3] is None
        else:
            assert g[3] == pytest.approx(w[3], abs=2e-6)
    # per-stratum tercile balance: each bucket within 2 of n/3
    from collections import Counter

    per = Counter((lang, b) for _, lang, _, a, b in got if a is not None)
    n_lang = Counter(lang for _, lang, _, a, _ in got if a is not None)
    for (lang, b), c in per.items():
        assert abs(c - n_lang[lang] / 3) <= 2, (lang, b, c, n_lang[lang])
    # global variant has no stratum column and still buckets everything
    g2 = lm_buckets(sample, lm).collect()
    assert {r["bucket"] for r in g2 if r["avg_logp"] is not None} == {
        "head", "middle", "tail"
    }
