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


# ---------------------------------------------------------------------------
# Kneser-Ney smoothing
# ---------------------------------------------------------------------------


def _py_kn(train_texts, discount=0.75, alpha=0.5):
    """Independent pure-Python interpolated-KN reference."""
    bi: dict[tuple[str, str], int] = {}
    vocab: set[str] = set()
    for t in train_texts:
        toks = tokenize_py(t)
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    c1m: dict[str, float] = {}
    n_fwd: dict[str, int] = {}
    n_bwd: dict[str, int] = {}
    for (a, b), c in bi.items():
        c1m[a] = c1m.get(a, 0.0) + c
        n_fwd[a] = n_fwd.get(a, 0) + 1
        n_bwd[b] = n_bwd.get(b, 0) + 1
    n1p = float(len(bi))
    V = float(len(vocab))

    def p(w1, w2):
        p_cont = (n_bwd.get(w2, 0) + alpha) / (n1p + alpha * (V + 1))
        if c1m.get(w1, 0.0) > 0:
            c = bi.get((w1, w2), 0)
            return (
                max(c - discount, 0.0) / c1m[w1]
                + discount * n_fwd[w1] / c1m[w1] * p_cont
            )
        return p_cont

    def score(text):
        toks = tokenize_py(text)
        if len(toks) < 2:
            return 0, None
        lps = [math.log(p(a, b)) for a, b in zip(toks, toks[1:])]
        return len(lps), sum(lps) / len(lps)

    return p, score


def test_kn_matches_pure_python(spark, docs):
    from same_same_spark.pipeline.lm import lm_perplexity, train_kn_lm

    train = [r["text"] for r in docs.filter("doc_id % 2 = 0").collect()]
    lm = train_kn_lm(docs.filter("doc_id % 2 = 0"))
    _, score = _py_kn(train)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in lm_perplexity(docs, lm).collect()
    }
    for r in docs.collect():
        n, avg = score(r["text"])
        exp = (n, None if avg is None else round(avg, 6))
        assert got[r["doc_id"]] == exp, r["doc_id"]


def test_kn_properties(spark, docs):
    from same_same_spark.pipeline.lm import train_kn_lm

    train_rows = docs.filter("doc_id % 2 = 0")
    train = [r["text"] for r in train_rows.collect()]
    p, _ = _py_kn(train)
    lm = train_kn_lm(train_rows)
    # seen-context distribution sums to ~1 over vocab+UNK (interpolated
    # KN is a proper distribution; the UNK slot carries the remainder)
    vocab = {w for t in train for w in tokenize_py(t)}
    some_ctx = next(
        a
        for t in train
        for a in tokenize_py(t)[:-1]
        if len(tokenize_py(t)) > 1
    )
    total = sum(p(some_ctx, w) for w in vocab)
    # remaining mass = sum over unseen-w2 continuation floor; bounded
    assert 0.5 < total <= 1.0 + 1e-9
    # OOV word under OOV context still has finite log-prob
    assert p("zzzunseen", "qqqunseen") > 0.0
    # discount validation
    with pytest.raises(ValueError, match="discount"):
        train_kn_lm(train_rows, discount=1.5)


def test_kn_duckdb_twin_parity(spark, docs):
    from same_same_spark.pipeline.lm import (
        kn_perplexity_sql,
        lm_perplexity,
        train_kn_lm,
    )

    lm = train_kn_lm(docs.filter("doc_id % 2 = 0"))
    got = sorted(
        (r["doc_id"], r["n_bigrams"], r["avg_logp"])
        for r in lm_perplexity(docs, lm).collect()
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    oracle = sorted(
        (r[0], r[1], r[2])
        for r in con.execute(
            kn_perplexity_sql(train_where="doc_id % 2 = 0")
        ).fetchall()
    )
    assert got == oracle and got


def test_kn_buckets_and_mix_gate(spark, docs):
    from same_same_spark.pipeline.lm import lm_buckets, train_kn_lm
    from same_same_spark.pipeline.mix import MixConfig, prepare_training_corpus

    lm = train_kn_lm(docs.filter("doc_id % 2 = 0"))
    b = lm_buckets(docs, lm)
    buckets = {r["bucket"] for r in b.collect()}
    assert buckets <= {"head", "middle", "tail", None}
    cfg = MixConfig(exact=False, lm_max_perplexity=1e9)
    out = prepare_training_corpus(docs, cfg, lm_ref_df=lm)
    assert out.count() == docs.count()  # huge threshold keeps all
