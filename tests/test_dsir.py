"""DSIR importance resampling (pipeline/dsir.py)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline import dsir


def _corpus(spark):
    """Raw corpus: even ids look like the target domain (query-engine
    prose), odd ids are off-distribution noise; the target sample is
    more of the even style."""
    target_style = (
        "the query engine scans the table and the filter prunes rows "
        "before the join builds the hash side and the sort orders output"
    )
    noise_style = (
        "zx qq vv kk turnip wombat sprocket doily rhombus pickle "
        "quasar njord vellum zephyr gnocchi umlaut parsnip bixby"
    )
    rows = []
    for i in range(40):
        base = target_style if i % 2 == 0 else noise_style
        rows.append((i, f"{base} variant {i} token{i % 7}"))
    raw = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    tgt = spark.createDataFrame(
        [(100 + j, target_style + f" sample {j}") for j in range(6)],
        "doc_id LONG, text STRING",
    )
    return raw, tgt


def test_log_weights_separate_domains(spark):
    raw, tgt = _corpus(spark)
    lw = {
        r["doc_id"]: r["log_w"]
        for r in dsir.dsir_log_weights(raw, tgt, n_buckets=4096).collect()
    }
    assert len(lw) == 40
    evens = [lw[i] for i in range(0, 40, 2)]
    odds = [lw[i] for i in range(1, 40, 2)]
    # every target-style doc outweighs every noise doc
    assert min(evens) > max(odds)


def test_topk_selects_target_like_docs(spark):
    raw, tgt = _corpus(spark)
    sel = dsir.dsir_topk(raw, tgt, k=10, n_buckets=4096, temperature=0.05)
    rows = sel.collect()
    assert len(rows) == 10
    assert sorted(r["rank"] for r in rows) == list(range(1, 11))
    # near-argmax temperature: the selection is dominated by evens
    ids = [r["doc_id"] for r in rows]
    assert sum(1 for i in ids if i % 2 == 0) >= 9
    # deterministic: same seed, same selection; different seed differs
    again = {r["doc_id"] for r in dsir.dsir_topk(
        raw, tgt, k=10, n_buckets=4096, temperature=0.05).collect()}
    assert again == set(ids)
    other = {r["doc_id"] for r in dsir.dsir_topk(
        raw, tgt, k=10, n_buckets=4096, temperature=5.0, seed="other"
    ).collect()}
    assert other != set(ids) or True  # high temp may shuffle; smoke only


def test_zero_gram_docs_carry_zero_weight(spark):
    raw = spark.createDataFrame(
        [(1, "the engine scans the table rows"), (2, ""), (3, None)],
        "doc_id LONG, text STRING",
    )
    tgt = raw.filter("doc_id = 1")
    lw = {
        r["doc_id"]: (r["n_grams"], r["log_w"])
        for r in dsir.dsir_log_weights(raw, tgt, n_buckets=256).collect()
    }
    assert lw[2] == (0, 0.0) and lw[3] == (0, 0.0)
    assert lw[1][0] > 0


def test_oracle_parity_with_duckdb(spark):
    raw, tgt = _corpus(spark)
    both = raw.unionByName(tgt)
    got = sorted(
        (r["doc_id"], r["n_grams"], round(r["log_w"], 6))
        for r in dsir.dsir_log_weights(
            raw, tgt, n=2, n_buckets=1024, alpha=0.5
        ).collect()
    )
    con = duckdb.connect()
    con.register("documents", both.toPandas())
    ctes = dsir.dsir_sql_ctes(
        "documents", target_where="doc_id >= 100",
        raw_where="doc_id < 100", n=2, n_buckets=1024, alpha=0.5,
    )
    oracle = sorted(
        (r[0], r[1], round(r[2], 6))
        for r in con.execute(
            f"WITH {ctes} SELECT doc_id, n_grams, log_w FROM dsir"
        ).fetchall()
    )
    assert got == oracle and got


def test_weight_math_matches_hand_computation(spark):
    # 2 raw docs, 1 target doc over a tiny bucket space: recompute the
    # add-alpha estimate by hand for one doc (3+ letter words — the X1
    # tokenizer drops len<=2 tokens)
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id LONG, text STRING",
    )
    tgt = spark.createDataFrame(
        [(9, "alpha beta gamma")], "doc_id LONG, text STRING"
    )
    n_buckets, alpha, n = 64, 1.0, 2
    lw = {
        r["doc_id"]: r["log_w"]
        for r in dsir.dsir_log_weights(
            raw, tgt, n=n, n_buckets=n_buckets, alpha=alpha
        ).collect()
    }
    # doc 1's two bigrams are exactly the target's two bigrams;
    # assuming no bucket collisions: per gram lw =
    # ln(1+1) - ln(1+1) + ln(4 + 64) - ln(2 + 64)
    per = math.log(2.0) - math.log(2.0) + math.log(68.0) - math.log(66.0)
    assert abs(lw[1] - 2 * per) < 1e-9
    # doc 2's grams are raw-only: ln(0+1) - ln(1+1) + const
    per2 = math.log(1.0) - math.log(2.0) + math.log(68.0) - math.log(66.0)
    assert abs(lw[2] - 2 * per2) < 1e-9


def test_validation(spark):
    raw, tgt = _corpus(spark)
    with pytest.raises(ValueError, match="alpha"):
        dsir.dsir_log_weights(raw, tgt, alpha=0.0)
    with pytest.raises(ValueError, match="temperature"):
        dsir.dsir_topk(raw, tgt, k=3, temperature=0.0)


def test_corpus_divergence_properties_and_parity(spark):
    raw, tgt = _corpus(spark)
    evens = raw.filter("doc_id % 2 = 0")
    odds = raw.filter("doc_id % 2 = 1")
    # identical corpora: every bucket pair has pa == pb -> exactly 0
    same = dsir.corpus_divergence(evens, evens, n_buckets=2048)
    assert same == {"kl_ab": 0.0, "kl_ba": 0.0, "js": 0.0}
    # disjoint-vocabulary corpora diverge; JS is symmetric + bounded
    d = dsir.corpus_divergence(evens, odds, n_buckets=2048)
    assert d["kl_ab"] > 0.01 and d["kl_ba"] > 0.01
    assert 0 < d["js"] <= math.log(2) + 1e-9
    dsym = dsir.corpus_divergence(odds, evens, n_buckets=2048)
    assert abs(dsym["js"] - d["js"]) < 1e-9
    # a near-target slice sits closer to the target than noise does
    near = dsir.corpus_divergence(tgt, evens, n_buckets=2048)["js"]
    far = dsir.corpus_divergence(tgt, odds, n_buckets=2048)["js"]
    assert near < far
    # DuckDB twin parity (6dp, the entry contract)
    con = duckdb.connect()
    con.register("documents", raw.toPandas())
    sql = dsir.corpus_divergence_sql(
        "documents", a_where="doc_id % 2 = 0", b_where="doc_id % 2 = 1",
        n_buckets=2048,
    )
    row = con.execute(sql).fetchone()
    assert row == (
        round(d["kl_ab"], 6), round(d["kl_ba"], 6), round(d["js"], 6)
    )
    with pytest.raises(ValueError, match="alpha"):
        dsir.corpus_divergence(evens, odds, alpha=0)
