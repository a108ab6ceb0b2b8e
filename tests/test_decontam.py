"""Benchmark decontamination (pipeline/decontam.py)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from same_same_spark.pipeline.decontam import (
    contamination_flags,
    contamination_sql,
    decontaminate,
)

_EVAL = [
    (100, "alpha bravo charlie delta echo foxtrot golf hotel india juliett"),
    (101, "kilo lima mike"),  # < n tokens: whole-sequence shingle
]
_TRAIN = [
    # contains an exact 8-gram of eval 100 → contaminated
    (1, "prefix words alpha bravo charlie delta echo foxtrot golf hotel "
        "and a suffix tail"),
    # clean: no 8-token overlap
    (2, "totally unrelated content about window aggregation over streams "
        "with the batch engine and the merge step"),
    # shares only a 7-gram (the eval 8-grams all broken by 'zebra',
    # which survives tokenization unlike stopwords/short tokens) →
    # clean at n=8
    (3, "alpha bravo charlie delta echo foxtrot golf zebra hotel india "
        "juliett extra words here"),
    # verbatim copy of the SHORT eval doc → whole-sequence match
    (4, "kilo lima mike"),
    # superset of the short eval doc: its whole-sequence shingle differs
    # and it is too long to produce the eval's 3-token shingle → clean
    (5, "kilo lima mike november oscar papa quebec romeo sierra tango"),
    (6, ""),  # empty: zero shingles, clean
]


def _dfs(spark):
    t = spark.createDataFrame(_TRAIN, "doc_id LONG, text STRING")
    e = spark.createDataFrame(_EVAL, "doc_id LONG, text STRING")
    return t, e


def test_contamination_flags(spark):
    t, e = _dfs(spark)
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hit_shingles"], r["contaminated"])
        for r in contamination_flags(t, e, n=8).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6}
    assert got[1][2] is True and got[1][1] >= 1
    assert got[2] == (got[2][0], 0, False)
    assert got[3][2] is False  # 7-gram overlap is not enough at n=8
    assert got[4] == (1, 1, True)  # verbatim short-doc copy
    assert got[5][2] is False
    assert got[6] == (0, 0, False)


def test_decontaminate_filters(spark):
    t, e = _dfs(spark)
    kept = sorted(
        r["doc_id"] for r in decontaminate(t, e, n=8).collect()
    )
    assert kept == [2, 3, 5, 6]
    # threshold policy: allow up to 20% shingle overlap
    kept_loose = {
        r["doc_id"]
        for r in decontaminate(t, e, n=8, max_hit_frac=0.2).collect()
    }
    assert {2, 3, 5, 6} <= kept_loose


def test_contamination_oracle_parity(spark):
    t, e = _dfs(spark)
    got = sorted(
        (r["doc_id"], r["n_shingles"], r["n_hit_shingles"],
         round(r["hit_frac"], 6), r["contaminated"])
        for r in contamination_flags(t, e, n=8).collect()
    )
    con = duckdb.connect()
    con.register("train", t.toPandas())
    con.register("ev", e.toPandas())
    sql = contamination_sql("train", "ev", n=8)
    oracle = sorted(
        (r[0], r[1], r[2], round(r[3], 6), bool(r[4]))
        for r in con.execute(sql).fetchall()
    )
    assert got == oracle


def test_shuffle_join_variant_identical(spark):
    t, e = _dfs(spark)
    a = sorted(map(tuple, contamination_flags(t, e, n=8).collect()))
    b = sorted(
        map(tuple,
            contamination_flags(t, e, n=8, broadcast_eval=False).collect())
    )
    assert a == b
