"""Corpus profiling (pipeline/profile.py)."""

from __future__ import annotations

import duckdb
import pytest

from same_same_spark.pipeline.profile import corpus_profile, corpus_profile_sql

_DOCS = [
    (1, "alpha bravo charlie delta", "en"),
    (2, "alpha bravo charlie delta", "en"),      # exact dup of 1
    (3, "echo foxtrot golf hotel india juliett", "en"),
    (4, "kilo lima", "de"),
    (5, "", "de"),                               # empty doc: 0 tokens
]


def _df(spark):
    return spark.createDataFrame(_DOCS, "doc_id LONG, text STRING, lang STRING")


def test_corpus_profile_values(spark):
    got = {
        r["stratum"]: r for r in corpus_profile(_df(spark)).collect()
    }
    en, de = got["en"], got["de"]
    assert en["n_docs"] == 3 and en["total_tokens"] == 4 + 4 + 6
    assert en["n_distinct_texts"] == 2
    assert en["dup_rate"] == pytest.approx(1 / 3)
    assert en["p50_tokens"] == pytest.approx(4.0)
    assert de["n_docs"] == 2 and de["total_tokens"] == 2
    assert de["dup_rate"] == 0.0
    assert de["p50_tokens"] == pytest.approx(1.0)  # interpolated (0+2)/2


def test_corpus_profile_oracle_parity(spark):
    df = _df(spark)
    got = sorted(
        (r["stratum"], r["n_docs"], r["total_tokens"],
         round(r["mean_tokens"], 6), round(r["p50_tokens"], 6),
         round(r["p90_tokens"], 6), round(r["mean_quality"], 6),
         r["n_distinct_texts"], round(r["dup_rate"], 6))
        for r in corpus_profile(df).collect()
    )
    con = duckdb.connect()
    con.register("d", df.toPandas())
    oracle = sorted(
        (r[0], r[1], r[2], round(r[3], 6), round(r[4], 6),
         round(r[5], 6), round(r[6], 6), r[7], round(r[8], 6))
        for r in con.execute(corpus_profile_sql("d")).fetchall()
    )
    assert got == oracle
