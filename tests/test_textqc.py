"""Text analysis: token counts, quality, language ID, winnowing."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline import textqc


def _one(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")


def test_token_counts(spark):
    df = _one(spark, "hello world, foo.bar()  baz")
    [r] = df.select(
        textqc.ws_token_count_col("text").alias("ws"),
        textqc.bpe_token_count_col("text").alias("bpe"),
    ).collect()
    assert r["ws"] == 4
    # hello world , foo . bar ( ) baz → 5 words + 4 symbols
    assert r["bpe"] == 9
    [r0] = _one(spark, "   ").select(
        textqc.ws_token_count_col("text").alias("ws"),
        textqc.bpe_token_count_col("text").alias("bpe"),
    ).collect()
    assert r0["ws"] == 0 and r0["bpe"] == 0


def test_quality_scores(spark):
    cols = textqc.quality_cols("text")
    df = _one(spark, "the cat is on the mat and it is happy with the sun")
    [r] = df.select(*[v.alias(k) for k, v in cols.items()]).collect()
    assert r["ws_tokens"] == 13
    assert 0.4 < r["stopword_ratio"] <= 1.0  # prose-like
    assert r["punct_ratio"] == 0.0
    assert 0.0 <= r["quality_score"] <= 1.0
    [junk] = _one(spark, "@@@ ### $$$ %%%").select(
        *[v.alias(k) for k, v in cols.items()]
    ).collect()
    assert junk["stopword_ratio"] == 0.0
    assert junk["punct_ratio"] > 0.5
    assert junk["quality_score"] < r["quality_score"]


def test_lang_id(spark):
    cases = [
        (1, "the cat is on the mat and that is fine", "en"),
        (2, "der hund und die katze ist nicht da", "de"),
        (3, "el perro y la casa es grande en la calle", "es"),
        (4, "le chien est dans la maison pour les vacances", "fr"),
        (5, "zzz qqq www", "und"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select("doc_id", textqc.lang_id_col("text").alias("lang")).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"


def test_lang_id_oracle_parity(spark):
    texts = [
        (1, "the cat is on the mat"),
        (2, "der hund und die katze"),
        (3, "no markers here whatsoever"),
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select("doc_id", textqc.lang_id_col("text").alias("lang")).collect()
    }
    con = duckdb.connect()
    for i, t in texts:
        [(want,)] = con.sql(
            f"SELECT {textqc.lang_id_sql('t')} FROM (SELECT '{t}' AS t)"
        ).fetchall()
        assert got[i] == want


def test_winnow_fingerprints(spark):
    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog"),
            (2, "the   quick brown fox jumps over the lazy dog"),  # ws + case
            (3, "completely different text with nothing shared at all"),
        ],
        "doc_id LONG, text STRING",
    )
    fps = textqc.winnow_fingerprints(df, k=8, w=4)
    by_id = {}
    for r in fps.collect():
        by_id.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_id[1] == by_id[2]  # normalization-invariant
    assert by_id[1] != by_id[3]
    # density: winnowing keeps roughly 2/(w+1) of gram positions
    n_grams = len("the quick brown fox jumps over the lazy dog") - 7
    assert len(by_id[1]) < n_grams


def test_winnow_short_text(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id LONG, text STRING")
    assert textqc.winnow_fingerprints(df, k=8, w=4).count() == 0


def test_winnow_oracle_parity(spark):
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        "(1, 'The quick brown fox jumps over the lazy dog'), "
        "(2, 'winnowing parity check text')) AS t(doc_id, text)"
    )
    oracle = {
        (r[0], r[1])
        for r in con.sql(
            textqc.winnow_sql("doc_id", "text", "d", k=8, w=4)
        ).fetchall()
    }
    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog"),
            (2, "winnowing parity check text"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        (r["doc_id"], r["fp"])
        for r in textqc.winnow_fingerprints(df, k=8, w=4).collect()
    }
    assert got == oracle
