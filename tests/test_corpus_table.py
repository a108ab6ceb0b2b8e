"""Corpus-table reader (Iceberg-shaped input)."""

from __future__ import annotations

import pytest

from same_same_spark.corpus import generate_corpus, with_sha, verify_sha
from same_same_spark.sources.corpus_table import CORPUS_COLUMNS, read_corpus


def test_read_corpus_parquet(spark, tmp_path):
    p = str(tmp_path / "corpus")
    generate_corpus(spark, 200).write.parquet(p)
    df = read_corpus(spark, p)
    assert df.columns == CORPUS_COLUMNS
    assert df.count() == 200
    langs = read_corpus(spark, p, langs=["go", "py"])
    assert 0 < langs.count() < 200
    assert set(
        r["lang"] for r in langs.select("lang").distinct().collect()
    ) <= {"go", "py"}


def test_read_corpus_missing_columns(spark, tmp_path):
    p = str(tmp_path / "bad")
    spark.range(5).write.parquet(p)
    with pytest.raises(ValueError, match="missing columns"):
        read_corpus(spark, p)


def test_sha_invariant_roundtrip(spark, tmp_path):
    """input_hint invariant: sha256(content) survives write/read."""
    p = str(tmp_path / "sha")
    with_sha(generate_corpus(spark, 100)).write.parquet(p)
    back = spark.read.parquet(p)
    assert verify_sha(back) == 0
