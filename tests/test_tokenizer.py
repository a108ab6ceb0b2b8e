"""X1 tokenizer goldens + four-way differential equivalence.

Golden cases re-express the reference tokenizer's semantics
(tfidf.go:48-83): lowercase fold, `[^a-z\\s]+`→space, whitespace split,
59 stopwords dropped, len<=2 dropped, non-ASCII treated as separators.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from same_same_spark.text.tokenizer import (
    STOPWORDS,
    duckdb_tokens_sql,
    tokenize_pandas_udf,
    tokenize_py,
    tokens_col,
)

GOLDENS = [
    # uppercase folding
    ("Imagination IS More Important", ["imagination", "more", "important"]),
    # punctuation/digit stripping: every [^a-z\s] run becomes a space
    ("foo_bar123baz qux-2000!", ["foo", "bar", "baz", "qux"]),
    # stopwords dropped even when long ("should", "their")
    ("should we keep their wisdom", ["keep", "wisdom"]),
    # len<=2 dropped post-strip ("go" survives? no: len 2 → dropped)
    ("go fn ab abc", ["abc"]),
    # unicode: non-ASCII are separators (Go \s is ASCII-only, class strips é)
    ("café résumé naïve", ["caf", "sum"]),  # "na"/"ve"/"r" len<=2 dropped
    # NBSP and tabs/newlines as separators
    ("alpha beta\tgamma\ndelta", ["alpha", "beta", "gamma", "delta"]),
    # empty-after-filtering ⇒ zero tokens ⇒ (downstream) zero results
    ("a an 12 !!", []),
    ("", []),
    # code-like line
    ("func handlerImpl(ctx *Context) error {", ["func", "handlerimpl", "ctx", "context", "error"]),
]


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_tokenize_py_goldens(text, expected):
    assert tokenize_py(text) == expected


def test_stopword_count_matches_reference():
    # tfidf.go:60-73 declares exactly these words (59 distinct)
    assert len(STOPWORDS) == 59
    assert "the" in STOPWORDS and "their" in STOPWORDS and "am" in STOPWORDS


def test_spark_column_expr_matches_python(spark):
    texts = [t for t, _ in GOLDENS] + [None]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i INT, text STRING")
    rows = (
        df.select("i", tokens_col("text").alias("toks"))
        .orderBy("i")
        .collect()
    )
    for (i, text), row in zip(enumerate(texts), rows):
        assert row["toks"] == tokenize_py(text), f"mismatch on {text!r}"


def test_pandas_udf_matches_python(spark):
    texts = [t for t, _ in GOLDENS] + [None]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i INT, text STRING")
    rows = (
        df.select("i", tokenize_pandas_udf("text").alias("toks"))
        .orderBy("i")
        .collect()
    )
    for (i, text), row in zip(enumerate(texts), rows):
        assert row["toks"] == tokenize_py(text), f"mismatch on {text!r}"


def test_duckdb_sql_matches_python():
    con = duckdb.connect()
    for text, expected in GOLDENS:
        lit = "'" + text.replace("'", "''") + "'"
        got = con.sql(f"SELECT {duckdb_tokens_sql(lit)} AS t").fetchone()[0]
        assert got == expected, f"duckdb mismatch on {text!r}"


def test_real_documents_agree(spark, documents):
    """Column-expr vs pandas-UDF vs DuckDB on real driver testdata."""
    sample = documents.limit(200)
    got = dict(
        sample.select("doc_id", tokens_col("text").alias("t")).collect()
    )
    got_udf = dict(
        sample.select("doc_id", tokenize_pandas_udf("text").alias("t")).collect()
    )
    pdf = sample.select("doc_id", "text").toPandas()
    for _, r in pdf.iterrows():
        expect = tokenize_py(r["text"])
        assert got[r["doc_id"]] == expect
        assert got_udf[r["doc_id"]] == expect
