"""FilterExpr compiler — the reference truth tables, re-run on Spark.

Every case from ``internal/models/filter_test.go:1-205`` appears here
with the same inputs and expected outcomes, evaluated through the
compiled Column against a MAP<STRING,STRING> metadata column.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from same_same_spark.operators.filters import compile_filters, matches_metadata


def _eval(spark, metadata: dict | None, filters: dict) -> bool:
    """Evaluate filters against a single row carrying ``metadata``."""
    df = spark.createDataFrame(
        [(metadata or {},)], "metadata MAP<STRING,STRING>"
    )
    return df.filter(compile_filters(filters, metadata_col="metadata")).count() == 1


# (name, metadata, filters, expected) — filter_test.go truth tables
CASES = [
    # eq (:7-30)
    ("eq exact match", {"f": "Einstein"}, {"f": {"eq": "Einstein"}}, True),
    ("eq no match", {"f": "Einstein"}, {"f": {"eq": "Newton"}}, False),
    ("eq field missing", {}, {"f": {"eq": "Einstein"}}, False),
    # neq (:32-54)
    ("neq not equal", {"f": "Einstein"}, {"f": {"neq": "Newton"}}, True),
    ("neq equal fails", {"f": "Einstein"}, {"f": {"neq": "Einstein"}}, False),
    ("neq field missing is false", {}, {"f": {"neq": "Newton"}}, False),
    # comparisons on numeric-as-string (:56-82)
    ("gt true", {"f": "1950"}, {"f": {"gt": 1900}}, True),
    ("gt false", {"f": "1850"}, {"f": {"gt": 1900}}, False),
    ("gte true", {"f": "1900"}, {"f": {"gte": 1900}}, True),
    ("lt true", {"f": "1850"}, {"f": {"lt": 1900}}, True),
    ("lt false", {"f": "1950"}, {"f": {"lt": 1900}}, False),
    ("lte true", {"f": "1900"}, {"f": {"lte": 1900}}, True),
    # string fallback when either side is non-numeric (filter.go:146-150)
    ("gt string fallback", {"f": "beta"}, {"f": {"gt": "alpha"}}, True),
    ("lt string fallback", {"f": "alpha"}, {"f": {"lt": "beta"}}, True),
    # between (:84-109)
    ("between in range", {"f": "1925"}, {"f": {"between": [1900, 1950]}}, True),
    ("between below", {"f": "1850"}, {"f": {"between": [1900, 1950]}}, False),
    ("between above", {"f": "2000"}, {"f": {"between": [1900, 1950]}}, False),
    ("between lower bound", {"f": "1900"}, {"f": {"between": [1900, 1950]}}, True),
    ("between upper bound", {"f": "1950"}, {"f": {"between": [1900, 1950]}}, True),
    ("between non-numeric value", {"f": "abc"}, {"f": {"between": [1, 2]}}, False),
    ("between malformed range", {"f": "5"}, {"f": {"between": [1]}}, False),
    # contains (:111-134)
    ("contains substring", {"f": "science,physics"}, {"f": {"contains": "science"}}, True),
    ("contains case insensitive", {"f": "SCIENCE"}, {"f": {"contains": "science"}}, True),
    ("contains not", {"f": "mathematics"}, {"f": {"contains": "science"}}, False),
    # in (:136-158)
    ("in list", {"f": "Einstein"}, {"f": {"in": ["Einstein", "Bohr", "Heisenberg"]}}, True),
    ("in not in list", {"f": "Newton"}, {"f": {"in": ["Einstein", "Bohr"]}}, False),
    ("in stringified numbers", {"f": "1950"}, {"f": {"in": [1950, 1960]}}, True),
    # exists (:160-183)
    ("exists true", {"f": "value"}, {"f": {"exists": True}}, True),
    ("exists false on missing", {}, {"f": {"exists": False}}, True),
    ("exists false but present", {"f": "value"}, {"f": {"exists": False}}, False),
    ("exists non-bool expected", {"f": "v"}, {"f": {"exists": "yes"}}, False),
    # unknown operator ⇒ false (filter.go:126-127)
    ("unknown op", {"f": "v"}, {"f": {"regex": ".*"}}, False),
    # composite (:185-204)
    (
        "complex filter",
        {"author": "Einstein", "year": "1925", "tags": "physics,relativity,science"},
        {
            "author": {"eq": "Einstein"},
            "year": {"gte": 1900, "lte": 1950},
            "tags": {"contains": "science"},
        },
        True,
    ),
    # no filters ⇒ match all (filter.go:63-65)
    ("empty filters", {"a": "1"}, {}, True),
]


@pytest.mark.parametrize("name,metadata,filters,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_filter_truth_tables(spark, name, metadata, filters, expected):
    assert _eval(spark, metadata, filters) is expected


def test_matches_metadata_truth_table(spark):
    """memory_test.go:9-27 — legacy exact-equality AND matching."""
    cases = [
        ({"a": "1", "b": "2"}, {"a": "1"}, True),
        ({"a": "1", "b": "2"}, {"b": "2"}, True),
        ({"a": "1", "b": "2"}, {"a": "2"}, False),
        ({"a": "1", "b": "2"}, {"c": "3"}, False),
        ({"a": "1"}, {}, True),
    ]
    for meta, query, want in cases:
        df = spark.createDataFrame([(meta,)], "metadata MAP<STRING,STRING>")
        got = df.filter(matches_metadata(query)).count() == 1
        assert got is want, (meta, query)


def test_column_mode_on_plain_columns(spark):
    df = spark.createDataFrame(
        [(1, "en", 150), (2, "de", 90), (3, "en", 300)],
        "id INT, lang STRING, n_chars INT",
    )
    pred = compile_filters(
        {"lang": {"eq": "en"}, "n_chars": {"between": [100, 400]}},
        metadata_col=None,
        df=df,
    )
    assert sorted(r["id"] for r in df.filter(pred).collect()) == [1, 3]
    # missing column behaves like missing field
    pred2 = compile_filters({"nope": {"neq": "x"}}, metadata_col=None, df=df)
    assert df.filter(pred2).count() == 0


def test_filter_pushdown_reaches_scan(spark, documents):
    """Column-mode predicates must appear in PushedFilters (the whole
    point of compiling to Columns instead of evaluating per-row)."""
    pred = compile_filters({"lang": {"eq": "en"}}, metadata_col=None, df=documents)
    plan = documents.filter(pred)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan
