"""BM25 naive scorer: semantics + DuckDB differential + reference goldens.

Re-expressions of the reference retrieval tests (SURVEY §5):
- TestSearchBasic (memory_test.go:29-54) → top-k returns k docs, unique
  best match first,
- dim-mismatch (memory_test.go:56-71) → degenerate query (zero tokens
  after X1) returns zero results.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from same_same_spark.bm25 import duckdb_bm25_sql, score_queries
from same_same_spark.text.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "zebra quantum flux unique marker"),
        (2, "common words appear here together often"),
        (3, "common words appear here also nothing special"),
        (4, "quantum mechanics common words appear"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, content STRING")


def test_unique_term_ranks_first(tiny_docs):
    # doc 1 has zebra+quantum, doc 4 only quantum → doc 1 must rank first
    res = score_queries(tiny_docs, [(0, "zebra quantum")], k=5).collect()
    assert len(res) == 2
    assert res[0]["doc_id"] == 1 and res[0]["rank"] == 1
    assert res[0]["score"] > res[1]["score"]


def test_topk_truncates(tiny_docs):
    res = score_queries(tiny_docs, [(0, "common words appear")], k=2).collect()
    assert len(res) == 2  # 3 docs match, k=2 keeps best two


def test_empty_query_zero_results(tiny_docs):
    # "a an 12 !!" tokenizes to [] — reference dim-mismatch analogue
    res = score_queries(tiny_docs, [(0, "a an 12 !!")], k=10).collect()
    assert res == []


def test_tie_break_doc_id_asc(spark):
    rows = [(7, "alpha beta"), (3, "alpha beta"), (5, "alpha beta")]
    docs = spark.createDataFrame(rows, "doc_id LONG, content STRING")
    res = score_queries(docs, [(0, "alpha")], k=3).collect()
    assert [r["doc_id"] for r in res] == [3, 5, 7]


def test_manual_bm25_value(spark):
    """Hand-computed score for a 2-doc corpus pins the formula."""
    docs = spark.createDataFrame(
        [(1, "apple banana cherry"), (2, "apple apple durian fig grape")],
        "doc_id LONG, content STRING",
    )
    res = {
        r["doc_id"]: r["score"]
        for r in score_queries(docs, [(0, "apple")], k=10).collect()
    }
    n, avgdl, k1, b = 2, 4.0, 1.2, 0.75
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

    def w(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert res[1] == pytest.approx(w(1, 3), abs=1e-12)
    assert res[2] == pytest.approx(w(2, 5), abs=1e-12)


QUERIES = [
    (0, "fast merge join sort"),
    (1, "spark query data"),
    (2, "window stream batch customer"),
    (3, "zzz-nonexistent"),
]


def test_differential_vs_duckdb(documents):
    spark_res = (
        score_queries(documents, QUERIES, k=10, id_col="doc_id", text_col="text")
        .withColumn("score", F.round("score", 6))
        .collect()
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"]) for r in spark_res
    }

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    sql = duckdb_bm25_sql("documents", "doc_id", "text", QUERIES, k=10)
    want = {
        (qid, did): (score, rank)
        for qid, did, score, rank in con.sql(sql).fetchall()
    }
    assert set(got) == set(want)
    for key in want:
        assert got[key][1] == want[key][1], f"rank mismatch at {key}"
        assert got[key][0] == pytest.approx(want[key][0], abs=1e-9)
