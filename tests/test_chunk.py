"""Chunking + passage retrieval: window invariants, DuckDB twins,
BM25 composition."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from same_same_spark.operators.chunk import (
    chunk_documents,
    chunk_sql,
    passage_topk,
    passage_topk_sql,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_window_invariants(spark):
    """Every char covered, consecutive windows overlap exactly
    `overlap`, last window reaches the end, len ≤ size → one chunk,
    NULL/empty → none."""
    rows = [
        (1, "x" * 500),
        (2, "y" * 80),      # == size → one chunk
        (3, "z" * 81),      # one past size → two chunks
        (4, ""),
        (5, None),
        (6, "w"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = chunk_documents(df, size=80, overlap=20)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2, 3, 6}
    assert len(by_doc[2]) == 1 and len(by_doc[3]) == 2
    assert len(by_doc[6]) == 1 and by_doc[6][0]["chunk_text"] == "w"
    text = dict(rows)[1]
    chunks = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    step = 80 - 20
    covered_to = 0
    for i, c in enumerate(chunks):
        assert c["chunk_start"] == i * step
        assert c["chunk_text"] == text[c["chunk_start"]:c["chunk_start"] + 80]
        covered_to = max(covered_to, c["chunk_start"] + len(c["chunk_text"]))
    assert covered_to == len(text)  # the final window reaches the end
    # reconstruction: overlaying each window at its start offset
    # re-creates the doc exactly
    rebuilt = chunks[0]["chunk_text"]
    for c in chunks[1:]:
        rebuilt = rebuilt[: c["chunk_start"]] + c["chunk_text"]
    assert rebuilt == text


def test_chunk_truncation_and_geometry():
    from same_same_spark.operators.chunk import _check_geometry

    assert _check_geometry(200, 50) == 150
    for size, ov in [(0, 0), (10, 10), (10, 12), (-5, 0), (10, -1)]:
        with pytest.raises(ValueError, match="geometry"):
            _check_geometry(size, ov)


def test_chunk_max_chunks_truncates_both_engines(spark):
    df = spark.createDataFrame([(1, "a" * 1000)], "doc_id LONG, text STRING")
    got = chunk_documents(df, size=100, overlap=50, max_chunks=3).collect()
    assert sorted(r["chunk_id"] for r in got) == [0, 1, 2]
    con = duckdb.connect()
    con.register("t", pd.DataFrame([(1, "a" * 1000)], columns=["doc_id", "text"]))
    want = con.sql(chunk_sql("t", size=100, overlap=50, max_chunks=3)).fetchall()
    assert sorted(r[1] for r in want) == [0, 1, 2]


def test_chunk_sql_twin_full_value(spark, docs):
    got = sorted(
        tuple(r)
        for r in chunk_documents(docs, size=90, overlap=30)
        .select("doc_id", "chunk_id", "chunk_start", "chunk_text")
        .collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.sql(chunk_sql("documents", size=90, overlap=30)).fetchall()
    )
    assert got == want


def test_passage_topk_matches_sql_twin(spark, docs):
    qs = [(0, "fast merge join sort"), (1, "window aggregate shuffle")]
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["chunk_id"], round(r["score"], 6))
        for r in passage_topk(docs, qs, k=8, size=90, overlap=30).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = sorted(
        (r[0], r[4], r[1], r[2], round(r[3], 6))
        for r in con.sql(
            passage_topk_sql("documents", qs, k=8, size=90, overlap=30)
        ).fetchall()
    )
    assert got == want


def test_passage_scores_are_chunk_level_bm25(spark):
    """A doc whose match is CONCENTRATED in one window outranks a doc
    where the same terms are spread thin — the whole point of passage
    retrieval (doc-level BM25 cannot see this)."""
    concentrated = ("filler " * 30) + "merge join merge join merge join " + (
        "filler " * 30
    )
    spread = ("merge " + "filler " * 20 + "join " + "filler " * 20) * 2
    df = spark.createDataFrame(
        [(1, concentrated), (2, spread)], "doc_id LONG, text STRING"
    )
    out = passage_topk(df, [(0, "merge join")], k=4, size=120, overlap=30)
    ranked = [r["doc_id"] for r in out.orderBy("rank").collect()]
    assert ranked[0] == 1
