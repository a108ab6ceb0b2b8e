"""Pinned query + vector range search semantics and differentials."""

from __future__ import annotations

import pytest

from same_same_spark.operators.pinned import (
    duckdb_pinned_sql,
    pinned_search,
)

DOCS = [
    (1, "apple banana cherry"),
    (2, "apple banana"),
    (3, "apple"),
    (4, "banana dates"),
    (5, "unrelated text here"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def test_pinned_order_and_organic_tail(spark):
    out = pinned_search(
        _docs_df(spark),
        [(1, "apple banana", [5, 99, 3, 3])],  # 99 missing, 3 dup
        k=5, id_col="doc_id", text_col="text",
    ).orderBy("rank").collect()
    # pins: 5 (non-matching doc still pinned), missing 99 skipped,
    # 3 once; organic = BM25 over {1,2,4} (3 and 5 excluded)
    assert [r["doc_id"] for r in out][:2] == [5, 3]
    assert [r["score"] for r in out][:2] == [None, None]
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    organic_ids = [r["doc_id"] for r in out][2:]
    assert set(organic_ids) == {1, 2, 4}
    assert all(r["score"] is not None for r in out[2:])


def test_pinned_truncation_and_k(spark):
    out = pinned_search(
        _docs_df(spark), [(1, "apple", [4, 5, 1, 2])], k=3,
        id_col="doc_id", text_col="text",
    ).orderBy("rank").collect()
    assert [r["doc_id"] for r in out] == [4, 5, 1]
    with pytest.raises(ValueError, match="k must be"):
        pinned_search(
            _docs_df(spark), [(1, "apple", [])], k=0,
            id_col="doc_id", text_col="text",
        )


def test_pinned_duckdb_differential(spark):
    import duckdb

    qs = [
        (1, "apple banana", [5, 3]),
        (2, "dates", [2, 77]),
        (3, "zzz nothing", [1]),   # pins only, no organic match
        (4, "apple", []),          # organic only
    ]
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"],
         None if r["score"] is None else round(r["score"], 6))
        for r in pinned_search(
            _docs_df(spark), qs, k=4, id_col="doc_id", text_col="text"
        ).collect()
    )
    con = duckdb.connect()
    con.register("docs_tbl", _docs_df(spark).toPandas())
    want = sorted(
        (q, rk, d, s)
        for q, d, s, rk in con.sql(
            duckdb_pinned_sql("docs_tbl", "doc_id", "text", qs, k=4)
        ).fetchall()
    )
    assert got == want


def test_range_search_threshold_and_cap(spark):
    from same_same_spark.pipeline.ann import brute_topk, range_search

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
            (4, [-1.0, 0.0]),
            (9, [1.0, 0.0, 0.0]),  # dim mismatch ignored
        ],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    qs = [(0, [1.0, 0.0])]
    out = range_search(emb, qs, min_score=0.5).collect()
    assert [r["vec_id"] for r in out] == [1, 2]
    assert [r["rank"] for r in out] == [1, 2]
    # threshold compares at rank precision: a score exactly at the
    # cut stays in
    exact = range_search(emb, qs, min_score=1.0).collect()
    assert [r["vec_id"] for r in exact] == [1]
    # cap truncates under the pinned order and agrees with top-k
    capped = range_search(emb, qs, min_score=-1.0, max_results=3)
    top3 = brute_topk(emb, qs, k=3)
    assert [tuple(r) for r in capped.collect()] == [
        tuple(r) for r in top3.collect()
    ]
    with pytest.raises(ValueError, match="max_results"):
        range_search(emb, qs, min_score=0.0, max_results=0)
