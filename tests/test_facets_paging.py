"""Unit tests for faceted search and keyset pagination: brute-force
differentials here, the cross-engine DuckDB differential through the
registry gate in test_entry.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from same_same_spark.bm25 import scored_matches
from same_same_spark.operators.facets import search_facets
from same_same_spark.operators.topk import search_after, topk_per_query
from same_same_spark.text.tokenizer import tokenize_py

DOCS = [
    # (doc_id, text, lang, source)
    (1, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (2, "quick brown quick brown quick", "en", "book"),
    (3, "brown fox? brown FOX! brown fox", "de", "web"),
    (4, "dog dog dog dog", "en", "web"),
    (5, "nothing relevant here whatsoever", "de", "book"),
    (6, "", "en", None),
    (7, "fox quick brown", None, "news"),
    (8, "quince quantum quack quick", "fr", "news"),
]


def _docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id LONG, text STRING, lang STRING, source STRING"
    )


def _brute_facets(query: str, cols: list[str], topn: int):
    qterms = set(tokenize_py(query))
    matched = [
        row for row in DOCS if qterms & set(tokenize_py(row[1]))
    ]
    out = []
    col_idx = {"lang": 2, "source": 3}
    for c in cols:
        counts: dict[str, int] = {}
        for row in matched:
            v = row[col_idx[c]]
            if v is not None:
                counts[v] = counts.get(v, 0) + 1
        vals = sorted(counts, key=lambda v: (-counts[v], v))[:topn]
        out += [
            (c, v, counts[v], i + 1) for i, v in enumerate(vals)
        ]
    return sorted(out)


@pytest.mark.parametrize(
    "query",
    [
        "quick fox",     # matches across langs/sources incl. NULLs
        "dog",           # small match set
        "quack quince",  # single doc
        "the a an",      # zero tokens -> no rows
        "missingzz",     # no matches -> no rows
    ],
)
def test_facets_match_brute_force(spark, query):
    got = sorted(
        (r["facet"], r["value"], r["doc_count"], r["rank"])
        for r in search_facets(
            _docs_df(spark), [(1, query)], ["lang", "source"], topn=5,
            id_col="doc_id", text_col="text",
        ).collect()
    )
    assert got == _brute_facets(query, ["lang", "source"], 5), query


def test_facets_topn_cap_and_ties(spark):
    """topn keeps the highest counts, ties by value ASC."""
    got = [
        (r["value"], r["doc_count"])
        for r in sorted(
            search_facets(
                _docs_df(spark), [(1, "quick fox dog")], ["lang"], topn=1,
                id_col="doc_id", text_col="text",
            ).collect(),
            key=lambda r: r["rank"],
        )
    ]
    # matched: docs 1,2,3,4,7,8 -> lang counts en=3 de=1 fr=1 (doc 7 NULL)
    assert got == [("en", 3)]


def test_facets_empty_cols_raises(spark):
    with pytest.raises(ValueError):
        search_facets(_docs_df(spark), [(1, "quick")], [])


# --------------------------------------------------------------------------
# search_after
# --------------------------------------------------------------------------


def _pages(spark, queries, k):
    docs = _docs_df(spark)
    scored = scored_matches(docs, queries, id_col="doc_id", text_col="text")
    page1 = topk_per_query(scored, k)
    cursor = page1.filter(F.col("rank") == k).select(
        "query_id",
        F.col("score").alias("after_score"),
        F.col("doc_id").alias("after_doc_id"),
    )
    page2 = search_after(scored, cursor, k)
    return scored, page1, page2


def test_search_after_equals_offset_ranks(spark):
    """Cursor paging must reproduce offset ranks k+1..2k of the full
    pinned order — for every query shape (deep, short, empty)."""
    queries = [(1, "quick brown fox dog"), (2, "quack"), (3, "zzz")]
    k = 3
    scored, page1, page2 = _pages(spark, queries, k)
    full = {}
    for r in scored.collect():
        full.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for rows in full.values():
        rows.sort(key=lambda ds: (-round(ds[1], 9), ds[0]))
    got = {
        (r["query_id"], r["rank"]): r["doc_id"] for r in page2.collect()
    }
    want = {
        (qid, i + 1): rows[k + i][0]
        for qid, rows in full.items()
        if len(rows) > k
        for i in range(min(k, len(rows) - k))
    }
    assert got == want
    # no overlap between pages
    p1 = {(r["query_id"], r["doc_id"]) for r in page1.collect()}
    p2 = {(r["query_id"], r["doc_id"]) for r in page2.collect()}
    assert not (p1 & p2)


def test_search_after_no_cursor_no_rows(spark):
    """A query whose match set is <= k has no page-1 cursor and must
    produce zero page-2 rows (never wrap around)."""
    scored, page1, page2 = _pages(spark, [(1, "quack")], 3)
    assert page1.count() == 1  # only doc 8 matches
    assert page2.count() == 0


def test_search_after_score_tie_breaks_by_doc_id(spark):
    """Rows tied with the cursor at 9dp advance only past its doc_id."""
    spark_df = spark.createDataFrame(
        [(1, d, 1.0) for d in range(1, 8)],
        "query_id INT, doc_id LONG, score DOUBLE",
    )
    cursor = spark.createDataFrame(
        [(1, 1.0, 3)], "query_id INT, after_score DOUBLE, after_doc_id LONG"
    )
    got = [
        (r["doc_id"], r["rank"])
        for r in sorted(
            search_after(spark_df, cursor, 2).collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert got == [(4, 1), (5, 2)]
