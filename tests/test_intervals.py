"""Intervals query: hand-computed interval algebra, nested-rule
matching, DuckDB positional-SQL differential for fixed rules."""

from __future__ import annotations

import pytest

from same_same_spark.operators.intervals import (
    intervals_search,
    required_terms,
    rule_intervals_py,
    rule_matches_py,
    rule_terms,
)

DOCS = [
    (1, "fast merge then sort data"),       # phrase + sort at gap 1
    (2, "fast merge data data data join"),  # phrase + join at gap 3
    (3, "merge fast sort"),                 # no 'fast merge' phrase
    (4, "fast data merge sort"),            # gapped fast..merge
    (5, "sort join fast merge"),            # follower BEFORE phrase
    (6, "unrelated words entirely"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def test_match_rule_hand_computed():
    toks = "alpha beta gamma beta".split()
    # ordered phrase, no gaps
    r = {"match": {"query": "alpha beta"}}
    assert rule_intervals_py(r, toks) == [(0, 1, 2)]
    # gaps allow the second beta
    r = {"match": {"query": "alpha beta", "max_gaps": 2}}
    assert rule_intervals_py(r, toks) == [(0, 1, 2), (0, 3, 2)]
    # unordered
    r = {"match": {"query": "beta alpha", "ordered": False}}
    assert rule_intervals_py(r, toks) == [(0, 1, 2)]
    assert rule_intervals_py(
        {"match": {"query": "beta alpha"}}, toks
    ) == []  # ordered: no alpha after beta
    # duplicate query terms need DISTINCT positions
    r = {"match": {"query": "beta beta", "max_gaps": 5}}
    assert rule_intervals_py(r, toks) == [(1, 3, 2)]
    assert rule_matches_py(
        {"match": {"query": "beta beta"}}, toks
    ) is False  # slack 1 > 0


def test_all_of_any_of_hand_computed():
    toks = "fast merge xxx sort".split()
    rule = {"all_of": {
        "max_gaps": 1,
        "intervals": [
            {"match": {"query": "fast merge"}},
            {"any_of": {"intervals": [
                {"match": {"query": "sort"}},
                {"match": {"query": "join"}},
            ]}},
        ],
    }}
    # envelope 0..3, covered 3, slack 1 -> ok
    assert rule_intervals_py(rule, toks) == [(0, 3, 3)]
    # tighten the budget: slack 1 > 0 -> no match
    rule["all_of"]["max_gaps"] = 0
    assert rule_matches_py(rule, toks) is False
    # ordered=False allows the follower before the phrase
    toks2 = "sort fast merge".split()
    rule["all_of"]["max_gaps"] = 0
    rule["all_of"]["ordered"] = False
    assert rule_matches_py(rule, toks2) is True
    rule["all_of"]["ordered"] = True
    assert rule_matches_py(rule, toks2) is False
    # overlap is rejected: 'merge' both in the phrase and follower
    r2 = {"all_of": {"ordered": False, "max_gaps": 9, "intervals": [
        {"match": {"query": "fast merge"}},
        {"match": {"query": "merge"}},
    ]}}
    assert rule_matches_py(r2, "fast merge".split()) is False
    assert rule_matches_py(r2, "fast merge merge".split()) is True


def test_required_and_scoring_terms():
    rule = {"all_of": {"intervals": [
        {"match": {"query": "fast merge"}},
        {"any_of": {"intervals": [
            {"match": {"query": "sort"}},
            {"match": {"query": "join"}},
        ]}},
    ]}}
    assert rule_terms(rule) == {"fast", "merge", "sort", "join"}
    assert required_terms(rule) == {"fast", "merge"}
    with pytest.raises(ValueError, match="exactly one"):
        rule_matches_py({"match": {}, "any_of": {}}, ["x"])


RULE = {"all_of": {
    "ordered": True,
    "max_gaps": 3,
    "intervals": [
        {"match": {"query": "fast merge"}},
        {"any_of": {"intervals": [
            {"match": {"query": "sort"}},
            {"match": {"query": "join"}},
        ]}},
    ],
}}


def test_intervals_search_matches_engine(spark):
    out = intervals_search(
        _docs_df(spark), [(1, RULE)], k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    got = {r["doc_id"] for r in out}
    from same_same_spark.text.tokenizer import tokenize_py

    want = {
        did for did, t in DOCS if rule_matches_py(RULE, tokenize_py(t))
    }
    assert got == want == {1, 2}
    assert all(r["score"] > 0 for r in out)


def test_intervals_duckdb_differential(spark):
    """Independent positional SQL: EXISTS adjacent (fast, merge) at i,
    and a (sort|join) at j with j >= i + 2 (ordered, after the
    phrase) and envelope slack (j - i + 1) - 3 <= 3."""
    import duckdb

    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    got = sorted(
        (r["doc_id"], r["rank"])
        for r in intervals_search(
            _docs_df(spark), [(1, RULE)], k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    )
    con = duckdb.connect()
    con.register("docs_tbl", _docs_df(spark).toPandas())
    # nested correlated EXISTS trips a DuckDB internal assertion
    # (depth > 1 in non-lateral join) — nested list lambdas express
    # the same positional predicate
    rows = con.sql(f"""
WITH toks AS (
  SELECT doc_id, {duckdb_tokens_sql("text")} AS t FROM docs_tbl
)
SELECT doc_id FROM toks
WHERE len(list_filter(range(1, len(t)), i ->
        t[i] = 'fast' AND t[i + 1] = 'merge'
        AND len(list_filter(range(i + 2, i + 6), j ->
              t[j] IN ('sort', 'join'))) > 0
      )) > 0
""").fetchall()
    want_ids = sorted(r[0] for r in rows)
    assert [d for d, _ in got] == want_ids


def test_intervals_guards(spark):
    df = _docs_df(spark)
    with pytest.raises(ValueError, match="k must be"):
        intervals_search(df, [(1, RULE)], k=0,
                         id_col="doc_id", text_col="text")
    # stopword-only rule drops; empty query set -> typed empty frame
    out = intervals_search(
        df, [(1, {"match": {"query": "the a"}})], k=5,
        id_col="doc_id", text_col="text",
    )
    assert out.collect() == []
    with pytest.raises(ValueError, match="combination bound"):
        rule_matches_py(
            {"match": {"query": "beta beta beta beta beta beta beta",
                       "max_gaps": 99}},
            ["beta"] * 40,
        )
