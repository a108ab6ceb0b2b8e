"""Query-string language: parser pins, Python brute-force match-set
differential, scoring composition, and guards."""

from __future__ import annotations

import pytest

from same_same_spark.operators.querystring import (
    Bool,
    Field,
    Not,
    Phrase,
    Term,
    eval_py,
    parse_query,
    positive_terms,
    query_string_search,
)
from same_same_spark.text.tokenizer import tokenize_py

DOCS = [
    (1, "fast merge join sort", "en"),
    (2, "fast merge", "de"),
    (3, "merge sort slow", "en"),
    (4, "slow scan", "en"),
    (5, "fast sort merge", "de"),   # 'fast merge' NOT contiguous
    (6, "totally unrelated", None),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING, lang STRING")


def test_parse_pins():
    assert parse_query("fast") == Term("fast")
    assert parse_query('"fast merge"') == Phrase(("fast", "merge"))
    assert parse_query("lang:en") == Field("lang", "en")
    # implicit OR between plain clauses
    assert parse_query("fast merge") == Bool(
        "or", (Term("fast"), Term("merge"))
    )
    # implicitly-joined NOT is a prohibited clause (Lucene -term)
    assert parse_query("fast merge -slow") == Bool(
        "and",
        (Bool("or", (Term("fast"), Term("merge"))), Not(Term("slow"))),
    )
    # explicit OR NOT stays a disjunction
    assert parse_query("fast OR NOT slow") == Bool(
        "or", (Term("fast"), Not(Term("slow")))
    )
    # precedence: AND binds tighter than OR; parens override
    assert parse_query("alpha OR beta AND gamma") == Bool(
        "or", (Term("alpha"), Bool("and", (Term("beta"), Term("gamma"))))
    )
    assert parse_query("(alpha OR beta) AND gamma") == Bool(
        "and", (Bool("or", (Term("alpha"), Term("beta"))), Term("gamma"))
    )
    # stopword leaves drop; a fully-dropped query is None
    assert parse_query("the AND fast") == Term("fast")
    assert parse_query("the a an") is None
    # multi-token bare chunk -> implicit AND group
    assert parse_query("foo-bar") == Bool(
        "and", (Term("foo"), Term("bar"))
    )
    for bad in ("(fast", "fast)", "fast AND", "NOT"):
        with pytest.raises(ValueError):
            parse_query(bad)


def test_positive_terms_excludes_odd_nots():
    ast = parse_query('fast AND NOT (slow OR "scan merge") OR lang:en')
    assert positive_terms(ast) == {"fast"}
    ast = parse_query("NOT NOT fast")
    assert positive_terms(ast) == {"fast"}


QUERIES = [
    (1, "fast AND (merge OR sort) -slow"),
    (2, '"fast merge" OR scan'),
    (3, "lang:en AND merge"),
    (4, "NOT merge"),
    (5, "the a an"),      # drops entirely
    (6, "lang:en -merge"),  # filter + prohibited: zero-score matches
]


def test_match_set_equals_python_brute_force(spark):
    out = query_string_search(
        _docs_df(spark), QUERIES, k=10, id_col="doc_id",
        text_col="text",
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], set()).add(r["doc_id"])
    want = {}
    for qid, text in QUERIES:
        ast = parse_query(text)
        if ast is None:
            continue
        s = {
            did
            for did, t, lang in DOCS
            if eval_py(ast, tokenize_py(t), {"lang": lang, "doc_id": did})
        }
        if s:
            want[qid] = s
    assert got == want
    # doc 5 has fast+merge but not contiguous -> phrase query misses it
    assert 5 not in got[2] and 2 in got[2]


def test_scores_compose_scored_matches_and_zero_floor(spark):
    from same_same_spark.bm25 import scored_matches

    out = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in query_string_search(
            _docs_df(spark), QUERIES, k=10, id_col="doc_id",
            text_col="text",
        ).collect()
    }
    # query 1 positives = {fast, merge, sort}
    ref = {
        r["doc_id"]: r["score"]
        for r in scored_matches(
            _docs_df(spark), [(1, "fast merge sort")],
            id_col="doc_id", text_col="text",
        ).collect()
    }
    for (qid, did), score in out.items():
        if qid == 1:
            assert score == pytest.approx(ref[did])
    # pure-negative and filter-only matches score 0 and still rank
    assert all(out[(4, d)] == 0.0 for d in (4, 6))
    assert out[(6, 4)] == 0.0
    # ranks: zero scores tie-break by doc_id
    rows = [
        (r["doc_id"], r["rank"])
        for r in query_string_search(
            _docs_df(spark), [(4, "NOT merge")], k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    ]
    assert rows == [(4, 1), (6, 2)]


def test_unknown_field_and_k_guard(spark):
    with pytest.raises(ValueError, match="unknown field"):
        query_string_search(
            _docs_df(spark), [(1, "nosuch:x AND fast")], k=5,
            id_col="doc_id", text_col="text",
        )
    with pytest.raises(ValueError, match="k must be"):
        query_string_search(
            _docs_df(spark), [(1, "fast")], k=0,
            id_col="doc_id", text_col="text",
        )
    # all queries dropping -> empty frame with the contract schema
    out = query_string_search(
        _docs_df(spark), [(1, "the a")], k=5,
        id_col="doc_id", text_col="text",
    )
    assert out.columns == ["query_id", "doc_id", "score", "rank"]
    assert out.collect() == []


def test_parse_prohibited_groups_phrases_and_quoted_fields():
    """Review-pass regressions: '-' before a group or quoted phrase,
    quoted field values, and explicit-OR-NOT surviving a value-equal
    implicit prohibition."""
    # -(group): negates the whole group instead of silently dropping
    assert parse_query("-(fast OR slow)") == Not(
        Bool("or", (Term("fast"), Term("slow")))
    )
    assert parse_query("merge -(fast OR slow)") == Bool(
        "and",
        (Term("merge"), Not(Bool("or", (Term("fast"), Term("slow"))))),
    )
    # -"quoted phrase"
    assert parse_query('merge -"fast merge"') == Bool(
        "and", (Term("merge"), Not(Phrase(("fast", "merge"))))
    )
    # field:"quoted value" keeps the full value incl. the space
    assert parse_query('lang:"some value"') == Field("lang", "some value")
    # explicit OR NOT x + implicit -x: the disjunct must survive
    assert parse_query("fast OR NOT slow -slow") == Bool(
        "and",
        (
            Bool("or", (Term("fast"), Not(Term("slow")))),
            Not(Term("slow")),
        ),
    )


def test_prohibited_group_matches(spark):
    out = query_string_search(
        _docs_df(spark), [(1, "merge -(slow OR scan)")], k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    # merge docs minus any containing slow or scan: 1, 2, 5
    assert {r["doc_id"] for r in out} == {1, 2, 5}
