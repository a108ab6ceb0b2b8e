"""function_score: hand-computed folds, filter applicability, the
neutral element, deterministic random_score, and the DuckDB twin."""

from __future__ import annotations

import math

import pytest

from same_same_spark.bm25 import score_queries
from same_same_spark.operators.funcscore import (
    duckdb_function_score_sql,
    function_score_search,
)

DOCS = [
    # (doc_id, text, lang, pop LONG — popularity signal)
    (1, "apple banana", "en", 9),
    (2, "apple cherry", "de", 99),
    (3, "apple dates", "en", None),   # missing pop
    (4, "banana dates", "de", 0),
]


def _docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id LONG, text STRING, lang STRING, pop LONG"
    )


def test_fvf_log1p_multiply_hand_computed(spark):
    plain = {
        r["doc_id"]: r["score"]
        for r in score_queries(
            _docs_df(spark), [(1, "apple")], k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    out = {
        r["doc_id"]: r["score"]
        for r in function_score_search(
            _docs_df(spark), [(1, "apple")],
            [{"field_value_factor": {
                "field": "pop", "factor": 1.0, "modifier": "log1p",
                "missing": 1.0,
            }}],
            k=10, score_mode="sum", boost_mode="multiply",
            id_col="doc_id", text_col="text",
        ).collect()
    }
    assert out[1] == pytest.approx(plain[1] * math.log10(10))
    assert out[2] == pytest.approx(plain[2] * math.log10(100))
    assert out[3] == pytest.approx(plain[3] * 1.0)  # missing -> 1.0


def test_filtered_functions_and_neutral_element(spark):
    # weight 3 applies only to lang=en; docs with no applicable
    # function take the neutral 1.0
    out = {
        r["doc_id"]: r["score"]
        for r in function_score_search(
            _docs_df(spark), [(1, "apple")],
            [{"weight": 3.0, "filter": {"lang": {"eq": "en"}}}],
            k=10, boost_mode="replace",
            id_col="doc_id", text_col="text",
        ).collect()
    }
    assert out == {1: 3.0, 3: 3.0, 2: 1.0}


def test_score_modes_fold(spark):
    fns = [
        {"weight": 2.0},
        {"weight": 5.0},
        {"weight": 100.0, "filter": {"lang": {"eq": "xx"}}},  # never applies
    ]
    for mode, want in [
        ("sum", 7.0), ("multiply", 10.0), ("max", 5.0),
        ("min", 2.0), ("avg", 3.5),
    ]:
        out = function_score_search(
            _docs_df(spark), [(1, "apple")], fns, k=1,
            score_mode=mode, boost_mode="replace",
            id_col="doc_id", text_col="text",
        ).collect()
        assert out[0]["score"] == pytest.approx(want), mode


def test_random_score_deterministic_and_seeded(spark):
    fns = [{"random_score": {"seed": 7}}]
    a = function_score_search(
        _docs_df(spark), [(1, "apple")], fns, k=10,
        boost_mode="replace", id_col="doc_id", text_col="text",
    ).collect()
    b = function_score_search(
        _docs_df(spark), [(1, "apple")], fns, k=10,
        boost_mode="replace", id_col="doc_id", text_col="text",
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert all(0.0 <= r["score"] < 1.0 for r in a)
    other = function_score_search(
        _docs_df(spark), [(1, "apple")],
        [{"random_score": {"seed": 8}}], k=10,
        boost_mode="replace", id_col="doc_id", text_col="text",
    ).collect()
    assert {r["doc_id"]: r["score"] for r in a} != {
        r["doc_id"]: r["score"] for r in other
    }


def test_function_score_duckdb_differential(spark):
    import duckdb

    fns = [
        {"field_value_factor": {
            "field": "pop", "factor": 0.5, "modifier": "sqrt",
            "missing": 0.25,
        }},
        {"random_score": {"seed": 42}},
        {"weight": 1.5, "filter": {"lang": {"eq": "de"}}},
    ]
    preds = [None, None, "d.lang = 'de'"]
    qs = [(1, "apple banana"), (2, "dates")]
    for score_mode in ("sum", "multiply", "avg"):
        for boost_mode in ("multiply", "sum", "replace"):
            got = sorted(
                (r["query_id"], r["rank"], r["doc_id"],
                 round(r["score"], 6))
                for r in function_score_search(
                    _docs_df(spark), qs, fns, k=5,
                    score_mode=score_mode, boost_mode=boost_mode,
                    id_col="doc_id", text_col="text",
                ).collect()
            )
            con = duckdb.connect()
            con.register("docs_tbl", _docs_df(spark).toPandas())
            want = sorted(
                (q, rk, d, s)
                for q, d, s, rk in con.sql(
                    duckdb_function_score_sql(
                        "docs_tbl", "doc_id", "text", qs, fns, preds,
                        k=5, score_mode=score_mode,
                        boost_mode=boost_mode,
                    )
                ).fetchall()
            )
            assert got == want, (score_mode, boost_mode)


def test_function_score_guards(spark):
    df = _docs_df(spark)
    with pytest.raises(ValueError, match="score_mode"):
        function_score_search(
            df, [(1, "apple")], [{"weight": 1.0}], score_mode="first",
            id_col="doc_id", text_col="text",
        )
    with pytest.raises(ValueError, match="boost_mode"):
        function_score_search(
            df, [(1, "apple")], [{"weight": 1.0}], boost_mode="avg",
            id_col="doc_id", text_col="text",
        )
    with pytest.raises(ValueError, match="non-empty"):
        function_score_search(
            df, [(1, "apple")], [], id_col="doc_id", text_col="text"
        )
    with pytest.raises(ValueError, match="exactly one"):
        function_score_search(
            df, [(1, "apple")], [{"weight": 1.0, "random_score": {}}],
            id_col="doc_id", text_col="text",
        )
    with pytest.raises(ValueError, match="modifier"):
        function_score_search(
            df, [(1, "apple")],
            [{"field_value_factor": {"field": "pop", "modifier": "exp"}}],
            id_col="doc_id", text_col="text",
        )
