"""Phrase suggester: hand-computed ranking, a pure-Python brute-force
differential for 3-term phrases (cross product + add-alpha bigram LM),
and the 2-term DuckDB twin."""

from __future__ import annotations

import math
from itertools import product

import pytest

from same_same_spark.operators.phrasesuggest import (
    duckdb_phrase_suggest_sql,
    phrase_suggest,
)
from same_same_spark.text.tokenizer import tokenize_py

DOCS = [
    (1, "fast merge join sort"),
    (2, "fast merge join"),
    (3, "fast merge sort"),
    (4, "mast cast join"),
    (5, "fast cast merge"),
    (6, "sort join merge fast"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def _brute_suggest(queries, topn, max_edits, max_cand, alpha=None):
    """Pure-Python re-derivation of the pinned semantics."""
    from same_same_spark.pipeline.lm import ALPHA_DEFAULT

    if alpha is None:
        alpha = ALPHA_DEFAULT

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(
                    prev[j] + 1, cur[-1] + 1,
                    prev[j - 1] + (ca != cb),
                ))
            prev = cur
        return prev[-1]

    vocab: dict[str, int] = {}
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for _, text in DOCS:
        toks = tokenize_py(text)
        for t in set(toks):
            vocab[t] = vocab.get(t, 0) + 1
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    vsize = len(uni)

    def cands(term):
        pool = [
            (lev(term, v), -df, v)
            for v, df in vocab.items()
            if lev(term, v) <= max_edits
        ]
        top = [v for _, _, v in sorted(pool)[:max_cand]]
        return sorted(set(top) | {term})

    def score(toks):
        s = 0.0
        for a, b in zip(toks, toks[1:]):
            s += math.log(
                (bi.get((a, b), 0) + alpha)
                / (uni.get(a, 0) + alpha * vsize)
            )
        return s

    out = []
    for qid, text in queries:
        toks = tokenize_py(text)
        if len(toks) < 2:
            continue
        phrases = {
            " ".join(combo): score(combo)
            for combo in product(*(cands(t) for t in toks))
        }
        ranked = sorted(
            phrases.items(), key=lambda kv: (-round(kv[1], 9), kv[0])
        )[:topn]
        out += [
            (qid, p, round(s, 6), i + 1)
            for i, (p, s) in enumerate(ranked)
        ]
    return sorted(out)


def test_phrase_suggest_corrects_typo_phrase(spark):
    out = phrase_suggest(
        _docs_df(spark), [(1, "fst merge")], topn=3, max_edits=1,
        id_col="doc_id", text_col="text",
    ).collect()
    # 'fast merge' is a frequent corpus bigram; it must outrank the
    # (OOV-kept) original 'fst merge' and 'mast merge'
    assert out[0]["suggestion"] == "fast merge"
    assert out[0]["rank"] == 1
    sugg = {r["suggestion"] for r in out}
    assert "fst merge" in sugg or len(out) == 3  # original kept as candidate


def test_phrase_suggest_matches_python_brute_force_3_terms(spark):
    qs = [(1, "fst merge joi"), (2, "fast cast merge")]
    got = sorted(
        (r["query_id"], r["suggestion"], round(r["score"], 6), r["rank"])
        for r in phrase_suggest(
            _docs_df(spark), qs, topn=4, max_edits=1,
            max_term_candidates=3, id_col="doc_id", text_col="text",
        ).collect()
    )
    assert got == _brute_suggest(qs, topn=4, max_edits=1, max_cand=3)


def test_phrase_suggest_duckdb_differential_2_terms(spark):
    import duckdb

    qs = [(1, "fst merge"), (2, "sort joi"), (3, "the a")]
    got = sorted(
        (r["query_id"], r["suggestion"], round(r["score"], 6), r["rank"])
        for r in phrase_suggest(
            _docs_df(spark), qs, topn=3, max_edits=1,
            max_term_candidates=3, id_col="doc_id", text_col="text",
        ).collect()
    )
    con = duckdb.connect()
    con.register("docs_tbl", _docs_df(spark).toPandas())
    want = sorted(
        tuple(r)
        for r in con.sql(
            duckdb_phrase_suggest_sql(
                "docs_tbl", "doc_id", "text",
                [q for q in qs if len(tokenize_py(q[1])) == 2],
                topn=3, max_edits=1, max_term_candidates=3,
            )
        ).fetchall()
    )
    assert got == want


def test_phrase_suggest_short_and_guards(spark):
    df = _docs_df(spark)
    # single-token and zero-token phrases yield no rows
    assert phrase_suggest(
        df, [(1, "fast"), (2, "the a")], id_col="doc_id",
        text_col="text",
    ).collect() == []
    with pytest.raises(ValueError, match="topn"):
        phrase_suggest(df, [(1, "a b")], topn=0,
                       id_col="doc_id", text_col="text")
    with pytest.raises(ValueError, match="max_terms"):
        phrase_suggest(
            df, [(1, "fast merge join sort cast mast extra")],
            id_col="doc_id", text_col="text",
        )
    with pytest.raises(ValueError, match="2-term twin"):
        duckdb_phrase_suggest_sql(
            "t", "doc_id", "text", [(1, "fast merge join")]
        )


def test_phrase_suggest_pretrained_lm_reused(spark):
    from same_same_spark.pipeline.lm import train_bigram_lm

    df = _docs_df(spark)
    lm = train_bigram_lm(df, text_col="text")
    a = phrase_suggest(
        df, [(1, "fst merge")], lm=lm, id_col="doc_id", text_col="text"
    ).collect()
    b = phrase_suggest(
        df, [(1, "fst merge")], id_col="doc_id", text_col="text"
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
