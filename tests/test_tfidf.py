"""X4 TF-IDF embedder + cosine search: pure-Python reference differential
+ DuckDB oracle differential + fallback edge cases.

The pure-Python model below re-implements the *dense* reference
semantics literally (``tfidf.go:85-235``, frozen-corpus form: vocabulary
built once from the docs, queries never mutate it) so the sparse Spark
plan is checked against an independently-derived answer.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from same_same_spark.operators.tfidf import (
    build_vocab,
    duckdb_tfidf_sql,
    tfidf_topk,
)
from same_same_spark.stats import tokenized
from same_same_spark.text.tokenizer import tokenize_py


def dense_reference(
    docs: list[tuple[int, str]],
    queries: list[tuple[int, str]],
    k: int,
    min_df: int = 1,
    max_df_ratio: float = 0.95,
    max_features: int | None = 5000,
) -> list[tuple[int, int, float, int]]:
    """Literal dense model of tfidf.go: build vocab, embed every doc and
    query as float vectors, cosine, pinned sort. O(N*V) — test-only."""
    n = len(docs)
    df: dict[str, int] = {}
    for _, text in docs:
        for t in set(tokenize_py(text)):
            df[t] = df.get(t, 0) + 1
    valid = [
        t for t, d in df.items()
        if d >= min_df and d / n <= max_df_ratio
    ]
    valid.sort(key=lambda t: (-df[t], t))  # pinned form of tfidf.go:112-120
    if max_features is not None:
        valid = valid[:max_features]
    vocab = {t: i for i, t in enumerate(valid)}
    idf = [math.log(n / df[t]) + 1.0 for t in valid]

    def embed(text: str) -> list[float]:
        counts: dict[str, int] = {}
        for t in tokenize_py(text):
            counts[t] = counts.get(t, 0) + 1
        vec = [0.0] * len(vocab)
        if counts:
            maxtf = max(counts.values())
            for t, c in counts.items():
                if t in vocab:
                    vec[vocab[t]] = (c / maxtf) * idf[vocab[t]]
        norm = math.sqrt(sum(v * v for v in vec))
        if norm > 0:
            return [v / norm for v in vec]
        return [1.0 / math.sqrt(len(vec))] * len(vec)  # tfidf.go:227-233

    out = []
    for qid, qtext in queries:
        q = embed(qtext)
        scored = []
        for did, dtext in docs:
            d = embed(dtext)
            dot = sum(a * b for a, b in zip(q, d))
            na = math.sqrt(sum(a * a for a in q))
            nb = math.sqrt(sum(b * b for b in d))
            cos = dot / (na * nb) if na > 0 and nb > 0 else 0.0
            scored.append((did, cos))
        scored.sort(key=lambda r: (-round(r[1], 9), r[0]))
        for rank, (did, s) in enumerate(scored[:k], 1):
            out.append((qid, did, s, rank))
    return out


DOCS = [
    (1, "zebra quantum flux unique marker"),
    (2, "common words appear here together often"),
    (3, "common words appear here also nothing special"),
    (4, "quantum mechanics common words appear quantum quantum"),
    (5, ""),  # zero tokens -> uniform-fallback doc
    (6, "the a an of"),  # all stopwords -> uniform-fallback doc
    (7, "xylophone"),
]

QUERIES = [
    (0, "zebra quantum"),
    (1, "common words"),
    (2, "the an"),  # zero tokens -> uniform-fallback query
    (3, "quantum common"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, content STRING")


def _collect(df):
    return sorted(
        (
            (r["query_id"], r["doc_id"], r["score"], r["rank"])
            for r in df.collect()
        ),
    )


def test_matches_dense_reference(docs_df):
    got = _collect(tfidf_topk(docs_df, QUERIES, k=5))
    want = sorted(dense_reference(DOCS, QUERIES, k=5))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3], (g, w)
        assert g[2] == pytest.approx(w[2], abs=1e-9), (g, w)


def test_every_doc_scored(docs_df):
    # the reference scores its entire store — k >= N returns all docs
    res = tfidf_topk(docs_df, [(0, "zebra")], k=100).collect()
    assert len(res) == len(DOCS)


def test_uniform_query_scores_fallback_docs_as_one(docs_df):
    res = {
        r["doc_id"]: r["score"]
        for r in tfidf_topk(docs_df, [(2, "the an")], k=100).collect()
    }
    # uniform query x uniform docs (5, 6) -> cosine exactly 1.0
    assert res[5] == pytest.approx(1.0)
    assert res[6] == pytest.approx(1.0)
    # and they beat every sparse doc
    assert all(res[d] < 1.0 for d in (1, 2, 3, 4, 7))


def test_max_features_cutoff_is_pinned(docs_df, spark):
    tok = tokenized(docs_df, text_col="content")
    full = build_vocab(tok, len(DOCS), max_features=None).count()
    cut = build_vocab(tok, len(DOCS), max_features=3)
    terms = [r["term"] for r in cut.orderBy("term").collect()]
    assert full > 3 and len(terms) == 3
    # df-desc then term-asc: 'common'/'words'/'appear' share df=3
    assert terms == ["appear", "common", "words"]


def test_duckdb_oracle_matches(docs_df):
    got = _collect(tfidf_topk(docs_df, QUERIES, k=5))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") AS v(doc_id, content)"
    )
    sql = duckdb_tfidf_sql(
        "documents", "doc_id", "content", QUERIES, k=5, round_score=None
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3], (g, w)
        assert g[2] == pytest.approx(w[2], abs=1e-9), (g, w)


def test_empty_queries_returns_empty(docs_df):
    assert tfidf_topk(docs_df, [], k=5).collect() == []


def test_empty_vocab_scores_zero(spark):
    # one doc; its only term has df/N = 1 > max_df_ratio -> vocab empty
    # -> reference embeds zero-length vectors -> cosine 0 everywhere
    df = spark.createDataFrame(
        [(1, "solitary solitary"), (2, "solitary wordhere")],
        "doc_id LONG, content STRING",
    )
    res = tfidf_topk(
        df, [(0, "solitary")], k=5, max_df_ratio=0.4
    ).collect()
    assert len(res) == 2
    assert all(r["score"] == 0.0 for r in res)
    assert [r["doc_id"] for r in res] == [1, 2]  # doc_id tie-break

    # DuckDB twin agrees on the degenerate case
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        "(1, 'solitary solitary'), (2, 'solitary wordhere')"
        ") AS v(doc_id, content)"
    )
    sql = duckdb_tfidf_sql(
        "d", "doc_id", "content", [(0, "solitary")], k=5,
        max_df_ratio=0.4, round_score=None,
    )
    rows = con.execute(sql).fetchall()
    assert sorted((r[0], r[1], r[2]) for r in rows) == [
        (0, 1, 0.0), (0, 2, 0.0)
    ]
