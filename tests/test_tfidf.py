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


def _canon_approx(rows):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rows
    )


def test_index_tfidf_matches_naive_on_fixture(spark, docs_df, tmp_path):
    """VERDICT r2 #4: the index-backed TF-IDF scorer must be rank- and
    score-identical to the naive sparse path — including uniform
    fallback docs (zero tokens / all stopwords), a uniform query, and
    zero-overlap docs filled at cosine 0."""
    from same_same_spark.index.build import build_index
    from same_same_spark.index.tfidf import tfidf_search_batch

    idx = str(tmp_path / "idx")
    build_index(docs_df, idx, id_col="doc_id", text_col="content",
                num_buckets=2, log=lambda *_: None)
    got = _canon_approx(
        tfidf_search_batch(spark, idx, QUERIES, k=5, log=lambda *_: None)
        .collect()
    )
    want = _canon_approx(tfidf_topk(docs_df, QUERIES, k=5).collect())
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-9)
    # k >= N returns the whole store, exactly like the reference's scan
    all_got = _canon_approx(
        tfidf_search_batch(spark, idx, [(0, "zebra")], k=100,
                           log=lambda *_: None).collect()
    )
    all_want = _canon_approx(
        tfidf_topk(docs_df, [(0, "zebra")], k=100).collect()
    )
    assert [g[:3] for g in all_got] == [w[:3] for w in all_want]


def test_index_tfidf_matches_naive_at_sf0001(spark, documents, tmp_path):
    """Same differential over the real sf0.001 corpus and reference-set
    style queries; also proves the aux table is reused (second call) and
    that a tombstoned index is rejected until compaction."""
    from same_same_spark.index.build import build_index
    from same_same_spark.index.mutate import (
        delete_docs,
        rewrite_touched_groups,
    )
    from same_same_spark.index.tfidf import tfidf_search_batch

    docs = documents.select("doc_id", "text")
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=4, group_size=2, log=lambda *_: None)
    queries = [
        (0, "fast merge join sort"),
        (1, "vector table scan"),
        (2, "the a an"),  # stopword-only -> uniform query
    ]
    want = _canon_approx(
        tfidf_topk(docs, queries, k=10, id_col="doc_id", text_col="text")
        .collect()
    )
    got = _canon_approx(
        tfidf_search_batch(spark, idx, queries, k=10, log=lambda *_: None)
        .collect()
    )
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-9)

    # aux fingerprint is stable: a second call reuses the table
    import glob
    import os

    aux_before = sorted(glob.glob(os.path.join(idx, "tfidf-aux-*")))
    tfidf_search_batch(spark, idx, queries[:1], k=5, log=lambda *_: None)
    assert sorted(glob.glob(os.path.join(idx, "tfidf-aux-*"))) == aux_before

    # tombstones freeze out the tfidf path until compaction...
    victim = int(docs.limit(1).collect()[0]["doc_id"])
    delete_docs(spark, idx, [victim], log=lambda *_: None)
    with pytest.raises(ValueError, match="compacted"):
        tfidf_search_batch(spark, idx, queries[:1], k=5)
    # ...after which the aux rebuilds for the new generation and the
    # result equals the naive scorer over the surviving corpus
    rewrite_touched_groups(spark, idx, log=lambda *_: None)
    survivors = docs.filter(docs["doc_id"] != victim)
    got2 = _canon_approx(
        tfidf_search_batch(spark, idx, queries[:1], k=10,
                           log=lambda *_: None).collect()
    )
    want2 = _canon_approx(
        tfidf_topk(survivors, queries[:1], k=10, id_col="doc_id",
                   text_col="text").collect()
    )
    assert [g[:3] for g in got2] == [w[:3] for w in want2]
    aux_after = sorted(glob.glob(os.path.join(idx, "tfidf-aux-*")))
    assert aux_after and aux_after != aux_before  # superseded aux swept


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
