"""Unit tests for the round-5 fulltext extras: phrase search, snippet
generation, spell suggestion. Each op is differential-tested against an
independent pure-Python brute force here; the cross-engine (DuckDB)
differential runs through the registry gate in test_entry.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from same_same_spark.bm25 import score_queries
from same_same_spark.operators.phrase import phrase_search
from same_same_spark.operators.snippet import with_snippets
from same_same_spark.operators.spell import (
    _deletions_py,
    suggest_terms,
    vocab_from_docs,
)
from same_same_spark.text.tokenizer import tokenize_py

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "quick brown quick brown quick"),
    (3, "brown fox? brown FOX! brown fox"),
    (4, "dog dog dog dog"),
    (5, "nothing relevant here whatsoever"),
    (6, ""),
    (7, "fox quick brown"),  # right terms, wrong order
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def _brute_phrase(phrase: str) -> dict[int, int]:
    """doc_id -> n_matches via pure-Python scan."""
    ptoks = tokenize_py(phrase)
    out = {}
    if not ptoks:
        return out
    m = len(ptoks)
    for did, text in DOCS:
        toks = tokenize_py(text)
        n = sum(
            1
            for i in range(len(toks) - m + 1)
            if toks[i : i + m] == ptoks
        )
        if n:
            out[did] = n
    return out


@pytest.mark.parametrize(
    "phrase",
    [
        "quick brown",          # multi-doc, multi-occurrence
        "brown fox",            # punctuation-stripped adjacency
        "dog dog",              # overlapping repeats: 3 matches in doc 4
        "quick brown fox",      # trigram
        "the quick",            # leading stopword drops out
        "lazy cat",             # no match
        "the a an",             # all stopwords -> no tokens -> no rows
        "fox",                  # single term: n_matches == tf
    ],
)
def test_phrase_matches_brute_force(spark, phrase):
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(
            _docs_df(spark), [(1, phrase)], k=100,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    assert got == _brute_phrase(phrase)


def test_phrase_rank_is_bm25_over_matching_docs(spark):
    """Ranking = BM25 of the phrase's distinct terms restricted to
    adjacency-verified docs, pinned order."""
    docs = _docs_df(spark)
    out = phrase_search(
        docs, [(7, "quick brown")], k=10, id_col="doc_id", text_col="text"
    ).collect()
    match_ids = set(_brute_phrase("quick brown"))
    bm = {
        r["doc_id"]: r["score"]
        for r in score_queries(
            docs, [(7, "quick brown")], k=100,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    expect = sorted(
        match_ids, key=lambda d: (-round(bm[d], 9), d)
    )
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == expect
    for r in out:
        assert r["score"] == pytest.approx(bm[r["doc_id"]])


def test_phrase_order_sensitive(spark):
    """Doc 7 has the terms but not the order: must not match."""
    got = {
        r["doc_id"]
        for r in phrase_search(
            _docs_df(spark), [(1, "quick brown fox")], k=100,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    assert 7 not in got and 1 in got


def _brute_snippet(text: str, qterms: list[str], w: int):
    toks = tokenize_py(text)
    qset = set(qterms)
    starts = range(1, max(len(toks) - w + 1, 1) + 1)
    scores = [
        len({t for t in toks[i - 1 : i - 1 + w] if t in qset})
        for i in starts
    ]
    best = max(scores)
    idx = scores.index(best)  # smallest start
    return " ".join(toks[idx : idx + w]), best


def test_snippet_matches_brute_force(spark):
    docs = _docs_df(spark)
    queries = dict([(1, "quick fox"), (2, "dog"), (3, "the a an")])
    hits = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (1, 6), (2, 4), (3, 5)],
        "query_id INT, doc_id LONG",
    )
    out = with_snippets(
        hits, docs, queries, window=3, id_col="doc_id", text_col="text"
    ).collect()
    text_by_id = dict(DOCS)
    assert len(out) == hits.count()
    for r in out:
        qterms = tokenize_py(queries[r["query_id"]])
        snip, nhit = _brute_snippet(text_by_id[r["doc_id"]], qterms, 3)
        assert (r["snippet"], r["n_hit_terms"]) == (snip, nhit), (
            r["query_id"], r["doc_id"])


def test_snippet_tie_break_smallest_start(spark):
    """Two windows with the same score: the earlier one wins."""
    docs = spark.createDataFrame(
        [(1, "aaa needle bbb ccc needle ddd")], "doc_id LONG, text STRING"
    )
    hits = spark.createDataFrame([(1, 1)], "query_id INT, doc_id LONG")
    out = with_snippets(
        hits, docs, {1: "needle"}, window=2, id_col="doc_id", text_col="text"
    ).collect()[0]
    assert out["snippet"] == "aaa needle"
    assert out["n_hit_terms"] == 1


def test_deletions_py_counts():
    # length-L term at d=2: 1 + L + L(L-1)/2 distinct keys max
    keys = _deletions_py("abcde", 2)
    assert "abcde" in keys and "abc" in keys and "cde" in keys
    assert len(keys) <= 1 + 5 + 10


def _brute_suggest(vocab: dict[str, int], q: str, d: int, n: int):
    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(
                    prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                ))
            prev = cur
        return prev[-1]

    cand = [
        (lev(q, t), -df, t, df)
        for t, df in vocab.items()
        if lev(q, t) <= d
    ]
    return [
        (t, dist, df) for dist, _, t, df in sorted(cand)[:n]
    ]


def test_spell_suggest_matches_brute_force(spark):
    docs = _docs_df(spark)
    vocab = {
        r["term"]: r["df"]
        for r in vocab_from_docs(docs, id_col="doc_id", text_col="text")
        .collect()
    }
    qterms = ["quik", "brwn", "dogg", "fox", "xyzzyx", "relevnt"]
    out = suggest_terms(
        vocab_from_docs(docs, id_col="doc_id", text_col="text"),
        qterms, max_edits=2, topn=3,
    ).collect()
    got: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["query_term"], r["rank"])):
        got.setdefault(r["query_term"], []).append(
            (r["suggestion"], r["distance"], r["df"])
        )
    for q in qterms:
        assert got.get(q, []) == _brute_suggest(vocab, q, 2, 3), q


def test_spell_self_match_rank1(spark):
    out = suggest_terms(
        vocab_from_docs(_docs_df(spark), id_col="doc_id", text_col="text"),
        ["quick"], max_edits=1, topn=2,
    ).collect()
    top = min(out, key=lambda r: r["rank"])
    assert (top["suggestion"], top["distance"]) == ("quick", 0)


def _brute_mlt(source_id: int, max_terms: int, k: int):
    import math

    toks = {d: tokenize_py(t) for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    df: dict[str, int] = {}
    for v in toks.values():
        for t in set(v):
            df[t] = df.get(t, 0) + 1

    def idf(t):
        return math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))

    src = toks[source_id]
    sal = {t: src.count(t) * idf(t) for t in set(src)}
    selected = [
        t for t in sorted(sal, key=lambda t: (-round(sal[t], 9), t))
    ][:max_terms]
    scored = {}
    for d, v in toks.items():
        if d == source_id:
            continue
        s = 0.0
        for t in selected:
            tf = v.count(t)
            if tf:
                s += idf(t) * tf * 2.2 / (
                    tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl)
                )
        if s > 0:
            scored[d] = s
    order = sorted(scored, key=lambda d: (-round(scored[d], 9), d))[:k]
    return [(d, scored[d]) for d in order]


def test_more_like_this_matches_brute_force(spark):
    from same_same_spark.operators.mlt import more_like_this

    out = more_like_this(
        _docs_df(spark), [1, 3], k=5, max_terms=3,
        id_col="doc_id", text_col="text",
    ).collect()
    for src in (1, 3):
        got = [
            (r["doc_id"], r["score"])
            for r in sorted(
                (r for r in out if r["query_id"] == src),
                key=lambda r: r["rank"],
            )
        ]
        want = _brute_mlt(src, 3, 5)
        assert [g[0] for g in got] == [w[0] for w in want], src
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws), (src, gd)
        assert src not in [g[0] for g in got]  # self excluded


def _brute_bool(must: str, should: str, must_not: str, k: int):
    import math

    toks = {d: tokenize_py(t) for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfm: dict[str, int] = {}
    for v in toks.values():
        for t in set(v):
            dfm[t] = dfm.get(t, 0) + 1
    m = sorted(set(tokenize_py(must)))
    s = sorted(set(tokenize_py(should)))
    x = sorted(set(tokenize_py(must_not)))
    terms = sorted(set(m) | set(s))
    out = {}
    for d, v in toks.items():
        vs = set(v)
        if x and (vs & set(x)):
            continue
        if m:
            if not set(m) <= vs:
                continue
        elif not (vs & set(s)):
            continue
        score = 0.0
        for t in terms:
            tf = v.count(t)
            if tf and t in dfm:
                idf = math.log(1.0 + (n - dfm[t] + 0.5) / (dfm[t] + 0.5))
                score += idf * tf * 2.2 / (
                    tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl)
                )
        out[d] = score
    order = sorted(out, key=lambda d: (-round(out[d], 9), d))[:k]
    return [(d, out[d]) for d in order]


@pytest.mark.parametrize(
    "must,should,must_not",
    [
        ("quick", "fox dog", ""),          # must + should scoring
        ("quick brown", "", "dog"),        # conjunctive + exclusion
        ("", "fox dog", "quick"),          # pure should + exclusion
        ("quick fox", "", ""),             # conjunctive only
        ("", "", "dog"),                   # nothing positive -> no rows
        ("the a an", "fox", ""),           # must all-stopword -> should mode
        ("missingterm", "fox", ""),        # unmatched must -> no rows
    ],
)
def test_boolean_search_matches_brute_force(spark, must, should, must_not):
    from same_same_spark.operators.boolquery import boolean_search

    out = boolean_search(
        _docs_df(spark), [(1, must, should, must_not)], k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    got = [
        (r["doc_id"], r["score"])
        for r in sorted(out, key=lambda r: r["rank"])
    ]
    want = _brute_bool(must, should, must_not, 10)
    assert [g[0] for g in got] == [w[0] for w in want], (must, should, must_not)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws), (gd, must)


# ---------------------------------------------------------------------------
# percolation
# ---------------------------------------------------------------------------

def test_percolate_matches_brute_force(spark):
    """operator=and coverage + BM25 score vs pure Python; empty/
    stopword-only rules never match; the relation is untruncated."""
    import math

    from same_same_spark.operators.percolate import percolate
    from same_same_spark.text.tokenizer import tokenize_py

    docs = [
        (1, "spark streaming joins are fast"),
        (2, "flink streaming with state"),
        (3, "spark and flink both do streaming"),
        (4, "batch only no stream here"),
        (5, "fast spark joins joins"),
    ]
    toks = {d: tokenize_py(t) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfc = {}
    for v in toks.values():
        for t in set(v):
            dfc[t] = dfc.get(t, 0) + 1

    def w(term, seq):
        tf = seq.count(term)
        idf = math.log(1.0 + (n - dfc[term] + 0.5) / (dfc[term] + 0.5))
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(seq) / avgdl))

    rules = [(1, "spark streaming"), (2, "flink"), (3, "fast joins"),
             (4, "zzz"), (5, "the a")]
    want = set()
    scores = {}
    for qid, text in rules:
        terms = sorted(set(tokenize_py(text)))
        if not terms:
            continue
        for d, seq in toks.items():
            if all(t in seq for t in terms):
                want.add((qid, d))
                scores[(qid, d)] = sum(w(t, seq) for t in terms)

    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    rows = percolate(df, rules, id_col="doc_id", text_col="text").collect()
    got = {(r["query_id"], r["doc_id"]): r["score"] for r in rows}
    assert set(got) == want
    for k, s in got.items():
        assert s == pytest.approx(scores[k])


def test_percolate_partial_coverage_never_matches(spark):
    from same_same_spark.operators.percolate import percolate

    df = spark.createDataFrame(
        [(1, "spark is here"), (2, "streaming is here")],
        "doc_id LONG, text STRING",
    )
    rows = percolate(
        df, [(1, "spark streaming")], id_col="doc_id", text_col="text"
    ).collect()
    assert rows == []  # each doc has only one of the two terms


# ---------------------------------------------------------------------------
# adjacency matrix
# ---------------------------------------------------------------------------

def test_adjacency_matrix_counts_and_guards(spark):
    from same_same_spark.operators.facets import adjacency_matrix_facets

    docs = [
        (1, "spark streaming"), (2, "flink streaming"),
        (3, "spark flink streaming"), (4, "batch"), (5, "spark"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    filt = [("flink", "flink"), ("spark", "spark"),
            ("streamy", "streaming"), ("none", "zzz")]
    got = {
        r["key"]: r["doc_count"]
        for r in adjacency_matrix_facets(
            df, filt, id_col="doc_id", text_col="text"
        ).collect()
    }
    assert got == {
        "flink": 2, "spark": 3, "streamy": 3,
        "flink&spark": 1, "flink&streamy": 2, "spark&streamy": 2,
    }  # zero buckets (none, none&*) omitted
    with pytest.raises(ValueError):
        adjacency_matrix_facets(df, [])
    with pytest.raises(ValueError, match="unique"):
        adjacency_matrix_facets(df, [("a", "x"), ("a", "y")])
    with pytest.raises(ValueError, match="separator"):
        adjacency_matrix_facets(df, [("a&b", "x")])


# ---------------------------------------------------------------------------
# term vectors
# ---------------------------------------------------------------------------

def test_term_vectors_positions_and_corpus_stats(spark):
    from same_same_spark.operators.termvectors import term_vectors

    docs = [
        (1, "fast merge fast sort fast"),
        (2, "merge sort merge"),
        (3, "fast things"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    rows = term_vectors(df, [1, 4, 99], id_col="doc_id", text_col="text")
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["positions"], r["df"], r["ttf"])
        for r in rows.collect()
    }
    # df/ttf are CORPUS-wide though only doc 1 was requested
    assert got == {
        (1, "fast"): (3, "1,3,5", 2, 4),
        (1, "merge"): (1, "2", 2, 3),
        (1, "sort"): (1, "4", 2, 2),
    }
    with pytest.raises(ValueError):
        term_vectors(df, [])


# ---------------------------------------------------------------------------
# span near (ordered)
# ---------------------------------------------------------------------------

def test_span_near_order_slop_and_duplicates(spark):
    from same_same_spark.operators.spannear import span_near_search

    docs = [
        (1, "fast merge sort"),           # fast..sort: 1 gap
        (2, "fast aaa bbb ccc sort"),     # 3 gaps (X1 keeps 3+ letters)
        (3, "sort then fast"),            # wrong order
        (4, "fast sort fast nope sort"),  # two valid starts at slop 1
        (5, "merge merge fast"),
        (7, "fast fast sort"),            # both starts valid at slop 1
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")

    def spans(q, slop):
        return {
            r["doc_id"]: r["n_spans"]
            for r in span_near_search(
                df, [(1, q)], slop=slop, k=10,
                id_col="doc_id", text_col="text",
            ).collect()
        }

    assert spans("fast sort", 1) == {1: 1, 4: 2, 7: 2}
    assert spans("fast sort", 3) == {1: 1, 2: 1, 4: 2, 7: 2}
    assert spans("fast sort", 0) == {4: 1, 7: 1}  # adjacency only
    assert spans("merge merge", 1) == {5: 1}      # duplicate sequence
    with pytest.raises(ValueError):
        span_near_search(df, [(1, "a b")], slop=-1)


def test_span_near_slop0_equals_phrase(spark):
    """slop=0 span-near == phrase search (doc set, scores, and the
    per-doc occurrence count) — the positional family's boundary
    identity."""
    from same_same_spark.operators.phrase import phrase_search
    from same_same_spark.operators.spannear import span_near_search

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    q = [(1, "table query"), (2, "fast scan row")]
    a = span_near_search(docs, q, slop=0, k=10,
                         id_col="doc_id", text_col="text").collect()
    b = phrase_search(docs, q, k=10, id_col="doc_id",
                      text_col="text").collect()
    key_a = sorted(
        (r["query_id"], r["doc_id"], r["rank"], round(r["score"], 9),
         r["n_spans"]) for r in a
    )
    key_b = sorted(
        (r["query_id"], r["doc_id"], r["rank"], round(r["score"], 9),
         r["n_matches"]) for r in b
    )
    assert key_a == key_b and key_a


def test_percolate_streaming_matches_batch(spark, tmp_path):
    """Streaming percolation (the operator inside foreachBatch) fires
    the SAME (rule, doc) pairs as one batch percolation of everything
    ingested — the matching decision is per-doc, so micro-batching
    cannot change it. (Scores are corpus-stat-dependent and are the
    batch's own by contract; the pin is the match relation.)"""
    import json
    import os

    from same_same_spark.operators.percolate import percolate

    rules = [(1, "spark streaming"), (2, "flink"), (3, "fast joins")]
    src = str(tmp_path / "docs")
    os.makedirs(src)
    batches = [
        [(1, "spark streaming joins are fast"),
         (2, "flink streaming with state")],
        [(3, "spark and flink both do streaming"),
         (4, "batch only"), (5, "fast spark joins")],
    ]
    for i, rows in enumerate(batches):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    fired: list[tuple[int, int]] = []

    def sink(b, _):
        fired.extend(
            (int(r["query_id"]), int(r["doc_id"]))
            for r in percolate(
                b, rules, id_col="doc_id", text_col="text"
            ).collect()
        )

    q = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], "doc_id LONG, text STRING"
    )
    want = sorted(
        (int(r["query_id"]), int(r["doc_id"]))
        for r in percolate(
            all_docs, rules, id_col="doc_id", text_col="text"
        ).collect()
    )
    assert sorted(fired) == want and want


def test_explain_weights_sum_to_engine_score(spark):
    """_explain decomposition: per-term weights sum EXACTLY to
    score_queries' score per (query, doc); absent terms / unknown
    docs / non-matching pairs emit no rows."""
    from same_same_spark.bm25 import score_queries
    from same_same_spark.operators.explain import explain_scores

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    queries = [(1, "fast merge join"), (2, "vector")]
    top = score_queries(
        docs, queries, k=5, id_col="doc_id", text_col="text"
    ).collect()
    pairs = [(r["query_id"], r["doc_id"]) for r in top]
    pairs.append((1, 999_999_999))
    rows = explain_scores(
        docs, queries, pairs, id_col="doc_id", text_col="text"
    ).collect()
    sums: dict[tuple, float] = {}
    for r in rows:
        sums[(r["query_id"], r["doc_id"])] = (
            sums.get((r["query_id"], r["doc_id"]), 0.0) + r["weight"]
        )
    assert set(sums) == set(pairs) - {(1, 999_999_999)}
    for r in top:
        assert sums[(r["query_id"], r["doc_id"])] == pytest.approx(
            r["score"], abs=1e-9
        )
    with pytest.raises(ValueError):
        explain_scores(docs, queries, [])
