"""Unit tests for the multi-term query rewrites (wildcard, fuzzy,
proximity): each op is differential-tested against an independent
pure-Python brute force here; the cross-engine (DuckDB) differential
runs through the registry gate in test_entry.py."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from same_same_spark.operators.fuzzy import fuzzy_expansions, fuzzy_search
from same_same_spark.operators.proximity import proximity_search
from same_same_spark.operators.wildcard import (
    expand_patterns,
    glob_to_regex,
    wildcard_search,
)
from same_same_spark.text.tokenizer import tokenize_py

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "quick brown quick brown quick"),
    (3, "brown fox? brown FOX! brown fox"),
    (4, "dog dog dog dog"),
    (5, "nothing relevant here whatsoever"),
    (6, ""),
    (7, "fox quick brown"),
    (8, "quince quantum quack quick"),
]

TOKS = {d: tokenize_py(t) for d, t in DOCS}
N = len(DOCS)
AVGDL = sum(len(v) for v in TOKS.values()) / N
DF: dict[str, int] = {}
for v in TOKS.values():
    for t in set(v):
        DF[t] = DF.get(t, 0) + 1
VOCAB = sorted(DF)


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def _idf(t: str) -> float:
    return math.log(1.0 + (N - DF[t] + 0.5) / (DF[t] + 0.5))


def _w(t: str, doc_toks: list[str]) -> float:
    tf = doc_toks.count(t)
    if not tf:
        return 0.0
    return _idf(t) * tf * 2.2 / (
        tf + 1.2 * (0.25 + 0.75 * len(doc_toks) / AVGDL)
    )


def _rank(scores: dict[int, float], k: int) -> list[tuple[int, float]]:
    order = sorted(
        (d for d in scores if scores[d] > 0),
        key=lambda d: (-round(scores[d], 9), d),
    )[:k]
    return [(d, scores[d]) for d in order]


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


# --------------------------------------------------------------------------
# wildcard
# --------------------------------------------------------------------------


def test_glob_to_regex_rejects_bad_chars():
    for bad in ("Qu*", "a b", "x.y", "tok-", "t_k", "é*"):
        with pytest.raises(ValueError):
            glob_to_regex(bad)


def _brute_wildcard(pattern_text: str, k: int, max_expansions: int = 50):
    expanded: set[str] = set()
    for p in pattern_text.lower().split():
        rx = re.compile(glob_to_regex(p))
        hits = [t for t in VOCAB if rx.match(t)]
        hits.sort(key=lambda t: (-DF[t], t))
        expanded |= set(hits[:max_expansions])
    scores = {
        d: sum(_w(t, v) for t in sorted(expanded))
        for d, v in TOKS.items()
    }
    return _rank(scores, k)


@pytest.mark.parametrize(
    "patterns",
    [
        "qu*",          # prefix, multiple vocab hits (doc 8's qu-words)
        "qu?ck",        # single-char wildcard
        "*own",         # leading wildcard (suffix match)
        "fox",          # no wildcard == exact term
        "d?g qu*",      # multi-pattern union
        "*o*",          # both-sided
        "zz*",          # no match -> no rows
    ],
)
def test_wildcard_matches_brute_force(spark, patterns):
    out = wildcard_search(
        _docs_df(spark), [(1, patterns)], k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    got = [
        (r["doc_id"], r["score"])
        for r in sorted(out, key=lambda r: r["rank"])
    ]
    want = _brute_wildcard(patterns, 10)
    assert [g[0] for g in got] == [w[0] for w in want], patterns
    for (gd, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws), (patterns, gd)


def test_wildcard_expansion_cap_deterministic(spark):
    """max_expansions keeps the HIGHEST-df terms, ties by term ASC —
    both the survivor set and the blended scoring must honor it."""
    from same_same_spark.stats import term_doc_freqs, tokenized

    vocab = term_doc_freqs(
        tokenized(_docs_df(spark), id_col="doc_id", text_col="text")
    )
    got = sorted(
        r["term"]
        for r in expand_patterns(vocab, [(1, "qu*")], max_expansions=2)
        .collect()
    )
    hits = sorted(
        (t for t in VOCAB if re.match(glob_to_regex("qu*"), t)),
        key=lambda t: (-DF[t], t),
    )
    assert got == sorted(hits[:2])
    assert len(hits) > 2  # the cap actually bit


def test_wildcard_exact_pattern_equals_plain_bm25(spark):
    """A wildcard-free pattern set must score identically to the plain
    BM25 path over the same terms (shared pinned model)."""
    from same_same_spark.bm25 import score_queries

    docs = _docs_df(spark)
    a = wildcard_search(
        docs, [(1, "quick fox")], k=10, id_col="doc_id", text_col="text"
    ).collect()
    b = score_queries(
        docs, [(1, "quick fox")], k=10, id_col="doc_id", text_col="text"
    ).collect()
    assert sorted((r["doc_id"], r["rank"], r["score"]) for r in a) == sorted(
        (r["doc_id"], r["rank"], r["score"]) for r in b
    )


def test_wildcard_indexed_rank_identical(spark, tmp_path):
    """The index-dictionary path must reproduce the naive scorer's
    (doc_id, rank, score@6dp) exactly — fresh build AND after a
    tombstoned delete (expansion df is tombstone-adjusted, scoring
    re-derives through search_batch's delete-aware stats)."""
    from same_same_spark.index.build import build_index
    from same_same_spark.index.mutate import delete_docs
    from same_same_spark.operators.wildcard import wildcard_search_indexed

    docs = _docs_df(spark)
    idx = str(tmp_path / "idx")
    build_index(
        docs, idx, id_col="doc_id", text_col="text",
        num_buckets=4, log=lambda *_: None,
    )
    queries = [(1, "qu*"), (2, "d?g fox"), (3, "*own qu?ck"), (4, "zz*")]

    def key(rows):
        return sorted(
            (r["query_id"], r["doc_id"], r["rank"], round(r["score"], 6))
            for r in rows
        )

    naive = wildcard_search(
        docs, queries, k=10, max_expansions=2,
        id_col="doc_id", text_col="text",
    ).collect()
    indexed = wildcard_search_indexed(
        spark, idx, queries, k=10, max_expansions=2
    ).collect()
    assert key(indexed) == key(naive)
    assert naive  # non-vacuous

    # delete doc 8 (the quince/quantum/quack doc): "qu*"'s capped
    # expansion must re-rank by the post-delete dfs
    delete_docs(spark, idx, [8], log=lambda *_: None)
    naive2 = wildcard_search(
        docs.filter(F.col("doc_id") != 8), queries, k=10,
        max_expansions=2, id_col="doc_id", text_col="text",
    ).collect()
    indexed2 = wildcard_search_indexed(
        spark, idx, queries, k=10, max_expansions=2
    ).collect()
    assert key(indexed2) == key(naive2)
    assert key(indexed2) != key(naive)  # the delete visibly changed it


# --------------------------------------------------------------------------
# fuzzy
# --------------------------------------------------------------------------


def _brute_fuzzy(text: str, k: int, max_edits: int, max_expansions: int):
    qterms = sorted(set(tokenize_py(text)))
    scores: dict[int, float] = {d: 0.0 for d in TOKS}
    for q in qterms:
        cand = [
            (t, _levenshtein(q, t)) for t in VOCAB
            if _levenshtein(q, t) <= max_edits
        ]
        cand.sort(key=lambda td: (td[1], -DF[td[0]], td[0]))
        for t, dist in cand[:max_expansions]:
            sim = 1.0 - dist / len(q)
            for d, v in TOKS.items():
                scores[d] += sim * _w(t, v)
    return _rank(scores, k)


@pytest.mark.parametrize(
    "text,max_edits",
    [
        ("quik", 1),            # single deletion typo
        ("quik", 2),            # wider radius pulls in quack etc.
        ("brwn dog", 1),        # multi-term
        ("quick", 1),           # exact term: self at distance 0
        ("zzzzzz", 2),          # nothing within distance
        ("fox the a", 1),       # stopwords drop from the query
    ],
)
def test_fuzzy_matches_brute_force(spark, text, max_edits):
    out = fuzzy_search(
        _docs_df(spark), [(1, text)], k=10, max_edits=max_edits,
        max_expansions=10, id_col="doc_id", text_col="text",
    ).collect()
    got = [
        (r["doc_id"], r["score"])
        for r in sorted(out, key=lambda r: r["rank"])
    ]
    want = _brute_fuzzy(text, 10, max_edits, 10)
    assert [g[0] for g in got] == [w[0] for w in want], text
    for (gd, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws), (text, gd)


def test_fuzzy_expansion_recall_equals_brute_force(spark):
    """The SymSpell deletion-key join must recover EVERY vocab term
    within the edit radius (the recall theorem), with the pinned
    (distance, df DESC, term) cap order."""
    from same_same_spark.stats import term_doc_freqs, tokenized

    vocab = term_doc_freqs(
        tokenized(_docs_df(spark), id_col="doc_id", text_col="text")
    )
    for q, max_edits in [("quik", 1), ("quik", 2), ("bron", 2)]:
        got = {
            (r["term"], r["distance"])
            for r in fuzzy_expansions(
                vocab, [(1, q)], max_edits=max_edits, max_expansions=100
            ).collect()
        }
        want = {
            (t, _levenshtein(q, t))
            for t in VOCAB
            if _levenshtein(q, t) <= max_edits
        }
        assert got == want, (q, max_edits)


def test_fuzzy_shared_expansion_counts_per_query_term(spark):
    """Two query terms reaching the same vocab term contribute once PER
    QUERY TERM (Lucene's per-term rewrite), not once total."""
    docs = _docs_df(spark)
    # "quick" is within distance 1 of both typos "quic" and "uick"
    out = {
        r["doc_id"]: r["score"]
        for r in fuzzy_search(
            docs, [(1, "quic uick")], k=10, max_edits=1,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    want = _brute_fuzzy("quic uick", 10, 1, 10)
    assert out.keys() == {d for d, _ in want}
    for d, s in want:
        assert out[d] == pytest.approx(s)


# --------------------------------------------------------------------------
# proximity
# --------------------------------------------------------------------------


def _brute_proximity(text: str, slop: int, k: int):
    qterms = sorted(set(tokenize_py(text)))
    m = len(qterms)
    if m == 0:
        return []
    w = m + slop
    matches: dict[int, int] = {}
    for d, v in TOKS.items():
        if len(v) < m:
            continue
        n_win = 0
        for i in range(max(len(v) - w + 1, 1)):
            if set(qterms) <= set(v[i:i + w]):
                n_win += 1
        if n_win:
            matches[d] = n_win
    scores = {
        d: sum(_w(t, TOKS[d]) for t in qterms) for d in matches
    }
    order = sorted(scores, key=lambda d: (-round(scores[d], 9), d))[:k]
    return [(d, scores[d], matches[d]) for d in order]


@pytest.mark.parametrize(
    "text,slop",
    [
        ("quick dog", 0),      # adjacent-only: no doc qualifies
        ("quick dog", 4),      # doc 1: quick..dog within 6 tokens
        ("fox brown", 0),      # unordered adjacency (phrase would differ)
        ("fox brown", 3),
        ("quick brown fox", 1),
        ("dog", 0),            # single term: presence
        ("the a an", 3),       # zero-token query -> no rows
        ("quick zzz", 5),      # one term missing everywhere -> no rows
    ],
)
def test_proximity_matches_brute_force(spark, text, slop):
    out = proximity_search(
        _docs_df(spark), [(1, text)], slop=slop, k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    got = [
        (r["doc_id"], r["score"], r["n_windows"])
        for r in sorted(out, key=lambda r: r["rank"])
    ]
    want = _brute_proximity(text, slop, 10)
    assert [(g[0], g[2]) for g in got] == [(w[0], w[2]) for w in want], (
        text, slop,
    )
    for (gd, gs, _), (_, ws, _) in zip(got, want):
        assert gs == pytest.approx(ws), (text, slop, gd)


def test_proximity_unordered_vs_phrase(spark):
    """'fox brown' at slop 0: proximity accepts doc 7's 'fox quick
    brown'? No — width 2 windows; but doc 3's 'brown fox brown fox
    brown fox' matches in BOTH orders, while phrase only counts the
    quoted order."""
    from same_same_spark.operators.phrase import phrase_search

    docs = _docs_df(spark)
    prox = {
        r["doc_id"]: r["n_windows"]
        for r in proximity_search(
            docs, [(1, "fox brown")], slop=0, k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    phr = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(
            docs, [(1, "fox brown")], k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    # doc 3 tokens: brown fox brown fox brown fox — 5 width-2 windows,
    # all containing both terms; "fox brown" occurs twice as a phrase.
    assert prox[3] == 5
    assert phr[3] == 2
    # doc 1: "...brown fox..." matches unordered AND ordered-reversed
    assert 1 in prox and 1 not in phr


def test_proximity_short_doc_truncated_window(spark):
    """A doc shorter than the window width still matches via the single
    truncated window when it contains all terms."""
    docs = _docs_df(spark)
    out = {
        r["doc_id"]: r["n_windows"]
        for r in proximity_search(
            docs, [(1, "fox quick brown jumps lazy")], slop=4, k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    # W = 9; doc 1 has 7 tokens and contains all 5 terms -> one window
    assert out == {1: 1}


def test_proximity_negative_slop_raises(spark):
    with pytest.raises(ValueError):
        proximity_search(_docs_df(spark), [(1, "a b")], slop=-1)


# ---------------------------------------------------------------------------
# regexp query mode
# ---------------------------------------------------------------------------

def test_validate_term_regex_rejects_unsafe():
    from same_same_spark.operators.wildcard import validate_term_regex

    for bad in (
        "",               # empty
        "a\\d",           # escape shorthand (Java/RE2 agree, but the
                          # subset bans all backslashes)
        "(?i)quick",      # special group
        "(?:ab)",         # special group (engine-added only)
        "^quick",         # explicit anchor
        "qu$",            # $ not even in the charset
        "a{",             # dangling { (Java throws, RE2 literal)
        "a{2,",           # unterminated quantifier
        "ab2",            # digit outside a quantifier
        "a,b",            # comma outside a quantifier
        "[]x]",           # empty-class prefix (engines disagree)
        "(ab",            # unbalanced (re.compile rejects)
        "Quick",          # uppercase outside the term alphabet
    ):
        with pytest.raises(ValueError):
            validate_term_regex(bad)
    # the safe core all passes
    for ok in ("qu.ck", "fo(x|g)+", "[a-f]{2,3}", "do[^x]", "a|b|c"):
        validate_term_regex(ok)


def _brute_regexp(pattern: str, k: int, max_expansions: int = 50):
    from same_same_spark.operators.wildcard import validate_term_regex

    rx = re.compile(validate_term_regex(pattern.strip().lower()))
    hits = [t for t in VOCAB if rx.match(t)]
    hits.sort(key=lambda t: (-DF[t], t))
    expanded = set(hits[:max_expansions])
    scores = {
        d: sum(_w(t, v) for t in sorted(expanded))
        for d, v in TOKS.items()
    }
    return _rank(scores, k)


@pytest.mark.parametrize(
    "pattern",
    [
        "qu.ck",              # dot
        "qu(ick|ack|ince)",   # alternation
        "fo[a-z]",            # class
        "do[^t]",             # negated class (dog, not dot)
        "(qu|br)[a-z]+",      # group + plus
        "[a-z]{5}",           # bounded quantifier: all 5-letter terms
        "quick",              # plain literal
        "zz+",                # no match -> no rows
    ],
)
def test_regexp_matches_brute_force(spark, pattern):
    from same_same_spark.operators.wildcard import regexp_search

    out = regexp_search(
        _docs_df(spark), [(1, pattern)], k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    got = [
        (r["doc_id"], r["score"])
        for r in sorted(out, key=lambda r: r["rank"])
    ]
    want = _brute_regexp(pattern, 10)
    assert [g[0] for g in got] == [w[0] for w in want], pattern
    for (gd, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws), (pattern, gd)


def test_regexp_expansion_cap_deterministic(spark):
    from same_same_spark.operators.wildcard import expand_regexes
    from same_same_spark.stats import term_doc_freqs, tokenized

    vocab = term_doc_freqs(
        tokenized(_docs_df(spark), id_col="doc_id", text_col="text")
    )
    got = sorted(
        r["term"]
        for r in expand_regexes(
            vocab, [(1, "qu[a-z]+")], max_expansions=2
        ).collect()
    )
    hits = sorted(
        (t for t in VOCAB if re.match(r"^qu[a-z]+$", t)),
        key=lambda t: (-DF[t], t),
    )
    assert got == sorted(hits[:2])
    assert len(hits) > 2  # the cap actually bit


def test_regexp_union_of_terms_equals_plain_bm25(spark):
    """An alternation of exact terms must score identically to the
    plain BM25 path over the same term set (shared pinned model)."""
    from same_same_spark.bm25 import score_queries
    from same_same_spark.operators.wildcard import regexp_search

    docs = _docs_df(spark)
    a = regexp_search(
        docs, [(1, "quick|fox")], k=10, id_col="doc_id", text_col="text"
    ).collect()
    b = score_queries(
        docs, [(1, "quick fox")], k=10, id_col="doc_id", text_col="text"
    ).collect()
    assert sorted((r["doc_id"], r["rank"], r["score"]) for r in a) == sorted(
        (r["doc_id"], r["rank"], r["score"]) for r in b
    )


def test_regexp_indexed_rank_identical(spark, tmp_path):
    """The index-dictionary regexp path must reproduce the naive
    scorer's (doc_id, rank, score@6dp) — fresh build AND after a
    tombstoned delete (same contract as the glob mode)."""
    from same_same_spark.index.build import build_index
    from same_same_spark.index.mutate import delete_docs
    from same_same_spark.operators.wildcard import (
        regexp_search,
        regexp_search_indexed,
    )

    docs = _docs_df(spark)
    idx = str(tmp_path / "idx")
    build_index(
        docs, idx, id_col="doc_id", text_col="text",
        num_buckets=4, log=lambda *_: None,
    )
    queries = [(1, "qu[a-z]+"), (2, "do(g|t)"), (3, "zz+")]

    def key(rows):
        return sorted(
            (r["query_id"], r["doc_id"], r["rank"], round(r["score"], 6))
            for r in rows
        )

    naive = regexp_search(
        docs, queries, k=10, max_expansions=2,
        id_col="doc_id", text_col="text",
    ).collect()
    indexed = regexp_search_indexed(
        spark, idx, queries, k=10, max_expansions=2
    ).collect()
    assert key(indexed) == key(naive)

    delete_docs(spark, idx, [2, 8])
    kept = docs.filter(~F.col("doc_id").isin([2, 8]))
    naive2 = regexp_search(
        kept, queries, k=10, max_expansions=2,
        id_col="doc_id", text_col="text",
    ).collect()
    indexed2 = regexp_search_indexed(
        spark, idx, queries, k=10, max_expansions=2
    ).collect()
    assert key(indexed2) == key(naive2)


# ---------------------------------------------------------------------------
# completion suggester
# ---------------------------------------------------------------------------


def test_suggest_completions_hand_computed(spark):
    from same_same_spark.operators.suggest import suggest_completions

    rows = [
        (1, "apple apply banana"),
        (2, "apple appliance cherry"),
        (3, "apple banana"),
        (4, "apricot banana"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = suggest_completions(
        docs, [(1, "app"), (2, "ban"), (3, "zzz")], topn=2,
        id_col="doc_id", text_col="text",
    ).collect()
    got = sorted((r.sug_id, r.rank, r.term, r.df) for r in out)
    # app*: apple df=3 > apply df=1 == appliance df=1 (term ASC)
    assert got == [
        (1, 1, "apple", 3),
        (1, 2, "appliance", 1),
        (2, 1, "banana", 3),
    ]


def test_suggest_completions_min_df_and_guards(spark):
    import pytest as _pytest

    from same_same_spark.operators.suggest import suggest_completions

    docs = spark.createDataFrame(
        [(1, "apple apply"), (2, "apple")], "doc_id LONG, text STRING"
    )
    out = suggest_completions(
        docs, [(1, "APP")], topn=5, id_col="doc_id", text_col="text",
        min_df=2,
    ).collect()
    assert [(r.term, r.rank) for r in out] == [("apple", 1)]
    for bad in ("app le", "app*", "", "ápp"):
        with _pytest.raises(ValueError, match="literal"):
            suggest_completions(docs, [(1, bad)], id_col="doc_id",
                                text_col="text")
    with _pytest.raises(ValueError, match="topn"):
        suggest_completions(docs, [(1, "app")], topn=0,
                            id_col="doc_id", text_col="text")
