"""Semantics tests for the relevance & aggregation wave: significant
terms (hand-computed JLH), facet top-hits, term^boost parsing and
scoring, synonym expansion, minimum_should_match, highlight tags."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from same_same_spark.bm25 import score_queries
from same_same_spark.operators.boolquery import boolean_search
from same_same_spark.operators.boost import boosted_search, parse_boosted_query
from same_same_spark.operators.facets import facet_top_hits
from same_same_spark.operators.sigterms import significant_terms
from same_same_spark.operators.snippet import with_snippets
from same_same_spark.operators.synonyms import synonym_rows, synonym_search


@pytest.fixture(scope="module")
def fruit_docs(spark):
    rows = [
        (1, "apple banana cherry", "x"),
        (2, "apple banana dates", "x"),
        (3, "apple cherry dates", "y"),
        (4, "banana melon dates", "y"),
        (5, "melon cherry grape", None),
        (6, "grape melon dates", "z"),
    ]
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, grp STRING"
    )


def test_significant_terms_hand_computed(fruit_docs):
    """Query 'apple' matches d1-d3 (m=3, n=6). banana and cherry each
    have fg=2, bg=3 -> JLH (2/3 - 1/2) * (2/3 / 1/2) = 2/9; dates has
    fg_pct == bg_pct (2/3) and must be filtered; the query's own term
    is excluded; ties break term ASC."""
    out = significant_terms(
        fruit_docs, [(1, "apple")], topn=10, min_doc_count=2,
        id_col="doc_id", text_col="text",
    ).collect()
    assert [(r.term, r.fg_count, r.bg_count, r.rank) for r in out] == [
        ("banana", 2, 3, 1), ("cherry", 2, 3, 2)
    ]
    for r in out:
        assert math.isclose(r.score, 2.0 / 9.0, rel_tol=1e-9)


def test_significant_terms_min_doc_count(fruit_docs):
    """min_doc_count=3 kills both fg=2 candidates -> no rows."""
    out = significant_terms(
        fruit_docs, [(1, "apple")], topn=10, min_doc_count=3,
        id_col="doc_id", text_col="text",
    )
    assert out.count() == 0


def test_parse_boosted_query():
    assert parse_boosted_query("table^3 query join^0.5") == {
        "join": 0.5, "query": 1.0, "table": 3.0
    }
    # duplicate boosts sum; zero effective boost drops the term
    assert parse_boosted_query("fast fast^2")["fast"] == 3.0
    assert "window" not in parse_boosted_query("window^0 agg")
    # a chunk's term part may tokenize to several tokens, all boosted
    assert parse_boosted_query("foo-bar^2") == {"bar": 2.0, "foo": 2.0}
    with pytest.raises(ValueError, match="malformed"):
        parse_boosted_query("table^abc")
    with pytest.raises(ValueError, match="negative"):
        parse_boosted_query("table^-1")


def test_boost_one_scales_to_plain_bm25(fruit_docs):
    """All-1.0 boosts must reproduce score_queries exactly, and a
    uniform boost B must scale every score by B (rank-identical)."""
    plain = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in score_queries(
            fruit_docs, [(1, "apple dates")], k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    unit = boosted_search(
        fruit_docs, [(1, "apple dates")], k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    assert {
        (r.query_id, r.doc_id): (r.score, r.rank) for r in unit
    } == plain
    doubled = boosted_search(
        fruit_docs, [(1, "apple^2 dates^2")], k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    for r in doubled:
        s, rank = plain[(r.query_id, r.doc_id)]
        assert math.isclose(r.score, 2.0 * s, rel_tol=1e-12)
        assert r.rank == rank


def test_synonym_rows_validation():
    with pytest.raises(ValueError, match="exactly one"):
        synonym_rows([["apple", "fruit salad"]])
    with pytest.raises(ValueError, match="fewer than two"):
        synonym_rows([["apple", "apple"]])
    assert synonym_rows([["banana", "apple"]]) == [
        (0, "apple"), (0, "banana")
    ]


def test_synonym_expansion_is_one_hop(fruit_docs):
    """'table'-style one-hop expansion: query 'apple' with groups
    [[apple,banana],[banana,cherry]] expands to {apple,banana} — cherry
    is reachable only THROUGH banana and must not join. Equivalent to
    a plain two-term query; out-of-vocab members contribute nothing."""
    out = synonym_search(
        fruit_docs, [(1, "apple")],
        [["apple", "banana"], ["banana", "cherry"]],
        k=10, id_col="doc_id", text_col="text",
    ).collect()
    ref = score_queries(
        fruit_docs, [(1, "apple banana")], k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    assert {(r.doc_id, r.score, r.rank) for r in out} == {
        (r.doc_id, r.score, r.rank) for r in ref
    }
    with_oov = synonym_search(
        fruit_docs, [(1, "apple")],
        [["apple", "banana", "pineapple"], ["banana", "cherry"]],
        k=10, id_col="doc_id", text_col="text",
    ).collect()
    assert {(r.doc_id, r.score, r.rank) for r in with_oov} == {
        (r.doc_id, r.score, r.rank) for r in ref
    }


def test_minimum_should_match_gating(fruit_docs):
    """msm=3 over a 3-term should set keeps only the doc containing all
    three; a should set smaller than msm matches nothing; msm is
    ignored when there are no should clauses."""
    hits = boolean_search(
        fruit_docs, [(1, "", "apple banana cherry", "")], k=10,
        id_col="doc_id", text_col="text", minimum_should_match=3,
    ).collect()
    assert [r.doc_id for r in hits] == [1]
    assert boolean_search(
        fruit_docs, [(1, "", "apple", "")], k=10,
        id_col="doc_id", text_col="text", minimum_should_match=2,
    ).count() == 0
    must_only = boolean_search(
        fruit_docs, [(1, "apple", "", "")], k=10,
        id_col="doc_id", text_col="text", minimum_should_match=5,
    ).collect()
    assert sorted(r.doc_id for r in must_only) == [1, 2, 3]


def test_minimum_should_match_with_must(fruit_docs):
    """must='dates' + 2-of-{apple,banana,melon}: d2 (apple banana),
    d4 (banana melon) qualify; d3 and d6 carry only one should term."""
    hits = boolean_search(
        fruit_docs, [(1, "dates", "apple banana melon", "")], k=10,
        id_col="doc_id", text_col="text", minimum_should_match=2,
    ).collect()
    assert sorted(r.doc_id for r in hits) == [2, 4]


def test_facet_top_hits_shape_and_nulls(fruit_docs):
    """Query 'dates' matches d2,d3,d4,d6 -> buckets x:1 y:2 z:1 (d5's
    NULL grp never buckets); value order (count DESC, value ASC) = y,
    x, z; hits within a bucket follow the pinned score order."""
    out = facet_top_hits(
        fruit_docs, [(1, "dates")], "grp", topn=3, k_hits=2,
        id_col="doc_id", text_col="text",
    ).collect()
    by_vrank = {}
    for r in out:
        by_vrank.setdefault(r.value_rank, []).append(r)
    assert [by_vrank[i][0].value for i in (1, 2, 3)] == ["y", "x", "z"]
    assert by_vrank[1][0].doc_count == 2
    y_hits = sorted(by_vrank[1], key=lambda r: r.hit_rank)
    assert len(y_hits) == 2
    assert y_hits[0].score >= y_hits[1].score
    assert all(r.value is not None for r in out)


def test_highlight_wraps_only_query_terms(fruit_docs):
    hits = score_queries(
        fruit_docs, [(1, "apple cherry")], k=3,
        id_col="doc_id", text_col="text",
    )
    out = with_snippets(
        hits, fruit_docs, {1: "apple cherry"}, window=3,
        id_col="doc_id", text_col="text",
    ).collect()
    for r in out:
        assert "<em>" in r.highlight
        # stripping the tags recovers the snippet exactly
        assert (
            r.highlight.replace("<em>", "").replace("</em>", "")
            == r.snippet
        )
        for piece in r.highlight.split():
            token = piece.replace("<em>", "").replace("</em>", "")
            if token in ("apple", "cherry"):
                assert piece == f"<em>{token}</em>"
            else:
                assert piece == token


# ---------------------------------------------------------------------------
# rescore
# ---------------------------------------------------------------------------

def test_rescore_matches_brute_force(spark):
    """Window selection, Lucene-style phrase scoring and the combined
    re-rank against a pure-Python brute force."""
    import math

    from same_same_spark.operators.rescore import rescore_topk
    from same_same_spark.text.tokenizer import tokenize_py

    docs = [
        (1, "fast merge sort is a fast merge"),
        (2, "merge fast but not together sort"),
        (3, "fast merge fast merge fast merge"),
        (4, "sort of fast kind of merge"),
        (5, "unrelated words entirely"),
        (6, "fast fast fast fast"),
        (7, "the merge was fast merge fast"),
    ]
    toks = {d: tokenize_py(t) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfc: dict[str, int] = {}
    for v in toks.values():
        for t in set(v):
            dfc[t] = dfc.get(t, 0) + 1

    def idf(t):
        return math.log(1.0 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5))

    def w(tf, dl, i):
        return i * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    def phrase_count(seq, ph):
        return sum(
            1
            for i in range(len(seq) - len(ph) + 1)
            if seq[i: i + len(ph)] == ph
        )

    q = "fast merge"
    qtoks = tokenize_py(q)
    qset = sorted(set(qtoks))
    prim = {
        d: sum(w(v.count(t), len(v), idf(t)) for t in qset if t in v)
        for d, v in toks.items()
    }
    prim = {d: s for d, s in prim.items() if s > 0}
    window = sorted(prim, key=lambda d: (-round(prim[d], 9), d))[:4]
    qidf = sum(idf(t) for t in qset)
    final = {}
    for d in window:
        m = phrase_count(toks[d], qtoks)
        rs = w(m, len(toks[d]), qidf) if m else 0.0
        final[d] = (prim[d] + 2.0 * rs, prim[d], rs)
    order = sorted(final, key=lambda d: (-round(final[d][0], 9), d))[:3]

    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    rows = rescore_topk(
        df, [(1, q)], k=3, window_size=4, rescore_weight=2.0,
        id_col="doc_id", text_col="text",
    ).collect()
    got = sorted(rows, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in got] == order
    for r in got:
        want = final[r["doc_id"]]
        assert r["score"] == pytest.approx(want[0])
        assert r["primary_score"] == pytest.approx(want[1])
        assert r["rescore_score"] == pytest.approx(want[2])


def test_rescore_outside_window_never_promoted(spark):
    """A doc outside the primary window must not appear, however hard
    the phrase would boost it (the ES window contract)."""
    from same_same_spark.operators.rescore import rescore_topk

    # doc 9 has the exact phrase but a weak bag score (long doc, one
    # occurrence of each term, drowned by filler)
    filler = " ".join(["filler"] * 60)
    docs = [
        (1, "fast fast fast fast merge merge merge"),
        (2, "fast fast merge merge fast"),
        (3, "merge fast fast merge"),
        (9, f"fast merge {filler}"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    rows = rescore_topk(
        df, [(1, "fast merge")], k=3, window_size=3,
        rescore_weight=100.0, id_col="doc_id", text_col="text",
    ).collect()
    assert 9 not in {r["doc_id"] for r in rows} and rows


def test_rescore_zero_weight_keeps_primary_order(spark):
    """rescore_weight=0 must reproduce the plain BM25 ranking of the
    window head exactly."""
    from same_same_spark.bm25 import score_queries
    from same_same_spark.operators.rescore import rescore_topk

    docs = [
        (1, "fast merge sort"), (2, "merge fast"), (3, "fast sort"),
        (4, "merge merge fast fast"), (5, "sort sort"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    a = rescore_topk(
        df, [(1, "fast merge")], k=3, window_size=5, rescore_weight=0.0,
        id_col="doc_id", text_col="text",
    ).collect()
    b = score_queries(
        df, [(1, "fast merge")], k=3, id_col="doc_id", text_col="text"
    ).collect()
    assert sorted((r["doc_id"], r["rank"], round(r["score"], 9)) for r in a) \
        == sorted((r["doc_id"], r["rank"], round(r["score"], 9)) for r in b)


def test_rescore_window_smaller_than_k_raises(spark):
    from same_same_spark.operators.rescore import rescore_topk

    df = spark.createDataFrame([(1, "a b")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="window_size"):
        rescore_topk(df, [(1, "a")], k=10, window_size=5)


# ---------------------------------------------------------------------------
# decay function score
# ---------------------------------------------------------------------------

def test_decay_shapes_and_null_passthrough(spark):
    """The three ES shapes against their closed forms; offset radius
    and NULL field values decay by exactly 1."""
    import math

    from same_same_spark.operators.decay import decay_score

    docs = [
        (1, "quick", 500.0), (2, "quick", 480.0), (3, "quick", 720.0),
        (4, "quick", None), (5, "quick", 100.0),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING, v DOUBLE")
    origin, scale, offset, dec = 500.0, 200.0, 20.0, 0.5

    def dist(v):
        return max(0.0, abs(v - origin) - offset)

    forms = {
        "gauss": lambda d: math.exp(
            -(d * d) / (2.0 * (-(scale * scale) / (2.0 * math.log(dec))))
        ),
        "exp": lambda d: math.exp(math.log(dec) / scale * d),
        "linear": lambda d: max(
            0.0, (scale / (1.0 - dec) - d) / (scale / (1.0 - dec))
        ),
    }
    for fn, form in forms.items():
        rows = decay_score(
            df, [(1, "quick")], "v", origin=origin, scale=scale,
            offset=offset, decay=dec, fn=fn, k=10,
            id_col="doc_id", text_col="text",
        ).collect()
        got = {r["doc_id"]: r["multiplier"] for r in rows}
        assert got[1] == 1.0 and got[2] == 1.0  # inside the offset
        assert got[4] == 1.0                    # NULL field
        for d in (3, 5):
            v = dict((d_, v_) for d_, _, v_ in docs)[d]
            assert got[d] == pytest.approx(form(dist(v)), abs=1e-12), fn
        # score = bm25 * multiplier, pinned order
        for r in rows:
            assert r["score"] == pytest.approx(
                r["bm25"] * r["multiplier"], abs=1e-12
            )
        # the family contract: multiplier at origin+scale+offset == decay
        assert form(scale) == pytest.approx(dec, abs=1e-12)


def test_decay_param_guards(spark):
    from same_same_spark.operators.decay import decay_score

    df = spark.createDataFrame([(1, "a", 1.0)],
                               "doc_id LONG, text STRING, v DOUBLE")
    for kw in (
        dict(fn="nope"), dict(scale=0.0), dict(decay=0.0),
        dict(decay=1.0), dict(offset=-1.0),
    ):
        args = dict(origin=0.0, scale=1.0, offset=0.0, decay=0.5,
                    fn="gauss")
        args.update(kw)
        with pytest.raises(ValueError):
            decay_score(df, [(1, "a")], "v", **args)


# ---------------------------------------------------------------------------
# BM25F cross-field ranking
# ---------------------------------------------------------------------------


def test_bm25f_single_field_reduces_to_bm25(fruit_docs):
    """With one field at (w=1, b=0.75), tfn = tf/norm and the BM25F
    saturation idf*tfn*(k1+1)/(k1+tfn) algebraically equals the
    engine's idf*tf*(k1+1)/(tf + k1*norm) — so the reduction must be
    exact, not approximate."""
    from same_same_spark.operators.bm25f import bm25f_search

    queries = [(1, "apple dates"), (2, "melon")]
    plain = score_queries(
        fruit_docs, queries, k=10, id_col="doc_id", text_col="text"
    ).collect()
    f = bm25f_search(
        fruit_docs, queries, {"text": (1.0, 0.75)}, k=10,
        id_col="doc_id",
    ).collect()
    key = lambda rows: sorted(
        (r.query_id, r.doc_id, r.rank, round(r.score, 12)) for r in rows
    )
    assert key(plain) == key(f)


def test_bm25f_field_weight_promotes_head_match(spark):
    """Same term in doc 1's head vs doc 2's body; head weight 3 must
    rank doc 1 first, and the hand-derived score must match."""
    from same_same_spark.operators.bm25f import bm25f_search

    rows = [
        (1, "needle alpha", "filler wordy tokens here"),
        (2, "alpha bravo", "needle wordy tokens here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, head STRING, body STRING")
    out = bm25f_search(
        docs, [(1, "needle")], {"head": (3.0, 0.5), "body": (1.0, 0.5)},
        k=10, id_col="doc_id",
    ).collect()
    assert [(r.doc_id, r.rank) for r in out] == [(1, 1), (2, 2)]
    # hand math: head dl=2 both, avgdl_head=2 -> norm 1; tfn_1 = 3*1/1.
    # body dl=4 both, avgdl_body=4 -> norm 1; tfn_2 = 1*1/1.
    # df(needle)=2 over n=2 docs -> idf = ln(1 + 0.5/2.5); k1=1.2
    idf = math.log(1.0 + 0.5 / 2.5)
    exp1 = idf * 3.0 * 2.2 / (1.2 + 3.0)
    exp2 = idf * 1.0 * 2.2 / (1.2 + 1.0)
    got = {r.doc_id: r.score for r in out}
    assert got[1] == pytest.approx(exp1, abs=1e-12)
    assert got[2] == pytest.approx(exp2, abs=1e-12)


def test_bm25f_empty_field_contributes_nothing(spark):
    """A field that is empty corpus-wide (avgdl 0) or carries weight 0
    must not alter scores; NULL field values tokenize to dl 0."""
    from same_same_spark.operators.bm25f import bm25f_search

    rows = [(1, "needle alpha", None), (2, "alpha bravo", "")]
    docs = spark.createDataFrame(rows, "doc_id LONG, head STRING, empty STRING")
    base = bm25f_search(
        docs, [(1, "needle alpha")], {"head": (1.0, 0.75)}, k=10,
        id_col="doc_id",
    ).collect()
    plus = bm25f_search(
        docs, [(1, "needle alpha")],
        {"head": (1.0, 0.75), "empty": (5.0, 0.75)},
        k=10, id_col="doc_id",
    ).collect()
    zerow = bm25f_search(
        docs, [(1, "needle alpha")],
        {"head": (1.0, 0.75), "empty": (0.0, 0.75)},
        k=10, id_col="doc_id",
    ).collect()
    key = lambda rows: sorted(
        (r.query_id, r.doc_id, r.rank, round(r.score, 12)) for r in rows
    )
    assert key(base) == key(plus) == key(zerow)


def test_bm25f_param_guards(spark):
    from same_same_spark.operators.bm25f import bm25f_search

    df = spark.createDataFrame([(1, "a")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="at least one"):
        bm25f_search(df, [(1, "a")], {})
    with pytest.raises(ValueError, match="negative weight"):
        bm25f_search(df, [(1, "a")], {"text": (-1.0, 0.5)})
    with pytest.raises(ValueError, match="outside"):
        bm25f_search(df, [(1, "a")], {"text": (1.0, 1.5)})


# ---------------------------------------------------------------------------
# LM Dirichlet similarity
# ---------------------------------------------------------------------------


def test_dirichlet_hand_computed_with_clamp(spark):
    """d1='cat cat dog', d2='dog dog dog', mu=10: total=6,
    ttf(cat)=2, ttf(dog)=4. d1's dog term goes NEGATIVE pre-clamp
    (ln(1.15)-ln(1.3) < 0) and must contribute exactly 0."""
    from same_same_spark.operators.similarity import dirichlet_search

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "dog dog dog")],
        "doc_id LONG, text STRING",
    )
    out = dirichlet_search(
        docs, [(1, "cat dog")], k=10, id_col="doc_id", text_col="text",
        mu=10.0,
    ).collect()
    got = {r.doc_id: (r.score, r.rank) for r in out}
    exp1 = math.log(1.6) - math.log(1.3)          # cat only; dog clamped
    exp2 = math.log(1.45) - math.log(1.3)         # dog tf=3
    assert got[1][0] == pytest.approx(exp1, abs=1e-12)
    assert got[2][0] == pytest.approx(exp2, abs=1e-12)
    assert (got[1][1], got[2][1]) == (1, 2)


def test_dirichlet_no_match_and_guards(spark):
    from same_same_spark.operators.similarity import dirichlet_search

    docs = spark.createDataFrame(
        [(1, "cat cat dog")], "doc_id LONG, text STRING"
    )
    # no query term in the corpus -> zero rows (never zero-score rows)
    assert dirichlet_search(
        docs, [(1, "elephant")], id_col="doc_id", text_col="text"
    ).count() == 0
    with pytest.raises(ValueError, match="mu"):
        dirichlet_search(docs, [(1, "cat")], id_col="doc_id",
                         text_col="text", mu=0.0)
    # empty corpus -> empty result, not division by zero
    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    assert dirichlet_search(
        empty, [(1, "cat")], id_col="doc_id", text_col="text"
    ).count() == 0


def test_jm_hand_computed(spark):
    """d1='cat cat dog', d2='dog dog dog', λ=0.5: total=6,
    p(cat)=1/3, p(dog)=2/3. d1: ln(1+2) + ln(1+0.5) = ln 4.5;
    d2: ln(1+1.5) = ln 2.5 — no clamp needed, both positive."""
    from same_same_spark.operators.similarity import jm_search

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "dog dog dog")],
        "doc_id LONG, text STRING",
    )
    out = jm_search(
        docs, [(1, "cat dog")], k=10, id_col="doc_id", text_col="text",
        lambda_=0.5,
    ).collect()
    got = {r.doc_id: (r.score, r.rank) for r in out}
    assert got[1][0] == pytest.approx(math.log(4.5), abs=1e-12)
    assert got[2][0] == pytest.approx(math.log(2.5), abs=1e-12)
    assert (got[1][1], got[2][1]) == (1, 2)


def test_jm_duckdb_differential_and_guards(spark):
    """Value-level cross-engine parity at sf0.001 (the same evidence
    class as the registry gate, run locally: JM rides the verified
    statistics pipeline but has its own scorer)."""
    import duckdb

    from same_same_spark.operators.similarity import duckdb_jm_sql, jm_search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = [(0, "fast merge join sort"), (1, "window hash batch")]
    got = {
        (r.query_id, r.doc_id, round(r.score, 6), r.rank)
        for r in jm_search(
            docs, queries, k=10, id_col="doc_id", text_col="text"
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = {
        (int(q), int(d), float(s), int(k))
        for q, d, s, k in con.sql(
            duckdb_jm_sql("documents", "doc_id", "text", queries, k=10)
        ).fetchall()
    }
    assert got == want and len(got) == 20

    with pytest.raises(ValueError, match="lambda"):
        jm_search(docs, queries, id_col="doc_id", text_col="text",
                  lambda_=0.0)
    with pytest.raises(ValueError, match="lambda"):
        jm_search(docs, queries, id_col="doc_id", text_col="text",
                  lambda_=1.5)


# ---------------------------------------------------------------- boosting


def test_boosting_demotes_but_keeps_negative_matches(fruit_docs):
    from same_same_spark.operators.boost import boosting_search

    plain = {
        r["doc_id"]: r["score"]
        for r in score_queries(
            fruit_docs, [(1, "apple")], k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    out = boosting_search(
        fruit_docs, [(1, "apple", "dates")], k=10,
        negative_boost=0.25, id_col="doc_id", text_col="text",
    ).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    # match set identical to the positive query's (d1-d3)
    assert set(got) == set(plain)
    # d2 and d3 contain 'dates' -> demoted by exactly 0.25x; d1 not
    assert got[1] == pytest.approx(plain[1])
    assert got[2] == pytest.approx(plain[2] * 0.25)
    assert got[3] == pytest.approx(plain[3] * 0.25)
    # demotion reorders: d1 must now rank first
    assert out[0]["doc_id"] == 1 and out[0]["rank"] == 1


def test_boosting_negative_only_docs_absent(fruit_docs):
    from same_same_spark.operators.boost import boosting_search

    out = boosting_search(
        fruit_docs, [(1, "apple", "melon")], k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    # d4-d6 match ONLY the negative query -> never appear
    assert {r["doc_id"] for r in out} == {1, 2, 3}


def test_boosting_zero_factor_and_multi_neg_hits(fruit_docs):
    from same_same_spark.operators.boost import boosting_search

    out = {
        r["doc_id"]: r["score"]
        for r in boosting_search(
            fruit_docs, [(1, "apple", "banana cherry")], k=10,
            negative_boost=0.0, id_col="doc_id", text_col="text",
        ).collect()
    }
    # every positive match also hits >= 1 neg term (d1 hits TWO -> the
    # factor applies ONCE); all sink to 0 but stay in the result
    assert set(out) == {1, 2, 3}
    assert all(v == 0.0 for v in out.values())


def test_boosting_duckdb_differential(fruit_docs):
    import duckdb

    from same_same_spark.operators.boost import (
        boosting_search,
        duckdb_boosting_sql,
    )

    qs = [(1, "apple dates", "cherry"), (2, "melon", "grape dates")]
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in boosting_search(
            fruit_docs, qs, k=5, negative_boost=0.3,
            id_col="doc_id", text_col="text",
        ).collect()
    )
    con = duckdb.connect()
    con.register("fruit_tbl", fruit_docs.toPandas())
    want = sorted(
        (q, rk, d, s)
        for q, d, s, rk in con.sql(
            duckdb_boosting_sql(
                "fruit_tbl", "doc_id", "text", qs, k=5,
                negative_boost=0.3,
            )
        ).fetchall()
    )
    assert got == want


def test_boosting_factor_guard(fruit_docs):
    from same_same_spark.operators.boost import boosting_search

    with pytest.raises(ValueError, match="negative_boost"):
        boosting_search(
            fruit_docs, [(1, "apple", "dates")], negative_boost=1.5,
            id_col="doc_id", text_col="text",
        )
