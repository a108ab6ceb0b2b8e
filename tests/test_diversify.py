"""Semantics tests for the dis_max / filters-agg / MMR wave:
best-clause combine against per-clause BM25, named-filter buckets
against hand-counted sets, greedy MMR against a hand-computed
geometry and the lam=1 pure-relevance reduction."""

from __future__ import annotations

import math

import pytest

from same_same_spark.bm25 import score_queries
from same_same_spark.operators.dismax import dismax_search
from same_same_spark.operators.facets import filters_facets
from same_same_spark.operators.mmr import mmr_topk
from same_same_spark.pipeline.ann import brute_topk


@pytest.fixture(scope="module")
def fruit_docs(spark):
    rows = [
        (1, "apple banana cherry", "en", 10),
        (2, "apple dates", "de", 300),
        (3, "banana cherry dates", "en", 500),
        (4, "dates melon", "en", 500),
        (5, "apple fruit", None, 50),
    ]
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, length LONG"
    )


# ---------------------------------------------------------------------------
# dis_max
# ---------------------------------------------------------------------------


def _clause_scores(docs, clauses):
    """{(clause_idx, doc_id): score} via the verified plain scorer."""
    out = score_queries(
        docs, list(enumerate(clauses)), k=100,
        id_col="doc_id", text_col="text",
    ).collect()
    return {(r.query_id, r.doc_id): r.score for r in out}


def test_dismax_tie0_is_best_clause(fruit_docs):
    clauses = ["apple banana", "dates"]
    per = _clause_scores(fruit_docs, clauses)
    got = {
        r.doc_id: r.score
        for r in dismax_search(
            fruit_docs, [(7, clauses)], tie_breaker=0.0, k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    docs = {d for _, d in per}
    assert set(got) == docs
    for d in docs:
        want = max(per.get((i, d), 0.0) for i in range(len(clauses)))
        assert math.isclose(got[d], want, rel_tol=1e-12), d


def test_dismax_tie1_disjoint_clauses_is_plain_sum(fruit_docs):
    """tie_breaker=1 -> sum of clauses; with term-disjoint clauses that
    equals one flat BM25 over the concatenated query string."""
    clauses = ["apple banana", "dates melon"]
    flat = {
        r.doc_id: r.score
        for r in score_queries(
            fruit_docs, [(0, "apple banana dates melon")], k=100,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    got = {
        r.doc_id: r.score
        for r in dismax_search(
            fruit_docs, [(0, clauses)], tie_breaker=1.0, k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    assert set(got) == set(flat)
    for d, s in flat.items():
        assert math.isclose(got[d], s, rel_tol=1e-12), d


def test_dismax_stopword_clause_contributes_nothing(fruit_docs):
    base = dismax_search(
        fruit_docs, [(0, ["apple"])], tie_breaker=0.4, k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    with_stop = dismax_search(
        fruit_docs, [(0, ["the a an", "apple"])], tie_breaker=0.4, k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    assert sorted((r.doc_id, r.score, r.rank) for r in base) == sorted(
        (r.doc_id, r.score, r.rank) for r in with_stop
    )


def test_dismax_guards(fruit_docs):
    with pytest.raises(ValueError, match="tie_breaker"):
        dismax_search(fruit_docs, [(0, ["x"])], tie_breaker=1.5)
    with pytest.raises(ValueError, match="out of composite-id range"):
        dismax_search(fruit_docs, [(2**31, ["x"])])
    with pytest.raises(ValueError, match="clauses"):
        dismax_search(fruit_docs, [(0, ["x"] * 1001)])


# ---------------------------------------------------------------------------
# filters aggregation
# ---------------------------------------------------------------------------

BUCKETS = {
    "english": {"lang": {"eq": "en"}},
    "long": {"length": {"gte": 100}},
}


def test_filters_agg_hand_counted(fruit_docs):
    """Query 'apple' matches docs 1, 2, 5. english={1}, long={2},
    other={5} (NULL lang fails exists; 50 < 100). Query 'zzz' matches
    nothing but must still emit every bucket with doc_count 0."""
    scores = {
        r.doc_id: r.score
        for r in score_queries(
            fruit_docs, [(1, "apple")], k=100,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    out = filters_facets(
        fruit_docs, [(1, "apple"), (2, "zzz")], BUCKETS,
        other_bucket=True, metadata_col=None,
        id_col="doc_id", text_col="text",
    ).collect()
    rows = {(r.query_id, r.bucket): r for r in out}
    assert len(out) == 6  # fixed shape: 2 queries x 3 buckets
    assert rows[(1, "english")].doc_count == 1
    assert math.isclose(rows[(1, "english")].avg_score, scores[1])
    assert rows[(1, "long")].doc_count == 1
    assert math.isclose(rows[(1, "long")].avg_score, scores[2])
    assert rows[(1, "_other_")].doc_count == 1
    assert math.isclose(rows[(1, "_other_")].avg_score, scores[5])
    for b in ("english", "long", "_other_"):
        assert rows[(2, b)].doc_count == 0
        assert rows[(2, b)].avg_score is None


def test_filters_agg_overlap_counts_both(fruit_docs):
    """Doc 3 (en, 500) matches 'banana' and lands in BOTH buckets;
    overlapping docs are never in _other_."""
    out = filters_facets(
        fruit_docs, [(0, "banana cherry")], BUCKETS,
        other_bucket=True, metadata_col=None,
        id_col="doc_id", text_col="text",
    ).collect()
    rows = {r.bucket: r for r in out}
    # matches: docs 1, 3. english={1,3}; long={3}; other={} (doc 1 is en)
    assert rows["english"].doc_count == 2
    assert rows["long"].doc_count == 1
    assert rows["_other_"].doc_count == 0
    assert rows["_other_"].avg_score is None


def test_filters_agg_guards(fruit_docs):
    with pytest.raises(ValueError, match="non-empty"):
        filters_facets(fruit_docs, [(0, "apple")], {})
    with pytest.raises(ValueError, match="_other_"):
        filters_facets(
            fruit_docs, [(0, "apple")],
            {"_other_": {"lang": {"eq": "en"}}}, other_bucket=True,
        )


# ---------------------------------------------------------------------------
# MMR
# ---------------------------------------------------------------------------


def _unit(deg: float) -> list[float]:
    r = math.radians(deg)
    return [math.cos(r), math.sin(r)]


@pytest.fixture(scope="module")
def angle_vecs(spark):
    # Unit vectors by angle from the query (at 0 deg): a near-duplicate
    # pair (5, 15 deg) and one diverse vector (80 deg).
    rows = [(1, _unit(5.0)), (2, _unit(15.0)), (3, _unit(80.0))]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_mmr_hand_computed_diversity(angle_vecs):
    """lam=0.3: pick1 = vec 1 (best rel). Step 2: vec 2 is redundant
    (cos 10 deg to the pick), vec 3 wins despite far lower relevance.
    Scores carry the mmr value at selection time."""
    q = [(0, _unit(0.0))]
    out = mmr_topk(angle_vecs, q, k=3, pool=3, lam=0.3).collect()
    by_rank = {r.rank: r for r in out}
    assert [by_rank[i].vec_id for i in (1, 2, 3)] == [1, 3, 2]
    lam = 0.3
    rel = {1: math.cos(math.radians(5)), 2: math.cos(math.radians(15)),
           3: math.cos(math.radians(80))}
    assert math.isclose(by_rank[1].score, lam * rel[1], rel_tol=1e-12)
    want3 = lam * rel[3] - (1 - lam) * math.cos(math.radians(75))
    assert math.isclose(by_rank[2].score, want3, rel_tol=1e-9)
    # last pick's penalty is the max over BOTH selected (10 < 65 deg)
    want2 = lam * rel[2] - (1 - lam) * math.cos(math.radians(10))
    assert math.isclose(by_rank[3].score, want2, rel_tol=1e-9)


def test_mmr_lam1_is_pure_relevance(spark):
    rows = [(i, [float(i % 7), float((3 * i) % 5), 1.0]) for i in range(30)]
    vecs = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    q = [(0, [1.0, 2.0, 0.5]), (1, [0.1, 0.9, 2.0])]
    plain = brute_topk(vecs, q, k=5)
    got = mmr_topk(vecs, q, k=5, pool=10, lam=1.0)
    assert sorted(
        (r.query_id, r.vec_id, r.rank) for r in got.collect()
    ) == sorted((r.query_id, r.vec_id, r.rank) for r in plain.collect())


def test_mmr_pool_smaller_than_k_and_guards(angle_vecs):
    out = mmr_topk(
        angle_vecs, [(0, _unit(0.0))], k=3, pool=10, lam=0.5
    ).collect()
    assert sorted(r.rank for r in out) == [1, 2, 3]  # only 3 candidates
    with pytest.raises(ValueError, match="lam"):
        mmr_topk(angle_vecs, [(0, _unit(0.0))], k=2, pool=5, lam=-0.1)
    with pytest.raises(ValueError, match="exceeds"):
        mmr_topk(angle_vecs, [(0, _unit(0.0))], k=6, pool=5)


# ---------------------------------------------------------------------------
# multi_match
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def field_docs(spark):
    rows = [
        (1, "apple pie", "apple banana cherry melon"),
        (2, "banana split", "apple dates"),
        (3, "cherry tart", "banana cherry dates melon"),
        (4, "dates cake", "dates melon grape"),
    ]
    return spark.createDataFrame(
        rows, "doc_id LONG, title STRING, body STRING"
    )


def _field_scores(docs, queries, field):
    out = score_queries(
        docs, queries, k=100, id_col="doc_id", text_col=field,
    ).collect()
    return {(r.query_id, r.doc_id): r.score for r in out}


@pytest.mark.parametrize("mode,tie", [("best_fields", 0.3), ("most_fields", 0.0)])
def test_multi_match_matches_per_field_combine(field_docs, mode, tie):
    """Combine against per-field plain BM25 (each field its own corpus
    stats) computed via the verified single-field scorer."""
    from same_same_spark.operators.multimatch import multi_match_search

    queries = [(0, "apple dates"), (1, "cherry")]
    fields = {"title": 2.0, "body": 1.0}
    per = {f: _field_scores(field_docs, queries, f) for f in fields}
    got = {
        (r.query_id, r.doc_id): r.score
        for r in multi_match_search(
            field_docs, queries, fields, mode=mode, tie_breaker=tie,
            k=10, id_col="doc_id",
        ).collect()
    }
    keys = {k for f in fields for k in per[f]}
    assert set(got) == keys
    for key in keys:
        s = [w * per[f].get(key, 0.0) for f, w in fields.items()
             if key in per[f]]
        want = sum(s) if mode == "most_fields" else (
            max(s) + tie * (sum(s) - max(s))
        )
        assert math.isclose(got[key], want, rel_tol=1e-12), key


def test_multi_match_single_field_is_plain_bm25(field_docs):
    from same_same_spark.operators.multimatch import multi_match_search

    queries = [(0, "apple dates")]
    plain = score_queries(
        field_docs, queries, k=10, id_col="doc_id", text_col="body",
    ).collect()
    got = multi_match_search(
        field_docs, queries, {"body": 1.0}, k=10, id_col="doc_id",
    ).collect()
    assert sorted((r.doc_id, r.score, r.rank) for r in plain) == sorted(
        (r.doc_id, r.score, r.rank) for r in got
    )


def test_multi_match_zero_boost_drops_field(field_docs):
    from same_same_spark.operators.multimatch import multi_match_search

    queries = [(0, "apple dates")]
    with_zero = multi_match_search(
        field_docs, queries, {"title": 0.0, "body": 1.0},
        k=10, id_col="doc_id",
    ).collect()
    only_body = multi_match_search(
        field_docs, queries, {"body": 1.0}, k=10, id_col="doc_id",
    ).collect()
    assert sorted(map(tuple, with_zero)) == sorted(map(tuple, only_body))
    # every field zero-boosted -> empty result, stable schema
    assert multi_match_search(
        field_docs, queries, {"title": 0.0}, k=10, id_col="doc_id",
    ).count() == 0


def test_multi_match_guards(field_docs):
    from same_same_spark.operators.multimatch import multi_match_search

    with pytest.raises(ValueError, match="mode"):
        multi_match_search(field_docs, [(0, "x")], {"body": 1.0},
                           mode="cross_fields")
    with pytest.raises(ValueError, match="tie_breaker"):
        multi_match_search(field_docs, [(0, "x")], {"body": 1.0},
                           tie_breaker=2.0)
    with pytest.raises(ValueError, match="non-empty"):
        multi_match_search(field_docs, [(0, "x")], {})
    with pytest.raises(ValueError, match="non-negative"):
        multi_match_search(field_docs, [(0, "x")], {"body": -1.0})


# ---------------------------------------------------------------------------
# matrix_stats
# ---------------------------------------------------------------------------


def test_matrix_stats_hand_computed(spark):
    """Query 'apple' matches docs 1-3; doc 3 has a NULL y and is
    dropped (complete-case), so the matrix runs over docs 1, 2:
    covar_samp and corr of two points are exact closed forms."""
    from same_same_spark.operators.facets import matrix_stats_facets

    rows = [
        (1, "apple", 1.0, 10.0),
        (2, "apple pie", 3.0, 14.0),
        (3, "apple cake", 5.0, None),
        (4, "banana", 7.0, 99.0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, x DOUBLE, y DOUBLE"
    )
    out = matrix_stats_facets(
        docs, [(0, "apple"), (1, "zzz")], ["x", "y"],
        id_col="doc_id", text_col="text",
    ).collect()
    assert len(out) == 1  # query 1 matches nothing -> no row
    r = out[0]
    assert (r.query_id, r.field_a, r.field_b, r.n) == (0, "x", "y", 2)
    # two points (1,10), (3,14): covar_samp = (1-2)(10-12)+(3-2)(14-12)
    # = 4 over n-1=1; corr = +1 (perfectly linear)
    assert math.isclose(r.covariance, 4.0, rel_tol=1e-12)
    assert math.isclose(r.correlation, 1.0, rel_tol=1e-12)


def test_matrix_stats_degenerate_to_null(spark):
    """n=1 (covar_samp undefined) and zero variance (corr NaN) both
    surface as NULL — the pinned cross-engine normalization."""
    from same_same_spark.operators.facets import matrix_stats_facets

    docs = spark.createDataFrame(
        [(1, "apple", 1.0, 2.0), (2, "banana", 5.0, 2.0),
         (3, "banana", 9.0, 2.0)],
        "doc_id LONG, text STRING, x DOUBLE, y DOUBLE",
    )
    out = {
        r.query_id: r
        for r in matrix_stats_facets(
            docs, [(0, "apple"), (1, "banana")], ["x", "y"],
            id_col="doc_id", text_col="text",
        ).collect()
    }
    assert out[0].n == 1
    assert out[0].covariance is None and out[0].correlation is None
    assert out[1].n == 2
    assert out[1].covariance == 0.0  # y constant
    assert out[1].correlation is None  # 0/0 -> NaN -> NULL


def test_matrix_stats_guards(spark):
    from same_same_spark.operators.facets import matrix_stats_facets

    docs = spark.createDataFrame(
        [(1, "a", 1.0)], "doc_id LONG, text STRING, x DOUBLE"
    )
    with pytest.raises(ValueError, match=">= 2"):
        matrix_stats_facets(docs, [(0, "a")], ["x"])
    with pytest.raises(ValueError, match="duplicate"):
        matrix_stats_facets(docs, [(0, "a")], ["x", "x"])


# ---------------------------------------------------------------------------
# rare_terms / weighted_avg / bucket_selector / bucket_sort
# ---------------------------------------------------------------------------


def test_rare_terms_hand_counted(spark):
    """Match set of 'apple' = docs 1-4. Facet counts: x=2, y=1, z=1
    (NULL excluded). max_doc_count=1 keeps y, z (count ASC, value ASC);
    max_doc_count=2 adds x after them."""
    from same_same_spark.operators.facets import rare_terms_facets

    docs = spark.createDataFrame(
        [(1, "apple", "x"), (2, "apple", "x"), (3, "apple", "y"),
         (4, "apple pie", "z"), (5, "apple tart", None),
         (6, "banana", "w")],
        "doc_id LONG, text STRING, f STRING",
    )
    out = rare_terms_facets(
        docs, [(0, "apple")], "f", max_doc_count=1, topn=10,
        id_col="doc_id", text_col="text",
    ).collect()
    assert [(r.value, r.doc_count, r.rank) for r in out] == [
        ("y", 1, 1), ("z", 1, 2)
    ]
    out2 = rare_terms_facets(
        docs, [(0, "apple")], "f", max_doc_count=2, topn=10,
        id_col="doc_id", text_col="text",
    ).collect()
    assert [(r.value, r.doc_count, r.rank) for r in out2] == [
        ("y", 1, 1), ("z", 1, 2), ("x", 2, 3)
    ]
    with pytest.raises(ValueError, match="max_doc_count"):
        rare_terms_facets(docs, [(0, "apple")], "f", max_doc_count=0)


def test_weighted_avg_hand_computed(spark):
    """Docs 1-3 match; doc 3 has a NULL weight and is skipped (ES
    missing semantics): (10*1 + 30*3) / 4 = 25. A second query's
    matches all carry weight 0 -> NULL (never an ANSI throw)."""
    from same_same_spark.operators.facets import weighted_avg_facets

    docs = spark.createDataFrame(
        [(1, "apple", 10.0, 1.0), (2, "apple", 30.0, 3.0),
         (3, "apple", 99.0, None), (4, "banana", 7.0, 0.0)],
        "doc_id LONG, text STRING, v DOUBLE, w DOUBLE",
    )
    out = {
        r.query_id: r
        for r in weighted_avg_facets(
            docs, [(0, "apple"), (1, "banana"), (2, "zzz")], "v", "w",
            id_col="doc_id", text_col="text",
        ).collect()
    }
    assert out[0].n == 2
    assert math.isclose(out[0].weighted_avg, 25.0, rel_tol=1e-12)
    assert out[1].n == 1 and out[1].weighted_avg is None
    assert 2 not in out  # no match -> no row


def test_bucket_selector_bounds(spark):
    from same_same_spark.operators.events import bucket_selector

    series = spark.createDataFrame(
        [("a", 1, 0), ("a", 2, 5), ("a", 3, None), ("a", 4, 9)],
        "g STRING, bucket INT, doc_count INT",
    )
    kept = bucket_selector(series, min_value=1, max_value=8).collect()
    assert [r.bucket for r in kept] == [2]  # NULL never matches
    lo = bucket_selector(series, min_value=5).collect()
    assert sorted(r.bucket for r in lo) == [2, 4]
    with pytest.raises(ValueError, match="min_value or max_value"):
        bucket_selector(series)


def test_bucket_sort_per_group_with_ties_and_paging(spark):
    from same_same_spark.operators.events import bucket_sort

    series = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 9), ("a", 3, 9), ("a", 4, 1),
         ("b", 1, 2), ("b", 2, 2)],
        "g STRING, bucket INT, doc_count INT",
    )
    top = bucket_sort(
        series, size=2, sort_col="doc_count", order_col="bucket",
        group_cols=["g"],
    ).collect()
    rows = sorted((r.g, r.bucket_rank, r.bucket, r.doc_count) for r in top)
    # ties (9, 9) break bucket ASC; b's tie (2, 2) likewise
    assert rows == [
        ("a", 1, 2, 9), ("a", 2, 3, 9), ("b", 1, 1, 2), ("b", 2, 2, 2)
    ]
    page2 = bucket_sort(
        series, size=2, sort_col="doc_count", order_col="bucket",
        group_cols=["g"], from_=2,
    ).collect()
    assert sorted((r.g, r.bucket_rank, r.bucket) for r in page2) == [
        ("a", 3, 1), ("a", 4, 4)
    ]
    asc = bucket_sort(
        series, size=1, sort_col="doc_count", order_col="bucket",
        group_cols=["g"], ascending=True,
    ).collect()
    assert sorted((r.g, r.bucket) for r in asc) == [("a", 4), ("b", 1)]
    with pytest.raises(ValueError, match="size"):
        bucket_sort(series, size=0)
    with pytest.raises(ValueError, match="from_"):
        bucket_sort(series, size=1, from_=-1)


def test_bucket_sort_global_no_groups(spark):
    from same_same_spark.operators.events import bucket_sort

    series = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 7)], "bucket INT, doc_count INT",
    )
    top = bucket_sort(series, size=2, group_cols=None).collect()
    assert [(r.bucket, r.bucket_rank) for r in
            sorted(top, key=lambda r: r.bucket_rank)] == [(2, 1), (3, 2)]


# ---------------------------------------------------------------------------
# span_first / sampler agg
# ---------------------------------------------------------------------------


def test_span_first_position_gate(spark):
    """end=2: doc 1 has 'apple' at pos 1, doc 2 at pos 3 (gated out),
    doc 3 has 'banana' (query's 2nd term) at pos 2 -> first_pos
    reports the earliest QUERY-TERM position within the window."""
    from same_same_spark.operators.spannear import span_first_search

    docs = spark.createDataFrame(
        [(1, "apple pie crust"), (2, "pie crust apple"),
         (3, "pie banana apple")],
        "doc_id LONG, text STRING",
    )
    out = span_first_search(
        docs, [(0, "apple banana")], end=2, k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    got = {r.doc_id: r.first_pos for r in out}
    assert got == {1: 1, 3: 2}
    # scores = full-query BM25, identical to the unrestricted scorer
    full = {
        r.doc_id: r.score
        for r in score_queries(
            docs, [(0, "apple banana")], k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    for r in out:
        assert math.isclose(r.score, full[r.doc_id], rel_tol=1e-12)
    with pytest.raises(ValueError, match="end"):
        span_first_search(docs, [(0, "apple")], end=0)


def test_span_first_end_beyond_doc_len(spark):
    """end larger than every doc: matches every doc holding any term
    (degrades to plain match + first occurrence position)."""
    from same_same_spark.operators.spannear import span_first_search

    docs = spark.createDataFrame(
        [(1, "pie crust apple"), (2, "melon")],
        "doc_id LONG, text STRING",
    )
    out = span_first_search(
        docs, [(0, "apple")], end=100, k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    assert [(r.doc_id, r.first_pos) for r in out] == [(1, 3)]


def test_sampler_terms_restricts_to_top_scores(spark):
    """shard_size=2: the sample keeps the two best 'apple' docs (1, 2 —
    higher tf); doc 3's facet value never shows. Within the sample
    counts rank (count DESC, value ASC)."""
    from same_same_spark.operators.facets import sampler_terms_facets

    docs = spark.createDataFrame(
        [(1, "apple apple apple", "x"), (2, "apple apple pie", "y"),
         (3, "apple crumble pie dish", "z")],
        "doc_id LONG, text STRING, f STRING",
    )
    out = sampler_terms_facets(
        docs, [(0, "apple")], "f", shard_size=2, topn=5,
        id_col="doc_id", text_col="text",
    ).collect()
    assert [(r.value, r.doc_count, r.rank) for r in out] == [
        ("x", 1, 1), ("y", 1, 2)
    ]
    with pytest.raises(ValueError, match="shard_size"):
        sampler_terms_facets(docs, [(0, "apple")], "f", shard_size=0)


# ---------------------------------------------------------------------------
# rank_feature / distance_feature / terms_set
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def feat_docs(spark):
    rows = [
        (1, "apple banana", 100.0),
        (2, "apple cherry", 300.0),
        (3, "apple dates", None),
        (4, "apple melon", 0.0),
    ]
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, feat DOUBLE"
    )


def test_rank_feature_saturation_hand_computed(feat_docs):
    from same_same_spark.operators.feature import rank_feature_topk

    base = {
        r.doc_id: r.score
        for r in score_queries(
            feat_docs, [(0, "apple")], k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    got = {
        r.doc_id: r.score
        for r in rank_feature_topk(
            feat_docs, [(0, "apple")], "feat",
            function="saturation", pivot=100.0, boost=2.0, k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    assert set(got) == set(base)  # feature never gates matching
    assert math.isclose(got[1], base[1] + 2.0 * 100.0 / 200.0)
    assert math.isclose(got[2], base[2] + 2.0 * 300.0 / 400.0)
    assert math.isclose(got[3], base[3])  # NULL -> 0 contribution
    assert math.isclose(got[4], base[4])  # non-positive -> 0


def test_rank_feature_log_sigmoid_and_guards(feat_docs):
    from same_same_spark.operators.feature import rank_feature_topk

    got = {
        r.doc_id: r.score
        for r in rank_feature_topk(
            feat_docs, [(0, "apple")], "feat",
            function="log", pivot=1.0, boost=1.0, k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    base = {
        r.doc_id: r.score
        for r in score_queries(
            feat_docs, [(0, "apple")], k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    assert math.isclose(got[1], base[1] + math.log(101.0))
    sig = {
        r.doc_id: r.score
        for r in rank_feature_topk(
            feat_docs, [(0, "apple")], "feat",
            function="sigmoid", pivot=100.0, exponent=2.0, boost=1.0,
            k=10, id_col="doc_id", text_col="text",
        ).collect()
    }
    assert math.isclose(sig[2], base[2] + 300.0**2 / (300.0**2 + 100.0**2))
    with pytest.raises(ValueError, match="function"):
        rank_feature_topk(feat_docs, [(0, "x")], "feat", function="exp")
    with pytest.raises(ValueError, match="pivot"):
        rank_feature_topk(feat_docs, [(0, "x")], "feat", pivot=0.0)
    with pytest.raises(ValueError, match="scaling_factor"):
        rank_feature_topk(
            feat_docs, [(0, "x")], "feat", function="log", pivot=0.5
        )
    with pytest.raises(ValueError, match="exponent"):
        rank_feature_topk(
            feat_docs, [(0, "x")], "feat", function="sigmoid", exponent=0.0
        )


def test_distance_feature_hand_computed(feat_docs):
    from same_same_spark.operators.feature import distance_feature_topk

    base = {
        r.doc_id: r.score
        for r in score_queries(
            feat_docs, [(0, "apple")], k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    got = {
        r.doc_id: r.score
        for r in distance_feature_topk(
            feat_docs, [(0, "apple")], "feat",
            origin=100.0, pivot=50.0, boost=3.0, k=10,
            id_col="doc_id", text_col="text",
        ).collect()
    }
    assert math.isclose(got[1], base[1] + 3.0)  # at the origin: S = 1
    assert math.isclose(got[2], base[2] + 3.0 * 50.0 / 250.0)
    assert math.isclose(got[3], base[3])  # NULL -> 0
    assert math.isclose(got[4], base[4] + 3.0 * 50.0 / 150.0)
    with pytest.raises(ValueError, match="pivot"):
        distance_feature_topk(
            feat_docs, [(0, "x")], "feat", origin=0.0, pivot=0.0
        )


def test_terms_set_per_doc_requirement(spark):
    """Query 'apple banana cherry' (m=3). Doc msm: 1 -> needs 1 hit;
    4 -> clamps to 3; 0 -> floors to 1; NULL -> never matches."""
    from same_same_spark.operators.boolquery import terms_set_search

    docs = spark.createDataFrame(
        [(1, "apple pie", 1), (2, "apple banana", 3),
         (3, "apple banana cherry", 4), (4, "apple banana cherry", None),
         (5, "apple melon", 0)],
        "doc_id LONG, text STRING, req INT",
    )
    out = terms_set_search(
        docs, [(0, "apple banana cherry")], "req", k=10,
        id_col="doc_id", text_col="text",
    ).collect()
    got = {r.doc_id: r.n_matched for r in out}
    # doc 2 needs 3 but has 2 -> out; doc 3 clamps 4->3 and has 3 -> in
    assert got == {1: 1, 3: 3, 5: 1}


# ---------------------------------------------------------------------------
# percentile_ranks / missing / retrieval_eval
# ---------------------------------------------------------------------------


def test_percentile_ranks_hand_computed(spark):
    from same_same_spark.operators.facets import percentile_ranks_facets

    docs = spark.createDataFrame(
        [(1, "apple", 10.0), (2, "apple", 20.0), (3, "apple", 30.0),
         (4, "apple", None), (5, "banana", 99.0)],
        "doc_id LONG, text STRING, v DOUBLE",
    )
    out = {
        (r.query_id, r.value): r.pct
        for r in percentile_ranks_facets(
            docs, [(0, "apple"), (1, "zzz")], "v", [15.0, 30.0],
            id_col="doc_id", text_col="text",
        ).collect()
    }
    # non-null matched values: 10, 20, 30 (doc 4's NULL drops)
    assert math.isclose(out[(0, 15.0)], 100.0 / 3.0)
    assert math.isclose(out[(0, 30.0)], 100.0)
    assert not any(q == 1 for q, _ in out)  # no match -> no rows
    with pytest.raises(ValueError, match="non-empty"):
        percentile_ranks_facets(docs, [(0, "apple")], "v", [])


def test_missing_agg_fixed_shape(spark):
    from same_same_spark.operators.facets import missing_facets

    docs = spark.createDataFrame(
        [(1, "apple", None), (2, "apple", "x"), (3, "apple", None),
         (4, "banana", None)],
        "doc_id LONG, text STRING, f STRING",
    )
    out = {
        r.query_id: r.doc_count
        for r in missing_facets(
            docs, [(0, "apple"), (1, "zzz")], "f",
            id_col="doc_id", text_col="text",
        ).collect()
    }
    assert out == {0: 2, 1: 0}  # fixed shape: zero-match query emits 0


def test_retrieval_eval_hand_computed(spark):
    """truth = {a, b, c} ranked 1..3; results rank (d, b, c):
    recall 2/3; first relevant at rank 2 -> mrr 0.5;
    DCG = 1/log2(3) + 1/log2(4); IDCG = 1 + 1/log2(3) + 1/log2(4)."""
    from same_same_spark.operators.releval import retrieval_eval

    res = spark.createDataFrame(
        [(0, 99, 1), (0, 2, 2), (0, 3, 3),
         (1, 7, 1)],
        "query_id INT, vec_id LONG, rank INT",
    )
    tru = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3),
         (2, 5, 1)],
        "query_id INT, vec_id LONG, rank INT",
    )
    out = {r.query_id: r for r in retrieval_eval(res, tru).collect()}
    dcg = 1 / math.log2(3) + 1 / math.log2(4)
    idcg = 1.0 + 1 / math.log2(3) + 1 / math.log2(4)
    assert math.isclose(out[0].recall, 2.0 / 3.0)
    assert math.isclose(out[0].mrr, 0.5)
    assert math.isclose(out[0].ndcg, dcg / idcg)
    # truth query 2 has no results -> all zeros
    assert (out[2].recall, out[2].mrr, out[2].ndcg) == (0.0, 0.0, 0.0)
    # results-only query 1 is not in truth -> no row
    assert 1 not in out


def test_retrieval_eval_perfect_run_is_all_ones(spark):
    from same_same_spark.operators.releval import retrieval_eval

    rows = [(0, i, i) for i in range(1, 6)]
    res = spark.createDataFrame(rows, "query_id INT, vec_id LONG, rank INT")
    out = retrieval_eval(res, res).collect()[0]
    assert (out.recall, out.mrr, out.ndcg) == (1.0, 1.0, 1.0)


# ---------------------------------------------------------------------------
# match_phrase_prefix
# ---------------------------------------------------------------------------


def test_match_phrase_prefix_adjacency_and_counts(spark):
    """'banana ch' must match 'banana cherry' / 'banana chard'
    adjacently, NOT 'banana pie cherry' (gap) nor 'cherry banana'
    (order)."""
    from same_same_spark.operators.phrase import match_phrase_prefix_search

    docs = spark.createDataFrame(
        [(1, "banana cherry pie"), (2, "banana chard salad"),
         (3, "banana pie cherry"), (4, "cherry banana"),
         (5, "banana cherry banana chard")],
        "doc_id LONG, text STRING",
    )
    out = match_phrase_prefix_search(
        docs, [(0, "banana ch")], k=10, id_col="doc_id", text_col="text",
    ).collect()
    got = {r.doc_id: r.n_matches for r in out}
    assert got == {1: 1, 2: 1, 5: 2}


def test_match_phrase_prefix_self_completion(spark):
    """Query 'apple app': 'apple' is BOTH the fixed token and a
    completion — doc 'apple apple' must match (the candidate gate may
    not treat fixed/completion as complementary roles)."""
    from same_same_spark.operators.phrase import match_phrase_prefix_search

    docs = spark.createDataFrame(
        [(1, "apple apple pie"), (2, "apple pie")],
        "doc_id LONG, text STRING",
    )
    out = match_phrase_prefix_search(
        docs, [(0, "apple app")], k=10, id_col="doc_id", text_col="text",
    ).collect()
    assert {r.doc_id: r.n_matches for r in out} == {1: 1}


def test_match_phrase_prefix_pure_prefix_and_empty_expansion(spark):
    from same_same_spark.operators.phrase import match_phrase_prefix_search

    docs = spark.createDataFrame(
        [(1, "melon mango"), (2, "melody")], "doc_id LONG, text STRING",
    )
    # pure prefix (no fixed tokens): every completion position counts
    out = match_phrase_prefix_search(
        docs, [(0, "mel")], k=10, id_col="doc_id", text_col="text",
    ).collect()
    assert {r.doc_id: r.n_matches for r in out} == {1: 1, 2: 1}
    # a prefix completing nothing matches nothing, even if fixed match
    assert match_phrase_prefix_search(
        docs, [(0, "melon zzz")], k=10, id_col="doc_id", text_col="text",
    ).count() == 0


def test_match_phrase_prefix_expansion_cap(spark):
    """max_expansions=1 keeps only the highest-df completion
    (df DESC, term ASC): 'ca' -> 'carrot' (df 2) beats 'cabbage'."""
    from same_same_spark.operators.phrase import match_phrase_prefix_search

    docs = spark.createDataFrame(
        [(1, "fresh carrot"), (2, "fresh carrot soup"),
         (3, "fresh cabbage")],
        "doc_id LONG, text STRING",
    )
    out = match_phrase_prefix_search(
        docs, [(0, "fresh ca")], k=10, max_expansions=1,
        id_col="doc_id", text_col="text",
    ).collect()
    assert sorted(r.doc_id for r in out) == [1, 2]  # cabbage capped out


# ---------------------------------------------------------------------------
# closed-form linear LTR
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ltr_feats(spark):
    rows = []
    for q in (0, 1):
        for d in range(1, 9):
            f1 = float((d * 7 + q) % 5)
            f2 = float((d * 3) % 4)
            y = 2.0 * f1 - 0.5 * f2 + 3.0  # exact linear target
            rows.append((q, d, f1, f2, 1.0, y))
    return spark.createDataFrame(
        rows,
        "query_id INT, doc_id LONG, f1 DOUBLE, f2 DOUBLE, "
        "bias DOUBLE, y DOUBLE",
    )


def test_ltr_recovers_exact_linear_weights(ltr_feats):
    from same_same_spark.operators.ltr import (
        ltr_score_topk,
        train_linear_ranker,
    )

    w = train_linear_ranker(ltr_feats, ["f1", "f2", "bias"], "y", l2=0.0)
    assert math.isclose(w[0], 2.0, abs_tol=1e-9)
    assert math.isclose(w[1], -0.5, abs_tol=1e-9)
    assert math.isclose(w[2], 3.0, abs_tol=1e-9)
    top = ltr_score_topk(ltr_feats, ["f1", "f2", "bias"], w, k=3).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        keys = [(-round(r.score, 9), r.doc_id) for r in rs]
        assert keys == sorted(keys) and len(rs) == 3


def test_ltr_ridge_shrinks_and_null_rows_drop(spark, ltr_feats):
    from same_same_spark.operators.ltr import train_linear_ranker

    w0 = train_linear_ranker(ltr_feats, ["f1", "f2", "bias"], "y", l2=0.0)
    wr = train_linear_ranker(
        ltr_feats, ["f1", "f2", "bias"], "y", l2=1000.0
    )
    assert sum(x * x for x in wr) < sum(x * x for x in w0)
    # a NULL-label row must not perturb the exact recovery
    extra = ltr_feats.unionByName(
        spark.createDataFrame(
            [(9, 99, 1.0, 1.0, 1.0, None)],
            "query_id INT, doc_id LONG, f1 DOUBLE, f2 DOUBLE, "
            "bias DOUBLE, y DOUBLE",
        )
    )
    w = train_linear_ranker(extra, ["f1", "f2", "bias"], "y", l2=0.0)
    assert math.isclose(w[0], 2.0, abs_tol=1e-9)


def test_ltr_guards(spark, ltr_feats):
    from same_same_spark.operators.ltr import (
        ltr_score_topk,
        train_linear_ranker,
    )

    with pytest.raises(ValueError, match="non-empty"):
        train_linear_ranker(ltr_feats, [], "y")
    with pytest.raises(ValueError, match="l2"):
        train_linear_ranker(ltr_feats, ["f1"], "y", l2=-1.0)
    with pytest.raises(ValueError, match="singular"):
        # duplicated feature -> rank-deficient at l2=0
        train_linear_ranker(ltr_feats, ["f1", "f1", "bias"], "y", l2=0.0)
    with pytest.raises(ValueError, match="no complete-case"):
        train_linear_ranker(
            ltr_feats.filter("query_id = 99"), ["f1"], "y"
        )
    with pytest.raises(ValueError, match="mismatch"):
        ltr_score_topk(ltr_feats, ["f1", "f2"], [1.0])
