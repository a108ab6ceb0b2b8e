"""Unit tests for faceted search and keyset pagination: brute-force
differentials here, the cross-engine DuckDB differential through the
registry gate in test_entry.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from same_same_spark.bm25 import scored_matches
from same_same_spark.operators.facets import search_facets
from same_same_spark.operators.topk import search_after, topk_per_query
from same_same_spark.text.tokenizer import tokenize_py

DOCS = [
    # (doc_id, text, lang, source)
    (1, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (2, "quick brown quick brown quick", "en", "book"),
    (3, "brown fox? brown FOX! brown fox", "de", "web"),
    (4, "dog dog dog dog", "en", "web"),
    (5, "nothing relevant here whatsoever", "de", "book"),
    (6, "", "en", None),
    (7, "fox quick brown", None, "news"),
    (8, "quince quantum quack quick", "fr", "news"),
]


def _docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id LONG, text STRING, lang STRING, source STRING"
    )


def _brute_facets(query: str, cols: list[str], topn: int):
    qterms = set(tokenize_py(query))
    matched = [
        row for row in DOCS if qterms & set(tokenize_py(row[1]))
    ]
    out = []
    col_idx = {"lang": 2, "source": 3}
    for c in cols:
        counts: dict[str, int] = {}
        for row in matched:
            v = row[col_idx[c]]
            if v is not None:
                counts[v] = counts.get(v, 0) + 1
        vals = sorted(counts, key=lambda v: (-counts[v], v))[:topn]
        out += [
            (c, v, counts[v], i + 1) for i, v in enumerate(vals)
        ]
    return sorted(out)


@pytest.mark.parametrize(
    "query",
    [
        "quick fox",     # matches across langs/sources incl. NULLs
        "dog",           # small match set
        "quack quince",  # single doc
        "the a an",      # zero tokens -> no rows
        "missingzz",     # no matches -> no rows
    ],
)
def test_facets_match_brute_force(spark, query):
    got = sorted(
        (r["facet"], r["value"], r["doc_count"], r["rank"])
        for r in search_facets(
            _docs_df(spark), [(1, query)], ["lang", "source"], topn=5,
            id_col="doc_id", text_col="text",
        ).collect()
    )
    assert got == _brute_facets(query, ["lang", "source"], 5), query


def test_facets_topn_cap_and_ties(spark):
    """topn keeps the highest counts, ties by value ASC."""
    got = [
        (r["value"], r["doc_count"])
        for r in sorted(
            search_facets(
                _docs_df(spark), [(1, "quick fox dog")], ["lang"], topn=1,
                id_col="doc_id", text_col="text",
            ).collect(),
            key=lambda r: r["rank"],
        )
    ]
    # matched: docs 1,2,3,4,7,8 -> lang counts en=3 de=1 fr=1 (doc 7 NULL)
    assert got == [("en", 3)]


def test_facets_empty_cols_raises(spark):
    with pytest.raises(ValueError):
        search_facets(_docs_df(spark), [(1, "quick")], [])


# --------------------------------------------------------------------------
# search_after
# --------------------------------------------------------------------------


def _pages(spark, queries, k):
    docs = _docs_df(spark)
    scored = scored_matches(docs, queries, id_col="doc_id", text_col="text")
    page1 = topk_per_query(scored, k)
    cursor = page1.filter(F.col("rank") == k).select(
        "query_id",
        F.col("score").alias("after_score"),
        F.col("doc_id").alias("after_doc_id"),
    )
    page2 = search_after(scored, cursor, k)
    return scored, page1, page2


def test_search_after_equals_offset_ranks(spark):
    """Cursor paging must reproduce offset ranks k+1..2k of the full
    pinned order — for every query shape (deep, short, empty)."""
    queries = [(1, "quick brown fox dog"), (2, "quack"), (3, "zzz")]
    k = 3
    scored, page1, page2 = _pages(spark, queries, k)
    full = {}
    for r in scored.collect():
        full.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for rows in full.values():
        rows.sort(key=lambda ds: (-round(ds[1], 9), ds[0]))
    got = {
        (r["query_id"], r["rank"]): r["doc_id"] for r in page2.collect()
    }
    want = {
        (qid, i + 1): rows[k + i][0]
        for qid, rows in full.items()
        if len(rows) > k
        for i in range(min(k, len(rows) - k))
    }
    assert got == want
    # no overlap between pages
    p1 = {(r["query_id"], r["doc_id"]) for r in page1.collect()}
    p2 = {(r["query_id"], r["doc_id"]) for r in page2.collect()}
    assert not (p1 & p2)


def test_search_after_no_cursor_no_rows(spark):
    """A query whose match set is <= k has no page-1 cursor and must
    produce zero page-2 rows (never wrap around)."""
    scored, page1, page2 = _pages(spark, [(1, "quack")], 3)
    assert page1.count() == 1  # only doc 8 matches
    assert page2.count() == 0


def test_search_after_score_tie_breaks_by_doc_id(spark):
    """Rows tied with the cursor at 9dp advance only past its doc_id."""
    spark_df = spark.createDataFrame(
        [(1, d, 1.0) for d in range(1, 8)],
        "query_id INT, doc_id LONG, score DOUBLE",
    )
    cursor = spark.createDataFrame(
        [(1, 1.0, 3)], "query_id INT, after_score DOUBLE, after_doc_id LONG"
    )
    got = [
        (r["doc_id"], r["rank"])
        for r in sorted(
            search_after(spark_df, cursor, 2).collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert got == [(4, 1), (5, 2)]


# --------------------------------------------------------------------------
# range facets
# --------------------------------------------------------------------------


def test_range_facets_match_brute_force(spark):
    from same_same_spark.operators.facets import range_facets

    docs = _docs_df(spark).withColumn("n_chars", F.length("text"))
    bounds = [10.0, 30.0]
    got = sorted(
        (r["query_id"], r["bucket"], r["lo"], r["hi"], r["doc_count"])
        for r in range_facets(
            docs, [(1, "quick fox"), (2, "zzz")], "n_chars", bounds,
            id_col="doc_id", text_col="text",
        ).collect()
    )
    qterms = set(tokenize_py("quick fox"))
    matched = [r for r in DOCS if qterms & set(tokenize_py(r[1]))]
    counts = [0, 0, 0]
    for r in matched:
        v = len(r[1])
        counts[sum(b <= v for b in bounds)] += 1
    want = sorted(
        (1, i, lo, hi, counts[i])
        for i, (lo, hi) in enumerate(
            [(None, 10.0), (10.0, 30.0), (30.0, None)]
        )
    )
    assert got == want  # query 2 (no matches) emits nothing
    assert sum(counts) == len(matched) and len(matched) > 0


def test_range_facets_boundary_is_half_open(spark):
    from same_same_spark.operators.facets import range_facets

    docs = spark.createDataFrame(
        [(1, "quick", 10.0), (2, "quick", 9.999), (3, "quick", None)],
        "doc_id LONG, text STRING, v DOUBLE",
    )
    got = {
        r["bucket"]: r["doc_count"]
        for r in range_facets(
            docs, [(1, "quick")], "v", [10.0],
            id_col="doc_id", text_col="text",
        ).collect()
    }
    # v=10.0 lands in [10, inf), 9.999 in (-inf, 10); NULL excluded
    assert got == {0: 1, 1: 1}


def test_range_facets_bad_bounds_raise(spark):
    from same_same_spark.operators.facets import range_facets

    for bad in ([2.0, 1.0], [1.0, 1.0]):
        with pytest.raises(ValueError):
            range_facets(_docs_df(spark), [(1, "quick")], "doc_id", bad)


# --------------------------------------------------------------------------
# field collapsing
# --------------------------------------------------------------------------


def test_collapse_topk_one_per_value(spark):
    from same_same_spark.operators.collapse import collapse_topk

    docs = _docs_df(spark)
    scored = scored_matches(
        docs, [(1, "quick brown fox dog")], id_col="doc_id", text_col="text"
    )
    out = sorted(
        (r["rank"], r["doc_id"], r["source"])
        for r in collapse_topk(scored, docs, "source", k=10).collect()
    )
    # brute force: best doc per source under the pinned order
    full = {
        r["doc_id"]: r["score"] for r in scored.collect()
    }
    by_src = {}
    src_of = {d: row[3] for row in DOCS for d in [row[0]]}
    for d, s in full.items():
        v = src_of[d]
        cur = by_src.get(v)
        if cur is None or (-round(s, 9), d) < (-round(full[cur], 9), cur):
            by_src[v] = d
    reps = sorted(
        by_src.values(), key=lambda d: (-round(full[d], 9), d)
    )
    want = sorted(
        (i + 1, d, src_of[d]) for i, d in enumerate(reps)
    )
    assert out == want
    # every source value appears at most once
    vals = [v for _, _, v in out]
    assert len(vals) == len(set(vals))

    # NULL values form ONE group of their own: doc 7 (NULL lang) matches
    lang_out = collapse_topk(scored, docs, "lang", k=10).collect()
    lang_vals = [r["lang"] for r in lang_out]
    assert lang_vals.count(None) == 1
    assert 7 in {r["doc_id"] for r in lang_out if r["lang"] is None}


# ---------------------------------------------------------------------------
# stats / extended_stats metric aggregation
# ---------------------------------------------------------------------------

STAT_DOCS = [
    # (doc_id, text, n_chars LONG, weight DOUBLE)
    (1, "the quick brown fox", 120, 0.25),
    (2, "quick brown quick", 87, 1.5),
    (3, "brown fox brown fox", 301, None),
    (4, "dog dog dog", None, 2.0),
    (5, "nothing relevant here", 55, 0.125),
    (6, "fox quick", 55, 0.5),
]


def _stat_docs_df(spark):
    return spark.createDataFrame(
        STAT_DOCS,
        "doc_id LONG, text STRING, n_chars LONG, weight DOUBLE",
    )


def _brute_stats(query: str, col_idx: int):
    qterms = set(tokenize_py(query))
    vals = [
        row[col_idx]
        for row in STAT_DOCS
        if qterms & set(tokenize_py(row[1])) and row[col_idx] is not None
    ]
    if not vals:
        return None
    n = len(vals)
    s = sum(vals)
    ssq = sum(v * v for v in vals)
    avg = float(s) / n
    var = float(ssq) / n - (float(s) / n) * (float(s) / n)
    return (
        n, float(min(vals)), float(max(vals)), float(s), avg,
        float(ssq), var, var ** 0.5,
    )


@pytest.mark.parametrize(
    "query", ["quick", "fox", "dog", "nothing", "missingzz"]
)
def test_stats_facets_match_brute_force(spark, query):
    from same_same_spark.operators.facets import stats_facets

    rows = stats_facets(
        _stat_docs_df(spark), [(1, query)], "n_chars", extended=True,
        id_col="doc_id", text_col="text",
    ).collect()
    want = _brute_stats(query, 2)
    if want is None:
        assert rows == []
        return
    assert len(rows) == 1
    r = rows[0]
    got = (
        r["count_vals"], r["min_val"], r["max_val"], r["sum_val"],
        r["avg_val"], r["sum_sq"], r["variance"], r["std_dev"],
    )
    # integer field -> exact sums; derived doubles bit-equal to the
    # closed form (the property the oracle entry relies on)
    assert got[:4] == want[:4]
    for g, w in zip(got[4:], want[4:]):
        assert g == pytest.approx(w, abs=1e-12)


def test_stats_facets_basic_shape_excludes_extended(spark):
    from same_same_spark.operators.facets import stats_facets

    df = stats_facets(
        _stat_docs_df(spark), [(1, "quick")], "n_chars",
        id_col="doc_id", text_col="text",
    )
    assert df.columns == [
        "query_id", "count_vals", "min_val", "max_val", "sum_val",
        "avg_val",
    ]


def test_stats_facets_double_field(spark):
    from same_same_spark.operators.facets import stats_facets

    rows = stats_facets(
        _stat_docs_df(spark), [(1, "quick fox")], "weight",
        extended=True, id_col="doc_id", text_col="text",
    ).collect()
    want = _brute_stats("quick fox", 3)
    assert len(rows) == 1
    r = rows[0]
    assert r["count_vals"] == want[0]
    # the fixture weights are exact binary fractions, so even the
    # float-domain sums agree exactly
    assert r["sum_val"] == want[3]
    assert r["variance"] == pytest.approx(want[6], abs=1e-12)


def test_stats_facets_single_value_zero_variance(spark):
    from same_same_spark.operators.facets import stats_facets

    rows = stats_facets(
        _stat_docs_df(spark), [(1, "relevant")], "n_chars",
        extended=True, id_col="doc_id", text_col="text",
    ).collect()
    assert len(rows) == 1
    assert rows[0]["variance"] == 0.0
    assert rows[0]["std_dev"] == 0.0


def test_stats_facets_unknown_column_raises(spark):
    from same_same_spark.operators.facets import stats_facets

    with pytest.raises(ValueError, match="no column"):
        stats_facets(
            _stat_docs_df(spark), [(1, "quick")], "nope",
            id_col="doc_id", text_col="text",
        )


# ---------------------------------------------------------------------------
# histogram / percentiles / cardinality aggregations
# ---------------------------------------------------------------------------

def test_histogram_zero_fill_and_negative_keys(spark):
    from same_same_spark.operators.facets import histogram_facets

    docs = [
        (1, "quick fox", -13), (2, "quick", 55), (3, "quick", 55),
        (4, "quick", 301), (5, "quick", None), (6, "dog", 999),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING, n LONG")
    rows = histogram_facets(
        df, [(1, "quick")], "n", 50.0, id_col="doc_id", text_col="text"
    ).collect()
    got = {r["key"]: r["doc_count"] for r in rows}
    # floor(-13/50) = -1 -> key -50; 55 -> 50; 301 -> 300; NULL excluded
    want = {-50.0: 1, 0.0: 0, 50.0: 2, 100.0: 0, 150.0: 0,
            200.0: 0, 250.0: 0, 300.0: 1}
    assert got == want
    # every bucket between the data bounds emitted exactly once
    assert len(rows) == len(want)


def test_histogram_guards(spark):
    from pyspark.sql.utils import AnalysisException
    from same_same_spark.operators.facets import histogram_facets

    df = spark.createDataFrame(
        [(1, "quick", 0), (2, "quick", 10_000_000)],
        "doc_id LONG, text STRING, n LONG",
    )
    with pytest.raises(ValueError):
        histogram_facets(df, [(1, "quick")], "n", 0.0,
                         id_col="doc_id", text_col="text")
    # span 0..10M at interval 1 = 10M buckets -> the breaker trips
    with pytest.raises(Exception, match="max_buckets"):
        histogram_facets(
            df, [(1, "quick")], "n", 1.0,
            id_col="doc_id", text_col="text",
        ).collect()


def test_percentiles_match_numpy_interpolation(spark):
    import numpy as np
    from same_same_spark.operators.facets import percentiles_facets

    vals = [55, 55, 87, 120, 301]
    docs = [(i, "quick", v) for i, v in enumerate(vals)] + [
        (99, "dog", 1), (98, "quick", None)
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING, n LONG")
    ps = [10.0, 50.0, 90.0]
    rows = percentiles_facets(
        df, [(1, "quick")], "n", percents=ps,
        id_col="doc_id", text_col="text",
    ).collect()
    got = {r["percent"]: r["value"] for r in rows}
    for p in ps:
        # Spark percentile == numpy linear interpolation
        assert got[p] == pytest.approx(
            float(np.percentile(vals, p, method="linear")), abs=1e-9
        )


def test_percentiles_guards(spark):
    from same_same_spark.operators.facets import percentiles_facets

    df = spark.createDataFrame(
        [(1, "quick", 5)], "doc_id LONG, text STRING, n LONG"
    )
    for bad in ([], [0.0], [101.0], [50.0, 50.0]):
        with pytest.raises(ValueError):
            percentiles_facets(df, [(1, "quick")], "n", percents=bad,
                               id_col="doc_id", text_col="text")


def test_cardinality_counts(spark):
    from same_same_spark.operators.facets import cardinality_facets

    docs = [
        (1, "quick fox", "web"), (2, "quick", "web"),
        (3, "quick", "book"), (4, "quick", None), (5, "dog", "news"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING, src STRING")
    rows = cardinality_facets(
        df, [(1, "quick"), (2, "dog"), (3, "zzz")], "src",
        id_col="doc_id", text_col="text",
    ).collect()
    got = {
        r["query_id"]: (
            r["value_count"], r["distinct_count"], r["missing_count"]
        )
        for r in rows
    }
    assert got == {1: (3, 2, 1), 2: (1, 1, 0)}


# ---------------------------------------------------------------------------
# composite aggregation
# ---------------------------------------------------------------------------

COMP_DOCS = [
    (1, "quick fox", "en", "web"), (2, "quick", "en", "book"),
    (3, "quick", "de", "web"), (4, "quick", "de", "web"),
    (5, "quick", None, "web"), (6, "quick", "fr", "news"),
    (7, "dog", "en", "web"), (8, "quick dog", "en", "news"),
]


def _comp_df(spark):
    return spark.createDataFrame(
        COMP_DOCS, "doc_id LONG, text STRING, lang STRING, source STRING"
    )


def _brute_composite(query, size, after=None):
    qterms = set(tokenize_py(query))
    counts = {}
    for _, text, lang, src in COMP_DOCS:
        if qterms & set(tokenize_py(text)) and lang is not None \
                and src is not None:
            counts[(lang, src)] = counts.get((lang, src), 0) + 1
    keys = sorted(counts)
    if after is not None:
        keys = [k for k in keys if k > after]
    return [
        (lang, src, counts[(lang, src)], i + 1)
        for i, (lang, src) in enumerate(keys[:size])
    ]


def test_composite_pages_are_cursor_consistent(spark):
    """Page 2 via after-key == rows size+1..2*size of an unpaginated
    run (the cursor==offset identity on BUCKETS)."""
    from same_same_spark.operators.facets import composite_facets

    df = _comp_df(spark)
    full = _brute_composite("quick dog", 100)
    size = 2
    page1 = composite_facets(
        df, [(1, "quick dog")], ["lang", "source"], size=size,
        id_col="doc_id", text_col="text",
    ).collect()
    got1 = sorted(
        (r["lang"], r["source"], r["doc_count"], r["bucket_rank"])
        for r in page1
    )
    assert got1 == sorted(full[:size])
    cursor = (full[size - 1][0], full[size - 1][1])
    page2 = composite_facets(
        df, [(1, "quick dog")], ["lang", "source"], size=size,
        after={1: cursor}, id_col="doc_id", text_col="text",
    ).collect()
    got2 = sorted(
        (r["lang"], r["source"], r["doc_count"], r["bucket_rank"])
        for r in page2
    )
    want2 = sorted(
        (lang, src, c, i + 1)
        for i, (lang, src, c, _) in enumerate(full[size:2 * size])
    )
    assert got2 == want2 and got2
    # NULL-lang doc 5 never contributes to any bucket
    assert all(r["lang"] is not None for r in page1 + page2)


def test_composite_guards(spark):
    from same_same_spark.operators.facets import composite_facets

    df = _comp_df(spark)
    with pytest.raises(ValueError):
        composite_facets(df, [(1, "quick")], [], size=2)
    with pytest.raises(ValueError):
        composite_facets(df, [(1, "quick")], ["lang"], size=0)
    with pytest.raises(ValueError, match="after"):
        composite_facets(
            df, [(1, "quick")], ["lang", "source"], size=2,
            after={1: ("en",)},
        )


def test_terms_metrics_match_brute_force(spark):
    """The terms{stats} nesting against a pure-Python brute force,
    including an all-NULL-metric bucket (0 count, NULL stats) and the
    (doc_count DESC, value ASC) top-n cap."""
    from same_same_spark.operators.facets import terms_metrics_facets

    docs = [
        (1, "quick fox", "web", 120), (2, "quick", "web", 87),
        (3, "quick", "book", None), (4, "quick", "book", 301),
        (5, "quick", None, 50), (6, "dog quick", "news", 55),
        (7, "quick", "alls", None), (8, "quick", "alls", None),
    ]
    df = spark.createDataFrame(
        docs, "doc_id LONG, text STRING, src STRING, n LONG"
    )
    rows = terms_metrics_facets(
        df, [(1, "quick")], "src", "n", topn=3,
        id_col="doc_id", text_col="text",
    ).collect()
    got = {
        r["value"]: (
            r["doc_count"], r["rank"], r["count_vals"],
            r["min_val"], r["max_val"], r["sum_val"], r["avg_val"],
        )
        for r in rows
    }
    # counts: alls=2, book=2, web=2, news=1 -> top-3 by (count desc,
    # value asc) = alls, book, web
    assert set(got) == {"alls", "book", "web"}
    assert got["alls"] == (2, 1, 0, None, None, None, None)
    assert got["book"] == (2, 2, 1, 301.0, 301.0, 301.0, 301.0)
    assert got["web"] == (2, 3, 2, 87.0, 120.0, 207.0, 103.5)


# ---------------------------------------------------------------- boxplot


def _matched_vals(query: str, col_idx: int):
    qterms = set(tokenize_py(query))
    return [
        row[col_idx]
        for row in STAT_DOCS
        if qterms & set(tokenize_py(row[1])) and row[col_idx] is not None
    ]


def test_boxplot_matches_numpy(spark):
    import numpy as np

    from same_same_spark.operators.facets import boxplot_facets

    rows = boxplot_facets(
        _stat_docs_df(spark), [(1, "quick fox")], "n_chars",
        id_col="doc_id", text_col="text",
    ).collect()
    vals = np.array(sorted(_matched_vals("quick fox", 2)), dtype=float)
    q1, q2, q3 = np.percentile(vals, [25, 50, 75], method="linear")
    iqr = q3 - q1
    lo = vals[vals >= q1 - 1.5 * iqr].min()
    hi = vals[vals <= q3 + 1.5 * iqr].max()
    assert len(rows) == 1
    r = rows[0]
    assert r["count_vals"] == len(vals)
    assert (r["min_val"], r["max_val"]) == (vals.min(), vals.max())
    for got, want in [
        (r["q1"], q1), (r["q2"], q2), (r["q3"], q3),
        (r["lower_whisker"], lo), (r["upper_whisker"], hi),
    ]:
        assert got == pytest.approx(want, abs=1e-12)


def test_boxplot_outlier_excluded_from_whisker(spark):
    from same_same_spark.operators.facets import boxplot_facets

    # 5 tight values + one far outlier: upper whisker must stop at the
    # largest value inside the Tukey fence, NOT the max
    docs = [(i, "zebra word", v) for i, v in enumerate(
        [10, 11, 12, 13, 14, 1000]
    )]
    df = spark.createDataFrame(
        docs, "doc_id LONG, text STRING, v LONG"
    )
    r = boxplot_facets(
        df, [(1, "zebra")], "v", id_col="doc_id", text_col="text"
    ).collect()[0]
    assert r["max_val"] == 1000.0
    assert r["upper_whisker"] < 1000.0
    assert r["lower_whisker"] == 10.0


def test_boxplot_no_match_no_rows(spark):
    from same_same_spark.operators.facets import boxplot_facets

    assert (
        boxplot_facets(
            _stat_docs_df(spark), [(1, "missingzz")], "n_chars",
            id_col="doc_id", text_col="text",
        ).collect()
        == []
    )


# ---------------------------------------------------------------- MAD


def test_mad_matches_numpy(spark):
    import numpy as np

    from same_same_spark.operators.facets import mad_facets

    rows = mad_facets(
        _stat_docs_df(spark), [(1, "quick fox"), (2, "dog")], "weight",
        id_col="doc_id", text_col="text",
    ).collect()
    got = {r["query_id"]: (r["median_val"], r["mad"]) for r in rows}
    for qid, query in [(1, "quick fox"), (2, "dog")]:
        vals = np.array(_matched_vals(query, 3), dtype=float)
        med = np.percentile(vals, 50, method="linear")
        mad = np.percentile(np.abs(vals - med), 50, method="linear")
        assert got[qid][0] == pytest.approx(med, abs=1e-15)
        assert got[qid][1] == pytest.approx(mad, abs=1e-15)


def test_mad_single_value_is_zero(spark):
    from same_same_spark.operators.facets import mad_facets

    r = mad_facets(
        _stat_docs_df(spark), [(1, "nothing")], "n_chars",
        id_col="doc_id", text_col="text",
    ).collect()[0]
    assert (r["median_val"], r["mad"]) == (55.0, 0.0)


# ---------------------------------------------------------------- string_stats


def test_string_stats_hand_computed(spark):
    import math

    from same_same_spark.operators.facets import string_stats_facets

    docs = [
        (1, "alpha match", "aab"),
        (2, "alpha match", ""),      # empty: counts, no chars
        (3, "alpha match", None),    # NULL: excluded entirely
        (4, "no hit here", "zzzz"),  # unmatched
    ]
    df = spark.createDataFrame(
        docs, "doc_id LONG, text STRING, fld STRING"
    )
    r = string_stats_facets(
        df, [(1, "alpha")], "fld", id_col="doc_id", text_col="text"
    ).collect()[0]
    # matched values: "aab" and "" -> chars {a: 2, b: 1}
    assert r["count_vals"] == 2
    assert (r["min_length"], r["max_length"]) == (0, 3)
    assert r["avg_length"] == pytest.approx(1.5)
    want = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert r["entropy"] == pytest.approx(want, abs=1e-12)


def test_string_stats_zero_chars_entropy_zero(spark):
    from same_same_spark.operators.facets import string_stats_facets

    df = spark.createDataFrame(
        [(1, "alpha match", "")], "doc_id LONG, text STRING, fld STRING"
    )
    r = string_stats_facets(
        df, [(1, "alpha")], "fld", id_col="doc_id", text_col="text"
    ).collect()[0]
    assert (r["count_vals"], r["entropy"]) == (1, 0.0)


def test_string_stats_duckdb_differential(spark):
    import duckdb

    from same_same_spark.operators.facets import (
        duckdb_string_stats_sql,
        string_stats_facets,
    )

    df = _docs_df(spark)
    got = {
        r["query_id"]: r
        for r in string_stats_facets(
            df, [(1, "quick fox"), (2, "dog")], "text",
            id_col="doc_id", text_col="text",
        ).collect()
    }
    con = duckdb.connect()
    con.register("docs_tbl", df.toPandas())
    want = con.sql(
        duckdb_string_stats_sql(
            "docs_tbl", "doc_id", "text",
            [(1, "quick fox"), (2, "dog")], "text",
        )
    ).fetchall()
    assert len(want) == len(got)
    for qid, cnt, mn, mx, avg, ent in want:
        g = got[qid]
        assert (g["count_vals"], g["min_length"], g["max_length"]) == (
            cnt, mn, mx,
        )
        assert g["avg_length"] == pytest.approx(avg, abs=1e-12)
        assert g["entropy"] == pytest.approx(ent, abs=1e-12)


# ---------------------------------------------------------------- top_metrics


def test_top_metrics_ranks_by_sort_field(spark):
    from same_same_spark.operators.facets import top_metrics_facets

    rows = top_metrics_facets(
        _docs_df(spark).join(
            _stat_docs_df(spark).select("doc_id", "n_chars"), "doc_id"
        ),
        [(1, "quick fox")],
        "n_chars",
        ["lang", "source"],
        size=2,
        id_col="doc_id",
        text_col="text",
    ).orderBy("rank").collect()
    # matched docs with non-NULL n_chars: 1:120, 2:87, 3:301, 6:55
    # wait: _docs_df ids differ; the join keeps ids 1,2,3,4,5,6
    assert [r["doc_id"] for r in rows] == [3, 1]
    assert rows[0]["sort_val"] == 301.0
    assert rows[0]["lang"] == "de"
    assert rows[1]["source"] == "web"


def test_top_metrics_size_guard(spark):
    from same_same_spark.operators.facets import top_metrics_facets

    with pytest.raises(ValueError, match="size must be"):
        top_metrics_facets(
            _docs_df(spark), [(1, "x")], "doc_id", ["lang"], size=0,
            id_col="doc_id", text_col="text",
        )


# ---------------------------------------------------------------- t_test


def _ttest_docs_df(spark):
    rows = [
        (1, "zebra alpha", "en", 10),
        (2, "zebra alpha", "en", 12),
        (3, "zebra alpha", "en", 14),
        (4, "zebra alpha", "de", 20),
        (5, "zebra alpha", "de", 26),
        (6, "zebra alpha", "de", 23),
        (7, "zebra alpha", "fr", 99),     # neither arm
        (8, "zebra alpha", "en", None),   # NULL value excluded
        (9, "unmatched doc", "en", 1),    # not in match set
    ]
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, v LONG"
    )


@pytest.mark.parametrize("ttype", ["heteroscedastic", "homoscedastic"])
def test_t_test_matches_hand_computed(spark, ttype):
    import math

    from same_same_spark.operators.facets import t_test_facets

    r = t_test_facets(
        _ttest_docs_df(spark), [(1, "zebra")], "v",
        {"lang": {"eq": "en"}}, {"lang": {"eq": "de"}},
        ttype=ttype, id_col="doc_id", text_col="text",
    ).collect()[0]
    a, b = [10.0, 12.0, 14.0], [20.0, 26.0, 23.0]
    ma, mb = sum(a) / 3, sum(b) / 3
    va = sum((x - ma) ** 2 for x in a) / 2
    vb = sum((x - mb) ** 2 for x in b) / 2
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["mean_a"] == pytest.approx(ma)
    assert r["mean_b"] == pytest.approx(mb)
    if ttype == "heteroscedastic":
        se2 = va / 3 + vb / 3
        t = (ma - mb) / math.sqrt(se2)
        dof = se2 * se2 / ((va / 3) ** 2 / 2 + (vb / 3) ** 2 / 2)
    else:
        sp = ((2 * va) + (2 * vb)) / 4
        t = (ma - mb) / math.sqrt(sp * (2 / 3))
        dof = 4.0
    assert r["t_stat"] == pytest.approx(t, abs=1e-12)
    assert r["df"] == pytest.approx(dof, abs=1e-9)


def test_t_test_scipy_cross_check(spark):
    """Cross-check Welch's t against scipy if available (the ES agg
    this mirrors p-values through)."""
    scipy_stats = pytest.importorskip("scipy.stats")

    from same_same_spark.operators.facets import t_test_facets

    r = t_test_facets(
        _ttest_docs_df(spark), [(1, "zebra")], "v",
        {"lang": {"eq": "en"}}, {"lang": {"eq": "de"}},
        id_col="doc_id", text_col="text",
    ).collect()[0]
    res = scipy_stats.ttest_ind(
        [10, 12, 14], [20, 26, 23], equal_var=False
    )
    assert r["t_stat"] == pytest.approx(res.statistic, abs=1e-12)


def test_t_test_small_arm_yields_null(spark):
    from same_same_spark.operators.facets import t_test_facets

    r = t_test_facets(
        _ttest_docs_df(spark), [(1, "zebra")], "v",
        {"lang": {"eq": "fr"}}, {"lang": {"eq": "de"}},
        id_col="doc_id", text_col="text",
    ).collect()[0]
    # arm A has n=1 -> variance undefined -> NULL stat, row kept
    assert r["n_a"] == 1 and r["t_stat"] is None and r["df"] is None
    with pytest.raises(ValueError, match="ttype"):
        t_test_facets(
            _ttest_docs_df(spark), [(1, "zebra")], "v",
            {"lang": {"eq": "en"}}, {"lang": {"eq": "de"}},
            ttype="paired", id_col="doc_id", text_col="text",
        )


def test_t_test_duckdb_differential(spark):
    import duckdb

    from same_same_spark.operators.facets import (
        duckdb_t_test_sql,
        t_test_facets,
    )

    df = _ttest_docs_df(spark)
    for ttype in ("heteroscedastic", "homoscedastic"):
        got = sorted(
            tuple(
                round(x, 9) if isinstance(x, float) else x
                for x in (r["query_id"], r["n_a"], r["n_b"], r["mean_a"],
                          r["mean_b"], r["t_stat"], r["df"])
            )
            for r in t_test_facets(
                df, [(1, "zebra alpha"), (2, "unmatched")], "v",
                {"lang": {"eq": "en"}}, {"lang": {"neq": "en"}},
                ttype=ttype, id_col="doc_id", text_col="text",
            ).collect()
        )
        con = duckdb.connect()
        con.register("docs_tbl", df.toPandas())
        want = sorted(
            tuple(
                round(x, 9) if isinstance(x, float) else x for x in row
            )
            for row in con.sql(
                duckdb_t_test_sql(
                    "docs_tbl", "doc_id", "text",
                    [(1, "zebra alpha"), (2, "unmatched")], "v",
                    "d.lang = 'en'",
                    "d.lang IS NOT NULL AND d.lang <> 'en'",
                    ttype=ttype,
                )
            ).fetchall()
        )
        assert got == want, ttype
