"""Physical-plan audits: the optimizations we rely on at 100 TB must be
visible in `explain`, not assumed."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from same_same_spark.bm25 import score_queries
from same_same_spark.index.build import build_index


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def shard_read(spark, documents, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("planidx") / "idx")
    build_index(
        documents, out, id_col="doc_id", text_col="text", num_buckets=4,
        log=lambda *_: None,
    )
    return spark.read.parquet(f"{out}/shards/group-0000")


def test_shard_scan_pushes_kind_and_term(spark, shard_read):
    """Query-path scan: kind/term predicates must reach the parquet
    reader (PushedFilters), and only the needed columns are read."""
    q = shard_read.filter(
        (F.col("kind") == "p") & F.col("term").isin(["fast", "merge"])
    ).select("bucket", "term", "n", "doc_bytes", "tf_bytes")
    plan = _formatted(q)
    assert "PushedFilters:" in plan
    assert "EqualTo(kind,p)" in plan or "kind" in plan.split("PushedFilters:")[1].split("\n")[0]
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    assert "term" in pushed
    # column pruning: ReadSchema excludes the block arrays
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "block_last_doc" not in read_schema
    assert "doc_bytes" in read_schema


def test_naive_scorer_broadcasts_query_terms(spark, documents):
    """The tiny query-term side must be broadcast, never shuffled."""
    df = score_queries(
        documents, [(0, "fast merge join")], k=5, id_col="doc_id",
        text_col="text",
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_docs_filter_pushdown(spark, documents):
    """FilterExpr-compiled predicates reach the documents parquet scan."""
    from same_same_spark.operators.filters import compile_filters

    pred = compile_filters(
        {"lang": {"eq": "en"}, "n_chars": {"between": [100, 300]}},
        metadata_col=None,
        df=documents,
    )
    plan = _formatted(documents.filter(pred).select("doc_id"))
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    assert "lang" in pushed and "n_chars" in pushed


def test_topk_is_take_ordered(spark, documents):
    """orderBy().limit(k) must plan as a distributed top-k
    (TakeOrderedAndProject), not a global sort."""
    q = documents.orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(10)
    plan = _plan(q)
    assert "TakeOrderedAndProject" in plan


def test_tfidf_doc_weights_broadcast_vocab(spark, documents):
    """The <=max_features vocabulary side of the doc-weight join must be
    broadcast, never shuffled against the corpus-sized posting table."""
    from same_same_spark.operators.tfidf import build_vocab, doc_unit_weights
    from same_same_spark.stats import tokenized

    tok = tokenized(documents, id_col="doc_id", text_col="text")
    vocab = spark.createDataFrame(
        build_vocab(tok, documents.count(), max_features=100).collect()
    )
    plan = _plan(doc_unit_weights(tok, vocab))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_prefix_filter_no_cartesian(spark, documents):
    """Prefix-filter candidates must come from an equi-join on the
    prefix shingles — no cartesian/nested-loop anywhere in the plan."""
    from same_same_spark.pipeline.dedup import prefix_filter_candidates

    plan = _plan(
        prefix_filter_candidates(documents, "doc_id", "text", 0.9)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_score_queries_has_no_window_stage(spark, documents):
    """VERDICT r2 #5: the naive scorer must contain NO WindowExec — the
    per-query rank window landed all of one query's matched docs on a
    single task; the salted tournament bounds every stage."""
    q = score_queries(
        documents, [(0, "fast merge join"), (1, "vector table")],
        k=10, id_col="doc_id", text_col="text",
    )
    assert "Window" not in _plan(q)
    rows = q.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-round(r["score"], 9), r["doc_id"]) for r in rs]
        assert keys == sorted(keys)


def test_rank_topk_no_window_and_matches_pinned_order(spark, documents):
    """VERDICT r2 #3: rank_topk must produce the pinned global order
    with NO WindowExec anywhere (the old unpartitioned rank window
    warned `No Partition Defined` on every query)."""
    from same_same_spark.operators.hybrid import rank_topk

    scored = documents.select(
        "doc_id", (F.col("n_chars") % 7).cast("double").alias("score")
    )
    out = rank_topk(scored, 5)
    plan = _plan(out)
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan
    rows = out.orderBy("rank").collect()
    want = scored.orderBy(
        F.desc(F.round(F.col("score"), 9)), F.asc("doc_id")
    ).limit(5).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    assert out.columns == ["doc_id", "score", "rank"]


def test_clip_topk_is_take_ordered(spark, documents):
    """clip_text_topk's global top-k must be TakeOrderedAndProject (a
    bounded per-partition heap), not a global sort or a window over all
    rows."""
    from same_same_spark.pipeline.clip import clip_text_topk

    plan = _plan(clip_text_topk(documents.limit(50), "fast merge", k=5,
                                dim=8, text_col="text"))
    assert "TakeOrderedAndProject" in plan


def test_lm_scoring_joins_broadcast(spark, documents):
    """The CCNet LM scorer's bigram/unigram joins must broadcast the
    (reference-corpus-sized) count tables — never sort-merge the
    exploded corpus bigrams — and the only exchange left is the
    per-doc mean."""
    from same_same_spark.pipeline.lm import lm_perplexity, train_bigram_lm

    lm = train_bigram_lm(documents.filter(F.col("doc_id") % 10 == 0))
    plan = _plan(lm_perplexity(documents, lm))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "WindowExec" not in plan


def test_multiterm_rewrites_plan_shape(spark, documents):
    """The query-rewrite family must stay window-free, and each join
    against the tiny rewrite table must be a BROADCAST join. The one
    intended non-equi join — wildcard's pattern-vs-vocab term-dictionary
    scan — must be the broadcast nested loop (pattern side broadcast),
    never a shuffled CartesianProduct."""
    from same_same_spark.operators.fuzzy import fuzzy_search
    from same_same_spark.operators.proximity import proximity_search
    from same_same_spark.operators.wildcard import wildcard_search

    w = _plan(wildcard_search(
        documents, [(0, "tab* quer*")], k=5,
        id_col="doc_id", text_col="text",
    ))
    assert "Window" not in w
    assert "CartesianProduct" not in w
    assert "BroadcastNestedLoopJoin" in w  # the dictionary scan itself
    assert "BroadcastHashJoin" in w       # expansion -> postings

    f = _plan(fuzzy_search(
        documents, [(0, "tabel")], k=5, max_edits=1,
        id_col="doc_id", text_col="text",
    ))
    assert "Window" not in f
    assert "CartesianProduct" not in f
    assert "BroadcastNestedLoopJoin" not in f  # SymSpell = equi hash join

    p = _plan(proximity_search(
        documents, [(0, "fast merge")], slop=2, k=5,
        id_col="doc_id", text_col="text",
    ))
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_result_shaping_plan_shape(spark, documents):
    """Facets, range facets, collapsing and keyset pagination: no
    WindowExec, no cartesians; collapse's per-group best is an
    aggregate (min), never a collect_list of group rows."""
    from same_same_spark.bm25 import scored_matches
    from same_same_spark.operators.collapse import collapse_topk
    from same_same_spark.operators.facets import range_facets, search_facets
    from same_same_spark.operators.topk import search_after, topk_per_query

    docs = documents.withColumn("n_chars", F.length("text"))
    queries = [(0, "fast merge join"), (1, "vector table")]

    sf = _plan(search_facets(
        docs, queries, ["lang", "source"], topn=3,
        id_col="doc_id", text_col="text",
    ))
    rf = _plan(range_facets(
        docs, queries, "n_chars", [100.0, 300.0],
        id_col="doc_id", text_col="text",
    ))
    scored = scored_matches(docs, queries, id_col="doc_id", text_col="text")
    co = collapse_topk(scored, docs, "source", k=5)
    cop = _plan(co)
    cursor = topk_per_query(scored, 5).filter(F.col("rank") == 5).select(
        "query_id", F.col("score").alias("after_score"),
        F.col("doc_id").alias("after_doc_id"),
    )
    sa = _plan(search_after(scored, cursor, 5))

    for plan in (sf, rf, cop, sa):
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
    # range_facets' shape join is the intended tiny broadcast loop
    # (bucket shape x matching queries); everything else is hash joins
    assert "BroadcastNestedLoopJoin" not in sf
    assert "BroadcastNestedLoopJoin" not in cop
    assert "BroadcastNestedLoopJoin" not in sa
    # collapse: the per-group best is a min(struct) aggregate — the
    # plan carries a partial/final min over __entry (constant state),
    # and the only collect_lists are the bounded tournament's own.
    assert "min(__entry" in cop.replace("partial_", "")


def test_relevance_extras_plan_shape(spark, documents):
    """Significant terms, facet top-hits, boosted and synonym search:
    no WindowExec anywhere; every tiny table (query terms, boosts,
    synonym groups, kept buckets) joins broadcast; the only
    nested-loop join is sigterms' single-row corpus-count broadcast."""
    from same_same_spark.operators.boost import boosted_search
    from same_same_spark.operators.facets import facet_top_hits
    from same_same_spark.operators.sigterms import significant_terms
    from same_same_spark.operators.synonyms import synonym_search

    queries = [(0, "fast merge join"), (1, "vector table")]

    st = _plan(significant_terms(
        documents, queries, topn=5, id_col="doc_id", text_col="text",
    ))
    th = _plan(facet_top_hits(
        documents, queries, "source", topn=3, k_hits=2,
        id_col="doc_id", text_col="text",
    ))
    bo = _plan(boosted_search(
        documents, [(0, "fast^2 merge join^0.5")], k=5,
        id_col="doc_id", text_col="text",
    ))
    sy = _plan(synonym_search(
        documents, queries, [["fast", "quick"], ["table", "row"]],
        k=5, id_col="doc_id", text_col="text",
    ))
    for plan in (st, th, bo, sy):
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan
    # equi joins only in the scoring family (boosts/synonyms ride the
    # broadcast query-term table; top-hits joins kept buckets by key)
    for plan in (th, bo, sy):
        assert "BroadcastNestedLoopJoin" not in plan
    # sigterms: the one nested loop is the single-row n_docs broadcast
    assert st.count("BroadcastNestedLoopJoin") == 1


def test_regexp_and_stats_plan_shape(spark, documents):
    """regexp shares the glob mode's plan (broadcast nested-loop
    dictionary scan + broadcast posting join, window-free); stats_facets
    is a single map-side-combined groupBy over the matched join — no
    windows, no cartesians, no per-value collect_list state."""
    from same_same_spark.operators.facets import stats_facets
    from same_same_spark.operators.wildcard import regexp_search

    r = _plan(regexp_search(
        documents, [(0, "tab(le)?[a-z]*")], k=5,
        id_col="doc_id", text_col="text",
    ))
    assert "Window" not in r
    assert "CartesianProduct" not in r
    assert "BroadcastNestedLoopJoin" in r  # the dictionary scan itself
    assert "BroadcastHashJoin" in r        # expansion -> postings

    docs = documents.withColumn("n", F.length("text").cast("long"))
    s = _plan(stats_facets(
        docs, [(0, "fast merge")], "n", extended=True,
        id_col="doc_id", text_col="text",
    ))
    assert "Window" not in s
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "collect_list" not in s  # one row per query, pure aggregates
    assert "partial_sum" in s       # map-side combine engaged


def test_aggregation_family_plan_shape(spark, documents):
    """histogram / percentiles / cardinality: window-free, no
    cartesians, no BroadcastNestedLoopJoin; the histogram zero-fill
    explodes the per-query BOUNDS row, never data rows."""
    from same_same_spark.operators.facets import (
        cardinality_facets,
        histogram_facets,
        percentiles_facets,
    )

    queries = [(0, "fast merge join"), (1, "vector table")]
    h = _plan(histogram_facets(
        documents, queries, "n_chars", 50.0,
        id_col="doc_id", text_col="text",
    ))
    p = _plan(percentiles_facets(
        documents, queries, "n_chars",
        id_col="doc_id", text_col="text",
    ))
    c = _plan(cardinality_facets(
        documents, queries, "source",
        id_col="doc_id", text_col="text",
    ))
    for plan in (h, p, c):
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "collect_list" not in plan
    # histogram: map-side combine on the bucket counts
    assert "partial_count" in h.replace("partial_count_distinct", "")


def test_rescore_plan_shape(spark, documents):
    """Rescore: window-free, no cartesians; the window and the per-query
    phrase/idf tables join back BROADCAST (the expensive phrase check
    must only ever see the bounded window, shipped to the data)."""
    from same_same_spark.operators.rescore import rescore_topk

    p = _plan(rescore_topk(
        documents, [(0, "fast merge"), (1, "table query")],
        k=5, window_size=20, id_col="doc_id", text_col="text",
    ))
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p


def test_composite_and_decay_plan_shape(spark, documents):
    """composite: window-free bounded tournament, broadcast after-key
    join; decay: one column expression over the scored match set —
    no extra shuffles beyond the BM25 plan, window-free."""
    from same_same_spark.operators.decay import decay_score
    from same_same_spark.operators.facets import composite_facets

    queries = [(0, "fast merge join"), (1, "vector table")]
    cp = _plan(composite_facets(
        documents, queries, ["lang", "source"], size=5,
        after={0: ("de", "src3")}, id_col="doc_id", text_col="text",
    ))
    dp = _plan(decay_score(
        documents, queries, "n_chars", origin=300.0, scale=150.0,
        k=5, id_col="doc_id", text_col="text",
    ))
    for plan in (cp, dp):
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_terms_metrics_and_date_histogram_plan_shape(spark, documents):
    """terms{stats}: ONE aggregate computes count + every metric piece
    (no second pass, no collect_list beyond the bounded tournament);
    date_histogram: zero-fill explodes the per-group bounds row only."""
    from pyspark.sql import functions as F

    from same_same_spark.operators.events import date_histogram
    from same_same_spark.operators.facets import terms_metrics_facets

    t = _plan(terms_metrics_facets(
        documents, [(0, "fast merge")], "source", "n_chars", topn=3,
        id_col="doc_id", text_col="text",
    ))
    assert "Window" not in t
    assert "CartesianProduct" not in t
    assert "partial_min" in t and "partial_sum" in t  # one combined agg

    ev = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00")], "event_type STRING, ts STRING"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = _plan(date_histogram(ev, "day", group_col="event_type"))
    assert "Window" not in d
    assert "CartesianProduct" not in d


def test_percolate_and_adjacency_plan_shape(spark, documents):
    """percolate: registered table broadcast, coverage+score one
    aggregate, window-free; adjacency: per-doc array expansion, no
    doc-keyed self-join (the SQL twin has one — Spark must not)."""
    from same_same_spark.operators.facets import adjacency_matrix_facets
    from same_same_spark.operators.percolate import percolate

    p = _plan(percolate(
        documents, [(1, "fast merge"), (2, "vector")],
        id_col="doc_id", text_col="text",
    ))
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p

    a = _plan(adjacency_matrix_facets(
        documents, [("x", "fast"), ("y", "merge join")],
        id_col="doc_id", text_col="text",
    ))
    assert "Window" not in a
    assert "CartesianProduct" not in a
    # one matched relation, grouped per doc — never joined to itself
    assert a.count("SortMergeJoin") == 0


def test_term_vectors_and_span_near_plan_shape(spark, documents):
    """term_vectors: requested ids + term stats broadcast, window-free;
    span_near: same candidate plumbing as phrase — broadcasts, no
    windows, no cartesians."""
    from same_same_spark.operators.spannear import span_near_search
    from same_same_spark.operators.termvectors import term_vectors

    t = _plan(term_vectors(
        documents, [1, 2, 3], id_col="doc_id", text_col="text",
    ))
    s = _plan(span_near_search(
        documents, [(0, "fast merge")], slop=1, k=5,
        id_col="doc_id", text_col="text",
    ))
    for plan in (t, s):
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan


def test_bm25f_plan_shape(spark, documents):
    """BM25F: no windows, no cartesians; query terms and the derived
    df table ride broadcast joins; field branches union before ONE
    (doc, term) fold so fields never multiply shuffle rounds."""
    from same_same_spark.operators.bm25f import bm25f_search

    docs_f = documents.select(
        "doc_id",
        F.col("text").alias("head"),
        F.col("text").alias("body"),
    )
    plan = _plan(bm25f_search(
        docs_f, [(0, "fast merge join")],
        {"head": (3.0, 0.5), "body": (1.0, 0.75)}, k=5, id_col="doc_id",
    ))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bq_plan_shape(spark):
    """BQ Hamming scoring: the query side broadcasts (never a shuffle
    of 8-byte codes against a 3-row query table), ranking goes through
    the bounded tournament (no WindowExec), and the hot loop is
    whole-stage-codegen integer ops."""
    from same_same_spark.pipeline.bq import (
        bq_encode,
        bq_topk,
        train_bq_thresholds,
    )

    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(60)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    thr = train_bq_thresholds(df)
    coded = bq_encode(df, thr)
    plan = _plan(bq_topk(coded, thr, [(0, [1.0, 2.0, 3.0])], k=5))
    assert "WindowExec" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # query side broadcast; encode is inline integer CASE arithmetic
    assert "BroadcastExchange" in plan
    assert "bit_count" in plan


def test_dismax_and_filters_agg_plan_shape(spark, documents):
    """dis_max: clauses ride ONE scored_matches plan (broadcast term
    join, window-free combine). filters agg: bucket predicates are
    column expressions in the doc-side projection; one aggregate row
    per query, exploded — window-free, no cartesians. (The tiny
    query-id frame joins broadcast.)"""
    from same_same_spark.operators.dismax import dismax_search
    from same_same_spark.operators.facets import filters_facets

    dm = _plan(dismax_search(
        documents, [(0, ["fast merge", "table query"])],
        tie_breaker=0.3, k=5, id_col="doc_id", text_col="text",
    ))
    assert "Window" not in dm
    assert "CartesianProduct" not in dm
    assert "BroadcastNestedLoopJoin" not in dm
    assert "BroadcastHashJoin" in dm
    assert "SortMergeJoin" not in dm

    fa = _plan(filters_facets(
        documents, [(0, "fast merge join")],
        {"english": {"lang": {"eq": "en"}},
         "long": {"n_chars": {"gte": 400}}},
        other_bucket=True, metadata_col=None,
        id_col="doc_id", text_col="text",
    ))
    assert "Window" not in fa
    assert "CartesianProduct" not in fa
    assert "BroadcastNestedLoopJoin" not in fa
    assert "SortMergeJoin" not in fa


def test_mmr_plan_shape(spark):
    """MMR: candidate generation is the brute-cosine shape (query side
    a BroadcastNestedLoopJoin over the tiny query frame — the
    documented ANN-brute exemption), pool selection is the bounded
    tournament (window-free), and the greedy re-rank is ONE Arrow
    FlatMapGroupsInPandas over the bounded pool."""
    from same_same_spark.operators.mmr import mmr_topk

    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(60)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    p = _plan(mmr_topk(df, [(0, [1.0, 2.0, 3.0])], k=3, pool=10))
    assert "WindowExec" not in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    assert p.count("FlatMapGroupsInPandas") == 1
    assert "BroadcastExchange" in p


def test_multi_match_and_matrix_stats_plan_shape(spark, documents):
    """multi_match: per-field broadcast term joins unioned, window-free
    combine + tournament. matrix_stats: ONE aggregate row per query
    (every pair's moments in a single groupBy), fixed-shape explode —
    window-free, no cartesians."""
    from same_same_spark.operators.facets import matrix_stats_facets
    from same_same_spark.operators.multimatch import multi_match_search

    docs_f = documents.selectExpr(
        "doc_id", "substr(text, 1, 40) AS head", "text AS body"
    )
    mm = _plan(multi_match_search(
        docs_f, [(0, "fast merge join")], {"head": 2.0, "body": 1.0},
        mode="best_fields", tie_breaker=0.25, k=5, id_col="doc_id",
    ))
    ms = _plan(matrix_stats_facets(
        documents.selectExpr("doc_id", "text", "n_chars",
                             "n_chars % 7 AS x"),
        [(0, "fast merge join")], ["n_chars", "x"],
        id_col="doc_id", text_col="text",
    ))
    for plan in (mm, ms):
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan


def test_rare_terms_weighted_avg_bucket_sort_plan_shape(spark, documents):
    """rare_terms: rarity filter on aggregated counts + bounded
    tournament; weighted_avg: one map-side aggregate; bucket_sort:
    tournament over buckets — all window-free, no cartesians."""
    from same_same_spark.operators.events import bucket_sort
    from same_same_spark.operators.facets import (
        rare_terms_facets,
        weighted_avg_facets,
    )

    queries = [(0, "fast merge join")]
    rt = _plan(rare_terms_facets(
        documents, queries, "n_chars", max_doc_count=2,
        id_col="doc_id", text_col="text",
    ))
    wa = _plan(weighted_avg_facets(
        documents, queries, "n_chars", "n_chars",
        id_col="doc_id", text_col="text",
    ))
    series = documents.groupBy("lang").count() \
        .withColumnRenamed("count", "doc_count") \
        .withColumnRenamed("lang", "bucket")
    bs = _plan(bucket_sort(series, size=3, group_cols=None))
    for plan in (rt, wa, bs):
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" not in plan


def test_span_first_and_sampler_plan_shape(spark, documents):
    """span_first: posting-join candidates, bounded-prefix JVM probe,
    tournament ranking; sampler: bounded sample broadcast back against
    the metadata — both window-free, no cartesians."""
    from same_same_spark.operators.facets import sampler_terms_facets
    from same_same_spark.operators.spannear import span_first_search

    sf = _plan(span_first_search(
        documents, [(0, "fast merge join")], end=8, k=5,
        id_col="doc_id", text_col="text",
    ))
    sa = _plan(sampler_terms_facets(
        documents, [(0, "fast merge join")], "lang",
        shard_size=10, topn=5, id_col="doc_id", text_col="text",
    ))
    for plan in (sf, sa):
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan
    # the sampler's joins are all broadcast; span_first's
    # scored/verified join legitimately shuffles (both sides scale
    # with matches — the span_near family contract)
    assert "SortMergeJoin" not in sa


def test_feature_and_terms_set_plan_shape(spark, documents):
    """rank/distance_feature: one scored-matches plan + a pruned
    feature column join; terms_set: the boolean_search plan + one
    doc-side msm column — all window-free, broadcasts only."""
    from same_same_spark.operators.boolquery import terms_set_search
    from same_same_spark.operators.feature import (
        distance_feature_topk,
        rank_feature_topk,
    )
    from pyspark.sql import functions as SF

    queries = [(0, "fast merge join")]
    rf = _plan(rank_feature_topk(
        documents, queries, "n_chars", pivot=300.0, k=5,
        id_col="doc_id", text_col="text",
    ))
    df_ = _plan(distance_feature_topk(
        documents, queries, "n_chars", origin=300.0, pivot=50.0, k=5,
        id_col="doc_id", text_col="text",
    ))
    ts = _plan(terms_set_search(
        documents.withColumn("req", (SF.col("doc_id") % 3 + 1).cast("int")),
        queries, "req", k=5, id_col="doc_id", text_col="text",
    ))
    for plan in (rf, df_, ts):
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan


def test_match_phrase_prefix_plan_shape(spark, documents):
    """match_phrase_prefix: the completion expansion runs EAGERLY into
    a bounded literal frame (the lm_buckets cut-table precedent), so
    the returned plan carries ZERO vocab pattern scans — without the
    eager cut each consumer re-ran the RLIKE nested loop (measured 11
    subtrees). Everything else broadcast + tournament, window-free."""
    from same_same_spark.operators.phrase import match_phrase_prefix_search

    p = _plan(match_phrase_prefix_search(
        documents, [(0, "fast mer")], k=5,
        id_col="doc_id", text_col="text",
    ))
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_boxplot_mad_string_stats_plan_shape(spark, documents):
    """Round-5 agg wave: window-free, no cartesians; the boxplot/MAD
    second pass joins the tiny per-query statistic table BROADCAST."""
    from same_same_spark.operators.facets import (
        boxplot_facets,
        mad_facets,
        string_stats_facets,
        top_metrics_facets,
    )

    queries = [(0, "fast merge join"), (1, "vector table")]
    b = _plan(boxplot_facets(
        documents, queries, "n_chars", id_col="doc_id", text_col="text"
    ))
    m = _plan(mad_facets(
        documents, queries, "n_chars", id_col="doc_id", text_col="text"
    ))
    s = _plan(string_stats_facets(
        documents, queries, "text", id_col="doc_id", text_col="text"
    ))
    t = _plan(top_metrics_facets(
        documents, queries, "n_chars", ["lang"], size=3,
        id_col="doc_id", text_col="text",
    ))
    for plan in (b, m, s, t):
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
    for plan in (b, m):
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


def test_phrase_suggest_and_boosting_plan_shape(spark, documents):
    """phrase_suggest: LM count joins broadcast, no vocab cross join
    (the SymSpell hash join), window-free. boosting: the demotion set
    joins as one more broadcast term join."""
    from same_same_spark.operators.boost import boosting_search
    from same_same_spark.operators.phrasesuggest import phrase_suggest

    p = _plan(phrase_suggest(
        documents, [(1, "fasst merge")], topn=3, max_edits=1,
        id_col="doc_id", text_col="text",
    ))
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p

    b = _plan(boosting_search(
        documents, [(1, "fast merge", "slow")], k=5,
        id_col="doc_id", text_col="text",
    ))
    assert "Window" not in b
    assert "CartesianProduct" not in b
    assert "BroadcastNestedLoopJoin" not in b
    assert "BroadcastHashJoin" in b


def test_function_score_plan_shape(spark, documents):
    """function_score: every function is doc-side column math folded
    into the one scored-matches plan — broadcast joins only, no
    window, no cartesian."""
    from same_same_spark.operators.funcscore import function_score_search

    p = _plan(function_score_search(
        documents, [(0, "fast merge")],
        [
            {"field_value_factor": {
                "field": "n_chars", "modifier": "log1p",
            }},
            {"random_score": {"seed": 1}},
            {"weight": 2.0, "filter": {"lang": {"eq": "en"}}},
        ],
        k=5, id_col="doc_id", text_col="text",
    ))
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_query_string_plan_shape(spark, documents):
    """query_string: ALL queries' trees evaluate in ONE corpus scan
    (no per-query scan union), scores ride broadcast joins, no
    window, no cartesian."""
    from same_same_spark.operators.querystring import query_string_search

    df = query_string_search(
        documents,
        [(0, 'fast AND (merge OR sort) -slow'), (1, '"fast merge"')],
        k=5, id_col="doc_id", text_col="text",
    )
    p = _plan(df)
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    # one scan feeds the match-set side for BOTH queries (no
    # per-query scan union); scoring adds its standard two (stats +
    # postings) -> exactly 3 reads of the docs relation
    assert p.count("Scan parquet") == 3


def test_geo_plan_shape(spark, events):
    """Geo family: pure column math over one scan — grids are a single
    hash aggregate + TakeOrdered cut, nearest-k rides the tournament
    (window-free), rings join the literal shape broadcast."""
    from same_same_spark.operators.geo import (
        geo_distance_rings,
        geo_distance_topk,
        geohash_grid,
        geotile_grid,
        synth_point_cols,
    )

    lat, lon = synth_point_cols(F.col("event_id"))
    pts = events.select(
        F.col("event_id").alias("id"), lat.alias("lat"), lon.alias("lon")
    )
    tile = _plan(geotile_grid(pts, 5, 40))
    hashg = _plan(geohash_grid(pts, 2, 40))
    topk = _plan(geo_distance_topk(pts, 48.8566, 2.3522, 50))
    rings = _plan(geo_distance_rings(pts, 48.8566, 2.3522, [2000.0, 9000.0]))
    for plan in (tile, hashg, topk, rings):
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
    for plan in (tile, hashg):
        assert "TakeOrderedAndProject" in plan
        # one partial + one final hash aggregate pair, nothing else
        assert plan.count("HashAggregate") == 2
    assert "BroadcastHashJoin" in rings
    assert "SortMergeJoin" not in rings


def test_agg_straggler_plan_shape(spark, documents, events):
    """Ninth-session agg wave: window-free Spark side (the dedup cap
    and cuts are bounded tournaments), no cartesians, broadcast where
    expected (frequent-item prune, sampler metadata fetch)."""
    from same_same_spark.operators.facets import (
        diversified_sampler_terms_facets,
        multi_terms_facets,
    )
    from same_same_spark.operators.events import date_range_buckets
    from same_same_spark.operators.itemsets import frequent_pairs

    queries = [(0, "fast merge join"), (1, "vector table")]
    mt = _plan(multi_terms_facets(
        documents, queries, ["lang", "source"], topn=5,
        id_col="doc_id", text_col="text",
    ))
    ds = _plan(diversified_sampler_terms_facets(
        documents, queries, "lang", "source", max_docs_per_value=2,
        shard_size=20, topn=5, id_col="doc_id", text_col="text",
    ))
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    dr = _plan(date_range_buckets(ev, ["2024-02-01 00:00:00"]))
    fp = _plan(frequent_pairs(
        documents, 0.2, top_n=20, id_col="doc_id", text_col="text"
    ))
    for plan in (mt, ds, dr, fp):
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
    for plan in (mt, ds, dr, fp):
        assert "BroadcastHashJoin" in plan
    # the pair join is doc-keyed, frequent-items pruned — the ONLY
    # sort-merge allowed is the doc-keyed self join
    assert "TakeOrderedAndProject" in fp


def test_joinfield_and_rq_plan_shape(spark, documents):
    """Ninth-session tail waves: window-free, no cartesians except the
    broadcast LUT cross joins (RQ's per-query table is broadcast, like
    every ADC path)."""
    from same_same_spark.operators.joinfield import (
        has_child_topk,
        has_parent_topk,
    )

    queries = [(0, "fast merge join")]
    hc = _plan(has_child_topk(
        documents, queries, k=5, id_col="doc_id", text_col="text",
        size=120, overlap=30,
    ))
    hp = _plan(has_parent_topk(
        documents, queries, k=5, id_col="doc_id", text_col="text",
        size=120, overlap=30,
    ))
    for plan in (hc, hp):
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan

    import numpy as np

    from same_same_spark.pipeline.rq import (
        rq_adc_topk,
        rq_encode,
        train_rq_codebooks,
    )

    rng = np.random.RandomState(3)
    sample = rng.randn(64, 8)
    books = train_rq_codebooks(sample, levels=2, n_codes=4, seed=5)
    df = spark.createDataFrame(
        [(i, [float(v) for v in sample[i]]) for i in range(32)],
        "vec_id LONG, emb ARRAY<DOUBLE>",
    )
    codes = rq_encode(df, books, id_col="vec_id", embedding_col="emb")
    rq = _plan(rq_adc_topk(
        codes, books, [(0, [float(v) for v in sample[0]])], k=3,
        id_col="vec_id",
    ))
    assert "Window" not in rq
    # the per-query LUT is a broadcast nested-loop (tiny literal side)
    assert "BroadcastNestedLoopJoin" in rq or "BroadcastHashJoin" in rq
