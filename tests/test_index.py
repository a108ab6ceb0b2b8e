"""Index build + query: differential vs naive BM25, resume, lineage."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from same_same_spark.bm25 import score_queries
from same_same_spark.corpus import doc_id_col, generate_corpus
from same_same_spark.index.build import IndexManifest, build_index
from same_same_spark.index.query import search, search_batch

QUERIES = [
    (0, "fast merge join sort"),
    (1, "spark query data window"),
    (2, "customer table scan"),
    (3, "the and of"),  # all stopwords → no results
]


@pytest.fixture(scope="module")
def built(spark, documents, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index") / "docs_idx")
    manifest = build_index(
        documents, out, id_col="doc_id", text_col="text",
        num_buckets=8, group_size=3, log=lambda *_: None,
    )
    return out, manifest


def test_manifest_contents(built, documents):
    _, m = built
    assert m.n_docs == documents.count()
    assert m.avgdl > 0 and m.n_terms > 0 and m.n_postings >= m.n_terms
    assert m.num_buckets == 8
    assert len(m.groups) == 3  # ceil(8/3)


def test_lineage_records(built):
    out, _ = built
    lineage = sorted(os.listdir(os.path.join(out, "_lineage")))
    assert lineage == ["group-0000.json", "group-0001.json", "group-0002.json"]
    rec = json.load(open(os.path.join(out, "_lineage", lineage[0])))
    assert rec["postings"] > 0 and rec["bytes"] > 0
    assert rec["postings_per_sec"] > 0
    assert set(rec["per_bucket"]) == {"0", "1", "2"}


def test_merge_modes_rank_identical_and_plan_shapes(spark, built):
    """VERDICT r3 #7: the distributed topk_per_query merge is
    rank-identical to the driver broker merge, 'auto' routes by the
    k × buckets × queries bound, and the distributed plan contains
    neither a driver-side LocalTableScan result nor any WindowExec —
    nothing driver-proportional at large batch sizes."""
    from same_same_spark.index import query as qmod

    out, m = built
    want = sorted(
        map(tuple, search_batch(spark, out, QUERIES, k=10, merge="driver")
            .collect())
    )
    dist_df = search_batch(spark, out, QUERIES, k=10, merge="distributed")
    plan = dist_df._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec" not in plan and "Window" not in plan
    assert "ExistingRDD" not in plan and "LocalTableScan" not in plan
    assert sorted(map(tuple, dist_df.collect())) == want

    # auto: small batch stays driver-side (plan IS a local result)...
    auto_small = search_batch(spark, out, QUERIES, k=10, merge="auto")
    small_plan = auto_small._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in small_plan or "LocalTableScan" in small_plan
    assert sorted(map(tuple, auto_small.collect())) == want
    # ...and a batch pushed over the threshold routes distributed
    try:
        orig = qmod.DRIVER_MERGE_MAX_ROWS
        qmod.DRIVER_MERGE_MAX_ROWS = m.num_buckets * len(QUERIES) * 10 - 1
        auto_big = search_batch(spark, out, QUERIES, k=10, merge="auto")
        big_plan = auto_big._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" not in big_plan
        assert "LocalTableScan" not in big_plan
        assert sorted(map(tuple, auto_big.collect())) == want
    finally:
        qmod.DRIVER_MERGE_MAX_ROWS = orig
    with pytest.raises(ValueError, match="unknown merge mode"):
        search_batch(spark, out, QUERIES, k=10, merge="bogus")


def test_index_matches_naive_scorer(spark, documents, built):
    out, _ = built
    naive = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in score_queries(
            documents, QUERIES, k=10, id_col="doc_id", text_col="text"
        ).collect()
    }
    idx = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in search_batch(spark, out, QUERIES, k=10).collect()
    }
    assert set(naive) == set(idx)
    for key in naive:
        assert naive[key][0] == idx[key][0], f"doc mismatch at {key}"
        assert naive[key][1] == pytest.approx(idx[key][1], abs=1e-9)


def test_single_query_wrapper(spark, built):
    out, _ = built
    rows = search(spark, out, "fast merge join", k=5).collect()
    assert len(rows) == 5
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]


def test_unknown_term_only_query(spark, built):
    out, _ = built
    assert search(spark, out, "qqqzzzxxx", k=5).collect() == []


def test_resume_after_partial_build(spark, documents, built, tmp_path):
    """Kill-and-resume: drop one group's lineage + data; rebuild must
    redo exactly that group and produce identical search results."""
    out, _ = built
    resumed = str(tmp_path / "resumed_idx")
    shutil.copytree(out, resumed)
    # simulate a crash after group 0001 started but before commit
    os.remove(os.path.join(resumed, "_lineage", "group-0001.json"))
    os.remove(os.path.join(resumed, "manifest.json"))
    shutil.rmtree(os.path.join(resumed, "shards", "group-0001"))

    events = []
    build_index(
        documents, resumed, id_col="doc_id", text_col="text",
        num_buckets=8, group_size=3, log=lambda m: events.append(str(m)),
    )
    assert any("group 0000 already committed" in e for e in events)
    assert any("group 0001 committed" in e for e in events)
    assert any("group 0002 already committed" in e for e in events)

    a = search_batch(spark, out, QUERIES, k=10).collect()
    b = search_batch(spark, resumed, QUERIES, k=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pruned_equals_exhaustive(spark, built):
    """Block-max MaxScore pruning must be invisible in results (scores
    compared at the engine's pinned 1e-9 rounding — the two paths sum
    float contributions in different orders)."""
    out, _ = built

    def canon(rows):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in rows
        )

    a = canon(search_batch(spark, out, QUERIES, k=10, prune=True).collect())
    b = canon(search_batch(spark, out, QUERIES, k=10, prune=False).collect())
    assert a == b


def test_build_on_synthetic_corpus(spark, tmp_path):
    corpus = generate_corpus(spark, 300, seed=42).select(
        doc_id_col(), "content"
    )
    out = str(tmp_path / "syn_idx")
    m = build_index(corpus, out, num_buckets=4, group_size=2,
                    log=lambda *_: None)
    assert m.n_docs == 300
    qs = [(0, "import handler config"), (1, "func return score")]
    naive = score_queries(corpus, qs, k=10).collect()
    idx = search_batch(spark, out, qs, k=10).collect()
    assert sorted((r["query_id"], r["rank"], r["doc_id"]) for r in naive) == \
           sorted((r["query_id"], r["rank"], r["doc_id"]) for r in idx)
    # skew-term query (hot 'import'/'func' become non-essential lists):
    # pruned and exhaustive paths stay identical
    skew_qs = [(0, "import func tokenizer"), (1, "return batch quantize")]

    def canon(rows):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in rows
        )

    a = canon(search_batch(spark, out, skew_qs, k=10, prune=True).collect())
    b = canon(search_batch(spark, out, skew_qs, k=10, prune=False).collect())
    assert a == b


def test_tombstoned_delete_matches_fresh_build(spark, documents, tmp_path):
    """delete_docs + query must be rank- AND score-identical to a fresh
    build over the corpus minus the deleted docs (N/avgdl/df/idf all
    adjusted, deleted postings dropped before MaxScore's θ accumulates)."""
    from same_same_spark.index.mutate import delete_docs, load_tombstones

    idx = str(tmp_path / "idx")
    build_index(documents, idx, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)

    # delete docs that actually appear in current top-10s
    base = search_batch(spark, idx, QUERIES, k=10).collect()
    victims = sorted({r["doc_id"] for r in base if r["rank"] <= 2})
    assert victims
    tomb = delete_docs(spark, idx, victims, log=lambda *_: None)
    assert tomb["n_removed"] == len(victims)

    fresh = str(tmp_path / "fresh")
    build_index(
        documents.filter(~F.col("doc_id").isin(victims)), fresh,
        id_col="doc_id", text_col="text", num_buckets=4,
        log=lambda *_: None,
    )

    def canon(rows):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in rows
        )

    got = search_batch(spark, idx, QUERIES, k=10).collect()
    want = search_batch(spark, fresh, QUERIES, k=10).collect()
    assert canon(got) == canon(want)
    assert not ({r["doc_id"] for r in got} & set(victims))
    # pruned and exhaustive agree post-delete too
    got_ex = search_batch(spark, idx, QUERIES, k=10, prune=False).collect()
    assert canon(got) == canon(got_ex)

    # idempotent: deleting the same ids again changes nothing
    tomb2 = delete_docs(spark, idx, victims, log=lambda *_: None)
    assert tomb2["n_removed"] == tomb["n_removed"]
    assert canon(search_batch(spark, idx, QUERIES, k=10).collect()) == canon(want)
    assert load_tombstones(idx)["ids"].tolist() == sorted(victims)


def test_repeat_delete_crash_serves_prior_generation(
    spark, documents, tmp_path
):
    """Tombstone artifacts are generation-versioned (ADVICE r2): a crash
    anywhere inside a SECOND delete — partial staged writes, or a
    completed artifact-dir rename without the manifest flip — leaves the
    FIRST delete's artifact set being served, complete and correct. A
    later successful delete then supersedes everything cleanly."""
    from same_same_spark.index.mutate import delete_docs, load_tombstones

    idx = str(tmp_path / "idx")
    build_index(documents, idx, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    base = search_batch(spark, idx, QUERIES, k=10).collect()
    victims = sorted({r["doc_id"] for r in base if r["rank"] <= 2})
    delete_docs(spark, idx, victims, log=lambda *_: None)
    m = IndexManifest.load(idx)
    assert m.tomb_gen == 1 and m.tomb_dirname() == "tombstones-1"

    def canon(rows):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in rows
        )

    after_first = canon(search_batch(spark, idx, QUERIES, k=10).collect())

    # crash window A: a second delete died mid-write — only a partial
    # staging dir exists. Gen 1 must be served untouched.
    tmp2 = os.path.join(idx, "tombstones-2.tmp")
    os.makedirs(os.path.join(tmp2, "ids"))
    with open(os.path.join(tmp2, "stats.json"), "w") as f:
        f.write("{ truncated")
    tomb = load_tombstones(idx)
    assert tomb is not None and tomb["ids"].tolist() == sorted(victims)
    assert canon(search_batch(spark, idx, QUERIES, k=10).collect()) \
        == after_first

    # crash window B: the staged dir was renamed to tombstones-2 but
    # the manifest flip never happened — the manifest still points at
    # gen 1, so the unreferenced (and here corrupt) gen-2 dir is inert.
    os.replace(tmp2, os.path.join(idx, "tombstones-2"))
    assert IndexManifest.load(idx).tomb_dirname() == "tombstones-1"
    tomb = load_tombstones(idx)
    assert tomb is not None and tomb["ids"].tolist() == sorted(victims)
    assert canon(search_batch(spark, idx, QUERIES, k=10).collect()) \
        == after_first

    # recovery: the next delete replaces the garbage gen-2 dir with a
    # complete artifact set and flips the manifest to it; superseded
    # generations are swept.
    extra = sorted(
        {r["doc_id"] for r in base if r["rank"] == 3} - set(victims)
    )[:1]
    assert extra
    delete_docs(spark, idx, victims + extra, log=lambda *_: None)
    m = IndexManifest.load(idx)
    assert m.tomb_gen == 2 and m.tomb_dirname() == "tombstones-2"
    assert load_tombstones(idx)["ids"].tolist() == sorted(victims + extra)
    assert not os.path.exists(os.path.join(idx, "tombstones-1"))
    assert not os.path.exists(os.path.join(idx, "tombstones-2.tmp"))

    fresh = str(tmp_path / "fresh")
    build_index(
        documents.filter(~F.col("doc_id").isin(victims + extra)), fresh,
        id_col="doc_id", text_col="text", num_buckets=4,
        log=lambda *_: None,
    )
    got = canon(search_batch(spark, idx, QUERIES, k=10).collect())
    want = canon(search_batch(spark, fresh, QUERIES, k=10).collect())
    assert got == want


def test_rewrite_compacted_equals_fresh_build(spark, documents, tmp_path):
    """rewrite_compacted folds all groups into one and drops tombstoned
    docs for good: manifest/stats/search equal a fresh build over the
    survivors, and the tombstone artifacts are cleared."""
    from same_same_spark.index.mutate import (
        delete_docs,
        load_tombstones,
        rewrite_compacted,
    )

    idx = str(tmp_path / "idx")
    # multi-group build so the fold is exercised
    build_index(documents, idx, id_col="doc_id", text_col="text",
                num_buckets=4, group_size=2, log=lambda *_: None)
    base = search_batch(spark, idx, QUERIES, k=10).collect()
    victims = sorted({r["doc_id"] for r in base if r["rank"] <= 2})
    delete_docs(spark, idx, victims, log=lambda *_: None)

    m = rewrite_compacted(spark, idx, log=lambda *_: None)
    assert load_tombstones(idx) is None
    assert len(m.groups) == 1 and m.groups[0].startswith("c0-")

    fresh = str(tmp_path / "fresh")
    fm = build_index(
        documents.filter(~F.col("doc_id").isin(victims)), fresh,
        id_col="doc_id", text_col="text", num_buckets=4,
        log=lambda *_: None,
    )
    assert m.n_docs == fm.n_docs
    assert m.avgdl == pytest.approx(fm.avgdl)
    assert m.n_postings == fm.n_postings and m.n_terms == fm.n_terms

    def canon(rows):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in rows
        )

    got = search_batch(spark, idx, QUERIES, k=10).collect()
    want = search_batch(spark, fresh, QUERIES, k=10).collect()
    assert canon(got) == canon(want)
    # a second rewrite (no tombstones) is a no-op fold that still works
    m2 = rewrite_compacted(spark, idx, log=lambda *_: None)
    assert m2.n_docs == m.n_docs
    assert canon(search_batch(spark, idx, QUERIES, k=10).collect()) == canon(want)


def test_rewrite_touched_groups_incremental(spark, documents, tmp_path):
    """Incremental compaction rewrites ONLY groups containing tombstoned
    docs: untouched group dirs survive byte-identical by name, the
    manifest/stats/search equal a fresh build over the survivors, and
    tombstones are cleared."""
    import os

    from same_same_spark.index import codec
    from same_same_spark.index.mutate import (
        delete_docs,
        load_tombstones,
        rewrite_touched_groups,
    )

    idx = str(tmp_path / "idx")
    build_index(documents, idx, id_col="doc_id", text_col="text",
                num_buckets=4, group_size=2, log=lambda *_: None)
    groups0 = sorted(
        d[len("group-"):]
        for d in os.listdir(os.path.join(idx, "shards"))
    )
    assert len(groups0) == 2

    # pick victims living ONLY in the first group
    g0 = spark.read.parquet(
        os.path.join(idx, "shards", f"group-{groups0[0]}")
    )
    drow = g0.filter(F.col("kind") == "d").limit(1).collect()[0]
    ids0 = codec.decode_doc_ids(bytes(drow["doc_bytes"]), drow["n"])
    victims = sorted(int(x) for x in ids0[:3])
    delete_docs(spark, idx, victims, log=lambda *_: None)

    m = rewrite_touched_groups(spark, idx, log=lambda *_: None)
    assert load_tombstones(idx) is None
    # the untouched group keeps its original name; the touched one is
    # replaced by a c-generation group
    names = set(m.groups)
    assert groups0[1] in names
    assert groups0[0] not in names
    assert any(n.startswith("c0-") for n in names)

    fresh = str(tmp_path / "fresh")
    fm = build_index(
        documents.filter(~F.col("doc_id").isin(victims)), fresh,
        id_col="doc_id", text_col="text", num_buckets=4,
        log=lambda *_: None,
    )
    assert m.n_docs == fm.n_docs
    assert m.avgdl == pytest.approx(fm.avgdl)
    assert m.n_postings == fm.n_postings and m.n_terms == fm.n_terms

    def canon(rows):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in rows
        )

    got = search_batch(spark, idx, QUERIES, k=10).collect()
    want = search_batch(spark, fresh, QUERIES, k=10).collect()
    assert canon(got) == canon(want)
    assert not ({r["doc_id"] for r in got} & set(victims))
    # pruned == exhaustive still holds on the mixed-generation index
    got_ex = search_batch(spark, idx, QUERIES, k=10, prune=False).collect()
    assert canon(got) == canon(got_ex)


def test_rewrite_touched_groups_noop_for_absent_ids(spark, documents, tmp_path):
    """Tombstoned ids that exist in no group: compaction clears the
    tombstones and leaves every group dir untouched."""
    from same_same_spark.index.build import IndexManifest
    from same_same_spark.index.mutate import (
        delete_docs,
        load_tombstones,
        rewrite_touched_groups,
    )

    idx = str(tmp_path / "idx")
    build_index(documents, idx, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    before = IndexManifest.load(idx).groups
    delete_docs(spark, idx, [10**15 + 1, 10**15 + 2], log=lambda *_: None)
    m = rewrite_touched_groups(spark, idx, log=lambda *_: None)
    assert load_tombstones(idx) is None
    assert m.groups == before


def test_dropped_group_then_delta_compaction_no_collision(spark, tmp_path):
    """Reviewer repro: fully tombstoning one group drops it from the
    manifest; a later streaming delta compaction must NOT re-issue that
    group's name or grp int (the monotonic next_grp allocator), and
    search must equal a fresh build over (survivors + appended)."""
    import json as _json
    import os

    from same_same_spark.index import codec
    from same_same_spark.index.build import (
        IndexManifest,
        compact_deltas,
    )
    from same_same_spark.index.mutate import delete_docs, rewrite_touched_groups
    from same_same_spark.streaming.ingest import stream_doc_ingest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=4, group_size=2, log=lambda *_: None)
    m0 = IndexManifest.load(idx)
    assert len(m0.groups) == 2 and m0.next_grp == 2

    # tombstone EVERY doc of the first group
    g0_dir = os.path.join(idx, "shards", f"group-{m0.groups[0]}")
    victims = []
    for r in spark.read.parquet(g0_dir).filter(F.col("kind") == "d").collect():
        victims.extend(
            int(x) for x in codec.decode_doc_ids(bytes(r["doc_bytes"]), r["n"])
        )
    delete_docs(spark, idx, victims, log=lambda *_: None)
    m1 = rewrite_touched_groups(spark, idx, log=lambda *_: None)
    assert m0.groups[0] not in m1.groups          # dropped, not rewritten
    assert m1.groups == [m0.groups[1]]
    assert m1.next_grp == 2                       # allocator NOT shrunk

    # stream new docs + compact: name/grp must not collide with the
    # live group (grp 1) nor resurrect the dropped name (grp/name 0)
    extra = [(10_000_001, "fresh streamed alpha document"),
             (10_000_002, "another streamed bravo document")]
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "d.json"), "w") as f:
        for did, text in extra:
            f.write(_json.dumps({"doc_id": did, "content": text}) + "\n")
    stream = spark.readStream.schema("doc_id LONG, content STRING").json(src)
    q = stream_doc_ingest(stream, idx, checkpoint_dir=str(tmp_path / "ck"),
                          num_buckets=4)
    q.awaitTermination(120)
    m2 = compact_deltas(spark, idx, log=lambda *_: None)
    assert m2.groups == [m0.groups[1], "0002"]    # new name from next_grp
    assert m2.next_grp == 3

    fresh = str(tmp_path / "fresh")
    survivors = (
        docs.select("doc_id", "text")
        .filter(~F.col("doc_id").isin(victims))
        .unionByName(spark.createDataFrame(extra, "doc_id LONG, text STRING"))
    )
    build_index(survivors, fresh, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)

    def canon(rows_):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in rows_
        )

    got = canon(search_batch(spark, idx, QUERIES, k=10).collect())
    want = canon(search_batch(spark, fresh, QUERIES, k=10).collect())
    assert got == want


# ------------------------------------------------------------------
# federated multi-index search
# ------------------------------------------------------------------

def _fed_key(rows):
    return sorted(
        (r["query_id"], r["doc_id"], round(r["score"], 12), r["rank"])
        for r in rows
    )


def test_federated_equals_monolithic(spark, documents, tmp_path_factory):
    from pyspark.sql import functions as F

    from same_same_spark.index.build import build_index
    from same_same_spark.index.query import search_batch, search_federated

    base = str(tmp_path_factory.mktemp("fed"))
    parts = {
        "a": documents.filter(F.col("doc_id") % 2 == 0),
        "b": documents.filter(F.col("doc_id") % 2 == 1),
        "all": documents,
    }
    for name, df in parts.items():
        build_index(
            df, f"{base}/{name}", id_col="doc_id", text_col="text",
            num_buckets=4, log=lambda *_: None,
        )
    queries = [(0, "fast merge join sort"), (1, "vector table scan")]
    mono = search_batch(spark, f"{base}/all", queries, k=10).collect()
    fed = search_federated(
        spark, [f"{base}/a", f"{base}/b"], queries, k=10
    ).collect()
    assert _fed_key(fed) == _fed_key(mono)
    # single-member family degenerates to plain search
    one = search_federated(spark, [f"{base}/all"], queries, k=10).collect()
    assert _fed_key(one) == _fed_key(mono)
    # stopword-only queries return empty
    assert (
        search_federated(
            spark, [f"{base}/a", f"{base}/b"], [(0, "the of and")], k=5
        ).collect()
        == []
    )
    with pytest.raises(ValueError, match="non-empty"):
        search_federated(spark, [], queries)


def test_federated_tombstones_compose(spark, documents, tmp_path_factory):
    from pyspark.sql import functions as F

    from same_same_spark.index.build import build_index
    from same_same_spark.index.mutate import delete_docs
    from same_same_spark.index.query import search_batch, search_federated

    base = str(tmp_path_factory.mktemp("fedtomb"))
    a = documents.filter(F.col("doc_id") % 2 == 0)
    b = documents.filter(F.col("doc_id") % 2 == 1)
    for name, df in (("a", a), ("b", b)):
        build_index(
            df, f"{base}/{name}", id_col="doc_id", text_col="text",
            num_buckets=4, log=lambda *_: None,
        )
    victims = [r["doc_id"] for r in a.limit(10).collect()]
    delete_docs(spark, f"{base}/a", victims)
    build_index(
        documents.filter(~F.col("doc_id").isin(victims)),
        f"{base}/fresh", id_col="doc_id", text_col="text",
        num_buckets=4, log=lambda *_: None,
    )
    queries = [(0, "fast merge join sort"), (1, "vector table scan")]
    fed = search_federated(
        spark, [f"{base}/a", f"{base}/b"], queries, k=10
    ).collect()
    fresh = search_batch(spark, f"{base}/fresh", queries, k=10).collect()
    assert _fed_key(fed) == _fed_key(fresh)


def test_federated_requires_shared_params(spark, documents, tmp_path_factory):
    from pyspark.sql import functions as F

    from same_same_spark.index.build import build_index
    from same_same_spark.index.query import search_federated

    base = str(tmp_path_factory.mktemp("fedparam"))
    a = documents.filter(F.col("doc_id") % 2 == 0)
    b = documents.filter(F.col("doc_id") % 2 == 1)
    build_index(
        a, f"{base}/a", id_col="doc_id", text_col="text",
        num_buckets=4, log=lambda *_: None,
    )
    build_index(
        b, f"{base}/b", id_col="doc_id", text_col="text",
        num_buckets=4, k1=0.9, log=lambda *_: None,
    )
    with pytest.raises(ValueError, match="k1, b"):
        search_federated(
            spark, [f"{base}/a", f"{base}/b"], [(0, "fast merge")], k=5
        )
