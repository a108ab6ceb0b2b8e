"""Index merge (index/merge.py): parallel sub-builds combined into one
queryable index, rank- and score-identical to a fresh union build."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from same_same_spark.index.build import IndexManifest, build_index
from same_same_spark.index.merge import IndexMergeError, merge_indexes
from same_same_spark.index.query import search_batch

QUERIES = [(0, "fast merge join sort"), (1, "vector table scan")]


def _docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")


def _canon(rows):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rows
    )


def _build(docs, out, **kw):
    kw.setdefault("num_buckets", 4)
    build_index(docs, out, id_col="doc_id", text_col="text",
                log=lambda *_: None, **kw)


def test_merge_matches_fresh_union_build(spark, tmp_path):
    docs = _docs(spark)
    # three disjoint slices, built independently (the parallel
    # partition-build pattern), then merged into the first
    parts = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    dirs = [str(tmp_path / f"idx{i}") for i in range(3)]
    for p, d in zip(parts, dirs):
        _build(p, d, group_size=2)  # multi-group sources

    out = merge_indexes(spark, dirs[0], dirs[1:], log=lambda *_: None)
    assert out.n_docs == docs.count()

    fresh = str(tmp_path / "fresh")
    _build(docs, fresh)
    got = _canon(search_batch(spark, dirs[0], QUERIES, k=10).collect())
    want = _canon(search_batch(spark, fresh, QUERIES, k=10).collect())
    assert got == want

    # sources untouched
    for d in dirs[1:]:
        m = IndexManifest.load(d)
        assert m.groups and not m.has_tombstones

    # merge lineage carries the copy job's execution counters, and a
    # healthy merge shuffles nothing
    import glob as _glob
    import json as _json

    recs = [
        _json.load(open(p))
        for p in _glob.glob(os.path.join(dirs[0], "_lineage", "group-*.json"))
    ]
    merged = [r for r in recs if r.get("kind") == "index-merge"]
    assert merged
    assert all(r["exec"]["shuffle_write_bytes"] == 0 for r in merged)


def test_merge_retry_after_simulated_crash(spark, tmp_path):
    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    _build(a, da)
    _build(b, db)

    # simulate a merge that crashed after copying a group but before
    # the manifest flip: plant garbage at the exact target name the
    # allocator will choose
    next_grp = IndexManifest.load(da).alloc_grp()
    orphan = os.path.join(da, "shards", f"group-{next_grp:04d}")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("partial write")

    merge_indexes(spark, da, [db], log=lambda *_: None)
    fresh = str(tmp_path / "fresh")
    _build(docs, fresh)
    got = _canon(search_batch(spark, da, QUERIES, k=10).collect())
    want = _canon(search_batch(spark, fresh, QUERIES, k=10).collect())
    assert got == want
    assert not os.path.exists(os.path.join(orphan, "junk"))


def test_merge_retry_after_commit_skips_merged_source(spark, tmp_path):
    """The post-manifest-flip crash window: an orchestrator retrying a
    COMMITTED merge must not duplicate the source's documents — the
    source content token in the committed lineage marks it merged."""
    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    _build(a, da)
    _build(b, db)

    first = merge_indexes(spark, da, [db], log=lambda *_: None)
    assert first.n_docs == docs.count()
    before = _canon(search_batch(spark, da, QUERIES, k=10).collect())

    # blind retry of the identical command
    second = merge_indexes(spark, da, [db], log=lambda *_: None)
    assert second.n_docs == docs.count()  # NOT doubled
    assert sorted(second.groups) == sorted(first.groups)
    after = _canon(search_batch(spark, da, QUERIES, k=10).collect())
    assert after == before


def test_merge_retry_after_lineage_but_no_flip(spark, tmp_path):
    """The OTHER commit window: lineage records written, group dirs on
    disk, but the manifest flip never happened (crash inside
    _finalize_groups). The decision table must treat the source as NOT
    merged — a rerun re-copies the same names and finishes the commit,
    losing nothing and duplicating nothing."""
    import json

    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    _build(a, da)
    _build(b, db)

    pre_manifest_path = os.path.join(da, "manifest.json")
    with open(pre_manifest_path) as f:
        pre_manifest = f.read()

    first = merge_indexes(spark, da, [db], log=lambda *_: None)
    committed_groups = sorted(first.groups)

    # simulate the crash: lineage + group dirs exist, manifest reverted
    with open(pre_manifest_path, "w") as f:
        f.write(pre_manifest)
    # sanity: the merged groups are on disk but absent from the manifest
    m = IndexManifest.load(da)
    assert sorted(m.groups) != committed_groups
    lineage = [
        json.load(open(os.path.join(da, "_lineage", p)))
        for p in os.listdir(os.path.join(da, "_lineage"))
        if p.startswith("group-")
    ]
    assert any(r.get("kind") == "index-merge" for r in lineage)

    retried = merge_indexes(spark, da, [db], log=lambda *_: None)
    assert retried.n_docs == docs.count()  # completed, not skipped
    assert sorted(retried.groups) == committed_groups  # same names

    fresh = str(tmp_path / "fresh")
    _build(docs, fresh)
    got = _canon(search_batch(spark, da, QUERIES, k=10).collect())
    want = _canon(search_batch(spark, fresh, QUERIES, k=10).collect())
    assert got == want


def test_merge_rejects_dest_as_source_and_dup_sources(spark, tmp_path):
    docs = _docs(spark)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    _build(docs.filter(F.col("doc_id") % 2 == 0), da)
    _build(docs.filter(F.col("doc_id") % 2 == 1), db)
    with pytest.raises(IndexMergeError, match="destination"):
        merge_indexes(spark, da, [da], log=lambda *_: None)
    with pytest.raises(IndexMergeError, match="more than once"):
        merge_indexes(spark, da, [db, db], log=lambda *_: None)


def test_merge_composes_with_append_delete_compact(spark, tmp_path):
    """Full mutation lifecycle ON a merged index: merge → streamed
    delta append → tombstone delete → incremental compaction. The end
    state must be rank- and score-identical to a fresh build over
    (union + appended − deleted) — every mutation path composes with
    merge-created groups."""
    from same_same_spark.index.build import compact_deltas
    from same_same_spark.index.mutate import (
        delete_docs,
        rewrite_touched_groups,
    )
    from same_same_spark.streaming.ingest import stage_delta_batch

    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    _build(a, da, group_size=2)
    _build(b, db, group_size=2)
    merge_indexes(spark, da, [db], log=lambda *_: None)

    # streamed append of two new docs
    new_id = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    extra = spark.createDataFrame(
        [
            (new_id, "fast merge join sort appended document"),
            (new_id + 1, "vector table scan appended too"),
        ],
        "doc_id LONG, text STRING",
    )
    stage_delta_batch(extra, da, id_col="doc_id", text_col="text",
                      num_buckets=4)
    compact_deltas(spark, da, log=lambda *_: None)

    # tombstone two docs (one from each original half), then compact
    victims = [
        int(a.agg(F.min("doc_id")).collect()[0][0]),
        int(b.agg(F.min("doc_id")).collect()[0][0]),
    ]
    delete_docs(spark, da, victims, log=lambda *_: None)
    rewrite_touched_groups(spark, da, log=lambda *_: None)

    final = docs.filter(~F.col("doc_id").isin(victims)).unionByName(extra)
    fresh = str(tmp_path / "fresh")
    _build(final, fresh)
    got = _canon(search_batch(spark, da, QUERIES, k=10).collect())
    want = _canon(search_batch(spark, fresh, QUERIES, k=10).collect())
    assert got == want


def test_merge_auto_compact_settles_sources(spark, tmp_path):
    """auto_compact=True settles a tombstoned destination AND a source
    carrying both a staged delta batch and live tombstones, then the
    merge result is rank-identical to a fresh build over the settled
    union. Default (auto_compact=False) still refuses the same inputs."""
    from same_same_spark.index.mutate import delete_docs
    from same_same_spark.streaming.ingest import stage_delta_batch

    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    _build(a, da, group_size=2)
    _build(b, db, group_size=2)

    victim_a = int(a.agg(F.min("doc_id")).collect()[0][0])
    victim_b = int(b.agg(F.min("doc_id")).collect()[0][0])
    delete_docs(spark, da, [victim_a], log=lambda *_: None)
    delete_docs(spark, db, [victim_b], log=lambda *_: None)
    new_id = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    extra = spark.createDataFrame(
        [(new_id, "fast merge join sort appended into source b")],
        "doc_id LONG, text STRING",
    )
    stage_delta_batch(extra, db, id_col="doc_id", text_col="text",
                      num_buckets=4)
    # the DESTINATION also carries a staged batch (and tombstones):
    # auto_compact settles both sides of the merge
    extra_dest = spark.createDataFrame(
        [(new_id + 1, "vector table staged into the destination")],
        "doc_id LONG, text STRING",
    )
    stage_delta_batch(extra_dest, da, id_col="doc_id", text_col="text",
                      num_buckets=4)

    with pytest.raises(IndexMergeError, match="tombstones"):
        merge_indexes(spark, da, [db], log=lambda *_: None)

    out = merge_indexes(spark, da, [db], log=lambda *_: None,
                        auto_compact=True)
    final = (
        docs.filter(~F.col("doc_id").isin([victim_a, victim_b]))
        .unionByName(extra)
        .unionByName(extra_dest)
    )
    assert out.n_docs == final.count()

    fresh = str(tmp_path / "fresh")
    _build(final, fresh)
    got = _canon(search_batch(spark, da, QUERIES, k=10).collect())
    want = _canon(search_batch(spark, fresh, QUERIES, k=10).collect())
    assert got == want
    # source b was settled in place: no tombstones, no pending deltas
    mb = IndexManifest.load(db)
    assert not mb.has_tombstones
    assert not os.path.exists(os.path.join(db, "_stage", "deltas")) or \
        not os.listdir(os.path.join(db, "_stage", "deltas"))


def test_merge_auto_compact_retry_after_source_grew_not_duplicated(
    spark, tmp_path
):
    """A source gains staged deltas AFTER its merge committed; a blind
    orchestrator retry with auto_compact=True must recognize the
    committed token BEFORE settling (settling would change the token)
    and skip the source — not compact it and re-copy (= duplicate)
    every already-merged document."""
    from same_same_spark.streaming.ingest import stage_delta_batch

    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    _build(a, da)
    _build(b, db)

    first = merge_indexes(spark, da, [db], log=lambda *_: None,
                          auto_compact=True)
    assert first.n_docs == docs.count()
    before = _canon(search_batch(spark, da, QUERIES, k=10).collect())

    # source grows: new batch staged (manifest untouched until compact)
    new_id = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    extra = spark.createDataFrame(
        [(new_id, "fresh document staged after the merge")],
        "doc_id LONG, text STRING",
    )
    stage_delta_batch(extra, db, id_col="doc_id", text_col="text",
                      num_buckets=4)

    retried = merge_indexes(spark, da, [db], log=lambda *_: None,
                            auto_compact=True)
    assert retried.n_docs == docs.count()  # NOT doubled
    assert sorted(retried.groups) == sorted(first.groups)
    after = _canon(search_batch(spark, da, QUERIES, k=10).collect())
    assert after == before
    # the skipped source was left untouched: its staged batch survives
    pending = os.listdir(os.path.join(db, "_stage", "deltas"))
    assert len(pending) == 1


def test_merge_compatibility_gates(spark, tmp_path):
    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    da, db8 = str(tmp_path / "a"), str(tmp_path / "b8")
    _build(a, da)
    _build(b, db8, num_buckets=8)  # bucket-count mismatch
    with pytest.raises(IndexMergeError, match="num_buckets"):
        merge_indexes(spark, da, [db8], log=lambda *_: None)

    # tombstoned source refused
    db = str(tmp_path / "b")
    _build(b, db)
    from same_same_spark.index.mutate import delete_docs

    some_id = int(b.agg(F.min("doc_id")).collect()[0][0])
    delete_docs(spark, db, [some_id], log=lambda *_: None)
    with pytest.raises(IndexMergeError, match="tombstones"):
        merge_indexes(spark, da, [db], log=lambda *_: None)

    # pending source deltas refused
    dc = str(tmp_path / "c")
    _build(b, dc)
    staged = os.path.join(dc, "_stage", "deltas", "batch-000")
    os.makedirs(staged)
    with pytest.raises(IndexMergeError, match="delta"):
        merge_indexes(spark, da, [dc], log=lambda *_: None)
    shutil.rmtree(staged)
