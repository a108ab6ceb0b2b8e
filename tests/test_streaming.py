"""Structured Streaming: windowed events + incremental index ingest."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from same_same_spark.streaming import stream_doc_ingest, stream_events_hourly
from same_same_spark.streaming.ingest import read_events_stream


def _write_events_json(path, events):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_stream_events_hourly_matches_batch(spark, tmp_path):
    events = [
        {"event_id": 1, "ts": "2024-01-01T00:10:00", "user_id": 1,
         "event_type": "click", "value": 2.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:40:00", "user_id": 2,
         "event_type": "click", "value": 4.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-01-01T01:10:00", "user_id": 1,
         "event_type": "view", "value": 1.0, "props": "{}"},
    ]
    src = str(tmp_path / "events")
    _write_events_json(src, events)

    stream = read_events_stream(spark, src)
    assert stream.isStreaming
    agg = stream_events_hourly(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_hourly")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["avg_value"])
        for r in spark.sql("SELECT * FROM ev_hourly").collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 01:00:00", "view")] == (1, 1.0)


def test_stream_doc_ingest_deltas_and_lineage(spark, tmp_path):
    docs = [
        {"doc_id": 1, "content": "alpha bravo charlie alpha"},
        {"doc_id": 2, "content": "bravo delta echo"},
    ]
    src = str(tmp_path / "docs")
    os.makedirs(src)
    with open(os.path.join(src, "d0.json"), "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")

    stream = (
        spark.readStream.schema("doc_id LONG, content STRING")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    idx = str(tmp_path / "idx")
    q = stream_doc_ingest(
        stream, idx, checkpoint_dir=str(tmp_path / "ckpt"), num_buckets=4
    )
    q.awaitTermination(120)

    deltas = os.listdir(os.path.join(idx, "_stage", "deltas"))
    assert len(deltas) >= 1
    staged = spark.read.parquet(
        os.path.join(idx, "_stage", "deltas", deltas[0])
    )
    got = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in staged.filter(F.col("term").isNotNull()).collect()
    }
    assert got[(1, "alpha")] == 2
    assert got[(2, "delta")] == 1
    assert set(staged.columns) == {"doc_id", "term", "tf", "dl", "bucket"}
    # one term=NULL doclen row per ingested doc (zero-token docs included)
    doc_rows = staged.filter(F.col("term").isNull()).collect()
    assert {r["doc_id"] for r in doc_rows} == {1, 2}
    assert all(r["tf"] == 0 for r in doc_rows)

    lineage = os.listdir(os.path.join(idx, "_lineage_stream"))
    assert len(lineage) == len(deltas)
    with open(os.path.join(idx, "_lineage_stream", sorted(lineage)[0])) as f:
        rec = json.load(f)
    assert rec["docs"] == 2 and rec["postings"] == len(got)


def test_stream_then_compact_equals_fresh_build(spark, tmp_path):
    """Batch-build half the corpus, stream the other half, compact —
    search results must be rank- and score-identical to a fresh build
    over the full corpus (df/N/avgdl all refreshed)."""
    import json as _json

    from pyspark.sql import functions as F

    from same_same_spark.index.build import build_index, compact_deltas
    from same_same_spark.index.query import search_batch

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)

    # incremental: batch build + streamed deltas + compaction
    inc = str(tmp_path / "inc_idx")
    build_index(first, inc, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    rows = second.select("doc_id", F.col("text").alias("content")).collect()
    with open(os.path.join(src, "d.json"), "w") as f:
        for r in rows:
            f.write(_json.dumps({"doc_id": r["doc_id"], "content": r["content"]}) + "\n")
    stream = spark.readStream.schema("doc_id LONG, content STRING").json(src)
    q = stream_doc_ingest(stream, inc, checkpoint_dir=str(tmp_path / "ck"),
                          num_buckets=4)
    q.awaitTermination(120)
    m = compact_deltas(spark, inc, log=lambda *_: None)
    assert m.n_docs == docs.count()

    # fresh full build
    full = str(tmp_path / "full_idx")
    build_index(docs, full, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)

    queries = [(0, "fast merge join sort"), (1, "spark query data window")]

    def canon(rows_):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in rows_
        )

    a = canon(search_batch(spark, inc, queries, k=10).collect())
    b = canon(search_batch(spark, full, queries, k=10).collect())
    assert a == b
    # idempotent: nothing left to compact
    m2 = compact_deltas(spark, inc, log=lambda *_: None)
    assert m2.groups == m.groups


def test_compact_counts_zero_token_delta_docs(spark, tmp_path):
    """A streamed doc whose text tokenizes to zero tokens (all
    stopwords) emits no postings but MUST still count toward N/avgdl —
    post-compaction stats and scores must equal a fresh build over the
    union corpus including that doc."""
    import json as _json

    from pyspark.sql import functions as F

    from same_same_spark.index.build import build_index, compact_deltas
    from same_same_spark.index.query import search_batch

    base = [(1, "alpha bravo charlie"), (2, "bravo delta echo alpha")]
    delta = [(3, "the and of to is"), (4, "charlie foxtrot golf")]
    base_df = spark.createDataFrame(base, "doc_id LONG, text STRING")
    all_df = spark.createDataFrame(base + delta, "doc_id LONG, text STRING")

    inc = str(tmp_path / "inc_idx")
    build_index(base_df, inc, id_col="doc_id", text_col="text",
                num_buckets=2, log=lambda *_: None)
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "d.json"), "w") as f:
        for did, text in delta:
            f.write(_json.dumps({"doc_id": did, "content": text}) + "\n")
    stream = spark.readStream.schema("doc_id LONG, content STRING").json(src)
    q = stream_doc_ingest(stream, inc, checkpoint_dir=str(tmp_path / "ck"),
                          num_buckets=2)
    q.awaitTermination(120)
    m = compact_deltas(spark, inc, log=lambda *_: None)

    full = str(tmp_path / "full_idx")
    fm = build_index(all_df, full, id_col="doc_id", text_col="text",
                     num_buckets=2, log=lambda *_: None)
    assert m.n_docs == fm.n_docs == 4
    assert m.avgdl == pytest.approx(fm.avgdl)

    got = search_batch(spark, inc, [(0, "alpha charlie")], k=10).collect()
    want = search_batch(spark, full, [(0, "alpha charlie")], k=10).collect()
    canon = lambda rs: sorted(
        (r["rank"], r["doc_id"], round(r["score"], 9)) for r in rs
    )
    assert canon(got) == canon(want)


def test_stream_dedup_exact_across_batches(spark, tmp_path):
    """applyInPandasWithState dedup: the first arrival of a content hash
    survives; duplicates in the SAME batch and in LATER batches are both
    dropped. Differential vs the batch exact dedup over the union."""
    from same_same_spark.pipeline.dedup import exact_dedup
    from same_same_spark.streaming.ingest import stream_dedup_exact

    b0 = [
        {"doc_id": 3, "content": "alpha bravo"},
        {"doc_id": 1, "content": "alpha bravo"},   # same-batch dup -> min id
        {"doc_id": 2, "content": "charlie delta"},
    ]
    b1 = [
        {"doc_id": 4, "content": "alpha bravo"},   # cross-batch dup
        {"doc_id": 5, "content": "echo foxtrot"},
    ]
    src = str(tmp_path / "docs")
    os.makedirs(src)
    # two files + maxFilesPerTrigger=1 => two micro-batches; the file
    # source orders by modification time, so pin mtimes explicitly
    for i, batch in enumerate((b0, b1)):
        p = os.path.join(src, f"d{i}.json")
        with open(p, "w") as f:
            for d in batch:
                f.write(json.dumps(d) + "\n")
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream = (
        spark.readStream.schema("doc_id LONG, content STRING")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = stream_dedup_exact(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]
        for r in spark.sql("SELECT doc_id FROM dedup_out").collect()
    }
    assert got == {1, 2, 5}

    # batch twin over the union keeps the same survivor set
    union = spark.createDataFrame(
        [(d["doc_id"], d["content"]) for d in b0 + b1],
        "doc_id LONG, content STRING",
    )
    batch_ids = {
        r["doc_id"]
        for r in exact_dedup(union, "doc_id", "content").collect()
    }
    assert got == batch_ids


def test_delete_then_stream_append_composes(spark, tmp_path):
    """Deletes + streamed appends must compose: tombstone some docs,
    then stream new docs and compact — search must equal a fresh build
    over (original - deleted + appended). The adjusted N/avgdl come
    from the MANIFEST (kept current by compaction), not the delete-time
    snapshot (review finding)."""
    import json as _json

    from pyspark.sql import functions as F

    from same_same_spark.index.build import build_index, compact_deltas
    from same_same_spark.index.mutate import delete_docs
    from same_same_spark.index.query import search_batch

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    extra = docs.filter(F.col("doc_id") % 2 == 1).limit(40)

    idx = str(tmp_path / "idx")
    build_index(base, idx, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    queries = [(0, "fast merge join sort"), (1, "spark query data window")]
    hit = search_batch(spark, idx, queries, k=10).collect()
    victims = sorted({r["doc_id"] for r in hit if r["rank"] <= 2})
    delete_docs(spark, idx, victims, log=lambda *_: None)

    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "d.json"), "w") as f:
        for r in extra.select("doc_id", "text").collect():
            f.write(_json.dumps(
                {"doc_id": r["doc_id"], "content": r["text"]}) + "\n")
    stream = spark.readStream.schema("doc_id LONG, content STRING").json(src)
    q = stream_doc_ingest(stream, idx, checkpoint_dir=str(tmp_path / "ck"),
                          num_buckets=4)
    q.awaitTermination(120)
    compact_deltas(spark, idx, log=lambda *_: None)

    fresh = str(tmp_path / "fresh")
    survivors = base.filter(~F.col("doc_id").isin(victims)).unionByName(extra)
    build_index(survivors, fresh, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)

    def canon(rows_):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in rows_
        )

    got = canon(search_batch(spark, idx, queries, k=10).collect())
    want = canon(search_batch(spark, fresh, queries, k=10).collect())
    assert got == want


def _mini_streamed_index(spark, tmp_path, tag):
    """Small index + one staged delta batch, NOT yet compacted."""
    import json as _json

    from same_same_spark.index.build import build_index

    base = [(1, "alpha bravo charlie"), (2, "bravo delta echo alpha")]
    delta = [(3, "charlie foxtrot golf"), (4, "alpha golf hotel")]
    idx = str(tmp_path / f"idx_{tag}")
    build_index(
        spark.createDataFrame(base, "doc_id LONG, text STRING"), idx,
        id_col="doc_id", text_col="text", num_buckets=2, log=lambda *_: None,
    )
    src = str(tmp_path / f"src_{tag}")
    os.makedirs(src)
    with open(os.path.join(src, "d.json"), "w") as f:
        for did, text in delta:
            f.write(_json.dumps({"doc_id": did, "content": text}) + "\n")
    stream = spark.readStream.schema("doc_id LONG, content STRING").json(src)
    q = stream_doc_ingest(stream, idx,
                          checkpoint_dir=str(tmp_path / f"ck_{tag}"),
                          num_buckets=2)
    q.awaitTermination(120)
    return idx


def test_compact_recovers_from_crash_windows(spark, tmp_path):
    """compact_deltas' commit ordering survives a crash at every window:
    (a) orphan group dir without lineage -> replaced and refolded;
    (b) lineage written but manifest flip lost -> commit finished;
    (c) manifest flipped but archive lost -> batches archived, never
    double-folded. Each end state equals the uninterrupted fold."""
    import glob
    import shutil

    from same_same_spark.index.build import IndexManifest, compact_deltas
    from same_same_spark.index.query import search_batch

    def state(idx):
        m = IndexManifest.load(idx)
        rows = search_batch(spark, idx, [(0, "alpha golf")], k=10).collect()
        return (
            m.n_docs, m.n_postings, sorted(m.groups),
            sorted((r["doc_id"], round(r["score"], 9)) for r in rows),
        )

    # reference: uninterrupted fold
    ref_idx = _mini_streamed_index(spark, tmp_path, "ref")
    compact_deltas(spark, ref_idx, log=lambda *_: None)
    want = state(ref_idx)

    # (a) orphan dir, no lineage record
    idx = _mini_streamed_index(spark, tmp_path, "a")
    orphan = os.path.join(idx, "shards", "group-0001")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("partial")
    compact_deltas(spark, idx, log=lambda *_: None)
    assert state(idx)[:2] == want[:2] and state(idx)[3] == want[3]

    # (b) lineage + group dir exist, manifest flip lost
    idx = _mini_streamed_index(spark, tmp_path, "b")
    pre_manifest = open(os.path.join(idx, "manifest.json")).read()
    compact_deltas(spark, idx, log=lambda *_: None)
    # rewind: restore pre-fold manifest, un-archive batches
    with open(os.path.join(idx, "manifest.json"), "w") as f:
        f.write(pre_manifest)
    done = os.path.join(idx, "_stage", "deltas_compacted")
    for b in glob.glob(os.path.join(done, "batch-*")):
        os.replace(b, os.path.join(idx, "_stage", "deltas",
                                   os.path.basename(b)))
    m = compact_deltas(spark, idx, log=lambda *_: None)
    assert state(idx)[:2] == want[:2] and state(idx)[3] == want[3]
    assert not glob.glob(os.path.join(idx, "_stage", "deltas", "batch-*"))

    # (c) manifest flipped, archive lost
    idx = _mini_streamed_index(spark, tmp_path, "c")
    compact_deltas(spark, idx, log=lambda *_: None)
    done = os.path.join(idx, "_stage", "deltas_compacted")
    for b in glob.glob(os.path.join(done, "batch-*")):
        os.replace(b, os.path.join(idx, "_stage", "deltas",
                                   os.path.basename(b)))
    n_before = IndexManifest.load(idx).n_docs
    compact_deltas(spark, idx, log=lambda *_: None)
    assert IndexManifest.load(idx).n_docs == n_before  # no double-fold
    assert state(idx)[:2] == want[:2] and state(idx)[3] == want[3]
    assert not glob.glob(os.path.join(idx, "_stage", "deltas", "batch-*"))


def test_compaction_consumes_pending_batches_before_renaming_groups(
    spark, tmp_path
):
    """Reviewer repro: archive-window crash, then a tombstone compaction
    folds the delta group away. Recovery must archive the pending
    batches BEFORE the rename so the next fold cannot double-count."""
    import glob

    from same_same_spark.index.build import IndexManifest, compact_deltas
    from same_same_spark.index.mutate import delete_docs, rewrite_compacted
    from same_same_spark.index.query import search_batch

    idx = _mini_streamed_index(spark, tmp_path, "dd")
    compact_deltas(spark, idx, log=lambda *_: None)
    n0 = IndexManifest.load(idx).n_docs
    # simulate the archive-window crash: batches back into deltas/
    done = os.path.join(idx, "_stage", "deltas_compacted")
    for b in glob.glob(os.path.join(done, "batch-*")):
        os.replace(b, os.path.join(idx, "_stage", "deltas",
                                   os.path.basename(b)))
    # tombstone compaction renames every group — recovery inside it
    # must consume the pending batches first
    delete_docs(spark, idx, [1], log=lambda *_: None)
    rewrite_compacted(spark, idx, log=lambda *_: None)
    assert not glob.glob(os.path.join(idx, "_stage", "deltas", "batch-*"))
    m = compact_deltas(spark, idx, log=lambda *_: None)  # nothing to fold
    assert m.n_docs == n0 - 1  # no double-count, one deleted
    rows = search_batch(spark, idx, [(0, "alpha golf")], k=10).collect()
    assert 1 not in {r["doc_id"] for r in rows}
    assert {r["doc_id"] for r in rows} <= {2, 3, 4}


def test_checkpoint_reset_same_batch_names_not_mistaken_as_archived(
    spark, tmp_path
):
    """A fresh stream after a checkpoint reset reuses batch names; the
    content token must keep recovery from archiving the NEW batches
    unfolded (they'd be silently lost)."""
    import glob
    import json as _json
    import shutil

    from same_same_spark.index.build import IndexManifest, compact_deltas

    idx = _mini_streamed_index(spark, tmp_path, "tok")
    compact_deltas(spark, idx, log=lambda *_: None)
    n0 = IndexManifest.load(idx).n_docs
    # operator purges the archive AND resets the checkpoint
    shutil.rmtree(os.path.join(idx, "_stage", "deltas_compacted"))
    src = str(tmp_path / "src_tok2")
    os.makedirs(src)
    with open(os.path.join(src, "d.json"), "w") as f:
        for did, text in ((7, "india juliet alpha"), (8, "kilo lima")):
            f.write(_json.dumps({"doc_id": did, "content": text}) + "\n")
    stream = spark.readStream.schema("doc_id LONG, content STRING").json(src)
    q = stream_doc_ingest(stream, idx,
                          checkpoint_dir=str(tmp_path / "ck_tok2"),
                          num_buckets=2)
    q.awaitTermination(120)
    # the new stream re-created batch-000000 with NEW content
    assert glob.glob(os.path.join(idx, "_stage", "deltas", "batch-000000"))
    m = compact_deltas(spark, idx, log=lambda *_: None)
    assert m.n_docs == n0 + 2  # folded, not silently archived


def test_tokenless_lineage_never_covers_pending_batches(spark, tmp_path):
    """ADVICE r2: a lineage record written BEFORE the token protocol
    (no batch_tokens) must not claim same-named pending batches — after
    a checkpoint reset those are NEW data, and archiving them unfolded
    would silently lose documents. Recovery requires a POSITIVE token
    match; legacy interrupted folds simply refold."""
    import glob
    import json as _json
    import shutil

    from same_same_spark.index.build import IndexManifest, compact_deltas

    idx = _mini_streamed_index(spark, tmp_path, "legacy")
    compact_deltas(spark, idx, log=lambda *_: None)
    n0 = IndexManifest.load(idx).n_docs
    # age the lineage record to the pre-token era
    for rec_path in glob.glob(os.path.join(idx, "_lineage", "group-*.json")):
        with open(rec_path) as f:
            rec = _json.load(f)
        if rec.get("kind") == "delta-compaction":
            rec.pop("batch_tokens", None)
            with open(rec_path, "w") as f:
                _json.dump(rec, f)
    # operator purges the archive AND resets the checkpoint; the fresh
    # stream reuses batch-000000 for genuinely new documents
    shutil.rmtree(os.path.join(idx, "_stage", "deltas_compacted"))
    src = str(tmp_path / "src_legacy2")
    os.makedirs(src)
    with open(os.path.join(src, "d.json"), "w") as f:
        for did, text in ((9, "mike november oscar"), (10, "papa quebec")):
            f.write(_json.dumps({"doc_id": did, "content": text}) + "\n")
    stream = spark.readStream.schema("doc_id LONG, content STRING").json(src)
    q = stream_doc_ingest(stream, idx,
                          checkpoint_dir=str(tmp_path / "ck_legacy2"),
                          num_buckets=2)
    q.awaitTermination(120)
    assert glob.glob(os.path.join(idx, "_stage", "deltas", "batch-000000"))
    m = compact_deltas(spark, idx, log=lambda *_: None)
    assert m.n_docs == n0 + 2  # refolded as new data, not archived away


def test_legacy_committed_fold_with_tokenless_batch_archives(
    spark, tmp_path
):
    """ADVICE r3: a pre-token-protocol lineage record whose fold
    COMMITTED (group live in the manifest) but whose archive step
    crashed leaves a token-less pending batch. The strict
    positive-token rule would leave it unclaimed and a later
    compact_deltas would refold it, DUPLICATING its documents — for
    the legacy×legacy case the old archive behavior must survive
    (with a loud warning). A token-CARRYING pending batch is still
    never claimed by a legacy record
    (test_tokenless_lineage_never_covers_pending_batches)."""
    import glob
    import json as _json
    import shutil

    from same_same_spark.index.build import IndexManifest, compact_deltas

    idx = _mini_streamed_index(spark, tmp_path, "legarch")
    compact_deltas(spark, idx, log=lambda *_: None)
    n0 = IndexManifest.load(idx).n_docs
    # age the lineage record to the pre-token era
    for rec_path in glob.glob(os.path.join(idx, "_lineage", "group-*.json")):
        with open(rec_path) as f:
            rec = _json.load(f)
        if rec.get("kind") == "delta-compaction":
            rec.pop("batch_tokens", None)
            with open(rec_path, "w") as f:
                _json.dump(rec, f)
    # simulate the archive-step crash: the folded batch is back in
    # pending, and as a legacy-era batch it carries no content token
    done = glob.glob(
        os.path.join(idx, "_stage", "deltas_compacted", "batch-*")
    )
    assert done
    for d in done:
        dst = os.path.join(idx, "_stage", "deltas", os.path.basename(d))
        shutil.move(d, dst)
        tok = os.path.join(dst, "_batch_token")
        if os.path.exists(tok):
            os.remove(tok)
    warnings: list[str] = []
    m = compact_deltas(spark, idx, log=lambda *s: warnings.append(" ".join(map(str, s))))
    assert m.n_docs == n0  # archived, NOT refolded into duplicates
    assert not glob.glob(os.path.join(idx, "_stage", "deltas", "batch-*"))
    assert any("WARNING" in w and "token-less" in w for w in warnings)
