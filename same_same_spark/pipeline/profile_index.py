"""Index-fed incremental dataset card (VERDICT r3 #6): the corpus's
token-length statistics derived from the inverted index's OWN doclen
tables on append/delete — no batch rescan, no second tokenization
pass.

:mod:`same_same_spark.pipeline.profile` maintains a card by folding
document batches; when the corpus already flows through the index
(streamed ingest, upserts, deletes), every fold re-tokenizes text the
index has already tokenized. This store instead treats the index as
the source of truth and syncs against its manifest:

- per committed shard group, one ``(group, dl, cnt)`` length histogram
  decoded from the group's doclen rows (``kind='d'``: varint doc-id
  deltas + varint doc lengths, ``index/codec.py``) — decoded ONCE per
  group, ever;
- sync = set-diff the store's group list against the index manifest's:
  added groups are decoded and folded in, removed groups' rows are
  dropped from state (group names are never reused — the manifest's
  monotonic ``next_grp`` allocator, ``index/build.py:107-112`` — so
  the name IS the content identity);
- tombstones: when the manifest says deletes are live
  (``has_tombstones`` + ``tomb_gen``), sync materializes one negative
  ``(dl, cnt)`` adjustment for the tombstoned ids (one decode pass
  filtered to the deleted-id set, the same cost shape as the delete's
  own measure pass) keyed by ``tomb_gen``; compaction clears the flag
  and the adjustment disappears with it.

State flips under the same commit discipline as the batch profile
store: state parquet lands under ``<table>-<gen>`` BEFORE one atomic
manifest rename, stale generations swept after. ``dl`` here is the
INDEX tokenizer's document length (X1 tokens), not whitespace tokens —
the card is the index's view of the corpus, rank-consistent with
BM25's avgdl.

Scale shape: sync cost is O(changed groups + tombstoned ids), card
cost is O(distinct lengths) — both independent of corpus size. At
100 TB the index is maintained anyway; the card rides its lineage for
free instead of paying a second 100-TB tokenization.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from same_same_spark.index import codec
from same_same_spark.index.build import IndexManifest

_MANIFEST = "profile_index.json"
_TABLES = ("hist", "tomb")

__all__ = [
    "index_profile_init",
    "index_profile_sync",
    "index_profile_card",
]


def _gen_dir(store_dir: str, table: str, gen: int) -> str:
    return os.path.join(store_dir, f"{table}-{gen:06d}")


def _load(store_dir: str) -> dict:
    with open(os.path.join(store_dir, _MANIFEST)) as f:
        return json.load(f)


def _flip(store_dir: str, manifest: dict) -> None:
    tmp = os.path.join(store_dir, f".{_MANIFEST}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(store_dir, _MANIFEST))


def _sweep(store_dir: str, live_gen: int) -> None:
    for table in _TABLES:
        for d in glob.glob(os.path.join(store_dir, f"{table}-*")):
            if d != _gen_dir(store_dir, table, live_gen):
                shutil.rmtree(d, ignore_errors=True)


def _group_hist(
    spark: SparkSession,
    index_dir: str,
    groups: list[str],
    deleted: np.ndarray | None = None,
) -> DataFrame:
    """``(group, dl, cnt)`` decoded from the groups' doclen rows; with
    ``deleted`` (sorted int64 ids) counts ONLY those docs — the
    tombstone-adjustment shape."""
    schema = "group STRING, dl LONG, cnt LONG"
    if not groups:
        return spark.createDataFrame([], schema)
    # ONE multi-path relation, group recovered from the file path — a
    # hundred-group sync stays a flat scan, not a hundred-relation
    # union tree (the O(changed groups) claim includes plan size)
    paths = [
        os.path.join(index_dir, "shards", f"group-{g}") for g in groups
    ]
    rows = (
        spark.read.parquet(*paths)
        .withColumn(
            "group",
            F.regexp_extract(
                F.input_file_name(), r"group-([^/]+)/[^/]*$", 1
            ),
        )
        .filter(F.col("kind") == "d")
        .select("group", "n", "doc_bytes", "tf_bytes")
    )

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parts = []
            for _, row in pdf.iterrows():
                n = int(row["n"])
                dls = codec.varint_decode(
                    bytes(row["tf_bytes"]), n
                ).astype(np.int64)
                if deleted is not None:
                    ids = codec.decode_doc_ids(bytes(row["doc_bytes"]), n)
                    dls = dls[np.isin(ids, deleted)]
                if not len(dls):
                    continue
                vals, cnts = np.unique(dls, return_counts=True)
                parts.append(
                    pd.DataFrame(
                        {
                            "group": row["group"],
                            "dl": vals,
                            "cnt": cnts.astype(np.int64),
                        }
                    )
                )
            yield (
                pd.concat(parts)
                if parts
                else pd.DataFrame(
                    {"group": pd.Series(dtype=object),
                     "dl": pd.Series(dtype=np.int64),
                     "cnt": pd.Series(dtype=np.int64)}
                )
            )

    return (
        rows.mapInPandas(hist, schema)
        .groupBy("group", "dl")
        .agg(F.sum("cnt").alias("cnt"))
    )


def index_profile_init(
    spark: SparkSession, store_dir: str, index_dir: str
) -> None:
    """Create an empty index-fed profile store bound to ``index_dir``
    (generation 0, no groups applied — the first sync folds the whole
    current manifest)."""
    os.makedirs(store_dir, exist_ok=True)
    spark.createDataFrame([], "group STRING, dl LONG, cnt LONG")\
        .write.mode("overwrite").parquet(_gen_dir(store_dir, "hist", 0))
    spark.createDataFrame([], "dl LONG, cnt LONG")\
        .write.mode("overwrite").parquet(_gen_dir(store_dir, "tomb", 0))
    _flip(
        store_dir,
        {
            "version": 1,
            "generation": 0,
            "index_dir": os.path.abspath(index_dir),
            "groups": [],
            "tomb_gen_applied": None,  # None = no adjustment live
        },
    )


def index_profile_sync(
    spark: SparkSession, store_dir: str, log=print
) -> dict:
    """Fold index changes since the last sync into the store: decode
    ADDED groups, drop REMOVED groups' state rows, refresh the
    tombstone adjustment iff the tombstone generation moved. No-ops
    cheaply (manifest reads only) when nothing changed. Returns a
    report ``{"added": [...], "removed": [...], "tomb_applied": ...}``.
    """
    m = _load(store_dir)
    index_dir = m["index_dir"]
    idx = IndexManifest.load(index_dir)
    have = set(m["groups"])
    want = set(idx.groups)
    added = sorted(want - have)
    removed = sorted(have - want)

    tomb_key = idx.tomb_gen if idx.has_tombstones else None
    tomb_changed = tomb_key != m["tomb_gen_applied"]
    if not added and not removed and not tomb_changed:
        log("[profile-index] up to date")
        return {"added": [], "removed": [], "tomb_applied": tomb_key}

    gen, new_gen = m["generation"], m["generation"] + 1
    _sweep(store_dir, gen)

    hist = spark.read.parquet(_gen_dir(store_dir, "hist", gen))
    if removed:
        hist = hist.filter(~F.col("group").isin(removed))
    if added:
        hist = hist.unionByName(_group_hist(spark, index_dir, added))
    hist.write.mode("overwrite").parquet(_gen_dir(store_dir, "hist", new_gen))

    if tomb_changed and tomb_key is not None:
        from same_same_spark.index.mutate import load_tombstones

        tomb = load_tombstones(index_dir)
        adj = (
            _group_hist(
                spark, index_dir, sorted(want), deleted=tomb["ids"]
            )
            .groupBy("dl")
            .agg(F.sum("cnt").alias("cnt"))
            if tomb is not None and tomb["n_removed"]
            else None
        )
    elif tomb_key is not None:
        adj = spark.read.parquet(_gen_dir(store_dir, "tomb", gen))
    else:
        adj = None
    if adj is None:
        adj = spark.createDataFrame([], "dl LONG, cnt LONG")
    adj.write.mode("overwrite").parquet(_gen_dir(store_dir, "tomb", new_gen))

    m.update(
        generation=new_gen, groups=sorted(want), tomb_gen_applied=tomb_key
    )
    _flip(store_dir, m)
    _sweep(store_dir, new_gen)
    log(
        f"[profile-index] gen {gen} -> {new_gen}: +{len(added)} groups, "
        f"-{len(removed)}, tomb_gen={tomb_key}"
    )
    return {"added": added, "removed": removed, "tomb_applied": tomb_key}


def index_profile_card(spark: SparkSession, store_dir: str) -> DataFrame:
    """One-row card over the index's surviving corpus:
    ``(n_docs, total_dl, mean_dl, p50_dl, p90_dl)`` with Spark's exact
    ``percentile`` interpolation re-derived from the histogram — equal,
    value for value, to recomputing over the corpus the index currently
    serves (tombstones subtracted). O(distinct lengths) work."""
    from same_same_spark.pipeline.profile import (
        _hist_quantile_aggs,
        _hist_quantile_value,
    )

    m = _load(store_dir)
    gen = m["generation"]
    hist = (
        spark.read.parquet(_gen_dir(store_dir, "hist", gen))
        .groupBy("dl")
        .agg(F.sum("cnt").alias("cnt"))
    )
    tomb = spark.read.parquet(_gen_dir(store_dir, "tomb", gen)).select(
        "dl", (-F.col("cnt")).alias("cnt")
    )
    # The single-stratum key must be NON-foldable: Spark 4's
    # EliminateWindowPartitions strips a literal partition key, turning
    # the (bounded, O(distinct lengths)-row) windows below into
    # flagged unpartitioned windows. dl is never NULL (decoded int64),
    # so this is constant 'all' — but Catalyst can't fold it.
    eff = (
        hist.unionByName(tomb)
        .groupBy("dl")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") != 0)
        .withColumn(
            "stratum", F.when(F.col("dl").isNotNull(), F.lit("all"))
        )
    )
    w = (
        Window.partitionBy("stratum")
        .orderBy("dl")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("stratum").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = eff.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n_docs", F.sum("cnt").over(w_all)
    )
    pos50 = F.lit(1) + (F.col("n_docs") - 1) * F.lit(0.5)
    pos90 = F.lit(1) + (F.col("n_docs") - 1) * F.lit(0.9)
    return (
        h.groupBy("stratum")
        .agg(
            F.sum("cnt").alias("n_docs"),
            F.sum(F.col("dl") * F.col("cnt")).alias("total_dl"),
            *_hist_quantile_aggs(pos50, F.col("cum"), F.col("dl"), "p50"),
            *_hist_quantile_aggs(pos90, F.col("cum"), F.col("dl"), "p90"),
        )
        .select(
            "n_docs",
            "total_dl",
            (F.col("total_dl") / F.col("n_docs")).alias("mean_dl"),
            _hist_quantile_value("p50", "p50_dl"),
            _hist_quantile_value("p90", "p90_dl"),
        )
    )
