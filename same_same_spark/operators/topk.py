"""Shuffle-safe top-k primitives under the engine's pinned total order
``(round(score, 9) DESC, doc_id ASC)``.

Both helpers avoid ``WindowExec`` entirely (VERDICT r2 items #3/#5):

- an UNPARTITIONED rank window logs ``No Partition Defined`` and runs
  single-task, and
- a ``partitionBy(query_id)`` window lands ALL of one query's matched
  docs on one task — the classic per-query scale hazard.

Instead the pinned order is encoded as a sortable struct key
``(0.0 - round(score, 9), doc_id)`` — ``0.0 - x`` rather than ``-x`` so
a zero score stays IEEE ``+0.0`` and struct comparison never sees the
``-0.0 < 0.0`` corner — and ranking happens via the JVM built-ins
``sort_array``/``slice``/``posexplode`` over explicitly bounded arrays.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Default fan-in for the salted tournament. Each (query, salt) task
# handles ~1/SALTS of a query's matched docs and emits at most k rows;
# the final per-query merge touches <= SALTS * k rows.
TOPK_SALTS = 32


def neg_rounded_score(score_col: Column) -> Column:
    """Ascending-sortable form of ``round(score, 9) DESC``."""
    return F.lit(0.0) - F.round(score_col, 9)


def round9_away_np(x):
    """numpy twin of the pinned rank rounding: round(x, 9) scaled to
    integers, ties AWAY from zero — Spark's/DuckDB's ROUND semantics
    (np.round is half-to-even and would diverge on exact .5e-9
    boundaries). ONE definition site; driver-side numpy rankers
    (mmr, streaming top-k) import it from here."""
    import numpy as np

    return np.sign(x) * np.floor(np.abs(x) * 1e9 + 0.5)


def prune_local_topk(scored: DataFrame, k: int) -> DataFrame:
    """Exact-safe per-Arrow-batch top-k pre-prune of (query_id, doc_id,
    score) rows under the pinned order — run BEFORE any shuffle so the
    wire carries ≤ batches·queries·k rows instead of every match.

    Correct because a batch is a subset of its partition and the
    global top-k is a subset of the union of local top-ks under the
    same total order. The sort key ``nk = 0.0 - round(score, 9)`` is
    computed JVM-SIDE and shipped through Arrow: Spark's ``round`` is
    HALF_UP while ``np.round`` is banker's rounding, and a prune under
    a key that rounds differently at a tie boundary could drop a row
    the final order ranks inside the top-k.

    ``doc_id`` must be non-null (true for every scorer in this
    engine); NULL scores are ordered FIRST like Spark's ascending
    struct sort of their NULL key, so both prune paths agree on them.
    """
    import numpy as np
    import pyarrow as pa

    key = "__topk_nk"  # collision-safe: passthrough columns survive
    with_key = scored.withColumn(key, neg_rounded_score(F.col("score")))
    out_schema = with_key.schema

    def prune(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if b.num_rows == 0:
                continue
            qid = b.column("query_id").to_numpy(zero_copy_only=False)
            did = b.column("doc_id").to_numpy(zero_copy_only=False)
            col = b.column(key)
            nk = col.to_numpy(zero_copy_only=False)
            if col.null_count:
                # NULL sorts FIRST in Spark's ascending order; numpy
                # would turn it into NaN (sorts LAST) — substitute -inf
                nk = np.where(
                    col.is_null().to_numpy(zero_copy_only=False),
                    -np.inf, nk,
                )
            order = np.lexsort((did, nk, qid))
            q_sorted = qid[order]
            starts = np.flatnonzero(
                np.r_[True, q_sorted[1:] != q_sorted[:-1]]
            )
            sizes = np.diff(np.r_[starts, len(order)])
            ranks = np.arange(len(order)) - np.repeat(starts, sizes)
            keep = np.sort(order[ranks < k])
            yield b.take(pa.array(keep))

    return with_key.mapInArrow(prune, out_schema).drop(key)


def topk_per_query(
    scored: DataFrame,
    k: int,
    salts: int = TOPK_SALTS,
    arrow_prune: bool = True,
) -> DataFrame:
    """Exact top-k + rank per ``query_id``, with no single-task-per-query
    stage and no aggregation buffer proportional to a query's total
    match count.

    Input: (query_id, doc_id, score). Output: (query_id, doc_id, score,
    rank INT), rank 1..k per query under the pinned order.

    Three-level tournament (correct at every level because the global
    top-k is a subset of the union of local top-ks under the same total
    order, for ANY grouping of the input):

    1. group by (query, ``spark_partition_id()``) — every group's rows
       live in a single input partition, so the ``collect_list`` buffer
       holds at most ONE INPUT PARTITION's matches for one query. For
       the shuffle-output inputs the callers feed this, that is
       ``matches / spark.sql.shuffle.partitions`` — it shrinks with the
       partition count (the standard Spark sizing lever; size P so a
       partition fits executor memory), unlike the replaced
       ``partitionBy(query_id)`` window whose single task held a
       query's ENTIRE match list at any P. Each group keeps its best k;
    2. group the level-1 survivors by (query, part % salts) — buffers
       hold ≤ ceil(parts / salts) · k already-pruned entries;
    3. per-query merge of ≤ salts · k survivors.

    With ``arrow_prune`` (default) a :func:`prune_local_topk` stage
    runs BEFORE level 1, so the first shuffle carries only
    ≤ batches·queries·k pre-pruned rows instead of every matched row,
    and the level-1 buffers shrink to the same bound. (Without it the
    first shuffle carries every match once and level-1 buffers hold up
    to one input partition's matches for a query.) No single
    aggregation buffer and no single task ever materializes one
    query's full match list either way. Tournament levels are
    ``collect_list`` + ``sort_array`` + ``slice``/``flatten`` — JVM
    built-ins, no ``WindowExec``.
    """
    if arrow_prune:
        scored = prune_local_topk(scored, k)
    entry = F.struct(
        neg_rounded_score(F.col("score")).alias("nk"),
        F.col("doc_id").alias("doc_id"),
        F.col("score").alias("score"),
    )
    local = (
        scored.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "part")
        .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, k).alias("cand"))
        .withColumn("salt", F.pmod(F.col("part"), F.lit(salts)).cast("int"))
        .groupBy("query_id", "salt")
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("cand"))), 1, k
            ).alias("cand")
        )
    )
    merged = local.groupBy("query_id").agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("cand"))), 1, k
        ).alias("top")
    )
    return merged.select(
        "query_id", F.posexplode("top").alias("pos", "s")
    ).select(
        "query_id",
        F.col("s.doc_id").alias("doc_id"),
        F.col("s.score").alias("score"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


def search_after(
    scored: DataFrame,
    cursor_df: DataFrame,
    k: int,
    salts: int = TOPK_SALTS,
) -> DataFrame:
    """Keyset pagination under the pinned total order (Elasticsearch's
    ``search_after``): the next k rows STRICTLY AFTER a per-query
    cursor, without re-ranking the rows already served.

    ``scored``: (query_id, doc_id, score) — the full match set (e.g.
    :func:`same_same_spark.bm25.scored_matches`).
    ``cursor_df``: (query_id, after_score, after_doc_id) — the LAST row
    of the previous page; queries absent from the cursor table produce
    no rows (a page can only follow a full previous page).

    Returns (query_id, doc_id, score, rank) with rank 1..k WITHIN the
    page. Deterministic because the pinned order
    ``(round(score, 9) DESC, doc_id ASC)`` is total: the page equals
    offset ranks k+1..2k of a full re-rank — the identity the oracle
    differential pins — while costing one broadcast-join filter plus a
    tournament over only the remaining rows (never an OFFSET scan, the
    classic deep-paging trap).
    """
    cursor = cursor_df.select(
        "query_id",
        F.round(F.col("after_score"), 9).alias("__after_nk"),
        F.col("after_doc_id").alias("__after_id"),
    )
    flt = (
        scored.join(F.broadcast(cursor), "query_id")
        .filter(
            (F.round(F.col("score"), 9) < F.col("__after_nk"))
            | (
                (F.round(F.col("score"), 9) == F.col("__after_nk"))
                & (F.col("doc_id") > F.col("__after_id"))
            )
        )
        .drop("__after_nk", "__after_id")
    )
    return topk_per_query(flt, k, salts=salts)
