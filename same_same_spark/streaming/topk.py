"""Continuous kNN alerts — streaming per-query vector top-k.

A custom stateful streaming operator (the reference is batch-only;
this is the streaming face of the engine's vector search): register
query vectors once, stream document embeddings in, and per micro-batch
each query emits its UPDATED running cosine top-k over everything seen
so far — "tell me whenever something closer to my query arrives".

Pinned semantics (the batch-equivalence contract, pinned in
tests/test_stream_topk.py and entry:stream_vector_topk):

- per query, state is the running top-k under the engine's pinned ANN
  order ``(round(score, 9) DESC, id ASC)`` — rounding half-away-from-
  zero, the cross-engine ROUND;
- a micro-batch emits a query's CURRENT top-k rows (tagged with a
  monotonically increasing ``seq`` per query) iff the batch carried
  rows for it; the highest-``seq`` emission after the stream drains is
  rank- and score-identical to the batch brute-force top-k over the
  union of all batches — arrival order never matters;
- dimension-mismatched vectors are ignored (the batch rule).

Scale shape: scores compute map-side in the stream-static broadcast
join (no state touched); per-key state is EXACTLY k (id, score) pairs
— queries x k total, independent of stream length; keys are query ids
so state partitions uniformly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.operators.vector import cosine_col

_OUT = "query_id INT, vec_id LONG, score DOUBLE, rank INT, seq INT"
_STATE = "ids ARRAY<LONG>, scores ARRAY<DOUBLE>, seq INT"


def _round9_away(x: np.ndarray) -> np.ndarray:
    # the pinned rank rounding (one definition site: operators/topk)
    from same_same_spark.operators.topk import round9_away_np

    return round9_away_np(x)


def _merge_topk(
    ids: np.ndarray, scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    order = np.lexsort((ids, -_round9_away(scores)))[:k]
    return ids[order], scores[order]


def stream_vector_topk(
    vec_stream: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Streaming per-query running cosine top-k (see module pin).

    ``vec_stream`` is a streaming DataFrame of (id, embedding); the
    registered ``queries`` are static. Returns the streaming output
    (query_id, vec_id, score, rank, seq) in append mode.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = vec_stream.sparkSession
    qdf = spark.createDataFrame(
        [(qid, [float(x) for x in vec]) for qid, vec in queries],
        "query_id INT, qvec ARRAY<DOUBLE>",
    )
    scored = (
        vec_stream.select(
            F.col(id_col).alias("vec_id"),
            F.col(embedding_col).cast("array<double>").alias("emb"),
        )
        .join(F.broadcast(qdf))
        .filter(F.size("emb") == F.size("qvec"))
        .select(
            "query_id",
            "vec_id",
            cosine_col(F.col("emb"), F.col("qvec")).alias("score"),
        )
    )

    def topk_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return iter(())
        rows = pd.concat(batches, ignore_index=True)
        ids = rows["vec_id"].to_numpy(dtype=np.int64)
        scores = rows["score"].to_numpy(dtype=np.float64)
        if state.exists:
            old_ids, old_scores, seq = state.get
            ids = np.concatenate([np.asarray(old_ids, np.int64), ids])
            scores = np.concatenate(
                [np.asarray(old_scores, np.float64), scores]
            )
            seq = int(seq) + 1
        else:
            seq = 1
        top_ids, top_scores = _merge_topk(ids, scores, k)
        state.update((top_ids.tolist(), top_scores.tolist(), seq))
        out = pd.DataFrame(
            {
                "query_id": int(key[0]),
                "vec_id": top_ids,
                "score": top_scores,
                "rank": np.arange(1, len(top_ids) + 1, dtype=np.int32),
                "seq": np.int32(seq),
            }
        )
        return iter([out])

    return scored.groupBy("query_id").applyInPandasWithState(
        topk_fn,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_topk(emissions: DataFrame) -> DataFrame:
    """Reduce an append-mode emission log to each query's final top-k:
    keep the max-``seq`` rows per query. Join-free on purpose — a
    self-join of the same emission relation trips Spark 4's
    conflicting-attribute analyzer bug (the CLAUDE.md shard-read
    quirk); instead ONE bounded aggregate collects a query's emission
    log (<= k x batches rows by the operator's state contract) and
    filters it to the max seq in place."""
    s = F.struct("seq", "rank", "vec_id", "score")
    agg = emissions.groupBy("query_id").agg(
        F.max("seq").alias("mx"), F.collect_list(s).alias("rows")
    )
    return agg.select(
        "query_id",
        F.explode(
            F.filter("rows", lambda r: r["seq"] == F.col("mx"))
        ).alias("r"),
    ).select(
        "query_id",
        F.col("r.vec_id").alias("vec_id"),
        F.col("r.score").alias("score"),
        F.col("r.rank").alias("rank"),
    )
