"""Maximal Marginal Relevance (MMR) result diversification.

A beyond-reference retrieval feature (Carbonell & Goldstein, SIGIR
1998; Elasticsearch/vector-DB "diversified" retrieval): re-rank a
relevance-ordered candidate pool so each pick balances query relevance
against redundancy with what was already picked —

    mmr(d) = lam * cos(q, d) - (1 - lam) * max_{s in S} cos(d, s)

with ``S`` the already-selected set (empty-set penalty = 0, so the
first pick is the pure-relevance argmax).

Pinned semantics (cross-engine, re-derived in :func:`duckdb_mmr_sql`,
which unrolls the k greedy steps as chained CTEs):

- the candidate pool is the exact cosine top-``pool`` per query under
  the engine's pinned order ``(round(score, 9) DESC, id ASC)``;
- greedy selection: k steps, each picking the remaining candidate with
  max mmr under ``(round(mmr, 9) DESC, id ASC)`` — rounding is
  half-away-from-zero on BOTH engines (numpy's half-even is NOT used);
- a pool smaller than k yields that many rows (never pads);
- ``lam`` in [0, 1]; output rank = selection step (1-based); the
  reported score is the pick's mmr value at selection time.

Scale shape: the distributed work is candidate generation (here exact
cosine via the verified brute path; any ANN probe can feed the same
pool contract). The greedy re-rank is inherently sequential in k but
runs over a BOUNDED pool (<= ``pool`` rows per query), so it executes
as one Arrow ``applyInPandas`` per query group — thousands of queries
re-rank in parallel, each in O(pool * k) with an O(pool) frontier (no
pool x pool matrix is materialized). At 100 TB the pool feed is the
partition-pruned ANN store probe; this operator's cost is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.operators.topk import topk_per_query
from same_same_spark.operators.vector import cosine_col

_OUT_SCHEMA = "query_id INT, vec_id LONG, score DOUBLE, rank INT"


def _round9_away(x: np.ndarray) -> np.ndarray:
    """The pinned rank rounding (one definition site: operators/topk
    .round9_away_np)."""
    from same_same_spark.operators.topk import round9_away_np

    return round9_away_np(x)


def _greedy_mmr(pdf: pd.DataFrame, lam: float, k: int) -> pd.DataFrame:
    """One query's greedy selection over its (bounded) candidate pool."""
    # Deterministic candidate order: id ASC so argmax ties resolve to
    # the smallest id via first-occurrence argmax.
    pdf = pdf.sort_values("vec_id", kind="mergesort").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy()
    rel = pdf["rel"].to_numpy(dtype=np.float64)
    emb = np.asarray([np.asarray(e, dtype=np.float64) for e in pdf["emb"]])
    norms = np.linalg.norm(emb, axis=1)
    qid = int(pdf["query_id"].iloc[0])

    n = len(ids)
    alive = np.ones(n, dtype=bool)
    # Running frontier: max cosine to the selected set, per candidate.
    pen = np.zeros(n, dtype=np.float64)
    picks: list[tuple[int, int, float, int]] = []
    for step in range(1, min(k, n) + 1):
        mmr = lam * rel - (1.0 - lam) * pen if step > 1 else lam * rel
        key = np.where(alive, _round9_away(mmr), -np.inf)
        best = int(np.argmax(key))  # first occurrence = smallest id
        picks.append((qid, int(ids[best]), float(mmr[best]), step))
        alive[best] = False
        # Fold the new pick into every survivor's frontier.
        denom = norms * norms[best]
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.where(denom > 0.0, emb @ emb[best] / denom, 0.0)
        pen = np.maximum(pen, sims)
    return pd.DataFrame(
        picks, columns=["query_id", "vec_id", "score", "rank"]
    )


def mmr_topk(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Diversified top-k: exact cosine top-``pool`` candidates per
    query, greedily re-ranked by MMR.

    Returns (query_id INT, vec_id LONG, score DOUBLE, rank INT) with
    rank = selection order and score = the pick's mmr value.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if k > pool:
        raise ValueError(f"k={k} exceeds the candidate pool={pool}")
    spark = df.sparkSession
    e = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(embedding_col).cast("array<double>").alias("emb"),
    )
    qdf = spark.createDataFrame(
        [(qid, [float(x) for x in vec]) for qid, vec in queries],
        "query_id INT, qvec ARRAY<DOUBLE>",
    )
    scored = (
        e.crossJoin(F.broadcast(qdf))
        .filter(F.size("emb") == F.size("qvec"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            cosine_col(F.col("emb"), F.col("qvec")).alias("score"),
        )
    )
    cands = topk_per_query(scored, pool).select(
        "query_id",
        F.col("doc_id").alias("vec_id"),
        F.col("score").alias("rel"),
    )
    # cands is bounded (queries x pool rows) — broadcast it against the
    # full vector table to fetch pool embeddings without a shuffle.
    with_emb = e.join(F.broadcast(cands), "vec_id").select(
        "query_id", "vec_id", "rel", "emb"
    )
    return with_emb.groupBy("query_id").applyInPandas(
        lambda pdf: _greedy_mmr(pdf, float(lam), int(k)), _OUT_SCHEMA
    )


def duckdb_mmr_sql(
    table: str,
    query_ids: list[int],
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`mmr_topk` — the k greedy steps UNROLLED as
    chained CTEs (pick1..pickK), each an argmax over the remaining pool
    with the penalty re-derived as ``max(sim to the selected set)`` via
    a plain aggregate; selection therefore cannot share any code with
    the Spark-side frontier loop.

    Query vectors come FROM the table by id (the _SQL_ANN_BRUTE
    convention — oracle strings are built without a live session)."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if k > pool:
        raise ValueError(f"k={k} exceeds the candidate pool={pool}")
    lam = float(lam)
    id_list = ", ".join(str(int(q)) for q in query_ids)
    steps = []
    for t in range(2, k + 1):
        steps.append(f"""sel{t - 1} AS (
  {" UNION ALL ".join(f"SELECT query_id, vec_id FROM pick{s}" for s in range(1, t))}
),
pen{t} AS (
  SELECT s.query_id, s.a AS vec_id, max(s.sim) AS pen
  FROM sims s
  JOIN sel{t - 1} l ON l.query_id = s.query_id AND l.vec_id = s.b
  GROUP BY 1, 2
),
cand{t} AS (
  SELECT p.query_id, p.vec_id,
         {lam!r} * p.rel - (1.0 - {lam!r}) * n.pen AS score
  FROM pool p
  JOIN pen{t} n ON n.query_id = p.query_id AND n.vec_id = p.vec_id
  WHERE NOT EXISTS (
    SELECT 1 FROM sel{t - 1} l
    WHERE l.query_id = p.query_id AND l.vec_id = p.vec_id
  )
),
pick{t} AS (
  SELECT query_id, vec_id, score, {t} AS rank FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY round(score, 9) DESC, vec_id ASC
    ) AS rn FROM cand{t}
  ) WHERE rn = 1
)""")
    step_sql = ",\n".join(steps)
    picks_union = "\n  UNION ALL\n  ".join(
        f"SELECT * FROM pick{t}" for t in range(1, k + 1)
    )
    return f"""
WITH q AS (
  SELECT {id_col}::INTEGER AS query_id, {embedding_col}::DOUBLE[] AS qv
  FROM {table} WHERE {id_col} IN ({id_list})
),
rel AS (
  SELECT q.query_id, e.{id_col} AS vec_id,
         list_cosine_similarity(e.{embedding_col}::DOUBLE[], q.qv) AS rel
  FROM {table} e, q
  WHERE len(e.{embedding_col}) = len(q.qv)
),
pool AS (
  SELECT query_id, vec_id, rel FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY round(rel, 9) DESC, vec_id ASC
    ) AS rn FROM rel
  ) WHERE rn <= {pool}
),
sims AS (
  SELECT p1.query_id, p1.vec_id AS a, p2.vec_id AS b,
         list_cosine_similarity(
           e1.{embedding_col}::DOUBLE[], e2.{embedding_col}::DOUBLE[]
         ) AS sim
  FROM pool p1
  JOIN pool p2 ON p1.query_id = p2.query_id AND p1.vec_id <> p2.vec_id
  JOIN {table} e1 ON e1.{id_col} = p1.vec_id
  JOIN {table} e2 ON e2.{id_col} = p2.vec_id
),
pick1 AS (
  SELECT query_id, vec_id, score, 1 AS rank FROM (
    SELECT query_id, vec_id, {lam!r} * rel AS score, row_number() OVER (
      PARTITION BY query_id ORDER BY round({lam!r} * rel, 9) DESC, vec_id ASC
    ) AS rn FROM pool
  ) WHERE rn = 1
),
{step_sql}
SELECT query_id, vec_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank
FROM (
  {picks_union}
)
"""
