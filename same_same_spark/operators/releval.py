"""Retrieval-quality evaluation — recall@k, MRR, nDCG per query.

A first-class engine feature the reference lacks: every approximate
path in this engine (LSH/IVF/HNSW/PQ/BQ tiers, pruned index search)
trades recall for speed, and an operator that MEASURES that trade
against an exact run is how a user tunes nprobe/ef/shortlist at scale.

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_retrieval_eval_sql`):

- inputs are two ranked result sets, (query_id, id, rank): the
  system under test and the truth (normally the exact scorer at the
  same k); relevance is BINARY membership in the truth set;
- ``recall`` = |result ids ∩ truth ids| / |truth ids|;
- ``mrr``    = 1 / (smallest result rank holding a truth id), 0 if
  none;
- ``ndcg``   = DCG / IDCG with binary gains: DCG = Σ 1/log2(1+rank)
  over result rows whose id is in truth; IDCG = Σ_{i=1..|truth|}
  1/log2(1+i) (the best achievable placing of every truth id);
- queries present in truth but absent from results score 0 on all
  three; queries absent from truth emit no rows (nothing to measure).

Returns (query_id INT, recall DOUBLE, mrr DOUBLE, ndcg DOUBLE).

Scale shape: both inputs are already bounded (k rows per query); the
join and aggregates touch queries x k rows. The expensive part is
PRODUCING the truth set — at 100 TB one exact run over a sampled
query set calibrates the approximate path for the fleet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retrieval_eval(
    results_df: DataFrame,
    truth_df: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query recall / MRR / nDCG of ``results_df`` against
    ``truth_df`` (both (query_id, id, rank) — see module pin)."""
    res = results_df.select(
        "query_id", F.col(id_col).alias("__id"), F.col("rank").alias("__r")
    )
    tru = truth_df.select(
        "query_id", F.col(id_col).alias("__id"),
        F.col("rank").alias("__tr"),
    )
    tstats = tru.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_truth"),
        # IDCG: truth sets are bounded (k rows) — the sum is exact
        F.sum(
            F.lit(1.0) / F.log2(F.lit(1.0) + F.col("__tr"))
        ).alias("idcg"),
    )
    hits = res.join(tru.select("query_id", "__id"), ["query_id", "__id"])
    hstats = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.min("__r").alias("first_r"),
        F.sum(F.lit(1.0) / F.log2(F.lit(1.0) + F.col("__r"))).alias("dcg"),
    )
    return (
        tstats.join(hstats, "query_id", "left")
        .select(
            "query_id",
            (
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_truth")
            ).cast("double").alias("recall"),
            F.coalesce(
                F.lit(1.0) / F.col("first_r"), F.lit(0.0)
            ).cast("double").alias("mrr"),
            (
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")
            ).cast("double").alias("ndcg"),
        )
    )


def duckdb_retrieval_eval_sql(
    results_sql: str,
    truth_sql: str,
    id_col: str = "vec_id",
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`retrieval_eval` over two full SELECTs
    producing (query_id, {id_col}, rank)."""
    return f"""
WITH res AS ({results_sql}),
tru AS ({truth_sql}),
tstats AS (
  SELECT query_id, count(*) AS n_truth,
         sum(1.0 / log2(1.0 + rank)) AS idcg
  FROM tru GROUP BY query_id
),
hits AS (
  SELECT r.query_id, r.rank
  FROM res r JOIN tru t
    ON r.query_id = t.query_id AND r.{id_col} = t.{id_col}
),
hstats AS (
  SELECT query_id, count(*) AS n_hit, min(rank) AS first_r,
         sum(1.0 / log2(1.0 + rank)) AS dcg
  FROM hits GROUP BY query_id
)
SELECT t.query_id,
       round(coalesce(h.n_hit, 0)::DOUBLE / t.n_truth, {round_score})
         AS recall,
       round(coalesce(1.0 / h.first_r, 0.0), {round_score}) AS mrr,
       round(coalesce(h.dcg, 0.0) / t.idcg, {round_score}) AS ndcg
FROM tstats t LEFT JOIN hstats h USING (query_id)
"""
