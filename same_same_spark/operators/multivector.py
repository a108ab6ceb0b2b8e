"""Late-interaction multi-vector scoring — the ColBERT MaxSim operator
(Khattab & Zaharia 2020; ES ships it as ``rank_vectors``).

A document is a BAG of vectors (passage/token embeddings — here any
relation with multiple rows per id), a query is a bag of vectors, and

    score(q, d) = Σ_{qv ∈ q} max_{dv ∈ d} sim(qv, dv)

— every query vector picks its best-matching document vector and the
contributions add. ``sim`` is the raw dot product (the ColBERT
default; inputs are normally L2-normalized upstream) or cosine
(``normalize=True``).

Pinned semantics (re-derived relationally in the duckdb twin):

- dimension-mismatched (qv, dv) pairs contribute ``0.0`` (the X5
  cosine rule; a mismatched pair can still lose the max to a matched
  one);
- NULL vector rows are dropped before scoring (a doc whose every
  vector is NULL never appears);
- documents with NO vector rows never appear;
- rank 1..k per query under ``(round(score, 9) DESC, id ASC)``.

Scale shape: the query bag is a bounded broadcast literal; the
max-then-sum fold is two grouped aggregations with map-side combine
keyed on (query, doc[, q_idx]) — never a per-doc window; the cut is
the bounded tournament. One scan of the vector relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.operators.topk import topk_per_query
from same_same_spark.operators.vector import _dot, cosine_col


def maxsim_topk(
    doc_vecs_df: DataFrame,
    queries: list[tuple[int, list[list[float]]]],
    k: int = 10,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    normalize: bool = False,
) -> DataFrame:
    """MaxSim top-k (see module pin). ``doc_vecs_df`` holds one row
    per (document, vector); ``queries`` = [(query_id, [vec, ...])].
    Returns (query_id INT, <id_col>, score DOUBLE, rank INT)."""
    if not queries or any(not vs for _q, vs in queries):
        raise ValueError("every query needs at least one vector")
    spark = doc_vecs_df.sparkSession
    qrows = [
        (int(qid), qi, [float(x) for x in qv])
        for qid, vecs in queries
        for qi, qv in enumerate(vecs)
    ]
    qdf = spark.createDataFrame(
        qrows, "query_id INT, q_idx INT, qvec ARRAY<DOUBLE>"
    )
    dv = F.col(vec_col).cast("array<double>")
    if normalize:
        sim = cosine_col(F.col("qvec"), dv)
    else:
        sim = F.when(
            F.size(F.col("qvec")) != F.size(dv), F.lit(0.0)
        ).otherwise(_dot(F.col("qvec"), dv))
    pairs = doc_vecs_df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), dv.alias(vec_col)
    ).crossJoin(F.broadcast(qdf)).select(
        "query_id", "doc_id", "q_idx", sim.alias("sim")
    )
    folded = (
        pairs.groupBy("query_id", "doc_id", "q_idx")
        .agg(F.max("sim").alias("best"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("best").alias("score"))
    )
    top = topk_per_query(folded, k)
    return top.select(
        "query_id", F.col("doc_id").alias(id_col), "score", "rank"
    )


def duckdb_maxsim_sql(
    table: str,
    queries: list[tuple[int, list[list[float]]]],
    k: int = 10,
    id_expr: str = "doc_id",
    vec_expr: str = "embedding",
    normalize: bool = False,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`maxsim_topk` (query bag as a VALUES
    table; sims via the list built-ins, mismatch guarded to 0)."""
    qrows = ", ".join(
        f"({int(qid)}, {qi}, CAST({[float(x) for x in qv]!r} AS DOUBLE[]))"
        for qid, vecs in queries
        for qi, qv in enumerate(vecs)
    )
    fn = "list_cosine_similarity" if normalize else "list_dot_product"
    sim = (
        f"CASE WHEN len(q.qvec) != len(d.dv) THEN 0.0 "
        f"ELSE {fn}(q.qvec, d.dv) END"
    )
    if normalize:
        # the X5 rule: zero-norm vectors score 0 rather than NULL/NaN
        sim = (
            f"CASE WHEN len(q.qvec) != len(d.dv) THEN 0.0 "
            f"WHEN list_dot_product(d.dv, d.dv) = 0.0 "
            f"  OR list_dot_product(q.qvec, q.qvec) = 0.0 THEN 0.0 "
            f"ELSE list_cosine_similarity(q.qvec, d.dv) END"
        )
    return f"""
WITH q(query_id, q_idx, qvec) AS (VALUES {qrows}),
d AS (
  SELECT {id_expr} AS doc_id, ({vec_expr})::DOUBLE[] AS dv FROM {table}
  WHERE ({vec_expr}) IS NOT NULL
),
pairs AS (
  SELECT q.query_id, d.doc_id, q.q_idx, {sim} AS sim
  FROM d CROSS JOIN q
),
folded AS (
  SELECT query_id, doc_id, sum(best) AS score FROM (
    SELECT query_id, doc_id, q_idx, max(sim) AS best
    FROM pairs GROUP BY 1, 2, 3
  ) GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score, row_number() OVER (
    PARTITION BY query_id ORDER BY round(score, 9) DESC, doc_id ASC
  ) AS rank
  FROM folded
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""
