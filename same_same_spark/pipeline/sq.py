"""SQ8 scalar quantization — 4× vector compression with per-dim codes.

The third member of the engine's compressed-vector family (PQ/OPQ
sub-quantize blocks of dims; SQ8 — faiss's ``ScalarQuantizer`` QT_8bit
shape — quantizes each dimension independently to one byte). It is the
standard cheap tier: no codebook training, exact per-dim bounds, and a
decode that is two fused multiply-adds — the right first compression
step before PQ at 100 TB, and what vector stores ship as "int8".

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_sq_topk_sql`):

- trainer: per-dimension EXACT corpus ``min_d`` / ``max_d`` (one
  posexplode + groupBy(dim) pass, ``dim`` bounded rows collected);
  ``step_d = (max_d - min_d) / 255``;
- encode: ``code_d = clamp(floor((x_d - min_d) / step_d + 0.5), 0,
  255)`` (``floor(v + 0.5)`` = round-half-UP in both engines — never
  the engines' differing ``round`` tie rules), ``code_d = 0`` when
  ``step_d = 0`` (a constant dimension);
- decode: ``x̂_d = min_d + code_d * step_d``;
- asymmetric distance (query full-precision, corpus coded):
  ``dist(q, c) = Σ_d (q_d - x̂_d)²``; top-k under the engine's pinned
  ``(round(dist, 9) ASC, id ASC)``.

Codes are INTEGERS, so the encode differential is exact — no float
rounding escape hatch; only the distance compares at round-6.

Scale shape: training is one map-side-combined aggregate with ``dim``
output rows; encode is pure column math (two literal arrays of ``dim``
floats — far under the measured ~512-literal janino ceiling for the
64-dim corpus; re-dispatch through an Arrow kernel like
``pq.pq_encode_pandas`` if you quantize 1024-dim vectors); scoring
cross-joins the broadcast query table and aggregates over dims
JVM-side, ranked through the bounded tournament (no WindowExec, no
corpus-proportional buffers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_sq_params",
    "sq_encode",
    "sq_topk",
    "duckdb_sq_topk_sql",
]


def train_sq_params(
    emb_df: DataFrame, emb_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Exact per-dimension (mins, steps) over the corpus.

    Raises ValueError on mixed dimensionality or an empty corpus.
    """
    dims = [
        r["d"]
        for r in emb_df.select(
            F.size(emb_col).alias("d")
        ).distinct().collect()
    ]
    if not dims:
        raise ValueError("train_sq_params: empty corpus")
    if len(dims) != 1:
        raise ValueError(
            f"train_sq_params: mixed embedding sizes {sorted(dims)}"
        )
    rows = (
        emb_df.select(F.posexplode(emb_col).alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.min(F.col("x").cast("double")).alias("lo"),
            F.max(F.col("x").cast("double")).alias("hi"),
        )
        .collect()
    )
    by_dim = {r["dim"]: (r["lo"], r["hi"]) for r in rows}
    mins = [by_dim[d][0] for d in range(dims[0])]
    steps = [(by_dim[d][1] - by_dim[d][0]) / 255.0 for d in range(dims[0])]
    return mins, steps


def _code_expr(emb: Column, mins: list[float], steps: list[float]) -> Column:
    """ARRAY<INT> codes for one embedding column (literal math)."""
    dim = len(mins)
    mins_arr = F.array(*[F.lit(float(m)) for m in mins])
    steps_arr = F.array(*[F.lit(float(s)) for s in steps])
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.when(steps_arr[d] == 0.0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(255),
                    F.floor(
                        (emb[d].cast("double") - mins_arr[d])
                        / steps_arr[d]
                        + F.lit(0.5)
                    ).cast("int"),
                ),
            )
        ).cast("int"),
    )


def sq_encode(
    df: DataFrame,
    mins: list[float],
    steps: list[float],
    emb_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Append ``out_col`` = ARRAY<INT> SQ8 codes (drops ``emb_col``)."""
    if len(mins) != len(steps):
        raise ValueError("mins/steps length mismatch")
    return df.withColumn(
        out_col, _code_expr(F.col(emb_col), mins, steps)
    ).drop(emb_col)


def sq_topk(
    codes_df: DataFrame,
    mins: list[float],
    steps: list[float],
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Asymmetric top-k over SQ8 codes.

    ``(query_id, id, dist, rank)``, rank 1..k by (round-9 dist ASC,
    id ASC) — exact distances given the codes.
    """
    dim = len(mins)
    spark = codes_df.sparkSession
    for qid, qv in queries:
        if len(qv) != dim:
            raise ValueError(
                f"query {qid} has {len(qv)} dims, corpus has {dim}"
            )
    qdf = spark.createDataFrame(
        [(qid, [float(x) for x in qv]) for qid, qv in queries],
        "query_id INT, qv ARRAY<DOUBLE>",
    )
    mins_arr = F.array(*[F.lit(float(m)) for m in mins])
    steps_arr = F.array(*[F.lit(float(s)) for s in steps])
    scored = (
        codes_df.select(id_col, codes_col)
        .crossJoin(F.broadcast(qdf))
        .select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda d: F.col("qv")[d]
                    - (mins_arr[d] + F.col(codes_col)[d] * steps_arr[d]),
                ),
                F.lit(0.0),
                # diff * diff, never pow(diff, 2): multiply is exact
                # IEEE in both engines; pow may differ by ULPs
                lambda acc, diff: acc + diff * diff,
            ).alias("dist"),
        )
    )
    from same_same_spark.operators.topk import topk_per_query

    ranked = topk_per_query(
        scored.select("query_id", "doc_id", (-F.col("dist")).alias("score")),
        k,
    )
    return ranked.select(
        "query_id",
        F.col("doc_id").alias(id_col),
        (-F.col("score")).alias("dist"),
        "rank",
    )


def duckdb_sq_topk_sql(
    table: str,
    id_col: str,
    emb_col: str,
    mins: list[float] | None,
    steps: list[float] | None,
    queries: list[tuple[int, list[float]]] | None,
    k: int = 10,
    dim: int | None = None,
    query_ids: list[int] | None = None,
) -> str:
    """DuckDB twin of (train→)encode→:func:`sq_topk` over
    full-precision ``table`` rows — re-derives code_d per dim inline
    (the integer encode is exact cross-engine; dist compares at
    round-6). With ``mins=steps=None`` (``dim`` required) the TRAINER
    is re-derived in SQL too: per-dim exact min/max is the same
    aggregate in both engines, so the whole train→encode→rank chain
    sits under the differential."""
    if (mins is None) != (steps is None):
        raise ValueError("pass both mins and steps, or neither")
    if mins is not None:
        dim = len(mins)
        mins_sql = "[" + ", ".join(repr(float(m)) for m in mins) + "]"
        steps_sql = "[" + ", ".join(repr(float(s)) for s in steps) + "]"
        params_cte = (
            f"SELECT {mins_sql}::DOUBLE[] AS mins, "
            f"{steps_sql}::DOUBLE[] AS steps"
        )
    else:
        if dim is None:
            raise ValueError("derived params need an explicit dim")
        params_cte = f"""SELECT list(lo ORDER BY dim) AS mins,
         list((hi - lo) / 255.0 ORDER BY dim) AS steps
  FROM (
    SELECT t.d AS dim,
           min({emb_col}[t.d]::DOUBLE) AS lo,
           max({emb_col}[t.d]::DOUBLE) AS hi
    FROM {table}, unnest(range(1, {dim} + 1)) AS t(d)
    GROUP BY t.d
  )"""
    if queries is not None:
        qrows = ", ".join(
            f"({qid}, ["
            + ", ".join(repr(float(x)) for x in qv)
            + "]::DOUBLE[])"
            for qid, qv in queries
        )
        q_cte = f"SELECT * FROM (VALUES {qrows}) AS v(query_id, qv)"
    else:
        if query_ids is None:
            raise ValueError("pass queries or query_ids")
        ids = ", ".join(str(int(i)) for i in query_ids)
        q_cte = (
            f"SELECT {id_col}::INTEGER AS query_id, "
            f"{emb_col}::DOUBLE[] AS qv FROM {table} "
            f"WHERE {id_col} IN ({ids})"
        )
    return f"""
WITH params AS (
  {params_cte}
),
q AS (
  {q_cte}
),
coded AS (
  SELECT {id_col} AS vec_id,
         [CASE WHEN p.steps[d] = 0 THEN 0
               ELSE greatest(0, least(255,
                 floor(({emb_col}[d]::DOUBLE - p.mins[d]) / p.steps[d]
                       + 0.5)::INTEGER))
          END
          FOR d IN range(1, {dim} + 1)] AS codes
  FROM {table}, params p
),
scored AS (
  SELECT q.query_id, c.vec_id,
         list_sum(list_transform(
           [q.qv[d] - (p.mins[d] + c.codes[d] * p.steps[d])
            FOR d IN range(1, {dim} + 1)],
           x -> x * x)) AS dist
  FROM coded c, q, params p
),
ranked AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(dist, 9) ASC, vec_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(dist, 6) AS dist, rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""
