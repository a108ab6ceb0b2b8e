"""Tiered quantized retrieval cascade: BQ -> SQ8 -> exact.

The standard large-scale ANN serving shape (faiss's
``IndexBinaryFlat`` + refine chain; beyond the reference, which scores
full-precision vectors only — ``internal/storage/search/search.go``):

1. **shortlist** — 1-bit binary quantization (32x smaller than
   float32): Hamming top-``shortlist`` per query, pure integer
   XOR+popcount (:mod:`same_same_spark.pipeline.bq`);
2. **refine** — 8-bit scalar quantization (4x smaller): asymmetric L2²
   over ONLY the shortlist rows, top-``refine``
   (:mod:`same_same_spark.pipeline.sq`);
3. **exact** — full-precision L2² over ONLY the refine survivors,
   top-``k``.

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_cascade_sql`, which re-derives BOTH trainers, BOTH
encodes and all three ranking stages in SQL):

- every stage ranks under the pinned ANN order ``(round(key, 9) ASC,
  id ASC)`` (Hamming keys are integers — exact);
- stage boundaries are strict subsets: ``k <= refine <= shortlist``;
- with ``shortlist``/``refine`` >= corpus size the cascade is
  rank-identical to exact brute-force L2 (pinned in
  tests/test_cascade.py).

Scale shape: the Hamming sweep touches 1/32 of the raw bytes (and at
100 TB the words live in their own slim columnar store); stage 2 reads
SQ codes for a BROADCAST shortlist of ids only; stage 3 fetches
full-precision vectors for ``queries x refine`` ids. Each stage is a
bounded tournament — no WindowExec on data rows anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.operators.topk import topk_per_query
from same_same_spark.pipeline.bq import (
    _n_words,
    _sql_word,
    bq_encode,
    bq_topk,
    train_bq_thresholds,
)
from same_same_spark.pipeline.sq import sq_encode, train_sq_params


def _l2_agg(qv, diff_fn):
    return F.aggregate(
        diff_fn(qv),
        F.lit(0.0),
        # diff * diff, never pow(diff, 2): multiply is exact IEEE in
        # both engines; pow may differ by ULPs
        lambda acc, d: acc + d * d,
    )


def _rank_dist(scored: DataFrame, k: int) -> DataFrame:
    ranked = topk_per_query(
        scored.select("query_id", "doc_id", (-F.col("dist")).alias("score")),
        k,
    )
    return ranked.select(
        "query_id", "doc_id", (-F.col("score")).alias("dist"), "rank"
    )


def cascade_topk(
    emb_df: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    shortlist: int = 100,
    refine: int = 20,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Three-tier quantized top-k (see module doc).

    Trains both quantizers on ``emb_df`` (exact per-dim bounds — at
    scale both encodes are ingest-time artifacts; this probe-time form
    keeps the entry self-contained). Returns (query_id INT, vec_id,
    dist DOUBLE, rank INT) with the TRUE L2² distance.
    """
    if not k <= refine <= shortlist:
        raise ValueError(
            f"need k <= refine <= shortlist, got {k}/{refine}/{shortlist}"
        )
    spark = emb_df.sparkSession
    base = emb_df.select(id_col, embedding_col)
    thr = train_bq_thresholds(base, emb_col=embedding_col)
    mins, steps = train_sq_params(base, emb_col=embedding_col)
    dim = len(thr)

    words = bq_encode(base, thr, emb_col=embedding_col)
    codes = sq_encode(base, mins, steps, emb_col=embedding_col)

    qdf = spark.createDataFrame(
        [(qid, [float(x) for x in qv]) for qid, qv in queries],
        "query_id INT, qv ARRAY<DOUBLE>",
    )

    # stage 1: Hamming shortlist (integer keys — exact ranking)
    stage1 = bq_topk(
        words, thr, queries, k=shortlist, id_col=id_col
    ).select("query_id", id_col)

    # stage 2: asymmetric SQ8 L2 over the broadcast shortlist
    mins_arr = F.array(*[F.lit(float(m)) for m in mins])
    steps_arr = F.array(*[F.lit(float(s)) for s in steps])
    s2_scored = (
        codes.join(F.broadcast(stage1), id_col)
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            _l2_agg(
                F.col("qv"),
                lambda qv: F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda d: qv[d]
                    - (mins_arr[d] + F.col("codes")[d] * steps_arr[d]),
                ),
            ).alias("dist"),
        )
    )
    stage2 = _rank_dist(s2_scored, refine).select("query_id", "doc_id")

    # stage 3: exact L2 over the refine survivors
    s3_scored = (
        base.withColumnRenamed(id_col, "doc_id")
        .join(F.broadcast(stage2), "doc_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "doc_id",
            _l2_agg(
                F.col("qv"),
                lambda qv: F.zip_with(
                    qv,
                    F.transform(
                        F.col(embedding_col), lambda x: x.cast("double")
                    ),
                    lambda q, x: q - x,
                ),
            ).alias("dist"),
        )
    )
    return _rank_dist(s3_scored, k).withColumnRenamed("doc_id", id_col)


def duckdb_cascade_sql(
    table: str,
    id_col: str,
    emb_col: str,
    dim: int,
    query_ids: list[int],
    k: int = 5,
    shortlist: int = 100,
    refine: int = 20,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`cascade_topk`: trainers (per-dim midrange
    + min/step), both encodes, and all three stages re-derived in SQL.
    Query vectors come FROM the table by id (oracle strings are built
    without a session)."""
    if not k <= refine <= shortlist:
        raise ValueError(
            f"need k <= refine <= shortlist, got {k}/{refine}/{shortlist}"
        )
    nw = _n_words(dim)
    enc = ", ".join(_sql_word(emb_col, "p.thr", dim, w) for w in range(nw))
    ham = " + ".join(
        f"bit_count(xor(q.qwords[{w + 1}], c.words[{w + 1}]))::BIGINT"
        for w in range(nw)
    )
    ids = ", ".join(str(int(i)) for i in query_ids)
    return f"""
WITH params AS (
  SELECT list((lo + hi) / 2.0 ORDER BY dim) AS thr,
         list(lo ORDER BY dim) AS mins,
         list((hi - lo) / 255.0 ORDER BY dim) AS steps
  FROM (
    SELECT t.d AS dim,
           min({emb_col}[t.d]::DOUBLE) AS lo,
           max({emb_col}[t.d]::DOUBLE) AS hi
    FROM {table}, unnest(range(1, {dim} + 1)) AS t(d)
    GROUP BY t.d
  )
),
qraw AS (
  SELECT {id_col}::INTEGER AS query_id, {emb_col} AS {emb_col},
         {emb_col}::DOUBLE[] AS qv
  FROM {table} WHERE {id_col} IN ({ids})
),
q AS (
  SELECT query_id, qv, [{enc}] AS qwords FROM qraw, params p
),
words AS (
  SELECT {id_col} AS vec_id, [{enc}] AS words
  FROM {table}, params p
),
s1 AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id, row_number() OVER (
      PARTITION BY q.query_id
      ORDER BY ({ham}) ASC, c.vec_id ASC
    ) AS rn
    FROM words c, q
  ) WHERE rn <= {shortlist}
),
codes AS (
  SELECT e.{id_col} AS vec_id,
         [CASE WHEN p.steps[d] = 0 THEN 0
               ELSE greatest(0, least(255,
                 floor((e.{emb_col}[d]::DOUBLE - p.mins[d]) / p.steps[d]
                       + 0.5)::INTEGER))
          END
          FOR d IN range(1, {dim} + 1)] AS codes
  FROM {table} e
  JOIN (SELECT DISTINCT vec_id FROM s1) s1d ON s1d.vec_id = e.{id_col}
  CROSS JOIN params p
),
s2 AS (
  SELECT query_id, vec_id FROM (
    SELECT s1.query_id, c.vec_id, row_number() OVER (
      PARTITION BY s1.query_id
      ORDER BY round(list_sum(list_transform(
        [q.qv[d] - (p.mins[d] + c.codes[d] * p.steps[d])
         FOR d IN range(1, {dim} + 1)],
        x -> x * x)), 9) ASC, c.vec_id ASC
    ) AS rn
    FROM s1
    JOIN codes c ON c.vec_id = s1.vec_id
    JOIN q ON q.query_id = s1.query_id
    CROSS JOIN params p
  ) WHERE rn <= {refine}
),
s3 AS (
  SELECT s2.query_id, s2.vec_id,
         list_sum(list_transform(
           [q.qv[d] - e.{emb_col}[d]::DOUBLE
            FOR d IN range(1, {dim} + 1)],
           x -> x * x)) AS dist
  FROM s2
  JOIN {table} e ON e.{id_col} = s2.vec_id
  JOIN q ON q.query_id = s2.query_id
),
ranked AS (
  SELECT query_id, vec_id, dist, row_number() OVER (
    PARTITION BY query_id ORDER BY round(dist, 9) ASC, vec_id ASC
  ) AS rank
  FROM s3
)
SELECT query_id, vec_id, round(dist, {round_score}) AS dist,
       rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""
