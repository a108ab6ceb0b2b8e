"""Residual quantization (RQ) — additive multi-level codebooks
(Chen, Guan & Wang 2010; the additive-quantization family Lucene's and
faiss's modern compressed-vector formats build on; all public).

Where PQ slices the dimension, RQ layers the APPROXIMATION: level 0
quantizes the vector with a full-dimension codebook, level 1 quantizes
the residual, and so on — ``recon = Σ_l C_l[code_l]``, a code per
level. Error falls with every level on ANY data layout (PQ needs the
subspaces to be informative; RQ doesn't care where the variance
lives), at the cost of sequential encoding.

Pinned semantics (the duckdb twin re-derives them relationally):

- encode: per level, ``code = argmin_c round(||r − C_l[c]||², 9)``
  with ties to the smaller code id (the :mod:`pipeline.pq` argmin
  rule), then ``r ← r − C_l[code]`` (exact per-element subtraction);
- every code row carries ``recon_norm2 = ||Σ_l C_l[code_l]||²``
  computed at encode time — the standard RQ trick that restores
  LUT-only asymmetric distances despite the cross-level terms:
  ``dist(q, v) = ||q||² − 2 Σ_l <q, C_l[code_l]> + recon_norm2``
  (exactly ``||q − recon||²`` mathematically; floats agree to
  association order, and ranks pin at round 9);
- ``rq_adc_topk``: per query the bounded ``levels × n_codes`` LUT of
  inner products embeds as a literal; every row scores with one
  ``F.aggregate`` over its code array; ranks ride the bounded
  tournament under ``(round(dist, 9) ASC, id ASC)``.

Scale shape: training is driver-side on a bounded sample (the
:func:`pipeline.opq.train_opq` contract); encoding is one Arrow
``mapInPandas`` pass (map-only — full-dimension codebooks exceed the
literal-expression budget by construction, so there is no literal
dispatch here); ADC is a broadcast-LUT scan + tournament, the same
100-TB shape as :func:`pipeline.pq.pq_adc_topk`.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.pipeline.opq import _kmeans_np


def train_rq_codebooks(
    sample: "np.ndarray | list[list[float]]",
    levels: int,
    n_codes: int,
    kmeans_iter: int = 15,
    seed: int = 29,
) -> list[list[list[float]]]:
    """Sequential residual trainer over a driver-side sample: level 0's
    codebook is k-means on the vectors, level l's on the level-(l−1)
    residuals. Deterministic for fixed (sample, seed). Returns
    ``levels × n_codes × dim``."""
    X = np.asarray(sample, dtype=np.float64)
    if X.ndim != 2:
        raise ValueError("sample must be a 2-D (n, d) array")
    if levels < 1 or n_codes < 1:
        raise ValueError(f"need levels, n_codes >= 1, got {levels}/{n_codes}")
    rng = np.random.RandomState(seed)
    R = X.copy()
    books = []
    for _l in range(levels):
        C = _kmeans_np(R, n_codes, rng, kmeans_iter)
        dist = ((R[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = dist.argmin(axis=1)
        R = R - C[assign]
        books.append([[float(v) for v in row] for row in C])
    return books


def _check_rq_codebooks(
    codebooks: list[list[list[float]]],
) -> tuple[int, int, int]:
    if not codebooks or not codebooks[0]:
        raise ValueError("codebooks must be non-empty")
    levels = len(codebooks)
    n_codes = len(codebooks[0])
    dim = len(codebooks[0][0])
    for l, cb in enumerate(codebooks):
        if len(cb) != n_codes or any(len(c) != dim for c in cb):
            raise ValueError(f"level {l}: ragged codebook")
    return levels, n_codes, dim


def rq_encode_rows(
    vecs: "np.ndarray", codebooks: list[list[list[float]]]
) -> tuple["np.ndarray", "np.ndarray"]:
    """Vectorized encode of an (n, d) batch → (codes (n, L) int32,
    recon_norm2 (n,) float64). Distances accumulate LEFT-TO-RIGHT per
    dimension (the pq_encode_pandas association order); argmin at
    round 9 with ties to the smaller code."""
    levels, n_codes, dim = _check_rq_codebooks(codebooks)
    X = np.asarray(vecs, dtype=np.float64)
    n = len(X)
    R = X.copy()
    recon = np.zeros_like(X)
    codes = np.empty((n, levels), dtype=np.int32)
    for l in range(levels):
        C = np.asarray(codebooks[l], dtype=np.float64)
        acc = np.zeros((n, n_codes), dtype=np.float64)
        for j in range(dim):
            d = R[:, j : j + 1] - C[None, :, j]
            acc = acc + d * d
        pick = np.argmin(np.round(acc, 9), axis=1)
        codes[:, l] = pick
        R = R - C[pick]
        recon = recon + C[pick]
    norm2 = np.zeros(n, dtype=np.float64)
    for j in range(dim):
        norm2 = norm2 + recon[:, j] * recon[:, j]
    return codes, norm2


def rq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """``(id, codes ARRAY<INT>, recon_norm2 DOUBLE)`` via one Arrow
    ``mapInPandas`` pass (see module pin)."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    _check_rq_codebooks(codebooks)
    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("codes", ArrayType(IntegerType())),
            StructField("recon_norm2", DoubleType()),
        ]
    )

    def encode_iter(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            X = np.asarray(
                [list(map(float, e)) for e in pdf[embedding_col]],
                dtype=np.float64,
            )
            codes, norm2 = rq_encode_rows(X, codebooks)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": list(map(list, codes)),
                    "recon_norm2": norm2,
                }
            )

    return df.select(id_col, embedding_col).mapInPandas(
        encode_iter, schema=out_schema
    )


def rq_decode(
    codebooks: list[list[list[float]]], codes: list[int]
) -> list[float]:
    """Reconstruction ``Σ_l C_l[code_l]`` (python reference for tests;
    accumulation level-by-level, the encoder's order)."""
    levels, _n, dim = _check_rq_codebooks(codebooks)
    if len(codes) != levels:
        raise ValueError(f"need {levels} codes, got {len(codes)}")
    acc = [0.0] * dim
    for l, c in enumerate(codes):
        row = codebooks[l][c]
        acc = [a + float(v) for a, v in zip(acc, row)]
    return acc


def rq_adc_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over RQ codes (see module pin).
    Output ``(query_id, id, dist, rank)``, rank 1..k by
    (round-9 dist ASC, id ASC) — approximate distances, exact given
    the codes."""
    levels, n_codes, dim = _check_rq_codebooks(codebooks)
    spark = codes_df.sparkSession
    rows = []
    for qid, qv in queries:
        if len(qv) != dim:
            raise ValueError(f"query {qid}: dim {len(qv)} != {dim}")
        q = [float(x) for x in qv]
        q2 = 0.0
        for x in q:
            q2 = q2 + x * x
        lut = []
        for l in range(levels):
            ips = []
            for code in codebooks[l]:
                acc = 0.0
                for a, b in zip(q, code):
                    acc = acc + a * float(b)
                ips.append(acc)
            lut.append(ips)
        rows.append((int(qid), q2, lut))
    qdf = spark.createDataFrame(
        rows, "query_id INT, q2 DOUBLE, lut ARRAY<ARRAY<DOUBLE>>"
    )
    ip = F.aggregate(
        F.sequence(F.lit(0), F.lit(levels - 1)),
        F.lit(0.0),
        lambda acc, l: acc + F.col("lut")[l][F.col("codes")[l]],
    )
    scored = (
        codes_df.select(id_col, "codes", "recon_norm2")
        .crossJoin(F.broadcast(qdf))
        .select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            (
                F.col("q2")
                - F.lit(2.0) * ip
                + F.col("recon_norm2")
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


def duckdb_rq_sql(
    table: str,
    codebooks: list[list[list[float]]],
    query_ids: list[int],
    k: int = 10,
) -> str:
    """DuckDB twin of encode → ADC → rank over ``table``'s embeddings
    (queries = the table rows with ``vec_id`` in ``query_ids``,
    mirroring the entry fixture). The residual chain re-derives
    RELATIONALLY — one (dists → argmin → residual) CTE pair per level,
    codebooks as a VALUES table; sum-order noise is absorbed by the
    round-9 argmin/rank gates (the opq-oracle convention)."""
    levels, n_codes, dim = _check_rq_codebooks(codebooks)
    d = dim
    cbvals = ", ".join(
        f"({l}, {c}, {p + 1}, {codebooks[l][c][p]!r})"
        for l in range(levels)
        for c in range(n_codes)
        for p in range(dim)
    )
    qids = ", ".join(str(int(q)) for q in query_ids)
    parts = [
        f"e AS (\n  SELECT vec_id, (embedding::DOUBLE[])[1:{d}] AS emb"
        f" FROM {table}\n)",
        # CAST: bare float literals parse as DECIMAL, and the
        # pure-codebook folds (recon/norm2) would overflow HUGEINT
        f"cb_raw(l, c, pos, m) AS (VALUES {cbvals})",
        "cb AS (SELECT l, c, pos, CAST(m AS DOUBLE) AS m FROM cb_raw)",
        f"r0 AS (\n  SELECT vec_id, pos, emb[pos] AS v\n"
        f"  FROM e, unnest(range(1, {d} + 1)) AS u(pos)\n)",
    ]
    for l in range(levels):
        parts.append(
            f"d{l} AS (\n"
            f"  SELECT r{l}.vec_id, cb.c,"
            f" sum((r{l}.v - cb.m) * (r{l}.v - cb.m)) AS dist\n"
            f"  FROM r{l} JOIN cb ON cb.l = {l} AND cb.pos = r{l}.pos\n"
            f"  GROUP BY 1, 2\n)"
        )
        parts.append(
            f"enc{l} AS (\n"
            f"  SELECT vec_id, c FROM (\n"
            f"    SELECT vec_id, c, row_number() OVER (\n"
            f"      PARTITION BY vec_id ORDER BY round(dist, 9), c\n"
            f"    ) AS rn FROM d{l}\n"
            f"  ) WHERE rn = 1\n)"
        )
        parts.append(
            f"r{l + 1} AS (\n"
            f"  SELECT r{l}.vec_id, r{l}.pos, r{l}.v - cb.m AS v\n"
            f"  FROM r{l}\n"
            f"  JOIN enc{l} ON enc{l}.vec_id = r{l}.vec_id\n"
            f"  JOIN cb ON cb.l = {l} AND cb.c = enc{l}.c"
            f" AND cb.pos = r{l}.pos\n)"
        )
    recon_unions = "\n  UNION ALL\n".join(
        f"  SELECT enc{l}.vec_id, cb.pos, cb.m\n"
        f"  FROM enc{l} JOIN cb ON cb.l = {l} AND cb.c = enc{l}.c"
        for l in range(levels)
    )
    rowcode_unions = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {l} AS l, c FROM enc{l}" for l in range(levels)
    )
    parts.append(f"recon_parts AS (\n{recon_unions}\n)")
    parts.append(
        "recon AS (\n"
        "  SELECT vec_id, pos, sum(m) AS v FROM recon_parts"
        " GROUP BY 1, 2\n)"
    )
    parts.append(
        "norm2 AS (\n"
        "  SELECT vec_id, sum(v * v) AS n2 FROM recon GROUP BY 1\n)"
    )
    parts.append(f"rowcodes AS (\n{rowcode_unions}\n)")
    parts.append(
        f"q AS (\n  SELECT vec_id::INTEGER AS query_id, vec_id AS qvec_id"
        f" FROM e WHERE vec_id IN ({qids})\n)"
    )
    parts.append(
        "q2 AS (\n"
        "  SELECT q.query_id, sum(r0.v * r0.v) AS q2\n"
        "  FROM q JOIN r0 ON r0.vec_id = q.qvec_id GROUP BY 1\n)"
    )
    parts.append(
        "qlut AS (\n"
        "  SELECT q.query_id, cb.l, cb.c, sum(r0.v * cb.m) AS ipv\n"
        "  FROM q\n"
        "  JOIN r0 ON r0.vec_id = q.qvec_id\n"
        "  JOIN cb ON cb.pos = r0.pos\n"
        "  GROUP BY 1, 2, 3\n)"
    )
    parts.append(
        "ipsum AS (\n"
        "  SELECT qlut.query_id, rc.vec_id, sum(qlut.ipv) AS ip\n"
        "  FROM rowcodes rc\n"
        "  JOIN qlut ON qlut.l = rc.l AND qlut.c = rc.c\n"
        "  GROUP BY 1, 2\n)"
    )
    with_sql = ",\n".join(parts)
    return f"""
WITH {with_sql},
score AS (
  SELECT i.query_id, i.vec_id,
         q2.q2 - 2.0 * i.ip + n.n2 AS dist
  FROM ipsum i
  JOIN q2 ON q2.query_id = i.query_id
  JOIN norm2 n ON n.vec_id = i.vec_id
),
ranked AS (
  SELECT query_id, vec_id, dist, row_number() OVER (
    PARTITION BY query_id ORDER BY round(dist, 9) ASC, vec_id ASC
  ) AS rank
  FROM score
)
SELECT query_id, vec_id, round(dist, 6) AS dist, rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""
