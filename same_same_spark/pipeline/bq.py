"""Binary quantization — 32× vector compression with 1-bit codes.

The cheapest tier of the engine's compressed-vector family (PQ/OPQ
sub-quantize blocks, SQ8 keeps a byte per dim, BQ keeps one BIT per
dim — faiss's ``IndexBinaryFlat`` shape, what vector stores ship as
"binary quantization" for the first-pass shortlist at extreme scale).
At 100 TB a 64-dim float32 corpus drops from 256 B/vector to 8 B, the
distance becomes XOR+popcount on packed words (whole-stage-codegen
integer ops, no floats anywhere in the hot loop), and recall is
recovered by an exact re-rank of a small Hamming shortlist
(:func:`bq_rerank_topk`).

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_bq_topk_sql`):

- trainer: per-dimension EXACT corpus ``min_d`` / ``max_d`` (one
  posexplode + groupBy(dim) pass, ``dim`` bounded rows collected);
  threshold ``thr_d = (min_d + max_d) / 2`` — two exact selections
  plus one IEEE add and one halving, so the threshold double is
  bit-identical in Spark, DuckDB, and driver-side Python;
- encode: ``bit_d = 1 if x_d > thr_d else 0`` (strict ``>`` on
  doubles), packed little-endian into 32-bit groups carried in BIGINT
  words (``word_w = Σ_b bit_{32w+b} << b`` — 32 bits/word keeps every
  value positive, dodging the two engines' sign-bit shift rules);
- distance: Hamming = ``Σ_w popcount(q_w XOR c_w)`` — all-integer, so
  the WHOLE differential is exact: no float rounding escape hatch at
  any stage; top-k under the engine's pinned ``(hamming ASC, id
  ASC)``.

Scale shape: training is one map-side-combined aggregate with ``dim``
output rows; encode is a static sum of ``dim`` literal comparisons
(128 literals for the 64-dim corpus — far under the measured
~512-literal janino ceiling; re-dispatch through an Arrow kernel like
``pq.pq_encode_pandas`` for 1024-dim inputs); scoring cross-joins the
broadcast query table against 8-byte codes and ranks through the
bounded tournament (no WindowExec, no corpus-proportional buffers).
The re-rank path touches full-precision vectors for only
``shortlist`` rows per query via an id-equi-join.

Reference parity: the reference scores full-precision cosine only
(`/root/reference/internal/embedders/similarity.go`); BQ is a
training-pipeline extension (Jégou et al.'s binary-code shortlist
pattern), added for the 100-TB memory story like PQ/OPQ/SQ8.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_bq_thresholds",
    "bq_encode",
    "bq_encode_py",
    "bq_topk",
    "bq_rerank_topk",
    "duckdb_bq_topk_sql",
]

_BITS = 32  # bits packed per BIGINT word (positive values only)


def train_bq_thresholds(
    emb_df: DataFrame, emb_col: str = "embedding"
) -> list[float]:
    """Exact per-dimension midrange thresholds over the corpus.

    Raises ValueError on mixed dimensionality or an empty corpus.
    """
    dims = [
        r["d"]
        for r in emb_df.select(
            F.size(emb_col).alias("d")
        ).distinct().collect()
    ]
    if not dims:
        raise ValueError("train_bq_thresholds: empty corpus")
    if len(dims) != 1:
        raise ValueError(
            f"train_bq_thresholds: mixed embedding sizes {sorted(dims)}"
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
    return [(by_dim[d][0] + by_dim[d][1]) / 2.0 for d in range(dims[0])]


def _n_words(dim: int) -> int:
    return (dim + _BITS - 1) // _BITS


def _word_expr(emb: Column, thresholds: list[float], w: int) -> Column:
    """One packed word: static sum of literal threshold comparisons."""
    dim = len(thresholds)
    terms = [
        F.when(
            emb[d].cast("double") > F.lit(float(thresholds[d])),
            F.lit(1 << b).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(_BITS)
        if (d := w * _BITS + b) < dim
    ]
    return reduce(lambda a, c: a + c, terms)


def bq_encode(
    df: DataFrame,
    thresholds: list[float],
    emb_col: str = "embedding",
    out_col: str = "words",
) -> DataFrame:
    """Append ``out_col`` = ARRAY<BIGINT> packed sign bits (drops
    ``emb_col``)."""
    emb = F.col(emb_col)
    words = F.array(
        *[
            _word_expr(emb, thresholds, w)
            for w in range(_n_words(len(thresholds)))
        ]
    )
    return df.withColumn(out_col, words).drop(emb_col)


def bq_encode_py(vec: list[float], thresholds: list[float]) -> list[int]:
    """Driver-side exact twin of :func:`bq_encode` for query vectors."""
    if len(vec) != len(thresholds):
        raise ValueError(
            f"vector has {len(vec)} dims, thresholds {len(thresholds)}"
        )
    words = [0] * _n_words(len(thresholds))
    for d, (x, t) in enumerate(zip(vec, thresholds)):
        if float(x) > float(t):
            words[d // _BITS] |= 1 << (d % _BITS)
    return words


def _hamming_expr(qarr: Column, carr: Column, n_words: int) -> Column:
    terms = [
        F.bit_count(qarr[w].bitwiseXOR(carr[w])).cast("long")
        for w in range(n_words)
    ]
    return reduce(lambda a, c: a + c, terms)


def bq_topk(
    codes_df: DataFrame,
    thresholds: list[float],
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "words",
) -> DataFrame:
    """Hamming top-k over packed binary codes.

    ``(query_id, id, hamming, rank)``, rank 1..k by (hamming ASC,
    id ASC) — all-integer, exact.
    """
    dim = len(thresholds)
    nw = _n_words(dim)
    spark = codes_df.sparkSession
    for qid, qv in queries:
        if len(qv) != dim:
            raise ValueError(
                f"query {qid} has {len(qv)} dims, corpus has {dim}"
            )
    qdf = spark.createDataFrame(
        [(qid, bq_encode_py(qv, thresholds)) for qid, qv in queries],
        "query_id INT, qwords ARRAY<BIGINT>",
    )
    scored = (
        codes_df.select(id_col, codes_col)
        .crossJoin(F.broadcast(qdf))
        .select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            _hamming_expr(F.col("qwords"), F.col(codes_col), nw).alias(
                "hamming"
            ),
        )
    )
    from same_same_spark.operators.topk import topk_per_query

    ranked = topk_per_query(
        scored.select(
            "query_id", "doc_id", (-F.col("hamming")).alias("score")
        ),
        k,
    )
    return ranked.select(
        "query_id",
        F.col("doc_id").alias(id_col),
        (-F.col("score")).cast("long").alias("hamming"),
        "rank",
    )


def bq_rerank_topk(
    codes_df: DataFrame,
    emb_df: DataFrame,
    thresholds: list[float],
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    codes_col: str = "words",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact-L2 re-rank of the Hamming ``shortlist`` (the standard BQ
    recall-recovery step: faiss ``IndexBinaryFlat`` + refine).

    ``(query_id, id, dist, rank)`` — dist is the TRUE squared L2 over
    full-precision vectors, fetched by id-equi-join for shortlist rows
    only; rank 1..k by (round-9 dist ASC, id ASC).
    """
    if shortlist < k:
        raise ValueError(f"shortlist {shortlist} < k {k}")
    dim = len(thresholds)
    spark = codes_df.sparkSession
    cand = bq_topk(
        codes_df, thresholds, queries, k=shortlist,
        id_col=id_col, codes_col=codes_col,
    ).select("query_id", id_col)
    qdf = spark.createDataFrame(
        [(qid, [float(x) for x in qv]) for qid, qv in queries],
        "query_id INT, qv ARRAY<DOUBLE>",
    )
    scored = (
        cand.join(emb_df.select(id_col, emb_col), id_col, "inner")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            F.aggregate(
                F.zip_with(
                    "qv",
                    F.transform(
                        F.col(emb_col), lambda x: x.cast("double")
                    ),
                    lambda q, x: q - x,
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
        scored.select(
            "query_id", "doc_id", (-F.col("dist")).alias("score")
        ),
        k,
    )
    return ranked.select(
        "query_id",
        F.col("doc_id").alias(id_col),
        (-F.col("score")).alias("dist"),
        "rank",
    )


def _sql_word(emb_sql: str, thr_sql: str, dim: int, w: int) -> str:
    terms = [
        f"CASE WHEN {emb_sql}[{d + 1}]::DOUBLE > {thr_sql}[{d + 1}] "
        f"THEN {1 << b}::BIGINT ELSE 0::BIGINT END"
        for b in range(_BITS)
        if (d := w * _BITS + b) < dim
    ]
    return "(" + " + ".join(terms) + ")"


def duckdb_bq_topk_sql(
    table: str,
    id_col: str,
    emb_col: str,
    thresholds: list[float] | None,
    queries: list[tuple[int, list[float]]] | None,
    k: int = 10,
    dim: int | None = None,
    query_ids: list[int] | None = None,
) -> str:
    """DuckDB twin of (train→)encode→:func:`bq_topk` over
    full-precision ``table`` rows — re-derives the packed words per row
    inline. With ``thresholds=None`` (``dim`` required) the TRAINER is
    re-derived in SQL too (per-dim exact midrange), so the whole
    train→encode→rank chain sits under the differential — and every
    compared value is an INTEGER: the differential is exact end to
    end."""
    if thresholds is not None:
        dim = len(thresholds)
        thr_sql = (
            "["
            + ", ".join(repr(float(t)) for t in thresholds)
            + "]::DOUBLE[]"
        )
        params_cte = f"SELECT {thr_sql} AS thr"
    else:
        if dim is None:
            raise ValueError("derived thresholds need an explicit dim")
        params_cte = f"""SELECT list((lo + hi) / 2.0 ORDER BY dim) AS thr
  FROM (
    SELECT t.d AS dim,
           min({emb_col}[t.d]::DOUBLE) AS lo,
           max({emb_col}[t.d]::DOUBLE) AS hi
    FROM {table}, unnest(range(1, {dim} + 1)) AS t(d)
    GROUP BY t.d
  )"""
    nw = _n_words(dim)
    enc = ", ".join(_sql_word(emb_col, "p.thr", dim, w) for w in range(nw))
    if queries is not None:
        qrows = ", ".join(
            f"({qid}, ["
            + ", ".join(repr(float(x)) for x in qv)
            + "]::DOUBLE[])"
            for qid, qv in queries
        )
        q_src = f"SELECT * FROM (VALUES {qrows}) AS v(query_id, {emb_col})"
    else:
        if query_ids is None:
            raise ValueError("pass queries or query_ids")
        ids = ", ".join(str(int(i)) for i in query_ids)
        q_src = (
            f"SELECT {id_col}::INTEGER AS query_id, {emb_col} "
            f"FROM {table} WHERE {id_col} IN ({ids})"
        )
    ham = " + ".join(
        f"bit_count(xor(q.qwords[{w + 1}], c.words[{w + 1}]))::BIGINT"
        for w in range(nw)
    )
    return f"""
WITH params AS (
  {params_cte}
),
coded AS (
  SELECT {id_col} AS vec_id, [{enc}] AS words
  FROM {table}, params p
),
q AS (
  SELECT query_id, [{enc}] AS qwords
  FROM ({q_src}), params p
),
scored AS (
  SELECT q.query_id, c.vec_id, {ham} AS hamming
  FROM coded c, q
),
ranked AS (
  SELECT query_id, vec_id, hamming,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY hamming ASC, vec_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, vec_id, hamming, rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""
