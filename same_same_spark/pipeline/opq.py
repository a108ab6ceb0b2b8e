"""Optimized Product Quantization (Ge et al., CVPR 2013, "Optimized
Product Quantization for Approximate Nearest Neighbor Search").

Plain PQ quantizes each contiguous subspace independently, so its
error is dominated by whatever correlated / unbalanced-variance
structure happens to straddle the subspace cuts. OPQ learns one
orthogonal rotation ``R`` that redistributes variance and decorrelates
dimensions BEFORE the split, then runs ordinary PQ in the rotated
space. Because ``R`` is orthogonal, distances are preserved exactly
(``||Rq - Rx|| == ||q - x||``), so every downstream PQ piece —
:func:`~same_same_spark.pipeline.pq.pq_encode`, ADC LUT scoring, the
persisted IVF-PQ store — composes unchanged over rotated inputs.

Scale shape:

- **Training is driver-side on a bounded sample** (the standard
  practice: FAISS trains OPQ on ~10⁵ vectors regardless of corpus
  size). The alternating loop — fit per-subspace codebooks, encode,
  solve the orthogonal Procrustes problem via one d×d SVD — touches
  only the sample; nothing here scales with the corpus.
- **Applying the rotation is a map-only pass.** For small d the
  rotation inlines as literal column expressions (whole-stage
  codegen); above ``max_literal_floats`` total matrix entries (d² —
  a 64-dim rotation is already 4096 multiply-adds per row, past the
  measured janino comfort zone) it dispatches to an Arrow-batched
  numpy path computing the SAME left-to-right per-dimension
  accumulation, so both strategies are bit-equal (pinned in
  test_opq).
- Encoding / ADC / top-k after the rotation are exactly
  ``pipeline/pq.py`` — rotate is the only new moving part.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from same_same_spark.pipeline.pq import (
    _check_codebooks,
    _subspace_bounds,
    pq_adc_topk,
    pq_encode,
)

__all__ = [
    "train_opq",
    "rotate",
    "rotate_col",
    "rotate_pandas",
    "rotate_vector",
    "opq_encode",
    "opq_adc_topk",
    "quantization_error",
]


def _kmeans_np(
    X: np.ndarray, k: int, rng: np.random.RandomState, n_iter: int
) -> np.ndarray:
    """Deterministic local Lloyd's k-means for the driver-side trainer
    (k-means++ seeding from ``rng``; empty clusters re-seeded to the
    point farthest from its assigned center)."""
    n = len(X)
    if n < k:
        raise ValueError(f"need at least k={k} sample rows, got {n}")
    # k-means++ init
    cents = [X[rng.randint(n)]]
    d2 = np.full(n, np.inf)
    for _ in range(k - 1):
        d2 = np.minimum(
            d2, ((X - cents[-1][None, :]) ** 2).sum(axis=1)
        )
        total = float(d2.sum())
        if total <= 0.0:
            cents.append(X[rng.randint(n)])
            continue
        r = rng.random_sample() * total
        cents.append(X[min(np.searchsorted(np.cumsum(d2), r), n - 1)])
    C = np.asarray(cents, dtype=np.float64)
    for _ in range(n_iter):
        dist = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = dist.argmin(axis=1)
        newC = C.copy()
        for c in range(k):
            members = X[assign == c]
            if len(members):
                newC[c] = members.mean(axis=0)
            else:
                worst = int(dist[np.arange(n), assign].argmax())
                newC[c] = X[worst]
        if np.array_equal(newC, C):
            break
        C = newC
    return C


def _encode_np(
    Y: np.ndarray, codebooks: list[np.ndarray]
) -> np.ndarray:
    m = len(codebooks)
    bounds = _subspace_bounds(Y.shape[1], m)
    codes = np.empty((len(Y), m), dtype=np.int64)
    for s, (lo, hi) in enumerate(bounds):
        dist = (
            (Y[:, None, lo:hi] - codebooks[s][None, :, :]) ** 2
        ).sum(axis=2)
        codes[:, s] = dist.argmin(axis=1)
    return codes


def _decode_np(
    codes: np.ndarray, codebooks: list[np.ndarray]
) -> np.ndarray:
    return np.concatenate(
        [codebooks[s][codes[:, s]] for s in range(len(codebooks))], axis=1
    )


def train_opq(
    sample: "np.ndarray | list[list[float]]",
    m: int,
    n_codes: int,
    n_iter: int = 8,
    kmeans_iter: int = 10,
    seed: int = 13,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Alternating OPQ trainer over a driver-side sample.

    Each round: (1) fit per-subspace codebooks on the rotated sample,
    (2) encode + reconstruct, (3) update ``R`` by solving the
    orthogonal Procrustes problem ``min_R ||X Rᵀ - Ŷ||`` (one d×d SVD
    of ``Xᵀ Ŷ``). Returns ``(R, codebooks)`` with ``R`` row-major
    (``y = R @ x``) and codebooks in :mod:`pipeline.pq`'s layout.
    Deterministic for a fixed ``(sample, seed)`` (pinned in
    test_opq)."""
    X = np.asarray(sample, dtype=np.float64)
    if X.ndim != 2:
        raise ValueError("sample must be a 2-D (n, d) array")
    d = X.shape[1]
    _subspace_bounds(d, m)  # validates divisibility
    rng = np.random.RandomState(seed)
    R = np.eye(d)
    books: list[np.ndarray] = []
    for _ in range(max(1, n_iter)):
        Y = X @ R.T
        books = [
            _kmeans_np(Y[:, lo:hi], n_codes, rng, kmeans_iter)
            for lo, hi in _subspace_bounds(d, m)
        ]
        Yhat = _decode_np(_encode_np(Y, books), books)
        U, _s, Vt = np.linalg.svd(X.T @ Yhat)
        R = (U @ Vt).T
    # final codebooks for the final rotation
    Y = X @ R.T
    books = [
        _kmeans_np(Y[:, lo:hi], n_codes, rng, kmeans_iter)
        for lo, hi in _subspace_bounds(d, m)
    ]
    return (
        [[float(v) for v in row] for row in R],
        [[[float(v) for v in code] for code in cb] for cb in books],
    )


def _check_rotation(R: list[list[float]]) -> int:
    d = len(R)
    if d == 0 or any(len(row) != d for row in R):
        raise ValueError("R must be a non-empty square matrix")
    return d


def rotate_vector(R: list[list[float]], vec: list[float]) -> list[float]:
    """Driver-side ``R @ vec`` with the SAME left-to-right accumulation
    as :func:`rotate_col` (queries must rotate exactly like the corpus
    so ADC LUT distances line up)."""
    d = _check_rotation(R)
    if len(vec) != d:
        raise ValueError(f"vector dim {len(vec)} != rotation dim {d}")
    out = []
    for i in range(d):
        acc = 0.0
        for j in range(d):
            acc = acc + float(R[i][j]) * float(vec[j])
        out.append(acc)
    return out


def rotate_col(emb: Column, R: list[list[float]]) -> Column:
    """``R @ emb`` as literal column expressions (left-to-right sums
    per output dimension) — the small-d strategy."""
    d = _check_rotation(R)
    rows = []
    for i in range(d):
        acc = F.lit(0.0)
        for j in range(d):
            acc = acc + F.lit(float(R[i][j])) * emb[j]
        rows.append(acc)
    return F.array(*rows)


def rotate_pandas(
    df: DataFrame,
    R: list[list[float]],
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched rotation — the large-d strategy. Bit-equal to
    :func:`rotate_col`: per output dimension, an explicit left-to-right
    loop over the input dims in float64 (numpy's fused ``X @ R.T``
    would differ in the last ULPs)."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    d = _check_rotation(R)
    Rm = np.asarray(R, dtype=np.float64)
    out_schema = StructType(
        [df.schema[id_col], StructField("emb_rot", ArrayType(DoubleType()))]
    )

    def rot_iter(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            X = np.asarray(
                [list(map(float, e)) for e in pdf[embedding_col]],
                dtype=np.float64,
            )
            if X.shape[1] != d:
                raise ValueError(
                    f"embedding dim {X.shape[1]} != rotation dim {d}"
                )
            out = np.zeros((len(pdf), d), dtype=np.float64)
            for j in range(d):
                out = out + Rm[:, j][None, :] * X[:, j : j + 1]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "emb_rot": list(map(list, out))}
            )

    return df.select(id_col, embedding_col).mapInPandas(
        rot_iter, schema=out_schema
    )


def rotate(
    df: DataFrame,
    R: list[list[float]],
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    max_literal_floats: int = 512,
) -> DataFrame:
    """``(id, emb_rot)`` — literal expressions for small rotations,
    Arrow numpy above ``max_literal_floats`` matrix entries (d²); both
    strategies bit-equal (pinned in test_opq)."""
    d = _check_rotation(R)
    if d * d > max_literal_floats:
        return rotate_pandas(
            df, R, id_col=id_col, embedding_col=embedding_col
        )
    emb = F.col(embedding_col).cast("array<double>")
    return df.select(
        F.col(id_col), rotate_col(emb, R).alias("emb_rot")
    )


def opq_encode(
    df: DataFrame,
    R: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Rotate, then PQ-encode: ``(id, codes ARRAY<INT>)`` with
    :func:`pipeline.pq.pq_encode`'s exact argmin semantics in the
    rotated space."""
    _check_codebooks(codebooks)
    rotated = rotate(df, R, id_col=id_col, embedding_col=embedding_col)
    return pq_encode(
        rotated, codebooks, id_col=id_col, embedding_col="emb_rot"
    )


def opq_adc_topk(
    codes_df: DataFrame,
    R: list[list[float]],
    codebooks: list[list[list[float]]],
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """ADC top-k over OPQ codes: queries rotate driver-side (same
    accumulation order as the corpus rotation), then score through
    :func:`pipeline.pq.pq_adc_topk` unchanged. Because ``R`` is
    orthogonal the ADC distances approximate ORIGINAL-space squared
    distances — same contract as plain PQ, smaller error."""
    rq = [(qid, rotate_vector(R, qv)) for qid, qv in queries]
    return pq_adc_topk(
        codes_df, codebooks, rq, k=k, id_col=id_col, codes_col=codes_col
    )


def quantization_error(
    sample: "np.ndarray | list[list[float]]",
    R: list[list[float]],
    codebooks: list[list[list[float]]],
) -> float:
    """Mean squared reconstruction error of the (rotate → encode →
    decode → un-rotate) round trip on a driver-side sample — the
    quantity OPQ minimizes; tests pin OPQ ≤ plain PQ on correlated
    data."""
    X = np.asarray(sample, dtype=np.float64)
    Rm = np.asarray(R, dtype=np.float64)
    books = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    Y = X @ Rm.T
    Yhat = _decode_np(_encode_np(Y, books), books)
    Xhat = Yhat @ Rm
    return float(((X - Xhat) ** 2).sum(axis=1).mean())
