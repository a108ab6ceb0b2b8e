"""Learning-to-rank, closed form — ridge-regularized linear LTR.

A beyond-reference relevance feature (Elasticsearch LTR plugin shape,
pointwise): combine per-(query, doc) features (BM25, document signals,
a bias) into one learned linear score. Training is CLOSED FORM —
ridge-regularized normal equations — so it is deterministic,
cluster-scale and oracle-checkable end to end:

    w = (XᵀX + λI)⁻¹ Xᵀy

Pinned semantics (cross-engine, re-derived in :func:`duckdb_ltr_sql`
for n = 3 features via Cramer's rule):

- XᵀX and Xᵀy are plain aggregate sums over the feature rows — ONE
  distributed pass producing n² + n numbers (n is small; the driver
  holds an n×n matrix, never data);
- rows with any NULL feature or label are dropped (complete-case);
- λ >= 0 adds to the diagonal (λ = 0 is plain least squares); a
  singular system raises driver-side (the SQL twin divides by the
  determinant — entries pin well-conditioned fixtures);
- scoring is a pure linear column expression; ranking the engine's
  pinned order.

Scale shape: training = one map-side-combined aggregate (n²+n sums);
scoring adds zero joins beyond whatever produced the features. The
feature table itself is typically a scored-matches output joined with
doc-side columns — all verified machinery.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.operators.topk import topk_per_query


def train_linear_ranker(
    features_df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    l2: float = 0.0,
) -> list[float]:
    """Closed-form ridge weights over (query_id, doc_id, features,
    label) rows. Returns one weight per feature column (driver-side
    floats — bounded, broadcastable)."""
    n = len(feature_cols)
    if n == 0:
        raise ValueError("feature_cols must be non-empty")
    if l2 < 0:
        raise ValueError(f"l2 must be >= 0, got {l2}")
    cols = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    complete = y.isNotNull()
    for c in cols:
        complete = complete & c.isNotNull()
    rows = features_df.filter(complete)
    aggs = []
    for i in range(n):
        for j in range(i, n):
            aggs.append(F.sum(cols[i] * cols[j]).alias(f"xx_{i}_{j}"))
    for i in range(n):
        aggs.append(F.sum(cols[i] * y).alias(f"xy_{i}"))
    got = rows.agg(*aggs).collect()[0]
    if got[0] is None:
        raise ValueError("no complete-case training rows")
    xtx = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            xtx[i, j] = xtx[j, i] = float(got[f"xx_{i}_{j}"])
    xty = np.array([float(got[f"xy_{i}"]) for i in range(n)])
    xtx += float(l2) * np.eye(n)
    try:
        w = np.linalg.solve(xtx, xty)
    except np.linalg.LinAlgError as exc:
        raise ValueError(f"singular normal equations: {exc}") from None
    return [float(x) for x in w]


def ltr_score_topk(
    features_df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    k: int = 10,
) -> DataFrame:
    """Top-k under the learned linear score (query_id INT, doc_id,
    score DOUBLE, rank INT). Rows with a NULL feature never rank."""
    if len(weights) != len(feature_cols):
        raise ValueError("weights/feature_cols length mismatch")
    score = None
    for w, c in zip(weights, feature_cols):
        term = F.lit(float(w)) * F.col(c).cast("double")
        score = term if score is None else score + term
    scored = features_df.select(
        "query_id", "doc_id", score.alias("score")
    ).filter(F.col("score").isNotNull())
    return topk_per_query(scored, k)


def duckdb_ltr_sql(
    features_sql: str,
    feature_cols: list[str],
    label_expr: str,
    l2: float = 0.0,
    k: int = 10,
    round_score: int = 6,
) -> str:
    """DuckDB twin of train(3 features) → score → rank: the normal
    equations re-derive as aggregate sums, the 3×3 solve as CRAMER'S
    RULE (no linear-algebra library — a genuinely independent
    derivation of the same weights), scoring + ranking the pinned
    order. ``features_sql`` must yield (query_id, doc_id, f1, f2, f3
    AS the names in feature_cols); ``label_expr`` is evaluated over
    that relation."""
    if len(feature_cols) != 3:
        raise ValueError("the SQL twin pins the 3-feature solve")
    f1, f2, f3 = feature_cols
    det3 = (
        "(a11*(a22*a33 - a23*a32) - a12*(a21*a33 - a23*a31)"
        " + a13*(a21*a32 - a22*a31))"
    )

    def _rep(col_map: dict[str, str]) -> str:
        out = det3
        # longest keys first so a13 never partially rewrites a1
        for key in sorted(col_map, key=len, reverse=True):
            out = out.replace(key, col_map[key])
        return out

    base = {
        "a11": "m.s11", "a12": "m.s12", "a13": "m.s13",
        "a21": "m.s12", "a22": "m.s22", "a23": "m.s23",
        "a31": "m.s13", "a32": "m.s23", "a33": "m.s33",
    }
    d0 = _rep(base)
    d1 = _rep({**base, "a11": "m.b1", "a21": "m.b2", "a31": "m.b3"})
    d2 = _rep({**base, "a12": "m.b1", "a22": "m.b2", "a32": "m.b3"})
    d3 = _rep({**base, "a13": "m.b1", "a23": "m.b2", "a33": "m.b3"})
    return f"""
WITH feats AS ({features_sql}),
labeled AS (
  SELECT *, ({label_expr}) AS y FROM feats
  WHERE {f1} IS NOT NULL AND {f2} IS NOT NULL AND {f3} IS NOT NULL
    AND ({label_expr}) IS NOT NULL
),
m AS (
  SELECT sum({f1}*{f1}) + {float(l2)!r} AS s11,
         sum({f1}*{f2}) AS s12,
         sum({f1}*{f3}) AS s13,
         sum({f2}*{f2}) + {float(l2)!r} AS s22,
         sum({f2}*{f3}) AS s23,
         sum({f3}*{f3}) + {float(l2)!r} AS s33,
         sum({f1}*y) AS b1,
         sum({f2}*y) AS b2,
         sum({f3}*y) AS b3
  FROM labeled
),
w AS (
  SELECT {d1} / {d0} AS w1, {d2} / {d0} AS w2, {d3} / {d0} AS w3
  FROM m
),
scored AS (
  SELECT f.query_id, f.doc_id,
         w.w1 * f.{f1} + w.w2 * f.{f2} + w.w3 * f.{f3} AS score
  FROM feats f, w
  WHERE f.{f1} IS NOT NULL AND f.{f2} IS NOT NULL AND f.{f3} IS NOT NULL
),
ranked AS (
  SELECT query_id, doc_id, score, row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(score, 9) DESC, doc_id ASC
  ) AS rank
  FROM scored
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""
