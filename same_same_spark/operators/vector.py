"""X5/X6 + vector top-k — the reference's dense-vector search semantics.

Reference: ``internal/models/vector.go:37-68`` (cosine / euclidean) and
``internal/storage/search/search.go`` (scan → filter → score → sort →
top-k). Re-expressed as Column expressions (JVM, codegen'd) with an
Arrow/numpy ``mapInPandas`` fast path for wide embeddings.

Semantics pinned by the reference:
- cosine is 0.0 on dimension mismatch or zero norm (vector.go:42-52) —
  but the *scan* drops mismatched dims before scoring
  (search.go:17-19), so :func:`search_by_embedding` filters them out,
- euclidean is +Inf on dimension mismatch (vector.go:58-60),
- result order: score DESC with our pinned tie-break id ASC, top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_col(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 on dim mismatch or zero norm."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    dot = _dot(a, b)
    na = F.sqrt(_dot(a, a))
    nb = F.sqrt(_dot(b, b))
    return (
        F.when(F.size(a) != F.size(b), F.lit(0.0))
        .when((na == 0.0) | (nb == 0.0), F.lit(0.0))
        .otherwise(dot / (na * nb))
    )


def euclidean_col(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance; +Infinity on dim mismatch (vector.go:58-60)."""
    a = (F.col(a) if isinstance(a, str) else a).cast("array<double>")
    b = (F.col(b) if isinstance(b, str) else b).cast("array<double>")
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return F.when(F.size(a) != F.size(b), F.lit(float("inf"))).otherwise(dist)


def search_by_embedding(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    method: str = "builtin",
) -> DataFrame:
    """Brute-force cosine top-k (the reference's whole engine, distributed).

    (id, score DOUBLE), ordered (round(score,9) DESC, id ASC), limit k —
    Spark turns orderBy+limit into a distributed top-k
    (TakeOrderedAndProject), never a full global sort.

    ``method='arrow'`` uses a numpy matrix product per Arrow batch —
    preferred for dim ≳ 256 where per-element Column expressions get
    expensive.
    """
    q = [float(x) for x in query_vec]
    filtered = df.filter(F.size(embedding_col) == len(q))

    if method == "arrow":
        qv = np.asarray(q, dtype=np.float64)
        qn = np.linalg.norm(qv)
        out_schema = f"{id_col} LONG, score DOUBLE"

        def score_batches(it):
            for pdf in it:
                mat = np.array(
                    [np.asarray(e, dtype=np.float64) for e in pdf[embedding_col]]
                )
                if len(mat) == 0:
                    yield pd.DataFrame({id_col: [], "score": []})
                    continue
                norms = np.linalg.norm(mat, axis=1)
                denom = norms * qn
                sims = np.where(denom > 0, mat @ qv / np.where(denom == 0, 1, denom), 0.0)
                yield pd.DataFrame({id_col: pdf[id_col], "score": sims})

        scored = filtered.select(id_col, embedding_col).mapInPandas(
            score_batches, out_schema
        )
    else:
        qcol = F.array(*[F.lit(x) for x in q])
        scored = filtered.select(
            F.col(id_col), cosine_col(F.col(embedding_col), qcol).alias("score")
        )

    return scored.orderBy(
        F.desc(F.round(F.col("score"), 9)), F.asc(id_col)
    ).limit(k)
