"""Similarity search over an embedding column (``array<float>``).

Three strategies, one contract — ``(query_id, vec_id, score, rank)``
under the pinned total order (round(score, 9) DESC, vec_id ASC):

- :func:`brute_topk` — exact cosine against every vector; the
  correctness baseline (and exactly what the reference does for every
  query — ``internal/storage/search/search.go:16-29`` — distributed).
- :func:`lsh_topk` — random-hyperplane sign buckets; candidates =
  query's bucket ∪ hamming≤r neighbor buckets, exact cosine re-rank
  within candidates. Sub-linear at scale; recall < 1 by design.
- :func:`ivf_topk` — inverted-file: coarse-quantize vectors to their
  nearest centroid (one shuffle), probe the ``nprobe`` centroids
  closest to the query, exact re-rank within probed cells. Centroids
  come from any partitioner; at scale run MLlib KMeans and feed the
  centers in.

Hyperplanes are derived deterministically from :func:`plane_component`
(md5-based), so LSH results are reproducible across engines and runs —
no RNG state anywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from same_same_spark.operators.vector import cosine_col
from same_same_spark.pipeline.dedup import hash60_col

PLANE_SCALE = 1 << 20


def plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    Python twin of :func:`plane_component_col`; both reduce
    ``hash60("p{plane}_{dim}") mod 2^20`` to a float.
    """
    import hashlib

    h = int(hashlib.md5(f"p{plane}_{dim}".encode()).hexdigest()[:15], 16)
    return (h % PLANE_SCALE) / PLANE_SCALE * 2.0 - 1.0


def plane_component_col(plane: Column, dim: Column) -> Column:
    """JVM-side twin of :func:`plane_component`."""
    h = hash60_col(
        F.concat(F.lit("p"), plane.cast("string"), F.lit("_"), dim.cast("string"))
    )
    return (h % PLANE_SCALE) / F.lit(float(PLANE_SCALE)) * 2.0 - 1.0


def signature_col(emb: Column, n_planes: int = 8) -> Column:
    """Sign signature as a LONG: bit p = 1 iff emb · plane_p ≥ 0.

    Pure column expression — ``aggregate(zip_with(...))`` per plane, no
    Python in the hot path.
    """
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(
                emb,
                F.transform(
                    F.sequence(F.lit(0), F.size(emb) - 1),
                    lambda d: plane_component_col(F.lit(p), d),
                ),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def _signature_py(vec: list[float], n_planes: int = 8) -> int:
    sig = 0
    arr = np.asarray(vec, dtype=np.float64)
    for p in range(n_planes):
        plane = np.array(
            [plane_component(p, d) for d in range(len(arr))], dtype=np.float64
        )
        if float(arr @ plane) >= 0:
            sig |= 1 << p
    return sig


def _ranked(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 9)), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def _with_queries(
    df: DataFrame, queries: list[tuple[int, list[float]]]
) -> DataFrame:
    """Cross-join vectors against a tiny broadcast query frame."""
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(qid, [float(x) for x in vec]) for qid, vec in queries],
        "query_id INT, qvec ARRAY<DOUBLE>",
    )
    return df.crossJoin(F.broadcast(qdf))


def brute_topk(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for a batch of query vectors."""
    e = df.select(
        F.col(id_col), F.col(embedding_col).cast("array<double>").alias("emb")
    )
    scored = (
        _with_queries(e, queries)
        .filter(F.size("emb") == F.size("qvec"))
        .select(
            "query_id",
            id_col,
            cosine_col(F.col("emb"), F.col("qvec")).alias("score"),
        )
    )
    return _ranked(scored, k, id_col)


def lsh_topk(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    n_planes: int = 8,
    max_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share a sign bucket with the query
    (or one within hamming ≤ ``max_hamming``), exact re-rank within.

    The bucket column is computable at *ingest* time and persistable, so
    at scale the probe is a partition-pruned read, not a scan.
    """
    e = df.select(
        F.col(id_col), F.col(embedding_col).cast("array<double>").alias("emb")
    ).withColumn("sig", signature_col(F.col("emb"), n_planes))

    scored = (
        _with_queries(e, queries)
        .filter(F.size("emb") == F.size("qvec"))
        .withColumn(
            "qsig",
            F.lit(None).cast("long"),  # placeholder, replaced below
        )
    )
    # per-query signatures are tiny → compute driver-side, map via CASE
    qsigs = {qid: _signature_py(vec, n_planes) for qid, vec in queries}
    qsig_col = F.lit(None).cast("long")
    expr = None
    for qid, s in qsigs.items():
        cond = F.col("query_id") == qid
        expr = F.when(cond, F.lit(s)) if expr is None else expr.when(cond, F.lit(s))
    qsig_col = expr if expr is not None else qsig_col
    scored = scored.withColumn("qsig", qsig_col)

    cand = scored.filter(
        F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))) <= max_hamming
    )
    out = cand.select(
        "query_id",
        id_col,
        cosine_col(F.col("emb"), F.col("qvec")).alias("score"),
    )
    return _ranked(out, k, id_col)


def assign_centroids(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """``(id, emb, centroid_id)`` — nearest centroid by cosine (the IVF
    coarse quantizer). Centroid list is tiny → broadcast join."""
    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "centroid_id INT, cvec ARRAY<DOUBLE>",
    )
    e = df.select(
        F.col(id_col), F.col(embedding_col).cast("array<double>").alias("emb")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc(F.round(F.col("csim"), 9)), F.asc("centroid_id")
    )
    return (
        e.crossJoin(F.broadcast(cdf))
        .withColumn("csim", cosine_col(F.col("emb"), F.col("cvec")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "emb", "centroid_id")
    )


def centroids_by_label(
    df: DataFrame,
    label_col: str = "label",
    embedding_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Per-label mean embeddings as IVF centroids (a k-means stand-in;
    at scale feed MLlib KMeans centers instead). Tiny result → collect
    is bounded by n_labels × dim."""
    pos = df.select(
        F.col(label_col).cast("int").alias("centroid_id"),
        F.posexplode(F.col(embedding_col).cast("array<double>")).alias(
            "pos", "v"
        ),
    )
    means = (
        pos.groupBy("centroid_id", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("centroid_id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            "centroid_id", F.col("pm.m").alias("cvec")
        )
        .collect()
    )
    return [(int(r["centroid_id"]), list(r["cvec"])) for r in means]


def ivf_topk(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the ``nprobe`` centroids nearest each query,
    exact cosine re-rank within the probed cells only.

    At scale the centroid assignment is precomputed/persisted
    (partitioned by centroid_id → probing is partition pruning).
    """
    assigned = assign_centroids(df, centroids, id_col, embedding_col)

    # nprobe nearest centroids per query — tiny, driver-side exact
    probes = []
    for qid, qvec in queries:
        q = np.asarray(qvec, dtype=np.float64)
        qn = np.linalg.norm(q)
        sims = []
        for cid, cvec in centroids:
            c = np.asarray(cvec, dtype=np.float64)
            denom = qn * np.linalg.norm(c)
            sims.append((round(float(q @ c / denom) if denom else 0.0, 9), -cid))
        sims.sort(reverse=True)
        for s, negcid in sims[:nprobe]:
            probes.append((qid, -negcid))
    spark = df.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id INT, centroid_id INT")

    qdf = spark.createDataFrame(
        [(qid, [float(x) for x in vec]) for qid, vec in queries],
        "query_id INT, qvec ARRAY<DOUBLE>",
    )
    cand = assigned.join(F.broadcast(probe_df), "centroid_id").join(
        F.broadcast(qdf), "query_id"
    )
    scored = cand.filter(F.size("emb") == F.size("qvec")).select(
        "query_id",
        id_col,
        cosine_col(F.col("emb"), F.col("qvec")).alias("score"),
    )
    return _ranked(scored, k, id_col)


def brute_topk_filtered(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    predicate: str,
    k: int = 10,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Exact filtered k-NN — cosine top-k among the vectors whose row
    passes ``predicate`` (a SQL boolean over the frame's columns): the
    PRE-FILTER shape every vector store exposes as "kNN with metadata
    filter". Exact because the filter runs before ranking — a
    post-filter of an unfiltered top-k can return < k rows or miss
    true neighbors entirely (the classic filtered-kNN failure mode,
    why this is its own operator and not `.filter()` on brute_topk's
    OUTPUT).

    Scale shape: the predicate reaches the parquet scan (pushdown —
    it's a plain column filter ahead of the score math); everything
    after is brute_topk's plan on the surviving rows.
    """
    return brute_topk(
        df.filter(F.expr(predicate)), queries, k=k,
        id_col=id_col, embedding_col=embedding_col,
    )


def ivf_topk_filtered(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    centroids: list[tuple[int, list[float]]],
    predicate: str,
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Filtered IVF search: the metadata filter applies INSIDE the
    probed cells, before the exact re-rank — so recall vs
    :func:`brute_topk_filtered` is governed by ``nprobe`` exactly as
    unfiltered IVF recall is governed by it (the filter cannot add
    misses beyond unprobed cells). For ultra-selective filters raise
    ``nprobe`` (the standard vector-store guidance); a persisted store
    keeps this a partition-pruned read + a pushed-down filter.
    """
    return ivf_topk(
        df.filter(F.expr(predicate)), queries, centroids, k=k,
        nprobe=nprobe, id_col=id_col, embedding_col=embedding_col,
    )


def range_search(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    min_score: float,
    max_results: int = 1000,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Radius (range) vector search: every vector whose cosine
    similarity to the query is >= ``min_score`` — the
    OpenSearch/pgvector radius query and ES kNN's ``similarity``
    post-filter, exact.

    Pinned semantics: membership compares at the engine's rank
    precision (``round(score, 9) >= round(min_score, 9)`` — a
    threshold a half-ulp from a score must cut identically on both
    engines); results rank under the pinned ``(round(score, 9) DESC,
    id ASC)`` and truncate to ``max_results`` (a radius query's
    result set is data-dependent — the cap bounds every downstream
    buffer exactly like top-k; callers page with a tighter radius or
    a bigger cap). Dimension mismatches are ignored (the batch rule).

    Scale shape: identical to ``brute_topk`` — map-side broadcast
    scoring, the filter prunes BEFORE the tournament so only
    above-threshold rows shuffle.
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    if max_results < 1:
        raise ValueError(f"max_results must be >= 1, got {max_results}")
    e = df.select(
        F.col(id_col),
        F.col(embedding_col).cast("array<double>").alias("emb"),
    )
    scored = (
        _with_queries(e, queries)
        .filter(F.size("emb") == F.size("qvec"))
        .select(
            "query_id",
            id_col,
            cosine_col(F.col("emb"), F.col("qvec")).alias("score"),
        )
        .filter(
            F.round(F.col("score"), 9)
            >= F.round(F.lit(float(min_score)), 9)
        )
    )
    return _ranked(scored, max_results, id_col)
