"""Product quantization (IVF-PQ's compression half, Jégou et al. 2011,
"Product Quantization for Nearest Neighbor Search").

At 100 TB the embedding column IS the storage problem: a 1024-dim
float32 vector is 4 KB; its PQ code at m=64 subspaces × 256 codes is
64 BYTES — a 64× compression that also makes scoring a table lookup.
This module gives the three pieces:

- :func:`train_pq_codebooks` — per-subspace codebooks from seeded
  MLlib KMeans over the subvector slices (the production trainer;
  m sequential fits, each over an n×(d/m) projection).
- :func:`slice_codebooks` — derive subspace codebooks by slicing
  full-dimension centroids (mean-of-slice == slice-of-mean, so
  label-mean centroids give an oracle-reproducible codebook; used by
  the driver entry, and handy when an IVF coarse quantizer's centers
  should double as code seeds).
- :func:`pq_encode` — nearest code per subspace, pure JVM column math
  (literal codebooks, left-to-right ``F.aggregate`` distance sums,
  round-9 + code-id tiebreak so any SQL twin agrees). Codegen size is
  O(n_codes × dim) multiply-adds per row — right for codebooks up to
  a few thousand floats; beyond that use :func:`pq_encode_pandas`
  (Arrow-batched numpy, bit-equal results pinned by test).
- :func:`pq_adc_topk` — asymmetric-distance top-k: per query build the
  m × n_codes lookup table of squared subvector distances in Python
  (bounded, tiny), broadcast it as a literal, and score every code
  row with ``sum_s LUT[s][code_s]`` — a pure column aggregate over
  the codes array. No decode, no per-row Python, no full-dim math on
  the corpus side.

Scale: encode is a map-only pass; ADC scoring is a map-only pass +
the shared top-k reduction. Nothing shuffles on the corpus until the
bounded top-k. Compose with the IVF stores in ``ann_store.py`` for
partition-pruned probes over compressed cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_pq_codebooks",
    "slice_codebooks",
    "pq_encode",
    "pq_encode_pandas",
    "pq_decode",
    "pq_adc_topk",
    "build_pq_store",
    "pq_topk_persisted",
]

# codebooks type: list over subspaces; each entry is the ordered list
# of code vectors for that subspace: list[list[list[float]]]


def _check_codebooks(codebooks: list[list[list[float]]]) -> tuple[int, int]:
    if not codebooks:
        raise ValueError("codebooks must be non-empty")
    n_codes = len(codebooks[0])
    if n_codes == 0 or any(len(cb) != n_codes for cb in codebooks):
        raise ValueError("every subspace needs the same non-zero code count")
    return len(codebooks), n_codes


def _subspace_bounds(dim: int, m: int) -> list[tuple[int, int]]:
    """Contiguous [start, end) slices; dim must divide evenly so the
    encode/ADC layouts are unambiguous."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    w = dim // m
    return [(s * w, (s + 1) * w) for s in range(m)]


def train_pq_codebooks(
    df: DataFrame,
    m: int,
    n_codes: int,
    embedding_col: str = "embedding",
    seed: int = 13,
    max_iter: int = 20,
) -> list[list[list[float]]]:
    """Seeded per-subspace KMeans codebooks (the production trainer).

    m sequential MLlib fits, each over the n×(d/m) slice — the loop is
    over SUBSPACES (bounded, typically 8-64), not data; each fit is a
    distributed job. Deterministic for a fixed (input, seed)."""
    from same_same_spark.pipeline.ann_store import kmeans_centroids

    dim = len(
        df.select(F.col(embedding_col).cast("array<double>")).first()[0]
    )
    out = []
    for s, (lo, hi) in enumerate(_subspace_bounds(dim, m)):
        sub = df.select(
            F.slice(
                F.col(embedding_col).cast("array<double>"), lo + 1, hi - lo
            ).alias("emb")
        )
        cents = kmeans_centroids(
            sub, n_centroids=n_codes, embedding_col="emb", seed=seed + s,
            max_iter=max_iter,
        )
        # kmeans_centroids returns [(cid, vec)] with cid 0..k-1 ordered
        out.append([vec for _, vec in sorted(cents)])
    return out


def slice_codebooks(
    centroids: list[tuple[int, list[float]]], m: int
) -> list[list[list[float]]]:
    """Codebooks = full-dim centroids sliced per subspace, ordered by
    centroid id. mean(slice) == slice(mean), so label-mean centroids
    stay exactly reproducible in SQL."""
    cents = [vec for _, vec in sorted(centroids)]
    dim = len(cents[0])
    return [
        [[float(x) for x in c[lo:hi]] for c in cents]
        for lo, hi in _subspace_bounds(dim, m)
    ]


def _sqdist_expr(emb: Column, lo: int, code: list[float]) -> Column:
    """Left-to-right sum of squared diffs of emb[lo:lo+len(code)] vs a
    literal code vector — same association order as cosine_col."""
    acc = F.lit(0.0)
    for j, v in enumerate(code):
        d = emb[lo + j] - F.lit(float(v))
        acc = acc + d * d
    return acc


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    max_literal_floats: int = 512,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """``(id, *extra_cols, codes ARRAY<INT>)`` — per subspace, the code
    minimizing the squared distance (round-9, ties to the smaller code
    id). ``extra_cols`` pass through unchanged so callers embedding
    codes into a wider row (e.g. the in-cell ANN store) stay map-only
    instead of joining the codes back by id.

    Two bit-equal physical strategies (pinned in test_pq), chosen by
    codebook size: small codebooks inline as literal column
    expressions (map-only whole-stage codegen); above
    ``max_literal_floats`` total codebook floats the expression tree
    exceeds janino's method-size limits (measured: 10 codes × 64 dims
    already trips the codegen fallback), so encoding dispatches to the
    Arrow-batched numpy path — same distances, same round-9 argmin."""
    m, n_codes = _check_codebooks(codebooks)
    extra = list(extra_cols or [])
    if n_codes * sum(len(cb[0]) for cb in codebooks) > max_literal_floats:
        return pq_encode_pandas(
            df, codebooks, id_col=id_col, embedding_col=embedding_col,
            extra_cols=extra,
        )
    emb = F.col(embedding_col).cast("array<double>")
    dim = sum(len(cb[0]) for cb in codebooks)
    bounds = _subspace_bounds(dim, len(codebooks))
    code_cols = []
    for s, (lo, _hi) in enumerate(bounds):
        # array of (round9(dist), code_id) structs; array_min picks the
        # smallest dist then smallest code id — the pinned order
        cand = F.array(
            *[
                F.struct(
                    F.round(_sqdist_expr(emb, lo, codebooks[s][c]), 9)
                    .alias("d"),
                    F.lit(c).alias("c"),
                )
                for c in range(n_codes)
            ]
        )
        code_cols.append(F.array_min(cand)["c"])
    return df.select(
        F.col(id_col), *extra, F.array(*code_cols).alias("codes")
    )


def pq_encode_pandas(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Arrow-batched numpy encoder — the scale path for large
    codebooks where the literal-expression encoder's codegen would
    bloat. Bit-equal to :func:`pq_encode`: distances are computed
    with the SAME left-to-right accumulation (explicit loop over the
    subspace dims, float64), then round-9 + smaller-code tiebreak."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    m, n_codes = _check_codebooks(codebooks)
    extra = list(extra_cols or [])
    dim = sum(len(cb[0]) for cb in codebooks)
    bounds = _subspace_bounds(dim, m)
    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]

    out_schema = StructType(
        [df.schema[id_col]]
        + [df.schema[c] for c in extra]
        + [StructField("codes", ArrayType(IntegerType()))]
    )

    def encode_iter(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            embs = np.asarray(
                [list(map(float, e)) for e in pdf[embedding_col]],
                dtype=np.float64,
            )
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s, (lo, hi) in enumerate(bounds):
                sub = embs[:, lo:hi]  # (n, w)
                # left-to-right accumulation per dim (matches the
                # column expression's association order exactly)
                acc = np.zeros((len(pdf), n_codes), dtype=np.float64)
                for j in range(hi - lo):
                    d = sub[:, j : j + 1] - cbs[s][None, :, j]
                    acc = acc + d * d
                codes[:, s] = np.argmin(np.round(acc, 9), axis=1)
            out = {id_col: pdf[id_col]}
            out.update({c: pdf[c] for c in extra})
            out["codes"] = list(map(list, codes))
            yield pd.DataFrame(out)

    # extra may legitimately include embedding_col itself (a caller
    # keeping the raw vector next to its codes) — select each once
    sel = [id_col]
    for c in [*extra, embedding_col]:
        if c not in sel:
            sel.append(c)
    return df.select(*sel).mapInPandas(encode_iter, schema=out_schema)


def pq_decode(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """``(id, embedding_approx)`` — concatenate each subspace's code
    vector (the reconstruction ADC avoids; provided for error
    analysis and re-ranking pipelines)."""
    _check_codebooks(codebooks)
    lut = F.array(
        *[
            F.array(*[
                F.array(*[F.lit(float(x)) for x in code])
                for code in cb
            ])
            for cb in codebooks
        ]
    )
    m = len(codebooks)
    return codes_df.select(
        F.col(id_col),
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: lut[s][F.col(codes_col)[s]],
            )
        ).alias("embedding_approx"),
    )


def _lut_rows(
    codebooks: list[list[list[float]]],
    queries: list[tuple[int, list[float]]],
) -> list[tuple[int, list[list[float]]]]:
    """Per-query ADC lookup tables (m × n_codes squared subvector
    distances), computed driver-side with left-to-right sums."""
    dim = sum(len(cb[0]) for cb in codebooks)
    bounds = _subspace_bounds(dim, len(codebooks))
    rows = []
    for qid, qv in queries:
        if len(qv) != dim:
            raise ValueError(f"query {qid}: dim {len(qv)} != {dim}")
        lut = []
        for s, (lo, hi) in enumerate(bounds):
            sub = [float(x) for x in qv[lo:hi]]
            dists = []
            for code in codebooks[s]:
                acc = 0.0
                for a, b in zip(sub, code):
                    d = a - b
                    acc = acc + d * d
                dists.append(acc)
            lut.append(dists)
        rows.append((int(qid), lut))
    return rows


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes.

    Per query the m × n_codes LUT of squared subvector distances is
    computed driver-side (bounded: m·n_codes floats), embedded as a
    literal, and every row scores as ``sum_s LUT[s][code_s]`` — one
    aggregate over an int array, no decode. Output
    ``(query_id, id, dist, rank)``, rank 1..k by (round-9 dist ASC,
    id ASC) — approximate distances, exact given the codes."""
    m, n_codes = _check_codebooks(codebooks)
    spark = codes_df.sparkSession
    qdf = spark.createDataFrame(
        _lut_rows(codebooks, queries), "query_id INT, lut ARRAY<ARRAY<DOUBLE>>"
    )
    scored = (
        codes_df.select(id_col, codes_col)
        .crossJoin(F.broadcast(qdf))
        .select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.lit(0.0),
                lambda acc, s: acc + F.col("lut")[s][F.col(codes_col)[s]],
            ).alias("dist"),
        )
    )
    # ADC scores EVERY code row, so the candidate set is
    # corpus-proportional — rank through the bounded tournament
    # (operators/topk.py), never a per-query window whose single task
    # would hold the whole corpus. topk_per_query's pinned order is
    # (round(score,9) DESC, id ASC); negating the distance maps it to
    # (round(dist,9) ASC, id ASC) exactly (IEEE half-even rounding is
    # symmetric under negation).
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


# ---------------------------------------------------------------------------
# persisted IVF-PQ store — compressed codes behind the IVF coarse quantizer
# ---------------------------------------------------------------------------


def build_pq_store(
    df: DataFrame,
    out_dir: str,
    *,
    codebooks: list[list[list[float]]] | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
    m: int = 8,
    n_codes: int = 16,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    seed: int = 13,
) -> dict:
    """Persist an IVF-PQ structure: PQ codes partitioned by the IVF
    coarse centroid, so probes prune partitions AND score compressed.

    Layout::

        <out>/pq/centroid_id=<C>/...   (id, codes ARRAY<INT>)
        <out>/centroids/               (centroid_id, cvec)
        <out>/codebooks/               (s, c, code ARRAY<DOUBLE>)
        <out>/pq_manifest.json

    The cells store CODES ONLY (that is the point — an m-byte row, not
    a 4 KB vector); exact re-ranking reads the full-precision vectors
    from wherever the caller keeps them (``refine_df`` on the probe).
    Mutations are out of scope here by design: the full-precision IVF
    store (``ann_store.py``) owns the append/delete/compact/refresh
    matrix, and a PQ mirror re-derives from it with one
    :func:`pq_encode` pass over the changed cells.
    """
    import json
    import os

    from same_same_spark.pipeline.ann import assign_centroids
    from same_same_spark.pipeline.ann_store import (
        kmeans_centroids,
        write_store_lineage,
    )
    from same_same_spark.metrics import MetricsWindow

    spark = df.sparkSession
    e = df.select(
        F.col(id_col),
        F.col(embedding_col).cast("array<double>").alias("emb"),
    )
    if centroids is None:
        centroids = kmeans_centroids(
            e, n_centroids=n_centroids, embedding_col="emb", seed=seed
        )
    if codebooks is None:
        codebooks = train_pq_codebooks(
            e, m=m, n_codes=n_codes, embedding_col="emb", seed=seed + 1000
        )
    _check_codebooks(codebooks)

    assigned = assign_centroids(e, centroids, id_col=id_col, embedding_col="emb")
    codes = pq_encode(
        assigned.select(id_col, "emb", "centroid_id"),
        codebooks,
        id_col=id_col,
        embedding_col="emb",
    ).join(assigned.select(id_col, "centroid_id"), id_col)
    with MetricsWindow(spark) as mw:
        codes.write.mode("overwrite").partitionBy("centroid_id").parquet(
            f"{out_dir}/pq"
        )
    spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "centroid_id INT, cvec ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/centroids")
    spark.createDataFrame(
        [
            (s, c, [float(x) for x in code])
            for s, cb in enumerate(codebooks)
            for c, code in enumerate(cb)
        ],
        "s INT, c INT, code ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/codebooks")
    manifest = {
        "id_col": id_col,
        "m": len(codebooks),
        "n_codes": len(codebooks[0]),
        "n_centroids": len(centroids),
        "n_vectors": e.count(),
    }
    write_store_lineage(
        out_dir, "build-pq",
        {"op": "build_pq", "rows": manifest["n_vectors"],
         "exec": mw.totals()},
    )
    tmp = f"{out_dir}/pq_manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, f"{out_dir}/pq_manifest.json")
    return manifest


def _load_pq_store(spark, pq_dir: str):
    import json

    with open(f"{pq_dir}/pq_manifest.json") as f:
        manifest = json.load(f)
    cents = [
        (int(r["centroid_id"]), [float(x) for x in r["cvec"]])
        for r in spark.read.parquet(f"{pq_dir}/centroids").collect()
    ]
    books_rows = spark.read.parquet(f"{pq_dir}/codebooks").collect()
    books: list[dict[int, list[float]]] = [
        {} for _ in range(manifest["m"])
    ]
    for r in books_rows:
        books[int(r["s"])][int(r["c"])] = [float(x) for x in r["code"]]
    codebooks = [
        [sub[c] for c in range(manifest["n_codes"])] for sub in books
    ]
    return manifest, sorted(cents), codebooks


def _probe_pairs(
    cents: list[tuple[int, list[float]]],
    queries: list[tuple[int, list[float]]],
    nprobe: int,
) -> list[tuple[int, int]]:
    """Driver-side probe selection — ONE definition of the IVF probe
    rule (round-9 cosine DESC, smaller centroid id wins) shared by the
    persisted store and the PQ mirror, so their oracles stay
    rank-compatible by construction."""
    import numpy as np

    out: list[tuple[int, int]] = []
    for qid, qvec in queries:
        q = np.asarray(qvec, dtype=np.float64)
        qn = np.linalg.norm(q)
        sims = []
        for cid, cvec in sorted(cents):
            c = np.asarray(cvec, dtype=np.float64)
            denom = qn * np.linalg.norm(c)
            sims.append(
                (round(float(q @ c / denom) if denom else 0.0, 9), -cid)
            )
        sims.sort(reverse=True)
        out.extend((qid, -negcid) for _, negcid in sims[:nprobe])
    return out


def pq_topk_persisted(
    spark,
    pq_dir: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 3,
    *,
    refine_df: DataFrame | None = None,
    refine_factor: int = 4,
    id_col_refine: str = "vec_id",
    embedding_col_refine: str = "embedding",
) -> DataFrame:
    """Probe the persisted IVF-PQ store.

    Query→centroid cosines pick ``nprobe`` cells driver-side (the
    centroid table is tiny); the code scan reads ONLY those
    ``centroid_id=`` partitions (plan-asserted partition pruning in
    test_pq); rows score by ADC. Without ``refine_df`` the ADC ranking
    is returned (``(query_id, id, dist, rank)``, round-9 ASC order).
    With ``refine_df`` (the full-precision vectors), the top
    ``refine_factor × k`` ADC candidates — a bounded set — are
    re-ranked by exact cosine via one broadcast semi-join against the
    vector table: ``(query_id, id, score, rank)``, the standard
    IVF-PQ + re-rank serving stack."""
    manifest, cents, codebooks = _load_pq_store(spark, pq_dir)
    id_col = manifest["id_col"]
    probe_pairs = _probe_pairs(cents, queries, nprobe)
    probes = spark.createDataFrame(
        probe_pairs, "query_id INT, centroid_id INT"
    )
    codes = spark.read.parquet(f"{pq_dir}/pq").filter(
        F.col("centroid_id").isin(sorted({c for _, c in probe_pairs}))
    )
    # ONE plan for the whole query batch: the (query, cell) probe join
    # restricts each query to its own cells, the LUT join attaches the
    # per-query lookup table, and the tournament ranks — no per-query
    # driver loop, no unions proportional to the batch.
    adc_k = k if refine_df is None else max(k, refine_factor * k)
    out = _adc_rank(
        codes.join(F.broadcast(probes), "centroid_id"),
        codebooks, queries, adc_k, id_col,
    )
    if refine_df is None:
        return out.filter(F.col("rank") <= k)
    return _exact_rerank(
        spark, out, queries, refine_df, k, id_col,
        id_col_refine=id_col_refine,
        embedding_col_refine=embedding_col_refine,
    )


def _adc_rank(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    queries: list[tuple[int, list[float]]],
    k: int,
    id_col: str,
) -> DataFrame:
    """ADC-score ``codes`` (already restricted per query — e.g. by a
    probe join that attached ``query_id``, or a crossJoin upstream)
    against broadcast per-query LUTs and rank through the bounded
    tournament. ``(query_id, id, dist, rank)``, round-9 ASC order."""
    from same_same_spark.operators.topk import topk_per_query

    spark = codes.sparkSession
    m = len(codebooks)
    qlut = spark.createDataFrame(
        _lut_rows(codebooks, queries), "query_id INT, lut ARRAY<ARRAY<DOUBLE>>"
    )
    scored = codes.join(F.broadcast(qlut), "query_id").select(
        "query_id",
        F.col(id_col).alias("doc_id"),
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, s: acc + F.col("lut")[s][F.col("codes")[s]],
        ).alias("dist"),
    )
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


def _exact_rerank(
    spark,
    adc_out: DataFrame,
    queries: list[tuple[int, list[float]]],
    refine_df: DataFrame,
    k: int,
    id_col: str,
    *,
    id_col_refine: str = "vec_id",
    embedding_col_refine: str = "embedding",
) -> DataFrame:
    """Re-rank the bounded ADC candidate set by exact cosine against
    the full-precision vectors: ``(query_id, id, score, rank)``."""
    from same_same_spark.operators.topk import topk_per_query
    from same_same_spark.operators.vector import cosine_col

    cids = adc_out.select("query_id", F.col(id_col).alias("doc_id"))
    vecs = refine_df.select(
        F.col(id_col_refine).alias("doc_id"),
        F.col(embedding_col_refine).cast("array<double>").alias("emb"),
    )
    qdf = spark.createDataFrame(
        [(qid, [float(x) for x in qv]) for qid, qv in queries],
        "query_id INT, qvec ARRAY<DOUBLE>",
    )
    exact = (
        vecs.join(F.broadcast(cids), "doc_id")
        .join(F.broadcast(qdf), "query_id")
        .filter(F.size("emb") == F.size("qvec"))
        .select(
            "query_id", "doc_id",
            cosine_col(F.col("emb"), F.col("qvec")).alias("score"),
        )
    )
    ranked = topk_per_query(exact, k)
    return ranked.select(
        "query_id", F.col("doc_id").alias(id_col), "score", "rank"
    )
