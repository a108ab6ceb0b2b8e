"""Product quantization: encode determinism (column expr == numpy ==
pure Python), reconstruction sanity, ADC vs exact-L2 recall, KMeans
trainer composition."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline import pq
from same_same_spark.pipeline.ann import centroids_by_label


@pytest.fixture(scope="module")
def emb(spark, embeddings):
    return embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


@pytest.fixture(scope="module")
def books(emb, embeddings):
    return pq.slice_codebooks(centroids_by_label(embeddings), m=8)


def _encode_py(vecs, codebooks):
    """Pure-Python reference encoder (left-to-right sums, round-9,
    min-code tiebreak)."""
    m = len(codebooks)
    dim = sum(len(cb[0]) for cb in codebooks)
    w = dim // m
    out = {}
    for i, v in vecs.items():
        codes = []
        for s in range(m):
            sub = v[s * w:(s + 1) * w]
            best = None
            for c, code in enumerate(codebooks[s]):
                acc = 0.0
                for a, b in zip(sub, code):
                    d = a - b
                    acc = acc + d * d
                key = (round(acc, 9), c)
                if best is None or key < best:
                    best = key
            codes.append(best[1])
        out[i] = codes
    return out


def test_pq_encode_matches_python_and_pandas(spark, emb, books):
    got_col = {
        r["vec_id"]: list(r["codes"])
        for r in pq.pq_encode(
            emb, books, max_literal_floats=10**9  # force the literal path
        ).collect()
    }
    got_np = {
        r["vec_id"]: list(r["codes"])
        for r in pq.pq_encode_pandas(emb, books).collect()
    }
    vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    exp = _encode_py(vecs, books)
    assert got_col == exp
    assert got_np == exp  # numpy path bit-equal to the column expr
    # codes actually vary (not a degenerate codebook)
    assert len({tuple(c) for c in got_col.values()}) > 10


def test_pq_reconstruction_beats_random_codes(spark, emb, books):
    codes = pq.pq_encode(emb, books)
    dec = pq.pq_decode(codes, books)
    err = (
        emb.join(dec, "vec_id")
        .select(
            F.aggregate(
                F.zip_with(
                    "embedding", "embedding_approx", lambda a, b: (a - b) ** 2
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("se")
        )
        .agg(F.avg("se"))
        .first()[0]
    )
    # worst-code baseline: assign every vector code 0 everywhere
    bad = codes.select("vec_id", F.expr(
        f"array({','.join(['0'] * len(books))})"
    ).alias("codes"))
    err_bad = (
        emb.join(pq.pq_decode(bad, books), "vec_id")
        .select(
            F.aggregate(
                F.zip_with(
                    "embedding", "embedding_approx", lambda a, b: (a - b) ** 2
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("se")
        )
        .agg(F.avg("se"))
        .first()[0]
    )
    assert err < err_bad


def test_pq_adc_is_exactly_decoded_l2(spark, emb, books):
    """ADC distance IS ||q - decode(x)||² (the subspace decomposition
    is exact, not approximate) — pin the full ranked output against a
    pure-Python reference using the same summation order."""
    qrows = emb.filter(F.col("vec_id").isin(0, 1, 2)).collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
               for r in qrows]
    codes_df = pq.pq_encode(emb, books)
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["dist"], 9))
        for r in pq.pq_adc_topk(codes_df, books, queries, k=10).collect()
    }
    codes = {r["vec_id"]: list(r["codes"]) for r in codes_df.collect()}
    m = len(books)
    dim = sum(len(cb[0]) for cb in books)
    w = dim // m
    exp = {}
    for qid, qv in queries:
        scored = []
        for i, cs in codes.items():
            total = 0.0
            for s in range(m):
                sub, code = qv[s * w:(s + 1) * w], books[s][cs[s]]
                acc = 0.0
                for a, b in zip(sub, code):
                    d = a - b
                    acc = acc + d * d
                total = total + acc
            scored.append((round(total, 9), i))
        for rank, (dist, i) in enumerate(sorted(scored)[:10], start=1):
            exp[(qid, rank)] = (i, dist)
    assert got == exp


def test_pq_adc_recall_sanity(spark, emb, books):
    """Recall floor: random 64-d embeddings + a 10-code label-mean
    codebook quantize coarsely, but top-10 overlap with exact L2 must
    still sit far above the 10/500 = 2% chance rate."""
    qrows = emb.filter(F.col("vec_id").isin(0, 1, 2)).collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
               for r in qrows]
    codes = pq.pq_encode(emb, books)
    got = pq.pq_adc_topk(codes, books, queries, k=10)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    hits = total = 0
    for qid, qv in queries:
        exact = sorted(
            vecs, key=lambda i: (round(math.dist(vecs[i], qv), 9), i)
        )[:10]
        hits += len(set(exact) & by_q[qid])
        total += 10
    assert hits / total >= 0.1


def test_pq_kmeans_trainer_composes(spark, emb):
    books = pq.train_pq_codebooks(emb, m=4, n_codes=8, seed=13)
    books2 = pq.train_pq_codebooks(emb, m=4, n_codes=8, seed=13)
    assert books == books2  # deterministic
    assert len(books) == 4 and all(len(cb) == 8 for cb in books)
    codes = pq.pq_encode_pandas(emb, books)
    assert codes.count() == emb.count()
    # trained codebooks reconstruct better than label-slice ones with
    # the same total code budget? not guaranteed — just sanity: all
    # subspace code ids in range
    mx = codes.select(F.max(F.array_max("codes"))).first()[0]
    assert 0 <= mx <= 7


def test_pq_validation_errors(spark, emb, books):
    with pytest.raises(ValueError, match="divisible"):
        pq.train_pq_codebooks(emb, m=7, n_codes=4)
    with pytest.raises(ValueError, match="dim"):
        pq.pq_adc_topk(
            pq.pq_encode(emb, books), books, [(0, [1.0, 2.0])], k=3
        )
    with pytest.raises(ValueError, match="non-empty"):
        pq.pq_encode(emb, [])


# ---------------------------------------------------------------------------
# persisted IVF-PQ store
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pq_store(spark, emb, embeddings, books, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pqstore") / "pq")
    manifest = pq.build_pq_store(
        emb, out,
        codebooks=books,
        centroids=centroids_by_label(embeddings),
    )
    return out, manifest


def test_pq_store_roundtrip(spark, pq_store, books, embeddings):
    out, manifest = pq_store
    m2, cents2, books2 = pq._load_pq_store(spark, out)
    assert m2 == manifest
    assert books2 == books
    assert cents2 == sorted(centroids_by_label(embeddings))
    assert manifest["n_vectors"] == 500


def test_pq_store_probe_matches_manual_adc(spark, pq_store, emb, books,
                                           embeddings):
    """Persisted probe (ADC-only) == encode + ADC restricted to the
    SAME probed cells, computed from the in-memory pieces."""
    out, _ = pq_store
    qrows = emb.filter(F.col("vec_id").isin(0, 1, 2)).collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
               for r in qrows]
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["dist"], 9))
        for r in pq.pq_topk_persisted(
            spark, out, queries, k=5, nprobe=3
        ).collect()
    }
    # manual: same coarse probe rule as ivf_topk_persisted
    import numpy as np

    from same_same_spark.pipeline.ann import assign_centroids

    cents = centroids_by_label(embeddings)
    asg = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_centroids(emb, cents).collect()
    }
    exp = {}
    for qid, qv in queries:
        q = np.asarray(qv)
        sims = []
        for cid, cvec in cents:
            c = np.asarray(cvec)
            sims.append((round(float(q @ c / (np.linalg.norm(q) *
                        np.linalg.norm(c))), 9), -cid))
        sims.sort(reverse=True)
        cells = {-nc for _, nc in sims[:3]}
        sub = emb.filter(
            F.col("vec_id").isin([i for i, c in asg.items() if c in cells])
        )
        ranked = pq.pq_adc_topk(
            pq.pq_encode(sub, books), books, [(qid, qv)], k=5
        )
        for r in ranked.collect():
            exp[(qid, r["rank"])] = (r["vec_id"], round(r["dist"], 9))
    assert got == exp


def test_pq_store_probe_is_partition_pruned(spark, pq_store, emb):
    import re

    out, _ = pq_store
    qrows = emb.filter(F.col("vec_id") == 0).collect()
    queries = [(0, [float(x) for x in qrows[0]["embedding"]])]
    df = pq.pq_topk_persisted(spark, out, queries, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    mt = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert mt and "centroid_id" in mt.group(1)


def test_pq_store_refine_reranks_exactly(spark, pq_store, emb):
    """With refine_df, the top refine_factor*k ADC candidates re-rank
    by exact cosine — verify against a python recomputation over the
    ADC candidate set."""
    import math

    out, _ = pq_store
    qrows = emb.filter(F.col("vec_id").isin(0, 1)).collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
               for r in qrows]
    adc = pq.pq_topk_persisted(spark, out, queries, k=5, nprobe=3,
                               refine_factor=4)
    # ADC-only with k=20 gives the candidate pool the refine step sees
    pool = pq.pq_topk_persisted(spark, out, queries, k=20, nprobe=3)
    refined = pq.pq_topk_persisted(
        spark, out, queries, k=5, nprobe=3,
        refine_df=emb, refine_factor=4,
    )
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return 0.0 if na == 0 or nb == 0 else d / (na * nb)

    cand_by_q = {}
    for r in pool.collect():
        cand_by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    got = {}
    for r in refined.collect():
        got[(r["query_id"], r["rank"])] = (r["vec_id"], round(r["score"], 9))
    exp = {}
    qv_by_id = dict(queries)
    for qid, cands in cand_by_q.items():
        scored = sorted(
            ((round(cos(vecs[i], qv_by_id[qid]), 9), i) for i in cands),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        for rank, (s, i) in enumerate(scored, start=1):
            exp[(qid, rank)] = (i, s)
    assert got == exp
    assert adc.columns == ["query_id", "vec_id", "dist", "rank"]
    assert refined.columns == ["query_id", "vec_id", "score", "rank"]


# ---------------------------------------------------------------------------
# in-cell PQ codes on the mutable ann_store (build/append/delete/compact/
# refresh all maintain the codes column; probes need no mirror)
# ---------------------------------------------------------------------------

from same_same_spark.pipeline import ann_store


def _queries(emb, ids=(0, 1, 2)):
    rows = emb.filter(F.col("vec_id").isin(*ids)).collect()
    return [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in rows]


def _probe(spark, d, queries, **kw):
    return sorted(
        map(tuple, ann_store.pq_cell_topk(spark, d, queries, **kw).collect())
    )


def test_pq_cell_probe_matches_pq_store(spark, emb, embeddings, books,
                                        tmp_path):
    """In-cell ADC over the mutable store == the dedicated IVF-PQ
    store's probe, same centroids/codebooks/probe rule."""
    cents = centroids_by_label(embeddings)
    cell_dir, pq_dir = str(tmp_path / "cell"), str(tmp_path / "pqs")
    ann_store.build_ann_index(
        emb, cell_dir, centroids=cents, pq_codebooks=books
    )
    pq.build_pq_store(emb, pq_dir, codebooks=books, centroids=cents)
    queries = _queries(emb)
    a = _probe(spark, cell_dir, queries, k=5, nprobe=3)
    b = sorted(map(tuple, pq.pq_topk_persisted(
        spark, pq_dir, queries, k=5, nprobe=3
    ).collect()))
    assert a == b and len(a) == 15


def test_pq_cell_mutation_matrix(spark, emb, embeddings, books, tmp_path):
    """append -> delete -> compact -> refresh, probing after each step;
    every state matches a fresh build over the surviving vectors."""
    cents = centroids_by_label(embeddings)
    d = str(tmp_path / "mut")
    ann_store.build_ann_index(
        emb.filter(F.col("vec_id") % 2 == 0), d,
        centroids=cents, pq_codebooks=books,
    )
    ann_store.append_ann_index(
        emb.filter(F.col("vec_id") % 2 == 1), d, "b1"
    )
    queries = _queries(emb)
    got = _probe(spark, d, queries, k=5, nprobe=3)

    full = str(tmp_path / "full")
    ann_store.build_ann_index(emb, full, centroids=cents, pq_codebooks=books)
    assert got == _probe(spark, full, queries, k=5, nprobe=3)

    # delete the current winners — they must vanish from the probe
    victims = sorted({t[1] for t in got})[:5]
    ann_store.delete_from_ann_index(spark, d, victims)
    got2 = _probe(spark, d, queries, k=5, nprobe=3)
    assert not {t[1] for t in got2} & set(victims)
    surv = str(tmp_path / "surv")
    ann_store.build_ann_index(
        emb.filter(~F.col("vec_id").isin(victims)), surv,
        centroids=cents, pq_codebooks=books,
    )
    assert got2 == _probe(spark, surv, queries, k=5, nprobe=3)

    # compact folds tombstones out; probe identical, re-append legal
    ann_store.compact_ann_index(spark, d)
    assert _probe(spark, d, queries, k=5, nprobe=3) == got2

    # refresh with the same centroids: codes survive the rewrite
    ann_store.refresh_centroids(spark, d, centroids=cents)
    assert _probe(spark, d, queries, k=5, nprobe=3) == got2
    m = ann_store._load_manifest(d)
    rows = spark.read.parquet(
        f"{d}/{ann_store._sub_dir(m, 'ivf')}"
    )
    assert rows.filter(F.col("codes").isNull()).count() == 0


def test_attach_pq_codes_matches_native_build(spark, emb, embeddings, books,
                                              tmp_path):
    plain, native = str(tmp_path / "plain"), str(tmp_path / "native")
    cents = centroids_by_label(embeddings)
    ann_store.build_ann_index(emb, plain, centroids=cents)
    with pytest.raises(ValueError, match="no in-cell PQ codes"):
        ann_store.pq_cell_topk(spark, plain, _queries(emb), k=5)
    m1 = ann_store.attach_pq_codes(spark, plain, books)
    ann_store.build_ann_index(emb, native, centroids=cents,
                              pq_codebooks=books)
    queries = _queries(emb)
    assert (
        _probe(spark, plain, queries, k=5, nprobe=3)
        == _probe(spark, native, queries, k=5, nprobe=3)
    )
    # blind retry is a no-op (no new generation)
    m2 = ann_store.attach_pq_codes(spark, plain, books)
    assert m2["ivf_gen"] == m1["ivf_gen"]
    # cosine probes still serve from the same store
    exact = ann_store.ivf_topk_persisted(spark, plain, queries, k=5,
                                         nprobe=3)
    assert exact.count() == 15


def test_pq_cell_rerank_matches_exact_ivf(spark, emb, embeddings, books,
                                          tmp_path):
    """rerank=True over ALL probed rows (refine_factor large enough)
    == the exact cosine IVF probe of the same store."""
    cents = centroids_by_label(embeddings)
    d = str(tmp_path / "rr")
    ann_store.build_ann_index(emb, d, centroids=cents, pq_codebooks=books)
    queries = _queries(emb)
    got = _probe(spark, d, queries, k=5, nprobe=3, rerank=True,
                 refine_factor=1000)
    exact = sorted(map(tuple, ann_store.ivf_topk_persisted(
        spark, d, queries, k=5, nprobe=3
    ).collect()))
    assert got == exact


def test_pq_cell_probe_is_partition_pruned(spark, emb, embeddings, books,
                                           tmp_path):
    import re

    cents = centroids_by_label(embeddings)
    d = str(tmp_path / "prune")
    ann_store.build_ann_index(emb, d, centroids=cents, pq_codebooks=books)
    queries = _queries(emb, ids=(0,))
    df = ann_store.pq_cell_topk(spark, d, queries, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    mt = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert mt and "centroid_id" in mt.group(1)
