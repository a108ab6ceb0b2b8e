"""HNSW graph-based ANN: graph invariants, determinism, and
rank-identity to the exact brute-force scorer (the same recall-pinning
contract as dedup_minhash in test_dedup)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline import ann
from same_same_spark.pipeline.hnsw import HnswGraph, hnsw_candidates, hnsw_topk


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _qvecs(emb, ids=(0, 1, 2)):
    rows = (
        emb.filter(F.col("vec_id").isin(*ids))
        .select("vec_id", "embedding")
        .collect()
    )
    by_id = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    return [(int(i), by_id[i]) for i in ids]


# -- graph unit invariants ---------------------------------------------


def _toy_graph(n=400, d=24, m=8, seed=11):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64) * 7 + 3
    return ids, vecs, HnswGraph(ids, vecs, m=m, ef_construction=48)


def test_graph_degree_caps():
    _, _, g = _toy_graph()
    for node, layers in enumerate(g._links):
        for layer, links in enumerate(layers):
            cap = g.m0 if layer == 0 else g.m
            assert len(links) <= cap, (node, layer)
            assert len(set(links)) == len(links)  # no duplicate edges
            assert node not in links  # no self-loop


def test_graph_build_deterministic():
    ids, vecs, g1 = _toy_graph(seed=5)
    g2 = HnswGraph(ids, vecs, m=8, ef_construction=48)
    assert g1._entry == g2._entry
    assert all(a == b for a, b in zip(g1._links, g2._links))


def test_ef_construction_is_wired():
    """The construction beam must actually respond to the knob: a
    wider beam reshapes the adjacency."""
    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(300, 24))
    ids = np.arange(300, dtype=np.int64)
    g_small = HnswGraph(ids, vecs, m=4, ef_construction=4)
    g_big = HnswGraph(ids, vecs, m=4, ef_construction=128)
    assert g_small._links != g_big._links


def test_graph_exhaustive_ef_is_exact():
    """ef == n forces the layer-0 search to visit the whole connected
    graph → result equals the exact top-k (connectivity invariant)."""
    ids, vecs, g = _toy_graph(n=300)
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    rng = np.random.default_rng(99)
    for _ in range(5):
        q = rng.normal(size=vecs.shape[1])
        sims = unit @ (q / np.linalg.norm(q))
        order = np.lexsort((ids, -np.round(sims, 12)))
        expect = list(ids[order[:10]])
        got = list(g.search(q, ef=len(ids), k=10))
        assert got == expect


def test_graph_zero_query_returns_smallest_ids():
    ids, vecs, g = _toy_graph(n=50)
    got = list(g.search(np.zeros(vecs.shape[1]), ef=8, k=5))
    assert got == list(ids[:5])  # all-ties → id ASC, like cosine_col


def test_graph_recall_high_at_moderate_ef():
    ids, vecs, g = _toy_graph(n=800, d=32, seed=7)
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    rng = np.random.default_rng(3)
    total = 0.0
    for _ in range(20):
        q = rng.normal(size=32)
        true10 = set(ids[np.argsort(-(unit @ (q / np.linalg.norm(q))))[:10]])
        got = set(int(x) for x in g.search(q, ef=64, k=10))
        total += len(true10 & got) / 10
    assert total / 20 >= 0.95


# -- Spark path ---------------------------------------------------------


def test_hnsw_rank_identical_to_brute(spark, emb):
    """Entry configuration: candidates cover the true top-k at this
    scale, so the output is rank- AND score-identical to brute_topk."""
    queries = _qvecs(emb)
    brute = ann.brute_topk(emb, queries, k=5).collect()
    got = hnsw_topk(
        emb, queries, k=5, m=8, ef_construction=64, ef_search=128, n_graphs=4
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    brute_rows = {(r["query_id"], r["rank"]): r for r in brute}
    assert sorted(key(r) for r in got) == sorted(brute_rows)
    for r in got:
        b = brute_rows[key(r)]
        assert r["vec_id"] == b["vec_id"]
        assert abs(r["score"] - b["score"]) < 1e-12


def test_hnsw_deterministic_across_runs(spark, emb):
    queries = _qvecs(emb, ids=(3, 4))
    a = hnsw_topk(emb, queries, k=7, n_graphs=3).collect()
    b = hnsw_topk(emb, queries, k=7, n_graphs=3).collect()
    norm = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 12))
        for r in rows
    )
    assert norm(a) == norm(b)


def test_hnsw_candidates_partition_by_graph(spark, emb):
    """Each vec_id lands in exactly one graph → no duplicate
    (query_id, vec_id) candidate pairs."""
    queries = _qvecs(emb, ids=(0,))
    cand = hnsw_candidates(emb, queries, ef_search=32, n_graphs=4).collect()
    pairs = [(r["query_id"], r["vec_id"]) for r in cand]
    assert len(pairs) == len(set(pairs))


def test_hnsw_plan_shape(spark, emb):
    """One hash-partition exchange feeds the graphs; the exact re-rank
    joins are BROADCASTs (candidates and queries are tiny) — never a
    sort-merge join over the corpus."""
    df = hnsw_topk(emb, _qvecs(emb, ids=(0,)), k=5, n_graphs=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "SortMergeJoin" not in plan


def test_persisted_store_identical_to_querytime(spark, emb, tmp_path):
    """Reload-vs-rebuild: the persisted probe must be rank- AND
    score-identical to hnsw_topk with the same parameters (build
    determinism + verbatim adjacency state)."""
    from same_same_spark.pipeline.hnsw import (
        build_hnsw_store,
        hnsw_topk_persisted,
    )

    out = str(tmp_path / "hnsw_store")
    manifest = build_hnsw_store(emb, out, m=8, ef_construction=64, n_graphs=3)
    assert manifest["n_vectors"] == emb.count()
    queries = _qvecs(emb)
    live = hnsw_topk(
        emb, queries, k=5, m=8, ef_construction=64, ef_search=96, n_graphs=3
    ).collect()
    persisted = hnsw_topk_persisted(
        spark, out, queries, k=5, ef_search=96
    ).collect()
    norm = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 12))
        for r in rows
    )
    assert norm(live) == norm(persisted)


def test_graph_state_roundtrip():
    from same_same_spark.pipeline.hnsw import graph_from_state, graph_state

    ids, vecs, g = _toy_graph(n=120, seed=21)
    st = graph_state(g)
    g2 = graph_from_state(
        ids, vecs, st["links"], st["entry"], st["max_level"], m=g.m
    )
    rng = np.random.default_rng(4)
    for _ in range(5):
        q = rng.normal(size=vecs.shape[1])
        assert list(g.search(q, 32, 10)) == list(g2.search(q, 32, 10))


def test_store_append_recall_and_commit_protocol(spark, emb, tmp_path):
    """Append half the corpus to a store built on the other half:
    probe must equal brute force over the union (candidates cover —
    same recall contract), a crash-window orphan dir is invisible until
    the manifest flips, and a committed batch retries as a no-op."""
    import json
    import os

    from pyspark.sql import functions as F

    from same_same_spark.pipeline import ann
    from same_same_spark.pipeline.hnsw import (
        build_hnsw_store,
        hnsw_store_append,
        hnsw_topk_persisted,
    )

    out = str(tmp_path / "store")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    build_hnsw_store(first, out, m=8, ef_construction=64, n_graphs=3)
    m0 = json.load(open(os.path.join(out, "manifest.json")))
    m1 = hnsw_store_append(spark, out, rest, batch="b1")
    assert m1["gen"] == m0["gen"] + 1 and "b1" in m1["batches"]
    assert m1["n_vectors"] == emb.count()
    assert not os.path.exists(os.path.join(out, "graphs"))  # swept

    queries = _qvecs(emb)
    got = hnsw_topk_persisted(spark, out, queries, k=5, ef_search=128).collect()
    brute = ann.brute_topk(emb, queries, k=5).collect()
    norm = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in rows
    )
    assert norm(got) == norm(brute)

    # idempotent retry of a committed batch: manifest untouched
    m2 = hnsw_store_append(spark, out, rest, batch="b1")
    assert m2 == m1

    # duplicate live ids in a NEW batch are refused
    import pytest as _pytest

    with _pytest.raises(Exception, match="ids already in the graph"):
        hnsw_store_append(spark, out, rest.limit(3), batch="b2")


def test_store_append_orphan_generation_is_invisible(spark, emb, tmp_path):
    """Crash window: a graphs-<gen> dir written WITHOUT the manifest
    flip — probes keep answering from the old generation."""
    import shutil

    from pyspark.sql import functions as F

    from same_same_spark.pipeline.hnsw import (
        build_hnsw_store,
        hnsw_topk_persisted,
    )

    out = str(tmp_path / "store")
    first = emb.filter(F.col("vec_id") < 100)
    build_hnsw_store(first, out, n_graphs=2)
    queries = _qvecs(emb, ids=(0, 1))
    before = hnsw_topk_persisted(spark, out, queries, k=5).collect()
    # simulate the crash: orphan generation dir, no manifest flip
    shutil.copytree(f"{out}/graphs", f"{out}/graphs-1")
    after = hnsw_topk_persisted(spark, out, queries, k=5).collect()
    assert sorted(map(str, before)) == sorted(map(str, after))


def test_ann_store_append_delete_lifecycle(spark, emb, tmp_path):
    """LSH/IVF stores: append equals fresh-build-over-union exactly
    (row-wise deterministic structures); deletes tombstone; uncommitted
    batch dirs are invisible; re-appending a tombstoned id is refused."""
    import os
    import pytest as _pytest
    from pyspark.sql import functions as F

    from same_same_spark.pipeline import ann as ann_ops
    from same_same_spark.pipeline import ann_store

    cents = ann_ops.centroids_by_label(emb)
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    ann_store.build_ann_index(first, inc, n_planes=8, centroids=cents)
    ann_store.build_ann_index(emb, full, n_planes=8, centroids=cents)
    ann_store.append_ann_index(rest, inc, batch="b1")

    queries = _qvecs(emb)
    norm = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in rows
    )
    for fn, kw in (
        (ann_store.lsh_topk_persisted, {"max_hamming": 1}),
        (ann_store.ivf_topk_persisted, {"nprobe": 3}),
    ):
        assert norm(fn(spark, inc, queries, k=5, **kw).collect()) == norm(
            fn(spark, full, queries, k=5, **kw).collect()
        )

    # idempotent retry
    m = ann_store.append_ann_index(rest, inc, batch="b1")
    assert m["batches"] == ["base", "b1"]
    # live-id clash refused
    with _pytest.raises(Exception, match="already live"):
        ann_store.append_ann_index(rest.limit(2), inc, batch="b2")

    # delete = anti-joined out of every probe, exactly
    top_id = norm(
        ann_store.lsh_topk_persisted(spark, inc, queries[:1], k=1).collect()
    )[0][2]
    ann_store.delete_from_ann_index(spark, inc, [top_id])
    got = ann_store.lsh_topk_persisted(spark, inc, queries[:1], k=5).collect()
    assert all(r["vec_id"] != top_id for r in got)
    # survivors match a fresh build without the deleted id
    clean = str(tmp_path / "clean")
    ann_store.build_ann_index(
        emb.filter(F.col("vec_id") != top_id), clean, n_planes=8,
        centroids=cents,
    )
    want = ann_store.lsh_topk_persisted(spark, clean, queries[:1], k=5).collect()
    assert norm(got) == norm(want)
    # tombstoned id cannot come back
    with _pytest.raises(Exception, match="tombstoned"):
        ann_store.append_ann_index(
            emb.filter(F.col("vec_id") == top_id), inc, batch="b3"
        )
    # uncommitted batch dirs (crash window) are invisible to probes
    os.makedirs(os.path.join(inc, "lsh", "batch=zz", "sig=0"), exist_ok=True)
    before = norm(
        ann_store.lsh_topk_persisted(spark, inc, queries[:1], k=5).collect()
    )
    assert before == norm(got)


def test_hnsw_store_delete_matches_survivor_brute(spark, emb, tmp_path):
    """Delete the top hit: probe equals brute over the survivors (beam
    widened per graph, dead candidates dropped before scoring) — and a
    tombstoned id cannot be re-appended."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from same_same_spark.pipeline import ann
    from same_same_spark.pipeline.hnsw import (
        build_hnsw_store,
        delete_from_hnsw_store,
        hnsw_store_append,
        hnsw_topk_persisted,
    )

    out = str(tmp_path / "store")
    build_hnsw_store(emb, out, n_graphs=3)
    queries = _qvecs(emb, ids=(0, 1))
    norm = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in rows
    )
    # vec 0 is query 0's self-hit; delete it (and one more)
    delete_from_hnsw_store(spark, out, [0, 7])
    got = hnsw_topk_persisted(spark, out, queries, k=5, ef_search=128).collect()
    assert all(r["vec_id"] not in (0, 7) for r in got)
    survivors = emb.filter(~F.col("vec_id").isin(0, 7))
    want = ann.brute_topk(survivors, queries, k=5).collect()
    assert norm(got) == norm(want)
    with _pytest.raises(Exception, match="tombstoned"):
        hnsw_store_append(
            spark, out, emb.filter(F.col("vec_id") == 0), batch="back"
        )


def test_stores_compose_with_streaming_ingest(spark, emb, tmp_path):
    """foreachBatch-shaped ingest: each micro-batch appends into the
    persisted LSH/IVF store AND the HNSW store with the batch id as the
    (idempotent) commit token — the same retry contract Structured
    Streaming gives foreachBatch."""
    from pyspark.sql import functions as F

    from same_same_spark.pipeline import ann as ann_ops
    from same_same_spark.pipeline import ann_store
    from same_same_spark.pipeline.hnsw import (
        build_hnsw_store,
        hnsw_store_append,
        hnsw_topk_persisted,
    )

    cents = ann_ops.centroids_by_label(emb)
    inc = str(tmp_path / "inc")
    hdir = str(tmp_path / "hnsw")
    seed = emb.filter(F.col("vec_id") % 3 == 0)
    ann_store.build_ann_index(seed, inc, n_planes=8, centroids=cents)
    build_hnsw_store(seed, hdir, n_graphs=2)

    def sink(batch_df, batch_id: int) -> None:
        ann_store.append_ann_index(batch_df, inc, batch=f"b{batch_id}")
        hnsw_store_append(spark, hdir, batch_df, batch=f"b{batch_id}")

    # two micro-batches + a duplicate delivery of the second (retries
    # must be no-ops)
    sink(emb.filter(F.col("vec_id") % 3 == 1), 0)
    sink(emb.filter(F.col("vec_id") % 3 == 2), 1)
    sink(emb.filter(F.col("vec_id") % 3 == 2), 1)

    queries = _qvecs(emb)
    norm = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in rows
    )
    brute = norm(ann_ops.brute_topk(emb, queries, k=5).collect())
    assert (
        norm(
            hnsw_topk_persisted(
                spark, hdir, queries, k=5, ef_search=128
            ).collect()
        )
        == brute
    )
    full = str(tmp_path / "full")
    ann_store.build_ann_index(emb, full, n_planes=8, centroids=cents)
    assert norm(
        ann_store.lsh_topk_persisted(spark, inc, queries, k=5).collect()
    ) == norm(ann_store.lsh_topk_persisted(spark, full, queries, k=5).collect())


def test_append_refusals_and_empty_batches(spark, emb, tmp_path):
    """Both store families refuse intra-batch duplicate ids, NULL ids,
    cross-dim live-id re-appends, and unsafe batch names; empty
    micro-batches commit their token without writing."""
    import json
    import os
    import pytest as _pytest
    from pyspark.sql import functions as F

    from same_same_spark.pipeline import ann as ann_ops
    from same_same_spark.pipeline import ann_store
    from same_same_spark.pipeline.hnsw import build_hnsw_store, hnsw_store_append

    cents = ann_ops.centroids_by_label(emb)
    first = emb.filter(F.col("vec_id") < 200)
    inc = str(tmp_path / "inc")
    hdir = str(tmp_path / "hnsw")
    ann_store.build_ann_index(first, inc, n_planes=8, centroids=cents)
    build_hnsw_store(first, hdir, n_graphs=2)

    dup_batch = emb.filter(F.col("vec_id").isin(300, 301)).unionByName(
        emb.filter(F.col("vec_id") == 300)
    )
    null_batch = spark.createDataFrame(
        [(None, [0.0] * 64, 0)], "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    cross_dim = spark.createDataFrame(
        [(5, [1.0, 2.0], 0)], "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    empty = emb.filter(F.lit(False))

    for name, bad, match in [
        ("d1", dup_batch, "duplicate ids"),
        ("n1", null_batch, "NULL id"),
    ]:
        with _pytest.raises(Exception, match=match):
            ann_store.append_ann_index(bad, inc, batch=name)
        with _pytest.raises(Exception, match=match):
            hnsw_store_append(spark, hdir, bad, batch=name)
    with _pytest.raises(Exception, match="bad batch name"):
        ann_store.append_ann_index(empty, inc, batch="v=2")
    with _pytest.raises(Exception, match="bad batch name"):
        hnsw_store_append(spark, hdir, empty, batch="a/b")
    # id 5 is live at dim 64; re-append at dim 2 must be refused too
    with _pytest.raises(Exception, match="already in the graph"):
        hnsw_store_append(spark, hdir, cross_dim, batch="x1")

    # empty batches commit their token, write nothing, and retry no-op
    m1 = ann_store.append_ann_index(empty, inc, batch="e1")
    assert "e1" in m1["batches"]
    assert not os.path.exists(os.path.join(inc, "lsh", "batch=e1"))
    assert ann_store.append_ann_index(empty, inc, batch="e1") == m1
    h1 = hnsw_store_append(spark, hdir, empty, batch="e1")
    assert "e1" in h1["batches"]
    assert h1["gen"] == 0  # no generation rewrite for an empty batch
    hm = json.load(open(os.path.join(hdir, "manifest.json")))
    assert hm["graphs_dir"] == "graphs"


def test_hnsw_mixed_dims_probe_own_dimension(spark, emb):
    """A foreign-dimension vector can never become a candidate for a
    64-dim query (search.go:17-19 scan-time dim filter)."""
    extra = emb.sparkSession.createDataFrame(
        [(10_000, [1.0, 2.0, 3.0], 0)],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    )
    mixed = emb.unionByName(extra)
    queries = _qvecs(emb, ids=(0, 1))
    got = hnsw_topk(mixed, queries, k=5, ef_search=128, n_graphs=2).collect()
    assert all(r["vec_id"] != 10_000 for r in got)
    # and a 3-dim query only ever sees the 3-dim vector
    got3 = hnsw_topk(mixed, [(7, [1.0, 2.0, 3.0])], k=5, n_graphs=2).collect()
    assert [r["vec_id"] for r in got3] == [10_000]


# -- edge repair (delete-heavy store maintenance) ------------------------


def test_graph_repair_invariants():
    """Repair drops the dead set, keeps survivor insertion order,
    preserves degree caps / no-dup / no-self-loop / no-dead-ref
    invariants, stays deterministic, and keeps the exhaustive-ef
    search exact (connectivity survives the removal)."""
    ids, vecs, g = _toy_graph(n=400, d=24, seed=21)
    rng = np.random.default_rng(4)
    dead = np.sort(rng.choice(400, size=120, replace=False))
    g.repair(dead)
    live = np.setdiff1d(np.arange(400), dead)
    assert list(g.ids) == list(ids[live])
    for node, layers in enumerate(g._links):
        for layer, links in enumerate(layers):
            cap = g.m0 if layer == 0 else g.m
            assert len(links) <= cap, (node, layer)
            assert len(set(links)) == len(links)
            assert node not in links
            assert all(0 <= nb < len(g.ids) for nb in links)
    assert len(g._links[g._entry]) - 1 == g._max_level
    # determinism: independent repair of an identical graph
    g2 = HnswGraph(ids, vecs, m=8, ef_construction=48)
    g2.repair(dead)
    assert g._entry == g2._entry and g._links == g2._links
    # exhaustive ef == exact over the survivors (connectivity)
    unit = vecs[live] / np.linalg.norm(vecs[live], axis=1)[:, None]
    for _ in range(5):
        q = rng.normal(size=24)
        sims = unit @ (q / np.linalg.norm(q))
        order = np.lexsort((ids[live], -np.round(sims, 12)))
        assert list(g.search(q, ef=len(live), k=10)) == list(ids[live][order[:10]])


def test_graph_repair_delete_heavy_bridges_chains():
    """Deleting 70% (including the entry point) must not sever the
    survivors: dead-only paths bridge, orphans re-link, recall at
    moderate ef stays high."""
    ids, vecs, g = _toy_graph(n=600, d=16, seed=8)
    rng = np.random.default_rng(17)
    dead = set(map(int, rng.choice(600, size=420, replace=False)))
    dead.add(g._entry)  # force an entry-point replacement
    dead_arr = np.sort(np.fromiter(dead, dtype=np.int64))
    g.repair(dead_arr)
    live = np.setdiff1d(np.arange(600), dead_arr)
    unit = vecs[live] / np.linalg.norm(vecs[live], axis=1)[:, None]
    total = 0.0
    for _ in range(20):
        q = rng.normal(size=16)
        true10 = set(ids[live][np.argsort(-(unit @ (q / np.linalg.norm(q))))[:10]])
        got = set(int(x) for x in g.search(q, ef=64, k=10))
        total += len(true10 & got) / 10
    assert total / 20 >= 0.95
    # exhaustive ef still exact: nothing became unreachable
    q = rng.normal(size=16)
    sims = unit @ (q / np.linalg.norm(q))
    order = np.lexsort((ids[live], -np.round(sims, 12)))
    assert list(g.search(q, ef=len(live), k=10)) == list(ids[live][order[:10]])


def test_graph_repair_all_dead_and_empty():
    ids, vecs, g = _toy_graph(n=40, seed=3)
    g.repair(np.arange(40))
    assert len(g.ids) == 0 and g._entry == -1
    assert list(g.search(vecs[0], ef=8)) == []
    g.repair(np.empty(0, dtype=np.int64))  # no-op on an empty graph


def test_repair_store_rebuild_byte_identical_to_fresh(spark, emb, tmp_path):
    """mode='rebuild': the repaired store's graph rows (links, entry,
    node order — everything) equal a fresh build over the survivors."""
    from same_same_spark.pipeline.hnsw import (
        build_hnsw_store,
        delete_from_hnsw_store,
        hnsw_topk_persisted,
        repair_hnsw_store,
    )

    out = str(tmp_path / "store")
    build_hnsw_store(emb, out, n_graphs=3)
    dead = [0, 7, 21, 36]
    delete_from_hnsw_store(spark, out, dead)
    m = repair_hnsw_store(spark, out, mode="rebuild")
    assert "tomb_gen" not in m
    fresh = str(tmp_path / "fresh")
    build_hnsw_store(emb.filter(~F.col("vec_id").isin(dead)), fresh, n_graphs=3)
    canon = lambda df: sorted(  # noqa: E731
        (r["graph_id"], r["dim"], r["node"], r["vec_id"],
         tuple(map(tuple, r["links"])), r["entry_node"], r["max_level"],
         tuple(round(x, 12) for x in r["emb"]))
        for r in df.collect()
    )
    got = spark.read.parquet(f"{out}/{m['graphs_dir']}")
    want = spark.read.parquet(f"{fresh}/graphs")
    assert canon(got) == canon(want)
    # and the probe agrees with the fresh store exactly
    queries = _qvecs(emb, ids=(1, 2))
    norm = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in rows
    )
    assert norm(hnsw_topk_persisted(spark, out, queries, k=5).collect()) == norm(
        hnsw_topk_persisted(spark, fresh, queries, k=5).collect()
    )


def test_repair_store_lifecycle(spark, emb, tmp_path):
    """mode='repair': post-repair probes (no beam widening left) match
    brute over the survivors; untouched subgraphs pass through
    verbatim; tombstone dirs are swept; a previously-deleted id can be
    re-appended; repairing a clean store is a no-op."""
    import os

    from same_same_spark.pipeline import ann
    from same_same_spark.pipeline.hnsw import (
        build_hnsw_store,
        delete_from_hnsw_store,
        hnsw_store_append,
        hnsw_topk_persisted,
        repair_hnsw_store,
    )

    out = str(tmp_path / "store")
    build_hnsw_store(emb, out, n_graphs=3)
    before = {
        r["graph_id"]: None
        for r in spark.read.parquet(f"{out}/graphs").select("graph_id").collect()
    }
    assert len(before) == 3
    # all dead ids route to one graph so the other two must pass through
    n_graphs = 3
    import pyspark.sql.functions as _F
    gid_rows = (
        emb.select("vec_id", _F.pmod(_F.xxhash64("vec_id"), _F.lit(n_graphs)).alias("g"))
        .filter(_F.col("g") == 0)
        .limit(6)
        .collect()
    )
    dead = [int(r["vec_id"]) for r in gid_rows]
    assert dead
    pre = spark.read.parquet(f"{out}/graphs").filter(~F.col("graph_id").isin(0))
    pre_rows = sorted(map(str, pre.collect()))
    delete_from_hnsw_store(spark, out, dead)
    m = repair_hnsw_store(spark, out)  # default mode='repair'
    assert "tomb_gen" not in m
    assert not [d for d in os.listdir(out) if d.startswith("tomb-")]
    post = spark.read.parquet(f"{out}/{m['graphs_dir']}").filter(
        ~F.col("graph_id").isin(0)
    )
    assert sorted(map(str, post.collect())) == pre_rows  # verbatim
    queries = _qvecs(emb, ids=(1, 2))
    norm = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in rows
    )
    survivors = emb.filter(~F.col("vec_id").isin(dead))
    assert norm(
        hnsw_topk_persisted(spark, out, queries, k=5, ef_search=128).collect()
    ) == norm(ann.brute_topk(survivors, queries, k=5).collect())
    # deleted ids may come back after the repair (tombstones compacted)
    m2 = hnsw_store_append(
        spark, out, emb.filter(F.col("vec_id") == dead[0]), batch="back"
    )
    assert "back" in m2["batches"]
    got = hnsw_topk_persisted(spark, out, queries, k=5, ef_search=128).collect()
    want = ann.brute_topk(
        emb.filter(~F.col("vec_id").isin(dead[1:])), queries, k=5
    ).collect()
    assert norm(got) == norm(want)
    # clean store → idempotent no-op (manifest untouched)
    assert repair_hnsw_store(spark, out) == m2


def test_compact_ann_index_lifecycle(spark, emb, tmp_path):
    """LSH/IVF tombstone compaction: live rows rewrite to fresh
    generation dirs, probes match a fresh build over the survivors
    WITHOUT the anti-join, tombstone dirs disappear, deleted ids may
    re-append, refresh_centroids still composes, and a clean store is
    a no-op."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from same_same_spark.pipeline import ann as ann_ops
    from same_same_spark.pipeline import ann_store

    cents = ann_ops.centroids_by_label(emb)
    inc = str(tmp_path / "inc")
    ann_store.build_ann_index(emb, inc, n_planes=8, centroids=cents)
    dead = [0, 7, 21]
    ann_store.delete_from_ann_index(spark, inc, dead)
    m = ann_store.compact_ann_index(spark, inc)
    assert m["tomb_gen"] == 0
    assert m["lsh_dir"] == "lsh-1" and m["ivf_dir"] == "ivf-1"
    assert not [d for d in os.listdir(inc) if d.startswith("tomb-")]
    assert not os.path.exists(os.path.join(inc, "lsh"))
    assert not os.path.exists(os.path.join(inc, "ivf"))

    clean = str(tmp_path / "clean")
    survivors = emb.filter(~F.col("vec_id").isin(dead))
    ann_store.build_ann_index(survivors, clean, n_planes=8, centroids=cents)
    queries = _qvecs(emb, ids=(0, 1, 2))
    norm = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in rows
    )
    for fn, kw in (
        (ann_store.lsh_topk_persisted, {"max_hamming": 1}),
        (ann_store.ivf_topk_persisted, {"nprobe": 3}),
    ):
        assert norm(fn(spark, inc, queries, k=5, **kw).collect()) == norm(
            fn(spark, clean, queries, k=5, **kw).collect()
        )

    # a previously-deleted id may come back after compaction
    m2 = ann_store.append_ann_index(
        emb.filter(F.col("vec_id") == dead[0]), inc, batch="back"
    )
    assert "back" in m2["batches"]
    got = ann_store.lsh_topk_persisted(spark, inc, queries, k=5).collect()
    want_src = emb.filter(~F.col("vec_id").isin(dead[1:]))
    full2 = str(tmp_path / "full2")
    ann_store.build_ann_index(want_src, full2, n_planes=8, centroids=cents)
    assert norm(got) == norm(
        ann_store.lsh_topk_persisted(spark, full2, queries, k=5).collect()
    )

    # compaction composes with a later centroid refresh
    ann_store.delete_from_ann_index(spark, inc, [dead[0]])
    ann_store.refresh_centroids(spark, inc, centroids=cents)
    mr = ann_store.compact_ann_index(spark, inc)
    assert mr["tomb_gen"] == 0 and mr["ivf_dir"] == "ivf-3"
    # clean store → idempotent no-op
    assert ann_store.compact_ann_index(spark, inc) == mr
    # compacting to empty is refused
    empty_store = str(tmp_path / "tiny")
    two = emb.filter(F.col("vec_id").isin(0, 1))
    ann_store.build_ann_index(two, empty_store, n_planes=8, centroids=cents)
    ann_store.delete_from_ann_index(spark, empty_store, [0, 1])
    with _pytest.raises(Exception, match="empty"):
        ann_store.compact_ann_index(spark, empty_store)


def test_store_mutation_lineage_records(spark, emb, tmp_path):
    """Every store mutation commits a _lineage record with executor
    totals — the stores' counterpart to the index's per-group lineage;
    blind retries overwrite by token instead of duplicating."""
    import json
    import os

    from pyspark.sql import functions as F

    from same_same_spark.pipeline import ann as ann_ops
    from same_same_spark.pipeline import ann_store
    from same_same_spark.pipeline.hnsw import (
        build_hnsw_store,
        delete_from_hnsw_store,
        hnsw_store_append,
        repair_hnsw_store,
    )

    def rec(store, name):
        p = os.path.join(store, "_lineage", f"{name}.json")
        assert os.path.exists(p), name
        with open(p) as f:
            r = json.load(f)
        assert "shuffle_write_bytes" in r["exec"], name
        return r

    cents = ann_ops.centroids_by_label(emb)
    first = emb.filter(F.col("vec_id") < 300)
    rest = emb.filter(F.col("vec_id") >= 300)
    inc = str(tmp_path / "inc")
    ann_store.build_ann_index(first, inc, n_planes=8, centroids=cents)
    ann_store.append_ann_index(rest, inc, batch="b1")
    ann_store.delete_from_ann_index(spark, inc, [0])
    ann_store.compact_ann_index(spark, inc)
    assert rec(inc, "build-base")["op"] == "build"
    a = rec(inc, "append-b1")
    assert a["op"] == "append" and a["rows"] == rest.count()
    c = rec(inc, "compact-1")
    assert c["tombstones_cleared"] == 1
    assert c["live_rows"] == emb.count() - 1
    # blind retry of the committed append: no-op, lineage unchanged
    before = rec(inc, "append-b1")
    ann_store.append_ann_index(rest, inc, batch="b1")
    assert rec(inc, "append-b1") == before

    hdir = str(tmp_path / "hnsw")
    build_hnsw_store(first, hdir, n_graphs=2)
    hnsw_store_append(spark, hdir, rest, batch="b1")
    delete_from_hnsw_store(spark, hdir, [0, 7])
    repair_hnsw_store(spark, hdir)
    assert rec(hdir, "build-base")["rows"] == first.count()
    assert rec(hdir, "append-b1")["rows"] == rest.count()
    r = rec(hdir, "repair-2")  # gen 1 was the append, 2 the repair
    assert r["mode"] == "repair" and r["tombstones_cleared"] == 2
    assert r["live_rows"] == emb.count() - 2


def test_graph_repair_clustered_survivors_stay_reachable():
    """Adversarial reconnect case: a tight cluster plus
    opposite-direction outliers at m=2 — the degree heuristic loves the
    cluster and (without pinned in-links) evicted every reconnect
    backlink, leaving survivors unreachable at ANY ef. Post-fix the
    exhaustive-ef search must find exactly the live set, and repair
    must stay deterministic."""
    for seed in (0, 1, 2, 3, 4):
        rng = np.random.default_rng(seed)
        base = rng.normal(size=16)
        base /= np.linalg.norm(base)
        cluster = base + 0.01 * rng.normal(size=(100, 16))
        outliers = -base + 0.05 * rng.normal(size=(20, 16))
        vecs = np.vstack([cluster, outliers])
        ids = np.arange(120, dtype=np.int64)
        g = HnswGraph(ids, vecs, m=2, ef_construction=8)
        dead = np.sort(rng.choice(120, size=70, replace=False))
        g.repair(dead)
        g2 = HnswGraph(ids, vecs, m=2, ef_construction=8)
        g2.repair(dead)
        assert g._links == g2._links and g._entry == g2._entry
        live = np.setdiff1d(np.arange(120), dead)
        n_live = len(live)
        # exhaustive search from a cluster-side AND an outlier-side
        # query must surface every survivor
        for q in (base, -base):
            got = set(int(x) for x in g.search(q, ef=n_live, k=n_live))
            assert got == set(int(x) for x in ids[live]), seed


def test_repair_store_empty_and_sweep_on_retry(spark, emb, tmp_path):
    """Repairing/compacting everything away is refused cleanly (no
    half-written generation left), and the no-op retry paths collect
    orphan dirs a crash between a flip and its sweep left behind."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from same_same_spark.pipeline import ann as ann_ops
    from same_same_spark.pipeline import ann_store
    from same_same_spark.pipeline.hnsw import (
        build_hnsw_store,
        delete_from_hnsw_store,
        repair_hnsw_store,
    )

    two = emb.filter(F.col("vec_id").isin(0, 1))
    hdir = str(tmp_path / "hnsw")
    build_hnsw_store(two, hdir, n_graphs=2)
    delete_from_hnsw_store(spark, hdir, [0, 1])
    with _pytest.raises(Exception, match="empty"):
        repair_hnsw_store(spark, hdir)
    # no orphan generation dir was left behind by the refusal
    assert not [d for d in os.listdir(hdir) if d.startswith("graphs-")]

    cents = ann_ops.centroids_by_label(emb)
    inc = str(tmp_path / "inc")
    ann_store.build_ann_index(two, inc, n_planes=8, centroids=cents)
    ann_store.delete_from_ann_index(spark, inc, [0, 1])
    with _pytest.raises(Exception, match="empty"):
        ann_store.compact_ann_index(spark, inc)
    assert not [d for d in os.listdir(inc) if d.startswith("lsh-")]

    # crash-between-flip-and-sweep simulation: orphan dirs that the
    # manifest no longer references must disappear on the next no-op
    full = str(tmp_path / "full")
    ann_store.build_ann_index(emb, full, n_planes=8, centroids=cents)
    for orphan in ("lsh-9", "ivf-9", "tomb-9"):
        os.makedirs(os.path.join(full, orphan), exist_ok=True)
    ann_store.compact_ann_index(spark, full)  # tomb_gen=0 → no-op
    for orphan in ("lsh-9", "ivf-9", "tomb-9"):
        assert not os.path.exists(os.path.join(full, orphan)), orphan

    hfull = str(tmp_path / "hfull")
    build_hnsw_store(emb, hfull, n_graphs=2)
    for orphan in ("graphs-9", "tomb-9"):
        os.makedirs(os.path.join(hfull, orphan), exist_ok=True)
    repair_hnsw_store(spark, hfull)  # no tombstones → no-op
    for orphan in ("graphs-9", "tomb-9"):
        assert not os.path.exists(os.path.join(hfull, orphan)), orphan
