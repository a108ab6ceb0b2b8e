"""HNSW approximate nearest-neighbor search (Malkov & Yashunin,
arXiv:1603.09320) — the graph-based ANN family, alongside
:mod:`~same_same_spark.pipeline.ann`'s LSH and IVF.

Spark-first shape:

- vectors are hashed into ``n_graphs`` disjoint groups (one shuffle,
  the same ingest-time partitioning :mod:`ann_store` persists), and
  each group builds an independent in-memory HNSW graph inside ONE
  ``applyInPandas`` call — numpy only, no per-row Python;
- every graph answers every query with ``ef_search`` candidates; the
  union of per-graph candidates (``n_queries × n_graphs × ef_search``
  rows — tiny) is broadcast-joined back to the vectors and re-ranked
  with the exact JVM-side :func:`cosine_col`, so the output is
  **rank-identical to** :func:`~same_same_spark.pipeline.ann.brute_topk`
  whenever the candidate union covers the true top-k (pinned
  empirically in tests, the same contract as the minhash recall pin);
- at scale the graphs parallelize across executors (each partition
  holds one graph), queries batch (one job answers the whole batch),
  and the exact re-rank touches only candidates — never the corpus.

Everything is deterministic: level assignment draws its uniform from
``md5("hnsw:<id>")`` (no RNG state), insertion order is id-ascending
within a graph, and every heap/selection tie breaks on node id. Two
builds of the same group produce byte-identical graphs, so results
are reproducible across runs and cluster layouts.

Reference parity: the reference scores every vector for every query
(``internal/storage/search/search.go:16-29``); HNSW is the sub-linear
scale path with the exact scan as its correctness oracle.
"""

from __future__ import annotations

import hashlib
import heapq
import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from same_same_spark.operators.vector import cosine_col
from same_same_spark.pipeline.ann import _ranked

__all__ = [
    "HnswGraph",
    "hnsw_candidates",
    "hnsw_topk",
    "build_hnsw_store",
    "hnsw_store_append",
    "delete_from_hnsw_store",
    "repair_hnsw_store",
    "hnsw_topk_persisted",
]

_U_SCALE = 1 << 48


def _level_unit(vec_id: int) -> float:
    """Deterministic uniform in (0, 1] for level assignment —
    ``md5("hnsw:<id>")`` reduced mod 2^48 (no RNG state, same value on
    every build)."""
    h = int(hashlib.md5(f"hnsw:{vec_id}".encode()).hexdigest()[:12], 16)
    return (h % _U_SCALE + 1) / _U_SCALE


class HnswGraph:
    """In-memory HNSW over one vector group. Cosine similarity space
    (vectors L2-normalized once at build; zero vectors keep cosine 0,
    matching :func:`cosine_col`).

    ``ids`` must be sorted ascending — insertion order IS id order, so
    the graph (and therefore search) is deterministic.
    """

    def __init__(
        self,
        ids: np.ndarray,
        vecs: np.ndarray,
        m: int = 8,
        ef_construction: int = 64,
    ):
        if len(ids) != len(vecs):
            raise ValueError("ids and vecs length mismatch")
        if len(ids) > 1 and not (np.diff(ids) > 0).all():
            raise ValueError("ids must be sorted ascending and unique")
        self.ids = np.asarray(ids, dtype=np.int64)
        vecs = np.asarray(vecs, dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1) if len(vecs) else np.empty(0)
        self.unit = vecs / np.where(norms == 0.0, 1.0, norms)[:, None] if len(vecs) else vecs
        self.m = int(m)
        self.m0 = 2 * self.m
        self.ml = 1.0 / math.log(self.m) if self.m > 1 else 1.0
        self.efc = max(int(ef_construction), self.m)
        # adjacency: _links[node][layer] -> list[int] (node indexes)
        self._links: list[list[list[int]]] = []
        self._entry = -1
        self._max_level = -1
        for i in range(len(self.ids)):
            self._insert(i)

    # -- internals ----------------------------------------------------

    def _node_level(self, i: int) -> int:
        return int(-math.log(_level_unit(int(self.ids[i]))) * self.ml)

    def _sim(self, q: np.ndarray, node: int) -> float:
        return float(self.unit[node] @ q)

    def _greedy(self, q: np.ndarray, ep: int, layer: int) -> int:
        """ef=1 descent: hop to the best neighbor until local optimum.
        Ties keep the current node (stable under id-ordered lists)."""
        best, best_sim = ep, self._sim(q, ep)
        improved = True
        while improved:
            improved = False
            for nb in self._links[best][layer]:
                s = self._sim(q, nb)
                if s > best_sim:
                    best, best_sim, improved = nb, s, True
        return best

    def _search_layer(
        self, q: np.ndarray, eps: list[int], ef: int, layer: int
    ) -> list[tuple[float, int]]:
        """Classic ef-search: returns up to ``ef`` (sim, node) pairs,
        unsorted. Heap ties break on node index (== id order)."""
        visited = set(eps)
        # candidates: max-heap by sim → store (-sim, node)
        cand = [(-self._sim(q, e), e) for e in eps]
        heapq.heapify(cand)
        # results: min-heap by sim so the worst pops first
        res = [(self._sim(q, e), e) for e in eps]
        heapq.heapify(res)
        while len(res) > ef:
            heapq.heappop(res)
        while cand:
            neg_s, node = heapq.heappop(cand)
            if res and -neg_s < res[0][0] and len(res) >= ef:
                break
            for nb in self._links[node][layer]:
                if nb in visited:
                    continue
                visited.add(nb)
                s = self._sim(q, nb)
                if len(res) < ef or s > res[0][0]:
                    heapq.heappush(cand, (-s, nb))
                    heapq.heappush(res, (s, nb))
                    if len(res) > ef:
                        heapq.heappop(res)
        return res

    def _select(self, q: np.ndarray, cands: list[tuple[float, int]], m: int) -> list[int]:
        """Top-``m`` by (sim DESC, node ASC) — simple selection (the
        paper's Algorithm 3); deterministic."""
        return [n for _, n in sorted(cands, key=lambda t: (-t[0], t[1]))[:m]]

    def _shrink(self, node: int, layer: int) -> None:
        cap = self.m0 if layer == 0 else self.m
        links = self._links[node][layer]
        if len(links) <= cap:
            return
        q = self.unit[node]
        self._links[node][layer] = self._select(
            q, [(self._sim(q, nb), nb) for nb in links], cap
        )

    def _insert(self, i: int) -> None:
        level = self._node_level(i)
        self._links.append([[] for _ in range(level + 1)])
        if self._entry < 0:
            self._entry, self._max_level = i, level
            return
        q = self.unit[i]
        ep = self._entry
        for layer in range(self._max_level, level, -1):
            ep = self._greedy(q, ep, layer)
        for layer in range(min(level, self._max_level), -1, -1):
            found = self._search_layer(q, [ep], self.efc, layer)
            cap = self.m0 if layer == 0 else self.m
            neighbors = self._select(q, found, cap)
            self._links[i][layer] = list(neighbors)
            for nb in neighbors:
                self._links[nb][layer].append(i)
                self._shrink(nb, layer)
            if found:
                ep = max(found, key=lambda t: (t[0], -t[1]))[1]
        if level > self._max_level:
            self._entry, self._max_level = i, level

    # -- public -------------------------------------------------------

    def extend(self, new_ids: np.ndarray, new_vecs: np.ndarray) -> None:
        """Insert a batch (HNSW is an online structure). ``new_ids``
        must be sorted ascending, unique, and disjoint from the graph —
        insertion order stays deterministic (existing nodes keep their
        indexes; the batch appends in id order), so the same batch
        sequence always yields the same graph. Note an extended graph
        is NOT byte-identical to a fresh build over the union (global
        id order differs); only recall contracts carry over."""
        new_ids = np.asarray(new_ids, dtype=np.int64)
        new_vecs = np.asarray(new_vecs, dtype=np.float64)
        if len(new_ids) != len(new_vecs):
            raise ValueError("ids and vecs length mismatch")
        if len(new_ids) == 0:
            return
        if len(new_ids) > 1 and not (np.diff(new_ids) > 0).all():
            raise ValueError("batch ids must be sorted ascending and unique")
        if np.intersect1d(new_ids, self.ids).size:
            raise ValueError("batch contains ids already in the graph")
        norms = np.linalg.norm(new_vecs, axis=1)
        unit_new = new_vecs / np.where(norms == 0.0, 1.0, norms)[:, None]
        start = len(self.ids)
        self.ids = np.concatenate([self.ids, new_ids])
        self.unit = np.vstack([self.unit, unit_new]) if start else unit_new
        for i in range(start, len(self.ids)):
            self._insert(i)

    def repair(self, dead_nodes: np.ndarray | list[int]) -> None:
        """Remove nodes from the graph, re-linking the survivors — the
        edge-repair counterpart to tombstoning (which leaves dead nodes
        in place and widens beams).

        Per (live node, layer): the new neighborhood is selected (same
        deterministic ``_select``) from the old live out-neighbors plus
        every live node reachable through dead-only paths from the old
        dead out-neighbors — so a chain of deletions bridges instead of
        severing. Afterwards any survivor left unreachable from the
        entry point over layer-0 out-links is re-linked with an
        insert-style search (lowest node index first), so every live
        vector stays discoverable. Entry point: kept if live, else the
        earliest-inserted survivor at the new max level. Deterministic
        given (graph state, dead set); node levels are id-derived so
        they never change.

        A repaired graph is NOT byte-identical to a fresh build over
        the survivors (use a rebuild for that); the recall contract
        (exact re-rank over covering candidates) is what carries,
        pinned in tests.
        """
        dead = {int(d) for d in np.asarray(dead_nodes, dtype=np.int64)}
        if not dead:
            return
        n = len(self.ids)
        if not dead.issubset(range(n)):
            raise ValueError("dead node index out of range")
        live = [i for i in range(n) if i not in dead]
        if not live:
            dim = self.unit.shape[1] if self.unit.ndim == 2 else 0
            self.ids = np.empty(0, dtype=np.int64)
            self.unit = np.empty((0, dim))
            self._links = []
            self._entry, self._max_level = -1, -1
            return
        remap = {old: new for new, old in enumerate(live)}
        levels = {u: len(self._links[u]) - 1 for u in live}
        new_links: list[list[list[int]]] = []
        for u in live:
            qu = self.unit[u]
            layers_out: list[list[int]] = []
            for layer, nbs in enumerate(self._links[u]):
                cand: set[int] = set()
                frontier: list[int] = []
                seen_dead: set[int] = set()
                for nb in nbs:
                    if nb in dead:
                        if nb not in seen_dead:
                            seen_dead.add(nb)
                            frontier.append(nb)
                    elif nb != u:
                        cand.add(nb)
                while frontier:  # live frontier through dead-only paths
                    d = frontier.pop()
                    if layer >= len(self._links[d]):
                        continue
                    for nb in self._links[d][layer]:
                        if nb in dead:
                            if nb not in seen_dead:
                                seen_dead.add(nb)
                                frontier.append(nb)
                        elif nb != u:
                            cand.add(nb)
                cap = self.m0 if layer == 0 else self.m
                picked = self._select(
                    qu, [(self._sim(qu, nb), nb) for nb in cand], cap
                )
                layers_out.append([remap[nb] for nb in picked])
            new_links.append(layers_out)
        old_entry = self._entry
        self.ids = self.ids[live]
        self.unit = self.unit[live]
        self._links = new_links
        self._max_level = max(levels[u] for u in live)
        if old_entry in remap and levels[old_entry] == self._max_level:
            self._entry = remap[old_entry]
        else:
            self._entry = next(
                remap[u] for u in live if levels[u] == self._max_level
            )
        # Reconnect survivors the repair left unreachable (entry-rooted
        # BFS over layer-0 out-links; lowest index first). The in-link
        # that makes a node reachable is PINNED — later reconnections
        # may evict only non-pinned links — so a fixed node can never
        # be orphaned again by a later fix. (A plain _shrink backlink
        # is evictable: on clustered data the heuristic immediately
        # dropped it and survivors stayed unreachable at any ef.) If an
        # iteration makes no progress (an eviction disconnected someone
        # else), the next fix pins straight into the entry point, which
        # is reachable by definition — every stalled iteration then
        # permanently fixes one node, so the loop terminates within
        # 2·n_live+1 passes. Pins may exceed the degree cap only when
        # every slot of the target is already pinned (reachability
        # outranks the degree heuristic).
        n_live = len(self.ids)
        pinned: dict[int, set[int]] = {}
        prev_unreachable = n_live + 1
        for _ in range(2 * n_live + 2):
            seen = {self._entry}
            stack = [self._entry]
            while stack:
                node = stack.pop()
                for nb in self._links[node][0]:
                    if nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
            unreach = set(range(n_live)) - seen
            if not unreach:
                break
            stalled = len(unreach) >= prev_unreachable
            prev_unreachable = len(unreach)
            i = min(unreach)
            q = self.unit[i]
            level = len(self._links[i]) - 1
            ep = self._entry
            for layer in range(self._max_level, level, -1):
                ep = self._greedy(q, ep, layer)
            found0: list[tuple[float, int]] = []
            for layer in range(min(level, self._max_level), -1, -1):
                found = self._search_layer(q, [ep], self.efc, layer)
                cap = self.m0 if layer == 0 else self.m
                neighbors = self._select(
                    q, [(s, nb) for s, nb in found if nb != i], cap
                )
                if layer == 0:
                    # re-linking must not drop links pinned INTO i's list
                    keep = [
                        nb for nb in pinned.get(i, ()) if nb not in neighbors
                    ]
                    self._links[i][0] = list(neighbors) + keep
                    found0 = [
                        (s, nb) for s, nb in found if nb != i and nb in seen
                    ]
                else:
                    self._links[i][layer] = list(neighbors)
                if found:
                    ep = max(found, key=lambda t: (t[0], -t[1]))[1]
            # pin an in-link from the reachable side: nearest reachable
            # node the search surfaced, or the entry on a stall / when
            # the beam only surfaced other orphans
            r = self._entry
            if found0 and not stalled:
                r = max(found0, key=lambda t: (t[0], -t[1]))[1]
            self._pin_link(r, i, pinned)
        else:
            raise RuntimeError(
                "repair reconnect did not converge — unreachable "
                f"survivors remain out of {n_live}"
            )

    def _pin_link(
        self, r: int, i: int, pinned: dict[int, set[int]]
    ) -> None:
        """Force ``i`` into ``r``'s layer-0 out-links and mark the edge
        un-evictable for the rest of this repair. Deterministic: the
        evicted slot is the lowest-similarity non-pinned link (ties →
        the higher node index)."""
        links = self._links[r][0]
        if i not in links:
            if len(links) < self.m0:
                links.append(i)
            else:
                qr = self.unit[r]
                evictable = [
                    nb for nb in links if nb not in pinned.get(r, ())
                ]
                if evictable:
                    worst = min(
                        evictable, key=lambda nb: (self._sim(qr, nb), -nb)
                    )
                    links[links.index(worst)] = i
                else:
                    links.append(i)  # all slots pinned: exceed the cap
        pinned.setdefault(r, set()).add(i)

    def search(self, qvec: np.ndarray, ef: int, k: int | None = None) -> np.ndarray:
        """Top-``k`` (default ``ef``) vec_ids by cosine, approximate.
        Zero-norm queries score 0 against everything (cosine_col
        semantics) — they return the ``k`` smallest ids, matching the
        exact scorer's (score DESC, id ASC) order under all-ties."""
        k = ef if k is None else k
        n = len(self.ids)
        if n == 0:
            return np.empty(0, dtype=np.int64)
        qvec = np.asarray(qvec, dtype=np.float64)
        qn = np.linalg.norm(qvec)
        if qn == 0.0:
            # ids are insertion-ordered, not globally sorted after
            # extend() — sort so the all-ties contract (id ASC) holds
            return np.sort(self.ids)[: min(k, n)]
        q = qvec / qn
        ep = self._entry
        for layer in range(self._max_level, 0, -1):
            ep = self._greedy(q, ep, layer)
        # seed layer 0 with the entry too: repair guarantees every
        # survivor is reachable FROM THE ENTRY over layer-0 out-links,
        # while the greedy-descent endpoint may sit in a smaller
        # directed component — the extra seed costs one node and makes
        # exhaustive ef actually exhaustive (it can only add coverage)
        eps = [ep] if ep == self._entry else [ep, self._entry]
        found = self._search_layer(q, eps, max(ef, k), 0)
        picked = self._select(q, found, k)
        return self.ids[np.asarray(picked, dtype=np.int64)]


def hnsw_candidates(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    m: int = 8,
    ef_construction: int = 64,
    ef_search: int = 64,
    n_graphs: int = 4,
) -> DataFrame:
    """``(query_id, <id_col>)`` candidate pairs: each of the
    ``n_graphs`` hash-partitioned HNSW graphs contributes its
    ``ef_search`` best ids per query. One shuffle (group by graph),
    one ``applyInPandas`` — the graph build and search never leave
    numpy. Mixed-dimension corpora build one sub-graph per dimension
    and queries only probe their own dimension (the scan-time dim
    filter of ``search.go:17-19``)."""
    e = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(embedding_col).cast("array<double>").alias("emb"),
    ).withColumn("graph_id", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_graphs)))
    qlist = [(int(qid), np.asarray(v, dtype=np.float64)) for qid, v in queries]

    schema = f"query_id INT, {id_col} LONG"

    def _per_graph(pdf: pd.DataFrame) -> pd.DataFrame:
        out_q: list[int] = []
        out_id: list[int] = []
        for dim, grp in pdf.groupby(pdf["emb"].map(len)):
            ids = grp[id_col].to_numpy(dtype=np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            vecs = np.array(
                [np.asarray(v, dtype=np.float64) for v in grp["emb"].to_numpy()[order]]
            )
            g = HnswGraph(ids, vecs, m=m, ef_construction=ef_construction)
            for qid, qv in qlist:
                if len(qv) != dim:
                    continue
                got = g.search(qv, ef_search)
                out_q.extend([qid] * len(got))
                out_id.extend(int(x) for x in got)
        return pd.DataFrame({"query_id": out_q, id_col: out_id})

    return e.groupBy("graph_id").applyInPandas(_per_graph, schema)


def hnsw_topk(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    m: int = 8,
    ef_construction: int = 64,
    ef_search: int = 64,
    n_graphs: int = 4,
) -> DataFrame:
    """Approximate top-k under the pinned contract
    ``(query_id, <id_col>, score, rank)``, order
    (round(score,9) DESC, id ASC). Scores are EXACT cosine (JVM
    :func:`cosine_col` on the candidate union), so whenever the
    candidates cover the true top-k the result is rank- and
    score-identical to :func:`brute_topk` — the approximation can only
    lose rows, never mis-score one."""
    cand = hnsw_candidates(
        df, queries, id_col=id_col, embedding_col=embedding_col, m=m,
        ef_construction=ef_construction, ef_search=max(ef_search, k),
        n_graphs=n_graphs,
    )
    e = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(embedding_col).cast("array<double>").alias("emb"),
    )
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in vec]) for qid, vec in queries],
        "query_id INT, qvec ARRAY<DOUBLE>",
    )
    # candidates are tiny (n_queries × n_graphs × ef) → broadcast both
    # small sides; the corpus is probed once by the candidate join.
    scored = (
        e.join(F.broadcast(cand), id_col)
        .join(F.broadcast(qdf), "query_id")
        .filter(F.size("emb") == F.size("qvec"))  # scan-time dim filter
        .select(
            "query_id",
            id_col,
            cosine_col(F.col("emb"), F.col("qvec")).alias("score"),
        )
    )
    return _ranked(scored, k, id_col)


# -- persisted graphs ---------------------------------------------------
#
# hnsw_topk rebuilds every graph per batch — the honest baseline, but
# construction dominates (O(n · ef_construction) distance evaluations
# vs O(ef_search) per query). The store writes each graph's adjacency
# ONCE at ingest; queries reload state (no rebuild) and search. Same
# pattern as build_ann_index's persisted LSH/IVF cells — except HNSW
# has no partition pruning story (every graph is probed per query), so
# the win is skipped construction + graphs already partition-aligned
# for parallel probing.


def graph_state(g: HnswGraph) -> dict:
    """Serializable graph state (adjacency + entry); vectors travel in
    their own column so parquet keeps them typed."""
    return {
        "entry": g._entry,
        "max_level": g._max_level,
        "links": [[list(nb) for nb in layers] for layers in g._links],
    }


def graph_from_state(
    ids: np.ndarray,
    vecs: np.ndarray,
    links: list[list[list[int]]],
    entry: int,
    max_level: int,
    m: int = 8,
    ef_construction: int | None = None,
) -> HnswGraph:
    """Reconstruct without rebuilding: bypass ``__init__``'s insert
    loop, restore adjacency verbatim. Determinism of the build makes
    reload-vs-rebuild byte-identical (pinned in tests). Pass
    ``ef_construction`` when the reloaded graph will :meth:`extend`."""
    g = HnswGraph.__new__(HnswGraph)
    g.ids = np.asarray(ids, dtype=np.int64)
    vecs = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1) if len(vecs) else np.empty(0)
    g.unit = (
        vecs / np.where(norms == 0.0, 1.0, norms)[:, None] if len(vecs) else vecs
    )
    g.m = int(m)
    g.m0 = 2 * g.m
    g.ml = 1.0 / math.log(g.m) if g.m > 1 else 1.0
    g.efc = max(int(ef_construction), g.m) if ef_construction else g.m
    g._links = [[list(nb) for nb in layers] for layers in links]
    g._entry = int(entry)
    g._max_level = int(max_level)
    return g


def build_hnsw_store(
    df: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    m: int = 8,
    ef_construction: int = 64,
    n_graphs: int = 4,
) -> dict:
    """Build all graphs once and persist them.

    Layout::

        <out>/graphs/graph_id=<G>/...   one row per node:
            (dim, node, <id_col>, emb, links ARRAY<ARRAY<INT>>,
             entry_node, max_level)     — entry/max_level constant per
                                          (graph, dim) subgraph
        <out>/manifest.json

    ``node`` is the id-sorted insertion index within its (graph, dim)
    subgraph — ``links`` refer to these. One shuffle (group by graph),
    graphs never leave numpy, the write is partitioned by graph so
    query-time probing parallelizes one task per graph.
    """
    e = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(embedding_col).cast("array<double>").alias("emb"),
    ).withColumn("graph_id", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_graphs)))

    schema = (
        f"graph_id INT, dim INT, node INT, {id_col} LONG, "
        "emb ARRAY<DOUBLE>, links ARRAY<ARRAY<INT>>, "
        "entry_node INT, max_level INT"
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        out: list[pd.DataFrame] = []
        gid = int(pdf["graph_id"].iloc[0]) if len(pdf) else -1
        for dim, grp in pdf.groupby(pdf["emb"].map(len)):
            ids = grp[id_col].to_numpy(dtype=np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            vecs = np.array(
                [np.asarray(v, dtype=np.float64) for v in grp["emb"].to_numpy()[order]]
            )
            g = HnswGraph(ids, vecs, m=m, ef_construction=ef_construction)
            st = graph_state(g)
            out.append(
                pd.DataFrame(
                    {
                        "graph_id": gid,
                        "dim": int(dim),
                        "node": np.arange(len(ids), dtype=np.int32),
                        id_col: ids,
                        "emb": [list(map(float, v)) for v in vecs],
                        "links": st["links"],
                        "entry_node": st["entry"],
                        "max_level": st["max_level"],
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                columns=[
                    "graph_id", "dim", "node", id_col, "emb", "links",
                    "entry_node", "max_level",
                ]
            )
        return pd.concat(out, ignore_index=True)

    from same_same_spark.metrics import MetricsWindow
    from same_same_spark.pipeline.ann_store import write_store_lineage

    spark = df.sparkSession
    rows = e.groupBy("graph_id").applyInPandas(_build, schema)
    with MetricsWindow(spark) as mw:
        rows.write.mode("overwrite").partitionBy("graph_id").parquet(
            f"{out_dir}/graphs"
        )

    manifest = {
        "m": m,
        "ef_construction": ef_construction,
        "n_graphs": n_graphs,
        # count the WRITTEN node rows (parquet footer metadata), not a
        # second scan of the source projection/hash pipeline
        "n_vectors": spark.read.parquet(f"{out_dir}/graphs").count(),
        "id_col": id_col,
        "gen": 0,
        "graphs_dir": "graphs",
        "batches": ["base"],
    }
    os.makedirs(out_dir, exist_ok=True)
    write_store_lineage(
        out_dir, "build-base",
        {"op": "build", "rows": manifest["n_vectors"], "exec": mw.totals()},
    )
    _flip_hnsw_manifest(out_dir, manifest)
    return manifest


def _flip_hnsw_manifest(out_dir: str, manifest: dict) -> None:
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))


def _sweep_hnsw_dirs(ann_dir: str, m: dict) -> None:
    """Remove generation dirs the manifest no longer references —
    shared by every mutation's post-flip cleanup AND the no-op retry
    paths, so a crash between a flip and its sweep can't leak
    superseded graph/tombstone dirs forever."""
    import shutil

    keep = {m.get("graphs_dir", "graphs")}
    if m.get("tomb_gen"):
        keep.add(f"tomb-{m['tomb_gen']}")
    for d in os.listdir(ann_dir):
        if d in keep:
            continue
        if d == "graphs" or d.startswith("graphs-") or d.startswith("tomb-"):
            shutil.rmtree(os.path.join(ann_dir, d), ignore_errors=True)


def hnsw_store_append(
    spark: SparkSession,
    ann_dir: str,
    df: DataFrame,
    batch: str,
    embedding_col: str = "embedding",
) -> dict:
    """Insert a vector batch into a persisted store (HNSW is an online
    structure — no rebuild of existing nodes; each graph
    :meth:`HnswGraph.extend`\\ s with its hash-routed share).

    Commit protocol: the merged graphs write to a fresh
    ``graphs-<gen>`` directory, THEN the manifest flips ``graphs_dir``
    to it — a crash mid-write leaves probes on the old generation, and
    a blind retry of the same batch name overwrites the orphan dir
    (already-committed batch names are an idempotent no-op). Stale
    generation dirs are swept after the flip. Duplicate ids (live in
    the store or within the batch) are refused inside the merge.

    An extended graph is deterministic given the batch sequence but NOT
    byte-identical to a fresh build over the union — the recall
    contract (exact re-rank over covering candidates) is what carries,
    pinned in tests."""
    from same_same_spark.pipeline.ann_store import _check_batch_name

    with open(os.path.join(ann_dir, "manifest.json")) as f:
        m = json.load(f)
    if batch in m.get("batches", []):
        return m  # committed already — idempotent retry
    _check_batch_name(batch)
    id_col = m["id_col"]
    mm, efc, n_graphs = m["m"], m["ef_construction"], m["n_graphs"]
    old_dir = m.get("graphs_dir", "graphs")
    gen = int(m.get("gen", 0)) + 1

    store = spark.read.parquet(f"{ann_dir}/{old_dir}")
    new = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(embedding_col).cast("array<double>").alias("emb"),
    ).withColumn("graph_id", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_graphs)))
    n_rows, n_ids, n_distinct = new.agg(
        F.count(F.lit(1)), F.count(id_col), F.count_distinct(id_col)
    ).first()
    if n_ids < n_rows:
        raise ValueError(f"append batch contains {n_rows - n_ids} NULL id(s)")
    if n_distinct < n_rows:
        raise ValueError(
            "append batch contains duplicate ids "
            f"({n_rows - n_distinct} extra row(s))"
        )
    if n_rows == 0:
        # empty micro-batch: commit the token, skip the generation
        # rewrite entirely
        m = dict(m)
        m["batches"] = list(m.get("batches", ["base"])) + [batch]
        _flip_hnsw_manifest(ann_dir, m)
        return m
    if m.get("tomb_gen"):
        tomb = spark.read.parquet(f"{ann_dir}/tomb-{m['tomb_gen']}")
        n_dead = new.join(F.broadcast(tomb), id_col).count()
        if n_dead:
            raise ValueError(
                f"append batch contains {n_dead} tombstoned id(s) — "
                "deleted ids stay deleted until repair_hnsw_store "
                "compacts the tombstones out (or the store is rebuilt)"
            )

    schema = (
        f"graph_id INT, dim INT, node INT, {id_col} LONG, "
        "emb ARRAY<DOUBLE>, links ARRAY<ARRAY<INT>>, "
        "entry_node INT, max_level INT"
    )

    out_cols = [
        "graph_id", "dim", "node", id_col, "emb", "links",
        "entry_node", "max_level",
    ]

    def _merge(key, old_pdf: pd.DataFrame, new_pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(key[0])
        out: list[pd.DataFrame] = []
        old_by_dim = dict(tuple(old_pdf.groupby("dim"))) if len(old_pdf) else {}
        new_by_dim = (
            dict(tuple(new_pdf.groupby(new_pdf["emb"].map(len))))
            if len(new_pdf)
            else {}
        )
        # live-id refusal must span dimensions: an id re-appended at a
        # DIFFERENT dim would otherwise dodge extend()'s same-dim check
        # and be served twice
        if len(old_pdf) and len(new_pdf):
            clash = set(map(int, new_pdf[id_col])) & set(
                map(int, old_pdf[id_col])
            )
            if clash:
                raise ValueError(
                    f"batch contains {len(clash)} ids already in the graph "
                    f"(e.g. {sorted(clash)[:3]})"
                )
        for dim in sorted(set(old_by_dim) | set(new_by_dim)):
            if dim not in new_by_dim:
                # untouched subgraph: pass the stored rows through
                # verbatim (byte-identical by determinism) — no
                # reconstruction round-trip
                grp = old_by_dim[dim].sort_values("node")
                out.append(grp.assign(graph_id=gid)[out_cols])
                continue
            # originals travel beside the graph (the graph keeps only
            # unit vectors; the exact re-rank needs the raw embs)
            orig_embs: list[list[float]] = []
            if dim in old_by_dim:
                grp = old_by_dim[dim].sort_values("node")
                ids = grp[id_col].to_numpy(dtype=np.int64)
                vecs = np.array(
                    [np.asarray(v, dtype=np.float64) for v in grp["emb"]]
                )
                links = [[list(nb) for nb in layers] for layers in grp["links"]]
                g = graph_from_state(
                    ids, vecs, links,
                    entry=int(grp["entry_node"].iloc[0]),
                    max_level=int(grp["max_level"].iloc[0]),
                    m=mm, ef_construction=efc,
                )
                orig_embs.extend(list(map(float, v)) for v in vecs)
            else:
                g = HnswGraph(
                    np.empty(0, dtype=np.int64),
                    np.empty((0, int(dim))),
                    m=mm, ef_construction=efc,
                )
            if dim in new_by_dim:
                ngrp = new_by_dim[dim]
                nids = ngrp[id_col].to_numpy(dtype=np.int64)
                order = np.argsort(nids)
                nids = nids[order]
                if len(nids) > 1 and not (np.diff(nids) > 0).all():
                    raise ValueError("duplicate ids within the append batch")
                nvecs = np.array(
                    [
                        np.asarray(v, dtype=np.float64)
                        for v in ngrp["emb"].to_numpy()[order]
                    ]
                )
                g.extend(nids, nvecs)  # refuses ids already in the graph
                orig_embs.extend(list(map(float, v)) for v in nvecs)
            st = graph_state(g)
            out.append(
                pd.DataFrame(
                    {
                        "graph_id": gid,
                        "dim": int(dim),
                        "node": np.arange(len(g.ids), dtype=np.int32),
                        id_col: g.ids,
                        "emb": orig_embs,
                        "links": st["links"],
                        "entry_node": st["entry"],
                        "max_level": st["max_level"],
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                columns=[
                    "graph_id", "dim", "node", id_col, "emb", "links",
                    "entry_node", "max_level",
                ]
            )
        return pd.concat(out, ignore_index=True)

    from same_same_spark.metrics import MetricsWindow
    from same_same_spark.pipeline.ann_store import write_store_lineage

    merged = (
        store.groupBy("graph_id")
        .cogroup(new.groupBy("graph_id"))
        .applyInPandas(_merge, schema)
    )
    new_dir = f"graphs-{gen}"
    with MetricsWindow(spark) as mw:
        merged.write.mode("overwrite").partitionBy("graph_id").parquet(
            f"{ann_dir}/{new_dir}"
        )
    m = dict(m)
    m["gen"] = gen
    m["graphs_dir"] = new_dir
    m["batches"] = list(m.get("batches", ["base"])) + [batch]
    m["n_vectors"] = spark.read.parquet(f"{ann_dir}/{new_dir}").count()
    write_store_lineage(
        ann_dir, f"append-{batch}",
        {"op": "append", "batch": batch, "rows": int(n_rows),
         "gen": gen, "exec": mw.totals()},
    )
    _flip_hnsw_manifest(ann_dir, m)
    _sweep_hnsw_dirs(ann_dir, m)
    return m


def delete_from_hnsw_store(
    spark: SparkSession, ann_dir: str, ids: list[int]
) -> dict:
    """Tombstone ids. The graph keeps its nodes (edge repair would
    reshape neighborhoods nondeterministically); probes search with the
    beam widened by each graph's tombstone count and drop tombstoned
    candidates — scoring never sees a deleted vector. Deletes stay
    tombstoned until :func:`repair_hnsw_store` compacts them out of
    the adjacency (or the store is rebuilt); tombstoning alone suits
    the modest churn an ANN corpus usually sees, repair is the
    delete-heavy path. Same generation-flip commit as every other
    mutation here."""
    with open(os.path.join(ann_dir, "manifest.json")) as f:
        m = json.load(f)
    gen = int(m.get("tomb_gen") or 0) + 1
    id_col = m["id_col"]
    prev = (
        spark.read.parquet(f"{ann_dir}/tomb-{m['tomb_gen']}")
        if m.get("tomb_gen")
        else None
    )
    new = spark.createDataFrame([(int(i),) for i in ids], f"{id_col} LONG")
    allt = prev.unionByName(new).distinct() if prev is not None else new.distinct()
    allt.coalesce(1).write.mode("overwrite").parquet(f"{ann_dir}/tomb-{gen}")
    m = dict(m)
    m["tomb_gen"] = gen
    _flip_hnsw_manifest(ann_dir, m)
    _sweep_hnsw_dirs(ann_dir, m)
    return m


def repair_hnsw_store(
    spark: SparkSession, ann_dir: str, mode: str = "repair"
) -> dict:
    """Compact tombstones out of a persisted store — the maintenance
    counterpart to :func:`delete_from_hnsw_store` for delete-heavy
    stores (tombstoning widens every probe's beam by the dead count;
    repair restores dead-free graphs so beams shrink back and
    previously-deleted ids may be re-appended).

    ``mode='repair'``: each touched (graph, dim) subgraph drops its
    dead nodes via :meth:`HnswGraph.repair` — survivors keep their
    neighborhoods except where they bridged through the dead; cost is
    proportional to the dead neighborhoods, not the graph.
    ``mode='rebuild'``: touched subgraphs rebuild from scratch over the
    live vectors (id-ascending insertion) — byte-identical to a fresh
    :func:`build_hnsw_store` over the survivors, at full build cost.

    Untouched subgraphs pass through verbatim either way. Same commit
    protocol as appends: write ``graphs-<gen>``, flip the manifest
    (dropping ``tomb_gen``), sweep superseded graph and tombstone
    generations. A crash before the flip leaves probes on the old
    generation; retrying completes the repair. No tombstones → no-op
    (which still sweeps any dirs a crash-interrupted sweep left).
    Repairing everything away is refused like compact_ann_index —
    rebuild instead.
    """
    if mode not in ("repair", "rebuild"):
        raise ValueError(f"unknown repair mode {mode!r}")
    with open(os.path.join(ann_dir, "manifest.json")) as f:
        m = json.load(f)
    if not m.get("tomb_gen"):
        # nothing tombstoned — idempotent no-op; still collect orphan
        # dirs a crash between a prior flip and its sweep left behind
        _sweep_hnsw_dirs(ann_dir, m)
        return m
    id_col = m["id_col"]
    mm, efc = m["m"], m["ef_construction"]
    old_dir = m.get("graphs_dir", "graphs")
    gen = int(m.get("gen", 0)) + 1
    tomb = frozenset(
        int(r[id_col])
        for r in spark.read.parquet(f"{ann_dir}/tomb-{m['tomb_gen']}").collect()
    )
    store = spark.read.parquet(f"{ann_dir}/{old_dir}")
    n_dead_present = store.filter(
        F.col(id_col).isin(*[int(t) for t in tomb])
    ).count()
    if int(m.get("n_vectors", 0)) - n_dead_present <= 0:
        raise ValueError(
            "repair would leave the store empty — rebuild instead"
        )

    schema = (
        f"graph_id INT, dim INT, node INT, {id_col} LONG, "
        "emb ARRAY<DOUBLE>, links ARRAY<ARRAY<INT>>, "
        "entry_node INT, max_level INT"
    )
    out_cols = [
        "graph_id", "dim", "node", id_col, "emb", "links",
        "entry_node", "max_level",
    ]

    def _fix(pdf: pd.DataFrame) -> pd.DataFrame:
        out: list[pd.DataFrame] = []
        gid = int(pdf["graph_id"].iloc[0]) if len(pdf) else -1
        for dim, grp in pdf.groupby("dim"):
            grp = grp.sort_values("node")
            ids = grp[id_col].to_numpy(dtype=np.int64)
            dead_mask = np.isin(ids, np.fromiter(tomb, dtype=np.int64))
            if not dead_mask.any():
                # untouched subgraph: verbatim pass-through
                out.append(grp.assign(graph_id=gid)[out_cols])
                continue
            embs = [list(map(float, v)) for v in grp["emb"]]
            if mode == "rebuild":
                lids = ids[~dead_mask]
                order = np.argsort(lids)
                lvecs = np.array(
                    [
                        np.asarray(embs[i], dtype=np.float64)
                        for i in np.nonzero(~dead_mask)[0]
                    ]
                )[order] if len(lids) else np.empty((0, int(dim)))
                g = HnswGraph(lids[order], lvecs, m=mm, ef_construction=efc)
                live_embs = [embs[i] for i in np.nonzero(~dead_mask)[0][order]]
            else:
                vecs = np.array([np.asarray(v, dtype=np.float64) for v in embs])
                links = [[list(nb) for nb in layers] for layers in grp["links"]]
                g = graph_from_state(
                    ids, vecs, links,
                    entry=int(grp["entry_node"].iloc[0]),
                    max_level=int(grp["max_level"].iloc[0]),
                    m=mm, ef_construction=efc,
                )
                g.repair(np.nonzero(dead_mask)[0])
                live_embs = [embs[i] for i in np.nonzero(~dead_mask)[0]]
            if not len(g.ids):
                continue  # subgraph fully deleted
            st = graph_state(g)
            out.append(
                pd.DataFrame(
                    {
                        "graph_id": gid,
                        "dim": int(dim),
                        "node": np.arange(len(g.ids), dtype=np.int32),
                        id_col: g.ids,
                        "emb": live_embs,
                        "links": st["links"],
                        "entry_node": st["entry"],
                        "max_level": st["max_level"],
                    }
                )
            )
        if not out:
            return pd.DataFrame(columns=out_cols)
        return pd.concat(out, ignore_index=True)

    from same_same_spark.metrics import MetricsWindow
    from same_same_spark.pipeline.ann_store import write_store_lineage

    fixed = store.groupBy("graph_id").applyInPandas(_fix, schema)
    new_dir = f"graphs-{gen}"
    with MetricsWindow(spark) as mw:
        fixed.write.mode("overwrite").partitionBy("graph_id").parquet(
            f"{ann_dir}/{new_dir}"
        )
    m = dict(m)
    m["gen"] = gen
    m["graphs_dir"] = new_dir
    m["n_vectors"] = spark.read.parquet(f"{ann_dir}/{new_dir}").count()
    m.pop("tomb_gen", None)
    write_store_lineage(
        ann_dir, f"repair-{gen}",
        {"op": "repair", "mode": mode, "live_rows": int(m["n_vectors"]),
         "tombstones_cleared": len(tomb), "exec": mw.totals()},
    )
    _flip_hnsw_manifest(ann_dir, m)
    _sweep_hnsw_dirs(ann_dir, m)
    return m


def hnsw_topk_persisted(
    spark: SparkSession,
    ann_dir: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    ef_search: int = 64,
) -> DataFrame:
    """Top-k from a persisted store: reload each graph's adjacency
    (NO rebuild — the construction cost was paid at ingest), search,
    exact-cosine re-rank. Result-identical to :func:`hnsw_topk` with
    the store's build parameters (build determinism + verbatim state)."""
    with open(os.path.join(ann_dir, "manifest.json")) as f:
        manifest = json.load(f)
    id_col = manifest["id_col"]
    m = manifest["m"]
    store = spark.read.parquet(
        f"{ann_dir}/{manifest.get('graphs_dir', 'graphs')}"
    )
    # tombstones: a tiny driver-side set (modest-churn contract of
    # delete_from_hnsw_store); each graph widens its beam by its own
    # dead count and drops dead candidates, the re-rank side anti-joins
    tomb: frozenset[int] = frozenset()
    if manifest.get("tomb_gen"):
        tomb = frozenset(
            int(r[id_col])
            for r in spark.read.parquet(
                f"{ann_dir}/tomb-{manifest['tomb_gen']}"
            ).collect()
        )
    qlist = [(int(qid), np.asarray(v, dtype=np.float64)) for qid, v in queries]
    ef = max(ef_search, k)

    schema = f"query_id INT, {id_col} LONG"

    def _probe(pdf: pd.DataFrame) -> pd.DataFrame:
        out_q: list[int] = []
        out_id: list[int] = []
        for _, grp in pdf.groupby("dim"):
            grp = grp.sort_values("node")
            ids = grp[id_col].to_numpy(dtype=np.int64)
            vecs = np.array([np.asarray(v, dtype=np.float64) for v in grp["emb"]])
            links = [
                [list(nb) for nb in layers] for layers in grp["links"]
            ]
            g = graph_from_state(
                ids, vecs, links,
                entry=int(grp["entry_node"].iloc[0]),
                max_level=int(grp["max_level"].iloc[0]),
                m=m,
            )
            n_dead = len(tomb.intersection(ids.tolist())) if tomb else 0
            dim = vecs.shape[1] if len(vecs) else 0
            for qid, qv in qlist:
                if len(qv) != dim:
                    continue
                got = g.search(qv, ef + n_dead)
                for x in got:
                    if int(x) not in tomb:
                        out_q.append(qid)
                        out_id.append(int(x))
        return pd.DataFrame({"query_id": out_q, id_col: out_id})

    cand = store.groupBy("graph_id").applyInPandas(_probe, schema)
    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in vec]) for qid, vec in queries],
        "query_id INT, qvec ARRAY<DOUBLE>",
    )
    scored = (
        store.select(id_col, "emb")
        .join(F.broadcast(cand), id_col)
        .join(F.broadcast(qdf), "query_id")
        .filter(F.size("emb") == F.size("qvec"))  # scan-time dim filter
        .select(
            "query_id",
            id_col,
            cosine_col(F.col("emb"), F.col("qvec")).alias("score"),
        )
    )
    return _ranked(scored, k, id_col)
