"""Parent/child join queries (operators/joinfield.py)."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from same_same_spark.bm25 import scored_matches
from same_same_spark.operators.chunk import chunk_documents
from same_same_spark.operators.joinfield import (
    has_child_topk,
    has_parent_topk,
)

QUERIES = [(0, "fast merge join"), (1, "vector table index")]
GEO = dict(size=120, overlap=30)


def _r9(x):
    return round(x * 1e9) / 1e9


@pytest.fixture(scope="module")
def child_scores(spark, documents):
    chunks = chunk_documents(
        documents, id_col="doc_id", text_col="text", **GEO
    ).withColumn(
        "cuid", F.col("doc_id").cast("long") * 4096 + F.col("chunk_id")
    )
    rows = scored_matches(
        chunks, QUERIES, id_col="cuid", text_col="chunk_text"
    ).collect()
    return [(r["query_id"], r["doc_id"], r["score"]) for r in rows]


def test_has_child_matches_brute(spark, documents, child_scores):
    for mode in ("max", "sum", "avg"):
        got = has_child_topk(
            documents, QUERIES, k=6, score_mode=mode, min_children=2,
            id_col="doc_id", text_col="text", **GEO,
        ).collect()
        by_q = collections.defaultdict(list)
        for r in got:
            by_q[r["query_id"]].append(r)
        for qid, _q in QUERIES:
            per_parent = collections.defaultdict(list)
            for q, cuid, s in child_scores:
                if q == qid:
                    per_parent[cuid // 4096].append(s)
            folded = []
            for pid, ss in per_parent.items():
                if len(ss) < 2:
                    continue
                score = {
                    "max": max(ss),
                    "sum": sum(ss),
                    "avg": sum(ss) / len(ss),
                }[mode]
                folded.append((pid, len(ss), score))
            want = sorted(folded, key=lambda t: (-_r9(t[2]), t[0]))[:6]
            mine = sorted(by_q[qid], key=lambda r: r["rank"])
            assert [r["doc_id"] for r in mine] == [p for p, _n, _s in want]
            for r, (_p, n, s) in zip(mine, want):
                assert r["n_children"] == n
                assert r["score"] == pytest.approx(s, rel=1e-12)


def test_has_child_none_mode_filters_only(spark, documents, child_scores):
    got = has_child_topk(
        documents, QUERIES, k=5, score_mode="none", min_children=3,
        id_col="doc_id", text_col="text", **GEO,
    ).collect()
    per = collections.defaultdict(set)
    counts = collections.Counter()
    for q, cuid, _s in child_scores:
        counts[(q, cuid // 4096)] += 1
    for (q, pid), n in counts.items():
        if n >= 3:
            per[q].add(pid)
    by_q = collections.defaultdict(list)
    for r in got:
        assert r["score"] == 0.0
        by_q[r["query_id"]].append(r)
    for qid, _q in QUERIES:
        want = sorted(per[qid])[:5]  # score ties -> id-ascending ranks
        mine = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["doc_id"] for r in mine] == want


def test_has_parent_children_carry_parent_score(spark, documents):
    got = has_parent_topk(
        documents, QUERIES, k=12, id_col="doc_id", text_col="text", **GEO,
    ).collect()
    parents = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in scored_matches(
            documents, QUERIES, id_col="doc_id", text_col="text"
        ).collect()
    }
    nchunks = {
        r["doc_id"]: r["n"]
        for r in chunk_documents(
            documents, id_col="doc_id", text_col="text", **GEO
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_q = collections.defaultdict(list)
    for r in got:
        by_q[r["query_id"]].append(r)
    for qid, _q in QUERIES:
        brute = []
        for (q, pid), s in parents.items():
            if q != qid:
                continue
            for c in range(nchunks[pid]):
                brute.append((pid * 4096 + c, s))
        want = sorted(brute, key=lambda t: (-_r9(t[1]), t[0]))[:12]
        mine = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [
            (r["doc_id"] * 4096 + r["chunk_id"]) for r in mine
        ] == [cuid for cuid, _s in want]
        for r, (_cuid, s) in zip(mine, want):
            assert r["score"] == s


def test_join_field_validation(spark, documents):
    with pytest.raises(ValueError, match="score_mode"):
        has_child_topk(documents, QUERIES, score_mode="prod")
    with pytest.raises(ValueError, match="min_children"):
        has_child_topk(documents, QUERIES, min_children=0)


def test_api_query_modes(spark, documents):
    from same_same_spark.api import SameSameSpark

    api = SameSameSpark(documents, id_col="doc_id", text_col="text")
    hc = api.query(
        "fast merge join", k=5, mode="has_child", score_mode="max",
        size=120, overlap=30,
    ).collect()
    want = has_child_topk(
        documents, [(0, "fast merge join")], k=5, score_mode="max",
        id_col="doc_id", text_col="text", size=120, overlap=30,
    ).collect()
    assert [(r["doc_id"], r["rank"]) for r in hc] == [
        (r["doc_id"], r["rank"]) for r in want
    ]
    hp = api.query(
        "fast merge join", k=5, mode="has_parent", size=120, overlap=30
    ).collect()
    assert len(hp) == 5 and {"chunk_id", "score", "rank"} <= set(
        hp[0].asDict()
    )
