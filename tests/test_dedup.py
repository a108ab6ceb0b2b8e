"""Dedup operators: exact, MinHash+LSH, n-gram Jaccard, SimHash,
embedding near-dup."""

from __future__ import annotations

from pyspark.sql import functions as F

from same_same_spark.pipeline import dedup
from same_same_spark.text.tokenizer import tokenize_py


def _docs(spark):
    rows = [
        (1, "alpha bravo charlie delta echo foxtrot golf hotel"),
        (2, "alpha bravo charlie delta echo foxtrot golf hotel"),  # dup of 1
        (3, "alpha bravo charlie delta echo foxtrot golf india"),  # near-dup
        (4, "quantum flux torsion entropy manifold spectral basis kernel"),
        (5, "zeta"),  # short doc (< shingle width)
        (6, ""),  # empty
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "one two three four")], "doc_id LONG, text STRING")
    [row] = df.select(dedup.word_shingles_col("text", 3).alias("s")).collect()
    assert row["s"] == ["one two three", "two three four"]
    # short doc → single whole-sequence shingle; empty → empty
    df2 = spark.createDataFrame([(1, "one two"), (2, "")], "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: r["s"]
        for r in df2.select("doc_id", dedup.word_shingles_col("text", 3).alias("s")).collect()
    }
    assert got[1] == ["one two"]
    assert got[2] == []


def test_exact_dedup(spark):
    df = _docs(spark)
    groups = dedup.exact_dedup_groups(df).collect()
    dup = [g for g in groups if g["n_copies"] > 1]
    assert len(dup) == 1 and dup[0]["keep_id"] == 1 and dup[0]["n_copies"] == 2
    survivors = dedup.exact_dedup(df)
    ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    assert ids == {1, 3, 4, 5, 6}


def test_minhash_identical_docs_share_signature(spark):
    sig = dedup.minhash_signatures(_docs(spark), n_hashes=8).collect()
    by_id = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(8)) for r in sig}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[4]
    assert 6 not in by_id  # empty doc dropped


def test_minhash_pairs_and_jaccard(spark):
    df = _docs(spark)
    pairs = dedup.minhash_dedup_pairs(df, threshold=0.5, n_hashes=8, bands=4)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0  # exact dup always caught, jaccard 1
    # near-dup 1↔3: 6 shingles each, 5 shared → j = 5/7 ≈ 0.714
    if (1, 3) in got:
        assert abs(got[(1, 3)] - 5 / 7) < 1e-9


def test_ngram_jaccard_exact(spark):
    df = _docs(spark)
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert abs(got[(1, 3)] - 5 / 7) < 1e-9
    assert (1, 4) not in got
    # minhash candidates are a subset of the exact shingle-sharing pairs
    mh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_dedup_pairs(df, threshold=0.5, n_hashes=8, bands=4)
        .select("id_a", "id_b")
        .collect()
    }
    assert mh <= set(got)


def test_simhash_and_near_dup(spark):
    df = _docs(spark)
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    assert sh[1] == sh[2]
    assert 6 not in sh
    pairs = dedup.simhash_near_dup_pairs(df, max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 2)] == 0


def test_embedding_near_dup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [0.9, 0.1, 0.0]),
        (4, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    brute = dedup.embedding_near_dup_pairs(df, threshold=0.95, method="brute")
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in brute.collect()}
    assert abs(got[(1, 2)] - 1.0) < 1e-9
    assert (1, 4) not in got
    # LSH pairs are a subset with identical cosines
    lsh = dedup.embedding_near_dup_pairs(df, threshold=0.95, method="lsh")
    lgot = {(r["id_a"], r["id_b"]): r["cosine"] for r in lsh.collect()}
    assert set(lgot) <= set(got)
    for p, c in lgot.items():
        assert abs(c - got[p]) < 1e-12


def test_minhash_signature_matches_python_reference(spark):
    """Cross-check the distributed minhash against a driver-side
    recomputation through the same hash60 definition."""
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    text = "alpha bravo charlie delta echo foxtrot golf hotel"
    toks = tokenize_py(text)
    shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    expected = [min(h60(f"{i}:{s}") for s in shingles) for i in range(4)]

    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    [row] = dedup.minhash_signatures(df, n_hashes=4).collect()
    assert [row[f"mh_{i}"] for i in range(4)] == expected


def test_minhash_entry_recall_equals_exact_at_correctness_sf(spark):
    """The dedup_minhash entry's oracle is exact Jaccard >= 0.9, and the
    fixture contains natural pairs with 0.9 <= J < 1 — the entry's
    8-band x 2-row banding has P(candidate | J=0.9) ~ 1 - 1.7e-6 per
    pair, and this test *empirically pins* recall to exactly 1 on the
    correctness corpus (both sf dirs the gate can run at). If testdata
    regeneration ever breaks this pin, this fails before the driver's
    gate does."""
    import os

    import pytest

    import __spark_entry__ as entry

    dirs = [
        d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
        if os.path.isdir(d)
    ]
    if not dirs:  # pragma: no cover
        pytest.skip("driver testdata not present")
    for sf_dir in dirs:
        docs = entry._dup_docs(spark, sf_dir)
        exact = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
            for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
            for r in dedup.minhash_dedup_pairs(
                docs, threshold=0.9, n_hashes=16, bands=8
            ).collect()
        }
        assert exact, "fixture should contain near-dup pairs"
        assert any(j != 1.0 for j in exact.values()), (
            "fixture is expected to exercise natural 0.9 <= J < 1 pairs"
        )
        assert lsh == exact


def test_prefix_filter_equals_exact(spark):
    """Prefix filtering is recall-DETERMINISTIC (pigeonhole on the
    global shingle order) — its verified pairs must equal the exact
    quadratic baseline at any threshold, on adversarial shapes."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # near-dup of 1
        (3, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
        (4, "totally different words entirely here now"),
        (5, "alpha beta"),                                     # < shingle_n tokens
        (6, ""),                                               # empty
        (7, "common common common shared template words alpha"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    for t in (0.5, 0.8, 0.9, 1.0):
        want = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in dedup.ngram_jaccard_pairs(df, threshold=t).collect()
        }
        got = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in dedup.prefix_jaccard_pairs(df, threshold=t).collect()
        }
        assert got == want, t


def test_prefix_candidates_avoid_frequent_shingle_blowup(spark):
    """Docs sharing only a very frequent shingle must NOT all pair up:
    the frequent shingle lands in no doc's (rarest-first) prefix when
    rarer shingles exist."""
    # letter suffixes — the X1 tokenizer strips digits, which would
    # otherwise collapse every doc into the same token sequence
    rows = [
        (i, f"shared template prefix unique{c}{c} tail{c}{c} end{c}{c}")
        for i, c in enumerate("abcdefghijklmnopqrst")
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    cand = dedup.prefix_filter_candidates(df, threshold=0.9).count()
    # 20 docs all share the 'shared template prefix' shingle; all-pairs
    # would be 190 — prefix filtering at t=0.9 keeps only rare shingles
    assert cand < 190 / 2


def test_connected_components_chain_and_cliques(spark):
    # chain 1..8 exercises pointer jumping (diameter 7 > log2 rounds of
    # plain propagation would need 7; jumping converges much earlier)
    pairs = [(i, i + 1) for i in range(1, 8)] + [
        (10, 11), (11, 12), (10, 12), (20, 21),
    ]
    pdf = spark.createDataFrame(pairs, "id_a LONG, id_b LONG")
    cc = {r["id"]: r["cluster_id"] for r in dedup.connected_components(pdf).collect()}
    assert all(cc[i] == 1 for i in range(1, 9))
    assert cc[10] == cc[11] == cc[12] == 10
    assert cc[20] == cc[21] == 20


def test_dedup_clusters_assignment(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a LONG, id_b LONG"
    )
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id LONG"
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup.dedup_clusters(docs, pairs).collect()
    }
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[3] == (1, 3)
    assert out[10] == (10, 2) and out[11] == (10, 2)
    assert out[99] == (99, 1)  # singleton: its own canonical survivor
    # survivors = one per cluster
    survivors = [d for d, (c, _) in out.items() if c == d]
    assert sorted(survivors) == [1, 10, 99]


def test_shared_span_pairs_finds_copied_substring(spark):
    # a 60-char chunk copied between otherwise-different docs: whole-doc
    # similarity is low, but the span sits on one diagonal
    chunk = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "completely unrelated opening text here " + chunk
            + " and some trailing content"),
        (2, "different preamble words " + chunk
            + " with another ending altogether"),
        (3, "no shared content at all in this one just original words"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = dedup.shared_span_pairs(df, min_fps=3).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert pairs == {(1, 2)}
    best = max(out, key=lambda r: r["n_fps"])
    # span extent ≈ the copied chunk (k-gram anchors trim the edges)
    assert len(chunk) * 0.5 <= best["span_chars"] <= len(chunk) + 16
    # the diagonal equals the offset difference of the chunk
    assert best["diag"] == rows[0][1].index(chunk) - rows[1][1].index(chunk)


def test_shared_span_oracle_parity(spark):
    chunk = "shared central phrase that was copied verbatim across docs"
    rows = [
        (1, "alpha opening " + chunk + " omega closing words"),
        (2, "totally different head " + chunk + " and tail text"),
        (3, "unrelated filler content without any copies present"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = sorted(map(tuple, dedup.shared_span_pairs(df).collect()))
    con = _duck(df)
    sql = dedup.shared_span_sql("d")
    oracle = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == oracle and got


def _duck(df):
    import duckdb

    con = duckdb.connect()
    con.register("d", df.toPandas())
    return con


def test_shared_span_frequent_fp_guard(spark):
    # a fingerprint present in > max_fp_df docs is excluded from the
    # candidate join (boilerplate guard)
    chunk = "this exact boilerplate header appears in every document here"
    rows = [(i, chunk + f" unique suffix number {i}") for i in range(1, 8)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    none = dedup.shared_span_pairs(df, max_fp_df=3).collect()
    assert none == []  # all shared fps are frequent -> guarded out
    some = dedup.shared_span_pairs(df, max_fp_df=50).collect()
    assert some  # raising the guard finds the shared header spans


def test_dedup_clusters_foreign_pair_ids(spark):
    # pairs computed on a superset: component minimum (5) is absent
    # from df — cluster_id must re-anchor to the smallest df member so
    # filter(cluster_id == id) keeps exactly one survivor per cluster
    pairs = spark.createDataFrame(
        [(5, 6), (6, 7)], "id_a LONG, id_b LONG"
    )
    docs = spark.createDataFrame([(6,), (7,)], "doc_id LONG")
    out = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup.dedup_clusters(docs, pairs).collect()
    }
    assert out[6] == (6, 2) and out[7] == (6, 2)
    survivors = [d for d, (c, _) in out.items() if c == d]
    assert survivors == [6]


def test_connected_components_giant_cluster_olog_rounds(spark):
    """VERDICT r3 #4: the pathological shape — ONE component containing
    ~all docs. Two variants: a 4096-node chain (diameter worst case:
    plain propagation would need 4096 rounds) and a 5000-node
    banding-bucket giant (what an everything-is-a-near-dup corpus
    actually produces through minhash buckets). Pointer jumping must
    converge in O(log n) rounds — observed via the stats hook, not
    trusted — and the skewed pointer-jump key (every row converging to
    label 0) must not stall the join."""
    n = 4096
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a LONG, id_b LONG"
    )
    stats: dict = {}
    cc = dedup.connected_components(chain, max_iter=30, stats=stats)
    got = cc.groupBy("cluster_id").count().collect()
    assert len(got) == 1 and got[0]["count"] == n
    assert got[0]["cluster_id"] == 0
    # pointer jumping better than halves chain length per round:
    # log2(4096) = 12 label-propagation rounds would be the plain
    # bound; jumping compresses on top. Assert the O(log n) bound with
    # headroom — and record the observed count for the notes.
    assert 1 <= stats["rounds"] <= 14, stats

    # dense giant: overlapping buckets of 50 consecutive ids (stride
    # 25), the shape LSH banding emits when everything collides
    m, b, s = 5000, 50, 25
    dense = spark.createDataFrame(
        [
            (start + 0, start + j)
            for start in range(0, m - b + 1, s)
            for j in range(1, b)
        ],
        "id_a LONG, id_b LONG",
    )
    stats2: dict = {}
    cc2 = dedup.connected_components(dense, max_iter=30, stats=stats2)
    got2 = cc2.groupBy("cluster_id").count().collect()
    assert len(got2) == 1 and got2[0]["count"] == m
    assert stats2["rounds"] <= 8, stats2


def test_connected_components_empty_pairs(spark):
    empty = spark.createDataFrame([], "id_a LONG, id_b LONG")
    assert dedup.connected_components(empty).count() == 0
    docs = spark.createDataFrame([(7,)], "doc_id LONG")
    [r] = dedup.dedup_clusters(docs, empty).collect()
    assert (r["cluster_id"], r["cluster_size"]) == (7, 1)


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def test_semdedup_hand_case(spark):
    """Two obvious clusters; near-dups within a cluster drop (min-id
    keep), a cross-cluster near-dup pair survives BY DESIGN."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0]),   # ~dup of 1, same cluster -> dropped
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.99, 0.01]),   # ~dup of 3, same cluster -> dropped
        (5, [-1.0, 0.2, 0.0]),    # cluster 0's space but far -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    out = {
        r["vec_id"]: (r["centroid_id"], r["keep"])
        for r in dedup.semdedup_keep(df, cents, threshold=0.95).collect()
    }
    assert out[1] == (0, True)
    assert out[2] == (0, False)
    assert out[3] == (1, True)
    assert out[4] == (1, False)
    assert out[5][1] is True
    assert len(out) == 5  # one row per vector


def test_semdedup_cross_cluster_blindness(spark):
    """Identical vectors assigned to different clusters are NOT
    compared — the documented recall/cost trade."""
    rows = [
        (1, [1.0, 0.05, 0.0]),
        (2, [1.0, -0.05, 0.0]),  # cosine(1,2) ~ 0.995 but clusters differ
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    cents = [(0, [1.0, 0.1, 0.0]), (1, [1.0, -0.1, 0.0])]
    out = {r["vec_id"]: r["keep"]
           for r in dedup.semdedup_keep(df, cents, threshold=0.9).collect()}
    assert out == {1: True, 2: True}


def _semdedup_py(vecs, cents, tau):
    """Pure-Python reference: vecs = {id: list}, cents = [(cid, vec)]."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return 0.0 if na == 0 or nb == 0 else d / (na * nb)

    asg = {}
    for i, v in vecs.items():
        best = max(cents, key=lambda c: (round(cos(v, c[1]), 9), -c[0]))
        asg[i] = best[0]
    keep = {}
    ids = sorted(vecs)
    for i in ids:
        dropped = any(
            asg[j] == asg[i] and j < i and cos(vecs[j], vecs[i]) >= tau
            for j in ids
        )
        keep[i] = (asg[i], not dropped)
    return keep


def test_semdedup_differential_vs_python(spark, embeddings):
    from same_same_spark.pipeline.ann import centroids_by_label

    cents = centroids_by_label(embeddings)
    got = {
        r["vec_id"]: (r["centroid_id"], r["keep"])
        for r in dedup.semdedup_keep(
            embeddings, cents, threshold=0.25
        ).collect()
    }
    rows = embeddings.select("vec_id", "embedding").collect()
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in rows}
    exp = _semdedup_py(vecs, cents, 0.25)
    assert got == exp
    assert any(not k for _, k in got.values())   # some drops happened
    assert any(k for _, k in got.values())


def test_semdedup_giant_cluster_blocked_join_identity(spark, embeddings):
    """Degenerate KMeans fit: ONE centroid puts the whole corpus in a
    single mega-cluster. The max_cluster_size guard must hash-split the
    self-join into block pairs (bounding per-task pair count) while
    returning results IDENTICAL to the unblocked join and to the
    pure-Python reference — every (i < j) pair still meets exactly
    once."""
    dim = len(embeddings.select("embedding").first()["embedding"])
    cents = [(0, [1.0] + [0.0] * (dim - 1))]
    n = embeddings.count()
    capped = sorted(map(tuple, dedup.semdedup_keep(
        embeddings, cents, threshold=0.25, max_cluster_size=max(2, n // 7)
    ).collect()))
    uncapped = sorted(map(tuple, dedup.semdedup_keep(
        embeddings, cents, threshold=0.25, max_cluster_size=10**9
    ).collect()))
    assert capped == uncapped
    vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in embeddings.select("vec_id", "embedding").collect()
    }
    exp = sorted(
        (i, cid, keep) for i, (cid, keep) in
        _semdedup_py(vecs, cents, 0.25).items()
    )
    assert capped == exp
    assert any(not k for _, _, k in capped)  # drops happened in-cluster


def test_semdedup_cap_one_extreme(spark):
    """max_cluster_size=1 (every member its own block) is the maximal
    blocking — the hand case must still come out exactly the same."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.99, 0.01]),
        (5, [-1.0, 0.2, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    out = {
        r["vec_id"]: (r["centroid_id"], r["keep"])
        for r in dedup.semdedup_keep(
            df, cents, threshold=0.95, max_cluster_size=1
        ).collect()
    }
    assert out[1] == (0, True)
    assert out[2] == (0, False)
    assert out[3] == (1, True)
    assert out[4] == (1, False)
    assert out[5][1] is True
    assert len(out) == 5


def test_semdedup_with_kmeans_is_deterministic(spark, embeddings):
    from same_same_spark.pipeline.ann_store import kmeans_centroids

    cents1 = kmeans_centroids(
        embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        ),
        n_centroids=4, embedding_col="emb", seed=13,
    )
    cents2 = kmeans_centroids(
        embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        ),
        n_centroids=4, embedding_col="emb", seed=13,
    )
    assert cents1 == cents2  # seeded KMeans is bit-deterministic
    out1 = sorted(
        map(tuple, dedup.semdedup_keep(embeddings, cents1, 0.3).collect())
    )
    out2 = sorted(
        map(tuple, dedup.semdedup_keep(embeddings, cents2, 0.3).collect())
    )
    assert out1 == out2


def test_collapse_identical_signatures_linear_candidates(spark):
    """A flood of short docs that all tokenize to the same few words
    (identical full MinHash signatures) must produce LINEAR candidate
    edges under collapse_identical, and the SAME connected components
    as the quadratic clique path (measured: a 1.7k-doc group emitted a
    6.2M-pair clique and OOM'd connected components without this)."""
    from same_same_spark.pipeline.dedup import (
        dedup_clusters,
        minhash_candidate_pairs,
        minhash_dedup_pairs,
    )

    n_flood = 400
    # short docs: the hex token is dropped by the X1 tokenizer, so all
    # flood docs tokenize to ["func"] — one identical fallback shingle
    flood = [(i, f"func u2 {i:016X}") for i in range(n_flood)]
    # plus two genuine near-dup long pairs and two singletons
    a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = flood + [
        (1001, a), (1002, a + " kilo"),
        (1003, "one unique document body here with words"),
        (1004, "another entirely different text lives here"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    collapsed = minhash_candidate_pairs(
        df, n_hashes=16, bands=8, collapse_identical=True
    )
    n_collapsed = collapsed.count()
    # star edges for the flood group (n-1) + the real pair + slack for
    # rep-level band collisions; nothing remotely quadratic
    assert n_collapsed <= n_flood + 10, n_collapsed

    clique = minhash_candidate_pairs(df, n_hashes=16, bands=8)
    assert clique.count() >= n_flood * (n_flood - 1) // 2  # the hazard

    # identical clusters + survivors either way
    def clusters(collapse):
        pairs = minhash_dedup_pairs(
            df, threshold=0.9, n_hashes=16, bands=8,
            collapse_identical=collapse,
        )
        cc = dedup_clusters(df, pairs)
        return {
            (r["doc_id"], r["cluster_id"]) for r in cc.collect()
        }

    assert clusters(True) == clusters(False)


def test_collapse_identical_noop_on_distinct_signatures(spark, docs=None):
    """On a corpus with no identical-signature groups the collapsed
    path emits exactly the clique path's pairs (it is a pure no-op)."""
    from same_same_spark.pipeline.dedup import minhash_candidate_pairs

    import itertools
    import string

    # alphabetic unique tokens (the X1 tokenizer drops tokens with
    # digits — which is exactly how identical-signature floods happen)
    letters = itertools.product(string.ascii_lowercase, repeat=3)
    rows = []
    for i in range(40):
        uniq = " ".join("tok" + "".join(next(letters)) for _ in range(12))
        rows.append((i, uniq + " shared common words"))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    from same_same_spark.pipeline.dedup import minhash_signatures

    sig = minhash_signatures(df, n_hashes=16)
    cols = [f"mh_{i}" for i in range(16)]
    assert sig.groupBy(*cols).count().filter("count > 1").count() == 0
    plain = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(df, n_hashes=16, bands=8).collect()
    }
    coll = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(
            df, n_hashes=16, bands=8, collapse_identical=True
        ).collect()
    }
    assert plain == coll
