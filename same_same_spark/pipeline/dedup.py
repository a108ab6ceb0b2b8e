"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash,
embedding-cosine near-dup.

The reference has no dedup at all (documents overwrite by ID —
``internal/storage/memory/memory.go:25-49``); these are the
training-pipeline operators a 100 TB corpus needs before indexing.

Design for scale:

- every operator is one or two hash-partitioned shuffles (groupBy /
  join on uniformly-distributed keys) — no driver-side loops, no
  ``collect()`` on anything proportional to the corpus,
- pairwise work is always *bucketed first* (LSH bands, sign buckets),
  so the quadratic step runs within small candidate groups only,
- all hashing is :func:`hash60_col` — ``conv(substr(md5(x),1,15),16,10)``
  — chosen because Spark and DuckDB compute it bit-identically, which
  makes every operator here oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from same_same_spark.text.tokenizer import tokens_col

# ---------------------------------------------------------------------------
# shared hashing / shingling
# ---------------------------------------------------------------------------


def hash60_col(c: Column) -> Column:
    """Deterministic 60-bit hash as BIGINT, identical in Spark and DuckDB.

    Spark:  ``conv(substr(md5(x), 1, 15), 16, 10)::LONG``
    DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB twin of :func:`hash60_col` for oracle SQL."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def word_shingles_col(text: Column | str, n: int = 3) -> Column:
    """Distinct ``n``-word shingles over X1 tokens (space-joined).

    Documents with fewer than ``n`` tokens get one shingle — the whole
    token sequence — so short docs still participate; zero-token docs
    get an empty array.
    """
    toks = tokens_col(text)
    n_sh = F.size(toks) - F.lit(n - 1)
    shingled = F.transform(
        F.sequence(F.lit(1), F.greatest(n_sh, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(shingled)
    )


def word_shingles_sql(toks_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`word_shingles_col`.

    ``toks_expr`` must reference an already-computed token LIST column
    (build it with ``tokenizer.duckdb_tokens_sql`` in a CTE first).
    """
    return (
        f"CASE WHEN len({toks_expr}) <= 0 THEN []::VARCHAR[] "
        f"ELSE list_distinct([array_to_string({toks_expr}[i:i+{n - 1}], ' ') "
        f"FOR i IN range(1, greatest(len({toks_expr}) - {n - 1}, 1) + 1)]) END"
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    surviving (minimum) id and the copy count.

    ``(content_sha STRING, keep_id, n_copies LONG)`` — single shuffle on
    sha256(text), uniformly distributed by construction.
    """
    return (
        df.select(
            F.sha2(F.col(text_col), 256).alias("content_sha"), F.col(id_col)
        )
        .groupBy("content_sha")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Survivors only: the input rows whose id is the group minimum."""
    keep = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """``(id, mh_0 .. mh_{H-1})`` — MinHash signature per document.

    One explode + one groupBy computing all H minima at once (a single
    shuffle; map-side combined). Docs with no shingles are dropped.
    """
    exploded = df.select(
        F.col(id_col),
        F.explode(word_shingles_col(text_col, shingle_n)).alias("shingle"),
    )
    aggs = [
        F.min(
            hash60_col(F.concat(F.lit(f"{i}:"), F.col("shingle")))
        ).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_band_buckets(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """``(id, band INT, bucket LONG)`` — one bucket key per band
    (md5 over the band's signature rows).

    One explode over an array of per-band structs, NOT a union of
    ``bands`` projections: Spark physically re-runs a unioned
    subtree once per branch, so the union form recomputed the whole
    signature aggregation ``bands`` times (× 2 when self-joined) —
    measured 5-6× slower at 100k docs. Bucket values are identical
    either way."""
    rows = n_hashes // bands
    per_band = []
    for b in range(bands):
        key = hash60_col(
            F.concat_ws(
                ",", *[F.col(f"mh_{b * rows + r}").cast("string") for r in range(rows)]
            )
        )
        per_band.append(
            F.struct(F.lit(b).alias("band"), key.alias("bucket"))
        )
    return sig_df.select(
        F.col(id_col), F.explode(F.array(*per_band)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    collapse_identical: bool = False,
) -> DataFrame:
    """``(id_a, id_b)`` distinct candidate pairs sharing ≥1 LSH band bucket.

    The self-join runs on (band, bucket) — the quadratic step happens
    only inside identical-signature buckets, which is the entire point
    of LSH at 100 TB. That leaves ONE quadratic hazard: a group of
    docs with *identical full signatures* (e.g. thousands of short
    docs that tokenize to the same few words — ``word_shingles_col``
    gives sub-``n``-token docs a whole-doc fallback shingle) lands in
    one bucket in EVERY band and the clique is k²/2 pairs (measured:
    a 1.7k-doc group → 6.2M pairs → OOM downstream).

    ``collapse_identical=True`` is the cluster-oriented fix: docs are
    grouped by full signature, each group emits star edges
    ``(min_id, member)`` instead of its clique, and only the group
    representative enters banding. Identical signatures ⇒ identical
    buckets, so banding on representatives is candidate-lossless, and
    downstream connected components produce the same clusters whenever
    star edges pass verification — exactly the case for token-identical
    docs (Jaccard 1). Do NOT use it when the *pair set itself* is the
    contract (the dedup_minhash oracle pins the full quadratic pair
    set): a member's cross-pair is emitted through its representative,
    not under its own id. The residual trade: two docs with identical
    16-hash signatures but different shingle sets (P ≈ 2⁻¹⁶ per
    borderline pair) verify through the representative instead of
    pairwise.
    """
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)
    star = None
    if collapse_identical:
        sig_cols = [f"mh_{i}" for i in range(n_hashes)]
        # 64-bit internal group key (not cross-engine): a collision
        # only adds a spurious star edge, which exact verification
        # rejects downstream.
        keyed = sig.withColumn(
            "_sig_key", F.xxhash64(*[F.col(c) for c in sig_cols])
        )
        reps = keyed.groupBy("_sig_key").agg(F.min(id_col).alias("_rep"))
        tagged = keyed.join(reps, "_sig_key")
        star = (
            tagged.filter(F.col(id_col) != F.col("_rep"))
            .select(
                F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b")
            )
        )
        sig = tagged.filter(F.col(id_col) == F.col("_rep")).drop(
            "_sig_key", "_rep"
        )
    buckets = lsh_band_buckets(sig, id_col, n_hashes, bands)
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    if star is not None:
        pairs = pairs.unionByName(star).distinct()
    return pairs


def jaccard_for_pairs(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for given ``(id_a, id_b)`` pairs.

    Intersections are computed only for candidate pairs (two joins on
    id + one on shingle), never all-pairs.
    """
    sh = df.select(
        F.col(id_col),
        word_shingles_col(text_col, shingle_n).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles"))
    ex = sh.select(id_col, F.explode("shingles").alias("sh"))
    ex_a = ex.withColumnRenamed(id_col, "id_a")
    ex_b = ex.withColumnRenamed(id_col, "id_b")

    inter = (
        pairs.join(ex_a, "id_a")
        .join(ex_b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.select(id_col, "n_sh")
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"n_inter": 0})
        .join(
            sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed(
                "n_sh", "n_a"
            ),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed(
                "n_sh", "n_b"
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    collapse_identical: bool = False,
) -> DataFrame:
    """MinHash-LSH candidates, verified with exact Jaccard ≥ threshold.

    ``collapse_identical`` (see :func:`minhash_candidate_pairs`) is for
    cluster-oriented callers only — it changes WHICH verified pairs are
    emitted (star edges through group representatives), preserving the
    connected components but not the oracle-pinned full pair set."""
    cand = minhash_candidate_pairs(
        df, id_col, text_col, n_hashes, bands, shingle_n,
        collapse_identical=collapse_identical,
    )
    j = jaccard_for_pairs(cand, df, id_col, text_col, shingle_n)
    return j.filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (no LSH): candidates are all
    pairs sharing ≥1 shingle. Exact but quadratic in the worst case —
    the baseline the MinHash path is differential-tested against; at
    scale use :func:`minhash_dedup_pairs`.
    """
    ex = df.select(
        F.col(id_col),
        F.explode(word_shingles_col(text_col, shingle_n)).alias("shingle"),
    )
    cand = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return jaccard_for_pairs(cand, df, id_col, text_col, shingle_n).filter(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # hash60 gives 60 usable bits


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, simhash LONG)`` — 60-bit tf-weighted SimHash over X1 tokens.

    bit_b(simhash) = 1 iff Σ_terms tf · sign_b(hash60(term)) > 0.

    Expressed as explode(term) × explode(bit) + one groupBy — pure JVM
    column math, map-side combined. Zero-token docs are dropped.
    """
    terms = (
        df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", hash60_col(F.col("term")))
    )
    bits = terms.select(
        id_col,
        "tf",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
    ).withColumn(
        # F.shiftright needs a literal shift → SQL expr for column shifts
        "contrib",
        F.col("tf") * (F.expr("shiftright(h, bit) & 1") * 2 - 1),
    )
    return (
        bits.groupBy(id_col, "bit")
        .agg(F.sum("contrib").alias("s"))
        .withColumn(
            "bitval",
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)"))
            .otherwise(F.lit(0).cast("long")),
        )
        .groupBy(id_col)
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )


def hamming60_col(a: Column, b: Column) -> Column:
    """Popcount of XOR over the 60-bit space (bit_count is JVM-native)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole blocking: split the 60 bits into ``n_blocks`` blocks; any
    pair within distance ``max_hamming < n_blocks`` agrees exactly on at
    least one block, so the self-join runs on (block_idx, block_value) —
    candidates only, never all-pairs.
    """
    sh = simhash(df, id_col, text_col)
    width = SIMHASH_BITS // n_blocks
    blocks = []
    for i in range(n_blocks):
        blk = F.shiftright(F.col("simhash"), i * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        blocks.append(
            sh.select(
                id_col, "simhash", F.lit(i).alias("blk"), blk.alias("blkval")
            )
        )
    b = blocks[0]
    for p in blocks[1:]:
        b = b.unionByName(p)
    cand = (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.blk") == F.col("y.blk"))
            & (F.col("x.blkval") == F.col("y.blkval"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", hamming60_col(F.col("sh_a"), F.col("sh_b")).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def _cos(a: Column, b: Column) -> Column:
    from same_same_spark.operators.vector import cosine_col

    return cosine_col(a, b)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    method: str = "brute",
    n_planes: int = 8,
) -> DataFrame:
    """``(id_a, id_b, cosine)`` pairs with cosine ≥ threshold.

    ``method='brute'`` — exact all-pairs (the oracle-checkable baseline;
    only for small/filtered inputs).
    ``method='lsh'`` — random-hyperplane sign buckets first, exact
    cosine within buckets only (the scale path; recall < 1 by design,
    every returned pair is still exact).
    """
    e = df.select(
        F.col(id_col), F.col(embedding_col).cast("array<double>").alias("emb")
    )
    if method == "lsh":
        from same_same_spark.pipeline.ann import signature_col

        e = e.withColumn("sig", signature_col(F.col("emb"), n_planes))
        cond = (
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        )
    else:
        cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    pairs = (
        e.alias("a")
        .join(e.alias("b"), cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            _cos(F.col("a.emb"), F.col("b.emb")).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold)


# ---------------------------------------------------------------------------
# prefix-filtering join (AllPairs / SSJoin-style) — deterministic recall
# ---------------------------------------------------------------------------


def prefix_filter_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs with GUARANTEED recall at Jaccard ≥ t.

    Classic prefix filtering (Chaudhuri et al. SSJoin; Bayardo et al.
    AllPairs): under any global total order on shingles, if
    ``J(a, b) >= t`` then ``|a ∩ b| >= ceil(t * |a|)``, so a and b must
    share a shingle inside each other's first ``|s| - ceil(t*|s|) + 1``
    shingles (pigeonhole). Unlike rows=1 MinHash banding — which is also
    recall-1 but floods verification with every pair sharing any
    min-shingle — prefix filtering joins only on each doc's *rarest*
    shingles (the global order is ``(df ASC, shingle ASC)``), so
    candidate groups are small by construction and shrink further as the
    corpus grows more diverse.

    Plan: one shingle-df aggregation, one per-doc rank window
    (partitioned by doc — cardinality N, no skew), one equi-join on the
    prefix shingles. All shuffle keys are either doc ids or rare
    shingles; the frequent-shingle skew that breaks naive
    shared-shingle joins never reaches a join here.
    """
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles_col(text_col, shingle_n).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles"))
    ex = sh.select("doc_id", "n_sh", F.explode("shingles").alias("sh"))
    sh_df = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("sh_df"))
    ranked = (
        ex.join(sh_df, "sh")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.asc("sh_df"), F.asc("sh")
                )
            ),
        )
        # prefix length L = n - ceil(t*n) + 1
        .filter(
            F.col("pos")
            <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
        )
        .select("doc_id", "sh")
    )
    a = ranked.withColumnRenamed("doc_id", "id_a")
    b = ranked.withColumnRenamed("doc_id", "id_b")
    return (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact near-dup pairs at Jaccard ≥ threshold via prefix-filtered
    candidates + exact verification. Same output as
    :func:`ngram_jaccard_pairs` (proved by the prefix lemma), with
    candidate volume bounded by rare-shingle group sizes instead of the
    quadratic shared-shingle blowup."""
    cand = prefix_filter_candidates(
        df, id_col, text_col, threshold, shingle_n
    )
    return jaccard_for_pairs(cand, df, id_col, text_col, shingle_n).filter(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# duplicate clustering (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over an undirected pair list: ``(id,
    cluster_id)`` where ``cluster_id`` is the minimum id in the
    component. Only ids appearing in ``pairs`` are returned.

    The missing piece between pair-finding (minhash / prefix / simhash
    dedup) and actually deduplicating a corpus: transitive closure
    groups A≈B≈C into one cluster so "keep the minimum id per cluster"
    is well-defined even when A and C never formed a direct pair.

    Algorithm: min-label propagation with pointer jumping —
    per round each node takes the min label over itself and its
    neighbours (one shuffle keyed by id), then labels are compressed
    through one extra self-join (``l(u) ← l(l(u))``), which halves
    chain lengths and brings convergence to O(log n) rounds instead of
    O(diameter). Each round is materialized via ``localCheckpoint`` to
    truncate lineage (on a real cluster prefer
    ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` for
    fault tolerance); convergence is detected with a ``limit(1)``
    existence probe, not a full count. All shuffles are keyed by node
    id — uniformly distributed, no hot key; dup clusters in web corpora
    are overwhelmingly small, and the giant-component worst case costs
    rounds (log n), not skew. The one data-shaped key left is the
    pointer-jump join itself: once a giant component converges, most
    rows carry the same label, so ``l == ju`` concentrates on one key —
    a many-to-ONE join (the jump side is unique per key) that AQE's
    skew-join splitting handles by replicating the single matching row
    (pinned by the pathological-cluster tests in ``test_dedup``).

    ``stats`` (optional dict) receives ``{"rounds": n}`` — the observed
    iteration count, so callers and benchmarks can assert the O(log n)
    bound instead of trusting it.
    """
    # Sever the caller's lineage FIRST: the pair list may sit at the
    # end of an arbitrarily deep pipeline (the mix pipeline stacks 10+
    # stages), and every CC round re-ANALYZES plans that embed that
    # tree — with the union below doubling it. Catalyst plan
    # canonicalization is what blew the heap (measured: a 30k-doc
    # full-pipeline prefix OOM'd 16g inside
    # Expression.withCanonicalizedChildren while the same data split
    # by materialization ran in seconds). One eager localCheckpoint
    # materializes the small pair list, roots every round's plan at a
    # LogicalRDD, and halves upstream evaluation (the union's two
    # branches re-ran the caller's plan twice).
    e = pairs.select(
        F.col(id_a).alias("u"), F.col(id_b).alias("v")
    ).localCheckpoint(eager=True)
    edges = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    rounds = 0
    try:
        labels = edges.select("u").distinct().withColumn("l", F.col("u"))
        for rounds in range(1, max_iter + 1):
            nbr = edges.join(
                labels.select(F.col("u").alias("v"), F.col("l").alias("lv")),
                "v",
            ).select("u", F.col("lv").alias("l"))
            new = (
                labels.unionByName(nbr).groupBy("u").agg(F.min("l").alias("l"))
            )
            jump = new.select(F.col("u").alias("ju"), F.col("l").alias("jl"))
            new = (
                new.join(jump, new["l"] == jump["ju"], "left")
                .select("u", F.coalesce("jl", "l").alias("l"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new.alias("n")
                .join(labels.alias("o"), "u")
                .filter(F.col("n.l") != F.col("o.l"))
                .limit(1)
                .count()
            )
            labels = new
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )
    finally:
        edges.unpersist()
        if stats is not None:
            stats["rounds"] = rounds
    return labels.select(F.col("u").alias("id"), F.col("l").alias("cluster_id"))


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Cluster assignment for EVERY document: ``(id, cluster_id,
    cluster_size)``. Docs in no pair are singleton clusters of
    themselves; ``cluster_id == id`` marks the canonical survivor, so
    ``filter(cluster_id == id)`` IS the deduplicated corpus and
    ``cluster_size`` is how many docs it absorbed.

    ``cluster_id`` is always an id PRESENT IN ``df`` (the minimum df
    member of the component), even when ``pairs`` mentions ids ``df``
    doesn't contain (pairs computed on a superset, or a pre-filtered
    ``df``): component labels from the pair graph are re-anchored to
    the smallest surviving member, so the survivor filter above never
    silently drops a whole cluster whose graph-minimum was filtered
    away. One extra groupBy on cluster labels — same key distribution
    as the size count below."""
    cc = connected_components(
        pairs, id_a, id_b, max_iter, stats=stats
    ).withColumnRenamed("id", id_col)
    asg = (
        df.select(id_col)
        .join(cc, id_col, "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
    )
    canon = asg.groupBy("cluster_id").agg(F.min(id_col).alias("_canon"))
    asg = asg.join(canon, "cluster_id").select(
        id_col, F.col("_canon").alias("cluster_id")
    )
    sizes = asg.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return asg.join(sizes, "cluster_id").select(
        id_col, "cluster_id", "cluster_size"
    )


# ---------------------------------------------------------------------------
# shared-span detection (substring-level duplication, MOSS-style)
# ---------------------------------------------------------------------------


def shared_span_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_fps: int = 3,
    max_fp_df: int = 50,
) -> DataFrame:
    """Substring-level duplication between documents (the MOSS
    alignment scheme, Schleimer et al. 2003 §4): doc pairs sharing a
    run of winnowing fingerprints at a consistent offset.

    Returns ``(id_a, id_b, diag, n_fps, span_chars)`` — one row per
    (pair, diagonal): ``diag = pos_a − pos_b`` (a shared substring
    places all its fingerprints on one diagonal), ``n_fps`` = aligned
    fingerprints on it, ``span_chars = max(pos_a) − min(pos_a) + k``,
    the shared region's extent. Positions — and therefore ``diag`` and
    ``span_chars`` — are measured in the NORMALIZED text (lowercased,
    whitespace runs collapsed to one space), not raw-document offsets.
    Pairs below ``min_fps`` aligned fingerprints are dropped.

    Scale shape: fingerprints come from the single winnowing
    definition (:func:`~same_same_spark.pipeline.textqc.winnow_fingerprints_pos`
    — one explode + per-doc window); the frequent-fingerprint guard
    ``max_fp_df`` is a count-over-window on the SAME fp-partitioned
    exchange (boilerplate shared by thousands of docs — license
    headers, copy-pasted preambles — would otherwise make the
    self-join quadratic in its df; dropping those fingerprints loses
    only spans occurring in > ``max_fp_df`` docs, which per-pair span
    dedup does not need), letting Catalyst reuse one shuffle for the
    guard and both join sides; the diagonal groupBy is keyed by
    (pair, diag) — uniformly distributed. This finds COPIED SUBSTRINGS
    between otherwise-different docs, which whole-doc Jaccard/MinHash
    (document-level similarity) structurally miss.
    """
    from same_same_spark.pipeline.textqc import winnow_fingerprints_pos

    fpos = winnow_fingerprints_pos(df, id_col, text_col, k=k, w=w)
    by_fp = Window.partitionBy("fp")
    fpos = (
        fpos.withColumn("fp_df", F.count(F.lit(1)).over(by_fp))
        .filter(F.col("fp_df") <= max_fp_df)
        .drop("fp_df")
    )
    # alias-style self-join: both sides are the IDENTICAL subtree, so
    # Catalyst reuses one exchange for them (winnowing runs once)
    matched = (
        fpos.alias("a")
        .join(
            fpos.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.pos").alias("pos_a"),
            F.col("b.pos").alias("pos_b"),
        )
    )
    return (
        matched.groupBy(
            "id_a", "id_b",
            (F.col("pos_a") - F.col("pos_b")).alias("diag"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            (F.max("pos_a") - F.min("pos_a") + F.lit(k)).alias(
                "span_chars"
            ),
        )
        .filter(F.col("n_fps") >= min_fps)
    )


def shared_span_sql(
    table: str,
    id_expr: str = "doc_id",
    col_expr: str = "text",
    k: int = 8,
    w: int = 4,
    min_fps: int = 3,
    max_fp_df: int = 50,
) -> str:
    """DuckDB twin of :func:`shared_span_pairs` (winnowing CTEs come
    from the single SQL-side definition, ``textqc.winnow_ctes``)."""
    from same_same_spark.pipeline.textqc import winnow_ctes

    return f"""
WITH {winnow_ctes(id_expr, col_expr, table, k, w)},
fpos AS (
  SELECT doc_id, fp, min(pos) AS pos FROM wins GROUP BY doc_id, fp
),
f2 AS (
  SELECT doc_id, fp, pos FROM (
    SELECT fpos.*, count(*) OVER (PARTITION BY fp) AS fp_df FROM fpos
  ) WHERE fp_df <= {max_fp_df}
),
matched AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.pos AS pos_a, b.pos AS pos_b
  FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, pos_a - pos_b AS diag,
       count(*) AS n_fps,
       max(pos_a) - min(pos_a) + {k} AS span_chars
FROM matched
GROUP BY id_a, id_b, diag
HAVING count(*) >= {min_fps}
"""


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup via cluster-bounded pairwise cosine
# ---------------------------------------------------------------------------


def semdedup_keep(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    max_cluster_size: int = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication over an embedding column. Assign every vector to its
    nearest centroid (cosine, the IVF coarse quantizer —
    :func:`~same_same_spark.pipeline.ann.assign_centroids`), then
    within each cluster drop any vector whose cosine to a LOWER-id
    member of the same cluster reaches ``threshold`` (min-id keep, the
    same deterministic rule as the other dedup families here; the
    rule is applied against all smaller-id members, dropped or not, so
    it needs no iteration and both engines agree).

    Returns ``(id_col, centroid_id, keep)`` — one row per input vector.

    Scale: clustering is exactly what makes SemDeDup tractable — the
    pairwise cosine join is keyed by ``centroid_id``, so its cost is
    sum(cluster_size²) instead of corpus². Pick
    ``k ≈ n_vectors / target_cluster_size`` (the paper uses ~100
    clusters per million; feed seeded MLlib KMeans centers from
    :func:`~same_same_spark.pipeline.ann_store.kmeans_centroids`).
    Cross-cluster near-dups are invisible by design — that recall/cost
    trade IS the algorithm. Centroids broadcast; nothing driver-side.

    Giant-cluster guard: a degenerate KMeans fit (one mega-cluster)
    would land a quadratic self-join on ONE task. Clusters larger than
    ``max_cluster_size`` are therefore hash-split into
    ``ceil(size / max_cluster_size)`` blocks and the self-join runs on
    (cluster, block-pair) keys — every pair still meets exactly once
    (the a-side copy tagged with b's block meets the b-side copy tagged
    with a's block), so results are IDENTICAL to the unblocked join
    while per-task pair count is bounded by ``max_cluster_size²`` and
    the replication factor of an n-block cluster is n on each side.
    Normal-size clusters keep replication 1.
    """
    from same_same_spark.pipeline.ann import assign_centroids

    asg = assign_centroids(
        df, centroids, id_col=id_col, embedding_col=embedding_col
    )
    sizes = asg.groupBy("centroid_id").agg(F.count("*").alias("__csize"))
    asg = asg.join(F.broadcast(sizes), "centroid_id").withColumn(
        "__nb",
        F.ceil(F.col("__csize") / F.lit(int(max_cluster_size))).cast("int"),
    )
    asg = asg.withColumn(
        "__blk",
        F.pmod(F.xxhash64(F.col(id_col)), F.col("__nb")).cast("int"),
    )
    peers = F.explode(
        F.sequence(F.lit(0), F.col("__nb") - F.lit(1))
    ).alias("__peer")
    a = asg.select(id_col, "centroid_id", "emb", "__blk", peers).alias("a")
    b = asg.select(id_col, "centroid_id", "emb", "__blk", peers).alias("b")
    drops = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.__blk") == F.col("b.__peer"))
            & (F.col("a.__peer") == F.col("b.__blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(_cos(F.col("a.emb"), F.col("b.emb")) >= F.lit(threshold))
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return (
        asg.join(drops, id_col, "left")
        .select(
            id_col,
            "centroid_id",
            F.col("__dropped").isNull().alias("keep"),
        )
    )
