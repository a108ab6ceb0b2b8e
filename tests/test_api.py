"""SameSameSpark façade: Storage-interface semantics end to end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from same_same_spark.api import SameSameSpark
from same_same_spark.operators.hybrid import HybridWeight


@pytest.fixture()
def store(spark):
    rows = [
        ("q1", "the theory of relativity changed physics", "Einstein", "1915",
         "2020-01-01 00:00:00"),
        ("q2", "quantum mechanics is counterintuitive physics", "Bohr", "1925",
         "2023-01-01 00:00:00"),
        ("q3", "gardening tips for growing tomatoes", "Alice", "2001",
         "2024-01-01 00:00:00"),
    ]
    df = (
        spark.createDataFrame(
            rows, "id STRING, text STRING, author STRING, year STRING, ts STRING"
        )
        .withColumn(
            "metadata",
            F.create_map(
                F.lit("author"), F.col("author"), F.lit("year"), F.col("year")
            ),
        )
        .withColumn("created_at", F.to_timestamp("ts"))
        .drop("author", "year", "ts")
    )
    return SameSameSpark(df)


def test_count_get_list_delete_store(spark, store):
    assert store.count() == 3
    assert store.get("q2").count() == 1
    listing = {r["id"]: r["text_length"] for r in store.list().collect()}
    assert listing["q3"] == len("gardening tips for growing tomatoes")

    smaller = store.delete("q3")
    assert smaller.count() == 2 and store.count() == 3  # functional

    new = store.docs.filter(F.col("id") == "q1").withColumn(
        "text", F.lit("replaced text entirely")
    )
    updated = store.store(new)
    assert updated.count() == 3
    [r] = updated.get("q1").collect()
    assert r["text"] == "replaced text entirely"


def test_search_by_text(store):
    rows = store.search_by_text("physics theory", k=2).collect()
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2]
    assert rows[0]["id"] in ("q1", "q2")
    # metadata pre-filter (F1)
    rows = store.search_by_text("physics", k=5, metadata_eq={"author": "Bohr"})
    got = [r["id"] for r in rows.collect()]
    assert got == ["q2"]
    # stopword-only query → zero tokens → empty
    assert store.search_by_text("the is of", k=5).count() == 0


def test_advanced_search_hybrid(store):
    rows = store.advanced_search(
        "physics",
        k=5,
        filters={"year": {"gte": 1900, "lte": 1920}},
        hybrid=HybridWeight(vector=0.7, metadata=0.3),
    ).collect()
    assert [r["id"] for r in rows] == ["q1"]
    with pytest.raises(ValueError):
        store.advanced_search("x", hybrid=HybridWeight(vector=0.9, metadata=0.3))


def test_temporal_search(store):
    rows = store.temporal_search(
        "physics", k=5, decay="strong", ref_time="2024-06-01 00:00:00"
    ).collect()
    by_id = {r["id"]: r for r in rows}
    assert set(by_id) == {"q1", "q2"}
    # older doc decays more
    assert by_id["q1"]["decay_factor"] < by_id["q2"]["decay_factor"]
    assert all(r["score"] <= r["base_score"] for r in rows)
    ranks = [r["id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert ranks[0] == "q2"


def test_export_import_roundtrip(spark, store, tmp_path):
    p = str(tmp_path / "coll")
    store.export_collection(p)
    back = SameSameSpark.import_collection(spark, p)
    assert back.count() == store.count()
    a = {r["id"]: r["text"] for r in store.docs.select("id", "text").collect()}
    b = {r["id"]: r["text"] for r in back.docs.select("id", "text").collect()}
    assert a == b


def test_tags_split(spark):
    from same_same_spark.operators.tags import split_tags_col

    df = spark.createDataFrame(
        [(1, "physics, relativity ,science"), (2, " , ,"), (3, None)],
        "id LONG, tags STRING",
    )
    got = {
        r["id"]: r["t"]
        for r in df.select("id", split_tags_col("tags").alias("t")).collect()
    }
    assert got[1] == ["physics", "relativity", "science"]
    assert got[2] == []
    assert got[3] == []


def test_embedder_stats(store):
    s = store.embedder_stats()
    assert s["document_count"] == 3
    assert s["vocabulary_size"] > 5


def test_search_by_text_batch_matches_single(spark, tmp_path):
    """Batch API == per-query API on both paths (naive and indexed)."""
    from same_same_spark.index.build import build_index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = ["fast merge join sort", "spark query data window"]

    naive = SameSameSpark(docs, id_col="doc_id", text_col="text")
    got = naive.search_by_text_batch(texts, k=5).collect()
    for qid, text in enumerate(texts):
        single = naive.search_by_text(text, k=5).collect()
        batch_q = sorted(
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in got if r["query_id"] == qid
        )
        want = sorted(
            (r["rank"], r["doc_id"], round(r["score"], 9)) for r in single
        )
        assert batch_q == want

    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    indexed = SameSameSpark(docs, id_col="doc_id", text_col="text",
                            index_dir=idx)
    got_idx = indexed.search_by_text_batch(texts, k=5).collect()
    canon = lambda rows: sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rows
    )
    assert canon(got_idx) == canon(got)


def test_search_by_text_scorer_selection(spark):
    """scorer= mirrors the reference's embedder factory: tfidf and clip
    produce their own rankings; unknown falls back to bm25."""
    from same_same_spark.api import SameSameSpark

    rows = [
        (1, "zebra quantum flux unique marker", "a"),
        (2, "common words appear here together often", "a"),
        (3, "quantum mechanics common words appear", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    api = SameSameSpark(df, id_col="doc_id", text_col="text")

    bm25 = api.search_by_text("zebra quantum", k=3).collect()
    assert bm25 and bm25[0]["doc_id"] == 1

    tfidf = api.search_by_text("zebra quantum", k=3, scorer="tfidf").collect()
    assert len(tfidf) == 3  # tf-idf cosine scores the whole store
    assert tfidf[0]["doc_id"] == 1

    clip = api.search_by_text("zebra quantum", k=3, scorer="clip").collect()
    assert len(clip) == 3
    assert {"doc_id", "score", "rank"} <= set(clip[0].asDict())

    fallback = api.search_by_text("zebra quantum", k=3, scorer="nope").collect()
    assert [r["doc_id"] for r in fallback] == [r["doc_id"] for r in bm25]


def test_delete_tombstones_attached_index(spark, tmp_path):
    """api.delete with an index attached keeps the index usable: the
    tombstoned doc disappears from index-path search, rank/score equal
    to a fresh index without it."""
    from same_same_spark.api import SameSameSpark
    from same_same_spark.index.build import build_index
    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    api = SameSameSpark(docs, id_col="doc_id", text_col="text",
                        index_dir=idx)
    top = api.search_by_text("fast merge join sort", k=5).collect()
    victim = top[0]["doc_id"]

    api2 = api.delete(victim)
    assert api2.index_dir == idx  # index stays attached
    after = api2.search_by_text("fast merge join sort", k=5).collect()
    assert victim not in {r["doc_id"] for r in after}

    fresh = str(tmp_path / "fresh")
    survivors = docs.filter(F.col("doc_id") != victim)
    build_index(survivors, fresh, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    fresh_api = SameSameSpark(survivors, id_col="doc_id",
                              text_col="text", index_dir=fresh)
    want = fresh_api.search_by_text("fast merge join sort", k=5).collect()
    canon = lambda rs: [
        (r["rank"], r["doc_id"], round(r["score"], 9)) for r in rs
    ]
    assert canon(after) == canon(want)


def test_delete_rejects_non_canonical_ids(spark, tmp_path):
    """Floats/bools/non-numeric ids have no index identity: delete must
    DETACH the index rather than tombstone a truncated id (review
    finding: int(7.2)==7 would delete the wrong document)."""
    from same_same_spark.api import SameSameSpark
    from same_same_spark.index.build import build_index
    from same_same_spark.index.mutate import load_tombstones

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    api = SameSameSpark(docs, id_col="doc_id", text_col="text",
                        index_dir=idx)
    for bad in (7.2, True, "seven", "7.0"):
        out = api.delete(bad)
        assert out.index_dir is None, bad
    assert load_tombstones(idx) is None  # index untouched

    # batch form tombstones all ids in one pass
    victims = [r["doc_id"] for r in docs.limit(3).collect()]
    out = api.delete_many(victims)
    assert out.index_dir == idx
    assert out.count() == docs.count() - 3
    tomb = load_tombstones(idx)
    assert tomb is not None and tomb["n_removed"] == 3


def test_tfidf_scorer_rides_index_when_attached(spark, tmp_path):
    """scorer='tfidf' with an attached (untombstoned) index serves the
    index-backed TF-IDF path, identical to the naive sparse scorer."""
    from same_same_spark.api import SameSameSpark
    from same_same_spark.index.build import build_index

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    naive = SameSameSpark(docs, id_col="doc_id", text_col="text")
    indexed = SameSameSpark(docs, id_col="doc_id", text_col="text",
                            index_dir=idx)
    a = naive.search_by_text("vector table", k=5, scorer="tfidf").collect()
    b = indexed.search_by_text("vector table", k=5, scorer="tfidf").collect()
    assert [(r["rank"], r["doc_id"]) for r in a] == [
        (r["rank"], r["doc_id"]) for r in b
    ]
    for ra, rb in zip(a, b):
        assert ra["score"] == pytest.approx(rb["score"], abs=1e-9)


def test_upsert_keeps_index_rank_identical_to_fresh_build(spark, tmp_path):
    """VERDICT r2 #2: api.upsert composes tombstone delete + incremental
    compaction + staged delta + fold, so an id overwrite keeps
    ``index_dir`` attached and post-upsert index search is rank- AND
    score-identical to a fresh build over the updated corpus."""
    from same_same_spark.api import SameSameSpark
    from same_same_spark.index.build import build_index
    from same_same_spark.index.query import search_batch

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=4, group_size=2, log=lambda *_: None)
    api = SameSameSpark(docs, id_col="doc_id", text_col="text",
                        index_dir=idx)
    queries = [(0, "fast merge join sort"), (1, "vector table scan")]
    top = search_batch(spark, idx, queries, k=5).collect()
    overwrite = sorted({r["doc_id"] for r in top if r["rank"] == 1})[:2]
    assert overwrite
    new_id = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    new_rows = [
        (did, "replacement text about vector table merge join")
        for did in overwrite
    ] + [(new_id, "brand new document about fast scan sort")]
    new_docs = spark.createDataFrame(new_rows, "doc_id LONG, text STRING")

    api2 = api.upsert(new_docs)
    assert api2.index_dir == idx  # stays attached
    assert api2.count() == docs.count() + 1
    # the frame swapped the rows
    assert api2.get(overwrite[0]).collect()[0]["text"].startswith(
        "replacement"
    )

    updated = docs.filter(~F.col("doc_id").isin(overwrite)).unionByName(
        new_docs
    )
    fresh = str(tmp_path / "fresh")
    build_index(updated, fresh, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)

    def canon(rows):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in rows
        )

    got = canon(search_batch(spark, idx, queries, k=10).collect())
    want = canon(search_batch(spark, fresh, queries, k=10).collect())
    assert got == want

    # upserting the SAME id twice serves the latest content (delete of
    # the first upsert's version must compose with the second)
    newer = spark.createDataFrame(
        [(overwrite[0], "second replacement entirely different words")],
        "doc_id LONG, text STRING",
    )
    api3 = api2.upsert(newer)
    assert api3.index_dir == idx
    updated2 = updated.filter(
        F.col("doc_id") != overwrite[0]
    ).unionByName(newer)
    fresh2 = str(tmp_path / "fresh2")
    build_index(updated2, fresh2, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    got2 = canon(search_batch(spark, idx, queries, k=10).collect())
    want2 = canon(search_batch(spark, fresh2, queries, k=10).collect())
    assert got2 == want2


def test_upsert_padded_string_id_replaces_not_duplicates(spark, tmp_path):
    """A whitespace-padded numeric string id must REPLACE the stored
    row under its canonical identity (the index already tombstones and
    re-ingests canonical long 2) — not coexist with it in the frame."""
    from same_same_spark.api import SameSameSpark
    from same_same_spark.index.build import build_index

    docs = spark.createDataFrame(
        [(str(i), f"document number {i} about shared topic {i % 3}")
         for i in range(1, 9)],
        "doc_id STRING, text STRING",
    )
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=2, log=lambda *_: None)
    api = SameSameSpark(docs, id_col="doc_id", text_col="text",
                        index_dir=idx)
    new = spark.createDataFrame(
        [(" 2 ", "replacement content entirely different words")],
        "doc_id STRING, text STRING",
    )
    api2 = api.upsert(new)
    assert api2.index_dir == idx
    rows = api2.docs.filter(F.col("doc_id").cast("long") == 2).collect()
    assert len(rows) == 1  # replaced, not duplicated
    assert rows[0]["doc_id"] == "2"  # canonical form in the frame
    assert rows[0]["text"].startswith("replacement")
    assert api2.count() == 8


def test_upsert_rejects_intra_batch_duplicate_ids(spark, tmp_path):
    """ADVICE r3: two rows with the same id in one batch would BOTH be
    staged (stage_delta_batch assumes new ids) and both survive the
    frame merge — the doc counted twice in N/avgdl and served twice.
    PUT semantics are per-id, so the batch is rejected; canonical-id
    collisions (" 2 " vs "2") count as duplicates too, and the naive
    store() fallback enforces the same rule."""
    import pytest

    from same_same_spark.api import SameSameSpark
    from same_same_spark.index.build import build_index

    docs = spark.createDataFrame(
        [(str(i), f"document number {i} body") for i in range(1, 6)],
        "doc_id STRING, text STRING",
    )
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=2, log=lambda *_: None)
    api = SameSameSpark(docs, id_col="doc_id", text_col="text",
                        index_dir=idx)
    dup = spark.createDataFrame(
        [("2", "first version"), (" 2 ", "second version")],
        "doc_id STRING, text STRING",
    )
    with pytest.raises(ValueError, match="duplicate ids"):
        api.upsert(dup)
    raw_dup = spark.createDataFrame(
        [("3", "first"), ("3", "second")], "doc_id STRING, text STRING",
    )
    with pytest.raises(ValueError, match="duplicate ids"):
        api.upsert(raw_dup)
    with pytest.raises(ValueError, match="duplicate ids"):
        SameSameSpark(docs, id_col="doc_id", text_col="text").store(raw_dup)
    # the index and frame are untouched by the rejected batches
    assert api.count() == 5


def test_upsert_empty_batch_is_noop(spark, tmp_path):
    """An empty upsert must not run the delete/stage/compact pipeline —
    staging an empty batch would commit a permanent zero-doc group."""
    from same_same_spark.api import SameSameSpark
    from same_same_spark.index.build import IndexManifest, build_index

    docs = spark.createDataFrame(
        [(i, f"document number {i} here") for i in range(1, 6)],
        "doc_id LONG, text STRING",
    )
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=2, log=lambda *_: None)
    api = SameSameSpark(docs, id_col="doc_id", text_col="text",
                        index_dir=idx)
    groups_before = sorted(IndexManifest.load(idx).groups)
    api2 = api.upsert(
        spark.createDataFrame([], "doc_id LONG, text STRING")
    )
    assert api2.index_dir == idx and api2.count() == 5
    assert sorted(IndexManifest.load(idx).groups) == groups_before


def test_filtered_search_rides_index_with_global_stats(spark, tmp_path):
    """VERDICT r2 #1: opt-in ``global_stats=True`` routes FILTERED
    search through the index (over-fetch + post-filter loop). Must
    terminate and match the naive GLOBAL-stats ranking (score the full
    corpus, then filter, then top-k) exactly; the default path keeps
    filtered-corpus stats and is unchanged."""
    from pyspark.sql import functions as F

    from same_same_spark.api import SameSameSpark
    from same_same_spark.bm25 import score_queries
    from same_same_spark.index.build import build_index

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang")
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    api = SameSameSpark(docs, id_col="doc_id", text_col="text",
                        index_dir=idx)
    query = "fast merge join sort"
    # the rarest language forces the over-fetch loop through several
    # widenings before k survivors accumulate
    rare = docs.groupBy("lang").count().orderBy("count", "lang").first()[
        "lang"
    ]

    # naive global-stats expectation: score the FULL corpus, filter
    # survivors afterwards, pinned-order top-k
    scored = score_queries(
        docs, [(0, query)], k=10**6, id_col="doc_id", text_col="text"
    ).drop("rank", "query_id")
    want = (
        scored.join(docs.select("doc_id", "lang"), "doc_id")
        .filter(F.col("lang") == rare)
        .orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
        .limit(5)
        .collect()
    )
    assert want  # the filter matches something

    got = api.advanced_search(
        query, k=5, filters={"lang": {"eq": rare}}, global_stats=True
    ).orderBy("rank").collect()
    assert [r["rank"] for r in got] == list(range(1, len(want) + 1))
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (r["doc_id"], round(r["score"], 9)) for r in want
    ]

    # hybrid blend on top stays exact (monotone affine)
    blended = api.advanced_search(
        query, k=5, filters={"lang": {"eq": rare}},
        hybrid=HybridWeight(vector=0.7, metadata=0.3), global_stats=True,
    ).orderBy("rank").collect()
    assert [r["doc_id"] for r in blended] == [r["doc_id"] for r in got]
    assert blended[0]["score"] == pytest.approx(
        0.7 * got[0]["score"] + 0.3
    )

    # a filter matching nothing terminates with zero rows (the loop
    # exhausts the matched set instead of widening forever)
    none = api.advanced_search(
        query, k=5, filters={"lang": {"eq": "zz-none"}}, global_stats=True
    ).collect()
    assert none == []

    # the DEFAULT (reference-semantics) path still scores the filtered
    # corpus with filtered-corpus stats — different N/avgdl/df, so the
    # scores legitimately differ from the global-stats path
    default = api.advanced_search(
        query, k=5, filters={"lang": {"eq": rare}}
    ).orderBy("rank").collect()
    filtered_docs = docs.filter(F.col("lang") == rare)
    want_default = score_queries(
        filtered_docs, [(0, query)], k=5, id_col="doc_id", text_col="text"
    ).orderBy("rank").collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in default] == [
        (r["doc_id"], round(r["score"], 9)) for r in want_default
    ]


def test_delete_padded_id_drops_frame_and_index_together(spark, tmp_path):
    """ADVICE r2: a whitespace-padded numeric string (" 12 ")
    canonicalizes to its integer for the index tombstone — the FRAME
    filter must use the same canonical identity, or the doc vanishes
    from index search while surviving count()/naive search."""
    from same_same_spark.api import SameSameSpark
    from same_same_spark.index.build import build_index
    from same_same_spark.index.mutate import load_tombstones

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    api = SameSameSpark(docs, id_col="doc_id", text_col="text",
                        index_dir=idx)
    victim = docs.limit(1).collect()[0]["doc_id"]

    out = api.delete(f"  {victim} ")
    assert out.index_dir == idx
    tomb = load_tombstones(idx)
    assert tomb is not None and tomb["ids"].tolist() == [victim]
    # the frame dropped the SAME document the index tombstoned
    assert out.count() == docs.count() - 1
    assert out.get(victim).count() == 0


def test_query_dispatcher_routes_match_operators(spark, store):
    """api.query(mode=...) must return exactly the operator's rows,
    id-renamed — for every mode, on a STRING-id store."""
    from same_same_spark.operators.boolquery import boolean_search
    from same_same_spark.operators.fuzzy import fuzzy_search
    from same_same_spark.operators.phrase import phrase_search
    from same_same_spark.operators.proximity import proximity_search
    from same_same_spark.operators.wildcard import wildcard_search

    docs = store.docs

    def rows(df, idc="id"):
        return sorted(
            (r[idc], r["rank"], round(r["score"], 9)) for r in df.collect()
        )

    got = store.query("quantum mechanics", mode="phrase", k=5)
    want = phrase_search(docs, [(0, "quantum mechanics")], k=5,
                         id_col="id", text_col="text")
    assert rows(got) == rows(want, "doc_id") and rows(got)

    got = store.query({"must": "physics", "must_not": "quantum"},
                      mode="bool", k=5)
    want = boolean_search(docs, [(0, "physics", "", "quantum")], k=5,
                          id_col="id", text_col="text")
    assert rows(got) == rows(want, "doc_id") and rows(got)

    got = store.query("phys*", mode="wildcard", k=5, max_expansions=5)
    want = wildcard_search(docs, [(0, "phys*")], k=5, max_expansions=5,
                           id_col="id", text_col="text")
    assert rows(got) == rows(want, "doc_id") and rows(got)

    got = store.query("physucs", mode="fuzzy", k=5, max_edits=1)
    want = fuzzy_search(docs, [(0, "physucs")], k=5, max_edits=1,
                        id_col="id", text_col="text")
    assert rows(got) == rows(want, "doc_id") and rows(got)

    got = store.query("physics theory", mode="proximity", k=5, slop=2)
    want = proximity_search(docs, [(0, "physics theory")], slop=2, k=5,
                            id_col="id", text_col="text")
    assert rows(got) == rows(want, "doc_id") and rows(got)

    from same_same_spark.operators.boost import boosted_search
    from same_same_spark.operators.synonyms import synonym_search

    got = store.query("physics^2 theory", mode="boosted", k=5)
    want = boosted_search(docs, [(0, "physics^2 theory")], k=5,
                          id_col="id", text_col="text")
    assert rows(got) == rows(want, "doc_id") and rows(got)

    groups = [["physics", "quantum"]]
    got = store.query("physics", mode="synonym", k=5, synonyms=groups)
    want = synonym_search(docs, [(0, "physics")], groups, k=5,
                          id_col="id", text_col="text")
    assert rows(got) == rows(want, "doc_id") and rows(got)

    with pytest.raises(ValueError):
        store.query("x", mode="regex")


def test_query_wildcard_rides_index(spark, tmp_path):
    """mode='wildcard' with an attached index routes through the term
    dictionary and stays rank-identical to the naive path."""
    from same_same_spark.index.build import build_index

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = str(tmp_path / "idx")
    build_index(docs, idx, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    naive = SameSameSpark(docs, id_col="doc_id", text_col="text")
    indexed = SameSameSpark(docs, id_col="doc_id", text_col="text",
                            index_dir=idx)
    key = lambda df: sorted(
        (r["doc_id"], r["rank"], round(r["score"], 6))
        for r in df.collect()
    )
    a = key(naive.query("tab* quer*", mode="wildcard", k=5))
    b = key(indexed.query("tab* quer*", mode="wildcard", k=5))
    assert a == b and a


def test_facets_mlt_suggest_surface(store):
    """facets / more_like_this / suggest on a string-id store."""
    f = {
        (r["facet"], r["value"]): r["doc_count"]
        for r in store.facets("physics gardening", ["metadata"]).collect()
    }
    # metadata is a MAP column cast to string — every matched doc has one
    assert sum(v for (fc, _), v in f.items() if fc == "metadata") == 3

    mlt = store.more_like_this("q1", k=2).collect()
    assert [r["query_id"] for r in mlt] == ["q1"] * len(mlt)
    assert "q1" not in {r["id"] for r in mlt} and mlt

    sug = store.suggest(["physucs"], max_edits=1, topn=1).collect()
    assert [(r["suggestion"], r["distance"]) for r in sug] == [("physics", 1)]


def test_query_regexp_mode_and_stats_surface(spark, store, tmp_path):
    """mode='regexp' routes to regexp_search (and the term dictionary
    when an index is attached); api.stats() mirrors stats_facets."""
    from same_same_spark.index.build import build_index
    from same_same_spark.operators.wildcard import regexp_search

    docs = store.docs

    def rows(df, idc="id"):
        return sorted(
            (r[idc], r["rank"], round(r["score"], 9)) for r in df.collect()
        )

    got = store.query("phys[a-z]+", mode="regexp", k=5, max_expansions=5)
    want = regexp_search(docs, [(0, "phys[a-z]+")], k=5, max_expansions=5,
                         id_col="id", text_col="text")
    assert rows(got) == rows(want, "doc_id") and rows(got)

    # indexed route stays rank-identical to the naive path
    ldocs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = str(tmp_path / "idx")
    build_index(ldocs, idx, id_col="doc_id", text_col="text",
                num_buckets=4, log=lambda *_: None)
    naive = SameSameSpark(ldocs, id_col="doc_id", text_col="text")
    indexed = SameSameSpark(ldocs, id_col="doc_id", text_col="text",
                            index_dir=idx)
    key = lambda df: sorted(
        (r["doc_id"], r["rank"], round(r["score"], 6))
        for r in df.collect()
    )
    a = key(naive.query("tab(le)?[a-z]*", mode="regexp", k=5))
    b = key(indexed.query("tab(le)?[a-z]*", mode="regexp", k=5))
    assert a == b and a

    # stats() over an integer metadata column of the parquet store
    st = SameSameSpark(
        ldocs.withColumn("n", F.length("text").cast("long")),
        id_col="doc_id", text_col="text",
    ).stats("table query", "n", extended=True).collect()
    assert len(st) == 1 and st[0]["count_vals"] > 0
    assert st[0]["variance"] >= 0.0


def test_aggregation_api_surface(spark):
    """histogram / percentiles / cardinality / stats on a parquet store."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    st = SameSameSpark(docs, id_col="doc_id", text_col="text")
    h = st.histogram("table query", "n_chars", 100.0).collect()
    assert h and sum(r["doc_count"] for r in h) > 0
    keys = [r["key"] for r in h]
    assert keys == sorted(keys) or len(set(keys)) == len(keys)
    p = {r["percent"]: r["value"] for r in
         st.percentiles("table query", "n_chars", [50.0]).collect()}
    assert set(p) == {50.0}
    c = st.cardinality("table query", "lang").collect()
    assert len(c) == 1 and c[0]["distinct_count"] >= 1


def test_query_rescore_mode(store):
    from same_same_spark.operators.rescore import rescore_topk

    got = store.query("quantum mechanics", mode="rescore", k=5,
                      window_size=10, rescore_weight=2.0)
    want = rescore_topk(store.docs, [(0, "quantum mechanics")], k=5,
                        window_size=10, rescore_weight=2.0,
                        id_col="id", text_col="text")
    key = lambda df, idc: sorted(
        (r[idc], r["rank"], round(r["score"], 9)) for r in df.collect()
    )
    assert key(got, "id") == key(want, "doc_id") and key(got, "id")


def test_query_dispatcher_new_modes_and_agg_methods(spark, store):
    """Round-5 additions: dis_max / multi_match / span_first modes and
    the filters_agg / rare_terms / weighted_avg / matrix_stats /
    sampler_terms helpers route to their operators, id-renamed."""
    from same_same_spark.operators.dismax import dismax_search
    from same_same_spark.operators.spannear import span_first_search

    docs = store.docs

    def rows(df, idc="id"):
        return sorted(
            (r[idc], r["rank"], round(r["score"], 9)) for r in df.collect()
        )

    got = store.query(["physics theory", "quantum"], mode="dis_max",
                      k=5, tie_breaker=0.3)
    want = dismax_search(docs, [(0, ["physics theory", "quantum"])],
                         tie_breaker=0.3, k=5, id_col="id",
                         text_col="text")
    assert rows(got) == rows(want, "doc_id") and rows(got)

    got = store.query("physics", mode="span_first", end=6, k=5)
    want = span_first_search(docs, [(0, "physics")], end=6, k=5,
                             id_col="id", text_col="text")
    assert rows(got) == rows(want, "doc_id") and rows(got)

    from same_same_spark.operators.boolquery import terms_set_search

    docs_ts = docs.withColumn("req", F.lit(1))
    store_ts = SameSameSpark(docs_ts)
    got = store_ts.query("physics theory", mode="terms_set",
                         msm_col="req", k=5)
    want = terms_set_search(docs_ts, [(0, "physics theory")], "req",
                            k=5, id_col="id", text_col="text")
    assert rows(got) == rows(want, "doc_id") and rows(got)

    # multi_match over two real columns
    from same_same_spark.operators.multimatch import multi_match_search

    two = docs.selectExpr(
        "id", "text", "substr(text, 1, 20) AS head", "text AS body"
    )
    store2 = SameSameSpark(two)
    got = store2.query("physics theory", mode="multi_match", k=5,
                       fields={"head": 2.0, "body": 1.0},
                       match_mode="best_fields", tie_breaker=0.2)
    want = multi_match_search(two, [(0, "physics theory")],
                              {"head": 2.0, "body": 1.0},
                              mode="best_fields", tie_breaker=0.2,
                              k=5, id_col="id")
    assert rows(got) == rows(want, "doc_id") and rows(got)

    # aggregation helpers: shape smoke (semantics pinned in
    # test_diversify; here we check the routing + query_id drop)
    fa = store.filters_agg(
        "physics", {"einstein": {"author": {"eq": "Einstein"}}},
        other_bucket=True,
    )
    assert {r["bucket"] for r in fa.collect()} == {"einstein", "_other_"}
    rt = store.rare_terms("physics", "id", max_doc_count=1, topn=10)
    assert rt.count() == 2  # every id unique in the match set
    st = store.sampler_terms("physics", "id", shard_size=1, topn=5)
    assert st.count() == 1  # sample of 1 -> one facet row
    assert "query_id" not in fa.columns


def test_query_boosting_mode_and_phrase_suggest(spark, store):
    """mode='boosting' routes to boosting_search (tuple and dict
    forms agree); string suggest() with >= 2 tokens routes to the
    phrase suggester, list form keeps the term-suggester contract."""
    from same_same_spark.operators.boost import boosting_search

    docs = store.docs

    def rows(df, idc="id"):
        return sorted(
            (r[idc], r["rank"], round(r["score"], 9)) for r in df.collect()
        )

    got = store.query(("physics", "gardening"), mode="boosting", k=5,
                      negative_boost=0.2)
    want = boosting_search(docs, [(0, "physics", "gardening")], k=5,
                           negative_boost=0.2, id_col="id",
                           text_col="text")
    assert rows(got) == rows(want, "doc_id") and rows(got)
    got_d = store.query(
        {"positive": "physics", "negative": "gardening"},
        mode="boosting", k=5, negative_boost=0.2,
    )
    assert rows(got_d) == rows(got)

    sug = store.suggest("quantum mechanizs", max_edits=1, topn=2).collect()
    assert sug and sug[0]["rank"] == 1
    assert sug[0]["suggestion"] == "quantum mechanics"
    # single-token string falls back to the term suggester
    one = store.suggest("physucs", max_edits=1, topn=1).collect()
    assert [(r["suggestion"], r["distance"]) for r in one] == [
        ("physics", 1)
    ]
