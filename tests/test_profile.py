"""Corpus profiling (pipeline/profile.py)."""

from __future__ import annotations

import duckdb
import pytest

from same_same_spark.pipeline.profile import corpus_profile, corpus_profile_sql

_DOCS = [
    (1, "alpha bravo charlie delta", "en"),
    (2, "alpha bravo charlie delta", "en"),      # exact dup of 1
    (3, "echo foxtrot golf hotel india juliett", "en"),
    (4, "kilo lima", "de"),
    (5, "", "de"),                               # empty doc: 0 tokens
]


def _df(spark):
    return spark.createDataFrame(_DOCS, "doc_id LONG, text STRING, lang STRING")


def test_corpus_profile_values(spark):
    got = {
        r["stratum"]: r for r in corpus_profile(_df(spark)).collect()
    }
    en, de = got["en"], got["de"]
    assert en["n_docs"] == 3 and en["total_tokens"] == 4 + 4 + 6
    assert en["n_distinct_texts"] == 2
    assert en["dup_rate"] == pytest.approx(1 / 3)
    assert en["p50_tokens"] == pytest.approx(4.0)
    assert de["n_docs"] == 2 and de["total_tokens"] == 2
    assert de["dup_rate"] == 0.0
    assert de["p50_tokens"] == pytest.approx(1.0)  # interpolated (0+2)/2


def test_corpus_profile_oracle_parity(spark):
    df = _df(spark)
    got = sorted(
        (r["stratum"], r["n_docs"], r["total_tokens"],
         round(r["mean_tokens"], 6), round(r["p50_tokens"], 6),
         round(r["p90_tokens"], 6), round(r["mean_quality"], 6),
         r["n_distinct_texts"], round(r["dup_rate"], 6))
        for r in corpus_profile(df).collect()
    )
    con = duckdb.connect()
    con.register("d", df.toPandas())
    oracle = sorted(
        (r[0], r[1], r[2], round(r[3], 6), round(r[4], 6),
         round(r[5], 6), round(r[6], 6), r[7], round(r[8], 6))
        for r in con.execute(corpus_profile_sql("d")).fetchall()
    )
    assert got == oracle


def _r9(v):
    return None if v is None else round(v, 9)


def _canon_card(rows):
    return sorted(
        (
            (
                r["stratum"], r["n_docs"], r["total_tokens"],
                _r9(r["mean_tokens"]), _r9(r["p50_tokens"]),
                _r9(r["p90_tokens"]), _r9(r["mean_quality"]),
                r["n_distinct_texts"], _r9(r["dup_rate"]),
            )
            for r in rows
        ),
        key=lambda t: (
            t[0] is None, t[0] or "",
            tuple((v is None, v if v is not None else 0) for v in t[1:]),
        ),
    )


def test_profile_store_matches_batch_profile(spark, tmp_path):
    """Three appends + one delete through the store == one batch
    corpus_profile over the surviving corpus, value for value."""
    from pyspark.sql import functions as F

    from same_same_spark.pipeline.profile import (
        profile_store_card,
        profile_store_init,
        profile_store_update,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang")
    store = str(tmp_path / "pstore")
    profile_store_init(spark, store)
    for i in range(3):
        profile_store_update(
            spark, store, docs.filter(F.col("doc_id") % 3 == i),
            log=lambda *_: None,
        )
    victims = docs.filter(F.col("doc_id") % 7 == 0)
    profile_store_update(spark, store, victims, delete=True,
                         log=lambda *_: None)

    surviving = docs.filter(F.col("doc_id") % 7 != 0)
    got = _canon_card(profile_store_card(spark, store).collect())
    want = _canon_card(corpus_profile(surviving).collect())
    assert got == want


def test_profile_store_delete_unseen_doc_refused(spark, tmp_path):
    from same_same_spark.pipeline.profile import (
        profile_store_init,
        profile_store_update,
    )

    store = str(tmp_path / "pstore")
    profile_store_init(spark, store)
    profile_store_update(spark, store, _df(spark), log=lambda *_: None)
    ghost = spark.createDataFrame(
        [(99, "text the store never counted", "en")],
        "doc_id LONG, text STRING, lang STRING",
    )
    with pytest.raises(ValueError, match="never counted"):
        profile_store_update(spark, store, ghost, delete=True,
                             log=lambda *_: None)


def test_profile_store_crash_window_keeps_previous_generation(
    spark, tmp_path
):
    """New-generation dirs written but manifest not flipped (the crash
    window) must leave the previous card fully live; the next update
    sweeps the orphans and proceeds normally."""
    import glob
    import os

    from pyspark.sql import functions as F

    from same_same_spark.pipeline.profile import (
        _gen_dir,
        profile_store_card,
        profile_store_init,
        profile_store_update,
    )

    docs = _df(spark)
    store = str(tmp_path / "pstore")
    profile_store_init(spark, store)
    profile_store_update(spark, store, docs, log=lambda *_: None)
    want = _canon_card(profile_store_card(spark, store).collect())

    # simulate a crashed update: orphan gen-2 dirs, manifest still gen-1
    for t in ("scalars", "lengths", "hashes"):
        src = _gen_dir(store, t, 1)
        spark.read.parquet(src).limit(0).write.parquet(
            _gen_dir(store, t, 2)
        )
    assert _canon_card(profile_store_card(spark, store).collect()) == want

    extra = spark.createDataFrame(
        [(10, "new doc after crash", "en")],
        "doc_id LONG, text STRING, lang STRING",
    )
    profile_store_update(spark, store, extra, log=lambda *_: None)
    got = _canon_card(profile_store_card(spark, store).collect())
    assert got == _canon_card(
        corpus_profile(docs.unionByName(extra)).collect()
    )
    # exactly one live generation remains on disk
    for t in ("scalars", "lengths", "hashes"):
        assert glob.glob(os.path.join(store, f"{t}-*")) == [
            _gen_dir(store, t, 2)
        ]


def test_profile_store_maintained_by_stream(spark, tmp_path):
    """The store composes with Structured Streaming: a foreachBatch
    sink folds every micro-batch into the store, and the card after
    the stream drains equals a one-shot batch profile of everything
    ingested — live dataset-card maintenance."""
    import json
    import os

    from same_same_spark.pipeline.profile import (
        profile_store_card,
        profile_store_init,
        profile_store_update,
    )

    src = str(tmp_path / "docs")
    os.makedirs(src)
    batches = [
        [(1, "alpha bravo charlie", "en"), (2, "alpha bravo charlie", "en")],
        [(3, "delta echo", "de"), (4, "foxtrot golf hotel india", "en")],
    ]
    for i, rows in enumerate(batches):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for doc_id, text, lang in rows:
                f.write(json.dumps(
                    {"doc_id": doc_id, "text": text, "lang": lang}
                ) + "\n")

    store = str(tmp_path / "pstore")
    profile_store_init(spark, store)
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING, lang STRING")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _: profile_store_update(
                b.sparkSession, store, b, log=lambda *_: None
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    all_rows = spark.createDataFrame(
        [r for b in batches for r in b],
        "doc_id LONG, text STRING, lang STRING",
    )
    got = _canon_card(profile_store_card(spark, store).collect())
    want = _canon_card(corpus_profile(all_rows).collect())
    assert got == want


def test_profile_store_keeps_null_stratum(spark, tmp_path):
    """A NULL stratum (untagged documents) must survive the card's
    joins — groupBy keeps NULL keys, so a null-unsafe join would
    silently drop the row the batch profile emits."""
    from same_same_spark.pipeline.profile import (
        profile_store_card,
        profile_store_init,
        profile_store_update,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie", "en"),
            (2, "delta echo foxtrot golf", None),
            (3, "delta echo foxtrot golf", None),  # dup in NULL stratum
            (4, "hotel india", None),
        ],
        "doc_id LONG, text STRING, lang STRING",
    )
    store = str(tmp_path / "pstore")
    profile_store_init(spark, store)
    profile_store_update(spark, store, docs, log=lambda *_: None)
    got = _canon_card(profile_store_card(spark, store).collect())
    want = _canon_card(corpus_profile(docs).collect())
    assert got == want
    assert any(t[0] is None for t in got)  # the NULL row is present
    # and a delete touching the NULL stratum composes
    profile_store_update(
        spark, store, docs.filter("doc_id = 3"), delete=True,
        log=lambda *_: None,
    )
    got2 = _canon_card(profile_store_card(spark, store).collect())
    want2 = _canon_card(
        corpus_profile(docs.filter("doc_id <> 3")).collect()
    )
    assert got2 == want2


def test_profile_store_null_text_matches_batch_profile(spark, tmp_path):
    """ADVICE r3: NULL-text docs have NULL n_tokens / content_h60,
    which Spark's percentile / avg / countDistinct (the corpus_profile
    side) ignore — the store card must ignore them identically: no
    NULL rows in histogram or distinct state, quantile positions and
    mean_tokens over the NON-null doc count, and an all-NULL-text
    stratum still emits a card row (with NULL quantiles, distinct 0)."""
    from same_same_spark.pipeline.profile import (
        profile_store_card,
        profile_store_init,
        profile_store_update,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie", "en"),
            (2, None, "en"),                    # NULL text in a mixed stratum
            (3, "delta echo", "en"),
            (4, "delta echo", "en"),            # dup
            (5, None, "xx"),                    # stratum of ONLY NULL text
            (6, None, "xx"),
        ],
        "doc_id LONG, text STRING, lang STRING",
    )
    store = str(tmp_path / "pstore")
    profile_store_init(spark, store)
    profile_store_update(spark, store, docs.filter("doc_id <= 4"),
                         log=lambda *_: None)
    profile_store_update(spark, store, docs.filter("doc_id > 4"),
                         log=lambda *_: None)
    got = _canon_card(profile_store_card(spark, store).collect())
    want = _canon_card(corpus_profile(docs).collect())
    assert got == want
    xx = [t for t in got if t[0] == "xx"]
    assert xx and xx[0][1] == 2          # n_docs counts NULL-text docs
    assert xx[0][4] is None              # p50 over zero non-null lengths
    assert xx[0][7] == 0                 # countDistinct of all-NULL = 0

    # deleting a NULL-text doc composes (only scalar state changes)
    profile_store_update(spark, store, docs.filter("doc_id = 2"),
                         delete=True, log=lambda *_: None)
    got2 = _canon_card(profile_store_card(spark, store).collect())
    want2 = _canon_card(corpus_profile(docs.filter("doc_id <> 2")).collect())
    assert got2 == want2


def test_profile_store_sketch_mode(spark, tmp_path):
    """distinct_mode='sketch' keeps one HLL sketch per stratum
    (O(strata) state at any corpus size). At small cardinality the
    DataSketches estimate is exact, so the sketch card must equal the
    batch profile here; deletes are refused (sketches aren't
    invertible)."""
    from same_same_spark.pipeline.profile import (
        profile_store_card,
        profile_store_init,
        profile_store_update,
    )

    docs = _df(spark)
    store = str(tmp_path / "pstore")
    profile_store_init(spark, store, distinct_mode="sketch")
    # two appends so sketches go through the union merge path
    profile_store_update(spark, store, docs.filter("doc_id <= 2"),
                         log=lambda *_: None)
    profile_store_update(spark, store, docs.filter("doc_id > 2"),
                         log=lambda *_: None)
    got = _canon_card(profile_store_card(spark, store).collect())
    want = _canon_card(corpus_profile(docs).collect())
    assert got == want

    with pytest.raises(ValueError, match="not invertible"):
        profile_store_update(spark, store, docs.limit(1), delete=True,
                             log=lambda *_: None)

    with pytest.raises(ValueError, match="distinct_mode"):
        profile_store_init(spark, str(tmp_path / "bad"),
                           distinct_mode="nope")
