"""End-to-end training-corpus preparation (pipeline/mix.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from same_same_spark.pipeline.mix import (
    MixConfig,
    mix_report,
    prepare_training_corpus,
)

# 4 distinct docs; 11/12 are exact copies of 1/2; 13 is a near-dup of 1
# (one word changed in a long text); 99 is junk (low quality score).
_BASE = (
    "the table scan reads every row and the filter keeps the fast ones "
    "while the join matches keys and the sort orders the output stream"
)
_DOCS = [
    (1, _BASE, "en"),
    (2, "a completely different document about window aggregation over "
        "streams with the batch engine and the merge step", "en"),
    (3, "der hund und die katze sind nicht ein team mit von das und der "
        "die das und ist nicht eine von mit der die das", "de"),
    (11, _BASE, "en"),
    (12, "a completely different document about window aggregation over "
        "streams with the batch engine and the merge step", "en"),
    (13, _BASE.replace("sort", "merge"), "en"),
    (99, "@@@ ###", "en"),
]


def _df(spark):
    return spark.createDataFrame(_DOCS, "doc_id LONG, text STRING, lang STRING")


def test_stages_compose(spark):
    # 1-vs-13 shingle Jaccard is 2/3 (one changed word in a 24-word
    # text), so the fuzzy gate needs a threshold below that.
    cfg = MixConfig(
        min_quality=0.5, exact=True, fuzzy_threshold=0.6,
        minhash_bands=16, minhash_n_hashes=16,
    )
    out = prepare_training_corpus(_df(spark), cfg)
    ids = sorted(r["doc_id"] for r in out.collect())
    # 99 fails quality; 11/12 are exact copies; 13 is a fuzzy dup of 1
    assert ids == [1, 2, 3]
    assert "split" not in out.columns  # splits not configured


def test_split_and_sampling_stages(spark):
    cfg = MixConfig(
        exact=False,
        fractions={"en": 1.0, "de": 1.0},
        test_frac=0.3, val_frac=0.3, seed="t",
    )
    out = prepare_training_corpus(_df(spark), cfg)
    assert out.count() == len(_DOCS)  # rate 1.0 keeps everything
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}


def test_mix_report_counts_are_monotone(spark):
    cfg = MixConfig(
        min_quality=0.5, exact=True, fuzzy_threshold=0.6,
        minhash_bands=16, fractions={"en": 1.0, "de": 1.0},
        test_frac=0.2, val_frac=0.0, seed="r",
    )
    rep = mix_report(_df(spark), cfg)
    assert rep["input"] == len(_DOCS)
    order = ["input"] + cfg.stages()
    vals = [rep[s] for s in order]
    # filters and dedup only remove rows; split assignment removes none
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert rep["quality"] == 6          # 99 dropped
    assert rep["exact_dedup"] == 4      # 11, 12 dropped
    assert rep["fuzzy_dedup"] == 3      # 13 dropped
    assert rep["split"] == rep["sample"]


def test_decontam_stage(spark):
    # doc 2's text IS the eval doc → dropped when eval_df is passed;
    # everything else survives (no 8-gram overlap among the others)
    eval_df = spark.createDataFrame(
        [(0, _DOCS[1][1])], "eid LONG, text STRING"
    )
    cfg = MixConfig(exact=False)
    with_ = sorted(
        r["doc_id"]
        for r in prepare_training_corpus(
            _df(spark), cfg, eval_df
        ).collect()
    )
    assert 2 not in with_ and 12 not in with_  # both copies of the text
    assert 1 in with_ and 3 in with_
    without = prepare_training_corpus(_df(spark), cfg).count()
    assert without == len(_DOCS)  # no eval set → stage is off
    rep = mix_report(_df(spark), cfg, eval_df)
    assert rep["decontam"] == rep["input"] - 2


def test_all_stages_disabled_is_identity(spark):
    cfg = MixConfig(exact=False)
    out = prepare_training_corpus(_df(spark), cfg)
    assert out.count() == len(_DOCS)
    assert out.columns == ["doc_id", "text", "lang"]


def test_lm_gate_stage(spark):
    """CCNet-style LM gate: a bigram LM trained on the in-domain docs
    drops the out-of-domain (different-language) doc; docs without LM
    evidence pass through; withholding lm_ref_df disables the stage."""
    import math

    from same_same_spark.pipeline.lm import lm_perplexity, train_bigram_lm

    df = _df(spark)
    ref = df.filter(F.col("doc_id").isin(1, 2))  # English reference
    # pick a threshold between the in-domain and out-of-domain ppls
    model = train_bigram_lm(ref)
    ppl = {
        r["doc_id"]: r["perplexity"]
        for r in lm_perplexity(df, model).collect()
    }
    assert ppl[3] > ppl[1] and ppl[3] > ppl[2]  # German scores worse
    cut = math.sqrt(ppl[2] * ppl[3])  # geometric midpoint
    cfg = MixConfig(lm_max_perplexity=cut, exact=False)
    got = {
        r["doc_id"]
        for r in prepare_training_corpus(df, cfg, lm_ref_df=ref).collect()
    }
    assert 3 not in got
    assert {1, 2, 11, 12, 13}.issubset(got)
    assert 99 in got  # "@@@ ###" has <2 tokens → no LM evidence → passes
    # no lm_ref_df → stage off, identity
    assert prepare_training_corpus(df, cfg).count() == df.count()
    # report shows the lm stage between the gates and dedup
    rep = mix_report(df, MixConfig(lm_max_perplexity=cut), lm_ref_df=ref)
    assert list(rep) == ["input", "lm", "exact_dedup"]
    assert rep["lm"] == 6 and rep["exact_dedup"] == 4


def test_line_dedup_stage(spark):
    docs = [
        (1, "license header\nbody one\nlicense header\nbody two", "en"),
        (2, "clean\nlines\nonly", "en"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING, lang STRING")
    cfg = MixConfig(dedup_lines=True, exact=False)
    assert cfg.stages() == ["line_dedup"]
    out = {
        r["doc_id"]: r["text"]
        for r in prepare_training_corpus(df, cfg).collect()
    }
    assert out[1] == "license header\nbody one\nbody two"
    assert out[2] == "clean\nlines\nonly"
    # transforms text, drops no rows — mix_report stays monotone
    counts = mix_report(df, cfg)
    assert counts["input"] == counts["line_dedup"] == 2
    # composes: line dedup can expose exact duplicates downstream
    pair = spark.createDataFrame(
        [(1, "same\nsame\nbody", "en"), (2, "same\nbody", "en")],
        "doc_id LONG, text STRING, lang STRING",
    )
    cfg2 = MixConfig(dedup_lines=True, exact=True)
    survivors = prepare_training_corpus(pair, cfg2).collect()
    assert len(survivors) == 1


def test_host_cap_stage(spark):
    import pytest

    # 40 docs on one giant host + 3 on a small one; cap at 5 docs/host
    rows = [
        (i, f"doc number {i} with some text", "en",
         f"https://big.example.com/p/{i}")
        for i in range(40)
    ] + [
        (100 + i, f"small doc {i}", "en",
         f"https://tiny.example.org/{i}")
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, url STRING"
    )
    cfg = MixConfig(url_col="url", exact=False, host_cap=5, seed="hc")
    assert cfg.stages() == ["url_dedup", "host_cap"]
    out = prepare_training_corpus(df, cfg)
    assert out.columns == df.columns  # url_host dropped again
    kept = [r["doc_id"] for r in out.collect()]
    n_big = sum(1 for i in kept if i < 100)
    assert sum(1 for i in kept if i >= 100) == 3  # small host whole
    assert 0 < n_big < 40  # giant host sampled down toward the cap
    # report path carries the stage
    counts = mix_report(df, cfg)
    assert counts["host_cap"] == len(kept) <= counts["url_dedup"]
    # host_cap without a URL column is a config error
    with pytest.raises(ValueError, match="url_col"):
        prepare_training_corpus(df, MixConfig(host_cap=5))


def test_dsir_stage(spark):
    rows = []
    kw = ("query engine scans table filter join sort output stream "
          "batch merge").split()
    junk = ("wombat doily parsnip zephyr gnocchi umlaut quasar vellum "
            "bixby njord").split()
    for i in range(30):
        pool = kw if i % 2 == 0 else junk
        rows.append((i, " ".join(pool[(i + j) % len(pool)]
                                 for j in range(8)), "en"))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    tgt = spark.createDataFrame(
        [(100 + j, " ".join(kw[j:] + kw[:j])) for j in range(4)],
        "doc_id LONG, text STRING",
    )
    cfg = MixConfig(exact=False, dsir_k=8, dsir_temperature=0.05,
                    dsir_n_buckets=2048, seed="dm")
    assert cfg.stages(with_dsir=True) == ["dsir"]
    assert cfg.stages() == []  # no target handed in -> stage off
    out = prepare_training_corpus(df, cfg, dsir_target_df=tgt)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert len(ids) == 8
    assert sum(1 for i in ids if i % 2 == 0) >= 7  # target-like wins
    counts = mix_report(df, cfg, dsir_target_df=tgt)
    assert counts == {"input": 30, "dsir": 8}


def _mix_url_docs(spark):
    return _df(spark).withColumn(
        "url",
        F.concat(
            F.lit("https://h"),
            F.pmod(F.col("doc_id"), F.lit(3)).cast("string"),
            F.lit(".ex.com/p/"), F.col("doc_id").cast("string"),
        ),
    )


def test_scratch_dir_barriers_are_value_identical(spark, tmp_path):
    """scratch_dir inserts write+re-read barriers after every
    self-referencing stage; survivors and attached columns must be
    identical to the fully lazy plan (the default). The lazy twin uses
    a MODERATE stage subset: with every self-referencing stage enabled
    the lazy plan tree doubles per stage and Catalyst planning alone
    blows past test budgets (the pathology scratch_dir exists to fix —
    see test_scratch_dir_all_stages_completes)."""
    from same_same_spark.pipeline.lm import train_bigram_lm

    docs = _mix_url_docs(spark)
    model = train_bigram_lm(docs.filter(F.col("doc_id") <= 3), text_col="text")
    cfg = MixConfig(
        url_col="url",
        dedup_lines=True,
        dedup_lines_global=True,
        global_line_min_chars=8,
        min_quality=0.3,
        lm_max_perplexity=1e9,
        exact=True, fuzzy_threshold=0.6,
        minhash_bands=16, minhash_n_hashes=16,
        test_frac=0.2, seed="t",
    )
    lazy = prepare_training_corpus(docs, cfg, lm_ref_df=model)
    barriered = prepare_training_corpus(
        docs, cfg, lm_ref_df=model,
        scratch_dir=str(tmp_path / "scratch"),
    )
    key = lambda r: r["doc_id"]
    a = sorted(lazy.collect(), key=key)
    b = sorted(barriered.collect(), key=key)
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert len(a) > 0


def test_scratch_dir_all_stages_completes(spark, tmp_path):
    """EVERY self-referencing stage enabled at once: the fully lazy
    plan is not even printable (driver OOM in generateTreeString at
    10-stage configs — measured); with scratch_dir the same
    configuration runs in seconds. Survivor sanity is asserted against
    the stage semantics rather than a lazy twin."""
    from same_same_spark.pipeline.lm import train_bigram_lm

    docs = _mix_url_docs(spark)
    model = train_bigram_lm(docs.filter(F.col("doc_id") <= 3), text_col="text")
    cfg = MixConfig(
        url_col="url",
        dedup_lines=True,
        dedup_lines_global=True,
        global_line_min_chars=8,
        min_quality=0.3,
        lm_max_perplexity=1e9,
        strip_spans=True, span_unit="gram", span_k=8, span_min_df=3,
        exact=True, fuzzy_threshold=0.6,
        minhash_bands=16, minhash_n_hashes=16,
        dsir_k=5,
        host_cap=10.0,
        test_frac=0.2, seed="t",
    )
    target = docs.filter(F.col("doc_id") % 2 == 0)
    out = prepare_training_corpus(
        docs, cfg, lm_ref_df=model, dsir_target_df=target,
        scratch_dir=str(tmp_path / "scratch"),
    ).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert 0 < len(ids) <= 5
    assert 99 not in ids  # quality gate
    # global line dedup strips 11/12 (single-line copies of 1/2) to the
    # same empty residue; whichever gate removes the residues, the
    # exact stage keeps at most min(11, 12) — 12 can never survive
    assert 12 not in ids


def test_lang_mix_stage(spark):
    from same_same_spark.pipeline.sampling import sample_language_mix

    # skewed languages; budget bites on the big one
    rows = [
        (i, f"english document number {i} with plenty of text", "en")
        for i in range(60)
    ] + [
        (100 + i, f"kleines deutsches dokument nummer {i}", "de")
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    cfg = MixConfig(
        exact=False, mix_budget=30.0, mix_allocator="unimax", seed="lm"
    )
    assert cfg.stages() == ["lang_mix"]
    out = prepare_training_corpus(df, cfg)
    kept = {r["doc_id"] for r in out.collect()}
    # the stage IS sample_language_mix with the derived seed
    want = {
        r["doc_id"]
        for r in sample_language_mix(
            df, 30.0, allocator="unimax", strata_col="lang",
            id_col="doc_id", seed="lm:langmix",
        ).collect()
    }
    assert kept == want
    # small language fully kept, big language capped
    assert sum(1 for i in kept if i >= 100) == 8
    assert 0 < sum(1 for i in kept if i < 100) < 60
    # report path carries the stage and composes with a gate
    cfg2 = MixConfig(
        exact=True, mix_budget=30.0, mix_allocator="temperature",
        mix_alpha=0.5, seed="lm",
    )
    assert cfg2.stages() == ["exact_dedup", "lang_mix"]
    counts = mix_report(df, cfg2)
    assert counts["lang_mix"] <= counts["exact_dedup"]
