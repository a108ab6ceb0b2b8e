"""Text analysis: token counts, quality, language ID, winnowing."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline import textqc


def _one(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")


def test_token_counts(spark):
    df = _one(spark, "hello world, foo.bar()  baz")
    [r] = df.select(
        textqc.ws_token_count_col("text").alias("ws"),
        textqc.bpe_token_count_col("text").alias("bpe"),
    ).collect()
    assert r["ws"] == 4
    # hello world , foo . bar ( ) baz → 5 words + 4 symbols
    assert r["bpe"] == 9
    [r0] = _one(spark, "   ").select(
        textqc.ws_token_count_col("text").alias("ws"),
        textqc.bpe_token_count_col("text").alias("bpe"),
    ).collect()
    assert r0["ws"] == 0 and r0["bpe"] == 0


def test_quality_scores(spark):
    cols = textqc.quality_cols("text")
    df = _one(spark, "the cat is on the mat and it is happy with the sun")
    [r] = df.select(*[v.alias(k) for k, v in cols.items()]).collect()
    assert r["ws_tokens"] == 13
    assert 0.4 < r["stopword_ratio"] <= 1.0  # prose-like
    assert r["punct_ratio"] == 0.0
    assert 0.0 <= r["quality_score"] <= 1.0
    [junk] = _one(spark, "@@@ ### $$$ %%%").select(
        *[v.alias(k) for k, v in cols.items()]
    ).collect()
    assert junk["stopword_ratio"] == 0.0
    assert junk["punct_ratio"] > 0.5
    assert junk["quality_score"] < r["quality_score"]


def test_lang_id(spark):
    cases = [
        (1, "the cat is on the mat and that is fine", "en"),
        (2, "der hund und die katze ist nicht da", "de"),
        (3, "el perro y la casa es grande en la calle", "es"),
        (4, "le chien est dans la maison pour les vacances", "fr"),
        (5, "zzz qqq www", "und"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select("doc_id", textqc.lang_id_col("text").alias("lang")).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"


def test_lang_id_oracle_parity(spark):
    texts = [
        (1, "the cat is on the mat"),
        (2, "der hund und die katze"),
        (3, "no markers here whatsoever"),
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select("doc_id", textqc.lang_id_col("text").alias("lang")).collect()
    }
    con = duckdb.connect()
    for i, t in texts:
        [(want,)] = con.sql(
            f"SELECT {textqc.lang_id_sql('t')} FROM (SELECT '{t}' AS t)"
        ).fetchall()
        assert got[i] == want


def test_winnow_fingerprints(spark):
    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog"),
            (2, "the   quick brown fox jumps over the lazy dog"),  # ws + case
            (3, "completely different text with nothing shared at all"),
        ],
        "doc_id LONG, text STRING",
    )
    fps = textqc.winnow_fingerprints(df, k=8, w=4)
    by_id = {}
    for r in fps.collect():
        by_id.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_id[1] == by_id[2]  # normalization-invariant
    assert by_id[1] != by_id[3]
    # density: winnowing keeps roughly 2/(w+1) of gram positions
    n_grams = len("the quick brown fox jumps over the lazy dog") - 7
    assert len(by_id[1]) < n_grams


def test_winnow_short_text(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id LONG, text STRING")
    assert textqc.winnow_fingerprints(df, k=8, w=4).count() == 0


def test_winnow_oracle_parity(spark):
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        "(1, 'The quick brown fox jumps over the lazy dog'), "
        "(2, 'winnowing parity check text')) AS t(doc_id, text)"
    )
    oracle = {
        (r[0], r[1])
        for r in con.sql(
            textqc.winnow_sql("doc_id", "text", "d", k=8, w=4)
        ).fetchall()
    }
    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog"),
            (2, "winnowing parity check text"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        (r["doc_id"], r["fp"])
        for r in textqc.winnow_fingerprints(df, k=8, w=4).collect()
    }
    assert got == oracle


# ---------------------------------------------------------------------------
# repetition metrics
# ---------------------------------------------------------------------------

_REP_TEXTS = [
    (1, "a b\na b\n\nc d e\n\n  \na b"),  # 4 lines (3 distinct), 3 paras
    (2, "x y z"),                          # single line, single para
    (3, ""),                               # empty → all zeros
    (4, "foo bar foo bar foo bar baz"),    # heavy n-gram repetition
    (5, "  \n \n  "),                      # whitespace-only lines dropped
    (6, "p q\n\np q\n\np q"),              # fully duplicated paragraphs
]


def _rep_df(spark):
    return spark.createDataFrame(_REP_TEXTS, "doc_id LONG, text STRING")


def test_repetition_metrics(spark):
    cols = textqc.repetition_cols("text")
    out = {
        r["doc_id"]: r.asDict()
        for r in _rep_df(spark)
        .select("doc_id", *[v.alias(k) for k, v in cols.items()])
        .collect()
    }
    # doc 1: lines = [a b, a b, c d e, a b] → 2 of 4 are repeats;
    # chars 3+3+5+3 = 14, distinct 8 → dup_char 6/14
    assert out[1]["n_lines"] == 4
    assert out[1]["dup_line_frac"] == pytest.approx(0.5)
    assert out[1]["dup_line_char_frac"] == pytest.approx(6 / 14)
    assert out[1]["n_paras"] == 3 and out[1]["dup_para_frac"] == 0.0
    # empty + whitespace-only texts: no units, all fractions zero
    for d in (3, 5):
        assert out[d]["n_lines"] == 0 and out[d]["n_paras"] == 0
        assert out[d]["dup_line_frac"] == 0.0
        assert out[d]["dup_para_char_frac"] == 0.0
    # doc 6: 3 identical paragraphs → dup_para_frac 2/3, char frac 2/3
    assert out[6]["n_paras"] == 3
    assert out[6]["dup_para_frac"] == pytest.approx(2 / 3)
    assert out[6]["dup_para_char_frac"] == pytest.approx(2 / 3)


def test_repetition_oracle_parity(spark):
    cols = textqc.repetition_cols("text")
    got = (
        _rep_df(spark)
        .select("doc_id", *[v.alias(k) for k, v in cols.items()])
        .orderBy("doc_id")
        .collect()
    )
    con = duckdb.connect()
    con.register("d", _rep_df(spark).toPandas())
    rs = textqc.repetition_sql("text")
    oracle = con.execute(
        "SELECT doc_id, "
        + ", ".join(f"{e} AS {k}" for k, e in rs.items())
        + " FROM d ORDER BY doc_id"
    ).fetchall()
    for a, b in zip(got, oracle):
        assert a["doc_id"] == b[0]
        for i, k in enumerate(
            ["n_lines", "dup_line_frac", "dup_line_char_frac",
             "n_paras", "dup_para_frac", "dup_para_char_frac"]
        ):
            assert a[k] == pytest.approx(b[i + 1]), (a["doc_id"], k)


def test_top_ngram_stats(spark):
    out = {
        r["doc_id"]: r.asDict()
        for r in textqc.top_ngram_stats(_rep_df(spark), n=2).collect()
    }
    # doc 4 words: foo bar foo bar foo bar baz → 'foo bar' ×3 of 6 grams
    r4 = out[4]
    assert r4["top_gram"] == "foo bar" and r4["top_count"] == 3
    # covered = 3 × 6 chars; word chars = 3*3 + 3*3 + 3 = 21
    assert r4["top_ngram_char_frac"] == pytest.approx(18 / 21)
    # dup grams: foo bar ×3 (6), bar foo ×2 (6) → 30 of 36 occurrence chars
    assert r4["dup_ngram_char_frac"] == pytest.approx(30 / 36)
    # docs shorter than n words produce no row
    assert 3 not in out and 5 not in out
    # deterministic tie-break: doc 2 grams x y / y z (both ×1) → 'x y'
    assert out[2]["top_gram"] == "x y" and out[2]["top_count"] == 1
    assert out[2]["dup_ngram_char_frac"] == 0.0


def test_top_ngram_oracle_parity(spark):
    got = (
        textqc.top_ngram_stats(_rep_df(spark), n=3)
        .orderBy("doc_id")
        .collect()
    )
    con = duckdb.connect()
    con.register("d", _rep_df(spark).toPandas())
    oracle = con.execute(
        textqc.top_ngram_sql("doc_id", "text", "d", n=3) + " ORDER BY doc_id"
    ).fetchall()
    assert len(got) == len(oracle)
    for a, b in zip(got, oracle):
        assert (
            a["doc_id"], a["top_gram"], a["top_count"]
        ) == (b[0], b[1], b[2])
        assert a["top_ngram_char_frac"] == pytest.approx(b[3])
        assert a["dup_ngram_char_frac"] == pytest.approx(b[4])


# ---------------------------------------------------------------------------
# C4-style filters
# ---------------------------------------------------------------------------


def test_c4_line_filter(spark):
    text = (
        "This is a proper sentence with words.\n"
        "short line\n"                      # < 5 words
        "no terminal punctuation on this line\n"
        'He said "it ends with a quote."\n'  # quote counts as terminal
        "Ends with bang and has five words!"
    )
    [r] = _one(spark, text).select(
        textqc.c4_line_filter("text").alias("kept")
    ).collect()
    kept = r["kept"].split("\n")
    assert kept == [
        "This is a proper sentence with words.",
        'He said "it ends with a quote."',
        "Ends with bang and has five words!",
    ]
    # no surviving lines → empty string, not null
    [r0] = _one(spark, "nope\nalso nope").select(
        textqc.c4_line_filter("text").alias("kept")
    ).collect()
    assert r0["kept"] == ""


def test_c4_doc_flags(spark):
    flags = textqc.c4_doc_flags("text")

    def run(text):
        [r] = _one(spark, text).select(
            *[v.alias(k) for k, v in flags.items()]
        ).collect()
        return r

    good = run("One sentence here. Two sentences here! Three sentences here?")
    assert good["n_sentences"] == 3 and good["c4_keep"] is True
    few = run("Only two sentences. Right here.")
    assert few["c4_keep"] is False and few["blocklisted"] is False
    code = run("if (x) { y(); } done. more. three. four.")
    assert code["blocklisted"] is True and code["c4_keep"] is False
    lorem = run("Lorem IPSUM filler. Second one. Third one.")
    assert lorem["blocklisted"] is True  # case-insensitive match
    # a punctuation RUN is one sentence: ellipsis junk must not pass
    junk = run("um... hmm... yeah...")
    assert junk["n_sentences"] == 3 and junk["c4_keep"] is True
    junk2 = run("wait.... what?!")
    assert junk2["n_sentences"] == 2


def test_c4_doc_flags_sql_empty_blocklist(spark):
    # the SQL twin must stay valid SQL when no blocklist is configured
    df = spark.createDataFrame(
        [(1, "One. Two. Three.")], "doc_id LONG, text STRING"
    )
    con = duckdb.connect()
    con.register("d", df.toPandas())
    fs = textqc.c4_doc_flags_sql("text", blocklist=())
    row = con.execute(
        "SELECT "
        + ", ".join(f"{e} AS {k}" for k, e in fs.items())
        + " FROM d"
    ).fetchone()
    assert row == (3, False, True)
    # and the Spark twin agrees
    flags = textqc.c4_doc_flags("text", blocklist=())
    [r] = df.select(*[v.alias(k) for k, v in flags.items()]).collect()
    assert (r["n_sentences"], r["blocklisted"], r["c4_keep"]) == row


def test_redact_pii(spark):
    flags = textqc.redact_pii("text")
    [r] = _one(
        spark,
        "contact bob.smith+x@example.co.uk or 10.0.0.1 and "
        "alice@test.org done",
    ).select(*[v.alias(k) for k, v in flags.items()]).collect()
    assert r["n_email"] == 2 and r["n_ipv4"] == 1
    assert "<EMAIL>" in r["redacted"] and "<IP>" in r["redacted"]
    assert "example" not in r["redacted"] and "10.0.0.1" not in r["redacted"]
    [clean] = _one(spark, "no personal data here at all").select(
        *[v.alias(k) for k, v in flags.items()]
    ).collect()
    assert clean["n_email"] == 0 and clean["n_ipv4"] == 0


def test_redact_pii_oracle_parity(spark):
    texts = [
        (1, "mail me at a.b@c.de or ping 192.168.1.254 thanks"),
        (2, "two mails x@y.io z@w.ai one ip 8.8.8.8"),
        (3, "nothing sensitive at all"),
        (4, ""),
        (5, None),  # NULL text: 0 counts in BOTH engines
        (6, "1.2.3.4@x.co"),  # consumed by the earlier email rule
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    flags = textqc.redact_pii("text")
    got = df.select(
        "doc_id", *[v.alias(k) for k, v in flags.items()]
    ).orderBy("doc_id").collect()
    con = duckdb.connect()
    con.register("d", df.toPandas())
    fs = textqc.redact_pii_sql("text")
    oracle = con.execute(
        "SELECT doc_id, "
        + ", ".join(f"{e} AS {k}" for k, e in fs.items())
        + " FROM d ORDER BY doc_id"
    ).fetchall()
    for a, b in zip(got, oracle):
        assert (
            a["doc_id"], a["n_email"], a["n_ipv4"], a["redacted"]
        ) == tuple(b)


def test_c4_oracle_parity(spark):
    texts = [
        (1, "Good sentence number one. Good sentence number two! Third?"),
        (2, "short\nlorem ipsum. x. y. z."),
        (3, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    flags = textqc.c4_doc_flags("text")
    got = df.select(
        "doc_id", textqc.c4_line_filter("text").alias("kept"),
        *[v.alias(k) for k, v in flags.items()],
    ).orderBy("doc_id").collect()
    con = duckdb.connect()
    con.register("d", df.toPandas())
    fs = textqc.c4_doc_flags_sql("text")
    oracle = con.execute(
        "SELECT doc_id, " + textqc.c4_line_filter_sql("text") + " AS kept, "
        + ", ".join(f"{e} AS {k}" for k, e in fs.items())
        + " FROM d ORDER BY doc_id"
    ).fetchall()
    for a, b in zip(got, oracle):
        assert (
            a["doc_id"], a["kept"], a["n_sentences"],
            a["blocklisted"], a["c4_keep"],
        ) == tuple(b)


def test_dedup_lines(spark):
    cols = textqc.dedup_lines_cols("text")
    [r] = _one(
        spark, "MIT License\nreal one\nMIT License\n  MIT License \nreal two"
    ).select(*[v.alias(k) for k, v in cols.items()]).collect()
    # first occurrence kept; later raw AND trimmed-form repeats removed
    assert r["text_line_deduped"] == "MIT License\nreal one\nreal two"
    assert r["n_lines_removed"] == 2

    # blank lines always survive (paragraph structure preserved)
    [b] = _one(spark, "a\n\n\nb\n\na").select(
        *[v.alias(k) for k, v in cols.items()]
    ).collect()
    assert b["text_line_deduped"] == "a\n\n\nb\n"
    assert b["n_lines_removed"] == 1

    # idempotence: dedup(dedup(x)) == dedup(x)
    once = _one(spark, "x\ny\nx\nz\ny").select(
        cols["text_line_deduped"].alias("text")
    )
    [twice] = once.select(
        textqc.dedup_lines_cols("text")["text_line_deduped"].alias("t"),
        textqc.dedup_lines_cols("text")["n_lines_removed"].alias("n"),
    ).collect()
    assert twice["t"] == "x\ny\nz" and twice["n"] == 0

    # dup-free text is untouched byte-for-byte
    [c] = _one(spark, "alpha\n beta\ngamma\n").select(
        *[v.alias(k) for k, v in cols.items()]
    ).collect()
    assert c["text_line_deduped"] == "alpha\n beta\ngamma\n"
    assert c["n_lines_removed"] == 0


def test_dedup_lines_oracle_parity(spark):
    texts = [
        (1, "dup\nkeep\ndup\n  dup  \nend"),
        (2, "a\n\n\na\n\nb"),
        (3, "no dups\nat all\n"),
        (4, ""),
        (5, None),  # NULL text → NULL out in BOTH engines
        (6, "only\n"),
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    cols = textqc.dedup_lines_cols("text")
    got = df.select(
        "doc_id", *[v.alias(k) for k, v in cols.items()]
    ).orderBy("doc_id").collect()
    con = duckdb.connect()
    con.register("d", df.toPandas())
    fs = textqc.dedup_lines_sql("text")
    oracle = con.execute(
        "SELECT doc_id, "
        + ", ".join(f"{e} AS {k}" for k, e in fs.items())
        + " FROM d ORDER BY doc_id"
    ).fetchall()
    for a, b in zip(got, oracle):
        assert (
            a["doc_id"], a["text_line_deduped"], a["n_lines_removed"]
        ) == tuple(b)


# ---------------------------------------------------------------------------
# cross-document line dedup (dedup_lines_global)
# ---------------------------------------------------------------------------


def _global_dedup_py(rows, min_line_chars=0):
    """Pure-Python reference: rows = [(id, text)] sorted by id; each
    distinct trimmed non-exempt line keeps only its first (id, pos)."""
    seen = {}
    for i, text in sorted(rows):
        for p, line in enumerate(text.split("\n")):
            t = line.strip(" \t\n\f\r")
            if len(t) == 0 or len(t) < min_line_chars:
                continue
            seen.setdefault(t, (i, p))
    out = {}
    for i, text in rows:
        kept = []
        removed = 0
        for p, line in enumerate(text.split("\n")):
            t = line.strip(" \t\n\f\r")
            if len(t) == 0 or len(t) < min_line_chars or seen[t] == (i, p):
                kept.append(line)
            else:
                removed += 1
        out[i] = ("\n".join(kept), removed)
    return out


def test_dedup_lines_global_headers(spark):
    rows = [
        (1, "MIT License\nCopyright Foo\n\nreal content one"),
        (2, "MIT License\nCopyright Foo\n\nreal content two"),
        (3, "MIT License\n\nreal content three\nreal content one"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: (r["text_global_deduped"], r["n_lines_removed"])
        for r in textqc.dedup_lines_global(df).collect()
    }
    # doc 1 keeps everything (first occurrences); docs 2/3 lose the
    # shared header lines but keep blanks and their own content;
    # doc 3 also loses doc 1's content line that it repeated.
    assert out[1] == ("MIT License\nCopyright Foo\n\nreal content one", 0)
    assert out[2] == ("\nreal content two", 2)
    assert out[3] == ("\nreal content three", 2)
    assert out == _global_dedup_py(rows)


def test_dedup_lines_global_fully_emptied_doc_survives(spark):
    rows = [(1, "only line"), (2, "only line")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: (r["text_global_deduped"], r["n_lines_removed"])
        for r in textqc.dedup_lines_global(df).collect()
    }
    assert out == {1: ("only line", 0), 2: ("", 1)}


def test_dedup_lines_global_min_chars_exemption(spark):
    rows = [(1, "}\nlong shared line here"), (2, "}\nlong shared line here")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r["text_global_deduped"]
        for r in textqc.dedup_lines_global(df, min_line_chars=4).collect()
    }
    # "}" is exempt (structure) in BOTH docs; the long line dedupes
    assert out == {1: "}\nlong shared line here", 2: "}"}


def test_dedup_lines_global_random_differential(spark):
    import random

    rng = random.Random(11)
    vocab = [f"line {i} body" for i in range(30)] + ["", "   ", "\t"]
    rows = [
        (i, "\n".join(rng.choice(vocab) for _ in range(rng.randrange(12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["text_global_deduped"], r["n_lines_removed"])
        for r in textqc.dedup_lines_global(df).collect()
    }
    assert got == _global_dedup_py(rows)


def test_mix_global_line_dedup_stage(spark):
    from same_same_spark.pipeline.mix import MixConfig, prepare_training_corpus

    rows = [
        (1, "SHARED BOILERPLATE HEADER\nunique body one", "en"),
        (2, "SHARED BOILERPLATE HEADER\nunique body two", "en"),
        (3, "SHARED BOILERPLATE HEADER\nunique body one", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    cfg = MixConfig(dedup_lines_global=True, exact=True)
    assert cfg.stages() == ["global_line_dedup", "exact_dedup"]
    out = {r["doc_id"]: r["text"] for r in
           prepare_training_corpus(df, cfg).collect()}
    # after global line dedup, doc 3's remaining text equals doc 1's
    # remainder minus the header... doc 3 loses BOTH lines (header and
    # body are later duplicates) and survives as an empty doc unless
    # exact dedup collapses it with other empties (it is unique here).
    assert out[1] == "SHARED BOILERPLATE HEADER\nunique body one"
    assert out[2] == "unique body two"
    assert out[3] == ""
