"""Span-level dedup ACTION (pipeline/spans.py) — VERDICT r3 #2."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline.spans import (
    remove_shared_spans,
    remove_shared_spans_sql,
    shared_span_ranges,
)

HDR = (
    "// Copyright Example Corp. All rights reserved.\n"
    "// Licensed under the Apache License, Version 2.0\n"
)


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_planted_headers_stripped_sha_exact_remainders(spark):
    """The VERDICT done-criterion: a corpus with planted shared headers
    comes out header-free (except one canonical copy) with sha-verified
    untouched remainders."""
    bodies = {
        i: f"unique body {i} with its own distinct words line\n"
           f"and a second line mentioning topic {i * 7}"
        for i in range(1, 9)
    }
    docs = [(i, HDR + bodies[i]) for i in range(1, 7)] + [
        (7, bodies[7]),                      # no header
        (8, "lead line here first\n" + HDR + bodies[8]),  # mid-doc header
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_shared_spans(df, min_df=3).collect()
    }
    assert out[1] == HDR + bodies[1]          # canonical keeps its copy
    for i in range(2, 7):
        assert out[i] == bodies[i]            # header-free
        assert _sha(out[i]) == _sha(bodies[i])  # remainder byte-exact
    assert out[7] == bodies[7]                # untouched
    assert out[8] == "lead line here first\n" + bodies[8]
    assert HDR not in out[8]


def test_case_variant_header_survives_conservatively(spark):
    """Only byte-identical spans are stripped: a case-variant header is
    a DIFFERENT byte sequence — stripping text we cannot locate exactly
    would corrupt documents, so it survives unless its variant group
    itself reaches min_df."""
    docs = [(i, HDR + f"body number {i} distinct content") for i in (1, 2, 3)]
    docs.append((4, HDR.upper() + "body four distinct content"))
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_shared_spans(df, min_df=3).collect()
    }
    assert out[4].startswith(HDR.upper())     # variant kept
    assert out[2] == "body number 2 distinct content"


def test_gram_mode_char_exact_not_line_aligned(spark):
    """unit='gram' strips spans that are NOT line-shaped: a shared
    sentence embedded mid-line, located char-exactly."""
    shared = "the quick brown fox jumps over the lazy dog repeatedly"
    docs = [
        (1, f"alpha intro {shared} alpha outro"),
        (2, f"beta opening text {shared} beta closing"),
        (3, f"gamma starts {shared} gamma ends"),
        (4, "delta has nothing shared at all here"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_shared_spans(
            df, unit="gram", k=8, min_df=3, min_span_chars=20
        ).collect()
    }
    assert shared in out[1]                   # canonical keeps it
    assert shared not in out[2] and shared not in out[3]
    assert out[2].startswith("beta opening text") and out[2].endswith(
        "beta closing"
    )
    assert out[4] == docs[3][1]


def test_linear_in_sharers_not_pairwise(spark):
    """A header shared by 200 docs yields exactly 200 occurrence rows
    (one per doc) — the df-based formulation; the pairwise-diagonal
    shape would be 19,900 rows. Also pins plan shape: no cartesian or
    broadcast-nested-loop join anywhere."""
    docs = [
        (i, HDR + f"body {i} with unique trailing words {i * 13}")
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    ranges = shared_span_ranges(df, min_df=3)
    plan = ranges._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = ranges.collect()
    assert len(rows) == 200
    assert sum(r["doc_id"] != r["canon"] for r in rows) == 199
    assert all(r["span_docs"] == 200 for r in rows)


def test_gram_mode_maximal_shared_context(spark):
    """Gram mode finds the MAXIMAL byte-identical context: with docs
    `s1 + '#<i>#' + s2 + ' tail <word>'`, the shared bytes are
    `s1 + '#'` and `'#' + s2 + ' tail '` (only the digit and the tail
    word differ) — the strip removes exactly those, leaving the
    doc-unique bytes, with removed_chars = the length difference."""
    s1 = "alpha shared sentence one with enough words"
    s2 = "beta shared sentence two also long enough here"
    docs = [
        (1, f"{s1}#1#{s2} tail one"),
        (2, f"{s1}#2#{s2} tail two"),
        (3, f"{s1}#3#{s2} tail three"),
        (4, "completely unrelated document body"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: (r["text"], r["removed_chars"])
        for r in remove_shared_spans(
            df, unit="gram", k=8, min_df=3, min_span_chars=20,
            with_stats=True,
        ).collect()
    }
    assert out[2][0] == "2two" and out[3][0] == "3three"
    for i in (2, 3):
        assert len(out[i][0]) + out[i][1] == len(docs[i - 1][1])
    assert out[1][0] == docs[0][1]  # canonical untouched
    assert out[4] == (docs[3][1], 0)


def test_gram_mode_repetitive_text_stitch_invariants(spark):
    """Highly repetitive text (periodic grams recur at many positions
    in many docs) is where gram-mode strip ranges can overlap; the
    running-max stitch must never duplicate or drop remainder bytes:
    output length + removed_chars == input length, the doc-unique
    marker survives, and the output is composed of input bytes only."""
    period = "spam ham eggs "
    # marker = one repeated doc-unique letter: every 8-gram touching it
    # is doc-unique, so no marker byte can be part of a shared span
    docs = [
        (i, period * 6 + chr(ord("a") + i) * 10 + period * 6
            + f" end{i}")
        for i in range(1, 7)
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: (r["text"], r["removed_chars"])
        for r in remove_shared_spans(
            df, unit="gram", k=8, min_df=3, min_span_chars=20,
            with_stats=True,
        ).collect()
    }
    originals = dict(docs)
    assert any(v[1] > 0 for v in out.values())  # something stripped
    for i, (txt, removed) in out.items():
        assert len(txt) + removed == len(originals[i])
        assert chr(ord("a") + i) * 10 in txt  # unique bytes survive
        assert removed >= 0


def test_repeated_span_within_one_doc(spark):
    """A non-canonical doc containing the shared span TWICE loses both
    occurrences; ranges are disjoint so stitching is unambiguous."""
    docs = [
        (1, HDR + "body one distinct enough to count"),
        (2, HDR + "body two distinct enough to count"),
        (3, HDR + "middle part of doc three\n" + HDR + "tail of three"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: (r["text"], r["n_spans_removed"])
        for r in remove_shared_spans(df, min_df=3, with_stats=True).collect()
    }
    assert out[3][0] == "middle part of doc three\ntail of three"
    assert out[3][1] == 2
    assert out[1][0].startswith(HDR)          # canonical


def test_spark_matches_duckdb_twin_on_messy_corpus(spark):
    """Full-value differential vs the SQL twin on a corpus with NULLs,
    empties, header-only docs, mid-doc headers and shared body lines."""
    docs = [
        (1, HDR + "unique body one with words"),
        (2, HDR + "another body entirely different"),
        (3, HDR + "third unique content here"),
        (4, "no header doc at all"),
        (5, None),
        (6, ""),
        (7, HDR),
        (8, "prefix line\n" + HDR + "tail body"),
        (9, "shared body line across docs nine and ten\nplus nine"),
        (10, "shared body line across docs nine and ten\nplus ten"),
        (11, "shared body line across docs nine and ten\nplus eleven"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = sorted(
        (r["doc_id"], r["text"], r["n_spans_removed"], r["removed_chars"])
        for r in remove_shared_spans(
            df, min_df=3, min_span_chars=20, with_stats=True
        ).collect()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(docs, columns=["doc_id", "text"]))
    sql = (
        "WITH "
        + remove_shared_spans_sql("t", "doc_id", "text", 3, 20)
        + " SELECT doc_id, text, n_spans_removed, removed_chars FROM clean"
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_mix_stage_composes_header_dups_collapse(spark):
    """strip_spans in prepare_training_corpus runs BEFORE exact dedup:
    docs identical except for the header collapse into one."""
    from same_same_spark.pipeline.mix import MixConfig, prepare_training_corpus

    body_y = "body shared by doc two and four exactly here"
    docs = [
        (1, HDR + "body one with its own words entirely"),
        (2, HDR + body_y),
        (3, HDR + "body three also distinct from the others"),
        (4, body_y),
        (5, "an unrelated document body with different words"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    cfg = MixConfig(strip_spans=True, span_min_df=3, exact=True)
    out = prepare_training_corpus(df, cfg)
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    # header (df=3) stripped from docs 2,3; doc 2 becomes byte-equal to
    # doc 4 and exact dedup keeps the min id of the identical pair
    assert set(rows) == {1, 2, 3, 5}
    assert rows[2] == body_y
    assert rows[1].startswith(HDR)            # canonical keeps header
    assert "span_strip" in cfg.stages()


def test_mix_stage_gram_mode_strips_midline_boilerplate(spark):
    """span_unit='gram' + span_k route through prepare_training_corpus:
    a shared substring EMBEDDED mid-line (invisible to line mode) is
    stripped at gram granularity from every non-canonical doc."""
    from same_same_spark.pipeline.mix import MixConfig, prepare_training_corpus

    boiler = "COPYRIGHT-NOTICE-SHARED-EXACTLY-ACROSS-DOCS"
    docs = [
        (1, f"alpha {boiler} omega one"),
        (2, f"beta {boiler} omega two"),
        (3, f"gamma {boiler} omega three"),
        (4, "independent fourth document"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    line_cfg = MixConfig(
        strip_spans=True, span_unit="line", span_min_df=3,
        span_min_chars=20, exact=False,
    )
    line_rows = {
        r["doc_id"]: r["text"]
        for r in prepare_training_corpus(df, line_cfg).collect()
    }
    assert all(boiler in line_rows[i] for i in (1, 2, 3))  # lines differ

    gram_cfg = MixConfig(
        strip_spans=True, span_unit="gram", span_k=6, span_min_df=3,
        span_min_chars=20, exact=False,
    )
    gram_rows = {
        r["doc_id"]: r["text"]
        for r in prepare_training_corpus(df, gram_cfg).collect()
    }
    assert boiler in gram_rows[1]                      # canonical keeps it
    assert boiler not in gram_rows[2]
    assert boiler not in gram_rows[3]
    assert gram_rows[4] == "independent fourth document"


def test_bad_unit_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="unknown unit"):
        remove_shared_spans(df, unit="paragraph").collect()
