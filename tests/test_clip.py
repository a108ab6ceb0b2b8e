"""X11 SimpleCLIP hash embedder: scalar-model/UDF differential, golden
values, fallback edges, and the DuckDB oracle differential."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from same_same_spark.pipeline.clip import (
    _embed_one,
    ascii_filter_col,
    clip_text_embed,
    clip_text_topk,
    duckdb_clip_sql,
    embed_text_py,
)

TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "  Mixed CASE   with\tweird   spacing\n",
    "ab",          # < 3 bytes -> no trigrams; one word
    "",            # zero vector
    "x",           # single short word, no trigrams
    "repeat repeat repeat repeat",
]


def test_scalar_model_vs_vectorized():
    for t in TEXTS:
        a = np.asarray(embed_text_py(t, dim=32))
        b = _embed_one(t, dim=32)
        assert np.array_equal(a, b), t  # bit-identical accumulation order


def test_unit_norm_or_zero():
    for t in TEXTS:
        v = np.asarray(embed_text_py(t, dim=16))
        n = float(np.dot(v, v))
        assert n == 0.0 or n == pytest.approx(1.0, abs=1e-12)


def test_empty_text_zero_vector():
    assert embed_text_py("", dim=8) == [0.0] * 8
    assert embed_text_py("   \t ", dim=8) == [0.0] * 8


def test_golden_values():
    # Pinned outputs of the reference hashing math (hash = BE-uint32 of
    # md5(word + byte(i) + byte(j)), sin/cos mix, L2 norm). Any change
    # to the pipeline shows up here first.
    v = embed_text_py("hello world", dim=4)
    h = hash(tuple(round(x, 12) for x in v))
    # derive the golden from the scalar model itself once, then freeze:
    import hashlib
    t = "hello world"
    b = t.encode()
    exp = []
    for i in range(4):
        val = 0.0
        for j, w in enumerate(["hello", "world"]):
            hh = hashlib.md5(w.encode() + bytes((i, j))).digest()
            val += math.sin(float(int.from_bytes(hh[:4], "big"))) * 0.5
        for j in range(len(b) - 2):
            hh = hashlib.md5(b[j:j + 3] + bytes((i, 0))).digest()
            val += math.cos(float(int.from_bytes(hh[:4], "big"))) * 0.1
        exp.append(val)
    nrm = math.sqrt(sum(x * x for x in exp))
    exp = [x / nrm for x in exp]
    assert v == exp


def test_case_and_trim_normalisation():
    assert embed_text_py("  HeLLo WoRLD  ", 8) == embed_text_py(
        "hello world", 8
    )


def test_identical_text_cosine_one(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta")],
        "doc_id LONG, content STRING",
    )
    res = {
        r["doc_id"]: r["score"]
        for r in clip_text_topk(df, "alpha beta gamma", k=3, dim=32).collect()
    }
    assert res[1] == pytest.approx(1.0, abs=1e-9)
    assert res[2] == pytest.approx(1.0, abs=1e-9)
    assert res[3] < 1.0


def test_udf_matches_model(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id LONG, content STRING"
    )
    rows = clip_text_embed(df, dim=16).orderBy("doc_id").collect()
    for r in rows:
        want = embed_text_py(TEXTS[r["doc_id"]], dim=16)
        assert list(r["clip_emb"]) == want, TEXTS[r["doc_id"]]


def test_duckdb_oracle_matches(spark):
    docs = [(i, t) for i, t in enumerate(TEXTS)]
    df = spark.createDataFrame(docs, "doc_id LONG, content STRING")
    got = sorted(
        (r["doc_id"], round(r["score"], 9), r["rank"])
        for r in clip_text_topk(
            df.filter(ascii_filter_col(df["content"])),
            "quick brown fox", k=10, dim=16,
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join("(%d, %s)" % (i, _sq(t)) for i, t in docs)
        + ") AS v(doc_id, content)"
    )
    sql = duckdb_clip_sql(
        "docs", "doc_id", "content", "quick brown fox",
        k=10, dim=16, round_score=None,
    )
    want = sorted(
        (r[0], round(r[1], 9), r[2]) for r in con.execute(sql).fetchall()
    )
    assert got == want


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''").replace("\t", "' || chr(9) || '").replace(
        "\n", "' || chr(10) || '"
    ) + "'"
