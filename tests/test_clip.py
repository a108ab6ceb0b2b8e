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
    # FROZEN outputs of the reference hashing math (hash = BE-uint32 of
    # md5(word + byte(i) + byte(j)), sin/cos mix, L2 norm). Any change
    # to the embedder shows up here first — goldens are literals, not
    # re-derived.
    assert embed_text_py("hello world", dim=4) == [
        0.13989587652424632,
        0.49849724016159846,
        -0.2541185999046733,
        -0.8169169985165391,
    ]


def test_image_golden_values():
    from same_same_spark.pipeline.clip import embed_image_py, fake_decode_rgb

    v = embed_image_py(fake_decode_rgb(b"payload-a", 32))
    assert v[0] == 0.0
    assert v[400] == 0.11378334902080119
    assert sum(1 for x in v if x != 0) == 148


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


# ---------------------------------------------------------------------------
# image path
# ---------------------------------------------------------------------------

def _grids():
    from same_same_spark.pipeline.clip import fake_decode_rgb

    return [
        fake_decode_rgb(b"payload-a", 32),
        fake_decode_rgb(b"payload-b", 32),
        fake_decode_rgb(b"payload-a", 224),  # reference-size grid
        fake_decode_rgb(b"small", 8),        # < texture/hist sample sizes
        fake_decode_rgb(b"odd", 33),         # not divisible by 8/16
        np.zeros((16, 16, 3), dtype=np.uint8),
        np.full((16, 16, 3), 255, dtype=np.uint8),
    ]


def test_image_scalar_vs_vectorized():
    from same_same_spark.pipeline.clip import _embed_image_one, embed_image_py

    for g in _grids():
        a = np.asarray(embed_image_py(g))
        b = _embed_image_one(g)
        assert np.array_equal(a, b), g.shape


def test_image_sections_and_norm():
    from same_same_spark.pipeline.clip import _embed_image_one

    v = _embed_image_one(_grids()[0])
    assert v.shape == (512,)
    n = float(np.dot(v, v))
    assert n == pytest.approx(1.0, abs=1e-12)


def test_image_texture_wraparound_quirk():
    # A darker right neighbour must wrap mod 2^32 (Go uint32 math), which
    # lands the edge in a *different* bin than the symmetric |delta| would
    from same_same_spark.pipeline.clip import embed_image_py

    g = np.zeros((16, 16, 3), dtype=np.uint8)
    g[:, :8] = 200   # bright left half
    g[:, 8:] = 100   # darker right half -> negative delta -> wraps
    v = embed_image_py(g)
    tex = v[256:384]
    assert sum(1 for x in tex if x != 0) > 0
    # the wrapped h-edge value: (100-200)*0x101 mod 2^32, x3 channels
    wrapped = ((100 - 200) * 0x101) % (1 << 32) * 3.0
    want_bin = int(wrapped / 65536.0 * 64.0) % 64
    assert tex[want_bin] != 0


def test_image_spark_plumbing(spark):
    from same_same_spark.pipeline.clip import (
        _embed_image_one,
        clip_image_features,
        fake_decode_rgb,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"payload-a")), (2, bytearray(b"payload-b"))],
        "doc_id LONG, content BINARY",
    )
    rows = {r["doc_id"]: r["clip_emb"] for r in clip_image_features(df).collect()}
    for i, payload in ((1, b"payload-a"), (2, b"payload-b")):
        want = _embed_image_one(fake_decode_rgb(payload)).tolist()
        assert list(rows[i]) == want


def test_real_decode_png_works_jpeg_gated():
    """decode_image_rgb now decodes PNG for real via the stdlib codec
    (identity-size resize returns the exact pixels); JPEG remains the
    honest NotImplementedError gate when PIL is absent."""
    import numpy as np

    from same_same_spark.pipeline.clip import decode_image_rgb
    from same_same_spark.pipeline.imagecodec import encode_png

    try:
        import PIL  # noqa: F401

        pytest.skip("pillow available; stdlib gate not exercised")
    except ImportError:
        pass
    img = np.random.RandomState(9).randint(
        0, 256, size=(12, 10, 3), dtype=np.uint8
    )
    assert np.array_equal(decode_image_rgb(encode_png(img), (10, 12)), img)
    out = decode_image_rgb(encode_png(img))  # default 224x224
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8
    # the remaining honest gate: arithmetic-coded JPEG (SOF9) — the
    # huffman variants (incl. progressive) now decode for real
    import struct

    sof9 = struct.pack(">BHHB", 8, 1, 1, 1) + b"\x01\x11\x00"
    payload = (
        b"\xff\xd8\xff\xc9" + struct.pack(">H", len(sof9) + 2) + sof9
    )
    with pytest.raises(NotImplementedError):
        decode_image_rgb(payload)


def test_clip_image_embedding_over_real_png(spark):
    """Full SimpleCLIP image pipeline on genuinely decoded pixels:
    Spark mapInPandas result == local embed of the locally decoded
    grid (simple.go:107-143 end to end, no stand-in decoder)."""
    import numpy as np

    from same_same_spark.pipeline.clip import (
        _embed_image_one,
        clip_image_features,
        decode_image_rgb,
    )
    from same_same_spark.pipeline.imagecodec import encode_png

    rng = np.random.RandomState(11)
    blobs = {
        i: encode_png(rng.randint(0, 256, size=(48, 64, 3), dtype=np.uint8))
        for i in (1, 2)
    }
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in blobs.items()],
        "doc_id LONG, content BINARY",
    )
    got = {
        r["doc_id"]: r["clip_emb"]
        for r in clip_image_features(df, decoder=decode_image_rgb).collect()
    }
    for i, blob in blobs.items():
        want = _embed_image_one(decode_image_rgb(blob)).tolist()
        assert got[i] == want
    assert got[1] != got[2]


def test_info_separators_are_not_whitespace(spark):
    """Go strings.Fields does NOT split on \\x1c-\\x1f (Python's
    str.split does) — the model must keep 'foo\\x1cbar' as one word and
    agree with the DuckDB oracle on such texts (review finding)."""
    from same_same_spark.pipeline.clip import _go_fields

    assert _go_fields("foo\x1cbar baz") == ["foo\x1cbar", "baz"]

    docs = [(1, "foo\x1cbar baz"), (2, "foo bar baz")]
    df = spark.createDataFrame(docs, "doc_id LONG, content STRING")
    got = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in clip_text_topk(
            df.filter(ascii_filter_col(df["content"])), "foo", k=10, dim=8
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT 1 AS doc_id, "
        "'foo' || chr(28) || 'bar baz' AS content "
        "UNION ALL SELECT 2, 'foo bar baz'"
    )
    sql = duckdb_clip_sql(
        "docs", "doc_id", "content", "foo", k=10, dim=8, round_score=None
    )
    want = sorted(
        (r[0], round(r[1], 9)) for r in con.execute(sql).fetchall()
    )
    assert got == want
