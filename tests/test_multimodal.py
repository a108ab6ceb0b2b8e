"""Multimodal binary-column plumbing (decode stubbed, plumbing real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from same_same_spark.pipeline import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytearray(b"\x89PNG fake image bytes one")),
        (2, bytearray(b"\x89PNG fake image bytes two")),
        (3, bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, content BINARY")
    return multimodal.media_table(df, content_type="image", fmt="png")


def test_media_table_schema_and_checksum(spark, media):
    assert "media_meta" in media.columns
    rows = media.select("doc_id", "media_meta.*").collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["content_type"] == "image"
    assert by_id[1]["format"] == "png"
    assert len(by_id[1]["checksum"]) == 64
    assert by_id[1]["checksum"] != by_id[2]["checksum"]
    # checksum invariant: recompute == stored
    bad = media.filter(
        F.sha2(F.col("content"), 256) != F.col("media_meta.checksum")
    ).count()
    assert bad == 0


def test_fake_features_deterministic(spark, media):
    f1 = {r["doc_id"]: r["features"] for r in multimodal.fake_features(media).collect()}
    f2 = {r["doc_id"]: r["features"] for r in multimodal.fake_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == multimodal.FEATURE_DIM for v in f1.values())
    assert all(0.0 <= x < 1.0 for v in f1.values() for x in v)
    assert f1[1] != f1[2]


def test_frame_sample_plan(spark, media):
    out = multimodal.frame_sample_plan(media, n_frames=4)
    rows = out.filter(F.col("doc_id") == 1).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["time_frac"] == 0.125
    assert out.count() == 3 * 4


def test_decode_image_features_real_png(spark):
    """Real end-to-end decode: PNG blobs -> mapInPandas -> mean-channel
    features, PIL-free via the stdlib codec."""
    import numpy as np

    from same_same_spark.pipeline.imagecodec import encode_png, resize_lanczos3

    rng = np.random.RandomState(5)
    imgs = {i: rng.randint(0, 256, size=(40, 30, 3), dtype=np.uint8) for i in (1, 2)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_png(img))) for i, img in imgs.items()],
        "doc_id LONG, content BINARY",
    )
    rows = {
        r["doc_id"]: r["features"]
        for r in multimodal.decode_image_features(df, size=(8, 8)).collect()
    }
    for i, img in imgs.items():
        want = (
            resize_lanczos3(img, (8, 8)).astype(np.float64) / 255.0
        ).mean(axis=(0, 1))
        assert np.allclose(rows[i], want)
    assert rows[1] != rows[2]


def test_binary_file_source(spark, tmp_path):
    p = tmp_path / "imgs"
    p.mkdir()
    (p / "a.jpg").write_bytes(b"fake jpeg A")
    (p / "b.jpg").write_bytes(b"fake jpeg B")
    (p / "c.txt").write_text("not an image")
    df = multimodal.read_binary_dir(spark, str(p), "*.jpg")
    rows = df.select("path", "content", "length").collect()
    assert len(rows) == 2
    assert {r["length"] for r in rows} == {11}
