"""AVI video codec (pipeline/videocodec + multimodal video path).

DIB frames round-trip losslessly (orientation/stride pinned with
asymmetric content); MJPEG frames reuse the INDEPENDENT baseline JPEG
encoder from test_jpegcodec; codec gates stay honest.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from same_same_spark.pipeline.videocodec import (
    BI_RGB,
    UnsupportedVideoError,
    decode_frame,
    dib_frame,
    encode_avi,
    parse_avi,
    sample_frames,
)


def _grad(t: int, h: int = 6, w: int = 8) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    r = (17 * t + 3 * xx + 5 * yy) % 256
    g = (29 * t + 7 * xx + 2 * yy) % 256
    b = (11 * t + xx + yy) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_dib_roundtrip_lossless_and_meta():
    frames = [_grad(t, 5, 7) for t in range(6)]  # odd width → stride pad
    avi = encode_avi([dib_frame(f) for f in frames], 7, 5, fps=3)
    meta, payloads = parse_avi(avi)
    assert (meta.width, meta.height, meta.n_frames) == (7, 5, 6)
    assert meta.fps == 3.0 and meta.duration_sec == 2.0
    assert meta.compression == BI_RGB
    for f, p in zip(frames, payloads):
        assert np.array_equal(decode_frame(meta, p), f)


def test_sample_frames_mid_bucket_rule():
    frames = [_grad(t) for t in range(10)]
    avi = encode_avi([dib_frame(f) for f in frames], 8, 6, fps=5)
    meta, sampled = sample_frames(avi, n_frames=4)
    # floor((i+0.5)*10/4) = 1, 3, 6, 8
    assert [i for i, _, _ in sampled] == [1, 3, 6, 8]
    assert [t for _, t, _ in sampled] == [0.2, 0.6, 1.2, 1.6]
    for i, _, rgb in sampled:
        assert np.array_equal(rgb, frames[i])
    # more samples than frames → every frame once
    _, all_s = sample_frames(avi, n_frames=25)
    assert [i for i, _, _ in all_s] == list(range(10))


def test_mjpeg_frames_decode():
    from tests.test_jpegcodec import _smooth, encode_jpeg

    imgs = [_smooth(16, 16, seed=s) for s in range(3)]
    payloads = [encode_jpeg(im, q=1) for im in imgs]
    avi = encode_avi(payloads, 16, 16, fps=2, compression=b"MJPG")
    meta, frames = parse_avi(avi)
    assert meta.fourcc == "MJPG" and meta.n_frames == 3
    for im, p in zip(imgs, frames):
        out = decode_frame(meta, p)
        err = np.abs(out.astype(float) - im.astype(float))
        assert err.max() <= 25 and err.mean() < 2.0


def test_tableless_mjpeg_frames_decode():
    """Legacy MJPEG frames that omit their DHT segments (the OpenDML
    convention) decode via the Annex K defaults, pixel-identical to
    the same frames carrying the tables explicitly."""
    from tests.test_jpegcodec import (
        _K_AC_LUMA,
        _K_DC_LUMA,
        _smooth,
        encode_jpeg,
    )

    imgs = [_smooth(16, 16, seed=s) for s in range(2)]
    tables = _K_DC_LUMA + _K_AC_LUMA
    with_dht = [encode_jpeg(im, q=1, tables=tables) for im in imgs]
    stripped = [
        encode_jpeg(im, q=1, tables=tables, emit_dht=False) for im in imgs
    ]
    avi_full = encode_avi(with_dht, 16, 16, fps=2, compression=b"MJPG")
    avi_bare = encode_avi(stripped, 16, 16, fps=2, compression=b"MJPG")
    meta_f, frames_f = parse_avi(avi_full)
    meta_b, frames_b = parse_avi(avi_bare)
    for pf, pb in zip(frames_f, frames_b):
        assert b"\xff\xc4" in pf.split(b"\xff\xda", 1)[0]
        assert b"\xff\xc4" not in pb.split(b"\xff\xda", 1)[0]
        assert np.array_equal(
            decode_frame(meta_f, pf), decode_frame(meta_b, pb)
        )


def test_gates():
    # unknown codec fourcc
    avi = encode_avi([b"\x00" * 10], 4, 4, compression=b"H264")
    meta, frames = parse_avi(avi)
    with pytest.raises(UnsupportedVideoError):
        decode_frame(meta, frames[0])
    # malformed MJPEG frame still fails loudly (truncated stream)
    headerless = b"\xff\xd8\xff\xdb" + bytes(10) + b"\xff\xda" + bytes(4)
    avi2 = encode_avi([headerless], 4, 4, compression=b"MJPG")
    meta2, frames2 = parse_avi(avi2)
    with pytest.raises(ValueError):
        decode_frame(meta2, frames2[0])
    # not an AVI
    with pytest.raises(ValueError):
        parse_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError):
        parse_avi(b"garbage bytes here")


def test_decode_video_frames_dataframe(spark):
    from same_same_spark.pipeline.multimodal import decode_video_frames

    def clip(seed: int, n: int) -> bytes:
        return encode_avi(
            [dib_frame(_grad(seed * 100 + t)) for t in range(n)],
            8, 6, fps=4,
        )

    df = spark.createDataFrame(
        [(1, clip(1, 8)), (2, clip(2, 3))], "doc_id LONG, content BINARY"
    )
    rows = decode_video_frames(df, n_frames=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # floor((i+.5)*8/2) = 2, 6 ; floor((i+.5)*3/2) = 0, 2
    assert [r["frame_idx"] for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [2, 6]
    assert [r["frame_idx"] for r in sorted(by_doc[2], key=lambda r: r["frame_idx"])] == [0, 2]
    r = by_doc[1][0]
    assert (r["height"], r["width"]) == (6, 8)
    assert r["time_sec"] == r["frame_idx"] / 4.0
    want = _grad(100 + r["frame_idx"]).astype(np.float64).mean(axis=(0, 1)) / 255.0
    assert np.allclose(r["features"], want)
