"""Baseline JPEG decoder tests.

The decoder is checked against a minimal baseline JPEG *encoder* written
here from the T.81 spec, independently of the product module: its own
bit writer (with byte stuffing and 1-padding), its own canonical
huffman construction, its own forward DCT and zigzag. A near-lossless
quant table (all 1s) makes round-trips tight enough to catch any
huffman/bitstream/IDCT defect, not just gross failures.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from same_same_spark.pipeline.imagecodec import (
    UnsupportedImageError,
    decode_image,
)
from same_same_spark.pipeline.jpegcodec import ZIGZAG, _A, decode_jpeg

# --- spec-derived encoder (test-local) -------------------------------------

_C = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# hand-derived zigzag (first entries straight from the T.81 figure,
# remainder by the diagonal rule applied on paper -> (r, c) pairs)
_ZZ_RC = []
for s in range(15):
    d = [(r, s - r) for r in range(max(0, s - 7), min(s, 7) + 1)]
    _ZZ_RC.extend(d if s % 2 else d[::-1])
_ZZ = [r * 8 + c for r, c in _ZZ_RC]

_DC_COUNTS = bytes([0, 0, 0, 12] + [0] * 12)
_DC_SYMS = bytes(range(12))
_AC_COUNTS = bytes([0, 0, 0, 0, 0, 0, 0, 254, 2] + [0] * 7)
_AC_SYMS = bytes(range(256))


def _codes(counts: bytes, syms: bytes) -> dict[int, tuple[int, int]]:
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[syms[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODE = _codes(_DC_COUNTS, _DC_SYMS)
_AC_CODE = _codes(_AC_COUNTS, _AC_SYMS)


class _Writer:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1s per spec


def _cat(v: int) -> tuple[int, int]:
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(wr: _Writer, coefs: np.ndarray, pred: int) -> int:
    zz = [int(coefs.flat[_ZZ[k]]) for k in range(64)]
    s, bits = _cat(zz[0] - pred)
    ln, code = _DC_CODE[s]
    wr.put(code, ln)
    if s:
        wr.put(bits, s)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, 64):
        if k > last_nz:
            ln, code = _AC_CODE[0x00]  # EOB
            wr.put(code, ln)
            break
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = _AC_CODE[0xF0]  # ZRL
            wr.put(code, ln)
            run -= 16
        s, bits = _cat(zz[k])
        ln, code = _AC_CODE[(run << 4) | s]
        wr.put(code, ln)
        wr.put(bits, s)
        run = 0
    return zz[0]


def _rgb_to_ycbcr(img: np.ndarray) -> list[np.ndarray]:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    return [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray, q: int = 1, subsample=False, restart: int = 0
) -> bytes:
    """Minimal baseline JFIF encoder: quality = uniform quant table
    ``q``; 4:4:4 or (``subsample=True``) 4:2:0; optional restart
    interval in MCUs. Grayscale input -> single-component stream."""
    qt = np.full(64, q, dtype=np.int64)
    gray = img.ndim == 2
    planes = [img.astype(np.float64)] if gray else _rgb_to_ycbcr(img)
    H, W = planes[0].shape
    if gray:
        factors = [(1, 1)]
    elif subsample:
        factors = [(2, 2), (1, 1), (1, 1)]
        for ci in (1, 2):  # box-average 2x2 chroma
            ph = planes[ci].shape[0] + (planes[ci].shape[0] % 2)
            pw = planes[ci].shape[1] + (planes[ci].shape[1] % 2)
            p = np.pad(
                planes[ci],
                ((0, ph - planes[ci].shape[0]), (0, pw - planes[ci].shape[1])),
                mode="edge",
            )
            planes[ci] = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        factors = [(1, 1)] * 3

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x, mcus_y = -(-W // (8 * hmax)), -(-H // (8 * vmax))
    padded = []
    for ci, (fh, fv) in enumerate(factors):
        tw, th = mcus_x * fh * 8, mcus_y * fv * 8
        p = planes[ci]
        padded.append(
            np.pad(
                p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
            )
        )

    wr = _Writer()
    pred = [0] * len(factors)
    rst_n = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                wr.flush()
                wr.out += bytes([0xFF, 0xD0 + (rst_n & 7)])
                rst_n += 1
                pred = [0] * len(factors)
            for ci, (fh, fv) in enumerate(factors):
                for by in range(fv):
                    for bx in range(fh):
                        y0, x0 = (my * fv + by) * 8, (mx * fh + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coefs = np.rint((_C @ blk @ _C.T) / float(q))
                        pred[ci] = _encode_block(wr, coefs, pred[ci])
            mcu_count += 1
    wr.flush()
    scan_data = bytes(wr.out)

    ncomp = len(factors)
    sof = struct.pack(">BHHB", 8, H, W, ncomp) + b"".join(
        struct.pack(">BBB", ci + 1, (fh << 4) | fv, 0)
        for ci, (fh, fv) in enumerate(factors)
    )
    sos = bytes([ncomp]) + b"".join(
        bytes([ci + 1, 0x00]) for ci in range(ncomp)
    ) + b"\x00\x3f\x00"
    out = b"\xff\xd8"
    out += _seg(0xDB, b"\x00" + bytes(int(qt[k]) for k in range(64)))
    out += _seg(0xC4, b"\x00" + _DC_COUNTS + _DC_SYMS)
    out += _seg(0xC4, b"\x10" + _AC_COUNTS + _AC_SYMS)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    out += _seg(0xC0, sof)
    out += _seg(0xDA, sos)
    out += scan_data
    out += b"\xff\xd9"
    return out


# --- tests -----------------------------------------------------------------


def test_dct_basis_orthonormal():
    assert np.allclose(_A @ _A.T, np.eye(8), atol=1e-12)
    assert np.allclose(_C, _A)  # both derive independently from the spec


def test_zigzag_matches_spec_prefix_and_is_permutation():
    spec_prefix = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert ZIGZAG[:16] == spec_prefix
    assert sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG == _ZZ  # test-local derivation agrees


def _smooth(h, w, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for c in range(3):
        for _ in range(4):
            fy, fx = rng.uniform(0, 0.2, 2)
            ph = rng.uniform(0, 2 * np.pi)
            img[..., c] += rng.uniform(20, 60) * np.sin(
                2 * np.pi * (fy * yy + fx * xx) + ph
            )
    return np.clip(img + 128, 0, 255).astype(np.uint8)


def test_roundtrip_gray_near_lossless():
    img = _smooth(24, 17, seed=3)[..., 0]
    out = decode_jpeg(encode_jpeg(img, q=1))
    assert out.shape == (24, 17, 3)
    err = np.abs(out[..., 0].astype(float) - img.astype(float))
    assert err.max() <= 4 and err.mean() < 1.0
    assert np.array_equal(out[..., 0], out[..., 1])


def test_roundtrip_color_444_near_lossless():
    img = _smooth(32, 32, seed=1)
    out = decode_jpeg(encode_jpeg(img, q=1))
    err = np.abs(out.astype(float) - img.astype(float))
    assert err.max() <= 6 and err.mean() < 1.5


def test_roundtrip_color_odd_dims():
    img = _smooth(13, 19, seed=2)
    out = decode_jpeg(encode_jpeg(img, q=1))
    assert out.shape == img.shape
    err = np.abs(out.astype(float) - img.astype(float))
    assert err.max() <= 6


def test_roundtrip_random_noise_bounded():
    img = np.random.RandomState(4).randint(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, q=1))
    err = np.abs(out.astype(float) - img.astype(float))
    assert err.max() <= 8 and err.mean() < 2.0


def test_roundtrip_420_subsampled():
    img = _smooth(32, 24, seed=5)
    out = decode_jpeg(encode_jpeg(img, q=1, subsample=True))
    # luma survives almost exactly; chroma was box-averaged 2x2 by the
    # encoder then pixel-replicated by the decoder -> compare against
    # that reference reconstruction, not the original
    # reference reconstruction with the same chroma pipeline the codec
    # pair implements (box-subsample -> pixel-replicate -> convert with
    # clipping); only quantization noise should remain
    y, cb, cr = _rgb_to_ycbcr(img)

    def rep(p):
        sub = p.reshape(16, 2, 12, 2).mean(axis=(1, 3))
        return np.repeat(np.repeat(sub, 2, axis=0), 2, axis=1)

    cb, cr = rep(cb), rep(cr)
    ref = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=2,
    )
    ref = np.clip(np.rint(ref), 0, 255)
    err = np.abs(out.astype(float) - ref)
    assert err.max() <= 8 and err.mean() < 1.5


def test_restart_markers_equivalent():
    img = _smooth(40, 24, seed=6)
    a = decode_jpeg(encode_jpeg(img, q=1))
    b = decode_jpeg(encode_jpeg(img, q=1, restart=2))
    assert np.array_equal(a, b)


def test_quantization_actually_lossy_but_stable():
    img = _smooth(16, 16, seed=7)
    out = decode_jpeg(encode_jpeg(img, q=16))
    err = np.abs(out.astype(float) - img.astype(float))
    assert err.mean() < 8.0  # coarse quant: visibly lossy yet sane
    assert np.array_equal(out, decode_jpeg(encode_jpeg(img, q=16)))


def test_progressive_gate():
    body = struct.pack(">BHHB", 8, 1, 1, 1) + b"\x01\x11\x00"
    data = b"\xff\xd8" + _seg(0xC2, body)
    with pytest.raises(UnsupportedImageError):
        decode_jpeg(data)


def test_non_interleaved_scan_gated():
    # spec-legal baseline per-component scan (SOS selects 1 of the 3
    # frame components): honest capability gate, not a KeyError
    img = _smooth(16, 16, seed=9)
    data = encode_jpeg(img, q=1)
    i = data.find(b"\xff\xda")
    seglen = struct.unpack_from(">H", data, i + 2)[0]
    new_sos = (
        struct.pack(">H", 8) + bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    )
    patched = data[: i + 2] + new_sos + data[i + 2 + seglen :]
    with pytest.raises(UnsupportedImageError):
        decode_jpeg(patched)


def test_malformed_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0hello world")
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


def test_decode_image_dispatches_jpeg():
    img = _smooth(8, 8, seed=8)
    out = decode_image(encode_jpeg(img, q=1))
    assert out.shape == (8, 8, 3)
