"""JPEG decoder tests (baseline + progressive).

The decoder is checked against minimal JPEG *encoders* written here
from the T.81 spec, independently of the product module: their own bit
writer (with byte stuffing and 1-padding), canonical huffman
construction, forward DCT and zigzag, and a progressive encoder
implementing spectral selection + successive approximation (DC/AC
first and refinement scans, EOB runs with buffered correction bits).
A near-lossless quant table (all 1s) makes round-trips tight enough to
catch any huffman/bitstream/IDCT defect, not just gross failures.

The progressive differential is exact by construction: a progressive
stream carries the SAME quantized coefficients as the sequential
stream (shared coefficient pipeline below), so the decoded pixels must
be array-identical, not merely close.
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

    def restart(self, rst_n: int):
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (rst_n & 7)])


def _cat(v: int) -> tuple[int, int]:
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _rgb_to_ycbcr(img: np.ndarray) -> list[np.ndarray]:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    return [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _coef_blocks(img: np.ndarray, q: int, subsample: bool):
    """Shared coefficient pipeline: color convert, (optionally)
    box-subsample chroma, pad to MCU geometry, forward DCT + quantize.
    Returns per-component zigzag-ordered int coefficient arrays of
    shape (padded_block_rows, padded_block_cols, 64), the sampling
    factors, image dims, MCU grid, and each component's TRUE
    (un-padded) block grid — the grid non-interleaved scans cover."""
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
    blocks, true_blocks = [], []
    for ci, (fh, fv) in enumerate(factors):
        p = planes[ci]
        true_blocks.append((-(-p.shape[1] // 8), -(-p.shape[0] // 8)))
        tw, th = mcus_x * fh * 8, mcus_y * fv * 8
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        bh, bw = th // 8, tw // 8
        arr = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                co = np.rint((_C @ blk @ _C.T) / float(q))
                arr[by, bx] = co.flat[_ZZ]
        blocks.append(arr)
    return blocks, factors, H, W, mcus_x, mcus_y, true_blocks


def _encode_block(
    wr: _Writer, zz, pred: int, dc_code=None, ac_code=None
) -> int:
    dc_code = dc_code or _DC_CODE
    ac_code = ac_code or _AC_CODE
    s, bits = _cat(int(zz[0]) - pred)
    ln, code = dc_code[s]
    wr.put(code, ln)
    if s:
        wr.put(bits, s)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, 64):
        if k > last_nz:
            ln, code = ac_code[0x00]  # EOB
            wr.put(code, ln)
            break
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_code[0xF0]  # ZRL
            wr.put(code, ln)
            run -= 16
        s, bits = _cat(int(zz[k]))
        ln, code = ac_code[(run << 4) | s]
        wr.put(code, ln)
        wr.put(bits, s)
        run = 0
    return int(zz[0])


def _headers(
    sof_marker: int, factors, H, W, q: int, restart: int,
    tables=None, emit_dht: bool = True, table_id: int = 0,
) -> bytes:
    dc_counts, dc_syms, ac_counts, ac_syms = tables or (
        _DC_COUNTS, _DC_SYMS, _AC_COUNTS, _AC_SYMS
    )
    ncomp = len(factors)
    sof = struct.pack(">BHHB", 8, H, W, ncomp) + b"".join(
        struct.pack(">BBB", ci + 1, (fh << 4) | fv, 0)
        for ci, (fh, fv) in enumerate(factors)
    )
    out = b"\xff\xd8"
    out += _seg(0xDB, b"\x00" + bytes([q] * 64))
    if emit_dht:
        out += _seg(0xC4, bytes([0x00 | table_id]) + dc_counts + dc_syms)
        out += _seg(0xC4, bytes([0x10 | table_id]) + ac_counts + ac_syms)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    out += _seg(sof_marker, sof)
    return out


def _sos(
    sel: list[int], ss: int, se: int, ah: int, al: int, table_id: int = 0
) -> bytes:
    body = bytes([len(sel)]) + b"".join(
        bytes([cid, table_id * 0x11]) for cid in sel
    ) + bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


def encode_jpeg(
    img: np.ndarray, q: int = 1, subsample=False, restart: int = 0,
    interleaved: bool = True, tables=None, emit_dht: bool = True,
    table_id: int = 0,
) -> bytes:
    """Minimal baseline JFIF encoder: quality = uniform quant table
    ``q``; 4:4:4 or (``subsample=True``) 4:2:0; optional restart
    interval in MCUs. Grayscale input -> single-component stream.
    ``interleaved=False`` writes one sequential scan per component
    (spec-legal non-interleaved baseline; 4:4:4 / gray only here).
    ``tables=(dc_counts, dc_syms, ac_counts, ac_syms)`` swaps the
    huffman tables; ``emit_dht=False`` omits the DHT segments (the
    legacy table-less MJPEG shape)."""
    dc_code, ac_code = _DC_CODE, _AC_CODE
    if tables is not None:
        dc_code = _codes(tables[0], tables[1])
        ac_code = _codes(tables[2], tables[3])
    blocks, factors, H, W, mcus_x, mcus_y, true_blocks = _coef_blocks(
        img, q, subsample
    )
    out = _headers(
        0xC0, factors, H, W, q, restart, tables, emit_dht, table_id
    )

    if not interleaved:
        assert all(f == (1, 1) for f in factors)
        for ci in range(len(factors)):
            wr = _Writer()
            pred = 0
            rst_n = 0
            count = 0
            bw, bh = true_blocks[ci]
            for by in range(bh):
                for bx in range(bw):
                    if restart and count and count % restart == 0:
                        wr.restart(rst_n)
                        rst_n += 1
                        pred = 0
                    pred = _encode_block(
                        wr, blocks[ci][by, bx], pred, dc_code, ac_code
                    )
                    count += 1
            wr.flush()
            out += _sos([ci + 1], 0, 63, 0, 0, table_id) + bytes(wr.out)
        return out + b"\xff\xd9"

    wr = _Writer()
    pred = [0] * len(factors)
    rst_n = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                wr.restart(rst_n)
                rst_n += 1
                pred = [0] * len(factors)
            for ci, (fh, fv) in enumerate(factors):
                for by in range(fv):
                    for bx in range(fh):
                        pred[ci] = _encode_block(
                            wr, blocks[ci][my * fv + by, mx * fh + bx],
                            pred[ci], dc_code, ac_code,
                        )
            mcu_count += 1
    wr.flush()
    out += _sos(list(range(1, len(factors) + 1)), 0, 63, 0, 0, table_id)
    out += bytes(wr.out)
    return out + b"\xff\xd9"


# --- progressive encoder (T.81 Annex G, re-derived) ------------------------


class _EobState:
    """Pending EOB run + the correction bits buffered with it (AC
    refinement scans append history bits to the run)."""

    def __init__(self):
        self.run = 0
        self.bits: list[int] = []

    def flush(self, wr: _Writer):
        if self.run:
            r = self.run.bit_length() - 1
            ln, code = _AC_CODE[r << 4]
            wr.put(code, ln)
            if r:
                wr.put(self.run - (1 << r), r)
            self.run = 0
            for b in self.bits:
                wr.put(b, 1)
            self.bits = []


def _enc_ac_first(wr, zz, ss, se, al, eob: _EobState):
    scaled = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al  # AC point transform truncates toward zero
        scaled.append(-t if v < 0 else t)
    last = max((i for i, t in enumerate(scaled) if t), default=-1)
    run = 0
    for i in range(last + 1):
        t = scaled[i]
        if t == 0:
            run += 1
            continue
        eob.flush(wr)
        while run > 15:
            ln, code = _AC_CODE[0xF0]
            wr.put(code, ln)
            run -= 16
        s, bits = _cat(t)
        ln, code = _AC_CODE[(run << 4) | s]
        wr.put(code, ln)
        wr.put(bits, s)
        run = 0
    if last < se - ss:  # trailing zeros -> this block joins an EOB run
        eob.run += 1
        if eob.run == 0x7FFF:
            eob.flush(wr)


def _enc_ac_refine(wr, zz, ss, se, al, eob: _EobState):
    """libjpeg's encode_mcu_AC_refine re-derived: runs count only
    zero-history coefficients; previously-nonzero ones contribute
    buffered correction bits emitted after the next symbol (or with
    the EOB run that swallows the block tail)."""
    absv = []
    last_new = -1
    for i, k in enumerate(range(ss, se + 1)):
        t = abs(int(zz[k])) >> al
        absv.append(t)
        if t == 1:
            last_new = i
    run = 0
    br: list[int] = []
    for i, k in enumerate(range(ss, se + 1)):
        t = absv[i]
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= last_new:
            eob.flush(wr)
            ln, code = _AC_CODE[0xF0]
            wr.put(code, ln)
            run -= 16
            for b in br:
                wr.put(b, 1)
            br = []
        if t > 1:  # previously significant: correction bit
            br.append(t & 1)
            continue
        # newly significant (scaled magnitude exactly 1)
        eob.flush(wr)
        ln, code = _AC_CODE[(run << 4) | 1]
        wr.put(code, ln)
        wr.put(0 if int(zz[k]) < 0 else 1, 1)
        for b in br:
            wr.put(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        eob.run += 1
        eob.bits.extend(br)
        if eob.run == 0x7FFF:
            eob.flush(wr)


DEFAULT_SCRIPT_NOTE = """scan script (libjpeg's simple progression,
adapted): interleaved DC first at Al=1, per-component AC first in two
spectral bands at Al=2, DC refinement, then two AC refinement passes
down to Al=0."""


def encode_progressive_jpeg(
    img: np.ndarray, q: int = 1, subsample=False, restart: int = 0,
    dc_split: bool = True,
) -> bytes:
    """Progressive (SOF2) encoder carrying the exact coefficients of
    :func:`encode_jpeg` — decode of both must be pixel-identical."""
    blocks, factors, H, W, mcus_x, mcus_y, true_blocks = _coef_blocks(
        img, q, subsample
    )
    return _emit_progressive(
        blocks, factors, H, W, mcus_x, mcus_y, true_blocks, q,
        restart, dc_split,
    )


def _emit_progressive(
    blocks, factors, H, W, mcus_x, mcus_y, true_blocks, q,
    restart, dc_split,
) -> bytes:
    ncomp = len(factors)
    out = _headers(0xC2, factors, H, W, q, restart)

    dc_al = 1 if dc_split else 0

    # --- DC first scan: interleaved over all components -----------------
    wr = _Writer()
    pred = [0] * ncomp
    rst_n = 0
    count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and count and count % restart == 0:
                wr.restart(rst_n)
                rst_n += 1
                pred = [0] * ncomp
            for ci, (fh, fv) in enumerate(factors):
                for by in range(fv):
                    for bx in range(fh):
                        v = int(
                            blocks[ci][my * fv + by, mx * fh + bx][0]
                        ) >> dc_al  # DC point transform: arithmetic shift
                        s, bits = _cat(v - pred[ci])
                        ln, code = _DC_CODE[s]
                        wr.put(code, ln)
                        if s:
                            wr.put(bits, s)
                        pred[ci] = v
            count += 1
    wr.flush()
    out += _sos(list(range(1, ncomp + 1)), 0, 0, 0, dc_al) + bytes(wr.out)

    # --- AC first scans: per component, two spectral bands, Al=2 --------
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            wr = _Writer()
            eob = _EobState()
            rst_n = 0
            count = 0
            bw, bh = true_blocks[ci]
            for by in range(bh):
                for bx in range(bw):
                    if restart and count and count % restart == 0:
                        eob.flush(wr)
                        wr.restart(rst_n)
                        rst_n += 1
                    _enc_ac_first(wr, blocks[ci][by, bx], ss, se, 2, eob)
                    count += 1
            eob.flush(wr)
            wr.flush()
            out += _sos([ci + 1], ss, se, 0, 2) + bytes(wr.out)

    # --- DC refinement (Ah=1 -> Al=0): raw bit per block ----------------
    if dc_split:
        wr = _Writer()
        rst_n = 0
        count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart and count and count % restart == 0:
                    wr.restart(rst_n)
                    rst_n += 1
                for ci, (fh, fv) in enumerate(factors):
                    for by in range(fv):
                        for bx in range(fh):
                            wr.put(
                                int(
                                    blocks[ci][
                                        my * fv + by, mx * fh + bx
                                    ][0]
                                )
                                & 1,
                                1,
                            )
                count += 1
        wr.flush()
        out += _sos(list(range(1, ncomp + 1)), 0, 0, 1, 0) + bytes(wr.out)

    # --- AC refinement: full band, Ah=2->1 then Ah=1->0 -----------------
    for ah, al in ((2, 1), (1, 0)):
        for ci in range(ncomp):
            wr = _Writer()
            eob = _EobState()
            rst_n = 0
            count = 0
            bw, bh = true_blocks[ci]
            for by in range(bh):
                for bx in range(bw):
                    if restart and count and count % restart == 0:
                        eob.flush(wr)
                        wr.restart(rst_n)
                        rst_n += 1
                    _enc_ac_refine(
                        wr, blocks[ci][by, bx], 1, 63, al, eob
                    )
                    count += 1
            eob.flush(wr)
            wr.flush()
            out += _sos([ci + 1], 1, 63, ah, al) + bytes(wr.out)

    return out + b"\xff\xd9"


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


# --- progressive / non-interleaved -----------------------------------------


@pytest.mark.parametrize(
    "shape,seed,subsample",
    [
        ((32, 32), 1, False),   # 4:4:4 color
        ((13, 19), 2, False),   # odd dims
        ((32, 24), 5, True),    # 4:2:0 (padded luma blocks in DC scan
                                # but not in AC scans)
        ((40, 25), 11, True),   # 4:2:0 with odd width
    ],
)
def test_progressive_equals_sequential(shape, seed, subsample):
    """The progressive stream carries the same coefficients as the
    sequential one, so decoding must be pixel-identical — this is the
    exact differential, not a tolerance check."""
    img = _smooth(*shape, seed=seed)
    seq = decode_jpeg(encode_jpeg(img, q=1, subsample=subsample))
    prog = decode_jpeg(
        encode_progressive_jpeg(img, q=1, subsample=subsample)
    )
    assert np.array_equal(seq, prog)


def test_progressive_gray_and_coarse_quant():
    img = _smooth(24, 17, seed=3)[..., 0]
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, q=1)),
        decode_jpeg(encode_progressive_jpeg(img, q=1)),
    )
    color = _smooth(16, 16, seed=7)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(color, q=16)),
        decode_jpeg(encode_progressive_jpeg(color, q=16)),
    )


def test_progressive_no_dc_refinement_script():
    """A script whose DC scan transmits full precision (Al=0, no DC
    refinement pass) is equally valid."""
    img = _smooth(16, 24, seed=9)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, q=1)),
        decode_jpeg(encode_progressive_jpeg(img, q=1, dc_split=False)),
    )


def test_progressive_with_restarts():
    img = _smooth(32, 32, seed=6)
    a = decode_jpeg(encode_progressive_jpeg(img, q=1))
    b = decode_jpeg(encode_progressive_jpeg(img, q=1, restart=3))
    assert np.array_equal(a, b)
    assert np.array_equal(a, decode_jpeg(encode_jpeg(img, q=1)))


def test_progressive_refinement_zrl_and_long_eob_runs():
    """Crafted coefficients force the rare progressive paths: ZRL
    inside an AC refinement pass (>15 zero-history run before a newly
    significant coefficient), correction bits buffered across an EOB
    run, a negative DC refined through the two's-complement bit-OR,
    and an EOB run spanning several whole blocks. Truth is computed
    independently by direct IDCT of the crafted coefficients."""
    bh, bw = 1, 6
    arr = np.zeros((bh, bw, 64), np.int64)
    arr[0, 0, 0] = -37   # negative DC (split across first+refine scans)
    arr[0, 0, 5] = 2     # history coef: correction bits in both refines
    arr[0, 0, 36] = 1    # newly significant at Al=0 after 30 zeros -> ZRL
    arr[0, 0, 63] = -1   # newly significant at the band's last slot
    for b in range(1, 5):
        arr[0, b, 0] = 7 - b  # AC-empty blocks -> multi-block EOB runs
    arr[0, 5, 1] = -6
    arr[0, 5, 2] = 5
    H, W = bh * 8, bw * 8
    data = _emit_progressive(
        [arr], [(1, 1)], H, W, bw, bh, [(bw, bh)], q=1,
        restart=0, dc_split=True,
    )
    out = decode_jpeg(data)
    expect = np.zeros((H, W))
    for b in range(bw):
        nat = np.zeros(64)
        nat[_ZZ] = arr[0, b]
        expect[:, b * 8 : b * 8 + 8] = (
            _A.T @ nat.reshape(8, 8) @ _A + 128.0
        )
    expect = np.clip(np.rint(expect), 0, 255).astype(np.uint8)
    assert np.array_equal(out[..., 0], expect)


def test_non_interleaved_sequential_scans():
    """Baseline with one sequential scan per component (spec-legal
    non-interleaved form) decodes identically to the interleaved
    stream."""
    img = _smooth(16, 16, seed=9)
    a = decode_jpeg(encode_jpeg(img, q=1))
    b = decode_jpeg(encode_jpeg(img, q=1, interleaved=False))
    assert np.array_equal(a, b)


def test_component_never_scanned_rejected():
    """Dropping one component's scan from a non-interleaved stream is
    detected instead of silently rendering a gray channel."""
    img = _smooth(16, 16, seed=9)
    data = encode_jpeg(img, q=1, interleaved=False)
    # cut from the SECOND SOS to the THIRD (removes component 2's scan)
    first = data.find(b"\xff\xda")
    second = data.find(b"\xff\xda", first + 2)
    third = data.find(b"\xff\xda", second + 2)
    with pytest.raises(ValueError, match="never scanned"):
        decode_jpeg(data[:second] + data[third:])


def test_ff_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker; they must parse as padding, not as a marker named 0xFF
    with a bogus length field."""
    img = _smooth(16, 16, seed=4)
    data = encode_jpeg(img, q=1)
    i = data.find(b"\xff\xda")
    padded = data[:i] + b"\xff\xff\xff" + data[i:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(data))


def test_hierarchical_and_arithmetic_still_gated():
    for marker in (0xC5, 0xC9, 0xCB):  # differential / arithmetic
        body = struct.pack(">BHHB", 8, 1, 1, 1) + b"\x01\x11\x00"
        data = b"\xff\xd8" + _seg(marker, body)
        with pytest.raises(UnsupportedImageError):
            decode_jpeg(data)
    # SOF3 is no longer gated — a frame without any scan is a plain
    # malformed-stream error now, not a capability refusal
    body = struct.pack(">BHHB", 8, 1, 1, 1) + b"\x01\x11\x00"
    with pytest.raises(ValueError, match="SOF/SOS"):
        decode_jpeg(b"\xff\xd8" + _seg(0xC3, body) + b"\xff\xd9")


def test_malformed_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0hello world")
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


def test_decode_image_dispatches_jpeg():
    img = _smooth(8, 8, seed=8)
    out = decode_image(encode_jpeg(img, q=1))
    assert out.shape == (8, 8, 3)


# --- lossless process (SOF3, T.81 annex H) ------------------------------

_LL_COUNTS = bytes([0, 0, 0, 0, 17] + [0] * 11)  # 17 codes, length 5
_LL_SYMS = bytes(range(17))
_LL_CODE = _codes(_LL_COUNTS, _LL_SYMS)


def encode_lossless_jpeg(
    img: np.ndarray,
    predictor: int = 1,
    pt: int = 0,
    precision: int = 8,
    restart: int = 0,
    interleaved: bool = True,
    jfif: bool = False,
) -> bytes:
    """Spec-derived LOSSLESS (SOF3) encoder written independently of
    the decoder: T.81 H.1 predictors, DC-category-coded modulo-2^16
    differences (SSSS=16 ⇔ +32768 with no appended bits), default
    prediction 2^(P-Pt-1) at scan start and after every restart,
    optional point transform and non-interleaved per-component
    scans."""
    arr = np.asarray(img).astype(np.int64)
    planes = [arr] if arr.ndim == 2 else [arr[..., i] for i in range(arr.shape[2])]
    planes = [p >> pt for p in planes]
    H, W = planes[0].shape
    ncomp = len(planes)
    sof = struct.pack(">BHHB", precision, H, W, ncomp) + b"".join(
        struct.pack(">BBB", ci + 1, 0x11, 0) for ci in range(ncomp)
    )
    out = b"\xff\xd8"
    if jfif:
        out += _seg(0xE0, b"JFIF\x00" + bytes(9))
    out += _seg(0xC4, b"\x00" + _LL_COUNTS + _LL_SYMS)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    out += _seg(0xC3, sof)
    default = 1 << (precision - pt - 1)

    def scan(sel_planes, sel_ids):
        wr = _Writer()
        force = [True] * len(sel_planes)
        rst_n = 0
        unit = 0
        for y in range(H):
            for x in range(W):
                if restart and unit and unit % restart == 0:
                    wr.restart(rst_n)
                    rst_n = (rst_n + 1) & 7
                    force = [True] * len(sel_planes)
                for si, p in enumerate(sel_planes):
                    if force[si]:
                        px = default
                        force[si] = False
                    elif y == 0:
                        px = int(p[y, x - 1])
                    elif x == 0:
                        px = int(p[y - 1, x])
                    else:
                        ra = int(p[y, x - 1])
                        rb = int(p[y - 1, x])
                        rc = int(p[y - 1, x - 1])
                        px = [
                            None, ra, rb, rc, ra + rb - rc,
                            ra + ((rb - rc) >> 1),
                            rb + ((ra - rc) >> 1), (ra + rb) >> 1,
                        ][predictor]
                    d = (int(p[y, x]) - px) & 0xFFFF
                    if d == 0:
                        ln, code = _LL_CODE[0]
                        wr.put(code, ln)
                    elif d == 32768:
                        ln, code = _LL_CODE[16]
                        wr.put(code, ln)
                    else:
                        ds = d - 65536 if d > 32768 else d
                        s, bits = _cat(ds)
                        ln, code = _LL_CODE[s]
                        wr.put(code, ln)
                        wr.put(bits, s)
                unit += 1
        wr.flush()
        body = (
            bytes([len(sel_ids)])
            + b"".join(bytes([cid, 0x00]) for cid in sel_ids)
            + bytes([predictor, 0, pt])
        )
        return _seg(0xDA, body) + bytes(wr.out)

    if interleaved or ncomp == 1:
        out += scan(planes, list(range(1, ncomp + 1)))
    else:
        for ci, p in enumerate(planes):
            out += scan([p], [ci + 1])
    return out + b"\xff\xd9"


def test_lossless_roundtrip_gray_all_predictors():
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)
    want = np.repeat(img[..., None], 3, axis=2)
    for pred in range(1, 8):
        got = decode_jpeg(encode_lossless_jpeg(img, predictor=pred))
        assert (got == want).all(), pred


def test_lossless_rgb_interleaved_and_separate_scans():
    rng = np.random.default_rng(32)
    img = rng.integers(0, 256, size=(19, 23, 3), dtype=np.uint8)
    for inter in (True, False):
        got = decode_jpeg(
            encode_lossless_jpeg(img, predictor=4, interleaved=inter)
        )
        assert (got == img).all(), inter


def test_lossless_restarts_and_point_transform():
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    got = decode_jpeg(encode_lossless_jpeg(img, predictor=5, restart=37))
    assert (got[..., 0] == img).all()
    # Pt=3: encoder drops 3 bits, decoder re-shifts — output quantized
    got = decode_jpeg(encode_lossless_jpeg(img, predictor=1, pt=3))
    assert (got[..., 0] == (img >> 3) << 3).all()


def test_lossless_16bit_scales_to_8():
    rng = np.random.default_rng(34)
    img = rng.integers(0, 1 << 16, size=(9, 11)).astype(np.int64)
    got = decode_jpeg(
        encode_lossless_jpeg(img, predictor=2, precision=16)
    )
    assert (got[..., 0] == (img >> 8)).all()


def test_lossless_jfif_three_component_goes_through_ycbcr():
    rng = np.random.default_rng(35)
    img = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    ycc = np.stack(
        [np.clip(np.rint(p), 0, 255) for p in _rgb_to_ycbcr(img)], axis=2
    ).astype(np.uint8)
    got = decode_jpeg(encode_lossless_jpeg(ycc, predictor=7, jfif=True))
    # YCbCr integer round-trip is near-exact, not exact
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 3


def test_lossless_gates():
    import pytest as _pytest

    from same_same_spark.pipeline.imagecodec import UnsupportedImageError

    rng = np.random.default_rng(36)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    good = encode_lossless_jpeg(img, predictor=1)
    # predictor 0 (hierarchical-only) refused
    bad = bytearray(good)
    sos_at = bad.find(b"\xff\xda")
    bad[sos_at + 2 + 2 + 1 + 2] = 0  # Ss byte of the scan header
    with _pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(bad))
    # subsampled SOF3 refused
    bad = bytearray(good)
    sof_at = bad.find(b"\xff\xc3")
    bad[sof_at + 2 + 2 + 6 + 1] = 0x22  # h=v=2 for component 1
    with _pytest.raises(UnsupportedImageError, match="subsampled"):
        decode_jpeg(bytes(bad))


# --- table-less MJPEG: T.81 Annex K default tables ---------------------------
# Independent transcription of the Annex K.3 "typical" tables, row-major
# straight from the spec's listings (the product module derives the AC
# length-16 tails structurally — two independent forms that must agree
# on every decoded pixel).

_K_DC_LUMA = (
    bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_K_DC_CHROMA = (
    bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_K_AC_LUMA = (
    bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]),
    bytes.fromhex(
        "01020300041105122131410613516107"
        "227114328191a1082342b1c11552d1f0"
        "2433627282090a161718191a25262728"
        "292a3435363738393a43444546474849"
        "4a535455565758595a63646566676869"
        "6a737475767778797a83848586878889"
        "8a92939495969798999aa2a3a4a5a6a7"
        "a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5"
        "c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2"
        "e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8"
        "f9fa"
    ),
)
_K_AC_CHROMA = (
    bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]),
    bytes.fromhex(
        "00010203110405213106124151076171"
        "13223281081442" "91a1b1c1" "09233352f0"
        "156272d10a162434e125f11718191a26"
        "2728292a35363738393a434445464748"
        "494a535455565758595a636465666768"
        "696a737475767778797a828384858687"
        "88898a92939495969798999aa2a3a4a5"
        "a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3"
        "c4c5c6c7c8c9cad2d3d4d5d6d7d8d9da"
        "e2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8"
        "f9fa"
    ),
)


def test_tableless_mjpeg_decodes_with_annex_k_defaults():
    """A stream encoded WITH the Annex K luma tables decodes
    identically whether the DHT segments are present or omitted
    (``default_huffman=True``); without the flag the table-less
    stream is refused."""
    img = _smooth(24, 17, seed=41)
    tables = _K_DC_LUMA + _K_AC_LUMA
    with_dht = encode_jpeg(img, q=1, tables=tables)
    without_dht = encode_jpeg(img, q=1, tables=tables, emit_dht=False)
    ref = decode_jpeg(with_dht)
    got = decode_jpeg(without_dht, default_huffman=True)
    assert np.array_equal(ref, got)
    with pytest.raises(ValueError, match="huffman"):
        decode_jpeg(without_dht)


def test_tableless_color_and_chroma_default_tables():
    """Color stream whose SOS selects table id 1 for every component:
    the Annex K CHROMA pair must be what ``default_huffman`` supplies
    at id 1."""
    rng = np.random.default_rng(42)
    img = np.clip(
        _smooth(16, 16, seed=5).astype(int)
        + rng.integers(-8, 8, size=(16, 16, 3)),
        0, 255,
    ).astype(np.uint8)
    tables = _K_DC_CHROMA + _K_AC_CHROMA
    with_dht = encode_jpeg(img, q=1, tables=tables, table_id=1)
    without_dht = encode_jpeg(
        img, q=1, tables=tables, table_id=1, emit_dht=False
    )
    ref = decode_jpeg(with_dht)
    got = decode_jpeg(without_dht, default_huffman=True)
    assert np.array_equal(ref, got)
    # and the defaults round-trip the pixels like any q=1 encode
    err = np.abs(got.astype(float) - img.astype(float))
    assert err.max() <= 25 and err.mean() < 2.0


def test_instream_dht_overrides_defaults():
    """default_huffman must not shadow in-stream tables: a stream
    carrying the test suite's FLAT tables (incompatible with Annex K)
    decodes identically with and without the flag."""
    img = _smooth(15, 22, seed=43)
    data = encode_jpeg(img, q=2)
    assert np.array_equal(
        decode_jpeg(data), decode_jpeg(data, default_huffman=True)
    )
