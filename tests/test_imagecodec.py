"""Unit tests for the pure-stdlib image codec.

Strategy: the decoder is exercised from two independent directions —
(a) round-trips through :func:`encode_png` (filter 0 only), and
(b) PNGs constructed *by hand* in this file (chunk framing, scanline
filters 1-4, sub-byte depths, palette/tRNS, Adam7 interlace), so the
decoder's filter/interlace logic is checked against the spec, not
against itself.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from same_same_spark.pipeline.imagecodec import (
    PNG_SIG,
    UnsupportedImageError,
    decode_bmp,
    decode_image,
    decode_png,
    encode_png,
    resize_lanczos3,
    sniff_format,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _png(w, h, depth, color_type, raw, extra=b"", interlace=0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _rng(seed=0):
    return np.random.RandomState(seed)


# ---------------------------------------------------------------------------
# encoder round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (17, 9), (32, 32)])
def test_png_roundtrip_rgb(shape):
    img = _rng(shape[0]).randint(0, 256, size=(*shape, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_gray_replicates_channels():
    g = _rng(7).randint(0, 256, size=(11, 6), dtype=np.uint8)
    out = decode_png(encode_png(g))
    assert out.shape == (11, 6, 3)
    assert np.array_equal(out, np.repeat(g[..., None], 3, axis=2))


# ---------------------------------------------------------------------------
# hand-built scanline filters (independent of the encoder)
# ---------------------------------------------------------------------------


def _apply_filter(ftype, line, prev, fbpp):
    """Forward PNG filter, straight from the spec, for test vectors."""
    out = bytearray(len(line))
    for i in range(len(line)):
        left = line[i - fbpp] if i >= fbpp else 0
        up = prev[i] if prev is not None else 0
        ul = prev[i - fbpp] if (prev is not None and i >= fbpp) else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:  # Paeth
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_each_filter_type_inverts(ftype):
    img = _rng(ftype).randint(0, 256, size=(6, 4, 3), dtype=np.uint8)
    raw = b""
    prev = None
    for y in range(6):
        line = img[y].tobytes()
        raw += bytes([ftype]) + _apply_filter(ftype, line, prev, 3)
        prev = line
    assert np.array_equal(decode_png(_png(4, 6, 8, 2, raw)), img)


def test_png_mixed_filters_per_row():
    img = _rng(42).randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    raw = b""
    prev = None
    for y in range(5):
        ftype = y % 5
        line = img[y].tobytes()
        raw += bytes([ftype]) + _apply_filter(ftype, line, prev, 3)
        prev = line
    assert np.array_equal(decode_png(_png(7, 5, 8, 2, raw)), img)


# ---------------------------------------------------------------------------
# bit depths, palette, alpha
# ---------------------------------------------------------------------------


def test_png_gray_1bit_scales_to_full_range():
    # 2x9 1-bit: rows 101010101 and 011110000, packed MSB-first
    bits = np.array(
        [[1, 0, 1, 0, 1, 0, 1, 0, 1], [0, 1, 1, 1, 1, 0, 0, 0, 0]],
        dtype=np.uint8,
    )
    packed = np.packbits(bits, axis=1)  # (2, 2) bytes, 9 bits -> 2 bytes/row
    raw = b"".join(b"\x00" + packed[y].tobytes() for y in range(2))
    out = decode_png(_png(9, 2, 1, 0, raw))
    assert np.array_equal(out[..., 0], bits * 255)
    assert np.array_equal(out[..., 0], out[..., 2])


def test_png_gray_4bit():
    # one row, values 0..15 -> scaled x*17
    vals = np.arange(16, dtype=np.uint8)
    packed = bytes(
        [(int(vals[i]) << 4) | int(vals[i + 1]) for i in range(0, 16, 2)]
    )
    out = decode_png(_png(16, 1, 4, 0, b"\x00" + packed))
    assert np.array_equal(out[0, :, 0], vals * 17)


def test_png_16bit_takes_high_byte():
    px = np.array([[[0x1234, 0xFF00, 0x00FF]]], dtype=np.uint16)
    raw = b"\x00" + px.astype(">u2").tobytes()
    out = decode_png(_png(1, 1, 16, 2, raw))
    assert out[0, 0].tolist() == [0x12, 0xFF, 0x00]


def test_png_palette_and_trns_premultiply():
    # palette: red, green, half-transparent blue (alpha 128 via tRNS)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    trns = bytes([255, 255, 128])
    raw = b"\x00" + bytes([0, 1, 2])
    out = decode_png(
        _png(3, 1, 8, 3, raw, extra=_chunk(b"PLTE", plte) + _chunk(b"tRNS", trns))
    )
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[0, 1].tolist() == [0, 255, 0]
    # Go's conversion: ((255 * 128 * 257) // 255) >> 8 == 128
    assert out[0, 2].tolist() == [0, 0, ((255 * 128 * 257) // 255) >> 8]


def test_png_rgba_premultiplies_like_go():
    px = np.array([[[200, 100, 50, 64]]], dtype=np.uint8)
    raw = b"\x00" + px.tobytes()
    out = decode_png(_png(1, 1, 8, 6, raw))
    expect = [((c * 64 * 257) // 255) >> 8 for c in (200, 100, 50)]
    assert out[0, 0].tolist() == expect


def test_png_gray_alpha():
    px = np.array([[[180, 255], [180, 0]]], dtype=np.uint8)  # opaque, clear
    raw = b"\x00" + px.tobytes()
    out = decode_png(_png(2, 1, 8, 4, raw))
    assert out[0, 0].tolist() == [180, 180, 180]
    assert out[0, 1].tolist() == [0, 0, 0]


# ---------------------------------------------------------------------------
# Adam7 interlace (pass extraction written here, not shared with codec)
# ---------------------------------------------------------------------------


_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


@pytest.mark.parametrize("shape", [(8, 8), (9, 13), (3, 2), (1, 1)])
def test_png_adam7_interlaced(shape):
    h, w = shape
    img = _rng(h * 100 + w).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    raw = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            raw += b"\x00" + sub[y].tobytes()
    assert np.array_equal(decode_png(_png(w, h, 8, 2, raw, interlace=1)), img)


# ---------------------------------------------------------------------------
# corruption / gates
# ---------------------------------------------------------------------------


def test_png_bad_crc_rejected():
    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_png_truncated_idat_rejected():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(3))  # one row short
    with pytest.raises(ValueError, match="IDAT too short"):
        decode_png(_png(4, 4, 8, 2, raw))


def test_dispatch_gates():
    assert sniff_format(b"\xff\xd8\xff\xe0hello") == "jpeg"
    # malformed jpeg is a data error (real decoder), not a capability gap
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0hello")
    # gif decodes for real now — malformed gif is a data error
    with pytest.raises(ValueError):
        decode_image(b"GIF89a" + b"\x00" * 20)
    # lossless webp decodes for real now (webpcodec) — an empty
    # container is a data error, a lossy VP8 payload stays gated
    with pytest.raises(ValueError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBP")
    with pytest.raises(UnsupportedImageError):
        decode_image(
            b"RIFF\x14\x00\x00\x00WEBPVP8 \x04\x00\x00\x00\x00\x00\x00\x00"
        )
    with pytest.raises(ValueError):
        decode_image(b"not an image at all")
    # NotImplementedError compatibility: callers that gated on PIL used it
    assert issubclass(UnsupportedImageError, NotImplementedError)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def _bmp(img: np.ndarray, bpp=24, topdown=False) -> bytes:
    h, w = img.shape[:2]
    nbytes = bpp // 8
    stride = ((bpp * w + 31) // 32) * 4
    rows = img if topdown else img[::-1]
    body = b""
    for y in range(h):
        line = b""
        for x in range(w):
            r, g, b = (int(v) for v in rows[y, x])
            line += bytes([b, g, r] + ([0] if bpp == 32 else []))
        body += line + b"\x00" * (stride - len(line))
    pix_off = 54
    header = (
        b"BM"
        + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, (h if not topdown else -h), 1, bpp, 0,
            len(body), 2835, 2835, 0, 0,
        )
    )
    return header + body


@pytest.mark.parametrize("bpp", [24, 32])
@pytest.mark.parametrize("topdown", [False, True])
def test_bmp_roundtrip(bpp, topdown):
    img = _rng(bpp).randint(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(_bmp(img, bpp=bpp, topdown=topdown)), img)


def test_bmp_rle_rejected():
    img = np.zeros((1, 1, 3), dtype=np.uint8)
    data = bytearray(_bmp(img))
    struct.pack_into("<I", data, 30, 1)  # BI_RLE8
    with pytest.raises(UnsupportedImageError):
        decode_bmp(bytes(data))


# ---------------------------------------------------------------------------
# Lanczos3 resize
# ---------------------------------------------------------------------------


def test_resize_identity_is_exact():
    img = _rng(1).randint(0, 256, size=(16, 12, 3), dtype=np.uint8)
    assert np.array_equal(resize_lanczos3(img, (12, 16)), img)


def test_resize_constant_stays_constant():
    img = np.full((20, 30, 3), 137, dtype=np.uint8)
    for size in [(7, 5), (64, 48), (1, 1)]:
        out = resize_lanczos3(img, size)
        assert out.shape == (size[1], size[0], 3)
        assert np.all(out == 137)


def test_resize_downscale_checkerboard_averages():
    img = np.zeros((32, 32), dtype=np.uint8)
    img[::2, ::2] = 255
    img[1::2, 1::2] = 255
    out = resize_lanczos3(img, (4, 4)).astype(float)
    assert abs(out.mean() - 127.5) < 8.0


def test_resize_is_separable_symmetric():
    img = _rng(3).randint(0, 256, size=(10, 10, 3), dtype=np.uint8)
    a = resize_lanczos3(img, (5, 7))
    b = resize_lanczos3(img.transpose(1, 0, 2), (7, 5)).transpose(1, 0, 2)
    assert np.array_equal(a, b)


def test_resize_matches_mean_on_exact_2x_boxlike():
    # Lanczos is not a box filter, but on a linear ramp it must
    # reproduce the ramp (partition of unity + odd symmetry).
    ramp = np.tile(np.arange(0, 256, 8, dtype=np.uint8), (4, 1))
    out = resize_lanczos3(ramp, (32, 4))
    assert np.array_equal(out, ramp)


# ---------------------------------------------------------------------------
# GIF (independent spec-derived encoder -> decode_gif differential)
# ---------------------------------------------------------------------------

from same_same_spark.pipeline.imagecodec import decode_gif  # noqa: E402


def _pack_codes(codes, widths) -> bytes:
    val, nbits = 0, 0
    for c, w in zip(codes, widths):
        val |= c << nbits
        nbits += w
    return val.to_bytes((nbits + 7) // 8, "little")


def _lzw_encode(indices, min_code: int) -> bytes:
    """Real GIF LZW encoder (dictionary path), written from the spec
    independently of the decoder: emits CLEAR, then codes at the width
    the decoder derives from ITS table (which lags the encoder's by
    exactly one entry), growing width when next_code == 2**width + 1."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    codes, widths = [clear], [width]
    buf = b""
    for i in indices:
        nxt = buf + bytes([i])
        if nxt in table:
            buf = nxt
            continue
        codes.append(table[buf])
        widths.append(width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        buf = bytes([i])
    if buf:
        codes.append(table[buf])
        widths.append(width)
    codes.append(eoi)
    widths.append(width)
    return _pack_codes(codes, widths)


def _gif_bytes(
    idx: "np.ndarray",
    palette: "np.ndarray",
    min_code: int = 8,
    interlace: bool = False,
    transparent: int | None = None,
    local_palette: bool = False,
    frame_offset: tuple[int, int] = (0, 0),
    screen: tuple[int, int] | None = None,
    version: bytes = b"GIF89a",
    extra_frame: bool = False,
) -> bytes:
    h, w = idx.shape
    left, top = frame_offset
    sw, sh = screen or (w + left, h + top)
    pal = palette.astype(np.uint8)
    npal = len(pal)
    assert npal & (npal - 1) == 0 and npal >= 2
    pbits = npal.bit_length() - 2  # field stores size-1 exponent
    out = bytearray(version)
    out += struct.pack("<HH", sw, sh)
    if local_palette:
        out += bytes([0x00, 0, 0])  # no GCT
    else:
        out += bytes([0x80 | pbits, 0, 0])
        out += pal.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    # a comment extension exercises the sub-block skipper
    out += bytes([0x21, 0xFE, 5]) + b"hello" + bytes([0])
    rows = idx
    if interlace:
        order = np.concatenate(
            [np.arange(f, h, s) for f, s in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        rows = idx[order]
    out += bytes([0x2C]) + struct.pack("<HHHH", left, top, w, h)
    out += bytes([(0x80 | pbits if local_palette else 0) | (0x40 if interlace else 0)])
    if local_palette:
        out += pal.tobytes()
    out += bytes([min_code])
    payload = _lzw_encode(rows.reshape(-1).tolist(), min_code)
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0])
    if extra_frame:
        # second frame with a DIFFERENT constant color: decode must
        # return the FIRST frame only
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x00, min_code])
        p2 = _lzw_encode([1] * (w * h), min_code)
        for i in range(0, len(p2), 255):
            c2 = p2[i : i + 255]
            out += bytes([len(c2)]) + c2
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


def _pal256() -> "np.ndarray":
    r = np.arange(256, dtype=np.uint8)
    return np.stack([r, (r * 3) % 256, (r * 7) % 256], axis=1)


def test_gif_roundtrip_256_colors():
    rng = np.random.RandomState(7)
    idx = rng.randint(0, 256, size=(23, 31), dtype=np.uint8)
    pal = _pal256()
    got = decode_gif(_gif_bytes(idx, pal))
    assert got.shape == (23, 31, 3)
    assert np.array_equal(got, pal[idx])


def test_gif_small_palette_width_growth():
    # 4-color palette, long repetitive data: forces LZW width to grow
    # through 3->4->5... bits and exercises the KwKwK (code==len) path
    rng = np.random.RandomState(3)
    idx = np.repeat(rng.randint(0, 4, size=(9, 400), dtype=np.uint8), 2, axis=1)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    got = decode_gif(_gif_bytes(idx, pal, min_code=2))
    assert np.array_equal(got, pal[idx])


def test_gif_kwkwk_sequence():
    # 'aaaa...' is the classic code==next_code stress
    idx = np.zeros((1, 64), dtype=np.uint8)
    pal = np.array([[9, 8, 7], [1, 2, 3]], np.uint8)
    got = decode_gif(_gif_bytes(idx, pal, min_code=2))
    assert np.array_equal(got, pal[idx])


def test_gif_interlaced():
    rng = np.random.RandomState(11)
    idx = rng.randint(0, 256, size=(17, 9), dtype=np.uint8)
    pal = _pal256()
    got = decode_gif(_gif_bytes(idx, pal, interlace=True))
    assert np.array_equal(got, pal[idx])


def test_gif_transparency_composites_to_black():
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    pal = np.array([[10, 20, 30], [200, 0, 0], [0, 200, 0], [9, 9, 9]], np.uint8)
    got = decode_gif(_gif_bytes(idx, pal, min_code=2, transparent=0))
    want = pal[idx].copy()
    want[idx == 0] = 0
    assert np.array_equal(got, want)


def test_gif_later_gce_clears_transparency():
    """A GCE scopes only the next rendering block and REPLACES any
    earlier one: transparency=0 followed by a flag-clear GCE must
    render index 0 opaque."""
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    pal = np.array([[10, 20, 30], [200, 0, 0], [0, 200, 0], [9, 9, 9]], np.uint8)
    data = bytearray(_gif_bytes(idx, pal, min_code=2, transparent=0))
    # inject a second GCE (flags=0 → no transparency) right before the
    # image descriptor
    at = data.index(0x2C, 13)
    data[at:at] = bytes([0x21, 0xF9, 4, 0x00, 0, 0, 0, 0])
    got = decode_gif(bytes(data))
    assert np.array_equal(got, pal[idx])  # index 0 kept opaque


def test_gif_local_palette_and_87a():
    idx = np.array([[0, 1, 2]], dtype=np.uint8)
    pal = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9], [0, 0, 0]], np.uint8)
    got = decode_gif(
        _gif_bytes(idx, pal, min_code=2, local_palette=True, version=b"GIF87a")
    )
    assert np.array_equal(got, pal[idx])


def test_gif_frame_offset_composites_on_black_screen():
    idx = np.full((2, 3), 1, dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    got = decode_gif(
        _gif_bytes(idx, pal, min_code=2, frame_offset=(2, 1), screen=(6, 4))
    )
    assert got.shape == (4, 6, 3)
    assert np.array_equal(got[1:3, 2:5], np.full((2, 3, 3), 255, np.uint8))
    assert got.sum() == 255 * 3 * 6  # everything else black


def test_gif_animation_returns_first_frame():
    idx = np.full((3, 3), 2, dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 0, 255], [1, 1, 1]], np.uint8)
    got = decode_gif(_gif_bytes(idx, pal, min_code=2, extra_frame=True))
    assert np.array_equal(got, pal[idx])  # blue frame, not the red 2nd


def test_gif_truncated_and_corrupt_rejected():
    idx = np.zeros((4, 4), dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    good = _gif_bytes(idx, pal, min_code=2)
    with pytest.raises(ValueError):
        decode_gif(good[:20])
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + good[6:30])  # truncated mid-stream
    # via dispatch: gif now decodes (no UnsupportedImageError)
    from same_same_spark.pipeline.imagecodec import decode_image

    assert np.array_equal(decode_image(good), pal[idx])


def test_gif_index_outside_palette_rejected():
    # handcraft: palette of 2, pixel index 3
    idx = np.full((1, 4), 3, dtype=np.uint8)
    pal = np.array([[0, 0, 0], [1, 1, 1]], np.uint8)
    data = _gif_bytes(idx, pal, min_code=2)
    with pytest.raises(ValueError, match="outside color table"):
        decode_gif(data)
