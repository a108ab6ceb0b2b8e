"""Pure-stdlib WebP **lossless** (VP8L) decoder.

Narrows the image capability gate once more: the reference accepts
``.webp`` in its image scan (``/root/reference/internal/ingestion/
image.go:45-52``) via Go's registered decoders; this container has no
PIL/libwebp, so WebP previously raised ``UnsupportedImageError``. The
LOSSLESS half of WebP (VP8L, RFC 9649 §3-5) is a fully-specified
entropy-coded format — canonical prefix codes, LZ77 with a 2-D
distance mapping, a color cache, and four invertible transforms — all
implementable from the spec with stdlib + numpy, exactly like the
PNG/GIF/JPEG codecs in this package. Lossy WebP (VP8 intra-frame
video coding: boolean arithmetic coder, DCT, loop filter) remains
honestly gated — that is a video codec, not an entropy coder.

Coverage:

- RIFF container walk: plain ``VP8L`` files and extended ``VP8X``
  files whose image chunk is VP8L; ``VP8 `` (lossy) raises the gate.
- VP8L bitstream: LSB-first bit reader; "simple" (1-2 symbol) and
  normal prefix-code headers (code-length code in ``kOrder``, repeat
  codes 16/17/18, the optional max_symbol short-circuit); canonical
  code reconstruction (single-symbol codes read zero bits); meta
  prefix groups selected per tile from an entropy image; color cache
  (``0x1e35a7bd`` multiplicative hash); LZ77 backward references with
  the 120-entry 2-D distance map.
- All four transforms, inverted in reverse bitstream order:
  PREDICTOR (14 modes incl. Select and the ClampAddSubtract pair,
  C-truncating division, the top-right wrap at row ends), COLOR
  (signed ``(int8(t) * int8(c)) >> 5`` deltas), SUBTRACT_GREEN, and
  COLOR_INDEXING (delta-coded palette, sub-byte pixel bundling,
  out-of-range indexes decode transparent black).
- Output is ``(H, W, 3)`` uint8 RGB with alpha premultiplied against
  black exactly like the PNG/GIF paths (Go's ``color.RGBA()``
  convention), so downstream feature math is format-agnostic.

Verification mirrors ``jpegcodec``: tests/test_webpcodec.py contains
an INDEPENDENT spec-derived VP8L *encoder* (its own canonical-code
builder and bit writer) and pins ``decode(encode(img)) == img``
pixel-exactly across every feature: simple and full code headers,
repeat codes, LZ77 + cache, each transform alone and stacked, meta
prefix groups, and sub-byte palette bundling.
"""

from __future__ import annotations

import struct

import numpy as np

from same_same_spark.pipeline.imagecodec import (
    UnsupportedImageError,
    _premultiply,
)

__all__ = ["decode_webp"]

# Order in which code-length code lengths are stored (RFC 9649 §4.2.1).
K_CODE_LENGTH_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
)

# 2-D distance mapping for LZ77 distance codes 1..120 (RFC 9649
# §4.2.2): (dx, dy) relative to the current pixel.
K_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            p = self.pos + i
            byte = p >> 3
            if byte >= len(self.data):
                raise ValueError("vp8l: bitstream truncated")
            out |= ((self.data[byte] >> (p & 7)) & 1) << i
        self.pos += n
        return out

    def read_bit(self) -> int:
        p = self.pos
        byte = p >> 3
        if byte >= len(self.data):
            raise ValueError("vp8l: bitstream truncated")
        self.pos += 1
        return (self.data[byte] >> (p & 7)) & 1


class _PrefixCode:
    """Canonical prefix code: decode one symbol bit by bit (codes are
    read MSB-of-code first). A code with a single used symbol reads
    ZERO bits (RFC 9649 §4.2.1)."""

    __slots__ = ("single", "table")

    def __init__(self, code_lengths: list[int]):
        used = [s for s, ln in enumerate(code_lengths) if ln > 0]
        if not used:
            raise ValueError("vp8l: prefix code with no symbols")
        if len(used) == 1:
            self.single = used[0]
            self.table = None
            return
        self.single = None
        # canonical assignment: increasing (length, symbol)
        max_len = max(code_lengths)
        # Kraft completeness check
        kraft = sum(
            1 << (max_len - ln) for ln in code_lengths if ln > 0
        )
        if kraft != (1 << max_len):
            raise ValueError("vp8l: incomplete/oversubscribed prefix code")
        table: dict[tuple[int, int], int] = {}
        code = 0
        for ln in range(1, max_len + 1):
            for sym, sl in enumerate(code_lengths):
                if sl == ln:
                    table[(ln, code)] = sym
                    code += 1
            code <<= 1
        self.table = table

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        table = self.table
        while True:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("vp8l: bad prefix code stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    """One prefix-code header: simple (1-2 symbols) or normal form."""
    if br.read_bit():  # simple
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise ValueError("vp8l: simple code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            if sym0 >= alphabet_size:
                raise ValueError("vp8l: simple code symbol out of range")
            lengths[sym0] = 1
        return _PrefixCode(lengths)
    # normal form: code-length code first
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[K_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    # optional cap on coded symbols
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev_len = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            else:  # 18
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("vp8l: code-length repeat overflow")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _PrefixCode(lengths)


def _div_round_up(a: int, shift: int) -> int:
    return (a + (1 << shift) - 1) >> shift


def _decode_entropy_image(
    br: _BitReader,
    w: int,
    h: int,
    *,
    allow_meta: bool,
) -> np.ndarray:
    """One entropy-coded pixel array (ARGB uint32, shape (h, w)):
    optional color cache, optional meta prefix groups (main image
    only), then the LZ77/literal/cache-coded pixel stream."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"vp8l: bad color cache size {cache_bits}")
    meta = None
    prefix_bits = 0
    n_groups = 1
    if allow_meta and br.read_bit():
        prefix_bits = 2 + br.read(3)
        mw = _div_round_up(w, prefix_bits)
        mh = _div_round_up(h, prefix_bits)
        meta_img = _decode_entropy_image(br, mw, mh, allow_meta=False)
        # group index = (red << 8) | green
        meta = (
            ((meta_img >> 16) & 0xFF) << 8 | ((meta_img >> 8) & 0xFF)
        ).astype(np.int64)
        n_groups = int(meta.max()) + 1
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0

    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[meta[y >> prefix_bits, x >> prefix_bits]]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> cache_shift] = px
        elif s < 256 + 24:
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, g[4].read(br))
            dist = _map_distance(dist_code, w)
            if dist > pos or pos + length > total:
                raise ValueError("vp8l: backward reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[
                        ((0x1E35A7BD * px) & 0xFFFFFFFF) >> cache_shift
                    ] = px
        else:
            if cache is None:
                raise ValueError("vp8l: cache symbol without a cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out.reshape(h, w)


def _prefix_value(br: _BitReader, code: int) -> int:
    """LZ77 length / distance prefix decoding (RFC 9649 §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _map_distance(dist_code: int, w: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = K_DIST_MAP[dist_code - 1]
    return max(1, dy * w + dx)


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) // 2


def _inverse_predictor(
    img: np.ndarray, modes: np.ndarray, bits: int
) -> np.ndarray:
    """Per-pixel predictor inverse over channel-planes (a, r, g, b
    int32, shape (h, w)); residuals add mod 256. Scalar loop — VP8L
    prediction is inherently sequential (each pixel needs its decoded
    neighbors)."""
    h, w = img.shape
    ch = np.stack(
        [
            (img >> 24) & 0xFF,
            (img >> 16) & 0xFF,
            (img >> 8) & 0xFF,
            img & 0xFF,
        ],
        axis=-1,
    ).astype(np.int64)
    out = np.zeros_like(ch)

    def px(y, x):
        return out[y, x]

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = px(0, x - 1)  # top row: L
            elif x == 0:
                pred = px(y - 1, 0)  # first column: T
            else:
                mode = int(modes[y >> bits, x >> bits])
                L = px(y, x - 1)
                T = px(y - 1, x)
                TL = px(y - 1, x - 1)
                # top-right wraps to the current row's first pixel at
                # the right edge (the libwebp memory-layout rule)
                TR = px(y - 1, x + 1) if x + 1 < w else px(y, 0)
                if mode == 0:
                    pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    p = T.astype(np.int64) + L - TL
                    pa = np.abs(p - T).sum()
                    pb = np.abs(p - L).sum()
                    pred = T if pa - pb <= 0 else L
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:
                    ave = _avg2(L, T)
                    d = ave - TL
                    # C integer division truncates toward zero
                    half = np.sign(d) * (np.abs(d) // 2)
                    pred = np.clip(ave + half, 0, 255)
                else:
                    raise ValueError(f"vp8l: bad predictor mode {mode}")
            out[y, x] = (ch[y, x] + pred) & 0xFF
    return (
        (out[..., 0].astype(np.uint32) << 24)
        | (out[..., 1].astype(np.uint32) << 16)
        | (out[..., 2].astype(np.uint32) << 8)
        | out[..., 3].astype(np.uint32)
    )


def _s8(v: np.ndarray) -> np.ndarray:
    """Reinterpret uint8 values as signed int8 (C cast)."""
    return ((v.astype(np.int64) + 128) & 0xFF) - 128


def _color_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(int8(t) * int8(c)) >> 5 with C arithmetic shift."""
    return (_s8(t) * _s8(c)) >> 5


def _inverse_color_transform(
    img: np.ndarray, cte: np.ndarray, bits: int
) -> np.ndarray:
    h, w = img.shape
    by = np.arange(h) >> bits
    bx = np.arange(w) >> bits
    block = cte[np.ix_(by, bx)]
    g2r = (block >> 0) & 0xFF  # blue channel of the transform pixel
    g2b = (block >> 8) & 0xFF  # green channel
    r2b = (block >> 16) & 0xFF  # red channel
    a = (img >> 24) & 0xFF
    r = ((img >> 16) & 0xFF).astype(np.int64)
    g = ((img >> 8) & 0xFF).astype(np.int64)
    b = (img & 0xFF).astype(np.int64)
    r = (r + _color_delta(g2r, g)) & 0xFF
    b = (b + _color_delta(g2b, g)) & 0xFF
    b = (b + _color_delta(r2b, r)) & 0xFF
    return (
        (a.astype(np.uint32) << 24)
        | (r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | b.astype(np.uint32)
    )


def _inverse_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return (img & np.uint32(0xFF00FF00)) | (r << 16) | b


def _inverse_color_indexing(
    img: np.ndarray, palette: np.ndarray, orig_w: int, width_bits: int
) -> np.ndarray:
    h, pw = img.shape
    greens = ((img >> 8) & 0xFF).astype(np.int64)
    if width_bits:
        per = 1 << width_bits  # pixels bundled per green byte
        bw = 8 >> width_bits  # bits per pixel
        mask = (1 << bw) - 1
        idx = np.zeros((h, pw * per), dtype=np.int64)
        for i in range(per):
            idx[:, i::per] = (greens >> (i * bw)) & mask
        idx = idx[:, :orig_w]
    else:
        idx = greens
    # out-of-range palette indexes decode as transparent black
    lut = np.zeros(256, dtype=np.uint32)
    lut[: len(palette)] = palette
    return lut[np.clip(idx, 0, 255)]


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------


def _decode_vp8l_payload(data: bytes) -> np.ndarray:
    if not data or data[0] != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    br = _BitReader(data)
    br.read(8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unsupported version")

    transforms: list[tuple] = []
    xsize = w
    seen = set()
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("vp8l: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # PREDICTOR
            bits = br.read(3) + 2
            tw, th = _div_round_up(xsize, bits), _div_round_up(h, bits)
            modes = (
                _decode_entropy_image(br, tw, th, allow_meta=False) >> 8
            ) & 0xFF
            transforms.append(("predictor", modes, bits))
        elif ttype == 1:  # COLOR
            bits = br.read(3) + 2
            tw, th = _div_round_up(xsize, bits), _div_round_up(h, bits)
            cte = _decode_entropy_image(br, tw, th, allow_meta=False)
            transforms.append(("color", cte, bits))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("subtract_green",))
        else:  # COLOR_INDEXING
            n_colors = br.read(8) + 1
            pal_img = _decode_entropy_image(
                br, n_colors, 1, allow_meta=False
            )
            # palette pixels are delta-coded per channel
            pal = pal_img[0].astype(np.uint32)
            acc = np.uint32(0)
            out_pal = np.zeros(n_colors, dtype=np.uint32)
            for i in range(n_colors):
                s = np.uint32(pal[i])
                acc = np.uint32(
                    ((((acc >> 24) + (s >> 24)) & 0xFF) << 24)
                    | (((((acc >> 16) & 0xFF) + ((s >> 16) & 0xFF)) & 0xFF) << 16)
                    | (((((acc >> 8) & 0xFF) + ((s >> 8) & 0xFF)) & 0xFF) << 8)
                    | (((acc & 0xFF) + (s & 0xFF)) & 0xFF)
                )
                out_pal[i] = acc
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append(
                ("color_indexing", out_pal, xsize, width_bits)
            )
            xsize = _div_round_up(xsize, width_bits)
    img = _decode_entropy_image(br, xsize, h, allow_meta=True)
    for t in reversed(transforms):
        if t[0] == "predictor":
            img = _inverse_predictor(img, t[1], t[2])
        elif t[0] == "color":
            img = _inverse_color_transform(img, t[1], t[2])
        elif t[0] == "subtract_green":
            img = _inverse_subtract_green(img)
        else:
            img = _inverse_color_indexing(img, t[1], t[2], t[3])
    if img.shape != (h, w):
        raise ValueError("vp8l: decoded size mismatch")
    rgb = np.stack(
        [(img >> 16) & 0xFF, (img >> 8) & 0xFF, img & 0xFF], axis=-1
    ).astype(np.uint8)
    alpha = ((img >> 24) & 0xFF).astype(np.uint8)
    if np.all(alpha == 255):
        return rgb
    return _premultiply(rgb, alpha)


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF walk + VP8L decode to ``(H, W, 3)`` uint8 RGB. Animations
    yield their FIRST frame composited at its offset onto a black
    canvas (the GIF convention in this package). Lossy VP8 payloads
    raise :class:`UnsupportedImageError` (the remaining honest gate);
    malformed containers raise ``ValueError``."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP container")
    pos = 12
    canvas_wh = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8X" and size >= 10:
            cw = int.from_bytes(payload[4:7], "little") + 1
            chh = int.from_bytes(payload[7:10], "little") + 1
            canvas_wh = (cw, chh)
        elif fourcc == b"VP8L":
            return _decode_vp8l_payload(payload)
        elif fourcc == b"VP8 ":
            raise UnsupportedImageError(
                "webp: lossy VP8 payload (intra-frame video codec) "
                "unsupported; lossless VP8L decodes here"
            )
        elif fourcc == b"ANMF":
            return _decode_first_frame(payload, canvas_wh)
        # ANIM/ICCP/EXIF/XMP/ALPH and unknown chunks: keep walking
        pos += 8 + size + (size & 1)
    raise ValueError("webp: no image chunk found")


def _decode_first_frame(
    payload: bytes, canvas_wh: tuple[int, int] | None
) -> np.ndarray:
    """First ANMF frame: 16-byte frame header (x/2, y/2, w-1, h-1 as
    24-bit LE, duration, flags) then the frame's image subchunks."""
    if len(payload) < 16:
        raise ValueError("webp: truncated ANMF chunk")
    fx = int.from_bytes(payload[0:3], "little") * 2
    fy = int.from_bytes(payload[3:6], "little") * 2
    pos = 16
    frame = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if fourcc == b"VP8L":
            frame = _decode_vp8l_payload(payload[pos + 8 : pos + 8 + size])
            break
        if fourcc == b"VP8 ":
            raise UnsupportedImageError(
                "webp: animated frame uses lossy VP8"
            )
        pos += 8 + size + (size & 1)
    if frame is None:
        raise ValueError("webp: ANMF frame without an image chunk")
    fh, fw = frame.shape[:2]
    cw, chh = canvas_wh or (fx + fw, fy + fh)
    canvas = np.zeros((chh, cw, 3), dtype=np.uint8)
    canvas[fy : fy + fh, fx : fx + fw] = frame[
        : max(0, chh - fy), : max(0, cw - fx)
    ]
    return canvas


def classify_webp(data: bytes) -> tuple[str, bool]:
    """Container-level WebP classification: ``(codec, animated)``.

    ``codec`` is ``'lossless'`` (VP8L — decodable here), ``'lossy'``
    (VP8 — the documented gate), or ``'none'`` (no image chunk);
    ``animated`` reflects the VP8X animation flag or an ANIM/ANMF
    chunk. The walk mirrors :func:`decode_webp`'s exactly (top-level
    chunks; an ANMF frame's codec comes from its first image subchunk
    past the 16-byte frame header), so ``codec == 'lossless'``
    ⇔ ``decode_webp`` would reach a VP8L payload. Raises
    ``ValueError`` on non-RIFF/WEBP input — callers classifying mixed
    corpora should route through :func:`webp_coverage_kind`.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP container")
    pos = 12
    animated = False
    codec = "none"
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8X" and len(payload) >= 10 and payload[0] & 0x02:
            animated = True
        elif fourcc in (b"VP8L", b"VP8 "):
            codec = "lossless" if fourcc == b"VP8L" else "lossy"
            break
        elif fourcc == b"ANIM":
            animated = True
        elif fourcc == b"ANMF":
            animated = True
            fpos = 16
            while fpos + 8 <= len(payload):
                sub = payload[fpos : fpos + 4]
                (ssize,) = struct.unpack("<I", payload[fpos + 4 : fpos + 8])
                if sub in (b"VP8L", b"VP8 "):
                    codec = "lossless" if sub == b"VP8L" else "lossy"
                    break
                fpos += 8 + ssize + (ssize & 1)
            break
        pos += 8 + size + (size & 1)
    return codec, animated


def webp_coverage_kind(data) -> str:
    """Total classification for mixed binary corpora: the
    :func:`classify_webp` result as one string (``lossless``,
    ``lossy``, ``lossless-animated``, ``lossy-animated``,
    ``no-image-chunk``), or ``not-webp`` for anything that isn't a
    RIFF/WEBP container (including NULL/empty). Never raises."""
    if not data:
        return "not-webp"
    try:
        codec, animated = classify_webp(bytes(data))
    except ValueError:
        return "not-webp"
    if codec == "none":
        return "no-image-chunk"
    return f"{codec}-animated" if animated else codec


def webp_coverage_stats(
    df, content_col: str = "content", kind_col: str = "kind"
):
    """Per-kind counts over a binary column — quantifies how much of a
    corpus the lossy-VP8 gate actually bites (``lossy*`` rows raise in
    :func:`decode_webp`; ``lossless*`` rows decode). Arrow-batched
    classification (header walk only — no decode), then one groupBy
    on a low-cardinality kind column: a map-side-combined aggregate,
    corpus-scan-bound at any scale."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _kind(s):
        return pd.Series(s.map(webp_coverage_kind))

    return (
        df.select(_kind(F.col(content_col)).alias(kind_col))
        .groupBy(kind_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
