"""Pure-stdlib image codec: PNG decode (+ minimal encode), BMP decode,
and Lanczos3 resize.

Closes the reference's image ingestion gap without third-party libs:
the reference decodes via Go's ``image.Decode`` with png/jpeg registered
(``internal/embedders/clip/simple.go:7-9``) and resizes with
``resize.Lanczos3`` (``simple.go:111``).  This container has no PIL, so
:mod:`same_same_spark.pipeline.clip` / ``multimodal`` previously gated
the real byte->pixel step behind ``NotImplementedError``.  PNG is fully
specified (RFC 2083) and its only compression is zlib — stdlib — so the
decode can be real here; JPEG (DCT/huffman) remains honestly gated.

Contracts:

- :func:`decode_png` handles bit depths 1/2/4/8/16, color types
  0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), all five
  scanline filters, and Adam7 interlace.  Output is an ``(H, W, 3)``
  uint8 array.  16-bit samples take the high byte; alpha is
  premultiplied against black exactly like Go's ``color.RGBA()``
  conversion (``rgb8 = (rgb * a * 257 // 255) >> 8``) so downstream
  feature math sees what the reference's ``img.At(x, y).RGBA()`` sees.
- :func:`decode_bmp` handles uncompressed (BI_RGB) 24/32-bit Windows
  bitmaps, bottom-up and top-down.
- :func:`resize_lanczos3` is a separable Lanczos (a=3) resampler with
  kernel scaling on downscale and edge clamping — the same algorithm as
  nfnt/resize's ``Lanczos3`` (not pinned to its ULPs; this module is a
  capability path, the bit-pinned oracle paths stay on the deterministic
  stand-in decoders in ``clip.py``).
- :func:`encode_png` writes a minimal valid PNG (filter 0, color type
  0/2) — enough for round-trip tests and thumbnail sinks.
- :func:`decode_gif` handles GIF87a/GIF89a first frames: LZW, global
  and local color tables, interlacing, GIF89a transparency (composited
  to black, same premultiply convention as PNG alpha).
- :func:`decode_image` sniffs magic bytes and dispatches; PNG/BMP/GIF
  decode here, huffman JPEG in ``jpegcodec``, lossless WebP (VP8L) in
  ``webpcodec``; lossy/animated WebP raises ``UnsupportedImageError``
  (VP8 is a video codec, genuinely absent), garbage raises
  ``ValueError``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass layout: (x0, y0, dx, dy) per pass.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


class UnsupportedImageError(NotImplementedError):
    """Raised for formats this stdlib codec genuinely cannot decode
    (JPEG/GIF/WebP) — the same capability gate the PIL import used to
    express, now narrowed to the formats that actually need it."""


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _iter_chunks(data: bytes):
    pos = len(PNG_SIG)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("png: truncated chunk " + ctype.decode("latin1"))
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) == 4 and struct.unpack(">I", crc)[0] != zlib.crc32(
            ctype + body
        ):
            raise ValueError("png: bad CRC in " + ctype.decode("latin1"))
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("png: missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, stride: int, fbpp: int) -> bytearray:
    """Invert the five PNG scanline filters. ``raw`` is h*(1+stride)
    bytes (filter byte + filtered scanline per row); returns h*stride
    reconstructed bytes.

    Filters 1/3/4 depend on the already-reconstructed left neighbour,
    so rows run byte-sequential; filter 2 (Up) vectorizes. Fine for the
    thumbnail-scale images this capability path serves — the oracle hot
    paths never enter this module.
    """
    if len(raw) < h * (stride + 1):
        raise ValueError("png: IDAT too short for image dimensions")
    out = bytearray(h * stride)
    prev_start = -1
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(
            raw[y * (stride + 1) + 1 : y * (stride + 1) + 1 + stride]
        )
        o = y * stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(fbpp, stride):
                line[i] = (line[i] + line[i - fbpp]) & 0xFF
        elif ftype == 2:  # Up
            if prev_start >= 0:
                up = np.frombuffer(
                    out, dtype=np.uint8, count=stride, offset=prev_start
                )
                line = bytearray(
                    (
                        np.frombuffer(bytes(line), dtype=np.uint8) + up
                    ).astype(np.uint8).tobytes()
                )
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - fbpp] if i >= fbpp else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                line[i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - fbpp] if i >= fbpp else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                ul = (
                    out[prev_start + i - fbpp]
                    if (prev_start >= 0 and i >= fbpp)
                    else 0
                )
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype}")
        out[o : o + stride] = line
        prev_start = o
    return out


def _unpack_samples(
    recon: bytearray, w: int, h: int, channels: int, depth: int
) -> np.ndarray:
    """Reconstructed scanline bytes -> (h, w, channels) uint8 samples
    (16-bit takes the high byte; sub-byte gray scales to full range,
    sub-byte palette indices stay raw)."""
    if depth == 8:
        arr = np.frombuffer(bytes(recon), dtype=np.uint8)
        return arr.reshape(h, w * channels)[:, : w * channels].reshape(
            h, w, channels
        )
    if depth == 16:
        arr = np.frombuffer(bytes(recon), dtype=">u2").astype(np.uint16)
        return (arr >> 8).astype(np.uint8).reshape(h, w, channels)
    # 1/2/4-bit: only color types 0 and 3 are legal (channels == 1)
    stride = (w * depth + 7) // 8
    rows = np.frombuffer(bytes(recon), dtype=np.uint8).reshape(h, stride)
    bits = np.unpackbits(rows, axis=1)[:, : w * depth].reshape(h, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (bits * weights).sum(axis=2).astype(np.uint8)
    return vals.reshape(h, w, 1)


def _premultiply(rgb: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """Go's exact 8-bit premultiplied-alpha conversion: uint8 channels
    widen via ``x * 0x101``, premultiply in 32-bit, take the high byte
    (``image/color``'s ``NRGBA.RGBA()`` collapsed over 8-bit I/O)."""
    r32 = rgb.astype(np.uint32) * alpha.astype(np.uint32)[..., None] * 257
    return ((r32 // 255) >> 8).astype(np.uint8)


def _samples_to_rgb(
    samples: np.ndarray,
    color_type: int,
    depth: int,
    palette: bytes | None,
    trns: bytes | None,
) -> np.ndarray:
    if color_type == 0:  # grayscale
        g = samples[..., 0]
        if depth < 8:
            g = (
                g.astype(np.uint16) * 255 // ((1 << depth) - 1)
            ).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    if color_type == 2:  # truecolor
        return samples
    if color_type == 3:  # palette
        if palette is None:
            raise ValueError("png: palette image without PLTE")
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        idx = samples[..., 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("png: palette index out of range")
        rgb = pal[idx]
        if trns:
            a = np.full(256, 255, dtype=np.uint8)
            a[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return _premultiply(rgb, a[idx])
        return rgb
    if color_type == 4:  # gray + alpha
        rgb = np.repeat(samples[..., :1], 3, axis=2)
        return _premultiply(rgb, samples[..., 1])
    if color_type == 6:  # RGBA
        return _premultiply(samples[..., :3], samples[..., 3])
    raise ValueError(f"png: unsupported color type {color_type}")


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to an ``(H, W, 3)`` uint8 RGB array."""
    if not data.startswith(PNG_SIG):
        raise ValueError("png: bad signature")
    ihdr = None
    palette: bytes | None = None
    trns: bytes | None = None
    idat: list[bytes] = []
    for ctype, body in _iter_chunks(data):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.append(body)
    if ihdr is None or not idat:
        raise ValueError("png: missing IHDR or IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("png: unknown compression/filter method")
    if color_type not in _CHANNELS:
        raise ValueError(f"png: unsupported color type {color_type}")
    if depth not in (1, 2, 4, 8, 16) or (
        depth < 8 and color_type not in (0, 3)
    ):
        raise ValueError(f"png: illegal bit depth {depth} for type {color_type}")
    if w == 0 or h == 0:
        raise ValueError("png: zero-sized image")
    channels = _CHANNELS[color_type]
    bpp_bits = channels * depth
    fbpp = max(1, bpp_bits // 8)
    raw = zlib.decompress(b"".join(idat))

    def decode_pass(buf: bytes, pw: int, ph: int) -> np.ndarray:
        stride = (pw * bpp_bits + 7) // 8
        recon = _unfilter(buf, ph, stride, fbpp)
        return _unpack_samples(recon, pw, ph, channels, depth)

    if interlace == 0:
        stride = (w * bpp_bits + 7) // 8
        samples = decode_pass(raw, w, h)
        del stride
    elif interlace == 1:
        samples = np.zeros((h, w, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * bpp_bits + 7) // 8
            nbytes = ph * (stride + 1)
            samples[y0::dy, x0::dx] = decode_pass(
                raw[pos : pos + nbytes], pw, ph
            )
            pos += nbytes
    else:
        raise ValueError(f"png: unknown interlace method {interlace}")
    return _samples_to_rgb(samples, color_type, depth, palette, trns)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer: uint8 ``(H, W, 3)`` -> color type 2 or
    ``(H, W)`` -> color type 0, 8-bit, filter 0 per scanline, one IDAT."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        arr = arr[..., None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError("encode_png: expected (H, W) or (H, W, 3) uint8")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = arr.reshape(h, w * channels)
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed (BI_RGB) 24/32-bit Windows BMP to
    ``(H, W, 3)`` uint8 RGB. 32-bit alpha bytes are ignored (BMP alpha
    is conventionally unused padding in BI_RGB)."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("bmp: bad signature or truncated header")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    w, h_signed = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0:
        raise UnsupportedImageError(f"bmp: compression {compression} unsupported")
    if bpp not in (24, 32):
        raise UnsupportedImageError(f"bmp: {bpp}bpp unsupported")
    if w <= 0 or h_signed == 0:
        raise ValueError("bmp: bad dimensions")
    h = abs(h_signed)
    nbytes = bpp // 8
    stride = ((bpp * w + 31) // 32) * 4
    body = data[pix_off : pix_off + stride * h]
    if len(body) != stride * h:
        raise ValueError("bmp: truncated pixel data")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * nbytes].reshape(h, w, nbytes)
    if h_signed > 0:  # bottom-up storage
        px = px[::-1]
    return px[..., 2::-1].copy()  # BGR(A) -> RGB


# ---------------------------------------------------------------------------
# Lanczos3 resize
# ---------------------------------------------------------------------------


def _lanczos3(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    out = np.zeros_like(x)
    nz = (x > 1e-12) & (x < 3.0)
    xn = x[nz] * np.pi
    out[nz] = 3.0 * np.sin(xn) * np.sin(xn / 3.0) / (xn * xn)
    out[x <= 1e-12] = 1.0
    return out


def _resample_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-normalized Lanczos3 weight matrix with kernel
    scaling on downscale and edge clamping — nfnt/resize's strategy."""
    scale = n_in / n_out
    fscale = max(scale, 1.0)
    support = 3.0 * fscale
    centers = (np.arange(n_out) + 0.5) * scale - 0.5
    lo = np.floor(centers - support).astype(np.int64)
    width = int(np.ceil(2 * support)) + 2
    taps = lo[:, None] + np.arange(width)[None, :]
    wts = _lanczos3((taps - centers[:, None]) / fscale)
    wts /= wts.sum(axis=1, keepdims=True)
    taps = np.clip(taps, 0, n_in - 1)
    mat = np.zeros((n_out, n_in))
    np.add.at(mat, (np.arange(n_out)[:, None], taps), wts)
    return mat


def resize_lanczos3(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Separable Lanczos3 resample of an ``(H, W, C)`` or ``(H, W)``
    uint8 image to ``size=(width, height)``, clamped back to uint8."""
    tw, th = size
    if tw <= 0 or th <= 0:
        raise ValueError("resize: target size must be positive")
    arr = np.asarray(img, dtype=np.float64)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[..., None]
    h, w = arr.shape[:2]
    if w != tw:
        arr = np.einsum("ow,hwc->hoc", _resample_matrix(w, tw), arr)
    if h != th:
        arr = np.einsum("oh,hwc->owc", _resample_matrix(h, th), arr)
    out = np.clip(np.rint(arr), 0, 255).astype(np.uint8)
    return out[..., 0] if squeeze else out


# ---------------------------------------------------------------------------
# GIF decode (GIF87a/GIF89a, CompuServe spec + RFC-referenced LZW)
# ---------------------------------------------------------------------------


def _gif_lzw(data: bytes, min_code: int, max_pixels: int) -> bytearray:
    """GIF-variant LZW: variable-width codes 3..12 bits packed
    LSB-first, CLEAR resets the table, table frozen at 4096 entries
    (deferred-clear behavior). Plain-Python loop — the decode runs
    inside mapInPandas workers on bounded thumbnails, not on a Spark
    hot path."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    out = bytearray()
    val = int.from_bytes(data, "little")
    bitpos, total = 0, len(data) * 8
    prev: bytes | None = None
    while bitpos + width <= total and len(out) < max_pixels:
        code = (val >> bitpos) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: corrupt LZW stream (bad first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: corrupt LZW stream (code out of range)")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out[:max_pixels]


def _gif_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed sub-blocks starting at ``pos``;
    returns (payload, position after the 0 terminator)."""
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("gif: truncated sub-block stream")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        parts.append(data[pos : pos + ln])
        if len(parts[-1]) != ln:
            raise ValueError("gif: truncated sub-block")
        pos += ln


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))  # (first row, step) passes


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF87a/GIF89a to ``(H, W, 3)`` uint8 RGB:
    global/local color tables, interlacing, and GIF89a transparency
    (transparent pixels composite to black, matching this module's
    premultiply-on-black convention for PNG alpha). Animations yield
    their FIRST frame, composited at its offset onto a black logical
    screen. Reference parity: the reference's image scan accepts
    ``.gif`` (``internal/ingestion/image.go:45-52``) via Go's
    ``image/gif``; lossless WebP decodes in ``webpcodec``, lossy VP8
    stays gated."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    try:
        return _decode_gif_inner(data)
    except (IndexError, struct.error) as exc:  # truncated stream
        raise ValueError(f"gif: truncated or corrupt stream ({exc})")


def _decode_gif_inner(data: bytes) -> np.ndarray:
    sw, sh = struct.unpack("<HH", data[6:10])
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    transparent: int | None = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            payload, pos = _gif_subblocks(data, pos + 1)
            if label == 0xF9 and len(payload) >= 4:
                # a GCE scopes ONLY the next rendering block and
                # REPLACES any earlier GCE — a clear transparency flag
                # must drop a previously-seen transparent index
                transparent = payload[3] if payload[0] & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{block:02x}")
        left, top, w, h = struct.unpack("<HHHH", data[pos : pos + 8])
        ipacked = data[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            pal = np.frombuffer(
                data[pos : pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("gif: image without any color table")
        min_code = data[pos]
        if not 2 <= min_code <= 11:
            raise ValueError(f"gif: bad LZW min code size {min_code}")
        payload, pos = _gif_subblocks(data, pos + 1)
        idx = np.frombuffer(
            bytes(_gif_lzw(payload, min_code, w * h)), np.uint8
        )
        if idx.size < w * h:
            raise ValueError("gif: truncated pixel data")
        idx = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate(
                [np.arange(first, h, step) for first, step in _GIF_INTERLACE]
            )
            deinterlaced = np.empty_like(idx)
            deinterlaced[order] = idx
            idx = deinterlaced
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("gif: pixel index outside color table")
        frame = pal[idx]
        if transparent is not None and transparent < len(pal):
            frame = frame.copy()
            frame[idx == transparent] = 0  # premultiply-on-black
        canvas = np.zeros((sh, sw, 3), np.uint8)
        canvas[top : top + h, left : left + w] = frame[
            : max(0, sh - top), : max(0, sw - left)
        ]
        return canvas
    raise ValueError("gif: no image data before trailer")


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def sniff_format(data: bytes) -> str:
    if data.startswith(PNG_SIG):
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    return "unknown"


def decode_image(data: bytes) -> np.ndarray:
    """Sniff + decode to ``(H, W, 3)`` uint8 RGB. PNG/BMP/GIF decode
    here, huffman JPEG (baseline, extended sequential, progressive,
    and lossless) in :mod:`same_same_spark.pipeline.jpegcodec`,
    lossless WebP (VP8L) in :mod:`same_same_spark.pipeline.webpcodec`;
    lossy/animated WebP and hierarchical/arithmetic JPEG raise
    :class:`UnsupportedImageError` — the narrowed honest gate; anything
    else raises ``ValueError``."""
    fmt = sniff_format(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "jpeg":
        from same_same_spark.pipeline.jpegcodec import decode_jpeg

        return decode_jpeg(data)
    if fmt == "gif":
        return decode_gif(data)
    if fmt == "webp":
        from same_same_spark.pipeline.webpcodec import decode_webp

        return decode_webp(data)
    raise ValueError("unrecognized image payload")
