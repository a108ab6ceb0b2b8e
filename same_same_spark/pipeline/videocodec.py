"""Pure-stdlib AVI video codec: container parse, frame sampling, and
real frame decode for MJPEG and uncompressed-DIB streams.

Closes the multimodal video gap the way ``imagecodec``/``audiocodec``
closed images and audio: the reference's media model carries video
metadata (``/root/reference/internal/storage/local/schema.go:95-159``
— width, height, duration) but decode used to be stubbed. AVI is a
RIFF container (the same chunk grammar as WAV) and its two
self-contained video payloads decode with what this repo already has:

- **MJPEG** (``MJPG`` fourcc): every frame is a standalone baseline
  JPEG — decoded by :mod:`same_same_spark.pipeline.jpegcodec`. Frames
  that omit their huffman tables (the legacy OpenDML MJPEG convention)
  decode with the T.81 Annex K typical tables
  (``decode_jpeg(default_huffman=True)``); in-stream DHT overrides.
- **Uncompressed DIB** (``BI_RGB``): bottom-up BGR rows padded to
  4-byte stride, 24/32-bit — a struct-level transform.

Everything else (H.264, VP9, MPEG-4, …) raises
:class:`UnsupportedVideoError` — codecs genuinely absent here.

Frame sampling is the deterministic mid-bucket rule the stub
``multimodal.frame_sample_plan`` already exposes: sampling ``n`` of
``T`` frames takes indices ``floor((i + 0.5) · T / n)`` — no RNG, so
the oracle twin can recompute the exact frames.

:func:`encode_avi` writes a minimal spec-valid AVI (the fixture /
round-trip path, like ``encode_wav`` / ``encode_png``).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

__all__ = [
    "UnsupportedVideoError",
    "AviMeta",
    "parse_avi",
    "decode_frame",
    "sample_frames",
    "encode_avi",
    "dib_frame",
]

BI_RGB = 0


class UnsupportedVideoError(NotImplementedError):
    """Codecs this stdlib path genuinely cannot decode (H.264 etc.,
    or MJPEG frames relying on out-of-band huffman tables)."""


@dataclass
class AviMeta:
    width: int
    height: int
    fps: float
    n_frames: int
    compression: int  # BI_RGB or a fourcc packed little-endian
    bit_count: int

    @property
    def duration_sec(self) -> float:
        return self.n_frames / self.fps if self.fps > 0 else 0.0

    @property
    def fourcc(self) -> str:
        if self.compression == BI_RGB:
            return "DIB "
        return struct.pack("<I", self.compression).decode("latin1")


def _chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, list_type_or_None, payload_start, payload_end)
    walking one RIFF level; LIST payloads start after their type tag."""
    while pos + 8 <= end:
        cc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body_start = pos + 8
        body_end = body_start + size
        if body_end > end:
            raise ValueError("avi: truncated chunk " + cc.decode("latin1"))
        if cc == b"LIST":
            yield cc, buf[body_start : body_start + 4], body_start + 4, body_end
        else:
            yield cc, None, body_start, body_end
        pos = body_end + (size & 1)


def parse_avi(data: bytes) -> tuple[AviMeta, list[bytes]]:
    """Parse an AVI blob → (meta of the first video stream, its frame
    payloads in stream order)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])

    vids_stream = -1
    stream_no = -1
    scale = rate = 0
    strf = b""
    frames: list[bytes] = []

    def walk(pos: int, stop: int) -> None:
        nonlocal vids_stream, stream_no, scale, rate, strf
        for cc, ltype, a, b in _chunks(data, pos, stop):
            if cc == b"LIST":
                if ltype in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk(a, b)
            elif cc == b"strh":
                stream_no += 1
                if data[a : a + 4] == b"vids" and vids_stream < 0:
                    vids_stream = stream_no
                    scale, rate = struct.unpack_from("<II", data, a + 20)
            elif cc == b"strf" and stream_no == vids_stream >= 0 and not strf:
                strf = data[a:b]
            elif (
                vids_stream >= 0
                and cc[:2].isdigit()
                and int(cc[:2]) == vids_stream
                and cc[2:4] in (b"dc", b"db")
            ):
                frames.append(data[a:b])

    walk(12, end)
    if vids_stream < 0 or len(strf) < 40:
        raise ValueError("avi: no video stream found")
    _bi_size, w, h, _planes, bits, comp = struct.unpack_from(
        "<IiiHHI", strf, 0
    )
    fps = (rate / scale) if scale else 0.0
    return (
        AviMeta(
            width=w,
            height=abs(h),
            fps=fps,
            n_frames=len(frames),
            compression=comp,
            bit_count=bits,
        ),
        frames,
    )


def decode_frame(meta: AviMeta, payload: bytes) -> np.ndarray:
    """One frame payload → ``(H, W, 3)`` uint8 RGB."""
    if meta.compression == BI_RGB:
        h, w = meta.height, meta.width
        ch = meta.bit_count // 8
        if meta.bit_count not in (24, 32):
            raise UnsupportedVideoError(
                f"avi: {meta.bit_count}-bit DIB unsupported"
            )
        stride = (w * ch + 3) & ~3
        if len(payload) < stride * h:
            raise ValueError("avi: short DIB frame")
        rows = np.frombuffer(payload[: stride * h], dtype=np.uint8).reshape(
            h, stride
        )
        px = rows[:, : w * ch].reshape(h, w, ch)
        rgb = px[:, :, 2::-1]  # BGR(X) → RGB
        return rgb[::-1].copy()  # bottom-up → top-down
    if meta.fourcc.upper() in ("MJPG", "JPEG") or payload[:3] == b"\xff\xd8\xff":
        from same_same_spark.pipeline.jpegcodec import decode_jpeg

        # Legacy MJPEG convention (OpenDML): frames may omit DHT and
        # assume the T.81 Annex K typical tables decoder-side. Loading
        # the defaults is safe for table-carrying frames too — an
        # in-stream DHT overrides, exactly like real MJPEG decoders.
        return decode_jpeg(payload, default_huffman=True)
    raise UnsupportedVideoError(f"avi: codec {meta.fourcc!r} unsupported")


def sample_frames(
    data: bytes, n_frames: int = 4
) -> tuple[AviMeta, list[tuple[int, float, np.ndarray]]]:
    """Decode ``n_frames`` deterministically sampled frames →
    ``(meta, [(frame_idx, time_sec, rgb), ...])``. Sampling takes the
    mid-bucket indices ``floor((i + 0.5) · T / n)`` (duplicates
    collapse when T < n), matching ``multimodal.frame_sample_plan``'s
    time fractions."""
    meta, frames = parse_avi(data)
    total = len(frames)
    if total == 0:
        return meta, []
    idxs = sorted(
        {int((i + 0.5) * total / n_frames) for i in range(n_frames)}
    )
    fps = meta.fps
    out = []
    for i in idxs:
        t = (i / fps) if fps > 0 else 0.0
        out.append((i, t, decode_frame(meta, frames[i])))
    return meta, out


# ---------------------------------------------------------------------------
# Minimal writer (fixtures / round-trip)

def dib_frame(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → bottom-up BGR rows padded to 4 bytes."""
    h, w, _ = rgb.shape
    bgr = rgb[::-1, :, ::-1]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return rows.tobytes()


def _chunk(cc: bytes, body: bytes) -> bytes:
    out = cc + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi(
    payloads: list[bytes],
    width: int,
    height: int,
    fps: int = 4,
    compression: bytes | int = BI_RGB,
    bit_count: int = 24,
) -> bytes:
    """Minimal spec-valid AVI: one video stream, ``payloads`` as the
    frame chunks (``00db`` for BI_RGB, ``00dc`` otherwise).
    ``compression`` is ``BI_RGB`` or a 4-byte fourcc like ``b"MJPG"``."""
    comp = (
        compression
        if isinstance(compression, int)
        else struct.unpack("<I", compression)[0]
    )
    strh = (
        b"vids"
        + (b"MJPG" if comp else b"DIB ")
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(payloads), 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        height,
        1,
        bit_count,
        comp,
        0,
        0,
        0,
        0,
        0,
    )
    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(1e6 // fps),
        0,
        0,
        0,
        len(payloads),
        0,
        1,
        0,
        width,
        height,
        0,
        0,
        0,
        0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    tag = b"00db" if comp == BI_RGB else b"00dc"
    movi = _list(b"movi", b"".join(_chunk(tag, p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
