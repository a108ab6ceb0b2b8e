"""Pure-stdlib WAV (RIFF) codec + deterministic audio features.

Closes the multimodal audio gap the same way ``imagecodec`` closed the
image gap: the reference's media model carries audio metadata
(``/root/reference/internal/storage/local/schema.go:95-159`` —
duration, sample rate) but this container has no audio libraries, so
the decode step used to be stubbed. WAV/PCM is fully specified (RIFF
chunks + raw samples, no compression) and needs only ``struct`` —
the decode can be real here. FLAC (lossless) decodes in
:mod:`same_same_spark.pipeline.flaccodec` via :func:`decode_audio`'s
sniff dispatch; G.711 a-law/mu-law expand in closed form below.
Lossy containers (MP3/OGG) and ADPCM-in-WAV stay honestly gated
behind :class:`UnsupportedAudioError` (their Huffman/step tables are
large spec constants that cannot be re-derived from memory — same
rationale as the lossy-VP8 gate in ``webpcodec``).

Contracts:

- :func:`decode_wav` handles PCM 8 (unsigned) / 16 / 24 / 32-bit
  (signed little-endian), IEEE float 32/64 and ITU-T G.711 a-law /
  mu-law telephony bytes (format tags 0x0006/0x0007 — closed-form
  segment expansion, no lookup tables), any channel count,
  ``WAVE_FORMAT_EXTENSIBLE`` wrappers, chunk padding to even offsets
  and unknown chunks (LIST/fact/cue) before or after ``data``.
  Output is ``(samples, sample_rate)`` with samples shaped
  ``(n_frames, n_channels)`` float64 normalized by ``2^(bits-1)``
  (so a full-scale negative PCM sample is exactly -1.0); float input
  passes through unscaled.
- :func:`encode_wav` writes the canonical 44-byte-header PCM16 file
  (the fixture/round-trip path; int16 in, bytes out).
- :func:`audio_features` computes deterministic per-clip scalars over
  the mono mix (mean across channels): frame/channel counts, duration,
  RMS, absolute peak and zero-crossing rate — each SQL-expressible, so
  the encode→decode→features path has a DuckDB oracle twin
  (``__spark_entry__`` entry ``audio_features``).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "UnsupportedAudioError",
    "sniff_audio",
    "decode_audio",
    "decode_wav",
    "encode_wav",
    "audio_features",
    "alaw_expand",
    "mulaw_expand",
]

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_ALAW = 0x0006
WAVE_FORMAT_MULAW = 0x0007
WAVE_FORMAT_EXTENSIBLE = 0xFFFE


class UnsupportedAudioError(NotImplementedError):
    """Compressed audio these stdlib codecs genuinely cannot decode
    (MP3, OGG, ADPCM — formats whose Huffman/step tables are large
    baked spec constants)."""


def mulaw_expand(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 mu-law byte → linear PCM on the 16-bit scale.

    Closed-form segment expansion (no lookup table): the transmitted
    byte is bit-inverted ``sign(1) | segment(3) | mantissa(4)``; the
    decoded magnitude is the midpoint of the encoder's quantization
    interval, ``((mant·8 + 0x84) << seg) − 0x84`` with the spec's bias
    of 0x84 (= 33 on the 14-bit scale × 4).  Range ±32124; the two
    codes 0xFF / 0x7F both decode to exactly 0 (mu-law's ±0).
    """
    u = (~np.asarray(codes, dtype=np.uint8).astype(np.int64)) & 0xFF
    seg = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << seg) - 0x84
    return np.where(u & 0x80, -mag, mag)


def alaw_expand(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 a-law byte → linear PCM on the 16-bit scale.

    The transmitted byte has even bits inverted (XOR 0x55); after
    undoing that it is ``sign(1) | segment(3) | mantissa(4)`` where the
    sign bit is **1 for non-negative** values (A-law convention, the
    opposite of mu-law).  Segment 0 is linear (step 2 on the 13-bit
    scale, decode midpoint ``2·mant + 1``); segments 1-7 decode to
    ``(2·mant + 33) << (seg − 1)``, all ×8 to sit on the 16-bit scale.
    Range ±[8, 32256] — a-law has no exact zero.
    """
    a = (np.asarray(codes, dtype=np.uint8).astype(np.int64)) ^ 0x55
    seg = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(
        seg == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(seg - 1, 0),
    )
    return np.where(a & 0x80, mag, -mag)


def sniff_audio(data: bytes) -> str:
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:3] == b"ID3" or data[:2] in (b"\xff\xfb", b"\xff\xf3", b"\xff\xf2"):
        return "mp3"
    if data[:4] == b"OggS":
        return "ogg"
    if data[:4] == b"fLaC":
        return "flac"
    return "unknown"


def _iter_chunks(data: bytes):
    """Yield (fourcc, payload) for each RIFF sub-chunk, honoring the
    spec's even-offset padding byte after odd-sized chunks."""
    pos = 12
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    while pos + 8 <= end:
        cc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + size]
        if len(payload) < size:
            raise ValueError("wav: truncated chunk " + cc.decode("latin1"))
        yield cc, payload
        pos += 8 + size + (size & 1)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE blob → ``(samples (n, ch) float64, rate)``."""
    if sniff_audio(data) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    pcm = None
    for cc, payload in _iter_chunks(data):
        if cc == b"fmt ":
            fmt = payload
        elif cc == b"data" and pcm is None:
            pcm = payload
    if fmt is None or pcm is None:
        raise ValueError("wav: missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("wav: short fmt chunk")
    audio_format, n_ch, rate, _br, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_format == WAVE_FORMAT_EXTENSIBLE:
        # cbSize(2) + valid_bits(2) + channel_mask(4) + GUID: the
        # first two GUID bytes are the real format tag
        if len(fmt) < 26:
            raise ValueError("wav: short extensible fmt chunk")
        (audio_format,) = struct.unpack_from("<H", fmt, 24)
    if n_ch < 1 or rate < 1:
        raise ValueError("wav: invalid channel count / sample rate")
    if audio_format == WAVE_FORMAT_PCM:
        if bits == 8:
            raw = np.frombuffer(pcm, dtype=np.uint8).astype(np.float64)
            flat = (raw - 128.0) / 128.0
        elif bits == 16:
            flat = (
                np.frombuffer(pcm[: len(pcm) & ~1], dtype="<i2").astype(
                    np.float64
                )
                / 32768.0
            )
        elif bits == 24:
            usable = len(pcm) - len(pcm) % 3
            b = np.frombuffer(pcm[:usable], dtype=np.uint8).reshape(-1, 3)
            v = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            flat = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            flat = (
                np.frombuffer(pcm[: len(pcm) & ~3], dtype="<i4").astype(
                    np.float64
                )
                / float(1 << 31)
            )
        else:
            raise UnsupportedAudioError(f"wav: {bits}-bit PCM unsupported")
    elif audio_format == WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            flat = np.frombuffer(pcm[: len(pcm) & ~3], dtype="<f4").astype(
                np.float64
            )
        elif bits == 64:
            flat = np.frombuffer(pcm[: len(pcm) & ~7], dtype="<f8").astype(
                np.float64
            )
        else:
            raise UnsupportedAudioError(f"wav: {bits}-bit float unsupported")
    elif audio_format in (WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW):
        if bits not in (0, 8):
            raise UnsupportedAudioError(f"wav: {bits}-bit G.711 unsupported")
        codes = np.frombuffer(pcm, dtype=np.uint8)
        expand = (
            alaw_expand if audio_format == WAVE_FORMAT_ALAW else mulaw_expand
        )
        flat = expand(codes).astype(np.float64) / 32768.0
    else:
        raise UnsupportedAudioError(
            f"wav: format tag 0x{audio_format:04x} (non-PCM) unsupported"
        )
    n_frames = flat.shape[0] // n_ch
    return flat[: n_frames * n_ch].reshape(n_frames, n_ch), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Canonical 44-byte-header PCM16 writer. ``samples`` is int16,
    shaped ``(n,)`` (mono) or ``(n, ch)``."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n_frames, n_ch = arr.shape
    pcm = arr.reshape(-1).tobytes()
    block_align = 2 * n_ch
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH",
        16,
        WAVE_FORMAT_PCM,
        n_ch,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Sniff-and-decode: WAV via :func:`decode_wav`, FLAC via
    :mod:`same_same_spark.pipeline.flaccodec` (both return samples
    normalized by ``2^(bits-1)``); MP3/OGG stay gated."""
    kind = sniff_audio(data)
    if kind == "wav":
        return decode_wav(data)
    if kind == "flac":
        from same_same_spark.pipeline.flaccodec import decode_flac

        return decode_flac(data)
    raise UnsupportedAudioError(f"audio: {kind} unsupported")


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Deterministic per-clip scalars over the mono mix (channel mean):

    - ``n_frames`` / ``n_channels`` / ``sample_rate`` / ``duration_sec``
    - ``rms`` = sqrt(mean(x²)), ``peak`` = max |x|,
    - ``zcr`` = sign changes (strict ``x[i-1]·x[i] < 0``) / (n−1).

    All floats rounded to 6dp — the cross-engine convention.
    """
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n, ch = arr.shape
    mono = arr.mean(axis=1)
    if n == 0:
        rms = peak = zcr = 0.0
        dur = 0.0
    else:
        rms = float(np.sqrt(np.mean(mono * mono)))
        peak = float(np.max(np.abs(mono)))
        zcr = (
            float(np.count_nonzero(mono[:-1] * mono[1:] < 0)) / (n - 1)
            if n > 1
            else 0.0
        )
        dur = n / float(sample_rate)
    return {
        "n_frames": int(n),
        "n_channels": int(ch),
        "sample_rate": int(sample_rate),
        "duration_sec": round(dur, 6),
        "rms": round(rms, 6),
        "peak": round(peak, 6),
        "zcr": round(zcr, 6),
    }


def audio_coverage_kind(data) -> str:
    """Total classification for mixed binary corpora — quantifies how
    much of a corpus the audio gates actually bite (``wav-*`` and
    ``flac`` rows DECODE here; ``mp3`` / ``ogg-*`` raise in
    :func:`decode_audio` — their huffman/codebook tables aren't
    reproducible from public memory with a catchable differential, the
    lossy-VP8 ruling). Container/header walk only, never raises:

    - ``wav-pcm`` / ``wav-float`` / ``wav-alaw`` / ``wav-mulaw``
      (decodable), ``wav-fmt-0x<tag>`` (other format tags, gated),
      ``wav-no-fmt`` (malformed);
    - ``flac``;
    - ``mp3`` (ID3 tag or MPEG frame sync);
    - ``ogg-vorbis`` / ``ogg-opus`` / ``ogg-flac`` / ``ogg-other``
      (first-page codec id);
    - ``not-audio`` for anything else (including NULL/empty).
    """
    if not data:
        return "not-audio"
    b = bytes(data)
    kind = sniff_audio(b) if len(b) >= 12 else "unknown"
    if kind == "wav":
        try:
            for cc, payload in _iter_chunks(b):
                if cc != b"fmt ":
                    continue
                (tag,) = struct.unpack_from("<H", payload, 0)
                if tag == WAVE_FORMAT_EXTENSIBLE and len(payload) >= 26:
                    (tag,) = struct.unpack_from("<H", payload, 24)
                return {
                    WAVE_FORMAT_PCM: "wav-pcm",
                    WAVE_FORMAT_IEEE_FLOAT: "wav-float",
                    WAVE_FORMAT_ALAW: "wav-alaw",
                    WAVE_FORMAT_MULAW: "wav-mulaw",
                }.get(tag, f"wav-fmt-0x{tag:04x}")
        except (ValueError, struct.error):
            return "wav-no-fmt"
        return "wav-no-fmt"
    if kind == "flac":
        return "flac"
    if kind == "mp3":
        return "mp3"
    if kind == "ogg":
        # first page payload starts after the 27-byte header + the
        # segment table; codec magic sits at the packet head
        try:
            nsegs = b[26]
            head = b[27 + nsegs : 27 + nsegs + 16]
        except IndexError:
            return "ogg-other"
        if head[:7] == b"\x01vorbis":
            return "ogg-vorbis"
        if head[:8] == b"OpusHead":
            return "ogg-opus"
        if head[:5] == b"\x7fFLAC":
            return "ogg-flac"
        return "ogg-other"
    return "not-audio"


def audio_coverage_stats(
    df, content_col: str = "content", kind_col: str = "kind"
):
    """Per-kind counts over a binary column (the
    :func:`~same_same_spark.pipeline.webpcodec.webp_coverage_stats`
    shape): Arrow-batched header classification, then one map-side-
    combined groupBy on the low-cardinality kind — corpus-scan-bound
    at any scale."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _kind(s):
        return pd.Series(s.map(audio_coverage_kind))

    return (
        df.select(_kind(F.col(content_col)).alias(kind_col))
        .groupBy(kind_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
