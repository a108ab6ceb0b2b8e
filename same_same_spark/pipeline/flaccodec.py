"""Pure-stdlib FLAC decoder (RFC 9639 / the public FLAC format spec).

Narrows the compressed-audio gate: the reference's media model lists
audio documents (``/root/reference/internal/storage/local/schema.go:95-159``)
and most archived lossless audio is FLAC; WAV/PCM already decodes in
:mod:`same_same_spark.pipeline.audiocodec`, this module adds the FLAC
bitstream so ``decode_audio_features`` covers both. MP3/OGG (lossy,
psychoacoustic synthesis) stay honestly gated.

Coverage — the full always-present decode path of the spec:

- STREAMINFO metadata block (+ skipping every other block type),
- frame headers: both blocking strategies, all block-size / sample-rate
  / sample-size codes (incl. end-of-header 8/16-bit block sizes and
  8/16-bit sample rates), UTF-8-coded frame/sample numbers, CRC-8,
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients, signed shift), wasted bits (unary-coded),
- residuals: 4-bit and 5-bit Rice partitions, escape partitions
  (raw ``n``-bit residuals), partition order 0-15,
- stereo decorrelation: left/side, right/side, mid/side (side channel
  carries the +1 bit),
- frame CRC-16 and (when present and byte-aligned) the STREAMINFO MD5
  over the decoded little-endian samples.

Everything derives from the public spec; the differential is a
spec-derived FLAC *encoder* written independently in
``tests/test_flaccodec.py`` (the ``jpegcodec``/``webpcodec`` strategy)
— FLAC is lossless, so every round-trip must be sample-exact, not
merely close.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from same_same_spark.pipeline.audiocodec import UnsupportedAudioError

__all__ = ["decode_flac"]

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

# frame-header block-size code -> size (None = coded later / reserved)
_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 (frame header)."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 (frame)."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = (
                (crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1
            ) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader over a bytes object."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    @property
    def bytepos(self) -> int:
        return self.bitpos // 8

    def aligned(self) -> bool:
        return self.bitpos % 8 == 0

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        end = self.bitpos + nbits
        if end > len(self.data) * 8:
            raise ValueError("flac: truncated stream")
        first = self.bitpos // 8
        last = (end - 1) // 8
        chunk = int.from_bytes(self.data[first : last + 1], "big")
        chunk >>= (last + 1) * 8 - end
        self.bitpos = end
        return chunk & ((1 << nbits) - 1)

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def read_unary(self) -> int:
        """Count 0 bits up to the terminating 1 bit."""
        n = 0
        data, bitpos = self.data, self.bitpos
        total = len(data) * 8
        while True:
            if bitpos >= total:
                raise ValueError("flac: truncated unary code")
            byte = data[bitpos // 8]
            rem = 8 - bitpos % 8
            window = byte & ((1 << rem) - 1)
            if window == 0:
                n += rem
                bitpos += rem
                continue
            lead = rem - window.bit_length()
            n += lead
            bitpos += lead + 1
            self.bitpos = bitpos
            return n


def _read_utf8_number(br: _BitReader) -> int:
    """FLAC's extended UTF-8-style coded number (up to 36 bits)."""
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x40
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 1 or nbytes > 6:
        raise ValueError("flac: bad coded number")
    val = first & (mask - 1)
    for _ in range(nbytes):
        cont = br.read(8)
        if cont >> 6 != 0b10:
            raise ValueError("flac: bad coded number continuation")
        val = (val << 6) | (cont & 0x3F)
    return val


def _read_residual(br: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    n_part = 1 << porder
    if block_size % n_part:
        raise ValueError("flac: block size not divisible by partitions")
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for p in range(n_part):
        n = (block_size >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac: partition smaller than order")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(n):
                out[idx + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out[idx + i] = (u >> 1) ^ -(u & 1)  # unfold zigzag
        idx += n
    return out


def _read_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("flac: wasted bits exceed sample size")

    if sf_type == 0:  # CONSTANT
        out = np.full(block_size, br.read_signed(eff), dtype=np.int64)
    elif sf_type == 1:  # VERBATIM
        out = np.fromiter(
            (br.read_signed(eff) for _ in range(block_size)),
            dtype=np.int64, count=block_size,
        )
    elif 8 <= sf_type <= 12:  # FIXED, order 0-4
        order = sf_type - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        if order == 0:
            out[:] = resid
        else:
            for i in range(order, block_size):
                pred = 0
                for j, c in enumerate(coefs):
                    pred += c * out[i - 1 - j]
                out[i] = resid[i - order] + pred
    elif sf_type >= 32:  # LPC, order 1-32
        order = sf_type - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            pred = 0
            for j in range(order):
                pred += coefs[j] * out[i - 1 - j]
            out[i] = resid[i - order] + (pred >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {sf_type}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC blob → ``(samples (n, ch) float64, rate)``.

    Samples are normalized by ``2^(bps-1)`` exactly like
    :func:`~same_same_spark.pipeline.audiocodec.decode_wav`, so the
    downstream feature math is codec-agnostic.
    """
    if data[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC marker")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        head = data[pos]
        (length,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise ValueError("flac: truncated metadata block")
        if head & 0x7F == 0:  # STREAMINFO
            if length != 34:
                raise ValueError("flac: bad STREAMINFO length")
            br = _BitReader(body)
            br.read(16)  # min block size
            br.read(16)  # max block size
            br.read(24)  # min frame size
            br.read(24)  # max frame size
            rate = br.read(20)
            n_channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5 = body[18:34]
            info = (rate, n_channels, bps, total, md5)
        pos += 4 + length
        if head & 0x80:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    rate, n_channels, bps, total, md5 = info
    if rate == 0:
        raise ValueError("flac: zero sample rate")

    chunks: list[np.ndarray] = []
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        if br.read(1):
            raise ValueError("flac: reserved header bit set")
        br.read(1)  # blocking strategy (number semantics only)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("flac: reserved header bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 0:
            frame_rate = rate
        elif sr_code == 12:
            frame_rate = br.read(8) * 1000
        elif sr_code == 13:
            frame_rate = br.read(16)
        elif sr_code == 14:
            frame_rate = br.read(16) * 10
        elif sr_code == 15:
            raise ValueError("flac: invalid sample rate code")
        else:
            frame_rate = _SAMPLE_RATES[sr_code]
        if frame_rate != rate:
            raise ValueError("flac: frame sample rate != STREAMINFO")
        if ss_code == 0:
            frame_bps = bps
        elif ss_code == 3:
            raise ValueError("flac: reserved sample size code")
        else:
            frame_bps = _SAMPLE_SIZES[ss_code]
        if frame_bps != bps:
            raise ValueError("flac: frame sample size != STREAMINFO")
        if ch_code < 8:
            frame_channels = ch_code + 1
            side = None
        elif ch_code in (8, 9, 10):
            frame_channels = 2
            side = {8: 1, 9: 0, 10: 1}[ch_code]
        else:
            raise ValueError("flac: reserved channel assignment")
        if frame_channels != n_channels:
            raise ValueError("flac: frame channels != STREAMINFO")
        # CRC-8 covers sync..crc byte exclusive; it ends byte-aligned
        if not br.aligned():
            raise ValueError("flac: misaligned frame header")
        if _crc8(data[pos : br.bytepos]) != br.read(8):
            raise ValueError("flac: frame header CRC mismatch")

        subs = []
        for ch in range(frame_channels):
            ch_bps = frame_bps + (1 if side == ch else 0)
            subs.append(_read_subframe(br, block_size, ch_bps))
        br.align()
        crc_expect = _crc16(data[pos : br.bytepos])
        if crc_expect != br.read(16):
            raise ValueError("flac: frame CRC mismatch")
        pos = br.bytepos

        if ch_code == 8:  # left/side
            left = subs[0]
            right = left - subs[1]
            frame = np.stack([left, right], axis=1)
        elif ch_code == 9:  # right/side
            right = subs[1]
            frame = np.stack([right + subs[0], right], axis=1)
        elif ch_code == 10:  # mid/side
            side_s = subs[1]
            mid = (subs[0] << 1) | (side_s & 1)
            frame = np.stack([(mid + side_s) >> 1, (mid - side_s) >> 1],
                             axis=1)
        else:
            frame = np.stack(subs, axis=1)
        chunks.append(frame)
        got += block_size

    samples = (
        np.concatenate(chunks, axis=0)
        if chunks
        else np.empty((0, n_channels), dtype=np.int64)
    )
    if total:
        if samples.shape[0] < total:
            raise ValueError("flac: fewer samples than STREAMINFO total")
        samples = samples[:total]
    limit = 1 << (bps - 1)
    if samples.size and (samples.min() < -limit or samples.max() >= limit):
        raise ValueError("flac: sample exceeds declared bit depth")
    if md5 != b"\x00" * 16 and bps % 8 == 0:
        width = bps // 8
        if width in (1, 2, 4):
            raw = samples.astype(f"<i{width}").tobytes()
        else:  # 24-bit: low 3 bytes of each int32, little-endian
            le32 = samples.astype("<i4").tobytes()
            raw = b"".join(
                le32[i : i + 3] for i in range(0, len(le32), 4)
            )
        if hashlib.md5(raw).digest() != md5:
            raise ValueError("flac: MD5 mismatch")
    return samples.astype(np.float64) / float(limit), rate
