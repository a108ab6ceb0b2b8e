"""FLAC decoder tests.

The decoder is checked against a minimal FLAC *encoder* written here
from the public spec (RFC 9639), independently of the product module —
the ``jpegcodec``/``webpcodec`` strategy: its own MSB-first bit writer,
table-driven CRC-8/CRC-16 (the product uses bit-loop forms), UTF-8
frame-number coder, Rice coder with per-partition parameter search and
escape partitions, fixed + LPC predictors, wasted-bit packing, and all
three stereo decorrelation modes. FLAC is lossless, so every
round-trip must be **sample-exact**, never merely close.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from same_same_spark.pipeline.audiocodec import (
    UnsupportedAudioError,
    decode_audio,
    encode_wav,
)
from same_same_spark.pipeline.flaccodec import decode_flac

# --- spec-derived encoder (test-local) --------------------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_T8 = _crc_table(0x07, 8)
_T16 = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _T8[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _T16[(crc >> 8) ^ b]
    return crc


class _BW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def put_signed(self, val: int, nbits: int):
        self.put(val & ((1 << nbits) - 1), nbits)

    def put_unary(self, q: int):
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then the terminating 1

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


def _utf8_num(n: int) -> bytes:
    """FLAC's extended-UTF-8 coded number: a k-byte form carries
    (7-k) + 6(k-1) = 5k+1 payload bits (36 at k=7)."""
    if n < 0x80:
        return bytes([n])
    for k in range(2, 8):
        bits = 36 if k == 7 else 5 * k + 1
        if n < (1 << bits):
            break
    else:
        raise AssertionError("number exceeds 36 bits")
    cont = [0x80 | ((n >> (6 * i)) & 0x3F) for i in range(k - 1)]
    lead = ((0xFF << (8 - k)) & 0xFF) | (n >> (6 * (k - 1)))
    return bytes([lead]) + bytes(reversed(cont))


def _zigzag(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, 2 * x, -2 * x - 1).astype(np.int64)


def _rice_cost(u: np.ndarray, param: int) -> int:
    return int(np.sum(u >> param)) + len(u) * (param + 1)


def _write_residual(
    bw: _BW, resid: np.ndarray, order: int, block_size: int,
    porder: int = 0, method: int = 0, force_escape: bool = False,
):
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    bw.put(method, 2)
    bw.put(porder, 4)
    n_part = 1 << porder
    assert block_size % n_part == 0
    idx = 0
    for p in range(n_part):
        n = (block_size >> porder) - (order if p == 0 else 0)
        part = resid[idx : idx + n]
        idx += n
        if force_escape:
            raw = int(
                max((int(abs(v)).bit_length() + 1 for v in part), default=1)
            )
            bw.put(escape, pbits)
            bw.put(raw, 5)
            for v in part:
                bw.put_signed(int(v), raw)
            continue
        u = _zigzag(part)
        best = min(
            range(escape), key=lambda k: _rice_cost(u, k), default=0
        ) if len(u) else 0
        bw.put(best, pbits)
        for q in u:
            bw.put_unary(int(q) >> best)
            if best:
                bw.put(int(q) & ((1 << best) - 1), best)


def _write_subframe(
    bw: _BW, x: np.ndarray, bps: int, kind: str, wasted: int = 0,
    lpc=None, porder: int = 0, force_escape: bool = False,
):
    eff = bps - wasted
    if wasted:
        assert not np.any(x & ((1 << wasted) - 1)), "wasted bits must be 0"
        x = x >> wasted
    bw.put(0, 1)  # pad
    if kind == "constant":
        assert np.all(x == x[0])
        bw.put(0, 6)
    elif kind == "verbatim":
        bw.put(1, 6)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        bw.put(8 + order, 6)
    elif kind == "lpc":
        coefs, prec, shift = lpc
        order = len(coefs)
        bw.put(32 + order - 1, 6)
    else:
        raise AssertionError(kind)
    if wasted:
        bw.put(1, 1)
        bw.put_unary(wasted - 1)
    else:
        bw.put(0, 1)

    if kind == "constant":
        bw.put_signed(int(x[0]), eff)
        return
    if kind == "verbatim":
        for v in x:
            bw.put_signed(int(v), eff)
        return
    if kind.startswith("fixed"):
        coef_table = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                      4: [4, -6, 4, -1]}
        coefs_f = coef_table[order]
        for v in x[:order]:
            bw.put_signed(int(v), eff)
        resid = np.array(
            [
                int(x[i]) - sum(
                    c * int(x[i - 1 - j]) for j, c in enumerate(coefs_f)
                )
                for i in range(order, len(x))
            ],
            dtype=np.int64,
        )
        _write_residual(
            bw, resid, order, len(x), porder, force_escape=force_escape
        )
        return
    # LPC
    for v in x[:order]:
        bw.put_signed(int(v), eff)
    bw.put(prec - 1, 4)
    bw.put_signed(shift, 5)
    for c in coefs:
        assert -(1 << (prec - 1)) <= c < (1 << (prec - 1))
        bw.put_signed(int(c), prec)
    resid = np.array(
        [
            int(x[i])
            - (sum(int(coefs[j]) * int(x[i - 1 - j]) for j in range(order))
               >> shift)
            for i in range(order, len(x))
        ],
        dtype=np.int64,
    )
    _write_residual(bw, resid, order, len(x), porder,
                    force_escape=force_escape)


_BS_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
             1024: 10, 2048: 11, 4096: 12}
_SR_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
             22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}


def encode_flac(
    samples: np.ndarray, rate: int, bps: int = 16, block_size: int = 256,
    channel_mode: str = "indep", subframe: str = "fixed2",
    wasted: int = 0, porder: int = 0, lpc=None, force_escape: bool = False,
    sr_mode: str = "streaminfo", variable_blocking: bool = False,
    write_md5: bool = True,
) -> bytes:
    """Minimal spec-derived FLAC writer. ``samples`` is (n, ch) int."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    assert channel_mode == "indep" or ch == 2

    md5 = b"\x00" * 16
    if write_md5 and bps % 8 == 0:
        width = bps // 8
        if width in (1, 2, 4):
            raw = samples.astype(f"<i{width}").tobytes()
        else:
            le32 = samples.astype("<i4").tobytes()
            raw = b"".join(le32[i : i + 3] for i in range(0, len(le32), 4))
        md5 = hashlib.md5(raw).digest()

    si = _BW()
    si.put(block_size, 16)
    si.put(block_size, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(rate, 20)
    si.put(ch - 1, 3)
    si.put(bps - 1, 5)
    si.put(n, 36)
    streaminfo = si.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
    out += streaminfo

    frame_no = 0
    for start in range(0, n, block_size):
        blk = samples[start : start + block_size]
        bs = blk.shape[0]
        hdr = _BW()
        hdr.put(0b11111111111110, 14)
        hdr.put(0, 1)
        hdr.put(1 if variable_blocking else 0, 1)
        if bs in _BS_CODES and bs == block_size:
            bs_code, bs_extra = _BS_CODES[bs], None
        elif bs <= 256:
            bs_code, bs_extra = 6, (bs - 1, 8)
        else:
            bs_code, bs_extra = 7, (bs - 1, 16)
        hdr.put(bs_code, 4)
        if sr_mode == "streaminfo":
            sr_code, sr_extra = 0, None
        elif sr_mode == "code":
            sr_code, sr_extra = _SR_CODES[rate], None
        elif sr_mode == "khz8":
            assert rate % 1000 == 0 and rate // 1000 < 256
            sr_code, sr_extra = 12, (rate // 1000, 8)
        elif sr_mode == "hz16":
            sr_code, sr_extra = 13, (rate, 16)
        else:  # tens16
            assert rate % 10 == 0
            sr_code, sr_extra = 14, (rate // 10, 16)
        hdr.put(sr_code, 4)
        mode_code = {"indep": ch - 1, "ls": 8, "rs": 9, "ms": 10}[
            channel_mode
        ]
        hdr.put(mode_code, 4)
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        hdr.put(ss_code, 3)
        hdr.put(0, 1)
        num = start if variable_blocking else frame_no
        for b in _utf8_num(num):
            hdr.put(b, 8)
        if bs_extra:
            hdr.put(*bs_extra)
        if sr_extra:
            hdr.put(*sr_extra)
        hbytes = hdr.bytes()
        hbytes += bytes([_crc8(hbytes)])

        body = _BW()
        if channel_mode == "indep":
            chans = [(blk[:, c], bps) for c in range(ch)]
        elif channel_mode == "ls":
            chans = [(blk[:, 0], bps), (blk[:, 0] - blk[:, 1], bps + 1)]
        elif channel_mode == "rs":
            chans = [(blk[:, 0] - blk[:, 1], bps + 1), (blk[:, 1], bps)]
        else:  # ms
            side = blk[:, 0] - blk[:, 1]
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            chans = [(mid, bps), (side, bps + 1)]
        for cx, cbps in chans:
            kind = subframe
            if kind == "constant" and not np.all(cx == cx[0]):
                kind = "verbatim"
            _write_subframe(
                body, cx, cbps, kind, wasted=wasted, lpc=lpc,
                porder=porder, force_escape=force_escape,
            )
        body.align()
        frame = hbytes + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)


# --- tests -------------------------------------------------------------------


def _sig(n: int, ch: int = 2, seed: int = 0, amp: int = 12000) -> np.ndarray:
    rng = np.random.RandomState(seed)
    t = np.arange(n, dtype=np.float64)
    noise = max(amp // 60, 1)
    out = np.stack(
        [
            amp * np.sin(2 * np.pi * (0.01 + 0.013 * c) * t)
            + rng.randint(-noise, noise + 1, size=n)
            for c in range(ch)
        ],
        axis=1,
    )
    return np.rint(out).astype(np.int64)


@pytest.mark.parametrize("mode", ["indep", "ls", "rs", "ms"])
@pytest.mark.parametrize("kind", ["verbatim", "fixed0", "fixed1", "fixed2",
                                  "fixed3", "fixed4"])
def test_roundtrip_exact_all_modes_and_orders(mode, kind):
    x = _sig(600, seed=hash((mode, kind)) % 1000)
    data = encode_flac(x, 44100, block_size=256, channel_mode=mode,
                       subframe=kind)
    got, rate = decode_flac(data)
    assert rate == 44100
    assert np.array_equal(np.rint(got * 32768).astype(np.int64), x)


def test_constant_subframe_and_multichannel():
    x = np.tile(np.array([[5, -7, 120]]), (192, 1))
    data = encode_flac(x, 8000, block_size=192, subframe="constant")
    got, rate = decode_flac(data)
    assert rate == 8000
    assert np.array_equal(np.rint(got * 32768).astype(np.int64), x)


def test_lpc_roundtrip_exact():
    x = _sig(500, seed=3)
    lpc = ([1205, -415, 102], 12, 10)  # arbitrary quantized predictor
    data = encode_flac(x, 48000, block_size=250, subframe="lpc", lpc=lpc)
    got, _ = decode_flac(data)
    assert np.array_equal(np.rint(got * 32768).astype(np.int64), x)


def test_rice_partitions_and_escape():
    x = _sig(512, seed=4)
    for porder, esc in [(2, False), (3, False), (0, True), (2, True)]:
        data = encode_flac(x, 44100, block_size=256, subframe="fixed2",
                           porder=porder, force_escape=esc)
        got, _ = decode_flac(data)
        assert np.array_equal(np.rint(got * 32768).astype(np.int64), x)


def test_wasted_bits():
    x = (_sig(300, seed=5) >> 4) << 4  # low 4 bits zero in every sample
    data = encode_flac(x, 44100, block_size=150, subframe="fixed2",
                       wasted=4)
    got, _ = decode_flac(data)
    assert np.array_equal(np.rint(got * 32768).astype(np.int64), x)


@pytest.mark.parametrize("bps,amp", [(8, 100), (16, 12000), (24, 3000000)])
def test_bit_depths_md5_verified(bps, amp):
    x = _sig(320, seed=6, amp=amp)
    data = encode_flac(x, 32000, bps=bps, block_size=160,
                       subframe="fixed1")
    got, _ = decode_flac(data)
    assert np.array_equal(
        np.rint(got * float(1 << (bps - 1))).astype(np.int64), x
    )


def test_block_size_and_sample_rate_codes():
    x = _sig(1000, seed=7)
    # non-standard 8-bit and 16-bit end-of-header block sizes
    for bs in (200, 1000):
        got, _ = decode_flac(
            encode_flac(x, 44100, block_size=bs, subframe="fixed2")
        )
        assert np.array_equal(np.rint(got * 32768).astype(np.int64), x)
    # every sample-rate header form
    for rate, sr_mode in [
        (44100, "code"), (32000, "khz8"), (12345, "hz16"), (44100, "tens16")
    ]:
        got, r = decode_flac(
            encode_flac(x, rate, block_size=250, subframe="fixed2",
                        sr_mode=sr_mode)
        )
        assert r == rate
        assert np.array_equal(np.rint(got * 32768).astype(np.int64), x)


def test_variable_blocking_strategy():
    x = _sig(700, seed=8)
    data = encode_flac(x, 44100, block_size=256, subframe="fixed2",
                       variable_blocking=True)
    got, _ = decode_flac(data)
    assert np.array_equal(np.rint(got * 32768).astype(np.int64), x)


def test_utf8_number_boundaries():
    """Encoder/decoder agreement across every coded-number width band
    (the k-byte form switches at 5k+1 payload bits)."""
    from same_same_spark.pipeline.flaccodec import _BitReader, _read_utf8_number

    cases = [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFF, 0x1000, 0xFFFF,
             0x10000, 0x1FFFF, 0x20000, 0x1FFFFF, 0x200000, 0x3FFFFFF,
             0x4000000, 0x7FFFFFFF, (1 << 36) - 1]
    for n in cases:
        enc = _utf8_num(n)
        br = _BitReader(enc)
        assert _read_utf8_number(br) == n, hex(n)
        assert br.bytepos == len(enc), hex(n)


def test_long_stream_many_frames():
    """>2048 frames pushes the frame number into the 3-byte coded-
    number band (the regression the old test encoder would corrupt)."""
    x = np.arange(2100 * 16, dtype=np.int64)[:, None] % 251 - 125
    data = encode_flac(x, 8000, bps=16, block_size=16, subframe="fixed1")
    got, _ = decode_flac(data)
    assert np.array_equal(np.rint(got * 32768).astype(np.int64), x)


def test_corruption_detected():
    x = _sig(256, seed=9)
    data = bytearray(encode_flac(x, 44100, block_size=256,
                                 subframe="fixed2"))
    # flip one bit inside the frame body -> CRC-16 mismatch
    data[-10] ^= 0x40
    with pytest.raises(ValueError, match="CRC|sync|truncated|exceeds"):
        decode_flac(bytes(data))
    # wrong STREAMINFO MD5 with intact frames -> MD5 mismatch
    data2 = bytearray(encode_flac(x, 44100, block_size=256,
                                  subframe="fixed2"))
    md5_at = data2.find(b"fLaC") + 4 + 4 + 18
    data2[md5_at] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(data2))
    with pytest.raises(ValueError):
        decode_flac(b"fLaC" + b"\x00" * 3)


def test_decode_audio_dispatch_and_gates():
    x = _sig(128, seed=10)
    flac = encode_flac(x, 16000, block_size=128, subframe="fixed2")
    wav = encode_wav(x.astype(np.int16), 16000)
    sf, rf = decode_audio(flac)
    sw, rw = decode_audio(wav)
    assert rf == rw == 16000
    assert np.array_equal(sf, sw)  # same normalization contract
    with pytest.raises(UnsupportedAudioError, match="mp3"):
        decode_audio(b"\xff\xfb" + bytes(32))
    with pytest.raises(UnsupportedAudioError, match="ogg"):
        decode_audio(b"OggS" + bytes(32))


def test_decode_audio_features_mixed_formats(spark):
    """One DataFrame carrying a WAV clip and the SAME samples as FLAC:
    every feature column must agree exactly."""
    from same_same_spark.pipeline.multimodal import decode_audio_features

    x = _sig(400, seed=11)
    rows = [
        (0, bytearray(encode_wav(x.astype(np.int16), 22050))),
        (1, bytearray(encode_flac(x, 22050, block_size=200,
                                  subframe="fixed2"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in decode_audio_features(df).collect()}
    assert set(out) == {0, 1}
    for col in ("sample_rate", "n_channels", "n_frames", "duration_sec",
                "rms", "peak", "zcr"):
        assert out[0][col] == out[1][col], col


# ---------------------------------------------------------------------------
# hypothesis: round trip under randomized shapes/configs (with shrinking)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 700),
        ch=st.integers(1, 3),
        seed=st.integers(0, 10**6),
        bps=st.sampled_from([8, 16, 24]),
        block_size=st.sampled_from([16, 64, 192, 200, 256]),
        mode=st.sampled_from(["indep", "ls", "rs", "ms"]),
        kind=st.sampled_from(
            ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4"]
        ),
        porder=st.sampled_from([0, 1, 2]),
        force_escape=st.booleans(),
        wasted=st.sampled_from([0, 3]),
    )
    def test_hypothesis_round_trip(
        n, ch, seed, bps, block_size, mode, kind, porder, force_escape,
        wasted,
    ):
        from hypothesis import assume

        assume(mode == "indep" or ch == 2)
        # mid = (l+r)>>1 halves the common power-of-two factor, so the
        # single-`wasted` test encoder can't do wasted bits in ms mode
        # (real encoders pick wasted bits per subframe)
        assume(wasted == 0 or mode != "ms")
        # every frame's size must be divisible by 2^porder (the last
        # frame is the remainder) and larger than the fixed order
        order = int(kind[-1]) if kind.startswith("fixed") else 0
        last = n % block_size or block_size
        assume(all(
            b % (1 << porder) == 0 and (b >> porder) >= max(order, 1)
            for b in (block_size, last)
        ))
        amp = {8: 100, 16: 12000, 24: 3_000_000}[bps]
        x = _sig(n, ch=ch, seed=seed, amp=amp)
        if wasted:
            x = (x >> wasted) << wasted
        data = encode_flac(
            x, 44100, bps=bps, block_size=block_size, channel_mode=mode,
            subframe=kind, porder=porder, force_escape=force_escape,
            wasted=wasted,
        )
        got, rate = decode_flac(data)
        assert rate == 44100
        scale = float(1 << (bps - 1))
        assert np.array_equal(np.rint(got * scale).astype(np.int64), x)
