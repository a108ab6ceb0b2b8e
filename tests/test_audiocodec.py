"""WAV codec + audio features (pipeline/audiocodec + multimodal).

Differential strategy mirrors the image codecs: decode bytes written
by an INDEPENDENT writer (Python's stdlib ``wave`` module) plus
hand-built headers for the variants ``wave`` can't write (float,
extensible), and pin features to closed forms.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from same_same_spark.pipeline.audiocodec import (
    UnsupportedAudioError,
    alaw_expand,
    audio_features,
    decode_wav,
    encode_wav,
    mulaw_expand,
    sniff_audio,
)


def _wave_write(frames: bytes, n_ch: int, sampwidth: int, rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def test_roundtrip_mono_and_stereo():
    mono = np.array([0, 100, -100, 32767, -32768, 7], dtype="<i2")
    s, r = decode_wav(encode_wav(mono, 8000))
    assert r == 8000 and s.shape == (6, 1)
    assert np.array_equal(s[:, 0] * 32768.0, mono.astype(np.float64))

    st = np.array([[1, -1], [1000, -1000], [32767, -32768]], dtype="<i2")
    s2, r2 = decode_wav(encode_wav(st, 44100))
    assert r2 == 44100 and s2.shape == (3, 2)
    assert np.array_equal(s2 * 32768.0, st.astype(np.float64))


def test_decode_matches_stdlib_wave_writer():
    # 16-bit stereo via the independent stdlib writer
    st = np.array([[0, 5], [-7, 9], [100, -100], [2, 2]], dtype="<i2")
    data = _wave_write(st.reshape(-1).tobytes(), 2, 2, 16000)
    s, r = decode_wav(data)
    assert r == 16000
    assert np.array_equal(s * 32768.0, st.astype(np.float64))

    # 8-bit unsigned PCM
    u8 = np.array([0, 128, 255, 64], dtype=np.uint8)
    s8, _ = decode_wav(_wave_write(u8.tobytes(), 1, 1, 8000))
    assert np.array_equal(
        s8[:, 0], (u8.astype(np.float64) - 128.0) / 128.0
    )

    # 24-bit PCM (wave writes raw little-endian 3-byte frames)
    vals = [0, 1, -1, (1 << 23) - 1, -(1 << 23), 123456]
    frames = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    s24, _ = decode_wav(_wave_write(frames, 1, 3, 48000))
    assert np.array_equal(
        s24[:, 0] * float(1 << 23), np.array(vals, dtype=np.float64)
    )


def _fmt_chunk(tag: int, n_ch: int, rate: int, bits: int, extra: bytes = b"") -> bytes:
    block = n_ch * bits // 8
    body = struct.pack(
        "<HHIIHH", tag, n_ch, rate, rate * block, block, bits
    ) + extra
    return b"fmt " + struct.pack("<I", len(body)) + body


def _riff(*chunks: bytes) -> bytes:
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _data_chunk(payload: bytes) -> bytes:
    out = b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def test_float32_float64_and_extensible():
    f32 = np.array([0.5, -0.25, 1.0, -1.0], dtype="<f4")
    data = _riff(_fmt_chunk(3, 1, 8000, 32), _data_chunk(f32.tobytes()))
    s, _ = decode_wav(data)
    assert np.array_equal(s[:, 0], f32.astype(np.float64))

    f64 = np.array([0.125, -0.0625], dtype="<f8")
    data = _riff(_fmt_chunk(3, 1, 8000, 64), _data_chunk(f64.tobytes()))
    s, _ = decode_wav(data)
    assert np.array_equal(s[:, 0], f64)

    # WAVE_FORMAT_EXTENSIBLE wrapping PCM16: cbSize + valid bits +
    # channel mask + GUID whose first two bytes are the format tag
    guid = struct.pack("<H", 1) + b"\x00\x00" + bytes(12)
    extra = struct.pack("<HHI", 22, 16, 0x3) + guid
    pcm = np.array([100, -100], dtype="<i2")
    data = _riff(
        _fmt_chunk(0xFFFE, 1, 8000, 16, extra), _data_chunk(pcm.tobytes())
    )
    s, _ = decode_wav(data)
    assert np.array_equal(s[:, 0] * 32768.0, pcm.astype(np.float64))


def test_unknown_chunks_and_odd_padding():
    pcm = np.array([7, -7, 7], dtype="<i2")
    odd = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    data = _riff(
        odd, _fmt_chunk(1, 1, 8000, 16), _data_chunk(pcm.tobytes())
    )
    s, r = decode_wav(data)
    assert r == 8000 and np.array_equal(
        s[:, 0] * 32768.0, pcm.astype(np.float64)
    )


# --------------------------------------------------------------------
# G.711 a-law / mu-law — independent spec-derived COMPRESSORS (the
# codec differential strategy: product ships the expander, the test
# transcribes the encoder from the G.711 segment tables and the two
# must agree over the whole 16-bit domain).
# --------------------------------------------------------------------


def _mulaw_compress(x: int) -> int:
    """G.711 mu-law compressor, 16-bit domain: bias 132, clip 32635,
    8 doubling segments of 16 steps each, transmitted bit-inverted."""
    sign = 0x80 if x < 0 else 0
    m = min(-x if x < 0 else x, 32635) + 132
    seg = 0
    while seg < 7 and m >= 256 << seg:
        seg += 1
    mant = (m >> (seg + 3)) & 0x0F
    return ~(sign | (seg << 4) | mant) & 0xFF


def _alaw_compress(x: int) -> int:
    """G.711 a-law compressor, 13-bit domain per the spec tables:
    segment 0 linear (step 2), segments 1-7 doubling; sign bit 1 for
    non-negative; even bits inverted (XOR 0x55) on the wire."""
    sign = 0x80 if x >= 0 else 0
    m = (x if x >= 0 else -x - 1) >> 3
    if m < 32:
        seg, mant = 0, m >> 1
    else:
        seg = m.bit_length() - 5
        mant = (m >> seg) & 0x0F
    return (sign | (seg << 4) | mant) ^ 0x55


def test_g711_known_endpoints():
    # Public G.711 anchors: mu-law has two zeros (0xFF/0x7F) and range
    # +-32124; a-law has no zero, min magnitude 8 at 0x55/0xD5, range
    # +-32256 at 0x2A/0xAA.
    assert mulaw_expand(np.array([0xFF]))[0] == 0
    assert mulaw_expand(np.array([0x7F]))[0] == 0
    assert mulaw_expand(np.array([0x80]))[0] == 32124
    assert mulaw_expand(np.array([0x00]))[0] == -32124
    assert alaw_expand(np.array([0xD5]))[0] == 8
    assert alaw_expand(np.array([0x55]))[0] == -8
    assert alaw_expand(np.array([0xAA]))[0] == 32256
    assert alaw_expand(np.array([0x2A]))[0] == -32256
    # sign bit (bit 7 of the pre-inversion code; untouched by XOR 0x55)
    # mirrors the decode exactly for every code
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        mulaw_expand(codes), -mulaw_expand(codes ^ 0x80)
    )
    assert np.array_equal(alaw_expand(codes), -alaw_expand(codes ^ 0x80))


def test_g711_differential_full_domain():
    """decode(encode(x)) must land on the midpoint of x's quantization
    cell for EVERY 16-bit input, and re-encoding the decoded value must
    reproduce the decode (codec idempotence)."""
    xs = np.arange(-32768, 32768, dtype=np.int64)

    mu_codes = np.array([_mulaw_compress(int(v)) for v in xs], dtype=np.uint8)
    mu_dec = mulaw_expand(mu_codes)
    seg = ((~mu_codes.astype(np.int64)) >> 4) & 0x07
    # midpoint distance <= half cell width (cell = 8<<seg in the biased
    # domain); clipped inputs (|x| > 32635) excepted
    live = np.abs(xs) <= 32635
    assert np.all(np.abs(mu_dec - xs)[live] <= (4 << seg)[live])
    # idempotence at the value level (covers mu-law's two zeros, where
    # -0 re-encodes as +0's code)
    mu_re = np.array(
        [_mulaw_compress(int(v)) for v in mu_dec], dtype=np.uint8
    )
    assert np.array_equal(mulaw_expand(mu_re), mu_dec)
    # decode is monotone non-decreasing in the input
    assert np.all(np.diff(mu_dec) >= 0)

    al_codes = np.array([_alaw_compress(int(v)) for v in xs], dtype=np.uint8)
    al_dec = alaw_expand(al_codes)
    seg = ((al_codes.astype(np.int64) ^ 0x55) >> 4) & 0x07
    # 16-bit cell width is 16<<max(seg-1,0); +-1 slack for the spec's
    # two's-complement negative fold (-x-1)
    half = (8 << np.maximum(seg - 1, 0)) + 1
    assert np.all(np.abs(al_dec - xs) <= half)
    al_re = np.array(
        [_alaw_compress(int(v)) for v in al_dec], dtype=np.uint8
    )
    assert np.array_equal(al_re, al_codes)
    assert np.all(np.diff(al_dec) >= 0)
    # every one of the 256 a-law codes decodes to a distinct value;
    # mu-law collapses exactly the two zero codes
    assert len(set(alaw_expand(np.arange(256)).tolist())) == 256
    assert len(set(mulaw_expand(np.arange(256)).tolist())) == 255


def test_g711_wav_plumbing():
    # mu-law mono WAV: 8-bit codes, format tag 7
    codes = bytes([0xFF, 0x80, 0x00, 0x7F, 0xD5, 0x2A])
    data = _riff(_fmt_chunk(7, 1, 8000, 8), _data_chunk(codes))
    s, r = decode_wav(data)
    assert r == 8000 and s.shape == (6, 1)
    want = mulaw_expand(np.frombuffer(codes, np.uint8)) / 32768.0
    assert np.array_equal(s[:, 0], want)

    # a-law stereo, and EXTENSIBLE wrapping of the a-law tag
    data = _riff(_fmt_chunk(6, 2, 16000, 8), _data_chunk(codes))
    s2, r2 = decode_wav(data)
    assert r2 == 16000 and s2.shape == (3, 2)
    want2 = (alaw_expand(np.frombuffer(codes, np.uint8)) / 32768.0).reshape(
        3, 2
    )
    assert np.array_equal(s2, want2)

    guid = struct.pack("<H", 6) + b"\x00\x00" + bytes(12)
    extra = struct.pack("<HHI", 22, 8, 0x3) + guid
    data = _riff(_fmt_chunk(0xFFFE, 1, 8000, 8, extra), _data_chunk(codes))
    s3, _ = decode_wav(data)
    assert np.array_equal(
        s3[:, 0], alaw_expand(np.frombuffer(codes, np.uint8)) / 32768.0
    )

    # features flow through the normal path
    f = audio_features(s, r)
    assert f["n_frames"] == 6 and f["sample_rate"] == 8000


def test_gates_and_sniff():
    assert sniff_audio(b"ID3\x04" + bytes(10)) == "mp3"
    assert sniff_audio(b"OggS" + bytes(10)) == "ogg"
    assert sniff_audio(b"fLaC" + bytes(10)) == "flac"
    assert sniff_audio(b"garbage") == "unknown"
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")
    # ADPCM (format tag 2) is honestly gated
    pcm = bytes(8)
    data = _riff(_fmt_chunk(2, 1, 8000, 16), _data_chunk(pcm))
    with pytest.raises(UnsupportedAudioError):
        decode_wav(data)
    # truncated chunk raises, not garbage output
    with pytest.raises(ValueError):
        decode_wav(_riff(b"fmt " + struct.pack("<I", 99) + b"\x00"))


def test_features_closed_forms():
    # square wave at amplitude a: rms == peak == a
    sq = np.array(([12000] * 4 + [-12000] * 4) * 8, dtype="<i2")
    s, _ = decode_wav(encode_wav(sq, 8000))
    f = audio_features(s, 8000)
    assert f["rms"] == f["peak"] == round(12000 / 32768.0, 6)
    assert f["n_frames"] == 64 and f["duration_sec"] == round(64 / 8000, 6)
    # 16 runs of 4 samples → 15 run boundaries, each a sign change
    assert f["zcr"] == round(15 / 63, 6)

    # silence: everything zero
    z = audio_features(np.zeros((10, 1)), 8000)
    assert z["rms"] == z["peak"] == z["zcr"] == 0.0

    # single sample: zcr degenerate 0
    one = audio_features(np.array([[0.5]]), 8000)
    assert one["zcr"] == 0.0 and one["peak"] == 0.5

    # stereo mixes to mono mean before features
    st = np.array([[1.0, -1.0], [0.5, 0.5]])
    f2 = audio_features(st, 8000)
    assert f2["n_channels"] == 2 and f2["peak"] == 0.5 and f2["rms"] == round(
        np.sqrt((0.0 + 0.25) / 2), 6
    )


def test_decode_audio_features_dataframe(spark):
    from same_same_spark.pipeline.multimodal import decode_audio_features

    clips = [
        (1, encode_wav(np.array([100, -100, 100], dtype="<i2"), 8000)),
        (2, encode_wav(np.zeros(5, dtype="<i2"), 16000)),
    ]
    df = spark.createDataFrame(clips, "doc_id LONG, content BINARY")
    rows = {r["doc_id"]: r for r in decode_audio_features(df).collect()}
    assert rows[1]["sample_rate"] == 8000 and rows[1]["n_frames"] == 3
    assert rows[1]["zcr"] == 1.0  # every adjacent pair flips sign
    assert rows[2]["rms"] == 0.0 and rows[2]["duration_sec"] == round(
        5 / 16000, 6
    )


# ------------------------------------------------------------------
# container-level coverage classification (audio_coverage_stats)
# ------------------------------------------------------------------

def _wav_with_fmt(tag: int, extensible: bool = False) -> bytes:
    import struct as _s

    if extensible:
        sub = _s.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        # cbSize, valid bits, channel mask, then the GUID whose first
        # two bytes are the real format tag
        sub += _s.pack("<HHI", 22, 16, 0) + _s.pack("<H", tag) + bytes(14)
    else:
        sub = _s.pack("<HHIIHH", tag, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + _s.pack("<I", len(sub)) + sub
    return b"RIFF" + _s.pack("<I", 4 + len(body) - 4) + body


def _ogg_page(payload: bytes) -> bytes:
    return b"OggS" + bytes(22) + bytes([1]) + bytes([len(payload)]) + payload


def test_audio_coverage_kind():
    from same_same_spark.pipeline.audiocodec import (
        audio_coverage_kind,
        encode_wav,
    )
    import numpy as np

    real = encode_wav(np.zeros((8, 1), dtype=np.float64), 8000)
    assert audio_coverage_kind(real) == "wav-pcm"
    assert audio_coverage_kind(_wav_with_fmt(0x0003)) == "wav-float"
    assert audio_coverage_kind(_wav_with_fmt(0x0006)) == "wav-alaw"
    assert audio_coverage_kind(_wav_with_fmt(0x0007)) == "wav-mulaw"
    assert audio_coverage_kind(_wav_with_fmt(0x0011)) == "wav-fmt-0x0011"
    assert (
        audio_coverage_kind(_wav_with_fmt(0x0002, extensible=True))
        == "wav-fmt-0x0002"
    )
    # extensible wrapper resolving to PCM stays decodable
    assert (
        audio_coverage_kind(_wav_with_fmt(0x0001, extensible=True))
        == "wav-pcm"
    )
    import struct as _s

    no_fmt = b"RIFF" + _s.pack("<I", 4) + b"WAVE"
    assert audio_coverage_kind(no_fmt) == "wav-no-fmt"
    assert audio_coverage_kind(b"fLaC" + bytes(16)) == "flac"
    assert audio_coverage_kind(b"ID3" + bytes(16)) == "mp3"
    assert audio_coverage_kind(b"\xff\xfb" + bytes(16)) == "mp3"
    assert audio_coverage_kind(_ogg_page(b"\x01vorbis" + bytes(8))) == "ogg-vorbis"
    assert audio_coverage_kind(_ogg_page(b"OpusHead" + bytes(8))) == "ogg-opus"
    assert audio_coverage_kind(_ogg_page(b"\x7fFLAC" + bytes(8))) == "ogg-flac"
    assert audio_coverage_kind(_ogg_page(b"speex??" + bytes(8))) == "ogg-other"
    assert audio_coverage_kind(b"OggS" + bytes(10)) == "ogg-other"  # truncated page
    assert audio_coverage_kind(b"") == "not-audio"
    assert audio_coverage_kind(None) == "not-audio"
    assert audio_coverage_kind(b"PNG...junk") == "not-audio"


def test_audio_coverage_stats(spark):
    from same_same_spark.pipeline.audiocodec import (
        audio_coverage_stats,
        encode_wav,
    )
    import numpy as np

    real = encode_wav(np.zeros((8, 1), dtype=np.float64), 8000)
    rows = [
        (1, bytearray(real)),
        (2, bytearray(real)),
        (3, bytearray(b"fLaC" + bytes(16))),
        (4, bytearray(b"ID3" + bytes(16))),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id LONG, content BINARY")
    got = {
        r["kind"]: r["n"]
        for r in audio_coverage_stats(df).collect()
    }
    assert got == {"wav-pcm": 2, "flac": 1, "mp3": 1, "not-audio": 1}
