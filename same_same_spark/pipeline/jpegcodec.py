"""Pure-stdlib JPEG (ITU-T T.81) decoder: baseline, extended
sequential, and progressive huffman.

Completes the reference's registered-format set without third-party
libs: Go registers png+jpeg (``internal/embedders/clip/simple.go:7-9``);
PNG lives in :mod:`same_same_spark.pipeline.imagecodec`, this module
decodes **huffman-coded** JPEG: the DCT processes (SOF0/SOF1/SOF2 —
marker parse, DQT/DHT tables, any number of entropy-coded scans,
interleaved or per-component, sequential or progressive with spectral
selection + successive approximation, EOB runs, refinement bits,
byte-stuffing and restart markers, then one vectorized
dequantize/IDCT/upsample/YCbCr->RGB reconstruction pass) AND the
**lossless process** (SOF3, T.81 annex H: predictors 1-7, point
transform, 2-16 bit precision, modulo-2^16 differences, restart
intervals; 1×1 sampling — subsampled lossless stays gated).

Hierarchical/differential and arithmetic-coded JPEGs raise
:class:`~same_same_spark.pipeline.imagecodec.UnsupportedImageError` —
the honest gate, narrowed again (round 4) from "any non-huffman-DCT
JPEG". Chroma upsampling is spec-conformant pixel replication
(libjpeg's default "fancy" triangle filter differs by a few counts on
subsampled chroma; this is a capability path, not a bit-pinned oracle
path — the pinned paths stay on the deterministic stand-in decoders in
``clip.py``).

Everything here derives from the public T.81 spec; the huffman/zigzag/
DCT/progressive-scan test vectors come from spec-derived sequential,
progressive, AND lossless encoders in ``tests/test_jpegcodec.py``
written independently of this file (the differentials: a progressive
stream must decode pixel-identical to the sequential stream carrying
the same coefficients; a lossless stream must decode bit-exact to its
source samples under every predictor).
"""

from __future__ import annotations

import struct

import numpy as np

from same_same_spark.pipeline.imagecodec import UnsupportedImageError

# Zigzag scan order, generated from the T.81 diagonal rule: antidiagonals
# s = r + c in order; even s runs bottom-left -> top-right.
def _zigzag() -> list[int]:
    order = []
    for s in range(15):
        rng = range(min(s, 7), max(s - 7, 0) - 1, -1)  # r decreasing
        rs = rng if s % 2 == 0 else reversed(rng)
        order.extend(r * 8 + (s - r) for r in rs)
    return order


ZIGZAG = _zigzag()
_ZIGZAG_ARR = np.array(ZIGZAG)

# ITU-T T.81 Annex K.3 "typical" huffman tables, stored as the exact
# DHT-segment body a conforming stream would carry (class/id byte, 16
# length counts, symbols — four tables concatenated: DC luma 0x00,
# DC chroma 0x01, AC luma 0x10, AC chroma 0x11). Legacy MJPEG frames
# inside AVI omit DHT by convention and assume these decoder-side;
# ``decode_jpeg(default_huffman=True)`` pre-loads them through the
# same parser as an in-stream segment, and any in-stream DHT still
# overrides (the OpenDML rule real decoders follow).
# The AC tables are typed as (counts, symbols-per-length for lengths
# 2..15); the length-16 tail — the bulk of each table — is a structural
# property of Annex K: exactly the REMAINING run/size symbols in
# ascending numeric order, so it is generated, not transcribed. The
# full alphabet per AC table is {run<<4 | size : run 0..15, size
# 1..10} ∪ {0x00 EOB, 0xF0 ZRL} (162 symbols), asserted at import.
_ANNEX_K_AC = {
    0x10: [  # AC luminance: symbols of lengths 2,3,...,15 in order
        [0x01, 0x02], [0x03], [0x00, 0x04, 0x11], [0x05, 0x12, 0x21],
        [0x31, 0x41], [0x06, 0x13, 0x51, 0x61], [0x07, 0x22, 0x71],
        [0x14, 0x32, 0x81, 0x91, 0xA1], [0x08, 0x23, 0x42, 0xB1, 0xC1],
        [0x15, 0x52, 0xD1, 0xF0], [0x24, 0x33, 0x62, 0x72],
        [], [], [0x82],
    ],
    0x11: [  # AC chrominance
        [0x00, 0x01], [0x02], [0x03, 0x11], [0x04, 0x05, 0x21, 0x31],
        [0x06, 0x12, 0x41, 0x51], [0x07, 0x61, 0x71],
        [0x13, 0x22, 0x32, 0x81],
        [0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1],
        [0x09, 0x23, 0x33, 0x52, 0xF0], [0x15, 0x62, 0x72, 0xD1],
        [0x0A, 0x16, 0x24, 0x34], [], [0xE1], [0x25, 0xF1],
    ],
}
_ANNEX_K_DC = {
    0x00: [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    0x01: [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
}


def _annex_k_body() -> bytes:
    alphabet = {0x00, 0xF0} | {
        (run << 4) | size for run in range(16) for size in range(1, 11)
    }
    out = bytearray()
    for cid, counts in sorted(_ANNEX_K_DC.items()):
        assert sum(counts) == 12
        out += bytes([cid]) + bytes(counts) + bytes(range(12))
    for cid, per_len in sorted(_ANNEX_K_AC.items()):
        short = [s for group in per_len for s in group]
        assert len(set(short)) == len(short) <= len(alphabet)
        tail = sorted(alphabet - set(short))
        counts = [0] + [len(g) for g in per_len] + [len(tail)]  # len 1..16
        assert len(counts) == 16 and sum(counts) == 162
        out += bytes([cid]) + bytes(counts) + bytes(short + tail)
    return bytes(out)


_DEFAULT_DHT_BODY = _annex_k_body()


def _parse_dht(body: bytes, huff: dict) -> None:
    """Fold one DHT-segment body (one or more tables) into ``huff``."""
    b = 0
    while b < len(body):
        tc, th = body[b] >> 4, body[b] & 15
        counts = body[b + 1 : b + 17]
        nsym = sum(counts)
        symbols = body[b + 17 : b + 17 + nsym]
        huff[(tc, th)] = _build_huffman(counts, symbols)
        b += 17 + nsym

# Orthonormal 8-point DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_A = np.array(
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


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-stuffing; stops (and zero-pads) at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.at_marker = False

    def _next_byte(self) -> int:
        d, n = self.data, len(self.data)
        if self.at_marker or self.pos >= n:
            self.at_marker = True
            return 0
        b = d[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        nxt = d[self.pos + 1] if self.pos + 1 < n else 0xD9
        if nxt == 0x00:
            self.pos += 2
            return 0xFF
        self.at_marker = True  # leave pos AT the marker
        return 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.buf = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, expect_n: int) -> None:
        """Byte-align, consume the expected RSTn marker, resume."""
        self.nbits = 0
        d = self.data
        if (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and d[self.pos + 1] == 0xD0 + (expect_n & 7)
        ):
            self.pos += 2
            self.at_marker = False
        else:
            raise ValueError("jpeg: missing restart marker")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _build_huffman(counts: bytes, symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG huffman: {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code")


# --- per-block scan decoders (T.81 F.2.2 sequential, G.2 progressive) ------


def _block_sequential(reader, dc_tab, ac_tab, block, pred: int) -> int:
    """Full DC+AC decode of one block (sequential scans)."""
    s = _decode_huff(reader, dc_tab)
    diff = _extend(reader.receive(s), s) if s else 0
    pred += diff
    block[0] = pred
    k = 1
    while k < 64:
        rs = _decode_huff(reader, ac_tab)
        r, sz = rs >> 4, rs & 15
        if sz == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: AC index overflow")
        block[ZIGZAG[k]] = _extend(reader.receive(sz), sz)
        k += 1
    return pred


def _block_dc(reader, dc_tab, block, pred: int, ah: int, al: int) -> int:
    """Progressive DC scan on one block: first pass (Ah=0) decodes the
    point-transformed diff; refinement passes append one bit."""
    if ah == 0:
        s = _decode_huff(reader, dc_tab)
        diff = _extend(reader.receive(s), s) if s else 0
        pred += diff
        block[0] = pred << al
    else:
        if reader.read_bit():
            block[0] |= 1 << al
    return pred


def _block_ac_first(reader, ac_tab, block, ss, se, al, eobrun: int) -> int:
    """Progressive AC first pass (Ah=0) on one block's [Ss, Se] band;
    returns the remaining EOB run (count of further all-zero bands)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(reader, ac_tab)
        r, sz = rs >> 4, rs & 15
        if sz == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("jpeg: AC index overflow")
        block[ZIGZAG[k]] = _extend(reader.receive(sz), sz) << al
        k += 1
    return eobrun


def _refine_nonzero(reader, block, z: int, p1: int, m1: int) -> None:
    """Correction bit for a coefficient that is already nonzero: if
    set, nudge its magnitude up by one at this bit position (T.81
    G.1.2.3: only when the bit isn't already present)."""
    if reader.read_bit():
        v = int(block[z])
        if (v & p1) == 0:  # two's-complement bit test, sign-agnostic
            block[z] = v + (p1 if v >= 0 else m1)


def _block_ac_refine(
    reader, ac_tab, block, ss, se, al, eobrun: int
) -> int:
    """Progressive AC refinement pass (Ah=Al+1) on one block's band:
    newly-significant coefficients arrive as ±2^Al, previously-nonzero
    ones get a correction bit each; EOB runs still carry correction
    bits for the nonzero history they skip."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(reader, ac_tab)
            r, sz = rs >> 4, rs & 15
            if sz == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if sz != 1:
                    raise ValueError("jpeg: bad refinement magnitude")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if block[z] != 0:
                    _refine_nonzero(reader, block, z, p1, m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if sz and k <= se:
                block[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = ZIGZAG[k]
            if block[z] != 0:
                _refine_nonzero(reader, block, z, p1, m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(
    data: bytes,
    pos: int,
    comps: list[dict],
    scan_sel: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    progressive: bool,
    restart_interval: int,
    huff: dict,
    coefs: list[np.ndarray],
    geom: dict,
) -> int:
    """Decode one scan's entropy-coded data into the per-component
    coefficient arrays; returns the stream position of the next marker.

    ``scan_sel`` is ``[(component_index, dc_table_id, ac_table_id)]``
    in scan order. Multi-component scans interleave by MCU; a
    single-component scan is non-interleaved (MCU = one block) over
    that component's un-padded block grid, per T.81 A.2.2.
    """
    reader = _BitReader(data, pos)
    pred = [0] * len(scan_sel)
    eobrun = 0
    rst_n = 0
    unit_count = 0  # MCUs (interleaved) or blocks (non-interleaved)

    def tables(dc_id: int, ac_id: int, need_dc: bool, need_ac: bool):
        dc = huff.get((0, dc_id))
        ac = huff.get((1, ac_id))
        if (need_dc and dc is None) or (need_ac and ac is None):
            raise ValueError("jpeg: missing huffman table")
        return dc, ac

    def maybe_restart():
        nonlocal rst_n, pred, eobrun
        if (
            restart_interval
            and unit_count
            and unit_count % restart_interval == 0
        ):
            reader.sync_restart(rst_n)
            rst_n = (rst_n + 1) & 7
            pred = [0] * len(scan_sel)
            eobrun = 0

    if len(scan_sel) > 1:
        # interleaved MCU order (sequential, or progressive DC)
        if progressive and ss != 0:
            raise ValueError("jpeg: interleaved AC scan is illegal")
        for my in range(geom["mcus_y"]):
            for mx in range(geom["mcus_x"]):
                maybe_restart()
                for si, (ci, dc_id, ac_id) in enumerate(scan_sel):
                    c = comps[ci]
                    dc_tab, ac_tab = tables(
                        dc_id, ac_id,
                        (not progressive) or ah == 0,  # DC refine: raw bits
                        not progressive,
                    )
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block = coefs[ci][
                                my * c["v"] + by, mx * c["h"] + bx
                            ]
                            if progressive:
                                pred[si] = _block_dc(
                                    reader, dc_tab, block, pred[si],
                                    ah, al,
                                )
                            else:
                                pred[si] = _block_sequential(
                                    reader, dc_tab, ac_tab, block,
                                    pred[si],
                                )
                unit_count += 1
    else:
        ci, dc_id, ac_id = scan_sel[0]
        c = comps[ci]
        bw, bh = geom["blocks"][ci]
        is_dc = ss == 0
        dc_tab, ac_tab = tables(
            dc_id, ac_id,
            need_dc=is_dc and ((not progressive) or ah == 0),
            need_ac=(not progressive) or not is_dc,
        )
        for row in range(bh):
            for col in range(bw):
                maybe_restart()
                block = coefs[ci][row, col]
                if not progressive:
                    pred[0] = _block_sequential(
                        reader, dc_tab, ac_tab, block, pred[0]
                    )
                elif is_dc:
                    pred[0] = _block_dc(
                        reader, dc_tab, block, pred[0], ah, al
                    )
                elif ah == 0:
                    eobrun = _block_ac_first(
                        reader, ac_tab, block, ss, se, al, eobrun
                    )
                else:
                    eobrun = _block_ac_refine(
                        reader, ac_tab, block, ss, se, al, eobrun
                    )
                unit_count += 1

    # land on the next marker (skip any pad bits / stray bytes)
    p = reader.pos
    while p < len(data) and data[p] != 0xFF:
        p += 1
    return p


def _decode_lossless_scan(
    data: bytes,
    pos: int,
    scan_sel: list[tuple[int, int, int]],
    predictor: int,
    pt: int,
    prec: int,
    restart_interval: int,
    huff: dict,
    samples: list[np.ndarray],
) -> int:
    """Decode one lossless-process scan (T.81 annex H) into the
    per-component sample arrays; returns the position of the next
    marker. All components are 1×1 sampled (gated at SOF3), so an
    interleaved MCU is one sample per component in scan order and a
    single-component scan is a plain raster.

    Prediction (H.1.2): the first decoded sample of the scan — and the
    first sample after every restart marker — predicts from the
    point-transformed midpoint ``2^(P-Pt-1)``; the rest of the first
    line predicts from the left neighbour, the first column from the
    row above, everything else from the selected predictor 1-7.
    Differences are DC-style huffman categories; SSSS=16 means +32768
    with no appended bits. Reconstruction wraps modulo 2^16.
    """
    reader = _BitReader(data, pos)
    tabs = []
    for _, dc_id, _ in scan_sel:
        t = huff.get((0, dc_id))
        if t is None:
            raise ValueError("jpeg: missing huffman table")
        tabs.append(t)
    h, w = samples[scan_sel[0][0]].shape
    default = 1 << (prec - pt - 1)
    force_default = [True] * len(scan_sel)
    rst_n = 0
    unit = 0

    def diff(si: int) -> int:
        s = _decode_huff(reader, tabs[si])
        if s == 0:
            return 0
        if s == 16:
            return 32768
        return _extend(reader.receive(s), s)

    for y in range(h):
        for x in range(w):
            if (
                restart_interval
                and unit
                and unit % restart_interval == 0
            ):
                reader.sync_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                force_default = [True] * len(scan_sel)
            for si, (ci, _, _) in enumerate(scan_sel):
                plane = samples[ci]
                if force_default[si]:
                    px = default
                    force_default[si] = False
                elif y == 0:
                    px = int(plane[y, x - 1])  # first line: left
                elif x == 0:
                    px = int(plane[y - 1, x])  # first column: above
                else:
                    ra = int(plane[y, x - 1])
                    rb = int(plane[y - 1, x])
                    rc = int(plane[y - 1, x - 1])
                    if predictor == 1:
                        px = ra
                    elif predictor == 2:
                        px = rb
                    elif predictor == 3:
                        px = rc
                    elif predictor == 4:
                        px = ra + rb - rc
                    elif predictor == 5:
                        px = ra + ((rb - rc) >> 1)
                    elif predictor == 6:
                        px = rb + ((ra - rc) >> 1)
                    else:  # 7
                        px = (ra + rb) >> 1
                plane[y, x] = (px + diff(si)) & 0xFFFF
            unit += 1

    p = reader.pos
    while p < len(data) and data[p] != 0xFF:
        p += 1
    return p


def decode_jpeg(data: bytes, default_huffman: bool = False) -> np.ndarray:
    """Decode a huffman-coded DCT JPEG (baseline, extended sequential,
    or progressive; interleaved or per-component scans) or a
    huffman-coded LOSSLESS JPEG (SOF3, predictors 1-7, point
    transform, 2-16 bit precision, 1×1 sampling) to an ``(H, W, 3)``
    uint8 RGB array. Lossless samples deeper than 8 bits scale down by
    a right shift (shallower ones scale up); 3-component lossless data
    is RGB unless a JFIF APP0 header declares the stream YCbCr.
    ``default_huffman=True`` pre-loads the T.81 Annex K typical tables
    (the legacy-MJPEG convention for AVI frames that omit DHT); any
    in-stream DHT still overrides."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    n = len(data)
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
    if default_huffman:
        _parse_dht(_DEFAULT_DHT_BODY, huff)
    frame = None  # (H, W, components)
    progressive = False
    lossless = False
    prec_bits = 8
    jfif = False
    pt_last = 0
    restart_interval = 0
    coefs: list[np.ndarray] | None = None
    samples: list[np.ndarray] | None = None
    geom: dict = {}
    dc_seen: set[int] = set()
    any_scan = False

    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:  # 0xFF fill bytes before a marker (B.1.1.2)
            pos -= 1
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker in (0x01, 0xD8):
            continue  # stray RST / TEM / SOI: no length field
        if pos + 2 > n:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 15
                b += 1
                if pq == 0:
                    tbl = np.frombuffer(body[b : b + 64], dtype=np.uint8)
                    b += 64
                else:
                    tbl = np.frombuffer(body[b : b + 128], dtype=">u2")
                    b += 128
                qt[tq] = tbl.astype(np.int32)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1/2/3
            if frame is not None:
                raise ValueError("jpeg: multiple frames")
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if lossless:
                if not 2 <= prec <= 16:
                    raise ValueError("jpeg: bad lossless precision")
                prec_bits = prec
            elif prec != 8:
                raise UnsupportedImageError("jpeg: only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            if lossless and any(
                c["h"] != 1 or c["v"] != 1 for c in comps
            ):
                raise UnsupportedImageError(
                    "jpeg: subsampled lossless unsupported"
                )
            frame = (h, w, comps)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError(
                "jpeg: hierarchical/differential/arithmetic coding "
                "unsupported"
            )
        elif marker == 0xE0:  # APP0: JFIF declares YCbCr for 3-comp
            jfif = jfif or body[:5] == b"JFIF\x00"
        elif marker == 0xC4:  # DHT
            _parse_dht(body, huff)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            H, W, comps = frame
            if H == 0 or W == 0:
                raise ValueError("jpeg: zero-sized image")
            if lossless:
                if samples is None:
                    samples = [
                        np.zeros((H, W), dtype=np.int32) for _ in comps
                    ]
                ns = body[0]
                by_id = {c["id"]: i for i, c in enumerate(comps)}
                sel = []
                for si in range(ns):
                    cid, tt = body[1 + 2 * si], body[2 + 2 * si]
                    if cid not in by_id:
                        raise ValueError(
                            "jpeg: scan selects unknown component"
                        )
                    sel.append((by_id[cid], tt >> 4, tt & 15))
                pred_sel = body[1 + 2 * ns]  # Ss = predictor selector
                pt_last = body[3 + 2 * ns] & 15  # Al = point transform
                if not 1 <= pred_sel <= 7:
                    raise ValueError("jpeg: bad lossless predictor")
                if pt_last >= prec_bits:
                    raise ValueError("jpeg: bad point transform")
                dc_seen.update(ci for ci, _, _ in sel)
                any_scan = True
                pos = _decode_lossless_scan(
                    data, pos + seglen, sel, pred_sel, pt_last,
                    prec_bits, restart_interval, huff, samples,
                )
                continue
            if coefs is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                geom = {
                    "mcus_x": -(-W // (8 * hmax)),
                    "mcus_y": -(-H // (8 * vmax)),
                    "hmax": hmax,
                    "vmax": vmax,
                    "blocks": [],
                }
                coefs = []
                for c in comps:
                    cw = -(-W * c["h"] // hmax)
                    ch = -(-H * c["v"] // vmax)
                    geom["blocks"].append((-(-cw // 8), -(-ch // 8)))
                    coefs.append(
                        np.zeros(
                            (
                                geom["mcus_y"] * c["v"],
                                geom["mcus_x"] * c["h"],
                                64,
                            ),
                            dtype=np.int32,
                        )
                    )
            ns = body[0]
            by_id = {c["id"]: i for i, c in enumerate(comps)}
            sel = []
            for si in range(ns):
                cid, tt = body[1 + 2 * si], body[2 + 2 * si]
                if cid not in by_id:
                    raise ValueError("jpeg: scan selects unknown component")
                sel.append((by_id[cid], tt >> 4, tt & 15))
            ss, se, ahal = (
                body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            )
            ah, al = ahal >> 4, ahal & 15
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            elif ss == 0 and se != 0:
                raise ValueError("jpeg: bad DC spectral band")
            elif ss > 0 and len(sel) != 1:
                raise ValueError("jpeg: interleaved AC scan is illegal")
            if ss == 0:
                dc_seen.update(ci for ci, _, _ in sel)
            any_scan = True
            pos = _decode_scan(
                data, pos + seglen, comps, sel, ss, se, ah, al,
                progressive, restart_interval, huff, coefs, geom,
            )
            continue
        pos += seglen

    if frame is None or not any_scan:
        raise ValueError("jpeg: missing SOF/SOS")
    H, W, comps = frame
    if len(dc_seen) != len(comps):
        raise ValueError("jpeg: component(s) never scanned")

    if lossless:
        # --- reconstruction: inverse point transform + bit-depth scale
        full = []
        for arr in samples:
            v = arr.astype(np.int64) << pt_last
            v = (
                v >> (prec_bits - 8)
                if prec_bits > 8
                else v << (8 - prec_bits)
            )
            full.append(np.clip(v, 0, 255).astype(np.float64))
        if len(full) == 3 and not jfif:
            # 3-component lossless without a JFIF header is RGB
            return np.stack(full, axis=2).astype(np.uint8)
        # 1 component (or JFIF-declared YCbCr) falls through to the
        # shared grayscale / YCbCr tail below
        H2 = H  # noqa: F841  (documentation: planes are full-res)

    # --- reconstruction: dequantize + vectorized IDCT per component ---
    if not lossless:
        full = []
        for ci, c in enumerate(comps):
            q = qt.get(c["tq"])
            if q is None:
                raise ValueError("jpeg: missing quant table")
            qnat = np.empty(64, dtype=np.int64)
            qnat[_ZIGZAG_ARR] = q  # zigzag-order table -> natural order
            bh, bw = coefs[ci].shape[:2]
            deq = (coefs[ci].astype(np.int64) * qnat).astype(np.float64)
            blocks = deq.reshape(bh, bw, 8, 8)
            out = np.einsum("ab,ijbc,cd->ijad", _A.T, blocks, _A)
            plane = out.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
            cw = -(-W * c["h"] // geom["hmax"])
            ch = -(-H * c["v"] // geom["vmax"])
            p = plane[:ch, :cw]
            p = np.repeat(
                np.repeat(p, geom["vmax"] // c["v"], axis=0),
                geom["hmax"] // c["h"],
                axis=1,
            )
            full.append(p[:H, :W])

    if len(full) == 1:
        y = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    if len(full) != 3:
        raise UnsupportedImageError(
            f"jpeg: {len(full)}-component images unsupported"
        )
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
