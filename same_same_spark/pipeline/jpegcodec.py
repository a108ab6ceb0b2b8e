"""Pure-stdlib baseline JPEG (ITU-T T.81) decoder.

Completes the reference's registered-format set without third-party
libs: Go registers png+jpeg (``internal/embedders/clip/simple.go:7-9``);
PNG lives in :mod:`same_same_spark.pipeline.imagecodec`, this module
decodes **baseline and extended-sequential huffman** JPEG (SOF0/SOF1):
marker parse, DQT/DHT tables, entropy-coded scan with byte-stuffing and
restart markers, dequantize, zigzag, float IDCT, chroma upsample by
pixel replication, JFIF YCbCr->RGB.

Progressive (SOF2), hierarchical, and arithmetic-coded JPEGs raise
:class:`~same_same_spark.pipeline.imagecodec.UnsupportedImageError` —
the honest gate, narrowed from "any JPEG" to these variants. Chroma
upsampling is spec-conformant pixel replication (libjpeg's default
"fancy" triangle filter differs by a few counts on subsampled chroma;
this is a capability path, not a bit-pinned oracle path — the pinned
paths stay on the deterministic stand-in decoders in ``clip.py``).

Everything here derives from the public T.81 spec; the huffman/zigzag/
DCT test vectors come from a spec-derived encoder in
``tests/test_jpegcodec.py`` written independently of this file.
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


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline/extended-sequential huffman JPEG to an
    ``(H, W, 3)`` uint8 RGB array."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    n = len(data)
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None  # (precision, H, W, components)
    restart_interval = 0
    scan = None

    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST
            continue
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
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise UnsupportedImageError("jpeg: only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError(
                "jpeg: progressive/hierarchical/arithmetic coding unsupported"
            )
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 15
                counts = body[b + 1 : b + 17]
                nsym = sum(counts)
                symbols = body[b + 17 : b + 17 + nsym]
                huff[(tc, th)] = _build_huffman(counts, symbols)
                b += 17 + nsym
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            sel = {}
            for si in range(ns):
                cid, tt = body[1 + 2 * si], body[2 + 2 * si]
                sel[cid] = (tt >> 4, tt & 15)
            scan = sel
            pos += seglen
            break  # entropy-coded data follows
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF/SOS")
    H, W, comps = frame
    if H == 0 or W == 0:
        raise ValueError("jpeg: zero-sized image")
    missing = [c["id"] for c in comps if c["id"] not in scan]
    if missing:
        # spec-legal per-component (non-interleaved) scans select a
        # subset of the frame's components; this baseline decoder only
        # handles the single interleaved scan — gate honestly
        raise UnsupportedImageError(
            "jpeg: non-interleaved scan (components "
            f"{missing} not in first SOS) unsupported"
        )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))

    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        )

    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    rst_n = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab = huff.get((0, scan[c["id"]][0]))
                ac_tab = huff.get((1, scan[c["id"]][1]))
                q = qt.get(c["tq"])
                if dc_tab is None or ac_tab is None or q is None:
                    raise ValueError("jpeg: missing huffman/quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.float64)
                        s = _decode_huff(reader, dc_tab)
                        diff = _extend(reader.receive(s), s) if s else 0
                        pred[ci] += diff
                        coef[0] = pred[ci] * q[0]
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
                            coef[ZIGZAG[k]] = (
                                _extend(reader.receive(sz), sz) * q[k]
                            )
                            k += 1
                        block = _idct2(coef.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # crop to component size, upsample to full resolution
    full = []
    for ci, c in enumerate(comps):
        cw = -(-W * c["h"] // hmax)
        ch = -(-H * c["v"] // vmax)
        p = planes[ci][:ch, :cw]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:H, :W])

    if len(full) == 1:
        y = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    if len(full) != 3:
        raise UnsupportedImageError(f"jpeg: {len(full)}-component images unsupported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
