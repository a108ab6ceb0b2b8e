"""Posting-list codec: docID-delta + varint blocks with block-max metadata.

Pure numpy, fully vectorized — this runs inside Arrow-batched
``applyInPandas`` groups at build time and query time; there is no
per-row Python anywhere (BASELINE.json:input_hint).

Layout per (bucket, term) posting list:

- doc ids (int64, may be negative — they're xxhash64 values) are mapped
  order-preservingly to uint64 via offset-binary (``x + 2^63``), sorted
  ascending, delta-encoded (first value raw, then gaps), then packed
  per 128-doc block with a 1-byte codec tag choosing whichever is
  smaller: LEB128 varint or FOR bit-packing (varint head delta + fixed
  ``max_bit_width`` fields — dense hot-term blocks land well under
  1 byte/doc),
- term frequencies varint-packed into a second BINARY,
- fixed 128-posting blocks; per block we record the byte offset into each
  BINARY, the last (max) doc id, and (max_tf, min_dl) — from which
  :func:`block_max_wtf_bound` derives a block-max bound on the BM25 term
  partial ``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` at query time
  (idf is a per-term constant applied there too). Keeping the block
  metadata stats-free lets the whole index build run in a single pass.

The reference has no index at all (O(n) scan, USAGE.md:49); this layout
is the classic block-max inverted index (Ding & Suel 2011) re-expressed
as parquet-resident BINARY columns.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
_U63 = np.uint64(1) << np.uint64(63)
_7 = np.uint64(7)
_0x7F = np.uint64(0x7F)


def to_u64(doc_ids: np.ndarray) -> np.ndarray:
    """Order-preserving int64 → uint64 (offset binary)."""
    return doc_ids.astype(np.int64).view(np.uint64) + _U63


def from_u64(u: np.ndarray) -> np.ndarray:
    return (u - _U63).view(np.int64)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized; ≤10 bytes/value)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    if (v < np.uint64(128)).all():
        # single-byte fast path — the usual shape for tf and doc-length
        # streams, where the (n × 10) matrix below is pure overhead
        return v.astype(np.uint8).tobytes()
    bytes_mat = np.empty((n, 10), dtype=np.uint8)
    needed = np.zeros((n, 10), dtype=bool)
    needed[:, 0] = True
    cur = v.copy()
    for k in range(10):
        bytes_mat[:, k] = (cur & _0x7F).astype(np.uint8)
        cur = cur >> _7
        if k < 9:
            needed[:, k + 1] = cur != 0
    # continuation bit on byte k iff byte k+1 is needed
    cont = np.zeros((n, 10), dtype=bool)
    cont[:, :9] = needed[:, 1:]
    bytes_mat = bytes_mat | (cont.astype(np.uint8) << 7)
    return bytes_mat[needed].tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte string back to uint64 (vectorized).

    Exactness note: per-value byte contributions occupy disjoint bit
    ranges, so a wrap-around cumsum + diff reconstructs each value
    exactly mod 2^64 (and true values are < 2^64).
    """
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = b < 128
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    gid = np.cumsum(np.concatenate(([0], is_last[:-1].astype(np.int64))))
    pos = np.arange(len(b), dtype=np.int64) - starts[gid]
    contrib = (b & 0x7F).astype(np.uint64) << (pos.astype(np.uint64) * _7)
    with np.errstate(over="ignore"):
        cs = np.cumsum(contrib, dtype=np.uint64)
        vals = np.diff(np.concatenate((np.zeros(1, dtype=np.uint64), cs[ends])))
    if count is not None:
        assert len(vals) == count, f"decoded {len(vals)} != expected {count}"
    return vals


# ---------------------------------------------------------------------------
# FOR (frame-of-reference) bit-packing — the per-block alternative codec
# ---------------------------------------------------------------------------


def bitpack(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into ``width``-bit little-endian fields."""
    if width == 0 or len(values) == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    bits = (
        (v[:, None] >> np.arange(width, dtype=np.uint64)) & np.uint64(1)
    ).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def bitunpack(buf: bytes, count: int, width: int) -> np.ndarray:
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), bitorder="little"
    )[: count * width].reshape(count, width)
    weights = np.uint64(1) << np.arange(width, dtype=np.uint64)
    return (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)


TAG_VARINT = 0
TAG_FOR = 1


def encode_doc_block(deltas: np.ndarray) -> bytes:
    """Encode one block of doc-id deltas: 1 tag byte + payload.

    - ``TAG_VARINT``: plain LEB128 stream.
    - ``TAG_FOR``: varint(delta0) — the jump from the previous block can
      be large — then a width byte and the remaining deltas bit-packed
      at the block's max width (classic frame-of-reference). The smaller
      encoding wins per block; dense hot-term blocks (deltas of a few
      bits) compress well below 1 byte/doc this way.
    """
    vi = varint_encode(deltas)
    if len(deltas) > 1:
        rest = deltas[1:]
        width = int(rest.max()).bit_length()
        if width <= 32:  # FOR never helps past varint for huge deltas
            payload = (
                varint_encode(deltas[:1])
                + bytes([width])
                + bitpack(rest, width)
            )
            if 1 + len(payload) < 1 + len(vi):
                return bytes([TAG_FOR]) + payload
    return bytes([TAG_VARINT]) + vi


def decode_doc_block(chunk: bytes, count: int) -> np.ndarray:
    """Decode one block produced by :func:`encode_doc_block` → deltas."""
    tag = chunk[0]
    body = chunk[1:]
    if tag == TAG_VARINT:
        return varint_decode(body, count)
    b = np.frombuffer(body, dtype=np.uint8)
    end = int(np.flatnonzero(b < 128)[0]) + 1
    d0 = varint_decode(body[:end], 1)
    width = body[end]
    n_rest = count - 1
    packed = body[end + 1 : end + 1 + (n_rest * width + 7) // 8]
    return np.concatenate([d0, bitunpack(packed, n_rest, width)])


def encode_doc_ids(doc_ids_sorted: np.ndarray) -> bytes:
    """Delta+varint encode sorted int64 doc ids (strictly increasing)."""
    u = to_u64(np.asarray(doc_ids_sorted, dtype=np.int64))
    if len(u) == 0:
        return b""
    deltas = np.empty_like(u)
    deltas[0] = u[0]
    deltas[1:] = u[1:] - u[:-1]
    return varint_encode(deltas)


def decode_doc_ids(buf: bytes, count: int | None = None) -> np.ndarray:
    deltas = varint_decode(buf, count)
    if len(deltas) == 0:
        return np.empty(0, dtype=np.int64)
    with np.errstate(over="ignore"):
        u = np.cumsum(deltas, dtype=np.uint64)
    return from_u64(u)


def bm25_wtf(
    tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float, b: float
) -> np.ndarray:
    """Per-posting BM25 term partial (idf excluded), float64."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def block_max_wtf_bound(
    block_max_tf: np.ndarray,
    block_min_dl: np.ndarray,
    avgdl: float,
    k1: float,
    b: float,
) -> np.ndarray:
    """Per-block upper bound on the BM25 term partial.

    ``wtf(tf, dl)`` is increasing in tf and decreasing in dl, so
    ``wtf(max_tf, min_dl)`` bounds every posting in the block. Storing
    (max_tf, min_dl) instead of a precomputed wtf keeps the index layout
    independent of corpus stats — the whole build needs only one pass.
    """
    return bm25_wtf(
        np.asarray(block_max_tf), np.asarray(block_min_dl), avgdl, k1, b
    )


def encode_posting_list(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
) -> dict:
    """Encode one term's postings (within one bucket) into a row dict.

    ``doc_ids`` need not be pre-sorted; ties impossible (one posting per
    (doc, term)). Block metadata is (max_tf, min_dl) — see
    :func:`block_max_wtf_bound` — so no global stats are needed here.
    """
    order = np.argsort(doc_ids, kind="stable")
    d = np.asarray(doc_ids, dtype=np.int64)[order]
    t = np.asarray(tfs, dtype=np.int64)[order]
    dl = np.asarray(dls, dtype=np.int64)[order]

    n = len(d)
    starts = np.arange(0, n, BLOCK_SIZE)
    ends = np.minimum(starts + BLOCK_SIZE, n)

    u = to_u64(d)
    deltas = np.empty_like(u)
    deltas[0] = u[0]
    deltas[1:] = u[1:] - u[:-1]

    # vectorized per-value varint byte lengths → per-block spans
    lens = np.ones(len(deltas), dtype=np.int64)
    cur = deltas >> _7
    while cur.any():
        lens += (cur != 0).astype(np.int64)
        cur = cur >> _7
    bounds = np.concatenate(([0], np.cumsum(lens)))
    blk_lo = bounds[starts]
    blk_hi = bounds[ends]
    vi_sizes = blk_hi - blk_lo
    cnts = ends - starts

    # FOR candidate widths: max delta per block EXCLUDING each block's
    # first (the cross-block jump stays varint inside the FOR payload)
    tmp = deltas.copy()
    tmp[starts] = 0
    blockmax = np.maximum.reduceat(tmp, starts)
    widths = np.array([int(x).bit_length() for x in blockmax], dtype=np.int64)
    for_sizes = lens[starts] + 1 + ((cnts - 1) * widths + 7) // 8
    use_for = (widths <= 32) & (cnts > 1) & (for_sizes < vi_sizes)

    # tf side: vectorized whole-stream varint; block offsets from lens
    t_u = t.astype(np.uint64)
    tlens = np.ones(len(t_u), dtype=np.int64)
    cur = t_u >> _7
    while cur.any():
        tlens += (cur != 0).astype(np.int64)
        cur = cur >> _7
    tbounds = np.concatenate(([0], np.cumsum(tlens)))
    tf_bytes = varint_encode(t_u)
    toff = np.concatenate((tbounds[starts], [tbounds[-1]]))

    if not use_for.any():
        # all-varint fast path (the shape raw hash-distributed ids take):
        # one vectorized varint stream, tag bytes inserted at block starts
        arr = np.frombuffer(varint_encode(deltas), dtype=np.uint8)
        doc_all = np.insert(arr, blk_lo, np.uint8(TAG_VARINT)).tobytes()
        chunk_lens = vi_sizes + 1
        doff = np.concatenate(([0], np.cumsum(chunk_lens)))
    else:
        # mixed/FOR path — the COMMON shape under layout v4 (dense
        # positions → FOR on ~every block), so it must stay vectorized:
        # bit-packing runs as one (blocks × BLOCK_SIZE-1) matrix op per
        # distinct width over the full blocks; only heads/tags and the
        # (rare) partial or varint blocks touch Python per block. The
        # full varint stream is never materialized here — only block
        # heads (nb values) and the rare varint-tagged block ranges.
        head_lens = lens[starts]
        head_arr = np.frombuffer(
            varint_encode(deltas[starts]), dtype=np.uint8
        )
        head_bounds = np.concatenate(([0], np.cumsum(head_lens)))
        chunk_lens = np.where(
            use_for,
            1 + head_lens + 1 + ((cnts - 1) * widths + 7) // 8,
            1 + vi_sizes,
        )
        doff = np.concatenate(([0], np.cumsum(chunk_lens)))
        doc_arr = np.zeros(doff[-1], dtype=np.uint8)
        doc_arr[doff[:-1]] = np.where(use_for, TAG_FOR, TAG_VARINT)
        u_deltas = deltas  # uint64 view used by bitpack groups

        for_idx = np.flatnonzero(use_for)
        # heads + width bytes (≤10 B each — cheap loop over blocks)
        for bi in for_idx:
            o = doff[bi] + 1
            hl = head_lens[bi]
            doc_arr[o : o + hl] = head_arr[
                head_bounds[bi] : head_bounds[bi] + hl
            ]
            doc_arr[o + hl] = widths[bi]
        for bi in np.flatnonzero(~use_for):
            o = doff[bi] + 1
            vi = np.frombuffer(
                varint_encode(deltas[starts[bi] : ends[bi]]), dtype=np.uint8
            )
            doc_arr[o : o + vi_sizes[bi]] = vi

        full = for_idx[cnts[for_idx] == BLOCK_SIZE]
        partial = for_idx[cnts[for_idx] != BLOCK_SIZE]
        if len(full):
            rest_n = BLOCK_SIZE - 1
            gather = starts[full][:, None] + np.arange(1, BLOCK_SIZE)
            rest_mat = u_deltas[gather]  # (nb, 127) uint64
            pay_off = doff[full] + 2 + head_lens[full]
            for w in np.unique(widths[full]):
                sel = widths[full] == w
                m = rest_mat[sel]
                bits = (
                    (m[:, :, None] >> np.arange(w, dtype=np.uint64))
                    & np.uint64(1)
                ).astype(np.uint8).reshape(len(m), rest_n * int(w))
                packed = np.packbits(bits, axis=1, bitorder="little")
                nbytes = (rest_n * int(w) + 7) // 8
                pos = pay_off[sel][:, None] + np.arange(nbytes)
                doc_arr[pos] = packed[:, :nbytes]
        for bi in partial:  # ≤1 per posting list (the tail block)
            o = doff[bi] + 2 + head_lens[bi]
            pk = np.frombuffer(
                bitpack(u_deltas[starts[bi] + 1 : ends[bi]], int(widths[bi])),
                dtype=np.uint8,
            )
            doc_arr[o : o + len(pk)] = pk
        doc_all = doc_arr.tobytes()

    block_max_tf = np.maximum.reduceat(t, starts).astype(np.int32)
    block_min_dl = np.minimum.reduceat(dl, starts).astype(np.int32)
    return {
        "n": int(n),
        "doc_bytes": doc_all,
        "tf_bytes": tf_bytes,
        "block_off_doc": doff[:-1].astype(np.int32).tolist(),
        "block_off_tf": toff[:-1].astype(np.int32).tolist(),
        "block_last_doc": d[ends - 1].astype(np.int64).tolist(),
        "block_max_tf": block_max_tf.tolist(),
        "block_min_dl": block_min_dl.tolist(),
    }


def _decode_all_for_blocks(
    arr: np.ndarray, offs: np.ndarray, n: int
) -> np.ndarray:
    """Vectorized full decode of an all-FOR-tagged block chain → deltas.

    Heads are parsed as one (blocks × 10) byte matrix; rest payloads
    bit-unpack as one matrix op per distinct width over the full
    blocks. The delta chain is continuous across blocks (each head is
    the jump from the previous block's last id), so callers cumsum the
    result directly.
    """
    nb = len(offs)
    cnts = np.full(nb, BLOCK_SIZE, dtype=np.int64)
    cnts[-1] = n - (nb - 1) * BLOCK_SIZE

    pad = np.concatenate([arr, np.zeros(16, dtype=np.uint8)])
    hmat = pad[offs[:, None] + 1 + np.arange(10)]
    head_len = np.argmax(hmat < 128, axis=1) + 1
    shifts = (np.arange(10, dtype=np.uint64) * _7)
    contrib = (hmat.astype(np.uint64) & _0x7F) << shifts
    contrib[np.arange(10) >= head_len[:, None]] = 0
    with np.errstate(over="ignore"):
        d0 = contrib.sum(axis=1, dtype=np.uint64)
    widths = pad[offs + 1 + head_len].astype(np.int64)
    pay_off = offs + 2 + head_len

    deltas = np.zeros(n, dtype=np.uint64)
    deltas[(np.arange(nb)) * BLOCK_SIZE] = d0

    full = np.flatnonzero(cnts == BLOCK_SIZE)
    rest_n = BLOCK_SIZE - 1
    for w in np.unique(widths[full]):
        sel = full[widths[full] == w]
        if w == 0 or not len(sel):
            continue
        nbytes = (rest_n * int(w) + 7) // 8
        rows = pad[pay_off[sel][:, None] + np.arange(nbytes)]
        bits = np.unpackbits(rows, axis=1, bitorder="little")[
            :, : rest_n * int(w)
        ].reshape(len(sel), rest_n, int(w))
        vals = (
            bits.astype(np.uint64)
            * (np.uint64(1) << np.arange(int(w), dtype=np.uint64))
        ).sum(axis=2, dtype=np.uint64)
        idx = (sel * BLOCK_SIZE)[:, None] + np.arange(1, BLOCK_SIZE)
        deltas[idx] = vals
    if cnts[-1] != BLOCK_SIZE and cnts[-1] > 1:
        bi = nb - 1
        w = int(widths[bi])
        nbytes = ((cnts[bi] - 1) * w + 7) // 8
        deltas[bi * BLOCK_SIZE + 1 : bi * BLOCK_SIZE + cnts[bi]] = bitunpack(
            pad[pay_off[bi] : pay_off[bi] + nbytes].tobytes(),
            int(cnts[bi] - 1), w,
        )
    return deltas


def decode_blocks(
    doc_bytes: bytes,
    tf_bytes: bytes,
    n: int,
    block_off_doc,
    block_off_tf,
    block_last_doc,
    keep: np.ndarray | None = None,
):
    """Decode the blocks where ``keep[b]`` is True (all when None).

    Each block's deltas are absolute-ized from the previous block's
    last doc id, so any subset of blocks decodes independently — this
    is what block-max skipping buys: untouched blocks cost zero decode.
    Returns (doc_ids int64 asc within each block, tfs int64).
    """
    offs_d = list(block_off_doc) + [len(doc_bytes)]
    offs_t = list(block_off_tf) + [len(tf_bytes)]
    n_blocks = len(block_off_doc)

    if keep is None and n_blocks:
        # bulk fast paths: the delta chain is continuous across blocks
        # by construction, so a homogeneous tag run decodes in one
        # vectorized pass — varint (raw hash ids) or FOR (layout v4
        # dense positions)
        arr = np.frombuffer(doc_bytes, dtype=np.uint8)
        tag_pos = np.asarray(block_off_doc, dtype=np.int64)
        tags = arr[tag_pos]
        if (tags == TAG_VARINT).all():
            body = np.delete(arr, tag_pos)
            deltas = varint_decode(body.tobytes(), n)
            with np.errstate(over="ignore"):
                u = np.cumsum(deltas, dtype=np.uint64)
            return from_u64(u), varint_decode(tf_bytes, n).astype(np.int64)
        if (tags == TAG_FOR).all():
            deltas = _decode_all_for_blocks(arr, tag_pos, n)
            with np.errstate(over="ignore"):
                u = np.cumsum(deltas, dtype=np.uint64)
            return from_u64(u), varint_decode(tf_bytes, n).astype(np.int64)

    sel = (
        np.arange(n_blocks) if keep is None else np.flatnonzero(keep)
    )
    out_d: list[np.ndarray] = []
    out_t: list[np.ndarray] = []
    for bi in sel:
        lo = bi * BLOCK_SIZE
        hi = min((bi + 1) * BLOCK_SIZE, n)
        cnt = hi - lo
        deltas = decode_doc_block(doc_bytes[offs_d[bi] : offs_d[bi + 1]], cnt)
        base = (
            to_u64(np.array([block_last_doc[bi - 1]], dtype=np.int64))[0]
            if bi > 0
            else np.uint64(0)
        )
        with np.errstate(over="ignore"):
            u = base + np.cumsum(deltas, dtype=np.uint64)
        out_d.append(from_u64(u))
        out_t.append(
            varint_decode(tf_bytes[offs_t[bi] : offs_t[bi + 1]], cnt).astype(
                np.int64
            )
        )
    if not out_d:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(out_d), np.concatenate(out_t)


def decode_posting_list(row: dict | "object"):
    """Decode a full posting-list row → (doc_ids int64 asc, tfs int64).

    ``row`` is any mapping with the shard columns (n, doc_bytes,
    tf_bytes, block_off_doc, block_off_tf, block_last_doc).
    """
    return decode_blocks(
        bytes(row["doc_bytes"]),
        bytes(row["tf_bytes"]),
        row["n"],
        row["block_off_doc"],
        row["block_off_tf"],
        row["block_last_doc"],
        None,
    )
