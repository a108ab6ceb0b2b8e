"""Posting codec: roundtrip + property-based tests (no Spark needed)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from same_same_spark.index.codec import (
    BLOCK_SIZE,
    bm25_wtf,
    decode_doc_ids,
    decode_posting_list,
    encode_doc_ids,
    encode_posting_list,
    varint_decode,
    varint_encode,
)


def test_varint_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**64 - 1], dtype=np.uint64)
    buf = varint_encode(vals)
    assert varint_decode(buf).tolist() == vals.tolist()
    # 0 → 1 byte, 127 → 1 byte, 128 → 2 bytes, max uint64 → 10 bytes
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert len(varint_encode(np.array([2**64 - 1], dtype=np.uint64))) == 10


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        max_size=400,
        unique=True,
    )
)
def test_doc_id_roundtrip(ids):
    arr = np.sort(np.array(ids, dtype=np.int64))
    assert decode_doc_ids(encode_doc_ids(arr)).tolist() == arr.tolist()


def test_posting_list_roundtrip_and_blockmax():
    rng = np.random.default_rng(7)
    n = 1000
    doc_ids = rng.choice(2**62, size=n, replace=False).astype(np.int64) - 2**61
    tfs = rng.integers(1, 50, size=n)
    dls = rng.integers(5, 200, size=n)
    avgdl, k1, b = 57.3, 1.2, 0.75

    row = encode_posting_list(doc_ids, tfs, dls)
    d, t = decode_posting_list(row)

    order = np.argsort(doc_ids)
    assert d.tolist() == doc_ids[order].tolist()
    assert t.tolist() == tfs[order].tolist()
    assert row["n"] == n
    assert len(row["block_last_doc"]) == (n + BLOCK_SIZE - 1) // BLOCK_SIZE

    # block-max invariant: every posting's wtf ≤ the block's derived bound
    from same_same_spark.index.codec import block_max_wtf_bound

    wtf = bm25_wtf(tfs[order], dls[order], avgdl, k1, b)
    bounds = block_max_wtf_bound(
        np.array(row["block_max_tf"]), np.array(row["block_min_dl"]),
        avgdl, k1, b,
    )
    for bi, (off, last) in enumerate(
        zip(row["block_off_doc"], row["block_last_doc"])
    ):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, n)
        assert d[hi - 1] == last
        assert wtf[lo:hi].max() <= bounds[bi] + 1e-12
        assert tfs[order][lo:hi].max() == row["block_max_tf"][bi]
        assert dls[order][lo:hi].min() == row["block_min_dl"][bi]

    # byte offsets allow decoding any single block independently:
    # each chunk is tag-prefixed (varint or FOR), absolute-ized via the
    # previous block's last doc.
    from same_same_spark.index.codec import decode_doc_block, from_u64, to_u64

    n_blocks = len(row["block_off_doc"])
    offs = list(row["block_off_doc"]) + [len(row["doc_bytes"])]
    for bi in range(n_blocks):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, n)
        deltas = decode_doc_block(
            row["doc_bytes"][offs[bi] : offs[bi + 1]], hi - lo
        )
        assert len(deltas) == hi - lo
        base = (
            np.uint64(0) if bi == 0 else to_u64(np.array([row["block_last_doc"][bi - 1]]))[0]
        )
        with np.errstate(over="ignore"):
            absolute = from_u64(base + np.cumsum(deltas, dtype=np.uint64))
        assert absolute.tolist() == d[lo:hi].tolist()


def test_for_block_codec_roundtrip_and_wins_on_dense():
    """Dense (small-delta) blocks must choose FOR and round-trip; sparse
    blocks fall back to varint."""
    from same_same_spark.index.codec import (
        TAG_FOR,
        TAG_VARINT,
        decode_doc_block,
        encode_doc_block,
    )

    dense = np.concatenate(
        [[12345], np.ones(127, dtype=np.uint64) * 3]
    ).astype(np.uint64)
    chunk = encode_doc_block(dense)
    assert chunk[0] == TAG_FOR
    assert len(chunk) < len(varint_encode(dense)) + 1
    assert decode_doc_block(chunk, len(dense)).tolist() == dense.tolist()

    rng = np.random.default_rng(3)
    sparse = rng.integers(2**40, 2**50, size=128).astype(np.uint64)
    chunk = encode_doc_block(sparse)
    assert chunk[0] == TAG_VARINT
    assert decode_doc_block(chunk, len(sparse)).tolist() == sparse.tolist()


def test_empty_posting_list():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").tolist() == []
    assert decode_doc_ids(b"").tolist() == []
