"""Property-based codec tests (hypothesis): round-trips hold for all
inputs, not just the fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from same_same_spark.index import codec


u64s = st.lists(
    st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=400
)


@given(u64s)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = codec.varint_decode(codec.varint_encode(arr))
    assert out.tolist() == arr.tolist()


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=0,
        max_size=300,
        unique=True,
    )
)
@settings(max_examples=200, deadline=None)
def test_doc_id_roundtrip(ids):
    arr = np.sort(np.array(ids, dtype=np.int64))
    out = codec.decode_doc_ids(codec.encode_doc_ids(arr))
    assert out.tolist() == arr.tolist()


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),  # doc_id
            st.integers(min_value=1, max_value=1000),  # tf
            st.integers(min_value=0, max_value=5000),  # dl
        ),
        min_size=1,
        max_size=500,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=100, deadline=None)
def test_posting_list_roundtrip(postings):
    doc_ids = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    row = codec.encode_posting_list(doc_ids, tfs, dls)
    d, t = codec.decode_posting_list(row)
    order = np.argsort(doc_ids, kind="stable")
    assert d.tolist() == doc_ids[order].tolist()
    assert t.tolist() == tfs[order].tolist()
    # block invariants
    n = len(postings)
    n_blocks = (n + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
    assert len(row["block_last_doc"]) == n_blocks
    for bi in range(n_blocks):
        lo = bi * codec.BLOCK_SIZE
        hi = min((bi + 1) * codec.BLOCK_SIZE, n)
        assert row["block_max_tf"][bi] == tfs[order][lo:hi].max()
        assert row["block_min_dl"][bi] == dls[order][lo:hi].min()
        assert row["block_last_doc"][bi] == d[hi - 1]
    # selective block decode agrees with full decode on any subset
    keep = np.zeros(n_blocks, dtype=bool)
    keep[::2] = True
    ds, ts = codec.decode_blocks(
        row["doc_bytes"], row["tf_bytes"], row["n"],
        row["block_off_doc"], row["block_off_tf"], row["block_last_doc"],
        keep,
    )
    expect_d, expect_t = [], []
    for bi in np.flatnonzero(keep):
        lo = bi * codec.BLOCK_SIZE
        hi = min((bi + 1) * codec.BLOCK_SIZE, n)
        expect_d.extend(d[lo:hi].tolist())
        expect_t.extend(t[lo:hi].tolist())
    assert ds.tolist() == expect_d
    assert ts.tolist() == expect_t


@given(
    st.integers(min_value=1, max_value=2000),  # n postings
    st.integers(min_value=1, max_value=8),     # density divisor
    st.integers(min_value=0, max_value=2**32), # seed
)
@settings(max_examples=60, deadline=None)
def test_dense_position_roundtrip_and_pruned_decode(n, div, seed):
    """Layout-v4 shape: positions into a dense 0..N space — FOR fires
    on nearly every block, exercising the vectorized multi-block
    encode, the bulk all-FOR decode, and block-subset decode, which the
    wide-id strategies above almost never reach."""
    rng = np.random.default_rng(seed)
    space = max(n * div, n)
    pos = np.sort(rng.choice(space, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 300, n).astype(np.int64)
    dls = rng.integers(0, 5000, n).astype(np.int64)
    row = codec.encode_posting_list(pos, tfs, dls)
    d, t = codec.decode_posting_list(row)
    assert d.tolist() == pos.tolist()
    assert t.tolist() == tfs.tolist()
    # any block subset decodes independently (block-max skipping)
    n_blocks = len(row["block_off_doc"])
    keep = rng.random(n_blocks) < 0.5
    ds, ts = codec.decode_blocks(
        row["doc_bytes"], row["tf_bytes"], row["n"],
        row["block_off_doc"], row["block_off_tf"], row["block_last_doc"],
        keep,
    )
    expect_d, expect_t = [], []
    for bi in np.flatnonzero(keep):
        lo, hi = bi * codec.BLOCK_SIZE, min((bi + 1) * codec.BLOCK_SIZE, n)
        expect_d.extend(pos[lo:hi]); expect_t.extend(tfs[lo:hi])
    assert ds.tolist() == expect_d
    assert ts.tolist() == expect_t
