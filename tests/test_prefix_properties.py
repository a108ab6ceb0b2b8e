"""Property-based check of the prefix-filter lemma (hypothesis):
for ANY document set, any threshold, and any total order on shingles,
the prefix candidates must contain every pair with Jaccard >= t.

This is a pure driver-side model of the logic in
``same_same_spark.pipeline.dedup.prefix_filter_candidates`` — same
prefix-length formula ``|S| - ceil(t*|S|) + 1`` and same
(rarity, shingle) ordering — exercised over random set systems far
more adversarial than the Spark fixtures. The Spark implementation is
differential-tested against the quadratic baseline separately
(test_dedup); this pins the math itself.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

# small universes force heavy shingle sharing (the hard case)
doc_sets = st.lists(
    st.frozensets(st.integers(min_value=0, max_value=12), min_size=1,
                  max_size=8),
    min_size=2,
    max_size=10,
)
thresholds = st.floats(min_value=0.05, max_value=1.0, allow_nan=False)


def prefix_candidates(docs: list[frozenset], t: float) -> set[tuple[int, int]]:
    """Driver-side model of prefix_filter_candidates."""
    df = Counter(x for s in docs for x in s)
    order = sorted(df, key=lambda x: (df[x], x))  # rarity-first
    rank = {x: i for i, x in enumerate(order)}
    prefixes = []
    for s in docs:
        L = len(s) - math.ceil(t * len(s)) + 1
        prefixes.append(set(sorted(s, key=lambda x: rank[x])[:L]))
    cand = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if prefixes[i] & prefixes[j]:
                cand.add((i, j))
    return cand


@given(doc_sets, thresholds)
@settings(max_examples=500, deadline=None)
def test_prefix_lemma_recall(docs, t):
    cand = prefix_candidates(docs, t)
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(docs[i] & docs[j])
            union = len(docs[i] | docs[j])
            if union and inter / union >= t:
                assert (i, j) in cand, (docs[i], docs[j], t)


@given(doc_sets)
@settings(max_examples=200, deadline=None)
def test_prefix_at_t1_is_exact_for_identical_sets(docs):
    # at t=1 the prefix is exactly one (the rarest) shingle; identical
    # sets always share it, so every J=1 pair must be a candidate
    cand = prefix_candidates(docs, 1.0)
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if docs[i] == docs[j]:
                assert (i, j) in cand
