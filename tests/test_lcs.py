"""Suffix-automaton LCS: differential vs an O(n³) brute scorer, the
DuckDB diagonal-runs twin, and the Spark pair path."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from same_same_spark.pipeline.lcs import lcs_of, lcs_pairs, lcs_sql_tail


def _brute(a: str, b: str):
    """Reference scorer under the pinned contract: leftmost maximal
    occurrence in b, leftmost occurrence of that substring in a."""
    best, bs = 0, None
    for j in range(len(b)):
        for ln in range(best + 1, len(b) - j + 1):
            if b[j : j + ln] in a:
                if ln > best:
                    best, bs = ln, j
            else:
                break
    if best == 0:
        return 0, None, None
    return best, a.find(b[bs : bs + best]), bs


def _random_cases(n=300, seed=42):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        sigma = rng.choice(["ab", "abc", "abcd"])
        a = "".join(rng.choice(sigma) for _ in range(rng.randint(0, 30)))
        b = "".join(rng.choice(sigma) for _ in range(rng.randint(0, 30)))
        out.append((a, b))
    return out


def test_lcs_differential_random():
    for a, b in _random_cases():
        assert lcs_of(a, b) == _brute(a, b), (a, b)


@pytest.mark.parametrize(
    "a,b",
    [
        ("abcbc", "cbcab"),  # forces the clone path
        ("", "x"),
        ("x", ""),
        (None, None),
        ("aaaa", "aa"),
        ("xyz", "qrs"),  # disjoint alphabets → lcs 0
        ("banana", "anan"),
        ("mississippi", "issip"),
        ("abab", "baba"),  # two maximal substrings, leftmost wins
    ],
)
def test_lcs_edges(a, b):
    assert lcs_of(a, b) == _brute(a or "", b or "")


def test_lcs_sql_twin_matches_python():
    cases = _random_cases(n=150, seed=7)
    con = duckdb.connect()
    docs = [(2 * t, a) for t, (a, _) in enumerate(cases)]
    docs += [(2 * t + 1, b) for t, (_, b) in enumerate(cases)]
    con.register("d", pd.DataFrame(docs, columns=["doc_id", "text"]))
    con.register(
        "p",
        pd.DataFrame(
            [(2 * t, 2 * t + 1) for t in range(len(cases))],
            columns=["id_a", "id_b"],
        ),
    )
    sql = (
        "WITH dup AS (SELECT * FROM d), pairs AS (SELECT * FROM p), "
        + lcs_sql_tail()
    )
    got = {
        (r[0], r[1]): (
            r[2],
            None if r[3] is None else int(r[3]),
            None if r[4] is None else int(r[4]),
        )
        for r in con.sql(sql).fetchall()
    }
    assert len(got) == len(cases)  # no-match pairs still emit lcs_len 0
    for t, (a, b) in enumerate(cases):
        assert got[(2 * t, 2 * t + 1)] == lcs_of(a, b), (a, b)


def test_lcs_pairs_spark(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a quick brown fox jumped high"),
        (3, "entirely different content here"),
        (4, None),
        (5, "xyz the lazy dog sleeps"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (3, 4)], "id_a LONG, id_b LONG"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["lcs_len"], r["a_start"], r["b_start"])
        for r in lcs_pairs(df, pairs).collect()
    }
    txt = dict(docs)
    for (ia, ib), v in got.items():
        assert v == lcs_of(txt[ia], txt[ib])
    assert got[(1, 2)][0] == len(" quick brown fox jump")
    assert got[(1, 4)] == (0, None, None)  # NULL text → empty
    assert got[(3, 4)] == (0, None, None)
    # substring positions are real: the claimed ranges are identical
    la, sa, sb = got[(1, 5)]
    assert txt[1][sa : sa + la] == txt[5][sb : sb + la]


def test_lcs_pairs_string_ids(spark):
    """String-id corpora are first-class (api.SameSameSpark serves
    them) — the output id columns keep the corpus id type."""
    df = spark.createDataFrame(
        [("a", "hello shared world"), ("b", "shared world again")],
        "doc_id STRING, text STRING",
    )
    pairs = spark.createDataFrame([("a", "b")], "id_a STRING, id_b STRING")
    [r] = lcs_pairs(df, pairs).collect()
    assert (r["id_a"], r["id_b"]) == ("a", "b")
    assert r["lcs_len"] == len("shared world")


def test_lcs_pairs_whole_doc_duplicate(spark):
    df = spark.createDataFrame(
        [(10, "same text"), (11, "same text")], "doc_id LONG, text STRING"
    )
    pairs = spark.createDataFrame([(10, 11)], "id_a LONG, id_b LONG")
    [r] = lcs_pairs(df, pairs).collect()
    assert (r["lcs_len"], r["a_start"], r["b_start"]) == (9, 0, 0)


def test_lcs_strip_removes_measured_overlap(spark):
    """The min-id doc of each pair keeps its text; the other loses the
    pinned occurrence; a doc in several pairs strips the union; the
    remainder is byte-exact."""
    from same_same_spark.pipeline.lcs import lcs_strip

    quote = "TO BE OR NOT TO BE THAT IS THE QUESTION"
    docs = [
        (1, f"intro one {quote} outro one"),
        (2, f"different lead {quote} and different tail"),
        (3, f"{quote} standing nearly alone"),
        (4, "no overlap with anything here at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a LONG, id_b LONG"
    )
    rows = {
        r["doc_id"]: r
        for r in lcs_strip(df, pairs, min_chars=20, with_stats=True).collect()
    }
    assert rows[1]["text"] == docs[0][1]          # canonical untouched
    assert quote not in rows[2]["text"]
    assert quote not in rows[3]["text"]
    assert rows[4]["text"] == docs[3][1]          # lcs < min_chars
    # byte-exactness: remainder = original minus the claimed range —
    # the LCS includes the flanking spaces both docs share
    assert rows[2]["text"] == "different leadand different tail"
    assert rows[2]["removed_chars"] == len(quote) + 2
    assert rows[3]["n_spans_removed"] == 1


def test_lcs_strip_sql_twin_full_value(spark):
    """Spark vs DuckDB twin, full value compare, on pairs that overlap
    within one doc (union stitch) + NULL text + no-match pairs."""
    import duckdb
    import pandas as pd

    from same_same_spark.pipeline.lcs import lcs_strip, lcs_strip_sql_ctes

    docs = [
        (1, "AAAA common-head BBBB common-tail CCCC"),
        (2, "xxxx common-head yyyy"),
        (3, "zzzz common-tail wwww"),
        (4, "AAAA common-head BBBB"),  # overlaps doc 1 twice via 2,3? no — pairs below
        (5, None),
        (6, "totally unrelated content"),
    ]
    pair_rows = [(1, 2), (1, 3), (1, 4), (1, 6), (5, 6)]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    pairs = spark.createDataFrame(pair_rows, "id_a LONG, id_b LONG")
    got = sorted(
        (r["doc_id"], r["text"], r["n_spans_removed"], r["removed_chars"])
        for r in lcs_strip(df, pairs, min_chars=8, with_stats=True).collect()
    )
    con = duckdb.connect()
    con.register("d", pd.DataFrame(docs, columns=["doc_id", "text"]))
    con.register("p", pd.DataFrame(pair_rows, columns=["id_a", "id_b"]))
    sql = (
        "WITH dup AS (SELECT * FROM d), pairs AS (SELECT * FROM p), "
        + lcs_strip_sql_ctes(min_chars=8)
        + " SELECT doc_id, text, n_spans_removed, removed_chars FROM clean"
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
