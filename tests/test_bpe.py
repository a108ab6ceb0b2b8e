"""BPE tokenizer training + encoding (pipeline/bpe.py).

The load-bearing checks:
- local and distributed trainers produce IDENTICAL merge lists,
- both match an independently-written reference trainer,
- the encoder reproduces the trainer's final symbol table exactly,
- symbols are Unicode code points (Spark/DuckDB/Python split parity),
- the pretokenizer and pair statistics agree with the DuckDB twins.
"""

from __future__ import annotations

from collections import Counter

import duckdb
from pyspark.sql import functions as F

from same_same_spark.pipeline import bpe
from same_same_spark.pipeline.bpe import (
    BpeModel,
    _apply_merge,
    _train_on_counts,
    _units,
)


# --- independent reference trainer (deliberately different shape:
# Counter-based stats, regex-free list merging, max-key selection) ---

def _ref_train(word_freqs: dict[str, int], n_merges: int, min_freq: int = 2):
    tables = {w: _ref_units(w) for w in word_freqs}
    out = []
    for _ in range(n_merges):
        stats: Counter = Counter()
        for w, f in word_freqs.items():
            s = tables[w]
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] += f
        if not stats:
            break
        # argmax by count, ties broken by the lexicographically
        # smallest pair — via sorting the top-count candidates
        top = max(stats.values())
        if top < min_freq:
            break
        cands = sorted(k for k, v in stats.items() if v == top)
        pair = cands[0]
        out.append(pair)
        for w in tables:
            s = tables[w]
            merged, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == pair:
                    merged.append(s[i] + s[i + 1])
                    i += 2
                else:
                    merged.append(s[i])
                    i += 1
            tables[w] = merged
    return out, tables


def _ref_units(w: str) -> list[str]:
    return [c for c in w]


def test_units_match_spark_split(spark):
    # symbols are code points: Java 9+ empty-match split never cuts a
    # surrogate pair, matching Python list() exactly
    tricky = "abé中\U0001f600z"  # BMP accents, CJK, astral
    [r] = spark.createDataFrame([(tricky,)], "w STRING").select(
        F.split("w", "").alias("s")
    ).collect()
    assert r["s"] == _units(tricky)
    assert _units("\U0001f600") == ["\U0001f600"]  # astral stays whole


def test_apply_merge_greedy_left_to_right():
    assert _apply_merge(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _apply_merge(["a", "b", "a", "a", "b"], "a", "b") == [
        "ab", "a", "ab",
    ]
    assert _apply_merge(["x"], "a", "b") == ["x"]
    assert _apply_merge([], "a", "b") == []


def test_local_trainer_matches_independent_reference():
    wf = {
        "lower": 10, "newest": 6, "widest": 3, "low": 7, "er": 1,
        "foo__bar": 4, "aaa": 5, "!": 9,
    }
    got = _train_on_counts(list(wf.items()), n_merges=12, min_pair_freq=2)
    ref, _ = _ref_train(wf, 12)
    assert got == ref and len(got) > 3


def test_encoder_reproduces_trainer_symbol_table():
    wf = {"lower": 10, "newest": 6, "widest": 3, "lowest": 4, "aaa": 5}
    merges = _train_on_counts(list(wf.items()), n_merges=15, min_pair_freq=1)
    _, ref_tables = _ref_train(wf, 15, min_freq=1)
    model = BpeModel(merges)
    for w in wf:
        assert model.encode_word(w) == ref_tables[w], w
        assert "".join(model.encode_word(w)) == w  # concat invariant


def test_encode_word_edge_cases():
    m = BpeModel([])
    assert m.encode_word("abc") == ["a", "b", "c"]  # 0 merges = units
    assert m.encode_word("") == []
    assert m.encode_word("x") == ["x"]
    m2 = BpeModel([("a", "b"), ("ab", "c")])
    assert m2.encode_word("abc") == ["abc"]
    assert m2.encode_word("abd") == ["ab", "d"]
    assert m2.encode_word("zzz") == ["z", "z", "z"]


def test_trainer_modes_identical(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(150)
    m_local = bpe.train_bpe(docs, n_merges=8, mode="local")
    m_dist = bpe.train_bpe(docs, n_merges=8, mode="distributed")
    assert m_local.merges == m_dist.merges
    assert len(m_local.merges) == 8


def test_train_respects_min_pair_freq_and_max_words(spark):
    df = spark.createDataFrame(
        [(1, "qq ww ee"), (2, "rr tt yy")], "doc_id LONG, text STRING"
    )
    # every pair occurs exactly once → min_pair_freq=2 learns nothing
    assert bpe.train_bpe(df, n_merges=5, min_pair_freq=2).merges == []
    # max_words caps the table before training: only the most frequent
    # word ("zz zz" twice) survives, so only its pair is learnable
    df2 = spark.createDataFrame(
        [(1, "zz zz qk"), (2, "zz qk")], "doc_id LONG, text STRING"
    )
    m = bpe.train_bpe(df2, n_merges=5, max_words=1, min_pair_freq=2)
    assert m.merges == [("z", "z")]


def test_bpe_encode_dataframe(spark):
    docs = spark.createDataFrame(
        [
            (1, "lower lower newest"),
            (2, "the lower, newest!"),
            (3, None),
            (4, ""),
        ],
        "doc_id LONG, text STRING",
    )
    model = BpeModel([("l", "o"), ("lo", "w"), ("n", "e")])
    out = {
        r["doc_id"]: r
        for r in bpe.bpe_encode(docs, model).collect()
    }
    # same word encodes identically wherever it appears (cache path)
    assert out[1]["bpe_tokens"][:3] == ["low", "e", "r"]
    # pretokens of doc 2: the | lower | , | newest | ! — "lower"
    # starts after the 3 tokens of "the"
    assert out[2]["bpe_tokens"][3:6] == ["low", "e", "r"]
    # punctuation pretokens are standalone symbols
    assert "," in out[2]["bpe_tokens"] and "!" in out[2]["bpe_tokens"]
    assert out[3]["bpe_tokens"] is None and out[3]["n_subwords"] == 0
    assert out[4]["bpe_tokens"] == [] and out[4]["n_subwords"] == 0
    assert out[1]["n_subwords"] == len(out[1]["bpe_tokens"])
    # concat invariant over the whole doc: joined tokens == joined
    # pretokens
    assert "".join(out[2]["bpe_tokens"]) == "thelower,newest!"


def test_pretokens_and_pair_counts_oracle_parity(spark):
    texts = [
        (1, "foo.bar_1 baz  baz\tqux!"),
        (2, "Mixed CASE and 123 numbers..."),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    got_pre = df.select(
        "doc_id", bpe.pretokens_col("text").alias("p")
    ).orderBy("doc_id").collect()
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    oracle_pre = con.execute(
        "SELECT doc_id, regexp_extract_all(text, "
        f"'{bpe.BPE_PATTERN}') AS p FROM documents ORDER BY doc_id"
    ).fetchall()
    for a, b in zip(got_pre, oracle_pre):
        assert (a["doc_id"], a["p"]) == tuple(b)

    got = bpe.initial_pair_counts(df, top=100).collect()
    oracle = con.execute(
        bpe.initial_pair_counts_sql("documents", "text", 100)
    ).fetchall()
    assert len(got) == len(oracle) > 5
    for g, o in zip(got, oracle):
        assert (g["a"], g["b"], g["cnt"]) == tuple(o)


def test_entry_bpe_encode_deterministic(spark):
    # the rows-only driver entry still has a strong local contract:
    # deterministic end-to-end (train+encode twice → identical), one
    # output row per document
    import __spark_entry__ as entrymod

    fn = entrymod.queries()["bpe_encode"]
    a = fn(spark, "/root/testdata/sf0.001").collect()
    b = fn(spark, "/root/testdata/sf0.001").collect()
    assert a == b
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert len(a) == n_docs
    assert all(r["n_subwords"] > 0 and r["head_subwords"] for r in a)


def test_bpe_counts_drive_packing_and_quota(spark):
    # subword counts are a first-class budget unit: feed n_subwords
    # into sequence packing and quota sampling
    from same_same_spark.pipeline.pack import pack_sequences
    from same_same_spark.pipeline.sampling import sample_quota

    docs = spark.createDataFrame(
        [(i, "lower newest " * (i + 1), "en") for i in range(6)],
        "doc_id LONG, text STRING, lang STRING",
    )
    model = BpeModel([("l", "o"), ("lo", "w"), ("n", "e")])
    enc = bpe.bpe_encode(docs, model)
    packed = pack_sequences(
        enc, seq_len=16, token_count=F.col("n_subwords"), n_shards=1
    )
    collected = packed.collect()
    rows = {r["doc_id"]: r for r in collected}
    # doc i has (i+1) * ("low","e","r" + "ne","w","e","s","t") = 8
    # subwords per repeat; the packer must see those counts
    assert rows[0]["n_tokens"] == 8 and rows[2]["n_tokens"] == 24
    # layout invariant regardless of the packer's hash order: start
    # positions (pack_id*seq_len + offset) are the cumulative subword
    # sums in layout order
    in_order = sorted(
        collected, key=lambda r: r["pack_id"] * 16 + r["pack_offset"]
    )
    pos, want = 0, []
    for r in in_order:
        want.append(pos)
        pos += r["n_tokens"]
    got = [r["pack_id"] * 16 + r["pack_offset"] for r in in_order]
    assert got == want

    kept = sample_quota(
        enc, {"en": 20.0}, weight_col="n_subwords", seed="s"
    )
    total = sum(r["n_subwords"] for r in kept.collect())
    # quota is an expected budget, not an exact cap — but it must bind
    full = sum(r["n_subwords"] for r in enc.collect())
    assert total < full
