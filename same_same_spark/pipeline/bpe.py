"""Byte-pair-encoding tokenizer TRAINING and encoding over the corpus.

The reference engine tokenizes with a fixed splitter
(`/root/reference/internal/embedders/quotes/local/local.go` lowercase+
split); it has no trainable subword tokenizer. A training-data
pipeline at 100 TB needs one: subword vocabularies are trained on the
corpus being prepared (token budgets, packing and LM training all
count in subword units). This module trains BPE merges (Sennrich et
al. 2016) with Spark aggregations and encodes documents with the
learned merges.

Scale design
------------

- **Word counting is the only corpus-proportional pass** — pretokenize
  with the shared ``textqc.BPE_PATTERN`` regex (JVM-side
  ``regexp_extract_all``), explode, ONE groupBy(word). Everything
  after runs on the word-frequency table, which is vocabulary-sized,
  optionally capped at ``max_words`` by (freq DESC, word ASC) — the
  standard practice: tokenizer trainers run on aggregated counts, not
  raw text.
- **Two trainer modes, bit-identical merges** (differential-tested):

  * ``mode="local"`` (default): collect the bounded word-frequency
    table (an explicitly bounded collect, like vocabulary pruning) and
    run the merge loop in-process. This is how production tokenizer
    trainers work — the distributed work is the counting pass.
  * ``mode="distributed"``: the merge loop stays in Spark — each
    iteration is one explode+groupBy over the word table (never the
    corpus) with a deterministic argmax (count DESC, pair ASC) and a
    pure-column greedy fold applying the merge;
    ``localCheckpoint()`` per iteration truncates the growing plan.
    Use when the word table must not fit on the driver.

- **Encoding** pretokenizes JVM-side (same regex — trainer and encoder
  share one pretokenizer *engine*, not two lookalike regex dialects)
  and applies merges in an Arrow-batched pandas UDF with a per-batch
  distinct-word cache. The merge loop is inherently sequential per
  word, so this is the documented UDF slow path; the ``a+b in word``
  substring prefilter skips non-applicable merges at C speed.

Determinism contract
--------------------

- Symbols are **Unicode code points**: Spark's ``split(col, "")``
  (Java 9+ empty-match regex never cuts a surrogate pair), DuckDB's
  ``string_split(col, '')`` and Python's ``list(word)`` all agree —
  pinned by an astral-plane test — so local/distributed training and
  encoding match exactly.
- Merge ``(a, b)`` applies greedily left-to-right (``aaa`` + merge
  ``(a,a)`` → ``[aa, a]``) — the same fold in the Spark column
  expression, the local trainer and the encoder.
- :meth:`BpeModel.encode_word` applies merges **in training order**
  (not min-rank-first): that is by construction identical to the
  symbol sequences the trainer produced, including the corner where a
  later merge re-creates an earlier merge's pair adjacency (a
  min-rank-first encoder would re-apply it; the trainer did not).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from same_same_spark.pipeline.textqc import BPE_PATTERN

__all__ = [
    "BpeModel",
    "word_counts",
    "initial_pair_counts",
    "initial_pair_counts_sql",
    "train_bpe",
    "bpe_encode",
]


def _units(word: str) -> list[str]:
    """Initial symbols: Unicode code points — exactly what Spark's
    ``split(col, "")`` and DuckDB's ``string_split(col, '')`` produce
    (neither cuts a surrogate pair; pinned in tests/test_bpe.py)."""
    return list(word)


def _apply_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right application of one merge — the Python twin
    of the Spark fold in :func:`_merge_col`."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _merge_col(syms: Column, a: str, b: str) -> Column:
    """Spark column twin of :func:`_apply_merge`."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == la) & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(la, lb))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


@dataclass
class BpeModel:
    """An ordered merge list. ``merges[k]`` was learned at rank ``k``;
    encoding applies them in that order (see the determinism contract
    in the module docstring)."""

    merges: list[tuple[str, str]] = field(default_factory=list)

    def encode_word(self, word: str) -> list[str]:
        syms = _units(word)
        if len(syms) < 2:
            return syms
        for a, b in self.merges:
            # concatenation invariant: ''.join(syms) == word, so a
            # merge can only apply if its fused string occurs in word
            if a + b not in word:
                continue
            syms = _apply_merge(syms, a, b)
            if len(syms) < 2:
                break
        return syms

    @property
    def vocab(self) -> list[str]:
        """Merge-produced symbols in rank order (single code units are
        implicit — byte/char fallback is total by construction)."""
        return [a + b for a, b in self.merges]


def pretokens_col(text: Column | str) -> Column:
    """JVM-side pretokenizer: word runs + individual symbols
    (``textqc.BPE_PATTERN`` — the same class the BPE-ish token count
    uses, so trained-subword counts and the cheap proxy count are
    over one pretoken stream)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def word_counts(
    df: DataFrame, text_col: str = "text", max_words: int | None = None
) -> DataFrame:
    """(word, freq) — the ONE corpus-proportional aggregation.
    ``max_words`` caps the table at the most frequent words
    (freq DESC, word ASC — deterministic)."""
    wc = (
        df.select(F.explode(pretokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if max_words is not None:
        wc = wc.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)
    return wc


def initial_pair_counts(
    df: DataFrame, text_col: str = "text", top: int = 100
) -> DataFrame:
    """The trainer's first-iteration statistics: adjacent-symbol pair
    frequencies over the word table (symbols = code points). This is
    the SQL-expressible foundation the iterative trainer builds on —
    cross-engine pinned via :func:`initial_pair_counts_sql`."""
    wc = word_counts(df, text_col)
    syms = F.split(F.col("word"), "")
    pairs = wc.select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(syms) - 2),
                lambda i: F.struct(
                    F.element_at(syms, i + 1).alias("a"),
                    F.element_at(syms, i + 2).alias("b"),
                ),
            )
        ).alias("p"),
    ).where(F.size(syms) >= 2)
    return (
        pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(top)
    )


def initial_pair_counts_sql(
    table: str = "documents", col_expr: str = "text", top: int = 100
) -> str:
    """DuckDB twin of :func:`initial_pair_counts` (parallel unnest of
    the two shifted slices zips adjacent pairs)."""
    return f"""
WITH words AS (
  SELECT unnest(regexp_extract_all({col_expr}, '{BPE_PATTERN}')) AS word
  FROM {table}
), wc AS (
  SELECT word, count(*)::BIGINT AS freq FROM words GROUP BY word
), syms AS (
  SELECT freq, string_split(word, '') AS s FROM wc
), pairs AS (
  SELECT unnest(s[1:len(s)-1]) AS a, unnest(s[2:len(s)]) AS b, freq
  FROM syms WHERE len(s) >= 2
)
SELECT a, b, sum(freq)::BIGINT AS cnt FROM pairs
GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT {top}
"""


def _train_on_counts(
    counts: list[tuple[str, int]], n_merges: int, min_pair_freq: int
) -> list[tuple[str, str]]:
    """The in-process merge loop over an aggregated word-frequency
    table — same statistics, argmax tie-break and greedy fold as the
    distributed mode."""
    syms = {w: _units(w) for w, _ in counts}
    freqs = dict(counts)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            f = freqs[w]
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                pc[k] = pc.get(k, 0) + f
        if not pc:
            break
        (a, b), best = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if best < min_pair_freq:
            break
        merges.append((a, b))
        for w in list(syms):
            if a + b in w:
                syms[w] = _apply_merge(syms[w], a, b)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    max_words: int | None = None,
    min_pair_freq: int = 2,
    mode: str = "local",
    log=None,
) -> BpeModel:
    """Train ``n_merges`` BPE merges over ``df[text_col]``.

    ``mode="local"`` collects the (bounded — set ``max_words``)
    word-frequency table and loops in-process; ``mode="distributed"``
    keeps the loop in Spark (one vocab-sized explode+groupBy per
    merge). Both produce identical merge lists (pinned in
    tests/test_bpe.py). Training stops early when no adjacent pair
    reaches ``min_pair_freq``.
    """
    wc = word_counts(df, text_col, max_words=max_words)
    if mode == "local":
        rows = wc.collect()  # bounded: vocabulary-sized, capped by
        # max_words — the trainer's contract, like prune_vocabulary
        return BpeModel(
            _train_on_counts(
                [(r["word"], r["freq"]) for r in rows],
                n_merges,
                min_pair_freq,
            )
        )
    if mode != "distributed":
        raise ValueError(f"unknown mode {mode!r}")

    state = wc.withColumn("syms", F.split(F.col("word"), ""))
    state = state.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        syms = F.col("syms")
        pairs = (
            state.where(F.size(syms) >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size(syms) - 2),
                        lambda i: F.struct(
                            F.element_at(syms, i + 1).alias("a"),
                            F.element_at(syms, i + 2).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["cnt"] < min_pair_freq:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))
        if log:
            log(f"[bpe] merge {it}: ({a!r},{b!r}) cnt={pairs[0]['cnt']}")
        nxt = state.withColumn("syms", _merge_col(F.col("syms"), a, b))
        nxt = nxt.localCheckpoint(eager=True)
        state.unpersist()
        state = nxt
    state.unpersist()
    return BpeModel(merges)


def bpe_encode(
    df: DataFrame,
    model: BpeModel,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col`` (array<string> of subword tokens) and
    ``n_subwords``. Pretokenization runs JVM-side (the same engine the
    trainer counted with); the merge loop runs in an Arrow-batched
    pandas UDF with a per-batch distinct-word cache."""
    merges = list(model.merges)

    @F.pandas_udf(ArrayType(StringType()))
    def _enc(words: pd.Series) -> pd.Series:
        m = BpeModel(merges)
        cache: dict[str, list[str]] = {}

        def one(ws):
            if ws is None:
                return None
            out: list[str] = []
            for w in ws:
                got = cache.get(w)
                if got is None:
                    got = cache[w] = m.encode_word(w)
                out.extend(got)
            return out

        return words.map(one)

    out = df.withColumn(out_col, _enc(pretokens_col(text_col)))
    return out.withColumn(
        "n_subwords", F.coalesce(F.size(out_col), F.lit(0)).cast("bigint")
    )
