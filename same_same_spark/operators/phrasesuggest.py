"""Phrase suggester — whole-phrase spelling correction ranked by a
corpus language model (Elasticsearch's ``phrase`` suggester).

A beyond-reference fulltext feature composing two verified pieces: the
SymSpell deletion-neighborhood term suggester (operators/spell.py) for
per-term candidates, and the add-alpha bigram LM (pipeline/lm.py, the
CCNet gate's model) for whole-phrase ranking — "did you mean *fast
merge join*" instead of per-term corrections that read as gibberish
together. The reference engine has no suggesters at all
(`internal/search/` ships scoring only).

Pinned semantics (cross-engine, re-derived in
:func:`duckdb_phrase_suggest_sql` for 2-term phrases and brute-forced
in tests for longer ones):

- the input phrase tokenizes with X1; phrases with < 2 tokens yield
  NO rows (single terms are the term suggester's job — route to
  ``spell.suggest_terms``);
- per input term, the candidate set is ``{original term}`` ∪ the top
  ``max_term_candidates`` vocabulary terms within ``max_edits``
  Damerau-free Levenshtein under ``(distance ASC, df DESC, term
  ASC)`` (the term suggester's pinned order) — the original is ALWAYS
  a candidate even when out-of-vocabulary (ES keeps the input as a
  scorable candidate), duplicates collapse;
- candidate phrases are the cross product of per-term candidate sets
  (bounded by ``(max_term_candidates + 1) ** n_terms``; guarded —
  phrases longer than ``max_terms`` tokens are rejected, the ES
  breaker);
- phrase score = ``Σ ln((c(w1,w2) + α) / (c(w1) + α·V))`` over the
  phrase's consecutive token pairs — the engine's ONE pinned add-alpha
  bigram formula (pipeline/lm.py; same α default, same V = distinct
  unigram count), trained on the full ``docs_df`` unless a
  pre-trained :class:`~same_same_spark.pipeline.lm.BigramLM` is
  passed;
- top ``topn`` suggestions per query under ``(round(score, 9) DESC,
  suggestion ASC)``; the original phrase itself may rank (and
  usually wins when it is well-formed corpus language — callers
  filter it out when they only want corrections).

Scale shape: the vocabulary candidate join is the term suggester's
SymSpell hash join (never a cross join against the vocab); the
candidate PHRASE table is coordinator-built (ES does the same on the
coordinating node) from a bounded collect of ``distinct terms ×
max_term_candidates`` suggestion rows; LM scoring is one explode +
broadcast join against the LM count tables + a map-side-combined sum
— queries × candidates rows end to end, independent of corpus size.
"""

from __future__ import annotations

from itertools import product

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.pipeline.lm import (
    ALPHA_DEFAULT,
    BigramLM,
    _bigram_pairs,
    train_bigram_lm,
)
from same_same_spark.operators.spell import suggest_terms, vocab_from_docs
from same_same_spark.text.tokenizer import tokenize_py

__all__ = ["phrase_suggest", "duckdb_phrase_suggest_sql"]


def _term_candidates(
    docs_df: DataFrame,
    terms: list[str],
    max_edits: int,
    max_term_candidates: int,
    id_col: str,
    text_col: str,
) -> dict[str, list[str]]:
    """{term: sorted candidate set} — original ∪ top suggestions.
    Bounded collect: distinct terms × max_term_candidates rows."""
    vocab = vocab_from_docs(docs_df, id_col=id_col, text_col=text_col)
    sugg = suggest_terms(
        vocab, terms, max_edits=max_edits, topn=max_term_candidates
    ).collect()
    cands: dict[str, set[str]] = {t: {t} for t in terms}
    for r in sugg:
        cands[r["query_term"]].add(r["suggestion"])
    return {t: sorted(s) for t, s in cands.items()}


def phrase_suggest(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    topn: int = 3,
    max_edits: int = 1,
    max_term_candidates: int = 3,
    max_terms: int = 5,
    lm: BigramLM | None = None,
    alpha: float = ALPHA_DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Top-``topn`` whole-phrase corrections per query (see module
    docstring for the pinned semantics).

    Returns (query_id INT, suggestion STRING, score DOUBLE, rank INT).
    """
    if topn < 1:
        raise ValueError(f"topn must be >= 1, got {topn}")
    if max_term_candidates < 1:
        raise ValueError(
            f"max_term_candidates must be >= 1, got {max_term_candidates}"
        )
    spark = docs_df.sparkSession
    empty = spark.createDataFrame(
        [], "query_id INT, suggestion STRING, score DOUBLE, rank INT"
    )
    qtoks: dict[int, list[str]] = {}
    for qid, text in queries:
        toks = tokenize_py(text)
        if len(toks) > max_terms:
            raise ValueError(
                f"phrase has {len(toks)} terms; max_terms={max_terms}"
            )
        if len(toks) >= 2:
            qtoks[qid] = toks
    if not qtoks:
        return empty

    all_terms = sorted({t for toks in qtoks.values() for t in toks})
    cands = _term_candidates(
        docs_df, all_terms, max_edits, max_term_candidates,
        id_col, text_col,
    )
    rows = [
        (qid, list(combo))
        for qid, toks in sorted(qtoks.items())
        for combo in product(*(cands[t] for t in toks))
    ]
    cand_df = spark.createDataFrame(
        rows, "query_id INT, toks ARRAY<STRING>"
    )

    model = lm if lm is not None else train_bigram_lm(
        docs_df, text_col=text_col, alpha=alpha
    )
    uni = model.unigrams
    bi = model.bigrams
    if model.broadcast:
        uni, bi = F.broadcast(uni), F.broadcast(bi)
    a = float(model.alpha)
    v = float(model.vocab_size)

    pairs = cand_df.select(
        "query_id",
        F.array_join("toks", " ").alias("suggestion"),
        F.explode(_bigram_pairs(F.col("toks"))).alias("p"),
    ).select(
        "query_id",
        "suggestion",
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
    )
    scored = (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .select(
            "query_id",
            "suggestion",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0.0)) + F.lit(a))
                / (F.coalesce(F.col("c1"), F.lit(0.0)) + F.lit(a * v))
            ).alias("lp"),
        )
        .groupBy("query_id", "suggestion")
        .agg(F.sum("lp").alias("score"))
    )
    # bounded per-query candidate count -> the sort_array tournament
    entry = F.struct(
        (-F.round(F.col("score"), 9)).alias("nk"),
        F.col("suggestion").alias("suggestion"),
        F.col("score").alias("score"),
    )
    top = scored.groupBy("query_id").agg(
        F.slice(
            F.sort_array(F.collect_list(entry)), 1, topn
        ).alias("top")
    )
    return top.select(
        "query_id", F.posexplode("top").alias("pos", "s")
    ).select(
        "query_id",
        F.col("s.suggestion").alias("suggestion"),
        F.col("s.score").alias("score"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


def duckdb_phrase_suggest_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    topn: int = 3,
    max_edits: int = 1,
    max_term_candidates: int = 3,
    alpha: float = ALPHA_DEFAULT,
) -> str:
    """DuckDB twin of :func:`phrase_suggest` for TWO-TERM phrases —
    candidates re-derived by the BRUTE-FORCE vocab scan (every vocab
    term × each input term through ``levenshtein``, the spell-suggest
    differential strategy, verifying SymSpell recall), the LM counts
    re-derived relationally (the lm_perplexity CTE chain), and the
    cross product spelled as a join of the two per-term candidate
    sets. Queries whose phrase is not exactly 2 tokens are untwinned
    here (the Spark side pins longer phrases against a Python brute
    force in tests) — passing one raises."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    qrows = []
    for qid, text in queries:
        toks = tokenize_py(text)
        if len(toks) == 0:
            continue  # no-token queries yield no rows on both sides
        if len(toks) != 2:
            raise ValueError(
                f"2-term twin only; query {qid} has {len(toks)} terms"
            )
        qrows.append(f"({int(qid)}, '{toks[0]}', '{toks[1]}')")
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL, NULL) LIMIT 0"
    t = duckdb_tokens_sql(text_col)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {t} AS tokens FROM {table}
),
vocab AS (
  SELECT term, count(*) AS df
  FROM (SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks)
  GROUP BY term
),
q AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, t1, t2)),
qterm AS (
  SELECT DISTINCT t1 AS term FROM q
  UNION SELECT DISTINCT t2 FROM q
),
sugg AS (
  SELECT query_term, suggestion FROM (
    SELECT q.term AS query_term, v.term AS suggestion,
           row_number() OVER (
             PARTITION BY q.term
             ORDER BY levenshtein(q.term, v.term) ASC, v.df DESC,
                      v.term ASC
           ) AS rnk
    FROM qterm q CROSS JOIN vocab v
    WHERE levenshtein(q.term, v.term) <= {int(max_edits)}
  ) WHERE rnk <= {int(max_term_candidates)}
),
cand AS (
  SELECT query_term, suggestion FROM sugg
  UNION
  SELECT term, term FROM qterm
),
phrases AS (
  SELECT q.query_id, c1.suggestion AS w1, c2.suggestion AS w2
  FROM q
  JOIN cand c1 ON c1.query_term = q.t1
  JOIN cand c2 ON c2.query_term = q.t2
),
uni AS (
  SELECT w1, count(*)::DOUBLE AS c1
  FROM (SELECT unnest(tokens) AS w1 FROM toks WHERE len(tokens) > 0)
  GROUP BY 1
),
v AS (SELECT count(*)::DOUBLE AS vs FROM uni),
bi AS (
  SELECT w1, w2, count(*)::DOUBLE AS c2
  FROM (
    SELECT tokens[i] AS w1, tokens[i + 1] AS w2
    FROM toks, unnest(range(1, len(tokens))) AS u(i)
  )
  GROUP BY 1, 2
),
scored AS (
  SELECT p.query_id, p.w1 || ' ' || p.w2 AS suggestion,
         ln((coalesce(b.c2, 0) + {float(alpha)!r})
            / (coalesce(u.c1, 0)
               + {float(alpha)!r} * (SELECT vs FROM v))) AS score
  FROM phrases p
  LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
  LEFT JOIN uni u ON u.w1 = p.w1
),
ranked AS (
  SELECT query_id, suggestion, score, row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(score, 9) DESC, suggestion ASC
  ) AS rank
  FROM scored
)
SELECT query_id, suggestion, round(score, 6) AS score,
       rank::INTEGER AS rank
FROM ranked WHERE rank <= {int(topn)}
"""
