"""Intervals query — nested positional matching (Elasticsearch's
``intervals`` query, Lucene's minimal-interval algebra re-expressed).

The positional family so far matches FLAT term lists (phrase /
proximity / span_near / span_first); ``intervals`` composes them:
"``fast merge`` as a phrase, then within 3 positions one of ``sort``
or ``join``" is one nested rule. Pinned rule grammar (dicts):

- ``{"match": {"query": str, "ordered": bool = True,
  "max_gaps": int = 0}}`` — the query tokenizes with X1; an interval
  is a set of DISTINCT positions, one per term (duplicate query terms
  need that many distinct occurrences), in order when ``ordered``;
  its envelope ``[min, max]`` must satisfy the SLACK rule below;
- ``{"all_of": {"intervals": [rule...], "ordered": bool = True,
  "max_gaps": int = 0}}`` — pick one interval per child;
  children must be pairwise NON-OVERLAPPING (envelope-disjoint),
  consecutive when ``ordered`` (each child's envelope ends before the
  next begins); the combined envelope obeys the slack rule;
- ``{"any_of": {"intervals": [rule...]}}`` — union of the children's
  intervals.

Pinned SLACK rule (one definition for leaves and combiners):
``envelope_width - covered_positions <= max_gaps``, where covered =
the member positions (leaves) or the children's envelope widths
(all_of). A doc matches the query iff >= 1 interval of the root rule
exists. This is a deliberate simplification of Lucene's lazy minimal
iterators — minimality is irrelevant for MATCHING (existence is
existence), and the slack rule makes nested gap budgets explicit.

Pinned scoring (the query_string precedent): a matching doc scores
``Σ w(t, d)`` — the engine's pinned BM25 weight — over the rule's
DISTINCT terms the doc contains; top-k under ``(round(score, 9)
DESC, doc_id ASC)``.

Scale shape: candidate docs prefilter column-side on the rule's
REQUIRED terms (match → all its terms; all_of → union of children;
any_of → none — it falls back to any-term) before positions ever
leave the JVM; the interval engine then verifies candidates in
Arrow-batched ``mapInPandas`` (pure Python per doc, bounded by the
per-doc product guard — interval algebra is genuinely imperative, the
documented custom-operator slot (b)); scores ride the standard
broadcast posting join. Entry oracles hand-translate fixed rules into
positional SQL (EXISTS over unnest(range()) — the span_near oracle
strategy); tests also pin hand-computed cases.
"""

from __future__ import annotations

from itertools import product as _iproduct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT, scored_matches
from same_same_spark.operators.topk import topk_per_query
from same_same_spark.text.tokenizer import tokenize_py, tokens_col

__all__ = [
    "intervals_search",
    "rule_intervals_py",
    "rule_matches_py",
    "rule_terms",
    "required_terms",
]

_MAX_COMBOS = 4096  # per-doc product guard


def _norm(rule: dict) -> tuple[str, dict]:
    kinds = [k for k in ("match", "all_of", "any_of") if k in rule]
    if len(kinds) != 1:
        raise ValueError(
            "rule needs exactly one of match/all_of/any_of, got "
            f"{sorted(rule)}"
        )
    return kinds[0], rule[kinds[0]]


def rule_terms(rule: dict) -> set[str]:
    """All X1 terms anywhere in the rule (the scoring set)."""
    kind, spec = _norm(rule)
    if kind == "match":
        return set(tokenize_py(spec["query"]))
    out: set[str] = set()
    for child in spec["intervals"]:
        out |= rule_terms(child)
    return out


def required_terms(rule: dict) -> set[str]:
    """Terms every match MUST contain (the candidate prefilter)."""
    kind, spec = _norm(rule)
    if kind == "match":
        return set(tokenize_py(spec["query"]))
    if kind == "all_of":
        out: set[str] = set()
        for child in spec["intervals"]:
            out |= required_terms(child)
        return out
    return set()  # any_of requires nothing in particular


def _slack_ok(lo: int, hi: int, covered: int, max_gaps: int) -> bool:
    return (hi - lo + 1) - covered <= max_gaps


def rule_intervals_py(rule: dict, toks: list[str]) -> list[tuple]:
    """All (start, end, covered) envelopes of ``rule`` in ``toks`` —
    the reference interval engine (pure Python; also runs inside the
    Arrow batches). ``covered`` feeds the parent's slack rule."""
    kind, spec = _norm(rule)
    if kind == "match":
        terms = tokenize_py(spec["query"])
        if not terms:
            return []
        ordered = bool(spec.get("ordered", True))
        max_gaps = int(spec.get("max_gaps", 0))
        pos = [
            [i for i, t in enumerate(toks) if t == q] for q in terms
        ]
        if any(not p for p in pos):
            return []
        n_combo = 1
        for p in pos:
            n_combo *= len(p)
            if n_combo > _MAX_COMBOS:
                raise ValueError(
                    "interval combination bound exceeded "
                    f"({n_combo} > {_MAX_COMBOS}); tighten the rule"
                )
        out = set()
        for combo in _iproduct(*pos):
            if len(set(combo)) != len(combo):
                continue  # duplicate terms need distinct positions
            if ordered and list(combo) != sorted(combo):
                continue
            lo, hi = min(combo), max(combo)
            if _slack_ok(lo, hi, len(combo), max_gaps):
                out.add((lo, hi, len(combo)))
        return sorted(out)
    if kind == "any_of":
        out = set()
        for child in spec["intervals"]:
            out.update(rule_intervals_py(child, toks))
        return sorted(out)
    # all_of
    ordered = bool(spec.get("ordered", True))
    max_gaps = int(spec.get("max_gaps", 0))
    children = [
        rule_intervals_py(c, toks) for c in spec["intervals"]
    ]
    if any(not c for c in children):
        return []
    n_combo = 1
    for c in children:
        n_combo *= len(c)
        if n_combo > _MAX_COMBOS:
            raise ValueError(
                "interval combination bound exceeded "
                f"({n_combo} > {_MAX_COMBOS}); tighten the rule"
            )
    out = set()
    for combo in _iproduct(*children):
        ivs = sorted(combo)
        # pairwise envelope-disjoint
        if any(
            ivs[i][1] >= ivs[i + 1][0] for i in range(len(ivs) - 1)
        ):
            continue
        if ordered and list(combo) != ivs:
            continue
        lo, hi = ivs[0][0], ivs[-1][1]
        covered = sum(c[1] - c[0] + 1 for c in combo)
        if _slack_ok(lo, hi, covered, max_gaps):
            out.add((lo, hi, covered))
    return sorted(out)


def rule_matches_py(rule: dict, toks: list[str]) -> bool:
    return bool(rule_intervals_py(rule, toks))


def intervals_search(
    docs_df: DataFrame,
    queries: list[tuple[int, dict]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k intervals retrieval for (query_id, rule) pairs (see
    module docstring). Returns (query_id INT, doc_id, score DOUBLE,
    rank INT)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import pandas as pd

    rules = []
    for qid, rule in queries:
        _norm(rule)  # validate shape early, driver-side
        if rule_terms(rule):
            rules.append((qid, rule))
    spark = docs_df.sparkSession
    id_type = dict(docs_df.dtypes)[id_col]
    if not rules:
        return spark.createDataFrame(
            [],
            f"query_id INT, doc_id {id_type}, score DOUBLE, rank INT",
        )

    docs_t = docs_df.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("tokens")
    )
    # candidate prefilter: required terms (all present), else any term
    conds = []
    for _, rule in rules:
        req = sorted(required_terms(rule))
        if req:
            cond = F.array_contains("tokens", req[0])
            for t in req[1:]:
                cond = cond & F.array_contains("tokens", t)
        else:
            terms = sorted(rule_terms(rule))
            cond = F.array_contains("tokens", terms[0])
            for t in terms[1:]:
                cond = cond | F.array_contains("tokens", t)
        conds.append(cond)
    any_cond = conds[0]
    for c in conds[1:]:
        any_cond = any_cond | c
    cands = docs_t.filter(any_cond)

    rules_local = list(rules)

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out_q, out_d = [], []
            for did, toks in zip(pdf["doc_id"], pdf["tokens"]):
                tl = list(toks)
                for qid, rule in rules_local:
                    if rule_matches_py(rule, tl):
                        out_q.append(qid)
                        out_d.append(did)
            yield pd.DataFrame({"query_id": out_q, "doc_id": out_d})

    matched = cands.mapInPandas(
        verify, schema=f"query_id INT, doc_id {id_type}"
    )
    scores = scored_matches(
        docs_df,
        [(qid, " ".join(sorted(rule_terms(r)))) for qid, r in rules],
        id_col=id_col,
        text_col=text_col,
        k1=k1,
        b=b,
    )
    scored = matched.join(scores, ["query_id", "doc_id"], "left").select(
        "query_id",
        "doc_id",
        F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
    )
    return topk_per_query(scored, k)
