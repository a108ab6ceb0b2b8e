"""Lucene-style query-string language — one string, full boolean
retrieval (Elasticsearch's ``query_string`` query).

A beyond-reference fulltext feature: the reference's search accepts a
bag of words only (`internal/storage/search/search.go:16-42`); power
users write ``fast AND (merge OR sort) -slow lang:en "exact phrase"``.
This module parses that language driver-side and compiles it to PURE
COLUMN logic — no UDFs, one corpus scan.

Pinned grammar (recursive descent, spelled in :func:`parse_query`):

- ``OR`` (lowest precedence), ``AND``, then unary ``NOT`` / ``-``;
  parentheses group; the IMPLICIT operator between adjacent clauses
  is OR (ES's default_operator) — EXCEPT that an implicitly-joined
  NOT/- clause is a Lucene prohibited clause and SUBTRACTS from its
  group (``fast merge -slow`` = ``(fast OR merge) AND NOT slow``,
  the universal user expectation), while an explicit ``a OR NOT b``
  stays a true disjunction;
- ``"quoted words"`` — a contiguous X1-token phrase
  (:func:`~same_same_spark.operators.phrase.phrase_count_col`);
- ``field:value`` — stringified equality against a doc column (the
  F2 compare rule); unknown fields raise driver-side; a field leaf is
  FILTER context — it never scores;
- a bare chunk tokenizes with X1: one token → a term leaf; several
  (``foo-bar``) → an implicit AND group of term leaves; zero (a
  stopword) → the leaf DROPS from its parent (an AND/OR shrinks, a
  NOT of nothing drops entirely — ES's analyzer-eats-clause rule);
- a query that drops to nothing yields no rows.

Pinned scoring: a doc matching the tree scores
``Σ w(t, d)`` — the engine's pinned BM25 weight — over the DISTINCT
positive term leaves it contains (term and phrase terms under an odd
number of NOTs are excluded from scoring as well as matching; phrase
occurrence gates matching, its terms score individually — the pinned
re-expression, simpler than Lucene's phrase-freq). Docs matching on
filter/NOT clauses alone score 0.0 and still rank (by doc id). Top-k
under ``(round(score, 9) DESC, doc_id ASC)``.

Scale shape: ALL queries' boolean trees evaluate in ONE corpus scan
(array_contains / slice-compare column math inside whole-stage
codegen, stacked as a struct array and exploded to the (query, doc)
match set); scores ride the standard broadcast posting join over the
positive terms; the two meet in one doc-id equi-join. Entry oracles
hand-write the SQL twin per query string (independent derivation);
module tests brute-force the AST semantics in pure Python.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT, scored_matches
from same_same_spark.operators.phrase import phrase_count_col
from same_same_spark.operators.topk import topk_per_query
from same_same_spark.text.tokenizer import tokenize_py

__all__ = ["parse_query", "query_string_search"]


@dataclass(frozen=True)
class Term:
    t: str


@dataclass(frozen=True)
class Phrase:
    toks: tuple


@dataclass(frozen=True)
class Field:
    name: str
    value: str


@dataclass(frozen=True)
class Not:
    child: object


@dataclass(frozen=True)
class Bool:
    op: str  # 'and' | 'or'
    children: tuple


_TOKEN_RE = re.compile(
    # order matters: field:"quoted value" and -"quoted phrase" must
    # lex as ONE token before the bare-chunk class (which would
    # otherwise swallow the '-' or split at the first space)
    r'\s*(\(|\)|[^\s():]+:"[^"]*"|-?"[^"]*"|[^\s()]+)'
)


def _lex(text: str) -> list[str]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            break
        out.append(m.group(1))
        pos = m.end()
    return out


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.peek() is not None:
            raise ValueError(
                f"unexpected token {self.peek()!r} in query string"
            )
        return node

    def or_expr(self):
        # (node, explicit_or) pairs: an IMPLICITLY-joined NOT clause is
        # a Lucene prohibited clause — it subtracts from the group
        # ("fast merge -slow" = (fast OR merge) AND NOT slow) — while
        # an explicit "a OR NOT b" stays a true disjunction.
        parts = [(self.and_expr(), False)]
        while self.peek() is not None and self.peek() != ")":
            if self.peek().upper() == "OR":
                self.next()
                parts.append((self.and_expr(), True))
            else:
                parts.append((self.and_expr(), False))  # implicit
        parts = [(p, ex) for p, ex in parts if p is not None]
        if not parts:
            return None
        # split by each part's own flag, not value equality: an
        # explicit 'OR NOT x' must survive even when an implicit '-x'
        # of the same subtree is also present
        def _is_prohibited(p, ex):
            return not ex and isinstance(p, Not) and len(parts) > 1

        prohibited = [p for p, ex in parts if _is_prohibited(p, ex)]
        positives = [p for p, ex in parts if not _is_prohibited(p, ex)]
        node = None
        if positives:
            node = (
                positives[0]
                if len(positives) == 1
                else Bool("or", tuple(positives))
            )
        if prohibited:
            group = ([node] if node is not None else []) + prohibited
            node = (
                group[0] if len(group) == 1 else Bool("and", tuple(group))
            )
        return node

    def and_expr(self):
        parts = [self.unary()]
        while self.peek() is not None and self.peek().upper() == "AND":
            self.next()
            parts.append(self.unary())
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else Bool("and", tuple(parts))

    def unary(self):
        tok = self.peek()
        if tok is None or tok == ")":
            raise ValueError("dangling operator in query string")
        if tok.upper() == "NOT":
            self.next()
            child = self.unary()
            return Not(child) if child is not None else None
        if tok == "-":
            # a lone '-' arises from '-(' (the lexer stops a bare
            # chunk at a parenthesis): negate the whole group
            self.next()
            child = self.unary()
            return Not(child) if child is not None else None
        if tok.startswith("-") and len(tok) > 1:
            self.toks[self.i] = tok[1:]
            child = self.unary()
            return Not(child) if child is not None else None
        return self.primary()

    def primary(self):
        tok = self.next()
        if tok == "(":
            node = self.or_expr()
            if self.next() != ")":
                raise ValueError("unbalanced parenthesis in query string")
            return node
        if tok == ")":
            raise ValueError("unbalanced parenthesis in query string")
        if tok.startswith('"'):
            toks = tuple(tokenize_py(tok.strip('"')))
            if not toks:
                return None
            return Phrase(toks) if len(toks) > 1 else Term(toks[0])
        if ":" in tok:
            name, _, value = tok.partition(":")
            if name and value:
                # field:"quoted value" compares the raw quoted string
                if value.startswith('"') and value.endswith('"'):
                    value = value[1:-1]
                return Field(name, value)
        toks = tokenize_py(tok)
        if not toks:
            return None
        if len(toks) == 1:
            return Term(toks[0])
        return Bool("and", tuple(Term(t) for t in toks))


def parse_query(text: str):
    """Parse a query string into the pinned AST (None when the whole
    query drops to nothing)."""
    toks = _lex(text)
    if not toks:
        return None
    return _Parser(toks).parse()


def positive_terms(node, under_not: bool = False) -> set[str]:
    """DISTINCT scoring terms: term + phrase-term leaves under an
    even number of NOTs."""
    if node is None:
        return set()
    if isinstance(node, Term):
        return set() if under_not else {node.t}
    if isinstance(node, Phrase):
        return set() if under_not else set(node.toks)
    if isinstance(node, Field):
        return set()
    if isinstance(node, Not):
        return positive_terms(node.child, not under_not)
    out: set[str] = set()
    for c in node.children:
        out |= positive_terms(c, under_not)
    return out


def _match_col(node, tokens: Column, docs_df: DataFrame) -> Column:
    if isinstance(node, Term):
        return F.array_contains(tokens, node.t)
    if isinstance(node, Phrase):
        return (
            phrase_count_col(
                tokens, F.array(*[F.lit(t) for t in node.toks])
            )
            > 0
        )
    if isinstance(node, Field):
        if node.name not in docs_df.columns:
            raise ValueError(
                f"unknown field {node.name!r} in query string"
            )
        return F.coalesce(
            F.col(node.name).cast("string") == F.lit(node.value),
            F.lit(False),
        )
    if isinstance(node, Not):
        return ~_match_col(node.child, tokens, docs_df)
    cols = [_match_col(c, tokens, docs_df) for c in node.children]
    out = cols[0]
    for c in cols[1:]:
        out = (out & c) if node.op == "and" else (out | c)
    return out


def eval_py(node, doc_tokens: list[str], doc_row: dict) -> bool:
    """Pure-Python AST evaluation (the test brute-force twin)."""
    if isinstance(node, Term):
        return node.t in doc_tokens
    if isinstance(node, Phrase):
        m = len(node.toks)
        return any(
            tuple(doc_tokens[i : i + m]) == node.toks
            for i in range(len(doc_tokens) - m + 1)
        )
    if isinstance(node, Field):
        v = doc_row.get(node.name)
        return v is not None and str(v) == node.value
    if isinstance(node, Not):
        return not eval_py(node.child, doc_tokens, doc_row)
    results = (eval_py(c, doc_tokens, doc_row) for c in node.children)
    return all(results) if node.op == "and" else any(results)


def query_string_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k query-string retrieval (see module docstring).

    Returns (query_id INT, doc_id, score DOUBLE, rank INT).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = docs_df.sparkSession
    id_type = dict(docs_df.dtypes)[id_col]
    empty = spark.createDataFrame(
        [], f"query_id INT, doc_id {id_type}, score DOUBLE, rank INT"
    )
    asts = [(qid, parse_query(text)) for qid, text in queries]
    asts = [(qid, a) for qid, a in asts if a is not None]
    if not asts:
        return empty

    # tokens are a projection of the same row — never a self-join
    from same_same_spark.text.tokenizer import tokens_col

    docs_t = docs_df.select(
        "*", tokens_col(text_col).alias("tokens")
    )
    pos_terms = {
        qid: sorted(positive_terms(a)) for qid, a in asts
    }
    scores = scored_matches(
        docs_df,
        [(qid, " ".join(ts)) for qid, ts in pos_terms.items() if ts],
        id_col=id_col,
        text_col=text_col,
        k1=k1,
        b=b,
    )
    # ONE corpus scan evaluates every query's tree: a struct array of
    # (query_id, matched) pairs explodes to the (query, doc) match set
    per_q = F.array(
        *[
            F.struct(
                F.lit(qid).cast("int").alias("qid"),
                F.coalesce(
                    _match_col(ast, F.col("tokens"), docs_df),
                    F.lit(False),
                ).alias("m"),
            )
            for qid, ast in asts
        ]
    )
    matched_all = (
        docs_t.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.filter(per_q, lambda s: s["m"])).alias("s"),
        )
        .select(F.col("s.qid").alias("query_id"), "doc_id")
    )
    scored = matched_all.join(
        scores, ["query_id", "doc_id"], "left"
    ).select(
        "query_id",
        "doc_id",
        F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
    )
    return topk_per_query(scored, k)
