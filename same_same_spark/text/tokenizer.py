"""X1 — the reference tokenizer, re-expressed three equivalent ways.

Reference semantics (``internal/embedders/quotes/local/tfidf/tfidf.go:48-83``):

1. lowercase,
2. replace every run matching ``[^a-z\\s]+`` with a single space — in Go's
   RE2, ``\\s`` is exactly ``[\\t\\n\\f\\r ]``, so we spell the class out
   explicitly to stay engine-independent (Python ``re`` and DuckDB would
   otherwise treat ``\\s`` as Unicode whitespace),
3. split on whitespace (``strings.Fields``),
4. drop the 59-word stopword set (``tfidf.go:60-73``),
5. drop tokens of length <= 2 (``tfidf.go:77``).

Implementations:

- ``tokens_col``      — pure Spark built-in Column expression (JVM-side,
  whole-stage codegen; the hot path — no Python at all),
- ``tokenize_pandas_udf`` — Arrow-vectorized pandas UDF (equivalent; kept
  for parity testing and as the BASELINE.json-mandated Arrow-UDF form),
- ``tokenize_py``     — pure Python (golden tests / driver-side use),
- ``duckdb_tokens_sql`` — DuckDB SQL fragment producing the same list
  (used by ``__spark_entry__.oracle_sql``).

All four are differential-tested against each other in
``tests/test_tokenizer.py``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Stopword set, verbatim from the reference (tfidf.go:60-73).
STOPWORDS: frozenset[str] = frozenset(
    """the a an and or but in on at to for of with by is are was were be been
    have has had do does did will would could should may might must can this
    that these those i you he she it we they me him her us them my your his
    its our their am so as""".split()
)

# RE2 `\s` == [\t\n\f\r ]; spelled out so Python/Java/DuckDB agree.
_WS_CLASS = "\t\n\f\r "
STRIP_PATTERN = f"[^a-z{_WS_CLASS}]+"
SPLIT_PATTERN = f"[{_WS_CLASS}]+"

_STRIP_RE = re.compile(STRIP_PATTERN)
MIN_TOKEN_LEN = 3  # "Keep words longer than 2 chars" (tfidf.go:77)


def tokenize_py(text: str | None) -> list[str]:
    """Pure-Python reference implementation (golden source of truth)."""
    if text is None:
        return []
    cleaned = _STRIP_RE.sub(" ", text.lower())
    return [
        w
        for w in cleaned.split()
        if len(w) >= MIN_TOKEN_LEN and w not in STOPWORDS
    ]


def tokens_col(col: Column | str) -> Column:
    """Tokenize as a pure built-in Column expression (JVM, codegen'd).

    This is the hot path: no Python, fully vectorized by Tungsten, and
    Catalyst can pipeline it with the surrounding scan/explode.
    NULL text yields an empty array.
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(c), STRIP_PATTERN, " ")
    arr = F.split(cleaned, SPLIT_PATTERN)
    filtered = F.filter(
        arr,
        lambda t: (F.length(t) >= MIN_TOKEN_LEN) & ~t.isin(*sorted(STOPWORDS)),
    )
    return F.coalesce(filtered, F.array().cast(T.ArrayType(T.StringType())))


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_pandas_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer (pandas string ops, no per-row Python
    beyond the final list comprehension over already-split tokens)."""
    cleaned = (
        texts.fillna("")
        .str.lower()
        .str.replace(STRIP_PATTERN, " ", regex=True)
        .str.split(SPLIT_PATTERN, regex=True)
    )
    stop = STOPWORDS
    return cleaned.map(
        lambda ws: [w for w in ws if len(w) >= MIN_TOKEN_LEN and w not in stop]
    )


def duckdb_tokens_sql(col_expr: str) -> str:
    """DuckDB SQL fragment: LIST of tokens of ``col_expr``, same semantics.

    Used to build oracle SQL so DuckDB reproduces Spark's tokenization
    exactly (both engines use RE2-style regexes; the whitespace class is
    explicit so no engine-specific ``\\s`` semantics leak in).
    """
    stop_list = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    return (
        "list_filter("
        f"string_split_regex(regexp_replace(lower({col_expr}), "
        f"'{STRIP_PATTERN}', ' ', 'g'), '{SPLIT_PATTERN}'), "
        f"t -> length(t) >= {MIN_TOKEN_LEN} AND t NOT IN ({stop_list}))"
    )
