"""X11 — the reference's SimpleCLIP hash embedder, text path
(``internal/embedders/clip/simple.go:75-106,261-267``,
``native.go:228-244``), bit-faithfully re-expressed.

Semantics (pinned; the goldens depend on them):

- ``t = lower(trimspace(text))``; ``words = fields(t)`` (split on
  whitespace runs); trigrams are **byte** slices ``t[j:j+3]`` of the
  UTF-8 encoding (Go string indexing is bytes, simple.go:96-100);
- ``hash(s, a, b) = big-endian uint32 of md5(utf8(s) + byte(a) + byte(b))``
  (simple.go:261-267 — seeds truncate mod 256);
- component ``i``:
  ``sum_j sin(hash(words[j], i, j)) / len(words)
    + 0.1 * sum_j cos(hash(t[j:j+3], i, 0))``;
- L2-normalise; all-zero stays all-zero (native.go:228-244), so an
  empty/short text scores cosine 0 against everything
  (``models/vector.go:37-54`` returns 0 on zero norm).

Execution: the per-(string, seed-pair) md5 work is memoised per
executor — word/trigram vocabularies are tiny relative to token counts,
so each distinct ``(word, j mod 256)`` / trigram costs ``dim`` md5
finalisations exactly once. The UDF is an Arrow-batched pandas UDF;
the cosine top-k stays JVM-side (``aggregate(zip_with(...))``).

Accumulation order matches the Go loops per component (words in
position order, each term scaled by ``1/len(words)`` before adding,
then trigrams scaled by ``0.1``), so the pandas UDF, the pure-Python
model and the Go reference agree bit-for-bit on ASCII inputs.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

DIM_DEFAULT = 512  # simple.go:29

# Per-executor memoisation: (bytes, seed2, dim, trig) -> the trig-applied
# hash vector over seed1 = 0..dim-1. Bounded; cleared wholesale when full.
# Trig goes through math.sin/math.cos (libm), NOT np.sin — numpy's SIMD
# path differs by ULPs and would break bit-identity with the scalar model
# and the DuckDB oracle (both libm).
_TRIG_CACHE: dict[tuple[bytes, int, int, bool], np.ndarray] = {}
_TRIG_CACHE_MAX = 200_000


def _trig_vec(s: bytes, seed2: int, dim: int, use_cos: bool) -> np.ndarray:
    """trig(uint32(md5(s + byte(i) + byte(seed2)))) for i in 0..dim-1."""
    key = (s, seed2, dim, use_cos)
    out = _TRIG_CACHE.get(key)
    if out is None:
        if len(_TRIG_CACHE) >= _TRIG_CACHE_MAX:
            _TRIG_CACHE.clear()
        base = hashlib.md5(s)
        fn = math.cos if use_cos else math.sin
        raw = np.empty(dim, dtype=np.float64)
        b2 = seed2 & 0xFF
        for i in range(dim):
            h = base.copy()
            h.update(bytes((i & 0xFF, b2)))
            raw[i] = fn(float(int.from_bytes(h.digest()[:4], "big")))
        _TRIG_CACHE[key] = out = raw
    return out


def embed_text_py(text: str | None, dim: int = DIM_DEFAULT) -> list[float]:
    """Literal scalar model of simple.go:75-106 — test/golden reference."""
    t = (text or "").strip().lower()
    b = t.encode("utf-8")
    words = t.split()
    emb = [0.0] * dim
    for i in range(dim):
        v = 0.0
        for j, w in enumerate(words):
            h = hashlib.md5(
                w.encode("utf-8") + bytes((i & 0xFF, j & 0xFF))
            ).digest()
            v += math.sin(float(int.from_bytes(h[:4], "big"))) * (
                1.0 / len(words)
            )
        for j in range(len(b) - 2):
            h = hashlib.md5(b[j:j + 3] + bytes((i & 0xFF, 0))).digest()
            v += math.cos(float(int.from_bytes(h[:4], "big"))) * 0.1
        emb[i] = v
    norm = math.sqrt(sum(x * x for x in emb))
    if norm == 0:
        return emb
    return [x / norm for x in emb]


def _embed_one(text: str | None, dim: int) -> np.ndarray:
    """Vectorised (over dims) embedding with memoised hashes; preserves
    the Go per-component accumulation order exactly."""
    t = (text or "").strip().lower()
    b = t.encode("utf-8")
    words = t.split()
    vec = np.zeros(dim, dtype=np.float64)
    if words:
        inv_w = 1.0 / len(words)
        for j, w in enumerate(words):
            vec += _trig_vec(w.encode("utf-8"), j & 0xFF, dim, False) * inv_w
    for j in range(len(b) - 2):
        vec += _trig_vec(b[j:j + 3], 0, dim, True) * 0.1
    # left-to-right scalar sum (not np.dot's pairwise order) so the norm
    # is bit-identical to the scalar model / Go loop
    norm = math.sqrt(sum(float(x) * float(x) for x in vec))
    if norm == 0.0:
        return vec
    return vec / norm


def clip_embed_udf(dim: int = DIM_DEFAULT):
    """Arrow-batched pandas UDF: text -> ARRAY<DOUBLE>[dim]."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [_embed_one(t, dim).tolist() for t in texts]
        )

    return _udf


def clip_text_embed(
    df: DataFrame,
    text_col: str = "content",
    dim: int = DIM_DEFAULT,
    out_col: str = "clip_emb",
) -> DataFrame:
    """Adds the SimpleCLIP text embedding column."""
    return df.withColumn(out_col, clip_embed_udf(dim)(F.col(text_col)))


def _dot_with_lit(emb_col: Column, query_vec: list[float]) -> Column:
    """JVM-side dot product against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return F.aggregate(
        F.zip_with(emb_col, q, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def clip_text_topk(
    docs_df: DataFrame,
    query: str,
    k: int = 10,
    dim: int = DIM_DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """SimpleCLIP search: embed docs + query, cosine top-k.

    Both sides are unit vectors (or zero), so cosine == dot; zero-vector
    docs score 0 like the reference (vector.go:37-54). Returns
    (doc_id, score DOUBLE, rank INT) under the pinned
    ``(round(score, 9) DESC, doc_id ASC)`` order via a global
    ``orderBy().limit(k)`` (TakeOrderedAndProject — no window).
    """
    qv = embed_text_py(query, dim)
    scored = clip_text_embed(
        docs_df.select(F.col(id_col).alias("doc_id"), text_col),
        text_col=text_col, dim=dim,
    ).select(
        "doc_id", _dot_with_lit(F.col("clip_emb"), qv).alias("score")
    )
    top = (
        scored.orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
        .limit(k)
    )
    # Ranking the k survivors is driver-scale work; the window spans <= k
    # rows by construction (the heavy global sort is TakeOrderedAndProject).
    w = F.row_number().over(
        Window.orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
    )
    return top.withColumn("rank", w).select("doc_id", "score", "rank")


# ---------------------------------------------------------------------------
# DuckDB oracle
# ---------------------------------------------------------------------------

# ASCII-only + no vertical-tab + <128 words: on this subset DuckDB's
# char-wise substr/chr() reproduce Go's byte-wise slicing and raw-byte
# md5 seeds exactly (chr(n) is a single byte only for n < 128).
def ascii_filter_col(c: Column, max_words: int = 128) -> Column:
    from same_same_spark.pipeline.textqc import ws_token_count_col

    return (
        (F.length(c) == F.octet_length(c))
        & (~F.contains(c, F.lit("\x0b")))
        & (ws_token_count_col(c) < max_words)
    )


def ascii_filter_sql(col_expr: str, max_words: int = 128) -> str:
    from same_same_spark.pipeline.textqc import token_count_sql

    ws_count = token_count_sql(col_expr)["ws_tokens"]
    return (
        f"length({col_expr}) = strlen({col_expr})"
        f" AND NOT contains({col_expr}, chr(11))"
        f" AND {ws_count} < {max_words}"
    )


def duckdb_clip_sql(
    table: str,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
    dim: int = 64,
    where: str = "TRUE",
    round_score: int | None = 6,
) -> str:
    """DuckDB twin of :func:`clip_text_topk` over the ASCII subset.

    The query vector is embedded driver-side (exact same Python model)
    and inlined — the *document* embedding math runs entirely in SQL.
    Requires ``dim <= 128`` (chr(i) must stay single-byte).
    """
    if dim > 128:
        raise ValueError("duckdb_clip_sql requires dim <= 128")
    qv = embed_text_py(query, dim)
    qvalues = ", ".join(f"({i}, {v!r})" for i, v in enumerate(qv))
    hash32 = (
        "(('0x' || substr(md5({s} || chr(i::INTEGER) || "
        "chr(({b2})::INTEGER)), 1, 8))::UBIGINT)::DOUBLE"
    )
    # byte(j) for j < 128 is just chr(j); the filter guarantees j < 128.
    word_hash = hash32.format(s="word", b2="j")
    tri_hash = hash32.format(s="tri", b2="0")
    sel_score = (
        f"round(score, {round_score}) AS score" if round_score is not None
        else "score"
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         lower(trim({text_col}, E' \\t\\n\\f\\r')) AS t
  FROM {table}
  WHERE ({where}) AND {ascii_filter_sql(text_col)}
),
words AS (
  SELECT doc_id, j, w[j + 1] AS word, len(w) AS n_words
  FROM (
    SELECT doc_id,
           CASE WHEN length(t) = 0 THEN []
                ELSE string_split_regex(t, '[ \\t\\n\\f\\r]+') END AS w
    FROM base
  ), unnest(range(len(w))) AS u(j)
),
tris AS (
  SELECT doc_id, substr(t, j, 3) AS tri
  FROM base, unnest(range(1, greatest(length(t) - 2, 0) + 1)) AS u(j)
),
dims AS ( SELECT unnest(range({dim})) AS i ),
word_part AS (
  SELECT w.doc_id, d.i,
         sum(sin({word_hash}) * (1.0 / w.n_words)) AS v
  FROM words w CROSS JOIN dims d
  GROUP BY w.doc_id, d.i
),
tri_part AS (
  SELECT t.doc_id, d.i, 0.1 * sum(cos({tri_hash})) AS v
  FROM tris t CROSS JOIN dims d
  GROUP BY t.doc_id, d.i
),
raw AS (
  SELECT b.doc_id, d.i,
         coalesce(wp.v, 0.0) + coalesce(tp.v, 0.0) AS v
  FROM base b CROSS JOIN dims d
  LEFT JOIN word_part wp ON b.doc_id = wp.doc_id AND d.i = wp.i
  LEFT JOIN tri_part tp ON b.doc_id = tp.doc_id AND d.i = tp.i
),
norms AS (
  SELECT doc_id, sqrt(sum(v * v)) AS nrm FROM raw GROUP BY doc_id
),
qv AS ( SELECT * FROM (VALUES {qvalues}) AS q(i, qv) ),
scored AS (
  SELECT r.doc_id,
         CASE WHEN n.nrm = 0 THEN 0.0
              ELSE sum(q.qv * r.v / n.nrm) END AS score
  FROM raw r
  JOIN norms n ON r.doc_id = n.doc_id
  JOIN qv q ON r.i = q.i
  GROUP BY r.doc_id, n.nrm
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (
           ORDER BY round(score, 9) DESC, doc_id ASC
         ) AS rank
  FROM scored
)
SELECT doc_id, {sel_score}, rank::INTEGER AS rank
FROM ranked WHERE rank <= {k}
"""
