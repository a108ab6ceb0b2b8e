"""function_score query — re-shape BM25 relevance with document-value
functions (Elasticsearch's ``function_score``).

A beyond-reference fulltext feature: the reference ranks by lexical
score only (`internal/storage/search/search.go:16-42`); production
search mixes in popularity, freshness and deterministic jitter. This
operator composes the engine's pinned BM25 with the three script-free
ES function families:

- ``field_value_factor`` — ``modifier(factor · field)`` with modifiers
  ``none | log1p | ln1p | sqrt | square | reciprocal``; NULL fields
  read ``missing`` (default 1.0). Negative inputs under sqrt/log are a
  caller error in ES; here they produce NULL → the function
  contributes its ``missing`` value (pinned, never NaN).
- ``random_score`` — deterministic uniform in [0, 1) from the
  engine's ONE cross-engine hash scheme
  (``pipeline/sampling.hash_uniform_col``: md5-60-bit of
  ``seed|doc_id``), so "random" tie-shuffling reproduces exactly on
  both engines and across runs (ES's seeded random_score contract).
- ``weight`` — a constant.

Each function may carry a ``filter`` (a FilterExpr dict — the F2/F3
algebra shared with search and the filters/t_test aggs); the function
applies only to docs matching it. Pinned combination semantics
(cross-engine, re-derived in :func:`duckdb_function_score_sql`):

- ``score_mode`` folds the APPLICABLE functions' values:
  ``sum | multiply | max | min | avg``; a doc with NO applicable
  function takes function-score 1.0 (ES's neutral element);
- ``boost_mode`` combines with the BM25 query score:
  ``multiply | sum | replace``;
- the match set is the positive BM25 match set (functions never add
  docs); top-k under ``(round(score, 9) DESC, doc_id ASC)``.

Scale shape: every function is a pure column expression evaluated
doc-side (whole-stage-codegen arithmetic over the scan projection —
no per-function joins, no UDFs); the function-score column then joins
onto the scored matches by doc id — ONE extra equi-join, hash-keyed
on the same id the match set already carries (AQE broadcasts it at
small scale; at corpus scale it co-partitions with the match-set
shuffle). Everything else is plain BM25's plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT, scored_matches
from same_same_spark.operators.topk import topk_per_query
from same_same_spark.pipeline.sampling import (
    hash_uniform_col,
    hash_uniform_sql,
)

__all__ = ["function_score_search", "duckdb_function_score_sql"]

_MODIFIERS = ("none", "log1p", "ln1p", "sqrt", "square", "reciprocal")
_SCORE_MODES = ("sum", "multiply", "max", "min", "avg")
_BOOST_MODES = ("multiply", "sum", "replace")


def _fvf_col(spec: dict) -> Column:
    field = spec["field"]
    factor = float(spec.get("factor", 1.0))
    modifier = spec.get("modifier", "none")
    missing = float(spec.get("missing", 1.0))
    if modifier not in _MODIFIERS:
        raise ValueError(
            f"modifier must be one of {_MODIFIERS}, got {modifier!r}"
        )
    x = F.col(field).cast("double") * F.lit(factor)
    # domain guards are EXPLICIT (sqrt(-1) is NaN in Spark, not NULL —
    # a bare coalesce would leak NaN where the twin yields `missing`)
    if modifier == "log1p":
        v = F.when(x + 1 > 0, F.log10(x + 1))
    elif modifier == "ln1p":
        v = F.when(x + 1 > 0, F.log(x + 1))
    elif modifier == "sqrt":
        v = F.when(x >= 0, F.sqrt(x))
    elif modifier == "square":
        v = x * x
    elif modifier == "reciprocal":
        v = F.try_divide(F.lit(1.0), x)
    else:
        v = x
    return F.coalesce(v, F.lit(missing))


def _fvf_sql(spec: dict) -> str:
    field = spec["field"]
    factor = float(spec.get("factor", 1.0))
    modifier = spec.get("modifier", "none")
    missing = float(spec.get("missing", 1.0))
    if modifier not in _MODIFIERS:
        raise ValueError(
            f"modifier must be one of {_MODIFIERS}, got {modifier!r}"
        )
    x = f"(CAST(d.{field} AS DOUBLE) * {factor!r})"
    if modifier == "log1p":
        v = f"CASE WHEN {x} + 1 > 0 THEN log10({x} + 1) END"
    elif modifier == "ln1p":
        v = f"CASE WHEN {x} + 1 > 0 THEN ln({x} + 1) END"
    elif modifier == "sqrt":
        v = f"CASE WHEN {x} >= 0 THEN sqrt({x}) END"
    elif modifier == "square":
        v = f"({x} * {x})"
    elif modifier == "reciprocal":
        v = f"(1.0 / nullif({x}, 0))"
    else:
        v = x
    return f"coalesce({v}, {missing!r})"


def _function_value(
    fn: dict, docs_df: DataFrame, id_col: str, metadata_col: str | None
) -> tuple[Column, Column]:
    """(applicable BOOLEAN, value DOUBLE) columns for one function."""
    from same_same_spark.operators.filters import compile_filters

    kinds = [
        k for k in ("field_value_factor", "random_score", "weight")
        if k in fn
    ]
    if len(kinds) != 1:
        raise ValueError(
            "each function needs exactly one of field_value_factor / "
            f"random_score / weight, got {sorted(fn)}"
        )
    kind = kinds[0]
    if kind == "field_value_factor":
        val = _fvf_col(fn[kind])
    elif kind == "random_score":
        seed = str(fn[kind].get("seed", 0))
        val = hash_uniform_col(
            F.col(id_col).cast("string"), seed=seed
        )
    else:
        val = F.lit(float(fn[kind]))
    filt = fn.get("filter")
    if filt is not None:
        applicable = F.coalesce(
            compile_filters(
                filt, metadata_col=metadata_col, df=docs_df
            ),
            F.lit(False),
        )
    else:
        applicable = F.lit(True)
    return applicable, val


def _function_value_sql(fn: dict, id_col: str, pred: str | None) -> str:
    """SQL for one function's (value-if-applicable ELSE NULL)."""
    kinds = [
        k for k in ("field_value_factor", "random_score", "weight")
        if k in fn
    ]
    kind = kinds[0]
    if kind == "field_value_factor":
        val = _fvf_sql(fn[kind])
    elif kind == "random_score":
        seed = str(fn[kind].get("seed", 0))
        val = hash_uniform_sql(
            f"CAST(d.{id_col} AS VARCHAR)", seed=seed
        )
    else:
        val = repr(float(fn[kind]))
    if pred is not None:
        return f"CASE WHEN coalesce(({pred}), FALSE) THEN {val} END"
    return f"({val})"


def function_score_search(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    functions: list[dict],
    k: int = 10,
    score_mode: str = "sum",
    boost_mode: str = "multiply",
    metadata_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "content",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Top-k function_score (see module docstring for the pinned
    semantics). Returns (query_id INT, doc_id, score DOUBLE,
    rank INT)."""
    if score_mode not in _SCORE_MODES:
        raise ValueError(
            f"score_mode must be one of {_SCORE_MODES}, got {score_mode!r}"
        )
    if boost_mode not in _BOOST_MODES:
        raise ValueError(
            f"boost_mode must be one of {_BOOST_MODES}, got {boost_mode!r}"
        )
    if not functions:
        raise ValueError("functions must be non-empty")
    pairs = [
        _function_value(fn, docs_df, id_col, metadata_col)
        for fn in functions
    ]
    # one array of applicable values; fold with the engine's built-ins
    vals = F.array(
        *[F.when(app, val) for app, val in pairs]
    )
    applicable = F.filter(vals, lambda v: v.isNotNull())
    n = F.size(applicable)
    if score_mode == "sum":
        folded = F.aggregate(
            applicable, F.lit(0.0), lambda acc, v: acc + v
        )
    elif score_mode == "multiply":
        folded = F.aggregate(
            applicable, F.lit(1.0), lambda acc, v: acc * v
        )
    elif score_mode == "max":
        folded = F.array_max(applicable)
    elif score_mode == "min":
        folded = F.array_min(applicable)
    else:  # avg
        folded = F.try_divide(
            F.aggregate(applicable, F.lit(0.0), lambda acc, v: acc + v),
            n.cast("double"),
        )
    func_score = F.when(n > 0, folded).otherwise(F.lit(1.0))
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"), func_score.alias("fs")
    )
    matched = scored_matches(
        docs_df, queries, id_col=id_col, text_col=text_col, k1=k1, b=b
    )
    joined = matched.join(meta, "doc_id")
    if boost_mode == "multiply":
        final = F.col("score") * F.col("fs")
    elif boost_mode == "sum":
        final = F.col("score") + F.col("fs")
    else:
        final = F.col("fs")
    scored = joined.select(
        "query_id", "doc_id", final.alias("score")
    )
    return topk_per_query(scored, k)


def duckdb_function_score_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    functions: list[dict],
    preds: list[str | None],
    k: int = 10,
    score_mode: str = "sum",
    boost_mode: str = "multiply",
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`function_score_search` — ``preds`` are
    per-function SQL predicates derived INDEPENDENTLY from each
    function's FilterExpr (the filters-agg strategy; None = no
    filter). The fold is spelled as explicit nested expressions over
    the same per-function values (hash_uniform shares the one pinned
    md5-60-bit scheme)."""
    from same_same_spark.bm25 import duckdb_scored_sql

    if len(preds) != len(functions):
        raise ValueError("preds must align with functions")
    inner = duckdb_scored_sql(table, id_col, text_col, queries)
    vals = [
        _function_value_sql(fn, id_col, p)
        for fn, p in zip(functions, preds)
    ]
    lst = f"[{', '.join(vals)}]"
    applicable = f"list_filter({lst}, x -> x IS NOT NULL)"
    if score_mode == "sum":
        folded = f"list_aggregate({applicable}, 'sum')"
    elif score_mode == "multiply":
        folded = f"list_aggregate({applicable}, 'product')"
    elif score_mode == "max":
        folded = f"list_aggregate({applicable}, 'max')"
    elif score_mode == "min":
        folded = f"list_aggregate({applicable}, 'min')"
    elif score_mode == "avg":
        folded = f"list_aggregate({applicable}, 'avg')"
    else:
        raise ValueError(f"bad score_mode {score_mode!r}")
    fs = (
        f"CASE WHEN len({applicable}) > 0 THEN ({folded})"
        " ELSE 1.0 END"
    )
    if boost_mode == "multiply":
        final = "p.score * m.fs"
    elif boost_mode == "sum":
        final = "p.score + m.fs"
    elif boost_mode == "replace":
        final = "m.fs"
    else:
        raise ValueError(f"bad boost_mode {boost_mode!r}")
    return f"""
WITH pos AS ({inner}),
meta AS (
  SELECT d.{id_col} AS doc_id, ({fs})::DOUBLE AS fs
  FROM {table} d
),
scored AS (
  SELECT p.query_id, p.doc_id, ({final}) AS score
  FROM pos p JOIN meta m ON p.doc_id = m.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score, row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(score, 9) DESC, doc_id ASC
  ) AS rank
  FROM scored
)
SELECT query_id, doc_id, round(score, {round_score}) AS score,
       rank::INTEGER AS rank
FROM ranked WHERE rank <= {int(k)}
"""
