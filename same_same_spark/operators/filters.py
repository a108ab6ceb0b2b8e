"""FilterExpr → Catalyst Column compiler (F2/F3 in SURVEY §2.3).

Re-expresses the reference's filter algebra
(``internal/models/filter.go:62-228``) as a declarative Column tree so
Catalyst can push predicates into the parquet scan — the reference
evaluates them per-row in Go against an in-memory map.

Semantics preserved exactly (truth tables in
``internal/models/filter_test.go`` are re-run in tests/test_filters.py):

- AND across fields, AND across ops within a field,
- every op except ``exists: false`` requires the field to be present
  (``neq`` on a missing field is **false** — filter.go:87-89),
- values are stringly-typed; ``lt/lte/gt/gte`` compare numerically when
  *both* sides parse as floats, else fall back to string comparison
  (filter.go:135-170),
- ``between [lo, hi]`` is inclusive and numeric-only — a non-numeric
  value or bound ⇒ false (filter.go:173-192),
- ``contains`` is case-insensitive substring (filter.go:110-113),
- ``in`` compares against the stringified list (filter.go:195-208),
- ``exists`` matches presence against a bool (filter.go:118-125),
- unknown operator ⇒ false (filter.go:126-127).

Documented divergence: Go's ``fmt.Sscanf("%f")`` accepts a numeric
*prefix* ("1950abc" parses as 1950); we use ``try_cast`` which requires
the whole string to be numeric. The reference's own tests only exercise
fully-numeric strings.

Two binding modes:

- ``metadata_col='metadata'`` — fields live in a MAP<STRING,STRING>
  column (the reference's data model),
- ``metadata_col=None``      — fields are plain top-level columns
  (values compared through their string form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FilterExpr = dict  # {field: {op: value}}


def _is_number(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _to_float(v) -> float | None:
    if _is_number(v):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return None
    return None


def _fmt(v) -> str:
    """Go ``fmt.Sprint`` equivalent for the scalar types filters carry."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        # fmt.Sprint(1950.0) == "1950" only for int-typed values; JSON
        # numbers arrive as float — Go prints 1900 (json.Number? no:
        # interface{} float64 prints "1900" via %v when integral).
        return str(int(v))
    return str(v)


def _binding(df_or_none, metadata_col: str | None, field: str):
    """→ (value Column (string), exists Column (bool))."""
    if metadata_col is not None:
        m = F.col(metadata_col)
        return m.getItem(field), F.map_contains_key(m, F.lit(field))
    if df_or_none is not None and field not in df_or_none.columns:
        return F.lit(None).cast("string"), F.lit(False)
    c = F.col(field)
    return c.cast("string"), c.isNotNull()


def _compile_op(value: Column, exists: Column, op: str, expected) -> Column:
    num_val = value.try_cast("double")
    exp_num = _to_float(expected)

    def ordered(num_cmp, str_cmp):
        if exp_num is None:
            # expected side never parses → always string comparison
            return exists & str_cmp(value, F.lit(_fmt(expected)))
        return exists & F.when(
            num_val.isNotNull(), num_cmp(num_val, F.lit(exp_num))
        ).otherwise(str_cmp(value, F.lit(_fmt(expected))))

    if op == "eq":
        return exists & (value == F.lit(_fmt(expected)))
    if op == "neq":
        return exists & (value != F.lit(_fmt(expected)))
    if op == "lt":
        return ordered(lambda a, b: a < b, lambda a, b: a < b)
    if op == "lte":
        return ordered(lambda a, b: a <= b, lambda a, b: a <= b)
    if op == "gt":
        return ordered(lambda a, b: a > b, lambda a, b: a > b)
    if op == "gte":
        return ordered(lambda a, b: a >= b, lambda a, b: a >= b)
    if op == "between":
        if (
            not isinstance(expected, (list, tuple))
            or len(expected) != 2
            or _to_float(expected[0]) is None
            or _to_float(expected[1]) is None
        ):
            return F.lit(False)
        lo, hi = _to_float(expected[0]), _to_float(expected[1])
        return (
            exists
            & num_val.isNotNull()
            & (num_val >= F.lit(lo))
            & (num_val <= F.lit(hi))
        )
    if op == "contains":
        return exists & F.lower(value).contains(F.lower(F.lit(_fmt(expected))))
    if op == "in":
        if not isinstance(expected, (list, tuple)):
            return F.lit(False)
        items = [_fmt(x) for x in expected]
        return exists & (value.isin(items) if items else F.lit(False))
    if op == "exists":
        if not isinstance(expected, bool):
            return F.lit(False)
        return exists if expected else ~exists
    return F.lit(False)  # unknown operator


def compile_filters(
    filters: dict[str, FilterExpr] | None,
    metadata_col: str | None = "metadata",
    df: DataFrame | None = None,
) -> Column:
    """Compile ``{field: {op: value}}`` into one boolean Column."""
    if not filters:
        return F.lit(True)
    conds: list[Column] = []
    for field, expr in filters.items():
        value, exists = _binding(df, metadata_col, field)
        for op, expected in expr.items():
            conds.append(_compile_op(value, exists, op, expected))
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def matches_metadata(
    query_meta: dict[str, str], metadata_col: str = "metadata"
) -> Column:
    """F1 — legacy exact-equality metadata match
    (``search/search.go:46-53``): AND of string equality; missing key ⇒
    no match; empty query ⇒ match all."""
    cond = F.lit(True)
    m = F.col(metadata_col)
    for k, v in query_meta.items():
        cond = cond & (m.getItem(k) == F.lit(v))
    return cond
