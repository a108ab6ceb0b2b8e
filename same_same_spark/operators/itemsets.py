"""Frequent item-set mining — ES ``frequent_item_sets`` restricted to
the exact, scale-honest core: frequent PAIRS by the classical A-Priori
pruning (Agrawal & Srikant 1994, public).

ES's agg runs an approximate sampled ECLAT over arbitrary set sizes;
this engine pins the exact two-pass variant instead (documented
strengthening, like the sampler aggs):

- a transaction = one document's DISTINCT X1 tokens;
- pass 1: item doc-frequencies; frequent items = doc_count >=
  ``minsup_docs`` with ``minsup_docs = ceil(min_support * n_docs)``
  (both engines derive it from the same doubles — identical floats);
- pass 2: candidate pairs only among FREQUENT items (the A-Priori
  property: a pair can't be frequent unless both members are), ordered
  ``item_a < item_b``; frequent pairs = pair doc_count >= minsup_docs;
- support = doc_count / n_docs (exact double division);
- top ``top_n`` pairs under ``(doc_count DESC, item_a ASC,
  item_b ASC)`` — a total order, so the returned SET is deterministic.

Scale shape: pass 1 is one explode + count with map-side combine; the
frequent-item filter joins BROADCAST (the frequent-item table is
bounded by 1/min_support in expectation and explicitly tiny at any
sane support); pair generation is a doc-keyed self-join of the
FILTERED token relation — per-doc cost is quadratic only in the doc's
frequent-token count, which the support threshold bounds; pair counts
aggregate with map-side combine; the cut is TakeOrderedAndProject.
No all-pairs join across documents anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.text.tokenizer import tokens_col


def frequent_pairs(
    docs_df: DataFrame,
    min_support: float,
    top_n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Exact frequent token pairs (see module pin). Returns (item_a
    STRING, item_b STRING, doc_count LONG, support DOUBLE)."""
    if not 0.0 < min_support <= 1.0:
        raise ValueError(f"min_support must be in (0, 1], got {min_support}")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    toks = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(tokens_col(F.col(text_col)))
        ).alias("item"),
    )
    # the scalar pair (n_docs, minsup) is one bounded aggregate —
    # computed ONCE and embedded as literals in both downstream passes
    n_docs = docs_df.select(F.col(id_col)).count()
    minsup = math.ceil(float(min_support) * float(n_docs))
    frequent = (
        toks.groupBy("item")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= F.lit(minsup))
        .select("item")
    )
    ftoks = toks.join(F.broadcast(frequent), "item").select(
        "doc_id", "item"
    )
    pairs = (
        ftoks.alias("a")
        .join(ftoks.alias("b"), "doc_id")
        .filter(F.col("a.item") < F.col("b.item"))
        .select(
            F.col("a.item").alias("item_a"),
            F.col("b.item").alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .filter(F.col("doc_count") >= F.lit(minsup))
    )
    return (
        pairs.select(
            "item_a",
            "item_b",
            F.col("doc_count").cast("long").alias("doc_count"),
            (F.col("doc_count") / F.lit(float(n_docs))).alias("support"),
        )
        .orderBy(
            F.col("doc_count").desc(),
            F.col("item_a").asc(),
            F.col("item_b").asc(),
        )
        .limit(top_n)
    )


def duckdb_frequent_pairs_sql(
    table: str,
    min_support: float,
    top_n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> str:
    """DuckDB twin of :func:`frequent_pairs` (minsup re-derived in SQL
    from the same doubles; pairs via the same A-Priori shape)."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest(list_distinct({duckdb_tokens_sql(text_col)})) AS item
  FROM {table}
),
params AS (
  SELECT count(*)::BIGINT AS n_docs,
         CAST(ceil({float(min_support)!r} * count(*)) AS BIGINT) AS minsup
  FROM {table}
),
frequent AS (
  SELECT item FROM toks GROUP BY item
  HAVING count(*) >= (SELECT minsup FROM params)
),
ftoks AS (
  SELECT t.doc_id, t.item FROM toks t JOIN frequent f ON t.item = f.item
),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*)::BIGINT AS doc_count
  FROM ftoks a JOIN ftoks b
    ON a.doc_id = b.doc_id AND a.item < b.item
  GROUP BY 1, 2
  HAVING count(*) >= (SELECT minsup FROM params)
)
SELECT item_a, item_b, doc_count,
       doc_count / (SELECT CAST(n_docs AS DOUBLE) FROM params) AS support
FROM pairs
ORDER BY doc_count DESC, item_a ASC, item_b ASC
LIMIT {top_n}
"""
