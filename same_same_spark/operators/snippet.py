"""Snippet generation (highlighting) — best query-term window per hit.

A beyond-reference fulltext feature: search engines return not just the
ranked doc ids (``internal/storage/search/search.go:16-42`` stops there)
but a snippet showing WHERE the query matched. Pinned, cross-engine
definition (token-level, over the X1-filtered token sequence both
engines reproduce exactly):

- candidate windows = every start offset 1..max(n-W+1, 1) of width W
  over the doc's token array (the single clamped start handles docs
  shorter than W, including empty docs → empty snippet);
- window score = number of DISTINCT query terms inside the window;
- best window = max score, ties broken by the SMALLEST start offset
  (``array_position`` / ``list_position`` both return the first hit);
- ``snippet`` = the window's tokens joined by one space;
  ``n_hit_terms`` = the best window's score;
- ``highlight`` = the same window with every token that IS a query
  term wrapped in ``<em>``/``</em>`` (Elasticsearch's default
  highlighter tags), tokens joined by one space.

Scale shape: the window scan is pure JVM column math (``transform`` over
a bounded ``sequence``; cost O(n·W) per doc) and is evaluated ONLY for
the rows it is asked to decorate — the intended composition is top-k
first, snippet on the ≤ queries·k winners (see
``__spark_entry__._q_snippet_topk``), never a corpus-wide pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from same_same_spark.text.tokenizer import tokenize_py, tokens_col


def snippet_cols(
    tokens: Column, query_terms: list[str], window: int
) -> dict[str, Column]:
    """{'snippet': STRING, 'n_hit_terms': INT, 'highlight': STRING} for
    one doc's token array.

    ``query_terms`` is a driver-side list (queries are tiny); terms are
    deduplicated and sorted so the generated expression is deterministic.
    """
    terms = sorted(set(query_terms))
    qarr = F.array(*[F.lit(t) for t in terms]) if terms else F.array().cast(
        "array<string>"
    )
    n = F.size(tokens)
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(window) + F.lit(1), F.lit(1))
    )
    scores = F.transform(
        starts,
        lambda i: F.size(
            F.array_distinct(
                F.filter(
                    F.slice(tokens, i, window),
                    lambda t: F.array_contains(qarr, t),
                )
            )
        ),
    )
    best = F.array_max(scores)
    idx = F.array_position(scores, best)  # first (= smallest start), 1-based
    win = F.slice(tokens, idx.cast("int"), window)
    return {
        "snippet": F.array_join(win, " "),
        "n_hit_terms": best.cast("int"),
        "highlight": F.array_join(
            F.transform(
                win,
                lambda t: F.when(
                    F.array_contains(qarr, t),
                    F.concat(F.lit("<em>"), t, F.lit("</em>")),
                ).otherwise(t),
            ),
            " ",
        ),
    }


def with_snippets(
    hits: DataFrame,
    docs_df: DataFrame,
    query_texts: dict[int, str],
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Decorate (query_id, doc_id, ...) hit rows with snippet columns.

    Tokenizes ONLY the docs present in ``hits`` (semi-join pushdown) —
    the corpus is never re-scanned beyond the id lookup. One generated
    expression per distinct query (queries are a driver-side dict).
    """
    needed = docs_df.join(
        hits.select(F.col("doc_id").alias(id_col)).distinct(), id_col, "semi"
    ).select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("tokens")
    )
    joined = hits.join(needed, "doc_id")
    # Per-query branch: one chained CASE over the (tiny) query set keeps
    # this a single plan with no per-row Python and no UDF.
    snip, nhit, hl = None, None, None
    for qid, text in sorted(query_texts.items()):
        cols = snippet_cols(F.col("tokens"), tokenize_py(text), window)
        cond = F.col("query_id") == F.lit(qid)
        if snip is None:
            snip = F.when(cond, cols["snippet"])
            nhit = F.when(cond, cols["n_hit_terms"])
            hl = F.when(cond, cols["highlight"])
        else:
            snip = snip.when(cond, cols["snippet"])
            nhit = nhit.when(cond, cols["n_hit_terms"])
            hl = hl.when(cond, cols["highlight"])
    if snip is None:
        snip = F.lit(None).cast("string")
        nhit = F.lit(None).cast("int")
        hl = F.lit(None).cast("string")
    return (
        joined.withColumn("snippet", snip)
        .withColumn("n_hit_terms", nhit)
        .withColumn("highlight", hl)
        .drop("tokens")
    )


def duckdb_snippet_exprs(
    tokens_expr: str, query_terms: list[str], window: int
) -> tuple[str, str, str]:
    """(snippet_sql, n_hit_terms_sql, highlight_sql) — DuckDB twins of
    :func:`snippet_cols` over a token-list SQL expression."""
    terms = sorted(set(query_terms))
    qlist = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    starts = (
        f"range(1, greatest(len({tokens_expr}) - {window} + 1, 1) + 1)"
    )
    scores = (
        f"list_transform({starts}, i -> len(list_distinct(list_filter("
        f"list_slice({tokens_expr}, i, i + {window} - 1), "
        f"t -> list_contains({qlist}, t)))))"
    )
    best = f"list_aggregate({scores}, 'max')"
    idx = f"list_position({scores}, {best})"
    win = (
        f"list_slice({tokens_expr}, {idx}, {idx} + {window} - 1)"
    )
    snippet = f"array_to_string({win}, ' ')"
    highlight = (
        f"array_to_string(list_transform({win}, "
        f"t -> CASE WHEN list_contains({qlist}, t) "
        f"THEN '<em>' || t || '</em>' ELSE t END), ' ')"
    )
    return snippet, f"({best})::INTEGER", highlight
