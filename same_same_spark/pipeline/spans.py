"""Span-level dedup ACTION: strip byte-identical shared spans
(license headers, copy-pasted preambles, boilerplate blocks) from a
corpus, keeping one canonical copy.

:func:`~same_same_spark.pipeline.dedup.shared_span_pairs` DETECTS
substring duplication as (pair, diagonal) rows — the MOSS report
shape. This module is the removal counterpart, and it deliberately
does NOT build on the pairwise diagonals: a header shared by ``n``
docs is ``n(n-1)/2`` pair rows (quadratic exactly where boilerplate
is most common), and the detector's positions live in NORMALIZED text
(lowercased, whitespace-collapsed) so they cannot address raw bytes.
Removal must be byte-exact — the untouched remainder of every
stripped doc is sha-verifiable — so it re-derives spans in RAW
coordinates with a df-based (linear in corpus size) formulation:

1. unit rows — each doc split into positioned units: physical lines
   (default; headers and boilerplate are line-shaped, and it is ~50×
   cheaper than grams) or overlapping char ``k``-grams (char-exact
   mode), each unit carrying its raw char offset and a 60-bit hash;
2. frequent units — ``groupBy(hash)`` document-frequency; units in
   ≥ ``min_df`` docs survive (this is what breaks runs at
   doc-specific content — without it every doc is one giant run);
3. runs — per-doc maximal runs of consecutive frequent units
   (gaps-and-islands: ``pos − row_number()``), each run a candidate
   char range ``[start, end)``;
4. span groups — runs grouped by ``(hash60(substring), length)`` of
   their RAW text; only groups shared by ≥ ``min_df`` distinct docs
   qualify (the unit-df prefilter can overfire — common words — but
   this whole-span test is exact: qualifying spans are byte-identical
   across their docs, modulo a 60-bit+length collision);
5. strip — the min-id doc of each group keeps its copy; every other
   doc removes the range, text rebuilt JVM-side with one
   ``F.aggregate`` over its sorted (disjoint by construction) ranges.

Conservative by design: only byte-identical spans are stripped
(a case- or whitespace-variant header survives — stripping text you
cannot locate exactly would corrupt documents), and a run that one
doc extends with extra frequent context hashes into a different
group, keeping that doc's copy intact unless the extension itself is
shared by ≥ ``min_df`` docs.

Scale shape: two hash-keyed shuffles (unit df, span groups) + one
per-doc window — no pairwise join anywhere, cost linear in corpus
size and independent of how many docs share a span. Reference parity:
the reference has no span removal (``same-same`` is retrieval-only);
this is a training-pipeline operator (VERDICT r3 #2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from same_same_spark.pipeline.dedup import hash60_col, hash60_sql

__all__ = [
    "shared_span_ranges",
    "remove_shared_spans",
    "remove_shared_spans_sql",
    "strip_char_ranges",
    "strip_ranges_sql_ctes",
]


def _unit_rows(
    df: DataFrame, id_col: str, text_col: str, unit: str, k: int
) -> DataFrame:
    """``(id, pos, start, endpos, h)`` — one row per unit: ``pos`` is
    the unit index (consecutiveness key), ``[start, endpos)`` the raw
    char range the unit claims when stripped (a line claims its
    trailing newline; clamped to doc length later), ``h`` its 60-bit
    content hash."""
    if unit == "line":
        rows = df.select(
            F.col(id_col), F.posexplode(F.split(text_col, "\n")).alias("pos", "u")
        )
        w = Window.partitionBy(id_col).orderBy("pos")
        return (
            rows.withColumn("ulen", F.length("u").cast("long"))
            .withColumn(
                "start",
                F.coalesce(
                    F.sum(F.col("ulen") + 1).over(
                        w.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0).cast("long"),
                ),
            )
            .select(
                id_col,
                "pos",
                "start",
                (F.col("start") + F.col("ulen") + 1).alias("endpos"),
                hash60_col(F.col("u")).alias("h"),
            )
        )
    if unit == "gram":
        c = F.col(text_col)
        n = F.length(c) - F.lit(k - 1)
        hashes = F.when(
            c.isNull() | (n <= 0), F.array().cast("array<long>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda i: hash60_col(c.substr(i, F.lit(k))),
            )
        )
        return df.select(
            F.col(id_col), F.posexplode(hashes).alias("pos", "h")
        ).select(
            id_col,
            "pos",
            F.col("pos").cast("long").alias("start"),
            (F.col("pos") + k).cast("long").alias("endpos"),
            "h",
        )
    raise ValueError(f"unknown unit: {unit!r} (expected 'line' or 'gram')")


def shared_span_ranges(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    unit: str = "line",
    k: int = 8,
    min_df: int = 3,
    min_span_chars: int = 20,
) -> DataFrame:
    """All qualifying shared-span occurrences:
    ``(id, start, span_len, span_h60, span_docs, canon)`` — raw char
    range ``[start, start+span_len)``, 60-bit hash of the span text,
    number of distinct docs sharing the byte-identical span, and the
    group's canonical (min-id) keeper. Rows with ``id != canon`` are
    exactly what :func:`remove_shared_spans` strips."""
    units = _unit_rows(df, id_col, text_col, unit, k)
    freq = (
        units.groupBy("h")
        .agg(F.countDistinct(id_col).alias("u_df"))
        .filter(F.col("u_df") >= min_df)
        .select("h")
    )
    fu = units.join(freq, "h")
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    runs = (
        fu.withColumn("isl", F.col("pos") - F.row_number().over(wdoc))
        .groupBy(id_col, "isl")
        .agg(F.min("start").alias("start"), F.max("endpos").alias("endpos"))
        .drop("isl")
    )
    spans = (
        runs.join(df.select(id_col, text_col), id_col)
        .withColumn(
            "span_len",
            F.least("endpos", F.length(text_col).cast("long"))
            - F.col("start"),
        )
        .filter(F.col("span_len") >= min_span_chars)
        .withColumn(
            "span_h60",
            hash60_col(
                F.col(text_col).substr(
                    (F.col("start") + 1).cast("int"),
                    F.col("span_len").cast("int"),
                )
            ),
        )
        .select(id_col, "start", "span_len", "span_h60")
    )
    groups = (
        spans.groupBy("span_h60", "span_len")
        .agg(
            F.countDistinct(id_col).alias("span_docs"),
            F.min(id_col).alias("canon"),
        )
        .filter(F.col("span_docs") >= min_df)
    )
    return spans.join(groups, ["span_h60", "span_len"]).select(
        id_col, "start", "span_len", "span_h60", "span_docs", "canon"
    )


def remove_shared_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    unit: str = "line",
    k: int = 8,
    min_df: int = 3,
    min_span_chars: int = 20,
    with_stats: bool = False,
) -> DataFrame:
    """The corpus with shared spans stripped from every doc except
    each span group's canonical (min-id) keeper. All input columns
    survive with ``text_col`` rewritten; ``with_stats=True`` adds
    ``n_spans_removed`` and ``removed_chars`` (0 for untouched docs).

    The remainder is byte-exact: characters outside stripped ranges
    are untouched (rebuilt by substring stitching, not re-encoding),
    so ``sha(new_text)`` equals the sha of the original with the span
    bytes deleted."""
    ranges = shared_span_ranges(
        df, id_col, text_col, unit=unit, k=k, min_df=min_df,
        min_span_chars=min_span_chars,
    ).filter(F.col(id_col) != F.col("canon"))
    return strip_char_ranges(
        df, ranges, id_col=id_col, text_col=text_col, with_stats=with_stats
    )


def strip_char_ranges(
    df: DataFrame,
    ranges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_stats: bool = False,
) -> DataFrame:
    """Remove char ranges ``(id, start, span_len)`` from their docs,
    byte-exactly — the shared stitcher behind every span-removal
    ACTION (hash-equal spans, LCS overlap). Overlapping ranges strip
    their UNION exactly once (running-max cursor); docs with no range
    pass through untouched. ``with_stats`` adds ``n_spans_removed``
    (range rows, pre-union) and ``removed_chars`` (exact union
    length)."""
    strips = ranges.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("start", "span_len"))).alias(
            "_rs"
        ),
        F.count(F.lit(1)).alias("n_spans_removed"),
    )
    out = df.join(strips, id_col, "left")
    text = F.col(text_col)
    zero = F.struct(
        F.lit("").alias("o"), F.lit(0).cast("long").alias("c")
    )
    # Stitch with a running-max cursor: qualifying ranges may OVERLAP
    # (gram-mode runs closer than k-1 chars; LCS ranges from different
    # pairs), so the kept piece is clamped to length ≥ 0 and the
    # cursor never moves backwards — the union of the ranges is
    # removed exactly once. Line-mode ranges cannot overlap (each ends
    # before the next line start).
    rebuilt = F.aggregate(
        "_rs",
        zero,
        lambda acc, r: F.struct(
            F.concat(
                acc["o"],
                text.substr(
                    (acc["c"] + 1).cast("int"),
                    F.greatest(
                        r["start"] - acc["c"], F.lit(0).cast("long")
                    ).cast("int"),
                ),
            ).alias("o"),
            F.greatest(r["start"] + r["span_len"], acc["c"]).alias("c"),
        ),
        lambda acc: F.concat(
            acc["o"],
            text.substr(
                (acc["c"] + 1).cast("int"),
                F.greatest(
                    F.length(text).cast("long") - acc["c"],
                    F.lit(0).cast("long"),
                ).cast("int"),
            ),
        ),
    )
    out = out.withColumn(
        "_new_text",
        F.when(F.col("_rs").isNull(), text).otherwise(rebuilt),
    )
    if with_stats:
        out = out.withColumn(
            "n_spans_removed",
            F.coalesce("n_spans_removed", F.lit(0).cast("long")),
        ).withColumn(
            # union length — exact even when ranges overlap
            "removed_chars",
            (
                F.coalesce(F.length(text), F.lit(0))
                - F.coalesce(F.length("_new_text"), F.lit(0))
            ).cast("long"),
        )
    keep = [
        F.col("_new_text").alias(text_col) if c == text_col else F.col(c)
        for c in df.columns
    ]
    if with_stats:
        keep += [F.col("n_spans_removed"), F.col("removed_chars")]
    return out.select(*keep)


def remove_shared_spans_sql(
    table: str,
    id_expr: str = "doc_id",
    col_expr: str = "text",
    min_df: int = 3,
    min_span_chars: int = 20,
) -> str:
    """DuckDB twin of :func:`remove_shared_spans` (line mode), ending
    in CTE ``clean`` = ``(doc_id, text, n_spans_removed,
    removed_chars)`` over every input doc. Same five stages; line
    split is on the literal newline in both engines (Spark's regex
    ``\\n`` matches exactly the char ``chr(10)`` splits on)."""
    return f"""
docs AS (
  SELECT {id_expr} AS doc_id, {col_expr} AS text FROM {table}
),
units AS (
  SELECT doc_id, i AS pos, l[i + 1] AS u,
         length(l[i + 1]) AS ulen
  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM docs),
       unnest(range(len(l))) AS r(i)
),
pos_units AS (
  SELECT doc_id, pos,
         coalesce(sum(ulen + 1) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start,
         ulen,
         {hash60_sql("u")} AS h
  FROM units
),
freq AS (
  SELECT h FROM pos_units GROUP BY h
  HAVING count(DISTINCT doc_id) >= {min_df}
),
fu AS (
  SELECT p.*,
         p.pos - row_number() OVER (
           PARTITION BY p.doc_id ORDER BY p.pos) AS isl
  FROM pos_units p JOIN freq USING (h)
),
runs AS (
  SELECT doc_id, min(start) AS start,
         max(start + ulen + 1) AS endpos
  FROM fu GROUP BY doc_id, isl
),
spans AS (
  SELECT r.doc_id, r.start,
         least(r.endpos, length(d.text)) - r.start AS span_len,
         {hash60_sql(
             "substr(d.text, (r.start + 1)::INT,"
             " (least(r.endpos, length(d.text)) - r.start)::INT)"
         )} AS span_h60
  FROM runs r JOIN docs d USING (doc_id)
  WHERE least(r.endpos, length(d.text)) - r.start >= {min_span_chars}
),
groups AS (
  SELECT span_h60, span_len,
         count(DISTINCT doc_id) AS span_docs,
         min(doc_id) AS canon
  FROM spans GROUP BY span_h60, span_len
  HAVING count(DISTINCT doc_id) >= {min_df}
),
strips AS (
  SELECT s.doc_id, s.start, s.span_len
  FROM spans s JOIN groups g USING (span_h60, span_len)
  WHERE s.doc_id <> g.canon
),
{strip_ranges_sql_ctes()}"""


def strip_ranges_sql_ctes(docs: str = "docs", strips: str = "strips") -> str:
    """DuckDB twin of :func:`strip_char_ranges`, as a CTE fragment:
    given ``<docs>(doc_id, text)`` and ``<strips>(doc_id, start,
    span_len)``, defines ``pieces``/``rebuilt`` and the final
    ``clean`` = ``(doc_id, text, n_spans_removed, removed_chars)``."""
    return f"""pieces AS (
  -- running-max cursor: ranges can overlap (gram-mode runs closer
  -- than k-1 chars; LCS ranges from different pairs), so each kept
  -- piece is clamped to length >= 0 and the cursor never moves
  -- backwards — union removed exactly once
  SELECT doc_id, start, span_len,
         coalesce(max(start + span_len) OVER (
           PARTITION BY doc_id ORDER BY start
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prev_end
  FROM {strips}
),
rebuilt AS (
  SELECT p.doc_id,
         string_agg(
           substr(d.text, (p.prev_end + 1)::INT,
                  greatest(p.start - p.prev_end, 0)::INT),
           '' ORDER BY p.start)
           || substr(d.text, (max(p.start + p.span_len) + 1)::INT) AS text,
         count(*) AS n_spans_removed
  FROM pieces p JOIN {docs} d USING (doc_id)
  GROUP BY p.doc_id, d.text
),
clean AS (
  SELECT d.doc_id,
         coalesce(r.text, d.text) AS text,
         coalesce(r.n_spans_removed, 0) AS n_spans_removed,
         coalesce(length(d.text) - length(r.text), 0) AS removed_chars
  FROM {docs} d LEFT JOIN rebuilt r USING (doc_id)
)"""
