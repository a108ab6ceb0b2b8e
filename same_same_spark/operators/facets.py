"""Faceted search — metadata aggregations over a query's match set.

A beyond-reference fulltext feature (Elasticsearch's terms
aggregation): alongside the top-k hits, a search surface reports how
the FULL match set distributes over metadata fields ("412 hits: lang
en=390 de=22").

Pinned semantics (cross-engine, re-derived in :func:`duckdb_facets_sql`):

- a doc is in query q's match set iff it contains >= 1 of q's distinct
  X1 query terms (the engine's bag-of-words match semantics — every
  doc BM25 would score, not just the top-k);
- per (query, facet column): doc_count of each distinct facet VALUE
  over the match set, NULL values excluded (Elasticsearch's default
  missing-bucket behavior), values compared as strings;
- top-n values per (query, facet) under ``(doc_count DESC, value
  ASC)``, rank 1..n; zero-token queries yield no rows.

Scale shape: the match set is one broadcast term join on the exploded
distinct-token rows + a (query, doc) ``distinct`` — a single shuffle
bounded by matched docs; the facet counts are a map-side-combined
``groupBy`` whose cardinality is queries × facet values; top-n uses
the bounded sort_array/slice tournament (no WindowExec). Nothing holds
a query's full match list in one task.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from same_same_spark.bm25 import query_terms_df
from same_same_spark.stats import tokenized


def search_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    facet_cols: list[str],
    topn: int = 5,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Top-n facet values per (query, facet column) over the match set.

    Returns (query_id INT, facet STRING, value STRING, doc_count LONG,
    rank INT).
    """
    if not facet_cols:
        raise ValueError("facet_cols must be non-empty")
    if id_col in facet_cols or "doc_id" in facet_cols:
        raise ValueError(
            "faceting on the document id column is ill-posed (every "
            "value has count 1) and collides with the internal doc_id "
            "alias — pick a metadata column"
        )
    spark = docs_df.sparkSession
    qterms = query_terms_df(spark, queries)
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)

    matched = (
        tok.select(
            "doc_id", F.explode(F.array_distinct("tokens")).alias("term")
        )
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c).cast("string").alias(c) for c in facet_cols],
    )
    joined = matched.join(meta, "doc_id")

    counts = reduce(
        lambda a, b: a.unionByName(b),
        [
            joined.filter(F.col(c).isNotNull())
            .groupBy("query_id", F.col(c).alias("value"))
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .withColumn("facet", F.lit(c))
            for c in facet_cols
        ],
    )

    entry = F.struct(
        (-F.col("doc_count")).alias("negc"),
        F.col("value").alias("value"),
        F.col("doc_count").alias("doc_count"),
    )
    local = (
        counts.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "facet", "part")
        .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, topn).alias("c"))
    )
    merged = local.groupBy("query_id", "facet").agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("c"))), 1, topn
        ).alias("top")
    )
    return merged.select(
        "query_id", "facet", F.posexplode("top").alias("pos", "s")
    ).select(
        "query_id",
        "facet",
        F.col("s.value").alias("value"),
        F.col("s.doc_count").cast("long").alias("doc_count"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


def range_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    bounds: list[float],
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Range aggregation over the match set (Elasticsearch's range agg).

    ``bounds`` = ascending inner edges; buckets are half-open
    ``[lo, hi)`` with unbounded first/last ends. Returns (query_id INT,
    bucket INT 0-based, lo DOUBLE nullable, hi DOUBLE nullable,
    doc_count LONG) — EVERY bucket is emitted per matching query, zero
    counts included (the fixed-shape histogram a UI renders); NULL
    values are excluded from every bucket. Match set as in
    :func:`search_facets`.
    """
    if sorted(bounds) != list(bounds) or len(set(bounds)) != len(bounds):
        raise ValueError("bounds must be strictly ascending")
    spark = docs_df.sparkSession
    qterms = query_terms_df(spark, queries)
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    matched = (
        tok.select(
            "doc_id", F.explode(F.array_distinct("tokens")).alias("term")
        )
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("double").alias("v"),
    )
    edges = [None] + list(bounds) + [None]
    buckets = [
        (i, edges[i], edges[i + 1]) for i in range(len(edges) - 1)
    ]
    bucket_expr = F.lit(len(buckets) - 1)
    for i, (_, lo, hi) in reversed(list(enumerate(buckets[:-1]))):
        bucket_expr = F.when(F.col("v") < F.lit(hi), F.lit(i)).otherwise(
            bucket_expr
        )
    counted = (
        matched.join(meta, "doc_id")
        .filter(F.col("v").isNotNull())
        .withColumn("bucket", bucket_expr)
        .groupBy("query_id", "bucket")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    shape = spark.createDataFrame(
        [(i, lo, hi) for i, lo, hi in buckets],
        "bucket INT, lo DOUBLE, hi DOUBLE",
    )
    return (
        matched.select("query_id")
        .distinct()
        .crossJoin(F.broadcast(shape))
        .join(counted, ["query_id", "bucket"], "left")
        .select(
            "query_id",
            F.col("bucket").cast("int").alias("bucket"),
            "lo",
            "hi",
            F.coalesce(F.col("doc_count"), F.lit(0))
            .cast("long")
            .alias("doc_count"),
        )
    )


_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _match_set(docs_df, queries, id_col, text_col):
    """(query_id, doc_id) match set — the one relation every
    aggregation in this module shares: a doc matches iff it contains
    >= 1 of the query's distinct X1 terms."""
    spark = docs_df.sparkSession
    qterms = query_terms_df(spark, queries)
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    return (
        tok.select(
            "doc_id", F.explode(F.array_distinct("tokens")).alias("term")
        )
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )


def histogram_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    interval: float,
    max_buckets: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Histogram aggregation over the match set (Elasticsearch's
    ``histogram`` agg): fixed-``interval`` buckets keyed
    ``floor(v / interval) * interval``, NULL values excluded, EVERY
    bucket between each query's min and max key emitted (ES's default
    ``min_doc_count=0`` within the data bounds — the fixed-shape
    histogram a UI renders).

    Returns (query_id INT, key DOUBLE, doc_count LONG).

    Guards: ``interval`` must be > 0; a per-query span wider than
    ``max_buckets`` buckets raises at execution time (ES's
    too-many-buckets breaker — a degenerate interval over a wide field
    must not materialize millions of rows per query).

    Scale shape: one count per non-empty (query, bucket) from a
    map-side-combined groupBy; the zero-fill works on the per-query
    BOUNDS row (two longs), never the data — the emitted shape is
    bounded by ``max_buckets`` per query.
    """
    if not interval > 0:
        raise ValueError("interval must be > 0")
    matched = _match_set(docs_df, queries, id_col, text_col)
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("double").alias("v"),
    )
    assigned = (
        matched.join(meta, "doc_id")
        .filter(F.col("v").isNotNull())
        .withColumn(
            "idx", F.floor(F.col("v") / F.lit(float(interval)))
        )
    )
    counted = assigned.groupBy("query_id", "idx").agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    # the breaker rides INSIDE the sequence bound (an unused projection
    # would be pruned by Catalyst and never fire): assert_true yields
    # NULL on success, so the when() resolves to hi — or errors.
    hi_checked = F.when(
        F.assert_true(
            F.col("hi") - F.col("lo") < F.lit(int(max_buckets)),
            F.lit(
                f"histogram span exceeds max_buckets={max_buckets}; "
                "widen the interval"
            ),
        ).isNull(),
        F.col("hi"),
    )
    shape = (
        counted.groupBy("query_id")
        .agg(F.min("idx").alias("lo"), F.max("idx").alias("hi"))
        .select(
            "query_id",
            F.explode(F.sequence(F.col("lo"), hi_checked)).alias("idx"),
        )
    )
    return shape.join(counted, ["query_id", "idx"], "left").select(
        "query_id",
        (F.col("idx").cast("double") * F.lit(float(interval))).alias("key"),
        F.coalesce(F.col("doc_count"), F.lit(0)).cast("long").alias(
            "doc_count"
        ),
    )


def duckdb_histogram_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    value_col: str,
    interval: float,
) -> str:
    """DuckDB twin of :func:`histogram_facets` (generate_series zero-fill
    vs Spark's sequence explode; same floor-division key math)."""
    qvalues = _qterm_values(queries)
    return f"""
WITH {_matched_ctes(table, id_col, text_col, qvalues)},
assigned AS (
  SELECT m.query_id,
         floor(CAST(d.{value_col} AS DOUBLE) / {float(interval)})::BIGINT
           AS idx
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{value_col} IS NOT NULL
),
counted AS (
  SELECT query_id, idx, count(*)::BIGINT AS doc_count
  FROM assigned GROUP BY query_id, idx
),
bounds AS (
  SELECT query_id, min(idx) AS lo, max(idx) AS hi
  FROM counted GROUP BY query_id
),
shape AS (
  SELECT b.query_id, unnest(range(b.lo, b.hi + 1)) AS idx FROM bounds b
)
SELECT s.query_id,
       s.idx::DOUBLE * {float(interval)} AS key,
       coalesce(c.doc_count, 0)::BIGINT AS doc_count
FROM shape s
LEFT JOIN counted c ON c.query_id = s.query_id AND c.idx = s.idx
"""


def percentiles_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    percents: list[float] = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0),
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Percentiles aggregation over the match set — Elasticsearch's
    ``percentiles`` agg at its default percents, but EXACT
    (linear-interpolated, Spark ``percentile`` == DuckDB
    ``quantile_cont`` — the same cross-engine identity corpus_profile
    pins) instead of ES's t-digest approximation; at ES scale you'd
    swap ``percentile_approx`` into the same expression slot.

    Returns (query_id INT, percent DOUBLE, value DOUBLE); NULL values
    excluded; queries with no values yield no rows.

    Scale shape: ``percentile`` is a per-group sort over the MATCHED
    values only — one row of state per (query, percent) out.
    """
    ps = [float(p) for p in percents]
    if not ps or any(not 0.0 < p <= 100.0 for p in ps):
        raise ValueError("percents must be in (0, 100]")
    if len(set(ps)) != len(ps):
        raise ValueError("percents must be distinct")
    matched = _match_set(docs_df, queries, id_col, text_col)
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("double").alias("v"),
    )
    agg = (
        matched.join(meta, "doc_id")
        .filter(F.col("v").isNotNull())
        .groupBy("query_id")
        .agg(
            F.percentile(
                F.col("v"), F.array(*[F.lit(p / 100.0) for p in ps])
            ).alias("q")
        )
    )
    pcts = F.array(*[F.lit(p) for p in ps])
    return agg.select(
        "query_id", F.posexplode("q").alias("pos", "value")
    ).select(
        "query_id",
        F.element_at(pcts, F.col("pos") + 1).alias("percent"),
        "value",
    )


def duckdb_percentiles_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    value_col: str,
    percents: list[float] = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0),
    round_value: int = 6,
) -> str:
    """DuckDB twin of :func:`percentiles_facets` (``quantile_cont``
    list form + unnest(range()) ordinals — DuckDB 1.0 has no WITH
    ORDINALITY)."""
    ps = [float(p) for p in percents]
    qvalues = _qterm_values(queries)
    fracs = ", ".join(str(p / 100.0) for p in ps)
    plist = ", ".join(str(p) for p in ps)
    return f"""
WITH {_matched_ctes(table, id_col, text_col, qvalues)},
vals AS (
  SELECT m.query_id, CAST(d.{value_col} AS DOUBLE) AS v
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{value_col} IS NOT NULL
),
agg AS (
  SELECT query_id, quantile_cont(v, [{fracs}]) AS q
  FROM vals GROUP BY query_id
),
ord AS (SELECT unnest(range({len(ps)})) AS i)
SELECT a.query_id,
       ([{plist}])[o.i + 1]::DOUBLE AS percent,
       round(a.q[o.i + 1], {round_value}) AS value
FROM agg a CROSS JOIN ord o
"""


def cardinality_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Field-count aggregations over the match set — Elasticsearch's
    ``value_count`` + ``cardinality`` + ``missing`` in one pass, but
    cardinality EXACT (``count(DISTINCT ...)``) instead of ES's HLL
    approximation; at ES scale you'd swap ``approx_count_distinct``
    into the same expression slot (the profile store's sketch mode is
    the worked example).

    Returns (query_id INT, value_count LONG, distinct_count LONG,
    missing_count LONG) — one row per query WITH matches (even if every
    value is NULL: then 0/0/n).
    """
    matched = _match_set(docs_df, queries, id_col, text_col)
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("string").alias("v"),
    )
    return (
        matched.join(meta, "doc_id")
        .groupBy("query_id")
        .agg(
            F.count("v").alias("value_count"),
            F.countDistinct("v").alias("distinct_count"),
            F.count(F.when(F.col("v").isNull(), 1)).alias(
                "missing_count"
            ),
        )
        .select(
            "query_id",
            F.col("value_count").cast("long").alias("value_count"),
            F.col("distinct_count").cast("long").alias("distinct_count"),
            F.col("missing_count").cast("long").alias("missing_count"),
        )
    )


def duckdb_cardinality_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    value_col: str,
) -> str:
    """DuckDB twin of :func:`cardinality_facets`."""
    qvalues = _qterm_values(queries)
    return f"""
WITH {_matched_ctes(table, id_col, text_col, qvalues)},
vals AS (
  SELECT m.query_id, CAST(d.{value_col} AS VARCHAR) AS v
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
)
SELECT query_id,
       count(v)::BIGINT AS value_count,
       count(DISTINCT v)::BIGINT AS distinct_count,
       count(*) FILTER (WHERE v IS NULL)::BIGINT AS missing_count
FROM vals GROUP BY query_id
"""


def terms_metrics_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    facet_col: str,
    value_col: str,
    topn: int = 5,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Terms aggregation with a metric SUB-aggregation — the
    Elasticsearch bread-and-butter nesting ``terms(facet) {
    stats(value) }``: for each query's top-n facet values by match
    count, the count/min/max/sum/avg of a numeric field over that
    bucket's docs.

    Pinned semantics (cross-engine, re-derived in
    :func:`duckdb_terms_metrics_sql`):

    - buckets: distinct ``facet_col`` values (string-cast, NULLs
      excluded) over the match set, top-n per query under
      ``(doc_count DESC, value ASC)``, rank 1..n;
    - per kept bucket: ``count_vals`` (non-NULL metric values),
      ``min_val``/``max_val``/``sum_val``/``avg_val`` with
      :func:`stats_facets`'s exactness contract (integer fields sum in
      the integer domain — derived doubles bit-identical); an all-NULL
      bucket reports 0 count and NULL metrics.

    Returns (query_id INT, value STRING, doc_count LONG, rank INT,
    count_vals LONG, min_val DOUBLE, max_val DOUBLE, sum_val DOUBLE,
    avg_val DOUBLE).

    Scale shape: ONE map-side-combined groupBy computes the bucket
    count and every metric piece together (constant state per bucket);
    the top-n selection is the bounded tournament over aggregated
    bucket rows — the sub-agg adds zero passes and zero shuffles over
    the plain terms agg.
    """
    dtype = dict(docs_df.dtypes).get(value_col)
    if dtype is None:
        raise ValueError(f"no column {value_col!r} in docs_df")
    cast_to = "long" if dtype in _INT_TYPES else "double"
    matched = _match_set(docs_df, queries, id_col, text_col)
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(facet_col).cast("string").alias("value"),
        F.col(value_col).cast(cast_to).alias("v"),
    )
    buckets = (
        matched.join(meta, "doc_id")
        .filter(F.col("value").isNotNull())
        .groupBy("query_id", "value")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.count("v").alias("count_vals"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
            F.sum("v").alias("vsum"),
        )
    )
    entry = F.struct(
        (-F.col("doc_count")).alias("negc"),
        F.col("value").alias("value"),
        F.col("doc_count").alias("doc_count"),
        F.col("count_vals").alias("count_vals"),
        F.col("vmin").alias("vmin"),
        F.col("vmax").alias("vmax"),
        F.col("vsum").alias("vsum"),
    )
    local = (
        buckets.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "part")
        .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, topn).alias("c"))
    )
    merged = (
        local.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("c"))), 1, topn
            ).alias("top")
        )
        .select("query_id", F.posexplode("top").alias("pos", "s"))
    )
    n_vals = F.col("s.count_vals").cast("double")
    vsum = F.col("s.vsum").cast("double")
    return merged.select(
        "query_id",
        F.col("s.value").alias("value"),
        F.col("s.doc_count").cast("long").alias("doc_count"),
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("s.count_vals").cast("long").alias("count_vals"),
        F.col("s.vmin").cast("double").alias("min_val"),
        F.col("s.vmax").cast("double").alias("max_val"),
        F.when(F.col("s.count_vals") > 0, vsum).alias("sum_val"),
        F.when(F.col("s.count_vals") > 0, vsum / n_vals).alias("avg_val"),
    )


def duckdb_terms_metrics_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    facet_col: str,
    value_col: str,
    topn: int = 5,
    integer_field: bool = True,
) -> str:
    """DuckDB twin of :func:`terms_metrics_facets` (window ranking vs
    the bounded tournament; integer sums cast through BIGINT)."""
    qvalues = _qterm_values(queries)
    vcast = "BIGINT" if integer_field else "DOUBLE"
    sum_expr = (
        "CAST(sum(v) AS BIGINT)::DOUBLE"
        if integer_field
        else "sum(v)::DOUBLE"
    )
    return f"""
WITH {_matched_ctes(table, id_col, text_col, qvalues)},
rows_ AS (
  SELECT m.query_id, CAST(d.{facet_col} AS VARCHAR) AS value,
         CAST(d.{value_col} AS {vcast}) AS v
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{facet_col} IS NOT NULL
),
buckets AS (
  SELECT query_id, value,
         count(*)::BIGINT AS doc_count,
         count(v)::BIGINT AS count_vals,
         min(v)::DOUBLE AS min_val,
         max(v)::DOUBLE AS max_val,
         CASE WHEN count(v) > 0 THEN {sum_expr} END AS sum_val,
         CASE WHEN count(v) > 0
              THEN {sum_expr} / count(v)::DOUBLE END AS avg_val
  FROM rows_ GROUP BY query_id, value
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY doc_count DESC, value ASC
  ) AS rank
  FROM buckets
)
SELECT query_id, value, doc_count, rank::INTEGER AS rank,
       count_vals, min_val, max_val, sum_val, avg_val
FROM ranked WHERE rank <= {topn}
"""


def adjacency_matrix_facets(
    docs_df: DataFrame,
    filters: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Adjacency-matrix aggregation — Elasticsearch's
    ``adjacency_matrix``: given NAMED term filters, the doc count of
    every filter and of every pairwise intersection (key ``"a&b"``,
    names in ascending order), zero-doc buckets omitted (ES behavior).
    The classic co-occurrence/overlap matrix ("how many docs match
    both the 'spark' alert and the 'flink' alert").

    Filter names must not contain ``&`` and must be unique (ES
    contract — the separator is the key syntax).

    Returns (key STRING, doc_count LONG).

    Scale shape: ONE matched relation feeds everything; per doc the
    sorted set of matching filter names (bounded by the filter count —
    an agg state of ≤ |filters| strings) expands to its singles +
    pairs as pure column math, then one map-side-combined count per
    key. No self-join on docs, no pass per filter pair — cost is
    linear in matched docs × matched-filters-per-doc².
    """
    if not filters:
        raise ValueError("filters must be non-empty")
    names = [n for n, _ in filters]
    if len(set(names)) != len(names):
        raise ValueError("filter names must be unique")
    for n in names:
        if "&" in n:
            raise ValueError(
                f"filter name {n!r} contains the '&' key separator"
            )
    matched = _match_set(
        docs_df,
        [(i, text) for i, (_, text) in enumerate(filters)],
        id_col,
        text_col,
    )
    spark = docs_df.sparkSession
    ndf = spark.createDataFrame(
        list(enumerate(names)), "query_id INT, name STRING"
    )
    per_doc = (
        matched.join(F.broadcast(ndf), "query_id")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("name")).alias("names"))
    )
    pairs = F.flatten(
        F.transform(
            F.col("names"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("names"), i + F.lit(2),
                    F.size("names"),
                ),
                lambda y: F.concat(x, F.lit("&"), y),
            ),
        )
    )
    keys = F.concat(F.col("names"), pairs)
    return (
        per_doc.select(F.explode(keys).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
    )


def duckdb_adjacency_matrix_sql(
    table: str,
    id_col: str,
    text_col: str,
    filters: list[tuple[str, str]],
) -> str:
    """DuckDB twin of :func:`adjacency_matrix_facets` — independent
    re-derivation via a doc-keyed SELF-JOIN of the per-filter match
    sets (vs Spark's per-doc array expansion), so the expansion math
    itself is under differential."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql, tokenize_py

    qrows = [
        f"({i}, '{name}', '{term}')"
        for i, (name, text) in enumerate(filters)
        for term in sorted(set(tokenize_py(text)))
    ]
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL, NULL) LIMIT 0"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
qt AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, name, term)),
matched AS (
  SELECT DISTINCT q.name, t.doc_id
  FROM (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks
  ) t JOIN qt q ON t.term = q.term
),
singles AS (
  SELECT name AS key, count(*)::BIGINT AS doc_count
  FROM matched GROUP BY name
),
pairs AS (
  SELECT a.name || '&' || b.name AS key, count(*)::BIGINT AS doc_count
  FROM matched a JOIN matched b
    ON a.doc_id = b.doc_id AND a.name < b.name
  GROUP BY 1
)
SELECT * FROM singles UNION ALL SELECT * FROM pairs
"""


def composite_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    source_cols: list[str],
    size: int = 10,
    after: dict[int, tuple] | None = None,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Composite aggregation over the match set — Elasticsearch's
    ``composite`` agg: doc counts for every distinct combination of the
    ``source_cols`` values, paginated in KEY order with an after-key
    cursor (the only ES agg that pages through unbounded bucket
    spaces).

    Pinned semantics (cross-engine, re-derived in
    :func:`duckdb_composite_sql`):

    - bucket key = the source columns cast to string; a doc with NULL
      in ANY source column is excluded (ES ``missing_bucket: false``);
    - buckets order lexicographically ASCENDING by the key tuple;
    - ``after[query_id]`` = a key tuple; the page is the first ``size``
      buckets STRICTLY AFTER it (omitted query_id → from the start);
    - returns (query_id INT, <source_cols...> STRING, doc_count LONG,
      bucket_rank INT 1..size).

    Scale shape: counts are one map-side-combined groupBy (cardinality
    = queries × live key combinations); the page is a bounded
    tournament ASCENDING on the key struct — constant memory per
    partition, never a WindowExec; the after filter prunes before the
    tournament, so deep paging costs the same as page one.
    """
    if not source_cols:
        raise ValueError("source_cols must be non-empty")
    if size <= 0:
        raise ValueError("size must be positive")
    after = dict(after or {})
    for qid, tup in after.items():
        if len(tup) != len(source_cols):
            raise ValueError(
                f"after[{qid}] has {len(tup)} values, expected "
                f"{len(source_cols)}"
            )
    spark = docs_df.sparkSession
    matched = _match_set(docs_df, queries, id_col, text_col)
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c).cast("string").alias(c) for c in source_cols],
    )
    joined = matched.join(meta, "doc_id")
    for c in source_cols:
        joined = joined.filter(F.col(c).isNotNull())
    counts = joined.groupBy("query_id", *source_cols).agg(
        F.count(F.lit(1)).alias("doc_count")
    )

    if after:
        adf = spark.createDataFrame(
            [(qid,) + tuple(str(v) for v in tup)
             for qid, tup in sorted(after.items())],
            ", ".join(
                ["query_id INT"]
                + [f"__a{i} STRING" for i in range(len(source_cols))]
            ),
        )
        counts = counts.join(F.broadcast(adf), "query_id", "left")
        # lexicographic strictly-after: (c1>a1) | (c1=a1 & c2>a2) | ...
        pred = F.lit(False)
        for i in reversed(range(len(source_cols))):
            c, a = F.col(source_cols[i]), F.col(f"__a{i}")
            pred = (c > a) | ((c == a) & pred)
        counts = counts.filter(
            F.col("__a0").isNull() | pred
        ).drop(*[f"__a{i}" for i in range(len(source_cols))])

    entry = F.struct(
        *[F.col(c).alias(c) for c in source_cols],
        F.col("doc_count").alias("doc_count"),
    )
    local = (
        counts.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "part")
        .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, size).alias("c"))
    )
    return (
        local.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("c"))), 1, size
            ).alias("page")
        )
        .select("query_id", F.posexplode("page").alias("pos", "s"))
        .select(
            "query_id",
            *[F.col(f"s.{c}").alias(c) for c in source_cols],
            F.col("s.doc_count").cast("long").alias("doc_count"),
            (F.col("pos") + 1).cast("int").alias("bucket_rank"),
        )
    )


def duckdb_composite_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    source_cols: list[str],
    size: int = 10,
    after: dict[int, tuple] | None = None,
) -> str:
    """DuckDB twin of :func:`composite_facets` (window-function
    pagination over the full bucket list vs Spark's pruned bounded
    tournament — so after-key pruning correctness is what the
    differential checks)."""
    qvalues = _qterm_values(queries)
    keycols = ", ".join(
        f"CAST(d.{c} AS VARCHAR) AS {c}" for c in source_cols
    )
    notnull = " AND ".join(f"d.{c} IS NOT NULL" for c in source_cols)
    gb = ", ".join(source_cols)
    after = dict(after or {})
    if after:
        arows = ", ".join(
            "(" + str(qid) + ", "
            + ", ".join(f"'{v}'" for v in tup) + ")"
            for qid, tup in sorted(after.items())
        )
        acols = ", ".join(f"a{i}" for i in range(len(source_cols)))
        after_cte = (
            f"afters AS (SELECT * FROM (VALUES {arows}) "
            f"AS v(query_id, {acols})),"
        )
        tup_c = "(" + ", ".join(f"c.{c}" for c in source_cols) + ")"
        tup_a = "(" + ", ".join(
            f"a.a{i}" for i in range(len(source_cols))
        ) + ")"
        after_join = "LEFT JOIN afters a ON c.query_id = a.query_id"
        after_where = f"WHERE a.a0 IS NULL OR {tup_c} > {tup_a}"
    else:
        after_cte = ""
        after_join = ""
        after_where = ""
    order = ", ".join(f"{c} ASC" for c in source_cols)
    outcols = ", ".join(source_cols)
    return f"""
WITH {_matched_ctes(table, id_col, text_col, qvalues)},
counts AS (
  SELECT m.query_id, {keycols}, count(*)::BIGINT AS doc_count
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE {notnull}
  GROUP BY m.query_id, {gb}
),
{after_cte}
paged AS (
  SELECT c.*, row_number() OVER (
    PARTITION BY c.query_id ORDER BY {order}
  ) AS bucket_rank
  FROM counts c {after_join}
  {after_where}
)
SELECT query_id, {outcols}, doc_count, bucket_rank::INTEGER AS bucket_rank
FROM paged WHERE bucket_rank <= {size}
"""


def _qterm_values(queries: list[tuple[int, str]]) -> str:
    from same_same_spark.text.tokenizer import tokenize_py

    qrows = [
        f"({qid}, '{term}')"
        for qid, text in queries
        for term in sorted(set(tokenize_py(text)))
    ]
    return ", ".join(qrows) if qrows else "(NULL, NULL) LIMIT 0"


def _matched_ctes(
    table: str, id_col: str, text_col: str, qvalues: str
) -> str:
    """The shared toks/qt/matched CTE prefix (match-set definition,
    spelled once for the newer aggregation twins)."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql

    return f"""toks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
qt AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)),
matched AS (
  SELECT DISTINCT q.query_id, t.doc_id
  FROM (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks
  ) t JOIN qt q ON t.term = q.term
)"""


def stats_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    extended: bool = False,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Metric aggregation over the match set (Elasticsearch's ``stats``
    / ``extended_stats``): per query, the count / min / max / sum / avg
    of a numeric field over every matching doc, NULL values excluded.
    ``extended=True`` adds sum_of_squares, variance and std_deviation
    (population variance via ES's own closed form
    ``sum_sq/n - (sum/n)^2``).

    Returns (query_id INT, count_vals LONG, min_val DOUBLE,
    max_val DOUBLE, sum_val DOUBLE, avg_val DOUBLE[, sum_sq DOUBLE,
    variance DOUBLE, std_dev DOUBLE]). Queries with an empty match set
    (or all-NULL values) yield no row.

    Cross-engine exactness: when ``value_col`` is an integer type the
    sums aggregate in the INTEGER domain (order-independent, exact) and
    every double in the output derives from exact integers through one
    pinned closed-form expression — bit-identical across engines. For
    floating inputs the sums are order-dependent as usual (6dp rounding
    absorbs it at moderate magnitudes; documented caveat).

    Scale shape: the match set is the one broadcast-term-join +
    ``distinct`` every facet shares; the aggregation is a
    map-side-combined ``groupBy(query_id)`` with one output row per
    query — no per-value state anywhere.
    """
    spark = docs_df.sparkSession
    qterms = query_terms_df(spark, queries)
    tok = tokenized(docs_df, id_col=id_col, text_col=text_col)
    matched = (
        tok.select(
            "doc_id", F.explode(F.array_distinct("tokens")).alias("term")
        )
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    dtype = dict(docs_df.dtypes).get(value_col)
    if dtype is None:
        raise ValueError(f"no column {value_col!r} in docs_df")
    is_int = dtype in _INT_TYPES
    cast_to = "long" if is_int else "double"
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast(cast_to).alias("v"),
    )
    agg = (
        matched.join(meta, "doc_id")
        .filter(F.col("v").isNotNull())
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("count_vals"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
            F.sum("v").alias("vsum"),
            F.sum(F.col("v") * F.col("v")).alias("vsumsq"),
        )
    )
    n = F.col("count_vals").cast("double")
    s = F.col("vsum").cast("double")
    avg = s / n
    cols = [
        F.col("query_id"),
        F.col("count_vals").cast("long").alias("count_vals"),
        F.col("vmin").cast("double").alias("min_val"),
        F.col("vmax").cast("double").alias("max_val"),
        s.alias("sum_val"),
        avg.alias("avg_val"),
    ]
    if extended:
        ssq = F.col("vsumsq").cast("double")
        variance = ssq / n - (s / n) * (s / n)
        cols += [
            ssq.alias("sum_sq"),
            variance.alias("variance"),
            F.sqrt(variance).alias("std_dev"),
        ]
    return agg.select(*cols)


def duckdb_stats_facets_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    value_col: str,
    extended: bool = False,
    integer_field: bool = True,
) -> str:
    """DuckDB twin of :func:`stats_facets` — integer-domain sums cast
    through BIGINT (DuckDB sums integers into HUGEINT; the explicit
    cast keeps the output schema driver-comparable) and the SAME
    closed-form double expressions, so exact-integer inputs compare
    bit-identically."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql, tokenize_py

    qrows = [
        f"({qid}, '{term}')"
        for qid, text in queries
        for term in sorted(set(tokenize_py(text)))
    ]
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL) LIMIT 0"
    vcast = "BIGINT" if integer_field else "DOUBLE"
    ext = (
        """,
       CAST(sum(v * v) AS BIGINT)::DOUBLE AS sum_sq,
       CAST(sum(v * v) AS BIGINT)::DOUBLE / count(*)::DOUBLE
         - (CAST(sum(v) AS BIGINT)::DOUBLE / count(*)::DOUBLE)
           * (CAST(sum(v) AS BIGINT)::DOUBLE / count(*)::DOUBLE)
         AS variance,
       sqrt(CAST(sum(v * v) AS BIGINT)::DOUBLE / count(*)::DOUBLE
         - (CAST(sum(v) AS BIGINT)::DOUBLE / count(*)::DOUBLE)
           * (CAST(sum(v) AS BIGINT)::DOUBLE / count(*)::DOUBLE))
         AS std_dev"""
        if extended and integer_field
        else (
            """,
       sum(v * v)::DOUBLE AS sum_sq,
       sum(v * v)::DOUBLE / count(*)::DOUBLE
         - (sum(v)::DOUBLE / count(*)::DOUBLE)
           * (sum(v)::DOUBLE / count(*)::DOUBLE) AS variance,
       sqrt(sum(v * v)::DOUBLE / count(*)::DOUBLE
         - (sum(v)::DOUBLE / count(*)::DOUBLE)
           * (sum(v)::DOUBLE / count(*)::DOUBLE)) AS std_dev"""
            if extended
            else ""
        )
    )
    sum_cast = (
        "CAST(sum(v) AS BIGINT)::DOUBLE" if integer_field else "sum(v)::DOUBLE"
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
qt AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)),
matched AS (
  SELECT DISTINCT q.query_id, t.doc_id
  FROM (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks
  ) t JOIN qt q ON t.term = q.term
),
vals AS (
  SELECT m.query_id, CAST(d.{value_col} AS {vcast}) AS v
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{value_col} IS NOT NULL
)
SELECT query_id,
       count(*)::BIGINT AS count_vals,
       min(v)::DOUBLE AS min_val,
       max(v)::DOUBLE AS max_val,
       {sum_cast} AS sum_val,
       {sum_cast} / count(*)::DOUBLE AS avg_val{ext}
FROM vals GROUP BY query_id
"""


def facet_top_hits(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    facet_col: str,
    topn: int = 5,
    k_hits: int = 3,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Top-hits aggregation (Elasticsearch ``top_hits`` inside a terms
    agg): for each query's top-n facet values by match count, the
    k_hits best BM25-scored matching docs carrying that value.

    Pinned semantics (cross-engine, re-derived in
    :func:`duckdb_top_hits_sql`):

    - match set + scores = the engine's pinned BM25 over each query's
      distinct X1 tokens (``bm25.scored_matches``), so the bucket
      membership here is score-carrying, not merely boolean;
    - buckets: distinct ``facet_col`` values (cast to string, NULLs
      excluded) ranked per query by ``(doc_count DESC, value ASC)``,
      top-n kept, ``value_rank`` 1..n;
    - hits: within each kept (query, value) bucket, top-``k_hits``
      docs under the pinned ``(round(score, 9) DESC, doc_id ASC)``,
      ``hit_rank`` 1..k_hits.

    Returns (query_id INT, value STRING, doc_count LONG,
    value_rank INT, doc_id, score DOUBLE, hit_rank INT).

    Scale shape: one scored-match relation feeds both the bucket
    counts (map-side-combined groupBy) and the hit selection; the kept
    bucket set is queries×topn rows — broadcast back, so hit ranking
    only ever touches rows of surviving buckets. Both rankings are
    bounded sort_array/slice tournaments keyed by (query, [value]) —
    no WindowExec, no buffer proportional to a bucket's match count.
    """
    from same_same_spark.bm25 import scored_matches

    scored = scored_matches(
        docs_df, queries, id_col=id_col, text_col=text_col
    )
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(facet_col).cast("string").alias("value"),
    )
    joined = scored.join(meta, "doc_id").filter(F.col("value").isNotNull())

    counts = joined.groupBy("query_id", "value").agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    ventry = F.struct(
        (-F.col("doc_count")).alias("negc"),
        F.col("value").alias("value"),
        F.col("doc_count").alias("doc_count"),
    )
    vlocal = (
        counts.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "part")
        .agg(F.slice(F.sort_array(F.collect_list(ventry)), 1, topn).alias("c"))
    )
    topvals = (
        vlocal.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("c"))), 1, topn
            ).alias("top")
        )
        .select("query_id", F.posexplode("top").alias("pos", "s"))
        .select(
            "query_id",
            F.col("s.value").alias("value"),
            F.col("s.doc_count").cast("long").alias("doc_count"),
            (F.col("pos") + 1).cast("int").alias("value_rank"),
        )
    )

    kept = joined.join(
        F.broadcast(topvals), ["query_id", "value"], "inner"
    )
    hentry = F.struct(
        (F.lit(0.0) - F.round("score", 9)).alias("nk"),
        F.col("doc_id").alias("doc_id"),
        F.col("score").alias("score"),
    )
    hlocal = (
        kept.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "value", "doc_count", "value_rank", "part")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(hentry)), 1, k_hits
            ).alias("c")
        )
    )
    return (
        hlocal.groupBy("query_id", "value", "doc_count", "value_rank")
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("c"))), 1, k_hits
            ).alias("top")
        )
        .select(
            "query_id",
            "value",
            "doc_count",
            "value_rank",
            F.posexplode("top").alias("pos", "s"),
        )
        .select(
            "query_id",
            "value",
            "doc_count",
            "value_rank",
            F.col("s.doc_id").alias("doc_id"),
            F.col("s.score").alias("score"),
            (F.col("pos") + 1).cast("int").alias("hit_rank"),
        )
    )


def duckdb_top_hits_sql(
    scored_sql: str,
    table: str,
    id_col: str,
    facet_col: str,
    topn: int = 5,
    k_hits: int = 3,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`facet_top_hits` (two window-function
    rankings vs Spark's bounded tournaments; score compared at 6dp).
    ``scored_sql`` = the full-match-set SQL (``duckdb_scored_sql``)."""
    return f"""
WITH scored AS ({scored_sql}),
joined AS (
  SELECT s.query_id, s.doc_id, s.score,
         CAST(d.{facet_col} AS VARCHAR) AS value
  FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
  WHERE d.{facet_col} IS NOT NULL
),
counts AS (
  SELECT query_id, value, count(*)::BIGINT AS doc_count
  FROM joined GROUP BY query_id, value
),
topvals AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY doc_count DESC, value ASC
  ) AS value_rank
  FROM counts QUALIFY value_rank <= {topn}
),
hits AS (
  SELECT j.query_id, j.value, t.doc_count, t.value_rank,
         j.doc_id, j.score,
         row_number() OVER (
           PARTITION BY j.query_id, j.value
           ORDER BY round(j.score, 9) DESC, j.doc_id ASC
         ) AS hit_rank
  FROM joined j
  JOIN topvals t ON j.query_id = t.query_id AND j.value = t.value
)
SELECT query_id, value, doc_count, value_rank::INTEGER AS value_rank,
       doc_id, round(score, {round_score}) AS score,
       hit_rank::INTEGER AS hit_rank
FROM hits WHERE hit_rank <= {k_hits}
"""


def duckdb_range_facets_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    value_col: str,
    bounds: list[float],
) -> str:
    """DuckDB twin of :func:`range_facets` (bucket assignment re-derived
    with an independent closed-form: count of edges <= v)."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql, tokenize_py

    qrows = [
        f"({qid}, '{term}')"
        for qid, text in queries
        for term in sorted(set(tokenize_py(text)))
    ]
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL) LIMIT 0"
    edges = [None] + list(bounds) + [None]
    brows = ", ".join(
        f"({i}, {'NULL' if edges[i] is None else edges[i]}, "
        f"{'NULL' if edges[i + 1] is None else edges[i + 1]})"
        for i in range(len(edges) - 1)
    )
    blist = ", ".join(str(b) for b in bounds)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
qt AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)),
matched AS (
  SELECT DISTINCT q.query_id, t.doc_id
  FROM (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks
  ) t JOIN qt q ON t.term = q.term
),
shape AS (SELECT * FROM (VALUES {brows}) AS v(bucket, lo, hi)),
assigned AS (
  SELECT m.query_id,
         len(list_filter([{blist}], e -> e <= CAST(d.{value_col} AS DOUBLE)))
           AS bucket
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{value_col} IS NOT NULL
),
counted AS (
  SELECT query_id, bucket, count(*)::BIGINT AS doc_count
  FROM assigned GROUP BY query_id, bucket
)
SELECT q.query_id, s.bucket::INTEGER AS bucket,
       CAST(s.lo AS DOUBLE) AS lo, CAST(s.hi AS DOUBLE) AS hi,
       coalesce(c.doc_count, 0)::BIGINT AS doc_count
FROM (SELECT DISTINCT query_id FROM matched) q
CROSS JOIN shape s
LEFT JOIN counted c ON c.query_id = q.query_id AND c.bucket = s.bucket
"""


def duckdb_facets_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    facet_cols: list[str],
    topn: int = 5,
) -> str:
    """DuckDB twin of :func:`search_facets` (window-function ranking vs
    Spark's bounded tournament)."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql, tokenize_py

    qrows = [
        f"({qid}, '{term}')"
        for qid, text in queries
        for term in sorted(set(tokenize_py(text)))
    ]
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL) LIMIT 0"
    branches = "\n  UNION ALL\n".join(
        f"  SELECT m.query_id, '{c}' AS facet, CAST(d.{c} AS VARCHAR) AS value"
        f"\n  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}"
        f"\n  WHERE d.{c} IS NOT NULL"
        for c in facet_cols
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
qt AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)),
matched AS (
  SELECT DISTINCT q.query_id, t.doc_id
  FROM (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks
  ) t JOIN qt q ON t.term = q.term
),
vals AS (
{branches}
),
counts AS (
  SELECT query_id, facet, value, count(*)::BIGINT AS doc_count
  FROM vals GROUP BY query_id, facet, value
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id, facet
    ORDER BY doc_count DESC, value ASC
  ) AS rank
  FROM counts
)
SELECT query_id, facet, value, doc_count, rank::INTEGER AS rank
FROM ranked WHERE rank <= {topn}
"""


def filters_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    buckets: dict[str, dict],
    other_bucket: bool = False,
    metadata_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Named-filter buckets over the match set (Elasticsearch's
    ``filters`` aggregation): each bucket is a FilterExpr
    (``operators/filters.compile_filters`` — the F2/F3 algebra, so the
    same predicate language drives search AND aggregation); per
    (query, bucket) the doc_count and mean BM25 score of matching docs.

    Pinned semantics (cross-engine, re-derived per-entry against
    :func:`duckdb_filters_facets_sql`):

    - the scored match set is the engine's pinned BM25
      (``bm25.scored_matches``) — every doc with >= 1 query term;
    - buckets evaluate independently per doc (overlap allowed, ES
      semantics); ``other_bucket=True`` adds an ``_other_`` bucket of
      matched docs in NO named bucket (ES's other_bucket_key default);
    - the output shape is FIXED: every (query, bucket) pair emits a
      row, zero-match queries and empty buckets included
      (doc_count 0, avg_score NULL).

    Returns (query_id INT, bucket STRING, doc_count LONG,
    avg_score DOUBLE).

    Scale shape: one scored-match plan (single broadcast term join),
    bucket predicates evaluated as column expressions ON the doc side
    before the join (Catalyst folds them into the scan projection), a
    map-side-combined ``groupBy(query_id)`` whose output is ONE row per
    query, and a driver-free explode to (query, bucket) rows. No new
    shuffles beyond the match-set aggregation.
    """
    from same_same_spark.operators.filters import compile_filters

    if not buckets:
        raise ValueError("buckets must be non-empty")
    names = list(buckets)
    if other_bucket and "_other_" in names:
        raise ValueError("bucket name _other_ collides with other_bucket")

    from same_same_spark.bm25 import scored_matches

    spark = docs_df.sparkSession
    matched = scored_matches(
        docs_df, queries, id_col=id_col, text_col=text_col
    )
    flags = docs_df.select(
        F.col(id_col).alias("doc_id"),
        *[
            compile_filters(
                buckets[name], metadata_col=metadata_col, df=docs_df
            ).alias(f"__b{i}")
            for i, name in enumerate(names)
        ],
    )
    if other_bucket:
        none_named = ~reduce(
            lambda a, b: a | b,
            [F.coalesce(F.col(f"__b{i}"), F.lit(False)) for i in range(len(names))],
        )
        flags = flags.withColumn(f"__b{len(names)}", none_named)
        names = names + ["_other_"]

    j = matched.join(flags, "doc_id")
    aggs = []
    for i in range(len(names)):
        hit = F.coalesce(F.col(f"__b{i}"), F.lit(False))
        aggs.append(
            F.sum(F.when(hit, F.lit(1)).otherwise(F.lit(0))).alias(f"c{i}")
        )
        aggs.append(F.avg(F.when(hit, F.col("score"))).alias(f"a{i}"))
    per_q = j.groupBy("query_id").agg(*aggs)

    qframe = spark.createDataFrame(
        [(int(qid),) for qid, _ in queries], "query_id INT"
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("bucket"),
                F.coalesce(F.col(f"c{i}"), F.lit(0))
                .cast("long")
                .alias("doc_count"),
                F.col(f"a{i}").cast("double").alias("avg_score"),
            )
            for i, name in enumerate(names)
        ]
    )
    # per_q is one row per query — broadcast it so the fixed-shape
    # zero-fill join never shuffles (the left side of a LeftOuter can't
    # broadcast, so the broadcast hint goes on the agg output).
    return (
        qframe.join(F.broadcast(per_q), "query_id", "left")
        .select("query_id", F.explode(entries).alias("e"))
        .select(
            "query_id",
            F.col("e.bucket").alias("bucket"),
            F.col("e.doc_count").alias("doc_count"),
            F.col("e.avg_score").alias("avg_score"),
        )
    )


def duckdb_filters_facets_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    buckets: list[tuple[str, str]],
    meta_cols: list[str],
    other_bucket: bool = False,
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`filters_facets`.

    ``buckets`` are (name, SQL predicate) pairs whose predicates the
    ENTRY derives independently from the FilterExpr semantics (the
    cross-engine differential therefore covers the compiled predicate,
    the match-set scoring, and the bucket aggregation); ``meta_cols``
    lists the doc columns the predicates reference."""
    from same_same_spark.bm25 import duckdb_scored_sql

    inner = duckdb_scored_sql(table, id_col, text_col, queries)
    names = list(buckets)
    if other_bucket:
        none_named = " AND ".join(
            f"NOT coalesce(({p}), FALSE)" for _, p in buckets
        )
        names = names + [("_other_", none_named)]
    qvalues = ", ".join(f"({int(qid)})" for qid, _ in queries)
    mcols = "".join(f", d.{c}" for c in meta_cols)
    agg_exprs = ",\n    ".join(
        f"count(*) FILTER (WHERE {pred}) AS c{i},\n"
        f"    avg(score) FILTER (WHERE {pred}) AS a{i}"
        for i, (_, pred) in enumerate(names)
    )
    branches = "\n  UNION ALL\n".join(
        f"""  SELECT q.query_id, '{name}' AS bucket,
         coalesce(a.c{i}, 0)::BIGINT AS doc_count,
         round(a.a{i}, {round_score}) AS avg_score
  FROM qids q LEFT JOIN agg a USING (query_id)"""
        for i, (name, _) in enumerate(names)
    )
    return f"""
WITH scored AS ({inner}),
j AS (
  SELECT s.query_id, s.doc_id, s.score{mcols}
  FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
),
qids AS (SELECT * FROM (VALUES {qvalues}) v(query_id)),
agg AS (
  SELECT query_id,
    {agg_exprs}
  FROM j GROUP BY query_id
)
SELECT query_id::INTEGER AS query_id, bucket, doc_count, avg_score
FROM (
{branches}
)
"""


def matrix_stats_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    value_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Pairwise numeric-field statistics over the match set
    (Elasticsearch's ``matrix_stats`` aggregation): sample covariance
    and Pearson correlation for every ordered field pair.

    Pinned semantics (cross-engine, re-derived per-entry against
    :func:`duckdb_matrix_stats_sql`):

    - complete-case like ES: a matched doc enters the matrix only if
      ALL ``value_cols`` are non-NULL (numeric, compared as doubles);
    - one row per (query, field pair i < j in the given column order);
      ``n`` = complete-case doc count (shared by every pair);
    - ``covariance`` = sample covariance (n-1 denominator),
      ``correlation`` = Pearson; with n < 2 or a zero-variance side
      both are NULL (Spark's NaN normalizes to NULL — DuckDB already
      yields NULL);
    - queries with no complete-case match emit no rows.

    Returns (query_id INT, field_a STRING, field_b STRING, n LONG,
    covariance DOUBLE, correlation DOUBLE).

    Scale shape: the shared match-set join + ONE map-side-combined
    ``groupBy(query_id)`` computing every pair's moments in a single
    aggregate (output = one row per query), then a driver-free
    fixed-shape explode. No WindowExec, no cartesians.
    """
    if len(value_cols) < 2:
        raise ValueError("matrix_stats needs >= 2 value columns")
    if len(set(value_cols)) != len(value_cols):
        raise ValueError("duplicate value columns")
    matched = _match_set(docs_df, queries, id_col, text_col)
    vals = docs_df.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c).cast("double").alias(c) for c in value_cols],
    )
    complete = reduce(
        lambda a, c: a & F.col(c).isNotNull(),
        value_cols[1:],
        F.col(value_cols[0]).isNotNull(),
    )
    j = matched.join(vals, "doc_id").filter(complete)

    pairs = [
        (value_cols[i], value_cols[jx])
        for i in range(len(value_cols))
        for jx in range(i + 1, len(value_cols))
    ]
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, (a, b) in enumerate(pairs):
        aggs.append(F.covar_samp(F.col(a), F.col(b)).alias(f"cov{i}"))
        # Pearson via the covariance identity: F.corr THROWS
        # DIVIDE_BY_ZERO under Spark 4 ANSI on a zero-variance side;
        # try_divide yields the pinned NULL instead (n < 2 is NULL
        # through covar_samp/stddev_samp already).
        aggs.append(
            F.try_divide(
                F.covar_samp(F.col(a), F.col(b)),
                F.stddev_samp(F.col(a)) * F.stddev_samp(F.col(b)),
            ).alias(f"cor{i}")
        )
    per_q = j.groupBy("query_id").agg(*aggs)

    def _nan_null(c):
        return F.when(F.isnan(c), F.lit(None).cast("double")).otherwise(c)

    entries = F.array(
        *[
            F.struct(
                F.lit(a).alias("field_a"),
                F.lit(b).alias("field_b"),
                _nan_null(F.col(f"cov{i}")).alias("covariance"),
                _nan_null(F.col(f"cor{i}")).alias("correlation"),
            )
            for i, (a, b) in enumerate(pairs)
        ]
    )
    return per_q.select(
        "query_id", F.col("n").cast("long").alias("n"),
        F.explode(entries).alias("e"),
    ).select(
        "query_id",
        F.col("e.field_a").alias("field_a"),
        F.col("e.field_b").alias("field_b"),
        "n",
        F.col("e.covariance").alias("covariance"),
        F.col("e.correlation").alias("correlation"),
    )


def duckdb_matrix_stats_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    value_cols: list[str],
    prelude_ctes: str = "",
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`matrix_stats_facets` (moments compared at
    6dp). ``prelude_ctes`` lets callers feed a derived-fields table."""
    if len(value_cols) < 2:
        raise ValueError("matrix_stats needs >= 2 value columns")
    qvalues = _qterm_values(queries)
    complete = " AND ".join(f"v.{c} IS NOT NULL" for c in value_cols)
    vcols = ", ".join(f"CAST({c} AS DOUBLE) AS {c}" for c in value_cols)
    pairs = [
        (value_cols[i], value_cols[jx])
        for i in range(len(value_cols))
        for jx in range(i + 1, len(value_cols))
    ]
    branches = "\n  UNION ALL\n  ".join(
        f"""SELECT query_id, '{a}' AS field_a, '{b}' AS field_b, n,
         round(cov_{i}, {round_score}) AS covariance,
         round(cor_{i}, {round_score}) AS correlation
  FROM agg"""
        for i, (a, b) in enumerate(pairs)
    )
    moment_exprs = ",\n    ".join(
        f"covar_samp({a}, {b}) AS cov_{i}, corr({a}, {b}) AS cor_{i}"
        for i, (a, b) in enumerate(pairs)
    )
    return f"""
WITH {prelude_ctes}{_matched_ctes(table, id_col, text_col, qvalues)},
vals AS (SELECT {id_col} AS doc_id, {vcols} FROM {table}),
j AS (
  SELECT m.query_id, v.* FROM matched m
  JOIN vals v ON m.doc_id = v.doc_id
  WHERE {complete}
),
agg AS (
  SELECT query_id, count(*)::BIGINT AS n,
    {moment_exprs}
  FROM j GROUP BY query_id
)
SELECT query_id, field_a, field_b, n, covariance, correlation
FROM (
  {branches}
)
"""


def rare_terms_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    facet_col: str,
    max_doc_count: int = 1,
    topn: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Long-tail terms over the match set (Elasticsearch's
    ``rare_terms`` aggregation — the complement of the terms agg):
    facet values whose doc_count <= ``max_doc_count``, rarest first.

    Pinned semantics (cross-engine, re-derived per-entry):

    - doc_count per distinct facet value over the match set (NULL
      values excluded, values compared as strings — the search_facets
      rules);
    - keep values with ``doc_count <= max_doc_count``; rank 1..topn
      under ``(doc_count ASC, value ASC)``.

    Returns (query_id INT, value STRING, doc_count LONG, rank INT).

    Scale shape: the rarity filter lands on the AGGREGATED counts (one
    row per (query, value) — map-side combined), then the bounded
    tournament; no WindowExec, no per-value data movement beyond the
    counts. ES needs special machinery here because its shards can't
    see global counts; one Spark shuffle IS the global count.
    """
    if max_doc_count < 1:
        raise ValueError(f"max_doc_count must be >= 1, got {max_doc_count}")
    matched = _match_set(docs_df, queries, id_col, text_col)
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(facet_col).cast("string").alias("value"),
    )
    counts = (
        matched.join(meta, "doc_id")
        .filter(F.col("value").isNotNull())
        .groupBy("query_id", "value")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .filter(F.col("doc_count") <= max_doc_count)
    )
    entry = F.struct(
        F.col("doc_count").alias("doc_count"),
        F.col("value").alias("value"),
    )
    local = (
        counts.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "part")
        .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, topn).alias("c"))
    )
    merged = local.groupBy("query_id").agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("c"))), 1, topn
        ).alias("top")
    )
    return merged.select(
        "query_id", F.posexplode("top").alias("pos", "s")
    ).select(
        "query_id",
        F.col("s.value").alias("value"),
        F.col("s.doc_count").cast("long").alias("doc_count"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


def duckdb_rare_terms_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    facet_col: str,
    max_doc_count: int = 1,
    topn: int = 10,
) -> str:
    """DuckDB twin of :func:`rare_terms_facets`."""
    qvalues = _qterm_values(queries)
    return f"""
WITH {_matched_ctes(table, id_col, text_col, qvalues)},
counts AS (
  SELECT m.query_id, CAST(d.{facet_col} AS VARCHAR) AS value,
         count(*)::BIGINT AS doc_count
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{facet_col} IS NOT NULL
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, value, doc_count, row_number() OVER (
    PARTITION BY query_id ORDER BY doc_count ASC, value ASC
  ) AS rank
  FROM counts WHERE doc_count <= {max_doc_count}
)
SELECT query_id, value, doc_count, rank::INTEGER AS rank
FROM ranked WHERE rank <= {topn}
"""


def weighted_avg_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    weight_col: str,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Weighted average over the match set (Elasticsearch's
    ``weighted_avg`` aggregation): ``sum(v * w) / sum(w)``.

    Pinned semantics (cross-engine, re-derived per-entry):

    - matched docs with a NULL value OR a NULL weight are skipped (ES
      drops the doc unless the caller configures ``missing``);
    - ``n`` = contributing doc count; ``weighted_avg`` is NULL when
      ``sum(w)`` is 0 (try_divide — never an ANSI throw);
    - queries with no contributing doc emit no rows.

    Returns (query_id INT, n LONG, weighted_avg DOUBLE). One map-side
    combined aggregate over the match-set join; no new shuffles.
    """
    matched = _match_set(docs_df, queries, id_col, text_col)
    vals = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("double").alias("__v"),
        F.col(weight_col).cast("double").alias("__w"),
    )
    j = (
        matched.join(vals, "doc_id")
        .filter(F.col("__v").isNotNull() & F.col("__w").isNotNull())
    )
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.try_divide(
            F.sum(F.col("__v") * F.col("__w")), F.sum("__w")
        ).cast("double").alias("weighted_avg"),
    )


def duckdb_weighted_avg_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    value_col: str,
    weight_col: str,
    prelude_ctes: str = "",
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`weighted_avg_facets`. ``prelude_ctes``
    lets callers feed a derived-fields table."""
    qvalues = _qterm_values(queries)
    return f"""
WITH {prelude_ctes}{_matched_ctes(table, id_col, text_col, qvalues)},
j AS (
  SELECT m.query_id,
         CAST(d.{value_col} AS DOUBLE) AS v,
         CAST(d.{weight_col} AS DOUBLE) AS w
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{value_col} IS NOT NULL AND d.{weight_col} IS NOT NULL
)
SELECT query_id, count(*)::BIGINT AS n,
       round(sum(v * w) / nullif(sum(w), 0), {round_score})
         AS weighted_avg
FROM j GROUP BY query_id
"""


def sampler_terms_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    facet_col: str,
    shard_size: int = 100,
    topn: int = 5,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Sampler aggregation with a terms sub-agg (Elasticsearch's
    ``sampler`` > ``terms``): restrict the aggregation scope to each
    query's ``shard_size`` HIGHEST-SCORING matched docs, then count
    facet values inside the sample — "what do the best matches look
    like", immune to the long relevance tail.

    Pinned semantics (cross-engine, re-derived per-entry):

    - the sample = top ``shard_size`` docs per query under the pinned
      BM25 total order ``(round(score, 9) DESC, doc_id ASC)`` — Spark
      has no shards, so the sample is GLOBAL and deterministic (ES's
      per-shard sampling is explicitly non-deterministic; this is the
      one-shuffle strengthening, documented);
    - within the sample: doc_count per facet value (NULLs excluded,
      string-compared), rank 1..topn under ``(doc_count DESC,
      value ASC)``.

    Returns (query_id INT, value STRING, doc_count LONG, rank INT).

    Scale shape: the sample rides the bounded tournament
    (``topk_per_query`` with k = shard_size), so no task ever holds a
    query's full match list; the sub-agg sees <= queries x shard_size
    rows. The facet join runs AFTER sampling — at 100 TB the metadata
    fetch touches only sampled ids.
    """
    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")
    from same_same_spark.bm25 import scored_matches
    from same_same_spark.operators.topk import topk_per_query

    scored = scored_matches(
        docs_df, queries, id_col=id_col, text_col=text_col
    )
    sample = topk_per_query(scored, shard_size).select("query_id", "doc_id")
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(facet_col).cast("string").alias("value"),
    )
    # the sample is bounded (queries x shard_size) — broadcast it
    # against the metadata so only sampled ids are ever fetched
    counts = (
        meta.join(F.broadcast(sample), "doc_id")
        .filter(F.col("value").isNotNull())
        .groupBy("query_id", "value")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    entry = F.struct(
        (-F.col("doc_count")).alias("negc"),
        F.col("value").alias("value"),
        F.col("doc_count").alias("doc_count"),
    )
    local = (
        counts.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "part")
        .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, topn).alias("c"))
    )
    merged = local.groupBy("query_id").agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("c"))), 1, topn
        ).alias("top")
    )
    return merged.select(
        "query_id", F.posexplode("top").alias("pos", "s")
    ).select(
        "query_id",
        F.col("s.value").alias("value"),
        F.col("s.doc_count").cast("long").alias("doc_count"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


def duckdb_sampler_terms_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    facet_col: str,
    shard_size: int = 100,
    topn: int = 5,
) -> str:
    """DuckDB twin of :func:`sampler_terms_facets`."""
    from same_same_spark.bm25 import duckdb_scored_sql

    inner = duckdb_scored_sql(table, id_col, text_col, queries)
    return f"""
WITH scored AS ({inner}),
sample AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id, row_number() OVER (
      PARTITION BY query_id
      ORDER BY round(score, 9) DESC, doc_id ASC
    ) AS rn FROM scored
  ) WHERE rn <= {shard_size}
),
counts AS (
  SELECT s.query_id, CAST(d.{facet_col} AS VARCHAR) AS value,
         count(*)::BIGINT AS doc_count
  FROM sample s JOIN {table} d ON s.doc_id = d.{id_col}
  WHERE d.{facet_col} IS NOT NULL
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, value, doc_count, row_number() OVER (
    PARTITION BY query_id ORDER BY doc_count DESC, value ASC
  ) AS rank
  FROM counts
)
SELECT query_id, value, doc_count, rank::INTEGER AS rank
FROM ranked WHERE rank <= {topn}
"""


def percentile_ranks_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    values: list[float],
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Percentile ranks over the match set (Elasticsearch's
    ``percentile_ranks`` — the inverse of the percentiles agg): for
    each probe value v, the percentage of matched docs whose field is
    <= v.

    Pinned semantics (cross-engine, re-derived per-entry): the engine
    is exact, so pct(v) = 100 * count(x <= v) / count(x IS NOT NULL)
    (no TDigest interpolation — ES's sketch answer converges to this);
    NULL field values drop from numerator and denominator; queries
    with no non-NULL matched value emit no rows; one row per
    (query, probe value) otherwise.

    Returns (query_id INT, value DOUBLE, pct DOUBLE).

    Scale shape: ONE map-side-combined aggregate row per query (every
    probe is a conditional sum in the same groupBy), fixed-shape
    explode. No new shuffles.
    """
    if not values:
        raise ValueError("values must be non-empty")
    matched = _match_set(docs_df, queries, id_col, text_col)
    vals = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("double").alias("__x"),
    )
    j = matched.join(vals, "doc_id").filter(F.col("__x").isNotNull())
    aggs = [F.count(F.lit(1)).alias("n")]
    probes = [float(v) for v in values]
    for i, v in enumerate(probes):
        aggs.append(
            F.sum(
                F.when(F.col("__x") <= F.lit(v), 1).otherwise(0)
            ).alias(f"c{i}")
        )
    per_q = j.groupBy("query_id").agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(v).alias("value"),
                (
                    F.lit(100.0) * F.col(f"c{i}") / F.col("n")
                ).alias("pct"),
            )
            for i, v in enumerate(probes)
        ]
    )
    return per_q.select(
        "query_id", F.explode(entries).alias("e")
    ).select(
        "query_id",
        F.col("e.value").alias("value"),
        F.col("e.pct").alias("pct"),
    )


def duckdb_percentile_ranks_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    value_col: str,
    values: list[float],
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`percentile_ranks_facets`."""
    qvalues = _qterm_values(queries)
    probes = [float(v) for v in values]
    branches = "\n  UNION ALL\n  ".join(
        f"""SELECT query_id, {v!r} AS value,
         round(100.0 * c{i} / n, {round_score}) AS pct
  FROM agg"""
        for i, v in enumerate(probes)
    )
    sums = ",\n    ".join(
        f"sum(CASE WHEN x <= {v!r} THEN 1 ELSE 0 END) AS c{i}"
        for i, v in enumerate(probes)
    )
    return f"""
WITH {_matched_ctes(table, id_col, text_col, qvalues)},
j AS (
  SELECT m.query_id, CAST(d.{value_col} AS DOUBLE) AS x
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{value_col} IS NOT NULL
),
agg AS (
  SELECT query_id, count(*) AS n,
    {sums}
  FROM j GROUP BY query_id
)
SELECT query_id, value, pct
FROM (
  {branches}
)
"""


def missing_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    facet_col: str,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Missing-value bucket over the match set (Elasticsearch's
    ``missing`` aggregation): per query, how many matched docs carry a
    NULL ``facet_col`` — the bucket every other agg silently drops.
    FIXED shape: every query (zero-token included) emits one row.

    Returns (query_id INT, doc_count LONG). One aggregate, zero-filled
    through the broadcast query frame (the filters_facets pattern).
    """
    spark = docs_df.sparkSession
    matched = _match_set(docs_df, queries, id_col, text_col)
    vals = docs_df.select(
        F.col(id_col).alias("doc_id"), F.col(facet_col).alias("__v")
    )
    per_q = (
        matched.join(vals, "doc_id")
        .filter(F.col("__v").isNull())
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    qframe = spark.createDataFrame(
        [(int(qid),) for qid, _ in queries], "query_id INT"
    )
    return qframe.join(F.broadcast(per_q), "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("doc_count"), F.lit(0)).cast("long").alias(
            "doc_count"
        ),
    )


def duckdb_missing_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    facet_col: str,
    prelude_ctes: str = "",
) -> str:
    """DuckDB twin of :func:`missing_facets`. ``prelude_ctes`` lets
    callers feed a derived-fields table."""
    qvalues = _qterm_values(queries)
    qids = ", ".join(f"({int(qid)})" for qid, _ in queries)
    return f"""
WITH {prelude_ctes}{_matched_ctes(table, id_col, text_col, qvalues)},
mq AS (
  SELECT m.query_id, count(*)::BIGINT AS doc_count
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{facet_col} IS NULL
  GROUP BY 1
),
qids AS (SELECT * FROM (VALUES {qids}) v(query_id))
SELECT q.query_id, coalesce(mq.doc_count, 0)::BIGINT AS doc_count
FROM qids q LEFT JOIN mq USING (query_id)
"""


def boxplot_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Boxplot aggregation over the match set — Elasticsearch's
    ``boxplot`` agg, but EXACT (linear-interpolated quartiles, the
    pinned Spark ``percentile`` == DuckDB ``quantile_cont`` identity)
    instead of ES's TDigest approximation.

    Pinned semantics (cross-engine, re-derived in
    :func:`duckdb_boxplot_sql`): per query over the non-NULL values of
    ``value_col`` across matching docs —

    - ``q1``/``q2``/``q3`` = exact interpolated 25/50/75 quantiles;
    - ``min_val``/``max_val`` = the data extremes;
    - whiskers follow ES's Tukey rule: ``lower_whisker`` = the SMALLEST
      data value >= ``q1 - 1.5*IQR``, ``upper_whisker`` = the LARGEST
      data value <= ``q3 + 1.5*IQR`` (always defined: q1/q3 themselves
      lie inside the fences, so the inside set is non-empty whenever
      the match set is);
    - queries with no values yield no row.

    Scale shape: two passes over the matched values — one
    map-side-combined quantile aggregate (one row per query), then the
    tiny fence table BROADCAST back onto the values for a conditional
    min/max (again one row per query). No window, no per-value state.
    """
    matched = _match_set(docs_df, queries, id_col, text_col)
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("double").alias("v"),
    )
    vals = (
        matched.join(meta, "doc_id").filter(F.col("v").isNotNull())
    )
    quarts = vals.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("count_vals"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
        F.percentile(
            F.col("v"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("q"),
    ).select(
        "query_id",
        "count_vals",
        "min_val",
        "max_val",
        F.col("q")[0].alias("q1"),
        F.col("q")[1].alias("q2"),
        F.col("q")[2].alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    fences = quarts.select(
        "query_id",
        (F.col("q1") - 1.5 * iqr).alias("lo_fence"),
        (F.col("q3") + 1.5 * iqr).alias("hi_fence"),
    )
    whisk = (
        vals.join(F.broadcast(fences), "query_id")
        .groupBy("query_id")
        .agg(
            F.min(
                F.when(F.col("v") >= F.col("lo_fence"), F.col("v"))
            ).alias("lower_whisker"),
            F.max(
                F.when(F.col("v") <= F.col("hi_fence"), F.col("v"))
            ).alias("upper_whisker"),
        )
    )
    # both sides are one-row-per-query aggregates; broadcast the merge
    return quarts.join(F.broadcast(whisk), "query_id").select(
        "query_id", "count_vals", "min_val", "max_val",
        "q1", "q2", "q3", "lower_whisker", "upper_whisker",
    )


def duckdb_boxplot_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    value_col: str,
) -> str:
    """DuckDB twin of :func:`boxplot_facets` — the same exact
    interpolated quantiles (``quantile_cont``) and the same fence
    arithmetic, so integer-valued inputs compare bit-identically."""
    qvalues = _qterm_values(queries)
    return f"""
WITH {_matched_ctes(table, id_col, text_col, qvalues)},
vals AS (
  SELECT m.query_id, CAST(d.{value_col} AS DOUBLE) AS v
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{value_col} IS NOT NULL
),
quarts AS (
  SELECT query_id,
         count(*)::BIGINT AS count_vals,
         min(v) AS min_val,
         max(v) AS max_val,
         quantile_cont(v, 0.25) AS q1,
         quantile_cont(v, 0.5) AS q2,
         quantile_cont(v, 0.75) AS q3
  FROM vals GROUP BY query_id
),
whisk AS (
  SELECT v.query_id,
         min(CASE WHEN v.v >= q.q1 - 1.5 * (q.q3 - q.q1)
             THEN v.v END) AS lower_whisker,
         max(CASE WHEN v.v <= q.q3 + 1.5 * (q.q3 - q.q1)
             THEN v.v END) AS upper_whisker
  FROM vals v JOIN quarts q USING (query_id)
  GROUP BY v.query_id
)
SELECT query_id, count_vals, min_val, max_val, q1, q2, q3,
       lower_whisker, upper_whisker
FROM quarts JOIN whisk USING (query_id)
"""


def mad_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Median-absolute-deviation aggregation over the match set —
    Elasticsearch's ``median_absolute_deviation``, but EXACT
    (interpolated medians) instead of ES's TDigest sketch.

    Pinned semantics (re-derived in :func:`duckdb_mad_sql`): per query
    over the non-NULL values ``v`` of matching docs,
    ``median_val = median(v)`` and
    ``mad = median(|v - median_val|)`` — both linear-interpolated
    (Spark ``percentile(0.5)`` == DuckDB ``quantile_cont(0.5)``,
    the corpus_profile identity). Queries with no values yield no row.

    Scale shape: the same two-pass + broadcast shape as
    :func:`boxplot_facets` — the per-query median table (one row per
    query) broadcasts back onto the values for the deviation median.
    """
    matched = _match_set(docs_df, queries, id_col, text_col)
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("double").alias("v"),
    )
    vals = matched.join(meta, "doc_id").filter(F.col("v").isNotNull())
    med = vals.groupBy("query_id").agg(
        F.percentile(F.col("v"), F.lit(0.5)).alias("median_val")
    )
    return (
        vals.join(F.broadcast(med), "query_id")
        .groupBy("query_id")
        .agg(
            F.first("median_val").alias("median_val"),
            F.percentile(
                F.abs(F.col("v") - F.col("median_val")), F.lit(0.5)
            ).alias("mad"),
        )
        .select("query_id", "median_val", "mad")
    )


def duckdb_mad_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    value_col: str,
) -> str:
    """DuckDB twin of :func:`mad_facets`."""
    qvalues = _qterm_values(queries)
    return f"""
WITH {_matched_ctes(table, id_col, text_col, qvalues)},
vals AS (
  SELECT m.query_id, CAST(d.{value_col} AS DOUBLE) AS v
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{value_col} IS NOT NULL
),
med AS (
  SELECT query_id, quantile_cont(v, 0.5) AS median_val
  FROM vals GROUP BY query_id
)
SELECT v.query_id,
       any_value(m.median_val) AS median_val,
       quantile_cont(abs(v.v - m.median_val), 0.5) AS mad
FROM vals v JOIN med m USING (query_id)
GROUP BY v.query_id
"""


def string_stats_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    field_col: str,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """String-stats aggregation over the match set — Elasticsearch's
    ``string_stats`` (count / min_length / max_length / avg_length /
    Shannon entropy) of a string field across matching docs.

    Pinned semantics (cross-engine, re-derived in
    :func:`duckdb_string_stats_sql`):

    - NULL field values are excluded; empty strings COUNT (length 0
      participates in count/min/max/avg) but contribute no characters;
    - lengths are Unicode code-point counts (Spark ``length`` ==
      DuckDB ``length``);
    - ``entropy`` = ``-Σ_c p_c · log2(p_c)`` over the code-point
      distribution of ALL matched values concatenated (ES's
      show_distribution source definition); a match set with zero
      characters yields entropy 0.0;
    - queries with no non-NULL values yield no row.

    Cross-engine float note: the entropy sum runs over the distinct
    code-point alphabet (bounded, ~dozens of terms of magnitude <= 1),
    so order-dependent double error sits ~1e-14 — absorbed by the
    driver's 6dp rounding (the stats_facets precedent).

    Scale shape: one pass for the length stats (map-side-combined
    groupBy, one row per query) and one (query, char)
    explode-aggregate whose cardinality is queries x alphabet — the
    char counts then collapse to one row per query. No per-doc state.
    """
    matched = _match_set(docs_df, queries, id_col, text_col)
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(field_col).cast("string").alias("s"),
    )
    vals = matched.join(meta, "doc_id").filter(F.col("s").isNotNull())
    lens = vals.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("count_vals"),
        F.min(F.length("s")).cast("long").alias("min_length"),
        F.max(F.length("s")).cast("long").alias("max_length"),
        (
            F.sum(F.length("s")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_length"),
    )
    chars = (
        vals.select(
            "query_id", F.explode(F.split("s", "")).alias("ch")
        )
        # both engines split an EMPTY string into [''] — drop it
        .filter(F.length("ch") > 0)
        .groupBy("query_id", "ch")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = F.sum("cnt").cast("double")
    ent = chars.groupBy("query_id").agg(
        (
            -F.sum(
                F.col("cnt").cast("double")
                * F.log2(F.col("cnt").cast("double"))
            )
            / tot
            + F.log2(tot)
        ).alias("entropy")
    )
    return lens.join(ent, "query_id", "left").select(
        "query_id", "count_vals", "min_length", "max_length",
        "avg_length",
        F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
    )


def duckdb_string_stats_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    field_col: str,
) -> str:
    """DuckDB twin of :func:`string_stats_facets`. BOTH engines split
    an empty string into ``['']`` (measured — Spark's ``show`` renders
    it as ``[]``, but ``split('', '')`` is one empty element); the
    ``length(ch) > 0`` filter on each side drops that artifact from
    the character stream. Entropy uses the same
    ``log2(total) - Σ c·log2(c) / total`` factoring as the Spark side
    so the per-term doubles match expression-for-expression."""
    qvalues = _qterm_values(queries)
    return f"""
WITH {_matched_ctes(table, id_col, text_col, qvalues)},
vals AS (
  SELECT m.query_id, CAST(d.{field_col} AS VARCHAR) AS s
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{field_col} IS NOT NULL
),
lens AS (
  SELECT query_id,
         count(*)::BIGINT AS count_vals,
         min(length(s))::BIGINT AS min_length,
         max(length(s))::BIGINT AS max_length,
         sum(length(s))::DOUBLE / count(*)::DOUBLE AS avg_length
  FROM vals GROUP BY query_id
),
chars AS (
  SELECT query_id, ch, count(*)::BIGINT AS cnt
  FROM (
    SELECT query_id, unnest(string_split(s, '')) AS ch FROM vals
  ) WHERE length(ch) > 0
  GROUP BY query_id, ch
),
ent AS (
  SELECT query_id,
         -sum(cnt::DOUBLE * log2(cnt::DOUBLE)) / sum(cnt)::DOUBLE
           + log2(sum(cnt)::DOUBLE) AS entropy
  FROM chars GROUP BY query_id
)
SELECT l.query_id, l.count_vals, l.min_length, l.max_length,
       l.avg_length, coalesce(e.entropy, 0.0) AS entropy
FROM lens l LEFT JOIN ent e USING (query_id)
"""


def top_metrics_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    sort_col: str,
    metric_cols: list[str],
    size: int = 3,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Top-metrics aggregation — Elasticsearch's ``top_metrics``: per
    query, the metric values of the ``size`` matching docs with the
    LARGEST ``sort_col`` (``sort: {field: desc}``), NULL sort values
    excluded, ties broken by doc id ASC (the engine's pinned
    ranking tiebreak).

    Returns (query_id, rank, doc_id, sort_val DOUBLE, <metric_cols>).

    Scale shape: the sort value rides the engine's bounded
    sort_array/slice tournament (:func:`~same_same_spark.operators.
    topk.topk_per_query` — never a rank window); the winners (queries
    x size rows) then join metrics back from the docs relation.
    """
    from same_same_spark.operators.topk import topk_per_query

    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    matched = _match_set(docs_df, queries, id_col, text_col)
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(sort_col).cast("double").alias("score"),
    )
    scored = matched.join(meta, "doc_id").filter(
        F.col("score").isNotNull()
    )
    top = topk_per_query(scored, size)
    metrics = docs_df.select(
        F.col(id_col).alias("doc_id"), *metric_cols
    )
    return (
        top.join(metrics, "doc_id")
        .select(
            "query_id",
            "rank",
            "doc_id",
            F.col("score").alias("sort_val"),
            *metric_cols,
        )
    )


def duckdb_top_metrics_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    sort_col: str,
    metric_cols: list[str],
    size: int = 3,
) -> str:
    """DuckDB twin of :func:`top_metrics_facets` — the pinned
    ``(round(sort, 9) DESC, doc_id ASC)`` ranking."""
    qvalues = _qterm_values(queries)
    mcols = "".join(f", d.{c}" for c in metric_cols)
    return f"""
WITH {_matched_ctes(table, id_col, text_col, qvalues)},
ranked AS (
  SELECT m.query_id, m.doc_id,
         CAST(d.{sort_col} AS DOUBLE) AS sort_val{mcols},
         row_number() OVER (
           PARTITION BY m.query_id
           ORDER BY round(CAST(d.{sort_col} AS DOUBLE), 9) DESC,
                    m.doc_id ASC
         ) AS rank
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{sort_col} IS NOT NULL
)
SELECT query_id, rank::INTEGER AS rank, doc_id, sort_val
       {mcols.replace(' d.', ' ')}
FROM ranked WHERE rank <= {int(size)}
"""


def t_test_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    value_col: str,
    filter_a: dict,
    filter_b: dict,
    ttype: str = "heteroscedastic",
    metadata_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """t_test aggregation — Elasticsearch's ``t_test`` over two
    filter-defined populations of the match set. ES reports the
    p-value (it carries a Student-t CDF); the CDF is not
    SQL-expressible, so the pinned cross-engine surface is the
    t-STATISTIC and degrees of freedom — the p-value is a pure driver-
    side function of those two numbers (``scipy.stats.t.sf``) and is
    deliberately not emitted.

    Pinned semantics (re-derived in :func:`duckdb_t_test_sql`):

    - populations A/B are FilterExpr dicts (the F2/F3 algebra shared
      with search and the filters agg) evaluated per matched doc —
      overlap allowed, NULL ``value_col`` rows excluded from both;
    - ``ttype='heteroscedastic'`` (ES default): Welch's t with the
      Welch–Satterthwaite df; ``'homoscedastic'``: pooled-variance t
      with df = n_a + n_b − 2 (ES's paired type needs row pairing the
      agg model doesn't define — rejected);
    - sample variances (n−1); an arm with n < 2, or a zero pooled
      denominator, yields NULL t_stat/df (never an error — the fixed
      output shape keeps one row per query with any matched values);
    - every double derives from exact integer sums via one pinned
      closed form when ``value_col`` is integral (the stats_facets
      exactness argument).

    Returns (query_id INT, n_a LONG, n_b LONG, mean_a, mean_b,
    t_stat, df DOUBLE).

    Scale shape: ONE pass — the match set joins values + both arm
    predicates (evaluated doc-side, folded into the scan projection),
    then a map-side-combined groupBy(query_id) with six conditional
    sums; one output row per query.
    """
    from same_same_spark.operators.filters import compile_filters

    if ttype not in ("heteroscedastic", "homoscedastic"):
        raise ValueError(
            "ttype must be 'heteroscedastic' or 'homoscedastic', "
            f"got {ttype!r}"
        )
    matched = _match_set(docs_df, queries, id_col, text_col)
    pa = compile_filters(filter_a, metadata_col=metadata_col, df=docs_df)
    pb = compile_filters(filter_b, metadata_col=metadata_col, df=docs_df)
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("double").alias("v"),
        F.coalesce(pa, F.lit(False)).alias("in_a"),
        F.coalesce(pb, F.lit(False)).alias("in_b"),
    )
    vals = matched.join(meta, "doc_id").filter(F.col("v").isNotNull())

    def _arm(flag: str, suffix: str):
        cond = F.col(flag)
        return [
            F.count(F.when(cond, 1)).cast("long").alias(f"n_{suffix}"),
            F.sum(F.when(cond, F.col("v"))).alias(f"s_{suffix}"),
            F.sum(F.when(cond, F.col("v") * F.col("v"))).alias(
                f"ss_{suffix}"
            ),
        ]

    agg = vals.groupBy("query_id").agg(
        *_arm("in_a", "a"), *_arm("in_b", "b")
    )
    na, nb = (
        F.col("n_a").cast("double"), F.col("n_b").cast("double"),
    )
    ma = F.col("s_a") / na
    mb = F.col("s_b") / nb
    # sample variance: (ssq - s^2/n) / (n - 1); NULL when n < 2
    va = F.try_divide(
        F.col("ss_a") - F.col("s_a") * F.col("s_a") / na, na - 1
    )
    vb = F.try_divide(
        F.col("ss_b") - F.col("s_b") * F.col("s_b") / nb, nb - 1
    )
    if ttype == "heteroscedastic":
        se2 = va / na + vb / nb
        t = F.try_divide(ma - mb, F.sqrt(se2))
        dof = F.try_divide(
            se2 * se2,
            (va / na) * (va / na) / (na - 1)
            + (vb / nb) * (vb / nb) / (nb - 1),
        )
    else:
        pooled = F.try_divide(
            (na - 1) * va + (nb - 1) * vb, na + nb - 2
        )
        t = F.try_divide(
            ma - mb, F.sqrt(pooled * (1 / na + 1 / nb))
        )
        dof = F.when(
            va.isNotNull() & vb.isNotNull(), na + nb - 2
        )
    return agg.select(
        "query_id",
        "n_a",
        "n_b",
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        t.alias("t_stat"),
        dof.cast("double").alias("df"),
    )


def duckdb_t_test_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    value_col: str,
    pred_a: str,
    pred_b: str,
    ttype: str = "heteroscedastic",
) -> str:
    """DuckDB twin of :func:`t_test_facets` — ``pred_a``/``pred_b``
    are SQL predicates the caller derives INDEPENDENTLY from the
    FilterExpr semantics (the filters-agg differential strategy);
    the same closed forms with nullif guarding each division."""
    qvalues = _qterm_values(queries)
    na, nb = "n_a::DOUBLE", "n_b::DOUBLE"
    va = f"(ss_a - s_a * s_a / {na}) / nullif({na} - 1, 0)"
    vb = f"(ss_b - s_b * s_b / {nb}) / nullif({nb} - 1, 0)"
    if ttype == "heteroscedastic":
        se2 = f"(({va}) / {na} + ({vb}) / {nb})"
        t = (
            f"(s_a / {na} - s_b / {nb})"
            f" / nullif(sqrt({se2}), 0)"
        )
        dof = (
            f"({se2}) * ({se2}) / nullif("
            f"(({va}) / {na}) * (({va}) / {na}) / nullif({na} - 1, 0)"
            f" + (({vb}) / {nb}) * (({vb}) / {nb})"
            f" / nullif({nb} - 1, 0), 0)"
        )
    else:
        pooled = (
            f"(({na} - 1) * ({va}) + ({nb} - 1) * ({vb}))"
            f" / nullif({na} + {nb} - 2, 0)"
        )
        t = (
            f"(s_a / {na} - s_b / {nb}) / nullif(sqrt(({pooled})"
            f" * (1.0 / {na} + 1.0 / {nb})), 0)"
        )
        dof = (
            f"CASE WHEN ({va}) IS NOT NULL AND ({vb}) IS NOT NULL"
            f" THEN {na} + {nb} - 2 END"
        )
    return f"""
WITH {_matched_ctes(table, id_col, text_col, qvalues)},
vals AS (
  SELECT m.query_id, CAST(d.{value_col} AS DOUBLE) AS v,
         coalesce(({pred_a}), FALSE) AS in_a,
         coalesce(({pred_b}), FALSE) AS in_b
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE d.{value_col} IS NOT NULL
),
agg AS (
  SELECT query_id,
         count(*) FILTER (in_a)::BIGINT AS n_a,
         sum(v) FILTER (in_a) AS s_a,
         sum(v * v) FILTER (in_a) AS ss_a,
         count(*) FILTER (in_b)::BIGINT AS n_b,
         sum(v) FILTER (in_b) AS s_b,
         sum(v * v) FILTER (in_b) AS ss_b
  FROM vals GROUP BY query_id
)
SELECT query_id, n_a, n_b,
       s_a / {na} AS mean_a,
       s_b / {nb} AS mean_b,
       ({t})::DOUBLE AS t_stat,
       ({dof})::DOUBLE AS df
FROM agg
"""


def multi_terms_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    facet_cols: list[str],
    topn: int = 5,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Multi-terms aggregation (Elasticsearch's ``multi_terms``):
    bucket the match set by a TUPLE of fields.

    Pinned semantics (cross-engine, re-derived per-entry):

    - a doc buckets only when EVERY field is non-NULL (ES skips docs
      missing any source — no partial tuples);
    - the bucket key renders as the values joined with ``"|"``
      (ES's ``key_as_string``), each value string-cast;
    - top ``topn`` buckets per query under ``(doc_count DESC,
      key ASC)``.

    Returns (query_id INT, key STRING, doc_count LONG, rank INT).

    Scale shape: one match-set aggregation + one (query, key) count
    with map-side combine; the cut rides the bounded per-partition
    tournament (no windows, no buffer proportional to a query's
    bucket count).
    """
    if not facet_cols:
        raise ValueError("facet_cols must be non-empty")
    if topn < 1:
        raise ValueError(f"topn must be >= 1, got {topn}")
    matched = _match_set(docs_df, queries, id_col, text_col)
    cols = [F.col(c).cast("string") for c in facet_cols]
    nonnull = cols[0].isNotNull()
    for c in cols[1:]:
        nonnull = nonnull & c.isNotNull()
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.when(nonnull, F.concat_ws("|", *cols)).alias("key"),
    )
    counts = (
        matched.join(meta, "doc_id")
        .filter(F.col("key").isNotNull())
        .groupBy("query_id", "key")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    entry = F.struct(
        (-F.col("doc_count")).alias("negc"),
        F.col("key").alias("key"),
        F.col("doc_count").alias("doc_count"),
    )
    local = (
        counts.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "part")
        .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, topn).alias("c"))
    )
    merged = local.groupBy("query_id").agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("c"))), 1, topn
        ).alias("top")
    )
    return merged.select(
        "query_id", F.posexplode("top").alias("pos", "s")
    ).select(
        "query_id",
        F.col("s.key").alias("key"),
        F.col("s.doc_count").cast("long").alias("doc_count"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


def duckdb_multi_terms_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    facet_cols: list[str],
    topn: int = 5,
) -> str:
    """DuckDB twin of :func:`multi_terms_facets`."""
    from same_same_spark.text.tokenizer import duckdb_tokens_sql, tokenize_py

    qrows = [
        f"({qid}, '{term}')"
        for qid, text in queries
        for term in sorted(set(tokenize_py(text)))
    ]
    qvalues = ", ".join(qrows) if qrows else "(NULL, NULL) LIMIT 0"
    nonnull = " AND ".join(f"d.{c} IS NOT NULL" for c in facet_cols)
    key = " || '|' || ".join(f"CAST(d.{c} AS VARCHAR)" for c in facet_cols)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {duckdb_tokens_sql(text_col)} AS tokens
  FROM {table}
),
qt AS (SELECT * FROM (VALUES {qvalues}) AS v(query_id, term)),
matched AS (
  SELECT DISTINCT q.query_id, t.doc_id
  FROM (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks
  ) t JOIN qt q ON t.term = q.term
),
counts AS (
  SELECT m.query_id, ({key}) AS key, count(*)::BIGINT AS doc_count
  FROM matched m JOIN {table} d ON m.doc_id = d.{id_col}
  WHERE {nonnull}
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, key, doc_count, row_number() OVER (
    PARTITION BY query_id ORDER BY doc_count DESC, key ASC
  ) AS rank
  FROM counts
)
SELECT query_id, key, doc_count, rank::INTEGER AS rank
FROM ranked WHERE rank <= {topn}
"""


def diversified_sampler_terms_facets(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    facet_col: str,
    dedup_col: str,
    max_docs_per_value: int = 1,
    shard_size: int = 100,
    topn: int = 5,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Diversified sampler with a terms sub-agg (Elasticsearch's
    ``diversified_sampler`` > ``terms``): like
    :func:`sampler_terms_facets`, but before the ``shard_size`` cut at
    most ``max_docs_per_value`` docs per ``dedup_col`` value survive —
    "what do the best matches look like, without one author/domain
    dominating the sample".

    Pinned semantics (cross-engine, re-derived per-entry):

    - per (query, dedup value): keep the ``max_docs_per_value`` best
      docs under the pinned BM25 total order ``(round(score, 9) DESC,
      doc_id ASC)``; docs with a NULL dedup value BYPASS the cap (ES
      treats missing-field docs as undeduplicated);
    - then the sample = top ``shard_size`` survivors per query under
      the same order (global and deterministic — the
      :func:`sampler_terms_facets` strengthening of ES's per-shard
      nondeterminism);
    - within the sample: facet doc_count, rank 1..topn under
      ``(doc_count DESC, value ASC)``.

    Returns (query_id INT, value STRING, doc_count LONG, rank INT).

    Scale shape: the dedup cap is a two-level bounded tournament keyed
    on (query, dedup value) — level 1 groups by
    ``spark_partition_id()`` so no buffer holds more than one input
    partition's rows for one key; survivors ride
    :func:`same_same_spark.operators.topk.topk_per_query`. The facet
    join runs AFTER sampling.
    """
    if max_docs_per_value < 1:
        raise ValueError(
            f"max_docs_per_value must be >= 1, got {max_docs_per_value}"
        )
    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")
    from same_same_spark.bm25 import scored_matches
    from same_same_spark.operators.topk import (
        neg_rounded_score,
        topk_per_query,
    )

    scored = scored_matches(
        docs_df, queries, id_col=id_col, text_col=text_col
    )
    dedup = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(dedup_col).cast("string").alias("__dv"),
    )
    with_val = scored.join(dedup, "doc_id")
    capped_part = with_val.filter(F.col("__dv").isNotNull())
    uncapped = with_val.filter(F.col("__dv").isNull()).select(
        "query_id", "doc_id", "score"
    )
    entry = F.struct(
        neg_rounded_score(F.col("score")).alias("nk"),
        F.col("doc_id").alias("doc_id"),
        F.col("score").alias("score"),
    )
    m = max_docs_per_value
    local = (
        capped_part.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "__dv", "part")
        .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, m).alias("c"))
        .groupBy("query_id", "__dv")
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("c"))), 1, m
            ).alias("keep")
        )
    )
    survivors = local.select(
        "query_id", F.explode("keep").alias("s")
    ).select(
        "query_id",
        F.col("s.doc_id").alias("doc_id"),
        F.col("s.score").alias("score"),
    )
    sample = topk_per_query(
        survivors.unionByName(uncapped), shard_size
    ).select("query_id", "doc_id")
    meta = docs_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(facet_col).cast("string").alias("value"),
    )
    counts = (
        meta.join(F.broadcast(sample), "doc_id")
        .filter(F.col("value").isNotNull())
        .groupBy("query_id", "value")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    centry = F.struct(
        (-F.col("doc_count")).alias("negc"),
        F.col("value").alias("value"),
        F.col("doc_count").alias("doc_count"),
    )
    clocal = (
        counts.withColumn("part", F.spark_partition_id())
        .groupBy("query_id", "part")
        .agg(F.slice(F.sort_array(F.collect_list(centry)), 1, topn).alias("c"))
    )
    cmerged = clocal.groupBy("query_id").agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("c"))), 1, topn
        ).alias("top")
    )
    return cmerged.select(
        "query_id", F.posexplode("top").alias("pos", "s")
    ).select(
        "query_id",
        F.col("s.value").alias("value"),
        F.col("s.doc_count").cast("long").alias("doc_count"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


def duckdb_diversified_sampler_sql(
    table: str,
    id_col: str,
    text_col: str,
    queries: list[tuple[int, str]],
    facet_col: str,
    dedup_col: str,
    max_docs_per_value: int = 1,
    shard_size: int = 100,
    topn: int = 5,
) -> str:
    """DuckDB twin of :func:`diversified_sampler_terms_facets`."""
    from same_same_spark.bm25 import duckdb_scored_sql

    inner = duckdb_scored_sql(table, id_col, text_col, queries)
    return f"""
WITH scored AS ({inner}),
with_val AS (
  SELECT s.query_id, s.doc_id, s.score,
         CAST(d.{dedup_col} AS VARCHAR) AS dv
  FROM scored s JOIN {table} d ON s.doc_id = d.{id_col}
),
capped AS (
  SELECT query_id, doc_id, score FROM (
    SELECT query_id, doc_id, score, row_number() OVER (
      PARTITION BY query_id, dv
      ORDER BY round(score, 9) DESC, doc_id ASC
    ) AS rn
    FROM with_val WHERE dv IS NOT NULL
  ) WHERE rn <= {max_docs_per_value}
  UNION ALL
  SELECT query_id, doc_id, score FROM with_val WHERE dv IS NULL
),
sample AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id, row_number() OVER (
      PARTITION BY query_id
      ORDER BY round(score, 9) DESC, doc_id ASC
    ) AS rn FROM capped
  ) WHERE rn <= {shard_size}
),
counts AS (
  SELECT s.query_id, CAST(d.{facet_col} AS VARCHAR) AS value,
         count(*)::BIGINT AS doc_count
  FROM sample s JOIN {table} d ON s.doc_id = d.{id_col}
  WHERE d.{facet_col} IS NOT NULL
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, value, doc_count, row_number() OVER (
    PARTITION BY query_id ORDER BY doc_count DESC, value ASC
  ) AS rank
  FROM counts
)
SELECT query_id, value, doc_count, rank::INTEGER AS rank
FROM ranked WHERE rank <= {topn}
"""
