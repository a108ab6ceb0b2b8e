"""Geo operators — ES ``geo_distance`` / ``geo_bounding_box`` /
``geotile_grid`` / ``geohash_grid`` / ``geo_bounds``+``geo_centroid``
re-expressed as pure column math.

Beyond-reference relevance: the reference stores text + embeddings only
(``/root/reference/internal/storage`` has no geo field), but crawl-scale
corpora carry geo metadata (page geotags, CDN POPs, EXIF) and every
mainstream fulltext engine ships a geo query/agg family. Points are
plain ``(lat DOUBLE degrees, lon DOUBLE degrees)`` columns — no UDT.

Pinned semantics (mirrored token-for-token in the duckdb twins):

- ``haversine_km``: ``2 R asin(least(1, sqrt(a)))`` with
  ``a = sin²(Δφ/2) + cos φ1 cos φ2 sin²(Δλ/2)`` and R = 6371.0088 km
  (IUGG mean radius). Transcendental-parity risk is the same class as
  BM25's ``ln`` (accepted repo-wide): ranks pin at ``round(d, 9)``,
  surfaces at ``round(d, 6)``.
- ``geo_distance_topk``: k nearest under ``(round(d,9) ASC, id ASC)``;
  optional radius membership decided AT RANK PRECISION
  (``round(d,9) <= radius`` — the vector ``range_search`` rule).
- ``geo_bounding_box``: edges inclusive; ``left > right`` means the box
  crosses the antimeridian (``lon >= left OR lon <= right``).
- ``geotile_grid``: Web-Mercator slippy tiles keyed ``"z/x/y"``;
  latitude clamped to ±85.0511287798066 like ES, x wraps modulo 2^z
  (lon 180 → tile 0), y clamps to [0, 2^z-1].
- ``geohash_grid``: classic base-32 geohash, implemented as EXACT
  integer bit math (quantize each axis to its bit budget → interleave
  lon-first → base32) — no transcendentals, so the cell id is
  bit-identical cross-engine; equivalence with the textbook bisection
  encoder is differential-tested (``tests/test_geo.py``).
- Both grids emit the top-n cells under ``(count DESC, cell ASC)`` —
  a total order, so the returned SET is deterministic.
- ``geo_bounds_centroid``: one-row agg — top/bottom/left/right extremes
  (non-wrapping, ES default) + arithmetic-mean centroid + count.

Scale shape: everything is a column expression over the point relation
— one scan; grids are one ``groupBy(cell)`` with map-side partial
aggregation and a ``TakeOrderedAndProject`` cut (no windows); the
nearest-k ranking rides the bounded tournament (``topk_per_query``);
rings reuse the fixed-shape bucket join (literal shape broadcast).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from same_same_spark.operators.topk import topk_per_query
from same_same_spark.pipeline.dedup import hash60_col, hash60_sql

EARTH_RADIUS_KM = 6371.0088
# Web-Mercator latitude limit (atan(sinh(pi)) in degrees) — the ES clamp.
MERCATOR_LAT_LIMIT = 85.0511287798066
_PI = repr(math.pi)
_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_H60 = float(1 << 60)


# ---------------------------------------------------------------------------
# Deterministic synthetic points (entry/test fixture)
# ---------------------------------------------------------------------------

def synth_point_cols(id_col: Column, salt: str = "geo") -> tuple[Column, Column]:
    """Deterministic (lat, lon) derived from an id via the pinned
    md5-60-bit hash — EXACT arithmetic (hash/2^60 scale-shift), so both
    engines derive bit-identical coordinates. Fixture for entries and
    tests; real corpora bring their own lat/lon columns."""
    sid = id_col.cast("string")
    lat = (
        hash60_col(F.concat(F.lit(f"{salt}:lat:"), sid)) / F.lit(_H60)
        * F.lit(180.0) - F.lit(90.0)
    )
    lon = (
        hash60_col(F.concat(F.lit(f"{salt}:lon:"), sid)) / F.lit(_H60)
        * F.lit(360.0) - F.lit(180.0)
    )
    return lat, lon


def synth_point_sql(id_sql: str, salt: str = "geo") -> tuple[str, str]:
    """DuckDB twin of :func:`synth_point_cols`."""
    sid = f"CAST({id_sql} AS VARCHAR)"
    h_lat = hash60_sql(f"'{salt}:lat:' || {sid}")
    h_lon = hash60_sql(f"'{salt}:lon:' || {sid}")
    lat = f"({h_lat} / {_H60!r} * 180.0 - 90.0)"
    lon = f"({h_lon} / {_H60!r} * 360.0 - 180.0)"
    return lat, lon


# ---------------------------------------------------------------------------
# Haversine distance
# ---------------------------------------------------------------------------

def haversine_km_col(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (see module pin for the exact
    expression order)."""
    s_lat = F.sin(F.radians(lat2 - lat1) / F.lit(2.0))
    s_lon = F.sin(F.radians(lon2 - lon1) / F.lit(2.0))
    a = (
        s_lat * s_lat
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * s_lon * s_lon
    )
    return (
        F.lit(2.0 * EARTH_RADIUS_KM)
        * F.asin(F.least(F.lit(1.0), F.sqrt(a)))
    )


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB twin of :func:`haversine_km_col` (identical op order)."""
    s_lat = f"sin(radians(({lat2}) - ({lat1})) / 2.0)"
    s_lon = f"sin(radians(({lon2}) - ({lon1})) / 2.0)"
    a = (
        f"({s_lat} * {s_lat} + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * {s_lon} * {s_lon})"
    )
    return f"({2.0 * EARTH_RADIUS_KM!r} * asin(least(1.0, sqrt({a}))))"


# ---------------------------------------------------------------------------
# Bounding box
# ---------------------------------------------------------------------------

def geo_bounding_box(
    df: DataFrame,
    *,
    top: float,
    left: float,
    bottom: float,
    right: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Rows inside the box (edges inclusive; ``left > right`` crosses
    the antimeridian). Pure comparisons — exact cross-engine."""
    if not (-90.0 <= bottom <= top <= 90.0):
        raise ValueError(f"need -90 <= bottom <= top <= 90, got {bottom}/{top}")
    for name, v in (("left", left), ("right", right)):
        if not -180.0 <= v <= 180.0:
            raise ValueError(f"{name} must be in [-180, 180], got {v}")
    lat, lon = F.col(lat_col), F.col(lon_col)
    lat_ok = (lat >= F.lit(float(bottom))) & (lat <= F.lit(float(top)))
    if left <= right:
        lon_ok = (lon >= F.lit(float(left))) & (lon <= F.lit(float(right)))
    else:
        lon_ok = (lon >= F.lit(float(left))) | (lon <= F.lit(float(right)))
    return df.filter(lat_ok & lon_ok)


def geo_bounding_box_sql(
    *,
    top: float,
    left: float,
    bottom: float,
    right: float,
    lat_sql: str = "lat",
    lon_sql: str = "lon",
) -> str:
    """DuckDB predicate twin of :func:`geo_bounding_box`."""
    lat_ok = (
        f"({lat_sql}) >= {float(bottom)!r} AND ({lat_sql}) <= {float(top)!r}"
    )
    if left <= right:
        lon_ok = (
            f"({lon_sql}) >= {float(left)!r} AND ({lon_sql}) <= {float(right)!r}"
        )
    else:
        lon_ok = (
            f"(({lon_sql}) >= {float(left)!r} OR ({lon_sql}) <= {float(right)!r})"
        )
    return f"({lat_ok} AND {lon_ok})"


# ---------------------------------------------------------------------------
# Nearest-k / distance rings
# ---------------------------------------------------------------------------

def geo_distance_topk(
    df: DataFrame,
    origin_lat: float,
    origin_lon: float,
    k: int,
    *,
    radius_km: float | None = None,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """k nearest rows to the origin (ES geo_distance sort / query).
    Returns (id, distance_km DOUBLE, rank INT) under
    ``(round(d,9) ASC, id ASC)``; NULL coordinates never match.
    Rides the bounded tournament via the score ``-d`` (descending
    ``-d`` == ascending ``d``; the tournament's tiebreak is id ASC)."""
    d = haversine_km_col(
        F.lit(float(origin_lat)), F.lit(float(origin_lon)),
        F.col(lat_col), F.col(lon_col),
    )
    scored = df.filter(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    ).select(
        F.lit(0).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        (F.lit(0.0) - d).alias("score"),
    )
    if radius_km is not None:
        # membership at rank precision — the range_search rule
        scored = scored.filter(
            F.round(F.lit(0.0) - F.col("score"), 9) <= F.lit(float(radius_km))
        )
    top = topk_per_query(scored, k)
    return top.select(
        F.col("doc_id").alias(id_col),
        (F.lit(0.0) - F.col("score")).alias("distance_km"),
        "rank",
    )


def geo_distance_rings(
    df: DataFrame,
    origin_lat: float,
    origin_lon: float,
    edges_km: list[float],
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Distance-ring histogram (ES geo_distance agg): half-open rings
    ``[lo, hi)`` with unbounded first/last ends, EVERY ring emitted
    (zero counts included — fixed shape). Returns (bucket INT, lo
    DOUBLE nullable, hi DOUBLE nullable, doc_count LONG)."""
    if sorted(edges_km) != list(edges_km) or len(set(edges_km)) != len(edges_km):
        raise ValueError("edges_km must be strictly ascending")
    spark = df.sparkSession
    d = haversine_km_col(
        F.lit(float(origin_lat)), F.lit(float(origin_lon)),
        F.col(lat_col), F.col(lon_col),
    )
    pts = df.filter(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    ).select(d.alias("v"))
    edges = [None] + [float(e) for e in edges_km] + [None]
    buckets = [(i, edges[i], edges[i + 1]) for i in range(len(edges) - 1)]
    bucket_expr = F.lit(len(buckets) - 1)
    for i, (_, _lo, hi) in reversed(list(enumerate(buckets[:-1]))):
        bucket_expr = F.when(F.col("v") < F.lit(hi), F.lit(i)).otherwise(
            bucket_expr
        )
    counted = (
        pts.withColumn("bucket", bucket_expr)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    shape = spark.createDataFrame(
        [(i, lo, hi) for i, lo, hi in buckets],
        "bucket INT, lo DOUBLE, hi DOUBLE",
    )
    return (
        F.broadcast(shape)
        .join(counted, "bucket", "left")
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "lo",
            "hi",
            F.coalesce(F.col("doc_count"), F.lit(0))
            .cast("long")
            .alias("doc_count"),
        )
    )


def duckdb_geo_rings_sql(
    table: str,
    origin_lat: float,
    origin_lon: float,
    edges_km: list[float],
    *,
    lat_sql: str = "lat",
    lon_sql: str = "lon",
) -> str:
    """DuckDB twin of :func:`geo_distance_rings` (bucket re-derived with
    the independent closed form: count of edges <= d)."""
    d = haversine_km_sql(
        repr(float(origin_lat)), repr(float(origin_lon)), lat_sql, lon_sql
    )
    edges = [None] + [float(e) for e in edges_km] + [None]
    lits = ["NULL" if e is None else repr(e) for e in edges]
    brows = ", ".join(
        f"({i}, CAST({lits[i]} AS DOUBLE), CAST({lits[i + 1]} AS DOUBLE))"
        for i in range(len(edges) - 1)
    )
    elist = ", ".join(repr(float(e)) for e in edges_km)
    return f"""
WITH pts AS (
  SELECT {d} AS v FROM {table}
  WHERE ({lat_sql}) IS NOT NULL AND ({lon_sql}) IS NOT NULL
),
assigned AS (
  SELECT len(list_filter([{elist}], e -> e <= v)) AS bucket FROM pts
),
counted AS (
  SELECT bucket, count(*)::BIGINT AS doc_count FROM assigned GROUP BY bucket
),
shape AS (SELECT * FROM (VALUES {brows}) AS s(bucket, lo, hi))
SELECT s.bucket::INTEGER AS bucket, CAST(s.lo AS DOUBLE) AS lo,
       CAST(s.hi AS DOUBLE) AS hi,
       coalesce(c.doc_count, 0)::BIGINT AS doc_count
FROM shape s LEFT JOIN counted c ON s.bucket = c.bucket
"""


# ---------------------------------------------------------------------------
# geotile grid (Web-Mercator slippy tiles)
# ---------------------------------------------------------------------------

def geotile_cell_col(lat: Column, lon: Column, zoom: int) -> Column:
    """Slippy-tile key ``"z/x/y"`` (see module pin)."""
    if not 0 <= zoom <= 29:
        raise ValueError(f"zoom must be in [0, 29], got {zoom}")
    n = 1 << zoom
    x_raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    x = F.pmod(x_raw.cast("long"), F.lit(n).cast("long"))
    lat_c = F.least(
        F.greatest(lat, F.lit(-MERCATOR_LAT_LIMIT)), F.lit(MERCATOR_LAT_LIMIT)
    )
    latr = F.radians(lat_c)
    y_raw = F.floor(
        (
            F.lit(1.0)
            - F.log(F.tan(latr) + F.lit(1.0) / F.cos(latr)) / F.lit(math.pi)
        )
        / F.lit(2.0)
        * F.lit(float(n))
    )
    y = F.least(
        F.greatest(y_raw.cast("long"), F.lit(0).cast("long")),
        F.lit(n - 1).cast("long"),
    )
    return F.concat_ws("/", F.lit(str(zoom)), x.cast("string"), y.cast("string"))


def geotile_cell_sql(lat_sql: str, lon_sql: str, zoom: int) -> str:
    """DuckDB twin of :func:`geotile_cell_col` (identical op order)."""
    n = 1 << zoom
    x_raw = f"CAST(floor((({lon_sql}) + 180.0) / 360.0 * {float(n)!r}) AS BIGINT)"
    x = f"((({x_raw}) % {n} + {n}) % {n})"
    lat_c = (
        f"least(greatest(({lat_sql}), {-MERCATOR_LAT_LIMIT!r}),"
        f" {MERCATOR_LAT_LIMIT!r})"
    )
    latr = f"radians({lat_c})"
    y_raw = (
        f"CAST(floor((1.0 - ln(tan({latr}) + 1.0 / cos({latr})) / {_PI})"
        f" / 2.0 * {float(n)!r}) AS BIGINT)"
    )
    y = f"least(greatest({y_raw}, 0), {n - 1})"
    return (
        f"('{zoom}' || '/' || CAST({x} AS VARCHAR) || '/' ||"
        f" CAST({y} AS VARCHAR))"
    )


# ---------------------------------------------------------------------------
# geohash grid (exact integer bit math)
# ---------------------------------------------------------------------------

def geohash_cell_col(lat: Column, lon: Column, precision: int) -> Column:
    """Base-32 geohash of length ``precision`` (see module pin).
    Quantize each axis to its bit budget, interleave lon-first, base32 —
    integer arithmetic only (exact cross-engine)."""
    if not 1 <= precision <= 9:
        raise ValueError(f"precision must be in [1, 9], got {precision}")
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    lon_q = F.least(
        F.greatest(
            F.floor(
                (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))
            ).cast("long"),
            F.lit(0).cast("long"),
        ),
        F.lit((1 << lon_bits) - 1).cast("long"),
    )
    lat_q = F.least(
        F.greatest(
            F.floor(
                (lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))
            ).cast("long"),
            F.lit(0).cast("long"),
        ),
        F.lit((1 << lat_bits) - 1).cast("long"),
    )
    terms = []
    for i in range(total):
        if i % 2 == 0:  # even interleave positions take longitude bits
            src, src_bits, j = lon_q, lon_bits, i // 2
        else:
            src, src_bits, j = lat_q, lat_bits, i // 2
        bit = F.shiftright(src, src_bits - 1 - j).bitwiseAND(
            F.lit(1).cast("long")
        )
        terms.append(bit * F.lit(1 << (total - 1 - i)).cast("long"))
    g = terms[0]
    for t in terms[1:]:
        g = g + t
    alph = F.array(*[F.lit(c) for c in _B32])
    chars = [
        F.element_at(
            alph,
            (
                F.shiftright(g, 5 * (precision - 1 - k)).bitwiseAND(
                    F.lit(31).cast("long")
                )
                + F.lit(1)
            ).cast("int"),
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def geohash_cell_sql(lat_sql: str, lon_sql: str, precision: int) -> str:
    """DuckDB twin of :func:`geohash_cell_col` (same bit plan)."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    lon_q = (
        f"least(greatest(CAST(floor((({lon_sql}) + 180.0) / 360.0 *"
        f" {float(1 << lon_bits)!r}) AS BIGINT), 0), {(1 << lon_bits) - 1})"
    )
    lat_q = (
        f"least(greatest(CAST(floor((({lat_sql}) + 90.0) / 180.0 *"
        f" {float(1 << lat_bits)!r}) AS BIGINT), 0), {(1 << lat_bits) - 1})"
    )
    terms = []
    for i in range(total):
        if i % 2 == 0:
            src, src_bits, j = lon_q, lon_bits, i // 2
        else:
            src, src_bits, j = lat_q, lat_bits, i // 2
        terms.append(
            f"((({src} >> {src_bits - 1 - j}) & 1) * {1 << (total - 1 - i)})"
        )
    g = "(" + " + ".join(terms) + ")"
    chars = " || ".join(
        f"substr('{_B32}', CAST((({g} >> {5 * (precision - 1 - k)}) & 31) + 1"
        f" AS INTEGER), 1)"
        for k in range(precision)
    )
    return f"({chars})"


def geo_grid(
    df: DataFrame,
    cell: Column,
    top_n: int,
) -> DataFrame:
    """Shared grid aggregation: count per cell, top-n under
    ``(count DESC, cell ASC)``. Returns (cell STRING, doc_count LONG).
    One groupBy (map-side combine) + TakeOrderedAndProject."""
    grouped = (
        df.select(cell.alias("cell"))
        .filter(F.col("cell").isNotNull())
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
    )
    return grouped.orderBy(
        F.col("doc_count").desc(), F.col("cell").asc()
    ).limit(top_n)


def geotile_grid(
    df: DataFrame,
    zoom: int,
    top_n: int,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES geotile_grid agg (see module pin)."""
    pts = df.filter(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    )
    return geo_grid(
        pts, geotile_cell_col(F.col(lat_col), F.col(lon_col), zoom), top_n
    )


def geohash_grid(
    df: DataFrame,
    precision: int,
    top_n: int,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES geohash_grid agg (see module pin)."""
    pts = df.filter(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    )
    return geo_grid(
        pts, geohash_cell_col(F.col(lat_col), F.col(lon_col), precision), top_n
    )


def duckdb_geo_grid_sql(
    table: str,
    cell_sql: str,
    top_n: int,
    *,
    lat_sql: str = "lat",
    lon_sql: str = "lon",
) -> str:
    """DuckDB twin of :func:`geo_grid` over a cell expression."""
    return f"""
WITH cells AS (
  SELECT {cell_sql} AS cell FROM {table}
  WHERE ({lat_sql}) IS NOT NULL AND ({lon_sql}) IS NOT NULL
),
counted AS (
  SELECT cell, count(*)::BIGINT AS doc_count FROM cells
  WHERE cell IS NOT NULL GROUP BY cell
)
SELECT cell, doc_count FROM counted
ORDER BY doc_count DESC, cell ASC LIMIT {top_n}
"""


# ---------------------------------------------------------------------------
# bounds + centroid
# ---------------------------------------------------------------------------

def geo_bounds_centroid(
    df: DataFrame,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """One-row agg: (top, bottom, left, right, centroid_lat,
    centroid_lon, doc_count) — ES geo_bounds (non-wrapping) +
    geo_centroid. NULL coordinates excluded; zero rows → one row of
    NULLs with doc_count 0 (fixed shape)."""
    pts = df.filter(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    ).select(F.col(lat_col).alias("lat"), F.col(lon_col).alias("lon"))
    return pts.agg(
        F.max("lat").alias("top"),
        F.min("lat").alias("bottom"),
        F.min("lon").alias("left"),
        F.max("lon").alias("right"),
        F.avg("lat").alias("centroid_lat"),
        F.avg("lon").alias("centroid_lon"),
        F.count(F.lit(1)).cast("long").alias("doc_count"),
    )


def duckdb_geo_bounds_sql(
    table: str,
    *,
    lat_sql: str = "lat",
    lon_sql: str = "lon",
    where_sql: str = "TRUE",
    round6: bool = False,
) -> str:
    """DuckDB twin of :func:`geo_bounds_centroid` (optionally over a
    bounding-box predicate; ``round6`` applies the entry convention's
    6-dp rounding to every float column)."""
    def _r(expr: str) -> str:
        return f"round({expr}, 6)" if round6 else expr

    return f"""
WITH pts AS (
  SELECT ({lat_sql}) AS lat, ({lon_sql}) AS lon FROM {table}
  WHERE ({lat_sql}) IS NOT NULL AND ({lon_sql}) IS NOT NULL
    AND ({where_sql})
)
SELECT {_r('max(lat)')} AS top, {_r('min(lat)')} AS bottom,
       {_r('min(lon)')} AS "left", {_r('max(lon)')} AS "right",
       {_r('avg(lat)')} AS centroid_lat, {_r('avg(lon)')} AS centroid_lon,
       count(*)::BIGINT AS doc_count
FROM pts
"""


def geo_distance_feature_topk(
    docs_df: DataFrame,
    queries: list[tuple[int, str]],
    origin_lat: float,
    origin_lon: float,
    pivot_km: float,
    boost: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    lat_col: str = "lat",
    lon_col: str = "lon",
):
    """ES ``distance_feature`` with a GEO-POINT origin: BM25 text
    relevance boosted by proximity to a coordinate —

        score = BM25(q, d) + boost * pivot / (pivot + haversine_km)

    (the :mod:`~same_same_spark.operators.feature` numeric shape with
    the pinned haversine as the distance). Docs with NULL coordinates
    contribute 0 (they still match on text). Same scale shape as
    rank_feature_topk: one scored-matches plan, the feature folded as
    a column expression, bounded tournament."""
    from same_same_spark.operators.feature import _boosted

    if pivot_km <= 0:
        raise ValueError(f"pivot_km must be > 0, got {pivot_km}")
    d = haversine_km_col(
        F.lit(float(origin_lat)), F.lit(float(origin_lon)),
        F.col(lat_col), F.col(lon_col),
    )
    contrib = F.when(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull(),
        F.lit(float(boost))
        * (F.lit(float(pivot_km)) / (F.lit(float(pivot_km)) + d)),
    ).otherwise(F.lit(0.0))
    from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT

    return _boosted(
        docs_df, queries, id_col, text_col, K1_DEFAULT, B_DEFAULT,
        contrib, k,
    )


def duckdb_geo_distance_feature_sql(
    table: str,
    queries: list[tuple[int, str]],
    origin_lat: float,
    origin_lon: float,
    pivot_km: float,
    boost: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    lat_sql: str = "lat",
    lon_sql: str = "lon",
    round_score: int = 6,
) -> str:
    """DuckDB twin of :func:`geo_distance_feature_topk`."""
    from same_same_spark.operators.feature import _duckdb_boosted

    d = haversine_km_sql(
        repr(float(origin_lat)), repr(float(origin_lon)),
        f"d.{lat_sql}" if lat_sql.isidentifier() else lat_sql,
        f"d.{lon_sql}" if lon_sql.isidentifier() else lon_sql,
    )
    lat_ref = f"d.{lat_sql}" if lat_sql.isidentifier() else lat_sql
    lon_ref = f"d.{lon_sql}" if lon_sql.isidentifier() else lon_sql
    contrib = (
        f"CASE WHEN ({lat_ref}) IS NOT NULL AND ({lon_ref}) IS NOT NULL "
        f"THEN {float(boost)!r} * ({float(pivot_km)!r} / "
        f"({float(pivot_km)!r} + {d})) ELSE 0.0 END"
    )
    from same_same_spark.bm25 import B_DEFAULT, K1_DEFAULT

    return _duckdb_boosted(
        table, id_col, text_col, queries, contrib, k,
        K1_DEFAULT, B_DEFAULT, round_score,
    )
