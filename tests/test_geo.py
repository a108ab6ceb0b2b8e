"""Geo operator family (operators/geo.py).

Differentials:
- geohash bit-math encode vs the TEXTBOOK bisection encoder (written
  here independently of the product's quantize/interleave plan) on
  hash-derived points, plus the canonical public example
  (57.64911, 10.40744) -> "u4pruydqq..." at several precisions;
- geotile vs the OSM slippy-map formula re-derived here with
  ``math`` (clamp/wrap edge cases pinned explicitly);
- haversine vs known city distances and structural identities;
- bbox truth table incl. the antimeridian crossing;
- distance topk/rings/bounds vs python brute force on the same points.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from same_same_spark.operators.geo import (
    EARTH_RADIUS_KM,
    MERCATOR_LAT_LIMIT,
    geo_bounding_box,
    geo_bounds_centroid,
    geo_distance_rings,
    geo_distance_topk,
    geohash_cell_col,
    geohash_grid,
    geotile_cell_col,
    geotile_grid,
    haversine_km_col,
    synth_point_cols,
)

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


# ---------------------------------------------------------------------------
# independent references
# ---------------------------------------------------------------------------

def ref_geohash_bisect(lat: float, lon: float, precision: int) -> str:
    """Textbook geohash: alternate lon/lat interval bisection."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    bit, ch = 0, 0
    out = []
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_lo = mid
            else:
                ch = ch * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_lo = mid
            else:
                ch = ch * 2
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(_B32[ch])
            bit, ch = 0, 0
    return "".join(out)


def ref_geotile(lat: float, lon: float, zoom: int) -> str:
    """OSM slippy-map tile formula (public), with the ES lat clamp and
    x wrap the module pins."""
    n = 1 << zoom
    x = math.floor((lon + 180.0) / 360.0 * n) % n
    lat_c = max(-MERCATOR_LAT_LIMIT, min(MERCATOR_LAT_LIMIT, lat))
    latr = math.radians(lat_c)
    y = math.floor(
        (1.0 - math.log(math.tan(latr) + 1.0 / math.cos(latr)) / math.pi)
        / 2.0
        * n
    )
    y = max(0, min(n - 1, y))
    return f"{zoom}/{x}/{y}"


def ref_haversine(lat1, lon1, lat2, lon2):
    s_lat = math.sin(math.radians(lat2 - lat1) / 2.0)
    s_lon = math.sin(math.radians(lon2 - lon1) / 2.0)
    a = (
        s_lat * s_lat
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * s_lon
        * s_lon
    )
    return 2.0 * EARTH_RADIUS_KM * math.asin(min(1.0, math.sqrt(a)))


@pytest.fixture(scope="module")
def points(spark, events):
    lat, lon = synth_point_cols(F.col("event_id"))
    df = events.select(
        F.col("event_id").alias("id"), lat.alias("lat"), lon.alias("lon")
    )
    rows = df.collect()
    return df, [(r["id"], r["lat"], r["lon"]) for r in rows]


# ---------------------------------------------------------------------------
# cell encodings
# ---------------------------------------------------------------------------

def test_geohash_matches_bisection_reference(spark, points):
    df, rows = points
    for precision in (1, 3, 5, 7):
        got = {
            r["id"]: r["cell"]
            for r in df.select(
                "id",
                geohash_cell_col(
                    F.col("lat"), F.col("lon"), precision
                ).alias("cell"),
            ).collect()
        }
        for pid, lat, lon in rows:
            assert got[pid] == ref_geohash_bisect(lat, lon, precision), (
                pid, lat, lon, precision,
            )


def test_geohash_canonical_example(spark):
    # the classic public example point
    df = spark.createDataFrame(
        [(1, 57.64911, 10.40744)], "id LONG, lat DOUBLE, lon DOUBLE"
    )
    for precision, want in ((5, "u4pru"), (9, "u4pruydqq")):
        got = df.select(
            geohash_cell_col(F.col("lat"), F.col("lon"), precision).alias("c")
        ).collect()[0]["c"]
        assert got == want
        assert ref_geohash_bisect(57.64911, 10.40744, precision) == want


def test_geotile_matches_slippy_reference(spark, points):
    df, rows = points
    for zoom in (0, 3, 7):
        got = {
            r["id"]: r["cell"]
            for r in df.select(
                "id",
                geotile_cell_col(F.col("lat"), F.col("lon"), zoom).alias(
                    "cell"
                ),
            ).collect()
        }
        for pid, lat, lon in rows:
            assert got[pid] == ref_geotile(lat, lon, zoom), (pid, lat, lon)


def test_geotile_edge_cases(spark):
    df = spark.createDataFrame(
        [
            (1, 89.9, 0.0),     # above mercator clamp -> y = 0
            (2, -89.9, 0.0),    # below clamp -> y = n-1
            (3, 0.0, 180.0),    # antimeridian wraps to x = 0
            (4, 0.0, -180.0),   # west edge -> x = 0
        ],
        "id LONG, lat DOUBLE, lon DOUBLE",
    )
    got = {
        r["id"]: r["cell"]
        for r in df.select(
            "id", geotile_cell_col(F.col("lat"), F.col("lon"), 4).alias("cell")
        ).collect()
    }
    assert got[1] == "4/8/0"
    assert got[2] == "4/8/15"
    assert got[3] == "4/0/8"
    assert got[4] == "4/0/8"


# ---------------------------------------------------------------------------
# distance
# ---------------------------------------------------------------------------

def test_haversine_known_distances(spark):
    df = spark.createDataFrame(
        [
            (1, 48.8566, 2.3522, 51.5074, -0.1278),  # Paris -> London
            (2, 0.0, 0.0, 0.0, 0.0),                 # same point
            (3, 0.0, 0.0, 0.0, 180.0),               # antipodal on equator
        ],
        "id LONG, a DOUBLE, b DOUBLE, c DOUBLE, d DOUBLE",
    )
    got = {
        r["id"]: r["km"]
        for r in df.select(
            "id",
            haversine_km_col(
                F.col("a"), F.col("b"), F.col("c"), F.col("d")
            ).alias("km"),
        ).collect()
    }
    assert abs(got[1] - 343.5) < 1.5
    assert got[2] == 0.0
    assert abs(got[3] - math.pi * EARTH_RADIUS_KM) < 1e-6
    # symmetry
    assert got[1] == pytest.approx(
        ref_haversine(48.8566, 2.3522, 51.5074, -0.1278), abs=1e-9
    )


def test_geo_distance_topk_vs_brute(spark, points):
    df, rows = points
    origin = (48.8566, 2.3522)
    k = 20
    brute = sorted(
        (
            (round(ref_haversine(*origin, lat, lon), 9), pid)
            for pid, lat, lon in rows
        )
    )[:k]
    got = geo_distance_topk(df, *origin, k).collect()
    assert [r["id"] for r in sorted(got, key=lambda r: r["rank"])] == [
        pid for _, pid in brute
    ]
    for r in got:
        want = ref_haversine(*origin, *next(
            (lat, lon) for pid, lat, lon in rows if pid == r["id"]
        ))
        assert r["distance_km"] == pytest.approx(want, abs=1e-9)


def test_geo_distance_topk_radius(spark, points):
    df, rows = points
    origin = (0.0, 0.0)
    radius = 3000.0
    got = geo_distance_topk(df, *origin, 1000, radius_km=radius).collect()
    want_ids = {
        pid
        for pid, lat, lon in rows
        if round(ref_haversine(*origin, lat, lon), 9) <= radius
    }
    assert {r["id"] for r in got} == want_ids
    assert all(round(r["distance_km"], 9) <= radius for r in got)


def test_geo_rings_fixed_shape(spark, points):
    df, rows = points
    origin = (48.8566, 2.3522)
    edges = [100.0, 200.0, 5000.0]  # first rings near-certainly sparse
    out = {
        r["bucket"]: (r["lo"], r["hi"], r["doc_count"])
        for r in geo_distance_rings(df, *origin, edges).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[0][:2] == (None, 100.0)
    assert out[3][:2] == (5000.0, None)
    # counts match brute force, zero rings included
    import collections

    want = collections.Counter()
    for _pid, lat, lon in rows:
        d = ref_haversine(*origin, lat, lon)
        b = sum(1 for e in edges if e <= d)
        want[b] += 1
    for b in range(4):
        assert out[b][2] == want.get(b, 0)
    assert sum(c for _, _, c in out.values()) == len(rows)


# ---------------------------------------------------------------------------
# bbox + bounds
# ---------------------------------------------------------------------------

def test_bbox_truth_table(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, 20.0),    # inside plain box
            (2, 10.0, 40.0),    # east of box
            (3, 35.0, 20.0),    # north of box
            (4, 30.0, 30.0),    # on top/right corner (inclusive)
            (5, 0.0, 170.0),    # inside antimeridian box (west side)
            (6, 0.0, -170.0),   # inside antimeridian box (east side)
            (7, 0.0, 0.0),      # outside antimeridian box
        ],
        "id LONG, lat DOUBLE, lon DOUBLE",
    )
    plain = geo_bounding_box(
        df, top=30.0, left=10.0, bottom=0.0, right=30.0
    )
    assert {r["id"] for r in plain.collect()} == {1, 4}
    wrap = geo_bounding_box(
        df, top=30.0, left=150.0, bottom=-30.0, right=-150.0
    )
    assert {r["id"] for r in wrap.collect()} == {5, 6}
    with pytest.raises(ValueError):
        geo_bounding_box(df, top=-1.0, left=0.0, bottom=1.0, right=0.0)
    with pytest.raises(ValueError):
        geo_bounding_box(df, top=1.0, left=700.0, bottom=0.0, right=0.0)


def test_bounds_centroid_and_empty(spark, points):
    df, rows = points
    got = geo_bounds_centroid(df).collect()[0]
    lats = [lat for _, lat, _ in rows]
    lons = [lon for _, _, lon in rows]
    assert got["top"] == max(lats) and got["bottom"] == min(lats)
    assert got["left"] == min(lons) and got["right"] == max(lons)
    assert got["centroid_lat"] == pytest.approx(
        sum(lats) / len(lats), abs=1e-9
    )
    assert got["doc_count"] == len(rows)
    empty = geo_bounds_centroid(df.filter(F.col("lat") > 1000.0)).collect()
    assert len(empty) == 1
    assert empty[0]["doc_count"] == 0 and empty[0]["top"] is None


# ---------------------------------------------------------------------------
# grids
# ---------------------------------------------------------------------------

def test_grid_topn_order_and_counts(spark, points):
    df, rows = points
    import collections

    want = collections.Counter(
        ref_geohash_bisect(lat, lon, 2) for _, lat, lon in rows
    )
    got = geohash_grid(df, 2, 15).collect()
    want_cut = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert sorted((r["cell"], r["doc_count"]) for r in got) == sorted(want_cut)

    wantt = collections.Counter(
        ref_geotile(lat, lon, 3) for _, lat, lon in rows
    )
    gott = geotile_grid(df, 3, 10).collect()
    want_cut_t = sorted(wantt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert sorted((r["cell"], r["doc_count"]) for r in gott) == sorted(
        want_cut_t
    )


def test_grid_null_coords_excluded(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, None, 10.0), (3, 10.0, None)],
        "id LONG, lat DOUBLE, lon DOUBLE",
    )
    assert geohash_grid(df, 3, 10).count() == 1
    assert geotile_grid(df, 3, 10).count() == 1
    assert geo_distance_topk(df, 0.0, 0.0, 10).count() == 1


def test_geo_distance_feature_boost(spark, documents):
    from same_same_spark.bm25 import scored_matches
    from same_same_spark.operators.geo import (
        geo_distance_feature_topk,
        haversine_km_col,
        synth_point_cols,
    )

    lat, lon = synth_point_cols(F.col("doc_id"))
    dg = documents.withColumn("lat", lat).withColumn("lon", lon)
    queries = [(0, "fast merge join")]
    origin = (48.8566, 2.3522)
    got = geo_distance_feature_topk(
        dg, queries, *origin, pivot_km=2000.0, boost=0.5, k=8,
        id_col="doc_id", text_col="text",
    ).collect()
    base = {
        r["doc_id"]: r["score"]
        for r in scored_matches(
            documents, queries, id_col="doc_id", text_col="text"
        ).collect()
    }
    dists = {
        r["doc_id"]: r["d"]
        for r in dg.select(
            "doc_id",
            haversine_km_col(
                F.lit(origin[0]), F.lit(origin[1]),
                F.col("lat"), F.col("lon"),
            ).alias("d"),
        ).collect()
    }
    want = sorted(
        (
            (did, s + 0.5 * (2000.0 / (2000.0 + dists[did])))
            for did, s in base.items()
        ),
        key=lambda kv: (-round(kv[1] * 1e9) / 1e9, kv[0]),
    )[:8]
    mine = sorted(got, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in mine] == [d for d, _ in want]
    for r, (_d, s) in zip(mine, want):
        assert r["score"] == pytest.approx(s, rel=1e-12)
    with pytest.raises(ValueError, match="pivot_km"):
        geo_distance_feature_topk(dg, queries, 0.0, 0.0, pivot_km=0.0)
