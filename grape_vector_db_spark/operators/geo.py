"""Geospatial predicates (reference P9, src/filtering.rs:97-105, 491-534).

The reference builds an in-memory R-tree over (lat, lon) payload fields
(src/filtering.rs:151-257) to answer ``Near`` (nearest point) and
``WithinDistance`` (circle). Spark-first replacement:

- haversine distance as a pure column expression (codegen'd double math);
- a **bounding-box prefilter** (cheap lat/lon range predicate) that
  Catalyst pushes into the parquet scan — at 100 TB this plays the R-tree's
  pruning role via row-group min/max statistics, no index structure needed;
- Near = ORDER BY dist LIMIT k (TakeOrderedAndProject, zero shuffle);
  WithinDistance = WHERE dist <= r.

Distances in kilometers on a 6371.0 km sphere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    # clamp: fp noise can push a to 1 + 2^-52 for near-antipodal points,
    # where sqrt(a) > 1 makes asin NaN
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def _bbox_filter(lat_col: str, lon_col: str, lat: float, lon: float, radius_km: float) -> Column:
    """Cheap pushdown-able prefilter: a degree box that STRICTLY contains
    the circle. Three exactness rules a naive box gets wrong:

    - the lon half-width is the spherical cap's max extent
      asin(sin(r/R) / cos(CENTER lat)) — the tangent-meridian result
      (the cap's extreme-longitude point sits poleward of the center,
      but its formula still divides by cos of the CENTER latitude; the
      naive linear r/cos under-covers, the previous cos(poleward-edge)
      variant over-covered AND bailed to all-longitudes far too early:
      at lat 80 / 1000 km it scanned every longitude where the exact
      bound prunes ~2/3 of the range);
    - a circle containing a pole (|lat| + dlat >= 90) spans every
      longitude — no lon predicate at all (and with the pole excluded,
      sin(theta) <= cos(center) always holds, so the asin is defined);
    - the lon range WRAPS at the antimeridian via the normalized
      difference ((lon - center + 540) % 360) - 180.
    """
    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    lat_pred = (F.col(lat_col) >= lat - dlat) & (F.col(lat_col) <= lat + dlat)
    sin_ratio = math.sin(min(radius_km / EARTH_RADIUS_KM, math.pi))
    cos_center = math.cos(math.radians(lat))
    if abs(lat) + dlat >= 90.0 or sin_ratio >= cos_center:
        return lat_pred  # pole inside: all lons (the fp guard too)
    dlon = math.degrees(math.asin(sin_ratio / cos_center))
    lon_diff = F.pmod(F.col(lon_col) - F.lit(lon) + 540.0, F.lit(360.0)) - 180.0
    return lat_pred & (F.abs(lon_diff) <= dlon)


def within_distance(
    df: DataFrame,
    lat: float,
    lon: float,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Rows within radius_km of (lat, lon), with a ``dist_km`` column."""
    pre = df.where(_bbox_filter(lat_col, lon_col, lat, lon, radius_km))
    dist = haversine_km(F.col(lat_col), F.col(lon_col), F.lit(lat), F.lit(lon))
    return pre.withColumn("dist_km", F.round(dist, 6)).where(
        F.col("dist_km") <= radius_km
    )


def distance_pairs(
    df: DataFrame,
    radius_km: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 66.0,
) -> DataFrame:
    """All point pairs within ``radius_km`` (a < b, with dist_km) — the
    spatial SELF-JOIN, grid-bucketed so it never goes all-pairs:

    1. every point maps to one (lat_cell, lon_cell) grid cell sized
       conservatively >= radius in both axes,
    2. one side explodes to its 3x3 neighbor cells (lon wraps modularly,
       so dateline-adjacent points still meet),
    3. hash-join on the cell key, exact haversine filter after.

    Work is bounded by points-per-9-cells — data-dependent density, not
    n². Contract: rows with |lat| > ``max_abs_lat`` are EXCLUDED (cells
    keep bounded width away from the poles; polar caps need a dedicated
    cap band — same extension every grid scheme ships). The interval
    join (operators.asof.interval_join) is this pattern in 1-D.
    """
    if radius_km <= 0:
        raise ValueError("radius_km must be positive")
    # exact conservative degree sizes, >= radius everywhere in the band:
    # the lon extent is the great-circle bound asin(sin(r/R)/cos(band))
    # (a linear r/cos approximation under-covers for large radii), and
    # the grid uses UNIFORM cell widths 360/n_lon — ceil(360/dlon) would
    # leave a ragged seam cell narrower than the radius at the
    # antimeridian, where the +-1 neighbor guarantee then fails
    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    sin_ratio = math.sin(min(radius_km / EARTH_RADIUS_KM, math.pi))
    cos_band = math.cos(math.radians(max_abs_lat))
    if sin_ratio >= cos_band:
        n_lon = 1  # radius spans every longitude at the band edge
    else:
        dlon = math.degrees(math.asin(sin_ratio / cos_band))
        n_lon = max(int(math.floor(360.0 / dlon)), 1)
    dlon = 360.0 / n_lon

    base = df.where(F.abs(F.col(lat_col)) <= max_abs_lat).select(
        F.col(id_col).alias("id"),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
        F.floor(F.col(lat_col) / dlat).cast("long").alias("_clat"),
        # base cell wraps mod n_lon too: lon=180 would otherwise land in
        # cell n_lon (when 360/dlon is integral), which no wrapped lhs
        # neighbor cell can ever match — silently dropping its pairs
        (F.floor((F.col(lon_col) + 180.0) / dlon).cast("long") % n_lon).alias(
            "_clon"
        ),
    )
    rhs = base.select(
        F.col("id").alias("b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "_clat",
        "_clon",
    )
    # dedupe the wrapped lon offsets in PYTHON (n_lon < 3 would emit the
    # same cell twice) so each (a, b) pair joins in exactly one cell and
    # the output needs NO dropDuplicates — that was a full extra shuffle
    # of the result for nothing at any realistic n_lon
    lon_offsets = sorted({j % n_lon for j in (-1, 0, 1)})
    neighbors = F.explode(
        F.array(
            *[
                F.struct(
                    (F.col("_clat") + i).alias("_clat"),
                    ((F.col("_clon") + j) % n_lon).alias("_clon"),
                )
                for i in (-1, 0, 1)
                for j in lon_offsets
            ]
        )
    )
    lhs = (
        base.withColumn("_nb", neighbors)
        .select(
            F.col("id").alias("a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            F.col("_nb._clat").alias("_clat"),
            F.col("_nb._clon").alias("_clon"),
        )
    )
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        lhs.join(rhs, ["_clat", "_clon"])
        .where(F.col("a") < F.col("b"))
        .withColumn("dist_km", F.round(dist, 6))
        .where(F.col("dist_km") <= radius_km)
        .select("a", "b", "dist_km")
    )


def point_in_polygon(
    lat_col: Column, lon_col: Column, polygon: list[tuple[float, float]]
) -> Column:
    """Ray-casting point-in-polygon as a pure column expression.

    The reference DECLARES polygon Within/Contains/Intersects but stubs
    them to empty results (src/filtering.rs:97-105) — this implements the
    real semantics. ``polygon`` is a closed ring of (lat, lon) vertices
    (closing edge implied). Odd crossing count of a horizontal ray = inside.
    Boundary points follow the standard crossing convention.

    The ring folds into the plan as a literal edge array; cost is
    O(vertices) arithmetic per row inside codegen, and a bounding-box
    prefilter (cheap pushdown-able range predicate) should wrap it for
    pruning — see within_polygon.
    """
    n = len(polygon)
    if n < 3:
        raise ValueError("polygon needs >= 3 vertices")
    edges = F.array(
        *[
            F.struct(
                F.lit(float(polygon[i][0])).alias("y1"),
                F.lit(float(polygon[i][1])).alias("x1"),
                F.lit(float(polygon[(i + 1) % n][0])).alias("y2"),
                F.lit(float(polygon[(i + 1) % n][1])).alias("x2"),
            )
            for i in range(n)
        ]
    )
    py, px = lat_col, lon_col

    def cross(acc: Column, e: Column) -> Column:
        straddles = (e["y1"] > py) != (e["y2"] > py)
        # try_divide: horizontal edges (y1==y2) can't straddle, but ANSI
        # mode must never see the 0-division even speculatively
        x_at = (
            F.coalesce(
                F.try_divide((e["x2"] - e["x1"]) * (py - e["y1"]), e["y2"] - e["y1"]),
                F.lit(0.0),
            )
            + e["x1"]
        )
        return acc + F.when(straddles & (px < x_at), F.lit(1)).otherwise(F.lit(0))

    crossings = F.aggregate(edges, F.lit(0), cross)
    return crossings % 2 == 1


def within_polygon(
    df: DataFrame,
    polygon: list[tuple[float, float]],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Rows inside the polygon, with a bounding-box prefilter that Catalyst
    pushes into the scan before the exact ray-cast runs."""
    lats = [p[0] for p in polygon]
    lons = [p[1] for p in polygon]
    bbox = (
        (F.col(lat_col) >= min(lats))
        & (F.col(lat_col) <= max(lats))
        & (F.col(lon_col) >= min(lons))
        & (F.col(lon_col) <= max(lons))
    )
    return df.where(bbox).where(
        point_in_polygon(F.col(lat_col), F.col(lon_col), polygon)
    )


def nearest(
    df: DataFrame,
    lat: float,
    lon: float,
    k: int = 1,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """k nearest rows to (lat, lon) — the reference's ``Near``."""
    dist = haversine_km(F.col(lat_col), F.col(lon_col), F.lit(lat), F.lit(lon))
    return (
        df.where(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .withColumn("dist_km", F.round(dist, 6))
        .orderBy(F.col("dist_km").asc(), F.col(id_col).asc())
        .limit(k)
    )
