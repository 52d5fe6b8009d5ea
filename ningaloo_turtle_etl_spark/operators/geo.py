"""Geodesic distance operators — the great-circle complement to the
planar helpers in relational.py/spatial.py (the reference buys these from
R's geosphere; here they are pure Catalyst trig columns).

Scale design: the nearest-site join is GRID-BLOCKED — points explode into
their 3×3 neighborhood of lat/lon cells and equi-join with site cells, so
the candidate set is bounded by cell occupancy and the plan is a hash join
(never a point×site cross product). Cell size must be ≥ the search radius
(in degrees) for the 3×3 neighborhood to be a complete cover.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km between two (lat, lon) pairs, degrees in
    — pure column trig, codegen-able. Accepts column names or Columns."""
    lat1, lon1, lat2, lon2 = (
        F.col(c) if isinstance(c, str) else c for c in (lat1, lon1, lat2, lon2)
    )
    φ1, φ2 = F.radians(lat1), F.radians(lat2)
    dφ = F.radians(lat2 - lat1) / 2
    dλ = F.radians(lon2 - lon1) / 2
    a = F.sin(dφ) * F.sin(dφ) + F.cos(φ1) * F.cos(φ2) * F.sin(dλ) * F.sin(dλ)
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def grid_cell(lat, lon, cell_deg: float) -> Column:
    """Stable integer cell id for a lat/lon at ``cell_deg`` resolution."""
    gy = F.floor((lat + 90.0) / cell_deg).cast("long")
    gx = F.floor((lon + 180.0) / cell_deg).cast("long")
    return gy * F.lit(100_000) + gx


def nearest_site_join(
    points: DataFrame,
    sites: DataFrame,
    max_km: float = 200.0,
    point_id: str = "point_id",
    site_id: str = "site_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float | None = None,
    rank_decimals: int | None = None,
) -> DataFrame:
    """Each point → its nearest site within ``max_km`` (points with no site
    in range drop out). Grid-blocked: sites register in their own cell,
    points explode into the 3×3 neighborhood, equi-join on the cell, exact
    haversine, per-point argmin window. ``cell_deg`` defaults to the search
    radius in degrees of latitude (the safe complete-cover choice; longitude
    shrinks toward the poles, which only makes covers larger).

    ``rank_decimals`` ranks and thresholds on the distance ROUNDED to that
    many decimals (ties then break by site_id): a last-ulp libm difference
    between engines can no longer flip the argmin, which is what makes the
    result oracle-comparable (6 ⇒ a site must be within 0.5 mm of another
    for the tie-break to engage)."""
    if cell_deg is None:
        cell_deg = max(max_km / 111.0, 0.1)
    s = sites.select(
        F.col(site_id).alias("site_id"),
        F.col(lat_col).alias("s_lat"),
        F.col(lon_col).alias("s_lon"),
    ).withColumn("_cell", grid_cell(F.col("s_lat"), F.col("s_lon"), cell_deg))
    gy = F.floor((F.col(lat_col) + 90.0) / cell_deg).cast("long")
    gx = F.floor((F.col(lon_col) + 180.0) / cell_deg).cast("long")
    neighborhood = F.array(
        *[
            (gy + dy) * F.lit(100_000) + (gx + dx)
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    p = points.select(
        F.col(point_id).alias("point_id"),
        F.col(lat_col).alias("p_lat"),
        F.col(lon_col).alias("p_lon"),
        F.explode(neighborhood).alias("_cell"),
    )
    cand = p.join(s, on="_cell").withColumn(
        "dist_km",
        haversine_km(F.col("p_lat"), F.col("p_lon"), F.col("s_lat"), F.col("s_lon")),
    )
    rank_col = (
        F.round(F.col("dist_km"), rank_decimals)
        if rank_decimals is not None
        else F.col("dist_km")
    )
    in_range = cand.filter(rank_col <= max_km)
    w = Window.partitionBy("point_id").orderBy(rank_col.asc(), F.asc("site_id"))
    return (
        in_range.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("point_id", "site_id", F.round("dist_km", 3).alias("dist_km"))
    )
