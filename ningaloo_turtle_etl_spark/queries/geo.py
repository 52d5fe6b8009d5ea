"""Geodesic queries (extensions): haversine distance stats oracle-checked
against DuckDB's trig (aggregates rounded to absorb libm ulps; raw per-row
trig is never compared), and the grid-blocked nearest-site join as a full
oracle row (brute-force SQL cross join since r03) with blocked≡brute
parity in tests/test_geo.py."""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.geo import haversine_km, nearest_site_join
from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table

# Reference point ~ Ningaloo reef.
REF_LAT, REF_LON = -22.7, 113.7

_HAV = (
    "2 * 6371.0088 * asin(sqrt("
    "pow(sin(radians({rlat} - lat) / 2), 2) + "
    "cos(radians(lat)) * cos(radians({rlat})) * "
    "pow(sin(radians({rlon} - lon) / 2), 2)))"
).format(rlat=REF_LAT, rlon=REF_LON)


def _pts(c):
    return c.select(
        "c_nationkey",
        (F.lit(-180) + (F.col("c_custkey") * 7) % 360 + 0.5).alias("lon"),
        (F.lit(-90) + (F.col("c_custkey") * 13) % 180 + 0.5).alias("lat"),
    )


@register(
    "geo_distance_stats",
    f"""
    WITH pts AS (
        SELECT c_nationkey,
               -180 + ((c_custkey * 7) % 360) + 0.5 AS lon,
               -90 + ((c_custkey * 13) % 180) + 0.5 AS lat
        FROM customer
    )
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG({_HAV}), 2) AS avg_km,
           ROUND(MAX({_HAV}), 2) AS max_km
    FROM pts GROUP BY 1
    """,
)
def geo_distance_stats(spark, sf_dir):
    """Great-circle distance from every (synthetic) customer point to the
    Ningaloo reference, aggregated per nation — geodesic trig as pure
    columns, compared cross-engine only through rounded aggregates."""
    pts = _pts(load_table(spark, "customer", sf_dir))
    d = haversine_km(F.col("lat"), F.col("lon"), F.lit(REF_LAT), F.lit(REF_LON))
    return pts.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(d), 2).alias("avg_km"),
        F.round(F.max(d), 2).alias("max_km"),
    )


_NS_HAV = (
    "2 * 6371.0088 * asin(sqrt("
    "sin(radians(s_lat - p_lat) / 2) * sin(radians(s_lat - p_lat) / 2)"
    " + cos(radians(p_lat)) * cos(radians(s_lat))"
    " * sin(radians(s_lon - p_lon) / 2) * sin(radians(s_lon - p_lon) / 2)))"
)


@register(
    "geo_nearest_site",
    f"""
    WITH pts AS (
        SELECT c_custkey AS point_id,
               -90 + ((c_custkey * 13) % 180) + 0.5 AS p_lat,
               -180 + ((c_custkey * 7) % 360) + 0.5 AS p_lon
        FROM customer WHERE c_custkey <= 500
    ),
    sites AS (
        SELECT n_nationkey AS site_id,
               CAST(-30 + (n_nationkey * 3) % 20 AS DOUBLE) AS s_lat,
               CAST(100 + (n_nationkey * 7) % 40 AS DOUBLE) AS s_lon
        FROM nation
    ),
    cand AS (
        SELECT point_id, site_id, {_NS_HAV} AS dist,
               ROUND({_NS_HAV}, 6) AS dist_r
        FROM pts, sites
    ),
    ranked AS (
        SELECT point_id, site_id, dist,
               ROW_NUMBER() OVER (PARTITION BY point_id
                                  ORDER BY dist_r, site_id) AS rn
        FROM cand WHERE dist_r <= 1500.0
    )
    SELECT point_id, site_id, ROUND(dist, 3) AS dist_km
    FROM ranked WHERE rn = 1
    """,
)
def geo_nearest_site(spark, sf_dir):
    """Grid-blocked nearest-site join: synthetic customer points to
    synthetic nation sites within 1500 km. Upgraded from rows-only to a
    full oracle (r03): ranking and the range threshold use the distance
    rounded to 6 dp (sub-mm), so a last-ulp sin/cos/asin difference between
    the JVM and DuckDB's libm cannot flip the argmin or the cut; the oracle
    is the brute-force cross join. The blocked join's parity with brute
    force stays pinned independently in tests/test_geo.py."""
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_custkey") <= 500)
    points = c.select(
        F.col("c_custkey").alias("point_id"),
        (F.lit(-90) + (F.col("c_custkey") * 13) % 180 + 0.5).alias("lat"),
        (F.lit(-180) + (F.col("c_custkey") * 7) % 360 + 0.5).alias("lon"),
    )
    n = load_table(spark, "nation", sf_dir)
    sites = n.select(
        F.col("n_nationkey").alias("site_id"),
        (F.lit(-30) + (F.col("n_nationkey") * 3) % 20).cast("double").alias("lat"),
        (F.lit(100) + (F.col("n_nationkey") * 7) % 40).cast("double").alias("lon"),
    )
    return nearest_site_join(
        points,
        sites,
        max_km=1500.0,
        point_id="point_id",
        site_id="site_id",
        rank_decimals=6,
    )


@register(
    "spatial_hotspot_clusters",
    """
    WITH RECURSIVE pts AS (
        SELECT -180 + ((c_custkey * 7) % 360) + 0.5 AS lon,
               -90 + ((c_custkey * 13) % 180) + 0.5 AS lat
        FROM customer
    ),
    cells AS (
        SELECT CAST(floor(lon / 10.0) AS BIGINT) AS ix,
               CAST(floor(lat / 10.0) AS BIGINT) AS iy,
               COUNT(*) AS n_pts, SUM(lat) AS sla, SUM(lon) AS slo,
               MIN(lat) AS mnla, MAX(lat) AS mxla,
               MIN(lon) AS mnlo, MAX(lon) AS mxlo
        FROM pts GROUP BY 1, 2
        HAVING COUNT(*) >= 5
    ),
    dense AS (SELECT (ix + 38) + (iy + 38) * 76 AS cell, * FROM cells),
    edges AS (
        SELECT d.cell AS a, n.cell AS b
        FROM dense d JOIN dense n
          ON n.cell IN (d.cell - 1, d.cell + 1, d.cell - 76, d.cell + 76,
                        d.cell - 77, d.cell - 75, d.cell + 75, d.cell + 77)
    ),
    reach AS (
        SELECT cell, cell AS lab FROM dense
        UNION
        SELECT e.a, r.lab FROM reach r JOIN edges e ON e.b = r.cell
    ),
    comp AS (SELECT cell, MIN(lab) AS component FROM reach GROUP BY 1)
    SELECT comp.component AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(n_pts) AS BIGINT) AS n_points,
           ROUND(SUM(sla) / SUM(n_pts), 6) AS centroid_lat,
           ROUND(SUM(slo) / SUM(n_pts), 6) AS centroid_lon,
           ROUND(MIN(mnla), 6) AS min_lat, ROUND(MAX(mxla), 6) AS max_lat,
           ROUND(MIN(mnlo), 6) AS min_lon, ROUND(MAX(mxlo), 6) AS max_lon
    FROM dense JOIN comp USING (cell) GROUP BY 1
    """,
)
def q_spatial_hotspot_clusters(spark, sf_dir):
    """Density-based sighting hotspots over the synthetic customer points
    (`operators/geo.py spatial_hotspots`): 10-degree grid cells holding
    >= 5 points, 8-connected blobs labeled by the pointer-jumping
    components — arbitrary-shape concentration areas, where tag_regions
    answers for FIXED polygons. The oracle replays the component labels
    through a recursive transitive-closure CTE."""
    from ningaloo_turtle_etl_spark.operators.geo import spatial_hotspots

    pts = _pts(load_table(spark, "customer", sf_dir))
    return spatial_hotspots(pts, "lat", "lon", cell_deg=10.0, min_pts=5)
