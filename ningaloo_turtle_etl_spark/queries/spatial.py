"""Spatial-join query — SURVEY.md J7, oracle-checked.

Coordinates are synthesized deterministically from customer keys (the
testdata has no geo columns); regions are axis-aligned rectangles so the
DuckDB oracle can state membership as range predicates while the Spark side
runs the REAL ray-casting pandas-UDF tagger. The +0.5 offset keeps every
point off polygon edges (edge behavior is half-open and not part of the
contract)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.spatial import tag_regions
from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.geojson import Region


def _rect(name, x0, y0, x1, y1):
    return Region(name, [(x0, y0), (x0, y1), (x1, y1), (x1, y0), (x0, y0)])


# Listed in reference cascade order: later regions overwrite earlier ones
# (turtle-tracks.Rmd:271-276). Thevenard/Montebello overlap on purpose.
REGIONS = [
    _rect("Thevenard", 100.0, -30.0, 130.0, 0.0),
    _rect("Montebello", 110.0, -25.0, 140.0, 10.0),
    _rect("Perth", -60.0, 20.0, -20.0, 60.0),
]


@register(
    "spatial_tag_regions",
    """
    WITH pts AS (
        SELECT c_custkey,
               -180 + ((c_custkey * 7) % 360) + 0.5 AS lon,
               -90 + ((c_custkey * 13) % 180) + 0.5 AS lat
        FROM customer
    )
    SELECT location, COUNT(*) AS n FROM (
        SELECT CASE
                 WHEN lon > -60  AND lon < -20 AND lat > 20  AND lat < 60 THEN 'Perth'
                 WHEN lon > 110  AND lon < 140 AND lat > -25 AND lat < 10 THEN 'Montebello'
                 WHEN lon > 100  AND lon < 130 AND lat > -30 AND lat < 0  THEN 'Thevenard'
                 ELSE 'WA'
               END AS location
        FROM pts
    ) GROUP BY location
    """,
)
def spatial_tag_regions(spark, sf_dir):
    """J7: point-in-polygon region tagging with default 'WA' and last-wins
    cascade, aggregated to a per-region tally (the turtle-tracks.Rmd:93-103
    shape)."""
    from ningaloo_turtle_etl_spark.sources.tables import load_table

    c = load_table(spark, "customer", sf_dir)
    pts = c.select(
        "c_custkey",
        (F.lit(-180) + (F.col("c_custkey") * 7) % 360 + 0.5).alias("lon"),
        (F.lit(-90) + (F.col("c_custkey") * 13) % 180 + 0.5).alias("lat"),
    )
    tagged = tag_regions(pts, REGIONS, lon_col="lon", lat_col="lat")
    return tagged.groupBy("location").agg(F.count(F.lit(1)).alias("n"))


@register(
    "spatial_tag_regions_expr",
    """
    WITH pts AS (
        SELECT c_custkey,
               -180 + ((c_custkey * 7) % 360) + 0.5 AS lon,
               -90 + ((c_custkey * 13) % 180) + 0.5 AS lat
        FROM customer
    )
    SELECT location, COUNT(*) AS n FROM (
        SELECT CASE
                 WHEN lon > -60  AND lon < -20 AND lat > 20  AND lat < 60 THEN 'Perth'
                 WHEN lon > 110  AND lon < 140 AND lat > -25 AND lat < 10 THEN 'Montebello'
                 WHEN lon > 100  AND lon < 130 AND lat > -30 AND lat < 0  THEN 'Thevenard'
                 ELSE 'WA'
               END AS location
        FROM pts
    ) GROUP BY location
    """,
)
def spatial_tag_regions_expr(spark, sf_dir):
    """J7, zero-Python variant: the same tagging via the pure-Catalyst
    ray-cast fold (tag_regions_expr) — one codegen'd expression, no worker
    pool. Same oracle as spatial_tag_regions; equivalence with the UDF
    tagger is pinned point-for-point in tests/test_spatial.py."""
    from ningaloo_turtle_etl_spark.operators.spatial import tag_regions_expr
    from ningaloo_turtle_etl_spark.sources.tables import load_table

    c = load_table(spark, "customer", sf_dir)
    pts = c.select(
        "c_custkey",
        (F.lit(-180) + (F.col("c_custkey") * 7) % 360 + 0.5).alias("lon"),
        (F.lit(-90) + (F.col("c_custkey") * 13) % 180 + 0.5).alias("lat"),
    )
    tagged = tag_regions_expr(pts, REGIONS, lon_col="lon", lat_col="lat")
    return tagged.groupBy("location").agg(F.count(F.lit(1)).alias("n"))
