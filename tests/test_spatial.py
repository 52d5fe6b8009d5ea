"""Spatial operator tests — J7 ray-casting vs a scalar reference
implementation, cascade semantics, GeoJSON round-trip (S7/S11), U1."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.spatial import tag_regions, tag_regions_expr
from ningaloo_turtle_etl_spark.sources.geojson import (
    Region,
    bbox_ring,
    feature_json,
    parse_geojson_regions,
    write_feature_collection,
)

TRIANGLE = Region("tri", [(0.0, 0.0), (10.0, 0.0), (5.0, 10.0), (0.0, 0.0)])
# Concave "U" shape: the notch (4..6, 2..10) is OUTSIDE.
CONCAVE = Region(
    "ushape",
    [(0, 0), (10, 0), (10, 10), (6, 10), (6, 2), (4, 2), (4, 10), (0, 10), (0, 0)],
)


def _scalar_ray_cast(lon, lat, ring):
    # Independent reference implementation (classic even-odd crossing count).
    inside = False
    j = len(ring) - 1
    for i in range(len(ring)):
        xi, yi = ring[i]
        xj, yj = ring[j]
        if (yi > lat) != (yj > lat) and lon < (xj - xi) * (lat - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside


def test_ray_cast_matches_scalar_reference(spark):
    pts = [
        (i, x + 0.25, y + 0.25)
        for i, (x, y) in enumerate(
            (x, y) for x in range(-2, 13) for y in range(-2, 13)
        )
    ]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    for region in (TRIANGLE, CONCAVE):
        tagged = tag_regions(
            df, [region], lon_col="lon", lat_col="lat", default="out"
        ).collect()
        for r in tagged:
            expect = _scalar_ray_cast(r["lon"], r["lat"], region.ring)
            got = r["location"] == region.name
            assert got == expect, (r["lon"], r["lat"], region.name)


def test_cascade_last_region_wins(spark):
    a = Region("a", [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
    b = Region("b", [(5, 5), (15, 5), (15, 15), (5, 15), (5, 5)])
    df = spark.createDataFrame(
        [(2.0, 2.0), (7.0, 7.0), (12.0, 12.0), (20.0, 20.0), (None, 3.0)],
        "lon double, lat double",
    )
    got = [
        r["location"]
        for r in tag_regions(df, [a, b], lon_col="lon", lat_col="lat").collect()
    ]
    # overlap (7,7) → b (later region overwrites), like the reference's
    # sequential over() assignments; null coords stay null.
    assert got == ["a", "b", "b", "WA", None]


def test_catalyst_tagger_matches_pandas_udf(spark):
    """tag_regions_expr (pure Catalyst fold) must agree with the pandas-UDF
    tagger point-for-point — grid sweep over convex + concave polygons with
    an overlap cascade, edge-adjacent points, nulls, and the default."""
    regions = [
        TRIANGLE,
        CONCAVE,
        Region("box", [(4.0, 4.0), (12.0, 4.0), (12.0, 12.0), (4.0, 12.0), (4.0, 4.0)]),
    ]
    pts = [
        (i, x / 2 + 0.25, y / 2 + 0.25)
        for i, (x, y) in enumerate((x, y) for x in range(-6, 27) for y in range(-6, 27))
    ]
    pts += [(9000, None, 3.0), (9001, 3.0, None), (9002, None, None)]
    # Points exactly on vertices/edges — both implementations must take the
    # same half-open side.
    pts += [(9100, 0.0, 0.0), (9101, 5.0, 10.0), (9102, 4.0, 2.0), (9103, 10.0, 5.0)]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    udf_out = {
        r["id"]: r["location"]
        for r in tag_regions(df, regions, lon_col="lon", lat_col="lat").collect()
    }
    expr_out = {
        r["id"]: r["location"]
        for r in tag_regions_expr(df, regions, lon_col="lon", lat_col="lat").collect()
    }
    assert udf_out == expr_out
    # And the plan is UDF-free: no ArrowEvalPython / BatchEvalPython node.
    plan = tag_regions_expr(df, regions, lon_col="lon", lat_col="lat")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_geojson_feature_collection_roundtrip(spark, tmp_path):
    sites = spark.createDataFrame(
        [(1, "North", 113.0, -22.0, 113.5, -21.5), (2, "South", 114.0, -23.0, 114.2, -22.8)],
        "id long, name string, x_min double, y_min double, x_max double, y_max double",
    )
    feat = sites.withColumn(
        "feature",
        feature_json(
            bbox_ring("x_min", "y_min", "x_max", "y_max"),
            {"id": F.col("id"), "name": F.col("name")},
        ),
    )
    out = str(tmp_path / "sites.geojson")
    write_feature_collection(feat, "feature", out)

    doc = json.load(open(out))
    assert doc["type"] == "FeatureCollection" and len(doc["features"]) == 2
    f0 = doc["features"][0]
    assert f0["geometry"]["type"] == "Polygon"
    ring = f0["geometry"]["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]  # closed, ningaloo-etl.Rmd:114-116

    # S11: read the written document back into Regions and tag with them.
    regions = parse_geojson_regions(open(out).read())
    assert [r.name for r in regions] == ["North", "South"]
    pts = spark.createDataFrame([(113.25, -21.75)], "lon double, lat double")
    tag = tag_regions(pts, regions, lon_col="lon", lat_col="lat").collect()[0]
    assert tag["location"] == "North"
