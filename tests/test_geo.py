"""Geodesic operator tests: haversine reference values, grid-blocked
nearest-site correctness vs brute force, and the hash-join plan guarantee."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.geo import (
    haversine_km,
    nearest_site_join,
)


def _py_haversine(lat1, lon1, lat2, lon2):
    r = 6371.0088
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1) / 2, math.radians(lon2 - lon1) / 2
    a = math.sin(dp) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
    return 2 * r * math.asin(math.sqrt(a))


def test_haversine_reference_values(spark):
    # Exmouth → Perth ≈ 1103 km; antipodal-ish and zero-distance checks.
    rows = spark.createDataFrame(
        [(-21.93, 114.12, -31.95, 115.86), (0.0, 0.0, 0.0, 0.0)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    ).select(haversine_km("lat1", "lon1", "lat2", "lon2").alias("d")).collect()
    assert abs(rows[0]["d"] - _py_haversine(-21.93, 114.12, -31.95, 115.86)) < 1e-9
    assert 1050 < rows[0]["d"] < 1150
    assert rows[1]["d"] == 0.0


def test_nearest_site_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    pts = [(i, -28 + rng.random() * 10, 110 + rng.random() * 10) for i in range(200)]
    sites = [(j, -28 + rng.random() * 10, 110 + rng.random() * 10) for j in range(15)]
    points = spark.createDataFrame(pts, "point_id long, lat double, lon double")
    site_df = spark.createDataFrame(sites, "site_id long, lat double, lon double")

    got = {
        r["point_id"]: (r["site_id"], r["dist_km"])
        for r in nearest_site_join(points, site_df, max_km=300.0).collect()
    }
    for pid, plat, plon in pts:
        dists = sorted(
            (_py_haversine(plat, plon, slat, slon), sid) for sid, slat, slon in sites
        )
        best_d, best_s = dists[0]
        if best_d <= 300.0:
            assert got[pid][0] == best_s, pid
            assert abs(got[pid][1] - best_d) < 1e-3
        else:
            assert pid not in got


def test_nearest_site_is_hash_join(spark):
    points = spark.range(100).select(
        F.col("id").alias("point_id"),
        (F.col("id") % 10 - 25.0).alias("lat"),
        (F.col("id") % 7 + 110.0).alias("lon"),
    )
    sites = spark.range(5).select(
        F.col("id").alias("site_id"),
        (F.col("id") - 23.0).alias("lat"),
        (F.col("id") + 112.0).alias("lon"),
    )
    plan = (
        nearest_site_join(points, sites)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan