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


def test_nearest_site_covers_high_latitude(spark):
    # Regression (ADVICE r03): a fixed-km radius spans MORE longitude
    # degrees at higher latitude, so the old square cell (radius/111°) with
    # a ±1 neighborhood missed in-range sites 2 longitude cells away. At
    # lat -45 a site 18° east is ~1414 km away (< 1500 km radius) but lands
    # 2 cells apart under the old scheme — it must be found.
    points = spark.createDataFrame(
        [(1, -45.0, 118.0)], "point_id long, lat double, lon double"
    )
    sites = spark.createDataFrame(
        [(10, -45.0, 100.0)], "site_id long, lat double, lon double"
    )
    got = nearest_site_join(points, sites, max_km=1500.0).collect()
    assert len(got) == 1 and got[0]["site_id"] == 10
    expect = _py_haversine(-45.0, 118.0, -45.0, 100.0)
    assert expect < 1500.0  # the pair really is in range
    assert abs(got[0]["dist_km"] - expect) < 1e-3


def test_nearest_site_brute_force_parity_high_latitude(spark):
    # Randomized cover check in a band where cos(lat) ≈ 0.4 — every
    # brute-force nearest neighbor within the radius must be reproduced.
    import random

    rng = random.Random(11)
    pts = [(i, -70 + rng.random() * 8, -30 + rng.random() * 60) for i in range(300)]
    sts = [(j, -70 + rng.random() * 8, -30 + rng.random() * 60) for j in range(12)]
    points = spark.createDataFrame(pts, "point_id long, lat double, lon double")
    site_df = spark.createDataFrame(sts, "site_id long, lat double, lon double")
    got = {
        r["point_id"]: (r["site_id"], r["dist_km"])
        for r in nearest_site_join(points, site_df, max_km=800.0).collect()
    }
    for pid, plat, plon in pts:
        dists = sorted(
            (_py_haversine(plat, plon, slat, slon), sid) for sid, slat, slon in sts
        )
        best_d, best_s = dists[0]
        if best_d <= 800.0:
            assert got[pid][0] == best_s, pid
        else:
            assert pid not in got


def test_nearest_site_covers_antimeridian(spark):
    # Longitude cells wrap mod 360: a pair straddling ±180 is in range.
    points = spark.createDataFrame(
        [(1, -40.0, 179.5)], "point_id long, lat double, lon double"
    )
    sites = spark.createDataFrame(
        [(7, -40.0, -179.5)], "site_id long, lat double, lon double"
    )
    got = nearest_site_join(points, sites, max_km=300.0).collect()
    assert len(got) == 1 and got[0]["site_id"] == 7
    assert got[0]["dist_km"] < 100.0


def test_nearest_site_sides_share_one_snapped_grid(spark):
    # Regression (r04 review): grid_cell re-snapped the already-snapped
    # longitude width for the sites side, and floor(360/(360/nx)) floats to
    # nx-1 for thousands of nx values — sites and points then lived on
    # grids of different cell counts and an in-range site vanished. This
    # (radius, lon) pair reproduced the drop before the fix.
    points = spark.createDataFrame(
        [(1, 0.0, -141.36)], "point_id long, lat double, lon double"
    )
    sites = spark.createDataFrame(
        [(10, 0.0, -141.48221798191318)], "site_id long, lat double, lon double"
    )
    got = nearest_site_join(points, sites, max_km=15.1).collect()
    assert len(got) == 1 and got[0]["site_id"] == 10
    assert got[0]["dist_km"] < 15.1


def test_snap_lon_grid_is_idempotent():
    from ningaloo_turtle_etl_spark.operators.geo import _snap_lon_grid

    for raw in (0.136, 0.77, 1.5, 2.13, 3.6715707413069865, 13.5, 90.0):
        nx1, w1 = _snap_lon_grid(raw)
        nx2, w2 = _snap_lon_grid(w1)
        assert (nx1, w1) == (nx2, w2), raw


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

def test_spatial_hotspots_merge_and_isolate(spark):
    from ningaloo_turtle_etl_spark.operators.geo import spatial_hotspots

    rows = (
        # three points in cell (0,0), three in the DIAGONAL cell (1,1)
        [(0.2, 0.2), (0.3, 0.3), (0.4, 0.4)]
        + [(1.2, 1.2), (1.3, 1.3), (1.4, 1.4)]
        # isolated dense cell far away
        + [(5.5, 5.5), (5.6, 5.6), (5.7, 5.7)]
        # sparse cell: below min_pts, dropped entirely
        + [(-3.5, -3.5), (-3.6, -3.6)]
    )
    df = spark.createDataFrame(rows, "lat double, lon double")
    out = spatial_hotspots(df, "lat", "lon", cell_deg=1.0, min_pts=3)
    got = sorted(out.collect(), key=lambda r: -r["n_points"])
    assert len(got) == 2
    merged, iso = got
    # 8-neighborhood merges the diagonal pair into one 2-cell hotspot
    assert merged["n_cells"] == 2 and merged["n_points"] == 6
    assert merged["centroid_lat"] == round(sum(
        la for la, lo in rows[:6]) / 6, 6)
    assert merged["min_lat"] == 0.2 and merged["max_lat"] == 1.4
    # the far cell has no dense neighbor: keeps its own label
    assert iso["n_cells"] == 1 and iso["n_points"] == 3
    assert iso["min_lon"] == 5.5 and iso["max_lon"] == 5.7
