"""Spatial operators — SURVEY.md §2.3 J7 (point-in-polygon join) + §4.2.

The reference tags each observation with its containing region via
``sp::over(points, polygons)`` in a sequential overwrite cascade with default
"WA" (turtle-tracks.Rmd:85-87,271-276; app.R:136-145).

Spark-first design:
- The polygon set is dimension-sized → shipped to executors in the UDF
  closure (a broadcast join in spirit; no shuffle of the point side).
- ONE vectorized Arrow-batched pandas UDF evaluates ALL regions per batch —
  one Python crossing per batch, not one per region, with a numpy
  ray-casting kernel and a bbox pre-mask so most points never reach the
  exact test (the reference's own sites table stores exactly these bbox
  cols, ningaloo-etl.Rmd:75-78).
- Cascade semantics: later regions overwrite earlier ones (R's sequential
  assignment), i.e. last match wins.

At 100 TB this is a map-only operation: no shuffle, no skew, scales linearly
with input splits.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf

from ningaloo_turtle_etl_spark.sources.geojson import Region


def _ray_cast(
    lon: np.ndarray, lat: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """Even-odd rule point-in-polygon, vectorized over points.

    Border behavior: points exactly on an edge fall on the half-open side —
    consistent with sp::over's edge handling being unspecified; FIXTURES.md
    plants border points to pin this down in tests."""
    inside = np.zeros(lon.shape, dtype=bool)
    j = len(xs) - 1
    for i in range(len(xs)):
        yi, yj, xi, xj = ys[i], ys[j], xs[i], xs[j]
        crosses = (yi > lat) != (yj > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_at = (xj - xi) * (lat - yi) / (yj - yi) + xi
        inside ^= crosses & (lon < x_at)
        j = i
    return inside


def region_tagger(
    regions: Sequence[Region], default: str = "WA"
) -> "callable":
    """Build a (lon, lat) → region-name pandas UDF over a fixed region set."""
    # Precompute numpy rings + bboxes once per executor (closure state).
    rings = [
        (
            r.name,
            np.asarray([p[0] for p in r.ring], dtype=np.float64),
            np.asarray([p[1] for p in r.ring], dtype=np.float64),
        )
        for r in regions
    ]

    @pandas_udf("string")
    def tag(lon: pd.Series, lat: pd.Series) -> pd.Series:
        lo = lon.to_numpy(dtype=np.float64, na_value=np.nan)
        la = lat.to_numpy(dtype=np.float64, na_value=np.nan)
        out = np.full(len(lo), default, dtype=object)
        valid = ~(np.isnan(lo) | np.isnan(la))
        # Sequential overwrite (reference semantics): later regions win.
        for name, xs, ys in rings:
            bbox = (
                valid
                & (lo >= xs.min()) & (lo <= xs.max())
                & (la >= ys.min()) & (la <= ys.max())
            )
            if not bbox.any():
                continue
            hit = np.zeros(len(lo), dtype=bool)
            hit[bbox] = _ray_cast(lo[bbox], la[bbox], xs, ys)
            out[hit] = name
        out[~valid] = None
        return pd.Series(out)

    return tag


def tag_regions(
    df: DataFrame,
    regions: Sequence[Region],
    lon_col: str = "longitude",
    lat_col: str = "latitude",
    tag_col: str = "location",
    default: str = "WA",
) -> DataFrame:
    """J7: the spatial join — add ``tag_col`` naming the containing region,
    default for no match, NULL for NULL coordinates."""
    tagger = region_tagger(regions, default)
    return df.withColumn(tag_col, tagger(F.col(lon_col), F.col(lat_col)))


def point_in_polygon(lon: Column, lat: Column, region: Region) -> Column:
    """Boolean membership column for a single polygon (exact test only)."""
    tagger = region_tagger([region], default="_out")
    return tagger(lon, lat) == region.name
