"""GeoJSON source/sink — SURVEY.md §2.1 S7/S11 and the U1 polygon builder.

The reference exports site rectangles as a GeoJSON FeatureCollection
(`writeOGR(polys.df, 'data/sites.geojson')`, ningaloo-etl.Rmd:141) and reads
region polygons from an inline GeoJSON string (`readOGR(geojson_string)`,
turtle-tracks.Rmd:261-270).

Geometry model: a polygon ring is ``array<struct<lon:double, lat:double>>``,
closed (first == last, ningaloo-etl.Rmd:114-116). Feature JSON is built with
column expressions (`to_json` over structs) so the serialization is
distributed; only the final FeatureCollection wrapper touches the driver, and
only in single-file mode (dimension-scale data by definition).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def bbox_ring(x_min: str, y_min: str, x_max: str, y_max: str) -> Column:
    """U1: `make_polygons` (ningaloo-etl.Rmd:118-129) — bbox corner columns to
    a closed 5-point ring, pure-column (no UDF): SW → NW → NE → SE → SW."""
    pt = lambda x, y: F.struct(F.col(x).alias("lon"), F.col(y).alias("lat"))  # noqa: E731
    return F.array(
        pt(x_min, y_min), pt(x_min, y_max), pt(x_max, y_max), pt(x_max, y_min),
        pt(x_min, y_min),
    )


def feature_json(ring: Column, properties: dict[str, Column]) -> Column:
    """One GeoJSON Feature per row as a JSON string column. Coordinates are
    [lon, lat] arrays per the spec."""
    coords = F.transform(ring, lambda p: F.array(p["lon"], p["lat"]))
    return F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("Polygon").alias("type"),
                F.array(coords).alias("coordinates"),
            ).alias("geometry"),
            F.struct(*[c.alias(n) for n, c in properties.items()]).alias("properties"),
        )
    )


def write_feature_collection(
    df: DataFrame, feature_col: str, path: str
) -> None:
    """S7 sink. Dimension-scale (the reference's sites table is 61 rows):
    collect feature strings, wrap in a FeatureCollection, write one file.
    Fact-scale geometry should use newline-delimited features
    (``df.write.text``) instead — a FeatureCollection is unsplittable."""
    features = [r[0] for r in df.select(feature_col).collect()]
    doc = '{"type": "FeatureCollection", "features": [' + ",".join(features) + "]}"
    with open(path, "w") as f:
        f.write(doc)


@dataclass
class Region:
    """A named polygon for spatial tagging (turtle-tracks.Rmd:261-276)."""

    name: str
    ring: list[tuple[float, float]]  # [(lon, lat), ...] closed or open


def parse_geojson_regions(geojson_str: str) -> list[Region]:
    """S11: inline-GeoJSON polygon reader. Driver-side parse (the polygon
    set is tiny and is broadcast to executors by the spatial tagger)."""
    doc = json.loads(geojson_str)
    feats = doc["features"] if doc.get("type") == "FeatureCollection" else [doc]
    regions: list[Region] = []
    for f in feats:
        geom = f["geometry"]
        if geom["type"] != "Polygon":
            raise ValueError(f"unsupported geometry type {geom['type']!r}")
        ring = [(float(x), float(y)) for x, y in geom["coordinates"][0]]
        name = str(f.get("properties", {}).get("name", f"region_{len(regions)}"))
        regions.append(Region(name=name, ring=ring))
    return regions
