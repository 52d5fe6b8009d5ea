"""Render-layer tests: well-formed SVG/HTML from collected serving-layer
aggregates (the ggplot/leaflet/DT analogs, U4/U5)."""

from __future__ import annotations

import datetime
import xml.etree.ElementTree as ET

import pytest

from ningaloo_turtle_etl_spark.plans.dashboard import TracksDashboard
from ningaloo_turtle_etl_spark.plans.render import (
    html_table,
    render_dashboard_html,
    svg_bar_chart,
    svg_line_chart,
    svg_map,
)

SVG_NS = "{http://www.w3.org/2000/svg}"


@pytest.fixture(scope="module")
def tracks(spark):
    rows = [
        ("t1", 113.1, -21.9, "green", "fresh", "nest", "Thevenard",
         datetime.date(2020, 1, 1), datetime.datetime(2020, 1, 1, 5)),
        ("t2", 113.2, -21.8, "green", "old", "falsecrawl", "Thevenard",
         datetime.date(2020, 1, 1), datetime.datetime(2020, 1, 1, 6)),
        ("t3", 115.8, -31.9, "flatback", "fresh", "nest", "Perth",
         datetime.date(2020, 1, 2), datetime.datetime(2020, 1, 2, 7)),
    ]
    return spark.createDataFrame(
        rows,
        "id string, longitude double, latitude double, species string,"
        " nest_age string, nest_type string, location string,"
        " observation_date date, observation_start_time timestamp",
    )


def test_bar_chart_one_rect_per_row():
    svg = svg_bar_chart(
        [{"k": "a", "n": 3}, {"k": "b", "n": 7}, {"k": "c", "n": 1}], "k", "n",
        title="tally",
    )
    root = ET.fromstring(svg)
    rects = root.findall(f"{SVG_NS}rect")
    assert len(rects) == 3
    # Taller value → taller bar.
    heights = [float(r.get("height")) for r in rects]
    assert heights[1] == max(heights)


def test_line_chart_one_polyline_per_series():
    rows = [
        {"d": "2020-01-01", "n": 2, "species": "green"},
        {"d": "2020-01-02", "n": 5, "species": "green"},
        {"d": "2020-01-01", "n": 1, "species": "flatback"},
    ]
    svg = svg_line_chart(rows, "d", "n", series="species")
    root = ET.fromstring(svg)
    assert len(root.findall(f"{SVG_NS}polyline")) == 2


def test_map_projects_markers_and_regions():
    from ningaloo_turtle_etl_spark.queries.spatial import REGIONS

    markers = [
        {"longitude": 0.0, "latitude": 0.0, "popup": "center"},
        {"longitude": 113.1, "latitude": -21.9, "popup": "ningaloo <tag>"},
    ]
    svg = svg_map(markers, regions=REGIONS)
    root = ET.fromstring(svg)
    circles = root.findall(f"{SVG_NS}circle")
    assert len(circles) == 2
    # (0,0) projects to the viewBox center.
    assert abs(float(circles[0].get("cx")) - 320) < 1
    assert abs(float(circles[0].get("cy")) - 180) < 1
    assert len(root.findall(f"{SVG_NS}rect")) == len(REGIONS)
    assert "&lt;tag&gt;" in svg  # popups are escaped


def test_html_table_escapes_and_caps():
    rows = [{"a": "<x>", "b": i} for i in range(5)]
    out = html_table(rows, max_rows=3)
    assert out.count("<tr>") == 4  # header + 3 rows
    assert "&lt;x&gt;" in out and "<x>" not in out.replace("&lt;x&gt;", "")


def test_render_dashboard_html_composes(spark, tracks):
    from ningaloo_turtle_etl_spark.queries.spatial import REGIONS

    d = TracksDashboard(tracks).with_filters(species="green")
    page = render_dashboard_html(d, regions=REGIONS)
    assert page.startswith("<!doctype html>")
    assert "2 observations" in page
    assert page.count("<svg") == 2 and "<table>" in page
