"""Dashboard serving-layer tests over a FIXTURES.md-shaped tracks frame."""

from __future__ import annotations

import datetime

import pytest

from ningaloo_turtle_etl_spark.plans.dashboard import TracksDashboard


@pytest.fixture(scope="module")
def tracks(spark):
    rows = [
        ("t1", 113.1, -21.9, "green", "fresh", "nest", "Thevenard",
         datetime.date(2020, 1, 1), datetime.datetime(2020, 1, 1, 5)),
        ("t2", 113.2, -21.8, "green", "old", "falsecrawl", "Thevenard",
         datetime.date(2020, 1, 1), datetime.datetime(2020, 1, 1, 6)),
        ("t3", 115.8, -31.9, "flatback", "fresh", "nest", "Perth",
         datetime.date(2020, 1, 2), datetime.datetime(2020, 1, 2, 7)),
        ("t4", 114.0, -24.0, "green", "fresh", "successfulcrawl", "WA",
         datetime.date(2020, 1, 2), datetime.datetime(2020, 1, 2, 8)),
    ]
    return spark.createDataFrame(
        rows,
        "id string, longitude double, latitude double, species string,"
        " nest_age string, nest_type string, location string,"
        " observation_date date, observation_start_time timestamp",
    )


def test_filters_compose_and_all_clears(spark, tracks):
    d = TracksDashboard(tracks).with_filters(location="Thevenard", nest_age="fresh")
    assert d.filtered().count() == 1
    # 'All' clears one dimension, keeps the other (app.R filter semantics).
    d2 = d.with_filters(nest_age="All")
    assert d2.filtered().count() == 2
    assert d2.filters == {"location": "Thevenard"}


def test_three_consumers_share_filter_state(spark, tracks):
    d = TracksDashboard(tracks).with_filters(species="green")
    markers = d.map_markers().collect()
    assert {r["id"] for r in markers} == {"t1", "t2", "t4"}
    assert all("green" in r["popup"] for r in markers)

    tally = {
        (r["location"], r["nest_type"]): r["n"] for r in d.tally_table().collect()
    }
    assert tally[("Thevenard", "nest")] == 1

    series = d.daily_series().collect()
    assert [r["observation_date"].day for r in series] == sorted(
        r["observation_date"].day for r in series
    )

    status = d.latest_observation().collect()[0]
    assert status["n_obs"] == 3
    assert status["latest"].hour == 8


def test_unknown_filter_keys_ignored(spark, tracks):
    d = TracksDashboard(tracks).with_filters(bogus="x", location="Perth")
    assert d.filters == {"location": "Perth"}
    assert d.filtered().count() == 1
