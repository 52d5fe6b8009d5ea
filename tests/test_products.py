"""Product-pipeline tests over FIXTURES.md-shaped frames with the planted
edge cases: duplicate subsection names across divisions (J2), Red Bluff patch
(P10), boolean 2s (F12), orphan survey_ids (J5), NA species (F11)."""

from __future__ import annotations

import pytest

from ningaloo_turtle_etl_spark.plans.products import (
    build_crawls,
    build_sites,
    build_summary_nests,
    build_surveys,
    build_survey_completeness,
)


@pytest.fixture(scope="module")
def fixtures(spark):
    sites = spark.createDataFrame(
        [
            (1, "Ningaloo", "North", "Red Bluff", -23.0, 113.0, -22.9, -23.1, 113.0, 112.9),
            # Same subsection name in TWO divisions — the ids 64/68 trap
            # (ningaloo-etl.Rmd:153-154): single-column join would be wrong.
            (64, "Ningaloo", "Mid", "Janes Bay", -23.5, 113.5, -23.4, -23.6, 113.6, 113.4),
            (68, "Cape Range", "South", "Janes Bay", -24.0, 114.0, -23.9, -24.1, 114.1, 113.9),
        ],
        "id long, division string, section string, subsection string, lat double,"
        " lon double, y_max double, y_min double, x_max double, x_min double",
    )
    area = spark.createDataFrame(
        [
            (100, 1, "7/15/2020 6:30:00", "Ningaloo", "North", "Red Bluff", 1),
            (101, 1, "8/20/2020 6:00:00", "Ningaloo", "Mid", "Janes Bay", 2),
            (102, 2, "8/21/2020 7:00:00", "Cape Range", "South", "Janes Bay", 1),
        ],
        "survey_id long, date_id long, date_raw string, division string,"
        " section string, subsection string, site_disturbed int",
    )
    env = spark.createDataFrame(
        [(1, 12.5, 24.0), (2, 8.0, 22.5)],
        "date_id long, wind_speed double, air_temp double",
    )
    species = spark.createDataFrame(
        [(1, "Green"), (2, "Loggerhead")], "species_id long, species_name string"
    )
    crawls = spark.createDataFrame(
        [(1, 100, 1, 3), (2, 101, None, 2), (3, 999, 1, 1)],  # 999 = orphan
        "crawl_id long, survey_id long, species_id long, no_false_crawls int",
    )
    return {"sites": sites, "area": area, "env": env, "species": species, "crawls": crawls}


def test_build_sites_red_bluff_patch(spark, fixtures):
    sites = build_sites(fixtures["sites"])
    got = {r["subsection"]: r["x_max"] for r in sites.collect()}
    assert got["Red Bluff"] == 113.458  # patched (ningaloo-etl.Rmd:83-84)
    assert got["Janes Bay"] in (113.6, 114.1)  # untouched


def test_build_surveys_composite_key_and_recode(spark, fixtures):
    surveys = build_surveys(fixtures["area"], fixtures["env"], build_sites(fixtures["sites"]))
    rows = {r["survey_id"]: r for r in surveys.collect()}
    # Composite key: each Janes Bay survey resolves to ITS division's site.
    assert rows[101]["id"] == 64 and rows[102]["id"] == 68
    # Season watershed: July 15 → season 2019, Aug 20 → 2020.
    assert rows[100]["season"] == 2019 and rows[101]["season"] == 2020
    # Boolean recode 2→0, 1 untouched.
    assert rows[101]["site_disturbed"] == 0 and rows[100]["site_disturbed"] == 1
    # Multi-format parse succeeded (mdyHMS).
    assert rows[100]["date"].month == 7 and rows[100]["date"].hour == 6
    # Environment joined.
    assert rows[102]["air_temp"] == 22.5


def test_build_crawls_na_species_and_orphans(spark, fixtures):
    surveys = build_surveys(fixtures["area"], fixtures["env"], build_sites(fixtures["sites"]))
    crawls = build_crawls(fixtures["crawls"], fixtures["species"], surveys)
    rows = {r["crawl_id"]: r for r in crawls.collect()}
    assert rows[2]["species_name"] == "NA"  # failed lookup → 'NA' (F11)
    assert rows[3]["date"] is None  # orphan keeps row (left join), null survey fields
    assert rows[1]["species_name"] == "Green"


def test_build_summary_nests_pivot_shape(spark, fixtures):
    nests = spark.createDataFrame(
        [
            (1, 100, "New", "Green"),
            (2, 100, "New", "Green"),
            (3, 100, "Old", "Green"),  # filtered out
            (4, 101, "New", "Loggerhead"),
        ],
        "nest_id long, survey_id long, nest_type string, species_name string",
    )
    surveys = build_surveys(fixtures["area"], fixtures["env"], build_sites(fixtures["sites"]))
    nests_joined = nests.join(
        surveys.select("survey_id", "date", "subsection"), "survey_id"
    )
    summary = build_summary_nests(nests_joined, surveys)
    rows = {r["subsection"]: r for r in summary.collect()}
    assert rows["Red Bluff"]["Green"] == 2  # Old excluded
    assert rows["Red Bluff"]["Loggerhead"] == 0  # fill=0
    assert rows["Janes Bay"]["Loggerhead"] == 1
    assert "Hawksbill" in summary.columns  # full closed species list


def test_survey_completeness_flag(spark, fixtures):
    surveys = build_surveys(fixtures["area"], fixtures["env"], build_sites(fixtures["sites"]))
    expected = spark.createDataFrame(
        [("North", 2), ("Mid", 1), ("South", 1)], "section string, n_expected int"
    )
    comp = build_survey_completeness(surveys, expected)
    got = {(r["section"], r["season"]): r["complete"] for r in comp.collect()}
    assert got[("North", 2019)] is False  # 1 surveyed < 2 expected
    assert got[("Mid", 2020)] is True
