"""Sketch-operator tests: error bounds vs exact answers on real testdata —
the guarantee that lets the approximations replace exact shuffles at scale."""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    distinct_vs_approx_report,
    heavy_hitters,
)
from ningaloo_turtle_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_approx_distinct_within_rsd_bound(spark):
    ev = load_table(spark, "events", SF_DIR)
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx = approx_distinct(ev, "user_id", rsd=0.02).collect()[0][0]
    assert abs(approx - exact) / exact < 3 * 0.02  # 3 sigma of the HLL rsd


def test_approx_distinct_grouped_report(spark):
    ev = load_table(spark, "events", SF_DIR)
    rows = distinct_vs_approx_report(ev, "user_id", by=["event_type"], rsd=0.02).collect()
    assert len(rows) > 0
    assert all(r["rel_error"] < 0.06 for r in rows)


def test_approx_quantiles_rank_error(spark):
    li = load_table(spark, "lineitem", SF_DIR)
    qs = approx_quantiles(
        li, "l_extendedprice", probabilities=(0.5,), accuracy=10_000
    ).collect()[0][0]
    # Compare against the exact median by rank position.
    n = li.count()
    below = li.filter(F.col("l_extendedprice") <= qs[0]).count()
    assert abs(below / n - 0.5) < 0.01  # rank error ≤ 1/accuracy + slack


def test_heavy_hitters_no_false_negatives(spark):
    docs = load_table(spark, "documents", SF_DIR)
    n = docs.count()
    truly_frequent = {
        r["lang"]
        for r in docs.groupBy("lang").count().filter(F.col("count") > 0.2 * n).collect()
    }
    got = set(heavy_hitters(docs, ["lang"], support=0.2).collect()[0][0])
    assert truly_frequent <= got  # KPS may over-report, never under
