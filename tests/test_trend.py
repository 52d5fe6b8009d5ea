"""Unit tests for the trend/statistics operators: OLS against numpy,
CUSUM against a hand-built step series, percent_rank normalization, and
PMI hand values."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ningaloo_turtle_etl_spark.operators.text import pmi_cooccurrence
from ningaloo_turtle_etl_spark.operators.trend import (
    cusum_scan,
    group_trend,
    quantile_normalize,
)


def test_group_trend_matches_numpy(spark):
    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    ys = [1.0, 2.9, 5.2, 7.1, 8.8]
    rows = [("a", x, y) for x, y in zip(xs, ys)] + [("b", 0.0, 5.0), ("b", 1.0, 5.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in group_trend(df, "g", "x", "y").collect()}
    slope, intercept = np.polyfit(xs, ys, 1)
    r = np.corrcoef(xs, ys)[0, 1]
    assert got["a"]["slope"] == pytest.approx(slope, abs=1e-6)
    assert got["a"]["intercept"] == pytest.approx(intercept, abs=1e-6)
    assert got["a"]["r2"] == pytest.approx(r * r, abs=1e-6)
    # SQL-standard REGR_R2: var(y)=0 with var(x)!=0 → 1 (not null/0).
    assert got["b"]["slope"] == 0.0 and got["b"]["r2"] == 1.0


def test_cusum_finds_planted_step(spark):
    # mean shifts from 0 to 10 at step 10 → |CUSUM| peaks at the boundary.
    rows = [("s", i, 0.0 if i < 10 else 10.0) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, step long, v double")
    got = cusum_scan(df, "g", "step", "v").collect()[0]
    assert got["change_point"] == 9  # last step before the shift
    assert got["n_steps"] == 20
    # peak = sum of first 10 deviations = 10 * (0 - 5) = 50
    assert got["cusum_peak"] == pytest.approx(50.0)
    assert got["cusum_stat"] == pytest.approx(50.0 / (5.0 * math.sqrt(20)), abs=1e-6)


def test_quantile_normalize_bounds_and_ties(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 4.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = sorted(
        (r["g"], r["v"], r["pct_rank"]) for r in quantile_normalize(df, "g", "v").collect()
    )
    assert got[0] == ("a", 1.0, 0.0)
    assert got[1][2] == got[2][2] == pytest.approx(1 / 3, abs=1e-6)  # ties share rank
    assert got[3] == ("a", 4.0, 1.0)
    assert got[4] == ("b", 7.0, 0.0)  # singleton group pins to 0


def test_pmi_hand_values(spark):
    # 4 docs; 'x y' together in 2, each alone in 1 more → PMI = ln(2*4/(3*3)).
    df = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "x z"), (4, "y w")],
        "doc_id long, text string",
    )
    out = pmi_cooccurrence(df, min_pair_count=2, max_df_frac=1.0)
    got = {(r["tok_a"], r["tok_b"]): r for r in out.collect()}
    assert got[("x", "y")]["n_pair"] == 2
    assert got[("x", "y")]["pmi"] == pytest.approx(math.log(8 / 9), abs=1e-6)
    assert ("x", "z") not in got  # below min_pair_count


def test_pmi_presence_not_frequency(spark):
    # Repeating tokens inside one doc must not inflate the pair count.
    df = spark.createDataFrame(
        [(1, "x x x y y"), (2, "x y")], "doc_id long, text string"
    )
    out = pmi_cooccurrence(df, min_pair_count=1, max_df_frac=1.0).collect()
    assert [(r["tok_a"], r["tok_b"], r["n_pair"]) for r in out] == [("x", "y", 2)]
