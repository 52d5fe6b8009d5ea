"""Grouped series statistics: OLS trend lines, CUSUM change-point scans,
and rank-based score normalization — the monitoring/QA layer that turns the
engine's tallies into decisions (is quality drifting? did a source change
behavior on some day? are scores comparable across sources?).

All pure Catalyst: trends use the SQL-standard ``regr_*`` aggregates
(JVM codegen, identical definitions in DuckDB — full oracle rows), CUSUM is
one cumulative window over an already-aggregated series, normalization is
one percent_rank window per group.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def group_trend(
    df: DataFrame,
    group_cols: str | Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group OLS line y = slope*x + intercept with fit quality: one
    hash aggregate emitting (n, slope, intercept, r2) per group via the
    SQL-standard regr_* aggregates — map-side partial, single shuffle,
    no per-group numpy. Groups where x never varies return null slope
    (regr_* semantics in both engines)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    y = F.col(y_col).cast("double")
    x = F.col(x_col).cast("double")
    return df.groupBy(*groups).agg(
        F.regr_count(y, x).alias("n_points"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


def cusum_scan(
    series: DataFrame,
    group_cols: str | Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """CUSUM change-point scan per group over an ORDERED series (one row
    per (group, step) — aggregate raw data to that grain first): cumulative
    sum of deviations from the group mean, reporting the step where
    |CUSUM| peaks and the normalized peak height
    ``peak / (sd * sqrt(n))`` (>~1.36 rejects 'no change' at 5% by the
    Kolmogorov-Smirnov critical value — the standard CUSUM calibration).

    Scale shape: group mean/sd is one agg; the running sum is one window
    over the aggregated series (series length per group, not raw rows);
    the argmax election is the same WindowGroupLimit rank the samplers
    use. Nothing touches raw events after the first aggregate."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    stats = series.groupBy(*groups).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_pop(value_col).alias("_sd"),
        F.count(F.lit(1)).alias("n_steps"),
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        series.join(stats, on=groups)
        .withColumn("_cusum", F.sum(F.col(value_col) - F.col("_mu")).over(w))
    )
    pick = Window.partitionBy(*groups).orderBy(
        F.desc(F.abs(F.col("_cusum"))), F.asc(order_col)
    )
    return (
        cum.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
        .select(
            *groups,
            F.col(order_col).alias("change_point"),
            "n_steps",
            F.round(F.abs(F.col("_cusum")), 6).alias("cusum_peak"),
            F.round(
                F.abs(F.col("_cusum"))
                / (F.col("_sd") * F.sqrt(F.col("n_steps").cast("double"))),
                6,
            ).alias("cusum_stat"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    group_cols: str | Sequence[str],
    value_col: str,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Rank-based score normalization within each group: percent_rank of
    ``value_col`` (0 = group min, 1 = group max), making scores comparable
    across groups with different scales — the standard cross-source
    calibration before a global quality threshold. One window per group;
    at 100 TB partition the window by the group (sources are few and large,
    so per-group sort is the cost — acceptable for score columns; for
    full-corpus normalization prefer the binned-quantile sketch in
    operators/sketches.py)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    w = Window.partitionBy(*groups).orderBy(value_col)
    return df.withColumn(out_col, F.round(F.percent_rank().over(w), 6))
