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


def robust_outlier_stats(
    df: DataFrame,
    group_cols: str | Sequence[str],
    value_col: str,
    k: float = 3.5,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group robust outlier profile via the median/MAD modified
    z-score (Iglewicz-Hoaglin): ``0.6745 * |x - median| / MAD > k`` flags a
    row. Unlike mean/stddev rules the thresholds themselves are immune to
    the outliers being hunted — the standard first-pass anomaly screen on a
    metric column.

    Returns one row per group: n_rows, median, mad, n_outliers,
    outlier_rate, max_mz.

    Scale shape: two percentile aggregates (median, then MAD over
    deviations) + one map-side join-back against the tiny per-group stats
    dim — no window over raw rows. ``exact=True`` uses the exact
    interpolated percentile (buffers each group's column — fine to ~10M
    rows/group, and required for cross-engine oracle parity);
    ``exact=False`` switches both passes to approx_percentile(accuracy)
    for the 100 TB path, where groups are corpus-sized. The median is
    rounded to 6 dp BEFORE deviations are formed and the modified z is
    rounded to 6 dp before the threshold test, so both engines classify
    identical inputs. Groups with MAD = 0 (over half the mass on one
    value) drop out rather than dividing by zero."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    v = F.col(value_col).cast("double")

    def _p50(c):
        if exact:
            return F.expr(f"percentile({c}, 0.5)")
        return F.expr(f"approx_percentile({c}, 0.5, {int(accuracy)})")

    med = df.groupBy(*groups).agg(F.round(_p50(value_col), 6).alias("_med"))
    dev = df.join(F.broadcast(med), on=groups).withColumn(
        "_adev", F.abs(v - F.col("_med"))
    )
    mad = dev.groupBy(*groups).agg(
        F.round(_p50("_adev"), 6).alias("_mad"),
        F.min("_med").alias("_med2"),
    )
    z = dev.drop("_med").join(F.broadcast(mad), on=groups).withColumn(
        "_mz", F.round(F.lit(0.6745) * F.col("_adev") / F.col("_mad"), 6)
    )
    return (
        z.filter(F.col("_mad") > 0)
        .groupBy(*groups)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_med2").alias("median"),
            F.min("_mad").alias("mad"),
            F.sum(F.when(F.col("_mz") > k, 1).otherwise(0)).alias("n_outliers"),
            F.round(
                F.sum(F.when(F.col("_mz") > k, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("outlier_rate"),
            F.max("_mz").alias("max_mz"),
        )
    )


def welch_ttest_pairs(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Welch's unequal-variance t-test between every pair of groups: one
    per-group (n, mean, var) aggregate, then the closed-form t statistic
    and Welch-Satterthwaite degrees of freedom on the groups² pair grid
    (groups are few; the grid is driver-trivial). The A/B-comparison
    primitive: 'is the metric different between these segments, beyond
    noise?'.

    The per-group mean and sample variance are rounded to 6 dp BEFORE the
    t/df formulas so both engines feed bit-identical doubles into
    identical arithmetic — the one aggregate shuffle is the only
    float-summation in the plan. Groups need n ≥ 2 (var_samp defined)."""
    s = (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(value_col), 6).alias("m"),
            F.round(F.var_samp(value_col), 6).alias("v"),
        )
        .filter(F.col("n") >= 2)
    )
    a = s.select(
        F.col(group_col).alias("group_a"),
        F.col("n").alias("n_a"),
        F.col("m").alias("mean_a"),
        F.col("v").alias("_va"),
    )
    b = s.select(
        F.col(group_col).alias("group_b"),
        F.col("n").alias("n_b"),
        F.col("m").alias("mean_b"),
        F.col("v").alias("_vb"),
    )
    sa = F.col("_va") / F.col("n_a")
    sb = F.col("_vb") / F.col("n_b")
    return (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            "mean_a",
            "mean_b",
            F.round(
                (F.col("mean_a") - F.col("mean_b")) / F.sqrt(sa + sb), 6
            ).alias("t_stat"),
            F.round(
                F.pow(sa + sb, F.lit(2.0))
                / (
                    F.pow(sa, F.lit(2.0)) / (F.col("n_a") - 1)
                    + F.pow(sb, F.lit(2.0)) / (F.col("n_b") - 1)
                ),
                6,
            ).alias("df_welch"),
        )
    )


def acf_by_group(
    series: DataFrame,
    group_cols: str | Sequence[str],
    order_col: str,
    value_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Autocorrelation function per group over an ORDERED series (one row
    per (group, step) — aggregate to that grain first): Pearson corr
    between the series and its lag-k shift for k = 1..max_lag. The
    seasonality/memory probe that tells a monitoring layer whether
    yesterday predicts today.

    Each lag is one window-lag + one corr aggregate over the ALREADY
    aggregated series (series length per group, not raw rows); the
    max_lag branches union, so persist the input series when it is not a
    trivial scan. corr here is the sample correlation over the (x_t,
    x_{t-k}) pairs — the 'statistical' ACF estimator, matching SQL corr
    in both engines; results round to 6 dp."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    w = Window.partitionBy(*groups).orderBy(order_col)
    parts = []
    for lag in range(1, max_lag + 1):
        lagged = series.withColumn("_vlag", F.lag(value_col, lag).over(w))
        parts.append(
            lagged.filter(F.col("_vlag").isNotNull())
            .groupBy(*groups)
            .agg(
                F.lit(lag).alias("lag"),
                F.count(F.lit(1)).alias("n_pairs"),
                F.round(F.corr(value_col, "_vlag"), 6).alias("acf"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
