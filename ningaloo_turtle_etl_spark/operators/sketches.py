"""Sketch/approximation operators — the cardinality/quantile/heavy-hitter
questions every 100 TB pipeline asks where exact answers cost a full shuffle.

All built on Spark's native sketch aggregates (JVM-side, mergeable,
map-combined): HyperLogLog++ (`approx_count_distinct`), Greenwald-Khanna
(`percentile_approx`), and the Karp-Papadimitriou-Shenker frequent-items
sketch (`DataFrame.freqItems`). Each returns a bounded-size result from ONE
pass — the exact forms (`count(distinct)`, exact medians) need a full
shuffle of the key universe, which is precisely what dies at scale.

Approximate results are deterministic for fixed data/parameters but differ
engine-to-engine, so the registered queries are rows-only; error bounds vs
the exact answers are pinned in tests/test_sketches.py instead.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def approx_distinct(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    rsd: float = 0.05,
) -> DataFrame:
    """HLL++ distinct count (per group if ``by``): one map-combined pass,
    sketch size O(1/rsd²) per group regardless of cardinality."""
    agg = F.approx_count_distinct(col, rsd=rsd).alias(f"approx_distinct_{col}")
    return df.groupBy(*by).agg(agg) if by else df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10_000,
    by: Sequence[str] = (),
) -> DataFrame:
    """Greenwald-Khanna quantiles as an aggregate column (per group if
    ``by``): rank error ≤ 1/accuracy, state O(accuracy·log n)."""
    agg = F.percentile_approx(
        col, F.array(*[F.lit(float(p)) for p in probabilities]), accuracy
    ).alias(f"approx_quantiles_{col}")
    return df.groupBy(*by).agg(agg) if by else df.agg(agg)


def heavy_hitters(
    df: DataFrame, cols: Sequence[str], support: float = 0.01
) -> DataFrame:
    """Frequent items with frequency ≥ ``support`` (KPS one-pass sketch;
    may over-report — false positives possible, false negatives not, the
    usual heavy-hitter contract)."""
    return df.freqItems(list(cols), support)


def distinct_vs_approx_report(
    df: DataFrame, col: str, by: Sequence[str], rsd: float = 0.05
) -> DataFrame:
    """Side-by-side exact vs HLL++ distinct per group with relative error —
    the calibration query you run at small scale before trusting the sketch
    at large scale."""
    exact = df.groupBy(*by).agg(F.countDistinct(col).alias("exact"))
    approx = approx_distinct(df, col, by=by, rsd=rsd).withColumnRenamed(
        f"approx_distinct_{col}", "approx"
    )
    joined = exact.join(approx, on=list(by))
    return joined.withColumn(
        "rel_error",
        F.round(F.abs(F.col("approx") - F.col("exact")) / F.col("exact"), 6),
    )
