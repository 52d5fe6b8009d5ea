"""Temporal joins Spark lacks as primitives: as-of join and range
(interval-containment) join — named custom-operator targets in the build
brief; implemented as compositions of existing DataFrame ops (no UDFs).

Scale design:

- ``asof_join``: the naive formulation (theta-join on t_l >= t_r + argmax)
  explodes quadratically per key and plans as a nested loop. The
  formulation here UNIONS both sides and carries the right payload forward
  with a per-key ordered window (`last(..., ignorenulls=True)`): exactly one
  shuffle (co-partition on the key), state bounded by the window frame, no
  row explosion — the standard distributed as-of (same shape Flink's
  temporal join and kdb's aj compile to).
- ``range_join``: a BETWEEN theta-join plans as BroadcastNestedLoopJoin /
  cartesian at scale. Bucketing time into fixed chunks turns it into an
  EQUI-join on (key, bucket) — hash-partitionable, AQE-skew-handled — with
  the exact containment as a cheap residual filter. Interval rows explode
  into only the buckets they overlap, so blowup is bounded by
  interval_len / bucket + 1.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType


def _epoch_seconds(df: DataFrame, col: str) -> F.Column:
    """Epoch seconds for bucketing, for any time representation the catalog
    may hand us: TIMESTAMP / TIMESTAMP_NTZ → ``to_unix_timestamp`` (a direct
    CAST(ntz AS BIGINT) is an AnalysisException), integral epoch-seconds →
    passthrough cast."""
    dt = df.schema[col].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return F.to_unix_timestamp(F.col(col))
    if isinstance(dt, LongType):
        return F.col(col)
    return F.col(col).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of LEFT join: each left row picks the LATEST right row of
    the same key with ``right_time <= left_time`` (inclusive — DuckDB
    `ASOF JOIN`'s convention; at equal timestamps the right row matches).
    Left rows before any right row keep NULL payload.

    Right payload columns that collide with left names get ``suffix``. If
    several right rows share (key, right_time), the survivor is undefined —
    deduplicate upstream.
    """
    on = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in {*on, right_time}]
    lcols = [c for c in left.columns if c not in {*on, left_time}]
    renamed = {c: (c + suffix if c in left.columns else c) for c in right_cols}

    l2 = left.select(
        *on,
        *lcols,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(renamed[c])
            for c in right_cols
        ],
        F.lit(None).cast(right.schema[right_time].dataType).alias("_rt"),
    )
    r2 = right.select(
        *on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(renamed[c]) for c in right_cols],
        F.col(right_time).alias("_rt"),
    )
    # Right sorts BEFORE left at equal _t (0 < 1) → inclusive match.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l2.unionByName(r2).select(
        *on,
        *lcols,
        "_t",
        "_is_left",
        *[
            F.last(renamed[c], ignorenulls=True).over(w).alias(renamed[c])
            for c in right_cols
        ],
        F.last("_rt", ignorenulls=True).over(w).alias("_matched_time"),
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *on,
        *lcols,
        F.col("_t").alias(left_time),
        *[renamed[c] for c in right_cols],
        "_matched_time",
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | None,
    left_time: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int | str = 86400,
) -> DataFrame:
    """Interval-containment INNER join: left rows to the right intervals
    containing them (``start <= t < end``, half-open). Time is chunked into
    ``bucket_seconds`` buckets; intervals explode into the buckets they
    overlap and the join is an equi-join on (key..., bucket) with the exact
    range as residual filter — a hash join, never a nested loop (asserted in
    tests/test_temporal.py).

    Pick ``bucket_seconds`` near the typical interval length: too small
    explodes interval rows, too big inflates candidate pairs.
    ``bucket_seconds='auto'`` measures the p75 interval length on the right
    side (one GK-sketch aggregation — the right side is the small one) and
    uses it, clamped to [60s, 30d]."""
    on = [] if on is None else ([on] if isinstance(on, str) else list(on))
    if bucket_seconds == "auto":
        p75 = right.agg(
            F.percentile_approx(
                _epoch_seconds(right, end_col) - _epoch_seconds(right, start_col),
                F.lit(0.75),
                10_000,
            )
        ).collect()[0][0]
        bucket_seconds = int(min(max(p75 or 86400, 60), 30 * 86400))
    step = F.lit(int(bucket_seconds))
    lb = left.withColumn("_b", F.floor(_epoch_seconds(left, left_time) / step))
    rb = right.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(_epoch_seconds(right, start_col) / step),
                F.floor(_epoch_seconds(right, end_col) / step),
            )
        ),
    )
    joined = lb.join(rb, on=[*on, "_b"], how="inner").filter(
        (F.col(left_time) >= F.col(start_col)) & (F.col(left_time) < F.col(end_col))
    )
    return joined.drop("_b")
