"""Continuous aggregate (hypertable-style rollup) — the pattern TimescaleDB
calls a continuous aggregate and Databricks calls a gold table: a streaming
windowed tally maintained incrementally into a queryable rollup table, with
the open tail recomputed from raw on read.

Composition of existing pieces, no new state machinery:

- write path: ``daily_tally`` (append mode — only watermark-CLOSED windows
  emit) → ``foreach_batch_upserter`` (merge-on-key, so retries and
  reprocessing are no-ops — exactly-once rollup from at-least-once
  delivery);
- read path: rollup table ∪ the open tail aggregated from raw events newer
  than the rollup's horizon. The expensive history is pre-aggregated; only
  the tail (bounded by the watermark) is recomputed per query.

At 100 TB the rollup table is keys × days — orders of magnitude smaller
than raw; serving reads never touch raw history.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ningaloo_turtle_etl_spark.streaming.sinks import foreach_batch_upserter
from ningaloo_turtle_etl_spark.streaming.tallies import daily_tally


def continuous_rollup(
    stream: DataFrame,
    target_dir: str,
    event_time: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str = "2 days",
    checkpoint: str | None = None,
):
    """Start the rollup maintenance query: windowed tally → idempotent
    merge-on-(window_start, keys) into ``target_dir``."""
    agg = daily_tally(stream, event_time=event_time, keys=keys, watermark=watermark)
    writer = (
        agg.writeStream.outputMode("append")
        .foreachBatch(foreach_batch_upserter(target_dir, ["window_start", *keys]))
        .trigger(availableNow=True)
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def rollup_with_tail(
    spark: SparkSession,
    target_dir: str,
    raw: DataFrame,
    event_time: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Serving view: closed windows from the rollup table plus the open tail
    aggregated from ``raw`` beyond the rollup horizon. Equals the full batch
    tally (pinned in tests/test_rollup.py) while reading pre-aggregated
    history."""
    from ningaloo_turtle_etl_spark.streaming.sinks import _exists

    # Shared with the write path — one definition of 'rollup table exists'
    # (the hand-copied local check drifted from sinks._exists; r04 review).
    if _exists(spark, target_dir):
        rolled = spark.read.parquet(target_dir)
        horizon = rolled.agg(F.max("window_start")).collect()[0][0]
    else:
        rolled, horizon = None, None
    if horizon is None:
        return daily_tally(raw, event_time=event_time, keys=keys)
    # The horizon window itself could still be open in the stream's state;
    # recompute from it (inclusive) and prefer the fresh values.
    tail_raw = raw.filter(F.col(event_time) >= F.lit(horizon))
    tail = daily_tally(tail_raw, event_time=event_time, keys=keys)
    closed = rolled.join(
        tail.select("window_start", *keys), on=["window_start", *keys], how="left_anti"
    )
    return closed.unionByName(tail)
