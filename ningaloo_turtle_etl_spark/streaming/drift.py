"""Streaming corpus-drift monitor: per-window token distributions
maintained incrementally, compared against a baseline distribution on read.

The batch drift operator (operators/selection.py corpus_drift_metrics)
answers "how different are two snapshots"; a live ingest pipeline wants the
same answer PER ARRIVAL WINDOW, updated continuously — crawl quality
regressions show up as a KL/JS spike in the latest window. Composition of
existing pieces (the continuous-rollup pattern from streaming/rollup.py):

- write path: watermarked per-window token tally (append mode — only
  closed windows emit) → ``foreach_batch_upserter`` merge on
  (window_start, token): exactly-once counts from at-least-once delivery,
  re-runs are no-ops;
- read path: the rolled-up counts gridded against the baseline
  distribution, metrics via the SAME ``drift_from_counts`` core the batch
  operator uses — per-window results are bit-identical to running the
  batch comparison on each window's documents (pinned in
  tests/test_streaming_drift.py).

At 100 TB the rollup is windows × vocabulary — tiny next to the stream —
and the drift read never touches raw documents.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ningaloo_turtle_etl_spark.operators.selection import drift_from_counts
from ningaloo_turtle_etl_spark.operators.text import tokens
from ningaloo_turtle_etl_spark.streaming.sinks import foreach_batch_upserter


def window_token_tally(
    df: DataFrame,
    event_time: str = "ts",
    text_col: str = "text",
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Per-window unigram counts (window_start, token, n) — the streaming
    form of ``token_distribution`` with an event-time tumbling window.
    Works on batch and streaming frames (same plan; batch ignores the
    watermark). The explode collapses map-side via partial aggregation
    before the (window, token) shuffle."""
    src = df.withWatermark(event_time, watermark) if df.isStreaming else df
    toks = src.select(
        F.col(event_time),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    return (
        toks.groupBy(F.window(F.col(event_time), window), "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "token", "n")
    )


def drift_maintenance(
    stream: DataFrame,
    target_dir: str,
    event_time: str = "ts",
    text_col: str = "text",
    window: str = "1 day",
    watermark: str = "2 days",
    checkpoint: str | None = None,
):
    """Start the monitor's write path: windowed token tally → idempotent
    merge-on-(window_start, token) into ``target_dir``."""
    tally = window_token_tally(stream, event_time, text_col, window, watermark)
    writer = (
        tally.writeStream.outputMode("append")
        .foreachBatch(foreach_batch_upserter(target_dir, ["window_start", "token"]))
        .trigger(availableNow=True)
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def windowed_drift(
    window_counts: DataFrame,
    baseline_counts: DataFrame,
    smoothing: float = 0.5,
) -> DataFrame:
    """Read path: one drift row per window vs the baseline distribution.
    ``window_counts`` is the rollup table (window_start, token, n);
    ``baseline_counts`` a ``token_distribution`` frame (token, n).

    Every window must see the FULL baseline vocabulary (tokens the window
    missed contribute smoothed mass), so the baseline grids across the
    distinct windows — windows × vocab rows, still rollup-sized — and the
    window's own novel tokens come in through the full outer join. Metrics
    come from the shared ``drift_from_counts`` core, so a window's row
    equals the batch ``corpus_drift_metrics`` of (that window's docs,
    baseline docs)."""
    wins = window_counts.select("window_start").distinct()
    grid = wins.crossJoin(baseline_counts.select("token", F.col("n").alias("nb")))
    obs = window_counts.select("window_start", "token", F.col("n").alias("na"))
    j = (
        grid.join(obs, on=["window_start", "token"], how="full_outer")
        .select(
            "window_start",
            F.coalesce(F.col("na"), F.lit(0)).alias("na"),
            F.coalesce(F.col("nb"), F.lit(0)).alias("nb"),
        )
    )
    return drift_from_counts(j, ("window_start",), smoothing)
