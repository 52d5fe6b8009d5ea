"""Streaming differentially-private release: tumbling-window counts with
deterministic md5-seeded Laplace noise (operators/privacy.py), one noisy
row per closed window.

Why deterministic noise matters MORE in streaming: a restarted query
re-emits windows it already processed (at-least-once sinks), and RNG-based
noise would publish two different values for the same window — both a
correctness bug (downstream dedup can't reconcile) and a privacy bug
(averaging independent releases of the same count shrinks the noise,
quietly spending budget). Keying the draw on (window, group, seed) makes
re-emission idempotent; rotating the seed per release period is the
explicit, accountable way to publish again.

Scale shape: the tally is the standard watermarked tumbling aggregate
(partial aggregation map-side, state keyed by window x group); the DP step
is a map expression over the aggregate output — zero extra state, zero
extra shuffles, identical plan batch or stream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ningaloo_turtle_etl_spark.operators.privacy import laplace_noise
from ningaloo_turtle_etl_spark.streaming.tallies import daily_tally


def dp_daily_release(
    df: DataFrame,
    event_time: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    epsilon: float = 1.0,
    sensitivity: float = 1.0,
    seed: int = 0,
    watermark: str = "2 days",
    ndigits: int = 6,
) -> DataFrame:
    """Noisy per-window group counts: daily_tally's (window_start, keys, n)
    with Laplace(sensitivity/epsilon) noise drawn from md5(window epoch #
    keys # seed). Works on batch and streaming frames (same plan); the
    batch twin is the replay oracle the stream-equiv harness compares
    against."""
    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    tal = daily_tally(df, event_time=event_time, keys=keys, watermark=watermark)
    key = F.concat_ws(
        "#",
        F.to_unix_timestamp(F.col("window_start")).cast("string"),
        *[F.col(k).cast("string") for k in keys],
    )
    noise = laplace_noise(key, float(sensitivity) / float(epsilon), seed)
    return tal.select(
        "window_start",
        *keys,
        F.round(F.col("n") + noise, ndigits).alias("noisy_n"),
    )
