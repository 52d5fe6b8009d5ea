"""SparkSession factory with scale-aware defaults.

Local test/bench runs use ``local[N]``; the same configuration knobs are the
ones that matter on a 1000-executor cluster — AQE for runtime re-planning and
skew joins, partition sizing so scan tasks stay balanced, Arrow for every
Python<->JVM crossing, and a UTC session timezone so event-time semantics are
deterministic and oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32] / 128 GiB harness; on a real cluster the
# same settings scale: AQE coalesces the 2x-overprovisioned shuffle partitions
# down to useful sizes at runtime, and 128 MiB scan partitions keep ~800k
# tasks/100TB — the planner's sweet spot.
_DEFAULTS = {
    # --- planner / runtime re-planning ---
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # --- shuffle sizing (overridden per-run via env) ---
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MiB
    # --- Python boundary: always Arrow, never row-at-a-time pickling ---
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # --- determinism: event-time math must not depend on host tz ---
    "spark.sql.session.timeZone": "UTC",
    # --- broadcast: all reference lookup dims are tiny; 32 MiB of headroom ---
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    # quieter local runs
    "spark.ui.enabled": "false",
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    # Spark has no nanosecond timestamp type; read TIMESTAMP(NANOS) parquet
    # columns as raw int64 and let the source layer convert (tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
}


def get_spark(
    app_name: str = "ningaloo-turtle-etl-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` falls back to ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``)
    so the driver's bench contract and pytest share one code path.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    # Local mode runs everything in the driver JVM. 8g is the measured sweet
    # spot on this harness: enough headroom for wide shuffles, while very
    # large heaps (24g+) degrade GC pathologically under the 32-thread
    # UDF-heavy workloads (60s+ regressions on array-heavy queries). Only
    # effective if set before JVM launch.
    conf.setdefault(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
