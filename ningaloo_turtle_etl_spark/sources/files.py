"""File sources/sinks — SURVEY.md §2.1 S5/S6/S8.

The reference's CSV round-trips (`write.csv` ×8 products,
ningaloo-etl.Rmd:86,204,239,290; `read.csv(as.is=T)` spatial_modelling.Rmd:77)
and binary snapshots (`save(d, file='tracks.Rda')`, track_analysis.R:45-46)
map to schema-explicit CSV and Parquet. Parquet is the engine-native snapshot:
columnar, splittable, statistics for pushdown — the properties .Rda lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, **options
) -> DataFrame:
    """S5: CSV scan with an explicit schema — never inference (`as.is=T` is
    the reference's way of deferring typing to a repair stage; we pin types
    at the scan instead)."""
    opts = {"header": "true", "mode": "PERMISSIVE"} | options
    return spark.read.options(**opts).schema(schema).csv(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False, **options) -> None:
    """S6: CSV product sink (`write.csv(x, file, row.names=F)`).

    ``single_file=True`` coalesces to one partition for parity with the
    reference's one-file products — only sane for dimension/summary-sized
    output. Fact-scale data stays multi-part (one file per partition)."""
    out = df.coalesce(1) if single_file else df
    opts = {"header": "true"} | options
    out.write.options(**opts).mode("overwrite").csv(path)


def snapshot(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S8: binary snapshot (`save(...Rda)`) → Parquet. ``partition_by``
    enables partition pruning for downstream readers — e.g. snapshot the
    track stream by observation date and date-filtered queries skip files."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def load_snapshot(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
