"""Parquet catalog over the driver's synthetic star schema (TESTDATA.md).

The reference opens every source with an eager full scan (``mdb.get`` /
``sqlQuery('select * from …')``, ningaloo-etl.Rmd:54-67, tagging-etl.Rmd:63-66).
Here a "scan" is a lazy ``spark.read.parquet`` with the schema pinned, so
Catalyst can prune columns and push predicates into the Parquet reader instead
of materializing full tables like the reference does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Lazy scan of one synthetic table; schema comes from Parquet footer
    metadata (no inference pass over the data)."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name == "events":
        # Defensive: events.parquet carries TIMESTAMP(NANOS), which Spark
        # cannot read natively. session.py sets this at build time, but the
        # harness may hand us a vanilla session — the conf is runtime-safe.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _repair_schema(name, df)


def _repair_schema(name: str, df: DataFrame) -> DataFrame:
    """First-stage type repair, the reference's universal pattern
    (`as.is=T` load then cast, ningaloo-etl.Rmd:54,67-78).

    events.ts is written as parquet TIMESTAMP(NANOS); Spark's timestamp is
    microseconds, so the session reads nanos as int64 and this layer converts
    (`div 1000` truncation — matches DuckDB's CAST(ns AS TIMESTAMP))."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Expose the catalog to ``spark.sql`` — the engine's SQL entry point
    (``contents(con)`` analog: ``spark.catalog.listTables()``)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
