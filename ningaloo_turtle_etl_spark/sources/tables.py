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
        # Harness-proof: some testdata generations write events.ts as parquet
        # TIMESTAMP(NANOS) (unreadable natively — this conf reads it as int64
        # and _repair_schema converts); the current generation writes native
        # timestamp[us], where the conf is a harmless no-op.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _repair_schema(name, df)


def _repair_schema(name: str, df: DataFrame) -> DataFrame:
    """First-stage type repair, the reference's universal pattern
    (`as.is=T` load then cast, ningaloo-etl.Rmd:54,67-78).

    The repair is conditional on the footer shape: when events.ts arrives as
    int64 (a TIMESTAMP(NANOS) generation read under ``nanosAsLong``) it is
    converted with ``div 1000`` truncation — matching DuckDB's
    CAST(ns AS TIMESTAMP); when it arrives as a native timestamp (the
    current testdata shape) it passes through untouched."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def stream_table_dir(spark: SparkSession, path: str, name: str) -> DataFrame:
    """Stream an append-only directory of one table's parquet files with the
    SAME schema handling as the batch loader: the explicit schema a streaming
    source requires comes from the footer of the files already present (a
    metadata-only batch read), and :func:`_repair_schema` applies the same
    conditional repair — so tests and pipelines get identical semantics in
    batch and streaming regardless of which testdata shape is on disk."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).format("parquet").load(path)
    df = _repair_schema(name, raw)
    # Watermarks demand TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on
    # NTZ). The session runs UTC, so NTZ→TIMESTAMP preserves every value;
    # batch keeps NTZ, and both collect to identical naive datetimes.
    import pyspark.sql.functions as F
    from pyspark.sql.types import TimestampNTZType

    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Expose the catalog to ``spark.sql`` — the engine's SQL entry point
    (``contents(con)`` analog: ``spark.catalog.listTables()``)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
