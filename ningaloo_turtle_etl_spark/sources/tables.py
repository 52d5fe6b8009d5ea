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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Expose the catalog to ``spark.sql`` — the engine's SQL entry point
    (``contents(con)`` analog: ``spark.catalog.listTables()``)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
