"""JDBC sources — SURVEY.md §2.1 S1/S2.

The reference scans MS Access via mdbtools (`mdb.get`, ningaloo-etl.Rmd:54)
and SQL Server with literal full-table queries
(`sqlQuery(con, 'select * from dbo.TRT_X')`, tagging-etl.Rmd:63-66) — every
byte crosses the wire, transformation happens client-side.

Spark-first: ``spark.read.jdbc`` with predicate pushdown and partitioned
reads. The helpers below encode the discipline; no database ships in this
container, so they are exercised by plan construction in tests (options are
inspectable on the reader) and documented for live use.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcCatalog:
    """A JDBC endpoint treated like the reference's `con` handle."""

    url: str
    properties: dict[str, str] = field(default_factory=dict)

    def table(
        self,
        spark: SparkSession,
        table: str,
        partition_column: str | None = None,
        num_partitions: int = 8,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
    ) -> DataFrame:
        """S1/S2 scan. Unlike the reference's `select *` + client filtering,
        the returned DataFrame pushes filters/projections into the database
        (`pushDownPredicate` defaults true), and ``partition_column`` splits
        the read into parallel range queries — the difference between one
        200k-row cursor and a cluster-wide ingest."""
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
        )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        if partition_column is not None:
            if lower_bound is None or upper_bound is None:
                raise ValueError("partitioned JDBC read needs explicit bounds")
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("numPartitions", str(num_partitions))
                .option("lowerBound", str(lower_bound))
                .option("upperBound", str(upper_bound))
            )
        return reader.load()

    def query(self, spark: SparkSession, sql: str) -> DataFrame:
        """Query pushdown (`option('query', ...)`) — the whole statement runs
        in the database; only results cross the wire."""
        reader = spark.read.format("jdbc").option("url", self.url).option("query", sql)
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        return reader.load()

    def contents(self, spark: SparkSession) -> list[str]:
        """`contents(con)` analog (ningaloo-etl.Rmd:55) for an ingested
        catalog: list tables registered in the Spark catalog."""
        return [t.name for t in spark.catalog.listTables()]
