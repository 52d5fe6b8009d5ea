"""Live JDBC round-trip against embedded Apache Derby (ships in Spark's own
jars/ for the Hive metastore) — closes the round-1 evidence gap where
`sources/jdbc.py` was exercised by plan construction only.

Covers the reference's S1/S2 surface (tagging-etl.Rmd:63-66,240 `sqlQuery`
call sites): scan with predicate pushdown, partitioned range reads, whole-
query pushdown, and catalog listing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ningaloo_turtle_etl_spark.sources.jdbc import JdbcCatalog

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("derby")
    # Keep derby.log out of the repo root.
    spark._jvm.System.setProperty("derby.stream.error.file", str(root / "derby.log"))
    url = f"jdbc:derby:{root}/db;create=true"
    props = {"driver": DERBY_DRIVER}
    src = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 5).alias("grp"),
        (F.col("id") * 1.5).cast("double").alias("val"),
    )
    src.write.jdbc(url, "T_SMOKE", properties=props)
    return JdbcCatalog(url, props)


def test_jdbc_scan_pushes_filter_into_database(spark, derby):
    df = derby.table(spark, "T_SMOKE").filter(F.col("grp") == 2).select("id", "val")
    assert df.count() == 20
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The predicate must reach the JDBCRelation scan, not run in Spark.
    assert "PushedFilters" in plan
    assert "EqualTo(grp,2)" in plan.split("PushedFilters")[1][:120]


def test_jdbc_partitioned_read_splits_into_range_queries(spark, derby):
    df = derby.table(
        spark, "T_SMOKE", partition_column="id",
        num_partitions=4, lower_bound=0, upper_bound=100,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100


def test_jdbc_query_pushdown_runs_in_database(spark, derby):
    # Spark's JDBC writer quotes identifiers, so Derby stores them
    # case-sensitively lowercase — quote them in hand-written SQL.
    out = derby.query(
        spark, 'SELECT "grp", COUNT(*) AS n FROM T_SMOKE GROUP BY "grp"'
    ).collect()
    counts = {int(r[0]): int(r[1]) for r in out}
    assert counts == {g: 20 for g in range(5)}


def test_jdbc_roundtrip_values_survive(spark, derby):
    back = derby.table(spark, "T_SMOKE").orderBy("id").limit(3).collect()
    assert [(int(r["id"]), float(r["val"])) for r in back] == [
        (0, 0.0), (1, 1.5), (2, 3.0),
    ]
