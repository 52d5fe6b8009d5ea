"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 for the
driver's DuckDB-oracle comparison at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ningaloo_turtle_etl_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (summary_nests shape, SURVEY.md §3.1) on sf0.001."""
    from ningaloo_turtle_etl_spark.plans.flagship import summary_pivot

    return summary_pivot(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
