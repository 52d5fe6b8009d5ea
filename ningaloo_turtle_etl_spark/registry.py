"""Query registry — one named (spark_fn, oracle_sql) pair per implemented
operator from SURVEY.md §2.

Convention: every computed column is aliased identically in the Spark plan and
the DuckDB oracle SQL (the driver sorts columns by name then hashes values).
Double-typed aggregates are rounded in BOTH to absorb summation-order ulps.
Entries with ``oracle=None`` are non-SQL-expressible (driver runs a weaker
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


_REGISTRY: dict[str, Q] = {}


def _prepare_session(spark: SparkSession) -> None:
    """Pin the runtime confs query correctness depends on, in case the
    harness hands us a session built without session.py: UTC event-time math
    (oracle parity with DuckDB's naive timestamps) and nanos-as-long parquet
    reads (events.ts is TIMESTAMP(NANOS), unreadable natively)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def register(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = Q(wrapped, oracle)
        return fn

    return deco


def _load_all() -> None:
    # Import for side effects: each module registers its queries.
    import ningaloo_turtle_etl_spark.queries  # noqa: F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: q.fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}
