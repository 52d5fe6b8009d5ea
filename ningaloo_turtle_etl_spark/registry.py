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


def register(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Q(fn, oracle)
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
