"""Flagship + Phase-0 queries."""

from __future__ import annotations

from ningaloo_turtle_etl_spark.plans import flagship
from ningaloo_turtle_etl_spark.registry import register

register("flagship_summary_pivot", flagship.ORACLE_SQL)(flagship.summary_pivot)
