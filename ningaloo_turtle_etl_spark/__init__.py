"""ningaloo_turtle_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
``parksandwildlife/ningaloo-turtle-etl`` (an R/dplyr ETL + analytics suite for
sea-turtle monitoring) as an idiomatic Spark engine:

- DataFrames over Parquet are the IR; Catalyst is the planner.
- ``functions``  — the scalar layer (multi-format timestamp parse, season
  watershed, recodes, …; SURVEY.md §2.8).
- ``operators``  — relational (joins/aggs/windows), spatial (point-in-polygon),
  dedup / similarity / text-analysis operators for training-data pipelines.
- ``sources``    — schema-explicit readers and sinks (Parquet/CSV/JSON/GeoJSON,
  REST with predicate pushdown; SURVEY.md §2.1).
- ``plans``      — the reference's product pipelines re-composed lazily
  (SURVEY.md §3).
- ``streaming``  — Structured Streaming surface for the live track feed
  (SURVEY.md §2.9).
- ``stats``      — the spatial_modelling layer (Hellinger/RDA/PCNM/varpart;
  SURVEY.md §2.11).

Nothing here copies reference code; citations in docstrings point at the
behavior being re-expressed (reference is R, this is Spark-first Python).
"""

from ningaloo_turtle_etl_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
