"""Registered oracle-checked queries, grouped by SURVEY.md §2 section.

Importing this package populates the registry (see registry.py).
"""

import ningaloo_turtle_etl_spark.queries.core  # noqa: F401
