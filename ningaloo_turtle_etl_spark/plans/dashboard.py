"""Dashboard serving layer — the reactive Shiny app's query surface
(SURVEY.md §3.2, app.R) re-expressed as lazy views over a tracks table.

The reference re-ingests the full feed and re-tallies on every UI event
(app.R:77-154,193-268). Here ingestion is whatever keeps the tracks table
fresh (a streaming query or periodic batch — see streaming/); the dashboard
itself is three cheap queries over it, re-planned per filter change. Filters
compose as conjunctive equalities exactly like the reactive ``filteredData``
(app.R:193-203), and Catalyst pushes them into the scan — the incremental-
view-maintenance-by-recompute pattern, minus the re-ingest."""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FILTERABLE = ("location", "nest_age", "nest_type", "species")


@dataclass
class TracksDashboard:
    tracks: DataFrame
    filters: dict[str, str] = field(default_factory=dict)

    def with_filters(self, **filters: str) -> "TracksDashboard":
        """app.R:193-203: equality filters; value 'All' clears a dimension."""
        merged = {**self.filters, **filters}
        merged = {
            k: v for k, v in merged.items() if v != "All" and k in FILTERABLE
        }
        return TracksDashboard(self.tracks, merged)

    def filtered(self) -> DataFrame:
        df = self.tracks
        for k, v in self.filters.items():
            df = df.filter(F.col(k) == v)
        return df

    def map_markers(self) -> DataFrame:
        """app.R:206-218: one marker per observation with a popup label."""
        return self.filtered().select(
            "id",
            "longitude",
            "latitude",
            F.concat_ws(
                " ", F.col("species"), F.col("nest_type"), F.col("observation_date").cast("string")
            ).alias("popup"),
        )

    def tally_table(self) -> DataFrame:
        """app.R:221-229: the five-key tally."""
        return (
            self.filtered()
            .groupBy("location", "observation_date", "species", "nest_age", "nest_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def daily_series(self) -> DataFrame:
        """app.R:231-268: per-day series for the tally plots."""
        return (
            self.filtered()
            .groupBy("observation_date", "species", "nest_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("observation_date")
        )

    def latest_observation(self) -> DataFrame:
        """app.R:123-124: nrow + latest timestamp status line."""
        return self.filtered().agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.max("observation_start_time").alias("latest"),
        )
