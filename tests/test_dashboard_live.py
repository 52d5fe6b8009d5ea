"""Integration: streaming ingest → in-memory table → dashboard queries —
the full §3.2 loop (app.R's reactive data() + consumers) with Structured
Streaming doing the ingest instead of per-access re-reads."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.dedup import exact_dedup, exact_dedup_semi
from ningaloo_turtle_etl_spark.plans.dashboard import TracksDashboard
from ningaloo_turtle_etl_spark.streaming.tallies import read_stream_dir
from tests.conftest import SF_DIR


def test_streaming_ingest_feeds_dashboard(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", feed / "p0.parquet")

    raw = read_stream_dir(
        spark,
        str(feed),
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    # Ingest: repair types and project the tracks-shaped view the dashboard
    # expects, materialized to an in-memory table by the stream.
    tracks = raw.select(
        F.col("event_id").cast("string").alias("id"),
        (F.lit(113.0) + F.col("user_id") % 10 / 10.0).alias("longitude"),
        (F.lit(-22.0) - F.col("user_id") % 7 / 10.0).alias("latitude"),
        F.col("event_type").alias("species"),
        F.when(F.col("value") > 100, "fresh").otherwise("old").alias("nest_age"),
        F.lit("nest").alias("nest_type"),
        F.lit("WA").alias("location"),
        F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("observation_date"),
        F.timestamp_micros(F.expr("ts div 1000")).alias("observation_start_time"),
    )
    q = (
        tracks.writeStream.outputMode("append")
        .format("memory")
        .queryName("tracks_live")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    d = TracksDashboard(spark.table("tracks_live")).with_filters(species="purchase")
    n_purchase = d.filtered().count()
    assert n_purchase > 0
    assert d.map_markers().count() == n_purchase
    tally_total = d.tally_table().agg(F.sum("n")).collect()[0][0]
    assert tally_total == n_purchase
    status = d.latest_observation().collect()[0]
    assert status["n_obs"] == n_purchase and status["latest"] is not None


def test_exact_dedup_semi_matches_window(spark):
    rows = [(i, f"text {i % 7}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(r["doc_id"] for r in exact_dedup(df).collect())
    b = sorted(r["doc_id"] for r in exact_dedup_semi(df).collect())
    assert a == b == list(range(7))
