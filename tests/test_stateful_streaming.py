"""applyInPandasWithState custom stateful operator test (first-seen dedup)."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.streaming.stateful import first_seen_dedup_stream
from ningaloo_turtle_etl_spark.streaming.tallies import read_stream_dir
from tests.conftest import SF_DIR


def test_first_seen_dedup_emits_once_per_key(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", feed / "p0.parquet")

    raw = read_stream_dir(
        spark,
        str(feed),
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    q = (
        first_seen_dedup_stream(raw, key_col="event_type")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("first_seen_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["key"]: (r["first_event_id"], r["n_events"])
        for r in spark.sql("SELECT * FROM first_seen_test").collect()
    }

    # One emission per distinct event_type, carrying the minimum event id
    # and the batch's count for that key.
    from ningaloo_turtle_etl_spark.sources.tables import load_table

    batch = load_table(spark, "events", SF_DIR)
    expected = {
        r["event_type"]: (r["first_id"], r["n"])
        for r in batch.groupBy("event_type")
        .agg(F.min("event_id").alias("first_id"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected
