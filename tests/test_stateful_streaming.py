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


def test_space_saving_update_exact_without_eviction():
    from ningaloo_turtle_etl_spark.streaming.stateful import _space_saving_update

    s = {}
    _space_saving_update(s, {"a": 5, "b": 2}, capacity=4)
    _space_saving_update(s, {"a": 1, "c": 3}, capacity=4)
    assert s == {"a": [6, 0], "b": [2, 0], "c": [3, 0]}


def test_space_saving_eviction_inherits_min_count():
    from ningaloo_turtle_etl_spark.streaming.stateful import _space_saving_update

    s = {}
    _space_saving_update(s, {"a": 10, "b": 1}, capacity=2)
    # capacity full; "c" evicts min entry b (count 1): est = 1+4, err = 1
    _space_saving_update(s, {"c": 4}, capacity=2)
    assert s == {"a": [10, 0], "c": [5, 1]}
    # overestimate is bounded: true(c)=4 <= est=5 <= true+err
    assert 4 <= s["c"][0] <= 4 + s["c"][1]


def test_space_saving_eviction_is_deterministic_on_ties():
    from ningaloo_turtle_etl_spark.streaming.stateful import _space_saving_update

    s = {}
    _space_saving_update(s, {"x": 3, "y": 3}, capacity=2)
    _space_saving_update(s, {"z": 1}, capacity=2)
    # tie between x and y at count 3: lexicographically first (x) evicts
    assert "x" not in s and s["z"] == [4, 3] and s["y"] == [3, 0]


def test_heavy_hitters_stream_exact_in_no_eviction_regime(spark, tmp_path):
    import shutil as _sh

    from ningaloo_turtle_etl_spark.streaming.stateful import (
        heavy_hitters_batch,
        heavy_hitters_stream,
    )

    feed = tmp_path / "hh_feed"
    feed.mkdir()
    _sh.copy(f"{SF_DIR}/events.parquet", feed / "p0.parquet")
    raw = read_stream_dir(
        spark,
        str(feed),
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    q = (
        heavy_hitters_stream(raw, item_col="user_id", capacity=4096, shards=4)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("hh_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["shard"], r["item"]): (r["est_count"], r["max_err"])
        for r in spark.sql("SELECT * FROM hh_test").collect()
    }
    from ningaloo_turtle_etl_spark.sources.tables import load_table

    expected = {
        (r["shard"], r["item"]): (r["est_count"], r["max_err"])
        for r in heavy_hitters_batch(
            load_table(spark, "events", SF_DIR), "user_id", shards=4
        ).collect()
    }
    assert got == expected


def test_msprt_monitor_stream_latches_across_microbatches(spark, tmp_path):
    import math

    import pandas as pd

    from ningaloo_turtle_etl_spark.streaming.stateful import (
        msprt_monitor_stream,
    )

    feed = tmp_path / "msprt_feed"
    feed.mkdir()
    # batch 1: arm 'a' far from mu0=0 -> rejects; batch 2: compensating
    # values drag the cumulative mean back to ~0 -> pointwise LR collapses
    # but the always-valid rejection must stay latched. Arm 'b' stays null.
    pd.DataFrame({"arm": ["a"] * 4 + ["b"] * 2, "v": [6.0, 6.0, 6.0, 6.0, 0.1, -0.1]}).to_parquet(feed / "b0.parquet")
    pd.DataFrame({"arm": ["a"] * 4 + ["b"] * 2, "v": [-6.0, -6.0, -6.0, -6.0, 0.2, -0.2]}).to_parquet(feed / "b1.parquet")

    raw = (
        spark.readStream.schema("arm string, v double")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(feed))
    )
    q = (
        msprt_monitor_stream(raw, "arm", "v", mu0=0.0, sigma=2.0, tau=2.0)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("msprt_monitor_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM msprt_monitor_test").collect()
    by_arm: dict = {}
    for r in rows:  # update mode: keep the LAST emission per (arm, n_cum)
        by_arm.setdefault(r["arm"], []).append(r)
    for arm in by_arm:
        by_arm[arm].sort(key=lambda r: r["n_cum"])

    def ll(n, xbar, s2=4.0, t2=4.0):
        return 0.5 * math.log(s2 / (s2 + n * t2)) + (
            n * n * xbar * xbar * t2
        ) / (2 * s2 * (s2 + n * t2))

    a1, a2 = by_arm["a"]
    assert a1["n_cum"] == 4 and a1["mean_cum"] == 6.0
    assert a1["log_lambda"] == round(ll(4, 6.0), 6)
    assert a1["rejected"] is True
    # batch 2: cumulative mean collapses to 0, pointwise LR goes negative,
    # yet p stays at the batch-1 floor and rejected stays True
    assert a2["n_cum"] == 8 and a2["mean_cum"] == 0.0
    assert a2["log_lambda"] == round(ll(8, 0.0), 6)
    assert a2["log_lambda"] < 0
    assert a2["p_always_valid"] == round(math.exp(-max(0.0, ll(4, 6.0))), 6)
    assert a2["rejected"] is True
    # null arm: never rejected, p pinned at 1
    for r in by_arm["b"]:
        assert r["rejected"] is False and r["p_always_valid"] == 1.0
    # single-look agreement: one batch over all data == the batch operator's
    # final cumulative row (same closed form, same totals)
    assert by_arm["b"][-1]["n_cum"] == 4
