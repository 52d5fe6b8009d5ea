"""Streaming drift monitor: the rolled-up per-window drift equals the batch
drift computation on each window's documents, and maintenance re-runs are
idempotent."""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F
import pytest

from ningaloo_turtle_etl_spark.operators.selection import (
    corpus_drift_metrics,
    token_distribution,
)
from ningaloo_turtle_etl_spark.streaming.drift import (
    drift_maintenance,
    window_token_tally,
    windowed_drift,
)

_BASE = datetime(2025, 3, 1, 0, 0, 0)


def _doc_rows():
    # Vocabulary drifts by day: day 0 speaks {alpha beta gamma}, later days
    # mix in more {zeta eta} — so per-window KL vs the day-0 baseline grows.
    rows = []
    doc_id = 0
    for day in range(6):
        for i in range(12):
            old = f"alpha beta gamma delta{i % 3}"
            new = f"zeta eta theta{i % 3}"
            text = old if i >= day * 3 else new + " " + old.split()[0]
            rows.append((doc_id, _BASE + timedelta(days=day, hours=i), text))
            doc_id += 1
    return rows


@pytest.fixture()
def doc_feed(spark, tmp_path):
    d = tmp_path / "docs"
    df = spark.createDataFrame(_doc_rows(), "doc_id long, ts timestamp, text string")
    df.coalesce(1).write.parquet(str(d))
    return str(d)


def _stream(spark, feed):
    return spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(
        feed
    )


def test_windowed_drift_equals_batch_per_window(spark, doc_feed, tmp_path):
    target = str(tmp_path / "drift_rollup")
    q = drift_maintenance(
        _stream(spark, doc_feed), target, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    batch = spark.read.parquet(doc_feed)
    baseline_docs = batch.filter(F.to_date("ts") == "2025-03-01")
    baseline = token_distribution(baseline_docs)

    rolled = spark.read.parquet(target)
    drift = windowed_drift(rolled, baseline).collect()
    # append mode: only watermark-closed windows are in the table
    assert 2 <= len(drift) < 6

    metric_cols = [
        "n_tokens_a", "n_tokens_b", "vocab_size",
        "kl_ab", "kl_ba", "js_divergence", "total_variation",
    ]
    for row in drift:
        day_docs = batch.filter(
            F.to_date("ts") == F.lit(row["window_start"].date().isoformat())
        )
        ref = corpus_drift_metrics(day_docs, baseline_docs).collect()[0]
        for c in metric_cols:
            assert row[c] == ref[c], (row["window_start"], c)

    # Baseline window drifts ~zero from itself; later windows drift more.
    by_day = sorted(drift, key=lambda r: r["window_start"])
    assert by_day[0]["kl_ab"] < 0.01
    assert by_day[-1]["kl_ab"] > by_day[0]["kl_ab"]


def test_drift_maintenance_rerun_is_idempotent(spark, doc_feed, tmp_path):
    target = str(tmp_path / "drift_rollup")
    drift_maintenance(_stream(spark, doc_feed), target).awaitTermination(120)
    first = sorted(
        (r["window_start"], r["token"], r["n"])
        for r in spark.read.parquet(target).collect()
    )
    assert first
    drift_maintenance(_stream(spark, doc_feed), target).awaitTermination(120)
    second = sorted(
        (r["window_start"], r["token"], r["n"])
        for r in spark.read.parquet(target).collect()
    )
    assert first == second


def test_window_token_tally_batch_equals_stream_shape(spark, doc_feed):
    batch = spark.read.parquet(doc_feed)
    tally = window_token_tally(batch)
    assert tally.columns == ["window_start", "token", "n"]
    # batch tally covers all 6 days (no watermark cut in batch mode)
    assert tally.select("window_start").distinct().count() == 6
    # counts reconcile with the raw token stream
    total = tally.agg(F.sum("n")).collect()[0][0]
    n_tokens = batch.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
    ).filter(F.col("t") != "").count()
    assert total == n_tokens
