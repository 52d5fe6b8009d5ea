"""Batch-equivalent streaming queries — SURVEY.md §2.9 (ST3/ST5).

Structured Streaming and batch share one plan here: ``daily_tally`` is the
same function the streaming tests drive through a file-source stream; the
oracle checks its batch semantics (window boundaries, late-date convention).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table
from ningaloo_turtle_etl_spark.streaming.tallies import (
    daily_tally,
    normalize_after_midnight,
    session_tally,
)


@register(
    "tumbling_daily_tally",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_daily_tally(spark, sf_dir):
    """ST3: tumbling 1-day event-time window tally (turtle-tracks.Rmd:93-103's
    daily track counts). Session tz is UTC so window boundaries are UTC
    midnights — exactly date_trunc('day')."""
    ev = load_table(spark, "events", sf_dir)
    return daily_tally(ev, event_time="ts", keys=("event_type",))


@register(
    "after_midnight_observation_date",
    """
    WITH local AS (
        SELECT CAST(ts AS TIMESTAMP) + INTERVAL 8 HOURS AS lts FROM events
    )
    SELECT CASE WHEN HOUR(lts) < 6 THEN CAST(lts - INTERVAL 1 DAY AS DATE)
                ELSE CAST(lts AS DATE) END AS observation_date,
           COUNT(*) AS n
    FROM local GROUP BY 1
    """,
)
def after_midnight_observation_date(spark, sf_dir):
    """ST5: the Pendoley-Rawcliffe convention (tagging-etl.Rmd:82-85) —
    after-midnight nesting (before 6am Perth local) counts for the previous
    day — applied as event-time normalization, then tallied."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy(
        normalize_after_midnight("ts", cutoff_hour=6, tz_offset_hours=8).alias(
            "observation_date"
        )
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "session_window_tally",
    """
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    marks AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 6 HOURS
                    THEN 1 ELSE 0 END AS new_sess
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marks
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 6 HOURS AS session_end,
           user_id,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM sess GROUP BY user_id, sid
    """,
)
def session_window_tally(spark, sf_dir):
    """Session windows per user (gap = 6h) — Spark's native session_window
    against the classic gaps-and-islands SQL (lag → new-session mark →
    cumulative sum → group). A new session starts when the idle gap is
    ≥ the gap (Spark merges only strictly-overlapping [ts, ts+gap)
    half-open windows); session_end = last event + gap in both."""
    ev = load_table(spark, "events", sf_dir)
    return session_tally(ev, event_time="ts", keys=("user_id",), gap="6 hours")


@register(
    "hopping_window_tally",
    """
    WITH off AS (SELECT unnest([0, 1]) AS j)
    SELECT time_bucket(INTERVAL '30 minutes', ts) - j * INTERVAL '30 minutes'
             AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events CROSS JOIN off
    GROUP BY 1, 2
    """,
)
def hopping_window_tally(spark, sf_dir):
    """Hopping 1-hour/30-minute sliding window tally per event type
    (`streaming/tallies.py hopping_tally`): each event lands in exactly
    window/slide = 2 overlapping windows — the moving-rate smoothing view.
    Spark's native window(duration, slide) expresses the overlap as an
    Expand (explicit ×2 blow-up) instead of a self-join; the same plan
    runs batch or streaming with watermark-bounded state."""
    from ningaloo_turtle_etl_spark.streaming.tallies import hopping_tally

    ev = load_table(spark, "events", sf_dir)
    return hopping_tally(ev, event_time="ts", keys=("event_type",))
