"""Privacy / governance release gates (operators/privacy.py): k-anonymity
+ l-diversity audit and differentially-private counts. Both are fully
oracle-checked — the DP noise is a deterministic md5-seeded inverse-CDF
Laplace draw, so even the "random" release replays bit-for-bit in DuckDB.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.privacy import (
    dp_noisy_counts,
    k_anonymity_report,
)
from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table

_DAY = "CAST(floor(epoch(ts) / 86400) AS BIGINT)"


@register(
    "k_anonymity_events",
    f"""
    SELECT event_type,
           {_DAY} AS day,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_sensitive,
           COUNT(*) >= 120 AS is_k_anonymous,
           COUNT(DISTINCT user_id) >= 80 AS is_l_diverse
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, day
    """,
)
def q_k_anonymity_events(spark, sf_dir):
    """k-anonymity + l-diversity audit of the event log released at
    (event_type, day) grain with user_id as the sensitive attribute
    (`operators/privacy.py k_anonymity_report`): every equivalence class
    with its size, distinct-user count, and pass/fail flags against k=120
    and l=80 — the per-class evidence behind a release go/no-go. One hash
    aggregate; count(distinct) shares the class keying."""
    from ningaloo_turtle_etl_spark.operators.temporal import _epoch_seconds

    raw = load_table(spark, "events", sf_dir)
    ev = raw.select(
        "event_type",
        F.floor(_epoch_seconds(raw, "ts") / F.lit(86400))
        .cast("long")
        .alias("day"),
        "user_id",
    )
    return k_anonymity_report(
        ev,
        ["event_type", "day"],
        sensitive_col="user_id",
        k=120,
        l_diversity=80,
    ).orderBy("event_type", "day")


@register(
    "dp_event_type_counts",
    """
    WITH agg AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    noised AS (
        SELECT event_type, n,
               (('0x' || substr(md5(
                    coalesce(md5(CAST(event_type AS VARCHAR)), 'NULL')
                    || '#seed=7'), 1, 13))::BIGINT
                + 0.5) / 4503599627370496.0 AS u
        FROM agg
    )
    SELECT event_type,
           ROUND(n + (-2.0) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)),
                 6) AS noisy_count
    FROM noised
    ORDER BY event_type
    """,
)
def q_dp_event_type_counts(spark, sf_dir):
    """Differentially-private per-type event counts at epsilon=0.5
    (`operators/privacy.py dp_noisy_counts`): Laplace(1/epsilon) noise
    drawn deterministically from md5(key, seed), so the release is exactly
    replayable — the oracle recomputes the same noise in DuckDB and the
    row hashes match. The DP step is a map expression over a 5-row
    aggregate: zero added shuffles at any scale."""
    ev = load_table(spark, "events", sf_dir)
    return dp_noisy_counts(
        ev, ["event_type"], epsilon=0.5, sensitivity=1.0, seed=7
    ).orderBy("event_type")
