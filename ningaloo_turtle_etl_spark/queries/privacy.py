"""Privacy / governance release gates (operators/privacy.py): k-anonymity
+ l-diversity audit and differentially-private counts. Both are fully
oracle-checked — the DP noise is a deterministic md5-seeded inverse-CDF
Laplace draw, so even the "random" release replays bit-for-bit in DuckDB.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.privacy import (
    dp_noisy_counts,
    generalize_to_k,
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


@register(
    "k_anon_generalize_events",
    f"""
    WITH base AS (
        SELECT event_type, {_DAY} AS day FROM events
    ),
    -- the ladder: day -> week -> month -> time withheld; same output
    -- columns at every rung (g_time is NULL when withheld)
    rungs AS (
        SELECT 0 AS lvl, event_type, day AS g_time,
               CAST(COUNT(*) AS BIGINT) AS class_size
        FROM base GROUP BY 2, 3
        UNION ALL
        SELECT 1, event_type, CAST(floor(day / 7.0) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM base GROUP BY 2, 3
        UNION ALL
        SELECT 2, event_type, CAST(floor(day / 30.0) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM base GROUP BY 2, 3
        UNION ALL
        SELECT 3, event_type, CAST(NULL AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM base GROUP BY 2, 3
    ),
    tot AS (SELECT COUNT(*) AS n FROM base),
    risk AS (
        SELECT lvl,
               COALESCE(SUM(CASE WHEN class_size < 60
                                 THEN class_size END), 0) AS at_risk
        FROM rungs GROUP BY lvl
    ),
    -- first rung whose rows-at-risk fits the 2% suppression budget;
    -- the coarsest rung (3) is the fallback
    chosen AS (
        SELECT COALESCE(
            (SELECT MIN(lvl) FROM risk, tot
             WHERE lvl < 3 AND at_risk <= 0.02 * n), 3) AS lvl
    )
    SELECT event_type, g_time, class_size,
           CAST(chosen.lvl AS INTEGER) AS gen_level
    FROM rungs JOIN chosen ON rungs.lvl = chosen.lvl
    WHERE class_size >= 60
    ORDER BY event_type, g_time
    """,
)
def q_k_anon_generalize_events(spark, sf_dir):
    """Generalization-ladder k-anonymity release of the event log
    (`operators/privacy.py generalize_to_k`): coarsen the time
    quasi-identifier day -> week -> month -> withheld until <=2% of rows
    would need suppressing at k=60, then release class-grain counts with
    the residual small classes suppressed. Scale-adaptive by construction:
    the same rule picks month grain at sf0.001, week at sf0.01 and day at
    sf0.1 — coarser data earns finer release grain. The driver loop is one
    scalar aggregate per rung (ladder height, not data size)."""
    from ningaloo_turtle_etl_spark.operators.temporal import _epoch_seconds

    raw = load_table(spark, "events", sf_dir)
    ev = raw.select(
        "event_type",
        F.floor(_epoch_seconds(raw, "ts") / F.lit(86400))
        .cast("long")
        .alias("day"),
    )
    day = F.col("day")
    ladder = [
        [("event_type", F.col("event_type")), ("g_time", day)],
        [
            ("event_type", F.col("event_type")),
            ("g_time", F.floor(day / F.lit(7.0)).cast("long")),
        ],
        [
            ("event_type", F.col("event_type")),
            ("g_time", F.floor(day / F.lit(30.0)).cast("long")),
        ],
        [
            ("event_type", F.col("event_type")),
            ("g_time", F.lit(None).cast("long")),
        ],
    ]
    return generalize_to_k(
        ev, ladder, k=60, max_suppressed_frac=0.02
    ).orderBy("event_type", "g_time")


@register(
    "entropy_l_diversity_events",
    f"""
    WITH cells AS (
        SELECT event_type, {_DAY} AS day, user_id,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2, 3
    ),
    cls AS (
        SELECT event_type, day,
               CAST(SUM(c) AS BIGINT) AS class_size,
               CAST(COUNT(*) AS BIGINT) AS n_sensitive,
               CAST(SUM(CAST(round(CAST(c AS DOUBLE)
                    * ln(CAST(c AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT)
                   AS clnc
        FROM cells GROUP BY 1, 2
    )
    SELECT event_type, day, class_size, n_sensitive,
           ROUND(ln(CAST(class_size AS DOUBLE))
                 - (clnc / 1e9) / CAST(class_size AS DOUBLE), 6) AS entropy,
           ROUND(exp(ln(CAST(class_size AS DOUBLE))
                 - (clnc / 1e9) / CAST(class_size AS DOUBLE)), 6)
               AS effective_l,
           ROUND(ln(CAST(class_size AS DOUBLE))
                 - (clnc / 1e9) / CAST(class_size AS DOUBLE), 6)
               >= CAST(4.382027 AS DOUBLE) AS is_entropy_l_diverse
    FROM cls ORDER BY event_type, day
    """,
)
def q_entropy_l_diversity_events(spark, sf_dir):
    """ENTROPY l-diversity audit (Machanavajjhala et al. 2007 §3.2) of
    the same (event_type, day) release as k_anonymity_events
    (`operators/privacy.py entropy_l_diversity_report`, l=80): the
    count-distinct check passes a class whose 80 distinct users are one
    heavy user plus 79 singletons; the entropy check requires the
    EFFECTIVE user count exp(H) >= 80, which skew fails. Per-class c·ln c
    terms quantize to integer nanos before the class sum, and the flag
    compares 6dp-rounded entropy to a shared 6dp threshold literal, so
    no libm last-ulp can flip a row between engines."""
    from ningaloo_turtle_etl_spark.operators.privacy import (
        entropy_l_diversity_report,
    )
    from ningaloo_turtle_etl_spark.operators.temporal import _epoch_seconds

    raw = load_table(spark, "events", sf_dir)
    ev = raw.select(
        "event_type",
        F.floor(_epoch_seconds(raw, "ts") / F.lit(86400))
        .cast("long")
        .alias("day"),
        "user_id",
    )
    return entropy_l_diversity_report(
        ev, ["event_type", "day"], "user_id", l_value=80
    ).orderBy("event_type", "day")


@register(
    "dp_value_median_exponential",
    """
    WITH base AS (
        SELECT event_type,
               least(greatest(CAST(value AS DOUBLE), 0.0), 100.0) AS z
        FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
        SELECT event_type, z,
               row_number() OVER (PARTITION BY event_type ORDER BY z)
                   AS j,
               count(*) OVER (PARTITION BY event_type) AS n,
               lead(z, 1, 100.0) OVER (PARTITION BY event_type ORDER BY z)
                   AS z_next
        FROM base
    ),
    intervals AS (
        SELECT event_type, z AS a, z_next AS b, j, n FROM ranked
        UNION ALL
        SELECT event_type, 0.0, z, 0, n FROM ranked WHERE j = 1
    ),
    weighted AS (
        SELECT event_type, a, b, j, n,
               CAST(round((b - a) * exp(-1.0
                   * CAST(abs(2 * j - 1 * n) AS DOUBLE) / 4.0) * 1e9)
                   AS BIGINT) AS wn
        FROM intervals
    ),
    cum AS (
        SELECT event_type, a, b, j, n,
               CAST(SUM(wn) OVER (PARTITION BY event_type ORDER BY j
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cw,
               CAST(SUM(wn) OVER (PARTITION BY event_type) AS BIGINT)
                   AS tw,
               (('0x' || substr(md5(md5(event_type) || '#seed=7'),
                                1, 13))::BIGINT + 0.5)
                   / 4503599627370496.0 AS u
        FROM weighted
    )
    SELECT event_type, MAX(n) AS n,
           ROUND((MIN({'j': j, 'a': a, 'b': b}).a
                  + MIN({'j': j, 'a': a, 'b': b}).b) / 2.0, 6)
               AS dp_quantile
    FROM cum
    WHERE CAST(cw AS DOUBLE) >= u * CAST(tw AS DOUBLE)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def dp_value_median_exponential(spark, sf_dir):
    """Differentially-private per-type median of event value by the
    exponential mechanism (`operators/privacy.py
    dp_quantile_exponential`, ε=1, domain [0,100], md5-seeded draw):
    the rank-statistic DP release Laplace noise cannot provide (value
    sensitivity is unbounded) — interval sampled ∝ width·e^{εu/2} with
    exact-integer rank utilities and nano-quantized weights, the whole
    mechanism replayed by the oracle."""
    from ningaloo_turtle_etl_spark.operators.privacy import (
        dp_quantile_exponential,
    )

    ev = load_table(spark, "events", sf_dir)
    return dp_quantile_exponential(
        ev,
        "value",
        ["event_type"],
        q_num=1,
        q_den=2,
        epsilon=1.0,
        lo=0.0,
        hi=100.0,
        seed=7,
    )
