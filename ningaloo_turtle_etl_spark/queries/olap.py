"""OLAP cube surface + time-series resampling + skew mechanics — the
warehouse-analytics queries a user of the reference's summary products
(mwi-summary tables, season tallies) reaches for next: subtotal hierarchies
(ROLLUP), multi-grain reports in one pass (GROUPING SETS), regular-grid
gap-filled series (resample + LOCF/linear fill), next-event transition
matrices, and the salted-join skew mitigation measured end-to-end.

All fully DuckDB-oracled: GROUPING()/ROLLUP/GROUPING SETS, generate_series
grids, and IGNORE NULLS windows exist in both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table


@register(
    "rollup_pricing_totals",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
)
def rollup_pricing_totals(spark, sf_dir):
    """ROLLUP subtotal hierarchy over the pricing summary dimensions:
    (flag, status) detail -> per-flag subtotal -> grand total in ONE
    aggregation pass. Spark plans rollup as a single Expand + hash
    aggregate — each input row fans into its grouping sets map-side, so the
    shuffle carries (sets x groups) partial rows, never a second scan; the
    100 TB shape is identical to the plain groupBy plus a small constant
    factor. GROUPING() disambiguates a NULL dimension value from a subtotal
    row (the classic cube-correctness trap)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "grouping_sets_tally",
    """
    SELECT event_type,
           CAST(hour(ts) AS INT) AS hour_of_day,
           CAST(GROUPING(event_type) AS INT) AS g_type,
           CAST(GROUPING(CAST(hour(ts) AS INT)) AS INT) AS g_hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(AVG(value), 6) AS avg_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (event_type, CAST(hour(ts) AS INT)), ())
    ORDER BY g_type, g_hour, event_type, hour_of_day
    """,
)
def grouping_sets_tally(spark, sf_dir):
    """Three report grains in one pass via GROUPING SETS — per type, per
    (type, hour-of-day), and the grand total — the multi-grain dashboard
    query that would otherwise be three scans UNION ALLed. Same Expand
    plan shape as rollup: one scan, one shuffle, map-side partials per
    set."""
    ev = load_table(spark, "events", sf_dir)
    ev.createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(hour(ts) AS INT) AS hour_of_day,
               CAST(grouping(event_type) AS INT) AS g_type,
               CAST(grouping(CAST(hour(ts) AS INT)) AS INT) AS g_hour,
               COUNT(*) AS n_events,
               ROUND(AVG(value), 6) AS avg_value
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type),
                                (event_type, CAST(hour(ts) AS INT)), ())
        """
    )


@register(
    "gap_fill_daily_values",
    """
    WITH obs AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_obs,
             AVG(value) AS v_avg
      FROM events WHERE event_id % 37 = 0
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(mn, mx)) AS bucket
      FROM (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
            FROM obs GROUP BY 1)
    ),
    j AS (
      SELECT g.event_type, g.bucket,
             CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs, o.v_avg
      FROM grid g LEFT JOIN obs o USING (event_type, bucket)
    ),
    w AS (
      SELECT *,
        last_value(v_avg IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
        last_value(CASE WHEN v_avg IS NOT NULL THEN bucket END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_prev,
        first_value(v_avg IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_next,
        first_value(CASE WHEN v_avg IS NOT NULL THEN bucket END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t_next
      FROM j
    )
    SELECT event_type, bucket, n_obs,
           ROUND(v_avg, 6) AS v_avg,
           ROUND(locf, 6) AS v_locf,
           ROUND(CASE WHEN v_avg IS NOT NULL THEN v_avg
                      ELSE locf + (v_next - locf) * (bucket - t_prev)
                                  / (t_next - t_prev) END, 6) AS v_linear
    FROM w
    ORDER BY event_type, bucket
    """,
)
def gap_fill_daily_values(spark, sf_dir):
    """Daily resample of a sparse event stream (a deterministic 1/37
    event subset, so real gaps exist at small SF) with LOCF and linear
    interpolation — `operators/temporal.py resample_gap_fill`. The grid is
    generated distributed (sequence+explode from a keys-sized bounds
    frame); fills are IGNORE NULLS windows over the aggregated grid, so
    window cost scales with grid size, not event count."""
    from ningaloo_turtle_etl_spark.operators.temporal import resample_gap_fill

    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") % 37 == 0)
    out = resample_gap_fill(
        ev, "event_type", ts_col="ts", value_col="value", step_seconds=86400
    )
    return out.select(
        "event_type",
        "bucket",
        "n_obs",
        F.round("v_avg", 6).alias("v_avg"),
        F.round("v_locf", 6).alias("v_locf"),
        F.round("v_linear", 6).alias("v_linear"),
    )


@register(
    "event_transition_probs",
    """
    WITH seq AS (
      SELECT event_type AS from_state,
             lead(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS to_state
      FROM events
    ),
    m AS (
      SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM seq WHERE to_state IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_state, to_state, n_transitions,
           ROUND(n_transitions / SUM(n_transitions)
                 OVER (PARTITION BY from_state), 6) AS prob
    FROM m
    ORDER BY from_state, to_state
    """,
)
def event_transition_probs(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences
    (`operators/temporal.py markov_transitions`) — the next-event model.
    One user-keyed lead window over the events, then a states^2 aggregate;
    normalization windows over the tiny aggregated matrix."""
    from ningaloo_turtle_etl_spark.operators.temporal import markov_transitions

    ev = load_table(spark, "events", sf_dir)
    return markov_transitions(ev)


@register(
    "salted_join_tally",
    """
    SELECT s.s_nationkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1
    ORDER BY s_nationkey
    """,
)
def salted_join_tally(spark, sf_dir):
    """The skew-mitigation join measured end-to-end: lineitem (the side
    with hot supplier keys at scale) salted into 8 sub-keys per key,
    supplier replicated 8x, joined on (key, salt) — identical results to
    the plain join (this oracle), but a hot key's probe stream now lands on
    8 reducers instead of 1 (`operators/scale.py salted_join`; distribution
    pinned in tests/test_scale.py). Use when AQE skew-split can't help:
    skewed AGGREGATION inputs or broadcast-ineligible dims."""
    from ningaloo_turtle_etl_spark.operators.scale import salted_join

    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    j = salted_join(
        li.withColumnRenamed("l_suppkey", "s_suppkey"), s, on="s_suppkey",
        salt_buckets=8,
    )
    return (
        j.groupBy("s_nationkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "key_skew_report",
    """
    WITH c1 AS (
      SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    s1 AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(n) AS BIGINT) AS max_key_rows,
             SUM(n * ln(n)) AS snln
      FROM c1
    ),
    t1 AS (
      SELECT CAST(SUM(n) AS BIGINT) AS top10_rows
      FROM (SELECT n FROM c1 ORDER BY n DESC, k ASC LIMIT 10)
    ),
    c2 AS (
      SELECT event_type AS k, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    s2 AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(n) AS BIGINT) AS max_key_rows,
             SUM(n * ln(n)) AS snln
      FROM c2
    ),
    t2 AS (
      SELECT CAST(SUM(n) AS BIGINT) AS top10_rows
      FROM (SELECT n FROM c2 ORDER BY n DESC, k ASC LIMIT 10)
    )
    SELECT 'user_id' AS key_col, total_rows, n_keys, max_key_rows,
           ROUND(max_key_rows * 1.0 * n_keys / total_rows, 4) AS skew_factor,
           ROUND(top10_rows * 1.0 / total_rows, 6) AS top10_share,
           ROUND(ln(total_rows) - snln / total_rows, 6) AS entropy
    FROM s1, t1
    UNION ALL
    SELECT 'event_type', total_rows, n_keys, max_key_rows,
           ROUND(max_key_rows * 1.0 * n_keys / total_rows, 4),
           ROUND(top10_rows * 1.0 / total_rows, 6),
           ROUND(ln(total_rows) - snln / total_rows, 6)
    FROM s2, t2
    """,
)
def key_skew_report(spark, sf_dir):
    """Skew profile of two candidate shuffle keys on the event fact
    (`operators/scale.py key_skew_profile`): hottest-key factor,
    top-10 mass, and key-distribution entropy — the pre-flight
    measurement that decides between a plain shuffle, AQE skew
    splitting, and salted_join. Count-per-key aggregates with map-side
    combine; everything downstream runs on the key-cardinality-sized
    count table."""
    from ningaloo_turtle_etl_spark.operators.scale import key_skew_profile

    ev = load_table(spark, "events", sf_dir)
    return key_skew_profile(ev, "user_id").unionByName(
        key_skew_profile(ev, "event_type")
    )


@register(
    "cube_order_tally",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """,
)
def cube_order_tally(spark, sf_dir):
    """Full CUBE over (status, priority): all four grains — detail, each
    one-dimension margin, grand total — in one Expand + aggregate pass
    (completing the OLAP trio with rollup_pricing_totals and
    grouping_sets_tally). GROUPING() flags distinguish margin rows from
    genuine NULL dimension values; the shuffle carries 4x map-side
    partials, never a second scan."""
    od = load_table(spark, "orders", sf_dir)
    return od.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "rolling_weekly_value",
    f"""
    WITH d AS ({{daily}})
    SELECT event_type, day, v,
           ROUND(AVG(v) OVER (PARTITION BY event_type ORDER BY day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
             AS avg_7d,
           CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_7d
    FROM d
    ORDER BY event_type, day
    """.format(daily="""
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             round(AVG(value), 6) AS v,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    """),
)
def rolling_weekly_value(spark, sf_dir):
    """Trailing 7-day rolling mean and event count per event type: a
    RANGE-framed window over the day grain, so GAPS in the series are
    handled by value distance, not row offsets (a rows-frame would
    silently stretch the window across missing days). The window runs on
    the aggregated daily table — series-length rows per group, never raw
    events; the moving-rate view behind the drift monitors."""
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.floor(F.to_unix_timestamp("ts") / 86400).alias("day"),
    ).agg(
        F.round(F.avg("value"), 6).alias("v"),
        F.count(F.lit(1)).alias("n"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "v",
        F.round(F.avg("v").over(w), 6).alias("avg_7d"),
        F.sum("n").over(w).alias("n_7d"),
    ).orderBy("event_type", "day")


@register(
    "value_share_of_total",
    """
    WITH g AS (
      SELECT event_type, ROUND(SUM(value), 2) AS total_value,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    )
    SELECT event_type, total_value, n,
           ROUND(total_value / SUM(total_value) OVER (), 6) AS value_share,
           ROUND(n * 1.0 / SUM(n) OVER (), 6) AS row_share
    FROM g ORDER BY event_type
    """,
)
def value_share_of_total(spark, sf_dir):
    """Share-of-total (ratio-to-report) per event type: each segment's
    fraction of global value and rows. The unpartitioned window runs over
    the ALREADY aggregated per-type table (groups-sized, one partition is
    correct there), never the fact — the standard two-level shape that
    avoids a global-window-over-raw-rows scale trap."""
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf_dir)
    g = ev.groupBy("event_type").agg(
        F.round(F.sum("value"), 2).alias("total_value"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.partitionBy()
    return g.select(
        "event_type",
        "total_value",
        "n",
        F.round(F.col("total_value") / F.sum("total_value").over(w), 6).alias(
            "value_share"
        ),
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("row_share"),
    ).orderBy("event_type")


@register(
    "source_gini",
    """
    WITH counts AS (
        SELECT source AS k, SUM(n_chars) AS x FROM documents GROUP BY 1
    ),
    ranked AS (
        SELECT k, x, ROW_NUMBER() OVER (ORDER BY x, k) AS i FROM counts
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(x) AS BIGINT) AS total_rows,
           ROUND(2.0 * SUM(i * x) / CAST(COUNT(*) * SUM(x) AS DOUBLE)
                 - (COUNT(*) + 1) / CAST(COUNT(*) AS DOUBLE), 6) AS gini
    FROM ranked
    """,
)
def q_source_gini(spark, sf_dir):
    """Gini coefficient of CHARACTER mass across sources
    (`operators/scale.py gini_concentration`): the whole-distribution
    corpus-concentration gauge next to key_skew_report's max-based factor
    — char/token mass is where concentration bites a training mix, and
    unlike the by-construction-uniform doc counts it is non-trivially
    distributed here. Exact integer moments over the key-cardinality
    table."""
    from ningaloo_turtle_etl_spark.operators.scale import gini_concentration

    docs = load_table(spark, "documents", sf_dir)
    return gini_concentration(docs, "source", weight_col="n_chars")


@register(
    "pareto_frontier_parts",
    """
    WITH pts AS (
        SELECT p_partkey, p_retailprice, p_size FROM part
    )
    SELECT a.p_partkey, ROUND(a.p_retailprice, 6) AS price, a.p_size
    FROM pts a
    WHERE NOT EXISTS (
        SELECT 1 FROM pts b
        WHERE b.p_retailprice <= a.p_retailprice
          AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    ORDER BY a.p_partkey
    """,
)
def pareto_frontier_parts(spark, sf_dir):
    """Skyline query (Borzsony et al., ICDE'01): parts on the Pareto
    frontier of (minimize retail price, maximize size) — no other part is
    at-most-as-expensive AND at-least-as-big with one strict. The oracle
    states dominance INDEPENDENTLY as a quadratic NOT EXISTS anti-join;
    the Spark plan (`operators/relational.py pareto_frontier_2d`) never
    goes quadratic: one groupBy to the distinct-price grain, a strict
    prefix-max window on that bounded grain, and a broadcast semi-join
    back — the 100 TB cost is one map-combinable shuffle."""
    from ningaloo_turtle_etl_spark.operators.relational import (
        pareto_frontier_2d,
    )

    part = load_table(spark, "part", sf_dir)
    return (
        pareto_frontier_2d(
            part, "p_retailprice", "p_size", id_cols=("p_partkey",)
        )
        .select(
            "p_partkey",
            F.round("p_retailprice", 6).alias("price"),
            "p_size",
        )
        .orderBy("p_partkey")
    )


@register(
    "rfm_customer_segments",
    """
    WITH per AS (
        SELECT o_custkey AS c,
               CAST(MAX(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT))
                    AS BIGINT) AS last_day,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(CAST(round(o_totalprice * 1e6, 0) AS BIGINT))
                    AS BIGINT) AS mon
        FROM orders GROUP BY 1
    ),
    mx AS (SELECT MAX(last_day) AS gmax FROM per),
    sc AS (
        SELECT c, gmax - last_day AS r_days, freq, mon,
               ntile(5) OVER (ORDER BY gmax - last_day DESC, c) AS r_score,
               ntile(5) OVER (ORDER BY freq, c) AS f_score,
               ntile(5) OVER (ORDER BY mon, c) AS m_score
        FROM per, mx
    )
    SELECT CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                WHEN r_score >= 4 AND f_score <= 2 THEN 'recent_low_freq'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
                ELSE 'core' END AS segment,
           CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(mon) / 1e6 / COUNT(*), 6) AS avg_monetary,
           ROUND(SUM(r_days) * 1.0 / COUNT(*), 6) AS avg_recency_days
    FROM sc GROUP BY 1, 2, 3, 4
    ORDER BY r_score, f_score, m_score
    """,
)
def rfm_customer_segments(spark, sf_dir):
    """RFM lifecycle segmentation of the order file
    (`operators/relational.py rfm_segments`): rank-quintile recency /
    frequency / monetary scores per customer, rolled up to the ≤125-row
    segment grain — the marketing-warehouse rollup that pairs with
    cohort_weekly_retention's time view. NTILE over (measure, custkey)
    is the identical deterministic total order in both engines; money
    sums in exact integer micros."""
    from ningaloo_turtle_etl_spark.operators.relational import rfm_segments
    from ningaloo_turtle_etl_spark.operators.temporal import _epoch_seconds

    orders = load_table(spark, "orders", sf_dir)
    return rfm_segments(
        orders,
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        epoch_seconds=_epoch_seconds(orders, "o_orderdate"),
    )


@register(
    "inequality_profile_by_source",
    """
    WITH base AS (
        SELECT source AS g, CAST(n_chars AS BIGINT) AS x
        FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0
    ),
    totals AS (
        SELECT g, CAST(SUM(x) AS BIGINT) AS sx,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM base GROUP BY g
    ),
    terms AS (
        SELECT base.g, base.x, totals.sx, totals.n,
               CASE WHEN base.x > 0 AND totals.sx > 0
                    THEN CAST(round((base.x * totals.n
                             / CAST(totals.sx AS DOUBLE))
                        * ln(base.x * totals.n
                             / CAST(totals.sx AS DOUBLE)) * 1e9, 0)
                        AS BIGINT)
                    ELSE 0 END AS t_theil,
               CAST(round(sqrt(CAST(base.x AS DOUBLE)) * 1e6, 0)
                    AS BIGINT) AS t_sqrt
        FROM base JOIN totals USING (g)
    ),
    agg AS (
        SELECT g, MAX(n) AS n, MAX(sx) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(t_theil) AS BIGINT) AS s_theil,
               CAST(SUM(t_sqrt) AS BIGINT) AS s_sqrt
        FROM terms GROUP BY g
    )
    SELECT g AS source, n,
           ROUND(sx / CAST(n AS DOUBLE), 6) AS mean,
           ROUND(CASE WHEN sx > 0
                       AND sxx / CAST(n AS DOUBLE)
                           - (sx / CAST(n AS DOUBLE))
                             * (sx / CAST(n AS DOUBLE)) > 0
                      THEN sqrt(sxx / CAST(n AS DOUBLE)
                           - (sx / CAST(n AS DOUBLE))
                             * (sx / CAST(n AS DOUBLE)))
                           / (sx / CAST(n AS DOUBLE))
                      ELSE 0.0 END, 6) AS cv,
           ROUND(s_theil / 1e9 / n, 6) AS theil_t,
           ROUND(CASE WHEN sx > 0
                      THEN 1.0 - pow(s_sqrt / 1e6 / n, 2)
                           / (sx / CAST(n AS DOUBLE))
                      ELSE 0.0 END, 6) AS atkinson_05
    FROM agg ORDER BY source
    """,
)
def q_inequality_profile_by_source(spark, sf_dir):
    """Within-source inequality of document length (`operators/scale.py
    inequality_profile`): CV, Theil T, and Atkinson(½) read together —
    top-, entropy-, and bottom-sensitive views of how unevenly char
    mass spreads across a source's documents, the mixing-pipeline
    companion to source_gini's across-source concentration."""
    from ningaloo_turtle_etl_spark.operators.scale import (
        inequality_profile,
    )

    docs = load_table(spark, "documents", sf_dir)
    return inequality_profile(docs, "source", "n_chars")
