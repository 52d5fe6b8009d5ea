"""Statistical-layer queries — M1/M6/M7 oracle-checked; M2-M5 rows-only
(driver-solved linear algebra has no single-statement SQL equivalent; parity
is pinned against numpy in tests/test_stats.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.relational import count_pivot, with_rescaled
from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table
from ningaloo_turtle_etl_spark.stats import hellinger


@register(
    "hellinger_transform",
    """
    WITH counts AS (
        SELECT o_orderpriority,
               CAST(COALESCE(SUM(CASE WHEN l_returnflag='A' THEN 1 END), 0) AS BIGINT) AS A,
               CAST(COALESCE(SUM(CASE WHEN l_returnflag='N' THEN 1 END), 0) AS BIGINT) AS N,
               CAST(COALESCE(SUM(CASE WHEN l_returnflag='R' THEN 1 END), 0) AS BIGINT) AS R
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    )
    SELECT o_orderpriority,
           ROUND(sqrt(CAST(A AS DOUBLE) / (A + N + R)), 6) AS A,
           ROUND(sqrt(CAST(N AS DOUBLE) / (A + N + R)), 6) AS N,
           ROUND(sqrt(CAST(R AS DOUBLE) / (A + N + R)), 6) AS R
    FROM counts
    """,
)
def hellinger_transform(spark, sf_dir):
    """M1 (decostand hellinger, spatial_modelling.Rmd:149) over the species-
    matrix analog (priority × returnflag counts)."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    counts = count_pivot(
        li.join(o, li.l_orderkey == o.o_orderkey),
        keys=["o_orderpriority"],
        pivot_col="l_returnflag",
        values=("A", "N", "R"),
    )
    h = hellinger(counts, ["A", "N", "R"])
    return h.select(
        "o_orderpriority",
        *[F.round(c, 6).alias(c) for c in ("A", "N", "R")],
    )


@register(
    "correlation_diag",
    """
    SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(corr(l_extendedprice, l_discount), 6) AS corr_price_disc,
           ROUND(corr(l_quantity, l_tax), 6) AS corr_qty_tax
    FROM lineitem
    """,
)
def correlation_diag(spark, sf_dir):
    """M6 (pairs() diagnostics): Pearson correlations as one aggregation."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("corr_price_disc"),
        F.round(F.corr("l_quantity", "l_tax"), 6).alias("corr_qty_tax"),
    )


@register(
    "rescale_minmax",
    """
    SELECT c_custkey, c_mktsegment,
           ROUND((c_acctbal - MIN(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / NULLIF(MAX(c_acctbal) OVER (PARTITION BY c_mktsegment)
                          - MIN(c_acctbal) OVER (PARTITION BY c_mktsegment), 0),
                 6) AS acctbal_rescaled
    FROM customer
    """,
)
def rescale_minmax(spark, sf_dir):
    """M7 (scales::rescale, spatial_modelling.Rmd:171-172) per market
    segment — agg + broadcast join-back, not an unpartitioned window."""
    c = load_table(spark, "customer", sf_dir)
    out = with_rescaled(c, "c_acctbal", name="acctbal_rescaled", by=["c_mktsegment"])
    return out.select(
        "c_custkey", "c_mktsegment", F.round("acctbal_rescaled", 6).alias("acctbal_rescaled")
    )


@register(
    "rda_residual_stats",
    """
    WITH ev AS (
        SELECT event_type, CAST(value AS DOUBLE) AS y,
               CAST(hour(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS x1,
               CAST(day(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS x2
        FROM events
    ),
    s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
               SUM(x1*x1) AS s11, SUM(x1*x2) AS s12, SUM(x2*x2) AS s22,
               SUM(x1*y) AS s1y, SUM(x2*y) AS s2y
        FROM ev
    ),
    c AS (
        SELECT sx1/n AS m1, sx2/n AS m2, sy/n AS my,
               s11 - sx1*sx1/n AS c11, s12 - sx1*sx2/n AS c12,
               s22 - sx2*sx2/n AS c22,
               s1y - sx1*sy/n AS c1y, s2y - sx2*sy/n AS c2y
        FROM s
    ),
    b AS (
        SELECT my, m1, m2,
               (c22*c1y - c12*c2y) / (c11*c22 - c12*c12) AS b1,
               (c11*c2y - c12*c1y) / (c11*c22 - c12*c12) AS b2
        FROM c
    )
    SELECT ev.event_type,
           ROUND(AVG(y - (my - b1*m1 - b2*m2 + b1*x1 + b2*x2)), 4) AS mean_resid,
           ROUND(STDDEV_SAMP(y - (my - b1*m1 - b2*m2 + b1*x1 + b2*x2)), 4)
               AS std_resid
    FROM ev CROSS JOIN b
    GROUP BY ev.event_type
    """,
)
def rda_residual_stats(spark, sf_dir):
    """M2: distributed normal-equation OLS of event value on time features,
    residuals as map-only expressions; output = per-type residual summary.

    The oracle states the same fit closed-form: 2-predictor + intercept OLS
    by Cramer's rule over centered sums of products — algebraically the
    normal equations ``fit_rda`` solves with lstsq."""
    from ningaloo_turtle_etl_spark.stats import fit_rda, with_residuals

    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.col("value").alias("y"),
        F.hour("ts").cast("double").alias("x_hour"),
        F.dayofmonth("ts").cast("double").alias("x_day"),
    )
    coef, _ = fit_rda(ev, ["y"], ["x_hour", "x_day"])
    resid = with_residuals(ev, ["y"], ["x_hour", "x_day"], coef)
    return resid.groupBy("event_type").agg(
        F.round(F.avg("y_resid"), 4).alias("mean_resid"),
        F.round(F.stddev_samp("y_resid"), 4).alias("std_resid"),
    )


@register("pcnm_join_back", None)
def pcnm_join_back(spark, sf_dir):
    """M3: PCNM eigenvector scores computed on distinct synthetic coords and
    broadcast-joined back (the 61-sites trick)."""
    from ningaloo_turtle_etl_spark.stats import pcnm_scores

    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        (F.col("c_nationkey") % 5).cast("double").alias("gx"),
        (F.col("c_nationkey") % 7).cast("double").alias("gy"),
    )
    scored = pcnm_scores(c, ["gx", "gy"], n_vectors=2)
    return scored.groupBy("gx", "gy").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.first("PCNM1"), 4).alias("pcnm1"),
    )
