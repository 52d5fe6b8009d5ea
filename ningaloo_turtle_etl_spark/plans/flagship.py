"""Flagship plan — the ``summary_nests`` pipeline shape (ningaloo-etl.Rmd:308-315)
re-expressed over the driver's star schema.

Reference shape: filter(nest_type=="New") → group_by(subsection, date, species)
%>% tally → spread(species, n, fill=0) → inner_join(surveys). Here:
filter(l_quantity ≥ 25) → groupBy(priority, returnflag).count() →
pivot(returnflag) fill 0 → natural-join back to the per-priority order tally.

Exercises P7 (filter), J1 (equi-join), A1 (group-count), A3 (pivot), J4
(natural join) in one lazy DAG. Catalyst pushes the quantity filter into the
Parquet scan and broadcasts the tiny tally side of the final join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ningaloo_turtle_etl_spark.operators.relational import (
    count_pivot,
    group_count,
    natural_join,
)
from ningaloo_turtle_etl_spark.sources.tables import load_table

RETURNFLAGS = ("A", "N", "R")  # closed value set → no distinct-scan job


def summary_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)

    filtered = lineitem.filter(F.col("l_quantity") >= 25).join(
        orders, on=lineitem.l_orderkey == orders.o_orderkey, how="inner"
    )
    wide = count_pivot(
        filtered,
        keys=["o_orderpriority"],
        pivot_col="l_returnflag",
        values=RETURNFLAGS,
    )
    totals = group_count(orders, keys=["o_orderpriority"], name="total_orders")
    return natural_join(wide, totals).orderBy("o_orderpriority")


ORACLE_SQL = """
WITH f AS (
    SELECT o.o_orderpriority, l.l_returnflag, COUNT(*) AS n
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity >= 25
    GROUP BY 1, 2
), p AS (
    SELECT o_orderpriority,
           CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN n END), 0) AS BIGINT) AS A,
           CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN n END), 0) AS BIGINT) AS N,
           CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN n END), 0) AS BIGINT) AS R
    FROM f GROUP BY 1
), t AS (
    SELECT o_orderpriority, COUNT(*) AS total_orders FROM orders GROUP BY 1
)
SELECT p.o_orderpriority, p.A, p.N, p.R, t.total_orders
FROM p JOIN t USING (o_orderpriority)
ORDER BY o_orderpriority
"""
