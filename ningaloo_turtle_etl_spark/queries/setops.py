"""Set-operation queries — SURVEY.md §2.7.

Not required for reference parity (it never unions), but a complete engine
exposes them; Spark gives union/intersect/except natively.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table


@register(
    "union_distinct",
    """
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 400000
    UNION
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def union_distinct(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    a = o.filter(F.col("o_totalprice") > 400000).select("o_orderkey", "o_orderpriority")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    return a.union(b).distinct()


@register(
    "except_segments",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def except_segments(spark, sf_dir):
    c = load_table(spark, "customer", sf_dir)
    a = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    # subtract == EXCEPT DISTINCT (the oracle's semantics); exceptAll+distinct
    # would wrongly keep a left value that outnumbers its right occurrences.
    return a.subtract(b)


@register(
    "intersect_keys",
    """
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT
    SELECT o_orderkey AS l_orderkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def intersect_keys(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    a = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    return a.intersect(b)
