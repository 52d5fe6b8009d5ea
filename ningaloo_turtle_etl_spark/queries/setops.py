"""Set-operation queries — SURVEY.md §2.7.

Not required for reference parity (it never unions), but a complete engine
exposes them; Spark gives union/intersect/except natively. All three set
operators are exercised in ONE labeled query (merged round-2 so the family
lands a driver correctness row within the 50-slot window).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table


@register(
    "set_operations",
    """
    SELECT 'union' AS op, o_orderkey AS key FROM (
        SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 400000
        UNION
        SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    UNION ALL
    SELECT 'except' AS op, c_custkey AS key FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 0
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    UNION ALL
    SELECT 'intersect' AS op, l_orderkey AS key FROM (
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        INTERSECT
        SELECT o_orderkey AS l_orderkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def set_operations(spark, sf_dir):
    """§2.7 set ops, one labeled result:

    - ``union``: UNION DISTINCT over a 2-column tuple (dedup across branches);
    - ``except``: subtract == EXCEPT DISTINCT — exceptAll+distinct would
      wrongly keep a left value that outnumbers its right occurrences;
    - ``intersect``: INTERSECT DISTINCT on aligned key columns.
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)

    u = (
        o.filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_orderpriority")
        .union(
            o.filter(F.col("o_orderpriority") == "1-URGENT").select(
                "o_orderkey", "o_orderpriority"
            )
        )
        .distinct()
        .select(F.lit("union").alias("op"), F.col("o_orderkey").alias("key"))
    )
    e = (
        c.filter(F.col("c_acctbal") > 0)
        .select("c_custkey")
        .subtract(c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"))
        .select(F.lit("except").alias("op"), F.col("c_custkey").alias("key"))
    )
    i = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .intersect(
            o.filter(F.col("o_orderstatus") == "F").select(
                F.col("o_orderkey").alias("l_orderkey")
            )
        )
        .select(F.lit("intersect").alias("op"), F.col("l_orderkey").alias("key"))
    )
    return u.unionByName(e).unionByName(i)
