"""Join queries — SURVEY.md §2.3 (J1-J8).

The physical strategies matter as much as the semantics: every dimension side
here is broadcast (tiny), the fact-fact joins shuffle on their keys and rely
on AQE for skew, and Catalyst prunes fact columns down to what the final
projection needs.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.relational import (
    natural_join,
    orphans,
    resolve_lookups,
    with_parent_only,
)
from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table


@register(
    "join_left_single",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_left_single(spark, sf_dir):
    """J1: left equi-join on a single key — surveys ⟕ environment
    (ningaloo-etl.Rmd:174), obs ⟕ activities (tagging-etl.Rmd:401).
    customer is dimension-sized → broadcast, no shuffle of orders."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    return o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey, "left"
    ).select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@register(
    "join_left_composite",
    """
    WITH ps AS (
        SELECT l_partkey, l_suppkey, COUNT(*) AS n_lines,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM lineitem GROUP BY 1, 2
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
           ps.n_lines, ps.total_qty
    FROM lineitem l
    LEFT JOIN ps ON l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey
    """,
)
def join_left_composite(spark, sf_dir):
    """J2: composite-natural-key join — the surveys ⟕ sites
    (division,section,subsection) trap where a single-column key is WRONG
    because names repeat across divisions (ningaloo-etl.Rmd:151-157,199).

    r13: the aggregate-then-join-back form is computed as two window
    aggregates over the composite key. Semantically identical (the join key
    derives from the fact table itself, so the left join matched every row
    and n_lines/total_qty were exactly the per-(partkey,suppkey) group
    aggregates), but the physical plan drops from two lineitem scans + an
    aggregate exchange + a ~591k-row BroadcastExchange/hash-relation build
    (the composite key is near-unique at this generator's grain) to ONE
    scan + ONE exchange + sort + window — the dominant cost, broadcasting
    an aggregate nearly as large as the fact table, is gone, and at 100 TB
    the window form is the only one that survives (a fact-sized broadcast
    OOMs the driver; the SMJ alternative shuffles the fact twice).

    PRECONDITIONS of the window≡join equivalence (r14, pinned by
    tests/test_flagship.py::test_join_left_composite_null_key_contract):
    (1) NON-NULL composite keys — window partitionBy groups NULL keys
    into one partition and emits their counts, while the join form's
    aggregate side dropped NULL keys (IsNotNull on the join key) and
    left-join would emit NULL n_lines/total_qty for those rows; and
    (2) order-insensitively summable quantities (true here: l_quantity
    is an integer-valued double 1..50, so the window's unspecified
    accumulation order cannot move the sum). Both hold for this
    generator (TPC-H-style NOT NULL keys); a schema change that
    nullifies l_partkey/l_suppkey must revisit this query, not just
    re-run it — the oracle keeps the join form and WOULD diverge."""
    from pyspark.sql.window import Window

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
    )
    w = Window.partitionBy("l_partkey", "l_suppkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.count(F.lit(1)).over(w).alias("n_lines"),
        F.round(F.sum("l_quantity").over(w), 2).alias("total_qty"),
    )


@register(
    "join_natural",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name
    FROM (SELECT c_custkey, c_name, c_nationkey AS nationkey FROM customer) c
    JOIN (SELECT n_nationkey AS nationkey, n_name FROM nation) n USING (nationkey)
    """,
)
def join_natural(spark, sf_dir):
    """J4: dplyr inner_join with no `by` — key inferred as ALL shared columns
    (ningaloo-etl.Rmd:314,366). Misinferring this silently joins wrong; the
    engine computes the shared set at plan-build time."""
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", F.col("c_nationkey").alias("nationkey")
    )
    n = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("nationkey"), F.col("n_name").alias("nation_name")
    )
    return natural_join(c, n).select("c_custkey", "c_name", "nation_name")


@register(
    "join_anti_orphans",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey
    FROM lineitem l
    WHERE NOT EXISTS (
        SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey AND p.p_size <= 25
    )
    """,
)
def join_anti_orphans(spark, sf_dir):
    """J5: anti-join orphan detection — crawls/nests with no matching survey
    (ningaloo-etl.Rmd:402-405). Parent side restricted so the orphan set is
    non-empty in testdata."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    parent = load_table(spark, "part", sf_dir).filter(F.col("p_size") <= 25)
    return orphans(li, parent, on=li.l_partkey == parent.p_partkey)


@register(
    "join_semi_exists",
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000
    )
    """,
)
def join_semi_exists(spark, sf_dir):
    """J8: semi-join existence validation — FlipperTagExists/PitTagExists
    (tagging-etl.Rmd:179-184)."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_acctbal") > 5000)
    return with_parent_only(o, c, on=o.o_custkey == c.c_custkey)


@register(
    "lookup_chain_revenue",
    """
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def lookup_chain_revenue(spark, sf_dir):
    """J6: the lookup-resolve chain — 5 consecutive broadcast left joins to
    dims then drop ids (ningaloo-etl.Rmd:273-277) — composed with the A1
    tally. The fact table never shuffles for the joins (all dims broadcast);
    the only shuffle is the final aggregation's."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    n = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("nation_name"),
        "n_regionkey",
    )
    r = load_table(spark, "region", sf_dir).select(
        F.col("r_regionkey").alias("n_regionkey"), F.col("r_name").alias("region_name")
    )
    resolved = resolve_lookups(
        li.select(
            "l_suppkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        ),
        [(s, "l_suppkey"), (n, "s_nationkey"), (r, "n_regionkey")],
    )
    return resolved.groupBy("region_name", "nation_name").agg(
        F.count(F.lit(1)).alias("n_lines"), F.round(F.sum("net"), 2).alias("revenue")
    )


@register(
    "join_inner_project",
    """
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, o.o_orderpriority,
           l.l_quantity
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def join_inner_project(spark, sf_dir):
    """J3: inner equi-join dropping orphans by design (ningaloo-etl.Rmd:278,
    396-397). Filter on the orders side pushes below the join."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey, "inner").select(
        "l_orderkey", "l_linenumber", "o_orderdate", "o_orderpriority", "l_quantity"
    )
