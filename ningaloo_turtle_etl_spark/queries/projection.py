"""Projection / filter / predicate queries — SURVEY.md §2.2 (P1-P13) and the
conditional-expression scalars F6/F12 they carry.

Each query is the testdata expression of a reference pipeline stage; the
docstring cites the behavior being re-expressed.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.functions.scalars import patch_where, season
from ningaloo_turtle_etl_spark.operators.relational import (
    distinct_combinations,
    duplicated_rows,
)
from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table


@register(
    "projection_pipeline",
    """
    SELECT l_orderkey AS order_id,
           CAST(l_quantity AS INT) AS quantity,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           UPPER(l_returnflag) AS flag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    """,
)
def projection_pipeline(spark, sf_dir):
    """P1/P2/P3/P5/P6 as one pipeline (merged round-2 for driver-window
    reasons): dplyr transmute — project+compute+cast in one
    (ningaloo-etl.Rmd:67-78) — then an explicit drop-list and a bulk rename
    (ningaloo-etl.Rmd:181-198,236). Filter + projection both reach the
    parquet scan."""
    li = load_table(spark, "lineitem", sf_dir)
    out = li.filter(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp")
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty"),
        # Per-row arithmetic stays unrounded: identical IEEE ops are
        # bit-equal across engines, while ROUND implementations differ at
        # .xx5 boundaries. Rounding is reserved for aggregates.
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        F.upper("l_returnflag").alias("flag"),
    )
    # P3 drop-list, then P5 bulk rename — Catalyst collapses all three
    # projections into the scan's ReadSchema.
    return out.drop("l_linenumber").withColumnsRenamed(
        {"l_orderkey": "order_id", "qty": "quantity"}
    )


@register(
    "filter_predicates",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_returnflag, l.l_shipdate,
           p.p_name, p.p_brand
    FROM lineitem l
    LEFT JOIN (SELECT * FROM part WHERE p_size > 40) p ON l.l_partkey = p.p_partkey
    WHERE l.l_quantity > 30 AND l.l_returnflag = 'R'
      AND l.l_shipdate >= TIMESTAMP '1994-01-01'
      AND l.l_linestatus <> ''
      AND (p.p_name IS NULL OR p.p_brand IS NULL)
    """,
)
def filter_predicates(spark, sf_dir):
    """P7+P8 in one predicate tree (merged round-2 for driver-window
    reasons): the conjunctive chain — equality, inequality, range, != ''
    (ningaloo-etl.Rmd:310,472-475; app.R:196-201) — AND the disjunctive
    is.na QA predicate (ningaloo-etl.Rmd:386-389) over a left join that
    manufactures the NULLs the bad-site scan looks for. The conjunctive
    half is pushed to the fact scan; the null-disjunction must stay ABOVE
    the left join (pushing it below would change semantics) — which is
    exactly what Catalyst does."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_size") > 40)
    joined = li.join(p, li.l_partkey == p.p_partkey, "left")
    return joined.filter(
        (F.col("l_quantity") > 30)
        & (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("l_linestatus") != "")
        & (F.col("p_name").isNull() | F.col("p_brand").isNull())
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate",
        "p_name", "p_brand",
    )


@register(
    "conditional_patch",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN 'O' ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_totalprice < 1000 THEN 0.0 ELSE o_totalprice END AS o_totalprice,
           o_orderpriority
    FROM orders
    """,
)
def conditional_patch(spark, sf_dir):
    """P10/F12: patch-by-predicate re-expression of R's in-place indexed
    update (ningaloo-etl.Rmd:83-84,202,289). Non-matching rows must survive
    bit-exactly — that is the hash-oracle's point."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    o = patch_where(o, F.col("o_orderstatus") == "P", o_orderstatus=F.lit("O"))
    return patch_where(o, F.col("o_totalprice") < 1000, o_totalprice=F.lit(0.0))


@register(
    "duplicated_keys",
    """
    SELECT l_orderkey, l_linenumber, l_partkey
    FROM (SELECT l_orderkey, l_linenumber, l_partkey,
                 ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_linenumber, l_partkey) AS rn
          FROM lineitem)
    WHERE rn > 1
    """,
)
def duplicated_keys(spark, sf_dir):
    """P11: R duplicated() — rows whose key appeared earlier
    (ningaloo-etl.Rmd:377), as a ranked window."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    return duplicated_rows(
        li, keys=["l_orderkey"], order_by=["l_linenumber", "l_partkey"]
    )


@register(
    "distinct_combinations",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_combos(spark, sf_dir):
    """A9: 'unique combinations of subsection and date' framing
    (ningaloo-etl.Rmd:295-311)."""
    return distinct_combinations(
        load_table(spark, "orders", sf_dir), ["o_orderstatus", "o_orderpriority"]
    )


@register(
    "slice_topk",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def slice_topk(spark, sf_dir):
    """P12/P13/O2/O3 in one pipeline (merged round-2 for driver-window
    reasons): positional column slice df[, 1:5] (ningaloo-etl.Rmd:403,406),
    then multi-column descending sort + limit (ningaloo-etl.Rmd:311,
    head/limit tagging-etl.Rmd:408). Spark plans ORDER+LIMIT as
    TakeOrderedAndProject — no full sort at scale (asserted in
    tests/test_plans.py). Tie-broken on the key for determinism."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.select(*o.columns[:5])
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "season_watershed",
    """
    SELECT CASE WHEN MONTH(o_orderdate) > 7 THEN YEAR(o_orderdate)
                ELSE YEAR(o_orderdate) - 1 END AS season,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1
    """,
)
def season_watershed(spark, sf_dir):
    """P9/F6: the fiscal-season watershed (ningaloo-etl.Rmd:164-167,179) —
    month>7 → year else year-1 — then the A1 tally over it."""
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy(season("o_orderdate").alias("season")).agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "patch_season",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN 'O' ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_totalprice < 1000 THEN 0.0 ELSE o_totalprice END AS o_totalprice,
           o_orderpriority,
           CASE WHEN MONTH(o_orderdate) > 7 THEN YEAR(o_orderdate)
                ELSE YEAR(o_orderdate) - 1 END AS season
    FROM orders
    """,
)
def patch_season(spark, sf_dir):
    """P9/P10/F6/F12 merged (driver-window consolidation): the patch-by-
    predicate re-expression of R's in-place indexed update (ningaloo-etl.
    Rmd:83-84,202,289 — non-matching rows must survive bit-exactly, which is
    the hash-oracle's point) plus the fiscal-season watershed conditional
    (ningaloo-etl.Rmd:164-167,179; month>7 → year else year-1) as a per-row
    column. The standalone conditional_patch / season_watershed queries
    remain registered for the pytest oracle sweep."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority",
        "o_orderdate",
    )
    o = patch_where(o, F.col("o_orderstatus") == "P", o_orderstatus=F.lit("O"))
    o = patch_where(o, F.col("o_totalprice") < 1000, o_totalprice=F.lit(0.0))
    return o.withColumn("season", season("o_orderdate")).drop("o_orderdate")
