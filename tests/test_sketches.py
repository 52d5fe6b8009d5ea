"""Sketch-operator tests: error bounds vs exact answers on real testdata —
the guarantee that lets the approximations replace exact shuffles at scale."""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    distinct_vs_approx_report,
    heavy_hitters,
)
from ningaloo_turtle_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_approx_distinct_within_rsd_bound(spark):
    ev = load_table(spark, "events", SF_DIR)
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx = approx_distinct(ev, "user_id", rsd=0.02).collect()[0][0]
    assert abs(approx - exact) / exact < 3 * 0.02  # 3 sigma of the HLL rsd


def test_approx_distinct_grouped_report(spark):
    ev = load_table(spark, "events", SF_DIR)
    rows = distinct_vs_approx_report(ev, "user_id", by=["event_type"], rsd=0.02).collect()
    assert len(rows) > 0
    assert all(r["rel_error"] < 0.06 for r in rows)


def test_approx_quantiles_rank_error(spark):
    li = load_table(spark, "lineitem", SF_DIR)
    qs = approx_quantiles(
        li, "l_extendedprice", probabilities=(0.5,), accuracy=10_000
    ).collect()[0][0]
    # Compare against the exact median by rank position.
    n = li.count()
    below = li.filter(F.col("l_extendedprice") <= qs[0]).count()
    assert abs(below / n - 0.5) < 0.01  # rank error ≤ 1/accuracy + slack


def test_heavy_hitters_no_false_negatives(spark):
    docs = load_table(spark, "documents", SF_DIR)
    n = docs.count()
    truly_frequent = {
        r["lang"]
        for r in docs.groupBy("lang").count().filter(F.col("count") > 0.2 * n).collect()
    }
    got = set(heavy_hitters(docs, ["lang"], support=0.2).collect()[0][0])
    assert truly_frequent <= got  # KPS may over-report, never under


# --- portable (cross-engine) sketches ---------------------------------------

def test_portable_sketch_errors_within_bounds(spark):
    from ningaloo_turtle_etl_spark.operators.sketches import portable_sketch_report

    li = load_table(spark, "lineitem", SF_DIR)
    rows = portable_sketch_report(li, "l_orderkey", by=["l_returnflag"]).collect()
    assert len(rows) == 3
    for r in rows:
        # 3 sigma of 1.04/sqrt(256) ~ 19.5% (HLL), 1/sqrt(254) ~ 18.8% (KMV)
        assert r["hll_rel_err"] < 0.195, r
        assert r["kmv_rel_err"] < 0.19, r


def test_portable_hll_matches_numpy_reference(spark):
    """The Spark register/estimate math reproduces a from-scratch Python HLL
    over the same md5 hash family — engine-independent ground truth."""
    import hashlib

    from ningaloo_turtle_etl_spark.operators.sketches import (
        portable_hll_estimate,
        portable_hll_registers,
    )

    li = load_table(spark, "lineitem", SF_DIR)
    got = {
        r["l_returnflag"]: r["hll_raw"]
        for r in portable_hll_estimate(
            portable_hll_registers(li, "l_orderkey", by=["l_returnflag"]),
            by=["l_returnflag"],
        ).collect()
    }
    data = li.select("l_returnflag", "l_orderkey").distinct().collect()
    by_flag: dict[str, set[int]] = {}
    for r in data:
        h = int(hashlib.md5(str(r["l_orderkey"]).encode()).hexdigest()[:8], 16)
        by_flag.setdefault(r["l_returnflag"], set()).add(h)
    for flag, hashes in by_flag.items():
        regs = [0] * 256
        for h in hashes:
            b, w = h >> 24, h & 0xFFFFFF
            rho = 25 if w == 0 else 25 - w.bit_length()
            regs[b] = max(regs[b], rho)
        sum_inv = sum(2.0 ** -m for m in regs)
        expected = 47072.71267120224 / sum_inv
        assert abs(got[flag] - expected) < 1e-9, flag


def test_portable_hll_registers_merge(spark):
    """Sketch state is mergeable: registers built on two disjoint halves,
    merged by max, give the identical estimate to one pass over the union —
    the property that lets 1000 executors (or two engines) each sketch their
    shard."""
    from ningaloo_turtle_etl_spark.operators.sketches import (
        portable_hll_estimate,
        portable_hll_registers,
    )

    li = load_table(spark, "lineitem", SF_DIR)
    whole = portable_hll_estimate(
        portable_hll_registers(li, "l_orderkey"), by=[]
    ).collect()[0]["hll_raw"]
    lo = portable_hll_registers(li.filter(F.col("l_orderkey") % 2 == 0), "l_orderkey")
    hi = portable_hll_registers(li.filter(F.col("l_orderkey") % 2 == 1), "l_orderkey")
    merged = (
        lo.unionByName(hi).groupBy("bucket").agg(F.max("mr").alias("mr"))
    )
    merged_est = portable_hll_estimate(merged, by=[]).collect()[0]["hll_raw"]
    assert merged_est == whole


def test_portable_low_cardinality_branches(spark):
    """events.user_id (~150 distinct) exercises the branches the registered
    query's data never hits: HLL falls to linear counting (E <= 2.5m with
    empty registers) and KMV to its exact-count fallback (n < k)."""
    import hashlib

    from ningaloo_turtle_etl_spark.operators.sketches import portable_sketch_report

    ev = load_table(spark, "events", SF_DIR)
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    assert exact < 256  # precondition for both branches
    row = portable_sketch_report(ev.withColumn("g", F.lit(1)), "user_id", by=["g"]
                                 ).collect()[0]
    # KMV sketch holds everything -> exact.
    assert row["kmv_estimate"] == float(exact)
    # Linear counting: m * ln(m / zero-registers), vs python reference.
    import math

    hashes = {
        int(hashlib.md5(str(r["user_id"]).encode()).hexdigest()[:8], 16)
        for r in ev.select("user_id").distinct().collect()
    }
    occupied = {h >> 24 for h in hashes}
    zeros = 256 - len(occupied)
    expected = round(256.0 * math.log(256.0 / zeros), 4)
    assert row["hll_estimate"] == expected
    assert row["hll_rel_err"] < 0.2


def test_portable_kmv_window_input_is_gated_and_dim_broadcast(spark):
    """Pin the scale shape: the kth-min window reads only hashes under the
    broadcast per-group threshold, never the full distinct hash set."""
    from ningaloo_turtle_etl_spark.operators.sketches import portable_kmv_estimate

    li = load_table(spark, "lineitem", SF_DIR)
    df = portable_kmv_estimate(li, "l_orderkey", by=["l_returnflag"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "_kmv_t" in plan  # threshold gate present below the window
    w = plan.find("Window")
    assert w != -1 and "_kmv_t" in plan[w:], "gate must be under the window"
