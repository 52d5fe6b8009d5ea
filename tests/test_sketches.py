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


def test_kmv_jaccard_converges_to_exact(spark):
    """KMV Jaccard estimates approach the exact pairwise Jaccard as k
    grows (consistency), and at k=256 every pair is within the sampling
    tolerance of its exact value."""
    from ningaloo_turtle_etl_spark.operators.curation import word_ngrams_from_tokens
    from ningaloo_turtle_etl_spark.operators.sketches import kmv_jaccard_pairs
    from ningaloo_turtle_etl_spark.operators.text import tokens as tok

    docs = load_table(spark, "documents", SF_DIR)
    sh = docs.select("lang", tok(F.lower(F.col("text"))).alias("toks")).select(
        "lang", F.explode(word_ngrams_from_tokens(F.col("toks"), 3)).alias("sh")
    )
    # exact pairwise jaccard via distinct-shingle self-join
    d = sh.distinct().cache()
    try:
        sizes = {r["lang"]: r["n"] for r in
                 d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        inter = {
            (r["la"], r["lb"]): r["n"]
            for r in d.alias("a")
            .join(d.alias("b"),
                  (F.col("a.sh") == F.col("b.sh")) & (F.col("a.lang") < F.col("b.lang")))
            .select(F.col("a.lang").alias("la"), F.col("b.lang").alias("lb"))
            .groupBy("la", "lb").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        for k, tol in ((256, 0.1), (2048, 0.02)):
            rows = kmv_jaccard_pairs(sh, "sh", "lang", k=k).collect()
            assert len(rows) == 10  # C(5 langs, 2)
            for r in rows:
                key = (r["group_a"], r["group_b"])
                ex = inter.get(key, 0) / (
                    sizes[key[0]] + sizes[key[1]] - inter.get(key, 0)
                )
                assert abs(r["jaccard_est"] - ex) < tol, (k, key, r["jaccard_est"], ex)
    finally:
        d.unpersist()


def test_kmv_sketch_bounded_and_mergeable(spark):
    """The sketch table is <= k rows per group, and the k-min of two merged
    sketches equals the k-min of the union's full hash set."""
    from ningaloo_turtle_etl_spark.operators.sketches import _h32, kmv_sketch

    li = load_table(spark, "lineitem", SF_DIR)
    k = 64
    sk = kmv_sketch(li, "l_orderkey", by=["l_returnflag"], k=k)
    per = {r["l_returnflag"]: r["n"] for r in
           sk.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == k for n in per.values())  # every flag has >> k distinct orders
    # merge two groups' sketches == sketch of the union
    merged = (
        sk.filter(F.col("l_returnflag").isin("A", "N"))
        .select("h32").distinct().orderBy("h32").limit(k).collect()
    )
    direct = (
        li.filter(F.col("l_returnflag").isin("A", "N"))
        .select(_h32("l_orderkey").alias("h32")).distinct()
        .orderBy("h32").limit(k).collect()
    )
    assert [r["h32"] for r in merged] == [r["h32"] for r in direct]


def test_portable_sketches_ignore_nulls(spark):
    """NULL values are excluded from every sketch path, matching
    countDistinct semantics — and a small non-default k uses the right
    (k-1)*2^32 numerator."""
    rows = [(i % 7 if i % 11 else None,) for i in range(400)]
    df = spark.createDataFrame(rows, "v int")
    from ningaloo_turtle_etl_spark.operators.sketches import (
        portable_kmv_estimate,
        portable_sketch_report,
    )

    r = portable_sketch_report(df.withColumn("g", F.lit(1)), "v", by=["g"]).collect()[0]
    assert r["exact_distinct"] == 7
    assert r["kmv_estimate"] == 7.0  # n < k exact fallback, nulls excluded
    assert r["hll_rel_err"] < 0.2
    # non-default k on a high-cardinality column: estimate within KMV bounds
    li = load_table(spark, "lineitem", SF_DIR)
    exact = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    est = portable_kmv_estimate(li, "l_orderkey", k=64).collect()[0]["kmv_raw"]
    assert abs(est - exact) / exact < 3 / (62 ** 0.5)  # 3 sigma of 1/sqrt(k-2)


def test_portable_binned_quantiles_accuracy_and_merge(spark):
    """Binned quantiles track exact percentiles within one bin of the value
    range, and histograms built on disjoint halves merge (bin-wise add)
    into the identical cumulative result as one pass."""
    from ningaloo_turtle_etl_spark.operators.sketches import (
        portable_binned_quantiles,
    )

    li = load_table(spark, "lineitem", SF_DIR)
    probs = (0.25, 0.5, 0.9)
    got = {
        (r["l_returnflag"], r["p"]): r["q_est"]
        for r in portable_binned_quantiles(
            li, "l_extendedprice", probs, by=["l_returnflag"]
        ).collect()
    }
    mn, mx = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).collect()[0]
    bin_width = (mx - mn) / 1024.0
    exact_rows = (
        li.groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice", F.array(*[F.lit(p) for p in probs])).alias("qs"))
        .collect()
    )
    for r in exact_rows:
        for p, qx in zip(probs, r["qs"]):
            assert abs(got[(r["l_returnflag"], p)] - qx) <= bin_width + 1e-6
    # merge: explicit-bounds histogram quantiles over two halves must equal
    # the single-pass result when given the same grid
    whole = portable_binned_quantiles(
        li, "l_extendedprice", (0.5,), lo=float(mn), hi=float(mx)
    ).collect()[0]["q_est"]
    # same grid, same data, but computed through a union of disjoint halves
    halves = li.filter(F.col("l_orderkey") % 2 == 0).unionByName(
        li.filter(F.col("l_orderkey") % 2 == 1)
    )
    merged = portable_binned_quantiles(
        halves, "l_extendedprice", (0.5,), lo=float(mn), hi=float(mx)
    ).collect()[0]["q_est"]
    assert merged == whole


def test_sampled_frequencies_accuracy_and_sample_pushdown(spark):
    """Heavy items from the 25% hash sample estimate within sampling error
    of exact counts, and the sample predicate evaluates before the token
    explode (the scan-side gate that makes this a ~rate-of-corpus pass)."""
    from ningaloo_turtle_etl_spark.operators.sketches import (
        sampled_item_frequencies,
    )
    from ningaloo_turtle_etl_spark.operators.text import tokens as tok

    docs = load_table(spark, "documents", SF_DIR)
    ex = docs.select("doc_id", F.explode(tok(F.lower(F.col("text")))).alias("t"))
    est = {
        r["item"]: r["est_n"]
        for r in sampled_item_frequencies(ex, "t", "doc_id", rate=0.25).collect()
    }
    exact = {
        r["t"]: r["n"]
        for r in ex.groupBy("t").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    heavy = {t: n for t, n in exact.items() if n >= 200}
    assert heavy, "test data should have heavy tokens"
    # Cluster-sampling variance: docs (not occurrences) are sampled, so
    # Var(est) = ((1-r)/r)·Σ_d c_d² over per-doc counts c_d.
    per_doc = (
        ex.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("t").agg(F.sum(F.col("c") * F.col("c")).alias("ss"))
    ).collect()
    ss = {r["t"]: r["ss"] for r in per_doc}
    for t, n in heavy.items():
        sd = ((1 - 0.25) / 0.25 * ss[t]) ** 0.5
        assert abs(est[t] - n) < 4 * sd, (t, est[t], n, sd)
    # plan: the md5 filter sits below the Generate (explode)
    plan = (
        sampled_item_frequencies(ex, "t", "doc_id", rate=0.25)
        ._jdf.queryExecution().executedPlan().toString()
    )
    gen = plan.find("Generate explode")
    assert gen != -1 and "md5" in plan[gen:], "sample gate must be under the explode"


def test_kmv_jaccard_plan_reuses_cached_sketch(spark):
    """The persisted sketch table backs all three references (group dim +
    both join sides) — the corpus-sized sketch pass must not appear three
    times in the physical plan."""
    from ningaloo_turtle_etl_spark.operators.cache import release_tracked_caches
    from ningaloo_turtle_etl_spark.operators.sketches import kmv_jaccard_pairs
    from ningaloo_turtle_etl_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, "lineitem", SF_DIR)
    try:
        df = kmv_jaccard_pairs(li, "l_orderkey", "l_returnflag", k=64)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 3
        df.collect()
    finally:
        assert release_tracked_caches() >= 1


def test_review_fixes_sampling_and_quantile_edges(spark):
    """Regression pins for the r04 review findings: rate>=1.0 keeps every
    row; a constant column yields the constant (no ANSI divide-by-zero);
    explicit-bounds outliers clamp into [lo, hi] on BOTH sides; p=0 is
    rejected up front."""
    import pytest

    from ningaloo_turtle_etl_spark.operators.sketches import (
        portable_binned_quantiles,
        sampled_item_frequencies,
    )

    df = spark.createDataFrame([(i, f"t{i % 3}") for i in range(40)], "id long, t string")
    full = sampled_item_frequencies(df, "t", "id", rate=1.0)
    assert sum(r["n_sample"] for r in full.collect()) == 40
    assert all(r["est_n"] == float(r["n_sample"]) for r in full.collect())

    const = spark.createDataFrame([(7.5,)] * 20, "v double")
    rows = portable_binned_quantiles(const, "v", (0.5, 1.0)).collect()
    assert [r["q_est"] for r in rows] == [7.5, 7.5]

    outl = spark.createDataFrame([(-100.0,)] + [(float(i),) for i in range(1, 10)], "v double")
    qs = {r["p"]: r["q_est"] for r in
          portable_binned_quantiles(outl, "v", (0.05, 0.95), lo=0.0, hi=10.0).collect()}
    assert 0.0 <= qs[0.05] <= 10.0 and 0.0 <= qs[0.95] <= 10.0

    with pytest.raises(ValueError, match=r"probabilities must be in \(0, 1\]"):
        portable_binned_quantiles(outl, "v", (0.0, 0.5))


def test_quantiles_all_null_column_returns_empty(spark):
    """All-NULL (or empty) input yields an empty result, not a crash — the
    defined degenerate behavior."""
    from ningaloo_turtle_etl_spark.operators.sketches import portable_binned_quantiles

    df = spark.createDataFrame([(None,)] * 5, "v double")
    assert portable_binned_quantiles(df, "v", (0.5,)).count() == 0


def test_portable_hll_rollup_from_finer_grouping(spark):
    """Registers at a coarse grain are the max-merge of registers at any
    finer grain — a profiling job sketches once at the finest grouping and
    derives every rollup without rescanning the corpus."""
    from ningaloo_turtle_etl_spark.operators.sketches import (
        portable_hll_estimate,
        portable_hll_registers,
    )

    docs = load_table(spark, "documents", SF_DIR)
    fine = portable_hll_registers(docs, "text", by=["lang", "source"])
    rolled = fine.groupBy("lang", "bucket").agg(F.max("mr").alias("mr"))
    direct = portable_hll_registers(docs, "text", by=["lang"])
    a = sorted(map(tuple, rolled.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b
    est_r = sorted(map(tuple, portable_hll_estimate(rolled, by=["lang"]).collect()))
    est_d = sorted(map(tuple, portable_hll_estimate(direct, by=["lang"]).collect()))
    assert est_r == est_d


def test_countmin_never_underestimates_and_is_exact_when_wide(spark):
    from ningaloo_turtle_etl_spark.operators.sketches import (
        countmin_estimate,
        countmin_table,
    )

    items = (
        ["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 7 + ["delta"] * 3
        + [f"tail{i}" for i in range(40)]
    )
    df = spark.createDataFrame([(t,) for t in items], "tok string")
    exact = {r["tok"]: r["n"] for r in df.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()}
    keys = df.select("tok").distinct()
    # narrow sketch: collisions expected, but never an underestimate
    cm = countmin_table(df, "tok", depth=4, width=8)
    est = {
        r["tok"]: r["cm_estimate"]
        for r in countmin_estimate(cm, keys, "tok", depth=4, width=8).collect()
    }
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)
    assert sum(est.values()) > sum(exact.values())  # width 8 << 44 distinct
    # wide sketch: every estimate exact
    cm_w = countmin_table(df, "tok", depth=4, width=4096)
    est_w = {
        r["tok"]: r["cm_estimate"]
        for r in countmin_estimate(cm_w, keys, "tok", depth=4, width=4096).collect()
    }
    assert est_w == exact


def test_countmin_merges_by_cellwise_addition(spark):
    from ningaloo_turtle_etl_spark.operators.sketches import countmin_table

    rows = [(f"t{i % 13}",) for i in range(300)]
    df = spark.createDataFrame(rows, "tok string")
    a = df.filter(F.col("tok") < "t5")
    b = df.filter(~(F.col("tok") < "t5"))
    whole = {
        (r["row"], r["col"]): r["n"]
        for r in countmin_table(df, "tok", depth=3, width=32).collect()
    }
    merged: dict = {}
    for part in (a, b):
        for r in countmin_table(part, "tok", depth=3, width=32).collect():
            merged[(r["row"], r["col"])] = merged.get((r["row"], r["col"]), 0) + r["n"]
    assert merged == whole


def test_countmin_absent_item_estimates_small(spark):
    from ningaloo_turtle_etl_spark.operators.sketches import (
        countmin_estimate,
        countmin_table,
    )

    df = spark.createDataFrame([(f"t{i}",) for i in range(20)], "tok string")
    cm = countmin_table(df, "tok", depth=4, width=1024)
    probe = spark.createDataFrame([("never-seen",)], "tok string")
    est = countmin_estimate(cm, probe, "tok", depth=4, width=1024).collect()[0]
    assert est["cm_estimate"] == 0


def test_rolling_distinct_hll_window_and_accuracy(spark):
    import datetime as dt

    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.sketches import (
        rolling_distinct_hll,
    )

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    # 10 days; day d has users [d*10, d*10+50) -> DAU 50; 7-day windows
    # overlap partially so WAU is a known union size
    for d in range(10):
        for u in range(d * 10, d * 10 + 50):
            rows.append((u, t0 + dt.timedelta(days=d, hours=1)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["day"].isoformat(): r for r in rolling_distinct_hll(df, "user_id", "ts").collect()}
    assert len(out) == 10
    first = out["2024-03-01"]
    assert first["dau_exact"] == 50 and first["wau_exact"] == 50
    # day 9 window covers days 3..9: users 30..140 -> 110 distinct
    last = out["2024-03-10"]
    assert last["dau_exact"] == 50 and last["wau_exact"] == 110
    assert last["stickiness"] == round(50 / 110, 6)
    # sketch accuracy: 256 registers -> stderr ~6.5%; allow 4 sigma
    for r in out.values():
        assert abs(r["wau_hll"] - r["wau_exact"]) / r["wau_exact"] < 0.26


def test_rolling_binned_quantile_vs_exact(spark):
    import numpy as np
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.sketches import (
        rolling_binned_quantile,
    )

    # 3 days x 300 values from a shifting uniform; window 2 days
    rng = np.random.default_rng(7)
    rows = []
    vals = {}
    for d, base in enumerate((10.0, 30.0, 50.0)):
        vs = (rng.random(300) * 40 + base).tolist()
        vals[d] = vs
        rows += [(f"2024-02-0{d+1} 12:00:00", float(v)) for v in vs]
    df = spark.createDataFrame(rows, "ts string, value double").select(
        F.to_timestamp("ts").alias("ts"), "value"
    )
    out = rolling_binned_quantile(
        df, "value", "ts", (0.5, 0.95), window_days=2,
        n_bins=1000, lo=0.0, hi=100.0,
    ).collect()
    got = {(str(r["day"]), r["p"]): r for r in out}
    assert len(got) == 6
    # day 3 window = days 2+3 pooled; bin width 0.1 bounds the rank error
    pooled = sorted(vals[1] + vals[2])
    for p in (0.5, 0.95):
        est = got[("2024-02-03", p)]["q_est"]
        exact = float(np.quantile(pooled, p))
        assert abs(est - exact) < 0.2, (p, est, exact)
    assert got[("2024-02-03", 0.5)]["n_rows"] == 600
    # day 1 window is itself only
    assert got[("2024-02-01", 0.5)]["n_rows"] == 300
