"""Statistical layer vs numpy reference implementations (M1-M7)."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from ningaloo_turtle_etl_spark.stats import (
    correlation_matrix,
    fit_rda,
    forward_select,
    hellinger,
    pcnm_scores,
    variation_partition,
    with_residuals,
)


def _toy_regression(spark, n=200, seed=3):
    rng = np.random.RandomState(seed)
    x1 = rng.randn(n)
    x2 = rng.randn(n)
    noise = 0.1 * rng.randn(n)
    y = 2.0 + 1.5 * x1 - 0.7 * x2 + noise
    y2 = -1.0 + 0.5 * x1 + noise
    rows = [(float(a), float(b), float(c), float(d)) for a, b, c, d in zip(x1, x2, y, y2)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double, y2 double")
    return df, np.column_stack([np.ones(n), x1, x2]), np.column_stack([y, y2])


def test_fit_rda_matches_numpy_lstsq(spark):
    df, X, Y = _toy_regression(spark)
    coef, r2 = fit_rda(df, ["y", "y2"], ["x1", "x2"])
    expect, *_ = np.linalg.lstsq(X, Y, rcond=None)
    assert np.allclose(coef, expect, atol=1e-8)
    assert r2[0] > 0.95 and r2[1] > 0.9


def test_residuals_orthogonal_to_predictors(spark):
    df, _, _ = _toy_regression(spark)
    coef, _ = fit_rda(df, ["y"], ["x1", "x2"])
    resid = with_residuals(df, ["y"], ["x1", "x2"], coef)
    checks = resid.agg(
        F.avg("y_resid").alias("mean"),
        F.corr("y_resid", "x1").alias("c1"),
        F.corr("y_resid", "x2").alias("c2"),
    ).collect()[0]
    assert abs(checks["mean"]) < 1e-9
    assert abs(checks["c1"]) < 1e-7 and abs(checks["c2"]) < 1e-7


def test_hellinger_rows_have_unit_norm(spark):
    df = spark.createDataFrame(
        [(4, 1, 0), (0, 0, 0), (2, 2, 2)], "a int, b int, c int"
    )
    h = hellinger(df, ["a", "b", "c"]).collect()
    for r in h[:1] + h[2:]:
        assert abs(r["a"] ** 2 + r["b"] ** 2 + r["c"] ** 2 - 1.0) < 1e-9
    assert h[1]["a"] == 0.0  # zero-total row


def test_forward_select_prefers_true_predictor(spark):
    rng = np.random.RandomState(5)
    n = 300
    x_signal = rng.randn(n)
    x_noise1, x_noise2 = rng.randn(n), rng.randn(n)
    y = 3 * x_signal + 0.05 * rng.randn(n)
    df = spark.createDataFrame(
        [tuple(map(float, t)) for t in zip(x_signal, x_noise1, x_noise2, y)],
        "xs double, xn1 double, xn2 double, y double",
    )
    chosen = forward_select(df, ["y"], ["xn1", "xs", "xn2"], max_vars=3)
    assert chosen[0] == "xs"
    assert len(chosen) <= 2  # noise vars add ~nothing


def test_variation_partition_fractions_sum_to_one(spark):
    df, _, _ = _toy_regression(spark)
    parts = variation_partition(df, ["y"], ["x1"], ["x2"])
    assert abs(sum(parts.values()) - 1.0) < 1e-9
    assert parts["a_pure_x"] > 0.5  # x1 dominates y
    assert parts["d_unexplained"] < 0.1


def test_pcnm_scores_join_back(spark):
    # 2x3 grid of coords, several rows per coord → scores constant per coord.
    rows = [(i, float(i % 2), float(i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, gx double, gy double")
    scored = pcnm_scores(df, ["gx", "gy"], n_vectors=2)
    assert "PCNM1" in scored.columns
    per_coord = scored.groupBy("gx", "gy").agg(
        F.countDistinct(F.round("PCNM1", 9)).alias("k")
    ).collect()
    assert all(r["k"] == 1 for r in per_coord)
    # Eigenvector scores are centered: mean over distinct coords ≈ 0.
    distinct = scored.select("gx", "gy", "PCNM1").distinct().collect()
    assert abs(sum(r["PCNM1"] for r in distinct)) < 1e-8


def test_correlation_matrix_symmetry(spark):
    df, _, _ = _toy_regression(spark)
    m = correlation_matrix(df, ["x1", "x2", "y"])
    assert np.allclose(m, m.T)
    assert m[0, 2] > 0.7  # y strongly driven by x1


def test_correlation_matrix_matches_per_pair_corr(spark):
    # One ml.stat.Correlation pass must agree with Spark's pairwise corr.
    df, _, _ = _toy_regression(spark)
    cols = ["x1", "x2", "y"]
    m = correlation_matrix(df, cols)
    for i in range(3):
        for j in range(i + 1, 3):
            assert abs(m[i, j] - df.stat.corr(cols[i], cols[j])) < 1e-9


def test_correlation_matrix_is_single_pass(spark):
    # The round-1 form ran one job per column pair; the matrix form must not
    # scale job count with k². VectorAssembler+Correlation costs a bounded
    # number of jobs (< k*(k-1)/2 for k=4 ⇒ < 6).
    df, _, _ = _toy_regression(spark)
    df = df.withColumn("x3", F.col("x1") + F.col("x2"))
    sc = spark.sparkContext
    sc.setJobGroup("corr-one-pass", "corr job count probe")
    try:
        correlation_matrix(df, ["x1", "x2", "x3", "y"])
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("corr-one-pass")
    assert 0 < len(jobs) < 6


def test_pcnm_scores_cardinality_guard(spark):
    # High-cardinality coordinates must fail fast, not OOM the driver.
    df = spark.range(200).select(
        F.col("id"), F.col("id").cast("double").alias("gx"),
        (F.col("id") * 2).cast("double").alias("gy"),
    )
    with pytest.raises(ValueError, match="distinct coordinate"):
        pcnm_scores(df, ["gx", "gy"], n_vectors=2, max_sites=100)


def test_forward_select_trace_matches_numpy_reference(spark):
    # The per-step bookkeeping (M4's driver row) must reproduce R² values
    # an independent numpy OLS computes, and flag the same greedy picks.
    from ningaloo_turtle_etl_spark.stats import forward_select_trace

    rng = np.random.RandomState(11)
    n = 250
    xs, xn1, xn2 = rng.randn(n), rng.randn(n), rng.randn(n)
    y = 2 * xs + 0.5 * xn1 + 0.1 * rng.randn(n)
    df = spark.createDataFrame(
        [tuple(map(float, t)) for t in zip(xs, xn1, xn2, y)],
        "xs double, xn1 double, xn2 double, y double",
    )
    trace = {
        (r["step"], r["candidate"]): (r["mean_r2"], r["chosen"])
        for r in forward_select_trace(df, ["y"], ["xs", "xn1", "xn2"], steps=2).collect()
    }
    cols = {"xs": xs, "xn1": xn1, "xn2": xn2}

    def np_r2(feature_names):
        X = np.column_stack([np.ones(n)] + [cols[f] for f in feature_names])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        resid = y - X @ beta
        return 1 - (resid**2).sum() / ((y - y.mean()) ** 2).sum()

    for c in ("xs", "xn1", "xn2"):
        assert abs(trace[(1, c)][0] - round(np_r2([c]), 6)) < 2e-6
    assert trace[(1, "xs")][1] is True  # signal var picked first
    for c in ("xn1", "xn2"):
        assert abs(trace[(2, c)][0] - round(np_r2(["xs", c]), 6)) < 2e-6
    assert trace[(2, "xn1")][1] is True  # true secondary predictor next


def test_ks_test_pairs_matches_bruteforce(spark):
    from ningaloo_turtle_etl_spark.operators.trend import ks_test_pairs

    rows = (
        [("a", float(v)) for v in [1, 2, 2, 3, 5, 8]]
        + [("b", float(v)) for v in [2, 3, 3, 4, 9]]
        + [("c", float(v)) for v in [100, 101]]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        (r["group_a"], r["group_b"]): r
        for r in ks_test_pairs(df, "g", "v").collect()
    }

    def brute(xs, ys):
        pts = sorted(set(xs) | set(ys))
        return max(
            abs(
                sum(1 for x in xs if x <= p) / len(xs)
                - sum(1 for y in ys if y <= p) / len(ys)
            )
            for p in pts
        )

    samples = {"a": [1, 2, 2, 3, 5, 8], "b": [2, 3, 3, 4, 9], "c": [100, 101]}
    for (ga, gb), r in out.items():
        assert abs(r["ks_d"] - round(brute(samples[ga], samples[gb]), 6)) < 1e-9
        assert r["n_a"] == len(samples[ga]) and r["n_b"] == len(samples[gb])
    assert out[("a", "c")]["ks_d"] == 1.0  # disjoint supports
    assert len(out) == 3


def test_wasserstein_pairs_matches_bruteforce(spark):
    from ningaloo_turtle_etl_spark.operators.trend import wasserstein_pairs

    samples = {
        "a": [0.0, 1.0],
        "b": [2.0, 3.0],          # pure shift of a by +2 -> W1 = 2
        "c": [0.0, 1.0],          # identical to a -> W1 = 0
        "d": [1.0, 2.0, 2.0, 5.0],
    }
    rows = [(g, v) for g, vs in samples.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        (r["group_a"], r["group_b"]): r
        for r in wasserstein_pairs(df, "g", "v").collect()
    }
    assert out[("a", "b")]["w1"] == 2.0  # mean shift exactly
    assert out[("a", "c")]["w1"] == 0.0  # identical distributions

    def brute(xs, ys):
        pts = sorted(set(xs) | set(ys))
        tot = 0.0
        for p, p_next in zip(pts, pts[1:]):
            fa = sum(1 for x in xs if x <= p) / len(xs)
            fb = sum(1 for y in ys if y <= p) / len(ys)
            tot += (p_next - p) * abs(fa - fb)
        return tot

    for (ga, gb), r in out.items():
        assert abs(r["w1"] - round(brute(samples[ga], samples[gb]), 6)) < 1e-9
        assert r["n_a"] == len(samples[ga]) and r["n_b"] == len(samples[gb])
    assert len(out) == 6
    # KS saturates at 1.0 for any disjoint pair; W1 keeps measuring the gap
    far = spark.createDataFrame(
        [("a", 0.0), ("z", 1000.0)], "g string, v double"
    )
    assert wasserstein_pairs(far, "g", "v").collect()[0]["w1"] == 1000.0


def test_poisson_bootstrap_matches_python_replica(spark):
    import hashlib
    import math

    from ningaloo_turtle_etl_spark.operators.trend import (
        _POISSON1_CDF,
        poisson_bootstrap_mean_ci,
    )

    rows = [(i, "g", float(10 + (i * 7) % 13)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, grp string, value double")
    B = 24
    got = poisson_bootstrap_mean_ci(
        df, "value", "grp", "id", replicates=B
    ).collect()[0]

    def u(i, b):
        h = hashlib.md5(f"{i}#{b}".encode()).hexdigest()[:8]
        return int(h, 16) / 2**32

    means = []
    for b in range(B):
        num = den = 0
        for i, _, v in rows:
            w = sum(1 for t in _POISSON1_CDF if u(i, b) >= t)
            den += w
            num += w * round(v * 100)
        if den > 0:
            means.append(num / (den * 100.0))
    means.sort()
    lo = means[max(1, math.ceil(0.025 * B)) - 1]
    hi = means[math.ceil(0.975 * B) - 1]
    assert got["ci_lo"] == round(lo, 6) and got["ci_hi"] == round(hi, 6)
    assert got["n"] == 40
    assert got["ci_lo"] <= got["mean_value"] <= got["ci_hi"]


def test_poisson_bootstrap_small_group_ranks_actual_replicates(spark):
    """A 1-row group drops ~37% of replicates to zero total weight; ranks
    must be taken against the SURVIVING replicate count, not the nominal
    `replicates`, or the upper-rank row doesn't exist and the CI silently
    collapses to [lo, lo]."""
    import hashlib
    import math

    from ningaloo_turtle_etl_spark.operators.trend import (
        _POISSON1_CDF,
        poisson_bootstrap_mean_ci,
    )

    rows = [(0, "tiny", 5.0), (1, "tiny", 9.0)]
    df = spark.createDataFrame(rows, "id long, grp string, value double")
    B = 50
    got = poisson_bootstrap_mean_ci(
        df, "value", "grp", "id", replicates=B
    ).collect()[0]

    def u(i, b):
        h = hashlib.md5(f"{i}#{b}".encode()).hexdigest()[:8]
        return int(h, 16) / 2**32

    means = []
    for b in range(B):
        num = den = 0
        for i, _, v in rows:
            w = sum(1 for t in _POISSON1_CDF if u(i, b) >= t)
            den += w
            num += w * round(v * 100)
        if den > 0:
            means.append(num / (den * 100.0))
    means.sort()
    m = len(means)
    assert 0 < m < B  # the scenario actually exercises dropped replicates
    assert math.ceil(0.975 * B) > m  # nominal hi rank row would not exist
    lo = means[max(1, math.ceil(0.025 * m)) - 1]
    hi = means[math.ceil(0.975 * m) - 1]
    assert got["ci_lo"] == round(lo, 6) and got["ci_hi"] == round(hi, 6)
    assert got["ci_hi"] > got["ci_lo"]  # the bug collapsed these equal


def test_cuped_lift_matches_numpy_reference(spark):
    import numpy as np

    from ningaloo_turtle_etl_spark.operators.trend import cuped_lift

    rng = np.random.RandomState(11)
    n = 300
    x = rng.randint(0, 100, size=n)
    arm = np.where(np.arange(n) % 2 == 0, "t", "c")
    # metric correlated with covariate + a true treatment effect of 2
    y = np.round(0.5 * x + rng.normal(0, 5, n) + np.where(arm == "t", 2, 0), 2)
    rows = [(int(xi), float(yi), str(a)) for xi, yi, a in zip(x, y, arm)]
    df = spark.createDataFrame(rows, "k int, value double, arm string")
    got = cuped_lift(df, "value", "k", "arm", "t", "c").collect()[0]

    yc_ = np.round(y * 100).astype(np.int64)  # replicate the cent scaling
    theta = (
        (n * (x * yc_).sum() - x.sum() * yc_.sum())
        / float(n * (x * x).sum() - x.sum() ** 2)
        / 100
    )
    xbar = x.mean()
    t_m, c_m = arm == "t", arm == "c"
    adj = lambda m: yc_[m].mean() / 100 - theta * (x[m].mean() - xbar)
    assert got["lift_adjusted"] == round(adj(t_m) - adj(c_m), 6)
    assert got["theta"] == round(theta, 6)
    assert got["n_treatment"] == t_m.sum() and got["n_control"] == c_m.sum()
    # CUPED must tighten, not move, the estimate: both near the true effect,
    # and the achieved variance reduction equals corr^2 (strong here)
    assert abs(got["lift_adjusted"] - 2) < 1.5
    assert 0.5 < got["var_reduction"] < 1.0


def test_eventually_follows_hand_matrix(spark):
    import datetime as dt

    from ningaloo_turtle_etl_spark.operators.temporal import (
        eventually_follows,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, off, typ):
        return (uid, t0 + dt.timedelta(seconds=off), typ)

    rows = [
        ev(1, 0, "a"), ev(1, 10, "b"),    # a before b
        ev(2, 0, "a"), ev(2, 5, "b"), ev(2, 8, "a"),  # firsts: a<b
        ev(3, 0, "b"), ev(3, 10, "a"),    # b before a
        ev(4, 0, "a"), ev(4, 0, "b"),     # tie: neither direction
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        (r["type_a"], r["type_b"]): r
        for r in eventually_follows(df).collect()
    }
    assert out[("a", "b")]["n_keys"] == 2
    assert out[("b", "a")]["n_keys"] == 1
    assert out[("a", "b")]["frac"] == 0.5  # 2 of 4 users with both


def test_kaplan_meier_hand_curve(spark):
    import datetime as dt

    from ningaloo_turtle_etl_spark.operators.trend import (
        kaplan_meier_conversion,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, day, typ):
        return (uid, t0 + dt.timedelta(days=day), typ)

    rows = [
        # u1 converts at t=1, u2 at t=2, u3 never (censored at horizon t=4)
        ev(1, 0, "view"), ev(1, 1, "purchase"),
        ev(2, 0, "view"), ev(2, 2, "purchase"),
        ev(3, 1, "view"),
        ev(9, 5, "click"),  # horizon-setting noise, never at risk
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["t_days"]: r for r in kaplan_meier_conversion(df).collect()}
    # at t=1: 3 at risk, 1 converts -> S = 2/3
    assert out[1]["n_risk"] == 3 and out[1]["n_events"] == 1
    assert out[1]["survival"] == round(2 / 3, 6)
    # at t=2: 2 at risk, 1 converts -> S = 2/3 * 1/2 = 1/3
    assert out[2]["survival"] == round(1 / 3, 6)
    # u3 censored at horizon (day5 - day1 = 4): S unchanged by censoring
    assert out[4]["n_censored"] == 1 and out[4]["n_events"] == 0
    assert out[4]["survival"] == round(1 / 3, 6)
    # purchase before first view never counts as conversion
    early = spark.createDataFrame(
        [ev(7, 0, "purchase"), ev(7, 1, "view")],
        "user_id long, ts timestamp, event_type string",
    )
    got = kaplan_meier_conversion(early).collect()
    assert all(r["n_events"] == 0 for r in got)


def test_gini_concentration_known_values(spark):
    from ningaloo_turtle_etl_spark.operators.scale import gini_concentration

    # uniform counts -> 0
    rows = [(i, chr(65 + i % 4)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, src string")
    assert gini_concentration(df, "src").collect()[0]["gini"] == 0.0
    # masses [1, 3] -> sum|xi-xj| / (2 n^2 mu) = 4/16 = 0.25
    w = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 3)], "id long, src string, wgt int"
    )
    r = gini_concentration(w, "src", weight_col="wgt").collect()[0]
    assert r["gini"] == 0.25 and r["total_rows"] == 4 and r["n_keys"] == 2


def test_chi2_independence_known_table(spark):
    from ningaloo_turtle_etl_spark.operators.trend import chi2_independence

    # classic 2x2: O = [[10, 20], [20, 10]]; margins 30/30, cols 30/30,
    # E = 15 everywhere -> chi2 = 4 * 25/15 = 6.666667
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20
        + [("y", "p")] * 20 + [("y", "q")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    assert r["chi2"] == round(4 * 25 / 15, 6)
    assert r["dof"] == 1 and r["n_rows"] == 60 and r["n_cells"] == 4
    # Cramer's V = sqrt(chi2 / (n * (min(k)-1))) = sqrt(6.6667/60)
    assert r["cramers_v"] == round(math.sqrt((4 * 25 / 15) / 60), 6)
    # independent table -> chi2 == 0
    ind = spark.createDataFrame(
        [("x", "p")] * 6 + [("x", "q")] * 2 + [("y", "p")] * 3 + [("y", "q")],
        "a string, b string",
    )
    r0 = chi2_independence(ind, "a", "b").collect()[0]
    assert r0["chi2"] == 0.0 and r0["cramers_v"] == 0.0


def test_did_lift_hand_computed(spark):
    from ningaloo_turtle_etl_spark.operators.trend import did_lift

    # treatment: 10 -> 14 (+4); control: 20 -> 21 (+1); DiD = +3
    rows = (
        [("t", 0, 10.0)] * 3 + [("t", 1, 14.0)] * 2
        + [("c", 0, 20.0)] * 4 + [("c", 1, 21.0)] * 5
    )
    df = spark.createDataFrame(rows, "arm string, post int, value double")
    r = did_lift(
        df, "value", "arm", F.col("post") == 1, "t", "c"
    ).collect()[0]
    assert r["did"] == 3.0
    assert (r["pre_t"], r["post_t"], r["pre_c"], r["post_c"]) == (
        10.0, 14.0, 20.0, 21.0,
    )
    assert (r["n_pre_t"], r["n_post_t"], r["n_pre_c"], r["n_post_c"]) == (
        3, 2, 4, 5,
    )


def test_mann_whitney_hand_computed(spark):
    from ningaloo_turtle_etl_spark.operators.trend import mann_whitney_u

    # t = [1,2,3], c = [2,3,4]: midranks 1, 2.5, 2.5, 4.5, 4.5, 6;
    # R_t = 8, U = 8 - 6 = 2; ties sum = 12;
    # sigma^2 = (9/12) * (7 - 12/30) = 4.95
    rows = [("t", 1.0), ("t", 2.0), ("t", 3.0),
            ("c", 2.0), ("c", 3.0), ("c", 4.0)]
    df = spark.createDataFrame(rows, "arm string, v double")
    r = mann_whitney_u(df, "v", "arm", "t", "c").collect()[0]
    assert r["n_treat"] == 3 and r["n_control"] == 3
    assert r["u_stat"] == 2.0
    assert r["z"] == round((2 - 4.5) / math.sqrt(4.95), 6)
    # identical samples -> U = n1*n2/2, z = 0
    same = spark.createDataFrame(
        [("t", float(i)) for i in range(4)]
        + [("c", float(i)) for i in range(4)],
        "arm string, v double",
    )
    r2 = mann_whitney_u(same, "v", "arm", "t", "c").collect()[0]
    assert r2["u_stat"] == 8.0 and r2["z"] == 0.0


def test_theil_sen_outlier_robust(spark):
    from ningaloo_turtle_etl_spark.operators.trend import theil_sen_trend

    # g1: y = 2x with one wild outlier at x=4 -> slope stays 2, b = 0.
    # g2: clean y = 3x + 1.
    rows = [("g1", 0.0, 0.0), ("g1", 1.0, 2.0), ("g1", 2.0, 4.0),
            ("g1", 3.0, 6.0), ("g1", 4.0, 100.0)] + [
        ("g2", float(x), 3.0 * x + 1) for x in range(4)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in theil_sen_trend(df, "g", "x", "y").collect()}
    assert got["g1"]["slope"] == 2.0 and got["g1"]["intercept"] == 0.0
    assert got["g1"]["n_points"] == 5 and got["g1"]["n_pairs"] == 10
    assert got["g2"]["slope"] == 3.0 and got["g2"]["intercept"] == 1.0


def test_seasonal_profile_two_cells(spark):
    from ningaloo_turtle_etl_spark.operators.trend import seasonal_profile

    # 2024-01-01 is a Monday (Spark dow = 2).
    rows = [("2024-01-01 10:00:00", 1.0), ("2024-01-01 10:30:00", 2.0),
            ("2024-01-08 10:15:00", 3.0), ("2024-01-02 11:00:00", 8.0)]
    df = spark.createDataFrame(rows, "ts string, value double").select(
        F.to_timestamp("ts").alias("ts"), "value"
    )
    got = {(r["dow"], r["hour"]): r
           for r in seasonal_profile(df, "ts", "value").collect()}
    mon = got[(2, 10)]
    assert mon["n_events"] == 3 and mon["share"] == 0.75
    assert mon["count_index"] == 1.5 and mon["value_mean"] == 2.0
    assert mon["value_index"] == round(2.0 / 3.5, 6)
    tue = got[(3, 11)]
    assert tue["n_events"] == 1 and tue["count_index"] == 0.5
    assert tue["value_index"] == round(8.0 / 3.5, 6)
    # count-only mode drops the value columns
    out = seasonal_profile(df, "ts")
    assert "value_mean" not in out.columns and "value_index" not in out.columns


def test_mutual_information_known_tables(spark):
    from ningaloo_turtle_etl_spark.operators.trend import mutual_information

    # perfect association: a determines b -> MI = H = ln 2, NMI = 1
    det = spark.createDataFrame(
        [("x", "p")] * 10 + [("y", "q")] * 10, "a string, b string"
    )
    r = mutual_information(det, "a", "b").collect()[0]
    ln2 = round(math.log(2), 6)
    assert r["mi"] == ln2 and r["h_a"] == ln2 and r["h_b"] == ln2
    assert r["nmi"] == 1.0 and r["n_rows"] == 20
    # independence -> MI = 0
    ind = spark.createDataFrame(
        [("x", "p")] * 6 + [("x", "q")] * 6 + [("y", "p")] * 3
        + [("y", "q")] * 3,
        "a string, b string",
    )
    r0 = mutual_information(ind, "a", "b").collect()[0]
    assert r0["mi"] == 0.0 and r0["nmi"] == 0.0


def test_classifier_calibration_hand_computed(spark):
    from ningaloo_turtle_etl_spark.operators.classify import (
        classifier_calibration,
    )

    rows = [(0.1, 0), (0.1, 1), (0.95, 1), (1.0, 1)]
    df = spark.createDataFrame(rows, "p double, y int")
    got = {r["bin"]: r for r in
           classifier_calibration(df, "p", "y", n_bins=10).collect()}
    assert set(got) == {1, 9}  # p = 1.0 folds into the top bin
    assert got[1]["n"] == 2 and got[1]["mean_pred"] == 0.1
    assert got[1]["frac_pos"] == 0.5
    assert got[9]["mean_pred"] == 0.975 and got[9]["frac_pos"] == 1.0
    # ECE = (2*|0.5-0.1| + 2*|1.0-0.975|) / 4
    assert got[1]["ece"] == got[9]["ece"] == round((2 * 0.4 + 2 * 0.025) / 4, 6)


def test_audience_overlap_pairs(spark):
    from ningaloo_turtle_etl_spark.operators.relational import (
        audience_overlap,
    )

    rows = (
        [("A", u) for u in (1, 2, 3)]
        + [("B", u) for u in (2, 3, 4)]
        + [("C", 9), ("C", 9)]  # duplicate membership rows collapse
    )
    df = spark.createDataFrame(rows, "seg string, uid long")
    out = audience_overlap(df, "seg", "uid").collect()
    # zero-overlap pairs (A,C), (B,C) drop out of the inner tally
    assert len(out) == 1
    r = out[0]
    assert (r["segment_a"], r["segment_b"]) == ("A", "B")
    assert r["n_a"] == 3 and r["n_b"] == 3 and r["n_both"] == 2
    assert r["jaccard"] == 0.5 and r["overlap_coef"] == round(2 / 3, 6)


def test_seasonal_anomaly_scan_hand_computed(spark):
    from ningaloo_turtle_etl_spark.operators.trend import (
        seasonal_anomaly_scan,
    )

    # two Mondays, hour 9: 10 then 30 events -> baseline 20; one
    # Wednesday hour 0 with 5 events (its own baseline) -> ratio 1.
    rows = (
        [("2024-01-01 09:%02d:00" % (i % 60),) for i in range(10)]
        + [("2024-01-08 09:%02d:00" % (i % 60),) for i in range(30)]
        + [("2024-01-03 00:%02d:00" % i,) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "ts string").select(
        F.to_timestamp("ts").alias("ts")
    )
    out = seasonal_anomaly_scan(df, "ts", top_n=10).collect()
    got = {(str(r["d"]), r["hour"]): r for r in out}
    lo = got[("2024-01-01", 9)]
    assert lo["expected"] == 20.0 and lo["log_ratio"] == round(
        math.log(0.5), 6
    )
    hi = got[("2024-01-08", 9)]
    assert hi["log_ratio"] == round(math.log(1.5), 6)
    assert got[("2024-01-03", 0)]["log_ratio"] == 0.0
    # ranked by |log_ratio|: the dip outranks the spike
    assert (str(out[0]["d"]), out[0]["hour"]) == ("2024-01-01", 9)


def test_trimmed_mean_exact_band(spark):
    from ningaloo_turtle_etl_spark.operators.trend import trimmed_mean

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(101)], "g string, v double"
    )
    r = trimmed_mean(df, "g", "v", frac=0.05).collect()[0]
    assert r["lo_cut"] == 5.0 and r["hi_cut"] == 95.0
    assert r["n_rows"] == 101 and r["n_kept"] == 91
    assert r["trimmed_mean"] == 50.0


def test_contrastive_negatives_deterministic(spark):
    import hashlib as _h

    from ningaloo_turtle_etl_spark.operators.selection import (
        contrastive_negatives,
    )

    rows = [(i, "abc"[i % 3]) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = contrastive_negatives(df, "doc_id", "source", k=2, pool_n=100)
    a = sorted(map(tuple, out.collect()))
    assert a == sorted(map(tuple, out.collect()))  # retry-stable
    per = {}
    grp = dict(rows)
    for anchor, neg, rank in a:
        assert grp[anchor] != grp[neg]  # never an in-group negative
        per.setdefault(anchor, []).append((rank, neg))
    assert all(len(v) == 2 for v in per.values())
    # anchor 0's picks replay the md5 pair order exactly
    cands = [i for i in range(9) if grp[i] != grp[0]]
    keyed = sorted(
        (int(_h.md5(f"0#{c}".encode()).hexdigest()[:15], 16), str(c))
        for c in cands
    )
    expect = [int(c) for _, c in keyed[:2]]
    assert [n for _, n in sorted(per[0])] == expect


def test_cross_correlation_perfect_lead(spark):
    from ningaloo_turtle_etl_spark.operators.trend import cross_correlation

    a_vals = [1.0, 3.0, 2.0, 5.0, 4.0, 7.0]
    a = spark.createDataFrame(
        [(t, v) for t, v in enumerate(a_vals)], "t long, v double"
    )
    # b lags a by one step: b(t+1) = a(t) -> ccf peaks at lag +1
    b = spark.createDataFrame(
        [(t + 1, v) for t, v in enumerate(a_vals)], "t long, v double"
    )
    got = {r["lag"]: r for r in
           cross_correlation(a, b, "t", "v", max_lag=2).collect()}
    assert got[1]["ccf"] == 1.0 and got[1]["n_steps"] == 6
    assert all(r["ccf"] < 1.0 for lag, r in got.items() if lag != 1)


def test_two_proportion_ztest_hand_computed(spark):
    from ningaloo_turtle_etl_spark.operators.trend import (
        two_proportion_ztest,
    )

    rows = [("t", 1)] * 7 + [("t", 0)] * 3 + [("c", 1)] * 3 + [("c", 0)] * 7
    df = spark.createDataFrame(rows, "arm string, y int")
    r = two_proportion_ztest(
        df, "arm", F.col("y") == 1, "t", "c"
    ).collect()[0]
    assert r["n_treat"] == 10 and r["x_treat"] == 7
    assert r["p_treat"] == 0.7 and r["p_control"] == 0.3
    # pooled p = 0.5 -> z = 0.4 / sqrt(0.25 * 0.2)
    assert r["z"] == round(0.4 / math.sqrt(0.05), 6)


def test_srm_check_known_and_zero_arm(spark):
    import pytest as _pt

    from ningaloo_turtle_etl_spark.operators.trend import srm_check

    df = spark.createDataFrame(
        [("a",)] * 60 + [("b",)] * 40, "arm string"
    )
    r = srm_check(df, "arm", {"a": 0.5, "b": 0.5}).collect()[0]
    assert r["chi2"] == 4.0 and r["dof"] == 1 and r["max_abs_dev"] == 0.1
    # Wilson–Hilferty critical value at alpha=0.001, dof=1, and the
    # derived gate: 4.0 < 11.157245 -> healthy
    assert r["chi2_critical"] == 11.157245
    assert r["srm_violated"] is False
    # an expected arm with zero observed rows still contributes its mass
    z = spark.createDataFrame([("a",)] * 2 + [("b",)] * 2, "arm string")
    r2 = srm_check(z, "arm", {"a": 0.5, "b": 0.25, "c": 0.25}).collect()[0]
    assert r2["n_arms"] == 3 and r2["chi2"] == 2.0
    assert r2["max_abs_dev"] == 0.25
    assert r2["n_undeclared"] == 0
    assert r2["chi2_critical"] == 14.132925 and r2["srm_violated"] is False
    with _pt.raises(ValueError):
        srm_check(df, "arm", {"a": 0.5, "b": 0.4})
    # a rogue arm present in the data but absent from the declared split
    # must SURFACE (chi2 -> inf, counted), not silently vanish
    rogue = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 40 + [("bot",)] * 10, "arm string"
    )
    r3 = srm_check(rogue, "arm", {"a": 0.5, "b": 0.5}).collect()[0]
    assert r3["n_rows"] == 100  # rogue rows still counted in the total
    assert r3["n_arms"] == 3 and r3["dof"] == 1
    assert r3["n_undeclared"] == 1
    assert math.isinf(r3["chi2"])
    # Infinity chi2 (and the undeclared arm itself) must trip the gate
    assert r3["srm_violated"] is True
    # dof < 1 branch: single declared arm -> critical value pinned to 0.0
    # and a perfectly-conforming sample stays healthy (0 > 0 is false)
    one = spark.createDataFrame([("a",)] * 5, "arm string")
    r4 = srm_check(one, "arm", {"a": 1.0}).collect()[0]
    assert r4["dof"] == 0 and r4["chi2"] == 0.0
    assert r4["chi2_critical"] == 0.0 and r4["srm_violated"] is False


def test_cell_silhouette_two_centroids(spark):
    from ningaloo_turtle_etl_spark.operators.similarity import (
        cell_silhouette,
    )

    cents = [[0.0, 0.0], [10.0, 0.0]]
    rows = [
        (1, [0.0, 1.0]),   # cell 0: a=1, b=sqrt(101)
        (2, [10.0, 1.0]),  # cell 1: same by symmetry
        (3, [5.0, 0.0]),   # equidistant: ties to cell 0, s = 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["cell"]: r for r in cell_silhouette(df, cents).collect()}
    s1 = (math.sqrt(101) - 1) / math.sqrt(101)
    assert got[0]["n_vectors"] == 2 and got[1]["n_vectors"] == 1
    assert got[1]["mean_silhouette"] == round(s1, 6)
    assert got[0]["mean_silhouette"] == round((s1 + 0.0) / 2, 6)
    assert got[0]["mean_intra_dist"] == round((1 + 5) / 2, 6)


def test_normal_p_matches_erfc_reference(spark):
    from ningaloo_turtle_etl_spark.operators.trend import normal_two_sided_p

    zs = [0.0, 0.5, 1.0, 1.96, 2.58, 4.0, -1.5]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = {
        r["z"]: r["p"]
        for r in df.select(
            "z", normal_two_sided_p(F.col("z")).alias("p")
        ).collect()
    }
    for z in zs:
        ref = math.erfc(abs(z) / math.sqrt(2))  # exact two-sided p
        assert abs(got[z] - ref) < 1.5e-6  # A&S 7.1.26 error bound


def test_bh_adjust_known_tables(spark):
    from ningaloo_turtle_etl_spark.operators.trend import bh_adjust

    df = spark.createDataFrame(
        [("a", 0.005), ("b", 0.04), ("c", 0.06)], "k string, p double"
    )
    got = {r["k"]: r for r in bh_adjust(df, "p", ["k"]).collect()}
    assert got["a"]["p_adj"] == 0.015
    assert got["b"]["p_adj"] == 0.06 and got["c"]["p_adj"] == 0.06
    # all-equal stepped values collapse to the same adjusted p
    eq = spark.createDataFrame(
        [("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.04)],
        "k string, p double",
    )
    got2 = {r["k"]: r["p_adj"] for r in bh_adjust(eq, "p", ["k"]).collect()}
    assert set(got2.values()) == {0.04}


def test_ewma_control_chart_reference(spark):
    from ningaloo_turtle_etl_spark.operators.trend import ewma_control_chart

    # 20 stable alternating steps, then a sustained +9 shift
    xs = [10.0, 11.0] * 10 + [20.0] * 3
    df = spark.createDataFrame(
        [("g", t, x) for t, x in enumerate(xs)], "g string, t long, x double"
    )
    got = {r["step"]: r for r in
           ewma_control_chart(df, "g", "t", "x", alpha=0.3, span=14,
                              k=3.0).collect()}
    assert len(got) == len(xs)
    # python reference: renormalized trailing weights
    for t in (0, 4, 15, 22):
        num = den = 0.0
        for j in range(min(t + 1, 14)):
            w = 0.7 ** j
            num += xs[t - j] * w
            den += w
        assert got[t]["ewma"] == round(num / den, 6)
    assert got[0]["ewma"] == 10.0
    n = len(xs)
    mu = sum(xs) / n
    sd = (sum((x - mu) ** 2 for x in xs) / n) ** 0.5
    sig = (0.3 / 1.7) ** 0.5
    assert got[9]["center"] == round(mu, 6)
    assert got[9]["ucl"] == round(round(mu, 6) + 3 * round(sd, 6) * sig, 6)
    # the sustained shift drives the EWMA over the upper limit by the end
    assert got[22]["out_of_control"] == 1 and got[0]["out_of_control"] == 0


def test_wilson_rate_ci_reference(spark):
    from ningaloo_turtle_etl_spark.operators.trend import wilson_rate_ci

    rows = [("g", 1)] * 3 + [("g", 0)] * 7 + [("z", 0)] * 5
    df = spark.createDataFrame(rows, "grp string, y int")
    got = {r["grp"]: r for r in
           wilson_rate_ci(df, "grp", F.col("y") == 1).collect()}
    z = 1.959964
    n, p = 10, 0.3
    denom = 1 + z * z / n
    center = p + z * z / (2 * n)
    margin = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    assert got["g"]["rate"] == 0.3
    assert got["g"]["ci_lo"] == round((center - margin) / denom, 6)
    assert got["g"]["ci_hi"] == round((center + margin) / denom, 6)
    # rate 0/5: naive CI collapses to [0,0]; Wilson stays informative
    zr = got["z"]
    assert zr["rate"] == 0.0 and zr["ci_lo"] == 0.0
    assert 0.4 < zr["ci_hi"] < 0.5


def test_qte_known_distributions(spark):
    from ningaloo_turtle_etl_spark.operators.trend import (
        quantile_treatment_effect,
    )

    # treat = control + 10 shift -> every QTE is exactly 10
    rows = [("t", float(i) + 10) for i in range(101)] + [
        ("c", float(i)) for i in range(101)
    ]
    df = spark.createDataFrame(rows, "arm string, v double")
    out = quantile_treatment_effect(df, "v", "arm", "t", "c").collect()
    assert len(out) == 5
    for r in out:
        assert r["qte"] == 10.0 and r["n_treat"] == 101
    med = {r["p"]: r for r in out}[0.5]
    assert med["q_control"] == 50.0 and med["q_treat"] == 60.0


def test_msprt_always_valid_closed_form_and_latching(spark):
    from ningaloo_turtle_etl_spark.operators.trend import msprt_always_valid

    # arm 'a': strong shift from mu0=0 -> rejects and stays rejected even
    # after a null-ish day drags the pointwise LR back down; arm 'b': null.
    rows = (
        [("a", 1, 5.0), ("a", 1, 7.0), ("a", 2, 6.0)]
        + [("a", 3, 0.0), ("a", 3, 0.0), ("a", 3, 0.0), ("a", 3, 0.0)]
        + [("b", 1, 0.5), ("b", 2, -0.5), ("b", 3, 0.1)]
    )
    df = spark.createDataFrame(rows, "arm string, day int, x double")
    out = {
        (r["arm"], r["day"]): r
        for r in msprt_always_valid(
            df, ["arm"], "day", "x", mu0=0.0, sigma=2.0, tau=2.0, alpha=0.05
        ).collect()
    }

    def ref_ll(n, xbar, s2=4.0, t2=4.0):
        return 0.5 * math.log(s2 / (s2 + n * t2)) + (
            n * n * xbar * xbar * t2
        ) / (2 * s2 * (s2 + n * t2))

    # closed form replayed exactly (6dp) on the cumulative grid
    assert out[("a", 1)]["n_cum"] == 2
    assert out[("a", 1)]["log_lambda"] == round(ref_ll(2, 6.0), 6)
    assert out[("a", 2)]["log_lambda"] == round(ref_ll(3, 6.0), 6)
    a3 = ref_ll(7, 18.0 / 7)
    assert out[("a", 3)]["log_lambda"] == round(a3, 6)
    # day-3 pointwise LR dropped, but the running max latches the
    # rejection: p stays at the day-2 floor, rejected stays True
    p2 = math.exp(-max(0.0, ref_ll(3, 6.0)))
    assert out[("a", 2)]["rejected"] is True
    assert out[("a", 3)]["rejected"] is True
    assert out[("a", 3)]["p_always_valid"] == round(p2, 6)
    assert a3 < ref_ll(3, 6.0)  # the latch actually did something
    # the null arm never rejects and its p stays 1 (log-lambda < 0)
    for d in (1, 2, 3):
        assert out[("b", d)]["rejected"] is False
        assert out[("b", d)]["p_always_valid"] == 1.0
    import pytest as _pt

    with _pt.raises(ValueError):
        msprt_always_valid(df, ["arm"], "day", "x", 0.0, sigma=0.0, tau=1.0)
    with _pt.raises(ValueError):
        msprt_always_valid(df, ["arm"], "day", "x", 0.0, sigma=1.0, tau=-1.0)


def test_power_mde_table_closed_form(spark):
    from ningaloo_turtle_etl_spark.operators.trend import (
        norm_ppf,
        power_mde_table,
    )

    rows = [("a", float(v)) for v in (8, 10, 12, 10)] + [
        ("b", float(v)) for v in (0, 20, 0, 20)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        (r["g"], r["rel_effect"]): r
        for r in power_mde_table(
            df, ["g"], "v", rel_effects=(0.1, 0.5), alpha=0.05, power=0.8
        ).collect()
    }
    z = norm_ppf(0.975) + norm_ppf(0.8)
    import statistics

    for g, vals in (("a", [8, 10, 12, 10]), ("b", [0, 20, 0, 20])):
        m, sd = statistics.mean(vals), statistics.stdev(vals)
        for rel in (0.1, 0.5):
            r = out[(g, rel)]
            assert r["n_rows"] == 4 and r["mean"] == round(m, 6)
            assert r["sd"] == round(sd, 6)
            delta = rel * m
            assert r["delta_abs"] == round(delta, 6)
            assert r["n_required_per_arm"] == math.ceil(
                2 * sd * sd * (z * z) / (delta * delta)
            )
            mde = z * sd * math.sqrt(4 / 4)
            assert r["mde_abs_at_n"] == round(mde, 6)
            assert r["mde_rel_at_n"] == round(mde / m, 6)
    # noisier metric (b) needs ~a lot more samples at the same lift
    assert (
        out[("b", 0.1)]["n_required_per_arm"]
        > out[("a", 0.1)]["n_required_per_arm"]
    )
    with pytest.raises(ValueError):
        power_mde_table(df, ["g"], "v", rel_effects=())
    with pytest.raises(ValueError):
        power_mde_table(df, ["g"], "v", alpha=1.5)


def test_power_mde_table_zero_mean_group_emits_null(spark):
    """A zero-mean metric makes delta 0 and the sample-size ratio
    Infinity; the ANSI BIGINT cast would reject it, so the operator must
    emit NULL for n_required_per_arm instead (ADVICE r7)."""
    from ningaloo_turtle_etl_spark.operators.trend import power_mde_table

    rows = [("z", -5.0), ("z", 5.0), ("a", 8.0), ("a", 12.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        (r["g"], r["rel_effect"]): r
        for r in power_mde_table(df, ["g"], "v", rel_effects=(0.1,)).collect()
    }
    assert out[("z", 0.1)]["n_required_per_arm"] is None
    assert out[("z", 0.1)]["delta_abs"] == 0.0
    assert out[("z", 0.1)]["mde_rel_at_n"] is None
    assert out[("a", 0.1)]["n_required_per_arm"] is not None
    assert out[("a", 0.1)]["mde_rel_at_n"] is not None


def test_msprt_two_sample_reference_and_missing_arm(spark):
    from ningaloo_turtle_etl_spark.operators.trend import msprt_two_sample

    # day 1: control only (no statistic yet); day 2+: both arms with a
    # large separation -> rejection latches
    rows = (
        [("c", 1, 0.0), ("c", 1, 1.0)]
        + [("t", 2, 10.0), ("t", 2, 12.0), ("c", 2, 0.0)]
        + [("t", 3, 11.0), ("c", 3, 1.0)]
        + [("x", 3, 99.0)]  # unrelated arm must be ignored
    )
    df = spark.createDataFrame(rows, "arm string, day int, v double")
    out = {
        r["day"]: r
        for r in msprt_two_sample(
            df, "arm", "t", "c", "day", "v", sigma=1.0, tau=5.0, alpha=0.05
        ).collect()
    }
    # day 1: no treatment data -> NULL stats, p=1, not rejected
    assert out[1]["n_treat"] == 0 and out[1]["n_control"] == 2
    assert out[1]["diff"] is None and out[1]["log_lambda"] is None
    assert out[1]["p_always_valid"] == 1.0 and out[1]["rejected"] is False

    def ref(nt, mt, nc, mc, s2=1.0, t2=25.0):
        d, v = mt - mc, s2 * (1 / nt + 1 / nc)
        return 0.5 * math.log(v / (v + t2)) + d * d * t2 / (2 * v * (v + t2))

    ll2 = ref(2, 11.0, 3, 1.0 / 3)
    assert out[2]["log_lambda"] == round(ll2, 6)
    assert out[2]["diff"] == round(11.0 - 1.0 / 3, 6)
    assert out[2]["rejected"] is True
    ll3 = ref(3, 11.0, 4, 0.5)
    assert out[3]["log_lambda"] == round(ll3, 6)
    # running max keeps p at the tightest level seen so far
    assert out[3]["p_always_valid"] == round(
        math.exp(-max(0.0, ll2, ll3)), 6
    )
    assert out[3]["n_treat"] == 3 and out[3]["n_control"] == 4  # 'x' ignored
    import pytest as _pt

    with _pt.raises(ValueError):
        msprt_two_sample(df, "arm", "t", "c", "day", "v", sigma=0.0, tau=1.0)


def test_pairwise_battles_and_bradley_terry(spark):
    from ningaloo_turtle_etl_spark.operators.preference import (
        bradley_terry_ratings,
        pairwise_battles,
    )

    rows = [
        # ctx 1: a=5, b=3 -> a beats b ; ctx 2: tie -> nothing
        (1, "a", 5), (1, "b", 3),
        (2, "a", 4), (2, "b", 4),
        (3, "b", 2), (3, "c", 1),
    ]
    df = spark.createDataFrame(rows, "ctx long, item string, s long")
    battles = {
        (r["winner"], r["loser"]): (r["winner_score"], r["loser_score"])
        for r in pairwise_battles(df, "ctx", "item", "s").collect()
    }
    assert battles == {("a", "b"): (5, 3), ("b", "c"): (2, 1)}

    # Unbalanced-schedule correction: x and y are both 1-1, but x split
    # with the STRONG item while y split with the WEAK one -> BT must
    # rank x above y (raw win rate cannot separate them).
    games = (
        [("s", "w")] * 4          # s crushes w
        + [("s", "x"), ("x", "s")]  # x splits with strong
        + [("y", "w"), ("w", "y")]  # y splits with weak
    )
    bdf = spark.createDataFrame(games, "winner string, loser string")
    out = {r["item"]: r for r in bradley_terry_ratings(bdf).collect()}
    assert out["s"]["wins"] == 5 and out["s"]["losses"] == 1
    assert out["x"]["wins"] == 1 and out["x"]["comparisons"] == 2
    ratings = [out[i]["rating"] for i in ("s", "x", "y", "w")]
    assert abs(sum(r["rating"] for r in out.values()) - 1.0) < 1e-5
    assert ratings == sorted(ratings, reverse=True)  # s > x > y > w
    assert out["s"]["rank"] == 1 and out["w"]["rank"] == 4
    assert out["x"]["rating"] > out["y"]["rating"]  # the BT correction
    # a never-winner rates exactly 0 at the MM fixed point
    shutout = spark.createDataFrame(
        [("a", "z"), ("b", "z"), ("a", "b"), ("b", "a")],
        "winner string, loser string",
    )
    zout = {r["item"]: r for r in bradley_terry_ratings(shutout).collect()}
    assert zout["z"]["rating"] == 0.0 and zout["z"]["rank"] == 3
    import pytest as _pt

    with _pt.raises(ValueError):
        bradley_terry_ratings(bdf, iterations=0)
    with _pt.raises(ValueError):
        bradley_terry_ratings(bdf, max_items=2)


def test_mann_kendall_hand_series(spark):
    """Strictly increasing series: S = n(n-1)/2, Var = n(n-1)(2n+5)/18,
    z = (S-1)/sqrt(Var); constant series: S = 0, z = 0 (full ties)."""
    import math

    from ningaloo_turtle_etl_spark.operators.trend import mann_kendall_trend

    rows = [("up", t, float(t)) for t in range(1, 11)]
    rows += [("flat", t, 7.0) for t in range(1, 11)]
    rows += [("down", t, float(-t)) for t in range(1, 6)]
    rows += [("lone", 1, 3.0)]  # singleton group: no i<j pairs
    df = spark.createDataFrame(rows, "g string, t int, x double")
    out = {r["g"]: r for r in mann_kendall_trend(df, "g", "t", "x").collect()}
    n = 10
    s = n * (n - 1) // 2
    var = n * (n - 1) * (2 * n + 5) / 18.0
    assert out["up"]["s_stat"] == s
    assert out["up"]["var_s"] == round(var, 6)
    assert out["up"]["z"] == round((s - 1) / math.sqrt(var), 6)
    assert out["flat"]["s_stat"] == 0 and out["flat"]["z"] == 0.0
    assert out["flat"]["var_s"] == 0.0  # all ties cancel the variance
    assert out["down"]["s_stat"] == -10
    assert out["down"]["z"] < 0
    # Singleton group is REPORTED (n=1, s=0, var=0, z=0), not dropped.
    assert out["lone"]["n_points"] == 1
    assert out["lone"]["s_stat"] == 0
    assert out["lone"]["var_s"] == 0.0 and out["lone"]["z"] == 0.0


def test_nelson_aalen_hand_ladder(spark):
    """5 subjects: events at t=1 (2 of 5) and t=3 (1 of 2), censor at
    t=2 (1) and t=3 (1): H(1)=2/5, H(3)=2/5+1/2 (the censored t=2 row
    shrinks the risk set but adds no hazard)."""
    from ningaloo_turtle_etl_spark.operators.trend import nelson_aalen_hazard

    rows = [
        ("g", 1, 1), ("g", 1, 1),  # two events at t=1
        ("g", 2, 0),               # censored at t=2
        ("g", 3, 1), ("g", 3, 0),  # one event, one censor at t=3
    ]
    df = spark.createDataFrame(rows, "g string, t int, ev int")
    out = {r["t"]: r for r in nelson_aalen_hazard(df, "g", "t", "ev").collect()}
    assert out[1]["n_at_risk"] == 5 and out[1]["n_events"] == 2
    assert out[1]["hazard_step"] == 0.4 and out[1]["cum_hazard"] == 0.4
    assert out[2]["n_at_risk"] == 3 and out[2]["n_events"] == 0
    assert out[2]["cum_hazard"] == 0.4
    assert out[3]["n_at_risk"] == 2 and out[3]["n_events"] == 1
    assert out[3]["hazard_step"] == 0.5 and out[3]["cum_hazard"] == 0.9


def test_stratified_ipw_removes_planted_confounding(spark):
    """Within-stratum effect is exactly 0 but treatment concentrates in
    the high-outcome stratum: naive ATE = 5, stratified ATE = 0."""
    from ningaloo_turtle_etl_spark.operators.trend import stratified_ipw_ate

    rows = (
        [("hi", 1, 10.0)] * 3 + [("hi", 0, 10.0)]
        + [("lo", 1, 0.0)] + [("lo", 0, 0.0)] * 3
        + [("solo", 1, 99.0)]  # one-arm stratum: must be skipped
    )
    df = spark.createDataFrame(rows, "s string, tr int, y double")
    out = stratified_ipw_ate(df, "s", "tr", "y").collect()[0]
    assert out["n_strata"] == 3 and out["n_strata_skipped"] == 1
    # naive: treat mean (30+0+99)/5 = 25.8, control (10+0)/4 = 2.5
    assert out["ate_naive"] == round(25.8 - 2.5, 6)
    assert out["ate_stratified"] == 0.0
    assert out["confounding_bias"] == out["ate_naive"]


def test_class_diversity_profile_hand_cases(spark):
    """Uniform 2-class group: H = ln2, effective = 2, simpson = hhi =
    0.5; monoculture: H = 0, effective = 1, hhi = 1."""
    import math

    from ningaloo_turtle_etl_spark.operators.curation import (
        class_diversity_profile,
    )

    rows = [("u", "en"), ("u", "de"), ("u", "en"), ("u", "de"),
            ("m", "en"), ("m", "en"), ("m", "en")]
    df = spark.createDataFrame(rows, "g string, lang string")
    out = {
        r["g"]: r for r in class_diversity_profile(df, "g", "lang").collect()
    }
    assert out["u"]["n_classes"] == 2
    assert out["u"]["shannon_h"] == round(math.log(2), 6)
    assert out["u"]["effective_classes"] == 2.0
    assert out["u"]["simpson"] == 0.5 and out["u"]["hhi"] == 0.5
    assert out["m"]["shannon_h"] == 0.0
    assert out["m"]["effective_classes"] == 1.0
    assert out["m"]["hhi"] == 1.0


def test_moment_profile_hand_values(spark):
    """Symmetric data: skewness 0; uniform two-point data: kurtosis
    excess -2 (the minimum); constant data: variance 0, NULL g1/g2 —
    all from the explicit power-sum formulas (scipy-population
    convention)."""
    from ningaloo_turtle_etl_spark.operators.relational import (
        moment_profile,
    )

    rows = (
        [("sym", v) for v in (1.0, 2.0, 3.0, 4.0, 5.0)]
        + [("two", v) for v in (0.0, 1.0, 0.0, 1.0)]
        + [("const", 7.0)] * 3
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in moment_profile(df, "v", by=["g"]).collect()}
    assert out["sym"]["mean"] == 3.0
    assert out["sym"]["variance"] == 2.0
    assert out["sym"]["skewness"] == 0.0
    assert out["sym"]["kurtosis_excess"] == -1.3  # uniform 5-point
    assert out["two"]["kurtosis_excess"] == -2.0
    assert out["const"]["variance"] == 0.0
    assert out["const"]["skewness"] is None
    assert out["const"]["kurtosis_excess"] is None
