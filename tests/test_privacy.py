"""Privacy/governance gates: k-anonymity, l-diversity, suppression, and
seeded-Laplace differentially-private counts (operators/privacy.py)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from ningaloo_turtle_etl_spark.operators.privacy import (
    anonymity_summary,
    dp_noisy_counts,
    generalize_to_k,
    k_anonymity_report,
    laplace_noise,
    suppress_small_classes,
)
from ningaloo_turtle_etl_spark.registry import oracle_sql, queries
from tests.conftest import SF_DIR, assert_df_matches_oracle


@pytest.fixture(scope="module")
def people(spark):
    # (zip, age_band) quasi-identifiers, disease sensitive.
    rows = [
        ("6701", "20-30", "flu"),
        ("6701", "20-30", "flu"),
        ("6701", "20-30", "cold"),
        ("6701", "30-40", "flu"),
        ("6702", "20-30", "cold"),
        ("6702", "20-30", "cold"),
    ]
    return spark.createDataFrame(rows, "zip string, age string, disease string")


def test_k_anonymity_report_flags(spark, people):
    rep = {
        (r["zip"], r["age"]): r
        for r in k_anonymity_report(
            people, ["zip", "age"], "disease", k=2, l_diversity=2
        ).collect()
    }
    assert rep[("6701", "20-30")]["class_size"] == 3
    assert rep[("6701", "20-30")]["is_k_anonymous"]
    assert rep[("6701", "20-30")]["n_sensitive"] == 2
    assert rep[("6701", "20-30")]["is_l_diverse"]
    # singleton class: fails k
    assert rep[("6701", "30-40")]["class_size"] == 1
    assert not rep[("6701", "30-40")]["is_k_anonymous"]
    # k-large but sensitive-homogeneous: fails l
    assert rep[("6702", "20-30")]["is_k_anonymous"]
    assert rep[("6702", "20-30")]["n_sensitive"] == 1
    assert not rep[("6702", "20-30")]["is_l_diverse"]


def test_anonymity_summary_rollup(spark, people):
    row = anonymity_summary(
        people, ["zip", "age"], "disease", k=2, l_diversity=2
    ).collect()[0]
    assert row["n_classes"] == 3 and row["n_rows"] == 6
    assert row["achieved_k"] == 1  # the singleton bounds the whole release
    assert row["n_small_classes"] == 1 and row["rows_at_risk"] == 1
    # both the singleton and the sensitive-homogeneous class fail l=2
    assert row["achieved_l"] == 1 and row["n_undiverse_classes"] == 2


def test_suppress_small_classes_reaches_k(spark, people):
    kept = suppress_small_classes(people, ["zip", "age"], k=2)
    assert kept.count() == 5  # the singleton row is suppressed
    row = anonymity_summary(kept, ["zip", "age"], k=2).collect()[0]
    assert row["achieved_k"] >= 2 and row["n_small_classes"] == 0


def test_laplace_noise_matches_numpy_inverse_cdf(spark):
    # The Spark expression must equal the closed-form inverse CDF applied
    # to the same md5-derived uniform, computed independently in Python.
    import hashlib

    df = spark.createDataFrame([(k,) for k in "abcde"], "k string")
    got = {
        r["k"]: r["n"]
        for r in df.select(
            "k", laplace_noise(F.col("k"), scale=2.0, seed=7).alias("n")
        ).collect()
    }
    for k in "abcde":
        h = int(hashlib.md5(f"{k}#seed=7".encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / 2.0**52
        want = -2.0 * math.copysign(1.0, u - 0.5) * math.log(
            1.0 - 2.0 * abs(u - 0.5)
        )
        assert got[k] == pytest.approx(want, rel=1e-12)


def test_laplace_noise_distribution_sane(spark):
    # Across many keys the seeded draws should look Laplace(0, b): mean ~0,
    # mean |x| ~ b, symmetric sign split. Loose bounds — this is a sanity
    # pin, not a GOF test.
    df = spark.range(4000).select(F.col("id").cast("string").alias("k"))
    vals = [
        r["n"]
        for r in df.select(
            laplace_noise(F.col("k"), scale=3.0, seed=1).alias("n")
        ).collect()
    ]
    n = len(vals)
    mean = sum(vals) / n
    mean_abs = sum(abs(v) for v in vals) / n
    pos = sum(1 for v in vals if v > 0) / n
    assert abs(mean) < 0.5  # se ~ b*sqrt(2/n) ~ 0.067
    assert 2.5 < mean_abs < 3.5  # E|x| = b = 3
    assert 0.45 < pos < 0.55


def test_dp_noisy_counts_deterministic_and_scaled(spark):
    df = spark.createDataFrame(
        [("a",)] * 10 + [("b",)] * 20, "g string"
    )
    one = dp_noisy_counts(df, ["g"], epsilon=1.0, seed=3, include_true=True)
    two = dp_noisy_counts(df, ["g"], epsilon=1.0, seed=3, include_true=True)
    r1 = {r["g"]: r for r in one.collect()}
    r2 = {r["g"]: r for r in two.collect()}
    assert {k: v["noisy_count"] for k, v in r1.items()} == {
        k: v["noisy_count"] for k, v in r2.items()
    }
    assert r1["a"]["true_count"] == 10 and r1["b"]["true_count"] == 20
    # halving epsilon doubles the noise exactly (same uniform draw)
    half = {
        r["g"]: r["noisy_count"]
        for r in dp_noisy_counts(
            df, ["g"], epsilon=0.5, seed=3, include_true=True
        ).collect()
    }
    for g in ("a", "b"):
        noise1 = r1[g]["noisy_count"] - r1[g]["true_count"]
        noise2 = half[g] - r1[g]["true_count"]
        assert noise2 == pytest.approx(2 * noise1, abs=2e-6)
    # a different seed moves the noise
    other = {
        r["g"]: r["noisy_count"]
        for r in dp_noisy_counts(df, ["g"], epsilon=1.0, seed=4).collect()
    }
    assert other != {k: v["noisy_count"] for k, v in r1.items()}


def test_dp_noisy_counts_validates(spark):
    df = spark.createDataFrame([("a",)], "g string")
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], epsilon=0.0)
    with pytest.raises(ValueError):
        dp_noisy_counts(df, [], epsilon=1.0)
    with pytest.raises(ValueError):
        k_anonymity_report(df, [])


def test_generalize_to_k_ladder(spark):
    # 3 classes at fine grain: sizes 4 / 4 / 2 -> fine rung fails k=4
    # outright, passes once the suppression budget admits the 2-row class.
    rows = (
        [("a", d) for d in (1, 1, 1, 1, 2, 2, 2, 2)] + [("b", 1), ("b", 1)]
    )
    df = spark.createDataFrame(rows, "kind string, day int")
    ladder = [
        [("kind", F.col("kind")), ("g_time", F.col("day"))],
        [("kind", F.col("kind")), ("g_time", F.lit(None).cast("int"))],
    ]
    # zero budget: rung 0 has 2 rows at risk -> coarsen to rung 1, where
    # kind=b (2 rows) is STILL small and gets residually suppressed
    out = {
        (r["kind"], r["g_time"]): r
        for r in generalize_to_k(df, ladder, k=4).collect()
    }
    assert set(out) == {("a", None)}
    assert out[("a", None)]["class_size"] == 8
    assert out[("a", None)]["gen_level"] == 1
    # 20% budget admits suppressing the 2-row class: rung 0 chosen and the
    # small class is suppressed from the release
    fine = {
        (r["kind"], r["g_time"]): r
        for r in generalize_to_k(
            df, ladder, k=4, max_suppressed_frac=0.2
        ).collect()
    }
    assert set(fine) == {("a", 1), ("a", 2)}
    assert all(r["gen_level"] == 0 for r in fine.values())
    # coarsest rung is the fallback AND still suppresses residual small
    # classes: k too big for any class -> empty release at the last rung
    empty = generalize_to_k(df, ladder, k=99).collect()
    assert empty == []
    with pytest.raises(ValueError):
        generalize_to_k(df, [], k=2)
    with pytest.raises(ValueError):
        generalize_to_k(
            df,
            [
                [("kind", F.col("kind"))],
                [("other", F.col("kind"))],
            ],
            k=2,
        )


def test_privacy_queries_match_oracle(spark, duck):
    qs, os_ = queries(), oracle_sql()
    for name in (
        "k_anonymity_events",
        "dp_event_type_counts",
        "k_anon_generalize_events",
    ):
        assert_df_matches_oracle(qs[name](spark, SF_DIR), duck, os_[name])


def test_entropy_l_diversity_catches_skew_distinct_count_misses(spark):
    """A class can pass distinct-count l-diversity (n_sensitive >= l)
    while one value covers almost every row — the attacker's posterior
    is near-certain. The entropy check must fail exactly that class and
    pass the uniform one; values are hand-computed."""
    import math

    from ningaloo_turtle_etl_spark.operators.privacy import (
        entropy_l_diversity_report,
    )

    rows = []
    # class A: 4 sensitive values, uniform 25 each -> H = ln 4, eff_l = 4
    for s in range(4):
        rows += [("A", s)] * 25
    # class B: 4 distinct values but 97/1/1/1 -> eff_l ~ 1.2
    rows += [("B", 0)] * 97 + [("B", 1), ("B", 2), ("B", 3)]
    df = spark.createDataFrame(rows, "qid string, sens int")
    rep = {
        r["qid"]: r
        for r in entropy_l_diversity_report(
            df, ["qid"], "sens", l_value=3
        ).collect()
    }
    assert rep["A"]["class_size"] == 100 and rep["A"]["n_sensitive"] == 4
    assert rep["B"]["n_sensitive"] == 4  # distinct-count check would PASS
    assert abs(rep["A"]["entropy"] - math.log(4)) < 1e-6
    assert abs(rep["A"]["effective_l"] - 4.0) < 1e-6
    # replica of B's entropy with the operator's nano quantization
    def rnd(v):
        return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)

    clnc = rnd(97 * math.log(97.0) * 1e9) + 3 * rnd(1 * math.log(1.0) * 1e9)
    h_b = math.log(100.0) - (clnc / 1e9) / 100.0
    assert abs(rep["B"]["entropy"] - round(h_b, 6)) < 1e-9
    assert rep["B"]["effective_l"] < 1.3
    assert rep["A"]["is_entropy_l_diverse"] is True
    assert rep["B"]["is_entropy_l_diverse"] is False  # skew caught


def test_dp_quantile_exponential_replica_and_utility(spark):
    """Exponential-mechanism quantile pins: (a) exact match vs a Python
    replica of the interval weights / seeded draw; (b) with n=200 and
    eps=1 the released median lands within a few ranks of the true
    median; (c) different seeds select different intervals somewhere
    across groups (the draw is really seed-dependent); (d) the release
    is always inside [lo, hi]."""
    import hashlib
    import math

    from ningaloo_turtle_etl_spark.operators.privacy import (
        dp_quantile_exponential,
    )

    vals = {
        "a": [float(5 + (i * 7) % 90) for i in range(200)],
        "b": [float(20 + (i * 3) % 40) for i in range(150)],
    }
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, value double")
    got = {
        r["g"]: (r["n"], r["dp_quantile"])
        for r in dp_quantile_exponential(
            df, "value", ["g"], 1, 2, 1.0, 0.0, 100.0, 7
        ).collect()
    }

    def rnd(v):
        return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)

    def replica(g, xs, seed, eps=1.0, lo=0.0, hi=100.0, qn=1, qd=2):
        z = sorted(min(max(x, lo), hi) for x in xs)
        n = len(z)
        ivs = [(0, lo, z[0])] + [
            (j, z[j - 1], z[j] if j < n else hi) for j in range(1, n + 1)
        ]
        # j = 1..n-1 intervals are (z_j, z_{j+1}); j = n is (z_n, hi)
        ivs = [(0, lo, z[0])] + [
            (j, z[j - 1], z[j]) for j in range(1, n)
        ] + [(n, z[n - 1], hi)]
        wns = []
        for j, a, b in ivs:
            d = abs(qd * j - qn * n)
            wns.append(rnd((b - a) * math.exp(-eps * d / (2.0 * qd)) * 1e9))
        key = hashlib.md5(
            (hashlib.md5(g.encode()).hexdigest() + f"#seed={seed}").encode()
        ).hexdigest()
        u = (int(key[:13], 16) + 0.5) / 4503599627370496.0
        total = sum(wns)
        cum = 0
        for (j, a, b), wn in zip(ivs, wns):
            cum += wn
            if float(cum) >= u * float(total):
                return (a + b) / 2.0
        return ivs[-1][1]

    for g in vals:
        want = round(replica(g, vals[g], 7) * 1e6) / 1e6
        assert abs(got[g][1] - want) < 1e-9, (g, got[g], want)
        assert 0.0 <= got[g][1] <= 100.0

    # utility: within a few ranks of the true median
    for g in vals:
        z = sorted(vals[g])
        true_med = z[len(z) // 2]
        assert abs(got[g][1] - true_med) < 10.0

    # seed-dependence: some group moves under another seed
    got2 = {
        r["g"]: r["dp_quantile"]
        for r in dp_quantile_exponential(
            df, "value", ["g"], 1, 2, 1.0, 0.0, 100.0, 101
        ).collect()
    }
    assert any(got2[g] != got[g][1] for g in vals)
