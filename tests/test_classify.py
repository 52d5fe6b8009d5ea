"""Learned quality classifier: distributed MLlib training over Catalyst
features, closed-form sigmoid serving. Pinned: separation on planted data,
AUC, serve-expression parity with the exported coefficients, and schema
hygiene."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from ningaloo_turtle_etl_spark.operators.classify import (
    QUALITY_FEATURES,
    featurize,
    train_quality_model,
    with_quality_probability,
)

_CLEAN = (
    "the quick brown fox jumps over the lazy dog and it was a good day in the sun"
)
_JUNK = "@@@ ### $$$ 1234 zxqv !!!! %%% 98765 ???? &&&& qqqq @@@@ 0000 ****"


@pytest.fixture(scope="module")
def planted(spark):
    rows = []
    for i in range(150):
        rows.append((i, _CLEAN + f" extra{i % 7} words here", 1.0))
        rows.append((1000 + i, _JUNK + f" {i % 7}!!!", 0.0))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_classifier_separates_planted_data(spark, planted):
    train = planted.filter(F.col("doc_id") % 3 != 0)
    test = planted.filter(F.col("doc_id") % 3 == 0)
    model = train_quality_model(train)
    assert model["features"] == list(QUALITY_FEATURES)
    assert len(model["coefficients"]) == len(QUALITY_FEATURES)

    scored = with_quality_probability(test, model).collect()
    # AUC by pairwise comparison (small held-out set).
    pos = [r["quality_prob"] for r in scored if r["doc_id"] < 1000]
    neg = [r["quality_prob"] for r in scored if r["doc_id"] >= 1000]
    wins = sum(1 for p in pos for q in neg if p > q) + 0.5 * sum(
        1 for p in pos for q in neg if p == q
    )
    auc = wins / (len(pos) * len(neg))
    assert auc >= 0.99  # planted data is linearly separable in these features
    assert min(pos) > 0.5 and max(neg) < 0.5


def test_serving_expression_matches_exported_coefficients(spark, planted):
    model = train_quality_model(planted)
    feats = featurize(planted).select("doc_id", *QUALITY_FEATURES).collect()
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in with_quality_probability(planted, model).collect()
    }
    for r in feats:
        z = model["intercept"] + sum(
            w * float(r[name])
            for name, w in zip(model["features"], model["coefficients"])
        )
        ref = 1.0 / (1.0 + math.exp(-z))
        assert abs(got[r["doc_id"]] - ref) < 1e-9, r["doc_id"]


def test_scoring_keeps_input_schema_plus_probability(spark, planted):
    model = train_quality_model(planted)
    out = with_quality_probability(planted.select("doc_id", "text"), model)
    assert out.columns == ["doc_id", "text", "quality_prob"]
    vals = [r["quality_prob"] for r in out.collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_scoring_plan_is_map_only(spark, planted):
    model = train_quality_model(planted)
    plan = (
        with_quality_probability(planted.select("doc_id", "text"), model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # featurize+sigmoid fuse into the scan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- hashed bag-of-words model ----------------------------------------------


@pytest.fixture(scope="module")
def vocab_planted(spark):
    # Separable by VOCABULARY (not by shape): both classes are well-formed
    # text, so the heuristic features can't split them but hashed BoW can.
    good = "science method result data theory model evidence study"
    spam = "winner prize click free offer deal bonus casino"
    rows = []
    for i in range(120):
        g = " ".join(good.split()[j % 8] for j in range(i % 5 + 5))
        s = " ".join(spam.split()[j % 8] for j in range(i % 5 + 5))
        rows.append((i, "the " + g + " is here", 1.0))
        rows.append((1000 + i, "the " + s + " is here", 0.0))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_hashed_bow_separates_by_vocabulary(spark, vocab_planted):
    from ningaloo_turtle_etl_spark.operators.classify import (
        hashed_text_scores,
        train_hashed_text_model,
    )

    train = vocab_planted.filter(F.col("doc_id") % 3 != 0)
    test = vocab_planted.filter(F.col("doc_id") % 3 == 0)
    model = train_hashed_text_model(train, n_features=256)
    assert len(model["coefficients"]) == 256
    scored = hashed_text_scores(test, model).collect()
    pos = [r["quality_prob"] for r in scored if r["doc_id"] < 1000]
    neg = [r["quality_prob"] for r in scored if r["doc_id"] >= 1000]
    assert min(pos) > 0.5 and max(neg) < 0.5  # fully separable vocab


def test_hashed_bow_serving_matches_exported_coefficients(spark, vocab_planted):
    from ningaloo_turtle_etl_spark.operators.classify import (
        hashed_token_features,
        hashed_text_scores,
        train_hashed_text_model,
    )

    n = 128
    model = train_hashed_text_model(vocab_planted, n_features=n)
    served = {
        r["doc_id"]: r["quality_prob"]
        for r in hashed_text_scores(vocab_planted, model).collect()
    }
    # Reference: per-doc sigmoid from the raw hashed counts and the exported
    # coefficients (independent of the serving join).
    feats = hashed_token_features(vocab_planted, n).collect()
    z: dict = {}
    for r in feats:
        z[r["doc_id"]] = z.get(r["doc_id"], 0.0) + r["cnt"] * model["coefficients"][r["idx"]]
    import math

    for doc_id, zi in z.items():
        ref = 1.0 / (1.0 + math.exp(-(zi + model["intercept"])))
        assert abs(served[doc_id] - ref) < 1e-9


def test_hashed_bow_tokenless_doc_scores_intercept(spark, vocab_planted):
    import math

    from ningaloo_turtle_etl_spark.operators.classify import (
        hashed_text_scores,
        train_hashed_text_model,
    )

    model = train_hashed_text_model(vocab_planted, n_features=64)
    empty = spark.createDataFrame([(9999, "")], "doc_id long, text string")
    row = hashed_text_scores(empty, model).collect()[0]
    assert abs(
        row["quality_prob"] - 1.0 / (1.0 + math.exp(-model["intercept"]))
    ) < 1e-9


def test_with_quality_probability_preserves_caller_columns(spark, planted):
    # Regression (ADVICE r03): a caller frame carrying columns that collide
    # with feature names (documents really has n_chars) must come back with
    # its ORIGINAL values, not recomputed ones — and nothing extra.
    model = train_quality_model(planted)
    clash = planted.select(
        "doc_id",
        "text",
        F.lit(-7).alias("n_chars"),
        F.lit(0.123).alias("quality_score"),
    )
    out = with_quality_probability(clash, model)
    assert set(out.columns) == {"doc_id", "text", "n_chars", "quality_score", "quality_prob"}
    rows = out.collect()
    assert all(r["n_chars"] == -7 for r in rows)
    assert all(r["quality_score"] == 0.123 for r in rows)
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in rows)


def test_featurize_refuses_colliding_columns(spark, planted):
    with pytest.raises(ValueError, match="n_chars"):
        featurize(planted.withColumn("n_chars", F.lit(1)))


def test_hashed_bow_md5_family_serves_and_separates(spark):
    # md5 bucket family (DuckDB-reproducible): same train/serve hash by
    # construction; separability must hold just like the murmur3 family.
    from ningaloo_turtle_etl_spark.operators.classify import (
        hashed_text_scores,
        train_hashed_text_model,
    )

    rows = []
    for i in range(60):
        rows.append((i, "alpha beta gamma delta epsilon", 1.0))
        rows.append((1000 + i, "zulu yankee xray whiskey victor", 0.0))
    planted = spark.createDataFrame(rows, "doc_id long, text string, label double")
    model = train_hashed_text_model(planted, n_features=128, hash_family="md5")
    assert model["hash_family"] == "md5"
    scored = hashed_text_scores(planted, model).collect()
    pos = [r["quality_prob"] for r in scored if r["doc_id"] < 1000]
    neg = [r["quality_prob"] for r in scored if r["doc_id"] >= 1000]
    assert min(pos) > 0.5 and max(neg) < 0.5


def test_model_fixtures_load_and_are_finite(spark):
    import math

    from ningaloo_turtle_etl_spark.operators.classify import load_model_fixture

    q = load_model_fixture("quality_model")
    assert q["features"] == list(QUALITY_FEATURES)
    assert all(math.isfinite(c) for c in q["coefficients"] + [q["intercept"]])
    t = load_model_fixture("text_model")
    assert t["hash_family"] == "md5" and t["n_features"] == 512
    assert all(math.isfinite(c) for c in t["coefficients"] + [t["intercept"]])


def test_classifier_auc_matches_sklearn_free_reference(spark):
    # AUC pinned against the O(n²) pairwise definition computed in plain
    # Python: P(score_pos > score_neg) + 0.5·P(equal), with ties planted
    # on purpose (scores rounded to 1dp collide across classes).
    import itertools

    from ningaloo_turtle_etl_spark.operators.classify import classifier_auc

    rows = [
        (0.9, 1), (0.8, 1), (0.8, 0), (0.7, 1), (0.6, 0),
        (0.6, 1), (0.4, 0), (0.4, 0), (0.2, 1), (0.1, 0),
    ]
    pos = [p for p, y in rows if y == 1]
    neg = [p for p, y in rows if y == 0]
    expect = sum(
        1.0 if a > b else (0.5 if a == b else 0.0)
        for a, b in itertools.product(pos, neg)
    ) / (len(pos) * len(neg))
    df = spark.createDataFrame(rows, "p double, y int")
    got = classifier_auc(df, "p", "y").collect()[0]
    assert got["auc"] == round(expect, 6)
    assert (got["n_pos"], got["n_neg"]) == (len(pos), len(neg))


def test_classifier_auc_extremes(spark):
    from ningaloo_turtle_etl_spark.operators.classify import classifier_auc

    perfect = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "p double, y int"
    )
    assert classifier_auc(perfect, "p", "y").collect()[0]["auc"] == 1.0
    inverted = spark.createDataFrame(
        [(0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)], "p double, y int"
    )
    assert classifier_auc(inverted, "p", "y").collect()[0]["auc"] == 0.0
    all_tied = spark.createDataFrame(
        [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)], "p double, y int"
    )
    assert all_tied and classifier_auc(all_tied, "p", "y").collect()[0]["auc"] == 0.5


def test_score_decile_lift_shape_and_monotone_capture(spark):
    from ningaloo_turtle_etl_spark.operators.classify import score_decile_lift

    # 100 rows, score = id/100, label = score > 0.7 (perfect ranking):
    # top 3 deciles capture everything, cum_capture is monotone, decile 1
    # lift = 1/base_rate.
    rows = [(i, i / 100.0, 1 if i > 70 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, p double, y int")
    out = score_decile_lift(df, "p", "y", "doc_id").collect()
    out.sort(key=lambda r: r["decile"])
    assert [r["n"] for r in out] == [10] * 10
    caps = [r["cum_capture"] for r in out]
    assert caps == sorted(caps) and caps[2] == 1.0 == caps[-1]
    # 29 positives, base rate 0.29; decile 1 is all-positive.
    assert out[0]["pos_rate"] == 1.0
    assert abs(out[0]["cum_lift"] - 1 / 0.29) < 1e-4


def test_score_decile_lift_rejects_bad_buckets(spark):
    import pytest

    from ningaloo_turtle_etl_spark.operators.classify import score_decile_lift

    df = spark.createDataFrame([(1, 0.5, 1)], "doc_id long, p double, y int")
    with pytest.raises(ValueError):
        score_decile_lift(df, "p", "y", "doc_id", n_buckets=1)


def test_pr_curve_hand_computed(spark):
    from ningaloo_turtle_etl_spark.operators.classify import classifier_pr_curve

    # scores: 0.9(+), 0.7(-), 0.7(+), 0.3(-) → thresholds 0.9/0.7/0.3.
    df = spark.createDataFrame(
        [(0.9, 1), (0.7, 0), (0.7, 1), (0.3, 0)], "p double, y int"
    )
    out = {r["threshold"]: r for r in classifier_pr_curve(df, "p", "y").collect()}
    assert out[0.9]["n_kept"] == 1 and out[0.9]["precision"] == 1.0
    assert out[0.9]["recall"] == 0.5
    assert out[0.7]["n_kept"] == 3 and abs(out[0.7]["precision"] - 2 / 3) < 1e-6
    assert out[0.7]["recall"] == 1.0
    assert out[0.3]["precision"] == 0.5 and out[0.3]["recall"] == 1.0
    # f1 at 0.7: 2·(2/3)·1/(2/3+1) = 0.8 (from rounded parts)
    assert abs(out[0.7]["f1"] - 0.8) < 1e-5


def test_pr_curve_zero_denominator_guard(spark):
    from ningaloo_turtle_etl_spark.operators.classify import classifier_pr_curve

    # No positives at all: recall is NULL (0/0 positives) is avoided by
    # the fold — precision 0, recall null-free via _tp=0 → division yields
    # null; assert the f1 guard never divides by zero and rows survive.
    df = spark.createDataFrame([(0.9, 0), (0.1, 0)], "p double, y int")
    rows = classifier_pr_curve(df, "p", "y").collect()
    assert len(rows) == 2 and all(r["precision"] == 0.0 for r in rows)


def test_keep_threshold_yield_monotone_and_totals(spark):
    from ningaloo_turtle_etl_spark.operators.classify import keep_threshold_yield

    rows = [(i / 10.0, 100 * (i + 1)) for i in range(10)]
    df = spark.createDataFrame(rows, "p double, tok long")
    out = sorted(
        keep_threshold_yield(df, "p", "tok").collect(),
        key=lambda r: -r["threshold"],
    )
    kept = [r["docs_kept"] for r in out]
    assert kept == sorted(kept) and kept[-1] == 10
    assert out[-1]["doc_share"] == 1.0 and out[-1]["token_share"] == 1.0
    # top threshold keeps exactly the heaviest doc: 1000 of 5500 tokens
    assert out[0]["tokens_kept"] == 1000
    assert abs(out[0]["token_share"] - 1000 / 5500) < 1e-6


def test_classifier_auc_by_group_matches_per_group_pairwise(spark):
    import itertools

    from ningaloo_turtle_etl_spark.operators.classify import (
        classifier_auc,
        classifier_auc_by_group,
    )

    rows = [
        ("a", 0.9, 1), ("a", 0.8, 0), ("a", 0.6, 1), ("a", 0.6, 0),
        ("a", 0.2, 0),
        ("b", 0.9, 0), ("b", 0.5, 1), ("b", 0.4, 1), ("b", 0.1, 0),
    ]
    df = spark.createDataFrame(rows, "grp string, p double, y int")
    got = {r["group"]: r for r in
           classifier_auc_by_group(df, "p", "y", "grp").collect()}
    for grp in ("a", "b"):
        pos = [p for g, p, y in rows if g == grp and y == 1]
        neg = [p for g, p, y in rows if g == grp and y == 0]
        expect = sum(
            1.0 if a > b else (0.5 if a == b else 0.0)
            for a, b in itertools.product(pos, neg)
        ) / (len(pos) * len(neg))
        assert got[grp]["auc"] == round(expect, 6)
        assert (got[grp]["n_pos"], got[grp]["n_neg"]) == (len(pos), len(neg))
    # each group's AUC also matches the global fold run on that group alone
    for grp in ("a", "b"):
        solo = classifier_auc(
            df.filter(df.grp == grp), "p", "y"
        ).collect()[0]
        assert solo["auc"] == got[grp]["auc"]


def test_classifier_auc_by_group_single_class_group_is_null(spark):
    from ningaloo_turtle_etl_spark.operators.classify import (
        classifier_auc_by_group,
    )

    df = spark.createDataFrame(
        [("all_pos", 0.9, 1), ("all_pos", 0.1, 1),
         ("mixed", 0.9, 1), ("mixed", 0.1, 0)],
        "grp string, p double, y int",
    )
    got = {r["group"]: r for r in
           classifier_auc_by_group(df, "p", "y", "grp").collect()}
    assert got["all_pos"]["auc"] is None and got["all_pos"]["n_neg"] == 0
    assert got["mixed"]["auc"] == 1.0


def test_isotonic_calibration_pav_reference(spark):
    from ningaloo_turtle_etl_spark.operators.classify import (
        isotonic_calibration,
    )

    # 4 occupied bins with a violation: raw rates .2, .6, .4, .9 — PAV
    # pools bins 1 and 2 into (3+2)/(5+5) = 0.5.
    rows = (
        [(0.04, 1)] + [(0.04, 0)] * 4          # bin 0: 1/5
        + [(0.30, 1)] * 3 + [(0.30, 0)] * 2    # bin 6: 3/5
        + [(0.45, 1)] * 2 + [(0.45, 0)] * 3    # bin 9: 2/5  (violates)
        + [(0.95, 1)] * 9 + [(0.95, 0)]        # bin 19: 9/10
    )
    df = spark.createDataFrame(rows, "p double, y int")
    out = {r["bin"]: r for r in isotonic_calibration(df, "p", "y", 20).collect()}
    assert set(out) == {0, 6, 9, 19}
    assert out[0]["rate_raw"] == 0.2 and out[0]["rate_iso"] == 0.2
    assert out[6]["rate_raw"] == 0.6 and out[6]["rate_iso"] == 0.5
    assert out[9]["rate_raw"] == 0.4 and out[9]["rate_iso"] == 0.5
    assert out[19]["rate_raw"] == 0.9 and out[19]["rate_iso"] == 0.9
    # fitted rates are non-decreasing in bin order; raw counts preserved
    fits = [out[b]["rate_iso"] for b in sorted(out)]
    assert fits == sorted(fits)
    assert out[6]["n"] == 5 and out[6]["n_pos"] == 3
    assert out[0]["lo"] == 0.0 and out[0]["hi"] == 0.05
    # score 1.0 lands in the top bin (clamp), not a phantom bin 20
    top = isotonic_calibration(
        spark.createDataFrame([(1.0, 1), (0.0, 0)], "p double, y int"),
        "p", "y", 20,
    ).collect()
    assert {r["bin"] for r in top} == {0, 19}
    import pytest as _pt

    with _pt.raises(ValueError):
        isotonic_calibration(df, "p", "y", n_bins=1)


def test_split_conformal_report_coverage_guarantee(spark):
    from ningaloo_turtle_etl_spark.operators.classify import (
        split_conformal_report,
    )

    # residuals are |y - p|; construct known preds so q_hat is derivable.
    rows = [(i, 0.5, 1 if i % 3 == 0 else 0) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, p double, y int")
    rep = split_conformal_report(
        df, "p", "y", "id", alpha=0.1, calib_frac=0.5
    ).collect()
    assert len(rep) == 1
    r = rep[0]
    # every residual is exactly 0.5 -> q_hat = 0.5 and coverage is 1.0
    assert r["q_hat"] == 0.5 and r["coverage"] == 1.0
    assert r["target"] == 0.9
    assert r["n_calib"] + r["n_test"] == 400 and r["n_calib"] > 0
    # mixed residuals: 90% of calib at 0.1, 10% at 0.9 -> q_hat lands on
    # the small residual and only small-residual test rows are covered
    rows2 = [
        (i, 0.9 if i % 10 == 0 else 0.1, 0) for i in range(1000)
    ]
    df2 = spark.createDataFrame(rows2, "id long, p double, y int")
    r2 = split_conformal_report(
        df2, "p", "y", "id", alpha=0.2, calib_frac=0.5
    ).collect()[0]
    assert r2["q_hat"] in (0.1, 0.9)
    if r2["q_hat"] == 0.1:
        assert 0.7 <= r2["coverage"] < 1.0  # the 0.9-residual rows escape
    # coverage >= target must hold on the typical draw (exchangeability)
    assert r2["coverage"] >= 0.8 - 0.05
    # tiny calibration set cannot certify 90% -> infinite interval,
    # coverage pinned at 1
    small = spark.createDataFrame(
        [(1, 0.5, 0), (2, 0.4, 1)], "id long, p double, y int"
    )
    r3 = split_conformal_report(
        small, "p", "y", "id", alpha=0.01, calib_frac=0.5
    ).collect()[0]
    assert math.isinf(r3["q_hat"]) and r3["coverage"] == 1.0
    import pytest as _pt

    with _pt.raises(ValueError):
        split_conformal_report(df, "p", "y", "id", alpha=0.0)


def test_split_conformal_report_drops_null_pred_label_rows(spark):
    """NULL pred/label rows must not inflate n_cal: percentile() ignores
    NULL residuals, so counting them would map the conformal index
    ceil((n+1)(1-alpha)) onto the wrong order statistic (ADVICE r7)."""
    from ningaloo_turtle_etl_spark.operators.classify import (
        split_conformal_report,
    )

    clean = [(i, 0.5, 1 if i % 3 == 0 else 0) for i in range(400)]
    noisy = clean + [(1000 + i, None, 0) for i in range(50)] + [
        (2000 + i, 0.5, None) for i in range(50)
    ]
    df_clean = spark.createDataFrame(clean, "id long, p double, y int")
    df_noisy = spark.createDataFrame(noisy, "id long, p double, y int")
    r_clean = split_conformal_report(
        df_clean, "p", "y", "id", alpha=0.1, calib_frac=0.5
    ).collect()[0]
    r_noisy = split_conformal_report(
        df_noisy, "p", "y", "id", alpha=0.1, calib_frac=0.5
    ).collect()[0]
    # NULL rows are invisible: identical split sizes, quantile, coverage
    assert r_noisy["n_calib"] == r_clean["n_calib"]
    assert r_noisy["n_test"] == r_clean["n_test"]
    assert r_noisy["q_hat"] == r_clean["q_hat"]
    assert r_noisy["coverage"] == r_clean["coverage"]


def test_calibration_error_by_group_hand_values(spark):
    from ningaloo_turtle_etl_spark.operators.classify import (
        calibration_error_by_group,
    )

    # group "p": perfectly calibrated 0/1 predictions -> brier/ece/mce 0
    # group "m": constant 0.8 prediction, 50% positives
    rows = (
        [("p", 1.0, 1)] * 5 + [("p", 0.0, 0)] * 5
        + [("m", 0.8, 1)] * 5 + [("m", 0.8, 0)] * 5
        + [("m", None, 1), ("m", 0.5, None)]  # dropped
    )
    df = spark.createDataFrame(rows, "g string, p double, y int")
    out = {
        r["g"]: r
        for r in calibration_error_by_group(
            df, "p", "y", n_bins=10, group_cols=["g"]
        ).collect()
    }
    assert out["p"]["brier"] == 0.0 and out["p"]["ece"] == 0.0
    assert out["p"]["mce"] == 0.0 and out["p"]["n"] == 10
    # NULL rows dropped: n counts only the 10 clean rows
    assert out["m"]["n"] == 10 and out["m"]["n_pos"] == 5
    # constant 0.8 vs 0.5 base rate: brier = mean((0.8-y)^2) = 0.34,
    # single bin -> ece = mce = |0.5 - 0.8| = 0.3
    assert out["m"]["brier"] == round((5 * 0.04 + 5 * 0.64) / 10, 6)
    assert out["m"]["ece"] == 0.3 and out["m"]["mce"] == 0.3
    import pytest as _pt

    with _pt.raises(ValueError):
        calibration_error_by_group(df, "p", "y", n_bins=1)


def test_woe_iv_report_hand_values(spark):
    import math

    from ningaloo_turtle_etl_spark.operators.classify import woe_iv_report

    # a: 8 pos / 2 neg; b: 2 pos / 8 neg; NULLs dropped
    rows = (
        [("a", 1)] * 8 + [("a", 0)] * 2
        + [("b", 1)] * 2 + [("b", 0)] * 8
        + [(None, 1), ("a", None)]
    )
    df = spark.createDataFrame(rows, "f string, y int")
    out = {r["feature_value"]: r for r in woe_iv_report(df, "f", "y").collect()}
    assert set(out) == {"a", "b"}
    POS, NEG = 10, 10
    woe_a = math.log(((8 + 0.5) / POS) / ((2 + 0.5) / NEG))
    woe_b = math.log(((2 + 0.5) / POS) / ((8 + 0.5) / NEG))
    assert abs(out["a"]["woe"] - round(woe_a, 6)) < 1e-9
    assert abs(out["b"]["woe"] - round(woe_b, 6)) < 1e-9
    assert out["a"]["n"] == 10 and out["a"]["n_pos"] == 8
    iv = (8 / POS - 2 / NEG) * round(woe_a, 6) + (2 / POS - 8 / NEG) * round(
        woe_b, 6
    )
    assert abs(out["a"]["iv"] - round(iv, 6)) < 1e-9
    assert out["a"]["iv"] == out["b"]["iv"] > 0.5  # strongly predictive
    # an uninformative feature scores near-zero IV
    flat = spark.createDataFrame(
        [("x", i % 2) for i in range(100)] + [("z", i % 2) for i in range(100)],
        "f string, y int",
    )
    fout = woe_iv_report(flat, "f", "y").collect()
    assert all(abs(r["iv"]) < 0.01 for r in fout)


def test_naive_bayes_confusion_separable_corpus(spark):
    """Perfectly separable vocabularies classify perfectly; a mixed doc
    with majority-class tokens goes to the majority class (exact-integer
    argmax, smallest-class tiebreak)."""
    import pytest

    from ningaloo_turtle_etl_spark.operators.classify import (
        naive_bayes_confusion,
    )

    rows = [
        (1, "en", "hello world hello"),
        (2, "en", "world hello again"),
        (3, "de", "hallo welt hallo"),
        (4, "de", "welt hallo nochmal"),
        (5, "en", "hello hallo hello"),  # 2 en-ish vs 1 de-ish token
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        (r["actual"], r["predicted"]): r["n"]
        for r in naive_bayes_confusion(df, "lang").collect()
    }
    assert out[("en", "en")] == 3  # incl. the mixed doc
    assert out[("de", "de")] == 2
    assert ("en", "de") not in out and ("de", "en") not in out
    with pytest.raises(ValueError):
        naive_bayes_confusion(df, "lang", alpha=0.0)

    # Token-less docs must NOT vanish from the grid: they carry the
    # prior-only argmax (4 en vs 3 de docs → prior argmax 'en' for
    # both empty docs).
    rows2 = rows + [(6, "en", "   "), (7, "de", "")]
    df2 = spark.createDataFrame(
        rows2, "doc_id long, lang string, text string"
    )
    out2 = {
        (r["actual"], r["predicted"]): r["n"]
        for r in naive_bayes_confusion(df2, "lang").collect()
    }
    assert sum(out2.values()) == 7  # every doc accounted for
    assert out2[("en", "en")] == 4  # 3 token-ful + empty doc 6
    assert out2[("de", "en")] == 1  # empty doc 7 → prior argmax
    assert out2[("de", "de")] == 2


def test_gini_best_splits_hand_case(spark):
    """A feature that separates the classes at x <= 2 must win with
    gini_split 0 and gain = root impurity; a pure-noise feature gains
    ~nothing; the perfect split's counts land 2/2."""
    import pytest

    from ningaloo_turtle_etl_spark.operators.classify import (
        gini_best_splits,
    )

    rows = [
        (1.0, 5.0, 0), (2.0, 9.0, 0),  # class 0 at low good_f
        (3.0, 5.0, 1), (4.0, 9.0, 1),  # class 1 at high good_f
    ]
    df = spark.createDataFrame(rows, "good_f double, noise_f double, y int")
    out = {
        r["feature"]: r
        for r in gini_best_splits(df, ["good_f", "noise_f"], "y").collect()
    }
    g = out["good_f"]
    assert g["threshold"] == 2.0
    assert g["n_left"] == 2 and g["n_right"] == 2
    assert g["gini_split"] == 0.0
    assert g["gini_root"] == 0.5 and g["gain"] == 0.5
    # noise_f (two values, classes split evenly within each) gains 0
    assert out["noise_f"]["gain"] == 0.0
    with pytest.raises(ValueError):
        gini_best_splits(df, [], "y")


def test_logistic_gd_matches_numpy_reference(spark):
    """The distributed GD trajectory must match an independent numpy
    replay with the same nano quantization; the learned boundary must
    separate a separable hand dataset (accuracy 1.0)."""
    import math

    import numpy as np
    import pytest

    from ningaloo_turtle_etl_spark.operators.classify import (
        logistic_gd_train,
    )

    xs = [(-2.0,), (-1.5,), (-1.0,), (1.0,), (1.5,), (2.0,)]
    ys = [0, 0, 0, 1, 1, 1]
    df = spark.createDataFrame(
        [(x[0], y) for x, y in zip(xs, ys)], "x double, y int"
    )
    out = {r["feature"]: r for r in logistic_gd_train(
        df, ["x"], "y", iterations=4, lr=1.0).collect()}

    X = np.array([[1.0, x[0]] for x in xs])
    Y = np.array(ys, dtype=float)
    w = np.zeros(2)
    n = len(ys)
    for _ in range(4):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        terms = (p - Y)[:, None] * X * 1e9
        g = np.array([
            sum(int(math.floor(t + 0.5)) if t >= 0
                else -int(math.floor(-t + 0.5)) for t in col)
            for col in terms.T
        ])
        w = w - 1.0 * ((g / 1e9) / n)
    assert out["_intercept"]["weight"] == pytest.approx(w[0], abs=1e-6)
    assert out["x"]["weight"] == pytest.approx(w[1], abs=1e-6)
    assert out["x"]["train_acc"] == 1.0  # separable -> perfect sign split
    assert out["x"]["train_logloss"] > 0
    with pytest.raises(ValueError):
        logistic_gd_train(df, [], "y")
    with pytest.raises(ValueError):
        logistic_gd_train(df, ["x"], "y", iterations=0)


def test_platt_scaling_shape_on_separable_scores(spark):
    """Platt calibration = logistic_gd_train on the single score
    feature: on a score column that separates the labels, the learned
    slope is positive (monotone calibrator) and four GD rounds already
    beat the w=0 logloss baseline ln 2."""
    import math

    from ningaloo_turtle_etl_spark.operators.classify import (
        logistic_gd_train,
    )

    rows = [(0.1 + 0.02 * i, 0) for i in range(20)] + [
        (0.7 + 0.01 * i, 1) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "f_score double, y int")
    out = {
        r["feature"]: r
        for r in logistic_gd_train(
            df, ["f_score"], "y", iterations=4, lr=0.5
        ).collect()
    }
    assert out["f_score"]["weight"] > 0
    assert out["f_score"]["train_logloss"] < math.log(2.0)


def test_quantile_gd_replica_and_coverage(spark):
    """quantile_gd_train vs an exact Python replica of the nano-
    quantized subgradient fold, plus the semantics: trained long enough
    on an intercept-only problem, the predicted constant's coverage
    approaches the target quantile — and a q=0.9 model predicts a
    strictly higher constant than a q=0.5 model on the same data."""
    import decimal

    from ningaloo_turtle_etl_spark.operators.classify import (
        quantile_gd_train,
    )

    ys = [float(v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame([(y,) for y in ys], "y double")

    def rhu(v):
        return int(decimal.Decimal(v).quantize(0, rounding=decimal.ROUND_HALF_UP))

    def replica(q, iters, lr):
        w = 0.0
        n = len(ys)
        for _ in range(iters):
            g = sum(rhu(((1.0 if w > y else 0.0) - q) * 1.0 * 1e9) for y in ys)
            w = w - lr * ((g / 1e9) / n)
        return w

    got = {
        r["feature"]: r
        for r in quantile_gd_train(
            df, [], "y", q=0.75, iterations=6, lr=32.0, add_intercept=True
        ).collect()
    }
    w = replica(0.75, 6, 32.0)
    r = got["_intercept"]
    assert abs(r["weight"] - round(w, 6)) < 1e-9
    cov = sum(1 for y in ys if y <= w) / len(ys)
    assert abs(r["coverage"] - round(cov, 6)) < 1e-9
    # semantic: coverage lands near the target quantile
    assert 0.6 <= r["coverage"] <= 0.9

    hi = quantile_gd_train(
        df, [], "y", q=0.9, iterations=20, lr=32.0
    ).collect()[0]
    lo = quantile_gd_train(
        df, [], "y", q=0.5, iterations=20, lr=32.0
    ).collect()[0]
    assert hi["weight"] > lo["weight"]


def test_gbm_stumps_replica_vshape_and_monotone_mse(spark):
    """Boosted-stump pins: (a) exact match vs a Python replica of the
    quantized grid/argmax/leaf arithmetic; (b) on a planted V-shaped
    response (y = |x - 5|, which a linear model cannot fit) three
    stumps cut the MSE far below the best single stump's; (c) train
    MSE is non-increasing in rounds."""
    import math

    from ningaloo_turtle_etl_spark.operators.classify import (
        gbm_stumps_train,
    )

    pts = [(float(x), abs(x - 5.0)) for x in range(11)] * 4
    df = spark.createDataFrame(pts, "x double, y double")
    got = gbm_stumps_train(df, ["x"], "y", iterations=3, lr=0.5).collect()

    def rnd(v):
        return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)

    n = len(pts)
    f0 = sum(rnd(y * 1e9) for _, y in pts) / 1e9 / n
    stumps = []

    def predict(x):
        p = f0
        for thr, lv, rv in stumps:
            p += 0.5 * (lv if x <= thr else rv)
        return p

    for _ in range(3):
        grid = {}
        for x, y in pts:
            c, s = grid.get(x, (0, 0))
            grid[x] = (c + 1, s + rnd((y - predict(x)) * 1e9))
        xs = sorted(grid)
        nt = sum(c for c, _ in grid.values())
        st = sum(s for _, s in grid.values())
        best = None
        nl = sl = 0
        for v in xs:
            nl += grid[v][0]
            sl += grid[v][1]
            if nl >= nt:
                break
            sld, srd = sl / 1e9, (st - sl) / 1e9
            sc = rnd((sld * sld / nl + srd * srd / (nt - nl)) * 1e6)
            key = (sc, -1, -v)  # maximize sc, tiebreak smaller v
            if best is None or key > best[0]:
                best = (key, v, nl, sl)
        _, v, nl, sl = best
        lv = (sl / 1e9) / nl
        rv = ((st - sl) / 1e9) / (nt - nl)
        stumps.append((v, lv, rv))
    se = sum(rnd((y - predict(x)) ** 2 * 1e9) for x, y in pts)
    mse3 = (se / 1e9) / n

    def r6(v):
        import decimal

        return float(
            decimal.Decimal(v).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    assert [(r["round"], r["feature"]) for r in got] == [
        (1, "x"), (2, "x"), (3, "x")
    ]
    for t, r in enumerate(got):
        assert r["threshold"] == r6(stumps[t][0])
        assert r["left_value"] == r6(stumps[t][1])
        assert r["right_value"] == r6(stumps[t][2])
    assert got[0]["f0"] == r6(f0)
    assert got[0]["train_mse"] == r6(mse3)

    # V-shape: 3 rounds beat 1 round clearly; MSE monotone in rounds
    mses = [
        gbm_stumps_train(df, ["x"], "y", iterations=k, lr=0.5).collect()[
            0
        ]["train_mse"]
        for k in (1, 2, 3)
    ]
    assert mses[0] >= mses[1] >= mses[2]
    assert mses[2] < 0.6 * mses[0]
