"""Inter-annotator agreement (operators/agreement.py): hand-computed kappa
values, null handling, the degenerate single-label case, and grouping."""

from __future__ import annotations

import pytest

from ningaloo_turtle_etl_spark.operators.agreement import (
    agreement_confusion,
    cohens_kappa,
)


@pytest.fixture(scope="module")
def labels(spark):
    rows = [
        # group g1: classic 2x2 example — po=0.7, pe=0.5, kappa=0.4
        *[("g1", "yes", "yes")] * 4,
        *[("g1", "no", "no")] * 3,
        *[("g1", "yes", "no")] * 2,
        *[("g1", "no", "yes")] * 1,
        # group g2: perfect agreement on a single label (pe=1 edge case)
        *[("g2", "yes", "yes")] * 5,
        # group g3: has a null-labeled row that must be excluded
        ("g3", "yes", "yes"),
        ("g3", "no", "no"),
        ("g3", None, "yes"),
    ]
    return spark.createDataFrame(rows, "grp string, a string, b string")


def test_kappa_hand_computed(spark, labels):
    out = {
        r["grp"]: r
        for r in cohens_kappa(labels, "a", "b", by=["grp"]).collect()
    }
    g1 = out["g1"]
    # marginals: rater_a yes=6 no=4, rater_b yes=5 no=5
    # po = 7/10; pe = (6*5 + 4*5)/100 = 0.5; kappa = 0.2/0.5 = 0.4
    assert g1["n_items"] == 10
    assert g1["p_observed"] == 0.7
    assert g1["p_expected"] == 0.5
    assert g1["kappa"] == 0.4


def test_kappa_degenerate_single_label_is_one(spark, labels):
    out = {
        r["grp"]: r
        for r in cohens_kappa(labels, "a", "b", by=["grp"]).collect()
    }
    g2 = out["g2"]
    assert g2["p_expected"] == 1.0 and g2["kappa"] == 1.0


def test_kappa_excludes_null_labels(spark, labels):
    out = {
        r["grp"]: r
        for r in cohens_kappa(labels, "a", "b", by=["grp"]).collect()
    }
    assert out["g3"]["n_items"] == 2  # the null-rater row dropped


def test_kappa_ungrouped_single_row(spark, labels):
    rows = cohens_kappa(labels.filter("grp = 'g1'"), "a", "b").collect()
    assert len(rows) == 1 and rows[0]["kappa"] == 0.4


def test_kappa_asymmetric_label_sets(spark):
    # rater_b uses a label rater_a never emits: pe must count it as zero
    # product, not drop rows.
    df = spark.createDataFrame(
        [("yes", "yes"), ("yes", "maybe"), ("no", "no"), ("no", "no")],
        "a string, b string",
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    # po = 3/4; marginals a: yes=2 no=2; b: yes=1 maybe=1 no=2
    # pe = (2*1 + 2*2 + 0*1)/16 = 6/16 = 0.375; kappa = 0.375/0.625 = 0.6
    assert r["n_items"] == 4
    assert r["p_observed"] == 0.75
    assert r["p_expected"] == 0.375
    assert r["kappa"] == 0.6


def test_agreement_confusion_counts(spark, labels):
    cells = {
        (r["label_a"], r["label_b"]): r["n_items"]
        for r in agreement_confusion(
            labels.filter("grp = 'g1'"), "a", "b"
        ).collect()
    }
    assert cells == {
        ("yes", "yes"): 4,
        ("no", "no"): 3,
        ("yes", "no"): 2,
        ("no", "yes"): 1,
    }
