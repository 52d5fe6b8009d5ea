"""Snapshot-diff tests: status classification, null-sentinel collision
safety, summary shares, and the payload-free shuffle shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.delta import (
    snapshot_diff,
    snapshot_diff_summary,
)
from ningaloo_turtle_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _snapshots(spark):
    docs = load_table(spark, "documents", SF_DIR)
    old = docs.filter(F.col("doc_id") % 13 != 5).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, F.upper(F.col("text"))).otherwise(
            F.col("text")
        ),
    )
    new = docs.filter(F.col("doc_id") % 11 != 3)
    return old, new


def test_snapshot_diff_statuses(spark):
    old, new = _snapshots(spark)
    d = snapshot_diff(old, new, keys=["doc_id"]).cache()
    try:
        by = {r["status"]: r["n"] for r in
              d.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
        # Derived from the modular construction on 500 docs (0..499):
        # added = %13==5 and %11!=3; removed = %11==3 and %13!=5;
        # changed = in both and %7==0; 3 ids (135,278,421) are in neither.
        assert by == {"added": 36, "removed": 43, "changed": 60, "unchanged": 358}
        assert d.count() == 497
        spot = {r["doc_id"]: r["status"] for r in d.collect()}
        assert spot[5] == "added"  # 5%13==5, 5%11!=3
        assert spot[3] == "removed"  # 3%11==3
        assert spot[7] == "changed"  # 7%7==0, in both
        assert spot[1] == "unchanged"
        assert 135 not in spot  # in neither snapshot
    finally:
        d.unpersist()


def test_snapshot_diff_default_compare_cols_and_nulls(spark):
    """Defaults pick all shared non-key columns; a NULL never equals any
    non-NULL value and shifted nulls ((NULL,'a') vs ('a',NULL)) differ."""
    rows = [(1, None, "a"), (2, "a", None), (3, "x", "y")]
    old = spark.createDataFrame(rows, "k int, c1 string, c2 string")
    new = spark.createDataFrame(
        [(1, "a", None), (2, "a", None), (3, "x", "z")], "k int, c1 string, c2 string"
    )
    got = {r["k"]: r["status"] for r in snapshot_diff(old, new, keys=["k"]).collect()}
    assert got == {1: "changed", 2: "unchanged", 3: "changed"}


def test_snapshot_diff_summary_shares(spark):
    old, new = _snapshots(spark)
    rows = snapshot_diff_summary(old, new, keys=["doc_id"]).collect()
    assert {r["status"] for r in rows} == {"added", "removed", "changed", "unchanged"}
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert sum(r["n"] for r in rows) == 497


def test_snapshot_diff_plan_shuffles_fingerprints_not_payloads(spark):
    """Pin the scale-critical plan shape: the full-outer join is keyed on
    doc_id and each side is reduced to a 2-column (key, fingerprint)
    projection BEFORE its exchange — document payloads are consumed
    map-side inside the md5 expression and never cross the shuffle."""
    import re

    old, new = _snapshots(spark)
    df = snapshot_diff(old, new, keys=["doc_id"])
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # eqNullSafe keys partition on (coalesce(key, lit), isnull(key))
    assert "SortMergeJoin" in plan
    assert len(re.findall(r"hashpartitioning\((coalesce\()?doc_id", plan)) >= 2
    # Each side collapses to exactly two columns (key + fp) at some Project
    # below its exchange.
    for fp in ("_old_fp", "_new_fp"):
        assert re.search(rf"Output \[2\]:.*{fp}", plan), f"{fp} side not pruned:\n{plan}"


def test_snapshot_diff_verify_keys_raises_on_duplicate_grain(spark):
    """The guard catches the silent-explosion footgun: lineitem's
    (orderkey, linenumber) is NOT unique in this generator's data."""
    import pytest

    li = load_table(spark, "lineitem", SF_DIR)
    with pytest.raises(ValueError, match="not unique"):
        snapshot_diff(
            li, li, keys=["l_orderkey", "l_linenumber"],
            compare_cols=["l_quantity"], verify_keys=True,
        )
    # and passes on a true unique grain
    docs = load_table(spark, "documents", SF_DIR)
    out = snapshot_diff(
        docs, docs, keys=["doc_id"], compare_cols=["text"], verify_keys=True
    )
    assert out.filter(F.col("status") != "unchanged").count() == 0


def test_snapshot_diff_null_keys_match_null_safely(spark):
    """A NULL key present on both sides is ONE key, not a spurious
    removed+added pair."""
    old = spark.createDataFrame([(None, "a"), (1, "b")], "k int, v string")
    new = spark.createDataFrame([(None, "a"), (1, "c")], "k int, v string")
    got = {r["k"]: r["status"] for r in snapshot_diff(old, new, keys=["k"]).collect()}
    assert got == {None: "unchanged", 1: "changed"}


def test_scd2_collapses_runs_into_validity_intervals(spark):
    from datetime import datetime

    from ningaloo_turtle_etl_spark.operators.delta import scd2_history

    t = lambda h: datetime(2025, 1, 1, h)
    rows = [
        # key u1: A,A,B,A → versions A[1,3), B[3,4), A[4,∞)
        ("u1", t(1), 1, "A"),
        ("u1", t(2), 2, "A"),
        ("u1", t(3), 3, "B"),
        ("u1", t(4), 4, "A"),
        # key u2: null state then 'null' string — must be distinct versions
        ("u2", t(1), 5, None),
        ("u2", t(2), 6, "null"),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid int, state string")
    out = scd2_history(df, ["k"], "ts", ["state"], tiebreak_col="eid")
    got = {
        (r["k"], r["version"]): r
        for r in out.collect()
    }
    assert len(got) == 5
    v1, v2, v3 = got[("u1", 1)], got[("u1", 2)], got[("u1", 3)]
    assert (v1["state"], v1["n_events"], v1["valid_from"], v1["valid_to"]) == (
        "A", 2, t(1), t(3)
    )
    assert (v2["state"], v2["valid_from"], v2["valid_to"]) == ("B", t(3), t(4))
    assert v3["state"] == "A" and v3["valid_to"] is None and v3["is_current"]
    assert not v1["is_current"] and not v2["is_current"]
    # null state and the literal string 'null' do not collide
    assert got[("u2", 1)]["state"] is None
    assert got[("u2", 2)]["state"] == "null"


def test_scd2_same_timestamp_ties_break_deterministically(spark):
    from datetime import datetime

    from ningaloo_turtle_etl_spark.operators.delta import scd2_history

    ts = datetime(2025, 6, 1, 12)
    rows = [("k", ts, 2, "B"), ("k", ts, 1, "A"), ("k", ts, 3, "B")]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid int, state string")
    out = sorted(
        scd2_history(df, ["k"], "ts", ["state"], tiebreak_col="eid").collect(),
        key=lambda r: r["version"],
    )
    # eid order: A, B, B → two versions, second collapses the B pair
    assert [(r["state"], r["n_events"]) for r in out] == [("A", 1), ("B", 2)]
