from __future__ import annotations

from tests.conftest import SF_DIR, assert_df_matches_oracle

from ningaloo_turtle_etl_spark.plans.flagship import ORACLE_SQL, summary_pivot


def test_flagship_matches_oracle(spark, duck):
    assert_df_matches_oracle(summary_pivot(spark, SF_DIR), duck, ORACLE_SQL)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "o_orderpriority" in df.columns
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)


def test_join_left_composite_null_key_contract(spark, tmp_path):
    """r14 (VERDICT r13 item 4 / ADVICE): pin the window form's declared
    NULL-composite-key behavior so the r13 rewrite can't silently diverge
    on dirty data. The window partitionBy groups each distinct NULL
    pattern into its own partition and emits COUNTS for those rows; the
    replaced groupBy+left-join form (and the DuckDB oracle, which keeps
    the join form) would emit NULL n_lines/total_qty instead. The
    registered query therefore carries a NON-NULL-key precondition
    (true for this generator's TPC-H-style schema) — this test pins the
    behavior the window form actually has, so a future schema change
    that nullifies the keys trips a failing assertion here rather than
    an oracle hash break at scale."""
    from ningaloo_turtle_etl_spark import registry

    rows = [
        (1, 1, 10, 100, 5.0),
        (1, 2, 10, 100, 7.0),
        (2, 1, None, 100, 1.0),
        (2, 2, None, None, 2.0),
        (3, 1, 10, None, 3.0),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_partkey long, "
        "l_suppkey long, l_quantity double",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = registry.queries()["join_left_composite"](spark, str(tmp_path))
    got = {
        (r["l_orderkey"], r["l_linenumber"]): (r["n_lines"], r["total_qty"])
        for r in out.collect()
    }
    # non-null composite keys aggregate normally
    assert got[(1, 1)] == (2, 12.0)
    assert got[(1, 2)] == (2, 12.0)
    # declared window-form behavior: each distinct NULL pattern is its
    # own partition — real counts, NOT the join form's NULL aggregates
    assert got[(2, 1)] == (1, 1.0)
    assert got[(2, 2)] == (1, 2.0)
    assert got[(3, 1)] == (1, 3.0)
