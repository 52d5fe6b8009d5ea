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
