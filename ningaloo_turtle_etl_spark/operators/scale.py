"""Scale mechanics: skew salting and bucketed co-located joins.

AQE's skew-join splitting (on by default in session.py) handles most skew;
these helpers cover the two cases it can't:

- ``salted_join``: a fact-fact join where ONE side has pathological hot keys
  (one key = billions of rows). Salting fans each hot key into S synthetic
  sub-keys; the other side is replicated S ways for those keys only.
- ``write_bucketed`` / co-located reads: repeated joins/aggregations on the
  same key amortize their shuffle by bucketing at write time — both sides
  cluster by hash(key) % buckets, so the join is shuffle-free forever after
  (the classic warehouse layout for a 100 TB fact table).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side with a
    random bucket, explode the other side across all buckets, join on
    (key, salt). Shuffle partitions for a hot key go from 1 to
    ``salt_buckets``. The non-skewed side grows by the salt factor — use for
    dim-ish or pre-aggregated right sides; for two huge skewed sides prefer
    AQE skew splitting.

    Only inner/left are supported: an outer join would emit one copy of each
    unmatched ``other`` row per salt bucket."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    s = skewed.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return s.join(o, on=[on, "_salt"], how=how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table. Joins and
    aggregations on ``bucket_cols`` between tables bucketed the same way run
    without a shuffle (verified in tests/test_scale.py)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
