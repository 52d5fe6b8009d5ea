"""Fuzzy record linkage: blocked edit-distance pairs and transitive
entity-resolution clusters (operators/linkage.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ningaloo_turtle_etl_spark.operators.linkage import (
    blocked_fuzzy_pairs,
    fuzzy_name_clusters,
)
from ningaloo_turtle_etl_spark.registry import oracle_sql, queries
from tests.conftest import SF_DIR, assert_df_matches_oracle

BLOCK = staticmethod(lambda name: F.substring(name, 1, 1))


@pytest.fixture(scope="module")
def records(spark):
    # 'smith'/'smyth' match (sim 0.8); 'smith'/'stone' don't (lev 4);
    # 'jones' is in another block entirely; NULL names are excluded.
    rows = (
        [("smith",)] * 3
        + [("smyth",)] * 2
        + [("stone",)]
        + [("jones",)] * 4
        + [(None,)]
    )
    return spark.createDataFrame(rows, "name string")


def test_blocked_fuzzy_pairs_threshold_and_blocking(spark, records):
    pairs = blocked_fuzzy_pairs(
        records, "name", lambda n: F.substring(n, 1, 1), threshold=0.75
    ).collect()
    assert [(r["name_a"], r["name_b"], r["sim"]) for r in pairs] == [
        ("smith", "smyth", 0.8)
    ]
    # dropping the threshold admits the weaker in-block pair but never a
    # cross-block one ('jones' starts with j)
    loose = {
        (r["name_a"], r["name_b"])
        for r in blocked_fuzzy_pairs(
            records, "name", lambda n: F.substring(n, 1, 1), threshold=0.1
        ).collect()
    }
    assert ("smith", "smyth") in loose and ("smyth", "stone") in loose
    assert not any("jones" in p for pair in loose for p in pair)


def test_blocked_fuzzy_pairs_block_cap(spark, records):
    # the s-block has 3 distinct names; a cap of 2 drops the whole block
    capped = blocked_fuzzy_pairs(
        records,
        "name",
        lambda n: F.substring(n, 1, 1),
        threshold=0.1,
        max_block_names=2,
    ).collect()
    assert capped == []


def test_fuzzy_name_clusters_canonical_and_counts(spark, records):
    out = {
        r["name"]: r
        for r in fuzzy_name_clusters(
            records, "name", lambda n: F.substring(n, 1, 1), threshold=0.75
        ).collect()
    }
    # 4 distinct non-null names, each exactly one output row
    assert set(out) == {"smith", "smyth", "stone", "jones"}
    # matched pair canonicalizes to the min name; record counts roll up
    assert out["smith"]["canonical"] == "smith"
    assert out["smyth"]["canonical"] == "smith"
    assert out["smith"]["n_records"] == 3 and out["smyth"]["n_records"] == 2
    assert out["smith"]["cluster_records"] == 5
    assert out["smyth"]["cluster_records"] == 5
    # unmatched names are their own singleton clusters
    assert out["stone"]["canonical"] == "stone"
    assert out["stone"]["cluster_records"] == 1
    assert out["jones"]["canonical"] == "jones"
    assert out["jones"]["cluster_records"] == 4


def test_linkage_queries_match_oracle(spark, duck):
    qs, os_ = queries(), oracle_sql()
    for name in ("fuzzy_part_pairs", "fuzzy_part_clusters"):
        assert_df_matches_oracle(qs[name](spark, SF_DIR), duck, os_[name])
