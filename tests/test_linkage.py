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


def test_phonetic_code_matches_sql_twin_and_classic_examples(spark, duck):
    from ningaloo_turtle_etl_spark.operators.linkage import (
        phonetic_code,
        phonetic_code_sql,
    )

    names = [
        "robert", "rupert", "smith", "smyth", "peru", "perou",
        "pfister", "tymczak", "jones", "lavender", "", "a",
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        r["name"]: r["code"]
        for r in df.select("name", phonetic_code(F.col("name")).alias("code")).collect()
    }
    # classic Soundex anchors (the H/W-separator simplification does not
    # affect any of these)
    assert got["robert"] == "R163" and got["rupert"] == "R163"
    assert got["smith"] == "S530" and got["smyth"] == "S530"
    assert got["peru"] == got["perou"] == "P600"
    assert got["pfister"] == "P236"  # adjacent same-code letters collapse
    assert got[""] == "000" and got["a"] == "A000"
    # the DuckDB twin replays the chain byte-for-byte
    sql = phonetic_code_sql("name")
    rows = duck.execute(
        f"SELECT name, {sql} AS code FROM (SELECT unnest(?) AS name)",
        [names],
    ).fetchall()
    assert {n: c for n, c in rows} == got


def test_incremental_fuzzy_pairs_equals_full_restricted(spark):
    """Incremental linkage must be bit-equal to the full blocked run over
    the union, restricted to pairs involving a genuinely new name."""
    from ningaloo_turtle_etl_spark.operators.linkage import (
        blocked_fuzzy_pairs,
        incremental_fuzzy_pairs,
    )

    blk = lambda n: F.substring(n, 1, 1)  # noqa: E731
    old = spark.createDataFrame(
        [("smith",)] * 2 + [("smyth",)] + [("stone",)] + [("jones",)],
        "name string",
    )
    # 'smithe' is new; 'smith' repeats (already linked -> NOT new);
    # 'jonas' is new in the j block
    new = spark.createDataFrame(
        [("smithe",), ("smith",), ("jonas",)], "name string"
    )
    inc = {
        (r["name_a"], r["name_b"], r["sim"])
        for r in incremental_fuzzy_pairs(
            old, new, "name", blk, threshold=0.7
        ).collect()
    }
    union = old.unionByName(new)
    new_only = {"smithe", "jonas"}
    full = {
        (r["name_a"], r["name_b"], r["sim"])
        for r in blocked_fuzzy_pairs(
            union, "name", blk, threshold=0.7
        ).collect()
        if r["name_a"] in new_only or r["name_b"] in new_only
    }
    assert inc == full and inc  # equal AND non-trivial
    # never an old x old pair
    assert not any(
        a not in new_only and b not in new_only for a, b, _ in inc
    )
    # the repeated name never re-pairs: smith x smyth is an OLD edge
    assert not any({a, b} == {"smith", "smyth"} for a, b, _ in inc)
