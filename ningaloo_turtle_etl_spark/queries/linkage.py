"""Fuzzy record-linkage queries (operators/linkage.py): blocked
edit-distance match pairs and transitive entity-resolution clusters over
the part-name dimension. Both carry full DuckDB value-hash oracles —
levenshtein is a builtin on both engines, and the transitive closure
replays as a recursive CTE (same pattern as near_dup_clusters)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.linkage import (
    blocked_fuzzy_pairs,
    fuzzy_name_clusters,
)
from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table

# Blocking key: the noun token of "adjective noun" part names — the
# phonetic-code / last-token blocking slot of a linkage pipeline.
# NULLIF mirrors Spark's F.split(...).getItem(1), which yields NULL (not
# '') for one-token names — a NULL block never equi-joins, while DuckDB's
# bare split_part('x',' ',2)='' would silently pair all such names.
_BLK_SQL = "NULLIF(split_part(p_name, ' ', 2), '')"

_PAIRS_SQL = f"""
    WITH n0 AS (
        SELECT DISTINCT p_name AS name, {_BLK_SQL} AS blk
        FROM part WHERE p_name IS NOT NULL
    ),
    -- mirror the operator's max_block_names=5000 hard cost cap: oversized
    -- blocks are EXCLUDED from pairing on both engines
    n AS (
        SELECT name, blk FROM (
            SELECT name, blk, COUNT(*) OVER (PARTITION BY blk) AS bn
            FROM n0
        ) WHERE bn <= 5000
    ),
    pairs AS (
        SELECT a.name AS name_a, b.name AS name_b,
               1.0 - levenshtein(a.name, b.name) * 1.0
                     / greatest(length(a.name), length(b.name)) AS sim_raw
        FROM n a JOIN n b ON a.blk = b.blk AND a.name < b.name
    )
    SELECT name_a, name_b, ROUND(sim_raw, 6) AS sim
    FROM pairs WHERE sim_raw >= 0.75
"""


@register(
    "fuzzy_part_pairs",
    _PAIRS_SQL + "\n    ORDER BY name_a, name_b",
)
def q_fuzzy_part_pairs(spark, sf_dir):
    """Blocked fuzzy match pairs over the distinct part-name dimension
    (`operators/linkage.py blocked_fuzzy_pairs`): within each noun block,
    a<b pairs with normalized Levenshtein similarity >= 0.75 — the
    candidate-generation stage of record linkage. The quadratic stage runs
    on 64 distinct names, never the 2000-row part table; the threshold
    gates the unrounded similarity and the output rounds to 6dp."""
    part = load_table(spark, "part", sf_dir)
    return blocked_fuzzy_pairs(
        part,
        "p_name",
        lambda name: F.split(name, " ").getItem(1),
        threshold=0.75,
    ).orderBy("name_a", "name_b")


@register(
    "fuzzy_part_clusters",
    f"""
    WITH RECURSIVE matched AS (
        {_PAIRS_SQL}
    ),
    edges AS (
        SELECT name_a AS src, name_b AS dst FROM matched
        UNION
        SELECT name_b, name_a FROM matched
    ),
    reach(id, anc) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.anc FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comp AS (
        SELECT id, MIN(anc) AS component FROM reach GROUP BY id
    ),
    counts AS (
        SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_records
        FROM part WHERE p_name IS NOT NULL GROUP BY 1
    ),
    labeled AS (
        SELECT counts.name,
               COALESCE(comp.component, counts.name) AS canonical,
               n_records
        FROM counts LEFT JOIN comp ON counts.name = comp.id
    )
    SELECT name, canonical, n_records,
           CAST(SUM(n_records) OVER (PARTITION BY canonical) AS BIGINT)
               AS cluster_records
    FROM labeled
    ORDER BY canonical, name
    """,
)
def q_fuzzy_part_clusters(spark, sf_dir):
    """Entity-resolution clusters over part names
    (`operators/linkage.py fuzzy_name_clusters`): the match pairs fed
    through distributed min-label connected components, canonicalized to
    the smallest reachable name, with per-name and per-cluster record
    counts — the rollup an exact groupBy would have split across spelling
    variants. The DuckDB oracle replays the closure as a recursive CTE."""
    part = load_table(spark, "part", sf_dir)
    return fuzzy_name_clusters(
        part,
        "p_name",
        lambda name: F.split(name, " ").getItem(1),
        threshold=0.75,
    ).orderBy("canonical", "name")


def _soundex_pairs_sql() -> str:
    from ningaloo_turtle_etl_spark.operators.linkage import phonetic_code_sql

    blk = phonetic_code_sql("regexp_extract(p_name, '([a-z]+)$', 1)")
    return f"""
    WITH n0 AS (
        SELECT DISTINCT p_name AS name,
               {blk} AS blk
        FROM part WHERE p_name IS NOT NULL
    ),
    n AS (
        SELECT name, blk FROM (
            SELECT name, blk, COUNT(*) OVER (PARTITION BY blk) AS bn
            FROM n0
        ) WHERE bn <= 5000
    ),
    pairs AS (
        SELECT a.name AS name_a, b.name AS name_b,
               1.0 - levenshtein(a.name, b.name) * 1.0
                     / greatest(length(a.name), length(b.name)) AS sim_raw
        FROM n a JOIN n b ON a.blk = b.blk AND a.name < b.name
    )
    SELECT name_a, name_b, ROUND(sim_raw, 6) AS sim
    FROM pairs WHERE sim_raw >= 0.75
    ORDER BY name_a, name_b
    """


@register("fuzzy_part_soundex_pairs", _soundex_pairs_sql())
def q_fuzzy_part_soundex_pairs(spark, sf_dir):
    """Fuzzy match pairs blocked by the built-in PHONETIC key
    (`operators/linkage.py phonetic_code` over the final name token) —
    the out-of-the-box blocking choice when no domain key exists:
    sound-alike spelling variants land in one block even when no token
    matches exactly, the classic recall win of Soundex blocking over
    token equality. The portable Soundex-style chain (translate +
    nested-replace collapse) computes IDENTICALLY in Catalyst and the
    DuckDB oracle, so this row is value-hash checked — the engine
    builtin F.soundex could not be."""
    from ningaloo_turtle_etl_spark.operators.linkage import phonetic_code

    part = load_table(spark, "part", sf_dir)
    return blocked_fuzzy_pairs(
        part,
        "p_name",
        lambda name: phonetic_code(
            F.regexp_extract(name, "([a-z]+)$", 1)
        ),
        threshold=0.75,
    ).orderBy("name_a", "name_b")


@register(
    "fuzzy_part_incremental_pairs",
    f"""
    WITH oldn AS (
        SELECT DISTINCT p_name AS name FROM part
        WHERE p_partkey % 7 <> 0 AND p_name IS NOT NULL
    ),
    newn AS (
        SELECT DISTINCT p_name AS name FROM part
        WHERE p_partkey % 7 = 0 AND p_name IS NOT NULL
          AND p_name NOT IN (SELECT name FROM oldn)
    ),
    u AS (
        SELECT name, FALSE AS is_new FROM oldn
        UNION ALL
        SELECT name, TRUE FROM newn
    ),
    n0 AS (
        SELECT name, is_new,
               NULLIF(split_part(name, ' ', 2), '') AS blk
        FROM u
    ),
    n AS (
        SELECT name, is_new, blk FROM (
            SELECT name, is_new, blk,
                   COUNT(*) OVER (PARTITION BY blk) AS bn
            FROM n0
        ) WHERE bn <= 5000
    ),
    cand AS (
        SELECT DISTINCT least(a.name, b.name) AS name_a,
                        greatest(a.name, b.name) AS name_b
        FROM n a JOIN n b ON a.blk = b.blk AND a.name <> b.name
        WHERE a.is_new
    )
    SELECT name_a, name_b,
           ROUND(1.0 - levenshtein(name_a, name_b) * 1.0
                 / greatest(length(name_a), length(name_b)), 6) AS sim
    FROM cand
    WHERE 1.0 - levenshtein(name_a, name_b) * 1.0
          / greatest(length(name_a), length(name_b)) >= 0.75
    ORDER BY name_a, name_b
    """,
)
def q_fuzzy_part_incremental_pairs(spark, sf_dir):
    """Incremental linkage over a simulated nightly part-ingest
    (`operators/linkage.py incremental_fuzzy_pairs`): parts with
    p_partkey % 7 == 0 arrive as the new batch, everything else is the
    standing dimension; only pairs involving a genuinely NEW name (never
    seen in the old batch) are emitted — new x old and new x new, never
    old x old. Bit-equal to the full blocked run restricted to new-name
    pairs (pinned in tests/test_linkage.py)."""
    from ningaloo_turtle_etl_spark.operators.linkage import (
        incremental_fuzzy_pairs,
    )

    part = load_table(spark, "part", sf_dir)
    old = part.filter(F.col("p_partkey") % 7 != 0)
    new = part.filter(F.col("p_partkey") % 7 == 0)
    return incremental_fuzzy_pairs(
        old,
        new,
        "p_name",
        lambda name: F.split(name, " ").getItem(1),
        threshold=0.75,
    ).orderBy("name_a", "name_b")


@register(
    "symspell_customer_pairs",
    """
    WITH n AS (
        SELECT DISTINCT c_name AS name FROM customer
        WHERE c_name IS NOT NULL
    ),
    keys AS (
        SELECT name, unnest(list_distinct(list_append(
            list_transform(generate_series(1, length(name)),
                i -> substr(name, 1, i - 1) || substr(name, i + 1)),
            name))) AS k
        FROM n
    ),
    cand AS (
        SELECT DISTINCT a.name AS name_a, b.name AS name_b
        FROM keys a JOIN keys b ON a.k = b.k AND a.name < b.name
    )
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(name_a, name_b) <= 1
    ORDER BY name_a, name_b
    """,
)
def q_symspell_customer_pairs(spark, sf_dir):
    """Every edit-distance-1 customer-name pair via SymSpell
    delete-neighborhood blocking (`operators/linkage.py
    symspell_del1_pairs`): the precomputed-index alternative to
    Ed-Join's prefix filter on the same linkage surface — exactly
    complete for ed ≤ 1 by the symmetric-delete meeting argument, with
    candidate generation as a pure equi-join on delete keys."""
    from ningaloo_turtle_etl_spark.operators.linkage import (
        symspell_del1_pairs,
    )

    cust = load_table(spark, "customer", sf_dir)
    return symspell_del1_pairs(cust, "c_name").orderBy("name_a", "name_b")
