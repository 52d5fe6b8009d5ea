"""Scale-mechanics queries: placement/layout plans that complement the
operators in operators/scale.py (rendezvous sharding next to the
Z-order/Hilbert/compaction layout rows registered elsewhere)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table

@register(
    "rendezvous_shard_plan",
    """
    WITH keys AS (
        SELECT CAST(doc_id AS VARCHAR) AS k FROM documents
    ),
    grid AS (
        SELECT k, CAST(t.s AS INT) AS s,
               ('0x' || substr(md5(k || '#shard=' || t.s || '#seed=7'),
                               1, 15))::BIGINT AS w
        FROM keys, range(0, 9) t(s)
    ),
    asg AS (
        SELECT k,
               (SELECT g.s FROM grid g
                WHERE g.k = a.k AND g.s < 8
                ORDER BY g.w DESC, g.s DESC LIMIT 1) AS s_n,
               (SELECT g.s FROM grid g WHERE g.k = a.k
                ORDER BY g.w DESC, g.s DESC LIMIT 1) AS s_n1
        FROM keys a
    ),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM asg),
    an AS (SELECT s_n AS shard, CAST(COUNT(*) AS BIGINT) AS n_keys
           FROM asg GROUP BY s_n),
    an1 AS (SELECT s_n1 AS shard, CAST(COUNT(*) AS BIGINT)
                AS n_keys_plus1
            FROM asg GROUP BY s_n1),
    mv AS (SELECT s_n1 AS shard, CAST(COUNT(*) AS BIGINT) AS moved_in
           FROM asg WHERE s_n <> s_n1 GROUP BY s_n1)
    SELECT COALESCE(an.shard, an1.shard) AS shard,
           COALESCE(n_keys, 0) AS n_keys,
           ROUND(COALESCE(n_keys, 0) / tot.t, 6) AS share,
           COALESCE(n_keys_plus1, 0) AS n_keys_plus1,
           COALESCE(moved_in, 0) AS moved_in
    FROM an FULL JOIN an1 ON an.shard = an1.shard
    LEFT JOIN mv ON COALESCE(an.shard, an1.shard) = mv.shard
    CROSS JOIN tot
    ORDER BY shard
    """,
)
def rendezvous_shard_plan_query(spark, sf_dir):
    """Rendezvous-hashing shard audit over document ids
    (`operators/scale.py rendezvous_shard_plan`, 8 shards, md5 HRW
    weights): per-shard balance plus the n→n+1 expansion plan — the
    minimal-disruption property (only ~1/(n+1) of keys move, ALL into
    the new shard) is visible in the moved_in column, which is zero for
    every surviving shard. Map-only weights, one shard-grain reduce."""
    from ningaloo_turtle_etl_spark.operators.scale import (
        rendezvous_shard_plan,
    )

    docs = load_table(spark, "documents", sf_dir).select(
        F.col("doc_id").cast("string").alias("k")
    )
    return rendezvous_shard_plan(docs, "k", n_shards=8, seed=7)


@register(
    "zonemap_prune_shipdate",
    """
    WITH base AS (
        SELECT CAST(l_shipdate AS DATE) AS z, l_orderkey AS ok,
               l_linenumber AS ln
        FROM lineitem
    ),
    f1 AS (SELECT z, ntile(32) OVER (ORDER BY ok, ln) AS f FROM base),
    z1 AS (
        SELECT f, MIN(z) AS zmin, MAX(z) AS zmax,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM f1 GROUP BY f
    ),
    a1 AS (
        SELECT 'insertion_order' AS layout,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(CASE WHEN zmax >= DATE '1998-06-01'
                             AND zmin < DATE '1998-06-08'
                        THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
               CAST(SUM(CASE WHEN zmax >= DATE '1998-06-01'
                             AND zmin < DATE '1998-06-08'
                        THEN 0 ELSE 1 END) AS BIGINT) AS files_pruned,
               CAST(COALESCE(SUM(CASE WHEN zmax >= DATE '1998-06-01'
                             AND zmin < DATE '1998-06-08'
                        THEN n_rows END), 0) AS BIGINT) AS rows_scanned
        FROM z1
    ),
    f2 AS (SELECT z, ntile(32) OVER (ORDER BY z, ok, ln) AS f FROM base),
    z2 AS (
        SELECT f, MIN(z) AS zmin, MAX(z) AS zmax,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM f2 GROUP BY f
    ),
    a2 AS (
        SELECT 'shipdate_sorted' AS layout,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(CASE WHEN zmax >= DATE '1998-06-01'
                             AND zmin < DATE '1998-06-08'
                        THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
               CAST(SUM(CASE WHEN zmax >= DATE '1998-06-01'
                             AND zmin < DATE '1998-06-08'
                        THEN 0 ELSE 1 END) AS BIGINT) AS files_pruned,
               CAST(COALESCE(SUM(CASE WHEN zmax >= DATE '1998-06-01'
                             AND zmin < DATE '1998-06-08'
                        THEN n_rows END), 0) AS BIGINT) AS rows_scanned
        FROM z2
    ),
    m AS (
        SELECT CAST(SUM(CASE WHEN z >= DATE '1998-06-01'
                             AND z < DATE '1998-06-08'
                        THEN 1 ELSE 0 END) AS BIGINT) AS rows_matching
        FROM base
    )
    SELECT layout, n_files, files_hit, files_pruned,
           ROUND(CAST(files_pruned AS DOUBLE)
                 / CAST(n_files AS DOUBLE), 6) AS prune_frac,
           rows_scanned, rows_matching
    FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2), m
    ORDER BY layout
    """,
)
def zonemap_prune_shipdate_query(spark, sf_dir):
    """Zone-map pruning audit of lineitem for a one-week shipdate
    predicate under two simulated 32-file layouts — insertion order vs
    shipdate-sorted (`operators/scale.py zonemap_prune_audit`): the
    WHY behind the layout stack (zorder/hilbert/compaction), showing
    min/max skipping go from ~zero to ~31/32 files when the layout
    matches the predicate column."""
    import datetime

    from ningaloo_turtle_etl_spark.operators.scale import (
        zonemap_prune_audit,
    )

    li = load_table(spark, "lineitem", sf_dir).select(
        F.to_date("l_shipdate").alias("z"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
    )
    return zonemap_prune_audit(
        li,
        "z",
        {
            "insertion_order": [F.col("ok"), F.col("ln")],
            "shipdate_sorted": [F.col("z"), F.col("ok"), F.col("ln")],
        },
        datetime.date(1998, 6, 1),
        datetime.date(1998, 6, 8),
        n_files=32,
    )
