"""Fuzzy record linkage / entity resolution: blocked pairwise edit-distance
matching and transitive cluster canonicalization.

The classic dirty-dimension problem: the same real-world entity appears
under near-identical strings ("cold widget" / "old widget", misspelled
supplier names, OCR'd addresses) and exact grouping undercounts. The
standard pipeline (Fellegi-Sunter framing, blocking from the record-linkage
literature):

1. **Dedup names first** — pair DISTINCT strings, not rows. Name
   cardinality is orders of magnitude below row count on real corpora, so
   the quadratic stage runs on the small set and results join back by
   equality (the same dedup-then-join-back shape as the PCNM scores,
   reference spatial_modelling.Rmd:217-224).
2. **Block** — only pairs sharing a blocking key (phonetic code, token,
   prefix) are compared. Blocking bounds the pair count to
   sum(block_size²)/2; a ``max_block_names`` cap keeps one megablock (a
   degenerate key like '') from going quadratic at scale — capped blocks
   are EXCLUDED from pairing, the documented trade of recall for a hard
   cost bound (pick a finer blocking function instead of raising the cap).
3. **Score** — normalized Levenshtein similarity
   1 − lev(a,b)/max(len(a),len(b)), a pure JVM expression in Spark and a
   builtin in DuckDB, so registered uses carry full value-hash oracles.
4. **Cluster** — matched pairs are edges; transitive closure via
   :func:`~ningaloo_turtle_etl_spark.operators.graph.connected_components`
   (min-label propagation with pointer jumping); the lexicographically
   smallest reachable name canonicalizes the cluster.

Scale shape: one distinct-aggregate over names, a blocked self-join on the
name dimension (never the fact table), CC on the match edges (pairs-sized,
not corpus-sized), and equality joins back to row grain. No all-pairs stage
ever touches row counts.

Relationship to ``operators/relational.py edit_similarity_self_join`` (the
Ed-Join pipeline behind the ``entity_resolution_clusters`` query): that
operator matches at ROW grain under an ABSOLUTE edit budget with q-gram
prefix blocking inferred from the strings; this module matches at
distinct-NAME grain under a LENGTH-NORMALIZED similarity ratio with a
caller-supplied blocking key. Use Ed-Join when ids must pair directly and
"at most k typos" is the contract; use this when names repeat across many
rows and the tolerance should scale with string length — the two cover the
standard dedupe-tool surface between them.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def blocked_fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    block_fn: Callable[[Column], Column],
    threshold: float = 0.75,
    max_block_names: int = 5000,
) -> DataFrame:
    """Candidate match pairs over DISTINCT names: within each block
    (``block_fn`` applied to the name), all a<b pairs with normalized
    Levenshtein similarity >= ``threshold``. The threshold gates the
    UNROUNDED similarity; the output ``sim`` column is rounded to 6dp
    (release grain). Returns (name_a, name_b, sim).

    Blocks larger than ``max_block_names`` distinct names are dropped
    before pairing — the hard cost bound documented in the module
    docstring."""
    names = (
        df.select(F.col(name_col).alias("name"))
        .where(F.col("name").isNotNull())
        .distinct()
        .withColumn("blk", block_fn(F.col("name")))
    )
    names = (
        names.withColumn(
            "_bn", F.count(F.lit(1)).over(Window.partitionBy("blk"))
        )
        .filter(F.col("_bn") <= F.lit(int(max_block_names)))
        .drop("_bn")
    )
    a = names.select(F.col("name").alias("name_a"), "blk")
    b = names.select(F.col("name").alias("name_b"), "blk")
    sim = F.lit(1.0) - F.levenshtein("name_a", "name_b") / F.greatest(
        F.length("name_a"), F.length("name_b")
    ).cast("double")
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(sim >= F.lit(float(threshold)))
        .select("name_a", "name_b", F.round(sim, 6).alias("sim"))
    )


def fuzzy_name_clusters(
    df: DataFrame,
    name_col: str,
    block_fn: Callable[[Column], Column],
    threshold: float = 0.75,
    max_block_names: int = 5000,
) -> DataFrame:
    """Entity-resolution clusters: match pairs → transitive closure →
    canonical name per cluster (the min name reachable; unmatched names
    canonicalize to themselves). One row per distinct name:
    (name, canonical, n_records, cluster_records) where ``n_records``
    counts the rows carrying that exact name and ``cluster_records`` the
    rows across the whole cluster — the number an exact groupBy would
    have split.

    CC runs on the match edges only (pairs-sized); record counts join
    back to the name dimension by equality, and the cluster rollup is a
    window over the name-cardinality frame — nothing quadratic ever sees
    row grain."""
    from ningaloo_turtle_etl_spark.operators.graph import (
        connected_components,
    )

    pairs = blocked_fuzzy_pairs(
        df, name_col, block_fn, threshold, max_block_names
    )
    comp = connected_components(pairs, "name_a", "name_b")
    counts = (
        df.where(F.col(name_col).isNotNull())
        .groupBy(F.col(name_col).alias("name"))
        .agg(F.count(F.lit(1)).alias("n_records"))
    )
    labeled = (
        counts.join(comp, counts.name == comp.id, "left")
        .select(
            "name",
            F.coalesce("component", "name").alias("canonical"),
            "n_records",
        )
    )
    return labeled.withColumn(
        "cluster_records",
        F.sum("n_records").over(Window.partitionBy("canonical")),
    )
