"""Benchmark harness — driver contract (one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints:
  {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Timing policy: one untimed warmup action first (JIT + code cache + parquet
footer cache), then the headline list timed round-robin ``--runs`` times
(default 3); each query reports its MIN with the max-min spread alongside
(``queries_spread``), end-to-end (plan + execute + collect). Results are
small aggregates by design — collect cost is the driver-side constant, not
the measurement. Min-of-N replaced single-shot in r9: four rounds of
cross-round deltas were traced to host load, and the idle-wait threshold
proved unreachable, so min-of-N is the in-artifact noise floor. r10
extends the same policy to the extras (``--extras-runs``, default 2,
round-robin, with per-probe spread + min-rep loadavg recorded) — r9's
single-shot extras shipped phantom 2.4x regressions under ramping load.
The result JSON is also written to ``--out`` (default BENCH_LAST.json):
r9's driver artifact was truncated mid-JSON by bounded stdout-tail
capture, so the file is the authoritative copy. ``--scale-extras`` swaps
in the 10x SCALE_EXTRAS table (iterative/quadratic-risk families) for
the sf1 scaling probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ningaloo_turtle_etl_spark import registry  # noqa: E402
from ningaloo_turtle_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per workload family — wide agg scan, broadcast-chain join,
# pivot, fact-fact shuffle join, window, flagship composite, streaming-batch
# window, spatial UDF join, and the training-data ops (dedup, ANN).
HEADLINE = [
    "pricing_summary",
    "lookup_chain_revenue",
    "flagship_summary_pivot",
    "pivot_event_types",
    "join_left_composite",
    "topk_per_group",
    "tumbling_daily_tally",
    "spatial_tag_regions",
    "dedup_exact",
    "minhash_near_dups",
    "embedding_cosine_topk",
]

# Row-heavy outputs: measure execution with an order-insensitive checksum
# agg instead of shipping rows to pandas.
CHECKSUM = {
    "join_left_composite": "n_lines",
    "dedup_exact": "doc_id",
}


def _minhash_family(hash_family):
    """minhash_near_dups' computation with an explicit hash family. The
    registered query switched to the md5 family in r04 (DuckDB-reproducible
    → full oracle row); the HEADLINE keeps timing the xxhash64 scale
    default so the r01-r03 series stays apples-to-apples, and the md5
    form lands in extras instead. NB: extras report min-of-2 (warm) while
    headline queries run once, so the md5 extra often prints FASTER than
    the xxhash64 headline — the like-for-like warm/warm comparison
    (measured separately, 3 alternating reps) is md5 ≈ 1.7× slower
    (2.4 s vs 1.4 s at 500 sf0.1 docs)."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.dedup import minhash_near_dup_pairs

        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 500)
        )
        return minhash_near_dup_pairs(
            docs, shingle_n=3, threshold=0.5, hash_family=hash_family
        )

    return run


# Headline entries measured via a pinned callable instead of the registry
# (keeps round-over-round continuity when a registered query's evidence
# form changes).
HEADLINE_OVERRIDES = {
    "minhash_near_dups": _minhash_family("xxhash64"),
}


# --- extras: scale probes OUTSIDE the headline total (round-over-round
# continuity keeps `value` summing the same 11 queries) -----------------------

def _spatial_10x(variant):
    """spatial_tag_regions at 10x the sf's point count — pins tagger
    throughput where the tagger, not session overhead, dominates. Two
    variants: the vectorized ray-cast pandas UDF vs the r03 pure-Catalyst
    fold (tag_regions_expr); the ratio is the measured Python-boundary
    cost."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.spatial import (
            tag_regions,
            tag_regions_expr,
        )
        from ningaloo_turtle_etl_spark.queries.spatial import REGIONS

        n = spark.read.parquet(f"{sf_dir}/customer.parquet").count() * 10
        # 8 partitions, not default parallelism: range() at 32 partitions
        # spawns 32 Python workers, which measurably degrades the rest of
        # the session in local mode (see the warmup note in main()).
        pts = spark.range(1, n + 1, 1, 8).select(
            F.col("id").alias("c_custkey"),
            (F.lit(-180) + (F.col("id") * 7) % 360 + 0.5).alias("lon"),
            (F.lit(-90) + (F.col("id") * 13) % 180 + 0.5).alias("lat"),
        )
        tagger = tag_regions if variant == "udf" else tag_regions_expr
        tagged = tagger(pts, REGIONS, lon_col="lon", lat_col="lat")
        return tagged.groupBy("location").agg(F.count(F.lit(1)).alias("n"))

    return run


def _spread(df):
    """Replicated-scale fixtures derive from ONE small parquet file, which
    arrives as a single input split — unions of it give one partition per
    copy and a crossJoin gives ONE total, so downstream map stages run on
    a fraction of the cores. Spread to the session's parallelism first
    (one tiny shuffle of the raw rows): the shape a real multi-split
    corpus already has, and the cost is charged inside the timed run."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def _replicated(df, copies, id_col=None, shift=0):
    """Replicate ``df`` ``copies``× as ONE scan crossJoined with a tiny
    broadcast replica index — the IDENTICAL row multiset to the
    unionByName loop it replaces (replica r has ``id_col`` shifted by
    r·shift; plain copies when id_col is None), from the same parquet
    input, computed inside the same timed region.

    r14 (guide §1.2 fewer passes / §6, VERDICT r13 item 8): the union
    form re-scanned and re-planned the same parquet file once per copy
    — 10-20 scans of fixture cost charged inside every consumer probe's
    timed region, conflating fixture cost with operator cost in every
    probe delta. Affected probes keep their names; the old-form and
    new-form numbers are both committed (BENCH_LOCAL_r14_baseline.json
    vs the r14 idle artifact) per the sanctioned old+new transition, and
    the per-probe attribution lives in OPTIMIZATION_r14.md."""
    import pyspark.sql.functions as F

    if copies <= 1:
        return df
    # Spread the BASE rows before expanding: the crossJoin inherits its
    # stream side's partitioning, and a small parquet fixture arrives as
    # 1-4 scan splits — without this the expansion stage (and the
    # sort-before-shuffle of the consumer's keyless _spread repartition,
    # guide §2.5) ran near-serially, which the first r14 idle run caught
    # as a 2× regression on winsorize_6m_exact/minhash_pairs_100k. The
    # union form had one partition per copy; this restores ≥ that
    # parallelism for one tiny base-row shuffle.
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    reps = F.broadcast(
        df.sparkSession.range(copies).select(F.col("id").alias("_rep"))
    )
    out = df.crossJoin(reps)
    if id_col is not None:
        out = out.withColumn(
            id_col, F.col(id_col) + F.col("_rep") * F.lit(int(shift))
        )
    return out.drop("_rep")


def _simhash_signatures(signature):
    """SimHash signature stage over documents replicated to 50k rows — the
    round-1 perf-weak item. Catalyst (filter-count bit kernel) vs the
    pandas-UDF/FNV form; the ratio is the measured speedup."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.dedup import simhash_udf, with_simhash

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        copies = 50_000 // max(docs.count(), 1)
        big = _spread(_replicated(docs, max(copies, 1)))
        if signature == "catalyst":
            sig = with_simhash(big)
        else:
            sig = big.select(
                F.col("doc_id").alias("id"), simhash_udf()(F.col("text")).alias("sig")
            )
        return sig.agg(F.sum(F.bit_count("sig")).alias("chk"))

    return run


# Ordered: JVM-only probes before the pandas-UDF-heavy one, so worker-pool
# spawn can't poison the JVM measurements. Probes run round-robin
# ``--extras-runs`` times and report min + spread + min-rep loadavg —
# these are steady-state throughput claims, and first-run worker spawn /
# codegen costs at this size swamp the signal run-to-run.
def _decontam_50k(spark, sf_dir):
    """Decontamination throughput at 50k docs: word-3-gram explode into a
    broadcast eval vocabulary with map-side partial agg — the corpus-side
    pass is shuffle-free, so this should scale with scan width."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.curation import contamination_flags

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = max(docs.count(), 1)
    copies = 50_000 // n
    big = _spread(_replicated(docs, max(copies, 1), "doc_id", n))
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    flags = contamination_flags(big, bench, n=3, threshold=0.2)
    return flags.agg(
        F.sum("n_contaminated").alias("chk"), F.count(F.lit(1)).alias("n")
    )


def _bloom_decontam_50k(spark, sf_dir):
    """Bloom-prefiltered decontamination at 50k docs, same fixture as
    decontam_50k: the eval vocab broadcasts as a Bloom bitmap tested with
    integer Catalyst expressions; only surviving grams reach the exact
    verify join. Eager: the bitmap build (vocab count + executor-side
    treeReduce bitmap fold) runs inside the builder.
    Headline comparison: ~2-3× decontam_50k here — this fixture's
    corpus shares the eval vocabulary, so most grams are TRUE hits and the
    verify join carries nearly the full gram stream; the bloom path's win
    appears when the vocab outgrows broadcast (which this container can't
    hold) and contamination is rare (real corpora), where the verify join
    shrinks to ~fpp of the gram stream."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.curation import (
        bloom_contamination_flags,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = max(docs.count(), 1)
    copies = 50_000 // n
    big = _spread(_replicated(docs, max(copies, 1), "doc_id", n))
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    flags = bloom_contamination_flags(big, bench, n=3, threshold=0.2)
    return flags.agg(
        F.sum("n_contaminated").alias("chk"), F.count(F.lit(1)).alias("n")
    )


def _cc_chains_at(n_nodes):
    """Connected components over n_nodes in diameter-31 chains — the
    worst case for label propagation. Pointer jumping should close it in
    ~log2(31) rounds; wall-clock here is iterative join+checkpoint
    overhead, the cost that dominates CC at any scale."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.graph import (
            connected_components,
        )

        base = spark.range(n_nodes, numPartitions=8)
        edges = base.filter((F.col("id") + 1) % 32 != 0).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        comp = connected_components(edges)
        return comp.agg(
            F.sum("component").alias("chk"), F.count(F.lit(1)).alias("n")
        )

    return run


def _dsir_50k(spark, sf_dir):
    """DSIR importance scoring at 50k pool docs: ONE hashed-bigram
    explode into a persisted (id, bucket, n) frame shared by the
    raw-distribution aggregate and the scoring join (broadcast ≤512-row
    log-ratio dim, per-doc partial-agg sums). Eager: runs inside a
    tracked-cache scope so the shared persist is released per run."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.cache import (
        track_cache,
        tracked_cache_scope,
    )
    from ningaloo_turtle_etl_spark.operators.selection import (
        doc_bucket_counts,
        dsir_bucket_log_ratios,
        dsir_scores,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = max(docs.count(), 1)
    copies = 50_000 // n
    big = _spread(_replicated(docs, max(copies, 1), "doc_id", n))
    target = docs.filter(F.col("doc_id") % 5 == 0)
    with tracked_cache_scope():
        db = track_cache(doc_bucket_counts(big, 2, 512).persist())
        ratios = dsir_bucket_log_ratios(
            target, big, 2, 512, raw_bucket_counts=db
        )
        row = (
            dsir_scores(big, ratios, 2, 512, doc_bucket_counts_df=db)
            .agg(
                F.round(F.sum("log_weight"), 3).alias("chk"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
    return spark.createDataFrame([(float(row["chk"]), row["n"])], "chk double, n long")


def _docs_scaled(spark, sf_dir, target):
    """documents replicated to ~target rows with shifted ids — the shared
    fixture for the scale-curve extras."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = max(docs.count(), 1)
    return _spread(_replicated(docs, max(target // n, 1), "doc_id", n))


def _minhash_pairs_at(target, collapse_exact=False):
    """Full MinHash+LSH filter-verify at ~target docs. Paired sizes (20k /
    100k) give SCALING.md a measured two-point curve instead of a single
    anchor — wall-clock should grow far sublinearly while bucket-capped
    candidate work grows with duplication density. ``collapse_exact``
    benches the duplicated-corpus scale path (identical texts collapse to
    one canonical doc before LSH, pairs reconstituted after) — on this
    replica-heavy fixture it produces the identical pair list and
    checksum, ~30% faster at 100k; the gap widens with duplication depth."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.dedup import (
            minhash_near_dup_pairs,
            release_dedup_caches,
        )

        pairs = minhash_near_dup_pairs(
            _docs_scaled(spark, sf_dir, target), collapse_exact=collapse_exact
        )
        row = pairs.agg(
            F.count(F.lit(1)).alias("n"), F.sum("id_a").alias("chk")
        ).collect()[0]
        release_dedup_caches()
        return spark.createDataFrame([(row["n"], row["chk"])], "n long, chk long")

    return run


def _simhash_sig_at(target):
    """Catalyst SimHash signature stage at ~target docs (scale twin of
    simhash_sig_50k)."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.dedup import with_simhash

        sig = with_simhash(_docs_scaled(spark, sf_dir, target))
        return sig.agg(F.sum(F.bit_count("sig")).alias("chk"))

    return run


def _decontam_at(target):
    """Broadcast-vocab decontamination at ~target docs (scale twin of
    decontam_50k)."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.curation import contamination_flags

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        big = _docs_scaled(spark, sf_dir, target)
        bench = docs.filter(F.col("doc_id") % 97 == 0)
        flags = contamination_flags(big, bench, n=3, threshold=0.2)
        return flags.agg(
            F.sum("n_contaminated").alias("chk"), F.count(F.lit(1)).alias("n")
        )

    return run


def _winsorize_6m(exact):
    """Winsorize l_extendedprice over lineitem replicated to ~6M rows —
    exact (column-buffering percentile) vs the approx_percentile sketch
    path; the ratio is the measured cost of exactness at the size where
    the auto heuristic is about to flip to the sketch."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.relational import winsorize

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_extendedprice"
        )
        big = _spread(_replicated(li, 10))
        w = winsorize(big, "l_extendedprice", 0.01, 0.99, name="vw", exact=exact)
        return w.agg(
            F.round(F.sum("vw"), 2).alias("chk"), F.count(F.lit(1)).alias("n")
        )

    return run


def _range_join_tally(spark, sf_dir):
    """The bucketed interval-containment join (hash equi-join on
    (key, bucket) + residual filter — never a nested loop) on the registered
    range_join_tally query; lands the r03 TIMESTAMP_NTZ fix with a
    measurement."""
    return registry.queries()["range_join_tally"](spark, sf_dir)


def _snapshot_diff_600k(spark, sf_dir):
    """snapshot_diff over the full sf0.1 lineitem (~600k rows, composite
    key): both sides reduce map-side to (key, md5 fingerprint) before the
    full-outer join, so the measured time is the fingerprint scan + one
    fixed-width shuffle — the shape that diffs a 100 TB snapshot."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.delta import snapshot_diff

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    old = li.filter(F.col("l_orderkey") % 89 != 0).withColumn(
        "l_quantity",
        F.when(
            F.col("l_orderkey") % 97 == 0, F.col("l_quantity") + 1
        ).otherwise(F.col("l_quantity")),
    )
    new = li.filter(F.col("l_orderkey") % 83 != 0)
    d = snapshot_diff(
        old,
        new,
        # (orderkey, partkey, suppkey, linenumber) is the unique grain of
        # this generator's lineitem ((orderkey, linenumber) alone is NOT).
        keys=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        compare_cols=["l_quantity", "l_extendedprice", "l_returnflag"],
    )
    return d.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


def _portable_sketch_600k(spark, sf_dir):
    """The full portable profile (exact + HLL + KMV + binned p50/p95) over
    sf0.1 lineitem (~600k rows, ~150k distinct orders — deep in the sketch
    regime). Times the calibration query's whole plan: two distinct-pass
    sketches, the gated KMV window, the grid histogram, and the exact
    columns they calibrate against."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.sketches import (
        portable_binned_quantiles,
        portable_sketch_report,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rep = portable_sketch_report(li, "l_orderkey", by=["l_returnflag"])
    q = portable_binned_quantiles(
        li, "l_extendedprice", (0.5, 0.95), by=["l_returnflag"]
    ).groupBy("l_returnflag").agg(F.sum("q_est").alias("q_sum"))
    return rep.join(q, on="l_returnflag")


def _substring_removal_at(mult):
    """Char-window exact-substring span removal over the sf documents
    table replicated ``mult``× (ids shifted so copies are distinct docs —
    every replica is a 100% duplicate, the worst case for the rank
    election). xxhash64 family = the scale path; the md5 twin is what the
    oracle row checks."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.dedup import (
            substring_span_removal,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        if mult > 1:
            n = docs.count()
            reps = spark.range(mult).select(F.col("id").alias("rep"))
            docs = docs.crossJoin(reps).select(
                (F.col("doc_id") + F.col("rep") * (n + 1)).alias("doc_id"),
                "text",
            )
        out = substring_span_removal(_spread(docs), k=40, hash_family="xxhash64")
        return out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_removed_chars").alias("removed"),
        )

    return run


def _bpe_encode_sf(spark, sf_dir):
    """Induce 8 merges and encode the corpus with them — times the full
    induce+apply tokenizer path (iterative driver loop + broadcast-join
    encode)."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.bpe import (
        encode_corpus,
        learn_bpe,
    )
    from ningaloo_turtle_etl_spark.operators.cache import (
        release_tracked_caches,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges, sym = learn_bpe(docs, num_merges=8)
    out = encode_corpus(docs, sym, merges).agg(
        F.sum("n_tokens").alias("total_tokens")
    )
    out.collect()  # consume while the symbol-table cache is alive
    release_tracked_caches()
    return out  # the harness's trailing collect recomputes cheaply


def _zipf_fit_sf(spark, sf_dir):
    from ningaloo_turtle_etl_spark.operators.text import zipf_fit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return zipf_fit(docs, group_col="source")


def _sessionize_600k(spark, sf_dir):
    """Gap-based sessionization + per-session rollup over 600k synthetic
    events across 5k users: the one user-keyed exchange shared by lag,
    running sum, and the rollup is the whole cost — the number to watch is
    that it stays a single-shuffle plan as rows grow."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.temporal import session_stats

    ev = spark.range(600_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5000).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("id") * 37) % 2000000
        ).alias("ts"),
    )
    return session_stats(ev, "user_id", "ts", 1800, "event_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


def _bootstrap_100k(spark, sf_dir):
    """Poisson-bootstrap mean CI at 100k events x 200 replicates = a 20M-row
    map-only explode feeding (group, b) partial sums — the scale probe for
    the deterministic resampling path (no RNG, no libm). xxhash64 weight
    family (the scale default; md5 is the oracle-parity twin, ~5x slower
    here because the string digest dominates the explode)."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.trend import (
        poisson_bootstrap_mean_ci,
    )

    ev = _spread(
        spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "event_type", "value"
        )
    )
    return poisson_bootstrap_mean_ci(
        ev, "value", "event_type", "event_id", replicates=200,
        hash_family="xxhash64",
    )


def _boilerplate_100k(spark, sf_dir):
    """Line-mode boilerplate removal over 100k synthetic 3-line docs in 20
    sources (per-source banner+footer repeat 5k times, body unique): the
    explode is map-only, the (source, segment) count combines map-side, and
    the join-back broadcasts — the number to watch is that the hot removed
    segments (the very rows being stripped) don't skew the reassembly
    shuffle."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.curation import (
        boilerplate_segment_removal,
    )

    docs = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 20).cast("string")).alias(
            "source"
        ),
        F.concat_ws(
            "\n",
            F.concat(F.lit("BANNER-"), (F.col("id") % 20).cast("string")),
            F.concat(F.lit("body text chunk "), F.col("id").cast("string")),
            F.concat(F.lit("FOOTER-"), (F.col("id") % 20).cast("string")),
        ).alias("text"),
    )
    out = boilerplate_segment_removal(
        docs, "text", "doc_id", "source", min_docs=3
    )
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_removed").alias("n_removed"),
    )


def _hotspots_1m(spark, sf_dir):
    """Grid-density hotspot clustering over 1M synthetic points in ~200
    gaussian-ish blobs: the fact pass is one cell aggregate; everything
    after (adjacency explode, component rounds) runs on dense CELLS — the
    number to watch is that wall-clock tracks the cell count, not the
    point count."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.geo import spatial_hotspots

    pts = spark.range(1_000_000).select(
        (
            ((F.col("id") % 200) % 20) * 15.0
            - 150.0
            + (F.xxhash64("id") % 1000) / 500.0
        ).alias("lon"),
        (
            ((F.col("id") % 200) / 20).cast("int") * 15.0
            - 70.0
            + (F.xxhash64("id", F.lit(1)) % 1000) / 500.0
        ).alias("lat"),
    )
    out = spatial_hotspots(pts, "lat", "lon", cell_deg=1.0, min_pts=100)
    return out.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("n_points").alias("n_points"),
    )


def _audience_overlap_600k(spark, sf_dir):
    """Exact pairwise audience overlap across the 5 event types at sf0.1
    (600k events, ~thousands of distinct users): the member-keyed pair
    join fans out per-user-degree², combining straight down to the 10-row
    grid."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.relational import (
        audience_overlap,
    )

    ev = _spread(
        spark.read.parquet(f"{sf_dir}/events.parquet").filter(
            F.col("user_id").isNotNull()
        )
    )
    return audience_overlap(ev, "event_type", "user_id")


def _classifier_eval_sf(spark, sf_dir):
    """Full classifier-eval pass at the sf's documents: frozen-model
    serving sigmoid + the distinct-score PR/F1 fold (same grain as the
    AUC fold). The point being measured: a complete threshold sweep
    costs one aggregate pass over the scored frame — the fold itself is
    bin-sized, so this should track the scoring scan, not a sort."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.classify import (
        classifier_pr_curve,
        hashed_text_scores,
        load_model_fixture,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = load_model_fixture("text_model")
    scored = hashed_text_scores(docs, model, out_col="p_english").select(
        F.round("p_english", 3).alias("p"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    return classifier_pr_curve(scored, "p", "y")


def _fuzzy_clusters_at(n_names, n_blocks=997):
    """Fuzzy record linkage at n_names DISTINCT names (the grain the
    quadratic stage actually runs on — real corpora hang millions of
    rows off far fewer names): n_blocks first-token blocks of
    ~n_names/n_blocks names each, blocked Levenshtein pairing, then
    connected components on the match edges and the cluster rollup. The
    number to watch is that wall-clock tracks sum(block²), never
    names² — and that the CC rounds stay edge-sized."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.linkage import (
            fuzzy_name_clusters,
        )

        names = spark.range(n_names, numPartitions=8).select(
            F.concat(
                F.lit("blk"),
                (F.col("id") % n_blocks).cast("string"),
                F.lit(" entity"),
                (F.col("id") % 37).cast("string"),
                F.lit("v"),
                F.floor(F.col("id") / n_blocks).cast("string"),
            ).alias("supplier")
        )
        out = fuzzy_name_clusters(
            names,
            "supplier",
            lambda name: F.split(name, " ").getItem(0),
            threshold=0.8,
        )
        return out.agg(
            F.count(F.lit(1)).alias("n_names"),
            F.sum("cluster_records").alias("chk"),
        )

    return run


def _image_ahash_100k(spark, sf_dir):
    """aHash + banded-hamming LSH over 100k DISTINCT fake-codec images:
    content is sha2(text || doc_id), so every image's first-64-byte pixel
    window is unique — the realistic mostly-unique corpus (a text-suffix
    salt is NOT enough: the fake codec reads the byte prefix, so replicas
    would share identical hashes and the band join would go quadratic in
    the replica count). Times the Arrow mapInPandas hash stage plus the
    4x16-bit band join and popcount verify at true-negative-dominated
    collision rates. The number to watch is that the join moves only
    (id, n_cells, band, value) rows, never pixels."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.multimodal import (
        ahash_near_dup_pairs,
        image_ahash,
    )

    media = _docs_scaled(spark, sf_dir, 100_000).select(
        F.col("doc_id").alias("media_id"),
        F.encode(
            F.sha2(
                F.concat("text", F.lit("#"), F.col("doc_id").cast("string")),
                256,
            ),
            "utf-8",
        ).alias("content"),
    )
    hashes = image_ahash(media, decoder="fake")
    pairs = ahash_near_dup_pairs(hashes, max_hamming=8)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("hamming").alias("chk")
    )


def _msprt_daily_600k(spark, sf_dir):
    """Always-valid mSPRT monitor over the full sf0.1 events table (~600k
    rows, 5 types x ~150 days): one (type, day) map-side-combining
    aggregate then cumulative windows over the ~750-row grid — the raw
    grain is touched exactly once, so this should track the scan, not the
    sequential math."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.temporal import _epoch_seconds
    from ningaloo_turtle_etl_spark.operators.trend import msprt_always_valid

    raw = _spread(spark.read.parquet(f"{sf_dir}/events.parquet"))
    ev = raw.select(
        "event_type",
        F.floor(_epoch_seconds(raw, "ts") / F.lit(86400))
        .cast("long")
        .alias("day"),
        "value",
    )
    out = msprt_always_valid(
        ev, ["event_type"], "day", "value",
        mu0=45.0, sigma=50.0, tau=10.0, alpha=0.05,
    )
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rejected").cast("long")).alias("n_rejected"),
        F.round(F.sum("log_lambda"), 3).alias("chk"),
    )


def _winnowing_at(n_docs):
    """MOSS winnowing at n_docs synthetic ~40-token docs (40·n_docs
    k-grams): the top 1% of ids reuse the token seeds of docs 0-999,
    planting ~1000 exact-dup pairs in an otherwise-unique corpus —
    realistic fingerprint collision rates, unlike replicated fixtures
    whose shared fingerprints send the index join quadratic. Times the
    in-row array selection (hash + window min) plus the inverted-index
    containment join."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.dedup import (
            winnowing_containment_pairs,
        )

        uniq = n_docs - n_docs // 100  # last 1% echo seeds 0..n/100-1
        base = spark.range(n_docs, numPartitions=16).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % uniq).alias("_seed"),
        )
        words = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.col("_seed") * 41 + j), F.lit(500_000)
                    ).cast("string"),
                ),
            ),
        )
        docs = base.select("doc_id", words.alias("text"))
        pairs = winnowing_containment_pairs(
            docs, k=3, window=4, threshold=0.8, max_fp_docs=50
        )
        return pairs.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("containment"), 3).alias("chk"),
        )

    return run


def _wasserstein_600k(spark, sf_dir):
    """Exact pairwise W1 over the full sf events table: the pooled-ECDF
    machinery at ~continuous value grain — the number to watch is that
    work tracks pairs x distinct values, not rows."""
    return registry.queries()["wasserstein_value_by_type"](spark, sf_dir)


def _bleu_rouge_sf(spark, sf_dir):
    """Corpus BLEU/ROUGE over the full sf documents table (4 n-gram
    levels, both sides): times the (pair, n, gram) explode + clip join."""
    return registry.queries()["bleu_rouge_by_source"](spark, sf_dir)


def _digest_600k(spark, sf_dir):
    """Dataset content digest over the full sf lineitem: one fused
    hash+aggregate scan; should track raw scan throughput."""
    return registry.queries()["table_digest_by_flag"](spark, sf_dir)


def _bt_battles_sf(spark, sf_dir):
    """Pairwise battles + Bradley-Terry over the full sf lineitem x part:
    the (context, item) aggregate and k^2-per-order pairing dominate; the
    MM fit itself is grid-sized (eager driver loop)."""
    return registry.queries()["bt_brand_preference"](spark, sf_dir)


def _ppjoin_at(n_docs, vocab=400_000):
    """PPJoin exact set-similarity self-join at n_docs synthetic
    ~14-token docs (14·n_docs token instances over a ``vocab``-token
    vocabulary — sparse, the realistic regime), the top 2% of ids
    echoing the token seeds of the first ids so true near-dup pairs
    exist. Times rarity ranking (one window), the prefix-token candidate
    join WITH the positional filter, and the exact array-intersect
    verify. The number to watch is that candidate fanout tracks
    prefix-bucket sizes, never docs²."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.dedup import ppjoin_pairs

        uniq = n_docs - n_docs // 50  # last 2% echo early seeds
        base = spark.range(n_docs, numPartitions=16).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % uniq).alias("_seed"),
        )
        words = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(14)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.col("_seed") * 31 + j), F.lit(vocab)
                    ).cast("string"),
                ),
            ),
        )
        docs = base.select("doc_id", words.alias("text"))
        pairs = ppjoin_pairs(docs, threshold=0.8)
        return pairs.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("jaccard"), 3).alias("chk"),
        )

    return run


def _community_edges(spark, n_nodes):
    """~4·n_nodes directed edges: n_nodes in communities of 25, each node
    linking to +1, +2, +3, +5 within its community — the shared graph
    fixture for the LPA and HITS probes at any scale."""
    import pyspark.sql.functions as F

    edges = None
    for step in (1, 2, 3, 5):
        e = spark.range(n_nodes, numPartitions=8).select(
            F.col("id").alias("src"), (F.col("id") + step).alias("dst")
        ).filter(
            (F.col("dst") < n_nodes)
            & (F.floor(F.col("src") / 25) == F.floor(F.col("dst") / 25))
        )
        edges = e if edges is None else edges.unionByName(e)
    return edges


def _lpa_at(n_nodes):
    """Synchronous label propagation over ~4·n_nodes edges (planted
    communities of 25): 8 fixed rounds of the neighbor-label argmax. The
    number to watch is per-round cost staying linear in |E| — the
    (node, label) frames are localCheckpointed each round so lineage
    can't compound."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.graph import (
            label_propagation_communities,
        )

        comm = label_propagation_communities(
            _community_edges(spark, n_nodes), rounds=8
        )
        return comm.agg(
            F.countDistinct("community").alias("n_communities"),
            F.sum("community").alias("chk"),
        )

    return run


def _markov_600k(spark, sf_dir):
    """Markov removal-effect attribution over the full sf events table
    (~600k rows at sf0.1): journey windows + the map-side-combined
    transition grid + two bounded collects over ONE persisted touches
    frame (the r9 persist fix) — the raw scan should dominate."""
    return registry.queries()["markov_attribution_channels"](spark, sf_dir)


def _kneser_ney_sf(spark, sf_dir):
    """Kneser-Ney bigram fit+score over the full sf documents table:
    every KN statistic is a bigram-type-grain aggregate; should track
    the tokenize/explode scan."""
    return registry.queries()["kneser_ney_lm_scores"](spark, sf_dir)


def _zorder_600k(spark, sf_dir):
    """Z-order key + bucket-span rollup over the full sf lineitem: pure
    integer bit-interleave expressions, zero shuffle until the bucket
    agg — should track raw scan throughput."""
    return registry.queries()["zorder_layout_buckets"](spark, sf_dir)


def _hilbert_600k(spark, sf_dir):
    """Hilbert key + bucket-span rollup over the full sf lineitem —
    Z-order's direct twin probe (zorder_600k): six materialized
    unrolled levels instead of one interleave expression; the number to
    watch is that the explode-barrier stages stay map-only and inside
    codegen (the naive expression chain fell out of codegen at 24 s)."""
    return registry.queries()["hilbert_layout_buckets"](spark, sf_dir)


def _pareto_600k(spark, sf_dir):
    """Skyline over the full sf lineitem on (minimize extendedprice,
    maximize quantity): one map-combinable groupBy to the distinct-price
    grain, then the documented single-partition prefix-max window on
    that grain — this probe MEASURES the grain trade-off (price is the
    high-cardinality worst case for the window input)."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.relational import (
        pareto_frontier_2d,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = pareto_frontier_2d(li, "l_extendedprice", "l_quantity")
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 3).alias("chk"),
    )


def _shapley_sf(spark, sf_dir):
    """Exact Shapley attribution over the full sf event log: two
    row-count-sized aggregates (bitmask bit_or + conversion distinct),
    then the 16-row coalition grain — should track the scan."""
    return registry.queries()["shapley_attribution_channels"](spark, sf_dir)


def _holt_users_sf(spark, sf_dir):
    """Holt linear fold at the USER grain (thousands of groups instead
    of the registry query's 5): per-user daily counts, one sorted-array
    fold each — the many-small-groups shape where collect_list pressure
    would show."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.trend import (
        holt_linear_forecast,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = (
        ev.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / F.lit(86400))
            .cast("long")
            .alias("day"),
        )
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    out = holt_linear_forecast(daily, ["user_id"], "day", "y")
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("forecast"), 3).alias("chk"),
    )


def _pca_at(target):
    """Matrix-free PCA power iteration at ~target 64-dim vectors
    (replicated sf embeddings): 3 rounds x (coordinate-grain dot +
    accumulate). Watch that work tracks n x d and the d-row vector side
    always broadcasts."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.similarity import (
            pca_power_component,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n = emb.count()
        copies = max(target // max(n, 1), 1)
        big = _replicated(emb, copies, "vec_id", n)
        return pca_power_component(_spread(big), iterations=3)

    return run


def _mf_gd_sf(spark, sf_dir):
    """Rank-1 MF gradient training over the FULL sf rating matrix (no
    entity filter): 3 rounds of ratings x broadcast-factor joins + two
    mean-gradient aggregates. Watch that ratings never re-shuffle and
    both factor sides stay broadcast."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.similarity import mf_gd_factors

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ratings = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_custkey", "l_partkey")
        .agg(
            (
                F.sum("l_quantity").cast("double")
                / F.lit(10).cast("double")
            ).alias("rating")
        )
    )
    out = mf_gd_factors(
        ratings,
        iterations=3,
        user_col="o_custkey",
        item_col="l_partkey",
        rating_col="rating",
    )
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("factor"), 3).alias("chk"),
    )


def _bfs_at(n_nodes, max_hops=4):
    """Multi-source BFS over a deterministic 2-out expander (dst =
    (id*48271+1) %% n and (id*16807+3) %% n) from n/60 spread seeds: the
    frontier grows into the hundreds of thousands within the hop budget,
    so the probe times real frontier-join + visited-anti-join rounds at
    graph scale, not a toy chain."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.graph import bfs_hops

        ids = spark.range(n_nodes, numPartitions=8)
        e1 = ids.select(
            F.col("id").alias("src"),
            ((F.col("id") * 48271 + 1) % n_nodes).alias("dst"),
        )
        e2 = ids.select(
            F.col("id").alias("src"),
            ((F.col("id") * 16807 + 3) % n_nodes).alias("dst"),
        )
        seeds = spark.range(0, n_nodes, 60).select(
            F.col("id").alias("node")
        )
        out = bfs_hops(e1.unionByName(e2), seeds, max_hops=max_hops)
        return out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("hops").alias("chk"),
        )

    return run


def _kmeans_at(target):
    """Distributed Lloyd k-means at ~target 64-dim vectors (sf
    embeddings replicated with id offsets), k=8 x 3 iterations: times 4
    full assignment scans (k inlined distance expressions) + 3 combined
    updates. The number to watch is that each pass stays map-side —
    no join, no vector shuffle."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.similarity import (
            kmeans_lloyd,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n = emb.count()
        copies = max(target // max(n, 1), 1)
        big = _replicated(emb, copies, "vec_id", n)
        return kmeans_lloyd(_spread(big), k=8, iterations=3)

    return run


def _hits_at(n_nodes, iterations=5):
    """HITS over the community-graph fixture (~4·n_nodes edges):
    ``iterations`` full auth/hub rounds of join+reduce with ONE fused
    normalization per round — the per-round cost should track |E| like
    pagerank's."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.graph import hits_scores

        out = hits_scores(
            _community_edges(spark, n_nodes), iterations=iterations
        )
        return out.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("auth"), 3).alias("chk"),
        )

    return run


def _adamic_adar_sf(spark, sf_dir):
    """Adamic-Adar over the full sf support-2 co-purchase graph: wedge
    fanout Σ deg² under the degree cap, micro-int weights, anti-join of
    existing edges. Watch that work tracks wedges, not pairs²."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.graph import (
        adamic_adar_links,
        copurchase_edges,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = copurchase_edges(li, min_shared=2)
    out = adamic_adar_links(edges, max_degree=1000)
    return out.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum("aa_score"), 3).alias("chk"),
    )


def _rake_sf(spark, sf_dir):
    """RAKE over the full sf documents table — regex phrase split +
    word-grain stats + phrase re-aggregation; should track the scan."""
    return registry.queries()["rake_top_phrases"](spark, sf_dir)


def _jsd_sf(spark, sf_dir):
    """Source-vs-rest JSD over the full sf documents table — one token
    explode + (group, token)-grain arithmetic."""
    return registry.queries()["token_jsd_by_source"](spark, sf_dir)


def _symspell_at(n_names):
    """SymSpell delete-1 blocking at n synthetic 9-digit account names:
    key explode (~19 keys/name) + key-equi self-join + levenshtein
    verify. Watch that candidates track shared-key pairs (bounded per
    key by the padding structure), never names²."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.linkage import (
            symspell_del1_pairs,
        )

        names = _spread(
            spark.range(0, n_names).select(
                F.concat(
                    F.lit("Account#"), F.lpad(F.col("id"), 9, "0")
                ).alias("name")
            )
        )
        out = symspell_del1_pairs(names, "name")
        return out.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("dist").alias("chk"),
        )

    return run


def _hamming_at(target):
    """Sign-bit Hamming top-10 for 8 queries over ~target 64-dim
    vectors (sf embeddings replicated with id offsets): the probe times
    code packing (map-only aggregate over the vector) + XOR/popcount
    scoring + the per-query window. Corpus must never shuffle — the
    query side is an 8-row broadcast."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.quantize import (
            hamming_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n = emb.count()
        copies = max(target // max(n, 1), 1)
        big = _replicated(emb, copies, "vec_id", n)
        out = hamming_topk(
            _spread(big), emb.filter(F.col("vec_id") < 8), dim=64, k=10
        )
        return out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("hamming").alias("chk"),
        )

    return run


def _ann_train_serve_at(target):
    """The closed train→encode→serve ANN loop at ~target vectors (sf
    embeddings replicated with id offsets): distributed Lloyd trains
    coarse IVF centroids + PQ codebooks (one scan + one map-side-
    combined aggregate per round), then the trained parameters drive
    the cell-probe/ADC/exact tiers. Watch that training stays
    scan+aggregate (no vector shuffle) and serving's exact stage only
    materializes shortlist·|Q| vectors."""

    def run(spark, sf_dir):
        import pyspark.sql.functions as F

        from ningaloo_turtle_etl_spark.operators.quantize import (
            trained_ivf_pq_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n = emb.count()
        copies = max(target // max(n, 1), 1)
        big = _replicated(emb, copies, "vec_id", n)
        out = trained_ivf_pq_topk(
            _spread(big),
            emb.filter(F.col("vec_id") < 8),
            k_cells=8,
            coarse_iterations=2,
            m_subvectors=8,
            k_codes=8,
            pq_iterations=2,
            k=10,
            nprobe=2,
            shortlist=50,
        )
        return out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("distance").alias("chk"),
        )

    return run


def _textrank_sf(spark, sf_dir):
    """TextRank over the full sf documents table: map-only pair
    extraction + 3 weighted-PageRank rounds on the vocabulary grain.
    Rounds cost vocabulary-sized joins — watch that the corpus is
    touched exactly once."""
    return registry.queries()["textrank_keywords"](spark, sf_dir)


def _unigram_sf(spark, sf_dir):
    """Unigram-LM tokenizer fit + Viterbi segmentation over the full sf
    documents table: one substring-explode count shuffle (the fit) and
    one map-only in-document DP pass. Watch that the DP stays a fold —
    no joins, no per-position shuffle."""
    return registry.queries()["unigram_tokenizer_stats"](spark, sf_dir)


def _gmm_sf(spark, sf_dir):
    """Two-component EM over the full sf events table: 3 rounds, each
    one exact-integer aggregate; watch that no round touches row grain
    twice."""
    return registry.queries()["gmm_em_value_components"](spark, sf_dir)


def _cox_sf(spark, sf_dir):
    """Cox Newton fit over the user survival frame: per step one scan
    to the distinct-day grain + tiny window sums; watch the subject
    aggregate staying map-side-combined."""
    return registry.queries()["cox_ph_click_hazard"](spark, sf_dir)


def _kcenter_sf(spark, sf_dir):
    """Greedy k-center over the sf embeddings: 8 literal-center map
    passes + TakeOrdered argmaxes on the persisted state frame."""
    return registry.queries()["kcenter_coreset_select"](spark, sf_dir)


def _als_sf(spark, sf_dir):
    """Rank-1 ALS: 3 alternations of join + exact-integer aggregate on
    the bounded rating matrix; factor tables broadcast."""
    return registry.queries()["als_rank1_factors"](spark, sf_dir)


def _gbm_sf(spark, sf_dir):
    """Boosted stumps: per round one unpivot scan to the value grid +
    grid windows + TakeOrdered; watch the grid staying distinct-value
    grain."""
    return registry.queries()["gbm_stumps_lang_model"](spark, sf_dir)


def _fs_em_sf(spark, sf_dir):
    """Fellegi-Sunter EM over blocked part pairs: the pair build joins
    once, then 3 literal-parameter aggregates over the persisted
    candidate frame."""
    return registry.queries()["fellegi_sunter_part_weights"](spark, sf_dir)


def _seqpat_sf(spark, sf_dir):
    """Length-3 sequential patterns: one (user,type) array aggregate,
    broadcast type-cube joins, pattern-keyed reduce."""
    return registry.queries()["sequential_patterns_users"](spark, sf_dir)


def _audio_sf(spark, sf_dir):
    """WAV tier end-to-end: synth -> RIFF decode -> integer features via
    two Arrow mapInPandas stages; per-blob cost, map-only."""
    return registry.queries()["audio_wav_features"](spark, sf_dir)


def _matryoshka_sf(spark, sf_dir):
    """Fused two-stage truncation ANN: prefix-16 shortlist then exact
    rerank of 50 candidates; full vectors move only for the shortlist."""
    return registry.queries()["ann_matryoshka_topk"](spark, sf_dir)


def _wordpiece_sf(spark, sf_dir):
    """WordPiece greedy scan over the full sf documents table: same
    vocab fit as unigram_sf, then the map-only greedy fold — watch that
    greedy stays one in-document pass (no joins, no per-position
    shuffle) like the Viterbi twin."""
    return registry.queries()["wordpiece_tokenizer_stats"](spark, sf_dir)


def _ppr_sf(spark, sf_dir):
    """Personalized PageRank from the seed brand over the co-purchase
    graph: 5 restart rounds, each one rank⋈edges join + dst aggregate.
    SCALING.md quoted the 18.7 → 6.2 s node-list fix for this family
    with no committed artifact — this probe IS that artifact."""
    return registry.queries()["ppr_copurchase_brand"](spark, sf_dir)


def _holt_winters_sf(spark, sf_dir):
    """Holt–Winters triple smoothing over the daily event series: the
    fold runs on the DAY grain after one aggregate shuffle, so the probe
    watches the aggregate, not the fold."""
    return registry.queries()["holt_winters_daily"](spark, sf_dir)


def _cv_auc_sf(spark, sf_dir):
    """K-fold cross-validated AUC: per-fold rank-sum AUC via one window
    over the scored fact table; the risk is the per-fold window reading
    the facts K times instead of once."""
    return registry.queries()["cv_fold_auc"](spark, sf_dir)


def _ndcg_sf(spark, sf_dir):
    """NDCG/MRR ranking eval on the query grain: ranked-list windows
    then one query-grain aggregate."""
    return registry.queries()["ranking_ndcg_eval"](spark, sf_dir)


def _rfm_sf(spark, sf_dir):
    """RFM over the full sf order file: one customer-grain aggregate +
    three global NTILE sorts of the customer dimension + the segment
    rollup. The sorts are the documented dimension-grain trade — watch
    them track customers, not orders."""
    return registry.queries()["rfm_customer_segments"](spark, sf_dir)


def _kruskal_sf(spark, sf_dir):
    """Kruskal-Wallis at the sf grain: the distinct-value-grain
    cumulative window is the risk (value cardinality ~ row count at
    this data) — watch it stay one window over the distinct grain,
    never a row-grain rank."""
    return registry.queries()["kruskal_wallis_value_by_type"](spark, sf_dir)


def _logrank_sf(spark, sf_dir):
    """Log-rank at the sf grain: user-grain survival build (three
    type-filtered aggregates + two left joins), then the per-group
    cumulative at-risk windows on the day grain."""
    return registry.queries()["logrank_signup_conversion"](spark, sf_dir)


def _modularity_sf(spark, sf_dir):
    """Newman modularity at the sf grain: dominated by the per-order
    co-purchase edge self-join (shared with the pagerank probes) +
    two broadcast community lookups and a community-grain reduce."""
    return registry.queries()["modularity_copurchase_brands"](spark, sf_dir)


def _zonemap_sf(spark, sf_dir):
    """Zone-map audit at the sf grain: two GLOBAL ntile sorts of
    lineitem (the layout simulation — the documented single-partition
    window) + file-grain aggregates."""
    return registry.queries()["zonemap_prune_shipdate"](spark, sf_dir)


def _hmm_sf(spark, sf_dir):
    """HMM forward at the sf grain: one bounded rank window per user +
    the unrolled 4-step column arithmetic; map-only after the pivot."""
    return registry.queries()["hmm_forward_first4"](spark, sf_dir)


# r13 (VERDICT r12 item 2): probes for the nine probe-less r12 families.
# The ANN train→serve pair rides the existing ann_train_serve_100k row;
# the eight below get their own rows — ktruss is the only iterative-join
# family (the one the verdict flagged as slowest-with-no-number), the
# rest are single-scan shapes probed so the convention (every family
# lands with telemetry) holds.


def _ktruss_sf(spark, sf_dir):
    """4-truss peel at the sf grain: per round two edge self-joins +
    wedge closure + a 3-way union aggregate, eager-checkpointed; the
    r13 fixpoint fix reuses the converged round's support frame, so the
    probe should show one FEWER triangle enumeration than r12's
    driver_sim anecdote (the most expensive pass in the loop)."""
    return registry.queries()["ktruss_copurchase_hist"](spark, sf_dir)


def _conformal_sf(spark, sf_dir):
    """Split-conformal calibration + coverage at the sf grain: one
    event scan to the split grains, exact order-statistic q-hat via a
    bounded sort, then the test-side coverage aggregate."""
    return registry.queries()["conformal_interval_coverage"](spark, sf_dir)


def _obf_sf(spark, sf_dir):
    """O'Brien–Fleming group-sequential looks: one event-grain
    map-side-combined aggregate to (day, arm), then day-grain windows;
    builder runs the look-count job (eager)."""
    return registry.queries()["group_sequential_obf_daily"](spark, sf_dir)


def _ql_sf(spark, sf_dir):
    """Dirichlet query-likelihood retrieval: index prune to |q| posting
    slices, candidates × |q| grid, TakeOrdered top-k — the corpus is
    never rescanned; watch the grid stay candidate-grain."""
    return registry.queries()["query_likelihood_top10"](spark, sf_dir)


def _mrr_map_sf(spark, sf_dir):
    """MRR/MAP@10 over the brute-force ranking baseline: one ranked
    window per query then a query-grain aggregate."""
    return registry.queries()["retrieval_mrr_map"](spark, sf_dir)


def _viterbi_sf(spark, sf_dir):
    """Viterbi decode under the fixed 2-state HMM: bounded rank window
    per user + enumerated path products; map-only after the pivot
    (hmm_sf's twin on the argmax side)."""
    return registry.queries()["hmm_viterbi_first4"](spark, sf_dir)


def _eb_sf(spark, sf_dir):
    """Empirical-Bayes beta-binomial shrinkage: one user-grain
    aggregate to group rates (eager-checkpointed bucket grain in the
    builder), moment-fit prior as an agg-of-agg, broadcast back."""
    return registry.queries()["eb_shrunk_purchase_rate"](spark, sf_dir)


def _perm_sf(spark, sf_dir):
    """Seeded randomization test: all 48 md5-bit relabelings fold into
    ONE map-side-combined aggregate of 2·48+2 exact-integer cells —
    one corpus scan regardless of n_perm; watch it stay one scan."""
    return registry.queries()["permutation_test_purchase_view"](spark, sf_dir)


EXTRAS = {
    "range_join_tally": _range_join_tally,
    "snapshot_diff_600k": _snapshot_diff_600k,
    "portable_sketch_600k": _portable_sketch_600k,
    "minhash_near_dups_md5": _minhash_family("md5"),
    "simhash_sig_50k": _simhash_signatures("catalyst"),
    "simhash_sig_50k_fnv_udf": _simhash_signatures("fnv_udf"),
    "decontam_50k": _decontam_50k,
    "dsir_50k": _dsir_50k,
    "bloom_decontam_50k": _bloom_decontam_50k,
    "connected_components_100k": _cc_chains_at(100_000),
    "spatial_tag_regions_10x": _spatial_10x("udf"),
    "spatial_tag_regions_expr_10x": _spatial_10x("expr"),
    "winsorize_6m_exact": _winsorize_6m(True),
    "winsorize_6m_sketch": _winsorize_6m(False),
    # Scale-curve pairs: same operator at two sizes so SCALING.md claims
    # carry measured slopes, not single anchors.
    "minhash_pairs_20k": _minhash_pairs_at(20_000),
    "minhash_pairs_100k": _minhash_pairs_at(100_000),
    "minhash_pairs_100k_collapsed": _minhash_pairs_at(100_000, collapse_exact=True),
    "simhash_sig_250k": _simhash_sig_at(250_000),
    "decontam_250k": _decontam_at(250_000),
    "substring_removal_sf": _substring_removal_at(1),
    "substring_removal_10x": _substring_removal_at(10),
    "bpe_induce_encode_sf": _bpe_encode_sf,
    "zipf_fit_sf": _zipf_fit_sf,
    "sessionize_600k": _sessionize_600k,
    "bootstrap_100k": _bootstrap_100k,
    "boilerplate_100k": _boilerplate_100k,
    "hotspots_1m": _hotspots_1m,
    "audience_overlap_600k": _audience_overlap_600k,
    "classifier_eval_sf": _classifier_eval_sf,
    # r7-family probes (VERDICT r7 item 4): linkage, image LSH, mSPRT.
    "fuzzy_clusters_20k": _fuzzy_clusters_at(20_000),
    "image_ahash_100k": _image_ahash_100k,
    "msprt_daily_600k": _msprt_daily_600k,
    # r8-family probes: winnowing, W1 drift, BLEU, digest, Bradley-Terry.
    "winnowing_100k": _winnowing_at(100_000),
    "wasserstein_600k": _wasserstein_600k,
    "bleu_rouge_sf": _bleu_rouge_sf,
    "digest_600k": _digest_600k,
    "bt_battles_sf": _bt_battles_sf,
    # Second-batch r8-family probes (VERDICT r8 item 1): PPJoin, LPA,
    # Markov attribution, Kneser-Ney, Z-order.
    "ppjoin_50k": _ppjoin_at(50_000),
    "lpa_100k_edges": _lpa_at(25_000),
    "markov_600k": _markov_600k,
    "kneser_ney_sf": _kneser_ney_sf,
    "zorder_600k": _zorder_600k,
    # r9-family probes: every family lands with telemetry from round one.
    "kmeans_20k": _kmeans_at(20_000),
    "hits_100k_edges": _hits_at(25_000),
    "adamic_adar_sf": _adamic_adar_sf,
    "rake_sf": _rake_sf,
    "jsd_sf": _jsd_sf,
    # r10-family probes: Hilbert layout (Z-order twin), skyline at the
    # high-cardinality-grain worst case, Shapley, user-grain Holt folds,
    # PCA power iteration, full-matrix MF training, expander BFS.
    # (entropy-l and NDCG ride existing aggregate/ranked-list grains —
    # no distinct scale risk to probe.)
    "hilbert_600k": _hilbert_600k,
    "pareto_600k": _pareto_600k,
    "shapley_sf": _shapley_sf,
    "holt_users_sf": _holt_users_sf,
    "pca_100k": _pca_at(100_000),
    "mf_gd_sf": _mf_gd_sf,
    "bfs_600k_nodes": _bfs_at(600_000),
    # r10 second-batch probes: SymSpell blocking, binary-Hamming ANN,
    # TextRank, RFM. (CMH/cv-AUC/Platt ride existing aggregate and
    # classifier-eval grains — no distinct scale risk to probe.)
    "symspell_100k": _symspell_at(100_000),
    "hamming_100k": _hamming_at(100_000),
    "ann_train_serve_100k": _ann_train_serve_at(100_000),
    "textrank_sf": _textrank_sf,
    "rfm_sf": _rfm_sf,
    "unigram_sf": _unigram_sf,
    # r11 (VERDICT r10 item 5): the r10 families that shipped without a
    # committed probe — PPR (SCALING quoted a fix with no artifact),
    # Holt-Winters, and the classifier/ranking eval grains.
    "wordpiece_sf": _wordpiece_sf,
    "ppr_sf": _ppr_sf,
    # r11-family probes: telemetry from round one (the r10 lesson)
    "gmm_sf": _gmm_sf,
    "cox_sf": _cox_sf,
    "kcenter_sf": _kcenter_sf,
    "als_sf": _als_sf,
    "gbm_sf": _gbm_sf,
    "fs_em_sf": _fs_em_sf,
    "seqpat_sf": _seqpat_sf,
    "audio_sf": _audio_sf,
    "matryoshka_sf": _matryoshka_sf,
    "holt_winters_sf": _holt_winters_sf,
    "cv_auc_sf": _cv_auc_sf,
    "ndcg_sf": _ndcg_sf,
    # r11 second-batch probes: the families with a distinct scale grain
    # to watch (Cochran-Armitage / ANOVA / Hill / DiD ride single
    # map-side-combined aggregates or bounded top-k windows — no
    # distinct scale risk to probe).
    "kruskal_sf": _kruskal_sf,
    "logrank_sf": _logrank_sf,
    "modularity_sf": _modularity_sf,
    "zonemap_sf": _zonemap_sf,
    "hmm_sf": _hmm_sf,
    # r13 (VERDICT r12 item 2): rows for the probe-less r12 families —
    # ktruss first (iterative-join; the only one with no committed
    # number), the rest single-scan shapes.
    "ktruss_sf": _ktruss_sf,
    "conformal_sf": _conformal_sf,
    "obf_sf": _obf_sf,
    "ql_sf": _ql_sf,
    "mrr_map_sf": _mrr_map_sf,
    "viterbi_sf": _viterbi_sf,
    "eb_sf": _eb_sf,
    "perm_sf": _perm_sf,
}

# 10x-scaled probes for the iterative/quadratic-risk families (VERDICT r9
# item 2): the failure class that only appears at scale — superlinear
# candidate growth, per-round overhead amplification, lineage compounding.
# Run via --scale-extras; the signal is the 10x SLOPE vs the same-named
# EXTRAS anchor, measured min-of-N like everything else (r10 ran these
# single-shot and every spread was an unverifiable 0.0 — VERDICT item 4).
# Fixture scaling matches how real corpora grow: ppjoin's vocabulary and
# fuzzy linkage's block count scale WITH the rows (constant density /
# block size), not frozen at the small-probe values.
SCALE_EXTRAS = {
    "hits_1m_edges": _hits_at(250_000),
    "lpa_1m_edges": _lpa_at(250_000),
    "ppjoin_500k": _ppjoin_at(500_000, vocab=4_000_000),
    "winnowing_1m": _winnowing_at(1_000_000),
    "kmeans_200k": _kmeans_at(200_000),
    "fuzzy_clusters_200k": _fuzzy_clusters_at(200_000, n_blocks=9973),
    "connected_components_1m": _cc_chains_at(1_000_000),
    "symspell_1m": _symspell_at(1_000_000),
}

# Probes whose operator executes eagerly inside the builder (iterative
# algorithms driving their own jobs): time fn()+collect, not collect alone —
# a collect-only clock would miss all the work.
EAGER_EXTRAS = {
    "fuzzy_clusters_20k",
    "bt_battles_sf",
    "bpe_induce_encode_sf",
    "connected_components_100k",
    "bloom_decontam_50k",
    "dsir_50k",
    "minhash_pairs_20k",
    "minhash_pairs_100k",
    "minhash_pairs_100k_collapsed",
    "lpa_100k_edges",   # per-round localCheckpoint jobs run in the builder
    "markov_600k",      # grid + touch-count collects run in the builder
    "kmeans_20k",       # per-iteration collects run in the builder
    "hits_100k_edges",  # per-round localCheckpoint jobs run in the builder
    "rake_sf",          # bounded top-N collect runs in the builder
    "jsd_sf",           # bounded per-group collect runs in the builder
    # r10 probes whose operators run jobs inside the builder
    "textrank_sf",    # weighted-PageRank rounds localCheckpoint in the builder
    "ppr_sf",         # restart rounds localCheckpoint in the builder
    "unigram_sf",     # the vocab-fit collect runs in the builder
    "wordpiece_sf",   # shares unigram's vocab-fit collect in the builder
    # r12: Lloyd training rounds collect inside the builder; the served
    # output is eager-checkpointed before the cache releases
    "ann_train_serve_100k",
    # r13 family probes whose operators run jobs inside the builder
    "ktruss_sf",        # per-round localCheckpoint + count in the peel loop
    "obf_sf",           # day-grain checkpoint + look-count in the builder
    "eb_sf",            # bucket-grain eager checkpoint in the builder
    # r11 probes whose operators run jobs inside the builder
    "gmm_sf",         # per-round aggregate collects
    "cox_sf",         # per-step (U, I) collects
    "kcenter_sf",     # per-round argmax collects
    "als_sf",         # per-half-step localCheckpoints
    "gbm_sf",         # per-round grid argmax collects
    "fs_em_sf",       # per-round EM aggregate collects
    "seqpat_sf",      # the n_users count runs in the builder
    "pca_100k",       # per-round localCheckpoints + count run in the builder
    "mf_gd_sf",       # per-round localCheckpoints run in the builder
    "bfs_600k_nodes", # frontier rounds localCheckpoint in the builder
    # --scale-extras twins of the eager probes above
    "lpa_1m_edges",
    "hits_1m_edges",
    "kmeans_200k",
    "fuzzy_clusters_200k",
    "connected_components_1m",
}


def _wait_for_idle() -> float:
    """Four consecutive rounds shipped load-contaminated numbers (loadavg
    2.49 -> 4.39 -> 7.11); every cross-round perf comparison became
    guesswork. Refusing to measure on a busy host is the fix: poll until
    the 1-min loadavg drops below SPARK_GRAFT_MIN_IDLE (default 0.5),
    bounded by SPARK_GRAFT_IDLE_WAIT_SEC (default 600 s) so an always-busy
    host still produces an artifact (with the contamination visible in
    env.loadavg_start / env.idle_waited_sec). Returns seconds waited.
    r9: default threshold raised 0.5 -> 1.0 — all three r8 runs waited the
    full bound then proceeded at loadavg 0.61-0.81, i.e. 0.5 is below this
    host's floor; 1.0 is attainable and still catches real contamination
    (the bad rounds ran at 2.5-7.1). Min-of-N headline reps are the primary
    noise defense now.
    r12: the gate is UNCONDITIONAL — even on an already-idle host it
    settles for SPARK_GRAFT_IDLE_SETTLE seconds (default 20) while
    polling, so ``idle_waited_sec`` is always > 0 and the artifact
    carries proof the protocol ran (r11's "idle" artifact shipped
    ``idle_waited_sec: 0.0`` — the name promised a wait it never did)."""
    threshold = float(os.environ.get("SPARK_GRAFT_MIN_IDLE", "1.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_IDLE_WAIT_SEC", "600"))
    settle = float(os.environ.get("SPARK_GRAFT_IDLE_SETTLE", "20"))
    t0 = time.monotonic()
    while True:
        waited = time.monotonic() - t0
        if os.getloadavg()[0] < threshold and waited >= settle:
            break
        if waited >= max_wait:
            print(
                f"bench: proceeding despite loadavg "
                f"{os.getloadavg()[0]:.2f} >= {threshold} after "
                f"{waited:.0f}s wait",
                file=sys.stderr,
            )
            break
        time.sleep(5)
    return round(time.monotonic() - t0, 1)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--skip-extras",
        action="store_true",
        help="headline-only run (the sf1 scaling probe uses this: extras "
        "carry their own fixed-size fixtures and don't scale with the sf "
        "dir)",
    )
    ap.add_argument(
        "--runs",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")),
        help="headline repetitions; queries report min-of-N + spread "
        "(single-shot numbers were load-noise-dominated for four rounds "
        "running — the 0.5 idle threshold is unreachable on this host, so "
        "min-of-N IS the idle-approximation mechanism)",
    )
    ap.add_argument(
        "--extras-runs",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_EXTRAS_RUNS", "2")),
        help="extras repetitions, round-robin like the headline; each "
        "probe reports min-of-N + spread + the loadavg its min was "
        "measured under (single-shot extras shipped phantom 2.4x "
        "regressions in r9 when loadavg ramped to 8.8 mid-sequence)",
    )
    ap.add_argument(
        "--scale-extras",
        action="store_true",
        help="run the 10x SCALE_EXTRAS table instead of EXTRAS (the sf1 "
        "probe for the iterative/quadratic-risk families); keep "
        "--extras-runs >= 2 — r10 shipped these single-shot and the one "
        "sample per probe was exactly the phantom-regression exposure "
        "min-of-N exists to prevent (the default 2 applies here too)",
    )
    ap.add_argument(
        "--only-extras",
        default="",
        help="comma-separated extras-probe names: run ONLY these probes "
        "(headline skipped) — the fresh-session drift-reprobe path the "
        "r12 forensics hand-rolled, now first-class; names must exist "
        "in the selected extras table",
    )
    ap.add_argument(
        "--out",
        default=os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json"),
        help="also write the result JSON to this file (the driver's "
        "bounded stdout-tail capture truncated r9's artifact mid-JSON; "
        "the file is the authoritative copy). '-' disables.",
    )
    args = ap.parse_args()
    n_runs = max(1, args.runs)
    n_extras_runs = max(1, args.extras_runs)

    idle_waited = _wait_for_idle()
    spark = get_spark("ningaloo-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()
    # Machine-load context: round-over-round deltas have twice been traced
    # to co-running sessions on the host, not code changes. loadavg at
    # start/end plus an end-of-run canary re-measurement of the first
    # headline query make contamination visible inside the artifact.
    load_start = os.getloadavg()[0]

    # Warmup, untimed: one JVM query (codegen/JIT + parquet footer cache).
    # Deliberately NO pandas-UDF warmup: spawning one Python worker per core
    # up front (spark.range(N).select(udf)) measurably degrades the whole
    # session afterward in local mode; the spatial query's UDF warms the
    # worker pool with the handful of workers its scan actually needs.
    queries["pricing_summary"](spark, SF_DIR).collect()

    import gc

    # Round-robin over the headline list n_runs times (not N back-to-back
    # runs of one query): a load spike then contaminates one REP of each
    # query instead of every rep of one query, and min-of-N recovers.
    raw: dict[str, list[float]] = {name: [] for name in HEADLINE}
    # --only-extras is a probe-forensics run: skip the headline phase
    # entirely (its canary_relative would only restate the extras canary).
    if args.only_extras:
        n_runs = 0
        raw = {}
    for _ in range(n_runs):
        for name in HEADLINE:
            # Untimed GC between queries: session-lifetime debris (dropped
            # DataFrames, spent broadcasts) otherwise piles into the old gen
            # and can slow later array-heavy queries by 10x+. Python gc first
            # so py4j releases JVM-side references System.gc() can reclaim.
            gc.collect()
            spark._jvm.System.gc()
            fn = HEADLINE_OVERRIDES.get(name)
            df = fn(spark, SF_DIR) if fn else queries[name](spark, SF_DIR)
            t0 = time.perf_counter()
            if name in CHECKSUM:
                df.agg({CHECKSUM[name]: "sum"}).collect()
            else:
                df.collect()
            raw[name].append(time.perf_counter() - t0)
    timings = {name: round(min(ts), 3) for name, ts in raw.items()}
    spread = {
        name: round(max(ts) - min(ts), 3) for name, ts in raw.items()
    }

    # Extras: round-robin min-of-N like the headline (r9 item 1) — a load
    # spike contaminates one rep of each probe, not every rep of one probe.
    # Each probe also records the 1-min loadavg its MIN rep started under,
    # so a contaminated artifact is self-describing.
    if args.scale_extras:
        extras_table = SCALE_EXTRAS
    elif args.skip_extras:
        extras_table = {}
    else:
        extras_table = EXTRAS
    if args.only_extras:
        want = [n.strip() for n in args.only_extras.split(",") if n.strip()]
        unknown = [n for n in want if n not in extras_table]
        if unknown:
            raise SystemExit(f"--only-extras: unknown probes {unknown}")
        extras_table = {n: extras_table[n] for n in want}
    ex_raw: dict[str, list[float]] = {n: [] for n in extras_table}
    ex_loads: dict[str, list[float]] = {n: [] for n in extras_table}

    def _time_probe(name: str, fn) -> None:
        gc.collect()
        spark._jvm.System.gc()
        ex_loads[name].append(os.getloadavg()[0])
        if name in EAGER_EXTRAS:
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
        else:
            df = fn(spark, SF_DIR)
            t0 = time.perf_counter()
            df.collect()
        ex_raw[name].append(time.perf_counter() - t0)

    # In-phase canary (r11 verdict item 1): one warm pricing_summary rep
    # per extras pass, so each probe's canary_relative divides by a
    # yardstick measured under the SAME host phase — round-over-round
    # reads stop being polluted by co-tenant drift.
    extras_canaries: list[float] = []

    def _extras_canary() -> None:
        gc.collect()
        spark._jvm.System.gc()
        df = queries["pricing_summary"](spark, SF_DIR)
        t0 = time.perf_counter()
        df.collect()
        extras_canaries.append(time.perf_counter() - t0)

    for _ in range(n_extras_runs):
        if extras_table:
            _extras_canary()
        for name, fn in extras_table.items():
            _time_probe(name, fn)

    # Adaptive reruns (r11 verdict item 5): a co-tenant burst can eat one
    # of two reps (r11: fuzzy_clusters_200k spread 19.1 s vs min 20.9).
    # When a probe's min is not corroborated — spread > 0.5×min and the
    # two best reps still disagree by > 0.5×best — buy another sample,
    # bounded by SPARK_GRAFT_BENCH_MAX_ADAPTIVE extra reps per probe.
    def _needs_rerun(ts: list[float]) -> bool:
        if len(ts) < 2 or (max(ts) - min(ts)) <= 0.5 * min(ts):
            return False
        if len(ts) >= 3:
            best = sorted(ts)[:2]
            return (best[1] - best[0]) > 0.5 * best[0]
        return True

    max_adaptive = int(
        os.environ.get("SPARK_GRAFT_BENCH_MAX_ADAPTIVE", "2")
    )
    adaptive_reruns: dict[str, int] = {}
    for _ in range(max_adaptive):
        offenders = [
            n
            for n, ts in ex_raw.items()
            if _needs_rerun(ts) and adaptive_reruns.get(n, 0) < max_adaptive
        ]
        if not offenders:
            break
        _extras_canary()
        for name in offenders:
            _time_probe(name, extras_table[name])
            adaptive_reruns[name] = adaptive_reruns.get(name, 0) + 1

    extras = {n: round(min(ts), 3) for n, ts in ex_raw.items()}
    extras_spread = {
        n: round(max(ts) - min(ts), 3) for n, ts in ex_raw.items()
    }
    extras_loadavg = {
        n: round(ex_loads[n][ts.index(min(ts))], 2)
        for n, ts in ex_raw.items()
    }
    extras_canary_min = (
        round(min(extras_canaries), 3) if extras_canaries else None
    )

    # Canary: re-time the first headline query warm at the very end. A
    # canary far above its headline number means the host got busier while
    # the extras ran — read the whole artifact with that in mind.
    gc.collect()
    spark._jvm.System.gc()
    df = queries["pricing_summary"](spark, SF_DIR)
    t0 = time.perf_counter()
    df.collect()
    canary = round(time.perf_counter() - t0, 3)

    # canary_relative (r11 verdict item 1): every probe's min divided by
    # the in-phase pricing_summary min — the headline phase uses
    # pricing_summary's own headline min, the extras phase the min of the
    # per-pass canary reps. Round-over-round comparisons should read
    # THESE, not absolute seconds: pricing_summary's code is frozen
    # (~r05), so co-tenant drift cancels out of the ratio.
    head_canary = timings.get("pricing_summary")
    canary_relative = (
        {n: round(t / head_canary, 3) for n, t in timings.items()}
        if head_canary
        else {}
    )
    extras_canary_relative = (
        {n: round(t / extras_canary_min, 3) for n, t in extras.items()}
        if extras_canary_min
        else {}
    )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_spread": spread,
        "canary_relative": canary_relative,
        "extras": extras,
        "extras_spread": extras_spread,
        "extras_loadavg": extras_loadavg,
        "extras_canary_relative": extras_canary_relative,
        "env": {
            "loadavg_start": round(load_start, 2),
            "loadavg_end": round(os.getloadavg()[0], 2),
            "canary_pricing_summary_end": canary,
            "canary_extras_phase_min": extras_canary_min,
            "extras_adaptive_reruns": adaptive_reruns,
            "idle_waited_sec": idle_waited,
            "headline_runs": n_runs,
            "extras_runs": n_extras_runs,
        },
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    line = json.dumps(result)
    if args.out and args.out != "-":
        # File first, stdout second: the file survives even if the
        # consumer's stdout capture truncates (r9's BENCH artifact did).
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    print(line)
    # LAST line is a compact headline-only summary (≤ ~1 KB): consumers
    # that capture only a bounded stdout TAIL (the grading driver keeps
    # 2000 chars) lost the full line's head two rounds running —
    # whatever window they keep, the final short line parses whole.
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "queries": timings,
        "sf": result["sf"],
        "env": result["env"],
        "full": args.out if args.out and args.out != "-" else None,
    }
    sys.stdout.flush()
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
