"""Physical-plan regression tests: the properties that make these queries
scale — pushdown, pruning, broadcast strategy, bounded shuffles — asserted
against the executed plan, so a refactor that silently loses one fails CI."""

from __future__ import annotations

import re

import pytest

from ningaloo_turtle_etl_spark import registry
from tests.conftest import SF_DIR

QUERIES = registry.queries()


def plan_of(spark, name, execute=False):
    df = QUERIES[name](spark, SF_DIR)
    if execute:
        # AQE finalizes (and annotates codegen stages) only on execution.
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = plan_of(spark, "pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # filter reached the scan
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m and "l_orderkey" not in m.group(1)  # unused columns pruned


def test_lookup_chain_broadcasts_all_dims(spark):
    plan = plan_of(spark, "lookup_chain_revenue")
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") == 0
    # Fact scan pruned to join key + measure inputs.
    first_read = re.search(r"ReadSchema: (\S+)", plan)
    assert first_read and "l_quantity" not in first_read.group(1)


def test_topk_per_group_single_shuffle(spark):
    plan = plan_of(spark, "topk_per_group")
    assert plan.count("Exchange") <= 1
    # Spark's rank-limit pushdown keeps per-group state bounded.
    assert "WindowGroupLimit" in plan


def test_slice_topk_uses_take_ordered(spark):
    plan = plan_of(spark, "slice_topk")
    assert "TakeOrderedAndProject" in plan  # no global sort for ORDER+LIMIT


def test_filter_pushdown_on_projection_pipeline(spark):
    plan = plan_of(spark, "projection_pipeline")
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_filter_predicates_conjunctive_half_pushed_to_fact_scan(spark):
    # Formatted mode prints the full PushedFilters list (the simple string
    # elides long lists with "...").
    df = QUERIES["filter_predicates"](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # The conjunctive chain reaches the lineitem scan; the null-disjunction
    # stays above the left join (pushing it below would change semantics).
    assert "GreaterThan(l_quantity,30" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_timestamp_pipeline_is_map_only(spark):
    plan = plan_of(spark, "timestamp_pipeline")
    assert plan.count("Exchange") == 0  # pure projection, fuses with scan


def test_asof_join_single_window_shuffle(spark):
    # union + carry-forward window: one shuffle for the window partitioning
    # plus the sparse rates-side prep — never a nested loop.
    plan = plan_of(spark, "asof_join_rates")
    assert plan.count("Exchange") <= 2
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_spatial_tag_is_map_side_only_before_agg(spark):
    plan = plan_of(spark, "spatial_tag_regions")
    # One shuffle total: the final tally. The UDF tagging itself is map-only.
    assert plan.count("Exchange") <= 2
    assert "ArrowEvalPython" in plan or "BatchEvalPython" not in plan


@pytest.mark.parametrize(
    "name", ["pricing_summary", "group_count_sorted", "summary_stats"]
)
def test_aggregations_are_codegen_hash_agg(spark, name):
    plan = plan_of(spark, name, execute=True)
    # "*(n)" prefixes mark whole-stage-codegen'd operators in the simple
    # plan format (the literal "WholeStageCodegen" only appears pre-AQE).
    assert "*(" in plan
    assert "HashAggregate" in plan and "SortAggregate" not in plan


def test_decontaminate_corpus_broadcasts_vocab_no_corpus_shuffle_join(spark):
    plan = plan_of(spark, "decontaminate_corpus")
    # eval vocabulary is the broadcast side; the corpus join never sort-merges
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # partial agg collapses exploded grams before the only corpus exchange
    assert "partial_count" in plan


def test_repetition_metrics_is_map_only(spark):
    plan = plan_of(spark, "repetition_metrics")
    assert "Exchange" not in plan  # pure projection fused with the scan


def test_training_mix_sample_broadcasts_rates(spark):
    plan = plan_of(spark, "training_mix_sample")
    # rates dim joins via broadcast; the only exchanges build the tiny agg
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pii_redaction_is_map_only(spark):
    plan = plan_of(spark, "pii_redaction")
    assert "Exchange" not in plan


def test_quality_budget_select_no_single_partition_window(spark):
    plan = plan_of(spark, "quality_budget_select")
    # the scale hazard this operator exists to avoid: a global-order window
    # (empty partitionBy → SinglePartition exchange)
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan  # within-partition cumsum survives


def test_text_token_quality_prunes_scan_to_two_columns(spark):
    plan = plan_of(spark, "text_token_quality")
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m and "doc_id" in m.group(1) and "text" in m.group(1)
    assert "lang" not in m.group(1) and "source" not in m.group(1)
    assert "Exchange" not in plan  # fused map-only projection


def test_bloom_decontaminate_no_nested_loop_no_inferred_gram_filter(spark):
    plan = plan_of(spark, "bloom_decontaminate")
    # The bitmap is a plan literal, not a joined one-row frame.
    assert "BroadcastNestedLoopJoin" not in plan
    # explode_outer infers no size()>0 filter, so no Filter node re-builds
    # the gram array: every split() in the plan lives in a Project/Generate.
    for line in plan.splitlines():
        if "Filter" in line and "split(text" in line:
            raise AssertionError(f"gram expression inlined into a Filter: {line[:160]}")


def test_semantic_dedup_pairs_payload_free_candidates(spark):
    from ningaloo_turtle_etl_spark.operators.dedup import semantic_near_dup_pairs
    from ningaloo_turtle_etl_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF_DIR)
    df = semantic_near_dup_pairs(emb, threshold=0.4, n_centroids=4, deterministic=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The self-join that forms the pair product must not carry embedding
    # arrays — vectors attach by id afterwards.
    m = re.search(r"SortMergeJoin.*?\n|BroadcastHashJoin.*?\n", plan)
    assert m is not None
    joins = [l for l in plan.splitlines() if "Join" in l and "vec_id" in l]
    pair_join = [l for l in joins if "cell" in l]
    assert pair_join, f"no cell-keyed pair join found: {joins}"
    assert all("embedding" not in l and " v#" not in l for l in pair_join)


def test_duplicate_passage_removal_plan_shape(spark):
    """Passage build is map-only (fused with the scan, no Python); the only
    shuffles are the election window (by passage) and the reassembly agg
    (by doc id); the join back to the id scan broadcasts."""
    plan = plan_of(spark, "duplicate_passage_removal")
    assert "EvalPython" not in plan  # pure Catalyst end to end
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_spatial_tag_regions_expr_is_pure_codegen(spark):
    """The Catalyst tagger's plan has no Python eval node and only the
    tally's single exchange."""
    plan = plan_of(spark, "spatial_tag_regions_expr")
    assert "EvalPython" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_weighted_sample_plan_is_take_ordered(spark):
    from ningaloo_turtle_etl_spark.operators.selection import weighted_sample_topn
    from ningaloo_turtle_etl_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR)
    plan = (
        weighted_sample_topn(docs, 50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # map-side keying + per-partition heaps only


def test_tfidf_plan_has_group_limit_and_broadcast_docfreq(spark):
    from ningaloo_turtle_etl_spark.operators.text import tfidf_top_terms
    from ningaloo_turtle_etl_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR)
    plan = (
        tfidf_top_terms(docs, n_top=3)._jdf.queryExecution().executedPlan().toString()
    )
    # top-k per doc runs under the WindowGroupLimit pushdown (rank filter
    # applied map-side before the window shuffle), and the docfreq dim
    # joins as a broadcast — no sort-merge join anywhere.
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_minhash_md5_family_plan_shape(spark):
    # The oracle-family pipeline must keep the scale-critical shapes of the
    # xxhash64 family: hash-joined band buckets (never a nested loop /
    # cartesian), payload-free candidate generation (no shingle arrays in
    # the banded join), and signature state read from the shared persisted
    # frame (InMemoryTableScan) rather than recomputed per branch.
    from ningaloo_turtle_etl_spark.operators.dedup import (
        minhash_near_dup_pairs,
        release_dedup_caches,
    )
    from ningaloo_turtle_etl_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    import pyspark.sql.functions as F

    docs = load_table(spark, "documents", SF_DIR).filter(F.col("doc_id") < 100)
    try:
        pairs = minhash_near_dup_pairs(docs, threshold=0.5, hash_family="md5")
        pairs.collect()  # materialize so the cached signature frame exists
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan
        assert "InMemoryTableScan" in plan  # shared signature state
        # Banded self-join carries only (id, bucket): the join keys section
        # must not reference the shingle array column.
        import re

        join_lines = [ln for ln in plan.splitlines() if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln or "BroadcastHashJoin" in ln]
        assert join_lines, "expected at least one hash join in the plan"
        banded = [ln for ln in join_lines if "bucket" in ln]
        assert banded and all(not re.search(r"\bsh#", ln) for ln in banded)
    finally:
        release_dedup_caches()


def test_substring_dup_stats_shares_one_hash_exchange(spark):
    plan = plan_of(spark, "substring_dup_stats")
    # rank election: the row_number and count windows over the window-hash
    # must share ONE exchange; the sweep adds one doc-keyed exchange.
    assert len(re.findall(r"hashpartitioning\(_h#\d+", plan)) == 1, plan
    assert "CartesianProduct" not in plan
    # window content never reaches a shuffle: no exchange carries text
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line


def test_edit_similarity_prefix_election_is_group_limited(spark):
    plan = plan_of(spark, "edit_similarity_pairs")
    # the rn <= q*k+1 prefix must push down as a map-side group limit
    # (Partial before the exchange), not a full sort per id
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan
    assert "CartesianProduct" not in plan
    # verification joins on ids only — strings rejoin via hashed relation,
    # never a shuffled sort-merge of the candidate pairs at this scale
    from ningaloo_turtle_etl_spark.operators.cache import (
        release_tracked_caches,
    )

    release_tracked_caches()


def test_pagerank_contribution_join_never_cartesian(spark):
    plan = plan_of(spark, "pagerank_copurchase")
    assert "CartesianProduct" not in plan


def test_event_sessions_single_exchange_shared_by_windows_and_rollup(spark):
    # lag + running sum + the per-session rollup must all ride ONE
    # user-keyed exchange — a second shuffle here doubles the cost of
    # sessionization at any scale.
    plan = plan_of(spark, "event_sessions")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_cuped_lift_is_one_aggregate_pass(spark):
    # CUPED is a single conditional-moment aggregate: no join, no window,
    # no row explosion — only the scan, one partial/final agg pair, and
    # the single-row combine.
    plan = plan_of(spark, "cuped_lift_click_vs_view")
    assert "Join" not in plan and "Window" not in plan
    assert "In(event_type" in plan or "event_type" in plan  # filter pushed


def test_soft_dedup_weights_shuffles_fingerprints_not_bodies(spark):
    # The count side and the join both key on the 16-char fingerprint; the
    # text column must not appear in any exchange input.
    plan = plan_of(spark, "soft_dedup_weights")
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)


def test_ks_windows_run_on_distinct_value_grain(spark):
    # Both window passes (per-group ECDF cumsum, per-pair forward fill)
    # must sit above the distinct-value aggregate, never the raw fact:
    # every exchange keys on the grouped columns.
    plan = plan_of(spark, "value_ks_by_type")
    assert "HashAggregate" in plan
    assert plan.count("Window") >= 2


def test_bootstrap_replicates_broadcast_not_shuffled(spark):
    # The 200-row replicate dim must reach the fact via a broadcast
    # nested-loop (map-only explosion), not a shuffled cartesian.
    plan = plan_of(spark, "value_bootstrap_ci")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_minhash_incremental_new_side_filter_pushed(spark):
    # The banded new-side must carry the _is_new filter below the bucket
    # join so old x old candidates never materialize.
    plan = plan_of(spark, "minhash_incremental_near_dups")
    assert "CartesianProduct" not in plan
    assert "_is_new" in plan


def test_contrastive_negatives_plan_is_map_only(spark):
    """The pool rides in as an array literal: no join, no window, no
    exchange anywhere — pure map-side candidate selection."""
    plan = plan_of(spark, "contrastive_negative_pairs")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_boilerplate_plan_shape(spark):
    """Segment explode is map-only off the scan; the (group, segment)
    count combines before its exchange; the flag join broadcasts; the only
    row-keyed shuffle is the per-doc reassembly."""
    plan = plan_of(spark, "boilerplate_removal")
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_mwu_windows_run_on_distinct_value_grain(spark):
    """The pooled-rank window sits above the (value) aggregate, never the
    raw scan: exactly one pre-window exchange keyed on the value grain,
    and the statistic folds to one row without another shuffle."""
    plan = plan_of(spark, "mwu_click_vs_view")
    assert "Window" in plan
    # aggregate-then-window: partial_count of the value grain appears
    # below the window in the plan text
    assert plan.index("partial_count") > plan.index("Window")


def test_audience_overlap_joins_on_member(spark):
    """The pair self-join keys on the member column (per-member-degree²
    fan-out), never a cartesian, and the size dims broadcast."""
    plan = plan_of(spark, "audience_overlap_types")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_classifier_auc_groups_scores_before_any_sort(spark):
    """The Mann-Whitney fold aggregates the scored frame to the distinct-
    score grain FIRST (map-side partial aggregate); the only Sort in the
    plan orders the tiny grouped table for the cumulative window — the
    input is never globally sorted."""
    plan = plan_of(spark, "classifier_auc")
    assert "Window" in plan
    # partial aggregation on the score grain happens below the window
    assert plan.index("partial_count") > plan.index("Window")
    assert "CartesianProduct" not in plan


def test_psi_value_drift_bounds_broadcast_and_bins_combine(spark):
    """Reference bounds come back as a 1-row broadcast (no shuffle of the
    event rows to meet them) and the bin tally partial-aggregates
    map-side before the ≤ n_bins-row exchange."""
    plan = plan_of(spark, "psi_value_drift")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_part_pairs_no_cartesian_and_name_dim_only(spark):
    plan = plan_of(spark, "fuzzy_part_pairs")
    # blocked self-join is a hash/broadcast equi-join on the block key,
    # never a cartesian/nested-loop all-pairs
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the quadratic stage reads only the name column from the part scan
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m and "p_name" in m.group(1)
    assert m and "p_brand" not in m.group(1)


def test_image_ahash_pairs_band_join_is_equi_join(spark):
    plan = plan_of(spark, "image_ahash_near_dups")
    # LSH candidate generation must be an equi-join on band keys — an
    # all-pairs hamming compare would be quadratic in the corpus
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnowing_quote_pairs_no_cartesian_fp_index_join(spark):
    plan = plan_of(spark, "winnowing_quote_pairs")
    # candidates come from the inverted fingerprint index (fp equi-join),
    # never an all-pairs document compare
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # fingerprint selection is pure array expressions — no Python stage
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bleu_rouge_clipping_is_equi_join_and_jvm_only(spark):
    plan = plan_of(spark, "bleu_rouge_by_source")
    # clipped counting joins cand and ref gram counts at (_id, n, gram)
    # grain — equi-join, no pair-vs-pair comparison, no Python
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_wasserstein_runs_on_distinct_value_grain(spark):
    plan = plan_of(spark, "wasserstein_value_by_type")
    # same scaffolding discipline as KS: the pair windows run on the
    # aggregated distinct-value grain (HashAggregate before any Window),
    # never a row-grain pair fanout
    assert "CartesianProduct" not in plan
    first_window = plan.find("Window")
    first_agg = plan.find("HashAggregate")
    assert first_agg != -1 and first_window != -1


def test_table_digest_single_aggregate_no_extra_exchange(spark):
    plan = plan_of(spark, "table_digest_by_flag")
    # one partial+final aggregate pair -> exactly one exchange (plus the
    # orderBy's range exchange); no join, no Python
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kneser_ney_counts_stay_on_type_grain(spark):
    plan = plan_of(spark, "kneser_ney_lm_scores")
    # the KN statistics aggregate the bigram-TYPE table; the count-table
    # scoring joins are hash equi-joins (the only nested-loop join is the
    # 1-row totals broadcast — the standard scalar-fold cross join)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bitext_margin_broadcasts_and_window_limits(spark):
    plan = plan_of(spark, "bitext_margin_pairs")
    # the scoring join broadcasts the smaller side; per-side top-k uses
    # the rank-limit window (bounded per-partition state)
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_ppjoin_jaccard_pairs_prefix_equi_join_jvm_only(spark):
    plan = plan_of(spark, "ppjoin_jaccard_pairs")
    # candidates come from the prefix-token equi-join (+ length and
    # positional residual filters), never an all-pairs compare; the whole
    # pipeline is Catalyst expressions — no Python stage
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_assignment_scan_has_no_join(spark):
    """kmeans_lloyd's assignment pass must be a MAP-SIDE scan against
    literal centroids — no join, no shuffle of vectors. Checked on the
    assignment stage itself (the registered query's output frame is a
    bounded driver createDataFrame by design)."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    vm = F.transform(
        F.col("embedding"), lambda x: F.round(x * 1e6, 0).cast("long")
    )
    base = df.select(F.col("vec_id").alias("id"), vm.alias("vm"))
    cents = [[0, 0], [19_000_000, 0]]

    def dist(c):
        carr = F.array(*[F.lit(int(x)) for x in c])
        return F.aggregate(
            F.zip_with(F.col("vm"), carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    assign = base.withColumn(
        "cluster",
        F.array_min(
            F.array(
                *[
                    F.struct(dist(c).alias("d"), F.lit(j).alias("j"))
                    for j, c in enumerate(cents)
                ]
            )
        )["j"],
    )
    plan = assign._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pareto_frontier_broadcast_semi_join_jvm_only(spark):
    plan = plan_of(spark, "pareto_frontier_parts")
    # the dominance statement is NOT executed quadratically: surviving
    # value pairs fan back via a broadcast LEFT SEMI join; no all-pairs
    # compare, no Python stage
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hilbert_buckets_stay_in_codegen_no_python(spark):
    plan = plan_of(spark, "hilbert_layout_buckets")
    # the six unrolled levels are materialized Generate stages — map-only,
    # JVM-side, no join anywhere before the bucket aggregate
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # the explode barriers that keep codegen alive
    assert "Join" not in plan


def test_mf_gd_round_joins_broadcast_factor_tables(spark):
    plan = plan_of(spark, "mf_gd_factors")
    # every round joins ratings onto the two entity-sized factor vectors:
    # those sides must broadcast-hash; the only nested-loop join allowed
    # is the single 1-row train_rmse metric attach (a cross join with a
    # literal-sized side), never a ratings-sided one
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shapley_runs_on_coalition_grain(spark):
    plan = plan_of(spark, "shapley_attribution_channels")
    # after the bitmask bit_or aggregate everything is 2^n-grain; the
    # subset-containment join is tiny-side broadcast, never row x row
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "bit_or" in plan.lower()


def test_hamming_topk_broadcast_queries_jvm_only(spark):
    plan = plan_of(spark, "ann_hamming_topk")
    # sign-bit packing + XOR/popcount are Catalyst expressions fused with
    # the scan; the 8-row query side broadcasts so the corpus never
    # shuffles before the per-query top-k window
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_symspell_pairs_key_equi_join_jvm_only(spark):
    plan = plan_of(spark, "symspell_customer_pairs")
    # candidates come from the delete-1 key EQUI-join over the distinct
    # name dimension — never an all-pairs compare, never a Python stage
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rfm_single_fact_aggregate_then_dimension_windows(spark):
    plan = plan_of(spark, "rfm_customer_segments")
    # one map-side-combined aggregate brings orders to the customer
    # grain; the dataset max and the three NTILE sorts all run on that
    # dimension (documented trade) — no join, no second scan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("FileScan") == 1  # orders is read exactly once


def test_cmh_two_aggregates_no_fact_join(spark):
    plan = plan_of(spark, "cmh_click_vs_view")
    # stratum cells + pooled cells are two map-combined aggregates over
    # the filtered fact; the final combine is a 1-row broadcast cross —
    # no fact-fact join anywhere
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "PushedFilters" in plan


def test_permutation_test_single_scan_no_joins(spark):
    plan = plan_of(spark, "permutation_test_purchase_view")
    # all 48 relabelings fold into ONE map-side-combined aggregate —
    # the events file is read exactly once, no join of any kind, and
    # the md5-bit coins stay JVM-side
    assert plan.count("FileScan") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "PushedFilters" in plan


def test_eb_shrunk_single_fact_scan_broadcast_prior(spark):
    plan = plan_of(spark, "eb_shrunk_purchase_rate")
    # the bucket grain is checkpointed, so the prior (an agg-of-agg)
    # and the output branch both read the 64-row materialization — the
    # events fact never appears twice, and the prior joins broadcast
    assert plan.count("FileScan parquet") <= 1
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_trained_ivf_pq_serve_tiers_broadcast_no_cartesian(spark):
    """The trained loop's SERVE stages (rebuilt lazily here — the
    public operator eager-checkpoints its output, hiding the plan):
    candidate selection is a broadcast cell equi-join + broadcast LUT
    join, never a cartesian, and the whole serve path stays JVM-side."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.quantize import (
        _lloyd_micro_rounds,
    )
    from ningaloo_turtle_etl_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, "embeddings", SF_DIR)
    vm = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1e6, 0).cast("long"),
    )
    base = emb.select(F.col("vec_id").alias("id"), vm.alias("vm"))
    cents = _lloyd_micro_rounds(base, 1, 4, 1, 64)[0]

    def idist(col, c):
        carr = F.array(*[F.lit(int(x)) for x in c])
        return F.aggregate(
            F.zip_with(col, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    cell = F.array_min(
        F.array(
            *[
                F.struct(idist(F.col("vm"), c).alias("d"), F.lit(j).alias("j"))
                for j, c in enumerate(cents)
            ]
        )
    )["j"]
    enc = base.select(F.col("id").alias("vec_id"), cell.alias("cell"))
    qcells = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 0)], "query_id long, cell int"
    )
    cand = enc.join(F.broadcast(qcells), on="cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    plan = cand._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
