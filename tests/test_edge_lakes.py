"""Adversarial-lake regression tests: hostile data shapes through the
Spark-vs-DuckDB oracle compare.

``tools/make_edge_lake.py`` builds five schema-identical variants of the
testdata lake — empty (zero rows everywhere), nulls (hash-sliced NULLs in
every nullable column, ''/whitespace docs, empty embedding arrays),
degenerate (constant values, one timestamp, identical docs/vectors plus a
zero vector), scrambled (same rows, hash-permuted physical order — see the
input-order-invariance section below), and skewed (hot user/day/shingle
keys for blow-up timing audits). The full registry sweep runs as a tool
(`MIMIC_SF_DIR=... tools/driver_mimic.py`, recorded in COVERAGE.md); this
file pins the queries that FAILED on first contact with each lake, so the
specific defect classes fixed in round 4 stay fixed:

  - Spark's zero-row rollup/cube deviation from the ANSI grand-total row
  - ANSI DIVIDE_BY_ZERO in funnel / regression / correlation / z-score
  - descending-sequence element_at crashes on sub-shingle-width docs
  - window ORDER BY null-ordering divergence (Spark NULLS FIRST vs
    DuckDB NULLS LAST defaults)
  - the q21 decorrelation counting NULL-suppkey groups as "suppliers"
  - ragged/NULL/zero embeddings crashing numpy stacks and k-means
  - NaN poisoning in pandas UDF / stateful-streaming accumulators
"""

from __future__ import annotations

import subprocess
import sys

import pytest

from tests.oracle_check import compare

# (query name, lakes it must stay green on)
EDGE_CASES = [
    # ANSI empty-input grand total
    ("agg_rollup_region_nation", ("empty", "nulls", "degenerate")),
    ("agg_grouping_sets", ("empty",)),
    ("agg_grouping_id_rollup", ("empty",)),
    ("agg_cube_returnflag_linestatus", ("empty",)),
    # division guards
    ("funnel_view_click_purchase", ("empty", "degenerate")),
    ("agg_regression_price_on_qty", ("nulls", "degenerate")),
    ("agg_stats_correlation", ("degenerate",)),
    ("anomaly_hourly_event_zscore", ("degenerate",)),
    # tokenizer guards (descending sequence / element_at)
    ("dedup_jaccard_hot_shingle_capped", ("empty", "nulls")),
    ("text_repetition_quality", ("nulls",)),
    ("graph_connected_dup_clusters", ("nulls",)),
    # null-ordering pins
    ("window_lag_lead_order_dates", ("nulls",)),
    ("window_running_total_per_customer", ("nulls",)),
    ("window_percent_rank_cume_dist", ("nulls",)),
    # NULL-semantics of decorrelated EXISTS
    ("q21_sole_late_supplier", ("nulls",)),
    # NULL-group-key contract of the cascade aggregate (the fold excludes
    # NULL c_mktsegment groups — keyed-upsert ANSI rule — and the oracle
    # must mirror it; empty lake: the fold legitimately sees an empty
    # feed and must no-op, not raise) — round-11 first-contact failures
    ("lake_incremental_agg_join_view_orders", ("empty", "nulls")),
    ("streaming_agg_join_view_maintenance", ("empty", "nulls")),
    # event-time contract
    ("window_sessionize_events", ("nulls",)),
    ("join_asof_click_attribution", ("nulls",)),
    ("scd2_user_state_history", ("nulls",)),
    ("markov_event_type_transitions", ("nulls",)),
    # embedding validity contract + tie-breaking determinism
    ("sim_cosine_bruteforce_topk", ("empty", "nulls", "degenerate")),
    ("dedup_embedding_cosine_pairs", ("nulls", "degenerate")),
    ("sim_embedding_int8_quantize", ("nulls", "degenerate")),
    # pandas UDF NaN handling
    ("udf_pandas_price_tier", ("nulls",)),
    ("udf_grouped_map_priority_order_stats", ("nulls",)),
    ("udtf_top_tokens_per_doc", ("nulls",)),
    ("multimodal_feature_extract", ("nulls",)),
]


@pytest.fixture(scope="session")
def edge_lakes(tmp_path_factory) -> str:
    root = tmp_path_factory.mktemp("edge_lakes")
    subprocess.run(
        [sys.executable, "tools/make_edge_lake.py", "/root/testdata/sf0.001", str(root)],
        check=True,
        capture_output=True,
    )
    return str(root)


def _params():
    for name, lakes in EDGE_CASES:
        for lake in lakes:
            yield pytest.param(name, lake, id=f"{name}-{lake}")


@pytest.mark.parametrize(("name", "lake"), list(_params()))
def test_edge_lake_oracle_parity(spark, edge_lakes, name, lake):
    from pgcp_spark.registry import all_queries

    q = all_queries()[name]
    sf_dir = f"{edge_lakes}/{lake}"
    if q.oracle is None:
        # rows-only query: executing without an exception IS the check
        q.fn(spark, sf_dir).collect()
    else:
        compare(spark, sf_dir, f"{name}@{lake}", q.fn, q.oracle)


@pytest.mark.parametrize("lake", ["empty", "nulls"])
def test_exact_jaccard_tokenizer_guard_on_edge_lakes(spark, edge_lakes, lake):
    """The quarantined (unregistered) exact Jaccard generator keeps its
    tokenizer-guard edge-lake pin even though it left the registry."""
    from pgcp_spark.functions.dedup import EXACT_JACCARD_ORACLE, exact_jaccard_pairs

    compare(
        spark,
        f"{edge_lakes}/{lake}",
        f"exact_jaccard_pairs@{lake}",
        exact_jaccard_pairs,
        EXACT_JACCARD_ORACLE,
    )


# ---------------------------------------------------------------------------
# Input-order invariance: the "scrambled" lake holds the SAME rows as the
# canonical testdata in a deterministic hash-permuted physical order —
# different parquet row groups, min/max stats, and scan order. Spark runs
# on the scrambled layout while the DuckDB oracle reads the CANONICAL one,
# so equality proves the result doesn't leak scan order anywhere: no
# unordered first()/LIMIT, no accumulation-order-dependent float, no tie
# broken by file position. The queries here are the order-risk surface;
# the full 146-query sweep ran green as a tool (COVERAGE.md).
ORDER_RISK = [
    "q1_pricing_summary",             # decimal aggregation order
    "window_top3_orders_per_customer",  # rank ties
    "window_rank_dense_rank_suppliers",  # global rank ladder
    "agg_collect_sorted_priorities",  # collect_set iteration order
    "percentile_exact_quantity",      # exact percentile interpolation
    "sim_cosine_bruteforce_topk",     # top-k ties
    "dedup_exact_documents",          # canonical-doc keep rule
    "streaming_tumbling_event_counts",  # file order into micro-batches
]


@pytest.mark.parametrize("name", ORDER_RISK)
def test_scrambled_layout_matches_canonical_oracle(spark, edge_lakes, name):
    from pgcp_spark.registry import all_queries

    q = all_queries()[name]
    compare(
        spark,
        f"{edge_lakes}/scrambled",
        f"{name}@scrambled",
        q.fn,
        q.oracle,
        oracle_sf_dir="/root/testdata/sf0.001",
    )


def test_hash_sketches_are_layout_invariant(spark, edge_lakes):
    # MinHash / SimHash / LSH signatures hash CONTENT, never position:
    # the candidate sets must be bit-identical across physical layouts.
    # (IVF is the documented exception — k-means|| initialization samples
    # partition-dependently, so its index, and therefore its candidate
    # set, is layout-dependent; its contract is recall, tested in
    # tests/test_similarity.py.)
    from pgcp_spark.registry import all_queries

    qs = all_queries()
    for name in (
        "dedup_minhash_lsh_candidates",
        "dedup_simhash_pairs",
        "sim_cosine_lsh_pairs",
    ):
        def rows(sf):
            got = [tuple(r) for r in qs[name].fn(spark, sf).collect()]
            got.sort(key=lambda r: [(v is None, str(v)) for v in r])
            return got

        assert rows("/root/testdata/sf0.001") == rows(f"{edge_lakes}/scrambled"), name


# ---------------------------------------------------------------------------
# Skewed lake: one hot key per fact table (50% of events on one user, 50%
# of orders on one customer, a third of lineitem on one supplier/part) and
# a boilerplate sentence in a third of documents. Skew must change neither
# results (same-lake oracle parity below) nor complexity class (the full
# 151-query sweep at a skewed sf0.1 lake ran green as a tool, COVERAGE.md).
# The hot keys deliberately DIFFER per table: a shared hot key on two
# multi-row sides of one join is a semantic n²/4 cross-product no engine
# avoids — that both-sides-hot shape is measured in tools/skew_bench.py
# instead of swept here.
SKEW_RISK = [
    "window_sessionize_events",       # hot user's 50% in ONE window partition
    "markov_event_type_transitions",  # per-user sequence on the hot user
    "window_top3_orders_per_customer",  # hot customer's order pile, top-3 state
    "join_range_events_near_order",   # equi+range join across both skewed tables
    "dedup_jaccard_hot_shingle_capped",  # df cap vs the boilerplate shingles
    "streaming_stateful_user_stats",  # hot key in the state store
]


@pytest.mark.parametrize("name", SKEW_RISK)
def test_skewed_lake_oracle_parity(spark, edge_lakes, name):
    from pgcp_spark.registry import all_queries

    q = all_queries()[name]
    compare(spark, f"{edge_lakes}/skewed", f"{name}@skewed", q.fn, q.oracle)


@pytest.fixture(scope="session")
def skewed_multifile_lake(spark, edge_lakes, tmp_path_factory) -> str:
    """The skewed lake with events/orders re-laid-out as MULTI-FILE tables
    (the real-lake layout). AQE's skew split works along map-output
    boundaries, so a single-file table — one map task — is unsplittable no
    matter how the thresholds are tuned; any production lake table has
    many files. Everything else links to the original skewed lake."""
    import os
    import shutil

    dest = str(tmp_path_factory.mktemp("skewed_multi"))
    src = f"{edge_lakes}/skewed"
    for t in os.listdir(src):
        if t in ("events.parquet", "orders.parquet"):
            spark.read.parquet(f"{src}/{t}").repartition(8).write.parquet(f"{dest}/{t}")
        else:
            shutil.copy(f"{src}/{t}", f"{dest}/{t}")
    return dest


def test_aqe_skew_join_rescues_range_join_hot_key(spark, skewed_multifile_lake):
    """Pin rule 2 of the skew decision rule (operators/joins.py): on the
    skewed lake's hot user/customer, the range join — whose aggregate is
    on o_orderkey, NOT the join key, so no child-distribution conflict —
    is rescued by AQE's runtime skew split once the thresholds track real
    partition sizes (the 256 MB default never fires at this scale: also
    part of the rule). Asserts the executed plan shows the split
    (skew=true + AQEShuffleRead skewed) and the result is identical with
    the rescue disabled."""
    from pgcp_spark.registry import all_queries

    q = all_queries()["join_range_events_near_order"]
    conf = {
        # no broadcast: model the dim-too-big case the rule is about
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        df = q.fn(spark, skewed_multifile_lake)
        with_rescue = sorted(tuple(r) for r in df.collect())
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        without = sorted(
            tuple(r) for r in q.fn(spark, skewed_multifile_lake).collect()
        )
        assert with_rescue == without and len(with_rescue) > 0
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        for k, v in old.items():
            spark.conf.set(k, v)
