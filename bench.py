"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is fully materialized through the ``noop`` write format so the
whole plan executes (no column pruning from a bare count) without driver-side
collect overhead.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Queries that represent each operator family; keep total runtime bounded.
# This list is the CROSS-ROUND COMPARABLE series (recorded since r1): the
# summary "value"/"normalized_total" fields are computed over it alone so
# round-over-round totals stay apples-to-apples.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_type_profit",
    "q10_returned_items",
    "q21_sole_late_supplier",
    "window_top3_orders_per_customer",
    "window_sessionize_events",
    "dedup_minhash_lsh_candidates",
    "dedup_embedding_cosine_pairs",
    "sim_cosine_bruteforce_topk",
    "text_quality_score",
    "pipeline_training_data_prep",
    "streaming_tumbling_event_counts",
]

# Families added after the comparable series froze — timed identically,
# reported in the same per-query maps, EXCLUDED from the legacy totals
# (their own totals land in value_all / normalized_total_all).
HEADLINE_NEW = [
    "text_bm25_topk_from_index",  # retrieval from the persisted index (r8)
    "hybrid_bm25_cosine_rrf",  # multi-modal RRF fusion (r8)
    "text_bm25_topk_index_delta_fold",  # merge-on-read across a fold delta (r9)
    "hybrid_multi_query_rrf",  # N topics, one scan per modality (r9)
    "text_bm25_after_retention_delete",  # O(keys) tombstone delete + query (r10)
    "lake_cdc_merge_on_read_orders",  # CDC batch applied as deltas (r10)
    "sim_batch_vs_int8_ann_index",  # two-stage quantized ANN probe (r10)
    "sim_filtered_batch_vs_ann_index",  # filtered ANN (predicate pre-scoring, r10)
    "lake_incremental_join_view_orders",  # delta-join IVM fold + MOR read (r10)
    "text_lm_perplexity_score",  # bigram-LM cross-entropy scoring (r10)
    "agg_cms_bigram_heavy_hitters",  # count-min sketch + heavy hitters (r10)
    "agg_histogram_quantile_rollup",  # mergeable histogram quantiles (r10)
    "sim_batch_vs_pq_ann_index",  # two-stage PQ (IVFADC) probe (r10)
    "lake_incremental_agg_join_view_orders",  # cascade IVM: agg over join view (r11)
    "lake_atomic_group_commit_orders",  # cross-table atomic commit + group read (r11)
    "sim_range_filtered_batch_vs_ann_index",  # range-predicate filtered ANN probe (r11)
    "streaming_agg_join_view_maintenance",  # streaming cascade IVM loop (r11)
    "lake_incremental_minmax_join_view_orders",  # MIN/MAX cascade fold + rescan (r12)
    "streaming_cascade_group_commit",  # streaming cascade through group txn (r12)
    "sim_label_range_filtered_zorder_ann_topk",  # conjunctive 3-key z-probe (r12)
    "streaming_minmax_cascade_group_commit",  # MIN/MAX stream through group txn (r13)
    "text_bm25_group_commit_with_corpus",  # corpus+index one-transaction fold (r13)
    "lake_asof_join_manifest_history",  # as-of join over manifest history (r13)
    "lake_incremental_distinct_join_view_orders",  # COUNT DISTINCT support fold (r13)
    "streaming_distinct_join_view_maintenance",  # streaming distinct cascade (r13)
    "lake_incremental_topk_join_view_orders",  # per-group TOP-K fold + rescan (r13)
]


# Box-state calibration probe: a FIXED synthetic workload (2e9-id range
# sum, pure whole-stage-codegen arithmetic, no IO, no shuffle). Since
# round 8 the probe runs INTERLEAVED — one sample immediately before
# every timed query execution — and each pass's queries normalize by
# that pass's probe MEDIAN: raw totals swung ±20% on probe drift two
# rounds running, and a per-pass denominator from ~15 interleaved
# samples tracks that slow drift robustly. Measured honestly (r8
# trials): a per-SAMPLE denominator is WORSE than raw (a single 0.4 s
# probe swings ±30%, uncorrelated with a 1 s query's noise), and even
# the pass median only removes the between-pass drift component —
# within-pass contention noise is irreducible by any denominator (q1
# rel-spread 0.56→0.42, q3 0.31→0.19, embedding 0.27→0.27). The
# per-query probe-normalized MEDIANS (5 runs for the noisy trio) are
# the primary cross-round series; raw seconds stay alongside.
PROBE_ROWS = 2_000_000_000
PROBE_PARTITIONS = 32  # fixed, NOT the session default — the probe must
# measure the box, so its shape can't drift with config changes

# The measured high-variance trio (r7 relative spreads 0.58/0.35/0.34 —
# wide enough to swallow a 15% regression at 3 runs): these get 5 runs.
HIGH_VARIANCE = {
    "dedup_embedding_cosine_pairs",
    "q1_pricing_summary",
    "q3_shipping_priority",
}

# The one legacy entry with a Python (Arrow/pandas) stage. The global
# warm-up loop primes it once, but ~17 other queries run between that
# and its timed pass — long enough for idle Python workers to be
# reclaimed, so the FIRST timed sample intermittently re-pays worker +
# Arrow spin-up (~2-4 s on a contended box). That one-time cost produced
# the false +62% (r11) and +45% (r10) driver readings on this query.
# Fix (r12): one UNTIMED priming execution immediately before each timed
# sample — the timed number then measures the steady-state kernel, which
# is what the cross-round series compares. Costs one extra ~1.4 s
# execution per pass; JVM-only queries skip it (their codegen cache
# doesn't evict this way).
PRIME_BEFORE_TIMING = {"dedup_embedding_cosine_pairs"}


def _run_probe(spark) -> float:
    import time as _t

    t0 = _t.perf_counter()
    (
        spark.range(0, PROBE_ROWS, 1, PROBE_PARTITIONS)
        .selectExpr("sum(id * 2654435761 % 1000003) as s")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return _t.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from pgcp_spark.registry import all_queries
    from pgcp_spark.session import get_spark

    spark = get_spark("pgcp_spark_bench")
    registry = all_queries()
    names = [n for n in HEADLINE + HEADLINE_NEW if n in registry]
    legacy = [n for n in HEADLINE if n in registry]
    # JVM/codegen warmup outside the timed region (standard practice; the
    # timed numbers then reflect steady-state throughput, which is what a
    # long-lived cluster job sees). Each query is warmed once: the first
    # execution of a plan pays whole-stage-codegen compilation and Python
    # worker spin-up that a resident engine pays exactly once per plan shape.
    for name in names:
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    # Median-of-3 timed runs per query, executed as 3 round-robin passes
    # (pass 1 runs every query once, then pass 2, then pass 3) so a
    # transient noisy neighbor (GC pause, OS scheduling) perturbs at most
    # one pass of each query instead of a whole query's sample. Per-query
    # spread is recorded alongside — on this box single runs swing ±2-3×,
    # so a round-over-round comparison needs the dispersion to be
    # falsifiable.
    runs_n = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    hv_runs_n = max(runs_n, int(os.environ.get("SPARK_GRAFT_BENCH_HV_RUNS", "5")))
    _run_probe(spark)  # probe warmup (codegen compile), outside the samples
    probe_samples: list[float] = []
    runs: dict[str, list[float]] = {n: [] for n in names}
    norm_runs: dict[str, list[float]] = {n: [] for n in names}
    # round-robin passes (a transient noisy neighbor perturbs at most one
    # pass of each query); the extra passes run only the measured
    # high-variance trio. Every timed query execution is immediately
    # preceded by its own probe sample; each pass's queries normalize by
    # the MEDIAN of that pass's interleaved probes — a single 0.4 s probe
    # sample is itself noisy (measured ±30%), so a per-sample denominator
    # would inject noise, while the pass median tracks the slow box-state
    # drift that actually moves cross-round comparisons.
    for pass_i in range(hv_runs_n):
        pass_probes: list[float] = []
        pass_raw: dict[str, float] = {}
        for name in names:
            if pass_i >= runs_n and name not in HIGH_VARIANCE:
                continue
            if name in PRIME_BEFORE_TIMING:  # untimed steady-state primer
                registry[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            pass_probes.append(_run_probe(spark))
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            pass_raw[name] = time.perf_counter() - t0
        probe_samples.extend(pass_probes)
        pass_probe = statistics.median(pass_probes)
        for name, dt in pass_raw.items():
            runs[name].append(dt)
            norm_runs[name].append(dt / pass_probe)
    probe_sec = round(statistics.median(probe_samples), 4)
    timings = {n: round(statistics.median(rs), 4) for n, rs in runs.items()}
    spread = {
        n: [round(min(rs), 4), round(max(rs), 4)] for n, rs in runs.items()
    }
    # PRIMARY series: per-query probe-normalized medians (unitless
    # multiples of the interleaved probe) + their spread — read these for
    # cross-round comparisons; raw seconds stay for absolute context.
    normalized = {n: round(statistics.median(rs), 2) for n, rs in norm_runs.items()}
    normalized_spread = {
        n: [round(min(rs), 2), round(max(rs), 2)] for n, rs in norm_runs.items()
    }

    total = round(sum(timings[n] for n in legacy), 4)
    # Key order is LOAD-BEARING: the driver's artifact keeps only the
    # LAST 2000 chars of this line, so the primary cross-round series
    # (queries_normalized / normalized_total) must be the FINAL keys —
    # BENCH_r08 truncated its own primary series by printing them early.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                # legacy-15 raw total. PROTOCOL NOTE: r1-r7 measured this
                # as median-of-3 with no interleaved probes; since r8 the
                # HIGH_VARIANCE trio is median-of-5 and every timed run is
                # preceded by a probe run (warm caches differ) — so raw
                # r≥8 vs r≤7 totals are not strictly apples-to-apples;
                # compare r≥8 rounds to each other, normalized-to-
                # normalized where possible.
                "value": total,
                "unit": "sec",
                "value_all": round(sum(timings.values()), 4),
                "queries": timings,
                "spread": spread,
                "probe_sec": probe_sec,
                "probe_spread": [
                    round(min(probe_samples), 4),
                    round(max(probe_samples), 4),
                ],
                "runs_per_query": {
                    n: len(rs) for n, rs in runs.items()
                },
                "stat": "median",
                "sf": sf,
                # PRIMARY series last (survives the driver's tail window)
                "normalized_spread": normalized_spread,
                "queries_normalized": normalized,
                "normalized_total": round(sum(normalized[n] for n in legacy), 2),
                "normalized_total_all": round(sum(normalized.values()), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
