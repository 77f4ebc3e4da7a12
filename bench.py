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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from pgcp_spark.registry import all_queries
    from pgcp_spark.session import get_spark

    spark = get_spark("pgcp_spark_bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]
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
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs_n):
        for name in names:
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[name].append(time.perf_counter() - t0)
    timings = {n: round(statistics.median(rs), 4) for n, rs in runs.items()}
    spread = {
        n: [round(min(rs), 4), round(max(rs), 4)] for n, rs in runs.items()
    }

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "runs_per_query": runs_n,
                "stat": "median",
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
