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
    # best-of-2 timed runs per query: one noisy neighbor (GC pause, OS
    # scheduling) otherwise lands in the round's recorded number
    timings: dict[str, float] = {}
    for name in names:
        fn = registry[name].fn
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
