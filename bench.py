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


# Box-state calibration probe: a FIXED synthetic workload (2e9-id range
# sum, pure whole-stage-codegen arithmetic, no IO, no shuffle) timed once
# per bench pass. Its median is reported as probe_sec and each query's
# probe-normalized time alongside the raw one, so a cross-round delta can
# be read directly: raw moved but normalized didn't → ambient box drift
# (the r3→r4 comparison needed manual forensics for exactly this);
# normalized moved → a real plan/code regression.
PROBE_ROWS = 2_000_000_000
PROBE_PARTITIONS = 32  # fixed, NOT the session default — the probe must
# measure the box, so its shape can't drift with config changes


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
    _run_probe(spark)  # probe warmup (codegen compile), outside the samples
    probe_samples: list[float] = []
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs_n):
        # one probe sample per pass brackets the pass's ambient box state
        probe_samples.append(_run_probe(spark))
        for name in names:
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[name].append(time.perf_counter() - t0)
    probe_samples.append(_run_probe(spark))  # closing bracket
    probe_sec = round(statistics.median(probe_samples), 4)
    timings = {n: round(statistics.median(rs), 4) for n, rs in runs.items()}
    spread = {
        n: [round(min(rs), 4), round(max(rs), 4)] for n, rs in runs.items()
    }
    normalized = {n: round(t / probe_sec, 2) for n, t in timings.items()}

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "probe_sec": probe_sec,
                "probe_spread": [
                    round(min(probe_samples), 4),
                    round(max(probe_samples), 4),
                ],
                "queries_normalized": normalized,
                "normalized_total": round(total / probe_sec, 2),
                "runs_per_query": runs_n,
                "stat": "median",
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
