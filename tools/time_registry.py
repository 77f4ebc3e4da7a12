"""Full-registry timing audit: execute every registered query end-to-end
(noop sink) at $SPARK_GRAFT_SF_DIR and print one JSON line with per-query
seconds, slowest-first. One warmup + one timed run per query — this is a
pathology detector (which query got accidentally quadratic/driver-bound),
not a benchmark; bench.py with median-of-3 + spread is the benchmark.

Run:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/time_registry.py
Args: optional query names narrow the audit (like driver_mimic.py);
      SPARK_GRAFT_TIME_RUNS=N times each query N times and reports the
      median (default 1 — the pathology-detector mode).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pgcp_spark.registry import all_queries
    from pgcp_spark.session import get_spark

    import statistics

    spark = get_spark("time_registry")
    registry = all_queries()
    names = sys.argv[1:] or list(registry)
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown query name(s): {unknown}")
    runs_n = int(os.environ.get("SPARK_GRAFT_TIME_RUNS", "1"))
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in names:
        query = registry[name]
        try:
            query.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            samples = []
            for _ in range(runs_n):
                t0 = time.perf_counter()
                query.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 3)
            if runs_n > 1:
                spreads[name] = [round(min(samples), 3), round(max(samples), 3)]
        except Exception as exc:  # keep auditing the rest
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
    ordered = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_queries": len(timings),
                "total_sec": round(sum(timings.values()), 1),
                "timings": ordered,
                **({"spread": spreads, "runs_per_query": runs_n} if runs_n > 1 else {}),
                "errors": errors,
            }
        )
    )


if __name__ == "__main__":
    main()
