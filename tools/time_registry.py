"""Full-registry timing audit: execute every registered query end-to-end
(noop sink) at $SPARK_GRAFT_SF_DIR and print one JSON line with per-query
seconds, slowest-first. One warmup + one timed run per query — this is a
pathology detector (which query got accidentally quadratic/driver-bound),
not a benchmark; bench.py with median-of-3 + spread is the benchmark.

Run:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/time_registry.py
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

    spark = get_spark("time_registry")
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, query in all_queries().items():
        try:
            query.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            query.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
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
                "errors": errors,
            }
        )
    )


if __name__ == "__main__":
    main()
