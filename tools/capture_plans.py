"""Capture .explain("formatted") output for bench queries into plans/<tag>/.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    python tools/capture_plans.py <tag> [query ...]

Writes plans/<tag>/<query>.txt for each query (default: every bench.py
headline query). For registered CYCLE queries (the lake/streaming ones that
build their own lakes inside fn), the captured plan is the plan of the
RETURNED DataFrame — the serving read over the cycle's end state; the
cycle's internal fold plans are pinned separately in tests/test_plans.py.

The optimization-round convention (OPTIMIZATION_r13.md): tag "r13" writes
<query>_before.txt / <query>_after.txt via the suffix argument.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit("usage: capture_plans.py <dir-tag> <suffix> [query ...]")
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pgcp_spark.registry import all_queries
    from pgcp_spark.session import get_spark

    import bench

    spark = get_spark("capture_plans")
    registry = all_queries()
    if not names:
        names = [n for n in bench.HEADLINE + bench.HEADLINE_NEW if n in registry]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
