"""ANN recall/time curve: measure LSH and IVF against their exact baselines.

The LSH/IVF driver rows are rows-only by design (xxhash-free but still
approximate — no DuckDB oracle can check them), so this tool produces the
substitute evidence: a measured recall-vs-wall-time curve at a chosen
scale, recorded in SCALE.md and lower-bounded in tests/test_similarity.py.

  - LSH ground truth: the EXACT threshold pairs from the registered
    block-matmul query (dedup_embedding_cosine_pairs, same 0.4 threshold).
    recall = |LSH pairs ∩ exact pairs| / |exact pairs|.
  - IVF ground truth: the registered brute-force top-k. recall@k =
    |IVF (query, neighbor) ∩ exact (query, neighbor)| / |exact|.

Run:  python tools/ann_curve.py [sf_dir]          (default /tmp/sf1)
      SPARK_GRAFT_ANN_RUNS=N   timed runs per point (median, default 3)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (tables, planes, probes); (8, 8, 2) = production since round 6 — multi-probe
# buys 16-table-class recall at 8-table hashing cost (see SCALE.md round-6)
LSH_POINTS = [(4, 8, 1), (8, 8, 1), (16, 8, 1), (8, 8, 2), (8, 8, 3)]
IVF_POINTS = [(16, 2), (16, 4), (16, 8)]  # (lists, nprobe); (16, 4) = production


def _timed(fn, runs: int) -> tuple[set, float]:
    """Collect fn() once for the result set, then time ``runs`` full
    executions (collect included) and report the median wall."""
    result = fn()  # warm + result capture
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return result, round(statistics.median(samples), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    runs = int(os.environ.get("SPARK_GRAFT_ANN_RUNS", "3"))

    from pgcp_spark.functions.similarity import ivf_topk, lsh_pairs
    from pgcp_spark.registry import all_queries
    from pgcp_spark.session import get_spark

    spark = get_spark("ann_curve")
    qs = all_queries()

    # ground truths (exact; timed once — they are the baselines, not the curve)
    t0 = time.perf_counter()
    exact_pairs = {
        (r.vec_a, r.vec_b)
        for r in qs["dedup_embedding_cosine_pairs"].fn(spark, sf_dir).collect()
    }
    exact_pairs_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    exact_topk = {
        (r.vec_id, r.neighbor_id)
        for r in qs["sim_cosine_bruteforce_topk"].fn(spark, sf_dir).collect()
    }
    exact_topk_sec = round(time.perf_counter() - t0, 3)
    if not exact_pairs or not exact_topk:
        raise SystemExit("exact baselines returned nothing — wrong lake?")

    curve: dict[str, dict] = {}
    for tables, planes, probes in LSH_POINTS:
        got, sec = _timed(
            lambda t=tables, p=planes, q=probes: {
                (r.vec_a, r.vec_b)
                for r in lsh_pairs(spark, sf_dir, tables=t, planes=p, probes=q).collect()
            },
            runs,
        )
        curve[f"lsh_t{tables}_p{planes}_q{probes}"] = {
            "recall": round(len(got & exact_pairs) / len(exact_pairs), 4),
            "pairs": len(got),
            "sec": sec,
        }
    for lists, nprobe in IVF_POINTS:
        got, sec = _timed(
            lambda li=lists, np_=nprobe: {
                (r.vec_id, r.neighbor_id)
                for r in ivf_topk(spark, sf_dir, lists=li, nprobe=np_).collect()
            },
            runs,
        )
        curve[f"ivf_l{lists}_np{nprobe}"] = {
            "recall": round(len(got & exact_topk) / len(exact_topk), 4),
            "pairs": len(got),
            "sec": sec,
        }

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "runs_per_point": runs,
                "exact_pairs": len(exact_pairs),
                "exact_pairs_sec": exact_pairs_sec,
                "exact_topk": len(exact_topk),
                "exact_topk_sec": exact_topk_sec,
                "curve": curve,
            }
        )
    )


if __name__ == "__main__":
    main()
