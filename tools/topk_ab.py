"""TOP-K-fold cost A/B: the merge-and-rerank fold (exact keyed delete
rule) vs a full ranked recompute from the view, as the VIEW grows.

The round-13 fold (``fold_topk_join_view``) maintains the k best rows
per group: inserts fold by (stored set ∪ batch posts) → rank → keep k —
a (k+batch)-sized window over touched groups only — and ONLY a removal
whose (group, key) is a stored member forces a rescan of its group
(exact, no conservative term; see SCALE.md). The recompute a foldless
consumer must run — scan the whole view, rank every group, keep k —
grows with the view.

Per view size N (synthetic orders-shaped rows over NGROUPS segments;
per group, rows n..n+NGROUPS-1 hold the unique top value so member
deletes are constructible):

  FOLD:      merge_cdc_delta(view) → the top-k fold (ENDANGERED member
             deletes force that many group rescans; BATCH_UPS inserts
             promote through the merge-and-rerank arm).
  RECOMPUTE: build_topk_over(view post state) — the full ranked pass.

Equality of served rankings is asserted every round. Honest framing as
with the sibling A/Bs: the fold is several small jobs with fixed
overhead, so at toy scale the recompute wins; the product is the slope
— fold flat in N, recompute linear.
Usage: python tools/topk_ab.py    [TOPK_AB_SIZES='[...]']
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SIZES = tuple(
    json.loads(os.environ.get("TOPK_AB_SIZES", "[1000000, 16000000, 64000000]"))
)
NGROUPS = 400
K = 3
ENDANGERED = 5  # groups whose top row the batch deletes → rescan scope
BATCH_UPS = 2_000
RUNS = int(os.environ.get("TOPK_AB_RUNS", "3"))


def median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def main():
    from pgcp_spark.session import get_spark
    from pgcp_spark.sources.lake import (
        merge_cdc_delta,
        pending_state,
        read_current,
        read_current_with_deltas,
        write_snapshot,
    )
    from pgcp_spark.sources.view_maintenance import (
        build_topk_over,
        fold_topk_join_view,
        serve_topk,
    )

    spark = get_spark("topk_ab")

    for n in SIZES:
        # body rows: value < 1000; one sentinel top row per group at
        # value 1e6 (ids n .. n+NGROUPS-1) — each group's unique rank-1
        # member, deletable to force a member-hit rescan
        body = spark.range(n).select(
            F.col("id").alias("o_orderkey"),
            (F.col("id") % NGROUPS).alias("o_custkey"),
            ((F.col("id") * 7919) % 100_000 / 100.0).alias("o_totalprice"),
            F.concat(F.lit("seg"), (F.col("id") % NGROUPS)).alias(
                "c_mktsegment"
            ),
        )
        sentinels = spark.range(NGROUPS).select(
            (F.col("id") + n).alias("o_orderkey"),
            F.col("id").alias("o_custkey"),
            F.lit(1_000_000.0).alias("o_totalprice"),
            F.concat(F.lit("seg"), F.col("id")).alias("c_mktsegment"),
        )
        view = body.unionByName(sentinels)
        fold_ts, rec_ts = [], []
        for run in range(RUNS):
            view_dir = tempfile.mkdtemp(prefix="tk_ab_view_")
            agg_dir = tempfile.mkdtemp(prefix="tk_ab_agg_")
            try:
                write_snapshot(view, view_dir, cluster_by=["c_mktsegment"])
                write_snapshot(
                    build_topk_over(
                        view, "c_mktsegment", "o_orderkey", "o_totalprice", K
                    ),
                    agg_dir,
                    cluster_by=["c_mktsegment"],
                    meta={"applied_view_state": pending_state(view_dir)},
                )
                # batch: delete ENDANGERED rank-1 sentinels (member hits
                # → rescan) + upserts promoting new top-2 rows into every
                # group (the merge-and-rerank arm)
                lo = (run * ENDANGERED) % (NGROUPS - ENDANGERED)
                dels = spark.range(ENDANGERED).select(
                    (F.col("id") + n + lo).alias("o_orderkey"),
                    F.lit(None).cast("long").alias("o_custkey"),
                    F.lit(None).cast("double").alias("o_totalprice"),
                    F.lit(None).cast("string").alias("c_mktsegment"),
                    F.lit("delete").alias("_op"),
                )
                ups = spark.range(BATCH_UPS).select(
                    (F.col("id") + n + NGROUPS + run * BATCH_UPS).alias(
                        "o_orderkey"
                    ),
                    (F.col("id") % NGROUPS).alias("o_custkey"),
                    F.lit(500_000.0).alias("o_totalprice"),
                    F.concat(F.lit("seg"), (F.col("id") % NGROUPS)).alias(
                        "c_mktsegment"
                    ),
                    F.lit("upsert").alias("_op"),
                )
                batch = dels.unionByName(ups)

                t0 = time.monotonic()
                merge_cdc_delta(spark, view_dir, batch, key=["o_orderkey"])
                fold_topk_join_view(
                    spark, agg_dir, view_dir, ["o_orderkey"],
                    "c_mktsegment", "o_orderkey", "o_totalprice", K,
                )
                folded = sorted(
                    tuple(r)
                    for r in serve_topk(
                        read_current(spark, agg_dir),
                        "c_mktsegment",
                        "o_orderkey",
                    ).collect()
                )
                fold_ts.append(time.monotonic() - t0)

                t0 = time.monotonic()
                post = read_current_with_deltas(
                    spark, view_dir, key=["o_orderkey"]
                )
                rec = sorted(
                    tuple(r)
                    for r in serve_topk(
                        build_topk_over(
                            post, "c_mktsegment", "o_orderkey",
                            "o_totalprice", K,
                        ),
                        "c_mktsegment",
                        "o_orderkey",
                    ).collect()
                )
                rec_ts.append(time.monotonic() - t0)
                assert folded == rec, f"fold != recompute at n={n}"
            finally:
                for d in (view_dir, agg_dir):
                    shutil.rmtree(d, ignore_errors=True)
        print(
            f"n={n:>9}: topk fold {median(fold_ts):6.2f} s "
            f"(rescan {ENDANGERED}/{NGROUPS} groups, k={K})   "
            f"full recompute {median(rec_ts):6.2f} s",
            flush=True,
        )


if __name__ == "__main__":
    main()
