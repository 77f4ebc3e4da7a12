"""COUNT-DISTINCT-fold cost A/B: the support-table fold vs a full
COUNT(DISTINCT) recompute from the view, as the VIEW grows.

The round-13 fold (``fold_distinct_join_view``) maintains per-group
exact distinct counts through a per-(group, value) multiplicity support
table: the support folds with the signed rule and the count changes
only on 0→present / present→0 transitions. Unlike MIN/MAX there is NO
rescan arm at all — a delete is exact from the support's own evidence —
so the fold's cost tracks (CDC batch + touched support pairs + the
support's copy-on-write rewrite), NEVER the view. The recompute a
foldless consumer must run — scan the whole view and COUNT(DISTINCT) —
grows with the view.

Per view size N (synthetic orders-shaped rows over NGROUPS segments ×
NVALUES priorities, plus one single-holder sentinel value per group so
deletes drive genuine present→0 transitions):

  FOLD:      merge_cdc_delta(view) as the feed source → the distinct
             fold (state diff from the stamped watermark; transitions
             from the old-vs-new support join).
  RECOMPUTE: build_distinct_over(view post state) — the full pass.

Equality of served counts is asserted every round. Honest framing: the
support table here is NGROUPS×(NVALUES+1) ≈ 13k rows, the dashboard
regime the fold is built for; for a near-unique value column the
support approaches the view and the HLL sketch rollup is the right
tool (stated in the module too). As with the sibling A/Bs, the fold is
several small jobs with fixed overhead, so at toy scale the recompute
wins; the product is the slope — fold flat in N, recompute linear.
Usage: python tools/distinct_ab.py    [DISTINCT_AB_SIZES='[...]']
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
    json.loads(
        os.environ.get("DISTINCT_AB_SIZES", "[1000000, 16000000, 64000000]")
    )
)
NGROUPS = 400
NVALUES = 32
ENDANGERED = 5  # groups whose sentinel value the batch deletes → −1 each
BATCH_UPS = 2_000
RUNS = int(os.environ.get("DISTINCT_AB_RUNS", "3"))


def median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def main():
    from pgcp_spark.session import get_spark
    from pgcp_spark.sources.lake import (
        merge_cdc_delta,
        pending_state,
        read_current_with_deltas,
        write_snapshot,
    )
    from pgcp_spark.sources.view_maintenance import (
        build_distinct_over,
        build_distinct_support,
        fold_distinct_join_view,
        read_distinct_agg,
    )

    spark = get_spark("distinct_ab")

    for n in SIZES:
        body = spark.range(n).select(
            F.col("id").alias("o_orderkey"),
            (F.col("id") % NGROUPS).alias("o_custkey"),
            F.concat(F.lit("P"), (F.col("id") % NVALUES)).alias(
                "o_orderpriority"
            ),
            F.concat(F.lit("seg"), (F.col("id") % NGROUPS)).alias(
                "c_mktsegment"
            ),
        )
        # one single-holder sentinel value per group: deleting its row is
        # a guaranteed present→0 transition
        sentinels = spark.range(NGROUPS).select(
            (F.col("id") + n).alias("o_orderkey"),
            F.col("id").alias("o_custkey"),
            F.concat(F.lit("PSOLO"), F.col("id")).alias("o_orderpriority"),
            F.concat(F.lit("seg"), F.col("id")).alias("c_mktsegment"),
        )
        view = body.unionByName(sentinels)
        fold_ts, rec_ts = [], []
        for run in range(RUNS):
            view_dir = tempfile.mkdtemp(prefix="dst_ab_view_")
            sup_dir = tempfile.mkdtemp(prefix="dst_ab_sup_")
            agg_dir = tempfile.mkdtemp(prefix="dst_ab_agg_")
            try:
                write_snapshot(view, view_dir, cluster_by=["c_mktsegment"])
                state0 = pending_state(view_dir)
                write_snapshot(
                    build_distinct_support(
                        view, "c_mktsegment", "o_orderpriority"
                    ),
                    sup_dir,
                    cluster_by=["c_mktsegment"],
                    meta={"applied_view_state": state0},
                )
                write_snapshot(
                    build_distinct_over(
                        view, "c_mktsegment", "o_orderpriority"
                    ),
                    agg_dir,
                    meta={"applied_view_state": state0},
                )
                # batch: delete ENDANGERED sentinel holders (present→0)
                # + upserts carrying a brand-new value into every group
                # (0→present) — both transition kinds, every round
                lo = (run * ENDANGERED) % (NGROUPS - ENDANGERED)
                dels = spark.range(ENDANGERED).select(
                    (F.col("id") + n + lo).alias("o_orderkey"),
                    F.lit(None).cast("long").alias("o_custkey"),
                    F.lit(None).cast("string").alias("o_orderpriority"),
                    F.lit(None).cast("string").alias("c_mktsegment"),
                    F.lit("delete").alias("_op"),
                )
                ups = spark.range(BATCH_UPS).select(
                    (F.col("id") + n + NGROUPS + run * BATCH_UPS).alias(
                        "o_orderkey"
                    ),
                    (F.col("id") % NGROUPS).alias("o_custkey"),
                    F.concat(F.lit("PNEW"), F.lit(run)).alias(
                        "o_orderpriority"
                    ),
                    F.concat(F.lit("seg"), (F.col("id") % NGROUPS)).alias(
                        "c_mktsegment"
                    ),
                    F.lit("upsert").alias("_op"),
                )
                batch = dels.unionByName(ups)

                t0 = time.monotonic()
                merge_cdc_delta(spark, view_dir, batch, key=["o_orderkey"])
                fold_distinct_join_view(
                    spark, sup_dir, agg_dir, view_dir, ["o_orderkey"],
                    "c_mktsegment", "o_orderpriority",
                )
                folded = sorted(
                    tuple(r)
                    for r in read_distinct_agg(
                        spark, agg_dir, "c_mktsegment"
                    ).collect()
                )
                fold_ts.append(time.monotonic() - t0)

                t0 = time.monotonic()
                post = read_current_with_deltas(
                    spark, view_dir, key=["o_orderkey"]
                )
                rec = sorted(
                    tuple(r)
                    for r in build_distinct_over(
                        post, "c_mktsegment", "o_orderpriority"
                    )
                    .filter(F.col("distinct_cnt") > 0)
                    .collect()
                )
                rec_ts.append(time.monotonic() - t0)
                assert folded == rec, f"fold != recompute at n={n}"
            finally:
                for d in (view_dir, sup_dir, agg_dir):
                    shutil.rmtree(d, ignore_errors=True)
        print(
            f"n={n:>9}: distinct fold {median(fold_ts):6.2f} s "
            f"(support {NGROUPS * NVALUES + NGROUPS} pairs, no rescan)   "
            f"full recompute {median(rec_ts):6.2f} s",
            flush=True,
        )


if __name__ == "__main__":
    main()
