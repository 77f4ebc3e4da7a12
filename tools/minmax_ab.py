"""MIN/MAX-cascade cost A/B: the selective-rescan fold vs a full
min/max recompute from the view, as the VIEW grows.

The round-12 fold (``fold_minmax_join_view``) maintains per-group
MIN/MAX over the maintained join view: inserts fold via least/greatest,
and a removal forces a rescan ONLY for groups where it tied a stored
bound — read from the view pruned to those groups (pushed-IN +
CLUSTER BY layout). This measures the claim that makes the split worth
having: fold cost tracks (CDC batch + endangered-groups' rows), while
the recompute a foldless consumer must run — re-scan the whole view and
re-aggregate — grows with the view.

Per view size N (synthetic orders-shaped rows over NGROUPS segments,
each group given one sentinel row holding its minimum):

  FOLD:      merge_cdc_delta(view) as the feed source → the minmax fold
             (state diff from the stamped watermark, selective rescan of
             the K groups whose sentinel minimum the batch deleted).
  RECOMPUTE: build_minmax_over(view post state) — the full pass.

Equality of served bounds is asserted every round. Honest framing: as
with tools/cascade_ab.py, the fold is many small jobs with fixed
overhead, so at toy scale the recompute wins; the product is the
crossover AND the rescan-scope count (K of NGROUPS groups rescanned).
Usage: python tools/minmax_ab.py    [MINMAX_AB_SIZES='[...]']
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
    json.loads(os.environ.get("MINMAX_AB_SIZES", "[1000000, 16000000, 64000000]"))
)
NGROUPS = 400
ENDANGERED = 5  # groups whose minimum the batch deletes → rescan scope
BATCH_UPS = 2_000
RUNS = int(os.environ.get("MINMAX_AB_RUNS", "3"))


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
        build_minmax_over,
        fold_minmax_join_view,
        read_minmax_agg,
    )

    spark = get_spark("minmax_ab")

    for n in SIZES:
        # body rows: price ≥ 10; one sentinel row per group at price 1.0
        # (ids n .. n+NGROUPS-1) — each group's unique minimum holder
        body = spark.range(n).select(
            F.col("id").alias("o_orderkey"),
            (F.col("id") % NGROUPS).alias("o_custkey"),
            (10.0 + (F.col("id") * 7919) % 100_000 / 100.0).alias("o_totalprice"),
            F.concat(F.lit("seg"), (F.col("id") % NGROUPS)).alias("c_mktsegment"),
        )
        sentinels = spark.range(NGROUPS).select(
            (F.col("id") + n).alias("o_orderkey"),
            F.col("id").alias("o_custkey"),
            F.lit(1.0).alias("o_totalprice"),
            F.concat(F.lit("seg"), F.col("id")).alias("c_mktsegment"),
        )
        view = body.unionByName(sentinels)
        fold_ts, rec_ts = [], []
        for run in range(RUNS):
            view_dir = tempfile.mkdtemp(prefix="mm_ab_view_")
            agg_dir = tempfile.mkdtemp(prefix="mm_ab_agg_")
            try:
                # CLUSTER BY the group column: the rescan's pushed-IN
                # prunes to the endangered groups' files
                write_snapshot(view, view_dir, cluster_by=["c_mktsegment"])
                write_snapshot(
                    build_minmax_over(view, "c_mktsegment", "o_totalprice"),
                    agg_dir,
                    meta={"applied_view_state": pending_state(view_dir)},
                )
                # batch: delete ENDANGERED sentinel minima (disjoint
                # groups per run) + upserts that only RAISE maxima (the
                # fold arm; keys beyond every existing id)
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
                    F.lit(1_000_000.0).alias("o_totalprice"),
                    F.concat(F.lit("seg"), (F.col("id") % NGROUPS)).alias(
                        "c_mktsegment"
                    ),
                    F.lit("upsert").alias("_op"),
                )
                batch = dels.unionByName(ups)

                t0 = time.monotonic()
                merge_cdc_delta(spark, view_dir, batch, key=["o_orderkey"])
                fold_minmax_join_view(
                    spark, agg_dir, view_dir, ["o_orderkey"], "c_mktsegment",
                    "o_totalprice",
                )
                folded = sorted(
                    tuple(r)
                    for r in read_minmax_agg(
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
                    for r in build_minmax_over(
                        post, "c_mktsegment", "o_totalprice"
                    )
                    .select(
                        "c_mktsegment",
                        F.col("min_dec").cast("double").alias("min_total"),
                        F.col("max_dec").cast("double").alias("max_total"),
                        "order_cnt",
                    )
                    .collect()
                )
                rec_ts.append(time.monotonic() - t0)
                assert folded == rec, f"fold != recompute at n={n}"
            finally:
                for d in (view_dir, agg_dir):
                    shutil.rmtree(d, ignore_errors=True)
        print(
            f"n={n:>9}: minmax fold {median(fold_ts):6.2f} s "
            f"(rescan {ENDANGERED}/{NGROUPS} groups)   "
            f"full recompute {median(rec_ts):6.2f} s"
        )


if __name__ == "__main__":
    main()
