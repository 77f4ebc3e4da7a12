"""Cascade-IVM cost A/B: the watermarked aggregate fold vs a full
recompute of the aggregated join, as the FACT grows.

The round-11 cascade maintains ``A = groupBy(g)(fact ⋈ dim)`` from the
view's state-diff change feed. This measures the claim that makes it
worth having: fold cost tracks the CDC BATCH (flat in fact size), while
the recompute a feedless consumer must run — re-join fact with dim and
re-aggregate — grows linearly with the fact.

Per fact size N (synthetic: ``spark.range``-derived orders-shaped rows,
fixed dim of 1 000 keys, fixed CDC batch of 2 000 upserts + 1 000
deletes):

  FOLD:      merge_cdc_delta(fact) → fold_join_view (batch-as-feed) →
             fold_agg_join_view (state_changes from the stamped
             watermark) — the steady-state cascade cycle, timed end to
             end including the view fold.
  RECOMPUTE: read the post fact merge-on-read, join dim, groupBy —
             what keeping the aggregate fresh costs WITHOUT the
             cascade.

Equality of the two results is asserted every round (the A/B is also a
correctness check).

Honest framing: the fold is ~20 small Spark jobs (delta writes, probes,
semi-joined state diff, agg upsert) with fixed per-job overhead, while
the recompute is ONE scan-bound pipeline — so at toy scale the
recompute WINS and the measurement's product is the CROSSOVER, exactly
like the ANN family's exact-vs-IVF bracket (ANN_LEG_EXACT_BELOW): below
it, recompute the view; above it, fold. Usage: python tools/cascade_ab.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import json as _json

SIZES = tuple(
    _json.loads(os.environ.get("CASCADE_AB_SIZES", "[1000000, 16000000, 64000000]"))
)
DIM_KEYS = 1_000
BATCH_UPS = 2_000
BATCH_DELS = 1_000
RUNS = int(os.environ.get("CASCADE_AB_RUNS", "3"))


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
        build_agg_over,
        fold_agg_join_view,
        fold_join_view,
    )

    spark = get_spark("cascade_ab")
    dim = spark.range(DIM_KEYS).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("seg"), (F.col("id") % 25)).alias("c_mktsegment"),
    )

    for n in SIZES:
        fact = spark.range(n).select(
            F.col("id").alias("o_orderkey"),
            (F.col("id") % DIM_KEYS).alias("o_custkey"),
            ((F.col("id") * 7919) % 100_000 / 100.0).alias("o_totalprice"),
        )
        fold_ts, rec_ts = [], []
        for run in range(RUNS):
            fact_dir = tempfile.mkdtemp(prefix="casc_ab_fact_")
            view_dir = tempfile.mkdtemp(prefix="casc_ab_view_")
            agg_dir = tempfile.mkdtemp(prefix="casc_ab_agg_")
            try:
                write_snapshot(fact, fact_dir)
                view0 = fact.join(
                    dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
                ).select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")
                write_snapshot(view0, view_dir, cluster_by=["o_custkey"])
                write_snapshot(
                    build_agg_over(view0, "c_mktsegment", "o_totalprice"),
                    agg_dir,
                    meta={"applied_view_state": pending_state(view_dir)},
                )
                # fixed-size CDC batch, disjoint key bands per run
                lo = 100 + run
                # even upsert keys / odd delete keys: merge_cdc_delta's
                # batch must be key-unique, parity keeps them disjoint
                ups = (
                    spark.range(BATCH_UPS)
                    .select((2 * (F.col("id") * 997 + lo)).alias("o_orderkey"))
                    .withColumn("o_custkey", F.col("o_orderkey") % DIM_KEYS)
                    .withColumn("o_totalprice", F.lit(42.5))
                    .withColumn("_op", F.lit("upsert"))
                )
                dels = (
                    spark.range(BATCH_DELS)
                    .select((2 * (F.col("id") * 991 + lo) + 1).alias("o_orderkey"))
                    .withColumn("o_custkey", F.lit(None).cast("long"))
                    .withColumn("o_totalprice", F.lit(None).cast("double"))
                    .withColumn("_op", F.lit("delete"))
                )
                batch = ups.unionByName(dels)

                t0 = time.monotonic()
                merge_cdc_delta(spark, fact_dir, batch, key=["o_orderkey"])
                feed = batch.withColumn(
                    "_change_type",
                    F.when(F.col("_op") == "delete", F.lit("delete")).otherwise(
                        F.lit("update_postimage")
                    ),
                ).drop("_op")
                fold_join_view(
                    spark,
                    view_dir,
                    view_key=["o_orderkey"],
                    fact_feed=feed,
                    dim_feed=None,
                    dim_current=dim,
                    fact_join_col="o_custkey",
                    dim_join_col="c_custkey",
                )
                fold_agg_join_view(
                    spark, agg_dir, view_dir, ["o_orderkey"], "c_mktsegment",
                    "o_totalprice",
                )
                folded = sorted(
                    tuple(r) for r in read_current(spark, agg_dir).collect()
                )
                fold_ts.append(time.monotonic() - t0)

                t0 = time.monotonic()
                post = read_current_with_deltas(
                    spark, fact_dir, key=["o_orderkey"]
                )
                rec = sorted(
                    tuple(r)
                    for r in build_agg_over(
                        post.join(
                            dim.withColumnRenamed("c_custkey", "o_custkey"),
                            on="o_custkey",
                        ),
                        "c_mktsegment",
                        "o_totalprice",
                    ).collect()
                )
                rec_ts.append(time.monotonic() - t0)
                live = [t for t in folded if t[3] > 0]  # order_cnt > 0
                assert live == rec, f"fold != recompute at n={n}"
            finally:
                for d in (fact_dir, view_dir, agg_dir):
                    shutil.rmtree(d, ignore_errors=True)
        print(
            f"n={n:>9}: cascade fold {median(fold_ts):6.2f} s   "
            f"recompute {median(rec_ts):6.2f} s"
        )


if __name__ == "__main__":
    main()
