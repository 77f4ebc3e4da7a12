"""Measured skew-join win: salted vs plain sort-merge join on a synthetic
hot key.

``join_salted_skew_events_per_user`` exists because manual salting is the
mitigation when AQE's runtime skew splitting can't help (e.g. the skewed
side feeds a broadcast-ineligible aggregation, or AQE is unavailable).
This harness substantiates the claim with numbers instead of argument:

- synthetic events table where ONE user owns ``HOT_FRACTION`` of all rows
  (the 100 TB shape: a bot account, a null-ish default key, a crawler);
- dim table too large to broadcast (broadcast disabled to model that);
- AQE skew-join handling disabled, so the plain join concentrates the hot
  key's rows in a single sort-merge task;
- salted variant spreads the same rows over SALT_BUCKETS tasks.

Run:  python tools/skew_bench.py
Prints one JSON line: {"plain_sec": ..., "salted_sec": ..., "speedup": ...}.
Results are recorded in SCALE.md §skew.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_EVENTS = 24_000_000
N_USERS = 200_000
HOT_USER = 7
HOT_FRACTION = 0.5
SALT_BUCKETS = 16
RUNS = 3


def build_skewed(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """Events with one hot key, dim over the full key space. Deterministic
    (hash-based), generated distributed via range()."""
    e = (
        spark.range(N_EVENTS)
        .select(
            F.col("id").alias("event_id"),
            F.when(
                (F.xxhash64("id", F.lit(1)) % 1000) < int(HOT_FRACTION * 1000),
                F.lit(HOT_USER),
            )
            .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(N_USERS)))
            .alias("user_id"),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10_000)) / 100.0).alias("value"),
        )
        # materialize so generation cost is outside the timed join
        .localCheckpoint()
    )
    d = (
        spark.range(N_USERS)
        .select(
            F.col("id").alias("c_custkey"),
            F.concat(F.lit("SEG"), F.pmod(F.xxhash64("id"), F.lit(5))).alias(
                "c_mktsegment"
            ),
        )
        .localCheckpoint()
    )
    return e, d


def plain_join(e: DataFrame, d: DataFrame) -> DataFrame:
    return (
        e.join(d, e.user_id == d.c_custkey)
        .groupBy("user_id", "c_mktsegment")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    )


def salted_join(e: DataFrame, d: DataFrame) -> DataFrame:
    es = e.withColumn("salt", (F.col("event_id") % SALT_BUCKETS).cast("int"))
    ds = d.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)]))
    )
    return (
        es.join(ds, (es.user_id == ds.c_custkey) & (es.salt == ds.salt))
        .groupBy("user_id", "c_mktsegment")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    )


def bare_join(e: DataFrame, d: DataFrame) -> DataFrame:
    """Join WITHOUT a downstream aggregation — the shape AQE's skew-join
    CAN rescue (no distribution requirement above the join)."""
    return e.join(d, e.user_id == d.c_custkey).select(
        "event_id", "user_id", "c_mktsegment", "value"
    )


def timed(df_fn, e: DataFrame, d: DataFrame) -> float:
    runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        df_fn(e, d).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs)


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("skew_bench")
        # model the broadcast-ineligible + no-AQE-skew-rescue case the
        # salted operator is FOR; everything else stays default
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.skewJoin.enabled", "false")
        # AQE's DEFAULT skew threshold is 256 MB — the 12M-row hot
        # partition compresses under it and is silently not flagged, so
        # the AQE variants here tune the thresholds to the actual
        # partition scale (the lesson itself: the knob must track real
        # shuffle sizes or the rescue never fires)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    e, d = build_skewed(spark)
    # warmup both plans once (codegen compile)
    plain_join(e, d).write.format("noop").mode("overwrite").save()
    salted_join(e, d).write.format("noop").mode("overwrite").save()
    # sanity: identical results on the exact columns (sum_value is a
    # double reduction whose addition order differs between the two plans,
    # so it is excluded — the operator's registered query proves value
    # equality through its decimal-exact oracle instead)
    mismatch = (
        plain_join(e, d)
        .select("user_id", "c_mktsegment", "n_events")
        .exceptAll(salted_join(e, d).select("user_id", "c_mktsegment", "n_events"))
        .count()
    )
    assert mismatch == 0, f"salted join result differs from plain join: {mismatch} rows"
    plain = timed(plain_join, e, d)
    salted = timed(salted_join, e, d)
    # third variant: let AQE's runtime skew splitting rescue the PLAIN plan
    # (the Spark-first fix when the skewed side is a plain shuffle join) —
    # manual salting remains for the cases AQE can't touch (the skewed key
    # feeding an aggregation, streaming state, or pre-AQE engines)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    plain_aqe = timed(plain_join, e, d)
    # control pair: a BARE join (no downstream agg) — here AQE CAN split
    # the skewed partition, proving the rescue works when the plan allows
    bare_aqe = timed(bare_join, e, d)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    bare_plain = timed(bare_join, e, d)
    print(
        json.dumps(
            {
                "n_events": N_EVENTS,
                "hot_fraction": HOT_FRACTION,
                "salt_buckets": SALT_BUCKETS,
                "plain_sec": round(plain, 3),
                "salted_sec": round(salted, 3),
                "plain_aqe_skewjoin_sec": round(plain_aqe, 3),
                "speedup_salted_vs_plain": round(plain / salted, 2),
                "bare_join_sec": round(bare_plain, 3),
                "bare_join_aqe_skewjoin_sec": round(bare_aqe, 3),
                "runs": RUNS,
                "stat": "median",
            }
        )
    )


if __name__ == "__main__":
    main()
