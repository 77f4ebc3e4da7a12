"""SparkSession factory tuned for both local testing and cluster scale.

Local mode runs ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads, one JVM).
The same builder settings are the ones we would ship to a 1000-executor
cluster: AQE on (runtime coalescing + skew-join handling), Arrow enabled for
the Pandas-UDF paths, UTC session timezone so timestamp semantics match the
DuckDB oracle, and shuffle partitions sized to the parallelism at hand
(overridable; on a real cluster this would be ~2-3x total cores or left to
AQE's coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "pgcp_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    Scale notes: every setting here is cluster-safe. AQE re-plans shuffles at
    runtime (coalesces small partitions, splits skewed ones); Arrow makes the
    unavoidable Python paths batch-columnar instead of row-at-a-time.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.ts is TIMESTAMP(NANOS); without this the first read fails a
        # whole job before _load_events falls back and sets it at runtime.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
