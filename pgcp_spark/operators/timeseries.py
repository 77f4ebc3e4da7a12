"""Time-series regularization: dense spine generation + gap fill with
last-observation-carried-forward (LOCF).

The hypertable-style operator family (continuous-aggregate rollups live in
streaming/events.py's rollup cascade): real event streams are sparse per
bucket, and downstream consumers (dashboards, feature stores, training
snapshots) need a DENSE regular series. The spine is generated row-locally
(sequence+explode over a bounded range — |types| × |buckets| rows, data-
independent), the sparse aggregate joins onto it, and LOCF is one ordered
window per series key.

Scale: the spine is tiny relative to the events (bucket count is fixed by
the time range, not row count), so the left join broadcasts the spine side
or shuffles |buckets| rows — never the raw events twice; LOCF's window
shuffles one row per (type, bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgcp_spark.operators._decimal import dsum
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table

_START = "2024-01-01 00:00:00"
_END_EXCL = "2024-01-03 00:00:00"
_LAST_BUCKET = "2024-01-02 23:00:00"


@register(
    "timeseries_gapfill_locf",
    oracle=f"""
WITH ev AS (
  SELECT event_type, ts, value FROM events
  WHERE ts >= TIMESTAMP '{_START}' AND ts < TIMESTAMP '{_END_EXCL}'
),
sparse AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_bucket,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
  FROM ev GROUP BY 1, 2
),
spine AS (
  SELECT t.event_type,
         UNNEST(generate_series(TIMESTAMP '{_START}', TIMESTAMP '{_LAST_BUCKET}',
                                INTERVAL 1 HOUR)) AS hour_bucket
  FROM (SELECT DISTINCT event_type FROM ev) t
)
SELECT s.event_type, s.hour_bucket,
       CAST(COALESCE(p.n_events, 0) AS BIGINT) AS n_events,
       last_value(p.sum_value IGNORE NULLS)
         OVER (PARTITION BY s.event_type ORDER BY s.hour_bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM spine s
LEFT JOIN sparse p ON p.event_type = s.event_type AND p.hour_bucket = s.hour_bucket
ORDER BY s.event_type, s.hour_bucket
""",
)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill + LOCF: hourly per-type event sums over two days, made
    dense (every (type, hour) slot present, zero counts filled) with the
    value series carried forward across empty buckets.

    Hour-granularity buckets make the ns-vs-µs timestamp difference moot
    (both engines truncate into the same hour), so no µs-truncation CTE is
    needed. The carried value is copied, not recomputed — bit-exact across
    engines.
    """
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit(_START).cast("timestamp"))
        & (F.col("ts") < F.lit(_END_EXCL).cast("timestamp"))
    )
    sparse = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_bucket")
    ).agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("sum_value"),
    )
    spine = (
        e.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.lit(_START).cast("timestamp"),
                    F.lit(_LAST_BUCKET).cast("timestamp"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hour_bucket"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("hour_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(sparse, ["event_type", "hour_bucket"], "left")
        .select(
            "event_type",
            "hour_bucket",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w).alias("locf_value"),
        )
        .orderBy("event_type", "hour_bucket")
    )
