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


@register(
    "timeseries_interarrival_gap_stats",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts,
         event_id
  FROM events WHERE ts IS NOT NULL
),
gaps AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM ev
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_gap_us,
       quantile_cont(gap_us, 0.5) AS median_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
)
def timeseries_interarrival_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type: gap from each event
    to the SAME USER's previous event (any type), aggregated by the type of
    the arriving event — the latency/cadence profile behind session-gap and
    rate-limit tuning.

    Gaps are integer microseconds (exact in both engines after the µs
    truncation convention); the mean divides two exact integers once in
    double, and the median interpolates integers at the binary-exact 0.5
    fraction — no rounding tolerance anywhere. One window pass on user_id,
    one aggregate on event_type."""
    from pyspark.sql import Window

    # event-time contract: NULL ts has no position in an arrival sequence
    # (and NULL window sort keys also trigger nondeterministic DuckDB
    # parallel-window output, so the oracle filters identically)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .withColumn(
            # unix_micros rejects TIMESTAMP_NTZ (how events.ts reads back
            # under this Spark); the cast to LTZ is value-exact under the
            # UTC session timezone — same as windows.py:324 / joins.py:380.
            "ts",
            F.col("ts").cast("timestamp"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            (F.sum("gap_us").cast("double") / F.count("*")).alias("avg_gap_us"),
            F.expr("percentile(gap_us, 0.5)").alias("median_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .select("event_type", "n_gaps", "avg_gap_us", "median_gap_us",
                F.col("max_gap_us").cast("long").alias("max_gap_us"))
        .orderBy("event_type")
    )


@register(
    "scd2_user_state_history",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts, event_id
  FROM events WHERE ts IS NOT NULL
),
changes AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM ev
),
versions AS (
  SELECT user_id, event_type AS state, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
  FROM changes
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, state, valid_from, valid_to, version
FROM versions
ORDER BY user_id, version
""",
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) history from the event stream:
    collapse each user's consecutive same-type events into versioned
    validity intervals [valid_from, valid_to) — the dimension-table build
    every warehouse runs on CDC feeds; the open current version has
    valid_to NULL.

    Two window passes over the same (user_id, ts, event_id) ordering — the
    change filter and the interval/lead numbering share one sort-exchange;
    ties are event_id-broken so both engines emit identical intervals."""
    from pyspark.sql import Window

    # event-time contract: a NULL ts has no place in a validity timeline
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter((F.col("prev_type").isNull()) | (F.col("prev_type") != F.col("event_type")))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w2).alias("valid_to"),
            F.row_number().over(w2).cast("long").alias("version"),
        )
        .orderBy("user_id", "version")
    )


AS_OF_TS = "2024-01-15 00:00:00"


@register(
    "scd2_point_in_time_lookup",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts, event_id
  FROM events WHERE ts IS NOT NULL
),
changes AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM ev
),
versions AS (
  SELECT user_id, event_type AS state, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
  FROM changes
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, state, version
FROM versions
WHERE valid_from <= TIMESTAMP '{AS_OF_TS}'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '{AS_OF_TS}')
ORDER BY user_id
""",
)
def scd2_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (bitemporal AS OF) lookup over the SCD2 history: each
    user's state valid at the probe instant — the query pattern that makes
    Type-2 dimensions useful (reproduce any past join exactly).

    Composes the scd2 builder and filters the half-open intervals; at scale
    the interval predicate prunes to ≤1 row per user with no extra
    exchange beyond the history build itself."""
    hist = scd2_user_state_history(spark, sf_dir)
    as_of = F.lit(AS_OF_TS).cast("timestamp")
    return (
        hist.filter(
            (F.col("valid_from") <= as_of)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > as_of))
        )
        .select("user_id", "state", "version")
        .orderBy("user_id")
    )
