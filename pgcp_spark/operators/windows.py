"""Window-function operators: ranking, analytic (lag/lead), frames, ntile.

Extension layer (SURVEY.md §2b). Scale notes: every window here partitions by
a high-cardinality key (custkey/suppkey/orderkey) so state per partition
stays small; none uses a global (unpartitioned) window, which would funnel
100 TB through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgcp_spark.operators._decimal import dec
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table


@register(
    "window_top3_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
""",
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number window + filter (the distributed
    top-k pattern: one shuffle on the partition key, no global sort)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            dec("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("rn").cast("long").alias("rn"),
        )
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_rank_dense_rank_suppliers",
    oracle="""
SELECT l_suppkey, n_lines,
       RANK() OVER (ORDER BY n_lines DESC, l_suppkey) AS rnk,
       DENSE_RANK() OVER (ORDER BY n_lines DESC, l_suppkey) AS drnk
FROM (SELECT l_suppkey, COUNT(*) AS n_lines FROM lineitem GROUP BY l_suppkey)
ORDER BY rnk
""",
)
def window_rank_dense_rank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank over an aggregated input. The unpartitioned window is
    safe here because the input is one row per supplier (post-aggregation),
    not the raw fact table. SCALE NOTE: at 100× this is still a
    single-partition sort of the whole supplier dimension — the global
    rank IS the operator under demonstration (allowlisted in
    plans/width.py:WINDOW_ALLOWLIST); a production top-k wants
    ``orderBy().limit(k)`` (TakeOrderedAndProject — see
    operators/setops.py's top-k variants), and a full global ranking at
    dimension scale wants a partitioned two-pass rank."""
    l = load_table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_suppkey").agg(F.count("*").alias("n_lines"))
    w = Window.orderBy(F.desc("n_lines"), F.asc("l_suppkey"))
    return (
        agg.withColumn("rnk", F.rank().over(w).cast("long"))
        .withColumn("drnk", F.dense_rank().over(w).cast("long"))
        .orderBy("rnk")
    )


@register(
    "window_lag_lead_order_dates",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       LAG(o_orderdate) OVER w AS prev_date,
       LEAD(o_orderdate) OVER w AS next_date,
       CAST(DATE_DIFF('day', LAG(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
ORDER BY o_custkey, o_orderdate, o_orderkey
""",
)
def window_lag_lead_order_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: previous/next order date per customer and the
    day gap between consecutive orders."""
    o = load_table(spark, sf_dir, "orders")
    # o_orderdate is nullable: pin NULLS FIRST explicitly on both sides
    # (ANSI leaves default null ordering implementation-defined — Spark
    # defaults FIRST for ASC, DuckDB LAST, so an unpinned key diverges)
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc_nulls_first("o_orderdate"), "o_orderkey"
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.lag("o_orderdate").over(w).alias("prev_date"),
            F.lead("o_orderdate").over(w).alias("next_date"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            )
            .cast("long")
            .alias("days_since_prev"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@register(
    "window_running_total_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
""",
)
def window_running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum with an explicit ROWS frame (exact decimal inside the
    frame so the running values match the oracle bit-for-bit)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_first("o_orderdate"), "o_orderkey")  # pinned
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@register(
    "window_ntile_customer_value",
    oracle="""
SELECT quartile, COUNT(*) AS n_customers,
       CAST(MIN(CAST(total_spent AS DECIMAL(18,2))) AS DOUBLE) AS min_spent,
       CAST(MAX(CAST(total_spent AS DECIMAL(18,2))) AS DOUBLE) AS max_spent
FROM (
  SELECT o_custkey, total_spent,
         NTILE(4) OVER (ORDER BY total_spent DESC, o_custkey) AS quartile
  FROM (
    SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_spent
    FROM orders GROUP BY o_custkey
  )
)
GROUP BY quartile
ORDER BY quartile
""",
)
def window_ntile_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartiles of customer lifetime value, then per-quartile stats.
    (ntile runs on the small aggregated relation, not the fact table.)
    SCALE NOTE: still a single-partition sort of the customer dimension
    at 100× — ntile's contiguous-tiles contract is inherently global
    (allowlisted in plans/width.py:WINDOW_ALLOWLIST); at dimension scale
    compute quartile boundaries with approxQuantile / percentile_approx
    and assign tiles with a row-local CASE instead."""
    o = load_table(spark, sf_dir, "orders")
    spent = o.groupBy("o_custkey").agg(F.sum(dec("o_totalprice")).alias("total_spent"))
    w = Window.orderBy(F.desc("total_spent"), F.asc("o_custkey"))
    tiles = spent.withColumn("quartile", F.ntile(4).over(w).cast("long"))
    return (
        tiles.groupBy("quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min(F.col("total_spent").cast("decimal(18,2)")).cast("double").alias("min_spent"),
            F.max(F.col("total_spent").cast("decimal(18,2)")).cast("double").alias("max_spent"),
        )
        .orderBy("quartile")
    )


@register(
    "window_first_last_value",
    oracle="""
SELECT DISTINCT l_orderkey,
       FIRST_VALUE(l_partkey) OVER w AS first_part,
       LAST_VALUE(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_part,
       COUNT(*) OVER (PARTITION BY l_orderkey) AS n_lines
FROM lineitem
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey NULLS FIRST)
ORDER BY l_orderkey
""",
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with full-partition frame + count over
    partition (no ORDER BY → whole-partition frame)."""
    l = load_table(spark, sf_dir, "lineitem")
    # l_linenumber ties exist in the synthetic data — l_partkey tiebreak
    # makes first/last deterministic.
    w_ord = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", F.asc_nulls_first("l_partkey")
    )
    w_full = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_part = Window.partitionBy("l_orderkey")
    return (
        l.select(
            "l_orderkey",
            F.first("l_partkey").over(w_ord).alias("first_part"),
            F.last("l_partkey").over(w_full).alias("last_part"),
            F.count("*").over(w_part).alias("n_lines"),
        )
        .distinct()
        .orderBy("l_orderkey")
    )


@register(
    "window_range_frame_30day_revenue",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST
                  RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS trailing_30d_revenue
FROM orders
WHERE o_custkey < 200
ORDER BY o_custkey, o_orderdate, o_orderkey
""",
)
def window_range_frame_30day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a time axis: per-customer trailing-30-day revenue.

    Unlike a ROWS frame, RANGE bounds are data values — every order sums all
    orders whose date falls in [date-30d, date]. Spark expresses interval
    range frames via SQL window syntax (the DataFrame rangeBetween API takes
    only numeric offsets, so the window is declared in expr())."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    trailing = F.expr(
        """
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST
          RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)
        """
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_orderdate", trailing.alias("trailing_30d_revenue"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@register(
    "window_percent_rank_cume_dist",
    oracle="""
SELECT s_suppkey, s_acctbal,
       PERCENT_RANK() OVER (ORDER BY s_acctbal NULLS FIRST, s_suppkey) AS pct_rank,
       CUME_DIST() OVER (ORDER BY s_acctbal NULLS FIRST, s_suppkey) AS cume
FROM supplier
ORDER BY s_suppkey
""",
)
def window_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows (percent_rank, cume_dist) across the supplier
    balance ladder. The unpartitioned window is safe ONLY because supplier
    is a bounded dimension; fact-sized inputs must partition first (see
    module docstring). SCALE NOTE: single-partition sort of the supplier
    dimension at 100× — the global distribution IS the operator under
    demonstration (allowlisted in plans/width.py:WINDOW_ALLOWLIST); at
    scale, estimate the CDF with approxQuantile boundaries or rank
    within salted ranges and merge."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.asc_nulls_first("s_acctbal"), "s_suppkey")  # pinned
    return (
        s.select(
            "s_suppkey",
            "s_acctbal",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("s_suppkey")
    )


SESSION_GAP_MIN = 600  # minutes; events median inter-event gap ≈ 441 min


@register(
    "window_sessionize_events",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, value,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
  FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id, event_id, value, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > CAST({SESSION_GAP_MIN * 60 * 1_000_000} AS BIGINT)
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
),
sessions AS (
  SELECT user_id, event_id, value, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def window_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts when a
    user's inter-event gap exceeds SESSION_GAP_MIN; session ids are the
    running count of session starts (lag → flag → cumulative sum), then one
    aggregate per (user, session). The batch twin of
    ``streaming_session_windows``.

    Scale: both windows and the final groupBy share the same user_id
    partitioning — one shuffle on user_id total; everything after is
    partition-local. Micros-exact gap arithmetic (unix_micros) so the
    DuckDB oracle computes identical integers.
    """
    # event-time contract: a NULL event time cannot be sessionized
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull()).select(
        "user_id",
        "event_id",
        "value",
        # normalize TIMESTAMP_NTZ (e.g. DuckDB-written lakes) to TIMESTAMP:
        # unix_micros rejects NTZ, and the cast is value-exact under the
        # session's UTC timezone
        F.col("ts").cast("timestamp").alias("ts"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = (
        F.when(gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0)
    )
    sessions = e.withColumn(
        "session_id",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "window_running_distinct_priorities",
    oracle="""
SELECT o_custkey, o_orderkey,
       COUNT(DISTINCT o_orderpriority) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS distinct_prios_so_far
FROM orders
""",
)
def window_running_distinct_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate over a window (COUNT(DISTINCT) OVER).

    Spark has no native distinct window aggregate; the idiomatic rewrite is
    size(collect_set() OVER frame), which is exact and deterministic under a
    ROWS frame with a total order (o_orderdate, o_orderkey). Per-row state is
    the distinct set within one partition's frame -- bounded here by the 5
    priority values, not the row count -- and the whole query is the same
    single custkey shuffle as any other window, so the shape survives scale.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_first("o_orderdate"), "o_orderkey")  # pinned
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.size(F.collect_set("o_orderpriority").over(w)).cast("long").alias("distinct_prios_so_far"),
    )
