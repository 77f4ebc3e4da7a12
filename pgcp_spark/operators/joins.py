"""Join operators: equi (broadcast + shuffle), outer, semi, anti, range.

Extension layer (SURVEY.md §2b): pgcp has no joins; PostgreSQL executed them
via the CTAS seam (postgres.rb:80-91). Spark-first design notes:

  - Small dims are broadcast (`F.broadcast`) so the fact side never shuffles.
  - The orders⋈lineitem equi-join shuffles both sides on orderkey — at 100 TB
    this is the join to co-locate via bucketing; AQE handles skew splits.
  - The range join keeps an equi-conjunct (same orderkey) so Catalyst plans a
    sort-merge/hash join with a residual predicate instead of a BNLJ.

Skew decision rule (measured — tools/skew_bench.py + the round-6 AQE pin in
tests/test_edge_lakes.py; numbers in SCALE.md "manual salting on a hot
key"). When a join key is hot, in order of preference:

  1. **Broadcast the other side** if it fits executor memory: no shuffle on
     the skewed side at all, skew becomes irrelevant.
  2. **Rely on AQE skew-join** (the default path) when ALL of:
       (a) the join is the top consumer of its shuffle — no co-partitioned
           aggregation/window on the JOIN KEY directly above it (AQE
           declines to split when the split would break a required child
           distribution: measured, the join→same-key-agg plan got no
           rescue while the bare join got 4.1×);
       (b) the skewed side's shuffle has MANY map tasks — AQE splits a
           reduce partition along map-output boundaries, so a single-file
           (single-map) input is unsplittable no matter the thresholds
           (measured: the round-6 pin only fires on the multi-file lake
           layout); true for any real multi-file lake table;
       (c) `skewedPartitionThresholdInBytes` is sized to real shuffle
           partitions — the 256 MB default never fires at bench scale
           (and quietly under-fires on compressed shuffles at any scale).
  3. **Salt manually** (`join_salted_skew_events_per_user`'s pattern:
     explode the dim side ×SALT_BUCKETS, spray the fact side) when (a)
     fails — aggregation directly on the join key above the join — or when
     the engine's runtime re-plan is unavailable (streaming joins, AQE
     off). Salting is a 2.0× measured win on the bot-account shape and
     scales with bucket count; its cost (dim replication) is why it is not
     the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.operators._decimal import dsum, sql_dsum
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table


@register(
    "join_customer_nation_region",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
ORDER BY c.c_custkey
""",
)
def join_customer_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi-join chain: fact side never shuffles (both dims are
    broadcast; check: plan shows two BroadcastHashJoin, zero Exchange on
    customer)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
        .orderBy("c_custkey")
    )


@register(
    "join_left_outer_order_counts",
    oracle="""
SELECT c.c_custkey,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spent
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
ORDER BY c.c_custkey
""",
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders (COUNT(col)
    skips nulls; SUM coalesced to 0 so both engines agree)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer_supplier_part_usage",
    oracle="""
SELECT s.s_suppkey, u.l_suppkey AS used_suppkey, s.s_name,
       COALESCE(u.n_lines, 0) AS n_lines
FROM supplier s
FULL OUTER JOIN (
    SELECT l_suppkey, COUNT(*) AS n_lines FROM lineitem WHERE l_quantity > 45 GROUP BY l_suppkey
) u ON s.s_suppkey = u.l_suppkey
ORDER BY s.s_suppkey NULLS LAST, used_suppkey NULLS LAST
""",
)
def join_full_outer_supplier_part_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: suppliers with no high-quantity lines and vice versa
    both survive with nulls."""
    s = load_table(spark, sf_dir, "supplier")
    u = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_lines"))
    )
    return (
        s.join(u, s.s_suppkey == u.l_suppkey, "full_outer")
        .select(
            "s_suppkey",
            F.col("l_suppkey").alias("used_suppkey"),
            "s_name",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        )
        .orderBy(F.asc_nulls_last("s_suppkey"), F.asc_nulls_last("used_suppkey"))
    )


@register(
    "join_semi_customers_with_urgent_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
""",
)
def join_semi_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS: no row multiplication, probe side streamed."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "join_anti_parts_never_shipped",
    oracle="""
SELECT p_partkey, p_name, p_brand
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49
)
ORDER BY p_partkey
""",
)
def join_anti_parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS: parts never shipped in near-max
    quantity (the quantity filter keeps the result non-empty at every sf)."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        p.join(l, p.p_partkey == l.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


@register(
    "join_range_events_near_order",
    oracle="""
SELECT o.o_orderkey, COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM orders o
JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts <  o.o_orderdate + INTERVAL 10950 DAY
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
""",
)
def join_range_events_near_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta join with an equi-conjunct: events by the order's customer
    within a time window after the order date. The user_id=custkey equality
    lets Catalyst use a hash join with the range as residual predicate —
    never a broadcast-nested-loop. (Events are 2024; orders 1995-2001, so the
    30-year window makes the result non-empty on synthetic data.)"""
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    cond = (
        (e.user_id == o.o_custkey)
        & (e.ts >= o.o_orderdate)
        & (e.ts < o.o_orderdate + F.expr("INTERVAL 10950 DAY"))
    )
    return (
        o.join(e, cond)
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .orderBy("o_orderkey")
    )


@register(
    "join_partsupp_revenue",
    oracle=f"""
SELECT p.p_brand, s.s_name,
       COUNT(*) AS n_lines,
       {sql_dsum("l.l_extendedprice")} AS sum_price
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY p.p_brand, s.s_name
ORDER BY p_brand, s_name
""",
)
def join_partsupp_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two broadcast joins into the fact table, then aggregate — the
    canonical star-schema pattern (fact shuffles once, on the group keys)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(F.count("*").alias("n_lines"), dsum("l_extendedprice").alias("sum_price"))
        .orderBy("p_brand", "s_name")
    )


@register(
    "join_cross_grid_nation_priority",
    oracle="""
WITH grid AS (
  SELECT n.n_nationkey, n.n_name, p.o_orderpriority
  FROM nation n CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
),
counts AS (
  SELECT c.c_nationkey, o.o_orderpriority, COUNT(*) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT g.n_nationkey, g.n_name, g.o_orderpriority, COALESCE(cn.n, 0) AS n_orders
FROM grid g LEFT JOIN counts cn
  ON g.n_nationkey = cn.c_nationkey AND g.o_orderpriority = cn.o_orderpriority
ORDER BY g.n_nationkey, g.o_orderpriority
""",
)
def join_cross_grid_nation_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN: the dense-grid pattern (every nation × every
    priority, zero-filled) so downstream consumers see no missing cells.

    Scale: cross joins are only ever safe dim × dim — here 25 × 5 rows. The
    fact-side counts aggregate BEFORE joining the grid, so the cross product
    never touches fact cardinality."""
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    prios = o.select("o_orderpriority").distinct()
    grid = n.select("n_nationkey", "n_name").crossJoin(prios)
    counts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    return (
        grid.join(
            counts,
            (grid.n_nationkey == counts.c_nationkey)
            & (grid.o_orderpriority == counts.o_orderpriority),
            "left",
        )
        .select(
            "n_nationkey",
            "n_name",
            grid.o_orderpriority,
            F.coalesce(counts.n, F.lit(0)).alias("n_orders"),
        )
        .orderBy("n_nationkey", "o_orderpriority")
    )


@register(
    "join_asof_click_attribution",
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM ev WHERE event_type = 'click' GROUP BY 1, 2
),
purch AS (
  SELECT event_id AS purchase_id, user_id, ts FROM ev WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, p.ts, c.click_id AS attributed_click
FROM purch p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY purchase_id
""",
)
def join_asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (Spark has no native one): attribute each purchase to the
    user's most recent click at-or-before it.

    Spark-first implementation — the union-and-carry-forward technique:
    stack both sides into one frame tagged by side, sort within user by
    (ts, side), and carry the last non-null click forward with a
    last(ignorenulls) running window. ONE shuffle on user_id and linear
    work — versus the naive inequality join which is quadratic per user.
    Clicks are pre-deduped to one per (user, instant) (max event_id, the
    same tiebreak DuckDB's ASOF sees) so the match is deterministic.
    """
    from pyspark.sql import Window

    # as-of contract: attribution needs an entity key and an event time —
    # a NULL user_id can never satisfy the ASOF equality (p.user_id =
    # c.user_id is NULL), and a NULL ts can never satisfy the inequality,
    # so both are filtered identically on the oracle side
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select(
            "user_id",
            "ts",
            "click_id",
            F.lit(None).cast("long").alias("purchase_id"),
            F.lit(0).alias("side"),
        )
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("side"),
    )
    # side 0 (click) sorts before side 1 (purchase) at equal ts → the >= of
    # an inclusive as-of
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purch)
        .withColumn("attributed_click", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("purchase_id", "user_id", "ts", "attributed_click")
        .orderBy("purchase_id")
    )


BAND_SECONDS = 30


@register(
    "join_band_time_bucketed",
    oracle=f"""
WITH ev AS (
  SELECT event_id, event_type, user_id,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
  FROM events
),
e AS (SELECT * FROM ev WHERE event_type = 'error' AND event_id % 10 = 0),
p AS (SELECT * FROM ev WHERE event_type = 'purchase')
SELECT e.event_id AS error_id, p.event_id AS purchase_id,
       CAST(date_diff('microsecond', e.ts, p.ts) AS BIGINT) AS gap_us
FROM e JOIN p
  ON p.ts BETWEEN e.ts - INTERVAL {BAND_SECONDS} SECOND
              AND e.ts + INTERVAL {BAND_SECONDS} SECOND
ORDER BY error_id, purchase_id
""",
)
def join_band_time_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join with NO equi key (purchases within ±30s of sampled
    errors, across all users), made scalable by time-bucketing: each side
    gets bucket = floor(ts / band); the probe side explodes into its
    bucket and both neighbors, the join runs on bucket EQUALITY, and the
    exact band predicate filters residually.

    A raw inequality join is a broadcast nested loop — O(|A|·|B|)
    comparisons. Bucketing bounds candidates to the ±1-bucket
    neighborhood, so work is proportional to true pair density. Same
    trick generalizes to numeric bands and geo grids.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        # TIMESTAMP_NTZ-written lakes (e.g. DuckDB) break unix_micros;
        # the cast is value-exact under the session's UTC timezone
        F.col("ts").cast("timestamp").alias("ts"),
    )
    bucket = (F.unix_micros("ts") / F.lit(BAND_SECONDS * 1_000_000)).cast("long")
    err = (
        ev.filter((F.col("event_type") == "error") & (F.col("event_id") % 10 == 0))
        .select(
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("e_ts"),
            F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bk"),
        )
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        bucket.alias("bk"),
    )
    band = F.lit(BAND_SECONDS * 1_000_000).cast("long")
    gap = F.unix_micros("p_ts") - F.unix_micros("e_ts")
    return (
        err.join(pur, "bk")
        .filter((gap >= -band) & (gap <= band))
        .select("error_id", "purchase_id", gap.alias("gap_us"))
        .distinct()  # a pair can meet in up to 2 neighboring buckets
        .orderBy("error_id", "purchase_id")
    )


@register(
    "join_asof_forward_next_view",
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
views AS (
  SELECT user_id, ts, MIN(event_id) AS view_id
  FROM ev WHERE event_type = 'view' GROUP BY 1, 2
),
purch AS (
  SELECT event_id AS purchase_id, user_id, ts FROM ev WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, p.ts, v.view_id AS next_view
FROM purch p ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND v.ts > p.ts
ORDER BY purchase_id
""",
)
def join_asof_forward_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase matched to the user's first view
    event STRICTLY AFTER it (post-purchase behavior attribution) — the
    mirror of the backward as-of.

    Same union-and-carry technique as join_asof_click_attribution, one
    shuffle on user_id, linear per-user work. The carry is expressed as a
    RUNNING frame over a DESCENDING (ts, side) sort — last(ignorenulls)
    over (unboundedPreceding → currentRow) — NOT as first() over a
    (currentRow → unboundedFollowing) frame: Spark evaluates running
    frames incrementally (O(rows) per partition) but re-scans an
    UnboundedFollowing frame from scratch for every row (O(rows²) —
    measured 14× on a lake where one user owns half the events; the skew
    sweep that caught it is pinned in tests/test_edge_lakes.py). Under
    the descending sort a purchase's frame holds exactly the rows with
    ts > its own (same-instant views order AFTER the purchase, desc side
    puts side=1 first), and last(ignorenulls) walks back from the frame
    end to the SMALLEST view ts above it — the strict `>` forward match
    DuckDB's ASOF applies. Views pre-deduped to one per (user, instant)
    by MIN event_id (the tiebreak DuckDB's ASOF sees).
    """
    from pyspark.sql import Window

    # same entity/time contract as join_asof_click_attribution
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("view_id"))
        .select(
            "user_id",
            "ts",
            "view_id",
            F.lit(None).cast("long").alias("purchase_id"),
            F.lit(0).alias("side"),
        )
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("view_id"),
        F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        views.unionByName(purch)
        .withColumn("next_view", F.last("view_id", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("purchase_id", "user_id", "ts", "next_view")
        .orderBy("purchase_id")
    )
