"""Event-analytics operators: sequenced conversion funnel, cohort
retention, and volume anomaly detection — canonical product-analytics
shapes over an event stream (reference parity: the pgcp reference moves event tables between
warehouses; an analytics engine over the same data must answer these).

Both are pure relational compositions:

  - funnel: per-step conditional min-timestamp aggregation, each step
    constrained to happen strictly AFTER the previous step's first hit
    (a sequenced funnel, not a bag-of-events one). Every step is a
    groupBy(user) + join(user) — all exchanges share the user_id key, so
    AQE coalesces them onto one partitioning at scale.
  - cohort retention: first-activity week per user (one groupBy), distinct
    user-week activity (second groupBy), joined and re-aggregated into
    (cohort_week, week_offset) cells with a retention ratio against the
    cohort size.

Scale: everything keys on user_id or (cohort_week, offset) — cardinality
≤ |users| — with no self-join wider than the per-user step tables; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.plans.materialize import materialize
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table

# sequenced funnel stages over the events stream
FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "funnel_view_click_purchase",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY 1
),
counts AS (
  SELECT 1 AS step_idx, 'view' AS step, (SELECT COUNT(*) FROM s1) AS n_users
  UNION ALL
  SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
  UNION ALL
  SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
)
SELECT step_idx, step, CAST(n_users AS BIGINT) AS n_users,
       CAST(n_users AS DOUBLE)
         / LAG(n_users, 1, n_users) OVER (ORDER BY step_idx) AS conversion_from_prev
FROM counts
ORDER BY step_idx
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequenced conversion funnel view→click→purchase: a user counts for
    step N only with an event strictly after their first step-N−1 event.

    Each step is one conditional aggregation joined on user_id; the step
    tables are ≤ |users| rows, so the per-step joins are broadcast-sized
    long before the raw events are, and every exchange shares user_id.

    Scan discipline: s1 and s2 each feed TWO consumers (the next step's
    join and their own funnel count), and an unmaterialized cascade
    recomputes the whole chain per consumer — SIX type-filtered fact
    scans for a 3-step funnel, measured in the formatted plan. The
    user-level step tables are materialized (localCheckpoint, ≤ |users|
    narrow rows), so the fact is scanned exactly once per step, each
    scan with its event_type pushed to parquet (reading 3 disjoint
    type-slices beats materializing their union: row-group stats skip
    the rest of the fact).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .transform(materialize)
    )
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .transform(materialize)
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = None
    for idx, (step, df) in enumerate(zip(FUNNEL_STEPS, (s1, s2, s3)), start=1):
        row = df.agg(F.count("*").alias("n_users")).select(
            F.lit(idx).alias("step_idx"), F.lit(step).alias("step"), F.col("n_users").cast("long")
        )
        counts = row if counts is None else counts.unionAll(row)
    w = Window.orderBy("step_idx")
    # mirror the oracle's LAG(n, 1, n): the first step divides by itself
    # (1.0 whenever any user entered). try_divide, not /: a zero previous
    # step (possible whenever no user completes step 1 — empty lake, or a
    # lake with no 'view' events at all) must yield NULL like DuckDB's
    # division by zero, not an ANSI DIVIDE_BY_ZERO error.
    prev = F.lag("n_users", 1, None).over(w)
    return counts.withColumn(
        "conversion_from_prev",
        F.try_divide(
            F.col("n_users").cast("double"),
            F.coalesce(prev, F.col("n_users")).cast("double"),
        ),
    ).orderBy("step_idx")


@register(
    "cohort_weekly_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY 1
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS activity_week
  FROM events
),
sizes AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM first_seen GROUP BY 1),
cells AS (
  SELECT f.cohort_week,
         CAST(datediff('day', f.cohort_week, a.activity_week) / 7 AS BIGINT) AS week_offset,
         COUNT(*) AS n_active
  FROM first_seen f JOIN activity a ON f.user_id = a.user_id
  GROUP BY 1, 2
)
SELECT c.cohort_week, c.week_offset,
       CAST(c.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       CAST(c.n_active AS DOUBLE) / s.cohort_size AS retention
FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
ORDER BY c.cohort_week, c.week_offset
""",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week, each
    cohort's share of users still active N weeks later.

    ONE aggregation over events (the distinct user-week frame,
    materialized at ≤ |users|·|weeks| rows), then everything derives from
    it: first-seen is min(activity_week) per user — identical to
    date_trunc(week, min(ts)) because date_trunc is monotone — and the
    retention triangle is a reporting aggregate on (cohort_week, offset).
    The unmaterialized form re-scanned the fact three times (first_seen
    feeding both its consumers plus the activity pass, measured in the
    formatted plan); exchanges stay on user-sized keys.
    """
    ev = load_table(spark, sf_dir, "events")
    activity = (
        ev.select("user_id", F.date_trunc("week", "ts").alias("activity_week"))
        .distinct()
        .transform(materialize)
    )
    first_seen = activity.groupBy("user_id").agg(
        F.min("activity_week").alias("cohort_week")
    )
    sizes = first_seen.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    cells = (
        first_seen.join(activity, "user_id")
        .select(
            "cohort_week",
            (F.datediff("activity_week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
    )
    return (
        cells.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


ZSCORE_FLAG = 2.0  # |z| threshold for anomalous buckets


@register(
    "anomaly_hourly_event_zscore",
    oracle=f"""
WITH ev AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, value
  FROM events
),
hourly AS (
  SELECT event_type, bucket,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
  FROM ev GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         AVG(n_events) AS mean_n,
         stddev_samp(n_events) AS sd_n
  FROM hourly GROUP BY 1
)
SELECT h.event_type, h.bucket, CAST(h.n_events AS BIGINT) AS n_events, h.sum_value,
       ROUND((h.n_events - s.mean_n) / s.sd_n, 6) AS zscore,
       CAST(CASE WHEN ABS((h.n_events - s.mean_n) / s.sd_n) >= {ZSCORE_FLAG}
                 THEN 1 ELSE 0 END AS INT) AS is_anomalous
FROM hourly h JOIN stats s ON h.event_type = s.event_type
ORDER BY h.event_type, h.bucket
""",
)
def anomaly_hourly_event_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume anomaly detection: z-score of each (event_type, hour) bucket's
    event count against that type's own distribution, flagging |z| ≥ 2 —
    the monitoring query a pipeline runs over its own ingest stream.

    One hourly aggregate, one per-type moment aggregate (tiny — |types|
    rows, broadcast back), z-scores rounded to 1e-6 since mean/stddev
    accumulate in engine-specific order. At scale both aggregates
    partial-aggregate map-side; nothing holds more than |types × buckets|.
    """
    ev = load_table(spark, sf_dir, "events")
    # hourly feeds two branches (per-type moments + the final join) —
    # materialize the tiny |types × buckets| frame once instead of
    # re-aggregating the fact per branch
    hourly = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("bucket"), "value")
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .transform(materialize)
    )
    stats = hourly.groupBy("event_type").agg(
        F.avg("n_events").alias("mean_n"), F.stddev_samp("n_events").alias("sd_n")
    )
    # try_divide: a type with one bucket has sd_n NULL (sample stddev of
    # n=1) and identical-count buckets have sd_n = 0 — both mean the
    # z-score is undefined (NULL), and an undefined z is NOT an anomaly
    # (flag 0, same as the oracle's CASE falling through to ELSE)
    z = F.try_divide(F.col("n_events") - F.col("mean_n"), F.col("sd_n"))
    return (
        hourly.join(stats, "event_type")
        .select(
            "event_type",
            "bucket",
            F.col("n_events").cast("long").alias("n_events"),
            "sum_value",
            F.round(z, 6).alias("zscore"),
            F.coalesce((F.abs(z) >= ZSCORE_FLAG).cast("int"), F.lit(0)).alias(
                "is_anomalous"
            ),
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "markov_event_type_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events WHERE ts IS NOT NULL
),
trans AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
totals AS (SELECT prev_type, SUM(n) AS total FROM trans GROUP BY 1)
SELECT t.prev_type, t.next_type,
       CAST(t.n AS BIGINT) AS n_transitions,
       CAST(t.n AS DOUBLE) / tt.total AS p_next
FROM trans t JOIN totals tt ON t.prev_type = tt.prev_type
ORDER BY t.prev_type, t.next_type
""",
)
def markov_event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user stream:
    P(next | current) from lag-adjacent pairs — the sequence-model summary
    of behavioral data (and the bigram-statistics shape of sequence
    training data). (ts, event_id) orders ties deterministically so both
    engines see identical adjacency.

    One window pass partitioned by user (state = one previous row), one
    count aggregate on the 5×5 transition key, exact integer ratios.
    """
    from pyspark.sql import Window

    # event-time contract: sequence adjacency is undefined for NULL ts
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
    # trans feeds totals AND the final join — materialize the 25-row
    # transition frame once so the window+aggregate pipeline runs once
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
        .transform(materialize)
    )
    totals = trans.groupBy("prev_type").agg(F.sum("n").alias("total"))
    return (
        trans.join(totals, "prev_type")
        .select(
            "prev_type",
            "next_type",
            F.col("n").cast("long").alias("n_transitions"),
            (F.col("n").cast("double") / F.col("total")).alias("p_next"),
        )
        .orderBy("prev_type", "next_type")
    )


PATH_TOP_K = 20


@register(
    "path_top_event_sequences",
    oracle=f"""
WITH paths AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM events
  GROUP BY 1, 2
)
SELECT path,
       CAST(COUNT(*) AS BIGINT) AS n_user_days
FROM paths
GROUP BY path
ORDER BY n_user_days DESC, path
LIMIT {PATH_TOP_K}
""",
)
def path_top_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-day event paths ('view>click>purchase>…'): the path-analysis
    query behind journey dashboards, and the exact shape of sequence-dataset
    construction (events → ordered token string per example).

    One aggregate builds each user-day's ordered path ROW-LOCALLY
    (collect_list of (ts, event_id, type) structs, array_sort, project the
    type — no window, no second shuffle for ordering; ties broken by
    event_id so both engines see identical sequences), one counts paths,
    and the top-k is TakeOrderedAndProject with a path tiebreak.
    """
    ev = load_table(spark, sf_dir, "events")
    path = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ),
        ">",
    )
    return (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"), "ts", "event_id", "event_type")
        .groupBy("user_id", "day")
        .agg(path.alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n_user_days"))
        .orderBy(F.desc("n_user_days"), "path")
        .limit(PATH_TOP_K)
    )


_PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey")


@register(
    "profile_orders_columns",
    oracle=f"""
{" UNION ALL ".join(
    f'''SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM orders''' for c in ("o_orderstatus", "o_orderpriority", "o_custkey"))}
ORDER BY column_name
""",
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the data-quality DESCRIBE pass): row/null/distinct
    counts and min/max per profiled column, stacked one row per column.

    ONE scan computes every column's aggregates side by side (Spark fuses
    the per-column aggs into a single hash-aggregate pass over the fact),
    then melting wide→long is a single explode of a struct array over the
    1-row aggregate: one Project + one Generate node however many columns
    are profiled (a per-column union would build an N-leg plan — a
    500-column table must not mean a 500-leg union), and the table pass
    stays single — the way a 100 TB profiler must work.
    """
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    melted = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.col(f"{c}__rows").cast("long").alias("n_rows"),
                    F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
                    F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
                    F.col(f"{c}__min").alias("min_value"),
                    F.col(f"{c}__max").alias("max_value"),
                )
                for c in _PROFILE_COLS
            ]
        )
    )
    return wide.select(melted.alias("p")).select("p.*").orderBy("column_name")


@register(
    "analytics_conversion_ztest",
    oracle="""
WITH ev AS (
  SELECT c.c_mktsegment AS segment,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_conv
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
  GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_events) AS BIGINT) AS all_events,
         CAST(SUM(n_conv) AS BIGINT) AS all_conv
  FROM ev
)
SELECT ev.segment, ev.n_events, ev.n_conv,
       CAST(ev.n_conv AS DOUBLE) / ev.n_events AS p_seg,
       CASE WHEN tot.all_events - ev.n_events > 0
            THEN CAST(tot.all_conv - ev.n_conv AS DOUBLE) / (tot.all_events - ev.n_events)
            END AS p_rest,
       CASE WHEN tot.all_events - ev.n_events > 0
            THEN (CAST(ev.n_conv AS DOUBLE) / ev.n_events
                  - CAST(tot.all_conv - ev.n_conv AS DOUBLE) / (tot.all_events - ev.n_events))
                 / sqrt((CAST(tot.all_conv AS DOUBLE) / tot.all_events)
                        * (1.0 - CAST(tot.all_conv AS DOUBLE) / tot.all_events)
                        * (1.0 / ev.n_events + 1.0 / (tot.all_events - ev.n_events)))
            END AS z_score
FROM ev CROSS JOIN tot
ORDER BY ev.segment
""",
)
def analytics_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test per customer segment: is this segment's
    purchase-conversion rate significantly different from the rest of the
    population? The standard A/B-readout statistic (pooled proportion,
    normal approximation), computed from exact integer counts.

    Cross-engine exactness without tolerance: counts are integers, each
    ratio is one binary64 division, and the z expression contains no
    multiply-feeding-add shape a compiler could contract to an FMA; IEEE
    754 requires correctly-rounded sqrt, so both engines produce the same
    bits. A single-segment input makes the rest-of-population empty
    (rest_events = 0); p_rest and z_score are NULL then on both sides
    rather than an engine-specific 0/0. Scale: one fact aggregate keyed
    on segment (customer joins in broadcast-eligible), one single-row
    total broadcast back — the same two-aggregate profile as the mix
    rebalancer.
    """
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    ev = (
        e.join(c, e.user_id == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_conv"),
        )
    )
    tot = ev.agg(
        F.sum("n_events").cast("long").alias("all_events"),
        F.sum("n_conv").cast("long").alias("all_conv"),
    )
    p_seg = F.col("n_conv").cast("double") / F.col("n_events")
    rest_events = F.col("all_events") - F.col("n_events")
    p_rest = (F.col("all_conv") - F.col("n_conv")).cast("double") / rest_events
    pool = F.col("all_conv").cast("double") / F.col("all_events")
    z = (p_seg - p_rest) / F.sqrt(
        pool * (F.lit(1.0) - pool)
        * (F.lit(1.0) / F.col("n_events") + F.lit(1.0) / rest_events)
    )
    defined = rest_events > 0  # single-segment input: no rest-population
    return (
        ev.crossJoin(F.broadcast(tot))
        .select(
            "segment",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_conv").cast("long").alias("n_conv"),
            p_seg.alias("p_seg"),
            F.when(defined, p_rest).alias("p_rest"),
            F.when(defined, z).alias("z_score"),
        )
        .orderBy("segment")
    )


@register(
    "analytics_chisq_segment_event_type",
    oracle="""
WITH obs AS (
  SELECT c.c_mktsegment AS segment, e.event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
  GROUP BY 1, 2
),
rt AS (SELECT segment, CAST(SUM(n) AS BIGINT) AS row_tot FROM obs GROUP BY 1),
ct AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS col_tot FROM obs GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS grand FROM obs),
terms AS (
  SELECT ((CAST(o.n AS HUGEINT) * CAST(tot.grand AS HUGEINT)
           - CAST(rt.row_tot AS HUGEINT) * CAST(ct.col_tot AS HUGEINT))
          * (CAST(o.n AS HUGEINT) * CAST(tot.grand AS HUGEINT)
             - CAST(rt.row_tot AS HUGEINT) * CAST(ct.col_tot AS HUGEINT))
          * CAST(1000000000 AS HUGEINT))
         // (CAST(tot.grand AS HUGEINT) * CAST(rt.row_tot AS HUGEINT)
             * CAST(ct.col_tot AS HUGEINT)) AS t_fixed
  FROM obs o JOIN rt USING (segment) JOIN ct USING (event_type) CROSS JOIN tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(t_fixed) AS DOUBLE) / 1e9 AS chi2
FROM terms
""",
)
def analytics_chisq_segment_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of segment × event_type — is event
    mix independent of customer segment? (The categorical counterpart of
    the conversion z-test.)

    Cross-engine determinism WITHOUT a rounding tolerance: each cell term
    (n − E)²/E with E = row·col/grand is rewritten over exact integers as
    (n·grand − row·col)² / (grand·row·col), floor-divided at 1e-9 fixed
    point in 128-bit integer arithmetic (Spark DECIMAL(38,0) `div`,
    DuckDB HUGEINT `//` — verified to agree), SUMMED as exact integers
    (order-independent, unlike a float Σ whose association order is
    engine-specific), and divided by 1e9 once at the end. The statistic
    is thus defined to 1e-9-per-cell fixed point and bit-identical across
    engines. Bounds at ≤ sf1 (events ≤ ~1e6 rows): |n·grand − row·col| ≤
    grand² = 1e12, so the scaled square ≤ 1e33 < 10^38 (both engines'
    128-bit ceiling) and the summed fixed-point value < 2^53 (exact as
    double).

    Scale: one fact aggregate on (segment, type) — a |segments × types|
    grid, materialized once (localCheckpoint): it feeds FOUR consumers
    (row margins, column margins, grand total, and the terms join), and
    the unmaterialized form recomputed the events⋈customer aggregate per
    consumer — four full fact passes, measured in the formatted plan.
    Margins and the scalar statistic then run over the tiny grid.
    """
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    obs = (
        e.join(c, e.user_id == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "event_type")
        .agg(F.count("*").alias("n"))
        .transform(materialize)
    )
    rt = obs.groupBy("segment").agg(F.sum("n").cast("long").alias("row_tot"))
    ct = obs.groupBy("event_type").agg(F.sum("n").cast("long").alias("col_tot"))
    tot = obs.agg(F.sum("n").cast("long").alias("grand"))
    d = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    diff = d("n") * d("grand") - d("row_tot") * d("col_tot")
    num = diff * diff * F.lit(1_000_000_000).cast("decimal(38,0)")
    den = d("grand") * d("row_tot") * d("col_tot")
    terms = (
        obs.join(rt, "segment")
        .join(ct, "event_type")
        .crossJoin(F.broadcast(tot))
        .select(num.alias("num"), den.alias("den"))
        .selectExpr("num div den AS t_fixed")
    )
    return terms.agg(
        F.count("*").cast("long").alias("n_cells"),
        (F.sum("t_fixed").cast("double") / F.lit(1e9)).alias("chi2"),
    )
