"""Aggregation operators: hash aggregate, distinct counts, rollup/cube,
having, approximate aggregates.

Reference parity note: pgcp itself has no aggregation (SURVEY.md §2a "does
NOT have"); these are the extension-layer operators (§2b) replacing the SQL
the reference would push into PostgreSQL via CTAS (postgres.rb:80-91).

Scale notes: all groupBys here partial-aggregate map-side before one shuffle
on the group keys; rollup/cube expand grouping sets before the same single
shuffle. approx_count_distinct is the 100 TB path for distinct counts (HLL,
no per-key state explosion) and is registered rows-only because DuckDB's
approx algorithm differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.operators._ansi_empty import with_empty_grand_total
from pgcp_spark.operators._decimal import dec, dsum, sql_dsum
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table


@register(
    "agg_orders_by_status_priority",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       {sql_dsum("o_totalprice")} AS sum_total,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_total,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_total
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
""",
)
def agg_orders_by_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with count / count-distinct / sum / min / max."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            dsum("o_totalprice").alias("sum_total"),
            F.min(dec("o_totalprice")).cast("double").alias("min_total"),
            F.max(dec("o_totalprice")).cast("double").alias("max_total"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@register(
    "agg_rollup_region_nation",
    oracle="""
SELECT r.r_name, n.n_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
""",
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy (subtotals + grand total)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    agg = joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        dsum("c_acctbal").alias("sum_acctbal"),
    )
    return with_empty_grand_total(agg, joined, {"n_customers": 0}).orderBy(
        F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name")
    )


@register(
    "agg_cube_returnflag_linestatus",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {sql_dsum("l_quantity")} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def agg_cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations of (returnflag, linestatus)."""
    l = load_table(spark, sf_dir, "lineitem")
    agg = l.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"), dsum("l_quantity").alias("sum_qty")
    )
    return with_empty_grand_total(agg, l, {"n_items": 0}).orderBy(
        F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus")
    )


@register(
    "agg_having_big_customers",
    oracle="""
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 12
ORDER BY total_spent DESC, o_custkey
""",
)
def agg_having_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_spent"))
        .filter(F.col("n_orders") >= 12)
        .orderBy(F.desc("total_spent"), "o_custkey")
    )


@register(
    "agg_distinct_parts_per_supplier",
    oracle="""
SELECT l_suppkey,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
""",
)
def agg_distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (expand-based plan)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("l_suppkey")
    )


@register(
    "agg_approx_distinct_customers",
    oracle=None,  # HLL sketch: algorithm-specific, driver records rows-only
    doc="approx_count_distinct (HLL) — the 100 TB path for distinct counts",
)
def agg_approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct estimate per order priority (rows-only check;
    exactness cross-checked in tests against the true distinct within 5%)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"))
        .orderBy("o_orderpriority")
    )


@register(
    "agg_avg_order_gap_days",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def agg_avg_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp min/max aggregates (temporal extremes per group)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_histogram_order_value",
    oracle="""
SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price
FROM orders
GROUP BY 1
ORDER BY 1
""",
)
def agg_histogram_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via integer bucketing (floor-divide), the
    shuffle-one-row-per-bucket pattern — the distributed histogram that
    works at any scale (bucket count is data-independent)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min(dec("o_totalprice")).cast("double").alias("min_price"),
            F.max(dec("o_totalprice")).cast("double").alias("max_price"),
        )
        .orderBy("bucket")
    )


@register(
    "agg_stats_correlation",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         SUM(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                  THEN CAST(1 AS DECIMAL(38,0)) ELSE 0 END) AS np,
         SUM(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                  THEN CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0)) ELSE 0 END) AS sx,
         SUM(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                  THEN CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0)) ELSE 0 END) AS sy,
         SUM(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                  THEN CAST(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0)) ELSE 0 END) AS sxx,
         SUM(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                  THEN CAST(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0)) ELSE 0 END) AS syy,
         SUM(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                  THEN CAST(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0)) ELSE 0 END) AS sxy,
         SUM(CASE WHEN l_quantity IS NOT NULL THEN CAST(1 AS DECIMAL(38,0)) ELSE 0 END) AS nx,
         SUM(CASE WHEN l_quantity IS NOT NULL
                  THEN CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0)) ELSE 0 END) AS qsx,
         SUM(CASE WHEN l_quantity IS NOT NULL
                  THEN CAST(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0)) ELSE 0 END) AS qsxx,
         SUM(CASE WHEN l_discount IS NOT NULL THEN CAST(1 AS DECIMAL(38,0)) ELSE 0 END) AS nd,
         SUM(CASE WHEN l_discount IS NOT NULL
                  THEN CAST(CAST(round(l_discount * 100) AS BIGINT) AS DECIMAL(38,0)) ELSE 0 END) AS dsx,
         SUM(CASE WHEN l_discount IS NOT NULL
                  THEN CAST(CAST(round(l_discount * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT) AS DECIMAL(38,0)) ELSE 0 END) AS dsxx
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(np * sxy - sx * sy AS DOUBLE)
         / NULLIF(sqrt(CAST(np * sxx - sx * sx AS DOUBLE) * CAST(np * syy - sy * sy AS DOUBLE)), 0)
         AS qty_price_corr,
       CAST(np * sxy - sx * sy AS DOUBLE) / NULLIF(CAST(np * (np - 1) AS DOUBLE), 0) / 10000.0
         AS qty_price_covar,
       sqrt(CAST(nx * qsxx - qsx * qsx AS DOUBLE) / NULLIF(CAST(nx * (nx - 1) AS DOUBLE), 0)) / 100.0
         AS qty_stddev,
       CAST(nd * dsxx - dsx * dsx AS DOUBLE) / NULLIF(CAST(nd * (nd - 1) AS DOUBLE), 0) / 10000.0
         AS disc_var
FROM s
ORDER BY l_returnflag
""",
)
def agg_stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / covar / stddev / variance) — the
    profiling pass of a data pipeline — with sample semantics and the
    repo's exactness discipline: all moments are integer-cents
    DECIMAL(38,0) sums (associative, partial-aggregatable, one shuffle),
    and only the final ratio / sqrt runs in IEEE double with an identical
    op sequence on both engines, so results are BIT-exact with no rounding
    tolerance. Native F.corr/covar accumulate co-moments in
    engine-specific order AND F.corr raises an ANSI DIVIDE_BY_ZERO on a
    zero-variance (constant) group; here a zero-variance or n<2 group is
    NULL, matching SQL semantics. Pairwise (x,y) moments use only rows
    with BOTH sides non-NULL (corr/covar semantics); per-column moments
    skip their own NULLs (stddev/var semantics).
    """
    l = load_table(spark, sf_dir, "lineitem")
    dec38 = "decimal(38,0)"
    xc = F.round(F.col("l_quantity") * 100).cast("long")
    yc = F.round(F.col("l_extendedprice") * 100).cast("long")
    dc = F.round(F.col("l_discount") * 100).cast("long")
    pair = F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    qn = F.col("l_quantity").isNotNull()
    dn = F.col("l_discount").isNotNull()

    def csum(cond, expr):
        return F.sum(F.when(cond, expr).otherwise(F.lit(0)).cast(dec38))

    s = l.groupBy("l_returnflag").agg(
        csum(pair, F.lit(1)).alias("np"),
        csum(pair, xc).alias("sx"),
        csum(pair, yc).alias("sy"),
        csum(pair, xc * xc).alias("sxx"),
        csum(pair, yc * yc).alias("syy"),
        csum(pair, xc * yc).alias("sxy"),
        csum(qn, F.lit(1)).alias("nx"),
        csum(qn, xc).alias("qsx"),
        csum(qn, xc * xc).alias("qsxx"),
        csum(dn, F.lit(1)).alias("nd"),
        csum(dn, dc).alias("dsx"),
        csum(dn, dc * dc).alias("dsxx"),
    )
    np_, sx, sy = F.col("np"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    nx, qsx, qsxx = F.col("nx"), F.col("qsx"), F.col("qsxx")
    nd, dsx, dsxx = F.col("nd"), F.col("dsx"), F.col("dsxx")
    corr = F.try_divide(
        (np_ * sxy - sx * sy).cast("double"),
        F.sqrt(
            (np_ * sxx - sx * sx).cast("double") * (np_ * syy - sy * sy).cast("double")
        ),
    )
    covar = (
        F.try_divide((np_ * sxy - sx * sy).cast("double"), (np_ * (np_ - 1)).cast("double"))
        / F.lit(10000.0)
    )
    stddev = (
        F.sqrt(
            F.try_divide(
                (nx * qsxx - qsx * qsx).cast("double"), (nx * (nx - 1)).cast("double")
            )
        )
        / F.lit(100.0)
    )
    var_d = (
        F.try_divide((nd * dsxx - dsx * dsx).cast("double"), (nd * (nd - 1)).cast("double"))
        / F.lit(10000.0)
    )
    return s.select(
        "l_returnflag",
        corr.alias("qty_price_corr"),
        covar.alias("qty_price_covar"),
        stddev.alias("qty_stddev"),
        var_d.alias("disc_var"),
    ).orderBy("l_returnflag")


@register(
    "agg_collect_sorted_priorities",
    oracle="""
SELECT o_orderstatus,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(*) AS n_rows
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def agg_collect_sorted_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation: collect_set -> array_sort -> concat_ws.

    The deterministic LISTAGG/string_agg shape (reference has no aggregation
    at all -- SURVEY.md s2b extension). collect_set partial-aggregates
    map-side like any other aggregate, and per-group state is bounded by the
    distinct-value count (5 priorities), not the row count, so the single
    shuffle on the group key carries tiny sets at any data scale. Sorting the
    array before concatenation makes the result order-insensitive and
    cross-engine exact.
    """
    o = load_table(spark, sf_dir, "orders")
    prios = F.array_sort(F.collect_set("o_orderpriority"))
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.concat_ws(",", prios).alias("priorities"),
            F.size(prios).alias("n_priorities"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_bool_flags_per_segment",
    oracle="""
SELECT c_mktsegment,
       CAST(bool_and(c_acctbal > 0) AS INT)   AS all_positive_bal,
       CAST(bool_or(c_acctbal < -900) AS INT) AS any_deep_debt,
       CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_negative,
       COUNT(*)                     AS n_rows
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def agg_bool_flags_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean / conditional aggregates: bool_and, bool_or, count_if.

    The data-quality assertion shape of a corpus pipeline ("every row in the
    group satisfies P / at least one violates Q / how many"). All three are
    decomposable one-bit-or-counter states, so they partial-aggregate
    map-side and the single group-key shuffle carries constant-size state
    regardless of row count.
    """
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.bool_and(F.col("c_acctbal") > 0).cast("int").alias("all_positive_bal"),
            F.bool_or(F.col("c_acctbal") < -900).cast("int").alias("any_deep_debt"),
            F.count_if(F.col("c_acctbal") < 0).alias("n_negative"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_grouping_id_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
       COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def agg_grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicator columns over a rollup: consumers of multi-level
    aggregates need to tell a real NULL key from a rollup-total row — the
    grouping flags are the only sound way (the reference's CTAS seam pushes
    such SQL verbatim; here it is first-class DataFrame API).

    Scale: same single Expand+shuffle as any rollup; the flags are
    metadata of the grouping set, zero extra compute.
    """
    o = load_table(spark, sf_dir, "orders")
    agg = (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_prio"),
            F.count("*").alias("n_orders"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n_orders")
    )
    return with_empty_grand_total(
        agg, o, {"g_status": 1, "g_prio": 1, "n_orders": 0}
    ).orderBy(
        "g_status",
        "g_prio",
        F.col("o_orderstatus").asc_nulls_first(),
        F.col("o_orderpriority").asc_nulls_first(),
    )


@register(
    "agg_regression_price_on_qty",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         SUM(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0))) AS sx,
         SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS sy,
         SUM(CAST(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS syy,
         SUM(CAST(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS sxy
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY l_returnflag
),
m AS (
  SELECT l_returnflag,
         CAST(n AS BIGINT) AS n_rows,
         CAST(n * sxy - sx * sy AS DOUBLE) AS d1,
         CAST(n * sxx - sx * sx AS DOUBLE) AS d2,
         CAST(n * syy - sy * sy AS DOUBLE) AS d3,
         CAST(sy * sxx - sx * sxy AS DOUBLE) AS nu
  FROM s
)
SELECT l_returnflag, n_rows,
       CASE WHEN d2 <> 0 THEN d1 / d2 END AS slope,
       CASE WHEN d2 <> 0 THEN nu / d2 / 100.0 END AS intercept,
       CASE WHEN d2 <> 0 AND d3 <> 0 THEN (d1 * d1) / (d2 * d3) END AS r2
FROM m
ORDER BY l_returnflag
""",
)
def agg_regression_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (slope / intercept / R² of price on
    quantity per return flag) — regr_slope/regr_intercept/regr_r2
    semantics, bit-identical across engines with no rounding tolerance.

    Exactness discipline: EVERYTHING up to and including the centered
    moments d1=nΣxy−ΣxΣy, d2=nΣx²−(Σx)², d3=nΣy²−(Σy)² is integer-cents
    DECIMAL(38,0) arithmetic (scale-0 decimals can't hit Spark's
    precision-loss scale reduction; magnitudes stay < 1e27 at sf1). Only
    ratios run in double, and each is pure multiply/divide — no a*b−c
    shape survives to the float stage, because a C++-compiled engine may
    legally contract that to an FMA and shift the last ulp (observed: at
    the 10× lake, DuckDB's fused nΣy²−(Σy)² differed from the JVM's
    two-op version by 2 ulps of r2; the pre-centering formulation hid it
    at smaller scales). The cents factor cancels in slope/r2 and divides
    out of the intercept once.

    Scale: partial-aggregatable sums, one shuffle on the group key — the
    same profile as any hash aggregate.
    """
    # regr_* semantics: only (x, y) pairs with BOTH sides non-NULL enter
    # the moments (a one-sided SUM skip would mix inconsistent denominators)
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    xc = F.round(F.col("l_quantity") * 100).cast("long")
    yc = F.round(F.col("l_extendedprice") * 100).cast("long")
    dec38 = "decimal(38,0)"
    s = l.groupBy("l_returnflag").agg(
        F.count("*").cast(dec38).alias("n"),
        F.sum(xc.cast(dec38)).alias("sx"),
        F.sum(yc.cast(dec38)).alias("sy"),
        F.sum((xc * xc).cast(dec38)).alias("sxx"),
        F.sum((yc * yc).cast(dec38)).alias("syy"),
        F.sum((xc * yc).cast(dec38)).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    m = s.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        (n * sxy - sx * sy).cast("double").alias("d1"),
        (n * sxx - sx * sx).cast("double").alias("d2"),
        (n * syy - sy * sy).cast("double").alias("d3"),
        (sy * sxx - sx * sxy).cast("double").alias("nu"),
    )
    # try_divide: a zero-variance group (every x identical — the constant
    # lake, or any single-row group) has an undefined fit; SQL regr_slope
    # yields NULL there, and ANSI Spark would otherwise raise
    return m.select(
        "l_returnflag",
        "n_rows",
        F.try_divide(F.col("d1"), F.col("d2")).alias("slope"),
        (F.try_divide(F.col("nu"), F.col("d2")) / F.lit(100.0)).alias("intercept"),
        F.try_divide(
            F.col("d1") * F.col("d1"), F.col("d2") * F.col("d3")
        ).alias("r2"),
    ).orderBy("l_returnflag")


@register(
    "agg_winsorized_quantity_stats",
    oracle="""
WITH bounds AS (
  SELECT l_returnflag,
         quantile_cont(l_quantity, 0.25) AS p25,
         quantile_cont(l_quantity, 0.75) AS p75
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       b.p25, b.p75,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
            / COUNT(*) AS DOUBLE) AS trimmed_mean
FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
WHERE l.l_quantity >= b.p25 AND l.l_quantity <= b.p75
GROUP BY l.l_returnflag, b.p25, b.p75
ORDER BY l.l_returnflag
""",
)
def agg_winsorized_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics: interquartile-trimmed mean of quantity per return
    flag — outlier-resistant profiling (the winsorize/trim step of a
    feature pipeline). Quartiles 0.25/0.75 are exact binary fractions over
    integral data (engine-identical interpolation); the trimmed mean sums
    as DECIMAL then divides once in double, so the result is bit-exact.

    Two passes over the fact (bounds, then filtered agg) joined on the
    3-value group key — the bounds side is broadcast-sized at any sf.
    """
    l = load_table(spark, sf_dir, "lineitem")
    bounds = l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
    )
    return (
        l.join(bounds, "l_returnflag")
        .filter((F.col("l_quantity") >= F.col("p25")) & (F.col("l_quantity") <= F.col("p75")))
        .groupBy("l_returnflag", "p25", "p75")
        .agg(
            F.count("*").alias("n_kept"),
            (
                F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
                / F.count("*")
            ).alias("trimmed_mean"),
        )
        .select("l_returnflag", "p25", "p75", "n_kept", "trimmed_mean")
        .orderBy("l_returnflag")
    )


@register(
    "agg_mode_priority_deterministic",
    oracle="""
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT o_orderstatus, o_orderpriority, c,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY c DESC, o_orderpriority) AS rn
  FROM counts
)
SELECT o_orderstatus,
       o_orderpriority AS mode_priority,
       CAST(c AS BIGINT) AS mode_count
FROM ranked WHERE rn = 1
ORDER BY o_orderstatus
""",
)
def agg_mode_priority_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent order priority per status, ties
    broken by value): engines disagree on native mode() tie-breaks, so the
    relational formulation — count, rank with an explicit tiebreak, keep
    rank 1 — is the cross-engine-exact way to ask for it.

    Two aggregates + one tiny window over |status × priority| rows; the
    fact is touched once."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("c"))
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("c"), "o_orderpriority")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("c").cast("long").alias("mode_count"),
        )
        .orderBy("o_orderstatus")
    )
