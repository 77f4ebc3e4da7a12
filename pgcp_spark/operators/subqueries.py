"""TPC-H subquery patterns (q2/q4/q14/q15/q17/q18/q19/q22-shaped) over the
reduced testdata schema.

The reference delegates all querying to PostgreSQL via CTAS
(/root/reference/lib/pgcp/postgres.rb:80-91, SURVEY.md O15); a user switching
from PG to this engine needs the full subquery surface PG gives them. Each
query here exercises one classic decorrelation shape and notes the physical
plan Spark should produce:

  - correlated EXISTS            → left-semi hash join (RewritePredicateSubquery)
  - correlated scalar (per-group)→ aggregate + broadcast equi-join back
  - uncorrelated scalar          → broadcast cross-join of a 1-row aggregate
  - IN over GROUP BY ... HAVING  → semi join against the aggregated set
  - min-per-group "first" lookup → partial agg + broadcast join (no window)
  - disjunctive join predicates  → common equi-conjunct extracted, residual OR

Two queries (q4, q17) deliberately go through ``spark.sql`` with the
subquery written literally, proving Catalyst's decorrelation produces the
join-based plan; the rest build the decorrelated plan directly with the
DataFrame API. Either way there is no per-row re-execution of the inner
query — at 100 TB a correlated subquery evaluated row-at-a-time is the
difference between one shuffle and a cluster-killer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.operators._decimal import dec, dsum, sql_dsum
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table, register_views

_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"


def _rev() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


@register(
    "q2_cheapest_part_per_type",
    oracle="""
SELECT p.p_type, p.p_partkey, p.p_name, p.p_retailprice
FROM part p
WHERE p.p_size <= 15
  AND p.p_retailprice = (
    SELECT MIN(p2.p_retailprice) FROM part p2
    WHERE p2.p_type = p.p_type AND p2.p_size <= 15
  )
ORDER BY p_type, p_partkey
""",
)
def q2_cheapest_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min-subquery → decorrelated by hand into
    a per-group MIN aggregate broadcast-joined back onto the filtered scan.

    Scale: the aggregate side collapses to |types| rows — always broadcast;
    the fact side never shuffles. (A window MIN would shuffle all of part.)
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    mins = p.groupBy(F.col("p_type").alias("m_type")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (p.p_type == mins.m_type) & (p.p_retailprice == mins.min_price),
        )
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_type", "p_partkey")
    )


@register(
    "q4_priority_with_late_line",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_priority_with_late_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS, written literally in spark.sql.

    Catalyst's RewritePredicateSubquery turns the EXISTS into a LEFT SEMI
    join on l_orderkey with the date comparison as a join residual — orders
    rows pass at most once, no duplicate-then-distinct. At scale this is one
    shuffle pair on orderkey, then a tiny shuffle for the 5-group aggregate.
    """
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "q14_promo_revenue_share",
    oracle=f"""
SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue,
       100 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
            / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-08-01 00:00:00'
""",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio over a fact⋈dim join.

    Scale: part broadcasts (explicitly) so the filtered lineitem scan flows
    straight into a map-side partial aggregate — zero fact shuffles; the
    ratio is computed on exact decimal sums so both engines emit the same
    double.
    """
    lo = F.lit("1998-06-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-08-01 00:00:00").cast("timestamp")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).alias("_promo"),
            F.sum(_rev()).alias("_total"),
        )
        .select(
            F.col("_promo").cast("double").alias("promo_revenue"),
            F.col("_total").cast("double").alias("total_revenue"),
        )
        .withColumn("promo_pct", F.lit(100) * F.col("promo_revenue") / F.col("total_revenue"))
    )


@register(
    "q15_top_revenue_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1999-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: uncorrelated scalar MAX subquery over a derived
    aggregate (the "view").

    Scale: revenue is one shuffle on suppkey; its 1-row MAX is broadcast
    cross-joined back (a scalar, not a sort); supplier is broadcast. The
    derived revenue frame is computed once and reused for both sides of the
    comparison.
    """
    lo = F.lit("1999-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1999-04-01 00:00:00").cast("timestamp")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("_rev_exact")
    )
    top = revenue.agg(F.max("_rev_exact").alias("_max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top), revenue._rev_exact == top._max_rev)
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev_exact").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_order_revenue",
    oracle=f"""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l2.l_quantity))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
""",
)
def q17_small_quantity_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar AVG subquery, written literally in
    spark.sql.

    Catalyst decorrelates it into a per-partkey aggregate joined back on
    l_partkey — the inner lineitem scan happens ONCE, not per outer row.
    The avg follows the exact-decimal convention on both sides so the
    threshold comparison can't flip between engines.
    """
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (
            SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l2.l_quantity))
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
          )
        """
    )


Q18_MIN_QTY = 120


@register(
    "q18_large_volume_customers",
    oracle=f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       {sql_dsum("l.l_quantity")} AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > {Q18_MIN_QTY}
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN over GROUP BY ... HAVING → left-semi join of orders
    against the big-order keyset.

    Scale: the keyset is an aggregate of lineitem (one shuffle on orderkey,
    reused by the main join via the same partitioning); semi join carries no
    payload columns. Top-100 compiles to TakeOrderedAndProject.
    """
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_qty"))
        .filter(F.col("_qty") > Q18_MIN_QTY)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive_join_revenue",
    oracle=f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-conjunctions join predicate.

    The equi-conjunct (p_partkey = l_partkey) is common to every disjunct,
    so Catalyst keeps a HASH join (broadcast here) with the OR as a residual
    filter — never a nested-loop. At 100 TB that residual also prunes via
    parquet min/max on l_quantity.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    d1 = (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11)
    d2 = (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20)
    d3 = (F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30)
    return j.filter(d1 | d2 | d3).agg(F.sum(_rev()).cast("double").alias("revenue"))


@register(
    "q22_idle_rich_customers",
    oracle="""
SELECT c.c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c2.c_acctbal)
    FROM customer c2 WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar AVG subquery + NOT EXISTS.

    Decorrelated plan: the 1-row average (over positive balances) broadcast
    cross-joins into the customer filter; NOT EXISTS (no urgent orders) is a
    LEFT ANTI join on custkey against a filtered orders keyset projected to
    one column. Both joins leave customer
    partitioning untouched until the final 25-group aggregate.
    """
    c = load_table(spark, sf_dir, "customer")
    avg_pos = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("_avg"))
    )
    o_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o_keys, c.c_custkey == o_keys.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q7_nation_pair_volume",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
       CAST(SUM({_REV_SQL.replace('l_', 'l.l_')}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume — the same
    dimension (nation) joined twice in two roles, plus a disjunctive
    cross-role predicate.

    Scale: both nation roles and supplier broadcast; customer broadcasts
    after its nation filter; lineitem⋈orders is the one real shuffle. The
    pair predicate is applied post-join on broadcast columns — no fact
    columns involved, so it folds into the join stage."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle=f"""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN n1.n_name = 'NATION_3' THEN {_REV_SQL.replace('l_', 'l.l_')}
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(SUM({_REV_SQL.replace('l_', 'l.l_')}) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n2.n_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY 1
ORDER BY 1
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's yearly revenue —
    conditional-aggregate ratio over a 6-table star with nation in two
    roles. Share computed from the two exact decimal sums as doubles
    (identical op order in both engines)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region"))
    nat_rev = F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(nat_rev).alias("_nat"),
            F.sum(_rev()).alias("_all"),
        )
        .select(
            "o_year",
            (F.col("_nat").cast("double") / F.col("_all").cast("double")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@register(
    "q16_brand_supplier_counts_not_in",
    oracle="""
SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_size IN (1, 4, 7)
  AND p.p_partkey NOT IN (
    SELECT l2.l_partkey FROM lineitem l2 WHERE l2.l_quantity >= 49
  )
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
""",
)
def q16_brand_supplier_counts_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN subquery — the null-aware anti join, a
    DIFFERENT decorrelation than NOT EXISTS (NOT IN must reject everything
    if the subquery yields any NULL; Catalyst compiles it to a
    null-aware anti join). Written literally in spark.sql; the l_partkey
    column is non-null here so the result matches set-difference semantics,
    but the plan is the null-aware one.

    Scale: the NOT IN keyset is a projected/filtered lineitem scan; the
    main join shuffles lineitem⋈part on partkey once; count(distinct)
    adds the standard two-phase expand-aggregate.
    """
    register_views(spark, sf_dir, ("part", "lineitem"))
    return spark.sql(
        """
        SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
        WHERE p.p_size IN (1, 4, 7)
          AND p.p_partkey NOT IN (
            SELECT l2.l_partkey FROM lineitem l2 WHERE l2.l_quantity >= 49
          )
        GROUP BY p.p_brand, p.p_type
        ORDER BY supplier_cnt DESC, p_brand, p_type
        """
    )
