"""Set operations + sort/limit/top-k: union, intersect, except, distinct.

Extension layer (SURVEY.md §2b). Scale notes: UNION is a metadata-only concat
(no shuffle); DISTINCT/INTERSECT/EXCEPT shuffle on the full row hash —
project to the minimal column set first so the shuffle carries only the
columns that matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.registry import register
from pgcp_spark.sources import load_table


@register(
    "setop_union_active_parties",
    oracle="""
SELECT party_key, party_name, kind FROM (
  SELECT c_custkey AS party_key, c_name AS party_name, 'customer' AS kind FROM customer WHERE c_acctbal > 0
  UNION ALL
  SELECT s_suppkey AS party_key, s_name AS party_name, 'supplier' AS kind FROM supplier WHERE s_acctbal > 0
)
ORDER BY kind, party_key
""",
)
def setop_union_active_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by column name across differently-shaped inputs."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(
            F.col("c_custkey").alias("party_key"),
            F.col("c_name").alias("party_name"),
            F.lit("customer").alias("kind"),
        )
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 0)
        .select(
            F.col("s_suppkey").alias("party_key"),
            F.col("s_name").alias("party_name"),
            F.lit("supplier").alias("kind"),
        )
    )
    return c.unionByName(s).orderBy("kind", "party_key")


@register(
    "setop_intersect_both_segments",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
ORDER BY o_custkey
""",
)
def setop_intersect_both_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): customers with both urgent and low
    priority orders."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.intersect(low).orderBy("o_custkey")


@register(
    "setop_except_inactive_customers",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
ORDER BY c_custkey
""",
)
def setop_except_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): customers with no urgent orders (the
    priority filter keeps the result non-empty at every sf)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.exceptAll(o.distinct()).distinct().orderBy("c_custkey")


@register(
    "setop_distinct_ship_modes",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus
FROM lineitem
ORDER BY l_returnflag, l_linestatus
""",
)
def setop_distinct_ship_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT on a projected column pair (shuffle carries 2 columns, not
    the full row — projection first)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus").distinct().orderBy(
        "l_returnflag", "l_linestatus"
    )


@register(
    "sort_global_top_orders",
    oracle="""
SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def sort_global_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps + driver merge, never a full sort at scale."""
    o = load_table(spark, sf_dir, "orders")
    from pgcp_spark.operators._decimal import dec

    return (
        o.select("o_orderkey", "o_custkey", dec("o_totalprice").cast("double").alias("o_totalprice"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@register(
    "dedup_orders_by_customer_day",
    oracle="""
SELECT o_custkey, o_orderdate, o_orderkey
FROM (
  SELECT o_custkey, o_orderdate, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey) AS rn
  FROM orders
)
WHERE rn = 1
ORDER BY o_custkey, o_orderdate, o_orderkey
""",
)
def dedup_orders_by_customer_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed exact dedup with a deterministic keep-rule (lowest orderkey per
    (customer, day)) — the deterministic version of dropDuplicates: a
    row_number window instead of arbitrary first-seen, so results are stable
    across partitionings and match the SQL oracle."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy("o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@register(
    "setop_exceptall_priority_bags",
    oracle="""
SELECT o_orderpriority FROM (
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
)
ORDER BY o_orderpriority
""",
)
def setop_exceptall_priority_bags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): multiplicity-aware difference of the
    open-order vs finished-order priority multisets — each surviving row
    represents one excess occurrence, not a distinct value."""
    o = load_table(spark, sf_dir, "orders")
    open_p = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    done_p = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return open_p.exceptAll(done_p).orderBy("o_orderpriority")


@register(
    "setop_intersectall_segment_nations",
    oracle="""
SELECT c_nationkey FROM (
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT ALL
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
)
ORDER BY c_nationkey
""",
)
def setop_intersectall_segment_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): per-nation min(multiplicity) across
    two market segments."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.intersectAll(b).orderBy("c_nationkey")


@register(
    "setop_union_by_name_mixed_schemas",
    oracle="""
SELECT entity_id, name, acctbal, segment FROM (
  SELECT c_custkey AS entity_id, c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment
  FROM customer WHERE c_custkey < 50
  UNION ALL BY NAME
  SELECT s_name AS name, s_suppkey AS entity_id, s_acctbal AS acctbal, NULL AS segment
  FROM supplier WHERE s_suppkey < 50
)
ORDER BY entity_id, name
""",
)
def setop_union_by_name_mixed_schemas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns: aligns differently-ordered
    schemas by NAME (positional union would silently mismatch columns) and
    null-fills columns one side lacks."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 50)
        .select(
            F.col("c_custkey").alias("entity_id"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 50)
        .select(
            F.col("s_name").alias("name"),
            F.col("s_suppkey").alias("entity_id"),
            F.col("s_acctbal").alias("acctbal"),
        )
    )
    return c.unionByName(s, allowMissingColumns=True).orderBy("entity_id", "name")
