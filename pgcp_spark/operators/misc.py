"""Remaining §2b surface: GROUPING SETS, map functions, explode/posexplode,
SQL-API parity, and skew-handling (salted join).

The salted join demonstrates the manual skew mitigation pattern for when
AQE's runtime skew splitting isn't available (e.g. broadcast-ineligible
skewed aggregations): explode the hot side into N salt buckets, replicate
the other side N times, join on (key, salt) — same result, N-way spread of
the hot key's rows. The oracle proves result-equivalence to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.operators._ansi_empty import with_empty_grand_total
from pgcp_spark.operators._decimal import dsum
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table, register_views


@register(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-status,
    per-priority, and grand total in one pass (single shuffle over the
    expanded grouping keys)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    agg = spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
    # the () set is in the grouping sets, so ANSI emits the grand-total
    # row even over empty input (Spark alone does not — see _ansi_empty)
    return with_empty_grand_total(agg, o, {"n_orders": 0}).orderBy(
        F.col("o_orderstatus").asc_nulls_first(),
        F.col("o_orderpriority").asc_nulls_first(),
    )


@register(
    "scalar_map_functions",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN mk = 'k' THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k
FROM (
  SELECT event_type, UNNEST(json_keys(props)) AS mk FROM events
)
GROUP BY event_type
ORDER BY event_type
""",
)
def scalar_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: parse the JSON props into map<string,string>,
    explode map keys (map_keys + explode), aggregate key occurrences."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        e.select("event_type", F.explode(F.map_keys(m)).alias("mk"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("mk") == "k", 1).otherwise(0)).alias("n_with_k"),
        )
        .orderBy("event_type")
    )


@register(
    "scalar_posexplode_tokens",
    oracle="""
SELECT doc_id, CAST(generate_subscripts(parts, 1) - 1 AS INT) AS pos, UNNEST(parts) AS token
FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents WHERE doc_id < 5)
ORDER BY doc_id, pos
""",
)
def scalar_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: token stream with positions (the UDTF/row-generator
    shape) for a filtered doc subset."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .orderBy("doc_id", "pos")
    )


@register(
    "sql_api_yearly_revenue",
    oracle="""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS order_year,
       COUNT(DISTINCT o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1
ORDER BY 1
""",
)
def sql_api_yearly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure SQL-API entry: the same Catalyst plan as the DataFrame API,
    written as SQL over registered views (spark.sql parity surface)."""
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT YEAR(o.o_orderdate) AS order_year,
               COUNT(DISTINCT o.o_orderkey) AS n_orders,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
        ORDER BY 1
        """
    )


SALT_BUCKETS = 8


@register(
    "join_salted_skew_events_per_user",
    oracle="""
SELECT e.user_id, c.c_mktsegment, COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY e.user_id, c.c_mktsegment
ORDER BY e.user_id
""",
)
def join_salted_skew_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join: the manual skew mitigation. The (potentially hot-keyed)
    events side gets a random-free deterministic salt (event_id % N); the
    customer side is replicated N ways via explode; the join key becomes
    (user_id, salt), spreading any hot user over N tasks. Result is
    provably identical to the plain join (the oracle IS the plain join)."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "salt", (F.col("event_id") % SALT_BUCKETS).cast("int")
    )
    c = load_table(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)]))
    )
    return (
        e.join(c, (e.user_id == c.c_custkey) & (e.salt == c.salt))
        .groupBy("user_id", "c_mktsegment")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .orderBy("user_id")
    )
