"""Scalar-function operators: string, date/time, math, conditional, JSON.

Extension layer (SURVEY.md §2b). Everything here is a built-in
``pyspark.sql.functions`` expression — JVM-side, inside whole-stage codegen;
no Python UDFs in these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.registry import register
from pgcp_spark.sources import load_table


@register(
    "scalar_string_functions",
    oracle="""
SELECT c_custkey,
       UPPER(c_name) AS name_upper,
       LOWER(c_mktsegment) AS segment_lower,
       SUBSTRING(c_name, 1, 8) AS name_prefix,
       LENGTH(c_name) AS name_len,
       CONCAT(COALESCE(c_name, ''), ':', COALESCE(c_mktsegment, '')) AS name_seg,
       REPLACE(c_name, '#', '-') AS name_dashed
FROM customer
ORDER BY c_custkey
""",
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substring/length/concat/replace — all codegen'd."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.lower("c_mktsegment").alias("segment_lower"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.length("c_name").cast("long").alias("name_len"),
            # COALESCE pinned on both sides: concat_ws silently DROPS null
            # args (losing the separator) while SQL CONCAT engines differ on
            # null treatment — explicit '' is the only portable semantic
            F.concat_ws(
                ":",
                F.coalesce(F.col("c_name"), F.lit("")),
                F.coalesce(F.col("c_mktsegment"), F.lit("")),
            ).alias("name_seg"),
            F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        )
        .orderBy("c_custkey")
    )


@register(
    "scalar_regexp_extract_order_priority",
    oracle="""
SELECT o_orderpriority,
       REGEXP_EXTRACT(o_orderpriority, '^([0-9]+)-', 1) AS priority_num,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def scalar_regexp_extract_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract of the numeric prefix from priority strings."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .select(
            "o_orderpriority",
            F.regexp_extract("o_orderpriority", r"^([0-9]+)-", 1).alias("priority_num"),
            "n_orders",
        )
        .orderBy("o_orderpriority")
    )


@register(
    "scalar_date_functions",
    oracle="""
SELECT order_year, order_month, COUNT(*) AS n_orders
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month
  FROM orders
)
GROUP BY order_year, order_month
ORDER BY order_year, order_month
""",
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month extraction + temporal group-by (the partition-pruning
    shape: at scale these become parquet partition columns)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .groupBy("order_year", "order_month")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("order_year", "order_month")
    )


@register(
    "scalar_date_trunc_events",
    oracle="""
SELECT DATE_TRUNC('hour', ts) AS hour_bucket, event_type, COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY hour_bucket, event_type
""",
)
def scalar_date_trunc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc to hour buckets over the events table (the batch
    equivalent of a tumbling window)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour_bucket"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
        .orderBy("hour_bucket", "event_type")
    )


@register(
    "scalar_math_functions",
    oracle="""
SELECT p_partkey,
       CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)) * 110, 0) AS BIGINT) AS price_cents_110pct,
       CAST(ABS(p_size - 25) AS BIGINT) AS size_dev,
       CAST(POWER(p_size, 2) AS BIGINT) AS size_sq,
       CAST(FLOOR(CAST(p_retailprice AS DECIMAL(12,2)) / 100) AS BIGINT) AS price_bucket
FROM part
ORDER BY p_partkey
""",
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/power/floor on integer-safe outputs (bigint results avoid
    any float representation drift between engines)."""
    p = load_table(spark, sf_dir, "part")
    dec_price = F.col("p_retailprice").cast("decimal(12,2)")
    return (
        p.select(
            "p_partkey",
            F.round(dec_price * 110, 0).cast("long").alias("price_cents_110pct"),
            F.abs(F.col("p_size") - 25).cast("long").alias("size_dev"),
            F.pow("p_size", 2).cast("long").alias("size_sq"),
            F.floor(dec_price / 100).cast("long").alias("price_bucket"),
        )
        .orderBy("p_partkey")
    )


@register(
    "scalar_case_when_order_size",
    oracle="""
SELECT size_class, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
FROM (
  SELECT o_totalprice,
         CASE WHEN o_totalprice >= 300000 THEN 'large'
              WHEN o_totalprice >= 100000 THEN 'medium'
              ELSE 'small' END AS size_class
  FROM orders
)
GROUP BY size_class
ORDER BY size_class
""",
)
def scalar_case_when_order_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregate."""
    from pgcp_spark.operators._decimal import dsum

    o = load_table(spark, sf_dir, "orders")
    size_class = (
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
    )
    return (
        o.select(size_class.alias("size_class"), "o_totalprice")
        .groupBy("size_class")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_total"))
        .orderBy("size_class")
    )


@register(
    "scalar_json_extract_events",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def scalar_json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the events.props JSON string column, aggregated
    as integers (exact)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "scalar_from_json_struct",
    oracle="""
SELECT k_bucket, COUNT(*) AS n_events
FROM (
  SELECT CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10) AS BIGINT) AS k_bucket
  FROM events
)
GROUP BY k_bucket
ORDER BY k_bucket
""",
)
def scalar_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct, then bucketing — the schema-on-read
    path for semi-structured columns (vs. per-field get_json_object)."""
    from pyspark.sql import types as T

    e = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = e.select(F.from_json("props", schema).alias("p"))
    return (
        parsed.select(F.floor(F.col("p.k") / 10).cast("long").alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n_events"))
        .orderBy("k_bucket")
    )


@register(
    "scalar_array_functions",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       string_split(text, ' ')[1] AS first_token,
       list_contains(string_split(text, ' '), 'spark') AS has_spark
FROM documents
ORDER BY doc_id
""",
)
def scalar_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → array size / element access / membership (array primitives
    over text; DuckDB lists are 1-indexed, Spark element_at too)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return (
        d.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.element_at(toks, 1).alias("first_token"),
            F.array_contains(toks, "spark").alias("has_spark"),
        )
        .orderBy("doc_id")
    )
