"""UDF surface: vectorized pandas_udf (scalar), applyInPandas (grouped map
= UDAF-shaped), plus pivot and percentile operators.

Extension layer (SURVEY.md §2b). The UDF examples deliberately compute
things with exact integer/decimal results so the Python paths are still
oracle-checkable against DuckDB SQL. Row-at-a-time Python UDFs are
intentionally absent — Arrow-batched pandas UDFs are the only sanctioned
Python path (10-100× less serde overhead; SNIPPETS.md patterns).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.operators._decimal import dsum
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table


@register(
    "udf_pandas_price_tier",
    oracle="""
SELECT tier, COUNT(*) AS n_orders
FROM (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) / 50000 AS BIGINT) AS raw_tier,
         -- CASE, not bare LEAST: LEAST *skips* NULL args, which would
         -- silently bucket an unknown price into the top tier
         CASE WHEN o_totalprice IS NULL THEN NULL
              ELSE LEAST(CAST(FLOOR(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) / 50000) AS BIGINT), 9)
         END AS tier
  FROM orders
)
GROUP BY tier
ORDER BY tier
""",
)
def udf_pandas_price_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-vectorized): price → tier bucket, then
    aggregate. The udf computes floor(price/50000) capped at 9 on pandas
    Series — numpy-vectorized, applied per Arrow batch."""
    o = load_table(spark, sf_dir, "orders")

    @F.pandas_udf("long")
    def tier(price: pd.Series) -> pd.Series:
        import numpy as np

        p = np.round(price.to_numpy(), 2)  # normalize like DECIMAL(12,2)
        # keep NaN (NULL price) as NULL: a raw astype(int64) would turn
        # NaN into int64 garbage and invent a phantom tier group
        tiers = np.minimum(np.floor(p / 50000), 9)
        return pd.Series(tiers).astype("Int64")

    return (
        o.select(tier("o_totalprice").alias("tier"))
        .groupBy("tier")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("tier")
    )


@register(
    "udf_grouped_map_priority_order_stats",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) - MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS price_range
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def udf_grouped_map_priority_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map (UDAF-shaped): per-priority order stats
    computed on the group's pandas frame; decimal-normalized (integer
    cents) so results match the exact SQL aggregation.

    Scale note: grouped-map pays ONE Python/Arrow round-trip PER GROUP, so
    it is the right tool only for LOW-cardinality keys with fat groups
    (fit-a-model-per-segment shapes). An earlier revision grouped by
    o_custkey — 150k tiny groups — and spent 29 s at sf0.1 purely on
    per-group Python overhead vs 0.3 s for this shape; high-cardinality
    per-key stats belong in JVM aggregates (see the agg_* family).
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # SQL aggregates skip NULLs: drop NaN before the exact-cents math
        # (astype(int64) on NaN is garbage, not an error) and emit NULL
        # sums/ranges for an all-NULL group like SUM/MAX/MIN would
        vals = pdf["o_totalprice"].dropna().to_numpy()
        cents = np.round(vals * 100).astype("int64")
        return pd.DataFrame(
            {
                "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
                "n_orders": [len(pdf)],
                "total_spent": [cents.sum() / 100.0 if len(cents) else None],
                "price_range": [
                    (cents.max() - cents.min()) / 100.0 if len(cents) else None
                ],
            }
        )

    out = o.groupBy("o_orderpriority").applyInPandas(
        stats,
        schema="o_orderpriority string, n_orders long, total_spent double, price_range double",
    )
    return out.orderBy("o_orderpriority")


@register(
    "pivot_segment_by_priority",
    oracle="""
SELECT c_mktsegment,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def pivot_segment_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per market segment × priority (explicit pivot
    value list keeps the plan a single aggregation — no extra distinct
    pass at scale)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority", ["1-URGENT", "3-MEDIUM", "5-LOW"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "c_mktsegment",
            F.col("1-URGENT").alias("urgent"),
            F.col("3-MEDIUM").alias("medium"),
            F.col("5-LOW").alias("low"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "percentile_exact_quantity",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.75) AS p75_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def percentile_exact_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — same definition in Spark
    `percentile` and DuckDB `quantile_cont`). Quantiles 0.5/0.75 are exact
    binary fractions, so interpolation is bit-identical over the integral
    quantity values regardless of each engine's formula arrangement."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_quantity, 0.75)").alias("p75_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "percentile_approx_price",
    oracle=None,  # t-digest/GK sketch differs across engines → rows-only
    doc="approx percentile sketch — the 100 TB path (single pass, bounded memory)",
)
def percentile_approx_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (GK sketch): constant-memory quantiles — the
    scale path where exact percentiles would need a full sort. Accuracy vs
    the exact percentile is asserted in tests."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 1000).alias("approx_median"),
            F.percentile_approx("o_totalprice", 0.99, 1000).alias("approx_p99"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "udf_map_in_arrow_doc_stats",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_arrow,
       CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace
FROM documents
ORDER BY doc_id
""",
)
def udf_map_in_arrow_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy end of the UDF surface — RecordBatches in,
    RecordBatches out, no pandas materialization at all. Right choice when
    the Python work is itself Arrow-native (pyarrow.compute, DuckDB-wasm,
    polars); here pa.compute string kernels compute doc stats columnar-ly.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.utf8_length(pc.replace_substring(text, " ", "")), pa.int64()
                    ),
                ],
                names=["doc_id", "n_chars_arrow", "n_nonspace"],
            )

    out = d.mapInArrow(stats, schema="doc_id long, n_chars_arrow long, n_nonspace long")
    return out.orderBy("doc_id")


@register(
    "udf_sql_registered_priority_class",
    oracle="""
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'expedite' ELSE 'standard' END AS klass,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1
ORDER BY klass
""",
)
def udf_sql_registered_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-callable registered UDF: spark.udf.register makes a Python
    function usable from spark.sql text — the surface ad-hoc SQL users
    hit. Kept off the hot path by design (row-at-a-time serde; the pandas
    variants above are the sanctioned bulk path) and used here on a
    5-distinct-value column after pushdown-friendly projection.
    """
    from pyspark.sql.types import StringType

    def classify(p: str) -> str:
        return "expedite" if p in ("1-URGENT", "2-HIGH") else "standard"

    spark.udf.register("priority_class", classify, StringType())
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_udf")
    return spark.sql(
        """
        SELECT priority_class(o_orderpriority) AS klass, COUNT(*) AS n_orders
        FROM orders_udf GROUP BY 1 ORDER BY klass
        """
    )


TOPK_TOKENS = 3


@register(
    "udtf_top_tokens_per_doc",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(trim(regexp_replace(lower(COALESCE(text, '')), ' +', ' ', 'g')), ' ')) AS token
  FROM documents WHERE doc_id < 50
),
counts AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1, 2),
ranked AS (
  SELECT doc_id, token, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, token) AS INT) AS rnk
  FROM counts
)
SELECT doc_id, rnk, token, n FROM ranked WHERE rnk <= {TOPK_TOKENS}
ORDER BY doc_id, rnk
""",
)
def udtf_top_tokens_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (the third leg of UDF/UDAF/UDTF): a
    table-valued function registered with spark.udtf.register and invoked
    from SQL via LATERAL — each document row fans out into its top-k
    (rank, token, count) rows, computed in Python with deterministic
    (count desc, token asc) tie-breaking so the relational oracle matches
    exactly.

    Like the SQL-registered scalar UDF above, this registers the API
    surface, not a hot path: the UDTF runs row-at-a-time Python, so it is
    demonstrated on a 50-doc projection; the same result at corpus scale
    is the relational counts+window formulation (text.py's token ops).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="rnk int, token string, n bigint")
    class TopTokens:
        def eval(self, text: str):
            from collections import Counter
            import re

            # NULL text ≡ empty text (COALESCE in the oracle): both sides
            # tokenize '' to the single empty token
            toks = re.sub(" +", " ", (text or "").lower().strip()).split(" ")
            best = sorted(Counter(toks).items(), key=lambda kv: (-kv[1], kv[0]))
            for i, (token, n) in enumerate(best[:TOPK_TOKENS], start=1):
                yield (i, token, n)

    spark.udtf.register("top_tokens", TopTokens)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "docs_udtf"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.rnk, t.token, t.n
        FROM docs_udtf d, LATERAL top_tokens(d.text) t
        ORDER BY d.doc_id, t.rnk
        """
    )
