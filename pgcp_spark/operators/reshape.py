"""Relational reshape operators: UNPIVOT/melt (the inverse of the pivot
surface in operators/udfs.py's ``pivot_segment_by_priority``).

Wide→long reshaping is a standard step in training-data pipelines
(per-metric rows feed metric stores and loss-weighting tables). Spark's
``DataFrame.unpivot`` compiles to an Expand node — each input row fans out
to one row per value column in the SAME task, no shuffle, no UDF; at
100 TB the only shuffle in this query remains the upstream aggregate's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.operators._decimal import dec
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table

_WIDE_SQL = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS DOUBLE) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_total
FROM orders
GROUP BY o_orderstatus
"""


@register(
    "reshape_unpivot_order_metrics",
    oracle=f"""
WITH wide AS ({_WIDE_SQL})
SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM wide
UNION ALL SELECT o_orderstatus, 'sum_total', sum_total FROM wide
UNION ALL SELECT o_orderstatus, 'max_total', max_total FROM wide
ORDER BY o_orderstatus, metric
""",
)
def reshape_unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT: per-status order metrics wide→long (status, metric, value).

    The aggregate shuffles once on o_orderstatus; unpivot itself is a
    row-local Expand (3 output rows per input row, no exchange).
    """
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("sum_total"),
        F.max(dec("o_totalprice")).cast("double").alias("max_total"),
    )
    return (
        wide.unpivot(
            ids="o_orderstatus",
            values=["n_orders", "sum_total", "max_total"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("o_orderstatus", "metric")
    )
