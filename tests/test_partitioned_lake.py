"""Partitioned parquet lake: hive-layout writes + partition pruning.

At 100 TB the lake is partitioned on a low-cardinality time/tenant key and
queries touch a handful of partitions; pruning must happen at PLANNING
time (PartitionFilters on the scan), not as a post-scan filter.
"""

from __future__ import annotations

import pytest

from pgcp_spark.plans import explain as ex
from pgcp_spark.sources import load_table
from tests.conftest import SF_DIR_CORRECTNESS


@pytest.fixture(scope="module")
def partitioned_orders(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("lake") / "orders")
    o = load_table(spark, SF_DIR_CORRECTNESS, "orders")
    o.withColumn("o_year", F.year("o_orderdate")).write.partitionBy("o_year").parquet(path)
    return path


def test_partition_filter_prunes_at_plan_time(spark, partitioned_orders):
    from pyspark.sql import functions as F

    df = spark.read.parquet(partitioned_orders).filter(F.col("o_year") == 1998)
    plan = ex.physical_plan(df)
    assert "PartitionFilters: [" in plan and "o_year" in plan.split("PartitionFilters: [", 1)[1].split("]")[0], (
        plan[:1500]
    )
    # pruned scan reads one year only
    o = load_table(spark, SF_DIR_CORRECTNESS, "orders")
    expected = o.filter(F.year("o_orderdate") == 1998).count()
    assert df.count() == expected


def test_dynamic_partition_overwrite_replaces_one_partition(spark, partitioned_orders, tmp_path):
    from pyspark.sql import functions as F

    # work on a private copy so the module fixture stays pristine
    lake = str(tmp_path / "lake_copy")
    spark.read.parquet(partitioned_orders).write.partitionBy("o_year").parquet(lake)

    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        one_year = spark.read.parquet(lake).filter(F.col("o_year") == 1997)
        before_other = spark.read.parquet(lake).filter(F.col("o_year") == 1998).count()
        # rewrite 1997 with a filtered subset; dynamic mode must leave 1998 alone
        one_year.filter(F.col("o_orderstatus") == "F").write.mode("overwrite").partitionBy(
            "o_year"
        ).parquet(lake)
        after = spark.read.parquet(lake)
        assert after.filter(F.col("o_year") == 1998).count() == before_other
        assert (
            after.filter(F.col("o_year") == 1997).select("o_orderstatus").distinct().collect()[0][0]
            == "F"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
