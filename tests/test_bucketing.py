"""Bucketed-table co-located join: the zero-shuffle join strategy for
repeated large⋈large joins at scale.

Both sides are written bucketed (and sorted) on the join key with the same
bucket count; Spark's bucketing-aware scan then feeds a SortMergeJoin with
NO shuffle exchange on either side — at 100 TB this is the difference
between re-shuffling both fact tables per query and never shuffling them
at all (the shuffle is paid once, at write time).
"""

from __future__ import annotations

import uuid

import pytest

from pgcp_spark.plans import explain as ex
from pgcp_spark.sources import load_table
from tests.conftest import SF_DIR_CORRECTNESS

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    names = (f"orders_b_{uuid.uuid4().hex[:8]}", f"lineitem_b_{uuid.uuid4().hex[:8]}")
    o = load_table(spark, SF_DIR_CORRECTNESS, "orders")
    l = load_table(spark, SF_DIR_CORRECTNESS, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    (
        o.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(base / "orders"))
        .saveAsTable(names[0])
    )
    (
        l.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(base / "lineitem"))
        .saveAsTable(names[1])
    )
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_shuffles_neither_side(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    j = (
        spark.table(o_name)
        .join(spark.table(l_name), spark.table(o_name).o_orderkey == spark.table(l_name).l_orderkey)
        .select("o_orderkey", "l_quantity")
    )
    assert ex.shuffle_exchange_count(j) == 0, ex.physical_plan(j)[:2000]


def test_bucketed_aggregate_reuses_bucketing(spark, bucketed_tables):
    o_name, _ = bucketed_tables
    agg = spark.table(o_name).groupBy("o_orderkey").count()
    # grouping on the bucket key needs no shuffle either
    assert ex.shuffle_exchange_count(agg) == 0, ex.physical_plan(agg)[:2000]


def test_bucketed_join_matches_unbucketed_result(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    bucketed = (
        spark.table(o_name)
        .join(spark.table(l_name), spark.table(o_name).o_orderkey == spark.table(l_name).l_orderkey)
        .count()
    )
    o = load_table(spark, SF_DIR_CORRECTNESS, "orders")
    l = load_table(spark, SF_DIR_CORRECTNESS, "lineitem")
    plain = o.join(l, o.o_orderkey == l.l_orderkey).count()
    assert bucketed == plain
