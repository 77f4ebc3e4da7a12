"""CTAS + CSV ingest paths (O15/O16) with a real SparkSession and fake
destination client, plus accuracy checks for approximate aggregates."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pgcp_spark.config import DbConfig
from pgcp_spark.registry import all_queries
from pgcp_spark.sources import load_table
from pgcp_spark.transport import Transport
from tests.conftest import SF_DIR
from tests.test_transport import FakeClient

CFG = DbConfig(host="h", dbname="db", user="u", password="p")


def make_transport(spark, dest):
    writes = []

    def writer(df, staging, options):
        writes.append((str(staging), df.count()))

    tr = Transport(
        spark=spark, src_cfg=CFG, dest_cfg=CFG,
        src_client=FakeClient(), dest_client=dest, writer=writer,
        reader=lambda t, o: None,
    )
    return tr, writes


def test_ctas_materializes_spark_sql(spark):
    load_table(spark, SF_DIR, "region").createOrReplaceTempView("region_v")
    dest = FakeClient()
    tr, writes = make_transport(spark, dest)
    tr.create_table_from_query(
        "SELECT r_regionkey, upper(r_name) AS name_u FROM region_v", "analytics.regions"
    )
    assert writes and writes[0][1] == 5  # 5 regions written
    joined = "\n".join(dest.executed)
    # staging DDL derived from the Spark schema
    assert '"r_regionkey" INTEGER' in joined
    assert '"name_u" TEXT' in joined
    assert dest.transactions and 'RENAME TO "regions"' in dest.transactions[0][-1]


def test_csv_ingest_roundtrip(spark, tmp_path):
    csv = tmp_path / "people.csv"
    csv.write_text("id,name,score\n1,ann,2.5\n2,bob,3.5\n")
    dest = FakeClient()
    tr, writes = make_transport(spark, dest)
    tr.copy_from_csv(str(csv), "public.people", header=True)
    assert writes and writes[0][1] == 2
    joined = "\n".join(dest.executed)
    assert '"id" INTEGER' in joined
    assert '"name" TEXT' in joined
    assert '"score" DOUBLE PRECISION' in joined


def test_approx_count_distinct_within_tolerance(spark):
    qs = all_queries()
    approx = {
        r.o_orderpriority: r.approx_customers
        for r in qs["agg_approx_distinct_customers"].fn(spark, SF_DIR).collect()
    }
    o = load_table(spark, SF_DIR, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / exact[k]
        assert rel_err <= 0.05, f"{k}: approx {approx[k]} vs exact {exact[k]}"


def test_percentile_approx_close_to_exact(spark):
    qs = all_queries()
    rows = qs["percentile_approx_price"].fn(spark, SF_DIR).collect()
    o = load_table(spark, SF_DIR, "orders")
    exact = {
        r.o_orderstatus: r.m
        for r in o.groupBy("o_orderstatus")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("m"))
        .collect()
    }
    for r in rows:
        assert abs(r.approx_median - exact[r.o_orderstatus]) / exact[r.o_orderstatus] < 0.05


def test_jsonl_ingest_roundtrip(spark, tmp_path):
    jl = tmp_path / "people.jsonl"
    jl.write_text(
        '{"id": 1, "name": "ann", "tags": ["x"]}\n'
        '{"id": 2, "name": "bob", "tags": ["y", "z"]}\n'
    )
    dest = FakeClient()
    tr, writes = make_transport(spark, dest)
    tr.copy_from_jsonl(str(jl), "public.people_json")
    assert writes and writes[0][1] == 2
    joined = "\n".join(dest.executed)
    assert '"id" BIGINT' in joined
    assert '"name" TEXT' in joined
    assert dest.transactions and 'RENAME TO "people_json"' in dest.transactions[0][-1]


def test_parquet_ingest_roundtrip(spark, tmp_path):
    src = tmp_path / "people.parquet"
    spark.createDataFrame(
        [(1, "ann", 2.5), (2, "bob", 3.5), (3, "cid", 4.5)], "id long, name string, score double"
    ).write.parquet(str(src))
    dest = FakeClient()
    tr, writes = make_transport(spark, dest)
    tr.copy_from_parquet(str(src), "public.people_pq")
    assert writes and writes[0][1] == 3
    joined = "\n".join(dest.executed)
    assert '"id" BIGINT' in joined
    assert '"score" DOUBLE PRECISION' in joined
    assert dest.transactions and 'RENAME TO "people_pq"' in dest.transactions[0][-1]


def test_orc_ingest_roundtrip(spark, tmp_path):
    src = tmp_path / "people.orc"
    spark.createDataFrame(
        [(1, "ann"), (2, "bob")], "id long, name string"
    ).write.orc(str(src))
    dest = FakeClient()
    tr, writes = make_transport(spark, dest)
    tr.copy_from_orc(str(src), "public.people_orc")
    assert writes and writes[0][1] == 2
    joined = "\n".join(dest.executed)
    assert '"id" BIGINT' in joined
    assert '"name" TEXT' in joined
    assert dest.transactions and 'RENAME TO "people_orc"' in dest.transactions[0][-1]
