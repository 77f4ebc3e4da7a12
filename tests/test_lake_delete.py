"""Lake DELETE surface (`lake.delete`, `lake.merge_cdc`): ANSI predicate
semantics, keyed addressing, WHEN-MATCHED-DELETE merge with unmatched
no-op and replay convergence, layout preservation through the rewrite,
time travel to the pre-delete snapshot, and the registered delete-feed /
CDC-aggregate queries vs their DuckDB oracles."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from pgcp_spark.sources import lake
from pgcp_spark.sources.change_feed import (
    _AGG_CDC_ORACLE,
    _DELETE_ORACLE,
    lake_delete_change_feed_orders,
    lake_incremental_agg_orders_cdc,
)
from pgcp_spark.sources.lake import (
    delete,
    merge_cdc,
    read_current,
    table_changes,
    write_snapshot,
)
from tests.conftest import SF_DIR, SF_DIR_CORRECTNESS


def _sorted(rows):
    return sorted(rows, key=lambda t: tuple(map(str, t)))


def _rows(df):
    return _sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def base_table(spark, tmp_path):
    """Keys 1..6; key 5 has a NULL payload so a payload predicate
    evaluates NULL on it (the ANSI DELETE edge)."""
    tdir = str(tmp_path / "t")
    rows = [(k, float(k) if k != 5 else None) for k in range(1, 7)]
    write_snapshot(
        spark.createDataFrame(rows, "k long, x double"), tdir, keep=3
    )
    return tdir


def test_predicate_delete_keeps_false_and_null(spark, base_table):
    """DELETE WHERE p removes rows where p is TRUE; FALSE and NULL rows
    are kept — the rule that stops a retention job from eating rows with
    missing values. x > 3.0 is NULL for key 5 (NULL x), so 5 survives."""
    delete(spark, base_table, predicate=F.col("x") > 3.0, keep=3)
    got = _rows(read_current(spark, base_table))
    assert got == _sorted([(1, 1.0), (2, 2.0), (3, 3.0), (5, None)])


def test_keyed_delete_anti_joins(spark, base_table):
    keys = spark.createDataFrame([(2,), (4,), (99,)], "k long")  # 99: no-op
    delete(spark, base_table, keys=keys, key=["k"], keep=3)
    assert [r.k for r in read_current(spark, base_table).orderBy("k").collect()] == [
        1, 3, 5, 6,
    ]


def test_delete_requires_exactly_one_mode(spark, base_table):
    with pytest.raises(ValueError):
        delete(spark, base_table)
    with pytest.raises(ValueError):
        delete(
            spark,
            base_table,
            predicate=F.col("k") > 0,
            keys=spark.range(1).selectExpr("id as k"),
            key=["k"],
        )
    with pytest.raises(ValueError):  # keys frame without key columns
        delete(spark, base_table, keys=spark.range(1).selectExpr("id as k"))


def test_merge_cdc_update_insert_delete_and_noop(spark, base_table):
    """One CDC batch: key 2 updated, key 7 inserted, key 4 deleted, key
    42 delete-unmatched (must be a no-op, the standard MERGE rule)."""
    batch = spark.createDataFrame(
        [(2, 20.0, "upsert"), (7, 7.0, "upsert"), (4, None, "delete"), (42, None, "delete")],
        "k long, x double, _op string",
    )
    merge_cdc(spark, base_table, batch, key=["k"], keep=3)
    got = _rows(read_current(spark, base_table))
    assert got == _sorted(
        [(1, 1.0), (2, 20.0), (3, 3.0), (5, None), (6, 6.0), (7, 7.0)]
    )
    # replay convergence: at-least-once delivery re-applies the same
    # batch; the keyed rewrite must land on the identical table
    merge_cdc(spark, base_table, batch, key=["k"], keep=3)
    assert _rows(read_current(spark, base_table)) == got


def test_delete_preserves_clustered_layout(spark, tmp_path):
    """A delete on a CLUSTER BY table re-establishes disjoint per-file
    key ranges when the layout is re-declared — same contract as upsert
    (without it the rewrite silently destroys min/max skipping)."""
    import glob as _glob

    import pyarrow.parquet as _pq

    table = str(tmp_path / "t")
    df = spark.range(0, 10_000).selectExpr(
        "pmod(id * 2654435761, 10000) as k", "id as payload"
    )
    write_snapshot(df.repartition(8), table, cluster_by=["k"])
    delete(
        spark,
        table,
        predicate=F.col("payload") % 10 == 0,
        cluster_by=["k"],
        cluster_files=8,  # parallelism floor — AQE would byte-size the
        # small rewrite to one file and the assertion below needs >1
    )

    cur = lake.current_snapshot(table)
    ranges = []
    for f in _glob.glob(os.path.join(table, cur, "*.parquet")):
        md = _pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            los.append(col.statistics.min)
            his.append(col.statistics.max)
        if los:
            ranges.append((min(los), max(his)))
    overlapping = sum(
        1
        for i, (lo, hi) in enumerate(ranges)
        for lo2, hi2 in ranges[i + 1:]
        if lo <= hi2 and lo2 <= hi
    )
    assert overlapping == 0 and len(ranges) > 1
    assert read_current(spark, table).count() == 9_000


def test_delete_time_travel_and_feed(spark, base_table):
    """keep>=2 retains the pre-delete snapshot: time travel still reads
    the deleted rows, and the change feed between the snapshots reports
    exactly the deleted keys as `delete` rows with preimage values."""
    s1 = lake.current_snapshot(base_table)
    delete(spark, base_table, predicate=F.col("k").isin(2, 5), keep=2)
    assert lake.read_snapshot(spark, base_table, s1).count() == 6
    got = _rows(table_changes(spark, base_table, s1, key=["k"]))
    assert got == _sorted([(2, 2.0, "delete"), (5, None, "delete")])


def test_registered_delete_feed_matches_duckdb_oracle(spark):
    got = _rows(lake_delete_change_feed_orders(spark, SF_DIR_CORRECTNESS))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR_CORRECTNESS}/orders.parquet'"
    )
    want = _sorted(tuple(r) for r in con.execute(_DELETE_ORACLE).fetchall())
    assert got == want and len(got) > 0
    # the previously-unreachable feed arm is live: real delete rows
    assert any(r[-1] == "delete" for r in got)


def test_registered_cdc_agg_matches_duckdb_oracle(spark):
    """Fold == recompute with the subtract path fed by REAL delete rows
    (the delete-free original only ever subtracts update_preimages)."""
    got = _rows(lake_incremental_agg_orders_cdc(spark, SF_DIR_CORRECTNESS))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR_CORRECTNESS}/orders.parquet'"
    )
    want = _sorted(tuple(r) for r in con.execute(_AGG_CDC_ORACLE).fetchall())
    assert got == want and len(got) > 0


def test_registered_delete_feed_small_lake(spark):
    df = lake_delete_change_feed_orders(spark, SF_DIR)
    assert df.columns == ["o_orderkey", "o_totalprice", "_change_type"]
    assert df.count() >= 0


def test_vacuum_makes_deleted_data_physically_gone(spark, base_table):
    """The GDPR second half: delete with keep=2 retains the pre-delete
    snapshot (time travel still reads the deleted rows); vacuum(keep=1)
    reclaims it immediately — time travel now raises, the current
    snapshot is untouched, and the log is trimmed."""
    s1 = lake.current_snapshot(base_table)
    delete(spark, base_table, predicate=F.col("k") == 2, keep=2)
    assert lake.read_snapshot(spark, base_table, s1).count() == 6  # still on disk
    removed = lake.vacuum(base_table, keep=1)
    assert removed == [s1]
    with pytest.raises(FileNotFoundError):
        lake.read_snapshot(spark, base_table, s1)
    assert read_current(spark, base_table).count() == 5
    assert lake.history(base_table) == [lake.current_snapshot(base_table)]
    # idempotent: nothing left to reclaim
    assert lake.vacuum(base_table, keep=1) == []


def test_vacuum_on_uncommitted_dir_is_noop(tmp_path):
    assert lake.vacuum(str(tmp_path / "nope")) == []


def test_vacuum_age_guard_spares_inflight_staging_reaps_aged_orphans(
    spark, base_table
):
    """The concurrent-writer edge (round-8 verdict nit): an UNCOMMITTED
    snapshot dir is either a crash orphan or a concurrent write_snapshot
    mid-stage — vacuum disambiguates by age, Delta-retention style. A
    young uncommitted dir survives (possibly in-flight); an old one is
    reaped as a crash orphan; a committed-but-beyond-keep snapshot is
    reaped regardless of age; and orphan_min_age_s=0 restores the
    single-writer force path."""
    import os
    import time

    young = os.path.join(base_table, lake.SNAPSHOT_PREFIX + "staging_young")
    old = os.path.join(base_table, lake.SNAPSHOT_PREFIX + "crash_orphan")
    os.makedirs(young)
    os.makedirs(old)
    past = time.time() - 7200
    os.utime(old, (past, past))

    removed = lake.vacuum(base_table, keep=1)
    assert lake.SNAPSHOT_PREFIX + "crash_orphan" in removed
    assert lake.SNAPSHOT_PREFIX + "staging_young" not in removed
    assert os.path.isdir(young)  # the in-flight stage was spared
    assert not os.path.isdir(old)

    # force path: the sole writer reclaims the young dir immediately
    assert lake.SNAPSHOT_PREFIX + "staging_young" in lake.vacuum(
        base_table, keep=1, orphan_min_age_s=0
    )
    assert not os.path.isdir(young)

    # a committed snapshot beyond keep is reaped even if brand new: its
    # commit proves no writer owns it, so no age guard applies
    s_old = lake.current_snapshot(base_table)
    delete(spark, base_table, predicate=F.col("k") == 1, keep=2)
    assert s_old in lake.vacuum(base_table, keep=1)
