"""Change feed between lake snapshots (`lake.table_changes`): keyed
insert/delete/update classification against a hand-built expected set,
bag-diff mode, schema-evolution alignment, NULL-key and no-op contracts,
and the registered query vs its DuckDB oracle (also mimic-checked)."""

from __future__ import annotations

import duckdb
import pytest

from pgcp_spark.sources.lake import table_changes, upsert, write_snapshot
from pgcp_spark.sources.change_feed import (
    _AGG_ORACLE,
    _ORACLE,
    lake_change_feed_orders,
    lake_incremental_agg_orders,
)
from tests.conftest import SF_DIR, SF_DIR_CORRECTNESS


def _sorted(rows):
    # None-tolerant total order (rows may carry NULLs)
    return sorted(rows, key=lambda t: tuple(map(str, t)))


def _rows(df):
    return _sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def versioned_table(spark, tmp_path):
    """v1: keys 1..6. v2 (via upsert): key 7 inserted, keys 2 and 4
    updated (4's change is value-identical — NOT a change), key 5 absent
    from the update batch (carries over unchanged)."""
    tdir = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(k, f"v{k}", float(k)) for k in range(1, 7)], "k long, s string, x double"
    )
    s1 = write_snapshot(v1, tdir, keep=3)
    updates = spark.createDataFrame(
        [(2, "CHANGED", 2.0), (4, "v4", 4.0), (7, "v7", 7.0)],
        "k long, s string, x double",
    )
    upsert(spark, tdir, updates, key=["k"], keep=3)
    return tdir, s1


def test_keyed_changes_classify_exactly(spark, versioned_table):
    tdir, s1 = versioned_table
    got = _rows(table_changes(spark, tdir, s1, key=["k"]))
    assert got == _sorted(
        [
            (2, "v2", 2.0, "update_preimage"),
            (2, "CHANGED", 2.0, "update_postimage"),
            (7, "v7", 7.0, "insert"),
        ]
    )


def test_delete_detection_and_noop(spark, versioned_table):
    tdir, s1 = versioned_table
    from pgcp_spark.sources.lake import current_snapshot, read_current

    s2 = current_snapshot(tdir)
    # v3 drops key 1 entirely (a snapshot overwrite, not a MERGE)
    write_snapshot(read_current(spark, tdir).filter("k <> 1"), tdir, keep=3)
    got = _rows(table_changes(spark, tdir, s2, key=["k"]))
    assert got == [(1, "v1", 1.0, "delete")]
    # identical snapshots -> empty feed
    assert table_changes(spark, tdir, s2, to_snapshot=s2, key=["k"]).count() == 0


def test_bag_diff_without_key(spark, versioned_table):
    tdir, s1 = versioned_table
    got = _rows(table_changes(spark, tdir, s1))
    # an update is a delete+insert pair in bag mode
    assert got == _sorted(
        [
            (2, "v2", 2.0, "delete"),
            (2, "CHANGED", 2.0, "insert"),
            (7, "v7", 7.0, "insert"),
        ]
    )


def test_schema_evolution_alignment(spark, tmp_path):
    """A column added by evolve_schema reads NULL on the old side; the
    carried-over rows whose visible values did not change STILL surface
    as updates (NULL -> NULL is equal under the null-safe compare, but a
    new non-NULL value is a change)."""
    tdir = str(tmp_path / "ev")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    s1 = write_snapshot(v1, tdir, keep=3)
    updates = spark.createDataFrame([(2, "b", 9.0)], "k long, s string, extra double")
    upsert(spark, tdir, updates, key=["k"], keep=3, evolve_schema=True)
    got = _rows(table_changes(spark, tdir, s1, key=["k"]))
    assert got == _sorted(
        [
            (2, "b", None, "update_preimage"),
            (2, "b", 9.0, "update_postimage"),
        ]
    )


def test_null_keys_surface_as_delete_plus_insert(spark, tmp_path):
    tdir = str(tmp_path / "nk")
    v1 = spark.createDataFrame([(None, "x"), (1, "a")], "k long, s string")
    s1 = write_snapshot(v1, tdir, keep=3)
    write_snapshot(
        spark.createDataFrame([(None, "x"), (1, "a")], "k long, s string"),
        tdir,
        keep=3,
    )
    got = _rows(table_changes(spark, tdir, s1, key=["k"]))
    # NULL keys never match across snapshots: the identical NULL-key row
    # is re-stated as delete+insert — the documented keyless-row contract
    assert got == _sorted([(None, "x", "delete"), (None, "x", "insert")])


def test_registered_change_feed_matches_duckdb_oracle(spark):
    got = _rows(lake_change_feed_orders(spark, SF_DIR_CORRECTNESS))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR_CORRECTNESS}/orders.parquet'"
    )
    want = _sorted(tuple(r) for r in con.execute(_ORACLE).fetchall())
    assert got == want and len(got) > 0


def test_incremental_agg_fold_equals_recompute(spark):
    """The CDC consumer: per-customer totals folded forward by deltas
    must equal the oracle's direct aggregate of the post state — the
    fold == recompute proof, decimal-exact."""
    got = _rows(lake_incremental_agg_orders(spark, SF_DIR_CORRECTNESS))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR_CORRECTNESS}/orders.parquet'"
    )
    want = _sorted(tuple(r) for r in con.execute(_AGG_ORACLE).fetchall())
    assert got == want and len(got) > 0


def test_registered_change_feed_small_lake(spark):
    """The sf0.001 lake exercises the same path at minimum scale (and the
    result column order is the driver-stable (key, payload, type))."""
    df = lake_change_feed_orders(spark, SF_DIR)
    assert df.columns == ["o_orderkey", "o_totalprice", "_change_type"]
    assert df.count() >= 0
