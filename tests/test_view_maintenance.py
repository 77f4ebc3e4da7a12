"""Contracts for the incremental JOIN-view maintenance layer
(``sources/view_maintenance.py``): fold == recompute across every CDC
shape on both base tables, all mutations land merge-on-read (base
snapshot untouched), the dim arm's pushed-IN pruning reaches the parquet
scans, replay converges, and flatten retires the deltas bit-exactly."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pgcp_spark.sources.lake import (
    current_snapshot,
    delete,
    delta_names,
    flatten_deltas,
    merge_cdc,
    read_current,
    read_current_with_deltas,
    table_changes,
    upsert,
    write_snapshot,
)
from pgcp_spark.sources.view_maintenance import (
    VIEW_DIM_PUSHDOWN_MAX,
    _pruned_by_keys,
    fold_join_view,
)

VIEW_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def ivm_lake(spark):
    """A fact/dim/view lake exercising every delta-join arm at once:

    dim: keys 1..6; updates key 2, INSERTS keys 7 (childless) and 99
    (matching two pre-existing, view-invisible fact rows), DELETES key 4.
    fact: NULL-custkey rows, custkey-99 rows (childless at build time),
    one CDC batch inserting o13, doubling o1, re-pointing o5→6 and
    o6→404 (missing partner — must leave the view), deleting o2.
    """
    dim_rows = [(k, f"n{k}", f"s{k}") for k in range(1, 7)]
    fact_rows = [
        (1, 1, 10.0), (2, 1, 20.0), (3, 2, 30.0), (4, 2, 40.0),
        (5, 3, 50.0), (6, 3, 60.0), (7, 4, 70.0), (8, 4, 80.0),
        (9, None, 90.0), (10, None, 100.0), (11, 99, 110.0), (12, 99, 120.0),
    ]
    dim = spark.createDataFrame(dim_rows, ["c_custkey", "c_name", "c_mktsegment"])
    fact = spark.createDataFrame(fact_rows, ["o_orderkey", "o_custkey", "o_totalprice"])
    fact_dir = tempfile.mkdtemp(prefix="ivm_t_fact_")
    dim_dir = tempfile.mkdtemp(prefix="ivm_t_dim_")
    view_dir = tempfile.mkdtemp(prefix="ivm_t_view_")
    fact_snap = write_snapshot(fact, fact_dir, keep=2)
    dim_snap = write_snapshot(dim, dim_dir, keep=4)
    view0 = fact.join(
        dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
    ).select(*VIEW_COLS)
    write_snapshot(view0, view_dir, cluster_by=["o_custkey"])

    # --- base-table mutations ---
    dim_mut = spark.createDataFrame(
        [(2, "n2", "s2X"), (7, "n7", "s7"), (99, "n99", "s99")],
        ["c_custkey", "c_name", "c_mktsegment"],
    )
    upsert(spark, dim_dir, dim_mut, key=["c_custkey"], keep=4)
    delete(
        spark,
        dim_dir,
        keys=spark.createDataFrame([(4,)], ["c_custkey"]),
        key=["c_custkey"],
        keep=4,
    )
    batch = spark.createDataFrame(
        [
            (13, 3, 130.0, "upsert"),
            (1, 1, 20.0, "upsert"),
            (5, 6, 50.0, "upsert"),
            (6, 404, 60.0, "upsert"),
            (2, None, None, "delete"),
        ],
        ["o_orderkey", "o_custkey", "o_totalprice", "_op"],
    )
    merge_cdc(spark, fact_dir, batch, key=["o_orderkey"], keep=2)

    yield {
        "fact_dir": fact_dir,
        "dim_dir": dim_dir,
        "view_dir": view_dir,
        "fact_snap": fact_snap,
        "dim_snap": dim_snap,
    }
    for d in (fact_dir, dim_dir, view_dir):
        shutil.rmtree(d, ignore_errors=True)


def _fold(spark, lk):
    fold_join_view(
        spark,
        lk["view_dir"],
        view_key=["o_orderkey"],
        fact_feed=table_changes(spark, lk["fact_dir"], lk["fact_snap"], key=["o_orderkey"]),
        dim_feed=table_changes(spark, lk["dim_dir"], lk["dim_snap"], key=["c_custkey"]),
        dim_current=read_current(spark, lk["dim_dir"]),
        fact_join_col="o_custkey",
        dim_join_col="c_custkey",
        fact_current=read_current(spark, lk["fact_dir"]),
    )


def _recompute(spark, lk):
    fact = read_current(spark, lk["fact_dir"])
    dim = read_current(spark, lk["dim_dir"])
    return fact.join(
        dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
    ).select(*VIEW_COLS)


def test_fold_equals_recompute_and_base_untouched(spark, ivm_lake):
    base_before = current_snapshot(ivm_lake["view_dir"])
    _fold(spark, ivm_lake)
    assert current_snapshot(ivm_lake["view_dir"]) == base_before  # deltas only
    assert delta_names(ivm_lake["view_dir"])  # and they exist
    got = read_current_with_deltas(spark, ivm_lake["view_dir"], key=["o_orderkey"])
    assert _rows(got) == _rows(_recompute(spark, ivm_lake))
    # spot the arms: dim update refreshed o3/o4 to s2X, dim insert pulled
    # the view-invisible o11/o12 in, dim delete dropped o7/o8, fact
    # re-point to missing dim key dropped o6, fact delete dropped o2
    keys = {r[0] for r in got.select("o_orderkey").collect()}
    assert keys == {1, 3, 4, 5, 11, 12, 13}
    segs = {r[0] for r in got.filter(F.col("o_custkey") == 2).select("c_mktsegment").collect()}
    assert segs == {"s2X"}


def test_replay_converges(spark, ivm_lake):
    """At-least-once delivery of the same feeds: a second fold appends
    shadow deltas, and the merge-on-read result is bit-identical."""
    before = _rows(read_current_with_deltas(spark, ivm_lake["view_dir"], key=["o_orderkey"]))
    _fold(spark, ivm_lake)
    after = _rows(read_current_with_deltas(spark, ivm_lake["view_dir"], key=["o_orderkey"]))
    assert after == before


def test_flatten_retires_deltas_bit_exactly(spark, ivm_lake):
    before = _rows(read_current_with_deltas(spark, ivm_lake["view_dir"], key=["o_orderkey"]))
    assert delta_names(ivm_lake["view_dir"])
    flatten_deltas(spark, ivm_lake["view_dir"], key=["o_orderkey"], cluster_by=["o_custkey"])
    assert delta_names(ivm_lake["view_dir"]) == []
    assert _rows(read_current(spark, ivm_lake["view_dir"])) == before


def test_dim_insert_without_fact_current_raises(spark):
    dim = spark.createDataFrame([(1, "n1")], ["c_custkey", "c_name"])
    fact = spark.createDataFrame([(1, 1, 1.0)], ["o_orderkey", "o_custkey", "o_totalprice"])
    dim_dir = tempfile.mkdtemp(prefix="ivm_t_noins_d_")
    view_dir = tempfile.mkdtemp(prefix="ivm_t_noins_v_")
    try:
        snap = write_snapshot(dim, dim_dir, keep=2)
        write_snapshot(
            fact.join(dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey")
            .select("o_orderkey", "o_custkey", "o_totalprice", "c_name"),
            view_dir,
        )
        upsert(spark, dim_dir, spark.createDataFrame([(2, "n2")], dim.columns),
               key=["c_custkey"], keep=2)
        with pytest.raises(ValueError, match="fact_current"):
            fold_join_view(
                spark, view_dir, view_key=["o_orderkey"],
                fact_feed=None,
                dim_feed=table_changes(spark, dim_dir, snap, key=["c_custkey"]),
                dim_current=read_current(spark, dim_dir),
                fact_join_col="o_custkey", dim_join_col="c_custkey",
            )
    finally:
        shutil.rmtree(dim_dir, ignore_errors=True)
        shutil.rmtree(view_dir, ignore_errors=True)


def test_pruned_by_keys_pushes_in_filter(spark, ivm_lake):
    """The dim arm's selector reaches the parquet footers: PushedFilters
    carries the In(o_custkey,…) on the view's base scan AND on pending
    delta scans (here: post-flatten base only — both shapes covered by
    running before the flatten test reorders… the fixture is module-
    scoped, so read whatever state stands and assert every scan)."""
    from pgcp_spark.plans.explain import pushed_filters

    keys_df = spark.createDataFrame([(2,), (3,)], ["c_custkey"])
    view = read_current_with_deltas(spark, ivm_lake["view_dir"], key=["o_orderkey"])
    pruned = _pruned_by_keys(view, "o_custkey", keys_df)
    filters = pushed_filters(pruned)
    assert filters, "expected parquet scans in the pruned view plan"
    scans_with_in = [f for f in filters if "In(o_custkey" in f]
    assert scans_with_in, f"pushed IN missing from every scan: {filters}"


def test_pushdown_probe_is_bounded(spark):
    """A dim delta wider than VIEW_DIM_PUSHDOWN_MAX must NOT be collected:
    the helper returns the frame unfiltered (bounded probe only)."""
    big = spark.range(VIEW_DIM_PUSHDOWN_MAX + 5).select(F.col("id").alias("k"))
    df = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    out = _pruned_by_keys(df, "k", big)
    assert out is df
