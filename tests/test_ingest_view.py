"""Contracts for the streaming materialized-view maintenance loop
(``streaming/ingest_view.py``): the stream-maintained view is invariant
under micro-batch coalescing (ordered sub-batch split), the fact table
it co-maintains matches the view's own key set, and the delete-then-
resurrect arc lands correctly through the tombstone ordering."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from pgcp_spark.sources.lake import read_current_with_deltas
from pgcp_spark.streaming.ingest_view import run_ingest_view

SF = "/root/testdata/sf0.001"


def _view_rows(spark, view_dir):
    return sorted(
        tuple(r)
        for r in read_current_with_deltas(spark, view_dir, key=["o_orderkey"]).collect()
    )


def test_batch_boundary_invariance_and_resurrect(spark):
    """availableNow-in-one-trigger (all three CDC batches in one
    micro-batch) must produce a BIT-IDENTICAL view to batch-at-a-time:
    the handler splits by seq and applies in order, so coalescing cannot
    reorder same-key writes. Also pins the arc semantics: a %77 key
    (deleted in batch 1, re-priced in batch 2) is PRESENT at
    original+1000, and a %35 key (upserted in batch 0, skipped by the
    delete predicate) stays doubled."""
    f1 = v1 = f2 = v2 = None
    try:
        f1, v1 = run_ingest_view(spark, SF, max_files_per_trigger=1)
        f2, v2 = run_ingest_view(spark, SF, max_files_per_trigger=None)
        rows1, rows2 = _view_rows(spark, v1), _view_rows(spark, v2)
        assert rows1 == rows2
        view = {r[0]: r for r in rows1}
        orders = {
            r.o_orderkey: r
            for r in spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .collect()
        }
        custkeys = {
            r.c_custkey
            for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
        }
        res = [k for k in orders if k is not None and k % 77 == 0 and k % 5 != 0
               and orders[k].o_custkey in custkeys]
        assert res, "corpus should contain a resurrectable %77 key"
        for k in res:
            assert k in view, f"deleted-then-reinserted key {k} missing"
            assert view[k][2] == orders[k].o_totalprice + 1000
        kept35 = [k for k in orders if k is not None and k % 35 == 0 and k % 11 != 0
                  and orders[k].o_custkey in custkeys]
        for k in kept35:
            assert view[k][2] == orders[k].o_totalprice * 2
        # fact and view agree on membership (modulo dim-less fact rows)
        fact = read_current_with_deltas(spark, f1, key=["o_orderkey"])
        fact_joinable = {
            r.o_orderkey
            for r in fact.filter(F.col("o_custkey").isNotNull()).collect()
            if r.o_custkey in custkeys
        }
        assert set(view) == fact_joinable
    finally:
        for d in (f1, v1, f2, v2):
            if d:
                shutil.rmtree(d, ignore_errors=True)
