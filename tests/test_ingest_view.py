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


# --- streaming cascade (round 11) -------------------------------------------


def _agg_rows(spark, agg_dir):
    from pgcp_spark.sources.view_maintenance import read_agg

    return sorted(
        tuple(r) for r in read_agg(spark, agg_dir, "c_mktsegment").collect()
    )


def test_cascade_boundary_invariance(spark):
    """Coalesced delivery (all CDC batches in ONE micro-batch) must
    leave the cascade's aggregate bit-identical to batch-at-a-time —
    the fold's watermarked state-diff makes batching invisible."""
    from pgcp_spark.streaming.ingest_view import run_ingest_agg_view

    dirs_a = run_ingest_agg_view(spark, SF, max_files_per_trigger=1)
    dirs_b = run_ingest_agg_view(spark, SF, max_files_per_trigger=None)
    try:
        assert _agg_rows(spark, dirs_a[2]) == _agg_rows(spark, dirs_b[2])
        assert _agg_rows(spark, dirs_a[2])
    finally:
        for d in dirs_a + dirs_b:
            shutil.rmtree(d, ignore_errors=True)


def test_cascade_replay_converges_and_matches_recompute(spark):
    """At-least-once: replaying a CDC batch through the cascade fold
    appends shadow view deltas (new state id, same data) — the agg fold
    must see an EMPTY state diff and skip, leaving the aggregate equal
    to a recompute from the post fact state."""
    from pgcp_spark.sources import load_table
    from pgcp_spark.sources.lake import read_current
    from pgcp_spark.sources.view_maintenance import build_agg_over
    from pgcp_spark.streaming.ingest_view import (
        fold_agg_view_batch,
        run_ingest_agg_view,
    )

    fact_dir, view_dir, agg_dir = run_ingest_agg_view(spark, SF)
    try:
        before = _agg_rows(spark, agg_dir)
        # replay the LAST CDC batch (seq 2) verbatim
        orders = load_table(spark, SF, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        dim = load_table(spark, SF, "customer").select(
            "c_custkey", "c_name", "c_mktsegment"
        )
        replay = (
            orders.filter(F.col("o_orderkey") % 11 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") + 1000)
            .withColumn("_op", F.lit("upsert"))
            .withColumn("seq", F.lit(2))
        )
        fold_agg_view_batch(spark, replay, fact_dir, view_dir, agg_dir, dim)
        assert _agg_rows(spark, agg_dir) == before
        # and the whole cascade equals a recompute of the aggregated join
        view = read_current_with_deltas(spark, view_dir, key=["o_orderkey"])
        want = sorted(
            (r.c_mktsegment, float(r.sum_dec), r.order_cnt)
            for r in build_agg_over(view, "c_mktsegment", "o_totalprice").collect()
        )
        got = [(g, float(sv), c) for g, sv, c in _agg_rows(spark, agg_dir)]
        assert got == want
    finally:
        for d in (fact_dir, view_dir, agg_dir):
            shutil.rmtree(d, ignore_errors=True)


# --- streaming cascade through the group commit (round 12) ------------------


def test_txn_stream_reader_sees_only_batch_consistent_trios(spark):
    """THE pin for the transactional streaming cascade: a read_group
    reader racing the stream resolves the manifest once per observation
    and must find view == fact ⋈ dim AND agg == groupBy(view) EVERY
    time — the per-table loop's fact-advanced/agg-stale window is
    structurally gone. End state must equal the per-table cascade's
    (the registered query shares its oracle; here we pin the recompute)."""
    import threading

    from pgcp_spark.sources import load_table
    from pgcp_spark.sources.txn import read_group
    from pgcp_spark.sources.view_maintenance import build_agg_over, serve_agg
    from pgcp_spark.streaming.ingest_view import run_ingest_agg_view_txn

    dim = load_table(spark, SF, "customer").select("c_custkey", "c_name", "c_mktsegment")
    keys = {"fact": ["o_orderkey"], "view": ["o_orderkey"], "agg": ["c_mktsegment"]}
    torn: list[str] = []
    stop = threading.Event()
    gdir_holder: list[str] = []
    started = threading.Event()

    def reader():
        started.wait(timeout=30)
        while not stop.is_set():
            if not gdir_holder:
                continue
            try:
                _observe()
            except Exception as exc:  # noqa: BLE001 — a died reader must
                # FAIL the test (a GC'd pin under keep=1 killed the
                # thread silently and passed it vacuously — the exact
                # hazard the keep-exceeds-commits-per-publish rule fixes)
                torn.append(f"reader died: {exc}")
                return
            if torn:
                return

    def _observe():
            dfs = read_group(spark, gdir_holder[0], keys)
            want_view = sorted(
                tuple(r)
                for r in dfs["fact"]
                .join(dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey")
                .select("o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment")
                .collect()
            )
            got_view = sorted(tuple(r) for r in dfs["view"].collect())
            if got_view != want_view:
                torn.append("view != fact join dim under the manifest")
                return
            want_agg = sorted(
                tuple(r)
                for r in build_agg_over(dfs["view"], "c_mktsegment", "o_totalprice")
                .filter(F.col("order_cnt") > 0)
                .collect()
            )
            got_agg = sorted(
                tuple(r) for r in dfs["agg"].filter(F.col("order_cnt") > 0).collect()
            )
            if got_agg != want_agg:
                torn.append("agg != groupBy(view) under the manifest")
                return

    # patch the builder to expose gdir to the reader as soon as the
    # initial group commit lands: run_ingest_agg_view_txn builds then
    # streams, so we start the reader right away and let it spin on the
    # manifest as the transactions land
    import pgcp_spark.streaming.ingest_view as iv

    orig = iv.fold_agg_view_batch_txn

    def hooked(spark_, mb, gdir, dim_):
        if not gdir_holder:
            gdir_holder.append(gdir)
            started.set()
        return orig(spark_, mb, gdir, dim_)

    t = threading.Thread(target=reader)
    t.start()
    iv.fold_agg_view_batch_txn = hooked
    gdir = None
    try:
        gdir = run_ingest_agg_view_txn(spark, SF)
    finally:
        iv.fold_agg_view_batch_txn = orig
        stop.set()
        t.join()
    try:
        assert not torn, torn[0]
        # end state: served agg equals the recompute from the pinned view
        pinned = read_group(spark, gdir, keys)
        got = sorted(
            tuple(r) for r in serve_agg(pinned["agg"], "c_mktsegment").collect()
        )
        want = sorted(
            tuple(r)
            for r in serve_agg(
                build_agg_over(pinned["view"], "c_mktsegment", "o_totalprice"),
                "c_mktsegment",
            ).collect()
        )
        assert got == want and got
    finally:
        if gdir:
            shutil.rmtree(gdir, ignore_errors=True)


def test_minmax_cascade_boundary_invariance(spark):
    """The MIN/MAX streaming cascade: coalesced delivery (all CDC
    batches in ONE micro-batch) must leave the served bounds
    bit-identical to batch-at-a-time — the watermarked state-diff plus
    the selective rescan make batching invisible, exactly like the
    signed twin."""
    from pgcp_spark.sources.view_maintenance import read_minmax_agg
    from pgcp_spark.streaming.ingest_view import run_ingest_minmax_view

    def mm_rows(agg_dir):
        return sorted(
            tuple(r)
            for r in read_minmax_agg(spark, agg_dir, "c_mktsegment").collect()
        )

    dirs_a = run_ingest_minmax_view(spark, SF, max_files_per_trigger=1)
    dirs_b = run_ingest_minmax_view(spark, SF, max_files_per_trigger=None)
    try:
        assert mm_rows(dirs_a[2]) == mm_rows(dirs_b[2])
        assert mm_rows(dirs_a[2])
    finally:
        for d in dirs_a + dirs_b:
            shutil.rmtree(d, ignore_errors=True)


def test_txn_minmax_stream_reader_sees_only_batch_consistent_trios(spark):
    """Round 13: the racing-reader pin extended to the MIN/MAX trio — the
    group commit is fold-agnostic, so a read_group reader racing the
    transactional MIN/MAX cascade must find view == fact ⋈ dim AND
    minmax-agg == min/max(groupBy(view)) on EVERY observation, and the
    end state must equal the recompute from the pinned view."""
    import threading

    from pgcp_spark.sources import load_table
    from pgcp_spark.sources.txn import read_group
    from pgcp_spark.sources.view_maintenance import build_minmax_over, serve_minmax
    from pgcp_spark.streaming.ingest_view import run_ingest_minmax_view_txn

    dim = load_table(spark, SF, "customer").select("c_custkey", "c_name", "c_mktsegment")
    keys = {"fact": ["o_orderkey"], "view": ["o_orderkey"], "agg": ["c_mktsegment"]}
    torn: list[str] = []
    stop = threading.Event()
    gdir_holder: list[str] = []
    started = threading.Event()

    def reader():
        started.wait(timeout=30)
        while not stop.is_set():
            if not gdir_holder:
                continue
            try:
                _observe()
            except Exception as exc:  # noqa: BLE001 — a died reader must
                # FAIL the test (a GC'd pin under keep=1 killed the
                # thread silently and passed it vacuously — the exact
                # hazard the keep-exceeds-commits-per-publish rule fixes)
                torn.append(f"reader died: {exc}")
                return
            if torn:
                return

    def _observe():
            dfs = read_group(spark, gdir_holder[0], keys)
            want_view = sorted(
                tuple(r)
                for r in dfs["fact"]
                .join(dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey")
                .select("o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment")
                .collect()
            )
            got_view = sorted(tuple(r) for r in dfs["view"].collect())
            if got_view != want_view:
                torn.append("view != fact join dim under the manifest")
                return
            want_agg = sorted(
                tuple(r)
                for r in build_minmax_over(dfs["view"], "c_mktsegment", "o_totalprice")
                .filter(F.col("order_cnt") > 0)
                .collect()
            )
            got_agg = sorted(
                tuple(r) for r in dfs["agg"].filter(F.col("order_cnt") > 0).collect()
            )
            if got_agg != want_agg:
                torn.append("minmax agg != min/max(groupBy(view)) under the manifest")
                return

    import pgcp_spark.streaming.ingest_view as iv

    orig = iv.fold_minmax_view_batch_txn

    def hooked(spark_, mb, gdir, dim_):
        if not gdir_holder:
            gdir_holder.append(gdir)
            started.set()
        return orig(spark_, mb, gdir, dim_)

    t = threading.Thread(target=reader)
    t.start()
    iv.fold_minmax_view_batch_txn = hooked
    gdir = None
    try:
        gdir = run_ingest_minmax_view_txn(spark, SF)
    finally:
        iv.fold_minmax_view_batch_txn = orig
        stop.set()
        t.join()
    try:
        assert not torn, torn[0]
        pinned = read_group(spark, gdir, keys)
        got = sorted(
            tuple(r) for r in serve_minmax(pinned["agg"], "c_mktsegment").collect()
        )
        want = sorted(
            tuple(r)
            for r in serve_minmax(
                build_minmax_over(pinned["view"], "c_mktsegment", "o_totalprice"),
                "c_mktsegment",
            ).collect()
        )
        assert got == want and got
    finally:
        if gdir:
            shutil.rmtree(gdir, ignore_errors=True)


def test_txn_minmax_end_state_matches_per_table_stream(spark):
    """The composition proof the shared oracle relies on, pinned locally
    too: the transactional MIN/MAX stream's served bounds equal the
    per-table MIN/MAX stream's, bit for bit."""
    import os

    from pgcp_spark.sources.txn import read_group
    from pgcp_spark.sources.view_maintenance import read_minmax_agg, serve_minmax
    from pgcp_spark.streaming.ingest_view import (
        run_ingest_minmax_view,
        run_ingest_minmax_view_txn,
    )

    dirs = run_ingest_minmax_view(spark, SF)
    gdir = run_ingest_minmax_view_txn(spark, SF)
    try:
        per_table = sorted(
            tuple(r)
            for r in read_minmax_agg(spark, dirs[2], "c_mktsegment").collect()
        )
        pinned = read_group(spark, gdir, {"agg": ["c_mktsegment"]})
        txn = sorted(
            tuple(r) for r in serve_minmax(pinned["agg"], "c_mktsegment").collect()
        )
        assert per_table == txn and txn
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(gdir, ignore_errors=True)


def test_distinct_cascade_boundary_invariance_and_support_identity(spark):
    """Round 13: the COUNT DISTINCT streaming cascade — coalesced
    delivery must leave the served counts bit-identical to
    batch-at-a-time (the watermarked state-diff makes batching
    invisible), and after the stream the agg must equal its own
    support rollup AND the recompute from the maintained view (the
    crash-repair identity holding live)."""
    from pgcp_spark.sources.lake import read_current
    from pgcp_spark.sources.view_maintenance import (
        build_distinct_over,
        distinct_agg_from_support,
        read_distinct_agg,
    )
    from pgcp_spark.streaming.ingest_view import run_ingest_distinct_view

    def dst_rows(agg_dir):
        return sorted(
            tuple(r)
            for r in read_distinct_agg(spark, agg_dir, "c_mktsegment").collect()
        )

    dirs_a = run_ingest_distinct_view(spark, SF, max_files_per_trigger=1)
    dirs_b = run_ingest_distinct_view(spark, SF, max_files_per_trigger=None)
    try:
        got = dst_rows(dirs_a[3])
        assert got == dst_rows(dirs_b[3]) and got
        sup = read_current(spark, dirs_a[2])
        assert got == sorted(
            tuple(r)
            for r in distinct_agg_from_support(sup, "c_mktsegment").collect()
        )
        view = read_current_with_deltas(spark, dirs_a[1], key=["o_orderkey"])
        assert got == sorted(
            tuple(r)
            for r in build_distinct_over(view, "c_mktsegment", "c_name")
            .filter(F.col("distinct_cnt") > 0)
            .collect()
        )
    finally:
        for d in dirs_a + dirs_b:
            shutil.rmtree(d, ignore_errors=True)


def test_txn_distinct_stream_reader_sees_consistent_quartet(spark):
    """Round 13: the racing-reader pin for the FOUR-member group — on
    every observation a read_group reader must find view == fact ⋈ dim,
    agg == COUNT DISTINCT over the pinned view, AND agg == the rollup of
    the pinned support (the two downstream tables are mutually
    consistent under the manifest even though they commit separately
    inside the batch)."""
    import threading

    from pgcp_spark.sources import load_table
    from pgcp_spark.sources.txn import read_group
    from pgcp_spark.sources.view_maintenance import (
        build_distinct_over,
        distinct_agg_from_support,
        serve_distinct,
    )
    from pgcp_spark.streaming.ingest_view import run_ingest_distinct_view_txn

    dim = load_table(spark, SF, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    keys = {
        "fact": ["o_orderkey"],
        "view": ["o_orderkey"],
        "support": ["c_mktsegment", "c_name"],
        "agg": ["c_mktsegment"],
    }
    torn: list[str] = []
    stop = threading.Event()
    gdir_holder: list[str] = []
    started = threading.Event()

    def reader():
        started.wait(timeout=30)
        while not stop.is_set():
            if not gdir_holder:
                continue
            try:
                _observe()
            except Exception as exc:  # noqa: BLE001 — reader death fails
                torn.append(f"reader died: {exc}")
                return
            if torn:
                return

    def _observe():
        dfs = read_group(spark, gdir_holder[0], keys)
        want_view = sorted(
            tuple(r)
            for r in dfs["fact"]
            .join(dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey")
            .select(
                "o_orderkey", "o_custkey", "o_totalprice", "c_name",
                "c_mktsegment",
            )
            .collect()
        )
        got_view = sorted(tuple(r) for r in dfs["view"].collect())
        if got_view != want_view:
            torn.append("view != fact join dim under the manifest")
            return
        want_agg = sorted(
            tuple(r)
            for r in build_distinct_over(dfs["view"], "c_mktsegment", "c_name")
            .filter(F.col("distinct_cnt") > 0)
            .collect()
        )
        got_agg = sorted(
            tuple(r) for r in serve_distinct(dfs["agg"], "c_mktsegment").collect()
        )
        if got_agg != want_agg:
            torn.append("distinct agg != COUNT DISTINCT over the pinned view")
            return
        from_support = sorted(
            tuple(r)
            for r in distinct_agg_from_support(
                dfs["support"], "c_mktsegment"
            ).collect()
        )
        if got_agg != from_support:
            torn.append("agg != support rollup under the manifest")
            return

    import pgcp_spark.streaming.ingest_view as iv

    orig = iv.fold_distinct_view_batch_txn

    def hooked(spark_, mb, gdir, dim_):
        if not gdir_holder:
            gdir_holder.append(gdir)
            started.set()
        return orig(spark_, mb, gdir, dim_)

    t = threading.Thread(target=reader)
    t.start()
    iv.fold_distinct_view_batch_txn = hooked
    gdir = None
    try:
        gdir = run_ingest_distinct_view_txn(spark, SF)
    finally:
        iv.fold_distinct_view_batch_txn = orig
        stop.set()
        t.join()
    try:
        assert not torn, torn[0]
        pinned = read_group(spark, gdir, keys)
        got = sorted(
            tuple(r)
            for r in serve_distinct(pinned["agg"], "c_mktsegment").collect()
        )
        want = sorted(
            tuple(r)
            for r in build_distinct_over(
                pinned["view"], "c_mktsegment", "c_name"
            )
            .filter(F.col("distinct_cnt") > 0)
            .collect()
        )
        assert got == want and got
    finally:
        if gdir:
            shutil.rmtree(gdir, ignore_errors=True)
