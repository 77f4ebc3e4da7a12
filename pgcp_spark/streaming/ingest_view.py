"""Streaming materialized-view maintenance: the IVM loop.

Completes the per-family streaming story for round 10's incremental
JOIN-view layer (``sources/view_maintenance.py``), the way each index
family got its ingest loop: CDC batches arrive as a stream of files;
each micro-batch (a) applies its batches to the fact's lake table
MERGE-ON-READ (``merge_cdc_delta`` — data delta + tombstone, base
untouched) and (b) folds the SAME batch through ``fold_join_view`` into
the materialized ``fact ⋈ dim`` view, so the view tracks the fact with
CDC-batch latency and no base-table rescans anywhere in the loop.

    readStream(files) ──► foreachBatch, per CDC batch IN SEQ ORDER:
        merge_cdc_delta(fact, batch)           # fact stays current
        fold_join_view(view, batch-as-feed)    # view stays current
        loop.maybe_flatten(view)               # self-healing cadence

Design decisions, inherited from the loop family:

- **A CDC batch is its own change feed.** ``fold_join_view``'s fact arm
  needs only post rows and deleted keys — exactly what a CDC batch
  carries — so the streaming fold never diffs snapshots: upsert rows map
  to ``update_postimage`` (the fold treats insert/postimage identically:
  rebuild against the dim), delete rows to ``delete``.
- **Batch-boundary invariance by ordered sub-batches.** Unlike the
  ingest loops (whose folds are per-key replacement over key-disjoint
  days), consecutive CDC batches legitimately touch the SAME key — a
  later batch re-prices or resurrects a key an earlier one wrote — so
  coalescing two batches into one ``merge_cdc_delta`` call would violate
  its key-unique contract. The handler therefore splits a micro-batch by
  its data-derived ``seq`` and applies each complete batch in seq order
  (files are the source's atomic unit, so every seq present is whole):
  availableNow-in-one-trigger produces a bit-identical view to
  batch-at-a-time (pinned in tests/test_ingest_view.py).
- **At-least-once replay converges**: ``merge_cdc_delta`` replay is
  documented convergent, and the view fold's re-appended deltas shadow
  their twins through newest-wins (the IVM replay pin).

The registered query's end state has a FULL SQL twin — the view after
three sequential CDC batches (price-doubling upserts, retention deletes,
then a re-pricing batch that also RESURRECTS some deleted keys and
inserts outside the base) must hash-match the join of the post-CDC fact
state with the dim, recomputed from the raw tables. A streaming
materialized-view pipeline, driver-checked bit-for-bit.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.indexes import loop
from pgcp_spark.plans.materialize import materialize
from pgcp_spark.plans.overlap import overlap
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table
from pgcp_spark.sources.lake import (
    merge_cdc_delta,
    read_current,
    read_current_with_deltas,
    write_snapshot,
)
from pgcp_spark.sources.view_maintenance import fold_join_view

VIEW_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment"]


def _cdc_batches(orders: DataFrame) -> DataFrame:
    """Three sequential CDC batches over the orders base (%3-filtered):
    seq 0 doubles every 5th key (inserts where the key is outside the
    base), seq 1 deletes every 7th non-5th key, seq 2 re-prices every
    11th key at original+1000 — touching keys seq 0 wrote, RESURRECTING
    %77 keys seq 1 deleted (commit order versions deletes against
    upserts), and inserting %33 keys the base never had."""
    ups5 = (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("_op", F.lit("upsert"))
        .withColumn("seq", F.lit(0))
    )
    dels7 = (
        orders.filter((F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 5 != 0))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("_op", F.lit("delete"))
        .withColumn("seq", F.lit(1))
    )
    ups11 = (
        orders.filter(F.col("o_orderkey") % 11 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("_op", F.lit("upsert"))
        .withColumn("seq", F.lit(2))
    )
    return ups5.unionByName(dels7).unionByName(ups11)


def apply_cdc_batches(
    spark: SparkSession,
    micro_batch: DataFrame,
    fact_dir: str,
    view_dir: str,
    dim: DataFrame,
    after_fold=None,
    on_flatten=None,
    after_batch=None,
) -> None:
    """THE per-seq CDC apply loop, shared by every streaming variant in
    this module (plain view, cascade, MIN/MAX cascade, transactional —
    the four used to be near-identical copies, and their semantic
    equivalence is a contract the shared-oracle hash checks rely on):
    apply every COMPLETE CDC batch in the micro-batch IN SEQ ORDER
    (module docstring: coalesced delivery must split — merge_cdc_delta
    is per-batch key-unique, and later batches overwrite earlier keys),
    landing merge-on-read on the fact and folding the join view; a CDC
    batch is its own change feed (upsert → update_postimage, delete →
    delete). The seq scan is bounded by the number of staged batches.

    Per batch, in this order (matching all four original copies):
    view fold → ``after_fold()`` (the downstream consumer's fold) →
    ``maybe_flatten`` → ``on_flatten()`` iff it fired (watermark
    re-anchoring) → ``after_batch()`` (the transactional variant's
    group publish — it must see post-flatten states).

    ``micro_batch`` must be DETERMINISTIC under re-evaluation (the
    merge_cdc_delta contract): every caller passes either a file-stream
    micro-batch (pinned to specific staged parquet files) or a
    parquet-backed transform, so no checkpoint is taken here (r13
    wave 5 — the former unconditional materialize was one extra job
    per micro-batch; each seq's consumers re-scan the batch-sized
    source instead, and the fold checkpoints its own feed)."""
    # the same ONE distinct-collect job that orders the sub-batches also
    # reads each seq's op presence (r14) — fold_join_view's
    # ``fact_feed_types`` hint then skips the absent arm's write job for
    # one-sided batches (a pure-delete batch used to evaluate the whole
    # rebuild join just to discover it wrote nothing)
    ops_by_seq: dict[int, set[str]] = {}
    for r in micro_batch.select("seq", "_op").distinct().collect():
        ops_by_seq.setdefault(r[0], set()).add(r[1])
    for s in sorted(ops_by_seq):
        b = micro_batch.filter(F.col("seq") == s).drop("seq")
        feed = b.withColumn(
            "_change_type",
            F.when(F.col("_op") == "delete", F.lit("delete")).otherwise(
                F.lit("update_postimage")
            ),
        ).drop("_op")
        feed_types = {
            "delete" if op == "delete" else "update_postimage"
            for op in ops_by_seq[s]
        }
        # Fact landing and view fold run CONCURRENTLY (guide §2.6): both
        # consume the (checkpointed) batch `b`, write DISJOINT tables
        # (fact_dir / view_dir), and nothing downstream in this iteration
        # reads the fact table — the fold's feed IS the batch. overlap()
        # joins both before the next seq, preserving cross-batch order.
        overlap(
            lambda: merge_cdc_delta(
                spark, fact_dir, b, key=["o_orderkey"], ops=ops_by_seq[s]
            ),
            lambda: fold_join_view(
                spark,
                view_dir,
                view_key=["o_orderkey"],
                fact_feed=feed,
                dim_feed=None,
                dim_current=dim,
                fact_join_col="o_custkey",
                dim_join_col="c_custkey",
                fact_feed_types=feed_types,
            ),
        )
        if after_fold is not None:
            after_fold()
        if loop.maybe_flatten(spark, view_dir, key=["o_orderkey"]) is not None:
            if on_flatten is not None:
                on_flatten()
        if after_batch is not None:
            after_batch()


def fold_view_batch(
    spark: SparkSession,
    micro_batch: DataFrame,
    fact_dir: str,
    view_dir: str,
    dim: DataFrame,
) -> None:
    """The plain view-maintenance loop: the shared apply loop with no
    downstream consumer."""
    apply_cdc_batches(spark, micro_batch, fact_dir, view_dir, dim)


def run_ingest_view(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = 1
) -> tuple[str, str]:
    """Build the fact lake + initial view, stream the CDC batches through
    the fold, return (fact_dir, view_dir). The caller owns both dirs.
    ``max_files_per_trigger=None`` coalesces all batches into one
    micro-batch — the ordered sub-batch split must make the final view
    bit-identical (pinned)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    fact_dir = tempfile.mkdtemp(prefix="pgcp_ingest_view_fact_")
    view_dir = tempfile.mkdtemp(prefix="pgcp_ingest_view_view_")
    staging = None
    try:
        view0 = base.join(
            dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).select(*VIEW_COLS)
        batches = _cdc_batches(orders)

        def _stage() -> None:
            # assigns through nonlocal so the finally reclaims a staged
            # dir even when a sibling setup write fails
            nonlocal staging
            staging = loop.stage_group_files(
                batches, F.col("seq"), range(3), "pgcp_ingest_view_stream_"
            )

        overlap(  # fact lake, view lake, CDC staging: independent (§2.6)
            lambda: write_snapshot(base, fact_dir),
            lambda: write_snapshot(view0, view_dir, cluster_by=["o_custkey"]),
            _stage,
        )
        loop.run_availablenow_stream(
            spark,
            staging,
            batches.schema,
            lambda mb, _bid: fold_view_batch(spark, mb, fact_dir, view_dir, dim),
            max_files_per_trigger,
        )
    except BaseException:
        shutil.rmtree(fact_dir, ignore_errors=True)
        shutil.rmtree(view_dir, ignore_errors=True)
        raise
    finally:
        if staging is not None:
            shutil.rmtree(staging, ignore_errors=True)
    return fact_dir, view_dir


_STREAM_VIEW_ORACLE = """
WITH postfact AS (
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1000
                WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                ELSE o_totalprice END AS o_totalprice
    FROM orders
    WHERE o_orderkey % 11 = 0
       OR o_orderkey % 5 = 0
       OR (o_orderkey % 3 <> 0 AND o_orderkey % 7 <> 0)
)
SELECT f.o_orderkey, f.o_custkey, f.o_totalprice, d.c_name, d.c_mktsegment
FROM postfact f JOIN customer d ON f.o_custkey = d.c_custkey
ORDER BY f.o_orderkey
"""


@register(
    "streaming_join_view_maintenance",
    oracle=_STREAM_VIEW_ORACLE,
    doc=(
        "streaming materialized-view maintenance: CDC batches stream in, each "
        "micro-batch lands merge-on-read on the fact AND folds the join view "
        "(delta-join, ordered sub-batches for boundary invariance) — final view "
        "hash-exact vs the post-CDC join recomputed from the raw tables"
    ),
)
def streaming_join_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVM loop end to end (module docstring): stream three
    sequential CDC batches — including same-key overwrites, a
    delete-then-resurrect arc, and out-of-base inserts — and serve the
    view the STREAM maintained, merge-on-read."""
    fact_dir, view_dir = run_ingest_view(spark, sf_dir)
    try:
        result = materialize(
            read_current_with_deltas(spark, view_dir, key=["o_orderkey"]).orderBy(
                "o_orderkey"
            )
        )
    except BaseException:
        shutil.rmtree(fact_dir, ignore_errors=True)
        shutil.rmtree(view_dir, ignore_errors=True)
        raise
    loop.reclaim_by_mode(fact_dir, view_dir)
    return result


# --- streaming CASCADE: aggregate over the stream-maintained view (r11) ----


def fold_agg_view_batch(
    spark: SparkSession,
    micro_batch: DataFrame,
    fact_dir: str,
    view_dir: str,
    agg_dir: str,
    dim: DataFrame,
) -> None:
    """``fold_view_batch`` plus the cascade: after each complete CDC
    batch folds the view, the aggregate folds the view's changes SINCE
    ITS WATERMARK (``state_changes`` — no flatten needed in between),
    and when the self-healing flatten fires the watermark re-anchors
    (``stamp_applied_state``) so the next fold stays on the prefix-
    pruned path. At-least-once replay converges end to end: the view's
    shadow deltas change the STATE id but not the data, so the cascade
    fold sees an empty diff and skips."""
    from pgcp_spark.sources.view_maintenance import (
        fold_agg_join_view,
        stamp_applied_state,
    )

    apply_cdc_batches(
        spark,
        micro_batch,
        fact_dir,
        view_dir,
        dim,
        # RETENTION: the group-manifest reader pins the PREVIOUS
        # publish's agg snapshot, and one publish window can land TWO
        # agg snapshot commits (the fold's upsert + the flatten's
        # re-stamp) — keep must exceed commits-per-publish (the BM25
        # group fold's rule), so keep=3, not the per-table default of 1
        # (which GC'd the pinned snapshot under a racing reader)
        after_fold=lambda: fold_agg_join_view(
            spark, agg_dir, view_dir, ["o_orderkey"], "c_mktsegment",
            "o_totalprice", keep=3,
        ),
        on_flatten=lambda: stamp_applied_state(
            spark, agg_dir, view_dir, keep=3
        ),
    )


def run_ingest_agg_view(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = 1
) -> tuple[str, str, str]:
    """Build fact + view + the stamped aggregate, stream the CDC batches
    through the cascade fold, return (fact_dir, view_dir, agg_dir)."""
    from pgcp_spark.sources.lake import pending_state
    from pgcp_spark.sources.view_maintenance import build_agg_over

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    fact_dir = tempfile.mkdtemp(prefix="pgcp_ingest_casc_fact_")
    view_dir = tempfile.mkdtemp(prefix="pgcp_ingest_casc_view_")
    agg_dir = tempfile.mkdtemp(prefix="pgcp_ingest_casc_agg_")
    staging = None
    try:
        view0 = base.join(
            dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).select(*VIEW_COLS)
        batches = _cdc_batches(orders)

        def _view_then_agg() -> None:
            # agg stamp reads the committed view state — chained
            write_snapshot(view0, view_dir, cluster_by=["o_custkey"])
            write_snapshot(
                build_agg_over(view0, "c_mktsegment", "o_totalprice"),
                agg_dir,
                meta={"applied_view_state": pending_state(view_dir)},
            )

        def _stage() -> None:
            nonlocal staging
            staging = loop.stage_group_files(
                batches, F.col("seq"), range(3), "pgcp_ingest_casc_stream_"
            )

        overlap(  # independent setup segments (§2.6)
            lambda: write_snapshot(base, fact_dir),
            _view_then_agg,
            _stage,
        )
        loop.run_availablenow_stream(
            spark,
            staging,
            batches.schema,
            lambda mb, _bid: fold_agg_view_batch(
                spark, mb, fact_dir, view_dir, agg_dir, dim
            ),
            max_files_per_trigger,
        )
    except BaseException:
        for d in (fact_dir, view_dir, agg_dir):
            shutil.rmtree(d, ignore_errors=True)
        raise
    finally:
        if staging is not None:
            shutil.rmtree(staging, ignore_errors=True)
    return fact_dir, view_dir, agg_dir


_STREAM_AGG_VIEW_ORACLE = """
WITH postfact AS (
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 11 = 0
                    THEN CAST(o_totalprice AS DECIMAL(12,2)) + 1000
                WHEN o_orderkey % 5 = 0
                    THEN CAST(o_totalprice AS DECIMAL(12,2)) * 2
                ELSE CAST(o_totalprice AS DECIMAL(12,2)) END AS p
    FROM orders
    WHERE o_orderkey % 11 = 0
       OR o_orderkey % 5 = 0
       OR (o_orderkey % 3 <> 0 AND o_orderkey % 7 <> 0)
)
SELECT d.c_mktsegment,
       CAST(SUM(f.p) AS DOUBLE) AS sum_mktsegment_total,
       COUNT(*) AS order_cnt
FROM postfact f JOIN customer d ON f.o_custkey = d.c_custkey
WHERE d.c_mktsegment IS NOT NULL
GROUP BY d.c_mktsegment
ORDER BY d.c_mktsegment
"""
# the NOT NULL mirrors build_agg_over's NULL-group-key exclusion (the
# keyed-upsert ANSI contract; caught by the nulls edge lake)


@register(
    "streaming_agg_join_view_maintenance",
    oracle=_STREAM_AGG_VIEW_ORACLE,
    doc=(
        "streaming cascade IVM: CDC batches stream in, each micro-batch lands "
        "merge-on-read on the fact, folds the join view, AND folds the "
        "per-segment aggregate from the view's state-diff feed (watermarked — "
        "no flatten coupling; re-anchored when the self-healing flatten fires) "
        "— final aggregate hash-exact vs the post-CDC aggregated join "
        "recomputed from the raw tables"
    ),
)
def streaming_agg_join_view_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full streaming cascade end to end: three sequential CDC
    batches — same-key overwrites, delete-then-resurrect, out-of-base
    inserts — maintain fact, join view, AND the per-segment aggregate,
    and the served aggregate is the STREAM's fold, never a recompute."""
    from pgcp_spark.sources.view_maintenance import read_agg

    fact_dir, view_dir, agg_dir = run_ingest_agg_view(spark, sf_dir)
    try:
        result = materialize(
            read_agg(spark, agg_dir, "c_mktsegment").orderBy("c_mktsegment")
        )
    except BaseException:
        for d in (fact_dir, view_dir, agg_dir):
            shutil.rmtree(d, ignore_errors=True)
        raise
    loop.reclaim_by_mode(fact_dir, view_dir, agg_dir)
    return result


# --- streaming MIN/MAX cascade (round 12): the non-signed twin -------------


def fold_minmax_view_batch(
    spark: SparkSession,
    micro_batch: DataFrame,
    fact_dir: str,
    view_dir: str,
    agg_dir: str,
    dim: DataFrame,
) -> None:
    """``fold_agg_view_batch`` with the MIN/MAX fold as the downstream
    consumer: after each complete CDC batch folds the view, the min/max
    aggregate folds the view's changes since ITS watermark — inserts via
    least/greatest, bound-tying removals rescanning only their groups
    through the view (``fold_minmax_join_view``); the self-healing
    flatten re-anchors the watermark exactly like the signed twin."""
    from pgcp_spark.sources.view_maintenance import (
        fold_minmax_join_view,
        stamp_applied_state,
    )

    apply_cdc_batches(
        spark,
        micro_batch,
        fact_dir,
        view_dir,
        dim,
        # RETENTION: same keep-exceeds-commits-per-publish rule as the
        # signed transactional variant above
        after_fold=lambda: fold_minmax_join_view(
            spark, agg_dir, view_dir, ["o_orderkey"], "c_mktsegment",
            "o_totalprice", keep=3,
        ),
        on_flatten=lambda: stamp_applied_state(
            spark, agg_dir, view_dir, keep=3
        ),
    )


def run_ingest_minmax_view(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = 1
) -> tuple[str, str, str]:
    """Build fact + view + the stamped MIN/MAX aggregate, stream the CDC
    batches through the fold, return (fact_dir, view_dir, agg_dir)."""
    from pgcp_spark.sources.lake import pending_state
    from pgcp_spark.sources.view_maintenance import build_minmax_over

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    fact_dir = tempfile.mkdtemp(prefix="pgcp_ingest_mm_fact_")
    view_dir = tempfile.mkdtemp(prefix="pgcp_ingest_mm_view_")
    agg_dir = tempfile.mkdtemp(prefix="pgcp_ingest_mm_agg_")
    staging = None
    try:
        view0 = base.join(
            dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).select(*VIEW_COLS)
        batches = _cdc_batches(orders)

        def _view_then_agg() -> None:
            # agg stamp reads the committed view state — chained
            write_snapshot(view0, view_dir, cluster_by=["o_custkey"])
            write_snapshot(
                build_minmax_over(view0, "c_mktsegment", "o_totalprice"),
                agg_dir,
                meta={"applied_view_state": pending_state(view_dir)},
            )

        def _stage() -> None:
            nonlocal staging
            staging = loop.stage_group_files(
                batches, F.col("seq"), range(3), "pgcp_ingest_mm_stream_"
            )

        overlap(  # independent setup segments (§2.6)
            lambda: write_snapshot(base, fact_dir),
            _view_then_agg,
            _stage,
        )
        loop.run_availablenow_stream(
            spark,
            staging,
            batches.schema,
            lambda mb, _bid: fold_minmax_view_batch(
                spark, mb, fact_dir, view_dir, agg_dir, dim
            ),
            max_files_per_trigger,
        )
    except BaseException:
        for d in (fact_dir, view_dir, agg_dir):
            shutil.rmtree(d, ignore_errors=True)
        raise
    finally:
        if staging is not None:
            shutil.rmtree(staging, ignore_errors=True)
    return fact_dir, view_dir, agg_dir


_STREAM_MINMAX_VIEW_ORACLE = """
WITH postfact AS (
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 11 = 0
                    THEN CAST(o_totalprice AS DECIMAL(12,2)) + 1000
                WHEN o_orderkey % 5 = 0
                    THEN CAST(o_totalprice AS DECIMAL(12,2)) * 2
                ELSE CAST(o_totalprice AS DECIMAL(12,2)) END AS p
    FROM orders
    WHERE o_orderkey % 11 = 0
       OR o_orderkey % 5 = 0
       OR (o_orderkey % 3 <> 0 AND o_orderkey % 7 <> 0)
)
SELECT d.c_mktsegment,
       CAST(MIN(f.p) AS DOUBLE) AS min_total,
       CAST(MAX(f.p) AS DOUBLE) AS max_total,
       COUNT(*) AS order_cnt
FROM postfact f JOIN customer d ON f.o_custkey = d.c_custkey
WHERE d.c_mktsegment IS NOT NULL
GROUP BY d.c_mktsegment
ORDER BY d.c_mktsegment
"""


@register(
    "streaming_minmax_join_view_maintenance",
    oracle=_STREAM_MINMAX_VIEW_ORACLE,
    doc=(
        "streaming MIN/MAX cascade: CDC batches stream in, each micro-batch "
        "lands merge-on-read on the fact, folds the join view, AND folds the "
        "per-segment min/max from the view's state-diff feed — deletes and "
        "re-pricings rescan only bound-tying groups through the view; final "
        "aggregate hash-exact vs min/max recomputed from the post-CDC join"
    ),
)
def streaming_minmax_join_view_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The MIN/MAX cascade as a streaming loop — the signed twin's
    delete-then-resurrect and re-pricing arcs are exactly the shapes
    that force selective rescans, and the served bounds are the
    STREAM's fold, never a recompute."""
    from pgcp_spark.sources.view_maintenance import read_minmax_agg

    fact_dir, view_dir, agg_dir = run_ingest_minmax_view(spark, sf_dir)
    try:
        result = materialize(
            read_minmax_agg(spark, agg_dir, "c_mktsegment").orderBy(
                "c_mktsegment"
            )
        )
    except BaseException:
        for d in (fact_dir, view_dir, agg_dir):
            shutil.rmtree(d, ignore_errors=True)
        raise
    loop.reclaim_by_mode(fact_dir, view_dir, agg_dir)
    return result


# --- streaming cascade THROUGH the group commit (round 12) -----------------
# The r11 loop above lands per-micro-batch commits per table: a reader
# between the fact's delta commit and the agg's fold commit sees
# fact-advanced/agg-stale — exactly the torn window ``sources/txn.py``
# retires for batch transactions. This variant makes each complete CDC
# batch ONE group transaction: the per-table writes land first (invisible
# to manifest-resolved readers), then one ``occ_commit_group`` publishes
# the {fact, view, agg} post states atomically — a ``read_group`` reader
# racing the stream observes only batch-consistent trios (pinned in
# tests/test_ingest_view.py), and the served result is the manifest's.


def fold_agg_view_batch_txn(
    spark: SparkSession,
    micro_batch: DataFrame,
    gdir: str,
    dim: DataFrame,
) -> None:
    """``fold_agg_view_batch`` with the trio commit routed through the
    group manifest, one transaction per complete CDC batch. The stream
    is the group's single writer, so ``occ_commit_group``'s compute just
    captures the three live post states; the CAS still guards against an
    operator accidentally racing a second owner (detect, never lose)."""
    import os

    from pgcp_spark.sources.txn import occ_commit_group, table_state
    from pgcp_spark.sources.view_maintenance import (
        fold_agg_join_view,
        stamp_applied_state,
    )

    fact_dir = os.path.join(gdir, "fact")
    view_dir = os.path.join(gdir, "view")
    agg_dir = os.path.join(gdir, "agg")
    apply_cdc_batches(
        spark,
        micro_batch,
        fact_dir,
        view_dir,
        dim,
        # RETENTION: the group-manifest reader pins the PREVIOUS
        # publish's agg snapshot, and one publish window can land TWO
        # agg snapshot commits (the fold's upsert + the flatten's
        # re-stamp) — keep must exceed commits-per-publish (the BM25
        # group fold's rule), so keep=3, not the per-table default of 1
        # (which GC'd the pinned snapshot under a racing reader)
        after_fold=lambda: fold_agg_join_view(
            spark, agg_dir, view_dir, ["o_orderkey"], "c_mktsegment",
            "o_totalprice", keep=3,
        ),
        on_flatten=lambda: stamp_applied_state(
            spark, agg_dir, view_dir, keep=3
        ),
        # the publish runs LAST so the manifest pins post-flatten states
        after_batch=lambda: occ_commit_group(
            gdir,
            lambda _state: {
                n: table_state(gdir, n) for n in ("fact", "view", "agg")
            },
        ),
    )


def run_ingest_agg_view_txn(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = 1
) -> str:
    """Build the {fact, view, agg} group (initial states group-committed),
    stream the CDC batches through the transactional cascade fold, and
    return the group dir (caller owns it)."""
    import os

    from pgcp_spark.sources.lake import pending_state
    from pgcp_spark.sources.txn import commit_group, table_state
    from pgcp_spark.sources.view_maintenance import build_agg_over

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    gdir = tempfile.mkdtemp(prefix="pgcp_ingest_txn_casc_")
    staging = None
    try:
        view0 = base.join(
            dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).select(*VIEW_COLS)
        batches = _cdc_batches(orders)

        def _view_then_agg() -> None:
            # agg stamp reads the committed view state — chained
            write_snapshot(
                view0, os.path.join(gdir, "view"), cluster_by=["o_custkey"], keep=2
            )
            write_snapshot(
                build_agg_over(view0, "c_mktsegment", "o_totalprice"),
                os.path.join(gdir, "agg"),
                keep=2,
                meta={"applied_view_state": pending_state(os.path.join(gdir, "view"))},
            )

        def _stage() -> None:
            nonlocal staging
            staging = loop.stage_group_files(
                batches, F.col("seq"), range(3), "pgcp_ingest_txn_casc_stream_"
            )

        overlap(  # independent setup segments (§2.6)
            lambda: write_snapshot(base, os.path.join(gdir, "fact"), keep=2),
            _view_then_agg,
            _stage,
        )
        # the group manifest needs all three member states — after the join
        commit_group(
            gdir, {n: table_state(gdir, n) for n in ("fact", "view", "agg")}
        )
        loop.run_availablenow_stream(
            spark,
            staging,
            batches.schema,
            lambda mb, _bid: fold_agg_view_batch_txn(spark, mb, gdir, dim),
            max_files_per_trigger,
        )
    except BaseException:
        shutil.rmtree(gdir, ignore_errors=True)
        raise
    finally:
        if staging is not None:
            shutil.rmtree(staging, ignore_errors=True)
    return gdir


@register(
    "streaming_cascade_group_commit",
    oracle=_STREAM_AGG_VIEW_ORACLE,
    doc=(
        "streaming cascade IVM through the cross-table atomic commit: each CDC "
        "batch lands fact delta + view fold + aggregate fold, then publishes "
        "the trio as ONE group-manifest transaction — a read_group reader "
        "racing the stream sees only batch-consistent states (pinned in "
        "tests), and the served aggregate is the final manifest's; same "
        "oracle as the per-table streaming cascade, so a hash match proves "
        "the atomic routing changes nothing about the result"
    ),
)
def streaming_cascade_group_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming cascade with every batch published atomically: the
    same three sequential CDC batches as the per-table loop, but served
    through the manifest-pinned group read — the end state must be
    hash-identical to the non-transactional stream's."""
    from pgcp_spark.sources.txn import read_group
    from pgcp_spark.sources.view_maintenance import serve_agg

    gdir = run_ingest_agg_view_txn(spark, sf_dir)
    try:
        pinned = read_group(spark, gdir, {"agg": ["c_mktsegment"]})
        result = materialize(
            serve_agg(pinned["agg"], "c_mktsegment").orderBy("c_mktsegment")
        )
    except BaseException:
        shutil.rmtree(gdir, ignore_errors=True)
        raise
    loop.reclaim_by_mode(gdir)
    return result


def fold_minmax_view_batch_txn(
    spark: SparkSession,
    micro_batch: DataFrame,
    gdir: str,
    dim: DataFrame,
) -> None:
    """The MIN/MAX cascade through the group commit — PURE COMPOSITION
    (round 13): ``fold_minmax_view_batch``'s after_fold/on_flatten hooks
    with ``fold_agg_view_batch_txn``'s after_batch publish, through the
    one shared ``apply_cdc_batches`` loop. Nothing minmax-specific
    touches the transactional plumbing and nothing transactional touches
    the fold — proving the group commit is fold-agnostic is exactly this
    function being hook-wiring only."""
    import os

    from pgcp_spark.sources.txn import occ_commit_group, table_state
    from pgcp_spark.sources.view_maintenance import (
        fold_minmax_join_view,
        stamp_applied_state,
    )

    fact_dir = os.path.join(gdir, "fact")
    view_dir = os.path.join(gdir, "view")
    agg_dir = os.path.join(gdir, "agg")
    apply_cdc_batches(
        spark,
        micro_batch,
        fact_dir,
        view_dir,
        dim,
        # RETENTION: same keep-exceeds-commits-per-publish rule as the
        # signed transactional variant above
        after_fold=lambda: fold_minmax_join_view(
            spark, agg_dir, view_dir, ["o_orderkey"], "c_mktsegment",
            "o_totalprice", keep=3,
        ),
        on_flatten=lambda: stamp_applied_state(
            spark, agg_dir, view_dir, keep=3
        ),
        # the publish runs LAST so the manifest pins post-flatten states
        after_batch=lambda: occ_commit_group(
            gdir,
            lambda _state: {
                n: table_state(gdir, n) for n in ("fact", "view", "agg")
            },
        ),
    )


def run_ingest_minmax_view_txn(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = 1
) -> str:
    """Build the {fact, view, minmax-agg} group (initial states
    group-committed), stream the CDC batches through the transactional
    MIN/MAX cascade, return the group dir (caller owns it)."""
    import os

    from pgcp_spark.sources.lake import pending_state
    from pgcp_spark.sources.txn import commit_group, table_state
    from pgcp_spark.sources.view_maintenance import build_minmax_over

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    gdir = tempfile.mkdtemp(prefix="pgcp_ingest_txn_mm_")
    staging = None
    try:
        view0 = base.join(
            dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).select(*VIEW_COLS)
        batches = _cdc_batches(orders)

        def _view_then_agg() -> None:
            # agg stamp reads the committed view state — chained
            write_snapshot(
                view0, os.path.join(gdir, "view"), cluster_by=["o_custkey"], keep=2
            )
            write_snapshot(
                build_minmax_over(view0, "c_mktsegment", "o_totalprice"),
                os.path.join(gdir, "agg"),
                keep=2,
                meta={"applied_view_state": pending_state(os.path.join(gdir, "view"))},
            )

        def _stage() -> None:
            nonlocal staging
            staging = loop.stage_group_files(
                batches, F.col("seq"), range(3), "pgcp_ingest_txn_mm_stream_"
            )

        overlap(  # independent setup segments (§2.6)
            lambda: write_snapshot(base, os.path.join(gdir, "fact"), keep=2),
            _view_then_agg,
            _stage,
        )
        # the group manifest needs all three member states — after the join
        commit_group(
            gdir, {n: table_state(gdir, n) for n in ("fact", "view", "agg")}
        )
        loop.run_availablenow_stream(
            spark,
            staging,
            batches.schema,
            lambda mb, _bid: fold_minmax_view_batch_txn(spark, mb, gdir, dim),
            max_files_per_trigger,
        )
    except BaseException:
        shutil.rmtree(gdir, ignore_errors=True)
        raise
    finally:
        if staging is not None:
            shutil.rmtree(staging, ignore_errors=True)
    return gdir


@register(
    "streaming_minmax_cascade_group_commit",
    oracle=_STREAM_MINMAX_VIEW_ORACLE,
    doc=(
        "streaming MIN/MAX cascade through the cross-table atomic commit: each "
        "CDC batch lands fact delta + view fold + min/max fold (bound-tying "
        "removals rescan only their groups), then publishes the trio as ONE "
        "group-manifest transaction; same oracle as the per-table MIN/MAX "
        "stream, so a hash match proves the atomic routing is fold-agnostic"
    ),
)
def streaming_minmax_cascade_group_commit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The fourth streaming variant (round 13): the non-distributive
    MIN/MAX fold composed with the group publish, served through the
    manifest-pinned group read — end state must be hash-identical to
    ``streaming_minmax_join_view_maintenance``."""
    from pgcp_spark.sources.txn import read_group
    from pgcp_spark.sources.view_maintenance import serve_minmax

    gdir = run_ingest_minmax_view_txn(spark, sf_dir)
    try:
        pinned = read_group(spark, gdir, {"agg": ["c_mktsegment"]})
        result = materialize(
            serve_minmax(pinned["agg"], "c_mktsegment").orderBy("c_mktsegment")
        )
    except BaseException:
        shutil.rmtree(gdir, ignore_errors=True)
        raise
    loop.reclaim_by_mode(gdir)
    return result


# --- streaming COUNT DISTINCT cascade (round 13) ---------------------------


def fold_distinct_view_batch(
    spark: SparkSession,
    micro_batch: DataFrame,
    fact_dir: str,
    view_dir: str,
    sup_dir: str,
    agg_dir: str,
    dim: DataFrame,
) -> None:
    """``fold_agg_view_batch`` with the exact-COUNT-DISTINCT fold as the
    downstream consumer: after each complete CDC batch folds the view,
    the support table folds the view's multiplicity deltas and the
    distinct count folds the 0-to-present / present-to-0 transitions
    (``fold_distinct_join_view``) — deletes exact from the support's own
    evidence, no rescan, the view never re-read. The self-healing
    flatten re-anchors BOTH stored tables' watermarks."""
    from pgcp_spark.sources.view_maintenance import (
        fold_distinct_join_view,
        stamp_applied_state,
    )

    def _restamp() -> None:
        # two independent tables re-anchoring to the same committed view
        # state — overlapped (§2.6)
        overlap(
            lambda: stamp_applied_state(spark, sup_dir, view_dir),
            lambda: stamp_applied_state(spark, agg_dir, view_dir),
        )

    apply_cdc_batches(
        spark,
        micro_batch,
        fact_dir,
        view_dir,
        dim,
        after_fold=lambda: fold_distinct_join_view(
            spark, sup_dir, agg_dir, view_dir, ["o_orderkey"],
            "c_mktsegment", "c_name",
        ),
        on_flatten=_restamp,
    )


def run_ingest_distinct_view(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = 1
) -> tuple[str, str, str, str]:
    """Build fact + view + the stamped support/distinct-agg pair, stream
    the CDC batches through the fold, return (fact, view, support, agg)
    dirs."""
    from pgcp_spark.sources.lake import pending_state
    from pgcp_spark.sources.view_maintenance import (
        build_distinct_over,
        build_distinct_support,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    fact_dir = tempfile.mkdtemp(prefix="pgcp_ingest_dst_fact_")
    view_dir = tempfile.mkdtemp(prefix="pgcp_ingest_dst_view_")
    sup_dir = tempfile.mkdtemp(prefix="pgcp_ingest_dst_sup_")
    agg_dir = tempfile.mkdtemp(prefix="pgcp_ingest_dst_agg_")
    staging = None
    try:
        view0 = base.join(
            dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).select(*VIEW_COLS)
        batches = _cdc_batches(orders)

        def _view_then_aggs() -> None:
            # both stamps read the committed view state; support and agg
            # are independent tables — view first, then the two overlapped
            write_snapshot(view0, view_dir, cluster_by=["o_custkey"])
            state0 = pending_state(view_dir)
            overlap(
                lambda: write_snapshot(
                    build_distinct_support(view0, "c_mktsegment", "c_name"),
                    sup_dir,
                    cluster_by=["c_mktsegment"],
                    meta={"applied_view_state": state0},
                ),
                lambda: write_snapshot(
                    build_distinct_over(view0, "c_mktsegment", "c_name"),
                    agg_dir,
                    meta={"applied_view_state": state0},
                ),
            )

        def _stage() -> None:
            nonlocal staging
            staging = loop.stage_group_files(
                batches, F.col("seq"), range(3), "pgcp_ingest_dst_stream_"
            )

        overlap(  # independent setup segments (§2.6)
            lambda: write_snapshot(base, fact_dir),
            _view_then_aggs,
            _stage,
        )
        loop.run_availablenow_stream(
            spark,
            staging,
            batches.schema,
            lambda mb, _bid: fold_distinct_view_batch(
                spark, mb, fact_dir, view_dir, sup_dir, agg_dir, dim
            ),
            max_files_per_trigger,
        )
    except BaseException:
        for d in (fact_dir, view_dir, sup_dir, agg_dir):
            shutil.rmtree(d, ignore_errors=True)
        raise
    finally:
        if staging is not None:
            shutil.rmtree(staging, ignore_errors=True)
    return fact_dir, view_dir, sup_dir, agg_dir


_STREAM_DISTINCT_VIEW_ORACLE = """
WITH postfact AS (
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_orderkey % 11 = 0
       OR o_orderkey % 5 = 0
       OR (o_orderkey % 3 <> 0 AND o_orderkey % 7 <> 0)
)
SELECT d.c_mktsegment, COUNT(DISTINCT d.c_name) AS distinct_cnt
FROM postfact f JOIN customer d ON f.o_custkey = d.c_custkey
WHERE d.c_mktsegment IS NOT NULL AND d.c_name IS NOT NULL
GROUP BY d.c_mktsegment
ORDER BY d.c_mktsegment
"""


@register(
    "streaming_distinct_join_view_maintenance",
    oracle=_STREAM_DISTINCT_VIEW_ORACLE,
    doc=(
        "streaming exact-COUNT-DISTINCT cascade: CDC batches stream in, each "
        "micro-batch lands merge-on-read on the fact, folds the join view, "
        "AND folds per-segment distinct active customers via the multiplicity "
        "support table — a delete that removes a customer's last order in a "
        "segment decrements the count exactly, from the support's own "
        "evidence; final aggregate hash-exact vs COUNT(DISTINCT) recomputed "
        "from the post-CDC join"
    ),
)
def streaming_distinct_join_view_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The COUNT DISTINCT cascade as a streaming loop — the delete-then-
    resurrect arc (%77 keys deleted in seq 1, re-priced back in seq 2)
    drives the same (segment, customer) pair through present-to-0 and
    back to 0-to-present across micro-batches, and the served counts
    are the STREAM's fold, never a recompute."""
    from pgcp_spark.sources.view_maintenance import read_distinct_agg

    dirs = run_ingest_distinct_view(spark, sf_dir)
    try:
        result = materialize(
            read_distinct_agg(spark, dirs[3], "c_mktsegment").orderBy(
                "c_mktsegment"
            )
        )
    except BaseException:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
        raise
    loop.reclaim_by_mode(*dirs)
    return result


# --- distinct cascade THROUGH the group commit (round 13) ------------------
# The first transactional fold whose downstream state is TWO tables: the
# group is {fact, view, support, agg} — a FOUR-member manifest — and one
# publish pins the quartet. Proves the group commit is arity-agnostic as
# well as fold-agnostic: the support/agg pair's own two-commit crash
# protocol stays intact per table, while the manifest makes the pair
# (and the view and fact) mutually consistent for readers.


def fold_distinct_view_batch_txn(
    spark: SparkSession,
    micro_batch: DataFrame,
    gdir: str,
    dim: DataFrame,
) -> None:
    """``fold_distinct_view_batch``'s hooks composed with the group
    publish through the shared ``apply_cdc_batches`` loop — hook wiring
    only, like the signed and MIN/MAX transactional variants. keep=3 on
    every downstream commit: the support takes ONE commit and the agg
    one-or-two (fold + flatten re-stamp) per publish window, and the
    pinned previous-publish snapshots must survive all of them."""
    import os

    from pgcp_spark.sources.txn import occ_commit_group, table_state
    from pgcp_spark.sources.view_maintenance import (
        fold_distinct_join_view,
        stamp_applied_state,
    )

    fact_dir = os.path.join(gdir, "fact")
    view_dir = os.path.join(gdir, "view")
    sup_dir = os.path.join(gdir, "support")
    agg_dir = os.path.join(gdir, "agg")

    def _restamp() -> None:
        # two independent tables re-anchoring to the same committed view
        # state — overlapped (§2.6)
        overlap(
            lambda: stamp_applied_state(spark, sup_dir, view_dir, keep=3),
            lambda: stamp_applied_state(spark, agg_dir, view_dir, keep=3),
        )

    apply_cdc_batches(
        spark,
        micro_batch,
        fact_dir,
        view_dir,
        dim,
        after_fold=lambda: fold_distinct_join_view(
            spark, sup_dir, agg_dir, view_dir, ["o_orderkey"],
            "c_mktsegment", "c_name", keep=3,
        ),
        on_flatten=_restamp,
        after_batch=lambda: occ_commit_group(
            gdir,
            lambda _state: {
                n: table_state(gdir, n)
                for n in ("fact", "view", "support", "agg")
            },
        ),
    )


def run_ingest_distinct_view_txn(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = 1
) -> str:
    """Build the {fact, view, support, agg} group (initial states
    group-committed), stream the CDC batches through the transactional
    distinct cascade, return the group dir (caller owns it)."""
    import os

    from pgcp_spark.sources.lake import pending_state
    from pgcp_spark.sources.txn import commit_group, table_state
    from pgcp_spark.sources.view_maintenance import (
        build_distinct_over,
        build_distinct_support,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    gdir = tempfile.mkdtemp(prefix="pgcp_ingest_txn_dst_")
    staging = None
    try:
        view0 = base.join(
            dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).select(*VIEW_COLS)

        def _view_then_aggs() -> None:
            # both stamps read the committed view state; support and agg
            # are independent tables — view first, then the two overlapped
            write_snapshot(
                view0, os.path.join(gdir, "view"), cluster_by=["o_custkey"], keep=2
            )
            state0 = pending_state(os.path.join(gdir, "view"))
            overlap(
                lambda: write_snapshot(
                    build_distinct_support(view0, "c_mktsegment", "c_name"),
                    os.path.join(gdir, "support"),
                    cluster_by=["c_mktsegment"],
                    keep=2,
                    meta={"applied_view_state": state0},
                ),
                lambda: write_snapshot(
                    build_distinct_over(view0, "c_mktsegment", "c_name"),
                    os.path.join(gdir, "agg"),
                    keep=2,
                    meta={"applied_view_state": state0},
                ),
            )

        overlap(  # independent setup segments (§2.6)
            lambda: write_snapshot(base, os.path.join(gdir, "fact"), keep=2),
            _view_then_aggs,
        )
        commit_group(
            gdir,
            {n: table_state(gdir, n) for n in ("fact", "view", "support", "agg")},
        )
        batches = _cdc_batches(orders)
        staging = loop.stage_group_files(
            batches, F.col("seq"), range(3), "pgcp_ingest_txn_dst_stream_"
        )
        loop.run_availablenow_stream(
            spark,
            staging,
            batches.schema,
            lambda mb, _bid: fold_distinct_view_batch_txn(spark, mb, gdir, dim),
            max_files_per_trigger,
        )
    except BaseException:
        shutil.rmtree(gdir, ignore_errors=True)
        raise
    finally:
        if staging is not None:
            shutil.rmtree(staging, ignore_errors=True)
    return gdir


@register(
    "streaming_distinct_cascade_group_commit",
    oracle=_STREAM_DISTINCT_VIEW_ORACLE,
    doc=(
        "streaming exact-COUNT-DISTINCT cascade through the cross-table atomic "
        "commit: each CDC batch lands fact delta + view fold + support fold + "
        "distinct-count fold, then publishes the FOUR-member quartet as ONE "
        "group-manifest transaction — the first fold with two downstream "
        "tables, proving the group commit arity-agnostic; same oracle as the "
        "per-table distinct stream, so the hash proves the routing changes "
        "nothing"
    ),
)
def streaming_distinct_cascade_group_commit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The fifth streaming variant: the support-table fold composed with
    the group publish, served through the manifest-pinned group read —
    end state must be hash-identical to
    ``streaming_distinct_join_view_maintenance``."""
    from pgcp_spark.sources.txn import read_group
    from pgcp_spark.sources.view_maintenance import serve_distinct

    gdir = run_ingest_distinct_view_txn(spark, sf_dir)
    try:
        pinned = read_group(spark, gdir, {"agg": ["c_mktsegment"]})
        result = materialize(
            serve_distinct(pinned["agg"], "c_mktsegment").orderBy(
                "c_mktsegment"
            )
        )
    except BaseException:
        shutil.rmtree(gdir, ignore_errors=True)
        raise
    loop.reclaim_by_mode(gdir)
    return result


# read_current is imported for tests (post-stream fact state assertions)
__all__ = [
    "apply_cdc_batches",
    "fold_view_batch",
    "fold_agg_view_batch",
    "fold_agg_view_batch_txn",
    "fold_minmax_view_batch_txn",
    "fold_distinct_view_batch",
    "fold_distinct_view_batch_txn",
    "run_ingest_view",
    "run_ingest_agg_view",
    "run_ingest_agg_view_txn",
    "run_ingest_minmax_view_txn",
    "run_ingest_distinct_view",
    "run_ingest_distinct_view_txn",
    "streaming_join_view_maintenance",
    "streaming_agg_join_view_maintenance",
    "streaming_cascade_group_commit",
    "streaming_minmax_cascade_group_commit",
    "read_current",
]
