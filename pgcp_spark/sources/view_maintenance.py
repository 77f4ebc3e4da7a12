"""Incremental maintenance of a materialized JOIN view (round 10).

The lakehouse layer already maintains persisted AGGREGATES from a change
feed without rescanning the fact table (``change_feed._run_incremental_agg``
— insert/postimage adds, delete/preimage subtracts). This module completes
the incremental-view-maintenance (IVM) story for the other workhorse view
shape: a materialized equi-JOIN ``V = fact ⋈ dim``, maintained from BOTH
base tables' change feeds with the classic delta-join decomposition

    ΔV  =  Δfact ⋈ dim_post   ∪   (V ⋉ Δdim refreshed)

applied in dim-then-fact order so every fact-touched key is rebuilt
against the POST dim state (a key appearing in both arms resolves to the
fact arm — it commits later and the delta layer's newest-wins rule keeps
exactly that row). Neither arm ever rescans a base table:

  - the FACT arm joins only the feed's batch-sized post rows against the
    current dim (AQE promotes to broadcast for dimension-sized right
    sides); deletes propagate as O(keys) tombstones;
  - the DIM arm finds affected view rows from the VIEW ITSELF — the
    materialized join is the index that answers "which fact rows point at
    this dim key" without touching the fact table. When the dim delta is
    small (the overwhelmingly common shape — probed with a bounded
    ``limit(n).count()``, never a full count), its key list is pushed as
    an IN filter into the view scan, so a view laid out CLUSTER BY the
    dim key reads only affected files (footer min/max skipping — the
    same pushed-IN + layout contract as the BM25 postings reads).

All view mutations land MERGE-ON-READ (``append_delta`` /
``delete_delta``): the view's base snapshot is never rewritten by a fold,
making maintenance O(changed rows) end to end; ``flatten_deltas`` applies
them physically on the compaction cadence exactly like the index
families. At 100 TB this is the shape that keeps a denormalized serving
table fresh for the price of the CDC batch, not the join.

Public method anchors: delta-join IVM is textbook (Blakeley et al.
SIGMOD'86 "Efficiently Updating Materialized Views"; DBSP/Materialize are
the modern engines of the same rule). Reference anchor: none — the
reference has no views; this extends its O15 materialize-query seam.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.indexes.loop import reclaim_by_mode
from pgcp_spark.plans.materialize import materialize
from pgcp_spark.plans.overlap import overlap
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table
from pgcp_spark.sources.lake import (
    append_delta,
    current_snapshot,
    delete_delta,
    merge_cdc,
    read_current,
    read_current_with_deltas,
    table_changes,
    upsert,
    write_snapshot,
)

# Above this many distinct dim-delta keys the pushed-IN literal list stops
# paying (giant IN lists bloat codegen and the filter no longer prunes
# meaningfully); the fold then falls back to the plain keyed join and lets
# AQE pick the strategy. Probed with limit(n+1).count() — bounded work on
# an arbitrarily large delta, the ANN_LEG_EXACT_BELOW probe discipline.
VIEW_DIM_PUSHDOWN_MAX = 1024

_POST_TYPES = ("insert", "update_postimage")


def _collected_keys(keys_df: DataFrame) -> list | None:
    """Bounded driver-side key-list probe: ONE ``limit(n+1).collect()``
    job both sizes the list and delivers it (guide §1.2 — this runs
    inside every fold); the ≤1025 collected single-column rows dedup
    driver-side, NULLs dropped (NULL never matches an IN list or a key
    join). Returns the sorted values when they fit the bound, else None —
    the caller then falls back to the distributed join path, so an
    arbitrarily large delta never collects or counts fully."""
    rows = keys_df.limit(VIEW_DIM_PUSHDOWN_MAX + 1).collect()
    if len(rows) > VIEW_DIM_PUSHDOWN_MAX:
        return None
    return sorted({r[0] for r in rows} - {None})


def _pruned_by_keys(df: DataFrame, col: str, keys_df: DataFrame) -> DataFrame:
    """Push ``col IN (keys)`` into ``df``'s scans when the key list is
    small (bounded ``limit(n+1)`` probe — never a full count or shuffle of
    an arbitrarily large delta), else return ``df`` unfiltered and let the
    downstream join handle selection. The pushed IN reaches the parquet
    footers of the base AND any pending delta scans (plan-pinned in
    tests/test_view_maintenance.py), so a table laid out CLUSTER BY
    ``col`` reads only affected files."""
    keys = _collected_keys(keys_df)
    if not keys:  # unbounded (None) or empty — decline the pushdown
        return df
    return df.filter(F.col(col).isin(keys))


def fold_join_view(
    spark: SparkSession,
    view_dir: str,
    view_key: list[str],
    fact_feed: DataFrame | None,
    dim_feed: DataFrame | None,
    dim_current: DataFrame,
    fact_join_col: str,
    dim_join_col: str,
    fact_current: DataFrame | None = None,
    fact_feed_types: set[str] | None = None,
) -> None:
    """Fold one maintenance cycle of ``V = fact ⋈_{fact_join_col =
    dim_join_col} dim`` into the view at ``view_dir`` (keyed by
    ``view_key``, the fact's primary key) from the two change feeds.

    ``fact_feed`` / ``dim_feed`` are ``lake.table_changes`` frames (either
    may be None when that side didn't change); ``dim_current`` is the POST
    dim state. Dim arm first, fact arm second — commit order makes the
    fact arm win on keys both arms touch (see module docstring).

    ``fact_current`` is required only when the dim feed carries INSERTS:
    an inserted dim key can give pre-existing fact rows a join partner
    they never had, and those rows are invisible to the view (the inner
    join dropped them) — the one delta-join arm that genuinely needs a
    fact lookup. It stays O(inserted keys) on a fact laid out CLUSTER BY
    the join key: the inserted-key list is pushed as an IN filter into
    the fact scan (same bounded-probe discipline as the dim arm).
    Omitting ``fact_current`` while the feed carries inserts raises —
    silently publishing a stale view is the one failure mode IVM exists
    to prevent.
    """
    view_cols = read_current(spark, view_dir).columns
    if dim_feed is not None:
        dim_feed = materialize(dim_feed)  # consumed by 3 arms' probes + joins
        # ONE change-type presence probe over the checkpointed feed (r14,
        # guide §1.2): replaces the dim_ins.isEmpty() job AND lets arms
        # whose change type is ABSENT from the feed skip their delta-write
        # job entirely (a feed of pure update pairs — the common dim shape
        # — used to pay a tombstone write just to discover it was empty).
        # Exactness: type-absent ⇒ that arm's frame is empty by
        # construction; type-present arms keep write-then-decide, which
        # covers the present-but-empty-after-join case.
        present = {
            r[0] for r in dim_feed.select("_change_type").distinct().collect()
        }
        arm_writes = []
        if "update_postimage" in present:
            dim_post = dim_feed.filter(
                F.col("_change_type") == "update_postimage"
            ).drop("_change_type")
            view = _pruned_by_keys(
                read_current_with_deltas(spark, view_dir, key=view_key),
                fact_join_col,
                dim_post.select(dim_join_col),
            )
            # WRITE-THEN-DECIDE on every arm (r13 optimization, guide
            # §1.2): the delta write is the arm's ONLY evaluation —
            # emptiness comes free from the written parquet footers
            # (append_delta skip_if_empty), replacing the isEmpty probe
            # that re-ran the arm's whole join pipeline before each write
            refreshed = (
                view.drop(*[c for c in dim_post.columns if c != dim_join_col])
                .join(
                    dim_post.withColumnRenamed(dim_join_col, fact_join_col),
                    on=fact_join_col,
                )
                .select(*view_cols)
            )
            arm_writes.append(
                lambda: append_delta(refreshed, view_dir, skip_if_empty=True)
            )
        # inserted dim keys: their matching fact rows are NOT in the view —
        # pruned fact lookup (docstring), pushed-IN when the key list is small
        if "insert" in present:
            if fact_current is None:
                raise ValueError(
                    "dim feed carries inserts: fold_join_view needs fact_current "
                    "to find their (view-invisible) fact matches"
                )
            dim_ins = dim_feed.filter(F.col("_change_type") == "insert").drop(
                "_change_type"
            )
            fact = _pruned_by_keys(
                fact_current, fact_join_col, dim_ins.select(dim_join_col)
            )
            matched = fact.join(
                dim_ins.withColumnRenamed(dim_join_col, fact_join_col),
                on=fact_join_col,
            ).select(*view_cols)
            arm_writes.append(
                lambda: append_delta(matched, view_dir, skip_if_empty=True)
            )
        # dim deletes orphan their fact rows out of an INNER-join view
        if "delete" in present:
            dim_dead = dim_feed.filter(F.col("_change_type") == "delete").select(
                F.col(dim_join_col).alias(fact_join_col)
            )
            arm_writes.append(
                lambda: delete_delta(
                    dim_dead, view_dir, key=[fact_join_col], skip_if_empty=True
                )
            )
        # The three dim-arm writes run CONCURRENTLY (guide §2.6): a change
        # feed carries each dim key exactly once, so the updated/inserted/
        # deleted key sets are disjoint and newest-wins MOR resolution is
        # indifferent to their relative delta-log order; the `view` frame
        # pinned its delta list at construction, so a concurrent sibling
        # commit cannot leak into the refresh read. overlap() joins all
        # three before returning — the fact arm below still commits
        # strictly after the whole dim arm (its rows must win shared keys).
        overlap(*arm_writes)
    if fact_feed is not None:
        # ``fact_feed_types`` (r14): the EXACT set of ``_change_type``
        # values present in the feed, when the caller already knows it —
        # the streaming loop reads per-seq op presence off the same
        # distinct-collect job that orders its sub-batches, so a
        # one-sided batch (pure deletes, pure upserts) skips the absent
        # arm's write job instead of evaluating it to emptiness. None =
        # unknown: both arms evaluate, write-then-decide as before.
        has_post = fact_feed_types is None or bool(
            fact_feed_types & set(_POST_TYPES)
        )
        has_del = fact_feed_types is None or "delete" in fact_feed_types
        if not (has_post or has_del):
            return
        fact_feed = materialize(fact_feed)  # consumed by both arms
        dim_renamed = dim_current.withColumnRenamed(dim_join_col, fact_join_col)
        post = fact_feed.filter(F.col("_change_type").isin(*_POST_TYPES)).drop(
            "_change_type"
        )
        rebuilt = post.join(dim_renamed, on=fact_join_col).select(*view_cols)
        # Rows that must LEAVE the view: fact deletes, plus updates/inserts
        # whose post row found no dim partner (an update can re-point at a
        # missing key). Tombstoning every touched key would also kill the
        # rebuilt rows just appended (tombstones kill all earlier writes) —
        # and the keyed feed carries each key as exactly one of insert /
        # delete / update pre+post, so the dead set is DERIVABLE without
        # reading the rebuilt delta back: delete keys ∪ post keys with NO
        # dim partner (one batch-sized anti-join against the dim). That
        # makes the two writes key-disjoint AND independent, so they run
        # CONCURRENTLY (guide §2.6, the merge_cdc_delta argument: disjoint
        # key sets through newest-wins make their log order immaterial) —
        # replacing the r12 shape (rebuilt write → read it back → tombstone
        # write, a 2-action serial chain) with one overlapped pair.
        # NULL-join-key post rows land in `dead` (NULL matches nothing in
        # the anti-join), exactly as the read-back left them; NULL view
        # keys yield inert tombstones either way (NULL matches no row).
        dels = fact_feed.filter(F.col("_change_type") == "delete").select(
            *view_key
        )
        nomatch = post.join(
            dim_renamed.select(fact_join_col), on=fact_join_col, how="left_anti"
        ).select(*view_key)
        # presence-pruned dead set: a type the hint rules out contributes
        # no rows by construction, so its branch drops from the plan —
        # and a post-free feed skips the rebuilt write job entirely
        if has_post and has_del:
            dead = dels.unionByName(nomatch)
        elif has_post:
            dead = nomatch
        else:
            dead = dels
        fact_writes = []
        if has_post:
            fact_writes.append(
                lambda: append_delta(rebuilt, view_dir, skip_if_empty=True)
            )
        fact_writes.append(
            lambda: delete_delta(
                dead, view_dir, key=view_key, skip_if_empty=True
            )
        )
        overlap(*fact_writes)


_JOIN_VIEW_ORACLE = """
WITH postfact AS (
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice * 2
    FROM orders WHERE o_orderkey % 5 = 0
),
postdim AS (
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment || '_R'
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer
)
SELECT f.o_orderkey, f.o_custkey, f.o_totalprice, d.c_name, d.c_mktsegment
FROM postfact f JOIN postdim d ON f.o_custkey = d.c_custkey
ORDER BY f.o_orderkey
"""


@register(
    "lake_incremental_join_view_orders",
    oracle=_JOIN_VIEW_ORACLE,
    doc=(
        "incremental materialized JOIN-view maintenance: orders ⋈ customer kept "
        "fresh from BOTH tables' change feeds by the delta-join rule (dim arm "
        "refreshes affected view rows found via the view itself + pushed-IN; fact "
        "arm rebuilds feed rows against the post dim), all mutations landing as "
        "merge-on-read deltas with the view's base snapshot untouched — oracle "
        "recomputes the join from the post state, so a hash match proves "
        "fold == recompute"
    ),
)
def lake_incremental_join_view_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVM cycle on driver-checkable data. Base fact = orders
    keys with ``o_orderkey % 3 != 0`` (o_orderkey, o_custkey,
    o_totalprice); dim = customer (c_custkey, c_name, c_mktsegment);
    view = fact ⋈ dim on custkey, written CLUSTER BY o_custkey (the
    dim-arm pruning layout) and keyed by o_orderkey.

    Mutations: the dim upserts a new ``c_mktsegment || '_R'`` for every
    10th customer; the fact applies the repo's standard CDC batch (every
    5th key upserted with doubled total — an insert where the key is
    outside the base — every 7th non-5th key deleted, the %21 keys
    proving the unmatched-delete no-op). The fold consumes ONLY the two
    change feeds and the stored view; the view's base snapshot is
    asserted untouched (explicit raise), so the result the driver hashes
    was served merge-on-read across the fold's own deltas. NULL-custkey
    facts and childless dim keys drop out of the INNER join identically
    on both engines.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    base_fact = orders.filter(F.col("o_orderkey") % 3 != 0)
    fact_dir = tempfile.mkdtemp(prefix="pgcp_ivm_fact_")
    dim_dir = tempfile.mkdtemp(prefix="pgcp_ivm_dim_")
    view_dir = tempfile.mkdtemp(prefix="pgcp_ivm_view_")

    def _cleanup() -> None:
        for d in (fact_dir, dim_dir, view_dir):
            shutil.rmtree(d, ignore_errors=True)

    try:
        view0 = base_fact.join(
            dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).select("o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment")
        # setup writes land three INDEPENDENT tables — overlapped (§2.6)
        fact_snap, dim_snap, _ = overlap(
            lambda: write_snapshot(base_fact, fact_dir, keep=2),
            lambda: write_snapshot(dim, dim_dir, keep=2),
            lambda: write_snapshot(view0, view_dir, cluster_by=["o_custkey"]),
        )
        view_base = current_snapshot(view_dir)

        # --- mutations on the base tables ---
        dim_updates = dim.filter(F.col("c_custkey") % 10 == 0).withColumn(
            "c_mktsegment", F.concat(F.col("c_mktsegment"), F.lit("_R"))
        )
        ups = (
            orders.filter(F.col("o_orderkey") % 5 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("_op", F.lit("upsert"))
        )
        dels = orders.filter(
            (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 5 != 0)
        ).withColumn("_op", F.lit("delete"))
        # copy-on-write CDC apply with keep=2: the fold consumes the
        # snapshot-diff feed (table_changes); the merge-on-read CDC source
        # (pending_changes) plugs into the same fold unchanged. The dim
        # upsert and the fact CDC write disjoint tables — overlapped (§2.6)
        overlap(
            lambda: upsert(spark, dim_dir, dim_updates, key=["c_custkey"], keep=2),
            lambda: merge_cdc(
                spark, fact_dir, ups.unionByName(dels), key=["o_orderkey"], keep=2
            ),
        )

        # --- the fold: feeds only, base tables never rescanned ---
        fold_join_view(
            spark,
            view_dir,
            view_key=["o_orderkey"],
            fact_feed=table_changes(spark, fact_dir, fact_snap, key=["o_orderkey"]),
            dim_feed=table_changes(spark, dim_dir, dim_snap, key=["c_custkey"]),
            dim_current=read_current(spark, dim_dir),
            fact_join_col="o_custkey",
            dim_join_col="c_custkey",
        )
        if current_snapshot(view_dir) != view_base:
            raise RuntimeError("IVM fold must land as deltas, not a view rewrite")
        result = materialize(
            read_current_with_deltas(spark, view_dir, key=["o_orderkey"]).orderBy(
                "o_orderkey"
            )
        )
    except BaseException:
        _cleanup()
        raise
    reclaim_by_mode(fact_dir, dim_dir, view_dir)
    return result


# --- cascade IVM: aggregate OVER the maintained join view (round 11) -------
# The delta-join rule's second half (same Blakeley SIGMOD'86 lineage the
# module cites): the join fold's MOR deltas on the view ARE a change feed
# for a downstream aggregate — ``lake.pending_changes`` classifies them as
# insert / delete / update pre+post, and the signed fold (+1 post, -1 pre)
# maintains ``A = groupBy(g)(fact ⋈ dim)`` for the price of the feed,
# never rescanning the view. Exactly-once across crashes rides on the
# lake's commit metadata: the fold stamps the view state id it consumed
# (``pending_state``) into the aggregate's own atomic commit, so an
# at-least-once replay of the same feed is detected and skipped — the
# Delta txnAppId/txnVersion idiom reduced to this layer. Protocol: the
# fold-then-flatten pair is the view's single maintenance owner (the
# index-loop discipline); flatten consumes the feed, arming the next fold.


def build_agg_over(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """The stored aggregate's schema over any view-shaped frame:
    (group, exact decimal sum, non-NULL value count, row count). Shared
    by the initial build and every test's recompute oracle so the fold
    and the ground truth can't drift. NULL group keys are excluded (the
    ``_run_incremental_agg`` contract: a NULL key can't match itself
    through the keyed upsert's anti-join)."""
    from pgcp_spark.operators._decimal import dec

    zero = F.lit(0).cast("decimal(18,2)")
    return (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.coalesce(F.sum(dec(value_col, "decimal(18,2)")), zero).alias("sum_dec"),
            F.count(value_col).alias("priced_cnt"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
    )


def serve_agg(stored: DataFrame, group_col: str) -> DataFrame:
    """The serving projection over any stored-aggregate frame: groups
    folded down to zero rows drop out; a group whose every value is NULL
    serves a NULL sum (ANSI sum-over-nothing, carried through the fold
    by priced_cnt). Factored from ``read_agg`` so manifest-pinned group
    reads (``txn.read_group``) serve the identical shape."""
    return stored.filter(F.col("order_cnt") > 0).select(
        group_col,
        F.when(F.col("priced_cnt") > 0, F.col("sum_dec").cast("double")).alias(
            f"sum_{group_col.split('_', 1)[-1]}_total"
        ),
        "order_cnt",
    )


def read_agg(spark: SparkSession, agg_dir: str, group_col: str) -> DataFrame:
    """Serve the stored aggregate from its lake table (``serve_agg``)."""
    return serve_agg(read_current(spark, agg_dir), group_col)


def fold_agg_join_view(
    spark: SparkSession,
    agg_dir: str,
    view_dir: str,
    view_key: list[str],
    group_col: str,
    value_col: str,
    keep: int = 1,
) -> bool:
    """Fold the view's changes SINCE THE LAST FOLD into the stored
    aggregate at ``agg_dir``. The aggregate's commit metadata carries the
    view state id it has applied (``pending_state``); the fold reads
    ``state_changes(applied → current)`` — so it composes across many
    view folds WITHOUT requiring a flatten in between, and an
    at-least-once replay of the same state is detected and skipped
    (returns False; True after a fold commits). A MISSING watermark
    (no ``applied_view_state`` in the aggregate's commit meta) REFUSES,
    exactly like the unreadable-state path below: any metaless commit to
    the aggregate table (a compaction, a manual ``write_snapshot`` — meta
    is per-snapshot and does not carry forward) silently clears the
    watermark, and folding the full pending feed from there would
    double-count every already-applied delta — the signed fold is not
    idempotent. Recovery is the same as for a GC'd state: rebuild from
    the view (``build_agg_over`` + a stamped ``write_snapshot``), or
    ``stamp_applied_state`` if the caller KNOWS the stored aggregate
    reflects the view's current state. (The round-11 "legacy bootstrap"
    fold-the-full-feed path is gone — it was indistinguishable from the
    silent-corruption case.)

    After a FLATTEN of the view, call ``stamp_applied_state`` — the
    flatten preserves data, but the state id changes, and re-stamping
    keeps the next fold on the prefix-pruned (batch-sized) path instead
    of the full-diff fallback.

    Scale: the feed is batch-sized on the prefix path; the signed delta
    aggregate is one feed-sized shuffle on ``group_col``; the
    stored-aggregate join touches only changed groups (right-outer, AQE
    broadcasts the delta side); the upsert carries untouched groups over
    without reading the view or the base tables.
    """
    from pgcp_spark.operators._decimal import dec
    from pgcp_spark.sources.lake import (
        pending_state,
        snapshot_meta,
        state_changes,
    )

    state = pending_state(view_dir)
    applied = snapshot_meta(agg_dir).get("applied_view_state")
    if applied == state:
        return False  # at-least-once replay of an already-folded state
    if applied is None:
        raise RuntimeError(
            f"{agg_dir}: the aggregate carries no applied_view_state "
            "watermark. Either it was never stamped at build time, or a "
            "metaless commit (compaction / manual write_snapshot) cleared "
            "it — and folding the full pending feed would silently "
            "double-count already-applied deltas (the signed fold is not "
            "idempotent). Recovery: rebuild from the view (build_agg_over "
            "+ a stamped write_snapshot), or stamp_applied_state if the "
            "stored aggregate is KNOWN to reflect the view's current state."
        )
    try:
        feed = state_changes(spark, view_dir, applied, state, key=view_key)
    except FileNotFoundError as exc:
        raise RuntimeError(
            "the aggregate's applied view state is no longer readable "
            "(a flatten/vacuum GC'd it). The cascade owner must re-anchor "
            "with stamp_applied_state immediately after each flatten; "
            "recovery now = rebuild the aggregate from the view "
            "(build_agg_over + a stamped write_snapshot). Refusing to "
            "guess — a blind re-fold double-counts."
        ) from exc
    feed = materialize(feed)
    if feed.isEmpty():
        return False
    zero = F.lit(0).cast("decimal(18,2)")
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    deltas = (
        feed.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.coalesce(
                F.sum(sign * F.coalesce(dec(value_col, "decimal(18,2)"), zero)), zero
            ).alias("d_sum"),
            F.sum(sign * F.col(value_col).isNotNull().cast("int")).alias("d_priced"),
            F.sum(sign).alias("d_cnt"),
        )
    )
    stored = read_current(spark, agg_dir)
    touched = stored.join(deltas, group_col, "right_outer").select(
        group_col,
        (F.coalesce(F.col("sum_dec"), zero) + F.col("d_sum"))
        .cast("decimal(18,2)")
        .alias("sum_dec"),
        (F.coalesce(F.col("priced_cnt"), F.lit(0)) + F.col("d_priced")).alias(
            "priced_cnt"
        ),
        (F.coalesce(F.col("order_cnt"), F.lit(0)) + F.col("d_cnt")).alias("order_cnt"),
    )
    upsert(
        spark,
        agg_dir,
        touched,
        key=[group_col],
        keep=keep,
        meta={"applied_view_state": state},
    )
    return True


def stamp_applied_state(
    spark: SparkSession, agg_dir: str, view_dir: str, keep: int = 1
) -> None:
    """Re-anchor the aggregate's watermark to the view's CURRENT state id
    without changing a row — called after a view flatten (which preserves
    data but renames the state). One atomic commit of the (small,
    group-cardinality-sized) aggregate table carrying the new meta; the
    next fold then diffs from a state that EXTENDS cheaply instead of
    crossing the flatten into the full-diff fallback."""
    from pgcp_spark.sources.lake import pending_state, write_snapshot as _ws

    _ws(
        read_current(spark, agg_dir),
        agg_dir,
        keep=keep,
        meta={"applied_view_state": pending_state(view_dir)},
    )


# --- MIN/MAX in the cascade fold (round 12) ---------------------------------
# The signed fold above covers the sum/count/avg family; MIN/MAX — the
# other half of every serving dashboard — cannot fold under deletes (a
# retracted group minimum needs evidence the fold doesn't carry). The
# standard split (Palpanas et al. VLDB'02 call these non-distributive
# aggregates "unaffectable" by deletes; self-maintainable views fold only
# inserts): INSERTS fold via least/greatest against the stored value;
# a REMOVAL (delete / update_preimage) forces a rescan ONLY when the
# removed value TIES the stored min or max — any other removed value v
# satisfies min < v < max and cannot move either bound. The rescan reads
# exactly the affected groups from the MAINTAINED VIEW (pushed-IN via the
# same bounded-probe discipline as the dim arm), never the base tables.


def build_minmax_over(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """The stored MIN/MAX aggregate's schema over any view-shaped frame:
    (group, exact decimal min, exact decimal max, row count). Shared by
    the initial build, the fold's rescan arm, and every test's recompute
    oracle so they can't drift. NULL group keys are excluded (the keyed-
    upsert contract, as in ``build_agg_over``); NULL values never
    participate in min/max (ANSI)."""
    from pgcp_spark.operators._decimal import dec

    return (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.min(dec(value_col, "decimal(18,2)")).alias("min_dec"),
            F.max(dec(value_col, "decimal(18,2)")).alias("max_dec"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
    )


def serve_minmax(stored: DataFrame, group_col: str) -> DataFrame:
    """The serving projection over any stored MIN/MAX frame: groups
    folded down to zero rows drop out; a group whose every value is NULL
    serves NULL bounds (ANSI min/max-over-nothing, carried naturally —
    both the fold's least/greatest and the rescan's min/max skip NULLs).
    Factored from ``read_minmax_agg`` (round 13) so manifest-pinned group
    reads (``txn.read_group``) serve the identical shape — the
    ``serve_agg`` discipline applied to the MIN/MAX twin."""
    return stored.filter(F.col("order_cnt") > 0).select(
        group_col,
        F.col("min_dec").cast("double").alias("min_total"),
        F.col("max_dec").cast("double").alias("max_total"),
        "order_cnt",
    )


def read_minmax_agg(spark: SparkSession, agg_dir: str, group_col: str) -> DataFrame:
    """Serve the stored MIN/MAX aggregate from its lake table
    (``serve_minmax``)."""
    return serve_minmax(read_current(spark, agg_dir), group_col)


def minmax_rescan_groups(stored: DataFrame, deltas: DataFrame, group_col: str):
    """The rescan decision, factored for the pin in tests: join the
    per-group feed stats onto the stored bounds and return
    ``(touched, rescan_flag_column)`` where the flag is TRUE exactly for
    groups whose removal set could have held the stored min or max:

      - a removed value ≤ stored min (equality in a consistent state —
        nothing below the true min exists to remove; ≤ keeps the check
        safe under duplicates and drift) endangers the min;
      - symmetrically ≥ stored max endangers the max;
      - removals against a group the store has NO row for (min/max NULL
        with a non-NULL removal) rescan defensively — the fold cannot
        prove anything about a group it has no evidence for.

    Groups with only inserts, or whose removals sit strictly inside the
    (min, max) interval, fold without touching the view."""
    touched = stored.join(deltas, group_col, "right_outer")
    min_hit = F.col("rm_min").isNotNull() & (
        F.col("min_dec").isNull() | (F.col("rm_min") <= F.col("min_dec"))
    )
    max_hit = F.col("rm_max").isNotNull() & (
        F.col("max_dec").isNull() | (F.col("rm_max") >= F.col("max_dec"))
    )
    return touched, (min_hit | max_hit)


def fold_minmax_join_view(
    spark: SparkSession,
    agg_dir: str,
    view_dir: str,
    view_key: list[str],
    group_col: str,
    value_col: str,
    keep: int = 1,
) -> bool:
    """Fold the view's changes since the last fold into the stored
    per-group MIN/MAX aggregate at ``agg_dir`` — the cascade fold for the
    non-signed half of the dashboard. Watermark discipline is identical
    to ``fold_agg_join_view`` (same ``applied_view_state`` commit meta,
    same replay skip / missing-watermark refuse / GC'd-state refuse), so
    the two folds compose over one maintained view.

    Scale: the feed is batch-sized on the prefix path; one feed-sized
    shuffle computes per-group insert bounds + removal bounds + the
    signed count; the stored join touches only changed groups
    (right-outer, AQE broadcasts the delta side). The rescan arm then
    reads ONLY min/max-endangered groups from the maintained view — the
    group list is pushed as an IN filter into the view scan when small
    (``_pruned_by_keys``), so a view laid out CLUSTER BY the group column
    reads only affected files; it is measured against full recompute in
    tools/minmax_ab.py (SCALE.md r12). The base tables are never read.
    """
    from pgcp_spark.operators._decimal import dec
    from pgcp_spark.sources.lake import (
        pending_state,
        snapshot_meta,
        state_changes,
    )

    state = pending_state(view_dir)
    applied = snapshot_meta(agg_dir).get("applied_view_state")
    if applied == state:
        return False  # at-least-once replay of an already-folded state
    if applied is None:
        raise RuntimeError(
            f"{agg_dir}: the aggregate carries no applied_view_state "
            "watermark (never stamped, or cleared by a metaless commit) — "
            "refusing to fold; rebuild from the view (build_minmax_over + "
            "a stamped write_snapshot) or stamp_applied_state if the "
            "stored aggregate is KNOWN current."
        )
    try:
        feed = state_changes(spark, view_dir, applied, state, key=view_key)
    except FileNotFoundError as exc:
        raise RuntimeError(
            "the aggregate's applied view state is no longer readable "
            "(a flatten/vacuum GC'd it); re-anchor with stamp_applied_state "
            "after each flatten, or rebuild from the view. Refusing to "
            "guess — a blind re-fold double-counts."
        ) from exc
    feed = materialize(feed)
    if feed.isEmpty():
        return False
    post = F.col("_change_type").isin("insert", "update_postimage")
    pre = F.col("_change_type").isin("delete", "update_preimage")
    val = dec(value_col, "decimal(18,2)")
    deltas = (
        feed.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.min(F.when(post, val)).alias("ins_min"),
            F.max(F.when(post, val)).alias("ins_max"),
            F.min(F.when(pre, val)).alias("rm_min"),
            F.max(F.when(pre, val)).alias("rm_max"),
            F.sum(F.when(post, 1).otherwise(-1)).alias("d_cnt"),
        )
    )
    stored = read_current(spark, agg_dir)
    touched, rescan = minmax_rescan_groups(stored, deltas, group_col)
    folded = touched.select(
        group_col,
        rescan.alias("_rescan"),
        # least/greatest skip NULLs: a new group (stored NULL) takes the
        # insert bound; an insert-free fold keeps the stored bound
        F.least(F.col("min_dec"), F.col("ins_min")).alias("min_dec"),
        F.greatest(F.col("max_dec"), F.col("ins_max")).alias("max_dec"),
        (F.coalesce(F.col("order_cnt"), F.lit(0)) + F.col("d_cnt")).alias(
            "order_cnt"
        ),
    )
    folded = materialize(folded)  # consumed by the rescan probe + upsert
    rescan_keys = folded.filter(F.col("_rescan")).select(group_col)
    # ONE bounded probe job decides emptiness AND delivers the pushed-IN
    # list (r13 wave 5, guide §1.2) — replacing the isEmpty job + the
    # separate _pruned_by_keys collect the r12 shape paid
    rescan_vals = _collected_keys(rescan_keys)
    if rescan_vals is not None and not rescan_vals:
        out = folded.drop("_rescan")
    else:
        # the maintained view at exactly `state` (the single-maintenance-
        # owner invariant): pruned to the endangered groups — pushed-IN
        # reaches the parquet footers when the list is small; beyond the
        # bound (rescan_vals None) the semi-join keeps correctness
        view_mor = read_current_with_deltas(spark, view_dir, key=view_key)
        if rescan_vals is not None:
            view_now = view_mor.filter(F.col(group_col).isin(rescan_vals))
        else:
            view_now = view_mor.join(rescan_keys, on=group_col, how="left_semi")
        rescanned = build_minmax_over(view_now, group_col, value_col).select(
            group_col,
            F.col("min_dec").alias("r_min"),
            F.col("max_dec").alias("r_max"),
        )
        out = (
            folded.join(rescanned, on=group_col, how="left")
            .select(
                group_col,
                F.when(F.col("_rescan"), F.col("r_min"))
                .otherwise(F.col("min_dec"))
                .alias("min_dec"),
                F.when(F.col("_rescan"), F.col("r_max"))
                .otherwise(F.col("max_dec"))
                .alias("max_dec"),
                "order_cnt",
            )
        )
    upsert(
        spark,
        agg_dir,
        out,
        key=[group_col],
        keep=keep,
        meta={"applied_view_state": state},
    )
    return True


_MINMAX_JOIN_VIEW_ORACLE = """
WITH postfact AS (
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS p
    FROM orders
    WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
    UNION ALL
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) * 2
    FROM orders WHERE o_orderkey % 5 = 0
),
postdim AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment || '_R'
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer
)
SELECT d.c_mktsegment,
       CAST(MIN(f.p) AS DOUBLE) AS min_total,
       CAST(MAX(f.p) AS DOUBLE) AS max_total,
       COUNT(*) AS order_cnt
FROM postfact f JOIN postdim d ON f.o_custkey = d.c_custkey
WHERE d.c_mktsegment IS NOT NULL
GROUP BY d.c_mktsegment
ORDER BY d.c_mktsegment
"""


@register(
    "lake_incremental_minmax_join_view_orders",
    oracle=_MINMAX_JOIN_VIEW_ORACLE,
    doc=(
        "cascade IVM for MIN/MAX — the non-signed dashboard half: a per-segment "
        "min/max/count maintained OVER the maintained orders ⋈ customer view; "
        "inserts fold via least/greatest, and a removal rescans ONLY the groups "
        "where it tied the stored bound — through the maintained view with "
        "pushed-IN pruning, never the base tables; exactly-once via the same "
        "stamped view-state watermark as the signed fold; oracle recomputes "
        "min/max from both post states, so a hash match proves fold+selective-"
        "rescan == recompute"
    ),
)
def lake_incremental_minmax_join_view_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end MIN/MAX cascade cycle on driver-checkable data: the
    standard fact/dim/view scenario (base fact = orders %3≠0; dim segment
    renamed for every 10th customer; fact CDC doubling every 5th key and
    deleting every non-5th 7th), with a per-``c_mktsegment`` MIN/MAX
    aggregate maintained purely from the cascade. The CDC exercises both
    fold arms: the doubling's postimages RAISE maxima through the
    least/greatest fold, while its preimages and the deletes remove
    values that tie segment minima/maxima — those groups (and only
    those) rescan through the view."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base_fact = orders.filter(F.col("o_orderkey") % 3 != 0)
    fact_dir = tempfile.mkdtemp(prefix="pgcp_minmax_fact_")
    dim_dir = tempfile.mkdtemp(prefix="pgcp_minmax_dim_")
    view_dir = tempfile.mkdtemp(prefix="pgcp_minmax_view_")
    agg_dir = tempfile.mkdtemp(prefix="pgcp_minmax_agg_")

    def _cleanup() -> None:
        for d in (fact_dir, dim_dir, view_dir, agg_dir):
            shutil.rmtree(d, ignore_errors=True)

    try:
        from pgcp_spark.sources.lake import pending_state

        view0 = base_fact.join(
            dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")

        def _view_then_agg() -> None:
            # the agg stamp reads the view's committed state — chained in
            # one worker while fact/dim land in the others (§2.6)
            write_snapshot(view0, view_dir, cluster_by=["o_custkey"])
            write_snapshot(
                build_minmax_over(view0, "c_mktsegment", "o_totalprice"),
                agg_dir,
                meta={"applied_view_state": pending_state(view_dir)},
            )

        fact_snap, dim_snap, _ = overlap(
            lambda: write_snapshot(base_fact, fact_dir, keep=2),
            lambda: write_snapshot(dim, dim_dir, keep=2),
            _view_then_agg,
        )

        dim_updates = dim.filter(F.col("c_custkey") % 10 == 0).withColumn(
            "c_mktsegment", F.concat(F.col("c_mktsegment"), F.lit("_R"))
        )
        ups = (
            orders.filter(F.col("o_orderkey") % 5 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("_op", F.lit("upsert"))
        )
        dels = orders.filter(
            (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 5 != 0)
        ).withColumn("_op", F.lit("delete"))
        overlap(  # disjoint tables (§2.6)
            lambda: upsert(spark, dim_dir, dim_updates, key=["c_custkey"], keep=2),
            lambda: merge_cdc(
                spark, fact_dir, ups.unionByName(dels), key=["o_orderkey"], keep=2
            ),
        )

        fold_join_view(
            spark,
            view_dir,
            view_key=["o_orderkey"],
            fact_feed=table_changes(spark, fact_dir, fact_snap, key=["o_orderkey"]),
            dim_feed=table_changes(spark, dim_dir, dim_snap, key=["c_custkey"]),
            dim_current=read_current(spark, dim_dir),
            fact_join_col="o_custkey",
            dim_join_col="c_custkey",
        )
        fold_minmax_join_view(
            spark, agg_dir, view_dir, ["o_orderkey"], "c_mktsegment", "o_totalprice"
        )
        from pgcp_spark.sources.lake import flatten_deltas

        flatten_deltas(
            spark, view_dir, key=["o_orderkey"], cluster_by=["o_custkey"]
        )
        result = materialize(
            read_minmax_agg(spark, agg_dir, "c_mktsegment").orderBy("c_mktsegment")
        )
    except BaseException:
        _cleanup()
        raise
    reclaim_by_mode(fact_dir, dim_dir, view_dir, agg_dir)
    return result


_AGG_JOIN_VIEW_ORACLE = """
WITH postfact AS (
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS p
    FROM orders
    WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
    UNION ALL
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) * 2
    FROM orders WHERE o_orderkey % 5 = 0
),
postdim AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment || '_R'
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer
)
SELECT d.c_mktsegment,
       CAST(SUM(f.p) AS DOUBLE) AS sum_mktsegment_total,
       COUNT(*) AS order_cnt
FROM postfact f JOIN postdim d ON f.o_custkey = d.c_custkey
WHERE d.c_mktsegment IS NOT NULL
GROUP BY d.c_mktsegment
ORDER BY d.c_mktsegment
"""
# the NOT NULL mirrors build_agg_over's contract: a NULL group key can
# never match itself through the keyed upsert's anti-join (ANSI), so the
# maintained aggregate keys on real dimension values only (the
# _run_incremental_agg rule; caught by the nulls edge lake)



@register(
    "lake_incremental_agg_join_view_orders",
    oracle=_AGG_JOIN_VIEW_ORACLE,
    doc=(
        "cascade IVM: a per-segment aggregate maintained OVER the maintained "
        "orders ⋈ customer view — the join fold's merge-on-read deltas, read "
        "back as the view's pending change feed, drive the signed aggregate "
        "fold (post adds, pre subtracts), so a dim update MOVES its orders "
        "between segment groups without rescanning fact, dim, or view; the "
        "fold stamps the consumed view state into its own atomic commit "
        "(exactly-once across replays); oracle recomputes the aggregated join "
        "from both post states, so a hash match proves cascade == recompute"
    ),
)
def lake_incremental_agg_join_view_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end cascade cycle on driver-checkable data: the same
    fact/dim/view scenario as ``lake_incremental_join_view_orders``
    (base fact = orders %3≠0; dim segment renamed for every 10th
    customer; fact CDC doubling every 5th key and deleting every
    non-5th 7th), PLUS a per-``c_mktsegment`` aggregate built over the
    initial view and maintained purely from the cascade: base feeds →
    join fold (MOR deltas on the view) → ``pending_changes`` feed →
    signed aggregate fold → flatten. The dim's segment rename is the
    shape a fact-feed-only consumer cannot see — the moved orders'
    totals must LEAVE the old segment group and ENTER the '_R' one, and
    only the view feed's pre/post pairs carry that."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base_fact = orders.filter(F.col("o_orderkey") % 3 != 0)
    fact_dir = tempfile.mkdtemp(prefix="pgcp_cascade_fact_")
    dim_dir = tempfile.mkdtemp(prefix="pgcp_cascade_dim_")
    view_dir = tempfile.mkdtemp(prefix="pgcp_cascade_view_")
    agg_dir = tempfile.mkdtemp(prefix="pgcp_cascade_agg_")

    def _cleanup() -> None:
        for d in (fact_dir, dim_dir, view_dir, agg_dir):
            shutil.rmtree(d, ignore_errors=True)

    try:
        from pgcp_spark.sources.lake import pending_state

        view0 = base_fact.join(
            dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")

        def _view_then_agg() -> None:
            # agg stamp reads the committed view state — chained (§2.6)
            write_snapshot(view0, view_dir, cluster_by=["o_custkey"])
            write_snapshot(
                build_agg_over(view0, "c_mktsegment", "o_totalprice"),
                agg_dir,
                meta={"applied_view_state": pending_state(view_dir)},
            )

        fact_snap, dim_snap, _ = overlap(
            lambda: write_snapshot(base_fact, fact_dir, keep=2),
            lambda: write_snapshot(dim, dim_dir, keep=2),
            _view_then_agg,
        )

        # --- mutations on the base tables (the join-view query's set) ---
        dim_updates = dim.filter(F.col("c_custkey") % 10 == 0).withColumn(
            "c_mktsegment", F.concat(F.col("c_mktsegment"), F.lit("_R"))
        )
        ups = (
            orders.filter(F.col("o_orderkey") % 5 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("_op", F.lit("upsert"))
        )
        dels = orders.filter(
            (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 5 != 0)
        ).withColumn("_op", F.lit("delete"))
        overlap(  # disjoint tables (§2.6)
            lambda: upsert(spark, dim_dir, dim_updates, key=["c_custkey"], keep=2),
            lambda: merge_cdc(
                spark, fact_dir, ups.unionByName(dels), key=["o_orderkey"], keep=2
            ),
        )

        # --- the cascade: base feeds → join fold → view feed → agg fold ---
        fold_join_view(
            spark,
            view_dir,
            view_key=["o_orderkey"],
            fact_feed=table_changes(spark, fact_dir, fact_snap, key=["o_orderkey"]),
            dim_feed=table_changes(spark, dim_dir, dim_snap, key=["c_custkey"]),
            dim_current=read_current(spark, dim_dir),
            fact_join_col="o_custkey",
            dim_join_col="c_custkey",
        )
        # an EMPTY lake legitimately yields an empty feed (fold returns
        # False) — the sf0.01 oracle hash is what proves the fold actually
        # ran and matched on real data, so no non-empty assertion here
        fold_agg_join_view(
            spark, agg_dir, view_dir, ["o_orderkey"], "c_mktsegment", "o_totalprice"
        )
        from pgcp_spark.sources.lake import flatten_deltas

        flatten_deltas(
            spark, view_dir, key=["o_orderkey"], cluster_by=["o_custkey"]
        )
        result = materialize(
            read_agg(spark, agg_dir, "c_mktsegment").orderBy("c_mktsegment")
        )
    except BaseException:
        _cleanup()
        raise
    reclaim_by_mode(fact_dir, dim_dir, view_dir, agg_dir)
    return result


@register(
    "lake_join_view_from_pending_feeds",
    oracle=_JOIN_VIEW_ORACLE,
    doc=(
        "the join-view IVM fold driven by MERGE-ON-READ base feeds: both base "
        "tables mutate as un-flattened deltas (merge_cdc_delta / append_delta) "
        "and the fold consumes pending_changes instead of the snapshot diff — "
        "same oracle as lake_incremental_join_view_orders, proving the MOR CDC "
        "feed plugs into the same fold unchanged"
    ),
)
def lake_join_view_from_pending_feeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``lake_incremental_join_view_orders`` scenario with every base
    mutation landing MERGE-ON-READ: the dim's segment rename is an
    ``append_delta`` (newest-wins), the fact CDC batch a
    ``merge_cdc_delta`` (data delta + tombstone) — neither base snapshot
    is rewritten — and the fold's feeds come from ``pending_changes``,
    the CDC view between compactions. SCALE.md r10 claimed the MOR feed
    "plugs into the same fold unchanged"; this is that claim as a driver
    row. ``dim_current`` resolves merge-on-read too, so the fact arm
    rebuilds against the post dim state the deltas imply."""
    from pgcp_spark.sources.lake import merge_cdc_delta, pending_changes

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    base_fact = orders.filter(F.col("o_orderkey") % 3 != 0)
    fact_dir = tempfile.mkdtemp(prefix="pgcp_ivm_mor_fact_")
    dim_dir = tempfile.mkdtemp(prefix="pgcp_ivm_mor_dim_")
    view_dir = tempfile.mkdtemp(prefix="pgcp_ivm_mor_view_")

    def _cleanup() -> None:
        for d in (fact_dir, dim_dir, view_dir):
            shutil.rmtree(d, ignore_errors=True)

    try:
        view0 = base_fact.join(
            dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).select("o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment")
        overlap(  # three independent tables (§2.6)
            lambda: write_snapshot(base_fact, fact_dir, keep=2),
            lambda: write_snapshot(dim, dim_dir, keep=2),
            lambda: write_snapshot(view0, view_dir, cluster_by=["o_custkey"]),
        )
        view_base = current_snapshot(view_dir)

        # --- merge-on-read mutations: base snapshots never rewritten ---
        dim_updates = dim.filter(F.col("c_custkey") % 10 == 0).withColumn(
            "c_mktsegment", F.concat(F.col("c_mktsegment"), F.lit("_R"))
        )
        ups = (
            orders.filter(F.col("o_orderkey") % 5 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("_op", F.lit("upsert"))
        )
        dels = orders.filter(
            (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 5 != 0)
        ).withColumn("_op", F.lit("delete"))
        overlap(  # disjoint tables (§2.6)
            lambda: append_delta(dim_updates, dim_dir),
            lambda: merge_cdc_delta(
                spark, fact_dir, ups.unionByName(dels), key=["o_orderkey"]
            ),
        )

        # --- the fold: pending (un-flattened) feeds only ---
        fold_join_view(
            spark,
            view_dir,
            view_key=["o_orderkey"],
            fact_feed=pending_changes(spark, fact_dir, key=["o_orderkey"]),
            dim_feed=pending_changes(spark, dim_dir, key=["c_custkey"]),
            dim_current=read_current_with_deltas(
                spark, dim_dir, key=["c_custkey"]
            ),
            fact_join_col="o_custkey",
            dim_join_col="c_custkey",
        )
        if current_snapshot(view_dir) != view_base:
            raise RuntimeError("IVM fold must land as deltas, not a view rewrite")
        result = materialize(
            read_current_with_deltas(spark, view_dir, key=["o_orderkey"]).orderBy(
                "o_orderkey"
            )
        )
    except BaseException:
        _cleanup()
        raise
    reclaim_by_mode(fact_dir, dim_dir, view_dir)
    return result


# --- exact COUNT DISTINCT in the cascade fold (round 13) --------------------
# The third classic aggregate shape. The signed fold covers sum/count/avg
# (distributive); MIN/MAX folds inserts and selectively rescans deletes;
# COUNT(DISTINCT v) is different again — neither an insert NOR a delete
# can fold against the count alone (did the inserted value already exist?
# did the delete remove the LAST holder?). The standard IVM treatment
# (Gupta & Mumick's summary-delta method; Palpanas et al. VLDB'02 keep
# exactly this auxiliary for duplicate-sensitive aggregates) maintains a
# SUPPORT table of per-(group, value) multiplicities: the support folds
# with the plain signed rule (distributive again — the non-distributive
# aggregate is a distributive one over richer state), and the distinct
# count changes ONLY on multiplicity transitions 0→present (+1) and
# present→0 (−1), which the fold observes for free in the old-vs-new
# support join. No rescan arm at all — deletes are exact from evidence
# the support already carries, unlike MIN/MAX. Cost: support storage is
# O(distinct (group, value) pairs) — cheap for dashboard-shaped values
# (statuses, priorities, user ids per day), and stated honestly: for a
# near-unique value column the support approaches the view size and a
# sketch (the HLL rollup in functions/sketches.py) is the right tool.
#
# Crash protocol (two stored tables, two commits per fold): the SUPPORT
# commit carries the watermark first, the AGG rollup commits second. A
# crash between them leaves support-at-state / agg-behind — detected on
# the next fold and repaired by REBUILDING the agg from the support
# (O(support), convergent: the support alone is complete evidence), the
# same "converge, don't refuse" shape as the CDC-BM25 fold's crash
# window. Both-behind replays skip; a missing watermark on either table
# REFUSES exactly like the signed fold (the support fold is signed too,
# and double-counting multiplicities corrupts transitions silently).


def build_distinct_support(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """The support table's schema over any view-shaped frame: per-(group,
    value) multiplicity, NULL groups and NULL values excluded (COUNT
    DISTINCT ignores NULL values; NULL keys can't ride the keyed upsert).
    Shared by the initial build, the crash-repair rebuild, and the tests'
    recompute oracle."""
    return (
        df.filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def build_distinct_over(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """The stored aggregate's schema over any view-shaped frame:
    (group, exact distinct count of non-NULL values). Groups whose every
    value is NULL have no support rows and no aggregate row — the serving
    contract drops them (see ``serve_distinct``)."""
    return (
        df.filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count_distinct(F.col(value_col)).alias("distinct_cnt"))
    )


def distinct_agg_from_support(support: DataFrame, group_col: str) -> DataFrame:
    """The aggregate as a pure function of the support — the rebuild path
    (crash repair) and the tests' support-vs-agg consistency pin. A
    support row with cnt ≤ 0 is retained evidence of a vanished pair and
    counts nothing."""
    return (
        support.filter(F.col("cnt") > 0)
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("distinct_cnt"))
    )


def serve_distinct(stored: DataFrame, group_col: str) -> DataFrame:
    """The serving projection over any stored distinct-count frame:
    groups folded down to zero distinct values drop out (their row is
    retained evidence, like the signed fold's order_cnt=0 groups).
    Factored for manifest-pinned group reads (the ``serve_agg``
    discipline)."""
    return stored.filter(F.col("distinct_cnt") > 0).select(
        group_col, "distinct_cnt"
    )


def read_distinct_agg(
    spark: SparkSession, agg_dir: str, group_col: str
) -> DataFrame:
    """Serve the stored distinct-count aggregate from its lake table."""
    return serve_distinct(read_current(spark, agg_dir), group_col)


def fold_distinct_join_view(
    spark: SparkSession,
    support_dir: str,
    agg_dir: str,
    view_dir: str,
    view_key: list[str],
    group_col: str,
    value_col: str,
    keep: int = 1,
) -> bool:
    """Fold the view's changes since the last fold into the stored
    support table and distinct-count aggregate. Watermark discipline is
    the signed fold's (same ``applied_view_state`` commit meta, same
    replay skip / missing-watermark refuse / GC'd-state refuse), held on
    BOTH stored tables with support leading — see the section comment
    for the crash protocol.

    Scale: the feed is batch-sized on the prefix path; one feed-sized
    shuffle computes the per-(group, value) signed multiplicity deltas;
    the support join touches only changed pairs (right-outer, AQE
    broadcasts the delta side) with the batch's groups pushed IN to the
    support scan (CLUSTER BY ``group_col`` lays support out for it); the
    transition sum is one delta-sized shuffle; the agg upsert carries
    untouched groups over. The view and base tables are NEVER read —
    deletes are exact from the support's own evidence (no rescan arm,
    unlike MIN/MAX)."""
    from pgcp_spark.sources.lake import (
        pending_state,
        snapshot_meta,
        state_changes,
    )

    state = pending_state(view_dir)
    sup_applied = snapshot_meta(support_dir).get("applied_view_state")
    agg_applied = snapshot_meta(agg_dir).get("applied_view_state")
    if sup_applied is None or agg_applied is None:
        raise RuntimeError(
            f"{support_dir if sup_applied is None else agg_dir}: no "
            "applied_view_state watermark (never stamped, or cleared by a "
            "metaless commit) — refusing to fold; rebuild from the view "
            "(build_distinct_support/build_distinct_over + stamped "
            "write_snapshot). The support fold is signed and double-"
            "counting multiplicities corrupts transitions silently."
        )
    if sup_applied == state and agg_applied == state:
        return False  # at-least-once replay of an already-folded state
    if sup_applied == state and agg_applied != state:
        # crash between the support commit and the agg commit: the
        # support alone is complete evidence — rebuild the aggregate
        # from it (O(support), convergent) and re-stamp
        write_snapshot(
            distinct_agg_from_support(
                read_current_with_deltas(
                    spark, support_dir, key=[group_col, value_col]
                ),
                group_col,
            ),
            agg_dir,
            keep=keep,
            meta={"applied_view_state": state},
        )
        return True
    if sup_applied != agg_applied:
        # crash between the two commits FOLLOWED by more view commits
        # before the retry (the at-least-once restart redelivers the
        # batch, whose merge lands shadow deltas and advances the view's
        # state id — so neither watermark matches `state` anymore). The
        # support commits first by construction, so on any mismatch the
        # support is authoritative: rebuild the agg from it AT THE
        # SUPPORT'S watermark, then fall through and fold the remaining
        # view diff normally. If the support's watermark is not a real
        # historical view state (external corruption), the state_changes
        # below raises and the refuse message applies.
        write_snapshot(
            distinct_agg_from_support(
                read_current_with_deltas(
                    spark, support_dir, key=[group_col, value_col]
                ),
                group_col,
            ),
            agg_dir,
            keep=keep,
            meta={"applied_view_state": sup_applied},
        )
    try:
        feed = state_changes(spark, view_dir, sup_applied, state, key=view_key)
    except FileNotFoundError as exc:
        raise RuntimeError(
            "the applied view state is no longer readable (a flatten/"
            "vacuum GC'd it); re-anchor BOTH stored tables' "
            "applied_view_state after each flatten (stamp_applied_state "
            "on each dir), or rebuild from the view. Refusing to guess — "
            "a blind re-fold double-counts."
        ) from exc
    feed = materialize(feed)
    if feed.isEmpty():
        return False
    apply_distinct_feed(
        spark, support_dir, agg_dir, feed, group_col, value_col,
        meta={"applied_view_state": state}, keep=keep,
    )
    return True


def apply_distinct_feed(
    spark: SparkSession,
    support_dir: str,
    agg_dir: str,
    feed: DataFrame,
    group_col: str,
    value_col: str,
    meta: dict | None = None,
    keep: int = 1,
) -> None:
    """The COUNT DISTINCT fold's core, independent of where the change
    feed came from — the cascade fold above drives it from a maintained
    view's ``state_changes``; the direct twin
    (``lake_incremental_distinct_orders``) from the fact's snapshot
    diff; a streaming loop from its per-batch CDC apply. ``meta`` lands
    on BOTH commits (support first — see the crash protocol in the
    section comment)."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    deltas = (
        feed.filter(
            F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .groupBy(group_col, value_col)
        .agg(F.sum(sign).alias("d_cnt"))
        .filter(F.col("d_cnt") != 0)
    )
    deltas = materialize(deltas)
    if deltas.isEmpty():
        # the batch touched only NULLs or netted to zero per pair —
        # nothing can transition; advance both watermarks with a
        # no-row-change commit each (cheap: both tables are small).
        # Independent tables — overlapped (§2.6; crash-order argument at
        # the data commits below applies a fortiori to no-op commits)
        overlap(
            lambda: upsert(
                spark, support_dir,
                read_current_with_deltas(
                    spark, support_dir, key=[group_col, value_col]
                ).limit(0),
                key=[group_col, value_col],
                keep=keep,
                meta=meta,
            ),
            lambda: upsert(
                spark, agg_dir,
                read_current(spark, agg_dir).limit(0),
                key=[group_col],
                keep=keep,
                meta=meta,
            ),
        )
        return
    support = _pruned_by_keys(
        read_current_with_deltas(spark, support_dir, key=[group_col, value_col]),
        group_col,
        deltas.select(group_col).distinct(),
    )
    touched = support.join(deltas, [group_col, value_col], "right_outer").select(
        group_col,
        value_col,
        F.coalesce(F.col("cnt"), F.lit(0)).alias("old_cnt"),
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.col("d_cnt")).alias("cnt"),
    )
    touched = materialize(touched)  # old-vs-new read once, consumed twice
    appeared = (F.col("old_cnt") <= 0) & (F.col("cnt") > 0)
    vanished = (F.col("old_cnt") > 0) & (F.col("cnt") <= 0)
    d_distinct = (
        touched.groupBy(group_col)
        .agg(
            F.sum(
                F.when(appeared, 1).when(vanished, -1).otherwise(0)
            ).alias("d_distinct")
        )
        .filter(F.col("d_distinct") != 0)
    )
    # d_distinct has exactly ONE consumer (the agg rollup's commit below)
    # and derives from the checkpointed `touched`, so it needs no
    # materialize of its own (r13 wave 5 — the checkpoint was a pure
    # extra job)
    # The two commits run CONCURRENTLY (r14, guide §2.6): both derive
    # from the checkpointed `touched` plus their OWN stored table —
    # neither reads the other's — so they are data-independent and only
    # their crash order mattered. The r13 shape serialized support-first
    # so a crash left agg-behind (repairable by rebuilding the agg from
    # the support); overlapped, a crash can also leave agg-AHEAD, and
    # the fold's existing mismatch branch already covers it: on ANY
    # sup_applied != agg_applied the support stays authoritative — the
    # agg is rebuilt from it at the support's watermark and the residual
    # diff re-folds, which converges whether the agg was behind or ahead
    # (the rebuild overwrites either). Support keeps one commit of grace
    # (keep >= 2) regardless of the caller's keep: the agg rollup
    # derives from the PRE-upsert support, and under a non-checkpointing
    # materialization mode (plans.materialize.plan_only — the width
    # audit; mode 'none') or a task retry spanning this commit, its
    # lineage re-reads the old snapshot this commit would otherwise GC
    stored_agg = read_current(spark, agg_dir)
    folded = stored_agg.join(d_distinct, group_col, "right_outer").select(
        group_col,
        (F.coalesce(F.col("distinct_cnt"), F.lit(0)) + F.col("d_distinct")).alias(
            "distinct_cnt"
        ),
    )
    overlap(
        lambda: upsert(
            spark,
            support_dir,
            touched.drop("old_cnt"),
            key=[group_col, value_col],
            cluster_by=[group_col],
            keep=max(keep, 2),
            meta=meta,
        ),
        lambda: upsert(
            spark,
            agg_dir,
            folded,
            key=[group_col],
            keep=keep,
            meta=meta,
        ),
    )


_DISTINCT_JOIN_VIEW_ORACLE = """
WITH postfact AS (
    SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
    WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
    UNION ALL
    SELECT o_orderkey, o_custkey, 'X-RECLASS' FROM orders WHERE o_orderkey % 5 = 0
),
postdim AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment || '_R'
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer
)
SELECT d.c_mktsegment, COUNT(DISTINCT f.o_orderpriority) AS distinct_cnt
FROM postfact f JOIN postdim d ON f.o_custkey = d.c_custkey
WHERE d.c_mktsegment IS NOT NULL AND f.o_orderpriority IS NOT NULL
GROUP BY d.c_mktsegment
ORDER BY d.c_mktsegment
"""


@register(
    "lake_incremental_distinct_join_view_orders",
    oracle=_DISTINCT_JOIN_VIEW_ORACLE,
    doc=(
        "cascade IVM for exact COUNT DISTINCT — the third classic aggregate "
        "shape: per-segment distinct order priorities maintained OVER the "
        "maintained orders JOIN customer view via a per-(group, value) "
        "multiplicity SUPPORT table; the support folds with the signed rule "
        "and the count changes only on 0-to-present / present-to-0 "
        "transitions — deletes are exact from the support's own evidence, no "
        "rescan arm, view and bases never read; exactly-once via the same "
        "stamped view-state watermark on both stored tables; oracle "
        "recomputes the distinct counts from both post states"
    ),
)
def lake_incremental_distinct_join_view_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end COUNT DISTINCT cascade cycle on driver-checkable data:
    the standard fact/dim/view scenario with the CDC reclassifying every
    5th order's priority to 'X-RECLASS' (a NEW distinct value appears in
    every touched segment, and the preimage priorities lose multiplicity
    — some pairs transition to zero), deleting every non-5th 7th, and
    renaming every 10th customer's segment (whole groups appear and lose
    members). The aggregate is maintained purely from the cascade; the
    driver hash proves fold == recompute."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base_fact = orders.filter(F.col("o_orderkey") % 3 != 0)
    fact_dir = tempfile.mkdtemp(prefix="pgcp_dst_fact_")
    dim_dir = tempfile.mkdtemp(prefix="pgcp_dst_dim_")
    view_dir = tempfile.mkdtemp(prefix="pgcp_dst_view_")
    sup_dir = tempfile.mkdtemp(prefix="pgcp_dst_sup_")
    agg_dir = tempfile.mkdtemp(prefix="pgcp_dst_agg_")

    def _cleanup() -> None:
        for d in (fact_dir, dim_dir, view_dir, sup_dir, agg_dir):
            shutil.rmtree(d, ignore_errors=True)

    try:
        from pgcp_spark.sources.lake import pending_state

        view0 = base_fact.join(
            dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).select("o_orderkey", "o_custkey", "o_orderpriority", "c_mktsegment")

        def _view_then_aggs() -> None:
            # both stamps read the committed view state; the support and
            # agg tables are themselves independent — chained view first,
            # then the two downstream writes overlapped (§2.6)
            write_snapshot(view0, view_dir, cluster_by=["o_custkey"])
            state0 = pending_state(view_dir)
            overlap(
                lambda: write_snapshot(
                    build_distinct_support(view0, "c_mktsegment", "o_orderpriority"),
                    sup_dir,
                    cluster_by=["c_mktsegment"],
                    meta={"applied_view_state": state0},
                ),
                lambda: write_snapshot(
                    build_distinct_over(view0, "c_mktsegment", "o_orderpriority"),
                    agg_dir,
                    meta={"applied_view_state": state0},
                ),
            )

        fact_snap, dim_snap, _ = overlap(
            lambda: write_snapshot(base_fact, fact_dir, keep=2),
            lambda: write_snapshot(dim, dim_dir, keep=2),
            _view_then_aggs,
        )

        dim_updates = dim.filter(F.col("c_custkey") % 10 == 0).withColumn(
            "c_mktsegment", F.concat(F.col("c_mktsegment"), F.lit("_R"))
        )
        ups = (
            orders.filter(F.col("o_orderkey") % 5 == 0)
            .withColumn("o_orderpriority", F.lit("X-RECLASS"))
            .withColumn("_op", F.lit("upsert"))
        )
        dels = orders.filter(
            (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 5 != 0)
        ).withColumn("_op", F.lit("delete"))
        overlap(  # disjoint tables (§2.6)
            lambda: upsert(spark, dim_dir, dim_updates, key=["c_custkey"], keep=2),
            lambda: merge_cdc(
                spark, fact_dir, ups.unionByName(dels), key=["o_orderkey"], keep=2
            ),
        )

        fold_join_view(
            spark,
            view_dir,
            view_key=["o_orderkey"],
            fact_feed=table_changes(spark, fact_dir, fact_snap, key=["o_orderkey"]),
            dim_feed=table_changes(spark, dim_dir, dim_snap, key=["c_custkey"]),
            dim_current=read_current(spark, dim_dir),
            fact_join_col="o_custkey",
            dim_join_col="c_custkey",
        )
        fold_distinct_join_view(
            spark, sup_dir, agg_dir, view_dir, ["o_orderkey"],
            "c_mktsegment", "o_orderpriority",
        )
        result = materialize(
            read_distinct_agg(spark, agg_dir, "c_mktsegment").orderBy(
                "c_mktsegment"
            )
        )
    except BaseException:
        _cleanup()
        raise
    reclaim_by_mode(fact_dir, dim_dir, view_dir, sup_dir, agg_dir)
    return result


# --- per-group TOP-K in the cascade fold (round 13) -------------------------
# MIN/MAX generalized: k best rows per group (the serving-layer
# "top sellers per segment" shape; min/max is k=1 over one column). The
# same insert/delete split applies, with one structural improvement the
# richer stored state buys: membership is decided BY KEY, so the delete
# rule is EXACT, not conservative — the stored set is the k best rows,
# and removing a row that is NOT one of them can never change which k
# are best; only a removal whose (group, key) IS a stored member (or
# one against a group the store has no evidence for — drift) forces a
# rescan, because the successor row is exactly what the store does not
# carry. Inserts fold by merge-and-rerank: stored ∪ batch-post rows →
# rank → keep k, a feed+k-sized window over touched groups only.
# Storage is k rows per group; the keyed upsert on [group] replaces a
# touched group's whole set in one commit (kept = anti-join on group).


def build_topk_over(
    df: DataFrame, group_col: str, key_col: str, value_col: str, k: int
) -> DataFrame:
    """The stored top-k set over any view-shaped frame: the ``k``
    highest-``value_col`` rows per group, ties broken by ``key_col``
    ascending (deterministic, and the same ORDER BY the oracle uses).
    NULL groups/keys are excluded (keyed-upsert contract); NULL values
    sort last and only appear when a group has fewer than k non-NULL
    rows. Shared by the initial build, the rescan arm, and the tests'
    recompute oracle. Stored WITHOUT ranks — a rank is derivable and
    storing it would force rewrites on every membership change."""
    from pyspark.sql import Window

    from pgcp_spark.operators._decimal import dec

    w = Window.partitionBy(group_col).orderBy(
        F.col("_v").desc_nulls_last(), F.col(key_col)
    )
    return (
        df.filter(F.col(group_col).isNotNull() & F.col(key_col).isNotNull())
        .select(group_col, key_col, dec(value_col, "decimal(18,2)").alias("_v"))
        .withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .select(group_col, key_col, F.col("_v").alias("topv"))
    )


def serve_topk(stored: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """The serving projection: ranks recomputed over the stored k-row
    sets (a window over ≤k-row partitions — no wide or single-partition
    exchange), values cast to double for the driver hash."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col("topv").desc_nulls_last(), F.col(key_col)
    )
    return stored.select(
        group_col,
        key_col,
        F.col("topv").cast("double").alias("total"),
        F.row_number().over(w).alias("rnk"),
    )


def topk_rescan_groups(stored: DataFrame, pre_rows: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """The rescan decision, factored for the pin in tests: the groups
    needing a rescan are EXACTLY those with a removal hitting a stored
    member (left-semi on (group, key)) plus — defensively — removals
    against groups the store carries no rows for (the fold cannot prove
    anything about a group it has no evidence for)."""
    hits = pre_rows.join(
        stored.select(group_col, key_col), [group_col, key_col], "left_semi"
    ).select(group_col)
    orphans = pre_rows.select(group_col).join(
        stored.select(group_col).distinct(), [group_col], "left_anti"
    )
    return hits.unionByName(orphans).distinct()


def fold_topk_join_view(
    spark: SparkSession,
    agg_dir: str,
    view_dir: str,
    view_key: list[str],
    group_col: str,
    key_col: str,
    value_col: str,
    k: int,
    keep: int = 1,
) -> bool:
    """Fold the view's changes since the last fold into the stored
    per-group top-k sets. Watermark discipline is the family's
    (``applied_view_state`` commit meta; replay skip / missing-watermark
    refuse / GC'd-state refuse — the merge-and-rerank fold is not
    idempotent).

    Scale: the feed is batch-sized on the prefix path; the rescan
    decision is two feed-sized semi/anti joins against the (k x groups)-
    sized store; non-rescan groups re-rank (stored ∪ batch-post) — a
    window over (k + batch)-sized partitions of touched groups only; the
    rescan arm reads ONLY member-hit groups from the maintained view
    (pushed-IN + CLUSTER BY), never the bases. The delete rule is EXACT
    (see the section comment) — no conservative-under-duplicates term,
    unlike MIN/MAX."""
    from pyspark.sql import Window

    from pgcp_spark.operators._decimal import dec
    from pgcp_spark.sources.lake import (
        pending_state,
        snapshot_meta,
        state_changes,
    )

    state = pending_state(view_dir)
    applied = snapshot_meta(agg_dir).get("applied_view_state")
    if applied == state:
        return False
    if applied is None:
        raise RuntimeError(
            f"{agg_dir}: no applied_view_state watermark (never stamped, or "
            "cleared by a metaless commit) — refusing to fold; rebuild from "
            "the view (build_topk_over + a stamped write_snapshot) or "
            "stamp_applied_state if the stored sets are KNOWN current."
        )
    try:
        feed = state_changes(spark, view_dir, applied, state, key=view_key)
    except FileNotFoundError as exc:
        raise RuntimeError(
            "the applied view state is no longer readable (a flatten/vacuum "
            "GC'd it); re-anchor with stamp_applied_state after each "
            "flatten, or rebuild from the view."
        ) from exc
    feed = materialize(feed)
    if feed.isEmpty():
        return False
    post_rows = (
        feed.filter(
            F.col("_change_type").isin("insert", "update_postimage")
            & F.col(group_col).isNotNull()
            & F.col(key_col).isNotNull()
        )
        .select(group_col, key_col, dec(value_col, "decimal(18,2)").alias("topv"))
    )
    pre_rows = (
        feed.filter(
            F.col("_change_type").isin("delete", "update_preimage")
            & F.col(group_col).isNotNull()
            & F.col(key_col).isNotNull()
        )
        .select(group_col, key_col)
    )
    stored = read_current(spark, agg_dir)
    # TWO bounded probe jobs (r13 wave 5, guide §1.2) replace the r12
    # shape's two materialize checkpoints + isEmpty + pushed-IN collect:
    # the rescan / post group lists are group-cardinality-sized in any
    # dashboard-shaped fold, so they ride the _collected_keys bound and
    # every downstream selection becomes a literal IN (which also pushes
    # into the view/store parquet scans); lists beyond the bound fall
    # back to the distributed join path unchanged.
    rescan_frame = topk_rescan_groups(stored, pre_rows, group_col, key_col)
    rescan_vals = _collected_keys(rescan_frame)
    post_groups = post_rows.select(group_col).distinct()
    post_vals = _collected_keys(post_groups) if rescan_vals is not None else None
    if rescan_vals is None or post_vals is None:
        rescan_keys = materialize(rescan_frame)
        touched_groups = materialize(
            post_groups.unionByName(rescan_keys).distinct()
        )
        # non-rescan touched groups: merge-and-rerank, newest-wins on key
        merge_groups = touched_groups.join(rescan_keys, [group_col], "left_anti")
        stored_m = stored.join(merge_groups, [group_col], "left_semi")
        post_m = post_rows.join(merge_groups, [group_col], "left_semi")
        view_now = (
            read_current_with_deltas(spark, view_dir, key=view_key).join(
                rescan_keys, on=group_col, how="left_semi"
            )
            if not rescan_keys.isEmpty()
            else None
        )
        kept = stored.join(touched_groups, [group_col], "left_anti")
    else:
        rescan_set = set(rescan_vals)
        touched_vals = sorted(rescan_set | set(post_vals))
        merge_vals = [g for g in touched_vals if g not in rescan_set]
        stored_m = (
            stored.filter(F.col(group_col).isin(merge_vals))
            if merge_vals
            else stored.limit(0)
        )
        post_m = (
            post_rows.filter(F.col(group_col).isin(merge_vals))
            if merge_vals
            else post_rows.limit(0)
        )
        view_now = (
            read_current_with_deltas(spark, view_dir, key=view_key).filter(
                F.col(group_col).isin(rescan_vals)
            )
            if rescan_vals
            else None
        )
        # stored group keys are non-NULL by construction (build_topk_over
        # filters them), but keep NULL rows defensively — the anti-join
        # this replaces never dropped them
        kept = (
            stored.filter(
                F.col(group_col).isNull()
                | ~F.col(group_col).isin(touched_vals)
            )
            if touched_vals
            else stored
        )
    base_m = stored_m.join(
        post_m.select(group_col, key_col), [group_col, key_col], "left_anti"
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("topv").desc_nulls_last(), F.col(key_col)
    )
    merged = (
        base_m.unionByName(post_m)
        .withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .drop("_rnk")
    )
    out = merged
    if view_now is not None:
        rescanned = build_topk_over(view_now, group_col, key_col, value_col, k)
        out = merged.unionByName(rescanned)
    # per-group SET replacement as ONE explicit copy-on-write commit:
    # drop every touched group's old rows, land its new <=k rows (a
    # group whose replacement set is EMPTY — all members deleted,
    # nothing re-inserted — simply contributes no rows), carry every
    # untouched group over. The agg table is (k x groups)-sized, so the
    # rewrite is the same cost class as the keyed upsert (itself a full
    # COW merge) while expressing row REMOVAL, which a keyed upsert
    # cannot. One commit of grace (keep >= 2): the replacement derives
    # from the pre-commit store (the plan-only/task-retry rule the
    # distinct fold's support commit established).
    write_snapshot(
        kept.unionByName(out),
        agg_dir,
        keep=max(keep, 2),
        cluster_by=[group_col],
        meta={"applied_view_state": state},
    )
    return True


_TOPK_JOIN_VIEW_ORACLE = """
WITH postfact AS (
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS p
    FROM orders
    WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
    UNION ALL
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) * 2
    FROM orders WHERE o_orderkey % 5 = 0
),
postdim AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment || '_R'
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer
),
joined AS (
    SELECT d.c_mktsegment, f.o_orderkey, f.p
    FROM postfact f JOIN postdim d ON f.o_custkey = d.c_custkey
    WHERE d.c_mktsegment IS NOT NULL AND f.o_orderkey IS NOT NULL
)
SELECT c_mktsegment, o_orderkey, CAST(p AS DOUBLE) AS total,
       CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT c_mktsegment, o_orderkey, p,
           ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment ORDER BY p DESC, o_orderkey
           ) AS rnk
    FROM joined
)
WHERE rnk <= 3
ORDER BY c_mktsegment, rnk
"""


@register(
    "lake_incremental_topk_join_view_orders",
    oracle=_TOPK_JOIN_VIEW_ORACLE,
    doc=(
        "cascade IVM for per-group TOP-K — MIN/MAX generalized: the 3 "
        "highest-value orders per segment maintained OVER the maintained "
        "orders JOIN customer view; inserts fold by merge-and-rerank over "
        "(stored set ∪ batch rows), and the delete rule is EXACT — only a "
        "removal whose key IS a stored member rescans, and only its group, "
        "through the view with pushed-IN pruning; exactly-once via the same "
        "stamped view-state watermark; oracle recomputes the ranked top-3 "
        "from both post states"
    ),
)
def lake_incremental_topk_join_view_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end TOP-K cascade cycle on driver-checkable data: the
    standard fact/dim/view scenario (doubling every 5th key promotes
    rows INTO segment top-3s through the merge-and-rerank fold; deleting
    every non-5th 7th evicts stored members — exactly those groups
    rescan; renaming every 10th customer's segment moves rows between
    groups, driving both arms at once). The served ranking is the
    FOLD's, never a recompute; the driver hash proves fold == recompute."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base_fact = orders.filter(F.col("o_orderkey") % 3 != 0)
    fact_dir = tempfile.mkdtemp(prefix="pgcp_topk_fact_")
    dim_dir = tempfile.mkdtemp(prefix="pgcp_topk_dim_")
    view_dir = tempfile.mkdtemp(prefix="pgcp_topk_view_")
    agg_dir = tempfile.mkdtemp(prefix="pgcp_topk_agg_")

    def _cleanup() -> None:
        for d in (fact_dir, dim_dir, view_dir, agg_dir):
            shutil.rmtree(d, ignore_errors=True)

    try:
        from pgcp_spark.sources.lake import pending_state

        view0 = base_fact.join(
            dim.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
        ).select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")

        def _view_then_agg() -> None:
            # agg stamp reads the committed view state — chained (§2.6)
            write_snapshot(view0, view_dir, cluster_by=["o_custkey"])
            write_snapshot(
                build_topk_over(
                    view0, "c_mktsegment", "o_orderkey", "o_totalprice", 3
                ),
                agg_dir,
                cluster_by=["c_mktsegment"],
                meta={"applied_view_state": pending_state(view_dir)},
            )

        fact_snap, dim_snap, _ = overlap(
            lambda: write_snapshot(base_fact, fact_dir, keep=2),
            lambda: write_snapshot(dim, dim_dir, keep=2),
            _view_then_agg,
        )

        dim_updates = dim.filter(F.col("c_custkey") % 10 == 0).withColumn(
            "c_mktsegment", F.concat(F.col("c_mktsegment"), F.lit("_R"))
        )
        ups = (
            orders.filter(F.col("o_orderkey") % 5 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
            .withColumn("_op", F.lit("upsert"))
        )
        dels = orders.filter(
            (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 5 != 0)
        ).withColumn("_op", F.lit("delete"))
        overlap(  # disjoint tables (§2.6)
            lambda: upsert(spark, dim_dir, dim_updates, key=["c_custkey"], keep=2),
            lambda: merge_cdc(
                spark, fact_dir, ups.unionByName(dels), key=["o_orderkey"], keep=2
            ),
        )

        fold_join_view(
            spark,
            view_dir,
            view_key=["o_orderkey"],
            fact_feed=table_changes(spark, fact_dir, fact_snap, key=["o_orderkey"]),
            dim_feed=table_changes(spark, dim_dir, dim_snap, key=["c_custkey"]),
            dim_current=read_current(spark, dim_dir),
            fact_join_col="o_custkey",
            dim_join_col="c_custkey",
        )
        fold_topk_join_view(
            spark, agg_dir, view_dir, ["o_orderkey"],
            "c_mktsegment", "o_orderkey", "o_totalprice", 3,
        )
        result = materialize(
            serve_topk(
                read_current(spark, agg_dir), "c_mktsegment", "o_orderkey"
            ).orderBy("c_mktsegment", "rnk")
        )
    except BaseException:
        _cleanup()
        raise
    reclaim_by_mode(fact_dir, dim_dir, view_dir, agg_dir)
    return result
