"""Filtered vector search (pgcp_spark/functions/ann_filtered.py): the
same-label invariant, exact-tier parity with numpy, the all-lists
probe's bit-identity with the exact tier, and the measured recall floor
at the doubled default nprobe."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgcp_spark.functions.ann_filtered import (
    FILTER_NPROBE,
    _labeled,
    filtered_batch_vs_ann_index,
    filtered_topk,
    sim_filtered_batch_vs_ann_index,
    sim_filtered_cosine_topk,
)
from pgcp_spark.functions.ann_index import IVF_LISTS, ensure_ann_index
from pgcp_spark.functions.similarity import QUERY_STRIDE
from tests.conftest import SF_DIR


def _np_filtered_topk(rows, stride, k=3):
    """Driver-side numpy recomputation of same-label top-k — the local
    oracle for the exact tier (the DuckDB oracle runs in the mimic)."""
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    labels = np.array([r.label for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    out = []
    for qi in np.where(ids % stride == 0)[0]:
        mask = (labels == labels[qi]) & (ids != ids[qi])
        cand = np.where(mask)[0]
        sims = np.round(
            (mat[cand] @ mat[qi]) / (nrm[cand] * nrm[qi]), 6
        )
        order = sorted(zip(-sims, ids[cand]))[:k]
        out.extend(
            (int(ids[qi]), int(nid), r, float(-negs))
            for r, (negs, nid) in enumerate(order, start=1)
        )
    return sorted(out)


def test_exact_tier_matches_numpy_and_shares_labels(spark):
    """Every returned neighbor shares the query's label, and the whole
    frame (ids, ranks, rounded scores) equals a driver-side numpy
    recomputation — the exact tier's local oracle."""
    rows = _labeled(spark, SF_DIR).collect()
    label_of = {r.vec_id: r.label for r in rows}
    got = sim_filtered_cosine_topk(spark, SF_DIR).collect()
    assert len(got) > 0
    for r in got:
        assert label_of[r.vec_id] == label_of[r.neighbor_id], r
    want = _np_filtered_topk(rows, QUERY_STRIDE)
    assert sorted(
        (r.vec_id, r.neighbor_id, r.rank, r.cos_sim) for r in got
    ) == pytest.approx(want)


def test_probe_same_label_invariant(spark):
    """The filtered probe may miss neighbors (nprobe is approximate) but
    must NEVER return a candidate violating the predicate."""
    rows = _labeled(spark, SF_DIR).collect()
    label_of = {r.vec_id: r.label for r in rows}
    got = sim_filtered_batch_vs_ann_index(spark, SF_DIR).collect()
    assert len(got) > 0
    for r in got:
        assert label_of[r.vec_id] == label_of[r.neighbor_id], r


def test_all_lists_probe_equals_exact_tier_exactly(spark):
    """With every list probed, the filtered probe's candidate universe
    is the whole indexed split, so the result must be BIT-IDENTICAL to
    the exact tier on the same (batch, split) frames — same ids, ranks,
    scores, tie-breaks. This isolates the probe's ONLY approximation:
    list routing."""
    e = _labeled(spark, SF_DIR)
    batch = e.filter(F.col("vec_id") % 10 == 0)
    split = e.filter(F.col("vec_id") % 10 != 0)
    idx = ensure_ann_index(spark, SF_DIR)
    want = [tuple(r) for r in filtered_topk(batch, split).collect()]
    got = [
        tuple(r)
        for r in filtered_batch_vs_ann_index(
            spark, batch, idx, e.select("vec_id", "label"), nprobe=IVF_LISTS
        ).collect()
    ]
    assert got == want and len(got) > 0


def test_recall_floor_at_default_nprobe(spark):
    """Measured at sf0.001 and sf0.01: recall vs the exact tier is 0.693
    at the doubled default nprobe=8 (these embeddings are weakly
    clusterable — the same honest story as every IVF floor in the repo;
    nprobe=4 measures ~0.45, all-lists is exactly 1.0 by the test
    above). Floor pinned WELL below at 0.55."""
    e = _labeled(spark, SF_DIR)
    batch = e.filter(F.col("vec_id") % 10 == 0)
    split = e.filter(F.col("vec_id") % 10 != 0)
    idx = ensure_ann_index(spark, SF_DIR)
    exact = {
        (r.vec_id, r.neighbor_id) for r in filtered_topk(batch, split).collect()
    }
    got = {
        (r.vec_id, r.neighbor_id)
        for r in filtered_batch_vs_ann_index(
            spark, batch, idx, e.select("vec_id", "label"), nprobe=FILTER_NPROBE
        ).collect()
    }
    assert len(exact) > 0
    assert len(got & exact) / len(exact) >= 0.55


def test_empty_label_universe_returns_empty(spark):
    """All-null labels: the predicate admits no candidate, both tiers
    return empty frames with the contract schema (not an error)."""
    e = _labeled(spark, SF_DIR).withColumn(
        "label", F.lit(None).cast("int")
    ).filter(F.col("label").isNotNull())
    assert filtered_topk(e, e).count() == 0
    idx = ensure_ann_index(spark, SF_DIR)
    got = filtered_batch_vs_ann_index(
        spark, e, idx, e.select("vec_id", "label")
    )
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == [
        "vec_id", "neighbor_id", "rank", "cos_sim",
    ]


def test_lp_probe_same_label_invariant_and_registered_runs(spark):
    """The partitioned probe can only ever scan the query's own label's
    lists, so the invariant holds by construction — pinned anyway."""
    from pgcp_spark.functions.ann_filtered import sim_label_partitioned_ann_topk

    rows = _labeled(spark, SF_DIR).collect()
    label_of = {r.vec_id: r.label for r in rows}
    got = sim_label_partitioned_ann_topk(spark, SF_DIR).collect()
    assert len(got) > 0
    for r in got:
        assert label_of[r.vec_id] == label_of[r.neighbor_id], r


def test_lp_all_lists_probe_equals_exact_tier_exactly(spark):
    """With every label-local list probed, the candidate universe is the
    label's whole indexed split — bit-identical to the exact tier on the
    same frames, the family's routing-isolation pin."""
    from pgcp_spark.functions.ann_filtered import (
        ensure_lp_index,
        label_partitioned_topk,
    )

    e = _labeled(spark, SF_DIR)
    batch = e.filter(F.col("vec_id") % 10 == 0)
    split = e.filter(F.col("vec_id") % 10 != 0)
    lp = ensure_lp_index(spark, SF_DIR)
    want = [tuple(r) for r in filtered_topk(batch, split).collect()]
    got = [
        tuple(r)
        for r in label_partitioned_topk(spark, batch, lp, nprobe=IVF_LISTS).collect()
    ]
    assert got == want and len(got) > 0


def test_lp_recall_floor_and_beats_lookup_join(spark):
    """Measured: label-pure routing recalls 0.907/0.933 (sf0.001/sf0.01)
    at nprobe=8 vs the lookup-join probe's 0.693 at the SAME nprobe —
    and even at nprobe=4 (HALF the scan fraction) 0.733/0.740 beats it.
    Floors pinned WELL below: 0.80 at nprobe=8, and strictly above the
    lookup-join probe's result on the same lake."""
    from pgcp_spark.functions.ann_filtered import (
        ensure_lp_index,
        label_partitioned_topk,
    )

    e = _labeled(spark, SF_DIR)
    batch = e.filter(F.col("vec_id") % 10 == 0)
    split = e.filter(F.col("vec_id") % 10 != 0)
    exact = {
        (r.vec_id, r.neighbor_id) for r in filtered_topk(batch, split).collect()
    }
    lp = ensure_lp_index(spark, SF_DIR)
    got = {
        (r.vec_id, r.neighbor_id)
        for r in label_partitioned_topk(
            spark, batch, lp, nprobe=FILTER_NPROBE
        ).collect()
    }
    lp_recall = len(got & exact) / len(exact)
    assert lp_recall >= 0.80
    idx = ensure_ann_index(spark, SF_DIR)
    lj = {
        (r.vec_id, r.neighbor_id)
        for r in filtered_batch_vs_ann_index(
            spark, batch, idx, e.select("vec_id", "label"), nprobe=FILTER_NPROBE
        ).collect()
    }
    assert lp_recall > len(lj & exact) / len(exact)


def test_lp_plan_pushes_both_predicates_no_metadata_join(spark):
    """The filter-in-index payoff, plan-pinned: the stored scan's
    PushedFilters carry BOTH the label and the list_id predicates, and
    the plan reads the source embeddings table exactly once (the batch
    side) — no metadata lookup join anywhere."""
    from pgcp_spark.functions.ann_filtered import sim_label_partitioned_ann_topk
    from pgcp_spark.plans.explain import physical_plan, pushed_filters

    df = sim_label_partitioned_ann_topk(spark, SF_DIR)
    plan = physical_plan(df)
    vec_scans = [
        f for f in pushed_filters(df) if "label" in f and "list_id" in f
    ]
    assert vec_scans, f"no scan pushes (label, list_id): {pushed_filters(df)}"
    # the probe frame is materialized (ExistingRDD), so the ONLY parquet
    # scan left in the plan must be the partitioned vectors table itself —
    # a second one would be a metadata lookup creeping back in (formatted
    # explain prints each node twice: once in the tree, once in the
    # details — count the numbered detail entries)
    import re

    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan
    assert "vectors_p" in plan


def test_lp_build_refuses_fine_grained_payload(spark, tmp_path, monkeypatch):
    """The partition-key contract's hard guard: a payload column with
    more distinct values than LP_MAX_LABELS must raise (a silent cap
    would serve empty results for the uncovered labels), pointing the
    caller at the lookup-join tier."""
    import pgcp_spark.functions.ann_filtered as AF

    monkeypatch.setattr(AF, "LP_MAX_LABELS", 3)
    e = _labeled(spark, SF_DIR).withColumn(
        "label", (F.col("vec_id") % 10).cast("int")  # 10 labels > cap 3
    )
    with pytest.raises(ValueError, match="partition-key contract"):
        AF.build_label_partitioned_index(spark, e, str(tmp_path / "lp"))


# --- range-predicate tier (round 11) ---------------------------------------


def _range_frames(spark):
    from pgcp_spark.functions.ann_filtered import _ts_payload
    from pgcp_spark.functions.similarity import valid_embedding
    from pgcp_spark.sources import load_table

    e = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .filter(valid_embedding())
    )
    batch = e.filter(F.col("vec_id") % 10 == 0)
    split = e.filter(F.col("vec_id") % 10 != 0)
    return e, batch, split, _ts_payload(e)


def test_range_probe_in_window_invariant(spark):
    """The range probe may miss neighbors but must NEVER return one
    whose payload lies outside [TS_LO, TS_HI]."""
    from pgcp_spark.functions.ann_filtered import (
        TS_HI,
        TS_LO,
        sim_range_filtered_batch_vs_ann_index,
    )

    got = sim_range_filtered_batch_vs_ann_index(spark, SF_DIR).collect()
    assert len(got) > 0
    for r in got:
        ts = (r.neighbor_id * 2654435761) % 100_000
        assert TS_LO <= ts <= TS_HI, r


def test_range_all_lists_probe_equals_exact_tier_exactly(spark):
    """Every list probed ⇒ bit-identical to the exact range tier on the
    same (batch, split, payload) frames — isolates list routing as the
    probe's only approximation, exactly like the label tier's pin."""
    from pgcp_spark.functions.ann_filtered import (
        TS_HI,
        TS_LO,
        range_filtered_batch_vs_ann_index,
        range_filtered_topk,
    )

    e, batch, split, payload = _range_frames(spark)
    idx = ensure_ann_index(spark, SF_DIR)
    want = [
        tuple(r)
        for r in range_filtered_topk(batch, split, payload, TS_LO, TS_HI).collect()
    ]
    got = [
        tuple(r)
        for r in range_filtered_batch_vs_ann_index(
            spark, batch, idx, payload, TS_LO, TS_HI, nprobe=IVF_LISTS
        ).collect()
    ]
    assert got == want and len(got) > 0


def test_range_probe_recall_floor_and_beats_post_filtering(spark):
    """The A/B the range tier exists for: at the same nprobe, applying
    the predicate BEFORE scoring (pre-filter) must recall at least as
    much of the exact filtered answer as running the unfiltered probe
    and filtering its top-k AFTER (post-filter) — post-filtering loses
    every slot an out-of-window neighbor crowded out of the top-k.
    Measured at sf0.001: pre 0.873 vs post 0.667 (sf0.01: 0.800 vs
    0.553); floors pinned well below at 0.55 / the beats-relation."""
    from pgcp_spark.functions.ann_filtered import (
        FILTER_NPROBE,
        TS_HI,
        TS_LO,
        range_filtered_batch_vs_ann_index,
        range_filtered_topk,
    )
    from pgcp_spark.functions.ann_index import batch_vs_ann_index

    e, batch, split, payload = _range_frames(spark)
    idx = ensure_ann_index(spark, SF_DIR)
    exact = {
        (r.vec_id, r.neighbor_id)
        for r in range_filtered_topk(batch, split, payload, TS_LO, TS_HI).collect()
    }
    assert exact
    pre = {
        (r.vec_id, r.neighbor_id)
        for r in range_filtered_batch_vs_ann_index(
            spark, batch, idx, payload, TS_LO, TS_HI, nprobe=FILTER_NPROBE
        ).collect()
    }
    # post-filtering baseline: unfiltered probe at the SAME nprobe, its
    # already-ranked top-k then filtered to the window (the naive recipe)
    unfiltered = batch_vs_ann_index(spark, batch, idx, nprobe=FILTER_NPROBE)
    in_window = {
        r.vec_id
        for r in payload.filter(F.col("ts").between(TS_LO, TS_HI)).collect()
    }
    post = {
        (r.vec_id, r.neighbor_id)
        for r in unfiltered.collect()
        if r.neighbor_id in in_window
    }
    pre_recall = len(pre & exact) / len(exact)
    post_recall = len(post & exact) / len(exact)
    assert pre_recall >= 0.55, f"pre-filter recall too low: {pre_recall:.2f}"
    assert pre_recall >= post_recall, (pre_recall, post_recall)


def test_zr_probe_bit_identical_to_lookup_join_probe(spark):
    """The z-ordered layout changes what the scan READS, never what it
    returns: at equal nprobe (default AND all-lists) the z-tier result
    equals the lookup-join range probe bit-for-bit — which carries the
    all-lists == exact pin, so exactness transfers."""
    from pgcp_spark.functions.ann_filtered import (
        FILTER_NPROBE,
        TS_HI,
        TS_LO,
        ensure_zr_index,
        range_filtered_batch_vs_ann_index,
        range_filtered_zorder_topk,
    )

    e, batch, split, payload = _range_frames(spark)
    base = ensure_ann_index(spark, SF_DIR)
    zr = ensure_zr_index(spark, SF_DIR)
    for nprobe in (FILTER_NPROBE, IVF_LISTS):
        want = [
            tuple(r)
            for r in range_filtered_batch_vs_ann_index(
                spark, batch, base, payload, TS_LO, TS_HI, nprobe=nprobe
            ).collect()
        ]
        got = [
            tuple(r)
            for r in range_filtered_zorder_topk(
                spark, batch, base, zr, TS_LO, TS_HI, nprobe=nprobe
            ).collect()
        ]
        assert got == want and len(got) > 0, f"nprobe={nprobe}"


def test_zr_plan_single_scan_both_predicates_pushed(spark):
    """The z-tier's payoff, plan-pinned: ONE parquet scan (the z-ordered
    vectors table — no payload lookup join anywhere), whose PushedFilters
    carry BOTH the ts range and the list_id IN."""
    from pgcp_spark.functions.ann_filtered import (
        sim_range_filtered_zorder_ann_topk,
    )
    from pgcp_spark.plans.explain import physical_plan, pushed_filters

    df = sim_range_filtered_zorder_ann_topk(spark, SF_DIR)
    both = [
        f for f in pushed_filters(df) if "ts" in f and "list_id" in f
    ]
    assert both, f"no scan pushes (ts, list_id): {pushed_filters(df)}"
    import re

    plan = physical_plan(df)
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan
    assert "vectors_z" in plan


def test_zr_layout_skips_files_the_list_clustered_layout_cannot(spark):
    """The measurement behind the tier: a ts-window predicate consults
    footer min/max stats — under z-order on (ts, list_id) a ~20% window
    overlaps a minority of files, while the base index's list-clustered
    layout spreads every ts range across essentially all files."""
    import glob
    import os

    import pyarrow.parquet as pq

    from pgcp_spark.functions.ann_filtered import ZR_FILES, ensure_zr_index
    from pgcp_spark.sources.lake import current_snapshot

    def overlap(table_dir, col, lo, hi):
        snap = os.path.join(table_dir, current_snapshot(table_dir))
        files = sorted(glob.glob(os.path.join(snap, "*.parquet")))
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for i in range(rg.num_columns):
                    c = rg.column(i)
                    if c.path_in_schema == col and c.statistics is not None:
                        mins.append(c.statistics.min)
                        maxs.append(c.statistics.max)
            if mins and not (max(maxs) < lo or min(mins) > hi):
                hit += 1
        return hit, len(files)

    zr = ensure_zr_index(spark, SF_DIR)
    # a 12% stripe INSIDE one ts quadrant (the test_zorder.py discipline:
    # a stripe straddling a high-bit boundary legitimately touches two z
    # bands). Measured 8/16 files hit at both sf0.001 and sf0.01; pinned
    # at half. The base index's list-clustered vectors table carries no
    # ts column AT ALL — a range reader there scans every file — so any
    # skipping here is strictly better than the lookup-join tier's scan.
    lo, hi = 56_000, 68_000
    z_hit, z_total = overlap(os.path.join(zr, "vectors_z"), "ts", lo, hi)
    assert z_total == ZR_FILES
    # one file of slack: the range exchange SAMPLES its partition bounds
    # (RangePartitioner), so file cut points jitter run to run — the
    # test_zorder.py discipline
    assert z_hit <= z_total // 2 + 1, (
        f"z-order skipped only {z_total - z_hit}/{z_total}"
    )


# --- conjunctive tier (round 12): label AND range --------------------------


def _conj_frames(spark):
    from pgcp_spark.functions.ann_filtered import _labeled, _ts_payload

    e = _labeled(spark, SF_DIR)
    batch = e.filter(F.col("vec_id") % 10 == 0)
    split = e.filter(F.col("vec_id") % 10 != 0)
    return e, batch, split, _ts_payload(e)


def test_conj_probe_invariant_label_and_window(spark):
    """The conjunctive probes may miss neighbors but must NEVER return
    one violating EITHER predicate — same label as the query AND payload
    inside [TS_LO, TS_HI]."""
    from pgcp_spark.functions.ann_filtered import (
        TS_HI,
        TS_LO,
        sim_label_range_filtered_zorder_ann_topk,
    )

    rows = _conj_frames(spark)[0].collect()
    label_of = {r.vec_id: r.label for r in rows}
    got = sim_label_range_filtered_zorder_ann_topk(spark, SF_DIR).collect()
    assert len(got) > 0
    for r in got:
        assert label_of[r.vec_id] == label_of[r.neighbor_id], r
        ts = (r.neighbor_id * 2654435761) % 100_000
        assert TS_LO <= ts <= TS_HI, r


def test_conj_all_lists_probe_equals_exact_tier_exactly(spark):
    """Every list probed ⇒ the composed lookup-join conjunctive probe is
    bit-identical to the exact conjunctive tier on the same frames —
    list routing isolated as the only approximation."""
    from pgcp_spark.functions.ann_filtered import (
        TS_HI,
        TS_LO,
        label_range_filtered_batch_vs_ann_index,
        label_range_filtered_topk,
    )

    e, batch, split, payload = _conj_frames(spark)
    idx = ensure_ann_index(spark, SF_DIR)
    want = [
        tuple(r)
        for r in label_range_filtered_topk(
            batch, split, payload, TS_LO, TS_HI
        ).collect()
    ]
    got = [
        tuple(r)
        for r in label_range_filtered_batch_vs_ann_index(
            spark, batch, idx, e.select("vec_id", "label"), payload,
            TS_LO, TS_HI, nprobe=IVF_LISTS,
        ).collect()
    ]
    assert got == want and len(got) > 0


def test_zlr_probe_bit_identical_to_composed_probe(spark):
    """The 3-key z-ordered layout changes what the scan READS, never
    what it returns: at equal nprobe (default AND all-lists) the z-tier
    equals the composed two-join probe bit-for-bit — which carries the
    all-lists == exact pin above, so exactness transfers."""
    from pgcp_spark.functions.ann_filtered import (
        CONJ_NPROBE,
        TS_HI,
        TS_LO,
        ensure_zlr_index,
        label_range_filtered_batch_vs_ann_index,
        label_range_filtered_zorder_topk,
    )

    e, batch, split, payload = _conj_frames(spark)
    base = ensure_ann_index(spark, SF_DIR)
    zlr = ensure_zlr_index(spark, SF_DIR)
    for nprobe in (CONJ_NPROBE, IVF_LISTS):
        want = [
            tuple(r)
            for r in label_range_filtered_batch_vs_ann_index(
                spark, batch, base, e.select("vec_id", "label"), payload,
                TS_LO, TS_HI, nprobe=nprobe,
            ).collect()
        ]
        got = [
            tuple(r)
            for r in label_range_filtered_zorder_topk(
                spark, batch, base, zlr, TS_LO, TS_HI, nprobe=nprobe
            ).collect()
        ]
        assert got == want and len(got) > 0, f"nprobe={nprobe}"


def test_conj_recall_floor_at_default_nprobe(spark):
    """The conjunction is the family's thinnest filter (~|labels| × the
    window selectivity), so CONJ_NPROBE rises to 12 of 16 lists.
    Measured recall vs the exact conjunctive tier: 0.840 at sf0.001 /
    0.933 at sf0.01; floor pinned well below at 0.55."""
    from pgcp_spark.functions.ann_filtered import (
        CONJ_NPROBE,
        TS_HI,
        TS_LO,
        label_range_filtered_batch_vs_ann_index,
        label_range_filtered_topk,
    )

    e, batch, split, payload = _conj_frames(spark)
    idx = ensure_ann_index(spark, SF_DIR)
    exact = {
        (r.vec_id, r.neighbor_id)
        for r in label_range_filtered_topk(
            batch, split, payload, TS_LO, TS_HI
        ).collect()
    }
    assert exact
    got = {
        (r.vec_id, r.neighbor_id)
        for r in label_range_filtered_batch_vs_ann_index(
            spark, batch, idx, e.select("vec_id", "label"), payload,
            TS_LO, TS_HI, nprobe=CONJ_NPROBE,
        ).collect()
    }
    assert len(got & exact) / len(exact) >= 0.55


def test_zlr_plan_single_scan_three_predicates_pushed(spark):
    """The 3-key tier's payoff, plan-pinned: ONE parquet scan (no label
    lookup, no payload lookup), whose PushedFilters carry the label IN,
    the ts range, AND the list_id IN."""
    import re

    from pgcp_spark.functions.ann_filtered import (
        sim_label_range_filtered_zorder_ann_topk,
    )
    from pgcp_spark.plans.explain import physical_plan, pushed_filters

    # the default spark.sql.maxMetadataStringLength=100 elides the tail
    # of a three-predicate PushedFilters string — raise it for the read
    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        df = sim_label_range_filtered_zorder_ann_topk(spark, SF_DIR)
        pushed = pushed_filters(df)
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    allp = [
        f for f in pushed if "label" in f and "ts" in f and "list_id" in f
    ]
    assert allp, f"no scan pushes (label, ts, list_id): {pushed}"
    plan = physical_plan(df)
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan
    assert "vectors_zlr" in plan


def test_zlr_3key_layout_beats_2key_for_single_label_probe(spark):
    """The measurement behind the generalization: a SINGLE-label windowed
    probe (the realistic serving shape) consults footer stats on both
    label and ts — the 3-key layout's per-file (label, ts) boxes exclude
    a strict majority of files, while the 2-key layout (no label
    dimension) can only skip on ts. The trade is per-dimension
    resolution: interleaving a third column widens each file's ts range
    vs the 2-key layout, which is exactly the 2-D-vs-3-D split the r11
    note predicted — measured, not assumed."""
    import glob
    import os

    import pyarrow.parquet as pq

    from pgcp_spark.functions.ann_filtered import (
        ZLR_FILES,
        ensure_zlr_index,
        ensure_zr_index,
    )
    from pgcp_spark.sources.lake import current_snapshot

    def stats(table_dir, cols):
        snap = os.path.join(table_dir, current_snapshot(table_dir))
        out = []
        for f in sorted(glob.glob(os.path.join(snap, "*.parquet"))):
            md = pq.ParquetFile(f).metadata
            rng: dict = {c: [None, None] for c in cols}
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for i in range(rg.num_columns):
                    c = rg.column(i)
                    if c.path_in_schema in rng and c.statistics is not None:
                        lo, hi = rng[c.path_in_schema]
                        s = c.statistics
                        rng[c.path_in_schema] = [
                            s.min if lo is None else min(lo, s.min),
                            s.max if hi is None else max(hi, s.max),
                        ]
            out.append(rng)
        return out

    zr = ensure_zr_index(spark, SF_DIR)
    zlr = ensure_zlr_index(spark, SF_DIR)
    lo, hi, lab = 56_000, 68_000, 3  # the zr test's stripe + one label

    def hit(rng, col, a, b):
        mn, mx = rng[col]
        return mn is None or not (mx < a or mn > b)

    zlr_stats = stats(os.path.join(zlr, "vectors_zlr"), ["label", "ts"])
    zr_stats = stats(os.path.join(zr, "vectors_z"), ["ts"])
    assert len(zlr_stats) == ZLR_FILES
    zlr_hit = sum(
        1
        for rng in zlr_stats
        if hit(rng, "label", lab, lab) and hit(rng, "ts", lo, hi)
    )
    zr_hit = sum(1 for rng in zr_stats if hit(rng, "ts", lo, hi))
    # the conjunctive reader on the 2-key layout can push ONLY ts (label
    # lives in a lookup table there); one file of range-exchange jitter
    # slack, the test_zorder.py discipline
    assert zlr_hit <= zr_hit, (zlr_hit, zr_hit)
    assert zlr_hit <= len(zlr_stats) // 2 + 1, (
        f"3-key layout hit {zlr_hit}/{len(zlr_stats)} for a single-label "
        f"12% stripe"
    )


def test_conj_wide_window_recall_and_all_lists_exactness(spark):
    """Round 13: the second selectivity point. CONJ_NPROBE was tuned at
    the registered query's ~17x thinning (|labels| x the 60% window);
    with a WIDE window (full ts range — thinning = |labels| only) the
    tuned nprobe must still clear the family floor, and the all-lists
    escape hatch must stay bit-exact — the ANN_LEG_EXACT_BELOW cost-rule
    discipline applied to the conjunctive family. Measured curve in
    tools/conj_curve.py (recall at nprobe 4/8/12/16, both windows, both
    sf points) recorded in SCALE.md round 13."""
    from pgcp_spark.functions.ann_filtered import (
        CONJ_NPROBE,
        TS_MODULUS,
        label_range_filtered_batch_vs_ann_index,
        label_range_filtered_topk,
    )

    e, batch, split, payload = _conj_frames(spark)
    idx = ensure_ann_index(spark, SF_DIR)
    lo, hi = 0, TS_MODULUS - 1  # selectivity 1.0: the window prunes nothing
    want = [
        tuple(r)
        for r in label_range_filtered_topk(
            batch, split, payload, lo, hi
        ).collect()
    ]
    assert want
    # all-lists escape hatch: exactness holds at the wide window too
    got_all = [
        tuple(r)
        for r in label_range_filtered_batch_vs_ann_index(
            spark, batch, idx, e.select("vec_id", "label"), payload,
            lo, hi, nprobe=IVF_LISTS,
        ).collect()
    ]
    assert got_all == want
    # tuned-nprobe recall: LESS thinning can only leave equal-or-more
    # true candidates in the probed lists, so the wide window clears the
    # same 0.55 floor the narrow window is pinned at
    exact = {(v, n) for (v, n, *_rest) in want}
    got = {
        (r.vec_id, r.neighbor_id)
        for r in label_range_filtered_batch_vs_ann_index(
            spark, batch, idx, e.select("vec_id", "label"), payload,
            lo, hi, nprobe=CONJ_NPROBE,
        ).collect()
    }
    assert len(got & exact) / len(exact) >= 0.55
