"""Scalar-quantized two-stage ANN probe (pgcp_spark/functions/ann_int8.py):
returned scores must be EXACT float cosines (quantization may only affect
candidate selection), overlap floors vs the float IVF probe and brute
force, full-candidate equivalence, and the sidecar's staleness discipline."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgcp_spark.functions.ann_index import (
    _batch,
    batch_vs_ann_index,
    ensure_ann_index,
    update_ann_index,
)
from pgcp_spark.functions.ann_int8 import (
    batch_vs_int8_index,
    ensure_int8_sidecar,
    sim_batch_vs_int8_ann_index,
)
from pgcp_spark.sources import lake, load_table
from tests.conftest import SF_DIR


def _by_query(rows):
    out = {}
    for r in rows:
        out.setdefault(r.vec_id, set()).add(r.neighbor_id)
    return out


def test_returned_scores_are_exact_float_cosines(spark):
    """The refine stage's whole contract: every (query, neighbor,
    cos_sim) the quantized probe returns must equal the float cosine of
    the SOURCE embeddings, rounded to the repo's 6 places — int8 touches
    candidate selection only, never reported values."""
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
        .collect()
    }
    rows = sim_batch_vs_int8_ann_index(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        a, b = emb[r.vec_id], emb[r.neighbor_id]
        want = round(
            float(a @ b) / (float(np.linalg.norm(a)) * float(np.linalg.norm(b))), 6
        )
        assert r.cos_sim == pytest.approx(want, abs=1e-9), (r, want)


def test_overlap_floors_vs_float_probe_and_bruteforce(spark):
    """Measured at sf0.001/sf0.01: overlap vs the float IVF probe at the
    same nprobe is 1.0 (64-dim max-abs int8 barely perturbs candidate
    order and the refine fixes the rest) — floor pinned WELL below at
    0.85 avg / 2-of-3 per query. End-to-end recall vs brute force is the
    IVF routing's, which the float probe's own floors already cover —
    asserted here ≥ the float probe's measured overlap minus the
    quantization allowance."""
    idx = ensure_ann_index(spark, SF_DIR)
    b = _batch(spark, SF_DIR)
    flt = _by_query(batch_vs_ann_index(spark, b, idx, nprobe=4, top_k=3).collect())
    i8 = _by_query(batch_vs_int8_index(spark, b, idx, nprobe=4, top_k=3).collect())
    assert set(i8) == set(flt)
    ovs = [len(flt[q] & i8[q]) / len(flt[q]) for q in flt]
    assert sum(ovs) / len(ovs) >= 0.85, sorted(ovs)[:5]
    assert min(ovs) >= 2 / 3, sorted(ovs)[:5]


def test_full_candidate_window_equals_float_probe_exactly(spark):
    """With a rescore window large enough to keep EVERY candidate the
    probed lists contain, stage 1 cannot drop a true neighbor — the
    two-stage result must be bit-identical to the float IVF probe
    (same rows, same scores, same tie-broken ranks). This isolates the
    ONLY approximation int8 adds: candidate truncation."""
    idx = ensure_ann_index(spark, SF_DIR)
    b = _batch(spark, SF_DIR)
    want = [
        tuple(r)
        for r in batch_vs_ann_index(spark, b, idx, nprobe=4, top_k=3).collect()
    ]
    got = [
        tuple(r)
        for r in batch_vs_int8_index(
            spark, b, idx, nprobe=4, top_k=3, rescore_factor=10**6
        ).collect()
    ]
    assert got == want and len(got) > 0


def test_sidecar_survives_folds_and_tracks_base_snapshots(spark, tmp_path):
    """Staleness discipline: the sidecar is keyed to the BASE vectors
    snapshot, so a pending fold delta does NOT retire it (the probe
    resolves deltas merge-on-read — next test), while a flatten commits
    a new base and the next ensure re-derives against it."""
    import pgcp_spark.functions.ann_index as AI
    from pgcp_spark.functions.ann_index import build_ann_index_from

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .filter(AI.valid_embedding())
    )
    idx = str(tmp_path / "ai")
    build_ann_index_from(spark, emb.filter(F.col("vec_id") % 10 != 0), idx)
    side1 = ensure_int8_sidecar(spark, idx)
    assert lake.current_snapshot(side1) is not None

    update_ann_index(spark, emb.filter(F.col("vec_id") % 10 == 0), idx)
    assert ensure_int8_sidecar(spark, idx) == side1  # fold keeps the base

    lake.flatten_deltas(
        spark, os.path.join(idx, "vectors"), key=["vec_id"],
        cluster_by=["list_id", "vec_id"],
    )
    side2 = ensure_int8_sidecar(spark, idx)
    assert side2 != side1  # new base snapshot → new sidecar, re-derived
    assert lake.current_snapshot(side2) is not None
    # and the probe works end-to-end against the re-derived sidecar
    got = batch_vs_int8_index(
        spark, emb.filter(F.col("vec_id") % 10 == 0), idx, nprobe=4, top_k=3
    )
    assert got.count() > 0


def test_probe_resolves_pending_deltas_merge_on_read(spark, tmp_path):
    """The quantized tier must keep serving a loop-maintained index
    between compactions: with a fold delta AND a tombstone delta
    pending, the full-rescore-window int8 probe must be BIT-IDENTICAL
    to the float MOR probe (same candidate universe: superseded base
    rows leave the quantized side, live delta rows enter exactly, dead
    rows die), proving the merge-on-read union loses nothing and serves
    no stale or deleted vector."""
    import pgcp_spark.functions.ann_index as AI
    from pgcp_spark.functions.ann_index import (
        build_ann_index_from,
        remove_from_ann_index,
    )

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .filter(AI.valid_embedding())
    )
    idx = str(tmp_path / "ai")
    build_ann_index_from(spark, emb.filter(F.col("vec_id") % 10 != 0), idx)
    side = ensure_int8_sidecar(spark, idx)

    # fold new vectors + tombstone some indexed ones — both stay PENDING
    update_ann_index(spark, emb.filter(F.col("vec_id") % 10 == 0), idx)
    dead = emb.filter(F.col("vec_id") % 10 == 3).select("vec_id").limit(40)
    dead_ids = {r.vec_id for r in dead.collect()}
    remove_from_ann_index(spark, dead, idx)
    vec_dir = os.path.join(idx, "vectors")
    assert len(lake.delta_names(vec_dir)) >= 2  # data + tombstone pending
    assert ensure_int8_sidecar(spark, idx) == side  # base unchanged

    b = emb.filter(F.col("vec_id") % 10 == 5).limit(15)
    want = [
        tuple(r)
        for r in batch_vs_ann_index(spark, b, idx, nprobe=4, top_k=3).collect()
    ]
    got_df = batch_vs_int8_index(
        spark, b, idx, nprobe=4, top_k=3, rescore_factor=10**6
    )
    got = [tuple(r) for r in got_df.collect()]
    assert got == want and len(got) > 0
    assert not any(r[1] in dead_ids for r in got)  # no deleted neighbor
    # the folded rows are genuinely reachable: with the fold containing
    # 10% of the corpus, at least one returned neighbor comes from it
    assert any(r[1] % 10 == 0 for r in got)


def test_compaction_reclaims_stale_sidecars(spark, tmp_path):
    """The leak half of the staleness discipline: a flatten/compaction
    makes the old ``qvectors_<snap>`` dir unreachable by name, but only
    ``compact_ann_index`` physically reclaims it — otherwise every
    maintenance pass would strand a corpus-sized sidecar forever."""
    import pgcp_spark.functions.ann_index as AI
    from pgcp_spark.functions.ann_index import (
        build_ann_index_from,
        compact_ann_index,
    )
    from pgcp_spark.functions.ann_int8 import SIDECAR_PREFIX

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .filter(AI.valid_embedding())
    )
    idx = str(tmp_path / "ai")
    build_ann_index_from(spark, emb.filter(F.col("vec_id") % 10 != 0), idx)
    side1 = ensure_int8_sidecar(spark, idx)
    assert os.path.isdir(side1)

    # a fold lands as a pending delta; the compaction cadence flattens it
    # (new vectors snapshot) and must take the now-stale sidecar with it
    update_ann_index(spark, emb.filter(F.col("vec_id") % 10 == 0), idx)
    compact_ann_index(spark, idx)
    assert not os.path.exists(side1), "stale sidecar must be reclaimed"
    stale = [
        e
        for e in os.listdir(idx)
        if e.startswith(SIDECAR_PREFIX)
        and e != os.path.basename(ensure_int8_sidecar(spark, idx))
    ]
    assert stale == []  # exactly one live sidecar, keyed to the new base

    # and the probe re-derives + answers against the post-compaction base
    got = batch_vs_int8_index(
        spark, emb.filter(F.col("vec_id") % 10 == 0), idx, nprobe=4, top_k=3
    )
    assert got.count() > 0
