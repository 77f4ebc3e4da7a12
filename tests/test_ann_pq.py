"""Product-quantized two-stage ANN probe (pgcp_spark/functions/ann_pq.py):
returned scores must be EXACT float cosines (PQ may only affect candidate
selection), overlap floors vs the float IVF probe, full-candidate
equivalence, deterministic codebooks, and the sidecar staleness/MOR
discipline shared with the int8 tier."""

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
from pgcp_spark.functions.ann_pq import (
    batch_vs_pq_index,
    ensure_pq_sidecar,
    sim_batch_vs_pq_ann_index,
)
from pgcp_spark.sources import lake, load_table
from tests.conftest import SF_DIR


def _by_query(rows):
    out = {}
    for r in rows:
        out.setdefault(r.vec_id, set()).add(r.neighbor_id)
    return out


def test_returned_scores_are_exact_float_cosines(spark):
    """The shared refine stage's contract, re-pinned through the PQ
    path: every returned cos_sim equals the float cosine of the SOURCE
    embeddings — ADC touches candidate selection only."""
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
        .collect()
    }
    rows = sim_batch_vs_pq_ann_index(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        a, b = emb[r.vec_id], emb[r.neighbor_id]
        want = round(
            float(a @ b) / (float(np.linalg.norm(a)) * float(np.linalg.norm(b))), 6
        )
        assert r.cos_sim == pytest.approx(want, abs=1e-9), (r, want)


def test_overlap_floor_vs_float_probe(spark):
    """Measured 1.0 at sf0.001 AND sf0.01 (16 subspaces × 256 centroids
    reconstruct 64-dim vectors closely and the 4× rescore window absorbs
    the ordering noise); floor pinned at 0.85 avg / 2-of-3 per query —
    the int8 tier's allowance."""
    idx = ensure_ann_index(spark, SF_DIR)
    b = _batch(spark, SF_DIR)
    flt = _by_query(batch_vs_ann_index(spark, b, idx, nprobe=4, top_k=3).collect())
    pq = _by_query(batch_vs_pq_index(spark, b, idx, nprobe=4, top_k=3).collect())
    assert set(pq) == set(flt)
    ovs = [len(flt[q] & pq[q]) / len(flt[q]) for q in flt]
    assert sum(ovs) / len(ovs) >= 0.85, sorted(ovs)[:5]
    assert min(ovs) >= 2 / 3, sorted(ovs)[:5]


def test_full_candidate_window_equals_float_probe_exactly(spark):
    """With the rescore window keeping every candidate, stage 1 cannot
    drop a true neighbor — bit-identical to the float IVF probe. This
    isolates the only approximation PQ adds: candidate truncation."""
    idx = ensure_ann_index(spark, SF_DIR)
    b = _batch(spark, SF_DIR)
    want = [
        tuple(r)
        for r in batch_vs_ann_index(spark, b, idx, nprobe=4, top_k=3).collect()
    ]
    got = [
        tuple(r)
        for r in batch_vs_pq_index(
            spark, b, idx, nprobe=4, top_k=3, rescore_factor=10**6
        ).collect()
    ]
    assert got == want and len(got) > 0


def test_sidecar_discipline_and_merge_on_read(spark, tmp_path):
    """The int8 tier's staleness + MOR contracts, through the PQ path
    (the resolution/attach/refine stages are the SAME shared code, so
    one combined pin per contract suffices): a pending fold keeps the
    sidecar; with fold + tombstone deltas pending the full-window PQ
    probe is bit-identical to the float MOR probe; a flatten retires the
    sidecar name and compaction reclaims the bytes."""
    import pgcp_spark.functions.ann_index as AI
    from pgcp_spark.functions.ann_index import (
        build_ann_index_from,
        compact_ann_index,
        remove_from_ann_index,
    )

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .filter(AI.valid_embedding())
    )
    idx = str(tmp_path / "ai")
    build_ann_index_from(spark, emb.filter(F.col("vec_id") % 10 != 0), idx)
    side1 = ensure_pq_sidecar(spark, idx)
    assert lake.current_snapshot(os.path.join(side1, "codes")) is not None

    update_ann_index(spark, emb.filter(F.col("vec_id") % 10 == 0), idx)
    dead = emb.filter(F.col("vec_id") % 10 == 3).select("vec_id").limit(40)
    dead_ids = {r.vec_id for r in dead.collect()}
    remove_from_ann_index(spark, dead, idx)
    assert len(lake.delta_names(os.path.join(idx, "vectors"))) >= 2
    assert ensure_pq_sidecar(spark, idx) == side1  # fold keeps the base

    b = emb.filter(F.col("vec_id") % 10 == 5).limit(15)
    want = [
        tuple(r)
        for r in batch_vs_ann_index(spark, b, idx, nprobe=4, top_k=3).collect()
    ]
    got = [
        tuple(r)
        for r in batch_vs_pq_index(
            spark, b, idx, nprobe=4, top_k=3, rescore_factor=10**6
        ).collect()
    ]
    assert got == want and len(got) > 0
    assert not any(r[1] in dead_ids for r in got)
    assert any(r[1] % 10 == 0 for r in got)  # folded rows reachable

    compact_ann_index(spark, idx)
    assert not os.path.exists(side1), "stale PQ sidecar must be reclaimed"
    side2 = ensure_pq_sidecar(spark, idx)
    assert side2 != side1
    assert batch_vs_pq_index(spark, b, idx, nprobe=4, top_k=3).count() > 0


def test_codebooks_deterministic(spark, tmp_path):
    """Two independent derives from the same base produce bit-identical
    codebooks and codes (seeded driver-side k-means, deterministic
    training slice) — the property a distributed fit can't give."""
    import shutil

    import pgcp_spark.functions.ann_index as AI
    from pgcp_spark.functions.ann_index import build_ann_index_from

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .filter(AI.valid_embedding())
        .filter(F.col("vec_id") % 10 != 0)
    )
    sides = []
    for name in ("a", "b"):
        idx = str(tmp_path / name)
        build_ann_index_from(spark, emb, idx)
        side = ensure_pq_sidecar(spark, idx)
        cb = sorted(
            tuple(r)
            for r in lake.read_current(
                spark, os.path.join(side, "codebooks")
            ).collect()
        )
        codes = sorted(
            (r.vec_id, tuple(r.codes), r.rnrm)
            for r in lake.read_current(spark, os.path.join(side, "codes")).collect()
        )
        sides.append((cb, codes))
        shutil.rmtree(idx, ignore_errors=True)
    assert sides[0] == sides[1]
