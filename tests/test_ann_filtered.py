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
