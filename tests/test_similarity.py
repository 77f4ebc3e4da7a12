"""Validation for oracle-less similarity + multimodal operators."""

from __future__ import annotations

import json

import pytest

from pgcp_spark.registry import all_queries
from tests.conftest import SF_DIR_CORRECTNESS


def test_lsh_pairs_are_high_similarity(spark):
    qs = all_queries()
    rows = qs["sim_cosine_lsh_pairs"].fn(spark, SF_DIR_CORRECTNESS).collect()
    assert rows, "LSH should surface some high-cosine pairs on this corpus"
    for r in rows:
        assert r.vec_a < r.vec_b
        assert r.cos_sim >= 0.4


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with nprobe=4/16 cells must recover most of the exact top-k.

    Random 64-dim corpora are adversarial for ANN (no cluster structure),
    so the bar is deliberately moderate; structured real embeddings do far
    better at the same nprobe fraction.
    """
    qs = all_queries()
    exact = {
        (r.vec_id, r.neighbor_id)
        for r in qs["sim_cosine_bruteforce_topk"].fn(spark, SF_DIR_CORRECTNESS).collect()
    }
    approx = {
        (r.vec_id, r.neighbor_id)
        for r in qs["sim_cosine_ivf_topk"].fn(spark, SF_DIR_CORRECTNESS).collect()
    }
    assert exact, "brute-force baseline returned nothing"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall {recall:.2f} below floor"


def test_multimodal_features_shape(spark):
    qs = all_queries()
    df = qs["multimodal_feature_extract"].fn(spark, SF_DIR_CORRECTNESS)
    rows = df.limit(20).collect()
    assert rows
    for r in rows:
        features = json.loads(r.features_json)
        assert len(features) == 8
        assert abs(sum(features) - 1.0) < 1e-9  # normalized histogram
        assert r.n_bytes > 0


def test_decode_media_is_stubbed():
    from pgcp_spark.functions.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"abc")
