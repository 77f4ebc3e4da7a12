"""Algorithm-level validation for the oracle-less dedup operators:
MinHash/LSH recall against the exact Jaccard pairs, SimHash invariants."""

from __future__ import annotations

from pgcp_spark.functions.dedup import EXACT_JACCARD_ORACLE, exact_jaccard_pairs
from pgcp_spark.registry import all_queries
from tests.conftest import SF_DIR_CORRECTNESS
from tests.oracle_check import compare


def test_exact_jaccard_matches_duckdb_oracle(spark):
    """The quarantined (unregistered) exact generator no longer gets a
    driver CORRECTNESS row, so its oracle parity is pinned here instead —
    it must stay trustworthy as the ground truth for MinHash recall."""
    compare(
        spark,
        SF_DIR_CORRECTNESS,
        "exact_jaccard_pairs",
        exact_jaccard_pairs,
        EXACT_JACCARD_ORACLE,
    )


def test_minhash_recall_vs_exact_jaccard(spark):
    qs = all_queries()
    exact = {
        (r.doc_a, r.doc_b)
        for r in exact_jaccard_pairs(spark, SF_DIR_CORRECTNESS).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in qs["dedup_minhash_lsh_candidates"].fn(spark, SF_DIR_CORRECTNESS).collect()
    }
    assert exact, "exact jaccard should find near-dup pairs in the corpus"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"MinHash recall too low: {recall:.2f} ({len(exact)} true pairs)"


def test_simhash_invariants(spark):
    qs = all_queries()
    rows = qs["dedup_simhash_pairs"].fn(spark, SF_DIR_CORRECTNESS).collect()
    assert rows, "simhash should find near-dup pairs"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 3
