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


def test_semdedup_subset_and_recall(spark):
    """SemDeDup contracts on the real corpus: within-cluster pairs are a
    SUBSET of the exact all-pairs result (clustering can only lose
    pairs, never invent one — same kernel, same threshold), and the
    (k=16, top-2-assignment) point keeps the measured-recall floor.
    Floor 0.55 sits under the measured 0.70/0.79 (sf0.01/sf0.001) with
    headroom for KMeans treeAggregate jitter."""
    from pgcp_spark.functions.dedup import (
        dedup_embedding_cosine_pairs,
        dedup_semantic_clustered_pairs,
    )

    sem = {
        (r.vec_a, r.vec_b)
        for r in dedup_semantic_clustered_pairs(spark, SF_DIR_CORRECTNESS).collect()
    }
    exact = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_cosine_pairs(spark, SF_DIR_CORRECTNESS).collect()
    }
    assert exact, "exact embedding dedup should find pairs"
    assert sem <= exact, f"invented pairs: {sorted(sem - exact)[:5]}"
    recall = len(sem & exact) / len(exact)
    assert recall >= 0.55, f"SemDeDup recall too low: {recall:.2f}"


def test_semdedup_k1_equals_exact_bit_for_bit(spark):
    """k=1 skips the fit entirely (one cluster == all pairs) and must
    reproduce the exact blocked-matmul query bit-for-bit, cos_sim
    included — per-pair float64 dots don't depend on the blocking."""
    from pgcp_spark.functions.dedup import (
        dedup_embedding_cosine_pairs,
        semantic_cluster_pairs,
    )
    from pgcp_spark.sources import load_table_parallel

    sf = "/root/testdata/sf0.001"
    k1 = sorted(
        tuple(r)
        for r in semantic_cluster_pairs(
            spark, load_table_parallel(spark, sf, "embeddings"), k=1
        ).collect()
    )
    exact = sorted(
        tuple(r) for r in dedup_embedding_cosine_pairs(spark, sf).collect()
    )
    assert k1 == exact


def test_semdedup_subblocked_equals_unblocked_bit_for_bit(spark):
    """Forcing tiny sub-blocks (target 16 vectors/row vs the default
    4096) must not change a single pair or cos_sim: the shared grid
    kernel's per-pair float64 dots are blocking-independent. This is the
    pin that lets the 100 TB memory bound (bounded packed rows) ride on
    the already-proven k=1==exact and subset-of-exact contracts."""
    from pgcp_spark.functions.dedup import semantic_cluster_pairs
    from pgcp_spark.sources import load_table_parallel

    sf = "/root/testdata/sf0.001"
    corpus = load_table_parallel(spark, sf, "embeddings")
    # k=1: no KMeans fit, so both runs see the identical (single-cluster)
    # assignment and the comparison isolates the sub-blocking itself.
    coarse = sorted(
        tuple(r)
        for r in semantic_cluster_pairs(spark, corpus, k=1).collect()
    )
    fine = sorted(
        tuple(r)
        for r in semantic_cluster_pairs(
            spark, corpus, k=1, block_target_rows=16, block_min_rows=4
        ).collect()
    )
    assert coarse == fine
    assert coarse, "corpus should contain near-dup pairs"


def test_semdedup_packed_rows_bounded_under_skew(spark):
    """The scale contract: even a maximally skewed clustering (k=1 — ONE
    giant cluster holding the whole corpus) packs into rows no larger
    than ~2× the block target, because B_c = ceil(n_c / target) splits
    the cluster before collect_list runs. vec_id % B_c is near-uniform
    for dense ids, so the 2× slack is generous."""
    import math

    from pgcp_spark.functions.dedup import _emb_blocks
    from pgcp_spark.sources import load_table_parallel
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    corpus = load_table_parallel(spark, sf, "embeddings").select(
        "vec_id", "embedding"
    )
    n = corpus.count()
    target = 16
    bc = _emb_blocks(n, spark.sparkContext.defaultParallelism, target_rows=target, min_rows=4)
    assert bc >= math.ceil(n / target / 2), "sub-blocking must engage under skew"
    sizes = (
        corpus.withColumn("sblock", F.col("vec_id") % bc)
        .groupBy("sblock")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    assert sizes <= 2 * target, f"packed row of {sizes} vectors exceeds 2x target {target}"
