"""Integration: the corpus ops compose into the actual training-data
pipeline shape — dedup decision → surviving docs → deterministic split →
mix rebalancing — with consistent, reproducible hand-offs between stages.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pgcp_spark.registry import all_queries
from tests.conftest import SF_DIR_CORRECTNESS

QS = all_queries()


def test_dedup_decision_feeds_split_and_rebalance(spark):
    decision = QS["dedup_cluster_canonical"].fn(spark, SF_DIR_CORRECTNESS).cache()

    # exactly one survivor per cluster, and survivors' canonical is themselves
    per_cluster = (
        decision.groupBy("cluster_id")
        .agg(
            F.sum(F.col("is_kept").cast("int")).alias("n_kept"),
            F.count("*").alias("n_docs"),
        )
        .collect()
    )
    assert per_cluster and all(r.n_kept == 1 for r in per_cluster)
    assert decision.filter("is_kept AND doc_id != canonical_doc").count() == 0

    kept = decision.filter("is_kept").select("doc_id")

    # the deterministic per-doc split (same multiplicative hash the
    # registered aggregate reports on) covers every surviving doc with a
    # stable assignment whose shares roughly match the 80/10/10 target
    from pgcp_spark.functions.corpus import KNUTH, MOD, TRAIN_PCT, VAL_PCT

    h = (F.col("doc_id") * F.lit(KNUTH)) % F.lit(MOD)
    split_col = (
        F.when(h < F.lit(int(TRAIN_PCT / 100 * MOD)), "train")
        .when(h < F.lit(int((TRAIN_PCT + VAL_PCT) / 100 * MOD)), "val")
        .otherwise("test")
    )
    joined = kept.select("doc_id", split_col.alias("split")).cache()
    assert joined.count() == kept.count()
    shares = {r["split"]: r["n"] for r in joined.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(shares.values())
    assert 0.6 <= shares.get("train", 0) / total <= 0.95

    # rerun → identical assignment (no RNG anywhere in the chain)
    again = kept.select("doc_id", split_col.alias("split"))
    assert joined.exceptAll(again).count() == 0

    # mix rebalancing: achieved per-source share never exceeds the
    # equal-share target by more than the integer-rounding margin
    mix = QS["corpus_mix_rebalance"].fn(spark, SF_DIR_CORRECTNESS).collect()
    n_sources = len(mix)
    total_after = sum(r.n_after for r in mix)
    for r in mix:
        assert r.n_after <= r.n_before
        if r.rate < 1.0:
            assert r.n_after / total_after <= 2.0 / n_sources
