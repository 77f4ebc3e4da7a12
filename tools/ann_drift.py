"""Measure IVF quantizer DRIFT under no-re-fit folding — the evidence
behind ann_index.py's rebuild-cadence rule.

``update_ann_index`` folds daily batches onto centroids trained once
(``build_ann_index``); the module claims drift "costs recall, never
score correctness". This tool quantifies that cost in the two regimes
that bracket production:

  iid      fold batches drawn from the SAME distribution as the build
           corpus (vec_id stripes of one synthetic table) — the
           steady-state crawl.
  shifted  the same fold batches with a constant offset added to every
           embedding — a CONCENTRATING shift (new source / new encoder
           version): all shifted vectors crowd one region.
  noisy    the same fold batches with deterministic per-element hash
           noise at the data's own scale — a SCATTERING shift (encoder
           degradation, corrupted modality): vectors decorrelate from
           every centroid.

Per fold it reports, as JSON lines:
  recall      recall@TOP_K of ``batch_vs_ann_index`` for a FIXED heldout
              probe stripe vs exact brute force over the CURRENT stored
              vectors (ground truth — needs a full scan, offline only);
  assign_q    ``assignment_quality`` of the folded batch (mean cosine to
              nearest stored centroid) — computable online for free;
  q_ratio     assign_q / the build-time quality of a HELDOUT iid sample
              (the probe stripe — NOT the training corpus, whose quality
              is inflated by the k-means fit itself: the first run of
              this tool used the train-corpus baseline and read a 0.77
              "drift" on perfectly iid folds — a generalization gap,
              not drift);
  max_list_frac  largest list's share of stored vectors — imbalance is
              how THIS shift family hurts: shifted vectors crowd one
              list while their assign_q can stay numerically normal;
  join_frac   mean over NEW-DISTRIBUTION probes of (sum of their nprobe
              probed list sizes) / stored count — the per-probe join
              work the list_id equi-join actually does (balanced lists
              → nprobe/k). Imbalance shows up here as real cost.

After the last shifted fold it re-fits on base+folds
(``build_ann_index_from``) and reports the restored balance — the
payoff that justifies firing the cadence.

Usage: python tools/ann_drift.py   [env: ANN_DRIFT_SF_DIR, ANN_DRIFT_CPUS]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from pgcp_spark.functions.ann_index import (
    _load_centroids,
    assignment_quality,
    batch_vs_ann_index,
    build_ann_index_from,
    update_ann_index,
)
from pgcp_spark.functions.similarity import IVF_NPROBE, TOP_K, valid_embedding, with_norm
from pgcp_spark.plans.materialize import materialize
from pgcp_spark.sources import load_table
from pgcp_spark.sources.lake import read_current

SF_DIR = os.environ.get("ANN_DRIFT_SF_DIR", "/root/testdata/sf0.1")
N_FOLDS = 5
SHIFT = 1.5  # constant added elementwise in the shifted regime

def stripes(spark, lo: int, hi: int) -> DataFrame:
    # vec_id % 20 stripes: 0-9 build corpus (50%), 10-14 the five daily
    # folds (5% each), 15 the heldout probe set (never indexed or folded)
    stripe = F.col("vec_id") % 20
    return (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .filter(valid_embedding())
        .filter((stripe >= lo) & (stripe <= hi))
    )


def shifted(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "embedding", F.transform("embedding", lambda x: x + F.lit(float(SHIFT)))
    )


def noisy(df: DataFrame) -> DataFrame:
    # deterministic pseudo-noise in [-0.3, 0.3) per (vec_id, element) —
    # the synthetic embeddings' own value range, so alignment to the
    # trained centroids roughly halves while no single region crowds
    return df.withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x, i: x
            + (
                F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(1000)).cast("double")
                / 1000.0
                * 0.6
                - 0.3
            ),
        ),
    )


def distort(df: DataFrame, regime: str) -> DataFrame:
    if regime == "shifted":
        return shifted(df)
    if regime == "noisy":
        return noisy(df)
    return df


def brute_topk(probes: DataFrame, stored: DataFrame) -> DataFrame:
    """Exact top-k of probes vs the stored vectors — ground truth."""
    from pyspark.sql import Window

    q = with_norm(probes).alias("q")
    c = stored.alias("c")
    dot = F.aggregate(
        F.zip_with(
            F.col("q.embedding"),
            F.col("c.embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        F.broadcast(q)
        .join(c, F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("vec_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.round(dot / (F.col("q.nrm") * F.col("c.nrm")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("vec_id", "neighbor_id")
    )


def recall_of(spark, probes: DataFrame, index_dir: str) -> float:
    stored = read_current(spark, os.path.join(index_dir, "vectors")).select(
        "vec_id", "embedding", "nrm"
    )
    truth = materialize(brute_topk(probes, stored))
    got = batch_vs_ann_index(spark, probes, index_dir, nprobe=IVF_NPROBE).select(
        "vec_id", "neighbor_id"
    )
    n_truth = truth.count()
    if n_truth == 0:
        return float("nan")
    hit = truth.join(got, ["vec_id", "neighbor_id"], "left_semi").count()
    return hit / n_truth


def max_list_frac(spark, index_dir: str) -> float:
    sizes = (
        read_current(spark, os.path.join(index_dir, "vectors"))
        .groupBy("list_id")
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("tot"))
        .collect()[0]
    )
    return sizes.mx / sizes.tot


def join_frac(spark, probes: DataFrame, index_dir: str) -> float:
    """Mean per-probe fraction of stored vectors its nprobe probed lists
    contain — the list_id equi-join's actual work per query vector."""
    from pgcp_spark.functions.ann_index import _assign

    centroids = _load_centroids(spark, index_dir)
    sizes = {
        r.list_id: r.n
        for r in read_current(spark, os.path.join(index_dir, "vectors"))
        .groupBy("list_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    tot = sum(sizes.values())
    per_probe = (
        _assign(probes, centroids, IVF_NPROBE)
        .groupBy("vec_id")
        .agg(F.collect_set("list_id").alias("lists"))
        .collect()
    )
    fracs = [
        sum(sizes.get(l, 0) for l in r.lists) / tot for r in per_probe
    ]
    return sum(fracs) / len(fracs) if fracs else float("nan")


def run_regime(spark, regime: str) -> None:
    index_dir = tempfile.mkdtemp(prefix=f"pgcp_ann_drift_{regime}_")
    base = materialize(stripes(spark, 0, 9))
    build_ann_index_from(spark, base, index_dir)
    centroids = _load_centroids(spark, index_dir)
    probes = materialize(stripes(spark, 15, 15))
    # heldout iid baseline — the number a production monitor records at
    # build time (train-corpus quality is inflated by the fit itself)
    base_q = assignment_quality(probes, centroids)
    # new-distribution probes: tomorrow's queries come from the same
    # distribution as tomorrow's folds
    new_probes = materialize(distort(probes, regime))

    def report(fold: int, idx: str) -> dict:
        return {
            "regime": regime,
            "fold": fold,
            "recall": round(recall_of(spark, probes, idx), 4),
            "recall_new": round(recall_of(spark, new_probes, idx), 4),
            "max_list_frac": round(max_list_frac(spark, idx), 4),
            "join_frac": round(join_frac(spark, new_probes, idx), 4),
        }

    print(
        json.dumps(
            {**report(0, index_dir), "assign_q": round(base_q, 4), "q_ratio": 1.0}
        )
    )
    folded = [base]
    for k in range(N_FOLDS):
        batch = materialize(distort(stripes(spark, 10 + k, 10 + k), regime))
        folded.append(batch)
        q = assignment_quality(batch, centroids)
        update_ann_index(spark, batch, index_dir)
        print(
            json.dumps(
                {
                    **report(k + 1, index_dir),
                    "assign_q": round(q, 4),
                    "q_ratio": round(q / base_q, 4),
                }
            )
        )
    if regime != "iid":
        refit_dir = tempfile.mkdtemp(prefix="pgcp_ann_drift_refit_")
        all_docs = folded[0]
        for b in folded[1:]:
            all_docs = all_docs.unionByName(b)
        build_ann_index_from(spark, all_docs, refit_dir)
        print(json.dumps({**report(N_FOLDS, refit_dir), "regime": f"{regime}_refit"}))


def main() -> None:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("ANN_DRIFT_CPUS", "16")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .appName("ann-drift")
        .getOrCreate()
    )
    for regime in ("iid", "shifted", "noisy"):
        run_regime(spark, regime)


if __name__ == "__main__":
    main()
