"""Exact-vs-IVF cosine-leg crossover on CLUSTERED embeddings.

Round-9/10 honesty item: on the testdata's near-uniform synthetic
embeddings the IVF leg loses to the exact broadcast matvec at every
shipped scale (the probes read half the lists for worst-case recall and
the whole corpus is a few MB). The claim to verify is the conditional
one — that on CLUSTERED embeddings (the real-corpus shape) at corpus
sizes where a full scan costs real I/O+compute, probing a few tight
lists beats scanning everything.

This tool synthesizes a mixture-of-Gaussians corpus (16 unit-sphere
centers, fixed seed, 64-dim — matching the repo's embedding contract),
at several sizes, then times `cosine_leg` (exact full scan) vs
`ann_cosine_leg` (persisted IVF, probed lists only) and records the
leg-overlap ladder. Index build time is excluded (build-once serve-many).

Usage: python tools/ann_crossover.py [sizes_csv, default 60000,250000,1000000]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np

DIM = 64
N_CENTERS = 16
NOISE = 0.05  # tight clusters: the favorable-but-realistic IVF regime
RUNS = 3


def med(fn, n=RUNS):
    ts = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    return sorted(ts)[n // 2]


def synth(spark, n: int, out_dir: str) -> str:
    """Write n clustered embeddings as a multi-file parquet lake dir."""
    import pandas as pd

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(N_CENTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.isdir(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    chunk = 125_000
    pdfs = []
    for lo in range(0, n, chunk):
        m = min(chunk, n - lo)
        cid = rng.integers(0, N_CENTERS, size=m)
        vecs = centers[cid] + NOISE * rng.normal(size=(m, DIM))
        pdfs.append(
            pd.DataFrame(
                {
                    "vec_id": np.arange(lo, lo + m, dtype=np.int64),
                    "embedding": list(vecs.astype(np.float32)),
                    "label": cid.astype(np.int32),
                }
            )
        )
    sdf = None
    for p in pdfs:
        part = spark.createDataFrame(p)
        sdf = part if sdf is None else sdf.unionByName(part)
    sdf.repartition(32).write.mode("overwrite").parquet(path)
    return out_dir


def main():
    from pgcp_spark.functions import retrieval as R
    from pgcp_spark.session import get_spark

    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else
                              "60000,250000,1000000").split(",")]
    spark = get_spark("ann_crossover")
    for n in sizes:
        lake_dir = f"/tmp/ann_cross/{n}"
        synth(spark, n, lake_dir)
        # warm: build the index once (excluded from timing).
        # exact_below=0 EVERYWHERE here: this tool measures the IVF
        # machinery itself — letting ANN_LEG_EXACT_BELOW route
        # sub-threshold sizes to the exact leg would silently record
        # exact-leg times as "IVF" datapoints and fabricate the very
        # crossover table the rule is derived from.
        R.ann_cosine_leg(spark, lake_dir, exact_below=0).collect()
        exact_t = med(lambda: R.cosine_leg(spark, lake_dir).collect())
        vl_e = {r.doc_id for r in R.cosine_leg(spark, lake_dir).collect()}
        line = [f"@@ n={n} exact={exact_t:.2f}s"]
        for nprobe in (2, 4, 8):
            ivf_t = med(
                lambda: R.ann_cosine_leg(
                    spark, lake_dir, nprobe=nprobe, exact_below=0
                ).collect()
            )
            vl_a = {
                r.doc_id
                for r in R.ann_cosine_leg(
                    spark, lake_dir, nprobe=nprobe, exact_below=0
                ).collect()
            }
            ov = len(vl_e & vl_a) / max(1, len(vl_e))
            line.append(f"np{nprobe}={ivf_t:.2f}s/ov{ov:.2f}")
        print(" ".join(line), flush=True)


if __name__ == "__main__":
    main()
