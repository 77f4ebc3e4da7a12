"""Delete-cost A/B: tombstone delta vs copy-on-write rewrite.

The delete-side twin of SCALE.md round 9's fold measurement: build the
BM25 postings table at several index sizes (sf0.1 corpus replicated),
then time deleting 500 documents two ways —

  APPEND  (round 10): ``lake.delete_delta`` — an O(keys) tombstone
          partition; the base is untouched.
  REWRITE (round 9 shape): ``lake.delete`` — keyed copy-on-write with
          the tok clustering re-established, cost linear in INDEX size.

Also reports the mid-tombstone read tax (query over base + 1 tombstone
vs base only) — the honesty line the fold measurement carried.

Usage: python tools/delete_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPLICAS = (64, 256)
N_DELETE = 500
RUNS = 3
OFFSET = 10_000_000


def median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def main():
    from pgcp_spark.functions.text_index import (
        bm25_from_index,
        build_text_index_from,
    )
    from pgcp_spark.session import get_spark
    from pgcp_spark.sources import lake, load_table_parallel

    spark = get_spark("delete_ab")
    docs = load_table_parallel(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    )
    results = {}
    for reps in REPLICAS:
        big = docs.crossJoin(
            spark.range(reps).withColumnRenamed("id", "rep")
        ).select(
            (F.col("doc_id") + F.col("rep") * OFFSET).alias("doc_id"), "text"
        )
        work = tempfile.mkdtemp(prefix=f"pgcp_delete_ab_{reps}x_")
        try:
            t0 = time.monotonic()
            build_text_index_from(spark, big, work)
            build_s = time.monotonic() - t0
            postings_dir = os.path.join(work, "postings")
            n_rows = lake.read_current(spark, postings_dir).count()

            base_q = median(
                _time_runs(lambda: bm25_from_index(spark, work).collect())
            )

            # APPEND path: tombstone per run, distinct id slices
            append_times = []
            for r in range(RUNS):
                ids = spark.range(N_DELETE).select(
                    (F.col("id") * 97 + 1 + r * OFFSET).alias("doc_id")
                )
                t0 = time.monotonic()
                lake.delete_delta(ids, postings_dir, key=["doc_id"])
                append_times.append(time.monotonic() - t0)
            tomb_q = median(
                _time_runs(lambda: bm25_from_index(spark, work).collect())
            )
            # clear tombstones so the rewrite path starts from a clean base
            lake.flatten_deltas(
                spark,
                postings_dir,
                key=["doc_id"],
                cluster_by=["tok"],
                cluster_files=spark.sparkContext.defaultParallelism,
            )

            # REWRITE path (round-9 shape): keyed copy-on-write delete
            rewrite_times = []
            for r in range(RUNS):
                ids = spark.range(N_DELETE).select(
                    (F.col("id") * 89 + 3 + r * OFFSET).alias("doc_id")
                )
                t0 = time.monotonic()
                lake.delete(
                    spark,
                    postings_dir,
                    keys=ids,
                    key=["doc_id"],
                    keep=2,
                    cluster_by=["tok"],
                    cluster_files=spark.sparkContext.defaultParallelism,
                )
                rewrite_times.append(time.monotonic() - t0)

            results[reps] = {
                "rows": n_rows,
                "build_s": round(build_s, 2),
                "tombstone_delete_s": round(median(append_times), 2),
                "rewrite_delete_s": round(median(rewrite_times), 2),
                "query_base_s": round(base_q, 2),
                "query_with_tombstone_s": round(tomb_q, 2),
            }
            print(reps, results[reps], flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print("RESULTS", results, flush=True)


def _time_runs(fn, runs=RUNS):
    out = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        out.append(time.monotonic() - t0)
    return out


if __name__ == "__main__":
    main()
