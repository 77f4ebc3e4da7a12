"""Conjunctive-probe recall/nprobe curve at TWO selectivity points.

CONJ_NPROBE = 12 was tuned at the registered query's ~17× thinning
(|labels| × the 60% window).  The cost-rule discipline the family
applies everywhere else (ANN_LEG_EXACT_BELOW, the nprobe brackets in
tools/ann_curve.py) asks for the OTHER end too: a WIDE window (full ts
range, thinning = |labels| only) — does the tuned nprobe still clear
the floor, and does the all-lists escape hatch stay exact?

For each window (narrow = [TS_LO, TS_HI], wide = [0, TS_MODULUS-1]) and
each nprobe in {4, 8, CONJ_NPROBE, 16}: recall of the composed
lookup-join conjunctive probe vs the exact conjunctive tier on the same
frames.  The z-ordered tier is bit-identical to the composed probe at
equal nprobe (pinned in tests/test_ann_filtered.py), so one curve
covers both probe forms.

Run:  python tools/conj_curve.py [sf_dir ...]
      (default: /root/testdata/sf0.001 /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NPROBES = (4, 8, 12, 16)


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]

    from pyspark.sql import functions as F

    from pgcp_spark.functions.ann_filtered import (
        CONJ_NPROBE,
        TS_HI,
        TS_LO,
        TS_MODULUS,
        _labeled,
        _ts_payload,
        label_range_filtered_batch_vs_ann_index,
        label_range_filtered_topk,
    )
    from pgcp_spark.functions.ann_index import ensure_ann_index
    from pgcp_spark.session import get_spark

    spark = get_spark("conj_curve")
    out: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        e = _labeled(spark, sf_dir)
        batch = e.filter(F.col("vec_id") % 10 == 0)
        split = e.filter(F.col("vec_id") % 10 != 0)
        payload = _ts_payload(e)
        labels = e.select("vec_id", "label")
        idx = ensure_ann_index(spark, sf_dir)
        n_labels = e.select("label").distinct().count()
        per_sf: dict[str, dict] = {"n_labels": n_labels}
        for wname, lo, hi in (
            ("narrow", TS_LO, TS_HI),
            ("wide", 0, TS_MODULUS - 1),
        ):
            exact = {
                (r.vec_id, r.neighbor_id)
                for r in label_range_filtered_topk(
                    batch, split, payload, lo, hi
                ).collect()
            }
            sel = (hi - lo + 1) / TS_MODULUS
            curve = {}
            for nprobe in NPROBES:
                got = {
                    (r.vec_id, r.neighbor_id)
                    for r in label_range_filtered_batch_vs_ann_index(
                        spark, batch, idx, labels, payload, lo, hi,
                        nprobe=nprobe,
                    ).collect()
                }
                curve[nprobe] = round(len(got & exact) / len(exact), 3)
            per_sf[wname] = {
                "window_selectivity": sel,
                "thinning_x": round(n_labels / sel, 1),
                "exact_pairs": len(exact),
                "recall_at_nprobe": curve,
            }
        out[sf_dir] = per_sf
        print(json.dumps({sf_dir: per_sf}), flush=True)
    print(json.dumps({"CONJ_NPROBE": CONJ_NPROBE, "results": out}))


if __name__ == "__main__":
    main()
