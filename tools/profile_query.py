"""Per-job wall-time breakdown for a registered query (guide §1: measure
first). Runs the query once (plus one warmup) in a session with the Spark
event log enabled, then aggregates job durations by call site — for the
registered CYCLE queries (lake/streaming), this is the only practical way
to see which of the dozens of tiny jobs (snapshot writes, probes, folds,
stream triggers) actually carry the wall time.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_query.py <query> [--no-warm]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    warm = "--no-warm" not in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="pgcp_eventlog_")

    from pgcp_spark.registry import all_queries
    from pgcp_spark.session import get_spark

    spark = get_spark(
        f"profile_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
        },
    )
    q = all_queries()[name]
    if warm:
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    # mark the timed region by wall clock: parse only jobs submitted after t0
    time.sleep(0.3)
    t0_ms = int(time.time() * 1000)
    t0 = time.perf_counter()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.stop()

    jobs: dict[int, dict] = {}
    # Spark 4 writes an eventlog_v2_* DIRECTORY (appstatus_* marker +
    # events_* files); older versions write one flat file
    paths = []
    for path in glob.glob(os.path.join(log_dir, "*")):
        if os.path.isdir(path):
            paths.extend(
                p
                for p in glob.glob(os.path.join(path, "*"))
                if os.path.basename(p).startswith("events")
            )
        else:
            paths.append(path)
    for path in paths:
        with open(path, errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(ev, dict):
                    continue
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    jobs[jid] = {
                        "t": ev["Submission Time"],
                        "site": props.get("callSite.short", "?"),
                        "desc": props.get("spark.job.description", ""),
                        "stages": len(ev.get("Stage IDs", [])),
                    }
                elif et == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["dur"] = (
                            ev["Completion Time"] - jobs[jid]["t"]
                        ) / 1000.0

    timed = [j for j in jobs.values() if j.get("t", 0) >= t0_ms and "dur" in j]
    timed.sort(key=lambda j: j["t"])
    by_site: dict[str, list[float]] = defaultdict(list)
    print(f"== {name}: wall {wall:.2f}s, {len(timed)} jobs in timed region ==")
    for j in timed:
        desc = j["desc"]
        key = j["site"] if (not desc or "runId" in desc) else desc
        by_site[key].append(j["dur"])
    rows = sorted(
        ((sum(v), len(v), k) for k, v in by_site.items()), reverse=True
    )
    tot = 0.0
    for s, n, k in rows:
        tot += s
        print(f"{s:8.2f}s  n={n:<4d} {k}")
    print(f"-- job time total {tot:.2f}s vs wall {wall:.2f}s "
          f"(gap = driver/FS/planning time) --")
    print("\nsequential job list with inter-job gaps (first 150):")
    prev_end = t0_ms
    for j in timed[:150]:
        gap = (j["t"] - prev_end) / 1000.0
        desc = j["desc"]
        key = j["site"] if (not desc or "runId" in desc) else desc
        print(f"  +{(j['t'] - t0_ms)/1000.0:7.2f}s gap={gap:5.2f}s dur={j['dur']:5.2f}s  {key}")
        prev_end = j["t"] + j["dur"] * 1000.0
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
