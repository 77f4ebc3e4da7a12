"""Fleet-wide shuffle-width audit: flag queries whose SHUFFLE exchanges
carry wide payload columns.

The round-5 rewrites (ids-only LSH/MinHash band joins, materialized
corpus-stat aggregates) all came from one observation: the expensive
failure mode at 100 TB is a wide column — document text, an embedding
array, a signature — riding a hash-partitioned exchange, where join-side
replication multiplies its bytes. This tool reads every registered
query's formatted physical plan and reports each hashpartitioning
Exchange whose input contains a wide column, so the next regression is a
one-command find instead of an ad-hoc forensic sweep.

Partitioning kinds are treated differently:
  - hashpartitioning  — flagged: a join/aggregate exchange should carry
    keys + narrow payload only (re-attach wide columns after).
  - rangepartitioning — ignored: the final result sort legitimately
    carries whatever the query RETURNS (e.g. chunk text).
  - roundrobin        — ignored: the test-lake loader's parallelism
    repartition (sources/tables.py), a no-op on multi-file lakes.

Per-query allowlist below documents the cases where a wide column on a
hash exchange is the query's own semantics, with the reason inline.

Run:  python tools/width_audit.py [sf_dir]     (default sf0.001 — plans
      only; nothing executes beyond eager checkpoints)
Exit status 1 if any un-allowlisted wide hash exchange is found.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDE_MARKERS = ("text", "embedding", "sig", "g_arr", "props", "payload_data", "body")

# query -> (column-substring, reason) pairs that are semantically required
ALLOWLIST: dict[str, list[tuple[str, str]]] = {}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pgcp_spark.registry import all_queries
    from pgcp_spark.session import get_spark

    spark = get_spark("width_audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    bad = 0
    for name, qry in all_queries().items():
        try:
            df = qry.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:
            print(f"{name}: PLAN ERR {type(exc).__name__}: {exc}")
            bad += 1
            continue
        # pair each shuffle Exchange's input list with its partitioning
        for inp, args in re.findall(
            r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: (\w+)", plan
        ):
            if args != "hashpartitioning":
                continue
            cols = [c.strip().split("#")[0] for c in inp.split(",")]
            wide = [
                c
                for c in cols
                if any(w in c for w in WIDE_MARKERS)
                and not any(c.startswith(a) for a, _ in ALLOWLIST.get(name, []))
            ]
            if wide:
                print(f"{name}: WIDE hash exchange carries {wide}: [{inp[:120]}]")
                bad += 1
    print(f"width audit: {'CLEAN' if bad == 0 else f'{bad} finding(s)'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
