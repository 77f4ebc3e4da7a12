"""CLI wrapper for the fleet-wide shuffle-width audit.

The audit itself lives in ``pgcp_spark/plans/width.py`` (round-6: plans
are built under plan_only so checkpointed segments are visible, and
markers match whole column-name tokens) and runs automatically in pytest
via ``tests/test_width.py``; this wrapper keeps the one-command form.

Run:  python tools/width_audit.py [sf_dir]     (default sf0.001)
Exit status 1 if any un-allowlisted wide hash exchange is found.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pgcp_spark.plans.width import audit_queries
    from pgcp_spark.session import get_spark

    spark = get_spark("width_audit")
    findings, errors = audit_queries(spark, sf_dir)
    for e in errors:
        print(e)
    for f in findings:
        print(f"{f.query}: WIDE hash exchange carries {list(f.columns)}: [{f.exchange_input}]")
    bad = len(findings) + len(errors)
    print(f"width audit: {'CLEAN' if bad == 0 else f'{bad} finding(s)'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
