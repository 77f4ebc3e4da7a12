"""Registered change-feed query: CDC diff between two lake snapshots.

Drives ``lake.table_changes`` end-to-end through the snapshot machinery
on driver-checkable data: build a base snapshot from orders, MERGE an
update batch (doubled totals for every 5th key — updates where the key
exists, inserts where it doesn't), then read the change feed between the
two retained snapshots. Because both snapshots are pure functions of the
orders table, the whole feed has an exact SQL twin — the rare case where
a lake-mutation pipeline is hash-checkable, not rows-only.

Reference anchor: none in the reference (it has no table versioning);
this is the lakehouse CDF surface (Delta change data feed / Iceberg
changelog) completing the snapshot/time-travel/MERGE/OPTIMIZE set in
``sources/lake.py``.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.plans.materialize import current_mode, materialize
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table
from pgcp_spark.sources.lake import table_changes, upsert, write_snapshot

_ORACLE = """
WITH o AS (SELECT o_orderkey, o_totalprice FROM orders)
SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
       'insert' AS _change_type
FROM o WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 = 0
UNION ALL
SELECT o_orderkey, o_totalprice, 'update_preimage' FROM o
WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 = 0
  AND o_totalprice * 2 IS DISTINCT FROM o_totalprice
UNION ALL
SELECT o_orderkey, o_totalprice * 2, 'update_postimage' FROM o
WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 = 0
  AND o_totalprice * 2 IS DISTINCT FROM o_totalprice
ORDER BY o_orderkey, _change_type
"""


@register(
    "lake_change_feed_orders",
    oracle=_ORACLE,
    doc="CDC between lake snapshots: base orders table, MERGE of doubled totals for every 5th key, change feed = inserts + update pre/postimages (keyed full-outer diff)",
)
def lake_change_feed_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot A = orders keys with ``o_orderkey % 3 != 0``; MERGE batch =
    every 5th key with doubled o_totalprice (an update when the key is in
    A, an insert when ``% 15 == 0``); feed = ``table_changes(A, B)``.
    NULL-key rows are excluded from BOTH snapshots by the same predicate
    semantics on both engines (``NULL % k`` filters out), so the feed's
    NULL-key delete+insert contract never triggers here. No deletes by
    construction — MERGE only adds or replaces. A NULL or zero
    o_totalprice makes the doubled row EQUAL to its preimage (NULL*2 is
    NULL, 0*2 is 0): the feed's null-safe compare drops such no-op
    updates, and the oracle mirrors it with IS DISTINCT FROM — the
    nulls-lake shape that distinguishes CDC-on-change from
    CDC-on-touch."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    updates = orders.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    tdir = tempfile.mkdtemp(prefix="pgcp_change_feed_")
    try:
        snap_a = write_snapshot(base, tdir, keep=2)
        upsert(spark, tdir, updates, key=["o_orderkey"], keep=2)
        result = materialize(
            table_changes(spark, tdir, snap_a, key=["o_orderkey"]).orderBy(
                "o_orderkey", "_change_type"
            )
        )
    except BaseException:
        shutil.rmtree(tdir, ignore_errors=True)
        raise
    # same reclamation rule as the ingest loops: eager materialization
    # modes own their data (drop now); lazy modes still read the files
    # (defer to interpreter exit)
    if current_mode() in ("localCheckpoint", "checkpoint"):
        shutil.rmtree(tdir, ignore_errors=True)
    else:
        atexit.register(shutil.rmtree, tdir, ignore_errors=True)
    return result
