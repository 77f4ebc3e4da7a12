"""Atomic snapshot tables on the parquet lake: staging + pointer hotswap.

The reference's availability mechanism is a staging table plus a
transactional DROP+RENAME (hotswap_table, /root/reference/lib/pgcp/
postgres.rb:93-106, staged in transport.rb:128-143): readers see the old or
the new table, never partial data. This module is that exact pattern
translated to a filesystem lake, where there is no transaction — instead:

  1. write the new snapshot under ``<table>/snapshot_<uuid>/`` (invisible to
     readers until committed),
  2. commit by atomically replacing the ``<table>/_CURRENT`` pointer file
     (os.replace — atomic on POSIX and object stores with atomic rename),
  3. readers resolve the pointer, then read only that snapshot directory.

A crash before (2) leaves an orphaned snapshot dir (cleaned opportunistically
on the next commit) and readers keep the old snapshot — the same guarantee
the reference gets from its transaction. This is the same commit protocol
table formats like Iceberg/Delta use (a mutable pointer over immutable data
files), reduced to its minimum.

MERGE-shaped upsert: parquet files are immutable, so ``upsert`` is
copy-on-write — new/updated rows win by key, unmatched current rows carry
over (one left-anti join), and the result commits as a fresh snapshot.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

POINTER = "_CURRENT"
SNAPSHOT_PREFIX = "snapshot_"


def _pointer_path(table_dir: str) -> str:
    return os.path.join(table_dir, POINTER)


def current_snapshot(table_dir: str) -> str | None:
    """Name of the committed snapshot, or None for an empty table dir."""
    try:
        with open(_pointer_path(table_dir)) as f:
            return f.read().strip() or None
    except FileNotFoundError:
        return None


def read_current(spark: SparkSession, table_dir: str) -> DataFrame:
    snap = current_snapshot(table_dir)
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, snap))


def write_snapshot(df: DataFrame, table_dir: str) -> str:
    """Write ``df`` as a new snapshot and atomically commit the pointer.

    Returns the committed snapshot name. The parquet write happens into the
    (reader-invisible) snapshot dir; the only mutation readers can observe
    is the single atomic pointer replace.
    """
    os.makedirs(table_dir, exist_ok=True)
    snap = f"{SNAPSHOT_PREFIX}{uuid.uuid4().hex}"
    df.write.mode("errorifexists").parquet(os.path.join(table_dir, snap))

    tmp = _pointer_path(table_dir) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(snap)
    os.replace(tmp, _pointer_path(table_dir))  # the atomic commit

    # opportunistic GC of everything the pointer no longer references:
    # the superseded snapshot and any crash-orphaned uncommitted dirs.
    # (Production would keep N snapshots for time travel / slow readers;
    # local tests read eagerly so immediate GC is safe.)
    import shutil

    for entry in os.listdir(table_dir):
        if entry.startswith(SNAPSHOT_PREFIX) and entry != snap:
            shutil.rmtree(os.path.join(table_dir, entry), ignore_errors=True)
    return snap


def upsert(
    spark: SparkSession, table_dir: str, updates: DataFrame, key: list[str]
) -> str:
    """MERGE-shaped copy-on-write upsert: rows in ``updates`` replace
    current rows with the same key; all other current rows carry over.

    Scale: one left-anti join (current ⟕ updates on key) + a union — the
    join broadcasts when updates are small (the common CDC shape); the
    rewrite cost is the price of immutable files, exactly like any
    copy-on-write lakehouse MERGE without deletion vectors.
    """
    current = read_current(spark, table_dir)
    kept = current.join(updates.select(*key), on=key, how="left_anti")
    merged = kept.unionByName(updates)
    return write_snapshot(merged, table_dir)
