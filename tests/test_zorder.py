"""Z-order lake layout (`sources/zorder.py` + `lake.write_snapshot(zorder_by=…)`):
Morton-key math pinned against a driver-side reference, 2-D file-skipping
measured from real parquet footers against the linear layout, row-fidelity,
layout survival through MERGE/compaction, and the fail-fast type contract.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from pgcp_spark.sources import lake, load_table
from pgcp_spark.sources.lake import compact, read_current, upsert, write_snapshot
from pgcp_spark.sources.zorder import with_zorder_key, zorder_key, zorder_stats
from tests.conftest import SF_DIR_CORRECTNESS

N_FILES = 16


def _morton(xr: int, yr: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((xr >> b) & 1) << (2 * b) | ((yr >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    """Key expression == the textbook Morton interleave, dimension 0's bit
    in the LOW position of each pair (matching ``zorder_key``'s layout)."""
    bits = 4
    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    # stats spanning [0, n]: bucket width 1 → rank == value
    stats = {"x": (0.0, float(n)), "y": (0.0, float(n))}
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_key(stats, ["x", "y"], bits)).collect()
    }
    for x, y in rows:
        xr, yr = min(x, n - 1), min(y, n - 1)
        assert got[(x, y)] == _morton(xr, yr, bits), (x, y)


def _file_overlap_count(table_dir: str, col: str, lo, hi) -> tuple[int, int]:
    """(files whose footer [min,max] on ``col`` intersects [lo,hi], total
    files) for the CURRENT snapshot — the same statistics a reader's
    row-group skipping consults."""
    from pgcp_spark.sources.lake import current_snapshot

    snap_dir = os.path.join(table_dir, current_snapshot(table_dir))
    files = sorted(glob.glob(os.path.join(snap_dir, "*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for i in range(rg.num_columns):
                c = rg.column(i)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins and not (max(maxs) < lo or min(mins) > hi):
            hit += 1
    return hit, len(files)


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """events written twice at the same file count: LINEAR cluster on
    (user_id, ts) vs Z-ORDER on (user_id, ts)."""
    base = tmp_path_factory.mktemp("zorder")
    ev = load_table(spark, SF_DIR_CORRECTNESS, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    linear, zord = str(base / "linear"), str(base / "zord")
    write_snapshot(ev, linear, cluster_by=["user_id", "ts"], cluster_files=N_FILES)
    write_snapshot(ev, zord, zorder_by=["user_id", "ts"], cluster_files=N_FILES)
    return ev, linear, zord


def test_zorder_prunes_the_nonleading_dimension(spark, layouts):
    """THE property linear clustering cannot have: a selective predicate
    on ts ALONE (the non-leading dimension) skips most files under
    z-order, while the linear layout spreads every ts range across every
    file. And the leading dimension still prunes under z-order."""
    ev, linear, zord = layouts
    lo, hi = ev.selectExpr("min(ts)", "max(ts)").collect()[0]
    span = hi - lo
    # a ~12% stripe INSIDE one ts quadrant (56–68%): a stripe that
    # straddles a high-bit boundary legitimately touches two z bands
    t0, t1 = lo + span * 56 // 100, lo + span * 68 // 100
    lin_hit, lin_total = _file_overlap_count(linear, "ts", t0, t1)
    z_hit, z_total = _file_overlap_count(zord, "ts", t0, t1)
    assert lin_total == N_FILES and z_total == N_FILES
    assert lin_hit == N_FILES  # linear: ts is everywhere — zero skipping
    assert z_hit <= N_FILES // 2, f"z-order skipped only {N_FILES - z_hit} files"
    # leading dim: both layouts prune a 10-user slice to a minority of
    # files. The z-order bound carries one file of slack: the range
    # exchange SAMPLES its partition bounds (Spark's RangePartitioner),
    # so file cut points jitter run to run and a stripe near a boundary
    # measured 8 or 9 of 16 files across otherwise-identical runs — the
    # property pinned is minority-of-files, not an exact band count.
    u_hit_lin, _ = _file_overlap_count(linear, "user_id", 20, 29)
    u_hit_z, _ = _file_overlap_count(zord, "user_id", 20, 29)
    assert u_hit_lin <= N_FILES // 2
    assert u_hit_z <= N_FILES // 2 + 1


def test_zorder_layout_preserves_rows_exactly(spark, layouts):
    ev, _, zord = layouts
    back = read_current(spark, zord)
    assert back.columns == ev.columns
    assert back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0
    # the scratch key never reaches the files
    assert "_zkey" not in back.columns


def test_zorder_survives_merge_and_compaction(spark, layouts, tmp_path):
    """upsert(zorder_by=…) and compact(zorder_by=…) rebuild the layout the
    same way the linear path does — without it one MERGE would silently
    destroy the multi-dim skipping the table was built for."""
    ev, _, _ = layouts
    tdir = str(tmp_path / "evz")
    write_snapshot(ev, tdir, zorder_by=["user_id", "ts"], cluster_files=N_FILES)
    updates = ev.limit(500).withColumn("value", ev.value * 2)
    upsert(
        spark, tdir, updates, key=["event_id"],
        zorder_by=["user_id", "ts"], cluster_files=N_FILES,
    )
    lo, hi = ev.selectExpr("min(ts)", "max(ts)").collect()[0]
    span = hi - lo
    t0, t1 = lo + span * 56 // 100, lo + span * 68 // 100  # inside one quadrant
    hit, total = _file_overlap_count(tdir, "ts", t0, t1)
    assert hit <= total // 2, f"MERGE destroyed the z layout: {hit}/{total}"
    compact(spark, tdir, zorder_by=["user_id", "ts"], min_files=N_FILES)
    hit, total = _file_overlap_count(tdir, "ts", t0, t1)
    assert hit <= total // 2, f"compaction destroyed the z layout: {hit}/{total}"
    assert read_current(spark, tdir).count() == ev.count()


def test_zorder_degrades_gracefully_on_nulls_and_constants(spark, tmp_path):
    """NULLs rank 0 and a constant dimension contributes nothing — the
    write must still succeed with every row intact (the nulls/degenerate
    edge-lake shapes, applied to the layout op)."""
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else i * 10, 7.0) for i in range(100)],
        "id long, k long, c double",
    )
    tdir = str(tmp_path / "nz")
    write_snapshot(df, tdir, zorder_by=["k", "c"], cluster_files=4)
    back = read_current(spark, tdir)
    assert back.count() == 100
    assert back.filter("k IS NULL").count() == 34


def test_zorder_rejects_unrankable_types(spark):
    ev = load_table(spark, SF_DIR_CORRECTNESS, "events")
    with pytest.raises(TypeError, match="un-rankable"):
        zorder_stats(ev, ["event_type"])
    with pytest.raises(ValueError, match="62 usable bits"):
        zorder_key({"a": (0.0, 1.0)}, ["a"] * 4, bits=16)
    with pytest.raises(ValueError, match="mutually exclusive"):
        write_snapshot(ev, "/tmp/_never", cluster_by=["user_id"], zorder_by=["ts"])


def test_with_zorder_key_single_agg(spark):
    """Stat collection is one aggregate job; the key column lands typed
    long and non-negative."""
    ev = load_table(spark, SF_DIR_CORRECTNESS, "events").select("user_id", "value")
    out = with_zorder_key(ev, ["user_id", "value"])
    assert dict(out.dtypes)["_zkey"] == "bigint"
    assert out.filter("_zkey < 0").count() == 0


def test_quantile_rank_recovers_value_skew(spark, tmp_path):
    """The measured round-8 trade (SCALE.md): 1% outlier ids stretch the
    fixed-width [min, max] until every normal id buckets to 0 — the id
    dimension prunes NOTHING — while quantile ranks are immune to value
    spacing and restore clean-lake pruning. Same rows either way."""
    ev = load_table(spark, SF_DIR_CORRECTNESS, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    skewed = ev.withColumn(
        "user_id",
        F.expr(
            "CASE WHEN event_id % 100 = 0 "
            "THEN user_id * 100000 + 100000000 ELSE user_id END"
        ),
    )
    wdir, qdir = str(tmp_path / "w"), str(tmp_path / "q")
    write_snapshot(skewed, wdir, zorder_by=["user_id", "ts"], cluster_files=N_FILES)
    write_snapshot(
        skewed,
        qdir,
        zorder_by=["user_id", "ts"],
        zorder_rank="quantile",
        cluster_files=N_FILES,
    )
    w_hit, w_total = _file_overlap_count(wdir, "user_id", 20, 29)
    q_hit, q_total = _file_overlap_count(qdir, "user_id", 20, 29)
    assert w_total == N_FILES and q_total == N_FILES
    assert w_hit == N_FILES, "fixed-width should be DEAD under outlier ids"
    # One file of boundary-jitter slack (same as the leading-dim pin):
    # repartitionByRange samples with an RDD-id-derived seed, so the range
    # boundaries shift slightly with session history (9/16 observed once in
    # a full-suite run, 8/16 in isolation — vs fixed-width's dead 16/16).
    assert q_hit <= N_FILES // 2 + 1, f"quantile ranks pruned only to {q_hit}/{N_FILES}"
    got = lake.read_current(spark, qdir)
    assert got.count() == ev.count()


def test_quantile_rank_degrades_gracefully(spark, tmp_path):
    """Empty input → empty boundary lists → constant-0 ranks, same
    graceful no-information degradation as the fixed-width path; and an
    unknown rank mode fails fast."""
    tdir = str(tmp_path / "t")
    empty = spark.createDataFrame([], "k long, ts timestamp")
    write_snapshot(
        empty, tdir, zorder_by=["k", "ts"], zorder_rank="quantile"
    )
    assert lake.read_current(spark, tdir).count() == 0
    with pytest.raises(ValueError):
        with_zorder_key(empty, ["k"], rank="nope")
