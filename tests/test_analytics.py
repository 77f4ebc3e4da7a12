"""Semantic pins for the event-analytics operators (funnel sequencing,
cohort offsets) on a synthetic micro-corpus — the oracle comparison at
sf0.01 proves engine agreement; these prove the SEMANTICS are the intended
ones (a user converts only via strictly-ordered steps)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from pgcp_spark.operators.analytics import (
    cohort_weekly_retention,
    funnel_view_click_purchase,
)


def _write_events(tmp_path, rows):
    t0 = dt.datetime(2024, 1, 1)
    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([t0 + dt.timedelta(hours=h) for (_, h, _) in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([u for (u, _, _) in rows], pa.int64()),
            "event_type": pa.array([e for (_, _, e) in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_requires_strict_step_order(spark, tmp_path):
    sf_dir = _write_events(
        tmp_path,
        [
            # user 1: clean view -> click -> purchase (counts everywhere)
            (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
            # user 2: click BEFORE first view -> click step must not count
            (2, 0, "click"), (2, 1, "view"), (2, 2, "purchase"),
            # user 3: no click -> purchase can't count
            (3, 0, "view"), (3, 1, "purchase"),
            # user 4: click at the SAME instant as view (not strictly after)
            (4, 0, "view"), (4, 0, "click"),
        ],
    )
    got = {r.step: (r.n_users, r.conversion_from_prev)
           for r in funnel_view_click_purchase(spark, sf_dir).collect()}
    assert got["view"] == (4, 1.0)
    assert got["click"][0] == 1
    assert got["purchase"][0] == 1


def test_cohort_offsets_count_from_first_week(spark, tmp_path):
    sf_dir = _write_events(
        tmp_path,
        [
            # user 1 first seen week 0 (Mon 2024-01-01), active weeks 0 and 2
            (1, 0, "view"), (1, 14 * 24, "view"),
            # user 2 first seen week 1
            (2, 7 * 24, "view"),
        ],
    )
    rows = cohort_weekly_retention(spark, sf_dir).collect()
    cells = {(r.cohort_week.date().isoformat(), r.week_offset): (r.n_active, r.cohort_size)
             for r in rows}
    assert cells[("2024-01-01", 0)] == (1, 1)
    assert cells[("2024-01-01", 2)] == (1, 1)
    assert cells[("2024-01-08", 0)] == (1, 1)
    assert ("2024-01-01", 1) not in cells


def test_ztest_single_segment_yields_null_not_nan(spark, tmp_path):
    """With only one customer segment the rest-of-population is empty
    (rest_events = 0); p_rest and z_score must be NULL on both engines,
    never an engine-specific 0/0 NaN/Infinity."""
    import duckdb

    from pgcp_spark.operators.analytics import analytics_conversion_ztest
    from pgcp_spark.registry import all_queries

    sf_dir = _write_events(
        tmp_path, [(1, 0, "view"), (1, 1, "purchase"), (2, 0, "view")]
    )
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2], pa.int64()),
            "c_name": pa.array(["a", "b"], pa.string()),
            "c_nationkey": pa.array([0, 0], pa.int32()),
            "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
            "c_mktsegment": pa.array(["BUILDING", "BUILDING"], pa.string()),
        }
    )
    pq.write_table(cust, str(tmp_path / "customer.parquet"))

    rows = analytics_conversion_ztest(spark, sf_dir).collect()
    assert len(rows) == 1
    assert rows[0].p_rest is None and rows[0].z_score is None

    con = duckdb.connect()
    for t in ("events", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    orows = con.execute(all_queries()["analytics_conversion_ztest"].oracle).fetchall()
    assert len(orows) == 1
    seg, n_events, n_conv, p_seg, p_rest, z = orows[0]
    assert p_rest is None and z is None
    assert (n_events, n_conv, p_seg) == (rows[0].n_events, rows[0].n_conv, rows[0].p_seg)
