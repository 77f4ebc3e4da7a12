"""Local mimic of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side, sorts columns
by name and rows by value, and asserts exact equality — the strictest
approximation of the driver's order-insensitive value hash we can do locally.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from pgcp_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v: Any) -> Any:
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("\x00nan",)
        # exact bit pattern comparison for floats
        return ("f", v.hex())
    return (type(v).__name__[:1], str(v))


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(
    spark, sf_dir: str, name: str, fn, oracle: str, oracle_sf_dir: str | None = None
) -> None:
    """Assert the Spark query over ``sf_dir`` matches the oracle SQL.

    ``oracle_sf_dir`` points DuckDB at a different lake holding the same
    row multiset (e.g. the canonical layout while Spark reads the
    scrambled one) — equality then proves the result is independent of
    physical row order.
    """
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(oracle_sf_dir or sf_dir)
    try:
        res = con.execute(oracle)
        ocols = [d[0] for d in res.description]
        orows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()

    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    cs, co = _canon_rows(scols, srows), _canon_rows(ocols, orows)
    for i, (a, b) in enumerate(zip(cs, co)):
        assert a == b, f"{name}: row {i} differs\n  spark : {a}\n  oracle: {b}"
