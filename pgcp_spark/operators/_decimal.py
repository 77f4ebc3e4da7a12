"""Exact-arithmetic helpers shared by query operators.

The driver hash-compares Spark results against DuckDB oracle results. Raw
double aggregation is order-dependent (shuffle order differs run to run and
engine to engine), so every float aggregate follows one convention:

    cast operands to DECIMAL  →  aggregate exactly  →  CAST(… AS DOUBLE)

Both engines then compute the same exact decimal and round it to the same
nearest double, making value hashes bit-identical. The testdata's doubles
carry ≤2 real decimal digits, so DECIMAL(12,2) operand casts are lossless and
products of three operands stay within DECIMAL(38,6) in both engines.

At scale this costs nothing: decimal sums are still map-side partial
aggregates in Tungsten; only the final cast differs from a double sum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,2)"


def dec(col: str | Column, typ: str = DEC) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: str | Column) -> Column:
    """Exact SUM over a 2-decimal double column, returned as DOUBLE."""
    return F.sum(dec(col)).cast("double")


def davg(col: str | Column) -> Column:
    """Exact-sum-based AVG as DOUBLE (sum cast to double, then / count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c)).cast("double") / F.count(c)


# SQL-side equivalents (DuckDB oracle fragments)
def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE) / COUNT({expr})"
