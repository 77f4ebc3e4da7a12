"""Z-order (Morton) clustering key for multi-dimensional lake layouts.

``sources/lake.py``'s ``cluster_by`` is LINEAR clustering: range-partition
+ sort on (k1, k2, ...). File/row-group min-max statistics then prune
scans filtered on the LEADING key, but a predicate on k2 alone touches
every file — k2's values are spread across the whole layout. Z-order
fixes exactly that: bucket each dimension to a B-bit rank, interleave the
rank bits into one long (``x0 y0 x1 y1 ...`` from the high bit down), and
lay the table out in key order. Nearby key ranges then cover small
HYPER-RECTANGLES of the dimension space, so min-max stats prune a
selective predicate box on ANY subset of the dimensions — the property
Delta Lake's OPTIMIZE ZORDER BY and ClickHouse's space-filling-curve
indexes buy at warehouse scale. (Public technique; e.g. Morton 1966 and
the Delta OPTIMIZE docs. The reference engine has no layout ops at all —
this extends the lake layer the same way bucketing did.)

Scale shape: the key is a pure JVM column expression (shifts/ands/ors —
whole-stage-codegen'd, no Python), computed per row at WRITE time only;
the layout write is the same single range exchange the linear path pays.
Dimension min/max come from one O(columns) aggregate on the input — at
100 TB that is a metadata-cheap extra job against a write that already
shuffles every byte. Readers need no new machinery: parquet footer
min/max of the NATURAL columns do the pruning, because bit-interleaved
locality makes those per-file ranges narrow on every z'd dimension.

Bucketing is fixed-width over [min, max] (16 bits/dim by default, so two
dims fill 32 bits of the long). Fixed-width keeps the key a pure
per-row expression; heavily skewed dimensions degrade toward the linear
layout's behavior on their sparse ranges (documented trade — quantile
bucketing would need a per-dim histogram broadcast and buys little for
the time/id dimensions z-order is used for). NULL ranks 0, so NULLs
cluster together at the low corner, and a constant dimension (min ==
max) contributes rank 0 everywhere — both degrade gracefully to fewer
effective dimensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16  # per-dimension rank width; 2 dims -> 32-bit key, 3 -> 48


def _numberline(col: str, dtype: str) -> Column:
    """``col`` as a double on one monotonic number line per type:
    timestamps via µs-since-epoch, dates via days-since-epoch, numerics
    by plain cast. Non-orderable types fail fast: a string column would
    cast to NULL and SILENTLY contribute a constant rank — a layout op
    that quietly does nothing is worse than one that refuses."""
    if dtype.startswith("timestamp"):  # incl. timestamp_ntz (direct cast is illegal)
        return F.unix_micros(F.col(col).cast("timestamp")).cast("double")
    if dtype == "date":
        return F.unix_date(F.col(col)).cast("double")
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    if dtype in numeric or dtype.startswith("decimal"):
        return F.col(col).cast("double")
    raise TypeError(f"zorder_by column {col!r} has un-rankable type {dtype}")


def zorder_stats(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Per-column (min, max) on the ``_numberline`` scale, ONE aggregate
    job — the same conversion the ranks apply, so stats and ranks share
    one number line."""
    dtypes = dict(df.select(*cols).dtypes)
    aggs = []
    for c in cols:
        v = _numberline(c, dtypes[c])
        aggs.append(F.min(v).alias(f"_min_{c}"))
        aggs.append(F.max(v).alias(f"_max_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"_min_{c}"], row[f"_max_{c}"]) for c in cols}


def _rank(
    col: str, lo: float | None, hi: float | None, bits: int, dtype: str
) -> Column:
    """Fixed-width bucket of ``col`` into [0, 2**bits) over [lo, hi].

    NULL -> 0. Degenerate span (empty input, or min == max) -> 0: the
    dimension carries no information, so it contributes nothing to the
    interleave instead of poisoning it.
    """
    n = 1 << bits
    if lo is None or hi is None or hi <= lo:
        return F.lit(0).cast("long")
    v = _numberline(col, dtype)
    bucket = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(n))
    bucket = F.least(bucket, F.lit(n - 1))  # v == hi lands in the top bucket
    return F.coalesce(bucket, F.lit(0)).cast("long")


def zorder_key(
    stats: dict[str, tuple[float, float]],
    cols: list[str],
    bits: int = ZORDER_BITS,
    dtypes: dict[str, str] | None = None,
) -> Column:
    """The Morton key: ranks of ``cols`` bit-interleaved into one long.

    Bit b of dimension i lands at position ``b * ndims + i`` — dimension
    0's bit leads each group, so no dimension dominates the ordering the
    way a linear sort's leading key does. ndims * bits must stay <= 62
    (long, sign bit untouched).
    """
    ndims = len(cols)
    if ndims * bits > 62:
        raise ValueError(f"{ndims} dims x {bits} bits exceeds a long's 62 usable bits")
    dtypes = dtypes or {}
    ranks = [_rank(c, *stats[c], bits, dtypes.get(c, "double")) for c in cols]
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(r, b).bitwiseAND(F.lit(1)), b * ndims + i)
            )
    return key


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = ZORDER_BITS, key_col: str = "_zkey"
) -> DataFrame:
    """``df`` plus the Morton key column (stats computed here, one agg)."""
    key = zorder_key(zorder_stats(df, cols), cols, bits, dtypes=dict(df.dtypes))
    return df.withColumn(key_col, key)
