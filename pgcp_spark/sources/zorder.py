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
dims fill 32 bits of the long) by default. Fixed-width keeps the key a
pure per-row expression, but VALUE-RANGE skew breaks it: one 1e8-scale
outlier id stretches [min, max] until every normal id lands in bucket 0
and the dimension carries no information — measured DEAD at sf0.1
(64/64 files hit for a 10-user slice vs 10/64 on the clean lake,
SCALE.md round 8). ``rank="quantile"`` fixes exactly that: per-dim
``approxQuantile`` boundaries (one extra aggregate at write time) give
every dimension a near-uniform rank distribution regardless of value
spacing — the outlier case recovers EXACTLY to clean-lake pruning
(10/64). FREQUENCY skew (one key owning half the rows) cannot be fully
fixed by any monotone value→rank map (equal values share a rank, so the
hot key's mass smears its files' ranges on the other dimensions), but
quantile mode still recovers most of it — measured 42/64 (width) →
17/64 (quantile) on the cold-user slice — because the near-uniform
ranks + coarser rank space stop the hot column's cells from
interleaving into every neighbour's files. The trade is write-time
cost: the boundary-fold rank is ~5× the fixed-width key at sf0.1
(SCALE.md r8) — pay it for skewed dimensions, skip it for benign ones.
NULL ranks 0, so NULLs cluster
together at the low corner, and a constant dimension (min == max, or
collapsed quantile boundaries) contributes rank 0 everywhere — both
degrade gracefully to fewer effective dimensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16  # per-dimension rank width; 2 dims -> 32-bit key, 3 -> 48

# quantile mode uses fewer bits: 2^8 near-uniformly-filled ranks per dim
# out-resolve 2^16 skew-collapsed ones, and the rank expression costs
# one comparison per boundary per row (255 at 8 bits — write-time only)
ZORDER_QUANTILE_BITS = 8


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
    dtypes = dtypes or {}
    ranks = [_rank(c, *stats[c], bits, dtypes.get(c, "double")) for c in cols]
    return _interleave(ranks, bits)


def zorder_quantile_stats(
    df: DataFrame, cols: list[str], bits: int = ZORDER_QUANTILE_BITS
) -> dict[str, list[float]]:
    """Per-column sorted quantile boundaries ((2**bits)-1 of them) on the
    ``_numberline`` scale — ONE approxQuantile pass over all columns
    (Greenwald-Khanna sketch, executor-side; only the boundary lists
    reach the driver). NULLs are ignored by the sketch and rank 0 at key
    time, same contract as the fixed-width path."""
    dtypes = dict(df.select(*cols).dtypes)
    num = df.select(*[_numberline(c, dtypes[c]).alias(c) for c in cols])
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    qs = num.approxQuantile(cols, probs, 1.0 / (4 * n))
    return {c: q for c, q in zip(cols, qs)}


def _quantile_rank(col: str, boundaries: list[float], dtype: str) -> Column:
    """Rank of ``col`` = number of quantile boundaries strictly below it
    — a pure JVM fold over a literal array (codegen'd; no Python, no
    join). Empty boundary list (empty/all-NULL input) -> constant 0,
    the graceful no-information degradation."""
    if not boundaries:
        return F.lit(0).cast("long")
    v = _numberline(col, dtype)
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    rank = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(v > b, F.lit(1)).otherwise(F.lit(0)),
    )
    return F.coalesce(rank, F.lit(0)).cast("long")


def zorder_quantile_key(
    boundaries: dict[str, list[float]],
    cols: list[str],
    bits: int = ZORDER_QUANTILE_BITS,
    dtypes: dict[str, str] | None = None,
) -> Column:
    """Morton key over QUANTILE ranks: same interleave as ``zorder_key``,
    ranks from per-dim boundary counting instead of fixed-width spans —
    immune to value-range skew (module docstring)."""
    dtypes = dtypes or {}
    ranks = [
        _quantile_rank(c, boundaries[c], dtypes.get(c, "double")) for c in cols
    ]
    return _interleave(ranks, bits)


def _interleave(ranks: list[Column], bits: int) -> Column:
    """Bit-interleave per-dimension ranks into one long (bit b of
    dimension i lands at position ``b * ndims + i``)."""
    ndims = len(ranks)
    if ndims * bits > 62:
        raise ValueError(f"{ndims} dims x {bits} bits exceeds a long's 62 usable bits")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(r, b).bitwiseAND(F.lit(1)), b * ndims + i)
            )
    return key


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int | None = None,
    key_col: str = "_zkey",
    rank: str = "width",
) -> DataFrame:
    """``df`` plus the Morton key column (stats computed here, one agg).

    ``rank="width"``: fixed-width buckets over [min, max] (default — one
    min/max aggregate, 16-bit ranks). ``rank="quantile"``: approximate
    per-dim quantile ranks (one approxQuantile pass, 8-bit ranks) — use
    when a dimension's VALUES are range-skewed (outlier ids, exponential
    magnitudes); see the module docstring's measured trade."""
    if rank == "quantile":
        bits = ZORDER_QUANTILE_BITS if bits is None else bits
        key = zorder_quantile_key(
            zorder_quantile_stats(df, cols, bits), cols, bits, dtypes=dict(df.dtypes)
        )
    elif rank == "width":
        bits = ZORDER_BITS if bits is None else bits
        key = zorder_key(zorder_stats(df, cols), cols, bits, dtypes=dict(df.dtypes))
    else:
        raise ValueError(f"unknown zorder rank mode {rank!r}")
    return df.withColumn(key_col, key)
