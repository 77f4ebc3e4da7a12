"""ANSI empty-input semantics for grouping-set aggregates.

Per the SQL standard (and PostgreSQL/DuckDB behavior), a GROUP BY whose
grouping sets include the empty set ``()`` — ROLLUP, CUBE, or explicit
GROUPING SETS with ``()`` — produces the grand-total row even when the
input relation is EMPTY: the ``()`` set is a global aggregation, and a
global aggregate over zero rows yields one row (COUNT → 0, SUM/AVG/MIN/
MAX → NULL).  Spark's Expand-based implementation instead keys the final
aggregate on the grouping id, so an empty input produces zero groups and
zero rows — a deviation that matters whenever a downstream consumer
(report, MERGE, assertion) relies on the total row existing.

``with_empty_grand_total`` restores the standard semantics at O(1) cost:

  - the grand-total row for EMPTY input is fully determined by the
    aggregate functions alone, so it is a pure literal row — no second
    scan of the input;
  - whether the input is empty is probed with ``LIMIT 1`` over the
    pre-aggregation relation — Spark's CollectLimit short-circuits after
    the first row, so on non-empty input this reads one row group of one
    file, not the table;
  - the literal row is anti-joined against the probe (broadcast hash,
    1×1), so it survives only when the probe is empty.

The per-row aggregation pipeline is untouched: on the 100 TB path this
adds one limit-1 job and a 1-row broadcast join, nothing else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PROBE = "_nonempty_probe"


def with_empty_grand_total(
    agg_df: DataFrame,
    probe_src: DataFrame,
    overrides: dict[str, object] | None = None,
) -> DataFrame:
    """Union the ANSI empty-input grand-total row onto ``agg_df``.

    ``agg_df``    — the rollup/cube/grouping-sets aggregate, BEFORE any
                    final orderBy (union does not preserve sort order).
    ``probe_src`` — the exact pre-aggregation relation (after joins and
                    filters): its emptiness decides whether the literal
                    row is emitted.
    ``overrides`` — column → literal for aggregate columns that are
                    non-NULL over empty input (COUNT → 0, GROUPING → 1);
                    every other column is NULL cast to its result type.
    """
    overrides = overrides or {}
    spark = agg_df.sparkSession
    cols: list[Column] = [
        F.lit(overrides.get(f.name)).cast(f.dataType).alias(f.name)
        for f in agg_df.schema.fields
    ]
    grand = spark.range(1).select(*cols).withColumn(_PROBE, F.lit(1))
    probe = probe_src.select(F.lit(1).alias(_PROBE)).limit(1)
    gated = grand.join(F.broadcast(probe), _PROBE, "left_anti").drop(_PROBE)
    return agg_df.unionByName(gated)
