"""Physical-plan inspection helpers — the engine's "did Catalyst do what we
designed for" toolkit. Used by tests/test_plans.py to pin down plan
properties that matter at 100 TB: broadcast vs shuffle joins, parquet
filter/column pushdown, top-k compilation, whole-stage codegen coverage.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def count_occurrences(df: DataFrame, node: str) -> int:
    return len(re.findall(re.escape(node), physical_plan(df)))


def has_broadcast_hash_join(df: DataFrame, at_least: int = 1) -> bool:
    return count_occurrences(df, "BroadcastHashJoin") >= at_least


def has_sort_merge_or_shuffle_hash_join(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def has_nested_loop_join(df: DataFrame) -> bool:
    return "NestedLoop" in physical_plan(df) or "CartesianProduct" in physical_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan. The list
    is bracket-balanced, not regex-sliced to the first ``]`` — an
    ``In(col, [v, …])`` filter nests brackets, and the naive slice
    silently drops every filter after it (found by the round-12
    three-predicate z-order pin)."""
    plan = physical_plan(df)
    out = []
    marker = "PushedFilters: ["
    i = plan.find(marker)
    while i != -1:
        # a PushedFilters entry is single-line in formatted explain, so
        # bound the balance scan to the line: a list ELIDED by
        # spark.sql.maxMetadataStringLength loses its closing bracket,
        # and an unbounded scan would swallow the rest of the plan
        # (silently dropping every later scan's entry)
        eol = plan.find("\n", i)
        stop = eol if eol != -1 else len(plan)
        j, depth = i + len(marker), 1
        while j < stop and depth:
            if plan[j] == "[":
                depth += 1
            elif plan[j] == "]":
                depth -= 1
            j += 1
        out.append(plan[i + len(marker):j - 1 if depth == 0 else j])
        i = plan.find(marker, j)
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema (pruned column sets) from every parquet scan."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", physical_plan(df))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def shuffle_exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges only (hashpartitioning/rangepartitioning), not
    BroadcastExchange or the SinglePartition exchange of a global agg.

    Counted on ``simple_plan``: the "formatted" explain prints exchange
    nodes as bare ``Exchange (n)`` with the partitioning in a detail
    section, so a regex against it silently counted zero (found round 2;
    the executedPlan string keeps ``Exchange hashpartitioning(...)``
    inline).
    """
    return len(re.findall(r"Exchange (hash|range)partitioning", simple_plan(df)))
