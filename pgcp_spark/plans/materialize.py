"""Shared-intermediate materialization seam.

Every "compute once, feed N consumers" frame in the package (MinHash
signatures, funnel step tables, the TF-IDF doc-term aggregate, graph
fixpoint state, ...) flows through :func:`materialize` instead of calling
``DataFrame.localCheckpoint`` directly. One chokepoint buys three things:

1. **A documented scale story.** ``localCheckpoint`` blocks are
   executor-local and non-replicated with lineage truncated, so losing an
   executor mid-job is unrecoverable — acceptable on ``local[32]`` where
   executor == driver JVM, fragile on a 1000-executor cluster. Production
   deployments switch the mode here: ``persist`` keeps lineage (lost
   blocks recompute), and genuinely shared artifacts (signature indexes,
   inverted indexes) should graduate to lake tables via
   ``sources/lake.write_snapshot`` — see ``functions/dedup_index.py`` for
   the worked example of that graduation.

2. **Auditable plans.** An eager ``localCheckpoint`` truncates the plan to
   ``ExistingRDD``, so any shuffle *inside* the checkpointed segment is
   invisible to plan inspection (the round-5 width audit read only final
   plans and could miss a wide exchange hidden behind a checkpoint).
   Under :func:`plan_only`, ``materialize`` is the identity, so
   ``.explain()`` / the width audit walk the FULL composed plan, eager
   sub-jobs don't run, and plan tests can pin the shapes of sub-frames
   that normally execute at checkpoint time.

3. **One switch for tests.** ``tests/test_width.py`` and the
   pre-checkpoint plan pins in ``tests/test_plans.py`` both toggle the
   seam rather than monkeypatching call sites.

Mode resolution order: explicit :func:`plan_only` context >
``SPARK_GRAFT_MATERIALIZE`` env var > default ``localCheckpoint``.

NOTE for loop bodies (``functions/graph.py``): ``none`` mode keeps full
lineage, so a fixpoint loop's plan grows per iteration. The graph loops
are diameter-bounded and the audits run at sf0.001, so this stays cheap;
it is the price of seeing the whole plan.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame

_MODES = ("localCheckpoint", "persist", "none")
_override: str | None = None


def _mode() -> str:
    if _override is not None:
        return _override
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "localCheckpoint")
    if mode not in _MODES:
        raise ValueError(f"SPARK_GRAFT_MATERIALIZE must be one of {_MODES}, got {mode!r}")
    return mode


def materialize(df: DataFrame) -> DataFrame:
    """Materialize a shared intermediate (see module docstring).

    Default mode is an eager ``localCheckpoint`` — blocks land
    executor-side once and lineage truncates, so N downstream consumers
    read blocks instead of recomputing the sub-plan N times. ``persist``
    trades eager truncation for fault-tolerant lineage; ``none`` (plan
    audits) is the identity.
    """
    mode = _mode()
    if mode == "none":
        return df
    if mode == "persist":
        return df.persist()
    return df.localCheckpoint()


@contextmanager
def plan_only():
    """Context: build DataFrames without materializing shared frames, so
    the complete logical/physical plan is visible to ``.explain()`` and
    the width audit, and no checkpoint sub-jobs execute."""
    global _override
    prev = _override
    _override = "none"
    try:
        yield
    finally:
        _override = prev
