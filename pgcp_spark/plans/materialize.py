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

Mode ladder, in increasing fault tolerance (and cost):

  ``localCheckpoint``  executor-local blocks, lineage truncated — fastest,
                       unrecoverable on executor loss (test-scale default).
  ``persist``          lazy cache with FULL lineage — lost blocks recompute;
                       memory-and-disk, LRU-evicted, safe on long sessions.
  ``checkpoint``       RELIABLE checkpoint: blocks written to the configured
                       checkpoint directory (``SPARK_GRAFT_CHECKPOINT_DIR``,
                       an HDFS/object-store path on a real cluster), lineage
                       truncated but recovery reads storage — the 100 TB
                       production mode for truncation-needing intermediates.
  ``none``             identity (plan audits only).

All four modes are swept fleet-wide for result parity (COVERAGE.md
round-6 matrix: the full registry runs green under ``persist`` and
``checkpoint`` at sf0.01) — the production modes are verified behavior,
not a documented aspiration.

NOTE for loop bodies (``functions/graph.py``): ``none`` mode keeps full
lineage, so a fixpoint loop's plan grows per iteration. The graph loops
are diameter-bounded and the audits run at sf0.001, so this stays cheap;
it is the price of seeing the whole plan.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame

_MODES = ("localCheckpoint", "persist", "checkpoint", "none")
_override: str | None = None


def _mode() -> str:
    if _override is not None:
        return _override
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "localCheckpoint")
    if mode not in _MODES:
        raise ValueError(f"SPARK_GRAFT_MATERIALIZE must be one of {_MODES}, got {mode!r}")
    return mode


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    """Reliable checkpoints need a checkpoint dir; set it once per
    SparkContext from ``SPARK_GRAFT_CHECKPOINT_DIR`` (a durable
    HDFS/object-store URI on a real cluster; a local temp dir here)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        import tempfile

        ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or tempfile.mkdtemp(
            prefix="pgcp_ckpt_"
        )
        sc.setCheckpointDir(ckpt)


def current_mode() -> str:
    """The materialization mode in effect (override > env > default).
    Public so callers that manage on-disk intermediates can tell whether
    ``materialize`` DETACHES a frame from its backing files (eager
    localCheckpoint / reliable checkpoint → safe to delete them) or
    leaves it reading lazily (persist / none → files must outlive the
    frame)."""
    return _mode()


def materialize(df: DataFrame) -> DataFrame:
    """Materialize a shared intermediate (see module docstring).

    Default mode is an eager ``localCheckpoint`` — blocks land
    executor-side once and lineage truncates, so N downstream consumers
    read blocks instead of recomputing the sub-plan N times. ``persist``
    trades eager truncation for fault-tolerant lineage; ``checkpoint``
    writes reliable (storage-backed) blocks — the production mode;
    ``none`` (plan audits) is the identity.
    """
    mode = _mode()
    if mode == "none":
        return df
    if mode == "persist":
        return df.persist()
    if mode == "checkpoint":
        _ensure_checkpoint_dir(df)
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


def materialize_loop(df: DataFrame) -> DataFrame:
    """Materialize LOOP-CARRIED state (fixpoint iterations: connected
    components, PageRank). Differs from :func:`materialize` in one
    essential way: loop state must TRUNCATE LINEAGE every iteration —
    ``persist`` alone is insufficient, because a cached parent short-cuts
    recomputation but not the logical plan, so the plan tree still nests
    per iteration and grows exponentially (measured: the round-6
    persist-mode fleet sweep OOM'd the driver merely *rendering*
    PageRank's plan string at sf0.01). The classic Spark iterative-
    algorithm rule: cache for speed, checkpoint for lineage.

    Mode mapping: ``none`` stays identity (plan audits see loop bodies;
    safe because audits run at sf0.001 where diameter bounds the
    nesting); ``localCheckpoint`` stays itself; the fault-tolerant modes
    (``persist``, ``checkpoint``) escalate to RELIABLE checkpoint —
    truncation that survives executor loss, which is the only
    combination that delivers both properties a production loop needs.
    """
    mode = _mode()
    if mode == "none":
        return df
    if mode in ("persist", "checkpoint"):
        _ensure_checkpoint_dir(df)
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


@contextmanager
def materialize_mode(mode: str):
    """Context: force a materialization mode for every ``materialize``
    call inside the block (overrides the env default). For tests and
    embedding applications that pick the mode per job rather than per
    process."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    global _override
    prev = _override
    _override = mode
    try:
        yield
    finally:
        _override = prev


def plan_only():
    """Context: build DataFrames without materializing shared frames, so
    the complete logical/physical plan is visible to ``.explain()`` and
    the width audit, and no checkpoint sub-jobs execute."""
    return materialize_mode("none")
