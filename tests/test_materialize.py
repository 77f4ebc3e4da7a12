"""Materialization-seam mode parity (pgcp_spark/plans/materialize.py).

The seam's mode ladder (localCheckpoint → persist → checkpoint → none)
is the package's answer to the 100 TB fault-tolerance question: the
test-scale default truncates lineage into executor-local blocks, while
production deployments flip one env var to lineage-keeping persist or
storage-backed reliable checkpoints. A mode that silently changed
RESULTS would make that switch a lie, so every mode is pinned
result-identical on queries that exercise the seam hardest (multi-
consumer shared frames, iterative fixpoints). The fleet-wide sweep
(COVERAGE.md round-6 matrix) extends this parity to all registered
queries under persist/checkpoint at sf0.01; these tests keep the
invariant in every pytest run.
"""

from __future__ import annotations

import os

import pytest

from pgcp_spark.plans.materialize import _MODES, materialize, materialize_mode
from pgcp_spark.registry import all_queries
from tests.conftest import SF_DIR

# seam-heavy representatives: TF-IDF (one shared doc-term aggregate, three
# consumers), funnel (chained step tables), connected components (iterative
# fixpoint re-materialized per round), incremental dedup (lake index + a
# materialized batch-shingle frame feeding join + aggregate)
SEAM_QUERIES = [
    "text_tfidf_top_terms",
    "funnel_view_click_purchase",
    "graph_connected_dup_clusters",
    "dedup_incremental_batch_vs_index",
]


def _rows(spark, name, mode):
    q = all_queries()[name]
    with materialize_mode(mode):
        return [tuple(map(str, r)) for r in q.fn(spark, SF_DIR).collect()]


@pytest.mark.parametrize("name", SEAM_QUERIES)
def test_modes_are_result_identical(spark, name):
    baseline = _rows(spark, name, "localCheckpoint")
    assert baseline, f"{name} returned no rows at {SF_DIR}"
    for mode in ("persist", "checkpoint", "none"):
        assert _rows(spark, name, mode) == baseline, (name, mode)


def test_checkpoint_mode_writes_reliable_blocks(spark, tmp_path, monkeypatch):
    """checkpoint mode must land blocks in the configured directory —
    the property that makes it survive executor loss on a real cluster
    (the dir would be HDFS/object storage there)."""
    ckpt = str(tmp_path / "ckpt")
    if spark.sparkContext.getCheckpointDir() is None:
        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckpt)
    df = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    with materialize_mode("checkpoint"):
        out = materialize(df.groupBy("n_regionkey").count())
    assert out.count() > 0
    ckpt_dir = spark.sparkContext.getCheckpointDir()
    assert ckpt_dir is not None
    local = ckpt_dir.removeprefix("file:")
    found = any(files for _, _, files in os.walk(local))
    assert found, f"no checkpoint blocks under {ckpt_dir}"


def test_persist_mode_keeps_lineage(spark):
    """persist must NOT truncate lineage: the analyzed plan still shows
    the source relation (lost blocks recompute), unlike localCheckpoint's
    ExistingRDD truncation."""
    df = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    agg = df.groupBy("n_regionkey").count()
    with materialize_mode("persist"):
        out = materialize(agg)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistingRDD" not in plan
    out.unpersist()
    with materialize_mode("localCheckpoint"):
        trunc = materialize(agg)
    tplan = trunc._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistingRDD" in tplan or "LogicalRDD" in tplan


def test_mode_env_validation():
    with pytest.raises(ValueError):
        with materialize_mode("bogus"):
            pass
    assert set(_MODES) == {"localCheckpoint", "persist", "checkpoint", "none"}
