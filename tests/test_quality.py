"""Contracts of the data-quality expectations gate
(``sources/quality.py``): not-TRUE violation semantics (NULL fails a
rule), fail-action aborts BEFORE any commit, drop-action splits the
batch exactly (passing ∪ quarantine == batch), warn rules count without
removing, and metrics match the split."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pgcp_spark.sources.lake import current_snapshot, read_current
from pgcp_spark.sources.quality import (
    Expectation,
    ExpectationFailed,
    apply_expectations,
    write_with_expectations,
)


def _batch(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "ok"),
            (2, -5.0, "ok"),      # violates positive
            (3, None, "ok"),      # NULL violates positive (not-TRUE rule)
            (4, 10.0, None),      # violates warn-only label rule
        ],
        ["id", "value", "label"],
    )


def _rules():
    return [
        Expectation("positive", F.col("value") > 0, "drop"),
        Expectation("labeled", F.col("label").isNotNull(), "warn"),
    ]


def test_split_and_metrics(spark):
    passing, quarantined, metrics = apply_expectations(_batch(spark), _rules())
    assert metrics == {"positive": 2, "labeled": 1}
    assert {r.id for r in passing.collect()} == {1, 4}  # warn never removes
    q = {r.id: list(r._violations) for r in quarantined.collect()}
    assert q == {2: ["positive"], 3: ["positive"]}
    # passing ∪ quarantined == batch, disjoint
    assert {r.id for r in passing.collect()} | set(q) == {1, 2, 3, 4}


def test_fail_action_aborts_before_commit(spark):
    tdir = tempfile.mkdtemp(prefix="qual_fail_")
    qdir = tempfile.mkdtemp(prefix="qual_failq_")
    try:
        rules = [Expectation("positive", F.col("value") > 0, "fail")]
        with pytest.raises(ExpectationFailed, match="positive"):
            write_with_expectations(spark, _batch(spark), tdir, rules, qdir)
        assert current_snapshot(tdir) is None  # nothing committed
        assert current_snapshot(qdir) is None
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
        shutil.rmtree(qdir, ignore_errors=True)


def test_guarded_write_commits_split(spark):
    tdir = tempfile.mkdtemp(prefix="qual_ok_")
    qdir = tempfile.mkdtemp(prefix="qual_okq_")
    try:
        metrics = write_with_expectations(spark, _batch(spark), tdir, _rules(), qdir)
        assert metrics == {"positive": 2, "labeled": 1}
        main_ids = {r.id for r in read_current(spark, tdir).collect()}
        quar = read_current(spark, qdir)
        assert main_ids == {1, 4}
        assert {r.id for r in quar.collect()} == {2, 3}
        assert "_violations" in quar.columns
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
        shutil.rmtree(qdir, ignore_errors=True)


def test_duplicate_rule_names_and_bad_action_raise(spark):
    with pytest.raises(ValueError, match="duplicate"):
        apply_expectations(
            _batch(spark),
            [Expectation("r", F.lit(True)), Expectation("r", F.lit(True))],
        )
    with pytest.raises(ValueError, match="action"):
        Expectation("r", F.lit(True), "explode")


# --- the streaming form (streaming/ingest_quality.py) ----------------------


def test_streaming_gate_boundary_invariance_and_complementarity(spark):
    """availableNow-in-one-trigger must build bit-identical main +
    quarantine tables to day-at-a-time (row-local verdicts are
    batch-boundary-free), and main ∪ quarantine == the whole corpus with
    no overlap — nothing unvetted reaches main, nothing is lost."""
    from pyspark.sql import functions as F

    from pgcp_spark.sources.lake import read_current_with_deltas
    from pgcp_spark.sources.tables import load_table
    from pgcp_spark.streaming.ingest_quality import run_ingest_quality

    sf = "/root/testdata/sf0.001"
    dirs = []
    try:
        m1, q1 = run_ingest_quality(spark, sf, max_files_per_trigger=1)
        m2, q2 = run_ingest_quality(spark, sf, max_files_per_trigger=None)
        dirs += [m1, q1, m2, q2]

        def rows(d, drop_v=False):
            df = read_current_with_deltas(spark, d, key=["doc_id"])
            if drop_v and "_violations" in df.columns:
                df = df.drop("_violations")
            return sorted(tuple(r) for r in df.collect())

        assert rows(m1) == rows(m2)
        assert rows(q1) == rows(q2)
        main_ids = {r[0] for r in rows(m1)}
        quar_ids = {r[0] for r in rows(q1)}
        all_ids = {
            r.doc_id for r in load_table(spark, sf, "documents").collect()
        }
        assert main_ids | quar_ids == all_ids
        assert not (main_ids & quar_ids)
        # the drop rules actually fired on this corpus (live gate)
        assert quar_ids, "expected quarantined short docs"
        # warn-only rule never quarantines on its own: every quarantined
        # row has a drop-rule violation
        for r in read_current_with_deltas(spark, q1, key=["doc_id"]).collect():
            assert set(r._violations) & {"min_length", "chars_consistent"}, r
    finally:
        import shutil

        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
