"""Pins for the streaming ingest-dedup loop (streaming/ingest_dedup.py):
oracle parity, batch-boundary invariance (the module's load-bearing
design property), cross-batch duplicate detection through the folded
index, and isolation of the shared per-corpus index."""

from __future__ import annotations

import os

import pytest

import pgcp_spark.functions.dedup_index as DI
from pgcp_spark.functions.dedup_index import ensure_index
from pgcp_spark.registry import all_queries
from pgcp_spark.sources.lake import current_snapshot
from pgcp_spark.streaming.ingest_dedup import (
    N_STREAM_BATCHES,
    run_ingest_dedup,
)
from tests.conftest import SF_DIR
from tests.oracle_check import compare


@pytest.fixture()
def index_root(tmp_path, monkeypatch):
    monkeypatch.setattr(DI, "INDEX_ROOT", str(tmp_path / "index"))
    return str(tmp_path / "index")


def _decisions(df):
    return sorted(
        (r.doc_id, r.batch_seq, r.n_dup_prior, r.kept) for r in df.collect()
    )


def test_matches_duckdb_oracle(spark, index_root):
    q = all_queries()["streaming_ingest_dedup_decisions"]
    compare(spark, SF_DIR, q.name, q.fn, q.oracle)


def test_batch_boundary_invariance(spark, index_root):
    """THE design property: per-file micro-batches (the steady-state
    shape) and one availableNow mega-batch (the caught-up-after-downtime
    shape) must produce IDENTICAL decisions, because stream position is
    derived from the data, not from Spark's batch_id."""
    per_file = _decisions(run_ingest_dedup(spark, SF_DIR, max_files_per_trigger=1))
    one_shot = _decisions(run_ingest_dedup(spark, SF_DIR, max_files_per_trigger=None))
    assert per_file, "test lake should stream a non-empty slice"
    assert per_file == one_shot


def test_cross_batch_duplicates_found_via_folded_index(spark, index_root):
    """Duplicate detection must cross micro-batch boundaries: at least
    one dropped doc's only matches live in an EARLIER STREAMED batch
    (proving update_index folded it), and every drop has n_dup_prior > 0
    while every keep has 0 (decision consistency)."""
    rows = run_ingest_dedup(spark, SF_DIR).collect()
    assert all((r.n_dup_prior == 0) == r.kept for r in rows)
    dropped = [r for r in rows if not r.kept]
    assert dropped, "test lake should contain streamed near-dups"
    # seqs must cover the full schedule, and drops must not all sit in
    # the first batch (a first-batch-only drop set could be explained by
    # the pre-built index alone — later-batch drops exercise the fold)
    seqs = {r.batch_seq for r in rows}
    assert seqs == set(range(N_STREAM_BATCHES))
    assert any(r.batch_seq > 0 for r in dropped)


def test_shared_index_is_never_mutated(spark, index_root):
    """The registered query works on a throwaway copy: the shared
    per-corpus index's snapshots must be identical before and after."""
    seed = ensure_index(spark, SF_DIR)
    before = {t: current_snapshot(os.path.join(seed, t)) for t in DI._SUBTABLES}
    run_ingest_dedup(spark, SF_DIR)
    after = {t: current_snapshot(os.path.join(seed, t)) for t in DI._SUBTABLES}
    assert before == after


def test_rerun_is_deterministic(spark, index_root):
    a = _decisions(run_ingest_dedup(spark, SF_DIR))
    b = _decisions(run_ingest_dedup(spark, SF_DIR))
    assert a == b


def test_batch_replay_is_idempotent(spark, index_root, tmp_path):
    """foreachBatch is AT-LEAST-ONCE: a crash between the index fold and
    the checkpoint commit re-delivers the same micro-batch. Delivering
    every batch TWICE must produce bit-identical decisions. The teeth:
    some batch must contain a same-batch near-dup pair — exactly the case
    where a replayed, already-folded batch would otherwise match itself
    in both directions through the stored postings and flip the earlier
    doc's keep decision."""
    from pgcp_spark.streaming.ingest_dedup import (
        _copy_index,
        _seq_col,
        _stream_slice,
        process_ingest_batch,
        within_batch_pairs,
    )
    from pgcp_spark.sources.lake import read_current

    baseline = _decisions(run_ingest_dedup(spark, SF_DIR))
    index_dir = _copy_index(ensure_index(spark, SF_DIR))
    decisions_dir = str(tmp_path / "decisions")
    docs = _stream_slice(spark, SF_DIR)
    n_within = 0
    for k in range(N_STREAM_BATCHES):
        b = docs.filter(_seq_col() == k)
        n_within += within_batch_pairs(b, index_dir).count()  # pre-fold
        process_ingest_batch(spark, b, index_dir, decisions_dir)
        process_ingest_batch(spark, b, index_dir, decisions_dir)  # replay
    assert n_within > 0, "test lake should contain a same-batch near-dup pair"
    replayed = _decisions(read_current(spark, decisions_dir).orderBy("doc_id"))
    assert replayed == baseline
