"""Pins for the streaming ingest-dedup loop (streaming/ingest_dedup.py):
oracle parity, batch-boundary invariance (the module's load-bearing
design property), cross-batch duplicate detection through the folded
index, the per-crawl-day hot-shingle cap (the batch-local skew guard),
temp-dir hygiene, and isolation of the shared per-corpus index."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest

import pgcp_spark.functions.dedup_index as DI
from pgcp_spark.functions.dedup import HOT_SHINGLE_DF_CAP
from pgcp_spark.functions.dedup_index import ensure_index
from pgcp_spark.registry import all_queries
from pgcp_spark.sources.lake import current_snapshot
from pgcp_spark.streaming.ingest_dedup import (
    N_STREAM_BATCHES,
    day_capped_shingles,
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


@pytest.fixture()
def day_hot_lake(spark, tmp_path):
    """A lake whose stream slice contains a BATCH-HOT boilerplate: 25
    day-0 docs (> HOT_SHINGLE_DF_CAP) share an 8-token template the
    indexed corpus has never seen (stored df 0, so the build-time hot
    list cannot catch it), each with a unique 2-token tail. Without the
    day cap their pairwise capped Jaccard is 6/10 = 0.6 — every day-0
    doc but the first would be dropped for sharing boilerplate alone,
    and the self-join bucket would hold all 25. Day 1 carries one
    genuine near-dup pair (same tail tokens) that must still drop."""
    assert HOT_SHINGLE_DF_CAP < 25  # the template must actually be day-hot
    lake = tmp_path / "lake"
    lake.mkdir()
    for t in os.listdir(SF_DIR):  # ingest reads documents; oracle views need the rest
        if t != "documents.parquet":
            os.symlink(os.path.join(SF_DIR, t), str(lake / t))
    boiler = "aa bb cc dd ee ff gg hh"
    rows = []
    for i in range(25):  # day 0 stream docs: doc_id ≡ 0 (mod 30)
        rows.append((30 * i, f"{boiler} u{i} v{i}"))
    rows.append((10, "the quick brown fox jumps over the lazy dog tail10 x10"))
    rows.append((40, "the quick brown fox jumps over the lazy dog tail10 y40"))
    for i in range(30):  # indexed corpus: unique filler, no template
        rows.append((30 * i + 1, f"p{i} q{i} r{i} s{i} t{i} w{i}"))
    docs = spark.createDataFrame(
        [(d, t, "en", "synthetic", len(t)) for d, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp_out = str(tmp_path / "_docs_out")
    docs.coalesce(1).write.parquet(tmp_out)
    part = glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
    os.rename(part, str(lake / "documents.parquet"))  # single file: DuckDB-viewable
    return str(lake)


def test_day_hot_cap_bounds_and_decides(spark, index_root, day_hot_lake):
    """The batch-local skew guard: (a) the batch shingle pass drops the
    day-hot boilerplate shingles (bounding every within-batch self-join
    bucket), (b) boilerplate-only overlap no longer drops docs — all 25
    day-0 docs keep, (c) a genuine same-day near-dup still drops, and
    (d) the DuckDB oracle mirrors the day-cap semantics exactly."""
    from pgcp_spark.streaming.ingest_dedup import _stream_slice

    index_dir = ensure_index(spark, day_hot_lake)
    sh = day_capped_shingles(spark, _stream_slice(spark, day_hot_lake), index_dir)
    per_shingle = {r.shingle: r.cnt for r in
                   sh.groupBy("shingle").count().withColumnRenamed("count", "cnt").collect()}
    assert per_shingle, "stream slice must shingle"
    assert max(per_shingle.values()) <= HOT_SHINGLE_DF_CAP, (
        "a day-hot shingle survived the cap — the self-join bucket is unbounded"
    )
    assert not any(s.startswith("aa bb") for s in per_shingle), "boilerplate must be day-hot"

    decisions = {r.doc_id: r.kept for r in run_ingest_dedup(spark, day_hot_lake).collect()}
    assert all(decisions[30 * i] for i in range(25)), (
        "boilerplate-only overlap must not drop docs once day-capped"
    )
    assert decisions[10] and not decisions[40], "the genuine near-dup must still drop"

    q = all_queries()["streaming_ingest_dedup_decisions"]
    compare(spark, day_hot_lake, q.name, q.fn, q.oracle)


def test_day_hot_cap_is_trigger_invariant(spark, index_root, day_hot_lake):
    """The day cap keys on seq (data-derived), so coalescing all crawl
    days into one availableNow mega-batch must not change which shingles
    are hot nor any decision."""
    per_file = _decisions(run_ingest_dedup(spark, day_hot_lake, max_files_per_trigger=1))
    one_shot = _decisions(run_ingest_dedup(spark, day_hot_lake, max_files_per_trigger=None))
    assert per_file == one_shot


def test_no_tmp_leak(spark, index_root):
    """Every run-scoped dir (index working copy, stream staging,
    decisions table) is reclaimed under the default eager
    materialization mode — repeated runs must not accumulate anything
    under the temp root."""
    run_ingest_dedup(spark, SF_DIR)  # warm: index build, lake caches
    pattern = os.path.join(tempfile.gettempdir(), "pgcp_ingest_*")
    before = set(glob.glob(pattern))
    run_ingest_dedup(spark, SF_DIR).collect()
    leaked = set(glob.glob(pattern)) - before
    assert not leaked, f"run left temp dirs behind: {sorted(leaked)}"


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


def test_ingest_decisions_invariant_under_compaction(spark, index_root, tmp_path):
    """Maintenance must never change results: running the ingest loop
    with compact_index (the OPTIMIZE pass) between every micro-batch
    produces decisions bit-identical to the un-maintained run — the
    compaction is a pure rewrite of the very tables each next batch
    joins against."""
    from pgcp_spark.functions.dedup_index import compact_index
    from pgcp_spark.sources.lake import read_current
    from pgcp_spark.streaming.ingest_dedup import (
        _copy_index,
        _seq_col,
        _stream_slice,
        process_ingest_batch,
    )

    baseline = _decisions(run_ingest_dedup(spark, SF_DIR))
    index_dir = _copy_index(ensure_index(spark, SF_DIR))
    decisions_dir = str(tmp_path / "decisions")
    docs = _stream_slice(spark, SF_DIR)
    for k in range(N_STREAM_BATCHES):
        process_ingest_batch(spark, docs.filter(_seq_col() == k), index_dir, decisions_dir)
        compact_index(spark, index_dir)
    got = _decisions(read_current(spark, decisions_dir).orderBy("doc_id"))
    assert got == baseline
