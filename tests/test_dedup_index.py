"""Pins for the incremental dedup index (functions/dedup_index.py):
oracle parity, signature reuse across runs (no corpus recompute), and
equivalence to the full-corpus capped-Jaccard pairs restricted to
new-vs-old."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import pgcp_spark.functions.dedup_index as DI
from pgcp_spark.functions.dedup import capped_jaccard_pairs
from pgcp_spark.functions.dedup_index import (
    BATCH_MOD,
    batch_vs_index,
    build_index,
    dedup_incremental_batch_vs_index,
    ensure_index,
)
from pgcp_spark.plans.materialize import plan_only
from pgcp_spark.plans.width import formatted_plan
from pgcp_spark.registry import all_queries
from pgcp_spark.sources.lake import current_snapshot
from tests.conftest import SF_DIR
from tests.oracle_check import compare


@pytest.fixture()
def index_root(tmp_path, monkeypatch):
    monkeypatch.setattr(DI, "INDEX_ROOT", str(tmp_path / "index"))
    return str(tmp_path / "index")


def test_matches_duckdb_oracle(spark, index_root):
    q = all_queries()["dedup_incremental_batch_vs_index"]
    compare(spark, SF_DIR, q.name, q.fn, q.oracle)


def test_index_reused_across_runs_no_rebuild(spark, index_root):
    """Second run must serve the stored index untouched: same committed
    snapshot names, identical result."""
    first = dedup_incremental_batch_vs_index(spark, SF_DIR).collect()
    index_dir = DI.index_dir_for(SF_DIR)
    snaps = {t: current_snapshot(os.path.join(index_dir, t)) for t in DI._SUBTABLES}
    assert all(snaps.values()), snaps

    second = dedup_incremental_batch_vs_index(spark, SF_DIR).collect()
    snaps2 = {t: current_snapshot(os.path.join(index_dir, t)) for t in DI._SUBTABLES}
    assert snaps2 == snaps, "index was rebuilt on rerun"
    assert second == first


def test_query_never_rescans_indexed_corpus(spark, index_root):
    """The batch query's plan must read the OLD side exclusively from the
    index's parquet tables: the only scans of documents.parquet are the
    batch slice (doc_id % BATCH_MOD = 0 pushed down), and the stored
    signatures/postings/sizes appear as parquet scans of the index dir."""
    index_dir = ensure_index(spark, SF_DIR)
    with plan_only():
        plan = formatted_plan(batch_vs_index(spark, SF_DIR, index_dir))
    assert index_dir in plan
    # batch-side documents scans exist...
    doc_scans = [l for l in plan.splitlines() if "documents.parquet" in l and "Location" in l]
    assert doc_scans, "expected batch-side documents scans"
    # ...but the old corpus (doc_id % BATCH_MOD <> 0, ~90% of rows) is
    # never re-derived from raw documents: the NON-batch predicate exists
    # only in the BUILD, which must not appear in the query plan.
    assert "NOT ((doc_id" not in plan, (
        "batch query re-derived the indexed corpus from raw documents"
    )


def test_equals_full_corpus_pairs_restricted_to_new_vs_old(spark, index_root):
    """Batch-vs-index ≡ the one-shot capped-Jaccard query filtered to
    pairs with exactly one side in the batch — the incremental path drops
    no pair and invents none (new-vs-new pairs are out of contract: they
    join the index at the NEXT build)."""
    inc = {
        (r.doc_new, r.doc_old, r.n_shared)
        for r in dedup_incremental_batch_vs_index(spark, SF_DIR).collect()
    }
    full = capped_jaccard_pairs(spark, SF_DIR).filter(
        (F.col("doc_a") % BATCH_MOD == 0) != (F.col("doc_b") % BATCH_MOD == 0)
    )
    expected = set()
    for r in full.collect():
        new, old = (r.doc_a, r.doc_b) if r.doc_a % BATCH_MOD == 0 else (r.doc_b, r.doc_a)
        expected.add((new, old, r.n_shared))
    # NOTE: n_shared/jaccard can differ between the two formulations only
    # via the df-cap universe: the one-shot query caps df over the WHOLE
    # corpus, the index caps over the OLD corpus. A shingle with
    # df_old ≤ cap < df_total is counted by the index but not the one-shot
    # query. Compare ids, not counts, when that disagreement appears.
    assert {(a, b) for a, b, _ in inc} >= {(a, b) for a, b, _ in expected}, (
        "incremental path lost a true near-dup pair"
    )


def test_minhash_band_path_reuses_stored_signatures_with_recall(spark, index_root):
    """The approximate band path must (a) serve the STORED signatures
    untouched — snapshot identity across the call — and (b) recall the
    strong near-dups the exact path finds (this lake's true pairs sit at
    jaccard ≥ 0.8, where 16×2 banding misses with p ≤ 1e-7; the sf1
    replicated lake is the documented counterexample for
    threshold-adjacent pairs, which is why this path carries a recall
    contract instead of an oracle)."""
    from pgcp_spark.functions.dedup_index import batch_vs_index_minhash_candidates

    index_dir = ensure_index(spark, SF_DIR)
    snap = current_snapshot(os.path.join(index_dir, "signatures"))
    batch = DI._batch(spark, SF_DIR)
    approx = {
        (r.doc_new, r.doc_old)
        for r in batch_vs_index_minhash_candidates(spark, batch, index_dir).collect()
    }
    assert current_snapshot(os.path.join(index_dir, "signatures")) == snap
    exact = {
        (r.doc_new, r.doc_old)
        for r in dedup_incremental_batch_vs_index(spark, SF_DIR).collect()
    }
    assert exact, "test lake should contain new-vs-old near-dups"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, (recall, len(approx), len(exact))


def test_stale_corpus_gets_fresh_index_dir(tmp_path, index_root):
    """A regenerated lake under the same path must fingerprint to a new
    index dir (content-version keying — a stale index can never serve a
    changed corpus)."""
    lake = tmp_path / "lake"
    lake.mkdir()
    doc = lake / "documents.parquet"
    doc.write_bytes(b"v1")
    d1 = DI.index_dir_for(str(lake))
    os.utime(doc, ns=(1, 1))
    d2 = DI.index_dir_for(str(lake))
    assert d1 != d2


def test_build_then_direct_batch_query(spark, tmp_path):
    """build_index + batch_vs_index compose without ensure_index (the
    production API: build nightly, query per batch)."""
    index_dir = str(tmp_path / "idx")
    build_index(spark, SF_DIR, index_dir)
    rows = batch_vs_index(spark, SF_DIR, index_dir).collect()
    assert all(r.doc_new % BATCH_MOD == 0 and r.doc_old % BATCH_MOD != 0 for r in rows)
    assert all(r.jaccard >= 0.3 for r in rows)


def test_rolling_ingest_update_index_absorbs_batches(spark, tmp_path):
    """The full daily loop: build from day-1 docs, dedup day-2 against the
    index, ABSORB day-2 (update_index: lake upserts), dedup day-3 — day-3
    must now find pairs against BOTH day-1 and day-2 docs, and re-running
    an absorbed batch must not emit self-pairs (the ≠ guard)."""
    from pyspark.sql import functions as F

    from pgcp_spark.functions.dedup_index import (
        batch_vs_index_docs,
        build_index_from,
        update_index,
    )
    from pgcp_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    day1 = docs.filter(F.col("doc_id") % 3 == 1)
    day2 = docs.filter(F.col("doc_id") % 3 == 2)
    day3 = docs.filter(F.col("doc_id") % 3 == 0)
    index_dir = str(tmp_path / "idx")

    build_index_from(spark, day1, index_dir)
    d2_pairs = batch_vs_index_docs(spark, day2, index_dir).collect()
    assert all(r.doc_old % 3 == 1 for r in d2_pairs)  # index = day1 only

    update_index(spark, day2, index_dir)
    # an absorbed batch re-run: no self-pairs, and its day1 pairs persist
    d2_rerun = batch_vs_index_docs(spark, day2, index_dir).collect()
    assert all(r.doc_new != r.doc_old for r in d2_rerun)
    assert {(r.doc_new, r.doc_old) for r in d2_rerun} >= {
        (r.doc_new, r.doc_old) for r in d2_pairs
    }

    d3_pairs = batch_vs_index_docs(spark, day3, index_dir).collect()
    olds = {r.doc_old % 3 for r in d3_pairs}
    # the sf0.001 corpus has near-dups spread across the mod-3 slices, so
    # day 3 should hit both generations of the index
    assert olds == {1, 2}, d3_pairs

    # absorbing must be idempotent at the snapshot level: a second
    # update_index of the same batch replaces rather than duplicates
    update_index(spark, day2, index_dir)
    from pgcp_spark.sources.lake import read_current

    sigs = read_current(spark, f"{index_dir}/signatures")
    assert sigs.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_compact_index_pure_rewrite_fewer_files(spark, tmp_path):
    """compact_index is the fold history's OPTIMIZE: after a batch fold
    (copy-on-write MERGE re-emits each table at its job's file count),
    compaction must merge every subtable's files toward the target size
    while leaving the batch-vs-index result bit-identical."""
    import glob as g
    import shutil

    from pgcp_spark.functions.dedup_index import (
        batch_vs_index_docs,
        compact_index,
        update_index,
    )

    seed = ensure_index(spark, SF_DIR)
    work = str(tmp_path / "work")
    shutil.copytree(seed, work)
    batch = DI._batch(spark, SF_DIR)
    update_index(spark, batch, work)

    def file_counts():
        out = {}
        for t in DI._SUBTABLES:
            snap = current_snapshot(os.path.join(work, t))
            out[t] = len(g.glob(os.path.join(work, t, snap, "*.parquet")))
        return out

    before_files = file_counts()
    before = sorted(map(tuple, batch_vs_index_docs(spark, batch, work).collect()))
    compact_index(spark, work)
    after_files = file_counts()
    assert all(after_files[t] <= before_files[t] for t in after_files), (
        before_files,
        after_files,
    )
    assert any(after_files[t] < before_files[t] for t in after_files), (
        "compaction merged nothing — the fold left no small files to test against"
    )
    after = sorted(map(tuple, batch_vs_index_docs(spark, batch, work).collect()))
    assert before == after, "compaction must be a pure rewrite"


def test_promote_hot_shingles_converges_to_scratch_rebuild(spark, tmp_path):
    """The hot-list maintenance contract: build an index on a corpus
    where a boilerplate shingle sits UNDER the cap, fold a batch that
    pushes its stored df OVER the cap, run promote_hot_shingles — and
    every index table (hot_shingles, postings, sizes, signatures) must
    be row-identical to build_index_from run from scratch on the
    absorbed corpus. The weekly rebuild collapses to an O(index) pass
    with zero corpus access."""
    from pgcp_spark.functions.dedup import HOT_SHINGLE_DF_CAP
    from pgcp_spark.functions.dedup_index import (
        build_index_from,
        promote_hot_shingles,
        update_index,
    )
    from pgcp_spark.sources.lake import read_current as rc

    boiler = "aa bb cc dd"  # shingles "aa bb cc", "bb cc dd" shared
    def docs(ids, tail):
        return spark.createDataFrame(
            [(i, f"{boiler} {tail}{i} z{i}") for i in ids],
            "doc_id long, text string",
        )

    n_old = HOT_SHINGLE_DF_CAP - 3   # under the cap at build time
    n_new = 8                        # enough to cross it when folded
    indexed = docs(range(n_old), "u")
    batch = docs(range(1000, 1000 + n_new), "v")

    inc_dir = str(tmp_path / "inc")
    build_index_from(spark, indexed, inc_dir)
    assert rc(spark, os.path.join(inc_dir, "hot_shingles")).count() == 0
    update_index(spark, batch, inc_dir)
    # folded df of the boilerplate shingles is now n_old + n_new > cap,
    # fully visible in the stored postings
    promoted = promote_hot_shingles(spark, inc_dir)
    assert promoted == 2, promoted  # exactly the two boilerplate shingles
    assert promote_hot_shingles(spark, inc_dir) == 0  # idempotent

    scratch_dir = str(tmp_path / "scratch")
    build_index_from(spark, indexed.unionByName(batch), scratch_dir)

    for t in DI._SUBTABLES:
        a = sorted(map(tuple, rc(spark, os.path.join(inc_dir, t)).collect()))
        b = sorted(map(tuple, rc(spark, os.path.join(scratch_dir, t)).collect()))
        assert a == b, f"{t} diverged from the from-scratch rebuild"


def test_fold_is_delta_append_and_compaction_flattens(spark, tmp_path):
    """Round 9: the fold must be an O(batch) APPEND — one active delta
    per table, base snapshots untouched — and compact_index merges the
    deltas into the bases with results unchanged (the deferred half of
    the fold cost, paid on the cadence)."""
    import shutil

    from pgcp_spark.sources import lake

    seed = ensure_index(spark, SF_DIR)
    work = str(tmp_path / "work")
    shutil.copytree(seed, work)
    batch = DI._batch(spark, SF_DIR)
    before_snaps = {
        t: current_snapshot(os.path.join(work, t)) for t in DI._SUBTABLES
    }
    DI.update_index(spark, batch, work)
    for t in ("signatures", "postings", "sizes"):
        assert len(lake.delta_names(os.path.join(work, t))) == 1, t
        assert current_snapshot(os.path.join(work, t)) == before_snaps[t], t
    effective = {
        t: sorted(
            tuple(r) for r in DI.stored_table(spark, work, t).collect()
        )
        for t in ("signatures", "postings", "sizes")
    }
    DI.compact_index(spark, work)
    for t in ("signatures", "postings", "sizes"):
        assert lake.delta_names(os.path.join(work, t)) == [], t
        assert (
            sorted(tuple(r) for r in DI.stored_table(spark, work, t).collect())
            == effective[t]
        ), t
