"""Pins for the streaming vector-ingest loop (streaming/ingest_ann.py):
an independent numpy replay oracle, batch-boundary invariance (the
module's load-bearing design property), cross-batch neighbor discovery
through the folded index, at-least-once replay idempotence, temp-dir
hygiene, and isolation of the shared per-corpus index."""

from __future__ import annotations

import glob
import os
import tempfile

import numpy as np
import pytest

import pgcp_spark.functions.ann_index as AI
from pgcp_spark.functions.ann_index import ensure_ann_index
from pgcp_spark.functions.similarity import IVF_NPROBE, TOP_K
from pgcp_spark.sources.lake import current_snapshot, read_current
from pgcp_spark.streaming.ingest_ann import (
    N_STREAM_BATCHES,
    run_ingest_ann,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def ann_root(tmp_path, monkeypatch):
    monkeypatch.setattr(AI, "ANN_INDEX_ROOT", str(tmp_path / "ann"))
    return str(tmp_path / "ann")


def _rows(df):
    return sorted(
        (r.vec_id, r.batch_seq, r.neighbor_id, r.rank, round(r.cos_sim, 6))
        for r in df.collect()
    )


def _seq(vec_id: int) -> int:
    return (vec_id // AI.ANN_BATCH_MOD) % N_STREAM_BATCHES


def _numpy_replay(spark, sf_dir):
    """Independent ground truth, replayed driver-side with numpy: for
    each streamed vector, exact-cosine top-k over every ROUTABLE earlier
    vector — indexed-corpus rows keep their STORED list assignment (data,
    not join logic), earlier stream rows take their nearest stored
    centroid (the fold rule), and a candidate is routable iff its list is
    among the query's nprobe probe lists. Same kernel arithmetic as
    ``_assign`` so centroid-ranking ties resolve identically."""
    index_dir = ensure_ann_index(spark, sf_dir)
    cents = AI._load_centroids(spark, index_dir)
    cnorm = np.sqrt((cents * cents).sum(axis=1))
    stored = {
        r.vec_id: (np.array(r.embedding, float), r.list_id)
        for r in AI.stored_vectors(spark, index_dir).collect()
    }
    stream = {
        r.vec_id: np.array(r.embedding, float)
        for r in AI._batch(spark, sf_dir).collect()
    }

    def routing(q):
        qn = np.sqrt((q * q).sum())
        sims = (q @ cents.T) / (qn * cnorm + 1e-12)
        order = np.argsort(-sims)
        return set(order[:IVF_NPROBE].tolist()), int(order[0])

    probe_of, assign_of = {}, {}
    for vid, q in stream.items():
        probe_of[vid], assign_of[vid] = routing(q)

    expect = []
    for vid, q in stream.items():
        qn = np.linalg.norm(q)
        cand = []
        for cid, (v, lid) in stored.items():
            if lid in probe_of[vid] and cid != vid:
                cand.append((cid, v))
        for cid, v in stream.items():
            if (_seq(cid), cid) < (_seq(vid), vid) and assign_of[cid] in probe_of[vid]:
                cand.append((cid, v))
        scored = sorted(
            (
                (-round(float(q @ v) / (qn * np.linalg.norm(v)), 6), cid)
                for cid, v in cand
            ),
        )[:TOP_K]
        for rank, (neg, cid) in enumerate(scored, start=1):
            expect.append((vid, _seq(vid), cid, rank, -neg))
    return sorted(expect)


def test_matches_numpy_replay_oracle(spark, ann_root):
    """The strongest check a rows-only streaming query can carry: the
    full streamed output equals an independent driver-side replay of the
    everything-earlier + frozen-routing semantics."""
    got = _rows(run_ingest_ann(spark, SF_DIR))
    assert got, "test lake should stream a non-empty slice"
    assert got == _numpy_replay(spark, SF_DIR)


def test_batch_boundary_invariance(spark, ann_root):
    """THE design property: per-file micro-batches and one availableNow
    mega-batch must produce IDENTICAL neighbor tables, because stream
    position is data-derived and routing geometry is frozen (centroids
    untouched by folds) for the stream's duration."""
    per_file = _rows(run_ingest_ann(spark, SF_DIR, max_files_per_trigger=1))
    one_shot = _rows(run_ingest_ann(spark, SF_DIR, max_files_per_trigger=None))
    assert per_file == one_shot


@pytest.fixture()
def cross_day_lake(spark, tmp_path, ann_root):
    """A lake whose stream slice contains near-identical vectors in
    DIFFERENT ingest days: vec 30 (day 0) and vecs 10, 40 (day 1) carry
    tiny perturbations of the same embedding, so day-1 queries can only
    find their day-0 twin through the FOLDED index."""
    lake = tmp_path / "lake"
    lake.mkdir()
    for t in os.listdir(SF_DIR):
        if t != "embeddings.parquet":
            os.symlink(os.path.join(SF_DIR, t), str(lake / t))
    base = [
        (r.vec_id, [float(x) for x in r.embedding], r.label)
        for r in spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).collect()
    ]
    by_id = {v: (e, l) for v, e, l in base}
    proto = by_id[30][0] if 30 in by_id else base[0][1]
    rows = []
    for v, e, l in base:
        if v in (10, 40):  # day-1 stream vectors → near-copies of vec 30 (day 0)
            e = [x + (0.001 if v == 40 else 0.0005) for x in proto]
        if v == 30:
            e = list(proto)
        rows.append((v, e, l))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = str(tmp_path / "_emb_out")
    df.coalesce(1).write.parquet(out)
    part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
    os.rename(part, str(lake / "embeddings.parquet"))
    return str(lake)


def test_cross_batch_neighbors_found_via_folded_index(spark, ann_root, cross_day_lake):
    """Neighbor discovery must cross micro-batch boundaries: the day-1
    near-copies' top neighbor is their day-0 twin — reachable only
    because update_ann_index folded day 0 in before day 1 arrived — and
    the numpy replay oracle agrees on the whole lake."""
    got = _rows(run_ingest_ann(spark, cross_day_lake))
    top1 = {(v, n) for v, seq, n, rank, s in got if rank == 1}
    # vec 10's twin lives a DAY earlier → only reachable post-fold;
    # vec 40's nearest is vec 10 (0.0005 apart vs 0.001 to vec 30) —
    # a same-day earlier match, proving the within-batch path too
    assert (10, 30) in top1 and (40, 10) in top1
    by_pair = {(v, n): s for v, seq, n, rank, s in got}
    assert by_pair[(10, 30)] > 0.999 and by_pair[(40, 10)] > 0.999
    assert got == _numpy_replay(spark, cross_day_lake)


def test_batch_replay_is_idempotent(spark, ann_root, tmp_path):
    """foreachBatch is AT-LEAST-ONCE: a crash between the index fold and
    the checkpoint commit re-delivers the batch. Re-processing the last
    (already-folded) batch must leave the neighbor table bit-identical —
    the exclude_ids anti-join keeps the replayed batch from matching its
    own folded rows. The fold itself must also converge: the final index
    holds base + stream exactly once."""
    from pgcp_spark.streaming.ingest_ann import (
        _copy_index,
        _seq_col,
        _stream_slice,
        process_ingest_batch,
    )

    index_dir = _copy_index(ensure_ann_index(spark, SF_DIR))
    neighbors_dir = str(tmp_path / "neighbors")
    vecs = _stream_slice(spark, SF_DIR)
    batches = [vecs.filter(_seq_col() == k) for k in range(N_STREAM_BATCHES)]
    for b in batches:
        process_ingest_batch(spark, b, index_dir, neighbors_dir)
    before = _rows(read_current(spark, neighbors_dir))
    process_ingest_batch(spark, batches[-1], index_dir, neighbors_dir)  # replay
    after = _rows(read_current(spark, neighbors_dir))
    assert after == before
    n_base = AI._indexed_corpus(spark, SF_DIR).count()
    n_stream = vecs.count()
    stored = AI.stored_vectors(spark, index_dir)
    assert stored.count() == n_base + n_stream
    assert stored.select("vec_id").distinct().count() == n_base + n_stream


def test_shared_index_is_never_mutated(spark, ann_root):
    """The registered query works on a throwaway copy: the shared
    per-corpus index's snapshots must be identical before and after."""
    seed = ensure_ann_index(spark, SF_DIR)
    before = {t: current_snapshot(os.path.join(seed, t)) for t in AI._SUBTABLES}
    run_ingest_ann(spark, SF_DIR)
    after = {t: current_snapshot(os.path.join(seed, t)) for t in AI._SUBTABLES}
    assert before == after


def test_no_tmp_leak(spark, ann_root):
    """Every run-scoped dir (index working copy, stream staging,
    neighbors table) is reclaimed under the default eager materialization
    mode."""
    run_ingest_ann(spark, SF_DIR)  # warm: index build
    pattern = os.path.join(tempfile.gettempdir(), "pgcp_ingest_ann_*")
    before = set(glob.glob(pattern))
    run_ingest_ann(spark, SF_DIR).collect()
    leaked = set(glob.glob(pattern)) - before
    assert not leaked, f"run left temp dirs behind: {sorted(leaked)}"
