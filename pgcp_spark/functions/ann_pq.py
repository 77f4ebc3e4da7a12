"""Product-quantized (PQ) IVF probe: 16-byte codes per vector, with
exact float re-scoring of the survivors. Parquet-measured at 200k
vectors (SCALE.md r10): candidate files 13.2× smaller than float32 and
1.24× below the int8 sidecar — parquet already bit-packs tinyints well,
so PQ's deeper wins over int8 are the in-memory candidate state (16 B
vs 64 B per vector in the scoring kernel) and decode-free LUT scoring;
4-bit codebooks would double the gap at a recall cost this corpus
doesn't need.

The third tier of the quantized-ANN ladder (float → int8 → PQ), the
public IVFADC shape (Jégou/Douze/Schmid, TPAMI 2011; FAISS ``IVF,PQ``):
split each vector into M subvectors, k-means a 256-entry codebook per
subspace on a bounded training sample, and store each vector as its M
codebook indices. A query never decodes: it builds one M×256 lookup
table of ``q_sub · centroid`` dots (Asymmetric Distance Computation)
and scores a candidate by summing M table entries picked by its codes.

    sidecar:  ``ensure_pq_sidecar`` derives ``pqcodes_<snapshot>/`` from
              an existing float IVF index's committed BASE vectors —
              ``codebooks`` (subspace, code, centroid) + ``codes``
              (vec_id, list_id, codes array, rnrm) CLUSTER BY
              (list_id, vec_id), the float table's pruning layout. Same
              acceleration-structure contract as the int8 sidecar:
              snapshot-keyed (a fold never serves it stale; flatten/
              compaction retires it via ``reclaim_stale_sidecars``'
              prefix sweep), regenerated on the compaction cadence.
              Training sample is BOUNDED (first ``PQ_TRAIN_SAMPLE``
              stored rows — deterministic, no RNG) and the per-subspace
              k-means runs driver-side numpy with a fixed seed: the
              codebook is KB-sized state, exactly what belongs on the
              driver; ENCODING the corpus is distributed (one vectorized
              argmin per Arrow batch against the broadcast codebooks).
              ``rnrm`` = the RECONSTRUCTION's norm, hoisted at encode
              time so the probe's approximate cosine normalizes by the
              quantized geometry it actually scores.
    probe:    ``batch_vs_pq_index`` routes queries with the float
              index's own centroids, scans ONLY the probed lists' codes
              (the 16× win), scores ADC JVM-side — the per-query LUT is
              a flat literal column and the score is one
              ``aggregate(sequence(0, M-1))`` of ``element_at`` gathers,
              fully codegen, no Python on the corpus-sized path — keeps
              the top ``rescore_factor × top_k`` per query, resolves
              pending fold/tombstone deltas MERGE-ON-READ, and
              re-scores the survivors exactly from the float table.
              Stages 1.5/2 (delta attach, exact refine) are the SAME
              code as the int8 probe (``ann_int8.resolve_quantized_base``
              / ``attach_delta_live`` / ``exact_refine``), so every
              returned score is bit-identical to the float kernel's and
              the delta semantics cannot drift between the two sidecars.

Approximate by contract twice over (IVF routing × PQ candidate
ordering) → the registered query is rows-only with the family's floors
pinned in tests/test_ann_pq.py (measured overlap vs the float probe:
1.0 at sf0.001 AND sf0.01).

Reference anchor: none — north-star similarity-search scale path,
extending functions/ann_index.py (round 6) and ann_int8.py (round 10).
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgcp_spark.functions.ann_index import _assign, _batch, _load_centroids, ensure_ann_index
from pgcp_spark.functions.ann_int8 import (
    RESCORE_FACTOR,
    attach_delta_live,
    exact_refine,
    resolve_quantized_base,
)
from pgcp_spark.plans.materialize import materialize
from pgcp_spark.registry import register
from pgcp_spark.sources.lake import current_snapshot, read_current, write_snapshot

PQ_M = 16  # subspaces (64-dim corpus → 4 dims each)
PQ_K = 256  # codebook entries per subspace (codes fit a byte)
PQ_TRAIN_SAMPLE = 4096  # bounded, deterministic training slice
SIDECAR_PREFIX = "pqcodes_"
_VECTORS_CLUSTER = ["list_id", "vec_id"]


def _sidecar_dir(index_dir: str) -> str:
    snap = current_snapshot(os.path.join(index_dir, "vectors"))
    if snap is None:
        raise FileNotFoundError(f"no committed vectors in {index_dir}")
    return os.path.join(index_dir, f"{SIDECAR_PREFIX}{snap}")


def _kmeans(X: np.ndarray, k: int, seed: int, iters: int = 12) -> np.ndarray:
    """Driver-side k-means for one subspace codebook: deterministic
    (seeded init, fixed iteration count, numpy reduction order) — the
    whole point of training the KB-sized codebook on the driver instead
    of a distributed fit whose treeAggregate jitter the SemDeDup notes
    document."""
    k = int(min(k, len(X)))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for j in range(k):
            members = X[a == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def ensure_pq_sidecar(
    spark: SparkSession, index_dir: str, m: int = PQ_M, k: int = PQ_K
) -> str:
    """Derive (once per vectors snapshot) the PQ sidecar from the
    COMMITTED float vectors: train per-subspace codebooks on the bounded
    sample, encode the corpus distributed, persist codebooks + codes."""
    side = _sidecar_dir(index_dir)
    if current_snapshot(os.path.join(side, "codes")) is not None:
        return side
    vecs = read_current(spark, os.path.join(index_dir, "vectors"))
    sample = [
        np.asarray(r.embedding, dtype=np.float64)
        for r in vecs.select("embedding")
        .orderBy("vec_id")  # deterministic slice, not partition order
        .limit(PQ_TRAIN_SAMPLE)
        .collect()
    ]
    if not sample:
        for t, schema in (
            ("codebooks", "s int, c int, centroid array<double>"),
            ("codes", "vec_id long, list_id int, codes array<int>, rnrm double"),
        ):
            write_snapshot(
                spark.createDataFrame([], schema), os.path.join(side, t)
            )
        return side
    S = np.stack(sample)
    dim = S.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    books = [
        _kmeans(S[:, s * ds : (s + 1) * ds], k, seed=42 + s) for s in range(m)
    ]
    cb_rows = [
        (s, int(c), [float(x) for x in books[s][c]])
        for s in range(m)
        for c in range(len(books[s]))
    ]
    write_snapshot(
        spark.createDataFrame(cb_rows, "s int, c int, centroid array<double>"),
        os.path.join(side, "codebooks"),
    )
    b_books = spark.sparkContext.broadcast([b.copy() for b in books])

    def encode(batches):
        import pandas as pd

        local = b_books.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            codes = np.empty((len(M), m), dtype=np.int64)
            recon = np.empty_like(M)
            for s in range(m):
                sub = M[:, s * ds : (s + 1) * ds]
                C = local[s]
                d2 = (sub * sub).sum(1)[:, None] - 2 * (sub @ C.T) + (C * C).sum(1)[None, :]
                a = d2.argmin(axis=1)
                codes[:, s] = a
                recon[:, s * ds : (s + 1) * ds] = C[a]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "list_id": pdf["list_id"].to_numpy(),
                    "codes": list(codes),
                    "rnrm": np.sqrt((recon * recon).sum(axis=1)),
                }
            )

    encoded = vecs.select("vec_id", "list_id", "embedding").mapInPandas(
        encode, schema="vec_id long, list_id int, codes array<int>, rnrm double"
    )
    write_snapshot(
        encoded,
        os.path.join(side, "codes"),
        cluster_by=_VECTORS_CLUSTER,
        cluster_files=spark.sparkContext.defaultParallelism,
    )
    return side


def batch_vs_pq_index(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    nprobe: int = 4,
    top_k: int = 3,
    rescore_factor: int = RESCORE_FACTOR,
) -> DataFrame:
    """Two-stage PQ probe (module docstring): ADC candidate scan over the
    codes sidecar → exact float refine. Returns (vec_id, neighbor_id,
    rank, cos_sim) with the float kernel's exact score shapes."""
    centroids = _load_centroids(spark, index_dir)
    if centroids.size == 0:
        return spark.createDataFrame(
            [], "vec_id long, neighbor_id long, rank long, cos_sim double"
        )
    side = ensure_pq_sidecar(spark, index_dir)
    books = {
        (r.s, r.c): np.asarray(r.centroid, dtype=np.float64)
        for r in read_current(spark, os.path.join(side, "codebooks")).collect()
    }
    m = 1 + max((s for s, _ in books), default=0)
    probes = materialize(_assign(batch, centroids, nprobe))

    # ONE probe collect feeds everything driver-side below: the probed
    # list set, the (query, list) routing pairs, and the unique query
    # vectors the LUTs derive from (guide §1.2 — the old code ran a
    # separate distinct().collect() job for the list set and rebuilt the
    # same 4096-entry LUT once per (query, list) row, nprobe× per query)
    q_rows = probes.select("vec_id", "embedding", "list_id").collect()
    if not q_rows or not books:
        return spark.createDataFrame(
            [], "vec_id long, neighbor_id long, rank long, cos_sim double"
        )
    probed_lists = sorted({r.list_id for r in q_rows})
    kk = 1 + max(c for _, c in books)
    dim = len(q_rows[0].embedding)
    ds = dim // m
    # dense (m, kk, ds) codebook tensor; absent codes stay zero-dot
    B = np.zeros((m, kk, ds))
    for (s, c), cent in books.items():
        B[s, c] = cent
    # per-query flat LUT (m × k entries of q_sub · centroid), built ONCE
    # per unique query in one vectorized einsum across all queries —
    # KB-sized driver state, broadcast-joined; the corpus-side ADC
    # gather below is a pure JVM expression. Splitting routing pairs
    # from LUT payload keeps the broadcast at |queries| LUT rows instead
    # of |queries|·nprobe (4× fewer bytes both driver- and JVM-side).
    uniq: dict[int, object] = {}
    pairs = []
    for r in q_rows:
        pairs.append((int(r.vec_id), int(r.list_id)))
        uniq.setdefault(int(r.vec_id), r.embedding)
    q_ids = list(uniq)
    Q = np.asarray([uniq[q] for q in q_ids], dtype=np.float64)
    luts = np.einsum("skd,nsd->nsk", B, Q.reshape(len(q_ids), m, ds))
    qnrms = np.sqrt((Q * Q).sum(axis=1))
    qlut = spark.createDataFrame(
        list(
            zip(
                q_ids,
                luts.reshape(len(q_ids), m * kk).tolist(),
                qnrms.tolist(),
            )
        ),
        "q_id long, lut array<double>, qnrm double",
    )
    qpairs = spark.createDataFrame(pairs, "q_id long, list_id int")
    stored = read_current(spark, os.path.join(side, "codes")).filter(
        F.col("list_id").isin(probed_lists)
    )
    stored, delta_live = resolve_quantized_base(spark, index_dir, stored, probed_lists)

    # ADC: sum of m LUT gathers, indexed by the row's codes — one
    # codegen'd aggregate over sequence(0, m-1), no Python per row
    adc = F.expr(
        f"aggregate(sequence(0, {m - 1}), cast(0.0 as double), "
        f"(acc, s) -> acc + element_at(lut, s * {kk} + element_at(codes, s + 1) + 1))"
    )
    approx = (
        F.broadcast(qpairs)
        .join(
            stored,
            (qpairs.list_id == stored.list_id) & (F.col("q_id") != F.col("vec_id")),
        )
        .join(F.broadcast(qlut), "q_id")
        .select(
            "q_id",
            "vec_id",
            (adc / (F.col("qnrm") * F.col("rnrm") + F.lit(1e-12))).alias("acos"),
        )
        .dropDuplicates(["q_id", "vec_id"])  # a neighbor in 2 probed lists
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("acos"), "vec_id")
    ranked = (
        approx.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= top_k * rescore_factor)
        .select("q_id", F.col("vec_id").alias("neighbor_id"))
    )
    ranked = attach_delta_live(ranked, qpairs, delta_live)
    cand = materialize(ranked)
    return exact_refine(spark, index_dir, probes, cand, probed_lists, top_k)


@register(
    "sim_batch_vs_pq_ann_index",
    # NO oracle by design (IVF routing × PQ candidate ordering are both
    # approximate); correctness = the overlap floors + the returned-
    # scores-are-exact-float-cosines pin in tests/test_ann_pq.py
    doc=(
        "two-stage product-quantized ANN: 16-byte PQ codes candidate scan "
        "(ADC lookup-table scoring, JVM-side) + exact float re-scoring of the "
        "survivors — rows-only with overlap floors vs the float IVF probe; "
        "size ladder float→int8→PQ parquet-measured in SCALE.md"
    ),
)
def sim_batch_vs_pq_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN family's demo split (batch = vec_id % 10, corpus = the
    rest) served through the PQ two-stage probe: candidate generation
    reads ONLY the codes sidecar of the probed lists (13.2× fewer bytes
    than float, parquet-measured), ADC-ranks JVM-side, and re-scores the survivors exactly
    from the float table — same demo shape as the int8 tier, one rung
    further down the size ladder."""
    index_dir = ensure_ann_index(spark, sf_dir)
    return batch_vs_pq_index(spark, _batch(spark, sf_dir), index_dir)
