"""Filtered vector search: top-k cosine neighbors under a metadata
predicate — the "WHERE clause + ANN" shape every production vector
system exposes (pgvector's filtered scan, the FAISS IDSelector /
Milvus- and Qdrant-style payload filter), absent from the repo until
round 10.

Two tiers, the family's standard recipe:

    exact:   ``filtered_topk`` — queries × corpus restricted to rows
             satisfying the predicate (here: SAME ``label`` as the
             query — the per-query filter case, strictly harder than a
             global WHERE), scored JVM-side with the shared
             ``_pair_dot``/``with_norm`` expression shapes so scores
             are bit-identical to every other cosine scorer in the
             repo. The registered query is HASH-CHECKED against a
             DuckDB oracle. Plan shape: the strided query sample
             broadcasts (AQE — no forced hint), the corpus side stays
             partition-parallel, and the per-query top-k window gets
             its exchange bounded by Spark's rank-filter pushdown
             (WindowGroupLimit) — but the pair count is still
             Σ_label (q_l × n_l), so this tier is the small-corpus /
             oracle baseline, exactly like ``sim_cosine_bruteforce_topk``.
    probe:   ``filtered_batch_vs_ann_index`` — the IVF probe with the
             predicate applied to the candidate side BEFORE scoring
             ("pre-filter then search"): stored rows of the probed
             lists join a pruned (vec_id, label) metadata lookup, keep
             only same-label candidates, then score/rank exactly as
             ``batch_vs_ann_index``. Filtering shrinks each probed
             list's eligible population ~|labels|-fold, so the default
             ``nprobe`` DOUBLES vs the unfiltered probe (the standard
             filtered-search compensation); recall floors vs the exact
             tier are measured and pinned in tests/test_ann_filtered.py.
             At 100 TB the right physical design carries the payload
             column IN the vectors table (filter evaluated inside the
             pruned scan, no join); the shared demo index's schema is
             frozen, so this implementation demonstrates the semantics
             with the pruned metadata join and documents the layout
             note here instead of silently rebuilding a second index.

Reference anchor: none — north-star similarity-search surface,
extending functions/ann_index.py (round 6) and functions/similarity.py.
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgcp_spark.functions.ann_index import (
    _assign,
    _load_centroids,
    ensure_ann_index,
    stored_vectors,
)
from pgcp_spark.indexes import loop
from pgcp_spark.sources.lake import read_current, write_snapshot
from pgcp_spark.functions.similarity import (
    EMB_VALID_SQL,
    IVF_LISTS,
    QUERY_STRIDE,
    TOP_K,
    _pair_dot,
    valid_embedding,
    with_norm,
)
from pgcp_spark.plans.materialize import materialize
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table

FILTER_NPROBE = 8  # 2× the unfiltered default: the label filter thins
# each probed list ~|labels|-fold, so recall needs more lists (the
# standard filtered-ANN compensation; floor measured in tests)

_RESULT_SCHEMA = "vec_id long, neighbor_id long, rank long, cos_sim double"


def filtered_topk(
    queries: DataFrame, corpus: DataFrame, top_k: int = TOP_K
) -> DataFrame:
    """EXACT same-label top-k: for each query row (vec_id, embedding,
    label) the ``top_k`` highest-cosine corpus rows sharing its label
    (self excluded), ties broken by neighbor_id — the shared tie-break
    every scorer in the repo uses. Both frames are scored with the
    module-shared norm/dot expression trees, so results are
    bit-comparable with the probe tier's refine stage."""
    q = with_norm(queries.select("vec_id", "embedding", "label")).alias("q")
    c = with_norm(corpus.select("vec_id", "embedding", "label")).alias("c")
    cos = F.round(
        _pair_dot("q", "c") / (F.col("q.nrm") * F.col("c.nrm")), 6
    )
    scored = q.join(
        c,
        (F.col("q.label") == F.col("c.label"))
        & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("vec_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        cos.alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "vec_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cos_sim",
        )
        .orderBy("vec_id", "rank")
    )


def filtered_batch_vs_ann_index(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    labels: DataFrame,
    nprobe: int = FILTER_NPROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """Filtered IVF probe (module docstring): route each batch row
    (vec_id, embedding, label) to its ``nprobe`` nearest lists, prune
    the stored scan to those lists, attach labels to the candidates via
    the pruned (vec_id, label) lookup join, keep SAME-LABEL candidates
    only, then score/rank with ``batch_vs_ann_index``'s exact
    expression shapes. Approximate by contract (nprobe of k lists) —
    the returned neighbors are a subset of the exact tier's candidate
    universe with recall floors pinned; returned SCORES are exact
    cosines of the stored vectors, never approximations."""
    centroids = _load_centroids(spark, index_dir)
    if centroids.size == 0:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    probes = materialize(
        _assign(batch.select("vec_id", "embedding"), centroids, nprobe)
    )
    probed_lists = [
        r.list_id for r in probes.select("list_id").distinct().collect()
    ]
    stored = (
        stored_vectors(spark, index_dir)
        .filter(F.col("list_id").isin(probed_lists))
        .join(labels.select("vec_id", "label"), on="vec_id")
    )
    q = with_norm(probes).join(
        batch.select("vec_id", "label"), on="vec_id"
    ).alias("q")
    c = stored.alias("c")
    cos = F.round(
        _pair_dot("q", "c") / (F.col("q.nrm") * F.col("c.nrm")), 6
    )
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.list_id") == F.col("c.list_id"))
            & (F.col("q.label") == F.col("c.label"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("vec_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .dropDuplicates(["vec_id", "neighbor_id"])  # a neighbor in 2 probed lists
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "vec_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cos_sim",
        )
        .orderBy("vec_id", "rank")
    )


def _labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, label) restricted to index-valid vectors with
    a non-null label — the filtered family's shared input contract."""
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding", "label")
        .filter(valid_embedding() & F.col("label").isNotNull())
    )


@register(
    "sim_filtered_cosine_topk",
    oracle=f"""
WITH valid AS (
  SELECT vec_id, embedding, label FROM embeddings
  WHERE {EMB_VALID_SQL} AND label IS NOT NULL
),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cos_sim
  FROM valid a JOIN valid b
    ON a.vec_id % {QUERY_STRIDE} = 0 AND a.label = b.label AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT vec_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim
FROM ranked WHERE rank <= {TOP_K}
ORDER BY vec_id, rank
""",
)
def sim_filtered_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact filtered search, hash-checked: for every strided query
    vector, the top-3 most-similar vectors SHARING ITS LABEL — the
    per-query-predicate case of the WHERE-clause-plus-ANN shape
    (module docstring). The exactness oracle for the probe tier."""
    e = _labeled(spark, sf_dir)
    return filtered_topk(e.filter(F.col("vec_id") % QUERY_STRIDE == 0), e)


@register(
    "sim_filtered_batch_vs_ann_index",
    # NO oracle by design (nprobe of k lists is approximate); correctness
    # = the same-label invariant, the all-lists == exact bit-identity pin,
    # and the measured recall floor — all in tests/test_ann_filtered.py
    doc="filtered ANN: IVF probe with a same-label predicate applied to the candidate side before scoring (pre-filter-then-search; nprobe doubled to compensate) — rows-only with recall floors vs the exact filtered tier",
)
def sim_filtered_batch_vs_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN family's demo split (batch = vec_id % 10, corpus = the
    rest) served through the FILTERED probe: each batch vector's top-3
    same-label neighbors among the indexed split, candidates restricted
    to the probed lists AND the query's label before any scoring."""
    index_dir = ensure_ann_index(spark, sf_dir)
    e = _labeled(spark, sf_dir)
    # the metadata lookup deliberately SKIPS the embedding-validity
    # filter: validity gates what the index CONTAINS (the vec_id join
    # restricts to indexed rows anyway), and keeping the predicate off
    # this frame keeps the embedding column out of the lookup scan —
    # (vec_id, label) is all that crosses (ReadSchema-checked: without
    # this the metadata side re-reads the full vector payload)
    labels = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .filter(F.col("vec_id").isNotNull() & F.col("label").isNotNull())
    )
    return filtered_batch_vs_ann_index(
        spark, e.filter(F.col("vec_id") % 10 == 0), index_dir, labels
    )


# ---------------------------------------------------------------------------
# Label-partitioned IVF: the filter-in-index layout the lookup-join probe's
# docstring names as the right 100 TB design — payload column IN the index.
# ---------------------------------------------------------------------------

LP_INDEX_ROOT = os.environ.get(
    "SPARK_GRAFT_ANN_LP_INDEX_ROOT", "/tmp/pgcp_ann_lp_index"
)
_LP_SUBTABLES = ["centroids_p", "vectors_p"]
_LP_CLUSTER = ["label", "list_id", "vec_id"]

# Partitioning a quantizer per payload value only makes sense for a
# COARSE column (the vector-DB partition-key contract); past this the
# driver-side fit loop and the per-label list bookkeeping are the wrong
# tool and the lookup-join tier is the answer. Hard guard, not a cap:
# silently indexing the first N labels would serve WRONG (empty)
# results for the rest.
LP_MAX_LABELS = 1024


def lp_index_dir_for(sf_dir: str) -> str:
    """Content-version-keyed dir, the shared harness discipline
    (``ann_index_dir_for``): a regenerated lake fingerprints elsewhere,
    so a stale partitioned index can never serve a changed corpus."""
    return loop.content_version_dir(
        LP_INDEX_ROOT, sf_dir, "embeddings.parquet", salt="lp-format:v1:cosine"
    )


def build_label_partitioned_index(
    spark: SparkSession, corpus: DataFrame, index_dir: str
) -> None:
    """Fit ONE coarse quantizer PER LABEL (same cosine geometry as the
    global builder, ``ann_index.build_ann_index_from``) and persist:

      centroids_p: (label, list_id, centroid)        — |labels| × k rows
      vectors_p:   (vec_id, label, list_id, embedding, nrm)
                   CLUSTER BY (label, list_id, vec_id)

    The composite cluster key is the point: a filtered probe prunes on
    BOTH the label and the probed lists with plain pushed predicates —
    no metadata join, and every scanned list is label-PURE, so routing
    quality inside the filter is what a dedicated per-label index gives
    (the A/B vs the lookup-join probe is in SCALE.md r10). The label
    loop is driver-side over the PAYLOAD'S cardinality (bounded, 10
    here) — each iteration is one distributed KMeans fit, not a data
    motion."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # limit(cap+1) guards the collect the same way the brute-force
    # corpus guard does: the scan stops at the boundary and an overflow
    # row proves the cardinality exceeds the contract without a count()
    labels = [
        r.label
        for r in corpus.select("label")
        .distinct()
        .orderBy("label")
        .limit(LP_MAX_LABELS + 1)
        .collect()
    ]
    if len(labels) > LP_MAX_LABELS:
        raise ValueError(
            f"label cardinality exceeds the partition-key contract "
            f"({LP_MAX_LABELS}): a per-value quantizer loop is the wrong "
            f"tool for a fine-grained column — use the lookup-join tier "
            f"(filtered_batch_vs_ann_index)"
        )
    def _fit_label(lab):
        sub = corpus.filter(F.col("label") == lab).select("vec_id", "embedding")
        nd = sub.agg(
            F.countDistinct(F.xxhash64("embedding")).alias("nd")
        ).collect()[0]["nd"]
        if nd == 0:
            return lab, None, None
        if nd < 2:
            return (
                lab,
                sub.withColumn("list_id", F.lit(0)),
                np.array([sub.select("embedding").head()[0]], dtype=np.float64),
            )
        vecs = sub.withColumn(
            "features",
            array_to_vector(F.col("embedding").cast("array<double>")),
        )
        model = KMeans(
            k=int(min(IVF_LISTS, nd)),
            seed=42,
            maxIter=10,
            distanceMeasure="cosine",
            featuresCol="features",
            predictionCol="list_id",
        ).fit(vecs)
        return (
            lab,
            model.transform(vecs).select("vec_id", "embedding", "list_id"),
            np.stack(model.clusterCenters()),
        )

    # The fits are independent distributed jobs — submit them from a
    # driver thread pool so the cluster pipelines them instead of idling
    # between per-label jobs (Spark job submission is thread-safe; each
    # fit is seeded, so concurrency cannot change results). Results
    # assemble in label order, keeping the persisted layout
    # bit-deterministic regardless of completion order.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, max(1, len(labels)))) as ex:
        fitted = list(ex.map(_fit_label, labels))
    assigned_parts = []
    cent_rows = []
    for lab, assigned, cents in fitted:  # labels order — ex.map preserves it
        if assigned is None:
            continue
        assigned_parts.append(assigned.withColumn("label", F.lit(lab)))
        cent_rows.extend(
            (int(lab), int(i), [float(x) for x in c]) for i, c in enumerate(cents)
        )
    if not assigned_parts:
        write_snapshot(
            spark.createDataFrame(
                [], "label int, list_id int, centroid array<double>"
            ),
            os.path.join(index_dir, "centroids_p"),
        )
        write_snapshot(
            spark.createDataFrame(
                [],
                "vec_id long, label int, list_id int,"
                " embedding array<float>, nrm double",
            ),
            os.path.join(index_dir, "vectors_p"),
        )
        return
    allv = assigned_parts[0]
    for p in assigned_parts[1:]:
        allv = allv.unionByName(p)
    write_snapshot(
        spark.createDataFrame(
            cent_rows, "label int, list_id int, centroid array<double>"
        ),
        os.path.join(index_dir, "centroids_p"),
        cluster_files=1,  # O(|labels|·k) rows: one footer read
    )
    write_snapshot(
        with_norm(allv).select("vec_id", "label", "list_id", "embedding", "nrm"),
        os.path.join(index_dir, "vectors_p"),
        cluster_by=_LP_CLUSTER,
        cluster_files=spark.sparkContext.defaultParallelism,
    )


def ensure_lp_index(spark: SparkSession, sf_dir: str) -> str:
    """Build iff this corpus version has no partitioned index yet
    (indexes the ANN family's demo split, batch rows excluded)."""
    index_dir = lp_index_dir_for(sf_dir)
    return loop.ensure_built(
        index_dir,
        _LP_SUBTABLES,
        lambda: build_label_partitioned_index(
            spark,
            _labeled(spark, sf_dir).filter(F.col("vec_id") % 10 != 0),
            index_dir,
        ),
    )


def label_partitioned_topk(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    nprobe: int = FILTER_NPROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """Filtered probe against the label-partitioned index: each batch
    row routes to its OWN label's quantizer (driver-broadcast — the
    centroid table is |labels| × k rows), and the stored scan prunes on
    the literal (label, probed-lists) disjunction — both predicates
    PUSHED into the clustered files, no metadata join anywhere in the
    plan (plan-pinned in tests). Scoring/tie-breaks are the family's
    shared exact shapes."""
    cent = read_current(spark, os.path.join(index_dir, "centroids_p")).collect()
    if not cent:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    by_label: dict[int, list] = {}
    for r in cent:
        by_label.setdefault(r.label, []).append((r.list_id, r.centroid))
    cent_map = {
        lab: (
            np.array([lid for lid, _ in rows], dtype=np.int64),
            np.array([c for _, c in rows], dtype=np.float64),
        )
        for lab, rows in by_label.items()
    }
    b_cent = spark.sparkContext.broadcast(cent_map)

    def probe(batches):
        import pandas as pd

        cmap = b_cent.value
        for batch_pdf in batches:
            out = []
            # one vectorized matmul per (Arrow batch × label) group — the
            # same kernel shape as ann_index._assign, label-local
            for lab, grp in batch_pdf.groupby("label"):
                entry = cmap.get(lab)
                if entry is None:
                    continue
                lids, mat = entry
                Q = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
                qn = np.sqrt((Q * Q).sum(axis=1))
                cn = np.linalg.norm(mat, axis=1)
                sims = (Q @ mat.T) / (qn[:, None] * cn[None, :] + 1e-12)
                eff = min(nprobe, len(lids))
                top = np.argpartition(-sims, eff - 1, axis=1)[:, :eff]
                vids = grp["vec_id"].to_numpy()
                embs = grp["embedding"].to_numpy()
                for i in range(len(vids)):
                    out.extend(
                        (int(vids[i]), embs[i], int(lab), int(lids[j]))
                        for j in top[i]
                    )
            yield pd.DataFrame(
                out, columns=["vec_id", "embedding", "label", "list_id"]
            )

    probes = materialize(
        batch.select("vec_id", "embedding", "label").mapInPandas(
            probe,
            schema="vec_id long, embedding array<float>, label int, list_id int",
        )
    )
    pairs = probes.select("label", "list_id").distinct().collect()
    if not pairs:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    by_lab: dict[int, list[int]] = {}
    for r in pairs:
        by_lab.setdefault(r.label, []).append(r.list_id)
    pred = None
    for lab, lists in sorted(by_lab.items()):
        clause = (F.col("label") == lab) & F.col("list_id").isin(lists)
        pred = clause if pred is None else (pred | clause)
    stored = read_current(spark, os.path.join(index_dir, "vectors_p")).filter(pred)
    q = with_norm(probes).alias("q")
    c = stored.alias("c")
    cos = F.round(_pair_dot("q", "c") / (F.col("q.nrm") * F.col("c.nrm")), 6)
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.label") == F.col("c.label"))
            & (F.col("q.list_id") == F.col("c.list_id"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("vec_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "vec_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cos_sim",
        )
        .orderBy("vec_id", "rank")
    )


@register(
    "sim_label_partitioned_ann_topk",
    # NO oracle by design (per-label IVF routing is approximate);
    # correctness = same-label invariant, all-lists == exact-tier
    # bit-identity, and the measured recall floor — tests/test_ann_filtered.py
    doc="filtered ANN via a LABEL-PARTITIONED IVF index (filter-in-index: per-label quantizers, vectors CLUSTER BY (label, list_id), both predicates pushed into the scan, no metadata join) — rows-only with floors vs the exact filtered tier",
)
def sim_label_partitioned_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The demo split served through the partitioned layout: top-3
    same-label neighbors per batch vector, candidates read ONLY from the
    query's label's probed lists — label-pure routing, so recall at
    equal nprobe beats the global-quantizer lookup-join probe (measured
    A/B in SCALE.md r10)."""
    index_dir = ensure_lp_index(spark, sf_dir)
    e = _labeled(spark, sf_dir)
    return label_partitioned_topk(
        spark, e.filter(F.col("vec_id") % 10 == 0), index_dir
    )


# ---------------------------------------------------------------------------
# Range-predicate filtered search (round 11): the label tiers above cover
# payload EQUALITY; production filters are just as often RANGES
# ("ingested in the last week", "score between a and b"). Same recipe:
# an exact hash-checked tier and a pre-filter-then-search IVF probe over
# the lookup-join layout, with the pre-vs-post-filtering A/B measured
# (SCALE.md r11). The payload is a deterministic Knuth-hash
# pseudo-timestamp derived from vec_id — reproducible in ANSI SQL, and
# deliberately NOT monotone in vec_id so the metadata lookup join is a
# genuine join, not a predicate the index column already answers.
# ---------------------------------------------------------------------------

TS_MODULUS = 100_000
TS_LO, TS_HI = 20_000, 80_000  # ~60% selectivity: selective enough to
# change every top-k list, wide enough that nprobe recall is meaningful
_TS_SQL = f"(vec_id * 2654435761) % {TS_MODULUS}"


def _ts_payload(df: DataFrame) -> DataFrame:
    """(vec_id, ts): the synthetic ingestion-time payload. In production
    this is a metadata table column; the Knuth multiplicative hash stands
    in deterministically on the synthetic lake."""
    return df.select(
        "vec_id",
        ((F.col("vec_id") * F.lit(2654435761)) % TS_MODULUS).alias("ts"),
    )


def range_filtered_topk(
    queries: DataFrame,
    corpus: DataFrame,
    payload: DataFrame,
    lo: int,
    hi: int,
    top_k: int = TOP_K,
) -> DataFrame:
    """EXACT range-filtered top-k: each query's ``top_k`` highest-cosine
    corpus rows whose payload ``ts`` lies in [lo, hi] (self excluded).
    The predicate lands on the corpus side BEFORE scoring — the filtered
    family's pre-filter contract — via a (vec_id, ts) join kept to two
    columns so only ids and the payload cross the exchange."""
    eligible = corpus.join(
        payload.filter(F.col("ts").between(lo, hi)).select("vec_id"), on="vec_id"
    )
    q = with_norm(queries.select("vec_id", "embedding")).alias("q")
    c = with_norm(eligible.select("vec_id", "embedding")).alias("c")
    cos = F.round(_pair_dot("q", "c") / (F.col("q.nrm") * F.col("c.nrm")), 6)
    scored = q.join(c, F.col("q.vec_id") != F.col("c.vec_id")).select(
        F.col("q.vec_id").alias("vec_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        cos.alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "vec_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cos_sim",
        )
        .orderBy("vec_id", "rank")
    )


def range_filtered_batch_vs_ann_index(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    payload: DataFrame,
    lo: int,
    hi: int,
    nprobe: int = FILTER_NPROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """Range-filtered IVF probe over the lookup-join layout: route each
    batch row to its ``nprobe`` nearest lists, prune the stored scan to
    those lists, attach the payload to the candidates via the pruned
    (vec_id, ts) lookup, keep candidates with ts ∈ [lo, hi] BEFORE any
    scoring, then score/rank with the family's exact expression shapes.
    Approximate by contract (nprobe of k lists); returned scores are
    exact cosines. ``nprobe`` defaults doubled exactly like the label
    probe — a ~60% range thins every list ~1.7×, and the same
    compensation argument applies.

    Layout note (the 100 TB answer for ranges): the label tier's
    filter-in-index trick — one quantizer per value — cannot cover a
    range predicate. What recovers in-scan pruning instead is the
    existing z-order layout (``sources/zorder.py``) on (ts, list_id):
    Morton order keeps both columns' footer min/max narrow, so the
    pushed range AND the pushed list IN prune files together in ONE
    scan with no metadata join. That is a table-layout decision at
    index-build time; this function demonstrates the lookup-join form
    that works on the frozen shared index."""
    centroids = _load_centroids(spark, index_dir)
    if centroids.size == 0:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    probes = materialize(
        _assign(batch.select("vec_id", "embedding"), centroids, nprobe)
    )
    probed_lists = [
        r.list_id for r in probes.select("list_id").distinct().collect()
    ]
    eligible = payload.filter(F.col("ts").between(lo, hi)).select("vec_id")
    stored = (
        stored_vectors(spark, index_dir)
        .filter(F.col("list_id").isin(probed_lists))
        .join(eligible, on="vec_id")  # pre-filter: BEFORE scoring
    )
    q = with_norm(probes).alias("q")
    c = stored.alias("c")
    cos = F.round(_pair_dot("q", "c") / (F.col("q.nrm") * F.col("c.nrm")), 6)
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.list_id") == F.col("c.list_id"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("vec_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "vec_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cos_sim",
        )
        .orderBy("vec_id", "rank")
    )


@register(
    "sim_range_filtered_cosine_topk",
    oracle=f"""
WITH valid AS (
  SELECT vec_id, embedding FROM embeddings WHERE {EMB_VALID_SQL}
),
eligible AS (
  SELECT vec_id, embedding FROM valid
  WHERE {_TS_SQL} BETWEEN {TS_LO} AND {TS_HI}
),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cos_sim
  FROM valid a JOIN eligible b
    ON a.vec_id % {QUERY_STRIDE} = 0 AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT vec_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim
FROM ranked WHERE rank <= {TOP_K}
ORDER BY vec_id, rank
""",
)
def sim_range_filtered_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact range-filtered search, hash-checked: for every strided
    query vector, the top-3 most-similar vectors whose pseudo-timestamp
    falls in the [{lo}, {hi}] window — the 'ts BETWEEN' case of
    WHERE-plus-ANN. The exactness oracle for the range probe tier."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(valid_embedding())
    )
    return range_filtered_topk(
        e.filter(F.col("vec_id") % QUERY_STRIDE == 0), e, _ts_payload(e), TS_LO, TS_HI
    )


@register(
    "sim_range_filtered_batch_vs_ann_index",
    # NO oracle by design (nprobe of k lists); correctness = the
    # in-window invariant, all-lists == exact bit-identity, recall floor
    # vs the exact range tier, and probe-beats-post-filtering — all
    # pinned in tests/test_ann_filtered.py
    doc=(
        "range-filtered ANN: IVF probe with a ts-BETWEEN payload predicate "
        "applied via the pruned lookup join before scoring — rows-only with "
        "recall floors vs the exact range tier and a measured pre-vs-post-"
        "filtering A/B"
    ),
)
def sim_range_filtered_batch_vs_ann_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ANN family's demo split served through the RANGE-filtered
    probe: each batch vector's top-3 neighbors among indexed rows whose
    pseudo-timestamp is in [TS_LO, TS_HI], the predicate applied to the
    candidate side before scoring."""
    index_dir = ensure_ann_index(spark, sf_dir)
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(valid_embedding())
    )
    payload = _ts_payload(
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id")
        .filter(F.col("vec_id").isNotNull())
    )
    return range_filtered_batch_vs_ann_index(
        spark, e.filter(F.col("vec_id") % 10 == 0), index_dir, payload, TS_LO, TS_HI
    )


# ---------------------------------------------------------------------------
# Z-ordered range tier (round 11): the layout note above, as code. The
# filter-in-index trick (one quantizer per value) cannot cover a RANGE
# predicate; what recovers in-scan pruning for ranges is the existing
# z-order layout — lay the stored vectors in Morton order of
# (ts, list_id), and a probe's pushed range AND pushed list IN prune
# FILES together in ONE scan, no metadata join. Candidates are identical
# to the lookup-join tier probe-for-probe (same quantizer, same window),
# so results are BIT-IDENTICAL — the layout changes what the scan READS,
# never what it returns (pinned, with the file-skipping measured).
# ---------------------------------------------------------------------------

ZR_INDEX_ROOT = os.environ.get(
    "SPARK_GRAFT_ANN_ZR_INDEX_ROOT", "/tmp/pgcp_ann_zr_index"
)
ZR_FILES = 16  # enough files that footer min/max skipping is measurable
# at every test sf; at 100 TB this is the ordinary file-count knob


def zr_index_dir_for(sf_dir: str) -> str:
    return loop.content_version_dir(
        ZR_INDEX_ROOT, sf_dir, "embeddings.parquet", salt="zr-format:v1:cosine"
    )


def build_zorder_range_index(
    spark: SparkSession, base_index_dir: str, index_dir: str
) -> None:
    """Re-lay the shared demo index's stored vectors (SAME quantizer,
    same rows — routing quality is deliberately unchanged) with the
    payload column IN the table, z-ordered on (ts, list_id)."""
    from pgcp_spark.functions.ann_index import stored_vectors as _sv

    v = _sv(spark, base_index_dir).withColumn(
        "ts", (F.col("vec_id") * F.lit(2654435761)) % TS_MODULUS
    )
    write_snapshot(
        v.select("vec_id", "ts", "list_id", "embedding", "nrm"),
        os.path.join(index_dir, "vectors_z"),
        zorder_by=["ts", "list_id"],
        cluster_files=ZR_FILES,
    )


def ensure_zr_index(spark: SparkSession, sf_dir: str) -> str:
    base = ensure_ann_index(spark, sf_dir)
    index_dir = zr_index_dir_for(sf_dir)
    return loop.ensure_built(
        index_dir,
        ["vectors_z"],
        lambda: build_zorder_range_index(spark, base, index_dir),
    )


def range_filtered_zorder_topk(
    spark: SparkSession,
    batch: DataFrame,
    base_index_dir: str,
    zr_index_dir: str,
    lo: int,
    hi: int,
    nprobe: int = FILTER_NPROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """The range probe over the z-ordered layout: route with the SHARED
    quantizer, then ONE scan of ``vectors_z`` with both predicates
    pushed (``ts BETWEEN`` + ``list_id IN``) — no payload lookup join.
    Bit-identical to ``range_filtered_batch_vs_ann_index`` at equal
    nprobe (same candidate universe); the layout buys file skipping,
    not different answers."""
    centroids = _load_centroids(spark, base_index_dir)
    if centroids.size == 0:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    probes = materialize(
        _assign(batch.select("vec_id", "embedding"), centroids, nprobe)
    )
    probed_lists = [
        r.list_id for r in probes.select("list_id").distinct().collect()
    ]
    stored = read_current(spark, os.path.join(zr_index_dir, "vectors_z")).filter(
        F.col("ts").between(lo, hi) & F.col("list_id").isin(probed_lists)
    )
    q = with_norm(probes).alias("q")
    c = stored.alias("c")
    cos = F.round(_pair_dot("q", "c") / (F.col("q.nrm") * F.col("c.nrm")), 6)
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.list_id") == F.col("c.list_id"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("vec_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "vec_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cos_sim",
        )
        .orderBy("vec_id", "rank")
    )


@register(
    "sim_range_filtered_zorder_ann_topk",
    # NO oracle by design (nprobe routing); correctness = BIT-IDENTITY
    # with the lookup-join range probe at equal nprobe (which carries the
    # all-lists == exact pin), the single-scan/no-join plan pin, and the
    # measured file skipping — tests/test_ann_filtered.py
    doc=(
        "range-filtered ANN over the z-ordered (ts, list_id) layout: both "
        "predicates pushed into ONE vectors scan, no payload join — "
        "bit-identical to the lookup-join range probe, with footer min/max "
        "file skipping measured vs the list-clustered layout"
    ),
)
def sim_range_filtered_zorder_ann_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ANN demo split through the range probe's z-ordered layout —
    the tier the lookup-join probe's docstring names as the 100 TB
    answer for range predicates, as a registered query."""
    base = ensure_ann_index(spark, sf_dir)
    zr = ensure_zr_index(spark, sf_dir)
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(valid_embedding())
    )
    return range_filtered_zorder_topk(
        spark, e.filter(F.col("vec_id") % 10 == 0), base, zr, TS_LO, TS_HI
    )


# ---------------------------------------------------------------------------
# Conjunctive tier (round 12): label AND range in ONE probe. The label
# tiers and the range tiers each cover one predicate family; a real
# serving query carries both ("same label AND ts BETWEEN …"). Three
# forms, the family's standard ladder:
#
#   exact:     label_range_filtered_topk — both predicates on the corpus
#              side before scoring; HASH-CHECKED oracle.
#   composed:  label_range_filtered_batch_vs_ann_index — the IVF probe
#              with TWO pruned lookup joins (label + window payload),
#              pre-filter before scoring. Works on the frozen shared
#              index; the bit-identity reference for the layout tier.
#   layout:    label_range_filtered_zorder_topk — ONE scan of a
#              (label, ts, list_id) z-ordered vectors table with ALL
#              THREE predicates pushed (label IN batch-labels, ts
#              BETWEEN, list_id IN probed) — no metadata joins at all.
#              The 2-D (ts, list_id) tier generalizes: Morton order over
#              three dims keeps every column's footer min/max narrow, so
#              a single-label windowed probe reads a FRACTION of the
#              files (measured vs the 2-key layout in tests). Candidates
#              are identical to the composed form probe-for-probe (same
#              quantizer, same window, same labels), so results are
#              BIT-IDENTICAL — layout changes what the scan reads, never
#              what it returns.
#
# nprobe: the conjunction thins each probed list by ~|labels| × the
# window selectivity (~17× here), the hardest filter in the family —
# CONJ_NPROBE = 12 of 16 lists (recall floor measured and pinned; at
# nprobe = all lists the probe is bit-identical to the exact tier, the
# usual exhaustive-setting pin).
# ---------------------------------------------------------------------------

CONJ_NPROBE = 12

ZLR_INDEX_ROOT = os.environ.get(
    "SPARK_GRAFT_ANN_ZLR_INDEX_ROOT", "/tmp/pgcp_ann_zlr_index"
)
ZLR_FILES = 16  # same file-count knob as the 2-key tier — the skipping
# comparison below is apples-to-apples


def zlr_index_dir_for(sf_dir: str) -> str:
    return loop.content_version_dir(
        ZLR_INDEX_ROOT, sf_dir, "embeddings.parquet", salt="zlr-format:v1:cosine"
    )


def label_range_filtered_topk(
    queries: DataFrame,
    corpus: DataFrame,
    payload: DataFrame,
    lo: int,
    hi: int,
    top_k: int = TOP_K,
) -> DataFrame:
    """EXACT conjunctive top-k: each query's ``top_k`` highest-cosine
    corpus rows that share its label AND whose payload ``ts`` lies in
    [lo, hi] (self excluded). Both predicates land on the corpus side
    BEFORE scoring; the window join stays (vec_id)-only so the exchange
    carries ids, not vectors."""
    eligible = corpus.join(
        payload.filter(F.col("ts").between(lo, hi)).select("vec_id"), on="vec_id"
    )
    return filtered_topk(queries, eligible, top_k=top_k)


def label_range_filtered_batch_vs_ann_index(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    labels: DataFrame,
    payload: DataFrame,
    lo: int,
    hi: int,
    nprobe: int = CONJ_NPROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """Conjunctive IVF probe, lookup-join form: route each batch row to
    its ``nprobe`` nearest lists, prune the stored scan to those lists,
    attach label and window eligibility via the two pruned metadata
    joins, keep same-label in-window candidates BEFORE scoring, then
    score/rank with the family's exact expression shapes."""
    centroids = _load_centroids(spark, index_dir)
    if centroids.size == 0:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    probes = materialize(
        _assign(batch.select("vec_id", "embedding"), centroids, nprobe)
    )
    probed_lists = [
        r.list_id for r in probes.select("list_id").distinct().collect()
    ]
    eligible = payload.filter(F.col("ts").between(lo, hi)).select("vec_id")
    stored = (
        stored_vectors(spark, index_dir)
        .filter(F.col("list_id").isin(probed_lists))
        .join(labels.select("vec_id", "label"), on="vec_id")
        .join(eligible, on="vec_id")  # both pre-filters BEFORE scoring
    )
    q = with_norm(probes).join(
        batch.select("vec_id", "label"), on="vec_id"
    ).alias("q")
    c = stored.alias("c")
    cos = F.round(_pair_dot("q", "c") / (F.col("q.nrm") * F.col("c.nrm")), 6)
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.list_id") == F.col("c.list_id"))
            & (F.col("q.label") == F.col("c.label"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("vec_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "vec_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cos_sim",
        )
        .orderBy("vec_id", "rank")
    )


def build_zorder_label_range_index(
    spark: SparkSession, base_index_dir: str, index_dir: str, sf_dir: str
) -> None:
    """Re-lay the shared demo index's stored vectors (SAME quantizer,
    same rows) with label AND payload IN the table, z-ordered on
    (label, ts, list_id) — the three-column generalization of the
    round-11 (ts, list_id) layout. Label is already a small integer, so
    it ranks directly; its leading interleave position gives the
    single-label probe the narrowest per-file ranges."""
    from pgcp_spark.functions.ann_index import stored_vectors as _sv

    labels = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .filter(F.col("vec_id").isNotNull() & F.col("label").isNotNull())
    )
    v = (
        _sv(spark, base_index_dir)
        .withColumn("ts", (F.col("vec_id") * F.lit(2654435761)) % TS_MODULUS)
        .join(labels, on="vec_id")
    )
    write_snapshot(
        v.select("vec_id", "label", "ts", "list_id", "embedding", "nrm"),
        os.path.join(index_dir, "vectors_zlr"),
        zorder_by=["label", "ts", "list_id"],
        cluster_files=ZLR_FILES,
    )


def ensure_zlr_index(spark: SparkSession, sf_dir: str) -> str:
    base = ensure_ann_index(spark, sf_dir)
    index_dir = zlr_index_dir_for(sf_dir)
    return loop.ensure_built(
        index_dir,
        ["vectors_zlr"],
        lambda: build_zorder_label_range_index(spark, base, index_dir, sf_dir),
    )


def label_range_filtered_zorder_topk(
    spark: SparkSession,
    batch: DataFrame,
    base_index_dir: str,
    zlr_index_dir: str,
    lo: int,
    hi: int,
    nprobe: int = CONJ_NPROBE,
    top_k: int = TOP_K,
) -> DataFrame:
    """The conjunctive probe over the 3-key z-ordered layout: route with
    the SHARED quantizer, then ONE scan of ``vectors_zlr`` with all
    three predicates pushed (``label IN`` the batch's labels, ``ts
    BETWEEN``, ``list_id IN`` the probed lists) — no metadata joins.
    Bit-identical to ``label_range_filtered_batch_vs_ann_index`` at
    equal nprobe (same candidate universe); the layout buys file
    skipping, not different answers. The batch-label IN list is bounded
    by the corpus's label cardinality (the LP_MAX_LABELS ceiling — the
    same small-domain contract the label-partitioned tier documents)."""
    centroids = _load_centroids(spark, base_index_dir)
    if centroids.size == 0:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    probes = materialize(
        _assign(batch.select("vec_id", "embedding"), centroids, nprobe)
    )
    probed_lists = [
        r.list_id for r in probes.select("list_id").distinct().collect()
    ]
    batch_labels = [
        r.label
        for r in batch.select("label").distinct().limit(LP_MAX_LABELS + 1).collect()
    ]
    if len(batch_labels) > LP_MAX_LABELS:
        raise ValueError(
            f"batch carries > {LP_MAX_LABELS} distinct labels — the pushed "
            "IN stops pruning; use the lookup-join probe for open domains"
        )
    stored = read_current(
        spark, os.path.join(zlr_index_dir, "vectors_zlr")
    ).filter(
        F.col("label").isin(batch_labels)
        & F.col("ts").between(lo, hi)
        & F.col("list_id").isin(probed_lists)
    )
    # the broadcast side materializes (probes already did; the label
    # join folds in) so the served plan is ONE scan — the z-ordered
    # vectors table — with all three predicates pushed (plan-pinned)
    q = materialize(
        with_norm(probes).join(batch.select("vec_id", "label"), on="vec_id")
    ).alias("q")
    c = stored.alias("c")
    cos = F.round(_pair_dot("q", "c") / (F.col("q.nrm") * F.col("c.nrm")), 6)
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q.list_id") == F.col("c.list_id"))
            & (F.col("q.label") == F.col("c.label"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("vec_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "vec_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cos_sim",
        )
        .orderBy("vec_id", "rank")
    )


@register(
    "sim_label_range_filtered_cosine_topk",
    oracle=f"""
WITH valid AS (
  SELECT vec_id, embedding, label FROM embeddings
  WHERE {EMB_VALID_SQL} AND label IS NOT NULL
),
eligible AS (
  SELECT vec_id, embedding, label FROM valid
  WHERE {_TS_SQL} BETWEEN {TS_LO} AND {TS_HI}
),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cos_sim
  FROM valid a JOIN eligible b
    ON a.vec_id % {QUERY_STRIDE} = 0 AND a.label = b.label AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT vec_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim
FROM ranked WHERE rank <= {TOP_K}
ORDER BY vec_id, rank
""",
)
def sim_label_range_filtered_cosine_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact conjunctive search, hash-checked: for every strided query
    vector, the top-3 most-similar vectors that SHARE ITS LABEL and
    whose pseudo-timestamp falls in the window — label AND range in one
    query, the exactness oracle for the conjunctive probe tiers."""
    e = _labeled(spark, sf_dir)
    return label_range_filtered_topk(
        e.filter(F.col("vec_id") % QUERY_STRIDE == 0),
        e,
        _ts_payload(e),
        TS_LO,
        TS_HI,
    )


@register(
    "sim_label_range_filtered_zorder_ann_topk",
    # NO oracle by design (nprobe routing); correctness = BIT-IDENTITY
    # with the composed lookup-join conjunctive probe at equal nprobe,
    # the conjunction invariant (same label AND in-window), all-lists ==
    # exact, the recall floor, and the measured 3-key-vs-2-key file
    # skipping — tests/test_ann_filtered.py
    doc=(
        "conjunctive filtered ANN (label AND ts-range) over the z-ordered "
        "(label, ts, list_id) layout: all three predicates pushed into ONE "
        "vectors scan, no metadata joins — bit-identical to the composed "
        "two-join lookup probe, with 3-key file skipping measured against "
        "the 2-key layout"
    ),
)
def sim_label_range_filtered_zorder_ann_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ANN demo split through the conjunctive z-ordered probe — the
    generalization the round-11 z-tier's docstring promised (Morton on
    three columns), as a registered query."""
    base = ensure_ann_index(spark, sf_dir)
    zlr = ensure_zlr_index(spark, sf_dir)
    e = _labeled(spark, sf_dir)
    return label_range_filtered_zorder_topk(
        spark, e.filter(F.col("vec_id") % 10 == 0), base, zlr, TS_LO, TS_HI
    )
