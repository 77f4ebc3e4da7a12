"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Two paths, per the north star:

  - brute-force cosine top-k — the exactness baseline. Implemented as a
    broadcast matmul inside ``mapInPandas`` (Arrow-batched numpy): each
    partition multiplies its query block against the broadcast corpus
    matrix. At 100 TB the corpus side must be the smaller/broadcastable
    relation (query-against-catalog shape); for corpus×corpus scale, use
    the LSH variant.
  - random-hyperplane LSH bucketing — the scale path: vectors meet only
    inside hash buckets, so pairwise work is bucket-local, never corpus².

The driver's DuckDB oracle checks neighbor IDs (not raw float scores):
scores are rounded to 1e-6 before ranking in both engines with ties broken
by neighbor id, so float-accumulation-order differences can't flip ranks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.plans.materialize import materialize
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table

TOP_K = 3
QUERY_STRIDE = 50  # every 50th vector is a "query"; full table is the corpus
# Hard cap on the corpus rows the brute-force path may collect+broadcast
# (~0.5 GB at 64-dim float64). Past this, brute force is the wrong tool —
# the LSH/IVF variants are the scale path — so fail loudly instead of
# OOMing the driver.
BRUTE_FORCE_MAX_CORPUS = 1_000_000

# The index dimension: every similarity path ingests vectors of exactly
# this width. Real lakes carry data errors — NULL embeddings, truncated
# arrays, all-zero vectors (cosine undefined) — and a 100 TB index build
# must quarantine them with a row-local filter, not crash mid-shuffle on
# a ragged numpy stack.
EMB_DIM = 64

# DuckDB WHERE fragment mirroring _valid_embeddings, spliced into every
# oracle that scores vectors so both engines ingest the same set.
EMB_VALID_SQL = (
    f"embedding IS NOT NULL AND len(embedding) = {EMB_DIM}"
    " AND len(list_filter(embedding, x -> x <> 0)) > 0"
)


def valid_embedding() -> F.Column:
    """Row-local predicate for index-valid vectors: non-NULL, exactly
    EMB_DIM wide, nonzero norm. Pure array expressions — the filter fuses
    into the scan's codegen stage. Shared with the dedup cosine path so
    every vector scorer ingests the identical corpus."""
    return (
        F.col("embedding").isNotNull()
        & (F.size("embedding") == EMB_DIM)
        & F.exists("embedding", lambda x: x != 0)
    )


def _valid_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding) restricted to index-valid vectors."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.filter(valid_embedding())


def _pair_dot(left: str, right: str) -> F.Column:
    """Exact float64 dot product of two aliased embedding columns,
    evaluated JVM-side (zip_with + aggregate) — shared by every candidate
    scorer so LSH and IVF can never score the same pair differently."""
    return F.aggregate(
        F.zip_with(
            F.col(f"{left}.embedding"),
            F.col(f"{right}.embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _vec_norm(side: str) -> F.Column:
    """L2 norm of an aliased embedding column (JVM-side)."""
    return F.sqrt(
        F.aggregate(
            F.transform(
                F.col(f"{side}.embedding"), lambda x: x.cast("double") * x.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_norm(df: DataFrame) -> DataFrame:
    """Attach the vector's L2 norm as ``nrm`` — ONCE per vector, before
    any candidate join. Per-pair scoring then divides by the carried
    norms instead of re-folding both 64-element arrays per candidate —
    the norm folds were 2/3 of the per-pair array work, and at the sf1
    multi-probe point (19.8M candidates) hoisting them took the LSH
    scoring stage from the dominant cost to a third of it (measured in
    SCALE.md round 6). The expression tree is IDENTICAL to
    ``_vec_norm`` evaluated per pair, so scores are bit-identical."""
    return df.withColumn(
        "nrm",
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
    )


@register(
    "sim_cosine_bruteforce_topk",
    oracle=f"""
WITH valid AS (
  SELECT vec_id, embedding FROM embeddings WHERE {EMB_VALID_SQL}
),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cos_sim
  FROM valid a JOIN valid b ON a.vec_id % {QUERY_STRIDE} = 0 AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT vec_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY vec_id, rank
""",
)
def sim_cosine_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k neighbors for a strided query sample
    against the full corpus.

    The corpus matrix is broadcast once; each Arrow batch of queries does a
    single numpy float64 matmul then an np.argpartition top-k — vectorized,
    no per-row Python. This is the EXACT small-catalog baseline: the corpus
    side is collected (projected to (vec_id, embedding) only) behind a hard
    row-count guard; past the guard the subquadratic paths below
    (sim_cosine_lsh_pairs / sim_cosine_ivf_topk) are the 100 TB answer.
    """
    e = _valid_embeddings(spark, sf_dir)
    queries = e.filter(F.col("vec_id") % QUERY_STRIDE == 0)

    # ONE action guards and collects: limit(cap+1) stops the scan at the
    # guard boundary (never materializes an over-cap corpus driver-side),
    # and an overflow row proves the corpus exceeds the guard without a
    # separate count() pass over the embeddings.
    rows = e.limit(BRUTE_FORCE_MAX_CORPUS + 1).collect()
    if len(rows) > BRUTE_FORCE_MAX_CORPUS:
        raise ValueError(
            f"brute-force corpus exceeds the broadcast guard "
            f"({BRUTE_FORCE_MAX_CORPUS} rows); use the LSH/IVF variants at this scale"
        )
    if not rows:  # empty lake / all rows quarantined: no neighbors
        return spark.createDataFrame([], "vec_id long, neighbor_id long, rank long")
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.array([rows[i].embedding for i in order], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    sc = spark.sparkContext
    b_ids, b_mat, b_norms = sc.broadcast(ids), sc.broadcast(mat), sc.broadcast(norms)

    def topk(batches):
        corpus_ids, corpus, corpus_norms = b_ids.value, b_mat.value, b_norms.value
        # (cos DESC, neighbor_id ASC) as one strict composite key: rounded
        # sims move in 1e-6 steps while the rank perturbation tops out at
        # N*1e-13 ≤ 1e-7 (N bounded by the guard), so ties break by id
        # without ever reordering distinct similarities.
        tie = np.arange(len(corpus_ids), dtype=np.float64) * 1e-13
        for batch in batches:
            if len(batch) == 0:
                continue
            q = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            qids = batch["vec_id"].to_numpy()
            qnorms = np.sqrt((q * q).sum(axis=1))
            sims = np.round((q @ corpus.T) / (qnorms[:, None] * corpus_norms[None, :]), 6)
            sims[corpus_ids[None, :] == qids[:, None]] = -np.inf  # exclude self
            comp = sims - tie[None, :]
            k = min(TOP_K, comp.shape[1] - 1)
            if k < 1:  # single-vector corpus: a query's only row is itself
                continue
            part = np.argpartition(-comp, kth=k - 1, axis=1)[:, :k]
            out = []
            for i in range(len(qids)):
                sel = part[i][np.argsort(-comp[i, part[i]])]
                out.extend((qids[i], corpus_ids[j], r) for r, j in enumerate(sel, start=1))
            yield pd.DataFrame(out, columns=["vec_id", "neighbor_id", "rank"])

    result = queries.mapInPandas(topk, schema="vec_id long, neighbor_id long, rank long")
    return result.orderBy("vec_id", "rank")


LSH_TABLES = 8  # independent hash tables (OR-amplification for recall)
LSH_PLANES = 8  # sign bits per table (AND-amplification for precision)
# Buckets probed per table (multi-probe, round 6): the production point is
# 2 — measured at sf1, 8 tables × 2 probes gives recall 0.726 vs 0.669
# for 16 tables × 1 probe, at 12.8 s vs 11.3 s wall and HALF the index
# memory (probe rows are join-time ids, not stored signatures).
LSH_PROBES = 2
SIM_THRESHOLD = 0.4  # this corpus is random 64-dim (max pairwise cos ≈ 0.51)


def lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    tables: int = LSH_TABLES,
    planes: int = LSH_PLANES,
    threshold: float = SIM_THRESHOLD,
    probes: int = 1,
) -> DataFrame:
    """Parameterized sign-random-projection LSH near-neighbor pairs.

    ``tables`` is OR-amplification (more tables → higher recall, more
    candidate work), ``planes`` is AND-amplification (more sign bits →
    fewer, higher-precision collisions), and ``probes`` is multi-probe
    (round-6): per table, one side of the join additionally probes the
    ``probes-1`` neighbor buckets obtained by flipping the sign bits with
    the SMALLEST projection margin — the bits most likely to disagree for
    a true near neighbor. Multi-probe buys the recall of more tables for
    the hashing cost of fewer: extra probe rows are bucket-join rows
    (24 B ids), not extra signature passes over the corpus, so cost grows
    sub-linearly vs adding tables (measured on the sf1 curve in SCALE.md:
    8 tables × 2 probes ≥ 16-table recall at roughly half its wall).
    The registered query pins the production defaults;
    `tools/ann_curve.py` sweeps this surface at sf1.

    Shuffle shape (round-5 rewrite): the bucket self-join carries ONLY
    (vec_id, table_id, bucket) — 24 bytes/row — never the embedding.
    Candidate pairs are distinct'd FIRST, then the (much smaller) pair set
    re-attaches both embeddings via two equi-joins for exact scoring.
    The previous formulation shipped every vector's 64-float embedding
    through the ``tables``-way exploded exchange (tables× the corpus
    bytes) and scored before the distinct; at the 50k-vector sf1 lake the
    id-only shape is 2.5× faster (36.0 s → 14.3 s, identical output), and
    the byte ratio grows with ``tables`` and vector width at 100 TB.
    """
    if not 1 <= probes <= planes + 1:
        raise ValueError(f"probes must be in [1, planes+1], got {probes}")
    e = _valid_embeddings(spark, sf_dir)
    rng = np.random.RandomState(42)
    plane_mat = rng.randn(tables, planes, EMB_DIM)
    b_planes = spark.sparkContext.broadcast(plane_mat)

    def bucketize(batches):
        pl = b_planes.value
        bit_vals = 1 << np.arange(planes)
        for batch in batches:
            if len(batch) == 0:
                continue
            mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            frames = []
            for t in range(tables):
                proj = mat @ pl[t].T
                buckets = (proj > 0).dot(bit_vals).astype(np.int64)
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": batch["vec_id"],
                            "table_id": t,
                            "bucket": buckets,
                            "is_probe": np.zeros(len(buckets), dtype=np.int32),
                        }
                    )
                )
                if probes > 1:
                    # neighbor buckets: flip the probes-1 lowest-|margin|
                    # bits — a vectorized argsort per batch, no extra
                    # projection work
                    flip_bits = np.argsort(np.abs(proj), axis=1)[:, : probes - 1]
                    flipped = buckets[:, None] ^ bit_vals[flip_bits]
                    frames.append(
                        pd.DataFrame(
                            {
                                "vec_id": np.repeat(
                                    batch["vec_id"].to_numpy(), probes - 1
                                ),
                                "table_id": t,
                                "bucket": flipped.ravel().astype(np.int64),
                                "is_probe": np.ones(
                                    len(buckets) * (probes - 1), dtype=np.int32
                                ),
                            }
                        )
                    )
            yield pd.concat(frames, ignore_index=True)

    # materialize the bucket assignments: the self-join would otherwise run
    # the Python bucketize pass once per side
    bucketed = e.mapInPandas(
        bucketize, schema="vec_id long, table_id int, bucket long, is_probe int"
    ).transform(materialize)

    base = bucketed.filter(F.col("is_probe") == 0).drop("is_probe")
    # symmetric base-vs-base join: each unordered pair meets once
    a, b = base.alias("a"), base.alias("b")
    raw = a.join(
        b,
        (F.col("a.table_id") == F.col("b.table_id"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    if probes > 1:
        # probe collisions come from a SEPARATE base-vs-probe-rows join
        # (collision ⇔ codes within hamming-1 of a probed bit), unioned
        # with the base-base join above. Joining base against the full
        # (base ∪ probe) side instead would re-detect every base-base
        # collision a second time — measured at the 50k-vector sf1 lake,
        # that doubled shape costs 35.3 s vs 24.7 s for this split, same
        # output. An a<b predicate here would drop the probe collisions
        # where the probing side has the smaller id (hamming is
        # symmetric, the probe rows are not), so orient with
        # least/greatest; the exchange stays ids-only.
        probe_rows = bucketed.filter(F.col("is_probe") == 1).drop("is_probe")
        p = probe_rows.alias("b")
        raw = raw.unionByName(
            a.join(
                p,
                (F.col("a.table_id") == F.col("b.table_id"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") != F.col("b.vec_id")),
            ).select(
                F.least("a.vec_id", "b.vec_id").alias("vec_a"),
                F.greatest("a.vec_id", "b.vec_id").alias("vec_b"),
            )
        )
    pairs = raw.distinct()  # multi-table/multi-probe collisions collapse pre-score
    en = with_norm(e)  # norms hoisted out of the per-pair scoring (see with_norm)
    ea, eb = en.alias("ea"), en.alias("eb")
    cos = _pair_dot("ea", "eb") / (F.col("ea.nrm") * F.col("eb.nrm"))
    return (
        pairs.join(ea, F.col("vec_a") == F.col("ea.vec_id"))
        .join(eb, F.col("vec_b") == F.col("eb.vec_id"))
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


@register(
    "sim_cosine_lsh_pairs",
    oracle=None,  # approximate bucketing; recall asserted in tests/test_similarity.py
    doc="random-hyperplane LSH near-neighbor pairs (rows-only check)",
)
def sim_cosine_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: multi-table sign-random-projection LSH (8 tables ×
    8 hyperplanes × 2-bucket multi-probe). A vector lands in one bucket
    per table; candidate pairs exist ONLY where some table's buckets
    collide — OR across tables buys recall, AND across bits precision,
    and probing the lowest-margin flipped bucket buys 16-table-class
    recall without 16-table index memory (measured curve in SCALE.md).
    Exact cosine for candidates is computed JVM-side (zip_with/aggregate,
    norms hoisted per vector)."""
    return lsh_pairs(spark, sf_dir, probes=LSH_PROBES)


IVF_LISTS = 16  # coarse-quantizer cells (≈ sqrt(corpus) at this scale)
IVF_NPROBE = 4  # cells probed per query


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    lists: int = IVF_LISTS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Parameterized IVF ANN core (see ``sim_cosine_ivf_topk``).

    ``lists`` = coarse-quantizer cells, ``nprobe`` = cells scanned per
    query; recall and cost both scale ≈ nprobe/lists. The registered
    query pins the production defaults; `tools/ann_curve.py` sweeps this
    surface for the measured sf1 recall/time curve (SCALE.md).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = _valid_embeddings(spark, sf_dir)
    # a coarse quantizer needs ≥1 training vector and at most one cell per
    # DISTINCT point — Spark's k-means|| init crashes mid-fit when k
    # exceeds the distinct-point count (a constant-corpus lake). The bound
    # uses countDistinct over a 64-bit hash of the vector: one partial
    # aggregate on the index-BUILD path (the fit that follows scans the
    # corpus 10×), and hash collisions can only LOWER the bound — safe.
    counts = e.agg(
        F.count("*").alias("n"),
        F.countDistinct(F.xxhash64("embedding")).alias("nd"),
    ).collect()[0]
    if counts["n"] == 0:
        return spark.createDataFrame([], "vec_id long, neighbor_id long, rank long")
    if counts["nd"] < 2:
        # a single distinct point (KMeans requires k ≥ 2): the whole
        # corpus IS one inverted list, its centroid the point itself
        corpus = e.withColumn("list_id", F.lit(0))
        centroids = np.array(
            [e.select("embedding").head()[0]], dtype=np.float64
        )
    else:
        vecs = e.withColumn(
            "features", array_to_vector(F.col("embedding").cast("array<double>"))
        )
        # distanceMeasure MUST match the probe kernel's geometry: probes
        # pick the nprobe nearest centroids BY COSINE, so the quantizer is
        # trained and the corpus assigned by cosine too. A Euclidean fit
        # here would let the same vector land in different lists at build
        # vs probe time, silently costing recall at low nprobe (zero-norm
        # vectors — cosine-undefined — are already quarantined by
        # valid_embedding before this point).
        model = KMeans(
            k=min(lists, counts["nd"]),
            seed=42,
            maxIter=10,
            distanceMeasure="cosine",
            featuresCol="features",
            predictionCol="list_id",
        ).fit(vecs)
        corpus = model.transform(vecs).select("vec_id", "embedding", "list_id")
        centroids = np.stack(model.clusterCenters())  # k × dim, driver-side
    b_cent = spark.sparkContext.broadcast(centroids)

    def probe(batches):
        cent = b_cent.value
        cnorm = np.sqrt((cent * cent).sum(axis=1))
        eff_nprobe = min(nprobe, cent.shape[0])  # tiny corpus: fewer cells
        for batch in batches:
            if len(batch) == 0:
                continue
            q = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            qnorm = np.sqrt((q * q).sum(axis=1))
            sims = (q @ cent.T) / (qnorm[:, None] * cnorm[None, :] + 1e-12)
            nearest = np.argsort(-sims, axis=1)[:, :eff_nprobe]
            out = {
                "vec_id": np.repeat(batch["vec_id"].to_numpy(), eff_nprobe),
                "embedding": batch["embedding"].repeat(eff_nprobe).to_numpy(),
                "list_id": nearest.ravel().astype(np.int32),
            }
            yield pd.DataFrame(out)

    queries = e.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    probes = queries.mapInPandas(
        probe, schema="vec_id long, embedding array<float>, list_id int"
    )

    from pyspark.sql import Window

    # norms hoisted out of per-candidate scoring (bit-identical; see
    # with_norm). Both attachments are JVM-side row-local projections —
    # the probe side's norm is computed AFTER mapInPandas so the
    # arithmetic is the same JVM fold as the corpus side's.
    q, c = with_norm(probes).alias("q"), with_norm(corpus).alias("c")
    scored = (
        q.join(
            c,
            (F.col("q.list_id") == F.col("c.list_id"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("vec_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.round(_pair_dot("q", "c") / (F.col("q.nrm") * F.col("c.nrm")), 6).alias(
                "cos_sim"
            ),
        )
        .dropDuplicates(["vec_id", "neighbor_id"])  # a neighbor can appear via 2 probes
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("vec_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
        .orderBy("vec_id", "rank")
    )


@register(
    "sim_cosine_ivf_topk",
    oracle=None,  # approximate (probes a subset of cells); recall vs the
    # brute-force baseline asserted in tests/test_similarity.py
    doc="IVF ANN: k-means coarse quantizer + nprobe cell search (rows-only check)",
)
def sim_cosine_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: train a k-means coarse quantizer (pyspark.ml, the
    distributed trainer), assign every corpus vector to its nearest
    centroid's inverted list, probe the ``IVF_NPROBE`` nearest lists per
    query, and score ONLY those lists' vectors (exact cosine, JVM-side).

    Scale: the index build is one k-means fit + one transform (both
    shuffle-light); queries touch nprobe/k of the corpus instead of all of
    it, and the candidate join is an equi-join on list_id — the classic
    IVF trade: recall vs fraction of corpus scanned. Centroids (k×dim
    floats) broadcast to every task.
    """
    return ivf_topk(spark, sf_dir)


@register(
    "sim_label_profile",
    oracle="""
SELECT label, COUNT(*) AS n_vecs,
       MIN(vec_id) AS first_vec, MAX(vec_id) AS last_vec
FROM embeddings
GROUP BY label
ORDER BY label
""",
)
def sim_label_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label cluster profile over the embedding corpus (exact-integer
    companion stats; centroid math is validated in tests)."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("vec_id").alias("first_vec"),
            F.max("vec_id").alias("last_vec"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# int8 quantization (embedding storage compression)
# ---------------------------------------------------------------------------


@register(
    "sim_embedding_int8_quantize",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_abs,
         embedding
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {EMB_DIM}
),
quant AS (
  SELECT vec_id, max_abs,
         CASE WHEN max_abs = 0
              THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
              ELSE list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 127 / max_abs) AS BIGINT))
         END AS qvec
  FROM q
)
SELECT vec_id,
       max_abs,
       CAST(len(qvec) AS BIGINT) AS n_dims,
       CAST(list_sum(qvec) AS BIGINT) AS q_sum,
       CAST(list_min(qvec) AS BIGINT) AS q_min,
       CAST(list_max(qvec) AS BIGINT) AS q_max
FROM quant
ORDER BY vec_id
""",
)
def sim_embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4×
    storage-compression step before shipping vectors to an ANN index.
    Per-vector scale = max|x|/127; outputs integer checksums of the
    quantized vector (sum/min/max), which are BIT-EXACT across engines
    (both round half-away-from-zero and the scale arithmetic is identical
    IEEE double), plus the scale itself.

    Row-local array arithmetic — no shuffle except the presentation sort;
    the quantized vectors themselves would be written back to the lake as
    array<tinyint> + scale in production (4× smaller scans for ANN builds).
    """
    e = load_table(spark, sf_dir, "embeddings").filter(
        # storage transform, not index math: zero vectors quantize fine
        # (scale 0 branch), but NULL / wrong-width rows are data errors
        F.col("embedding").isNotNull() & (F.size("embedding") == EMB_DIM)
    )
    max_abs = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    qvec = F.when(F.col("max_abs") == 0, F.transform("embedding", lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform("embedding", lambda x: F.round(x.cast("double") * 127 / F.col("max_abs")).cast("long"))
    )
    return (
        e.select("vec_id", max_abs.alias("max_abs"), "embedding")
        .select("vec_id", "max_abs", qvec.alias("qvec"))
        .select(
            "vec_id",
            "max_abs",
            F.size("qvec").cast("long").alias("n_dims"),
            F.aggregate("qvec", F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q_sum"),
            F.array_min("qvec").alias("q_min"),
            F.array_max("qvec").alias("q_max"),
        )
        .orderBy("vec_id")
    )
