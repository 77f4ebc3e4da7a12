"""Hybrid retrieval: BM25 ⊕ embedding-cosine, fused by reciprocal rank.

The two retrieval modalities this repo already serves — keyword BM25
(functions/text.py) and embedding cosine (functions/similarity.py) —
fail on different queries: BM25 misses paraphrases, dense retrieval
misses rare exact terms. Production curation pipelines therefore run
BOTH and fuse; Reciprocal Rank Fusion (Cormack, Clarke & Büttcher,
SIGIR 2009 — public method) is the standard score-free fusion:

    rrf(doc) = Σ_legs 1 / (K + rank_leg(doc)),   K = 60

using only RANKS, so the two legs' incomparable score scales never
meet. A doc found by one leg alone contributes one term, which is the
whole point — the union of the legs is reranked, not the intersection.

Determinism/oracle story (why this composite is hash-checkable):
- text leg = the fixed-keyword BM25 top-20 (its decimal-summed rounded
  weights are already cross-engine exact);
- vector leg = exact cosine top-20 of ONE deterministic query vector —
  the MINIMUM valid vec_id's embedding (mirrorable in SQL on any lake,
  including empty/nulls where the leg degrades to no rows) — scored
  JVM-side with the shared hoisted-norm expression tree, rounded to the
  same 6 places as every cosine in the repo, ties by doc_id;
- rrf terms are 1/(60+rank) with INTEGER ranks: bit-identical doubles
  on both engines; the sum is two terms in a fixed left-to-right shape,
  rounded once to 1e-9 (well above double ulp at this magnitude, far
  below the minimum inter-score gap).

Scale shape: each leg is the already-scale-audited operator (BM25's
term-pruned postings aggregate; the cosine leg broadcasts ONE query
vector — a 1×n matvec, no pair join — and takes its top-20 via
``orderBy().limit()``, which Spark compiles to TakeOrderedAndProject:
per-partition heaps, no single-partition sort of the scored corpus;
the row_number rank is then computed over the 20-row result only).
The fusion itself is a full-outer join of two 20-row frames — free at
any corpus size. At 100 TB the text leg is served from the persisted
BM25 index (`bm25_from_index` — already wired on the hot path) and the
vector leg swaps to the persisted IVF form (`hybrid_from_ann_index`
below — approximate, so registered rows-only with a pinned
rank-overlap floor vs this exact hybrid) with identical fusion
algebra.

Reference anchor: none — north-star retrieval territory, composing the
round-7/8 retrieval family.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgcp_spark.functions.text import BM25_ORACLE, BM25_TOP
from pgcp_spark.functions.similarity import EMB_VALID_SQL, valid_embedding, with_norm
from pgcp_spark.indexes import loop
from pgcp_spark.plans.materialize import materialize
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table

RRF_K = 60  # the SIGIR-2009 constant; dampens the head, keeps the tail
LEG_DEPTH = BM25_TOP  # per-leg candidate depth (20)
HYBRID_TOP = 20

# The hybrid's OWN IVF index root: the dedup/ANN family's index serves
# the batch-vs-corpus demo split (vec_id % 10 held out as "new batch"),
# but a retrieval index must cover the WHOLE corpus — a top-k that
# structurally cannot see 10% of the documents is not approximate, it is
# wrong. Same content-version keying, same format salt discipline.
RETRIEVAL_ANN_ROOT = os.environ.get(
    "SPARK_GRAFT_RETRIEVAL_ANN_ROOT", "/tmp/pgcp_retrieval_ann"
)


def cosine_leg(spark: SparkSession, sf_dir: str, depth: int = LEG_DEPTH) -> DataFrame:
    """(doc_id, vrank): exact cosine top-``depth`` for the deterministic
    query vector (minimum valid vec_id). One broadcast matvec-shaped
    join — the query side is a single row — scored with the shared
    hoisted-norm tree, rounded to 6 places, ties by doc_id. Returns an
    empty frame when no valid vector exists (empty/nulls lakes).
    ``vec_id IS NOT NULL`` is required on top of ``valid_embedding()``:
    the query vector is picked by MIN vec_id, and Spark's orderBy is
    NULLS FIRST where DuckDB's is NULLS LAST — a NULL id with a valid
    embedding would silently diverge cross-engine (and empty the leg
    via the ``vec_id != q_id`` filter)."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id").isNotNull() & valid_embedding())
    )
    q_rows = e.orderBy("vec_id").limit(1).collect()
    if not q_rows:
        return spark.createDataFrame([], "doc_id long, vrank int")
    q_id = q_rows[0].vec_id
    q = spark.createDataFrame(q_rows).select(
        F.col("embedding").alias("q_emb")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("q_emb"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    q_nrm = F.sqrt(
        F.aggregate(
            F.transform("q_emb", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        with_norm(e.filter(F.col("vec_id") != q_id))
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(dot / (F.col("nrm") * q_nrm), 6).alias("cos_sim"),
        )
    )
    # TakeOrderedAndProject (per-partition heaps, fully parallel) takes
    # the top-``depth``; the rank window then runs over only those
    # ``depth`` rows. An unpartitioned window directly on ``scored``
    # would force the WHOLE scored corpus into one partition — the
    # single-task sort tests/test_width.py's window gate now rejects.
    top = scored.orderBy(F.desc("cos_sim"), "doc_id").limit(depth)
    w = Window.orderBy(F.desc("cos_sim"), "doc_id")
    return (
        top.withColumn("vrank", F.row_number().over(w))
        .select("doc_id", "vrank")
    )


_HYBRID_ORACLE = f"""
WITH text_leg AS (
  SELECT doc_id, rnk FROM ({BM25_ORACLE.rstrip().rstrip(chr(10))}) t
),
valid AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id IS NOT NULL AND {EMB_VALID_SQL}
),
q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS q_emb FROM valid ORDER BY vec_id LIMIT 1),
vec_scores AS (
  SELECT b.vec_id AS doc_id,
         ROUND(list_dot_product(CAST(b.embedding AS DOUBLE[]), q.q_emb)
               / (sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
  FROM valid b, q WHERE b.vec_id <> q.vec_id
),
vec_leg AS (
  SELECT doc_id, vrank FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS vrank
    FROM vec_scores
  ) WHERE vrank <= {LEG_DEPTH}
),
fused AS (
  SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
         ROUND(
           COALESCE(1.0 / ({RRF_K} + t.rnk), 0)
           + COALESCE(1.0 / ({RRF_K} + v.vrank), 0), 9) AS rrf
  FROM text_leg t FULL OUTER JOIN vec_leg v ON t.doc_id = v.doc_id
)
SELECT doc_id, rrf, CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank
FROM fused
QUALIFY rank <= {HYBRID_TOP}
ORDER BY rank
"""


def _rrf_fuse(text_leg: DataFrame, vec_leg: DataFrame) -> DataFrame:
    """RRF over the UNION of the two ranked legs (module docstring):
    full-outer join of two ≤LEG_DEPTH-row frames, two fixed-shape 1/(K+r)
    terms rounded once, final top-HYBRID_TOP by fused score with doc_id
    tie-break. The global window here is over a ≤2×LEG_DEPTH-row frame —
    bounded by construction, not by corpus size."""
    fused = (
        text_leg.join(vec_leg, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rnk")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("vrank")), F.lit(0.0)),
                9,
            ).alias("rrf"),
        )
    )
    w = Window.orderBy(F.desc("rrf"), "doc_id")
    return (
        materialize(fused)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HYBRID_TOP)
        .select("doc_id", "rrf", "rank")
        .orderBy("rank")
    )


def ensure_retrieval_ann_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per corpus version) the FULL-corpus IVF index the
    hybrid's persisted vector leg serves from — ``build_ann_index_from``
    over every valid embedding, unlike the ANN family's 90% demo split
    (comment at RETRIEVAL_ANN_ROOT)."""
    from pgcp_spark.functions.ann_index import _SUBTABLES, build_ann_index_from

    index_dir = loop.content_version_dir(
        RETRIEVAL_ANN_ROOT, sf_dir, "embeddings.parquet",
        salt="format:v2:cosine:fullcorpus",
    )
    return loop.ensure_built(
        index_dir,
        _SUBTABLES,
        lambda: build_ann_index_from(
            spark,
            load_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .filter(F.col("vec_id").isNotNull() & valid_embedding()),
            index_dir,
        ),
    )


# The retrieval leg probes HALF the lists (8 of 16), not the ANN
# family's 4: this synthetic embedding table is near-uniform noise — the
# IVF worst case, where top-20 cosine neighbors spread across lists —
# and the measured recall ladder at sf0.01 is nprobe 4/6/8/12 →
# 0.25/0.50/0.70/0.90. On real clustered embeddings fewer probes buy the
# same recall; the parameter is the caller's knob either way.
RETRIEVAL_NPROBE = 8

# The measured cost rule (round 10, tools/ann_crossover.py + SCALE.md):
# below this corpus size the exact broadcast matvec beats the probe
# machinery — at 60k/250k clustered vectors the exact leg wins outright
# (1.6/1.1 s vs 2.3/1.8 s) and the crossover lands between 250k and 1M
# (at 1M: 2.12 s exact vs 1.85 s at nprobe=2, leg overlap 1.00); on the
# shipped near-uniform lakes the exact leg also wins at every scale.
# The threshold sits AT the crossover's upper bracket, not the last
# exact-wins point: routing exact at 999k costs at most the measured
# ~13% 1M edge, while a 250k threshold would route the measured-60%-
# slower IVF leg to everything in the unmeasured 250k–1M band. Same
# honesty as the AQE-over-forced-hints call: don't pay index machinery
# the corpus is too small to repay.
ANN_LEG_EXACT_BELOW = 1_000_000


def ann_cosine_leg(
    spark: SparkSession,
    sf_dir: str,
    depth: int = LEG_DEPTH,
    nprobe: int = RETRIEVAL_NPROBE,
    exact_below: int = ANN_LEG_EXACT_BELOW,
) -> DataFrame:
    """(doc_id, vrank): the cosine leg served from the persisted IVF
    index — probe the stored centroids with the SAME deterministic query
    vector as ``cosine_leg``, read only the probed lists' vector files,
    exact cosine over that candidate set. Approximate by contract
    (nprobe of k lists), so the hybrid built on it registers rows-only
    with a rank-overlap floor vs the exact hybrid
    (tests/test_retrieval.py), the same recipe as every IVF/LSH recall
    floor in the repo.

    ``exact_below`` is the measured cost rule (comment at
    ``ANN_LEG_EXACT_BELOW``): when the valid-embedding corpus is smaller
    than the threshold, the exact full-scan leg is CHEAPER than probing,
    so it is served instead — same ranks or better (the exact leg is the
    recall ceiling), strictly less cost. Pass 0 to force the IVF path
    (the registered query and the floor tests do, since their job is to
    prove the indexed machinery itself)."""
    from pgcp_spark.functions.ann_index import batch_vs_ann_index

    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id").isNotNull() & valid_embedding())
    )
    if exact_below and e.limit(exact_below).count() < exact_below:
        return cosine_leg(spark, sf_dir, depth=depth)
    q_rows = e.orderBy("vec_id").limit(1).collect()
    if not q_rows:
        return spark.createDataFrame([], "doc_id long, vrank int")
    index_dir = ensure_retrieval_ann_index(spark, sf_dir)
    nbrs = batch_vs_ann_index(
        spark, spark.createDataFrame(q_rows), index_dir, nprobe=nprobe, top_k=depth
    )
    return nbrs.select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").cast("int").alias("vrank")
    )


@register(
    "hybrid_from_indexes",
    # NO oracle by design: the vector leg probes nprobe of k IVF lists —
    # approximate, so the driver records rows-only; correctness is the
    # pinned rank-overlap floor vs the exact hybrid plus the shared
    # fusion algebra (both in tests/test_retrieval.py)
    doc="hybrid retrieval served ENTIRELY from persisted indexes: BM25 leg from the stored postings, cosine leg from the full-corpus IVF index (probed lists only) — rows-only with a pinned rank-overlap floor vs the exact hybrid",
)
def hybrid_from_indexes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB hot path the module docstring prescribes, now wired:
    BOTH legs read persisted artifacts — the text leg from the BM25
    postings (bit-exact vs recompute, so it contributes zero
    approximation) and the vector leg from the full-corpus IVF index
    (reads only the probed lists' files instead of re-scanning every
    embedding per query). Fusion algebra identical to the exact hybrid.
    A curation pipeline runs this thousands of times; the exact hybrid
    (`hybrid_bm25_cosine_rrf`) stays as the hash-checked yardstick the
    overlap floor is measured against.

    ``exact_below=0``: this query's JOB is to prove the indexed
    machinery (the floors measure IT, not the cost rule), so it forces
    the IVF path even on the small shipped lakes where
    ``ANN_LEG_EXACT_BELOW`` would route production callers to the
    cheaper exact leg."""
    from pgcp_spark.functions.text_index import bm25_from_index, ensure_text_index

    text_leg = bm25_from_index(spark, ensure_text_index(spark, sf_dir)).select(
        "doc_id", "rnk"
    )
    vec_leg = ann_cosine_leg(spark, sf_dir, exact_below=0)
    return _rrf_fuse(text_leg, vec_leg)


@register(
    "hybrid_bm25_cosine_rrf",
    oracle=_HYBRID_ORACLE,
    doc="hybrid retrieval: BM25 top-20 (fixed keyword query) fused with exact cosine top-20 (deterministic query vector) by reciprocal rank fusion (K=60) — union of legs reranked, hash-exact end to end",
)
def hybrid_bm25_cosine_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search over the corpus (module docstring): the keyword leg
    and the dense leg each contribute their top-20 ranks; RRF fuses the
    UNION (a doc found by one leg alone still scores), final top-20 by
    fused score with doc_id tie-break. Both legs and the fusion are
    cross-engine deterministic, so the whole composite is hash-checked —
    rare for a multi-modal retrieval stack."""
    from pgcp_spark.functions.text_index import bm25_from_index, ensure_text_index

    # the text leg is served FROM THE PERSISTED INDEX: bit-identical to
    # the one-shot recompute (tests/test_text_index.py pins the equality;
    # both hash the same oracle) and measurably faster — the swap the
    # module docstring prescribes for scale, done on the hot path too.
    # The one-shot (text_bm25_search_topk) remains the oracle twin.
    text_leg = bm25_from_index(spark, ensure_text_index(spark, sf_dir)).select(
        "doc_id", "rnk"
    )
    vec_leg = cosine_leg(spark, sf_dir)
    fused = (
        text_leg.join(vec_leg, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rnk")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("vrank")), F.lit(0.0)),
                9,
            ).alias("rrf"),
        )
    )
    w = Window.orderBy(F.desc("rrf"), "doc_id")
    return (
        materialize(fused)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HYBRID_TOP)
        .select("doc_id", "rrf", "rank")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Multi-query hybrid: N curation topics through BOTH legs, fused per topic
# ---------------------------------------------------------------------------

# per-topic depths: text legs reuse the batch-retrieval op's BATCH_TOP
MULTI_HYBRID_TOP = 10


def multi_cosine_legs(
    spark: SparkSession, sf_dir: str, qids: list[str], depth: int = MULTI_HYBRID_TOP
) -> DataFrame:
    """(qid, doc_id, vrank): exact cosine top-``depth`` per topic. Query
    vectors are deterministic like the single-query leg's: the
    ``len(qids)`` smallest valid vec_ids, assigned to the SORTED qids in
    vec_id order (mirrorable in SQL); a lake with fewer valid vectors
    than topics leaves the tail topics with an empty vector leg (they
    degrade to text-only in the fusion).

    Scale shape: ONE corpus scan scores all topics (the |qids|-row query
    frame broadcasts into the scan — Q extra fused multiplies per row,
    no per-topic rescan), then a Window PARTITIONED BY qid takes each
    topic's top-k. Per-qid partitioning is the right parallelism for the
    many-topic use case (Q partitions; Spark's rank-filter pushdown
    bounds the exchange at depth rows per input partition per qid) —
    unlike the single-query leg, where an unpartitioned window would
    single-task the corpus and ``orderBy().limit()`` is the correct
    shape instead."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id").isNotNull() & valid_embedding())
    )
    q_rows = e.orderBy("vec_id").limit(len(qids)).collect()
    if not q_rows:
        return spark.createDataFrame([], "qid string, doc_id long, vrank int")
    q = spark.createDataFrame(
        [(qid, r.vec_id, r.embedding) for qid, r in zip(sorted(qids), q_rows)],
        "qid string, q_id long, q_emb array<float>",
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("q_emb"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    q_nrm = F.sqrt(
        F.aggregate(
            F.transform("q_emb", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        with_norm(e)
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "qid",
            F.col("vec_id").alias("doc_id"),
            F.round(dot / (F.col("nrm") * q_nrm), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "doc_id")
    return (
        scored.withColumn("vrank", F.row_number().over(w))
        .filter(F.col("vrank") <= depth)
        .select("qid", "doc_id", "vrank")
    )


def multi_ann_cosine_legs(
    spark: SparkSession,
    sf_dir: str,
    qids: list[str],
    depth: int = MULTI_HYBRID_TOP,
    nprobe: int = RETRIEVAL_NPROBE,
    exact_below: int = ANN_LEG_EXACT_BELOW,
) -> DataFrame:
    """(qid, doc_id, vrank): the multi-topic cosine legs served from the
    persisted full-corpus IVF index as ONE BATCHED PROBE (round 10 —
    previously the multi-topic hybrid's only vector leg was
    ``multi_cosine_legs``' exact corpus scan per invocation, which made
    thousand-topic curation re-read every embedding per call). The N
    deterministic query vectors (same assignment rule as the exact leg)
    go through ``batch_vs_ann_index`` in one call: N probe rows → the
    UNION of their probed lists → one pruned vectors scan (pushed IN +
    footer skipping) serves every topic. Adding a topic adds a probe
    row and at most nprobe lists to the union — not a scan.

    Approximate by contract (nprobe of k lists per topic), so the
    hybrid built on it registers rows-only with per-topic overlap
    floors vs the exact multi-topic hybrid (tests/test_retrieval.py) —
    the ``hybrid_from_indexes`` recipe applied to the batch shape.
    ``exact_below`` is the single leg's measured cost rule (comment at
    ``ANN_LEG_EXACT_BELOW``): below the threshold the exact one-scan
    batch leg is cheaper than the probe machinery, so it is served
    instead; 0 forces the IVF path."""
    from pgcp_spark.functions.ann_index import batch_vs_ann_index

    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id").isNotNull() & valid_embedding())
    )
    if exact_below and e.limit(exact_below).count() < exact_below:
        return multi_cosine_legs(spark, sf_dir, qids, depth=depth)
    q_rows = e.orderBy("vec_id").limit(len(qids)).collect()
    if not q_rows:
        return spark.createDataFrame([], "qid string, doc_id long, vrank int")
    index_dir = ensure_retrieval_ann_index(spark, sf_dir)
    nbrs = batch_vs_ann_index(
        spark,
        spark.createDataFrame(q_rows),
        index_dir,
        nprobe=nprobe,
        top_k=depth,
    )
    qmap = spark.createDataFrame(
        [(qid, r.vec_id) for qid, r in zip(sorted(qids), q_rows)],
        "qid string, vec_id long",
    )
    return nbrs.join(F.broadcast(qmap), "vec_id").select(
        "qid",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("int").alias("vrank"),
    )


def _multi_rrf_fuse(text: DataFrame, vec: DataFrame) -> DataFrame:
    """Per-topic RRF fusion shared by the exact and indexed multi-topic
    hybrids: full-outer join on (qid, doc_id), the single hybrid's exact
    1/(K+rank) expression shapes, per-qid rank window over ≤ 2×depth
    rows per topic."""
    fused = text.join(vec, ["qid", "doc_id"], "full_outer").select(
        "qid",
        "doc_id",
        F.round(
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rnk")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("vrank")), F.lit(0.0)),
            9,
        ).alias("rrf"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rrf"), "doc_id")
    return (
        materialize(fused)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= MULTI_HYBRID_TOP)
        .select("qid", "doc_id", "rrf", "rank")
        .orderBy("qid", "rank")
    )


@register(
    "hybrid_multi_query_from_indexes",
    # NO oracle by design: the vector legs probe nprobe of k IVF lists —
    # approximate, so the driver records rows-only; correctness is the
    # per-topic overlap floors vs the exact multi-topic hybrid plus the
    # shared fusion algebra (tests/test_retrieval.py)
    doc="multi-topic hybrid served ENTIRELY from persisted indexes: N text legs from ONE postings scan, N cosine legs from ONE batched IVF probe (union of probed lists, one pruned scan) — rows-only with per-topic overlap floors vs the exact multi-topic hybrid",
)
def hybrid_multi_query_from_indexes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The thousand-topic curation hot path with ZERO corpus scans per
    invocation: text legs from the persisted postings (one pruned scan
    for all topics — bit-exact), vector legs from the persisted
    full-corpus IVF index (one batched probe for all topics —
    approximate by contract), fused per topic with the exact hybrid's
    algebra. This closes the round-9 gap where the multi-topic hybrid's
    vector leg re-scanned all embeddings per call; the exact multi-topic
    hybrid (`hybrid_multi_query_rrf`) stays as the hash-checked
    yardstick its overlap floors are measured against."""
    from pgcp_spark.functions.text_index import (
        BATCH_QUERIES,
        bm25_multi_query_from_index,
        ensure_text_index,
    )

    text = bm25_multi_query_from_index(
        spark, ensure_text_index(spark, sf_dir)
    ).select("qid", "doc_id", "rnk")
    # exact_below=0: this query's job is to prove the indexed machinery
    # (same rationale as hybrid_from_indexes)
    vec = multi_ann_cosine_legs(spark, sf_dir, sorted(BATCH_QUERIES), exact_below=0)
    return _multi_rrf_fuse(text, vec)


def _multi_hybrid_block(qid: str, terms: tuple, k: int) -> str:
    """One topic's fused oracle block: the batch-BM25 per-query block
    full-outer-joined with the k-th query vector's exact cosine top-k,
    RRF'd with the single-hybrid's exact expression shapes."""
    from pgcp_spark.functions.text_index import BATCH_TOP, _one_query_oracle_block

    return f"""
SELECT '{qid}' AS qid, f.doc_id, f.rrf,
       CAST(ROW_NUMBER() OVER (ORDER BY f.rrf DESC, f.doc_id) AS INT) AS rank
FROM (
  SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
         ROUND(
           COALESCE(1.0 / ({RRF_K} + t.rnk), 0)
           + COALESCE(1.0 / ({RRF_K} + v.vrank), 0), 9) AS rrf
  FROM (SELECT doc_id, rnk FROM ({_one_query_oracle_block(qid, terms)}) tq) t
  FULL OUTER JOIN (
    SELECT doc_id, vrank FROM (
      SELECT b.vec_id AS doc_id,
             ROW_NUMBER() OVER (ORDER BY
               ROUND(list_dot_product(CAST(b.embedding AS DOUBLE[]), q.q_emb)
                     / (sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) DESC, b.vec_id) AS vrank
      FROM valid b, (SELECT * FROM qvecs WHERE k = {k}) q
      WHERE b.vec_id <> q.vec_id
    ) WHERE vrank <= {BATCH_TOP}
  ) v ON t.doc_id = v.doc_id
) f
QUALIFY rank <= {MULTI_HYBRID_TOP}
"""


def _multi_hybrid_oracle() -> str:
    from pgcp_spark.functions.text_index import BATCH_QUERIES, CORPUS_CTES

    qids = sorted(BATCH_QUERIES)
    blocks = "\nUNION ALL\n".join(
        _multi_hybrid_block(qid, BATCH_QUERIES[qid], k)
        for k, qid in enumerate(qids)
    )
    return (
        "\nWITH "
        + CORPUS_CTES.rstrip().rstrip(",")
        + f""",
valid AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id IS NOT NULL AND {EMB_VALID_SQL}
),
qvecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS q_emb,
         CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS k
  FROM valid ORDER BY vec_id LIMIT {len(qids)}
)
"""
        + blocks
        + "\nORDER BY qid, rank\n"
    )


@register(
    "hybrid_multi_query_rrf",
    oracle=_multi_hybrid_oracle(),
    doc="multi-topic hybrid retrieval: 3 curation topics, text legs from ONE postings scan (persisted index), cosine legs from ONE corpus scan (3 deterministic query vectors), per-topic RRF fusion — hash-exact vs the per-topic oracle union",
)
def hybrid_multi_query_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The thousand-topic curation shape through BOTH modalities: every
    topic's keyword leg is answered by ONE shared postings scan
    (``bm25_multi_query_from_index`` — the batch economics proven in
    round 8) and every topic's dense leg by ONE shared corpus scan
    (``multi_cosine_legs``), then each topic fuses its own legs by RRF
    exactly like the single hybrid. Adding a topic adds a broadcast row
    and a window partition, not a scan — that is the whole point.
    Hash-checked end to end: both legs and the fusion are cross-engine
    deterministic, so even the multi-topic composite has a full SQL
    twin."""
    from pgcp_spark.functions.text_index import (
        BATCH_QUERIES,
        bm25_multi_query_from_index,
        ensure_text_index,
    )

    text = bm25_multi_query_from_index(
        spark, ensure_text_index(spark, sf_dir)
    ).select("qid", "doc_id", "rnk")
    vec = multi_cosine_legs(spark, sf_dir, sorted(BATCH_QUERIES))
    return _multi_rrf_fuse(text, vec)
