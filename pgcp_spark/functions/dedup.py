"""Deduplication operators over the ``documents`` table: exact, n-gram
Jaccard, MinHash+LSH banding, SimHash.

Training-data-pipeline dedup (BASELINE.json north star), all Spark-first:

  - exact dedup: hash-groupBy on a normalized fingerprint — one shuffle.
  - n-gram Jaccard: shingle inverted-index self-join (never O(n²) pairs;
    only docs sharing a shingle meet). At 100 TB hot shingles skew the
    join, so the REGISTERED variant drops high-document-frequency shingles
    before the self-join (``dedup_jaccard_hot_shingle_capped``); the
    uncapped exact form is unregistered, test-oracle-only.
  - MinHash+LSH: per-doc signatures via k seeded xxhash64 mins, banded so
    candidate pairs come from equi-joins on (band, band-hash) buckets.
  - SimHash: 64-bit signatures folded JVM-side with array expressions,
    candidates from 16-bit chunk banding (hamming ≤ 3 ⇒ some chunk equal).

Everything is built-in DataFrame expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.functions.similarity import EMB_VALID_SQL, valid_embedding
from pgcp_spark.plans.materialize import materialize
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table, load_table_parallel

JACCARD_THRESHOLD = 0.3
SHINGLE_WIDTH = 3


def _normalized(col: str = "text") -> Column:
    return F.trim(F.regexp_replace(F.lower(col), " +", " "))


def _shingles(toks: Column, width: int = SHINGLE_WIDTH) -> Column:
    """Distinct word n-gram shingles from a token array (JVM array ops).

    A doc shorter than ``width`` tokens has ZERO shingles — guarded
    explicitly because ``sequence(0, negative)`` is DESCENDING in Spark
    and would index out of bounds (ANSI error) on empty/whitespace/NULL
    text; DuckDB's ``range()`` is empty there, so the guard is also what
    keeps both engines on the same shingle set."""
    return F.when(
        F.size(toks) >= width,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - width),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j + 1) for j in range(width)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles_of(d: DataFrame) -> DataFrame:
    """(doc_id, shingle) exploded from any documents-shaped frame. Shared
    with the incremental index (functions/dedup_index.py) so the stored
    postings and a fresh batch's shingles come from one definition."""
    toks = F.split(_normalized(), " ")
    return d.select("doc_id", F.explode(_shingles(toks)).alias("shingle"))


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shingling + hashing dominates: spread docs across all cores
    return doc_shingles_of(load_table_parallel(spark, sf_dir, "documents"))


@register(
    "dedup_exact_documents",
    oracle="""
SELECT canonical_doc, n_copies, fingerprint
FROM (
  SELECT md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fingerprint,
         MIN(doc_id) AS canonical_doc,
         COUNT(*) AS n_copies
  FROM documents
  GROUP BY 1
)
ORDER BY canonical_doc
""",
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 fingerprint of normalized text → one survivor per
    group (hash-groupBy; single shuffle on the fingerprint)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(_normalized()).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_doc"), F.count("*").alias("n_copies"))
        .select("canonical_doc", "n_copies", "fingerprint")
        .orderBy("canonical_doc")
    )


# DuckDB twin of ``exact_jaccard_pairs`` below — kept so the exact
# generator stays oracle-checkable from tests even though it is no longer
# a registered query.
EXACT_JACCARD_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, UNNEST(list_distinct(list_transform(
           range(len(t) - {SHINGLE_WIDTH - 1}),
           i -> concat_ws(' ', t[i+1], t[i+2], t[i+3])))) AS shingle
  FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' ') AS t
        FROM documents)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.n_shared,
       CAST(i.n_shared AS DOUBLE) / (sa.sz + sb.sz - i.n_shared) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.n_shared AS DOUBLE) / (sa.sz + sb.sz - i.n_shared) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def exact_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-{3}-gram Jaccard ≥ threshold via an UNCAPPED
    shingle inverted-index self-join — MinHash's exactness oracle.

    NOT REGISTERED (quarantined in round 5): with no document-frequency cap
    the candidate-pair count is quadratic in the size of a hot-shingle
    bucket, so on a duplicate-heavy corpus (e.g. the 10×-replicated sf1
    lake, or any boilerplate-laden crawl at 100 TB) this blows up by
    design. Users get ``dedup_jaccard_hot_shingle_capped`` (identical
    semantics over the df-capped shingle universe);
    this exact form exists only so tests/test_dedup.py can measure MinHash
    recall against ground truth on the small correctness lake."""
    # The inverted index feeds three plan branches (sizes + both join sides);
    # materialize it once instead of re-shingling per branch.
    sh = _doc_shingles(spark, sf_dir).transform(materialize)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_shared").cast("double") / (F.col("sa.sz") + F.col("sb.sz") - F.col("n_shared"))
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", "n_shared", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


MINHASH_K = 32  # signature length
LSH_BANDS = 8  # 8 bands × 4 rows


def minhash_signatures(d: DataFrame) -> DataFrame:
    """(doc_id, sig array<long>) MinHash signatures (k=MINHASH_K, seeded
    xxhash64) for every doc with ≥ SHINGLE_WIDTH tokens.

    Hash each shingle STRING once (the expensive part), then derive the k
    signature hashes from the cheap 8-byte value — 1 string hash + k
    fixed-width hashes per shingle instead of k string hashes. Min-hashes
    are ROW-LOCAL: array_min over the doc's shingle-hash array — no
    explode, no shuffle, no aggregate. The sub-shingle-width guard filters
    on a CHEAP token count, not on size(g_arr): filters are pushed below
    the round-robin repartition, so a g_arr-dependent predicate would
    evaluate the whole shingle+hash pipeline on the single
    pre-repartition scan partition.

    Shared by the one-shot LSH query below and the persisted signature
    index (functions/dedup_index.py): signatures stored in the lake are
    bit-identical to freshly computed ones by construction.
    """
    g_arr = F.transform(_shingles(F.split(_normalized(), " ")), lambda s: F.xxhash64(s))
    sig_arr = F.array(
        *[
            F.array_min(F.transform(F.col("g_arr"), lambda g: F.xxhash64(F.lit(i), g)))
            for i in range(MINHASH_K)
        ]
    )
    return (
        d.filter(F.size(F.split(_normalized(), " ")) >= SHINGLE_WIDTH)
        .select("doc_id", g_arr.alias("g_arr"))
        .select("doc_id", sig_arr.alias("sig"))
    )


def band_buckets(sigs: DataFrame, bands: int) -> DataFrame:
    """(doc_id, band, bucket) — one row per LSH band, bucket = xxhash64 of
    that band's signature slice. ``bands`` must divide MINHASH_K; fewer
    rows per band (= more bands) raises recall at the banding threshold
    (1-(1-j^rows)^bands). Carries ids only: the exploded band exchange
    replicates every doc ``bands``×, so wide columns must never ride it
    (see the round-5 measurement in dedup_minhash_lsh_candidates)."""
    assert MINHASH_K % bands == 0, (MINHASH_K, bands)
    rows_per_band = MINHASH_K // bands
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[bi * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


@register(
    "dedup_minhash_lsh_candidates",
    oracle=None,  # xxhash64-seeded MinHash isn't reproducible in DuckDB SQL;
    # recall vs. the exact Jaccard pairs is asserted in tests/test_dedup.py
    doc="MinHash+LSH banding near-dup candidates (rows-only check)",
)
def dedup_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=32, seeded xxhash64) + LSH banding (8 bands ×
    4 rows): candidate pairs are docs sharing any band bucket, scored by
    estimated Jaccard (fraction of matching signature positions).

    Scale path: no pairwise work outside hash-equal buckets — two shuffles
    (signature groupBy, band self-join) regardless of corpus size.
    """
    # Signature build shared with the persisted index (minhash_signatures
    # above). Materialize the signatures (n_docs × k longs — tiny next to
    # the corpus) before the band self-join: without this the whole
    # shingle→hash→min pipeline runs TWICE, once per join side; the
    # production-shaped alternative — persist them to the lake and dedup
    # future batches against the stored index without recomputing the
    # corpus — is dedup_incremental_batch_vs_index (dedup_index.py).
    d = load_table_parallel(spark, sf_dir, "documents")
    sigs = minhash_signatures(d).transform(materialize)

    # Carry only (doc_id, band, bucket) through the exploded band self-join
    # — NOT the 32-long signature. The band exchange replicates every doc 8×
    # on both join sides, so each signature column rides the wire 16×; with
    # ids only, the exchange row shrinks from ~290 B to ~30 B and the
    # shuffle-bytes term that dominates at corpus scale drops ~10×.
    # Candidate pairs are distinct'd FIRST (multi-band collisions collapse
    # before any scoring work), then the surviving pairs re-attach their
    # signatures via two equi-joins against the materialized `sigs`
    # (no recompute — the blocks are already executor-side) for the exact
    # same row-local agreement score. Same rewrite as the similarity-LSH
    # bucket join (similarity.py), where it measured 36.0 → 14.3 s on a
    # 50k-vector lake. Here: pair-for-pair identical output at sf0.01/
    # sf0.1/sf1; 8.44 → 6.81 s median-of-5 at the 50k-doc sf1 lake. The
    # crossover is scale: at sf0.1 the two small re-joins cost ~0.15 s
    # more than the saved bytes — the shuffle-byte term they remove grows
    # with corpus size and signature width, the join overhead doesn't.
    bands = band_buckets(sigs, LSH_BANDS)

    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y), lambda m: m)
        ).cast("double")
        / MINHASH_K
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


SIMHASH_BITS = 64
SIMHASH_MAX_HAMMING = 3
# Chunk buckets larger than this are boilerplate-degenerate (a 16-bit
# chunk shared by hundreds of docs is a template signature, not a near-dup
# signal) and their pair count is quadratic in bucket size — measured at
# the 10×-replicated sf1 lake, the uncapped join OOM'd a 48 GB heap. The
# cap bounds per-bucket work to cap² pairs, the same mitigation as
# HOT_SHINGLE_DF_CAP; exact-duplicate groups (≈10 docs under the 10×
# replication artifact) sit far below it.
SIMHASH_BUCKET_CAP = 64


@register(
    "dedup_simhash_pairs",
    oracle=None,  # xxhash64-based SimHash isn't reproducible in DuckDB SQL;
    # invariants asserted in tests/test_dedup.py
    doc="SimHash near-dup pairs via 16-bit chunk banding (rows-only check)",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc (token-hash bit votes folded with array
    expressions), near-dup pairs = hamming distance ≤ 3, found by banding
    the signature into four 16-bit chunks (pigeonhole: distance ≤ 3 ⇒ at
    least one chunk identical — candidates come from chunk equi-joins,
    with degenerate hot buckets dropped first, see SIMHASH_BUCKET_CAP).
    """
    d = load_table_parallel(spark, sf_dir, "documents")  # 64-wide bit votes per row
    toks = F.array_distinct(F.split(_normalized(), " "))

    # per-token ±1 votes per bit, summed across tokens: fold token hashes
    # into a 64-length vote array JVM-side (bit positions are Python-side
    # literals because shiftright takes a constant shift amount)
    votes = F.aggregate(
        toks,
        F.array(*[F.lit(0).cast("long") for _ in range(SIMHASH_BITS)]),
        lambda acc, tok: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(F.xxhash64(tok), j).bitwiseAND(F.lit(1)) * 2 - 1
                    for j in range(SIMHASH_BITS)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    # simhash bits → four 16-bit chunk values
    bits = F.transform(votes, lambda v: (v > 0).cast("long"))
    chunk = [
        F.aggregate(
            F.slice(bits, c * 16 + 1, 16),
            F.lit(0).cast("long"),
            lambda acc, bval: acc * 2 + bval,
        ).alias(f"c{c}")
        for c in range(4)
    ]
    # materialize: the 64-hash-per-token vote fold is the expensive part and
    # feeds both sides of the chunk self-join
    sigs = d.select("doc_id", bits.alias("bits"), *chunk).transform(materialize)

    # explode to (doc_id, chunk_idx, chunk_val) so candidates come from an
    # EQUI-join on (chunk_idx, chunk_val) — an OR-of-chunk-equalities join
    # condition would degrade to a nested-loop join and never scale
    chunks = sigs.select(
        "doc_id",
        "bits",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("ci"), F.col(f"c{c}").alias("cv"))
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "bits", F.col("ch.ci").alias("ci"), F.col("ch.cv").alias("cv"))

    # drop degenerate hot buckets before the self-join (see cap rationale)
    small = (
        chunks.groupBy("ci", "cv")
        .agg(F.count("*").alias("bsz"))
        .filter(F.col("bsz") <= SIMHASH_BUCKET_CAP)
        .select("ci", "cv")
    )
    chunks = chunks.join(small, ["ci", "cv"])

    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.size(
        F.filter(F.zip_with(F.col("a.bits"), F.col("b.bits"), lambda x, y: x != y), lambda m: m)
    )
    # hamming computed per collision and filtered BEFORE the dedup-distinct
    # (same shuffle-bytes reasoning as the MinHash candidates): the
    # exchange carries (doc_a, doc_b, hamming) for surviving pairs only,
    # never the 64-long bit arrays.
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


HOT_SHINGLE_DF_CAP = 20  # drop shingles appearing in more docs than this

# DuckDB CTE chain for the df-capped inverted-index join, shared by the
# capped query's own oracle and the graph-family oracles (graph.py): the
# production edge source must be provably identical wherever it is reused.
_CAPPED_INTER_CTE = f"""sh0 AS (
  SELECT doc_id, UNNEST(list_distinct(list_transform(
           range(len(t) - {SHINGLE_WIDTH - 1}),
           i -> concat_ws(' ', t[i+1], t[i+2], t[i+3])))) AS shingle
  FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' ') AS t
        FROM documents)
),
keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= {HOT_SHINGLE_DF_CAP}),
sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""

# Exported: `pairs(doc_a, doc_b)` under the df cap — splice into a
# `WITH [RECURSIVE] {CAPPED_PAIRS_CTE}, ...` oracle.
CAPPED_PAIRS_CTE = f"""{_CAPPED_INTER_CTE},
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE CAST(i.n_shared AS DOUBLE) / (sa.sz + sb.sz - i.n_shared) >= {JACCARD_THRESHOLD}
)"""


def capped_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, n_shared, jaccard) under the df≤cap shingle universe,
    unsorted — the production near-dup pair generator. The graph family
    (functions/graph.py) builds its edges from this; the uncapped
    ``exact_jaccard_pairs`` (unregistered) exists only as MinHash's
    exactness oracle.
    """
    sh0 = _doc_shingles(spark, sf_dir)
    keep = (
        sh0.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= HOT_SHINGLE_DF_CAP)
        .select("shingle")
    )
    sh = sh0.join(keep, "shingle").transform(materialize)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_shared").cast("double") / (F.col("sa.sz") + F.col("sb.sz") - F.col("n_shared"))
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", "n_shared", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@register(
    "dedup_jaccard_hot_shingle_capped",
    oracle=f"""
WITH {_CAPPED_INTER_CTE}
SELECT i.doc_a, i.doc_b, i.n_shared,
       CAST(i.n_shared AS DOUBLE) / (sa.sz + sb.sz - i.n_shared) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.n_shared AS DOUBLE) / (sa.sz + sb.sz - i.n_shared) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
""",
)
def dedup_jaccard_hot_shingle_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION variant of the shingle inverted-index join: shingles
    whose document frequency exceeds HOT_SHINGLE_DF_CAP are dropped before
    the self-join. Boilerplate shingles ("all rights reserved ...") are
    exactly the skewed join keys that stall a cluster — a df cap bounds
    every bucket's pairwise work while barely moving Jaccard for real
    near-dups (their signal lives in rare shingles). Jaccard is computed
    over the capped shingle universe on both sides, so the oracle matches
    exactly.
    """
    return capped_jaccard_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


EMB_DUP_THRESHOLD = 0.4  # random 64-dim corpus: max pairwise cos ≈ 0.51
# Block-count tuning for the exact block-matmul grid. B must rise with the
# corpus so a packed block row stays executor-sized (memory bound), and
# must give enough grid cells B(B+1)/2 to feed every core (cpu bound);
# past that, larger B only inflates the O(B·n) block-replication traffic.
EMB_BLOCK_TARGET_ROWS = 4096  # ~2 MB of 64-dim float64 vectors per block row
EMB_BLOCK_MIN_ROWS = 1024  # below this a cell's matmul is overhead-dominated
EMB_BLOCKS_MIN = 1
EMB_BLOCKS_MAX = 64


def _emb_blocks(
    n_vecs: int,
    parallelism: int,
    target_rows: int = EMB_BLOCK_TARGET_ROWS,
    min_rows: int = EMB_BLOCK_MIN_ROWS,
) -> int:
    import math

    by_mem = math.ceil(n_vecs / target_rows)
    # smallest B with B(B+1)/2 >= 2*parallelism (two grid cells per core) —
    # but never fragment blocks below EMB_BLOCK_MIN_ROWS vectors: on a
    # small corpus, per-task + Arrow round-trip overhead beats the matmul
    # (measured at sf0.1/5k vectors: B=11 → 2.9 s vs B=4 → 1.5 s), and a
    # big numpy matmul is already the fastest way through a small cell.
    by_cpu = math.ceil((math.sqrt(1 + 16 * parallelism) - 1) / 2)
    by_cpu = min(by_cpu, max(1, n_vecs // min_rows))
    # EMB_BLOCKS_MAX bounds only the CPU-driven fan-out (communication is
    # O(B·n)); the MEMORY bound is never capped — a packed row larger than
    # target_rows is an executor OOM at scale, while extra replication
    # traffic is merely the inherent cost of exact quadratic work.
    return max(EMB_BLOCKS_MIN, by_mem, min(EMB_BLOCKS_MAX, by_cpu))


def _grid_cell_pairs(threshold: float):
    """mapInPandas kernel shared by the exact block-matmul query and
    SemDeDup's within-cluster sub-grid: one float64 numpy matmul per
    grid cell (columns ``block_a ids_a vecs_a block_b ids_b vecs_b``).
    A diagonal cell (block_a == block_b) carries both orientations, so
    it keeps id_a < id_b; an off-diagonal cell sees each unordered pair
    exactly once (the mirrored cell is not in the grid) and orients by
    min/max. Per-pair dots are blocking-independent, which is what makes
    sub-blocked results bit-identical to unblocked ones."""
    import numpy as np
    import pandas as pd

    def block_pairs(batches):
        for batch in batches:
            for _, row in batch.iterrows():
                ma = np.array(row["vecs_a"].tolist(), dtype=np.float64)
                mb = np.array(row["vecs_b"].tolist(), dtype=np.float64)
                ia = np.asarray(row["ids_a"], dtype=np.int64)
                ib = np.asarray(row["ids_b"], dtype=np.int64)
                na = np.sqrt((ma * ma).sum(axis=1))
                nb = np.sqrt((mb * mb).sum(axis=1))
                sims = np.round((ma @ mb.T) / (na[:, None] * nb[None, :]), 6)
                if row["block_a"] == row["block_b"]:
                    keep = (sims >= threshold) & (ia[:, None] < ib[None, :])
                else:
                    keep = sims >= threshold
                xi, yi = np.nonzero(keep)
                if len(xi):
                    lo = np.minimum(ia[xi], ib[yi])
                    hi = np.maximum(ia[xi], ib[yi])
                    yield pd.DataFrame(
                        {"vec_a": lo, "vec_b": hi, "cos_sim": sims[xi, yi]}
                    )

    return block_pairs


@register(
    "dedup_embedding_cosine_pairs",
    oracle=f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
             6) AS cos_sim
FROM (SELECT * FROM embeddings WHERE {EMB_VALID_SQL}) a
JOIN (SELECT * FROM embeddings WHERE {EMB_VALID_SQL}) b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
            / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
            6) >= {EMB_DUP_THRESHOLD}
ORDER BY vec_a, vec_b
""",
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: EXACT all-pairs cosine ≥ threshold via
    distributed block matmul (the exactness companion to
    ``sim_cosine_lsh_pairs``; north-star 'embedding-cosine near-dup').

    Scale shape: the corpus is hashed into B blocks; each block's vectors
    are packed into ONE row (id list + matrix); the B(B+1)/2 block-pair
    grid is the join output — communication O(B·n), not O(n²) row pairs —
    and each grid cell does a single vectorized numpy float64 matmul.
    B auto-tunes from the corpus row count (one metadata-cheap count())
    and session parallelism via ``_emb_blocks``: enough blocks that a
    packed row stays ~EMB_BLOCK_TARGET_ROWS vectors AND the grid feeds
    every core, capped because communication grows O(B·n). The all-pairs
    work is still quadratic — that is inherent to EXACT near-dup; the
    LSH/IVF variants are the subquadratic approximate path.
    """
    e = (
        load_table_parallel(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(valid_embedding())  # same corpus contract as similarity.py
    )
    blocks = _emb_blocks(e.count(), spark.sparkContext.defaultParallelism)
    packed = (
        e.groupBy((F.col("vec_id") % blocks).alias("block"))
        .agg(
            F.collect_list("vec_id").alias("ids"),
            F.collect_list("embedding").alias("vecs"),
        )
        .transform(materialize)  # feeds both sides of the grid self-join
    )
    a, b = packed.alias("a"), packed.alias("b")
    grid = a.join(b, F.col("a.block") <= F.col("b.block")).select(
        F.col("a.block").alias("block_a"),
        F.col("a.ids").alias("ids_a"),
        F.col("a.vecs").alias("vecs_a"),
        F.col("b.block").alias("block_b"),
        F.col("b.ids").alias("ids_b"),
        F.col("b.vecs").alias("vecs_b"),
    )

    out = grid.repartition(blocks * (blocks + 1) // 2).mapInPandas(
        _grid_cell_pairs(EMB_DUP_THRESHOLD),
        schema="vec_a long, vec_b long, cos_sim double",
    )
    return out.orderBy("vec_a", "vec_b")


# --- SemDeDup: clustered semantic dedup (round 10) -------------------------
SEMDEDUP_K = 16  # coarse clusters — the blocking key for pair generation
SEMDEDUP_PROBES = 2  # clusters each vector joins (multi-assignment)


def semantic_cluster_pairs(
    spark: SparkSession,
    corpus: DataFrame,
    k: int = SEMDEDUP_K,
    probes: int = SEMDEDUP_PROBES,
    threshold: float = EMB_DUP_THRESHOLD,
    block_target_rows: int = EMB_BLOCK_TARGET_ROWS,
    block_min_rows: int = EMB_BLOCK_MIN_ROWS,
) -> DataFrame:
    """Within-cluster near-dup pairs, the SemDeDup recipe (Abbas et al.
    2023, arXiv:2303.09540): k-means the embeddings, then score pairs
    ONLY inside shared clusters — pairwise work drops from n² to Σ n_c²
    and the lost pairs are exactly the never-co-clustered ones, which the
    method bets are below threshold. ``probes`` is the multi-assignment
    extension (each vector joins its top-``probes`` clusters by cosine,
    the LSH-multi-probe trade applied to clustering): on this corpus the
    measured frontier is recall 0.34 at 6% of all-pairs work for
    (k=16, m=1) vs 0.70 at 25% for (k=16, m=2) — single assignment is
    cheap but loses boundary pairs, and this synthetic corpus is
    adversarially hard for the method (its ≥0.4 band on random 64-dim
    vectors is barely above background, where real near-dup corpora pair
    at 0.9+ and co-cluster far more reliably; SCALE.md r10). ``k=1``
    degenerates to the exact all-pairs kernel (no fit, one cluster) —
    the family's all-lists==exact pin.

    The cluster is a BLOCKING key, and within each cluster the vectors
    SUB-BLOCK into a B_c(B_c+1)/2 grid — block key
    ``(cluster, vec_id % B_c)`` with B_c derived per cluster by the same
    ``_emb_blocks`` rule as the exact query — so per-task memory is
    bounded by ~``block_target_rows`` vectors regardless of how skewed
    the clustering is (one row per cluster would be corpus/k vectors in
    one executor row: an OOM at 100 TB, not a slowdown). Cells score with
    the shared ``_grid_cell_pairs`` float64 kernel (per-pair dots don't
    depend on the blocking, so sub-blocked == unblocked bit-for-bit and
    k=1 IS the exact query — same grid, same cells), then multi-assigned
    duplicates collapse by max (values are equal). The KMeans fit is the
    IVF family's cosine geometry (seed 42), and assignment reuses the IVF
    probe kernel (``ann_index._assign`` — one numpy matmul per Arrow
    batch against the broadcast centroid matrix); treeAggregate reduction
    jitter can flip boundary assignments between runs, so the registered
    query is rows-only with jitter-robust pins (subset-of-exact, recall
    floor) in tests.
    """
    import numpy as np

    corpus = corpus.select("vec_id", "embedding").filter(valid_embedding())
    # the IVF build's degenerate-corpus guard: a fit needs ≥2 distinct
    # points and k capped at the distinct count, else everything is one
    # cluster (empty/degenerate lakes — exactness unchanged, the blocking
    # just stops pruning)
    nd = corpus.agg(
        F.countDistinct(F.xxhash64("embedding")).alias("nd")
    ).collect()[0]["nd"]
    if k <= 1 or nd < 2:
        assigned = corpus.withColumn("cluster", F.lit(0))
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        from pgcp_spark.functions.ann_index import _assign

        vecs = corpus.withColumn(
            "features", array_to_vector(F.col("embedding").cast("array<double>"))
        )
        model = KMeans(
            k=int(min(k, nd)),
            seed=42,
            maxIter=10,
            distanceMeasure="cosine",
            featuresCol="features",
            predictionCol="cluster",
        ).fit(vecs)
        centroids = np.stack(model.clusterCenters())
        assigned = _assign(corpus, centroids, nprobe=probes).withColumnRenamed(
            "list_id", "cluster"
        )
    # Within-cluster SUB-BLOCKING (the 100 TB memory bound): a cluster is
    # corpus/k-sized, so packing it into one row is unbounded per-executor
    # state. Instead each cluster gets its own B_c(B_c+1)/2 sub-grid —
    # block key (cluster, vec_id % B_c) — with B_c derived per cluster by
    # the SAME rule the exact query uses (_emb_blocks: packed rows stay
    # ~target_rows vectors; CPU share weighted by the cluster's n_c²
    # fraction of the quadratic work so small clusters stay at B_c=1 and
    # one giant skewed cluster fans out across the whole session). Cluster
    # sizes are a ≤k-row aggregate — a bounded driver collect.
    import math

    sizes = {
        r["cluster"]: r["n"]
        for r in assigned.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    if not sizes:
        return spark.createDataFrame(
            [], "vec_a long, vec_b long, cos_sim double"
        )
    par = spark.sparkContext.defaultParallelism
    total_sq = sum(n * n for n in sizes.values()) or 1
    bcs = {
        c: _emb_blocks(
            n,
            max(1, math.ceil(par * n * n / total_sq)),
            target_rows=block_target_rows,
            min_rows=block_min_rows,
        )
        for c, n in sizes.items()
    }
    bmap = F.create_map(*[F.lit(x) for kv in bcs.items() for x in kv])
    packed = (
        assigned.withColumn("sblock", F.col("vec_id") % bmap[F.col("cluster")])
        .groupBy("cluster", "sblock")
        .agg(
            F.collect_list("vec_id").alias("ids"),
            F.collect_list("embedding").alias("vecs"),
        )
        .transform(materialize)  # feeds both sides of the sub-grid self-join
    )
    a, b = packed.alias("a"), packed.alias("b")
    grid = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("a.sblock") <= F.col("b.sblock")),
    ).select(
        F.col("a.sblock").alias("block_a"),
        F.col("a.ids").alias("ids_a"),
        F.col("a.vecs").alias("vecs_a"),
        F.col("b.sblock").alias("block_b"),
        F.col("b.ids").alias("ids_b"),
        F.col("b.vecs").alias("vecs_b"),
    )
    cells = sum(bc * (bc + 1) // 2 for bc in bcs.values())
    return (
        grid.repartition(max(cells, 1))
        .mapInPandas(
            _grid_cell_pairs(threshold),
            schema="vec_a long, vec_b long, cos_sim double",
        )
        # a pair sharing BOTH probed clusters appears twice with equal sims
        .groupBy("vec_a", "vec_b")
        .agg(F.max("cos_sim").alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )


@register(
    "dedup_semantic_clustered_pairs",
    # rows-only BY DESIGN: the cluster assignment comes from a distributed
    # KMeans fit whose treeAggregate reduction order is not bit-stable, so
    # no SQL twin can reproduce the blocking; the approximation contracts
    # (pairs ⊆ exact, recall floor vs the exact all-pairs query, k=1 ==
    # exact bit-identical) are pinned in tests/test_dedup.py.
    doc=(
        "SemDeDup semantic near-dup: cosine-KMeans clusters as the blocking key "
        "(top-2 multi-assignment), within-cluster float64 pair scoring — ~25% of "
        "all-pairs work at measured recall 0.70, pairs ⊆ exact, recall floor "
        "pinned; k=1 degenerates to the exact kernel bit-identically"
    ),
)
def dedup_semantic_clustered_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered SemDeDup query over the embeddings table (same corpus
    contract and threshold as the exact blocked-matmul query, so the two
    results are directly comparable)."""
    return semantic_cluster_pairs(
        spark, load_table_parallel(spark, sf_dir, "embeddings")
    )
