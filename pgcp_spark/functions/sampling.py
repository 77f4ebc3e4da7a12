"""Sampling operators for training-data pipelines.

A 100 TB corpus is rarely consumed whole: pipelines downsample per-stratum
(language, source, quality band) to hit a token budget while keeping the
strata proportions — and the sample must be DETERMINISTIC so reruns and
incremental builds select the same rows. Spark's ``df.sample`` is seeded per
partition (repartition changes the sample), so these operators derive the
randomness from the data itself: a multiplicative integer hash of the key,
reproducible in any engine (the DuckDB oracle computes the same integers).

The reference (holistics/pgcp) has no sampling; this extends the analytics
layer mandated by BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgcp_spark.registry import register
from pgcp_spark.sources import load_table

SAMPLE_FRACTION = 0.2
KNUTH = 2654435761  # 2^32 / golden ratio — multiplicative hash constant
MOD = 4294967296  # 2^32


@register(
    "sample_stratified_documents",
    oracle=f"""
WITH keyed AS (
  SELECT lang, doc_id,
         (doc_id * {KNUTH}) % {MOD} AS hkey,
         COUNT(*) OVER (PARTITION BY lang) AS n_lang
  FROM documents
),
ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hkey, doc_id) AS rn,
         n_lang
  FROM keyed
)
SELECT lang, doc_id, CAST(rn AS BIGINT) AS sample_rank
FROM ranked
WHERE rn <= CEIL({SAMPLE_FRACTION} * n_lang)
ORDER BY lang, sample_rank
""",
)
def sample_stratified_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: keep the same FRACTION of every
    language stratum, selecting rows by a multiplicative hash of doc_id
    (uniform, engine-independent, rerun-stable) rather than Spark's
    partition-seeded ``sample``.

    Scale: one shuffle on the stratum key; rank + count share the same
    window partitioning. For strata too large for a single partition's
    window sort, swap ROW_NUMBER for a threshold on the hash itself
    (hkey < fraction * 2^32) — constant-time, no sort — at the cost of a
    binomially-distributed (not exact) per-stratum count.
    """
    d = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    hkey = (F.col("doc_id") * F.lit(KNUTH)) % F.lit(MOD)
    w = Window.partitionBy("lang")
    keyed = d.select(
        "lang",
        "doc_id",
        hkey.alias("hkey"),
        F.count("*").over(w).alias("n_lang"),
    )
    rn = F.row_number().over(w.orderBy("hkey", "doc_id"))
    return (
        keyed.withColumn("rn", rn)
        .filter(F.col("rn") <= F.ceil(SAMPLE_FRACTION * F.col("n_lang")))
        .select("lang", "doc_id", F.col("rn").cast("long").alias("sample_rank"))
        .orderBy("lang", "sample_rank")
    )


@register(
    "sample_hash_threshold_events",
    oracle=f"""
SELECT user_id, event_id, event_type
FROM events
WHERE (event_id * {KNUTH}) % {MOD} < {SAMPLE_FRACTION} * {MOD}
ORDER BY event_id
""",
)
def sample_hash_threshold_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-threshold sampling: keep a row iff hash(key) falls below
    fraction·2^32 — the constant-time, shuffle-free variant (a map-side
    filter fused into the scan; no window, no sort, no shuffle). This is
    the 100 TB default; the stratified variant above is for exact
    per-stratum counts.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type")
    hkey = (F.col("event_id") * F.lit(KNUTH)) % F.lit(MOD)
    return e.filter(hkey < int(SAMPLE_FRACTION * MOD)).orderBy("event_id")


# weight-proportional Bernoulli sampling: P(include) = min(1, n_chars/WEIGHT_SCALE)
WEIGHT_SCALE = 600  # chars at which inclusion probability saturates at 1


@register(
    "sample_weighted_bernoulli_documents",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         (doc_id * {KNUTH}) % {MOD} AS hkey
  FROM documents
),
sampled AS (
  SELECT doc_id, source, n_chars
  FROM keyed
  WHERE hkey * {WEIGHT_SCALE} < n_chars * {MOD}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM sampled
GROUP BY source
ORDER BY source
""",
)
def sample_weighted_bernoulli_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional Bernoulli sample: each doc is kept with
    probability min(1, n_chars/WEIGHT_SCALE) — longer docs (more training
    tokens) are proportionally more likely to survive, the standard
    size-weighted downsampling step of a corpus pipeline.

    The coin flip is the repo's multiplicative doc_id hash compared against
    the weight — ALL-INTEGER arithmetic (hkey·SCALE < n_chars·2^32), so the
    decision is bit-identical in any engine, rerun-stable, and shuffle-free:
    the filter evaluates at the scan, and the only exchange is the per-source
    reporting aggregate.
    """
    d = load_table(spark, sf_dir, "documents")
    hkey = (F.col("doc_id") * F.lit(KNUTH)) % F.lit(MOD)
    return (
        d.filter(hkey * WEIGHT_SCALE < F.col("n_chars") * MOD)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )
