"""End-to-end training-data preparation pipeline over ``documents``.

The individual stages (quality filter, exact dedup, deterministic sample,
corpus stats) each exist as standalone operators; this composes them into
the single DataFrame plan a real corpus-prep job would run, proving the
stages fuse: Catalyst pipelines the filter into the scan, the dedup window
and nothing else shuffles, and the whole job is one pass over the corpus
plus one fingerprint shuffle.

Scale: filter → window-dedup → hash-sample → aggregate is THE canonical
100 TB shape — the only wide ops are the fingerprint window (one shuffle,
keyed on a uniform hash, no skew) and the tiny per-language aggregate.
Everything else is map-side and whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgcp_spark.functions.sampling import KNUTH, MOD
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table

MIN_TOKENS = 10
MIN_CHARS = 50
KEEP_FRACTION = 0.5


@register(
    "pipeline_training_data_prep",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, lang, n_chars,
         trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS ntext
  FROM documents
),
quality AS (
  SELECT *, len(string_split(ntext, ' ')) AS n_tokens
  FROM norm
  WHERE len(string_split(ntext, ' ')) >= {MIN_TOKENS} AND n_chars >= {MIN_CHARS}
),
deduped AS (
  SELECT * FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(ntext)) AS canon FROM quality
  ) WHERE doc_id = canon
),
sampled AS (
  SELECT * FROM deduped
  WHERE (doc_id * {KNUTH}) % {MOD} < {KEEP_FRACTION} * {MOD}
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM sampled
GROUP BY lang
ORDER BY lang
""",
)
def pipeline_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-prep pipeline: quality gate (min tokens/chars) →
    exact dedup (min-doc_id survivor per md5 fingerprint) → deterministic
    hash-threshold sample → per-language corpus stats.

    One logical plan end-to-end: the quality filter is pushed into the
    parquet scan, dedup is a single window over the fingerprint shuffle,
    the sample is a map-side filter, and the final aggregate is partial
    before its 5-group shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    ntext = F.trim(F.regexp_replace(F.lower("text"), " +", " "))
    staged = d.select(
        "doc_id",
        "lang",
        "n_chars",
        ntext.alias("ntext"),
        F.size(F.split(ntext, " ")).alias("n_tokens"),
    ).filter((F.col("n_tokens") >= MIN_TOKENS) & (F.col("n_chars") >= MIN_CHARS))
    canon = F.min("doc_id").over(Window.partitionBy(F.md5("ntext")))
    deduped = staged.withColumn("canon", canon).filter(F.col("doc_id") == F.col("canon"))
    sampled = deduped.filter(
        (F.col("doc_id") * F.lit(KNUTH)) % F.lit(MOD) < int(KEEP_FRACTION * MOD)
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )
