"""Streaming data-quality gate: the expectations layer's ingest loop.

Completes the quality gate's streaming form the way every feature here
gets one (dedup/ANN/text/sketch/view loops): crawl-day document batches
stream in, each micro-batch splits through the SAME
``sources/quality.apply_expectations`` rules as the batch gate, passing
rows land on the main lake table as O(batch) merge-on-read deltas and
violating rows land on the quarantine table with their ``_violations``
array — so the curated corpus and its reject pile both track the stream
with batch latency, and nothing unvetted ever reaches a reader of the
main table.

    readStream(files) ──► foreachBatch:
        passing, quarantined, metrics = apply_expectations(batch, RULES)
        append_delta(passing, main)      + maybe_flatten cadence
        append_delta(quarantined, quar)

Invariance comes free from the gate's shape: the rules are ROW-LOCAL
expressions, so each row's verdict is independent of which micro-batch
delivered it — availableNow-in-one-trigger produces bit-identical main
and quarantine tables to day-at-a-time (pinned), and the whole pipeline
has an exact SQL twin (the registered query is hash-green). At-least-
once replay converges through the delta layer's newest-wins key
resolution, the ingest-loop family's standard argument.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.indexes import loop
from pgcp_spark.plans.materialize import materialize
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table_parallel
from pgcp_spark.sources.lake import (
    append_delta,
    current_snapshot,
    read_current_with_deltas,
    write_snapshot,
)
from pgcp_spark.sources.quality import Expectation, apply_expectations

N_STREAM_BATCHES = 3  # crawl "days": seq = doc_id % 3 (whole corpus streams)
MIN_CHARS = 100


def _rules() -> list[Expectation]:
    """The gate: too-short docs and text/metadata inconsistency DROP to
    quarantine (the second fires on NULL text — the not-TRUE null rule);
    non-English docs only WARN (counted, kept — a mix-control signal,
    not a filter)."""
    return [
        Expectation("min_length", F.col("n_chars") >= MIN_CHARS, "drop"),
        Expectation(
            "chars_consistent", F.col("n_chars") == F.length("text"), "drop"
        ),
        Expectation("english", F.col("lang") == "en", "warn"),
    ]


def fold_quality_batch(
    spark: SparkSession, batch: DataFrame, main_dir: str, quar_dir: str
) -> None:
    """One micro-batch through the gate; both sides land merge-on-read
    (first batch writes the base snapshot, later batches append deltas
    keyed doc_id — replay-idempotent via newest-wins)."""
    passing, quarantined, _metrics = apply_expectations(batch, _rules())
    for df, tdir in ((passing, main_dir), (quarantined, quar_dir)):
        if current_snapshot(tdir) is None:
            write_snapshot(df, tdir)
        else:
            append_delta(df, tdir)
    loop.maybe_flatten(spark, main_dir, key=["doc_id"])


def run_ingest_quality(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = 1
) -> tuple[str, str]:
    """Stream the documents table as crawl-day files through the gate;
    returns (main_dir, quarantine_dir). Caller owns both."""
    docs = load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    main_dir = tempfile.mkdtemp(prefix="pgcp_ingest_q_main_")
    quar_dir = tempfile.mkdtemp(prefix="pgcp_ingest_q_quar_")
    staging = None
    try:
        staging = loop.stage_group_files(
            docs,
            F.expr(f"doc_id % {N_STREAM_BATCHES}"),
            range(N_STREAM_BATCHES),
            "pgcp_ingest_quality_stream_",
        )
        loop.run_availablenow_stream(
            spark,
            staging,
            docs.schema,
            lambda b, _bid: fold_quality_batch(spark, b, main_dir, quar_dir),
            max_files_per_trigger,
        )
    except BaseException:
        shutil.rmtree(main_dir, ignore_errors=True)
        shutil.rmtree(quar_dir, ignore_errors=True)
        raise
    finally:
        if staging is not None:
            shutil.rmtree(staging, ignore_errors=True)
    return main_dir, quar_dir


_STREAM_QUALITY_ORACLE = f"""
SELECT doc_id, source, n_chars,
       NOT COALESCE(n_chars >= {MIN_CHARS}, FALSE) AS v_min_length,
       NOT COALESCE(n_chars = LENGTH(text), FALSE) AS v_chars_consistent,
       NOT COALESCE(lang = 'en', FALSE) AS v_english
FROM documents
WHERE NOT COALESCE(n_chars >= {MIN_CHARS}, FALSE)
   OR NOT COALESCE(n_chars = LENGTH(text), FALSE)
ORDER BY doc_id
"""


@register(
    "streaming_quality_quarantine_docs",
    oracle=_STREAM_QUALITY_ORACLE,
    doc=(
        "streaming data-quality gate: crawl-day batches split through the "
        "expectations rules in foreachBatch, passing rows to the main lake and "
        "violators to quarantine (both merge-on-read) — the stream-built "
        "quarantine is hash-exact vs the rules recomputed over the whole corpus, "
        "because row-local verdicts are batch-boundary-free by construction"
    ),
)
def streaming_quality_quarantine_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality loop end to end: stream all crawl days, gate each
    batch, answer from what the STREAM built (the quarantine table,
    violations unpacked to per-rule booleans — the batch gate query's
    output convention)."""
    main_dir, quar_dir = run_ingest_quality(spark, sf_dir)
    try:
        quar = read_current_with_deltas(spark, quar_dir, key=["doc_id"])
        result = materialize(
            quar.select(
                "doc_id",
                "source",
                "n_chars",
                F.array_contains("_violations", "min_length").alias("v_min_length"),
                F.array_contains("_violations", "chars_consistent").alias(
                    "v_chars_consistent"
                ),
                F.array_contains("_violations", "english").alias("v_english"),
            ).orderBy("doc_id")
        )
    except BaseException:
        shutil.rmtree(main_dir, ignore_errors=True)
        shutil.rmtree(quar_dir, ignore_errors=True)
        raise
    loop.reclaim_by_mode(main_dir, quar_dir)
    return result
