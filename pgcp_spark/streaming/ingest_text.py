"""Streaming text-index maintenance: the BM25 family's ingest loop.

Completes the per-family streaming story (dedup → ``ingest_dedup``, ANN
→ ``ingest_ann``, HLL sketches → ``run_streaming_sketch_maintenance``):
documents arrive as a stream of crawl-day files; each micro-batch folds
into the lake-persisted inverted index (``functions/text_index.py``)
through the same whole-document-replacement MERGE the batch fold uses,
and after the stream drains the index answers ranked retrieval exactly
like a batch-built one.

    readStream(files) ──► foreachBatch: fold_text_batch
        first batch  → build (nothing committed yet)
        later batches → update_text_index (replace-by-doc MERGE,
                        integer-delta stats fold)

Invariance contracts, inherited from the fold's algebra rather than
re-proven per loop:

- **Batch-boundary invariance**: folding is per-document replacement
  with corpus stats folded by exact integer deltas, and document
  tokenization is row-local — so the EFFECTIVE postings/doclen/stats
  are a pure function of the SET of delivered documents, independent of
  how the file source groups days into micro-batches (pinned:
  availableNow-in-one-batch == day-at-a-time, content bit-exact). The
  PHYSICAL base/delta split legitimately differs by granularity since
  round 9 — each fold is an appended delta partition, so day-at-a-time
  leaves N-1 deltas where one-batch leaves none; compaction converges
  the files too.
- **At-least-once replay**: re-delivering a folded batch replaces
  identical rows with identical rows and adds a zero stats delta
  (``update_text_index``'s replay pin), so a crash between fold and
  checkpoint commit converges on re-execution.
- **fold == rebuild bit-exact** (tests/test_text_index.py), so the
  stream-built index hash-matches the ONE-SHOT BM25 oracle — the
  registered query below is the rare streaming pipeline whose end state
  is exactly SQL-checkable.

Built entirely on the shared harness (``indexes/loop.py``): staged
whole-day files with fixed mtimes, the availableNow foreachBatch
runner, materialization-mode-aware reclamation — zero new plumbing,
which is the point of round 8's extraction.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.functions.text import BM25_ORACLE
from pgcp_spark.functions.text_index import (
    bm25_from_index,
    build_text_index_from,
    update_text_index,
)
from pgcp_spark.indexes import loop
from pgcp_spark.plans.materialize import materialize
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table_parallel
from pgcp_spark.sources.lake import current_snapshot

N_STREAM_BATCHES = 3  # crawl "days": seq = doc_id % 3 (whole corpus streams)


def _seq_col():
    return F.expr(f"doc_id % {N_STREAM_BATCHES}")


def fold_text_batch(spark: SparkSession, batch: DataFrame, index_dir: str) -> None:
    """One micro-batch: build on first contact, replace-by-doc MERGE
    after. Replay-idempotent (module docstring). The fold lands as an
    appended delta; ``loop.maybe_flatten`` keeps the steady state
    self-healing — every FLATTEN_MAX_DELTAS-th batch pays the deferred
    merge so deltas (and their compounding read tax) never accumulate
    without bound."""
    if current_snapshot(f"{index_dir}/postings") is None:
        build_text_index_from(spark, batch, index_dir)
    else:
        update_text_index(spark, batch, index_dir)
        loop.maybe_flatten(
            spark,
            f"{index_dir}/postings",
            key=["doc_id"],
            cluster_by=["tok"],
            cluster_files=spark.sparkContext.defaultParallelism,
        )


def run_ingest_text(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = 1
) -> str:
    """Stream the WHOLE documents table as per-day files into a fresh
    index dir; return the dir. ``max_files_per_trigger=None`` lets
    availableNow swallow every day in one micro-batch — the final
    tables must come out bit-identical (pinned in
    tests/test_ingest_text.py). The caller owns the returned dir."""
    docs = load_table_parallel(spark, sf_dir, "documents").select("doc_id", "text")
    index_dir = tempfile.mkdtemp(prefix="pgcp_ingest_text_index_")
    staging = None
    try:
        staging = loop.stage_group_files(
            docs, _seq_col(), range(N_STREAM_BATCHES), "pgcp_ingest_text_stream_"
        )
        loop.run_availablenow_stream(
            spark,
            staging,
            docs.schema,
            lambda batch, _bid: fold_text_batch(spark, batch, index_dir),
            max_files_per_trigger,
        )
    except BaseException:
        shutil.rmtree(index_dir, ignore_errors=True)
        raise
    finally:
        if staging is not None:
            shutil.rmtree(staging, ignore_errors=True)
    return index_dir


@register(
    "streaming_text_index_bm25",
    # the stream-built index must answer EXACTLY like the one-shot
    # recompute over the whole corpus: fold == rebuild is bit-exact and
    # the scoring path is shared, so the one-shot oracle applies
    # unchanged — a streaming pipeline with a full SQL twin.
    oracle=BM25_ORACLE,
    doc="streaming text-index maintenance: documents stream in as crawl-day files, each micro-batch folds into the persisted BM25 index (build-then-MERGE), final index answers the fixed query hash-exact vs the one-shot oracle",
)
def streaming_text_index_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 family's streaming loop end to end (module docstring):
    stream all crawl days, fold each into the index, answer the fixed
    ranked-retrieval query from what the STREAM built."""
    index_dir = run_ingest_text(spark, sf_dir)
    try:
        result = materialize(bm25_from_index(spark, index_dir))
    except BaseException:
        shutil.rmtree(index_dir, ignore_errors=True)
        raise
    loop.reclaim_by_mode(index_dir)
    return result
