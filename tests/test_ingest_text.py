"""Streaming text-index maintenance (`streaming/ingest_text.py`):
batch-boundary invariance (one-batch == day-at-a-time, bit-exact),
stream-built == batch-built, and the registered query vs the one-shot
oracle (the streaming pipeline with a full SQL twin)."""

from __future__ import annotations

import os
import shutil

import duckdb
from pyspark.sql import functions as F

import pgcp_spark.functions.text_index as TI
from pgcp_spark.functions.text import BM25_ORACLE
from pgcp_spark.functions.text_index import build_text_index_from
from pgcp_spark.sources import lake, load_table
from pgcp_spark.streaming.ingest_text import (
    run_ingest_text,
    streaming_text_index_bm25,
)
from tests.conftest import SF_DIR, SF_DIR_CORRECTNESS


def _table_rows(spark, index_dir, t):
    """EFFECTIVE content: postings through the merge-on-read view (folds
    land as appended deltas since round 9, so the PHYSICAL base/delta
    split depends on trigger granularity by design — one-by-one leaves
    N-1 deltas, all-at-once none; what must be invariant is the content
    queries see)."""
    order = {"postings": ["tok", "doc_id"], "doclen": ["doc_id"], "stats": ["metric"]}[t]
    if t == "postings":
        return [
            tuple(r)
            for r in TI.stored_postings(spark, index_dir).orderBy(*order).collect()
        ]
    return [
        tuple(r)
        for r in lake.read_current(spark, os.path.join(index_dir, t))
        .orderBy(*order)
        .collect()
    ]


def test_stream_built_equals_batch_built_and_boundary_invariant(spark, tmp_path):
    one_by_one = run_ingest_text(spark, SF_DIR, max_files_per_trigger=1)
    all_at_once = run_ingest_text(spark, SF_DIR, max_files_per_trigger=None)
    batch_dir = str(tmp_path / "batch")
    build_text_index_from(
        spark,
        load_table(spark, SF_DIR, "documents").select("doc_id", "text"),
        batch_dir,
    )
    try:
        for t in TI._SUBTABLES:
            a = _table_rows(spark, one_by_one, t)
            b = _table_rows(spark, all_at_once, t)
            c = _table_rows(spark, batch_dir, t)
            assert a == b, f"{t}: trigger granularity changed the index"
            assert a == c, f"{t}: stream-built != batch-built"
    finally:
        shutil.rmtree(one_by_one, ignore_errors=True)
        shutil.rmtree(all_at_once, ignore_errors=True)


def test_registered_streaming_bm25_matches_oracle(spark):
    got = [
        tuple(r)
        for r in streaming_text_index_bm25(spark, SF_DIR_CORRECTNESS)
        .orderBy("rnk")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR_CORRECTNESS}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(BM25_ORACLE).fetchall()]
    assert got == want and len(got) > 0


def test_empty_corpus_stream(spark, tmp_path):
    """Zero documents: the staged stream has day files with zero rows;
    the loop must still terminate and build an empty-but-valid index."""
    empty_lake = tmp_path / "empty_lake"
    os.makedirs(empty_lake)
    spark.createDataFrame([], "doc_id long, text string").write.parquet(
        str(empty_lake / "documents.parquet")
    )
    index_dir = run_ingest_text(spark, str(empty_lake))
    try:
        from pgcp_spark.functions.text_index import bm25_from_index

        assert bm25_from_index(spark, index_dir).count() == 0
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
