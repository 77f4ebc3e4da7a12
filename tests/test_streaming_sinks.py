"""foreachBatch sink: the production path from a stream to any batch
writer (JDBC, parquet lake, the copy pipeline's staged-write) with
exactly-once-per-batch semantics via the (batchId, data) contract."""

from __future__ import annotations

from pgcp_spark.operators._decimal import dsum
from pgcp_spark.streaming.events import read_events_stream
from tests.conftest import SF_DIR_CORRECTNESS


def test_foreach_batch_sink_writes_batch_results(spark, tmp_path):
    from pyspark.sql import functions as F

    out_dir = str(tmp_path / "sink")
    seen_batches = []

    def sink(batch_df, batch_id):
        # idempotence hook: a real sink uses batch_id to dedupe replays
        # (e.g. write to a batch_id-keyed staging table, then hotswap —
        # exactly the transport.py pattern)
        seen_batches.append(batch_id)
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_dir)

    s = read_events_stream(spark, SF_DIR_CORRECTNESS)
    agg = s.groupBy("event_type").agg(
        F.count("*").alias("n_events"), dsum("value").alias("sum_value")
    )
    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert seen_batches, "foreachBatch sink never invoked"
    written = spark.read.parquet(out_dir)
    final = written.filter(F.col("batch_id") == max(seen_batches)).drop("batch_id")

    from pgcp_spark.sources import load_table

    batch = (
        load_table(spark, SF_DIR_CORRECTNESS, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, batch.collect()))


def test_foreach_batch_upsert_commits_lake_snapshots(spark):
    from pgcp_spark.registry import all_queries
    from tests.conftest import SF_DIR_CORRECTNESS

    qs = all_queries()
    df = qs["streaming_foreach_batch_lake_upsert"].fn(spark, SF_DIR_CORRECTNESS)
    rows = df.collect()
    assert len(rows) == 150  # one row per user
    # latest-per-user invariant holds inside the result
    assert len({r.user_id for r in rows}) == len(rows)


def test_ts_divisor_probe_detects_unit(spark, tmp_path):
    """The streaming source must not assume the raw long ts unit: probe
    returns 1 for microsecond-magnitude values and 1000 for nanosecond
    magnitude (the round-2 silent-1970-collapse bug)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pgcp_spark.streaming.events import _TS_DIVISOR_CACHE, _ts_divisor

    us_2024 = 1_704_067_200_000_000          # 2024-01-01 in µs
    ns_2024 = us_2024 * 1000                 # same instant in ns
    for name, val, expected in (("us", us_2024, 1), ("ns", ns_2024, 1000)):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([1], pa.int64()),
                    "ts": pa.array([val], pa.int64()),
                    "user_id": pa.array([1], pa.int64()),
                    "event_type": pa.array(["click"]),
                    "value": pa.array([1.0]),
                    "props": pa.array(["{}"]),
                }
            ),
            str(d / "events.parquet"),
        )
        _TS_DIVISOR_CACHE.clear()
        assert _ts_divisor(spark, str(d), "events.parquet") == expected, name
    _TS_DIVISOR_CACHE.clear()


def test_streaming_agg_across_multiple_microbatches(spark, tmp_path):
    """The driver testdata is one file = one micro-batch, so cross-batch
    state merging never actually executes there. Split events into three
    files and stream with maxFilesPerTrigger=1: the tumbling aggregation
    must merge window state across three real micro-batches and equal the
    batch groupBy exactly."""
    import uuid

    from pyspark.sql import functions as F

    from pgcp_spark.sources import load_table
    from pgcp_spark.streaming.events import (
        RAW_EVENT_SCHEMA,
        _stream_partitions,
        read_events_stream,
    )

    e = load_table(spark, str(__import__("tests.conftest", fromlist=["SF_DIR"]).SF_DIR), "events")
    raw = e.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    out = tmp_path / "events.parquet"
    # three appends → three files → three micro-batches under
    # maxFilesPerTrigger=1 (a keyed repartition can hash-collide to fewer)
    for b in range(3):
        raw.filter(F.pmod("event_id", F.lit(3)) == b).coalesce(1).write.mode(
            "append"
        ).parquet(str(out))

    s = (
        spark.readStream.schema(RAW_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(out))
        .withColumn("ts", F.timestamp_micros("ts"))
    )
    agg = s.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").alias("n")
    )
    name = f"mb_{uuid.uuid4().hex[:8]}"
    with _stream_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    assert q.lastProgress is not None and q.recentProgress, "stream never ran"
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3, f"expected >=3 micro-batches, got {n_batches}"

    got = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in spark.table(name).collect()
    }
    want = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_checkpoint_resume_exactly_once(spark, tmp_path):
    """Exactly-once across restarts: run a windowed count to completion
    with a checkpoint, append a new file, restart with the SAME
    checkpoint — the resumed stream must process only the new file and
    the final counts must equal the batch answer (no double counting)."""
    import uuid

    from pyspark.sql import functions as F

    from pgcp_spark.sources import load_table
    from pgcp_spark.streaming.events import RAW_EVENT_SCHEMA, _stream_partitions
    from tests.conftest import SF_DIR

    e = load_table(spark, SF_DIR, "events")
    raw = e.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    src = tmp_path / "events.parquet"
    ckpt = str(tmp_path / "ckpt")
    half = raw.filter(F.pmod("event_id", F.lit(2)) == 0)
    rest = raw.filter(F.pmod("event_id", F.lit(2)) == 1)
    half.coalesce(1).write.mode("append").parquet(str(src))

    name = f"ck_{uuid.uuid4().hex[:8]}"

    def run_stream():
        s = (
            spark.readStream.schema(RAW_EVENT_SCHEMA)
            .parquet(str(src))
            .withColumn("ts", F.timestamp_micros("ts"))
        )
        agg = s.groupBy(F.window("ts", "1 day").alias("w")).agg(
            F.count("*").alias("n")
        )
        with _stream_partitions(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return q

    q1 = run_stream()
    first_total = sum(r["n"] for r in spark.table(name).collect())
    assert first_total == half.count()

    rest.coalesce(1).write.mode("append").parquet(str(src))
    q2 = run_stream()
    rows_second = sum(p["numInputRows"] for p in q2.recentProgress)
    assert rows_second == rest.count(), (
        f"resume reprocessed data: {rows_second} vs {rest.count()} new rows"
    )
    got = {
        (r["w"]["start"]): r["n"] for r in spark.table(name).collect()
    }
    want = {
        r["w"]["start"]: r["n"]
        for r in e.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
