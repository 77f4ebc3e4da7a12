"""HLL sketch rollup: accuracy, merge semantics, and the lake-persisted
daily-partials loop (build → fold one day → range query, zero fact reads)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pgcp_spark.functions.sketches import (
    agg_hll_daily_distinct_rollup,
    build_sketch_table,
    daily_user_sketches,
    distinct_users_from_sketches,
    merge_sketches,
    update_sketch_table,
    _sketch_table_files,
)
from pgcp_spark.sources.tables import load_table

from .conftest import SF_DIR, SF_DIR_CORRECTNESS


def _exact(spark, sf_dir, day_from=None, day_to=None):
    e = load_table(spark, sf_dir, "events")
    if day_from is not None:
        e = e.filter(F.to_date("ts") >= F.lit(day_from))
    if day_to is not None:
        e = e.filter(F.to_date("ts") <= F.lit(day_to))
    return {
        r["event_type"]: (r["exact"], r["n_days"], r["n_events"])
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.countDistinct(F.to_date("ts")).alias("n_days"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }


def test_rollup_sparse_regime_exact(spark):
    """At test scale every per-type user set is far below the sketch's
    sparse→dense threshold, so the HLL estimate is EXACT — and n_days /
    n_events are exact by construction at any scale."""
    got = {
        r["event_type"]: (r["est_users"], r["n_days"], r["n_events"])
        for r in agg_hll_daily_distinct_rollup(spark, SF_DIR).collect()
    }
    want = _exact(spark, SF_DIR)
    assert set(got) == set(want)
    for t in want:
        assert got[t] == want[t], f"{t}: {got[t]} != {want[t]}"


def test_merge_of_parts_equals_sketch_of_whole(spark):
    """HLL union is loss-free at fixed lgK: merging per-day partials must
    give the same estimate as sketching the whole slice directly."""
    e = load_table(spark, SF_DIR_CORRECTNESS, "events")
    merged = {
        r["event_type"]: r["est_users"]
        for r in merge_sketches(daily_user_sketches(e)).collect()
    }
    direct = {
        r["event_type"]: r["est"]
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est"))
        .collect()
    }
    assert merged == direct


def test_dense_regime_error_bound(spark):
    """20k distincts split across 40 'days' — well past the sparse
    threshold, so this exercises the real estimator: merged estimate
    within 5 % (lgK=12 → ~1.6 % RSE; 3σ)."""
    df = spark.range(20_000).select(
        F.lit("t").alias("event_type"),
        F.date_add(F.lit(datetime.date(2024, 1, 1)), (F.col("id") % 40).cast("int")).alias(
            "day"
        ),
        F.col("id").alias("user_id"),
    )
    daily = df.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"), F.count("*").alias("n_rows")
    )
    est = merge_sketches(daily).collect()[0]["est_users"]
    assert abs(est - 20_000) / 20_000 < 0.05, est


def test_lake_fold_vs_rebuild_and_range_query(spark, tmp_path):
    """The production loop: build the sketch table on all days but the
    last, fold the last day via MERGE, and the folded table answers
    exactly like a from-scratch rebuild; a day-range query over stored
    partials matches direct computation on the fact slice."""
    days = [
        r["day"]
        for r in load_table(spark, SF_DIR, "events")
        .select(F.to_date("ts").alias("day"))
        .distinct()
        .orderBy("day")
        .collect()
    ]
    assert len(days) >= 3
    last = days[-1]

    folded_dir = str(tmp_path / "sk_folded")
    build_sketch_table(spark, SF_DIR, folded_dir, upto_day=days[-2])
    update_sketch_table(spark, SF_DIR, folded_dir, last)

    rebuilt_dir = str(tmp_path / "sk_rebuilt")
    build_sketch_table(spark, SF_DIR, rebuilt_dir)

    folded = [tuple(r) for r in distinct_users_from_sketches(spark, folded_dir).collect()]
    rebuilt = [tuple(r) for r in distinct_users_from_sketches(spark, rebuilt_dir).collect()]
    assert folded == rebuilt

    # range query from stored partials == exact on the fact slice
    lo, hi = days[1], days[-2]
    got = {
        r["event_type"]: (r["est_users"], r["n_days"], r["n_events"])
        for r in distinct_users_from_sketches(spark, folded_dir, lo, hi).collect()
    }
    want = _exact(spark, SF_DIR, lo, hi)
    assert got == want

    # idempotent replay: folding the same day again changes nothing
    update_sketch_table(spark, SF_DIR, folded_dir, last)
    again = [tuple(r) for r in distinct_users_from_sketches(spark, folded_dir).collect()]
    assert again == folded


def test_range_query_never_touches_fact(spark, tmp_path):
    """The range rollup's plan reads ONLY the sketch table — zero fact
    access — and the day predicate is pushed to its parquet scan (the
    CLUSTER BY day layout makes that min/max file skipping at scale)."""
    d = str(tmp_path / "sk")
    build_sketch_table(spark, SF_DIR, d)
    q = distinct_users_from_sketches(
        spark, d, datetime.date(2024, 1, 2), datetime.date(2024, 1, 5)
    )
    from pgcp_spark.plans.explain import physical_plan

    plan = physical_plan(q)
    assert "events.parquet" not in plan
    assert d in plan
    assert "PushedFilters" in plan and "day" in plan.split("PushedFilters", 1)[1][:400]


def test_empty_range_returns_no_rows(spark, tmp_path):
    d = str(tmp_path / "sk")
    build_sketch_table(spark, SF_DIR, d)
    out = distinct_users_from_sketches(
        spark, d, datetime.date(1999, 1, 1), datetime.date(1999, 1, 2)
    )
    assert out.count() == 0


def test_sketch_table_is_tiny_and_clustered(spark, tmp_path):
    """The artifact is |types|×|days| rows regardless of fact size, and
    committed through the lake pointer like any snapshot."""
    d = str(tmp_path / "sk")
    build_sketch_table(spark, SF_DIR, d)
    files = _sketch_table_files(d)
    assert files
    n = spark.read.parquet(*files).count()
    types = load_table(spark, SF_DIR, "events").select("event_type").distinct().count()
    daysn = (
        load_table(spark, SF_DIR, "events").select(F.to_date("ts")).distinct().count()
    )
    assert 0 < n <= types * daysn  # at most one partial per (type, day)


def test_streaming_fold_matches_batch_build(spark, tmp_path):
    """Day-at-a-time streaming maintenance converges to the same table as
    a one-shot batch build."""
    from pgcp_spark.functions.sketches import run_streaming_sketch_maintenance

    stream_dir = str(tmp_path / "sk_stream")
    run_streaming_sketch_maintenance(spark, SF_DIR, stream_dir, max_files_per_trigger=1)
    batch_dir = str(tmp_path / "sk_batch")
    build_sketch_table(spark, SF_DIR, batch_dir)
    got = [tuple(r) for r in distinct_users_from_sketches(spark, stream_dir).collect()]
    want = [tuple(r) for r in distinct_users_from_sketches(spark, batch_dir).collect()]
    assert got == want


def test_streaming_batch_boundary_invariance(spark, tmp_path):
    """One giant micro-batch vs one per day: identical final table."""
    from pgcp_spark.functions.sketches import run_streaming_sketch_maintenance

    one = str(tmp_path / "sk_one")
    run_streaming_sketch_maintenance(spark, SF_DIR, one, max_files_per_trigger=None)
    daily = str(tmp_path / "sk_daily")
    run_streaming_sketch_maintenance(spark, SF_DIR, daily, max_files_per_trigger=1)
    rows_one = [tuple(r) for r in distinct_users_from_sketches(spark, one).collect()]
    rows_daily = [tuple(r) for r in distinct_users_from_sketches(spark, daily).collect()]
    assert rows_one == rows_daily


def test_streaming_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-folding an already-folded whole
    day must leave the table unchanged (complete-day partials replace
    with bit-identical rows)."""
    from pgcp_spark.functions.sketches import (
        fold_sketch_batch,
        run_streaming_sketch_maintenance,
    )

    d = str(tmp_path / "sk")
    run_streaming_sketch_maintenance(spark, SF_DIR, d, max_files_per_trigger=1)
    before = [tuple(r) for r in distinct_users_from_sketches(spark, d).collect()]
    last = (
        load_table(spark, SF_DIR, "events")
        .select(F.to_date("ts").alias("day"))
        .agg(F.max("day"))
        .collect()[0][0]
    )
    replay = load_table(spark, SF_DIR, "events").filter(F.to_date("ts") == F.lit(last))
    fold_sketch_batch(spark, replay, d)
    after = [tuple(r) for r in distinct_users_from_sketches(spark, d).collect()]
    assert after == before


def test_cms_one_sided_and_recall(spark):
    """Count-min contracts on the real corpus: estimates never
    underestimate, and every EXACT heavy hitter survives the
    estimate-threshold filter (recall 1 — estimates can only grow)."""
    from pgcp_spark.functions.sketches import (
        HH_DENOM,
        agg_cms_bigram_heavy_hitters,
    )

    out = agg_cms_bigram_heavy_hitters(spark, SF_DIR).collect()
    assert out, "expected heavy hitters on the test corpus"
    assert all(r.est_cnt >= r.true_cnt for r in out)
    # exact heavy hitters, recomputed independently
    d = load_table(spark, SF_DIR, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), " +", " ")), " ")
    bi = (
        d.select(toks.alias("t"))
        .select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 1)").alias("x"),
                    F.expr("slice(t, 2, size(t) - 1)").alias("y"),
                )
            ).alias("p")
        )
        .select(F.concat_ws(" ", F.col("p.x"), F.col("p.y")).alias("b"))
    )
    counts = {r.b: r.cnt for r in bi.groupBy("b").agg(F.count("*").alias("cnt")).collect()}
    total = sum(counts.values())
    exact_hh = {b for b, c in counts.items() if c > total / HH_DENOM}
    got = {r.bigram for r in out}
    assert exact_hh <= got, f"missing true heavy hitters: {sorted(exact_hh - got)[:5]}"
    for r in out:
        assert r.true_cnt == counts[r.bigram]


def test_cms_partials_merge_equals_direct(spark):
    """The mergeable-rollup contract: per-source partial sketches summed
    into the global grid equal the sketch built in one pass — integer
    addition is exact, so this family's merge==whole holds bit-for-bit
    (the HLL family pins the same shape within sketch tolerance)."""
    from pgcp_spark.functions.sketches import CMS_D, _cms_bucket

    d = load_table(spark, SF_DIR, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), " +", " ")), " ")
    bi = (
        d.select("source", toks.alias("t"))
        .select(
            "source",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 1)").alias("x"),
                    F.expr("slice(t, 2, size(t) - 1)").alias("y"),
                )
            ).alias("p"),
        )
        .select("source", F.concat_ws(" ", F.col("p.x"), F.col("p.y")).alias("b"))
    )
    rows = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cms_bucket(F.col("b"), j).alias("bucket"))
            for j in range(CMS_D)
        ]
    )
    exploded = bi.select("source", F.explode(rows).alias("r")).select(
        "source", F.col("r.j").alias("j"), F.col("r.bucket").alias("bucket")
    )
    merged = (
        exploded.groupBy("source", "j", "bucket")
        .agg(F.count("*").alias("cnt"))
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = exploded.groupBy("j", "bucket").agg(F.count("*").alias("cnt"))
    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in direct.collect())
    assert a == b


def test_histogram_quantile_within_bin_width(spark):
    """The histogram rollup's only error is the bin width: every
    estimate sits within HIST_BIN_W of the exact order statistic AT THE
    SAME RANK DEFINITION (the smallest value whose cumulative count
    reaches q·n — the rank the histogram targets; interpolating
    definitions like numpy's default differ by a whole inter-value gap
    in sparse tails, which is a definition delta, not histogram error)."""
    import math

    from pgcp_spark.functions.sketches import (
        HIST_BIN_W,
        agg_histogram_quantile_rollup,
    )

    out = agg_histogram_quantile_rollup(spark, SF_DIR).collect()
    assert out, "expected quantile rows"
    vals = {}
    for r in load_table(spark, SF_DIR, "events").select("event_type", "value").collect():
        if r.value is not None:
            vals.setdefault(r.event_type, []).append(r.value)
    for r in out:
        v = sorted(vals[r.event_type])
        assert r.n == len(v)
        rank = math.ceil(r.q * r.n)  # smallest rank with cum >= q*n
        exact = v[rank - 1]
        assert abs(r.est_value - exact) <= HIST_BIN_W, (
            f"{r.event_type} q={r.q}: est {r.est_value} vs exact {exact}"
        )
