"""Multi-tenant concurrency: the engine's isolation contract.

A shared Spark driver serves concurrent queries in production (a BI
server, a notebook gateway, parallel pipeline stages). Spark's unit of
tenant isolation is ``SparkSession.newSession()``: one JVM and one
SparkContext (shared executors, shared block manager), but a private
SQLConf, temp-view catalog, and UDF registry per session. This repo
leans on all three kinds of session state:

  - fixed-name temp views (``orders_gs``, ``orders_udf``, ``docs``) in
    the SQL-surface queries;
  - SQL-registered UDFs/UDTFs under fixed names;
  - a session-conf mutation in the streaming runner (state-store
    partition sizing via ``spark.sql.shuffle.partitions``).

These are all safe if — and only if — concurrent tenants run on
separate ``newSession()`` handles. This test pins that contract: a
mixed workload (TPC-H agg, grouping sets, SQL UDF, UDTF-via-LATERAL,
window top-k, exact dedup, and a stateful streaming query) runs
concurrently on isolated sessions and every query produces exactly its
sequential result; the same temp-view-using query runs 4× concurrently
without collision; and the streaming runner's conf mutation never
leaks into a sibling session.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from pgcp_spark.registry import all_queries

# A deliberately hazard-heavy sample: every kind of session state the
# repo touches, plus plain DataFrame queries as control.
WORKLOAD = [
    "q1_pricing_summary",              # control: pure DataFrame plan
    "agg_grouping_sets",               # temp view "orders_gs"
    "udf_sql_registered_priority_class",  # UDF registry + temp view "orders_udf"
    "udtf_top_tokens_per_doc",         # UDTF registry + temp view "docs"
    "window_top3_orders_per_customer",  # window + rank tie-breaking
    "dedup_exact_documents",           # fingerprint groupBy
    "streaming_tumbling_event_counts",  # conf mutation + memory sink
]


def _rows(df) -> list[tuple]:
    # NULL-safe total order: grouping-set rows contain None keys
    return sorted(map(tuple, df.collect()), key=lambda r: [(v is None, str(v)) for v in r])


@pytest.fixture(scope="module")
def sequential_results(spark, sf_dir):
    qs = all_queries()
    return {name: _rows(qs[name].fn(spark.newSession(), sf_dir)) for name in WORKLOAD}


def test_mixed_workload_concurrent_sessions_match_sequential(
    spark, sf_dir, sequential_results
):
    qs = all_queries()

    def run(name: str) -> tuple[str, list[tuple]]:
        return name, _rows(qs[name].fn(spark.newSession(), sf_dir))

    with ThreadPoolExecutor(max_workers=len(WORKLOAD)) as pool:
        got = dict(pool.map(run, WORKLOAD))

    for name in WORKLOAD:
        assert got[name] == sequential_results[name], name


def test_same_view_query_concurrent_self_runs(spark, sf_dir, sequential_results):
    # 4 tenants running the SAME fixed-temp-view query at once: each
    # session's "orders_udf" view and "priority_class" UDF are private,
    # so no run observes another's registration.
    qs = all_queries()
    name = "udf_sql_registered_priority_class"

    def run(_: int) -> list[tuple]:
        return _rows(qs[name].fn(spark.newSession(), sf_dir))

    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(run, range(4)))

    for r in results:
        assert r == sequential_results[name]


def test_streaming_conf_mutation_stays_in_its_session(spark, sf_dir):
    # The streaming runner resizes spark.sql.shuffle.partitions for the
    # stream's lifetime (state-store sizing). That mutation must never be
    # visible to a sibling tenant — a batch query planned concurrently
    # would otherwise inherit a state-cardinality-sized shuffle.
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    tenant = spark.newSession()
    all_queries()["streaming_tumbling_event_counts"].fn(tenant, sf_dir).collect()
    assert spark.conf.get(key) == before
    # and the tenant restored its own conf after the stream finished
    assert tenant.conf.get(key) == before
