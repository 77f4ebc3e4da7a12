"""Standing fleet-wide exchange-width gate (the round-5 discipline,
promoted from a tool to a test per the round-5 verdict).

Every registered query's physical plan is audited for hash-partitioned
exchanges carrying wide payload columns (text / embeddings / signatures /
token arrays — including ones hidden inside collect_list aggregation
buffers). Plans are built under ``plan_only()`` so segments that normally
materialize behind a localCheckpoint are fully visible; see
``pgcp_spark/plans/width.py`` for markers, allowlist, and rationale.

A failure here means a new or rewritten query ships fat rows through a
shuffle that join-side replication will multiply at 100 TB — fix the
query (carry ids through the exchange, re-attach the wide column after)
or, if the exchange's purpose IS to move the payload exactly once,
allowlist it with a reason in ``plans/width.py``.
"""

from __future__ import annotations

from pgcp_spark.plans import width
from pgcp_spark.plans.width import Finding, audit_plan, audit_queries
from tests.conftest import SF_DIR


def test_no_wide_hash_exchange_in_any_registered_query(spark):
    findings, errors = audit_queries(spark, SF_DIR)
    assert not errors, f"queries failed to plan: {errors}"
    msgs = [f"{f.query}: {list(f.columns)} [{f.exchange_input}]" for f in findings]
    assert not findings, "wide hash exchanges found:\n" + "\n".join(msgs)


def test_detector_catches_named_wide_column():
    plan = (
        "(4) Exchange\n"
        "Input [3]: [doc_id#1L, text#2, sig_a#3]\n"
        "Arguments: hashpartitioning(doc_id#1L, 32)\n"
    )
    (f,) = audit_plan("some_query", plan)
    assert f == Finding("some_query", ("text", "sig_a"), "doc_id#1L, text#2, sig_a#3")


def test_detector_ignores_range_and_roundrobin():
    plan = (
        "(4) Exchange\n"
        "Input [2]: [doc_id#1L, text#2]\n"
        "Arguments: rangepartitioning(doc_id#1L ASC, 32)\n"
        "(7) Exchange\n"
        "Input [2]: [doc_id#1L, text#2]\n"
        "Arguments: RoundRobinPartitioning(32)\n"
    )
    assert audit_plan("some_query", plan) == []


def test_detector_matches_whole_tokens_not_substrings():
    # 'context_len' contains the substring 'text' and 'design_id' contains
    # 'sig' — the round-5 substring matcher false-positived on these.
    plan = (
        "(4) Exchange\n"
        "Input [2]: [context_len#1L, design_id#2L]\n"
        "Arguments: hashpartitioning(design_id#2L, 32)\n"
    )
    assert audit_plan("some_query", plan) == []


def test_detector_resolves_collect_list_buffers(spark):
    """Wide payloads packed through collect_list surface as opaque buf#N
    columns on the exchange — the audit must resolve them through the
    child partial aggregate's Functions list (negative-tested by clearing
    the allowlist for the one legitimately-packing query)."""
    saved = dict(width.ALLOWLIST)
    width.ALLOWLIST.clear()
    try:
        findings, errors = audit_queries(
            spark, SF_DIR, names=["dedup_embedding_cosine_pairs"]
        )
    finally:
        width.ALLOWLIST.update(saved)
    assert not errors
    assert any("collect(embedding)" in f.columns for f in findings), findings


# ---------------------------------------------------------------------------
# round-9 second gate: single-partition window exchanges
# ---------------------------------------------------------------------------

_UNBOUNDED_WINDOW_PLAN = (
    "Window (12)\n"
    "  Sort (11)\n"
    "    Exchange (10)\n"
    "      Scan parquet (9)\n"
    "\n"
    "(10) Exchange\n"
    "Input [2]: [doc_id#1L, cos_sim#2]\n"
    "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n"
)

_BOUNDED_WINDOW_PLAN = (
    "Window (12)\n"
    "  Sort (11)\n"
    "    Exchange (10)\n"
    "      GlobalLimit (9)\n"
    "        Scan parquet (8)\n"
    "\n"
    "(10) Exchange\n"
    "Input [2]: [doc_id#1L, cos_sim#2]\n"
    "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n"
)

# Spark's rank-filter pushdown shape: a PARTIAL WindowGroupLimit below the
# exchange caps rows per input partition, not globally — the single task
# still sorts k × #partitions rows, so the gate must keep flagging it
# (this is exactly the pre-fix hybrid cosine-leg plan shape).
_GROUPLIMIT_WINDOW_PLAN = (
    "Window (13)\n"
    "  WindowGroupLimit (12)\n"
    "    Sort (11)\n"
    "      Exchange (10)\n"
    "        WindowGroupLimit (9)\n"
    "          Sort (8)\n"
    "            Scan parquet (7)\n"
    "\n"
    "(10) Exchange\n"
    "Input [2]: [doc_id#1L, cos_sim#2]\n"
    "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n"
)

_GLOBAL_AGG_PLAN = (
    "HashAggregate (12)\n"
    "  Exchange (11)\n"
    "    HashAggregate (10)\n"
    "      Scan parquet (9)\n"
    "\n"
    "(11) Exchange\n"
    "Input [1]: [sum#3]\n"
    "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n"
)

# Round-10 advisory pin: a Project interposed between Sort and Exchange
# pushed the Window past the old 3-ancestor cap — the gate must still
# see it now that the walk goes to the root.
_INTERPOSED_PROJECT_PLAN = (
    "Window (14)\n"
    "  WindowGroupLimit (13)\n"
    "    Sort (12)\n"
    "      Project (11)\n"
    "        Exchange (10)\n"
    "          Scan parquet (9)\n"
    "\n"
    "(10) Exchange\n"
    "Input [2]: [doc_id#1L, cos_sim#2]\n"
    "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n"
)

# A Window ABOVE a global aggregate: the SinglePartition exchange feeds
# the keyless final HashAggregate (tiny output), so the window sorts
# aggregate rows, not the corpus — the full-walk gate must NOT flag it.
_WINDOW_OVER_GLOBAL_AGG_PLAN = (
    "Window (14)\n"
    "  Sort (13)\n"
    "    HashAggregate (12)\n"
    "      Exchange (11)\n"
    "        HashAggregate (10)\n"
    "          Scan parquet (9)\n"
    "\n"
    "(11) Exchange\n"
    "Input [1]: [sum#3]\n"
    "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n"
)


def test_window_gate_flags_unbounded_single_partition_window():
    (f,) = width.audit_single_partition_windows("some_query", _UNBOUNDED_WINDOW_PLAN)
    assert f.query == "some_query"
    assert f.columns == ("<single-partition window>",)


def test_window_gate_passes_limit_bounded_window():
    assert width.audit_single_partition_windows("q", _BOUNDED_WINDOW_PLAN) == []


def test_window_gate_keeps_flagging_partial_window_group_limit():
    assert len(width.audit_single_partition_windows("q", _GROUPLIMIT_WINDOW_PLAN)) == 1


def test_window_gate_sees_window_past_interposed_project():
    assert len(width.audit_single_partition_windows("q", _INTERPOSED_PROJECT_PLAN)) == 1


def test_window_gate_stops_at_global_aggregate():
    assert width.audit_single_partition_windows("q", _WINDOW_OVER_GLOBAL_AGG_PLAN) == []


def test_window_gate_ignores_global_aggregates():
    assert width.audit_single_partition_windows("q", _GLOBAL_AGG_PLAN) == []


def test_window_gate_respects_allowlist():
    name = "window_rank_dense_rank_suppliers"
    assert name in width.WINDOW_ALLOWLIST
    assert width.audit_single_partition_windows(name, _UNBOUNDED_WINDOW_PLAN) == []


def test_intentional_global_windows_flagged_without_allowlist(spark):
    """Negative test: the three allowlisted global-rank demonstrations ARE
    single-partition windows over unbounded (dimension-sized) inputs — the
    gate must catch them when the allowlist is cleared, proving the fleet
    pass above is the allowlist working, not the detector sleeping."""
    saved = dict(width.WINDOW_ALLOWLIST)
    width.WINDOW_ALLOWLIST.clear()
    try:
        findings, errors = width.audit_queries(
            spark,
            SF_DIR,
            names=[
                "window_rank_dense_rank_suppliers",
                "window_ntile_customer_value",
                "window_percent_rank_cume_dist",
            ],
        )
    finally:
        width.WINDOW_ALLOWLIST.update(saved)
    assert not errors
    flagged = {f.query for f in findings if "<single-partition window>" in f.columns}
    assert flagged == {
        "window_rank_dense_rank_suppliers",
        "window_ntile_customer_value",
        "window_percent_rank_cume_dist",
    }, findings
