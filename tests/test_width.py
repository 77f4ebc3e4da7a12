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
