"""Fleet-wide shuffle-width audit (library form; CLI in tools/width_audit.py).

The expensive failure mode at 100 TB is a wide column — document text, an
embedding array, a MinHash signature — riding a hash-partitioned exchange,
where join-side replication multiplies its bytes (the round-5 ids-only
LSH/MinHash rewrites each bought 1.5-2.5× from removing exactly this).
This module walks every registered query's formatted physical plan and
reports each hashpartitioning Exchange whose input carries a wide column,
so the next regression is a failing test instead of a forensic sweep
(round-6: wired into pytest via tests/test_width.py).

Two round-6 hardenings over the round-5 tool:

- **Through-checkpoint coverage.** Plans are built under
  ``plans.materialize.plan_only()``, so eager localCheckpoint sub-jobs
  neither run nor truncate the plan to ExistingRDD — a wide exchange
  *inside* a normally-checkpointed segment (e.g. the signature build) is
  now visible. The round-5 tool read only final plans and could report
  CLEAN while a checkpointed segment regressed.
- **Whole-token marker matching.** Column names are split into
  ``_``-separated tokens and markers must equal a token — ``sig_a``
  matches marker ``sig``, but a hypothetical ``design_stage`` or
  ``context_len`` no longer false-positives on ``sig``/``text``.

Partitioning kinds:
  - hashpartitioning  — audited: a join/aggregate exchange should carry
    keys + narrow payload only (re-attach wide columns after).
  - rangepartitioning — ignored: the final result sort legitimately
    carries whatever the query RETURNS (e.g. chunk text).
  - roundrobin        — ignored: the test-lake loader's parallelism
    repartition (sources/tables.py), a no-op on multi-file lakes.
  - SinglePartition   — audited by the SECOND gate below (round 9):
    see ``audit_single_partition_windows``.

Round-9 second gate — single-partition window exchanges. The round-8
hybrid query's cosine leg ranked the whole scored corpus through an
unpartitioned ``Window.orderBy`` — a SinglePartition exchange feeding a
Sort + Window, i.e. a one-task sort of the entire input at scale — and
this gate could not see it: a single-partition exchange is narrow, not
wide. ``audit_single_partition_windows`` flags every SinglePartition
exchange whose ancestors include a Window/WindowGroupLimit node UNLESS
the exchange's own subtree already bounds its row count (GlobalLimit /
TakeOrderedAndProject / CollectLimit / LocalTableScan) — the sanctioned
pattern is ``orderBy().limit(k)`` (TakeOrderedAndProject: per-partition
heaps, fully parallel) THEN a row_number window over the k-row result.
A partial WindowGroupLimit below the exchange (Spark's rank-filter
pushdown) does NOT count as bounding: it caps rows at k PER INPUT
PARTITION, so the single task still sorts k × #partitions rows — at
100 TB that is millions of rows through one task. Global aggregates
(partial → SinglePartition → final over #partitions rows) have no
window ancestor and are not flagged. Intentional global-rank queries
are allowlisted in ``WINDOW_ALLOWLIST`` with reasons.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from pgcp_spark.plans.materialize import plan_only

# Markers for columns whose payload is unbounded-or-fat per row: raw text,
# token/shingle/embedding arrays, hash-signature arrays, binary payloads,
# JSON maps. Matched against whole '_'-tokens of the column name.
WIDE_MARKERS = frozenset(
    {"text", "embedding", "embeddings", "sig", "sigs", "g_arr", "vecs",
     "bits", "props", "payload", "body", "toks", "shingles", "bigrams"}
)

# query -> list of (column-name-prefix, reason) pairs where a wide column
# on a hash exchange is the query's own semantics, with the reason inline.
ALLOWLIST: dict[str, list[tuple[str, str]]] = {
    # The block-matmul pack: groupBy(block) EXISTS to co-locate vectors
    # into one packed row per block — each embedding rides this single
    # exchange exactly once (O(n) bytes, no join-side replication), as a
    # collect_list aggregation buffer. Visible only in plan_only mode
    # (the packed frame is materialized before the grid self-join).
    "dedup_embedding_cosine_pairs": [
        ("embedding", "block-pack collect_list ships each vector once into its block row"),
    ],
    # SemDeDup's cluster-pack is the SAME pattern with cluster as the
    # blocking key (top-2 multi-assignment → each vector rides the
    # exchange at most twice, still O(n) bytes, no join-side replication).
    "dedup_semantic_clustered_pairs": [
        ("collect(embedding)", "cluster-pack collect_list ships each vector once per probed cluster"),
        ("embedding", "cluster-pack collect_list ships each vector once per probed cluster"),
    ],
}


# query -> reason a global (unpartitioned) window over an UNBOUNDED
# input is that query's own semantics. Each entry must carry a scale
# note in the query's docstring pointing at the partitioned/top-k
# alternative.
WINDOW_ALLOWLIST: dict[str, str] = {
    # The three intentional global-rank demonstrations (operators/
    # windows.py): each runs over a GROUP-LEVEL aggregate (suppliers /
    # customers — bounded dimensions, not fact tables), the global
    # ordering IS the operator under test, and each docstring carries
    # the single-partition scale note + the top-k/approx alternative.
    "window_rank_dense_rank_suppliers": "global rank over per-supplier aggregate; scale note in docstring",
    "window_ntile_customer_value": "global ntile over per-customer aggregate; scale note in docstring",
    "window_percent_rank_cume_dist": "global CDF over the supplier dimension; scale note in docstring",
}


@dataclass(frozen=True)
class Finding:
    query: str
    columns: tuple[str, ...]
    exchange_input: str  # first 120 chars of the Exchange's Input list


def _is_wide(col: str) -> bool:
    return col in WIDE_MARKERS or any(t in WIDE_MARKERS for t in col.split("_"))


def _wide_cols(cols: list[str], allow_prefixes: tuple[str, ...]) -> list[str]:
    return [c for c in cols if _is_wide(c) and not c.startswith(allow_prefixes)]


# A formatted-plan tree line: indentation art, node name, (id).
_TREE_LINE = re.compile(r"^([\s:+\-*]*)([A-Za-z][\w ]*?) \((\d+)\)\s*$")
# Every column reference inside a Functions [...] details line, e.g.
# partial_collect_list(embedding#19, 0, 0) → embedding;
# partial_collect_list(struct(doc_id#3, text#7)) → doc_id, text. A
# leading-argument-only pattern would miss a wide payload nested one
# level deeper (collect_list over a struct) or a second wide argument,
# and report the exchange clean. Over-capture is harmless: extra tokens
# (the output buffer alias, group columns) are only ever TESTED against
# WIDE_MARKERS, never reported unless wide.
_AGG_ARG_COLS = re.compile(r"(\w+)#\d+")


def _buffer_arg_cols(plan: str) -> dict[str, list[str]]:
    """Map each Exchange node id → the argument column names of its direct
    child's aggregate Functions.

    Hash exchanges below a partial ObjectHashAggregate carry the aggregate
    STATE as opaque ``buf#N`` columns, so a ``collect_list(text)`` pack
    hides its payload from name-based matching. Resolving the exchange's
    child node in the plan tree and reading its ``Functions [...]``
    arguments recovers the real columns riding the wire.
    """
    lines = plan.splitlines()
    # depth-first tree: an exchange's first child is the next tree line
    # with deeper indentation
    nodes = []  # (line_idx, indent, name, id)
    for i, line in enumerate(lines):
        m = _TREE_LINE.match(line)
        if m:
            nodes.append((i, len(m.group(1)), m.group(2).strip(), m.group(3)))
    child_of: dict[str, str] = {}
    for j, (_, indent, nm, nid) in enumerate(nodes):
        if "Exchange" in nm and j + 1 < len(nodes) and nodes[j + 1][1] > indent:
            child_of[nid] = nodes[j + 1][3]
    # details section: node id → its Functions arg columns
    funcs: dict[str, list[str]] = {}
    cur = None
    for line in lines:
        m = re.match(r"^\((\d+)\) ", line)
        if m:
            cur = m.group(1)
        elif cur and line.startswith("Functions ["):
            funcs[cur] = _AGG_ARG_COLS.findall(line)
    return {ex: funcs.get(ch, []) for ex, ch in child_of.items()}


def audit_plan(name: str, plan: str) -> list[Finding]:
    """Scan one formatted plan string for wide hash exchanges.

    Checks both the exchange's named input columns and — when the input
    carries opaque aggregation buffers (``buf#N``) — the argument columns
    of the child partial aggregate, so wide payloads packed via
    collect_list/collect_set are audited too.
    """
    allow = tuple(a for a, _ in ALLOWLIST.get(name, ()))
    buffer_args = _buffer_arg_cols(plan)
    findings = []
    for nid, inp, kind in re.findall(
        r"\((\d+)\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: (\w+)", plan
    ):
        if kind != "hashpartitioning":
            continue
        cols = [c.strip().split("#")[0] for c in inp.split(",")]
        wide = _wide_cols(cols, allow)
        if any(c == "buf" or c.startswith("buf") for c in cols):
            hidden = _wide_cols(buffer_args.get(nid, []), allow)
            wide += [f"collect({c})" for c in hidden]
        if wide:
            findings.append(Finding(name, tuple(wide), inp[:120]))
    return findings


# node names that bound the row count of everything above them: a
# SinglePartition exchange over one of these moves ≤ k rows, not the
# corpus. WindowGroupLimit is deliberately absent (module docstring).
_BOUNDING_NODES = (
    "GlobalLimit",
    "TakeOrderedAndProject",
    "CollectLimit",
    "LocalTableScan",
)


def _tree_nodes(plan: str) -> list[tuple[int, int, str, str]]:
    """(line_idx, indent, name, id) for every tree line, in plan order."""
    nodes = []
    for i, line in enumerate(plan.splitlines()):
        m = _TREE_LINE.match(line)
        if m:
            nodes.append((i, len(m.group(1)), m.group(2).strip(), m.group(3)))
    return nodes


def _exchange_kinds(plan: str) -> dict[str, str]:
    """Exchange node id → partitioning kind (first Arguments token)."""
    return {
        nid: kind
        for nid, kind in re.findall(
            r"\((\d+)\) Exchange\nInput \[\d+\]: \[[^\]]*\]\nArguments: (\w+)",
            plan,
        )
    }


def audit_single_partition_windows(name: str, plan: str) -> list[Finding]:
    """Flag SinglePartition exchanges feeding a Window over an UNBOUNDED
    input (module docstring: the one-task-sorts-the-corpus shape). The
    exchange passes if its own subtree contains a row-bounding node, or
    if no Window/WindowGroupLimit reaches it through its ancestor chain.

    The ancestor walk goes ALL the way up (round-9 advisory: a fixed
    3-node cap let ``Window ← ... ← Project ← Sort ← Exchange`` escape),
    stopping only where the single-partition flow no longer matters:
    another Exchange (the data is repartitioned before any higher
    Window), a row-bounding node, or an Aggregate (a SinglePartition
    exchange feeds an aggregate only in the GLOBAL-agg shape, whose
    output is keyless and tiny — a Window above that sorts rows, not the
    corpus)."""
    if name in WINDOW_ALLOWLIST:
        return []
    nodes = _tree_nodes(plan)
    kinds = _exchange_kinds(plan)
    findings = []
    for j, (_, indent, nm, nid) in enumerate(nodes):
        if "Exchange" not in nm or kinds.get(nid) != "SinglePartition":
            continue
        # ancestors: walk back through strictly-decreasing indents, up to
        # the tree root or the first flow-breaking node
        ancestors, cur = [], indent
        for k in range(j - 1, -1, -1):
            if nodes[k][1] < cur:
                anc = nodes[k][2]
                ancestors.append(anc)
                cur = nodes[k][1]
                if (
                    "Exchange" in anc
                    or "Aggregate" in anc
                    or any(b in anc for b in _BOUNDING_NODES)
                ):
                    break
        if not any("Window" in a for a in ancestors):
            continue  # global aggregate / collect shapes: not a window sort
        # subtree ends at the first node back at-or-above our indent
        bounded = False
        for _, sub_indent, sub_nm, _ in nodes[j + 1:]:
            if sub_indent <= indent:
                break
            if any(b in sub_nm for b in _BOUNDING_NODES):
                bounded = True
                break
        if not bounded:
            findings.append(
                Finding(name, ("<single-partition window>",), f"ancestors={ancestors}")
            )
    return findings


def formatted_plan(df: DataFrame) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def audit_queries(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> tuple[list[Finding], list[str]]:
    """Audit registered queries' plans under plan_only (full visibility).

    Returns (findings, plan_errors). Graph-family fixpoint queries still
    execute real jobs at plan-construction time (their loops converge by
    running count()s); everything else is plan-only.
    """
    from pgcp_spark.registry import all_queries

    qs = all_queries()
    findings: list[Finding] = []
    errors: list[str] = []
    with plan_only():
        for name, qry in qs.items():
            if names is not None and name not in names:
                continue
            try:
                df = qry.fn(spark, sf_dir)
                plan = formatted_plan(df)
            except Exception as exc:  # noqa: BLE001 — report, don't mask peers
                errors.append(f"{name}: PLAN ERR {type(exc).__name__}: {exc}")
                continue
            findings.extend(audit_plan(name, plan))
            findings.extend(audit_single_partition_windows(name, plan))
    return findings, errors
