"""Adversarial-lake generator for differential parity sweeps.

Builds three hostile variants of the testdata lake, schema-identical to
the driver's parquet (same column names AND physical types), so the full
query registry can be swept through `tools/driver_mimic.py` against each:

  empty      — every table present with the right schema, zero rows.
               A 100 TB engine meets empty partitions and empty source
               snapshots constantly; nothing may throw.
  nulls      — deterministic hash-sliced NULLs in every nullable non-key
               column (plus ''/whitespace-only documents, '{}' props,
               orphaned FKs, empty embedding arrays).  Exercises the
               null-propagation parity of every operator: both engines
               must agree bit-for-bit, not merely "on clean data".
  degenerate — tiny constant-valued lake: one market segment, one event
               type, all events at ONE timestamp, identical documents,
               identical embeddings plus an all-zero vector.  Exercises
               0/0 paths (variance, correlation, cosine of a zero
               vector), single-group statistics, and tie-breaking
               determinism in every top-k.

  scrambled  — identical rows in a deterministic hash-permuted physical
               order (different row groups, different min/max stats,
               different scan order).  Swept against the CANONICAL lake's
               oracle to prove input-order invariance of every result.
  skewed     — one hot key per fact table (50% of events on one user,
               50% of orders on one customer, a third of lineitem on one
               supplier/part) and a boilerplate sentence in a third of
               documents.  Swept for same-lake oracle parity AND timed
               against the clean lake: skew must change neither results
               nor complexity class.

Everything is derived from the source lake (default sf0.001) through
DuckDB SQL only — no RNG, rerunnable bit-identically.

Usage: python tools/make_edge_lake.py [src_dir] [dest_root] [variant ...]
"""

from __future__ import annotations

import os
import sys

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# nulls lake: per-table list of (column, modulus, phase) — the column goes
# NULL on rows where key % modulus == phase.  Moduli are distinct primes
# per column so null slices overlap but never coincide; key columns stay
# intact (null join keys are exercised separately via o_custkey /
# l_partkey / l_suppkey / user_id, which ARE nulled — orphaned facts are
# a fact of life in real lakes).
NULL_RULES: dict[str, tuple[str, list[tuple[str, int, int]]]] = {
    "customer": ("c_custkey", [
        ("c_name", 11, 0), ("c_nationkey", 7, 0), ("c_acctbal", 5, 0),
        ("c_mktsegment", 13, 0),
    ]),
    "supplier": ("s_suppkey", [
        ("s_name", 11, 0), ("s_nationkey", 7, 0), ("s_acctbal", 5, 0),
    ]),
    "part": ("p_partkey", [
        ("p_name", 11, 0), ("p_brand", 7, 0), ("p_type", 13, 0),
        ("p_size", 5, 0), ("p_retailprice", 17, 0),
    ]),
    "orders": ("o_orderkey", [
        ("o_custkey", 19, 0), ("o_orderstatus", 7, 0), ("o_totalprice", 5, 0),
        ("o_orderdate", 11, 0), ("o_orderpriority", 13, 0),
    ]),
    "lineitem": ("l_orderkey * 7 + l_linenumber", [
        ("l_partkey", 23, 0), ("l_suppkey", 19, 0), ("l_quantity", 5, 0),
        ("l_extendedprice", 7, 0), ("l_discount", 11, 0), ("l_tax", 13, 0),
        ("l_returnflag", 17, 0), ("l_linestatus", 29, 0), ("l_shipdate", 31, 0),
    ]),
    "events": ("event_id", [
        ("ts", 11, 0), ("user_id", 7, 0), ("event_type", 13, 0),
        ("value", 5, 0), ("props", 17, 0),
    ]),
    "documents": ("doc_id", [
        ("lang", 7, 0), ("source", 13, 0), ("n_chars", 5, 0),
    ]),
    "embeddings": ("vec_id", [
        ("label", 7, 0),
    ]),
}


def build_empty(con, src: str, dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' WHERE 1=0) "
            f"TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"empty lake -> {dest}")


def build_nulls(con, src: str, dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        if t in ("region", "nation"):
            # fixed dims stay intact: nulling a 5/25-row dimension blanks
            # entire query families instead of exercising null paths
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
            )
            continue
        key, rules = NULL_RULES[t]
        ruled = {c: (m, p) for c, m, p in rules}
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        exprs = []
        for c in cols:
            if c in ruled:
                m, p = ruled[c]
                exprs.append(f"CASE WHEN ({key}) % {m} = {p} THEN NULL ELSE {c} END AS {c}")
            elif t == "documents" and c == "text":
                # NULL, empty, and whitespace-only documents — the three
                # shapes a text pipeline must not choke on
                exprs.append(
                    f"CASE WHEN ({key}) % 11 = 0 THEN NULL "
                    f"WHEN ({key}) % 11 = 1 THEN '' "
                    f"WHEN ({key}) % 11 = 2 THEN '   ' "
                    f"ELSE {c} END AS {c}"
                )
            elif t == "embeddings" and c == "embedding":
                exprs.append(
                    f"CASE WHEN ({key}) % 11 = 0 THEN NULL "
                    f"WHEN ({key}) % 11 = 1 THEN CAST([] AS FLOAT[]) "
                    f"ELSE {c} END AS {c}"
                )
            else:
                exprs.append(c)
        # events: a second props shape — present-but-empty JSON object
        sel = ", ".join(exprs)
        if t == "events":
            sel = sel.replace(
                "ELSE props END AS props",
                "WHEN (event_id) % 17 = 1 THEN '{}' ELSE props END AS props",
            )
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet') "
            f"TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"nulls lake -> {dest}")


def build_degenerate(con, src: str, dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
    # constant non-key columns over a handful of keys; every value chosen
    # from the source domain so domain-filtered queries still see rows
    specs = {
        "customer": """
            SELECT CAST(i AS BIGINT) AS c_custkey,
                   'Customer#000000001' AS c_name,
                   CAST(1 AS INT) AS c_nationkey,
                   CAST(100.0 AS DOUBLE) AS c_acctbal,
                   'BUILDING' AS c_mktsegment
            FROM range(1, 6) t(i)""",
        "supplier": """
            SELECT CAST(i AS BIGINT) AS s_suppkey,
                   'Supplier#000000001' AS s_name,
                   CAST(1 AS INT) AS s_nationkey,
                   CAST(50.0 AS DOUBLE) AS s_acctbal
            FROM range(1, 4) t(i)""",
        "part": """
            SELECT CAST(i AS BIGINT) AS p_partkey,
                   'azure green tan puff seashell' AS p_name,
                   'Brand#11' AS p_brand,
                   'ECONOMY ANODIZED STEEL' AS p_type,
                   CAST(15 AS INT) AS p_size,
                   CAST(900.0 AS DOUBLE) AS p_retailprice
            FROM range(1, 5) t(i)""",
        "orders": """
            SELECT CAST(i AS BIGINT) AS o_orderkey,
                   CAST(1 + (i % 5) AS BIGINT) AS o_custkey,
                   'F' AS o_orderstatus,
                   CAST(1000.0 AS DOUBLE) AS o_totalprice,
                   TIMESTAMP '1995-06-15 00:00:00' AS o_orderdate,
                   '1-URGENT' AS o_orderpriority
            FROM range(1, 11) t(i)""",
        "lineitem": """
            SELECT CAST(1 + (i % 10) AS BIGINT) AS l_orderkey,
                   CAST(1 + (i % 4) AS BIGINT) AS l_partkey,
                   CAST(1 + (i % 3) AS BIGINT) AS l_suppkey,
                   CAST(1 + (i // 10) AS INT) AS l_linenumber,
                   CAST(10.0 AS DOUBLE) AS l_quantity,
                   CAST(1000.0 AS DOUBLE) AS l_extendedprice,
                   CAST(0.05 AS DOUBLE) AS l_discount,
                   CAST(0.02 AS DOUBLE) AS l_tax,
                   'R' AS l_returnflag,
                   'F' AS l_linestatus,
                   TIMESTAMP '1995-07-01 00:00:00' AS l_shipdate
            FROM range(0, 20) t(i)""",
        # every event at ONE instant, one user, one type: a single
        # tumbling/sliding/session window, zero inter-arrival gaps
        "events": """
            SELECT CAST(i AS BIGINT) AS event_id,
                   TIMESTAMP '2024-03-01 12:00:00' AS ts,
                   CAST(1 AS BIGINT) AS user_id,
                   'click' AS event_type,
                   CAST(2.5 AS DOUBLE) AS value,
                   '{"plan": "pro", "qty": 1}' AS props
            FROM range(1, 13) t(i)""",
        # identical documents: dedup must cluster ALL of them; every
        # shingle is maximally hot
        "documents": """
            SELECT CAST(i AS BIGINT) AS doc_id,
                   'the quick brown fox jumps over the lazy dog again and again' AS text,
                   'en' AS lang,
                   'web' AS source,
                   CAST(59 AS BIGINT) AS n_chars
            FROM range(1, 9) t(i)""",
        # identical 64-dim vectors (all cosine ties, matching the corpus's
        # embedding dimension) plus one all-zero vector (norm 0 -> 0/0):
        # both engines must agree on the result bits and every top-k must
        # break ties deterministically
        # vec_ids are multiples of the similarity QUERY_STRIDE (50) so every
        # vector doubles as a query point — maximal tie-breaking stress
        "embeddings": """
            SELECT CAST(i * 50 AS BIGINT) AS vec_id,
                   CASE WHEN i = 6
                        THEN CAST(list_transform(range(64), x -> 0.0) AS FLOAT[])
                        ELSE CAST(list_transform(range(64), x -> 0.5 - 0.25 * (x % 3)) AS FLOAT[])
                        END AS embedding,
                   CAST(1 AS INT) AS label
            FROM range(1, 7) t(i)""",
    }
    for t, sql in specs.items():
        con.execute(f"COPY ({sql}) TO '{dest}/{t}.parquet' (FORMAT PARQUET)")
    print(f"degenerate lake -> {dest}")


def build_scrambled(con, src: str, dest: str) -> None:
    """Same rows, hostile PHYSICAL order: every table rewritten in a
    deterministic hash permutation of its row order — so parquet row
    groups, their min/max statistics, and the scan order all differ from
    the canonical lake while the data multiset is identical.  Swept with
    the ORACLE pointed at the CANONICAL lake
    (``MIMIC_ORACLE_SF_DIR=<canonical> MIMIC_SF_DIR=<here>``): a
    bit-exact match proves every query's result is input-order-invariant
    — no unordered LIMIT/first() leaking scan order, no float
    accumulation order dependence, no tie broken by file position."""
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()
        ]
        row = ", ".join(cols)
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' ORDER BY hash(ROW({row}))) "
            f"TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"scrambled lake -> {dest}")


# skewed lake: one hot key per fact table (the bot-account / default-value
# shape real lakes develop) plus a boilerplate sentence shared by a third
# of all documents (the hot-shingle shape of scraped corpora).  Values are
# substituted deterministically by row-key parity, so the lake is
# rerunnable bit-identically and the DuckDB oracle sees the same rows.
# DISTINCT hot keys per table: a shared hot key on two MULTI-ROW sides of
# the same join (events.user_id ∩ orders.o_custkey) is a semantic
# cross-product — 50%×50% of both tables meeting on one key is ~n²/4 join
# OUTPUT rows, a cost inherent to the data, which no engine (Spark or the
# DuckDB oracle) can avoid.  That both-sides-hot shape is measured
# deliberately in tools/skew_bench.py; THIS lake stresses single-side
# skew, the kind plans must absorb without changing complexity class.
SKEW_HOT_USER = 7      # events.user_id — joins orders/customers as probe side
SKEW_HOT_CUST = 11     # orders.o_custkey — different key, no hot∩hot meet
SKEW_HOT_SUPP = 7      # lineitem → supplier is a unique-keyed dim: no fan-out
SKEW_HOT_PART = 11     # lineitem → part likewise
SKEW_BOILERPLATE = (
    " terms apply all rights reserved contact support for help today"
)
SKEW_RULES: dict[str, dict[str, str]] = {
    "events": {  # ONE user owns 50% of all events
        "user_id": f"CASE WHEN event_id % 2 = 0 THEN {SKEW_HOT_USER} ELSE user_id END"
    },
    "orders": {  # ONE customer owns 50% of all orders
        "o_custkey": f"CASE WHEN o_orderkey % 2 = 0 THEN {SKEW_HOT_CUST} ELSE o_custkey END"
    },
    "lineitem": {  # ONE supplier and ONE part each take a third of lineitem
        "l_suppkey": f"CASE WHEN (l_orderkey * 7 + l_linenumber) % 3 = 0 THEN {SKEW_HOT_SUPP} ELSE l_suppkey END",
        "l_partkey": f"CASE WHEN (l_orderkey * 7 + l_linenumber) % 3 = 1 THEN {SKEW_HOT_PART} ELSE l_partkey END",
    },
    "documents": {  # hot shingles: a third of all docs share one sentence
        "text": f"CASE WHEN doc_id % 3 = 0 THEN text || '{SKEW_BOILERPLATE}' ELSE text END"
    },
}


def build_skewed(con, src: str, dest: str) -> None:
    """Hot-key lake (see SKEW_RULES).  Swept for CORRECTNESS (same-lake
    oracle parity — skew must never change a result) and for BLOW-UP
    (`tools/time_registry.py` against it vs the clean lake: no query may
    go quadratic on a hot key or hot shingle).  Since round 5 every
    REGISTERED query is skew-safe by construction: the deliberately
    uncapped exact Jaccard generator was quarantined out of the registry
    (`pgcp_spark.functions.dedup.exact_jaccard_pairs`, test-oracle only) —
    a df≈n/3 shingle is exactly the case its df-capped production twin
    `dedup_jaccard_hot_shingle_capped` exists for."""
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        rules = SKEW_RULES.get(t, {})
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()
        ]
        sel = ", ".join(f"{rules[c]} AS {c}" if c in rules else c for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet') "
            f"TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"skewed lake -> {dest}")


VARIANTS = {
    "empty": build_empty,
    "nulls": build_nulls,
    "degenerate": build_degenerate,
    "scrambled": build_scrambled,
    "skewed": build_skewed,
}


def main(src: str, dest_root: str, only: list[str] | None = None) -> None:
    import duckdb

    con = duckdb.connect()
    selected = only or list(VARIANTS)
    unknown = [v for v in selected if v not in VARIANTS]
    if unknown:
        raise SystemExit(
            f"unknown variant(s) {unknown}; valid: {', '.join(VARIANTS)}"
        )
    for variant in selected:
        VARIANTS[variant](con, src, os.path.join(dest_root, variant))
    # schema parity check: every variant must read back with the source's
    # exact physical types, or the sweep tests a different lake
    for variant in selected:
        for t in TABLES:
            want = con.execute(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()
            got = con.execute(
                f"DESCRIBE SELECT * FROM '{dest_root}/{variant}/{t}.parquet'"
            ).fetchall()
            if [(r[0], r[1]) for r in want] != [(r[0], r[1]) for r in got]:
                raise SystemExit(f"schema drift in {variant}/{t}: {got} != {want}")
    print("schema parity: OK")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dest_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/edge_lakes"
    main(src, dest_root, only=sys.argv[3:] or None)
