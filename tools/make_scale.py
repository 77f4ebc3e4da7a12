"""Synthesize a larger scale factor from an existing testdata directory by
replicating each table N times with FK-consistent key offsets.

Usage: python tools/make_scale.py [src_dir] [dest_dir] [factor]

Why: the driver ships sf≤0.1; scale design claims ("this plan holds at 10×")
need measurement, not faith. Replication preserves value distributions and
join fan-out while multiplying cardinality; keys are offset per replica so
uniqueness and FK relationships survive (replica i's orders reference
replica i's customers). Output is written as multiple parquet files per
table so scans parallelize like a real lake (one file = one input
partition = a serialized scan).
"""

from __future__ import annotations

import os
import sys

# key columns to offset per table: (column, stride_source_table)
OFFSETS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
    # region/nation are fixed dimensions — replicating them would corrupt
    # the FK space (c_nationkey etc. stay in the original range)
    "region": {},
    "nation": {},
}


def main(src: str, dest: str, factor: int) -> None:
    import duckdb

    con = duckdb.connect()
    os.makedirs(dest, exist_ok=True)
    # stride per *referenced* table = max(key)+1 of that table's own key space
    key_of = {
        "customer": "c_custkey",
        "supplier": "s_suppkey",
        "part": "p_partkey",
        "orders": "o_orderkey",
        "events": "event_id",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }
    strides = {
        t: con.execute(f"SELECT MAX({k}) + 1 FROM '{src}/{t}.parquet'").fetchone()[0]
        for t, k in key_of.items()
    }

    for table, cols in OFFSETS.items():
        out = os.path.join(dest, f"{table}.parquet")
        if not cols:  # fixed dims: copy once
            con.execute(
                f"COPY (SELECT * FROM '{src}/{table}.parquet') TO '{out}' (FORMAT PARQUET)"
            )
            print(f"{table}: copied (fixed dim)")
            continue
        all_cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'").fetchall()
        ]
        selects = []
        for i in range(factor):
            exprs = []
            for c in all_cols:
                if c in cols:
                    exprs.append(f"{c} + {i} * {strides[cols[c]]} AS {c}")
                else:
                    exprs.append(c)
            selects.append(f"SELECT {', '.join(exprs)} FROM '{src}/{table}.parquet'")
        union = " UNION ALL ".join(selects)
        # directory of ~8 row-group-sized files so Spark parallelizes the scan
        os.makedirs(out, exist_ok=True)
        con.execute(
            f"COPY ({union}) TO '{out}' (FORMAT PARQUET, PER_THREAD_OUTPUT true, ROW_GROUP_SIZE 200000)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/*.parquet'").fetchone()[0]
        print(f"{table}: {n} rows x{factor}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, dest, factor)
