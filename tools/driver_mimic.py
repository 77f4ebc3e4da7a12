"""Closer mimic of the driver's CORRECTNESS canonicalization than the
tuple-compare in tests/oracle_check.py: both sides go through pandas,
columns sorted by name, rows sorted by all columns, then dtypes and
values are compared. This is the layer where DuckDB HUGEINT vs Spark
BIGINT representation mismatches show up.

Usage: python tools/driver_mimic.py [query_name ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgcp_spark.registry import all_queries

SF_DIR = os.environ.get("MIMIC_SF_DIR", "/root/testdata/sf0.01")
# Where DuckDB reads its tables. Defaults to the Spark lake; point it at a
# DIFFERENT physical layout of the same rows (tools/make_edge_lake.py's
# "scrambled" variant) to prove input-order invariance: Spark on the
# permuted lake must still match the canonical lake's oracle bit-exactly.
ORACLE_SF_DIR = os.environ.get("MIMIC_ORACLE_SF_DIR", SF_DIR)
TABLES = [
    "region", "nation", "customer", "supplier", "part", "partsupp",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # ns-vs-us datetime resolution is benign for the driver hash (r1 had
    # green queries with timestamp outputs) — normalize so only REAL
    # representation differences (e.g. HUGEINT→float64) surface
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
        elif dt in ("int8", "int16", "int32"):
            # width is benign too: agg_collect_sorted_priorities was GREEN
            # in r1 with Spark int32 vs DuckDB int64. int-vs-FLOAT is the
            # class that fails (HUGEINT→float64), so leave floats alone.
            df[c] = df[c].astype("int64")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("MIMIC_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        # sf1-lake sweeps OOM the default driver heap on large collects
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .appName("driver-mimic")
        .getOrCreate()
    )
    con = duckdb.connect()

    for t in TABLES:
        path = f"{ORACLE_SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            # multi-file lake layout (tools/make_scale.py): glob the parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/*.parquet')")
        elif os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = all_queries()
    names = sys.argv[1:] or sorted(qs)
    failures = 0
    for name in names:
        q = qs[name]
        try:
            sp = canon(q.fn(spark, SF_DIR).toPandas())
        except Exception as exc:  # driver records this as err
            print(f"{name}: ERR spark/canon: {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if q.oracle is None:
            print(f"{name}: rows-only ok ({len(sp)} rows, canon fine)")
            continue
        du = canon(con.execute(q.oracle).df())
        ok = True
        if list(sp.columns) != list(du.columns):
            print(f"{name}: SCHEMA cols {list(sp.columns)} vs {list(du.columns)}")
            ok = False
        elif len(sp) != len(du):
            print(f"{name}: ROWS {len(sp)} vs {len(du)}")
            ok = False
        else:
            for c in sp.columns:
                a, b = sp[c], du[c]
                if str(a.dtype) != str(b.dtype):
                    print(f"{name}: DTYPE {c}: spark={a.dtype} duckdb={b.dtype}")
                    ok = False
                try:
                    same = (a.fillna("\0") == b.fillna("\0")).all() if a.dtype == object else a.equals(b)
                except Exception:
                    same = a.astype(str).equals(b.astype(str))
                if not same:
                    print(f"{name}: VALUES differ in {c}")
                    ok = False
        if ok:
            print(f"{name}: OK ({len(sp)} rows)")
        else:
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
