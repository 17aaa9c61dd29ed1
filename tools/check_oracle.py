"""Self-check harness mimicking the driver's correctness gate:
runs each __spark_entry__ query AND its DuckDB oracle at a given sf,
compares row count + column set + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from timeseriesflattener_spark import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def rows_to_multiset(rows, cols):
    cols_sorted = sorted(cols)
    return sorted(tuple(norm(r[c]) for c in cols_sorted) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows, cols={scols}")
            continue
        orel = con.sql(oracles[name])
        ocols = orel.columns
        orows = [dict(zip(ocols, row)) for row in orel.fetchall()]
        status = []
        if len(srows) != len(orows):
            status.append(f"ROWCOUNT {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            status.append(f"SCHEMA {sorted(scols)} vs {sorted(ocols)}")
        if not status:
            sm = rows_to_multiset(srows, scols)
            om = rows_to_multiset(orows, ocols)
            if sm != om:
                diffs = [(a, b) for a, b in zip(sm, om) if a != b][:3]
                status.append(f"VALUES ({sum(1 for a, b in zip(sm, om) if a != b)} rows differ) e.g. {diffs}")
        if status:
            failures.append(name)
            print(f"{name:28s} FAIL: {'; '.join(status)}")
        else:
            print(f"{name:28s} OK ({len(srows)} rows)")
    print()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
