#!/usr/bin/env python
"""Dump .explain("formatted") for declared queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/explain_dump.py <suffix> [query ...]
  suffix: e.g. "before" or "after"; files land in plans/r08/.
  With no query names, dumps the headline suite.

$SPARK_GRAFT_SF_DIR picks the data dir (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADLINE = [
    "flatten_multiwindow",
    "flatten_slope",
    "flatten_earliest_latest",
    "rollup_1h",
    "rollup_1d_from_1h",
    "gapfill_linear_1d",
    "gorilla_roundtrip",
    "dedup_minhash",
    "ann_cosine_topk",
    "tpch_pricing_summary",
    "tpch_revenue_by_nation",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from timeseriesflattener_spark import get_spark

    spark = get_spark(
        app_name="tsf-explain",
        master="local[4]",
        shuffle_partitions=12,
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
