#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" (per-query sec),
"sf", plus informational extras (rolled_points_per_sec for the
transcript-tier north metric)}.

--scaling: run the transcript tier-materialisation job at local[8] and
local[32] on identical input and report throughput + scaling efficiency
(the in-sandbox stand-in for N vs 4N executors; see BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

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

#: transcript scale for the tier throughput metric, keyed by sf
TRANSCRIPT_CONVS = {0.001: 300, 0.01: 3000, 0.1: 30_000}


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _tier_job(spark, n_convs: int) -> tuple[int, float]:
    """Synthesize transcripts -> 1m partials -> 1h -> 1d; returns
    (total rolled points across tiers, wall seconds)."""
    from pyspark.sql import functions as F

    from timeseriesflattener_spark.plans import rollup as R
    from timeseriesflattener_spark.sources.transcripts import (
        derive_channels,
        synthesize_transcripts,
    )

    vc = ["text_len", "n_tokens", "tool_call"]
    t0 = time.time()
    ch = derive_channels(synthesize_transcripts(spark, n_conversations=n_convs, seed=42))
    p1m = R.partial_aggregate(ch, vc, tier="1m")
    p1m.persist()
    n1m = p1m.count()
    p1h = R.rollup(p1m, vc, to_tier="1h")
    p1h.persist()
    n1h = p1h.count()
    n1d = R.rollup(p1h, vc, to_tier="1d").count()
    # touch finalized points too (the actual consumer-facing output)
    R.finalize(p1m, vc).agg(F.count("*")).collect()
    wall = time.time() - t0
    p1m.unpersist()
    p1h.unpersist()
    # a "point" = one finalized stat bucket per channel per tier
    points = (n1m + n1h + n1d) * len(vc)
    return points, wall


def _session(cores: str, app: str):
    from timeseriesflattener_spark import get_spark

    return get_spark(
        app_name=app, master=f"local[{cores}]", shuffle_partitions=int(cores)
    )


def run_headline() -> None:
    import __spark_entry__ as entrymod

    spark = _session(CPUS, "tsf-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    per_query: dict[str, float] = {}
    # warm the JVM/codegen once on a small query so timings measure the
    # plan, not first-run classloading
    queries["tpch_pricing_summary"](spark, SF_DIR).count()

    total = 0.0
    for name in HEADLINE:
        t0 = time.time()
        queries[name](spark, SF_DIR).count()
        per_query[name] = round(time.time() - t0, 3)
        total += per_query[name]

    sf = _sf_from_dir(SF_DIR)
    n_convs = TRANSCRIPT_CONVS.get(sf, 30_000)
    points, wall = _tier_job(spark, n_convs)
    per_query["transcript_tiers"] = round(wall, 3)
    total += per_query["transcript_tiers"]

    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "rolled_points": points,
                "rolled_points_per_sec": round(points / wall, 1),
                "cpus": int(CPUS),
            }
        )
    )


def run_scaling() -> None:
    """Same tier job at local[8] then local[32]: scaling evidence."""
    sf = _sf_from_dir(SF_DIR)
    n_convs = TRANSCRIPT_CONVS.get(sf, 30_000)
    results = {}
    for cores in ("8", "32"):
        spark = _session(cores, f"tsf-scaling-{cores}")
        spark.sparkContext.setLogLevel("ERROR")
        _tier_job(spark, 500)  # warmup
        points, wall = _tier_job(spark, n_convs)
        results[cores] = {
            "points": points,
            "wall_s": round(wall, 3),
            "points_per_sec": round(points / wall, 1),
        }
        spark.stop()
    speedup = results["8"]["wall_s"] / results["32"]["wall_s"]
    efficiency = speedup / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32_cores",
                "value": round(efficiency, 3),
                "unit": "ratio",
                "speedup": round(speedup, 3),
                "runs": results,
                "sf": sf,
                "n_conversations": n_convs,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        run_headline()
