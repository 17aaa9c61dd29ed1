#!/usr/bin/env python
"""Round-8 optimization measurement harness (bench.py is FROZEN; this
file holds the extra instrumentation the optimization round needs).

Modes:
  --queries [names...]   time declared queries with .count() (bench.py's
                         methodology: min-of-3, cache cleared between
                         runs) at $SPARK_GRAFT_SF_DIR. Default: headline.
  --noop [names...]      same but the timed action is a noop-sink write
                         (guide §1.4: computes every column, no sink
                         cost, no count-only column pruning).
  --tiers [n_convs]      time the transcript tier job stage by stage
                         (synthesize+derive+1m write / 1h / 1d /
                         finalize) to locate the cost inside
                         bench._tier_job.

Prints one JSON line per mode run.
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


def _session(app: str):
    from timeseriesflattener_spark import get_spark

    spark = get_spark(
        app_name=app,
        master=f"local[{CPUS}]",
        shuffle_partitions=3 * int(CPUS),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _warm(spark, queries):
    queries["tpch_pricing_summary"](spark, SF_DIR).count()
    spark.range(1).mapInPandas(lambda it: it, "id long").count()


def run_queries(names: list[str], noop: bool = False) -> None:
    import __spark_entry__ as entrymod

    spark = _session("tsf-bench-extra")
    queries = entrymod.queries()
    _warm(spark, queries)
    per: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"extra:{name}")
            t0 = time.time()
            df = queries[name](spark, SF_DIR)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            wall = time.time() - t0
            best = wall if best is None or wall < best else best
        per[name] = round(best, 3)
    print(json.dumps({
        "mode": "noop" if noop else "count",
        "sf_dir": SF_DIR,
        "queries": per,
        "total": round(sum(per.values()), 3),
    }))


def run_tiers(n_convs: int) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from timeseriesflattener_spark.plans import rollup as R
    from timeseriesflattener_spark.sources.transcripts import (
        derive_channels,
        synthesize_transcripts,
    )

    spark = _session("tsf-tiers-extra")
    vc = ["text_len", "n_tokens", "tool_call"]

    def one_run() -> dict:
        work = tempfile.mkdtemp(prefix="tsf-tiers-extra-")
        stages: dict[str, float] = {}
        t0 = time.time()
        ch = derive_channels(
            synthesize_transcripts(
                spark, n_conversations=n_convs, seed=42, step_seconds=10
            )
        )
        R.partial_aggregate(ch, vc, tier="1m").write.option(
            "compression", "lz4"
        ).parquet(f"{work}/1m")
        stages["synth_1m_write"] = round(time.time() - t0, 3)
        t0 = time.time()
        p1m = spark.read.parquet(f"{work}/1m")
        p1m.count()
        R.rollup(p1m, vc, to_tier="1h").write.option("compression", "lz4").parquet(
            f"{work}/1h"
        )
        stages["1h_write"] = round(time.time() - t0, 3)
        t0 = time.time()
        p1h = spark.read.parquet(f"{work}/1h")
        p1h.count()
        R.rollup(p1h, vc, to_tier="1d").count()
        stages["1d_count"] = round(time.time() - t0, 3)
        t0 = time.time()
        R.finalize(p1m, vc).agg(F.count("*")).collect()
        stages["finalize"] = round(time.time() - t0, 3)
        stages["total"] = round(sum(stages.values()), 3)
        shutil.rmtree(work, ignore_errors=True)
        return stages

    one_run()  # warm
    best = min((one_run() for _ in range(2)), key=lambda s: s["total"])
    print(json.dumps({"mode": "tiers", "n_convs": n_convs, "stages": best}))


def run_synth(n_convs: int) -> None:
    """Isolate generation vs aggregation: noop-sink the synthesized
    transcripts, the derived channels, and the 1m partial aggregate."""
    from timeseriesflattener_spark.plans import rollup as R
    from timeseriesflattener_spark.sources.transcripts import (
        derive_channels,
        synthesize_transcripts,
    )

    spark = _session("tsf-synth-extra")
    vc = ["text_len", "n_tokens", "tool_call"]

    def noop(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    def one_run() -> dict:
        tr = synthesize_transcripts(
            spark, n_conversations=n_convs, seed=42, step_seconds=10
        )
        stages = {
            "synth_noop": noop(tr),
            "channels_noop": noop(derive_channels(tr)),
            "partial1m_noop": noop(R.partial_aggregate(derive_channels(tr), vc, tier="1m")),
        }
        return stages

    one_run()
    best = one_run()
    print(json.dumps({"mode": "synth", "n_convs": n_convs, "stages": best}))


def run_all(sf_dir: str, repeats: int = 2) -> None:
    """Time EVERY declared query once|twice at ``sf_dir`` (coverage sweep
    for the optimization round; .count() methodology, min-of-repeats)."""
    import __spark_entry__ as entrymod

    spark = _session("tsf-bench-all")
    queries = entrymod.queries()
    _warm(spark, queries)
    per: dict[str, float] = {}
    for name in queries:
        best = None
        try:
            for _ in range(repeats):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"all:{name}")
                t0 = time.time()
                queries[name](spark, sf_dir).count()
                wall = time.time() - t0
                best = wall if best is None or wall < best else best
            per[name] = round(best, 3)
        except Exception as exc:  # keep sweeping; record the failure
            per[name] = f"ERR: {exc}"[:120]
    print(json.dumps({"mode": "all", "sf_dir": sf_dir, "queries": per}))


if __name__ == "__main__":
    if "--all" in sys.argv:
        i = sys.argv.index("--all")
        sfd = sys.argv[i + 1] if len(sys.argv) > i + 1 else SF_DIR
        run_all(sfd)
    elif "--tiers" in sys.argv:
        i = sys.argv.index("--tiers")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 30_000
        run_tiers(n)
    elif "--synth" in sys.argv:
        i = sys.argv.index("--synth")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 30_000
        run_synth(n)
    elif "--noop" in sys.argv:
        i = sys.argv.index("--noop")
        run_queries(sys.argv[i + 1 :] or HEADLINE, noop=True)
    else:
        i = sys.argv.index("--queries") if "--queries" in sys.argv else None
        names = sys.argv[i + 1 :] if i is not None else []
        run_queries(names or HEADLINE)
