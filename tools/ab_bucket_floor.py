#!/usr/bin/env python
"""Controlled A/B: pmod bucket floor (r3) vs cast truncation (r2).

VERDICT r3 #1: the 32-core tier scaling leg regressed 43->64 s between
r2 and r3, and the only tier-hot-path code change was
``bucket_expr``'s ``(m/w).cast(long)*w`` -> ``m - pmod(m, w)``
(commit aba63d3).  This script decides "arithmetic cost" vs "machine
state" the only defensible way: fresh process per leg, min-of-3 inside
each leg (bench.py --one-leg), BOTH variants run in BOTH orders on an
idle box, interleaved so slow drift hits both variants equally.

Variant selection: ``TSF_BUCKET_FLOOR=cast`` in the leg's env, read by
``bench.py --one-leg`` (NOT the library) and threaded explicitly via
``plans.rollup.set_floor_variant`` — a plan-construction-time switch
with zero per-row cost; the library itself never sniffs the ambient
environment, so the variable cannot leak into a real job's bucketing.

Also runs a pure-expression micro-bench (--micro): sum of the floored
column over a 400M-row range, both variants, one process — isolates
the arithmetic from the tier job's shuffle/IO.

Usage: python tools/ab_bucket_floor.py [--convs 2000000] [--cores 32]
Writes ab_bucket_floor.json next to this file and prints a table.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def one_leg(variant: str, cores: int, convs: int) -> dict:
    env = dict(os.environ)
    env["TSF_BUCKET_FLOOR"] = variant
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, BENCH, "--one-leg", str(cores), str(convs)],
        capture_output=True, text=True, check=True, env=env,
    )
    leg = json.loads(out.stdout.strip().splitlines()[-1])
    leg["variant"] = variant
    leg["proc_wall_s"] = round(time.time() - t0, 1)
    leg["load_before"] = os.getloadavg()[0]
    return leg


def micro(cores: int) -> dict:
    """Pure expression cost, one process: sum(floor(m)) over a range."""
    env = dict(os.environ)
    code = r"""
import time, json
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[%d]").appName("ab-micro")
         .config("spark.sql.shuffle.partitions", "%d")
         .config("spark.driver.memory", "8g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
N = 400_000_000
W = 60_000_000
df = spark.range(N).select((F.col("id") * 97 - N // 2).alias("m"))
pmod_expr = F.col("m") - F.pmod(F.col("m"), F.lit(W))
cast_expr = (F.col("m") / F.lit(W)).cast("long") * F.lit(W)
res = {}
for name, e in [("pmod", pmod_expr), ("cast", cast_expr)] * 2:
    t0 = time.time()
    df.select(F.sum(e)).collect()
    res.setdefault(name, []).append(round(time.time() - t0, 3))
print("MICRO " + json.dumps(res))
""" % (cores, cores)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True, env=env)
    line = [l for l in out.stdout.splitlines() if l.startswith("MICRO ")][-1]
    return json.loads(line[len("MICRO "):])


def main() -> None:
    convs = int(sys.argv[sys.argv.index("--convs") + 1]) if "--convs" in sys.argv else 2_000_000
    cores = int(sys.argv[sys.argv.index("--cores") + 1]) if "--cores" in sys.argv else 32

    print(f"micro-bench (pure expression, local[{cores}]) ...", flush=True)
    micro_res = micro(cores)

    legs = []
    # both orders, twice: P C C P — drift symmetric, adjacency symmetric
    for variant in ("pmod", "cast", "cast", "pmod"):
        print(f"leg: {variant} local[{cores}] convs={convs} ...", flush=True)
        leg = one_leg(variant, cores, convs)
        print(f"  wall_s={leg['wall_s']} points={leg['points']} "
              f"load_before={leg['load_before']:.2f}", flush=True)
        legs.append(leg)

    by = {}
    for leg in legs:
        by.setdefault(leg["variant"], []).append(leg["wall_s"])
    summary = {
        v: {"walls": w, "min": min(w), "mean": round(statistics.mean(w), 2)}
        for v, w in by.items()
    }
    ratio = round(summary["pmod"]["min"] / summary["cast"]["min"], 3)
    payload = {
        "convs": convs, "cores": cores, "micro_sum_floor_s": micro_res,
        "legs": legs, "summary": summary, "pmod_over_cast_min_ratio": ratio,
    }
    with open(os.path.join(REPO, "tools", "ab_bucket_floor.json"), "w") as fh:
        json.dump(payload, fh, indent=2)
    print(json.dumps(payload["summary"]))
    print(f"pmod/cast min ratio: {ratio}")


if __name__ == "__main__":
    main()
