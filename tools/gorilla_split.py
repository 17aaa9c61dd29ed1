"""Gorilla 10x stage-split probe (VERDICT r5 #2).

gorilla_roundtrip's 10x wall ratio (~5 at 10x data) is the suite's
worst; this tool attributes the wall to its stages at BOTH scales so
"linear codec on fixed cores" is proven (or refuted) with numbers:

  arrange  — the repartition(conv_id, chunk_start) + sortWithinPartitions
             exchange feeding the encoder (pure JVM shuffle)
  encode   — arrange + the encode mapInPandas (Arrow in/out + codec)
  decode   — decode_chunks over PRE-MATERIALISED chunk parquet (isolates
             the decode UDF + point fan-out from the encode lineage)
  roundtrip— the full query as the bench runs it

Each timing is min-of-N in ONE session (same machine window; the
cross-scale RATIO is the object, not absolute walls). Also sweeps
spark.sql.execution.arrow.maxRecordsPerBatch — every mapInPandas batch
pays pandas assembly + mask overhead, so batch size is the one knob
that changes Python-side throughput without touching the plan.

Usage: python tools/gorilla_split.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (reuse _session/_scaled_dir/_machine_state)
from timeseriesflattener_spark.functions.gorilla import (  # noqa: E402
    decode_chunks,
    encode_chunks,
)


def _conv(spark, sf_dir):
    import __spark_entry__ as entrymod  # noqa: F401

    from __spark_entry__ import _events_as_conv

    return _events_as_conv(spark, sf_dir)


def timed(fn, n: int = 2) -> float:
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        w = time.time() - t0
        best = w if best is None or w < best else best
    return round(best, 3)


def split_at(spark, sf_dir: str, work: str) -> dict:
    from pyspark.sql import functions as F

    from timeseriesflattener_spark.functions.timeutils import micros
    from timeseriesflattener_spark.plans.rollup import bucket_expr

    conv = _conv(spark, sf_dir)
    n_rows = conv.count()

    # arrange-only: the exact exchange+sort the encoder consumes
    bucketed = conv.select(
        F.col("conv_id"),
        bucket_expr(F.col("ts"), "1d").alias("chunk_start"),
        micros(F.col("ts")).alias("__ts_micros"),
        F.col("value").cast("double").alias("__value"),
        F.col("turn_idx").alias("__ord"),
    )
    n_parts = spark.sparkContext.defaultParallelism
    arranged = bucketed.repartition(n_parts, "conv_id", "chunk_start").sortWithinPartitions(
        "conv_id", "chunk_start", "__ts_micros", "__ord"
    )
    t_arrange = timed(lambda: arranged.count())

    enc = encode_chunks(conv, "value", tier="1d", order_col="turn_idx")
    t_encode = timed(lambda: enc.count())

    # materialise chunks once so decode timing excludes the encode lineage
    chunk_path = os.path.join(work, f"chunks-{os.path.basename(sf_dir.rstrip('/'))}")
    enc.write.mode("overwrite").parquet(chunk_path)
    chunks = spark.read.parquet(chunk_path)
    t_decode = timed(lambda: decode_chunks(chunks, value_col="value").count())

    t_roundtrip = timed(
        lambda: decode_chunks(
            encode_chunks(conv, "value", tier="1d", order_col="turn_idx"),
            value_col="value",
        ).count()
    )
    return {
        "rows": n_rows,
        "arrange_s": t_arrange,
        "encode_s": t_encode,
        "encode_udf_s": round(t_encode - t_arrange, 3),
        "decode_s": t_decode,
        "roundtrip_s": t_roundtrip,
    }


def main() -> None:
    import shutil
    import tempfile

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "tools/gorilla_split.json"
    bench.SF_DIR = sf_dir

    report: dict = {"sf_dir": sf_dir, "machine": bench._machine_state()}
    work = tempfile.mkdtemp(prefix="tsf-gsplit-")
    for batch in (10_000, 65_536):
        spark = bench._session(
            bench.CPUS,
            f"gorilla-split-{batch}",
            extra={"spark.sql.execution.arrow.maxRecordsPerBatch": str(batch)},
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1).mapInPandas(lambda it: it, "id long").count()  # warm
        big_dir = bench._scaled_dir(spark, 10, base_dir=sf_dir)
        base = split_at(spark, sf_dir, work)
        scaled = split_at(spark, big_dir, work)
        report[f"batch_{batch}"] = {
            "base": base,
            "scaled_10x": scaled,
            "ratio": {
                k: round(scaled[k] / max(base[k], 1e-9), 2)
                for k in base
                if k.endswith("_s")
            },
        }
        spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
