"""10x scale probe for the round-6 operators (they are not in the
round-comparable bench HEADLINE, so their scale evidence lives here):
single timed pass base vs 10x, wall ratio + row counts, same scaled-dir
construction as bench.py's tenx leg. Usage:
    python tools/probe_newops_scale.py [out.json] [op ...]
(op names default to NEW_OPS; pass a subset to probe only those;
SPARK_GRAFT_PROBE_FACTOR overrides the 10x scale-up, e.g. =100 with
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 for a cliff probe)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, SF_DIR, _machine_state, _scaled_dir, _session  # noqa: E402

NEW_OPS = [
    "quality_bins",
    "corpus_stats",
    "curriculum_schedule",
    "dedup_incremental",
    "pack_documents",
    "dedup_lines",
    "vocab_induct",
    "split_corpus",
    "chunk_documents",
    "lm_score",
    # r7 additions
    "zorder_key",
    "decontaminate_bloom",
    "conversation_shape",
    "semantic_clusters",
    "semantic_dedup",
]


def main() -> None:
    import __spark_entry__ as entrymod

    ops = sys.argv[2:] if len(sys.argv) > 2 else NEW_OPS
    from timeseriesflattener_spark.operators.dedup import release_shingle_caches
    from timeseriesflattener_spark.operators.pipeline import release_pipeline_caches
    from timeseriesflattener_spark.operators.similarity import release_kmeans_caches

    spark = _session(CPUS, "tsf-newops-scale")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    queries["tpch_pricing_summary"](spark, SF_DIR).count()  # JVM warm
    spark.range(1).mapInPandas(lambda it: it, "id long").count()  # Arrow warm
    factor = int(os.environ.get("SPARK_GRAFT_PROBE_FACTOR", "10"))
    big_dir = _scaled_dir(spark, factor)
    out = {}
    for name in ops:
        spark.catalog.clearCache()
        t0 = time.time()
        rows1 = queries[name](spark, SF_DIR).count()
        w1 = time.time() - t0
        release_shingle_caches(); release_pipeline_caches(); release_kmeans_caches()
        spark.catalog.clearCache()
        t0 = time.time()
        rows2 = queries[name](spark, big_dir).count()
        w2 = time.time() - t0
        release_shingle_caches(); release_pipeline_caches(); release_kmeans_caches()
        out[name] = {
            "base_s": round(w1, 3), "scaled_s": round(w2, 3),
            "ratio": round(w2 / w1, 2), "base_rows": rows1,
            "scaled_rows": rows2,
        }
    payload = {
        "metric": f"newops_scaleup_ratio_{factor}x",
        "value": max(v["ratio"] for v in out.values()),
        "unit": "x",
        "families": out,
        "sf_dir": SF_DIR,
        "factor": factor,
        "machine_before": _machine_state(),
    }
    print(json.dumps(payload))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            json.dump(payload, fh, indent=1)


if __name__ == "__main__":
    main()
