"""applyInPandasWithState: per-conversation running profiles across
micro-batches equal the batch aggregation at stream end."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timeseriesflattener_spark.streaming.stateful import start_profile_stream

SCHEMA = "conv_id string, ts timestamp, v double"


def test_stateful_profiles_equal_batch(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    files = [
        [("a", t0 + dt.timedelta(minutes=i), float(i)) for i in range(5)]
        + [("b", t0, 10.0)],
        [("a", t0 + dt.timedelta(hours=1, minutes=i), float(100 + i)) for i in range(3)],
        [("c", t0, -1.0), ("b", t0 + dt.timedelta(days=1), 20.0)],
    ]
    in_dir = str(tmp_path / "in")
    for rows in files:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)

    out_dir = str(tmp_path / "out")
    q = start_profile_stream(
        spark, in_dir, SCHEMA, out_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir)
    # state crossed batches: conversation 'a' was updated in >1 batch
    assert out.filter(F.col("conv_id") == "a").select("batch_id").distinct().count() > 1
    # latest row per conversation == batch ground truth
    w = Window.partitionBy("conv_id").orderBy(F.desc("batch_id"))
    latest = {
        r["conv_id"]: (r["n_events"], r["v_sum"], r["v_min"], r["v_max"])
        for r in out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    truth = {
        r["conv_id"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in spark.read.parquet(in_dir)
        .groupBy("conv_id")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert latest == truth
