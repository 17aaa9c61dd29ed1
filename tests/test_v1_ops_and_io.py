"""v1 legacy operators, IO helpers, feature cache, aligned fast path."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark import (
    Flattener,
    PredictionTimeFrame,
    PredictorSpec,
    TimestampValueFrame,
    ValueFrame,
    strings_to_aggregators,
)
from timeseriesflattener_spark.operators.incident import (
    add_incident_outcome,
    filter_sufficient_lookdistance,
)
from timeseriesflattener_spark.plans import rollup as R
from timeseriesflattener_spark.plans.fastpath import flatten_aligned
from timeseriesflattener_spark.sources.io import (
    FeatureCache,
    split_long_to_value_frames,
)
from timeseriesflattener_spark.sources.transcripts import (
    derive_channels,
    synthesize_transcripts,
)
from timeseriesflattener_spark.testing import rows_as_dicts, str_to_df


def test_incident_outcome(spark):
    """Port of v1 incident semantics (``v1/flattened_dataset.py:563-605``):
    pred rows strictly after the outcome are dropped; flag set iff
    outcome in [pred+min, pred+max) — lower inclusive, upper EXclusive
    (the reference's ``outc < pred + max AND outc >= pred + min``)."""
    pred = PredictionTimeFrame(
        df=str_to_df(
            spark,
            """entity_id,pred_timestamp
            1,2021-01-01
            1,2021-06-01
            1,2022-01-01
            2,2021-01-01""",
        )
    )
    outcomes = TimestampValueFrame(
        df=str_to_df(spark, "entity_id,timestamp\n1,2021-06-15")
    )
    out = add_incident_outcome(pred, outcomes, lookahead=dt.timedelta(days=30))
    rows = {r["prediction_time_uuid"]: r["outc_incident"] for r in out.collect()}
    # 2022 pred is after the outcome -> dropped
    assert len(rows) == 3
    assert rows["1-2021-06-01 00:00:00.000000"] == 1  # outcome 14d ahead
    assert rows["1-2021-01-01 00:00:00.000000"] == 0  # too far ahead
    assert rows["2-2021-01-01 00:00:00.000000"] == 0  # no outcome


def test_filter_sufficient_lookdistance(spark):
    """Port of v1 insufficient-look-distance drop
    (``v1/flattened_dataset.py:629-666``)."""
    pred = PredictionTimeFrame(
        df=str_to_df(
            spark,
            """entity_id,pred_timestamp
            1,2021-01-05
            1,2021-06-01
            1,2021-12-30""",
        )
    )
    values = str_to_df(
        spark, "entity_id,value,timestamp\n1,1,2021-01-01\n1,2,2021-12-31"
    )
    out = filter_sufficient_lookdistance(
        pred, values, "timestamp",
        lookbehind=dt.timedelta(days=30), lookahead=dt.timedelta(days=30),
    )
    kept = [r["pred_timestamp"] for r in out.collect()]
    assert kept == [dt.datetime(2021, 6, 1)]


def test_split_long_to_value_frames(spark):
    long_df = str_to_df(
        spark,
        """entity_id,timestamp,value,value_names
        1,2021-01-01,1.0,hba1c
        1,2021-01-02,2.0,hdl
        1,2021-01-03,3.0,hba1c""",
    )
    frames = split_long_to_value_frames(long_df)
    assert set(frames) == {"hba1c", "hdl"}
    assert frames["hba1c"].value_col_names == ["hba1c"]
    assert frames["hba1c"].df.count() == 2


def test_feature_cache_roundtrip(spark, tmp_path):
    cache = FeatureCache(spark, str(tmp_path / "cache"))
    df = str_to_df(spark, "prediction_time_uuid,feat\na,1\nb,2")
    key = FeatureCache.fingerprint({"spec": "mean_30d", "cols": ["feat"]}, input_rows=2)
    assert cache.get(key) is None
    cache.put(key, df)
    got = cache.get(key)
    assert got is not None and got.count() == 2
    # different input row count -> different key -> miss
    key2 = FeatureCache.fingerprint({"spec": "mean_30d", "cols": ["feat"]}, input_rows=3)
    assert cache.get(key2) is None


def test_flatten_aligned_matches_flattener(spark):
    """Aligned fast path == reference-semantics flattener at matching
    window anchors (the join-free 10^12-row plan)."""
    ch = derive_channels(
        synthesize_transcripts(spark, n_conversations=25, avg_turns=12, seed=9, span_days=2)
    ).cache()
    vc = ["text_len", "n_tokens"]
    tier, k = "1h", 6
    w = R.tier_micros(tier)

    partials = R.partial_aggregate(ch.select("conv_id", "ts", "turn_idx", *vc), vc, tier=tier)
    fast = flatten_aligned(partials, vc, lookback_buckets=k, tier=tier)

    pred_df = fast.select(
        F.col("conv_id").alias("entity_id"),
        F.timestamp_micros(F.col("bucket_start") + F.lit(w - 1)).alias("pred_timestamp"),
        F.col("bucket_start"),
    ).cache()
    flat = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_df.drop("bucket_start"))
    ).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(
                    df=ch.withColumnRenamed("conv_id", "entity_id"),
                    value_timestamp_col_name="ts",
                    order_col_name="turn_idx",
                ),
                lookbehind_distances=[dt.timedelta(microseconds=k * w - 1)],
                aggregators=strings_to_aggregators(["mean", "count", "min", "max", "earliest", "latest"]),
                fallback=None,
            )
        ]
    )
    flat_rows = {(r["entity_id"], r["pred_timestamp"]): r.asDict() for r in flat.df.collect()}
    anchor_ts = {(r["entity_id"], r["bucket_start"]): r["pred_timestamp"] for r in pred_df.collect()}
    fast_rows = {(r["conv_id"], r["bucket_start"]): r.asDict() for r in fast.collect()}
    assert len(fast_rows) == len(flat_rows) > 0
    for (conv, bucket), frow in fast_rows.items():
        ref = flat_rows[(conv, anchor_ts[(conv, bucket)])]
        for v in vc:
            for agg in ["mean", "count", "min", "max", "earliest", "latest"]:
                got = frow[f"{v}_{agg}"]
                # -(6h-1µs) floors to -1 whole day in timedelta.days
                want = ref[f"pred_{v}_within_0_to_1_days_{agg}_fallback_None"]
                if isinstance(want, float):
                    assert got == pytest.approx(want, rel=1e-9), (conv, bucket, v, agg)
                else:
                    assert got == want, (conv, bucket, v, agg)


def test_incident_outcome_endpoint_semantics(spark):
    """The v1 boundary cases (``v1/flattened_dataset.py:585-596``):
    - a prediction AT the outcome instant is KEPT and flags 1 (min=0);
    - an outcome exactly at pred + lookahead is OUTSIDE (upper
      endpoint exclusive);
    - a prediction one microsecond after the outcome is dropped."""
    pred = PredictionTimeFrame(
        df=str_to_df(
            spark,
            """entity_id,pred_timestamp
            1,2021-06-15 00:00:00
            2,2021-05-16 00:00:00
            3,2021-06-15 00:00:01""",
        )
    )
    outcomes = TimestampValueFrame(
        df=str_to_df(
            spark,
            """entity_id,timestamp
            1,2021-06-15 00:00:00
            2,2021-06-15 00:00:00
            3,2021-06-15 00:00:00""",
        )
    )
    out = add_incident_outcome(pred, outcomes, lookahead=dt.timedelta(days=30))
    rows = {r["entity_id"]: r["outc_incident"] for r in out.collect()}
    assert rows[1] == 1      # td = 0: kept AND within [0, 30d)
    assert rows[2] == 0      # td = exactly 30d: upper endpoint exclusive
    assert 3 not in rows     # pred strictly after outcome: dropped


def test_csv_roundtrip_and_suffix_dispatch(spark, tmp_path):
    """read_csv parses timestamp columns (ref load_synth_data.py:16-22);
    load_dataset/write_dataset dispatch on suffix both directions."""
    import datetime as dt

    from timeseriesflattener_spark.sources.io import (
        load_dataset,
        read_csv,
        write_dataset,
    )

    src = spark.createDataFrame(
        [(1, dt.datetime(2021, 1, 2, 3, 4, 5), 1.5),
         (2, dt.datetime(2021, 6, 7, 8, 9, 10), -2.0)],
        "entity_id long, timestamp timestamp, value double",
    )
    csv_path = str(tmp_path / "vals.csv")
    pq_path = str(tmp_path / "vals.parquet")
    write_dataset(src, csv_path)
    write_dataset(src, pq_path)

    via_csv = read_csv(spark, csv_path).orderBy("entity_id").collect()
    assert [r["timestamp"] for r in via_csv] == [
        dt.datetime(2021, 1, 2, 3, 4, 5), dt.datetime(2021, 6, 7, 8, 9, 10)
    ]
    assert via_csv[0]["value"] == 1.5

    via_dispatch_csv = load_dataset(spark, csv_path).orderBy("entity_id").collect()
    assert [r["entity_id"] for r in via_dispatch_csv] == [1, 2]
    via_dispatch_pq = load_dataset(spark, pq_path).orderBy("entity_id").collect()
    assert [(r["entity_id"], r["value"]) for r in via_dispatch_pq] == [(1, 1.5), (2, -2.0)]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="Unsupported dataset suffix"):
        load_dataset(spark, str(tmp_path / "vals.json"))


def test_fingerprint64_stability(spark):
    """fingerprint64: whitespace-insensitive, content-sensitive."""
    from pyspark.sql import functions as F

    from timeseriesflattener_spark.operators.text import fingerprint64

    df = spark.createDataFrame(
        [(1, "hello  world"), (2, "hello world"), (3, "hello worlds"),
         (4, "\nhello\tworld\r\n")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", fingerprint64(F.col("text")).alias("f")).collect()}
    assert got[1] == got[2]      # internal whitespace normalised
    assert got[1] != got[3]      # content-sensitive
    assert got[1] == got[4]      # edge \n/\t/\r normalised too
