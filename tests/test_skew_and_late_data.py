"""Skew handling and late-data correctness (north-rule axes):

- pathological single-conversation skew: salted two-stage aggregation
  produces identical results and bounds the reducer's largest task;
- late-arriving rows for an already-materialised day merge via the
  algebraic combine and equal a full recompute;
- duplicate prediction-time validation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark import (
    Flattener,
    MeanAggregator,
    PredictionTimeFrame,
    PredictorSpec,
    SpecError,
    ValueFrame,
)
from timeseriesflattener_spark.plans import rollup as R
from timeseriesflattener_spark.plans.tiers import TierStore
from timeseriesflattener_spark.sources.transcripts import derive_channels, synthesize_transcripts
from timeseriesflattener_spark.streaming.incremental import merge_batch
from timeseriesflattener_spark.testing import str_to_df

VALUE_COLS = ["text_len", "n_tokens", "tool_call"]


def test_extreme_skew_salted_equals_plain(spark):
    """One conversation with 100x everyone else's turns — the salted
    two-stage path must be numerically identical to the plain path."""
    normal = synthesize_transcripts(spark, n_conversations=20, avg_turns=10, seed=4, heavy_every=10**9)
    monster = synthesize_transcripts(
        spark, n_conversations=1, avg_turns=10, seed=5, heavy_every=1, heavy_factor=200
    ).withColumn("conv_id", F.lit("conv-monster"))
    ch = derive_channels(normal.unionByName(monster))

    plain = R.finalize(
        R.partial_aggregate(ch, VALUE_COLS, tier="1h"), VALUE_COLS, include_bucket_ts=False
    )
    salted = R.finalize(
        R.partial_aggregate(ch, VALUE_COLS, tier="1h", salt_partitions=16),
        VALUE_COLS,
        include_bucket_ts=False,
    )
    pm = {(r["conv_id"], r["bucket_start"]): r.asDict() for r in plain.collect()}
    sm = {(r["conv_id"], r["bucket_start"]): r.asDict() for r in salted.collect()}
    assert pm.keys() == sm.keys()
    for k in pm:
        for c, v in pm[k].items():
            got = sm[k][c]
            if isinstance(v, float):
                assert got == pytest.approx(v, rel=1e-9), (k, c)
            else:
                assert got == v, (k, c)
    # the monster conversation is actually present and huge
    assert sum(1 for (c, _) in pm if c == "conv-monster") > 0


def test_late_data_merge_equals_recompute(spark, tmp_path):
    """Rows arriving AFTER a day was materialised re-open that day via
    the combine merge; result equals recomputing from the full data."""
    ch = derive_channels(
        synthesize_transcripts(spark, n_conversations=15, avg_turns=10, seed=8, span_days=2)
    ).cache()
    on_time = ch.filter(F.col("turn_idx") < 5)
    late = ch.filter(F.col("turn_idx") >= 5)

    store = TierStore(spark, str(tmp_path / "late"), VALUE_COLS)
    store.materialize(on_time)          # initial fill
    merge_batch(store, late)            # late rows re-open affected days

    ref = TierStore(spark, str(tmp_path / "ref"), VALUE_COLS)
    ref.materialize(ch)

    for tier in ("1m", "1h", "1d"):
        got = {
            (r["conv_id"], r["bucket_start"]): tuple(
                round(r[f"{v}_mean"], 9) for v in VALUE_COLS
            )
            for r in store.read_points(tier).collect()
        }
        want = {
            (r["conv_id"], r["bucket_start"]): tuple(
                round(r[f"{v}_mean"], 9) for v in VALUE_COLS
            )
            for r in ref.read_points(tier).collect()
        }
        assert got == want, tier


def test_duplicate_prediction_times_rejected(spark):
    pred = str_to_df(spark, "entity_id,pred_timestamp\n1,2021-01-03\n1,2021-01-03")
    values = str_to_df(spark, "entity_id,value,timestamp\n1,1,2021-01-02")
    with pytest.raises(SpecError, match="Duplicate prediction times"):
        Flattener(
            predictiontime_frame=PredictionTimeFrame(df=pred),
            validate_unique_prediction_times=True,
        ).aggregate_timeseries(
            specs=[
                PredictorSpec(
                    value_frame=ValueFrame(df=values),
                    lookbehind_distances=[dt.timedelta(days=1)],
                    aggregators=[MeanAggregator()],
                    fallback=0,
                )
            ]
        )


def test_flatten_under_extreme_entity_skew(spark):
    """One entity owns ~95% of all events: the range-constrained flatten
    join must stay correct under skew (AQE skew-join splits the hot
    partition at runtime; correctness must not depend on it)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from timeseriesflattener_spark import (
        Flattener,
        PredictionTimeFrame,
        PredictorSpec,
        ValueFrame,
        strings_to_aggregators,
    )

    t0 = dt.datetime(2024, 1, 15)
    hot = spark.range(20_000).select(
        F.lit(1).alias("entity_id"),
        (F.lit(t0) - (F.col("id") % 720) * F.expr("INTERVAL 1 HOUR")).alias("timestamp"),
        F.lit(1.0).alias("value"),
    )
    cold = spark.range(100).select(
        (F.col("id") + 2).alias("entity_id"),
        F.lit(t0 - dt.timedelta(days=3)).alias("timestamp"),
        F.lit(5.0).alias("value"),
    )
    values = hot.unionByName(cold)
    pred = spark.createDataFrame(
        [(e, t0) for e in range(1, 102)], "entity_id long, pred_timestamp timestamp"
    )
    out = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred)
    ).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=values),
                lookbehind_distances=[dt.timedelta(days=30)],
                aggregators=strings_to_aggregators(["count", "sum"]),
                fallback=0,
            )
        ]
    ).df
    rows = {r["entity_id"]: r for r in out.collect()}
    p = "pred_value_within_0_to_30_days"
    # hot entity: events at t0 - (id%720) hours; id%720 spans 0..719,
    # 20000 = 27*720 + 560 -> offsets 0..559 occur 28x, 560..719 27x;
    # all offsets <= 719h < 30d so every event is in-window
    assert rows[1][f"{p}_count_fallback_0"] == 20_000
    assert rows[1][f"{p}_sum_fallback_0"] == 20_000.0
    for e in range(2, 102):
        assert rows[e][f"{p}_count_fallback_0"] == 1, e
        assert rows[e][f"{p}_sum_fallback_0"] == 5.0, e
