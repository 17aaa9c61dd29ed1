"""Port of the reference v2 end-to-end suite (``main_test.py:62-364``)
to Spark DataFrame assertions."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriesflattener_spark import (
    BooleanOutcomeSpec,
    EarliestAggregator,
    Flattener,
    MaxAggregator,
    MeanAggregator,
    OutcomeSpec,
    PredictionTimeFrame,
    PredictorSpec,
    SpecError,
    StaticFrame,
    StaticSpec,
    TimestampValueFrame,
    ValueFrame,
)
from timeseriesflattener_spark.testing import rows_as_dicts, str_to_df

from .conftest import assert_rows_match

NAN = float("nan")


def test_main_slice(spark):
    """SURVEY.md §7.1 minimum end-to-end slice (ref ``main_test.py:72-102``)."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2021-01-03")
    value_frame = str_to_df(
        spark,
        """entity_id,value,timestamp
        1,1,2021-01-01
        1,2,2021-01-02
        1,4,2021-01-03""",
    )
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_frame)
    ).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame),
                lookbehind_distances=[dt.timedelta(days=1)],
                aggregators=[MeanAggregator()],
                fallback=NAN,
            )
        ]
    )
    rows = rows_as_dicts(result.df)
    assert_rows_match(
        rows,
        [
            {
                "entity_id": 1,
                "prediction_time_uuid": "1-2021-01-03 00:00:00.000000",
                "pred_value_within_0_to_1_days_mean_fallback_nan": 3.0,
            }
        ],
    )


def test_keep_prediction_times_without_predictors(spark):
    """Ref ``main_test.py:105-136``: fallback-only rows survive."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2021-01-03")
    value_frame = str_to_df(spark, "entity_id,value,timestamp\n1,1,2021-01-01")
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_frame)
    ).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame),
                lookbehind_distances=[dt.timedelta(days=1)],
                aggregators=[MeanAggregator(), EarliestAggregator()],
                fallback=123,
            )
        ]
    )
    assert_rows_match(
        rows_as_dicts(result.df),
        [
            {
                "prediction_time_uuid": "1-2021-01-03 00:00:00.000000",
                "pred_value_within_0_to_1_days_mean_fallback_123": 123.0,
                "pred_value_within_0_to_1_days_earliest_fallback_123": 123.0,
            }
        ],
    )


def test_multiple_features(spark):
    """Ref ``main_test.py:140-186``: two specs, two outputs."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2021-01-03")
    value_a = str_to_df(
        spark,
        """entity_id,value_a,timestamp
        1,1,2021-01-01
        1,2,2021-01-02
        1,4,2021-01-03""",
    )
    value_b = str_to_df(
        spark,
        """entity_id,value_b,timestamp
        1,10,2021-01-02
        1,20,2021-01-03""",
    )
    specs = [
        PredictorSpec(
            value_frame=ValueFrame(df=value_a),
            lookbehind_distances=[dt.timedelta(days=1)],
            aggregators=[MeanAggregator()],
            fallback=NAN,
        ),
        PredictorSpec(
            value_frame=ValueFrame(df=value_b),
            lookbehind_distances=[dt.timedelta(days=1)],
            aggregators=[MaxAggregator()],
            fallback=NAN,
        ),
    ]
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_frame)
    ).aggregate_timeseries(specs=specs)
    assert_rows_match(
        rows_as_dicts(result.df),
        [
            {
                "pred_value_a_within_0_to_1_days_mean_fallback_nan": 3.0,
                "pred_value_b_within_0_to_1_days_max_fallback_nan": 20.0,
            }
        ],
    )


def test_interval_lookperiod(spark):
    """Ref ``main_test.py`` interval lookdistance: (1d, 2d) tuple."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2021-01-03")
    value_frame = str_to_df(
        spark,
        """entity_id,value,timestamp
        1,1,2021-01-01
        1,2,2021-01-02
        1,4,2021-01-03""",
    )
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_frame)
    ).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame),
                lookbehind_distances=[(dt.timedelta(days=1), dt.timedelta(days=2))],
                aggregators=[MeanAggregator()],
                fallback=NAN,
            )
        ]
    )
    # window is td in [-2d, -1d]: values at 01-01 (-2d) and 01-02 (-1d) -> 1.5
    assert_rows_match(
        rows_as_dicts(result.df),
        [{"pred_value_within_1_to_2_days_mean_fallback_nan": 1.5}],
    )


def test_outcome_lookahead(spark):
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2021-01-01")
    value_frame = str_to_df(
        spark,
        """entity_id,value,timestamp
        1,1,2021-01-01
        1,2,2021-01-02
        1,4,2021-01-05""",
    )
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_frame)
    ).aggregate_timeseries(
        specs=[
            OutcomeSpec(
                value_frame=ValueFrame(df=value_frame),
                lookahead_distances=[dt.timedelta(days=2)],
                aggregators=[MaxAggregator()],
                fallback=NAN,
            )
        ]
    )
    # lookahead [0, 2d]: values at +0d (1) and +1d (2) -> max 2
    assert_rows_match(
        rows_as_dicts(result.df),
        [{"outc_value_within_0_to_2_days_max_fallback_nan": 2.0}],
    )


def test_boolean_outcome(spark):
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2021-01-01\n2,2021-01-01")
    event_frame = str_to_df(spark, "entity_id,timestamp\n1,2021-01-02")
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_frame)
    ).aggregate_timeseries(
        specs=[
            BooleanOutcomeSpec(
                init_frame=TimestampValueFrame(df=event_frame),
                lookahead_distances=[dt.timedelta(days=2)],
                aggregators=[MaxAggregator()],
                output_name="outcome",
            )
        ]
    )
    rows = {r["entity_id"]: r for r in rows_as_dicts(result.df)}
    assert rows[1]["outc_outcome_within_0_to_2_days_max_fallback_0"] == 1
    assert rows[2]["outc_outcome_within_0_to_2_days_max_fallback_0"] == 0


def test_static_and_temporal_mix(spark):
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2021-01-03\n2,2021-01-03")
    value_frame = str_to_df(spark, "entity_id,value,timestamp\n1,4,2021-01-03")
    static_frame = str_to_df(spark, "entity_id,sex\n1,female\n2,male")
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_frame)
    ).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame),
                lookbehind_distances=[dt.timedelta(days=1)],
                aggregators=[MeanAggregator()],
                fallback=NAN,
            ),
            StaticSpec(
                value_frame=StaticFrame(df=static_frame),
                column_prefix="pred",
                fallback=0,
            ),
        ]
    )
    rows = {r["entity_id"]: r for r in rows_as_dicts(result.df)}
    assert rows[1]["pred_sex_fallback_0"] == "female"
    assert rows[2]["pred_sex_fallback_0"] == "male"
    assert rows[1]["pred_value_within_0_to_1_days_mean_fallback_nan"] == 4.0
    assert math.isnan(rows[2]["pred_value_within_0_to_1_days_mean_fallback_nan"])


def test_spec_conflict_raises(spark):
    """Ref ``main_test.py``: duplicate value column names across specs."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2021-01-03")
    value_frame = str_to_df(spark, "entity_id,value,timestamp\n1,1,2021-01-01")
    spec = PredictorSpec(
        value_frame=ValueFrame(df=value_frame),
        lookbehind_distances=[dt.timedelta(days=1)],
        aggregators=[MeanAggregator()],
        fallback=NAN,
    )
    with pytest.raises(SpecError, match="value"):
        Flattener(
            predictiontime_frame=PredictionTimeFrame(df=pred_frame)
        ).aggregate_timeseries(specs=[spec, spec])


def test_unordered_pred_times_with_step_size(spark):
    """Ref ``main_test.py:321-364``: step_size chunking is semantically
    identical to the unchunked path."""
    pred_frame = str_to_df(
        spark,
        """entity_id,pred_timestamp
        1,2021-06-01
        1,2020-02-01
        2,2021-01-01
        2,2022-01-01""",
    )
    value_frame = str_to_df(
        spark,
        """entity_id,value,timestamp
        1,1,2020-01-15
        1,2,2021-05-28
        2,3,2020-12-20
        2,4,2021-12-30""",
    )

    def run(step_size):
        return Flattener(
            predictiontime_frame=PredictionTimeFrame(df=pred_frame)
        ).aggregate_timeseries(
            specs=[
                PredictorSpec(
                    value_frame=ValueFrame(df=value_frame),
                    lookbehind_distances=[dt.timedelta(days=30)],
                    aggregators=[MeanAggregator()],
                    fallback=NAN,
                )
            ],
            step_size=step_size,
        )

    unchunked = rows_as_dicts(run(None).df)
    chunked = rows_as_dicts(run(dt.timedelta(days=365)).df)
    assert_rows_match(chunked, unchunked, sort_keys=["prediction_time_uuid"])
    by_uuid = {r["prediction_time_uuid"]: r for r in unchunked}
    col = "pred_value_within_0_to_30_days_mean_fallback_nan"
    assert by_uuid["1-2020-02-01 00:00:00.000000"][col] == 1.0
    assert by_uuid["1-2021-06-01 00:00:00.000000"][col] == 2.0
    assert by_uuid["2-2021-01-01 00:00:00.000000"][col] == 3.0
    assert by_uuid["2-2022-01-01 00:00:00.000000"][col] == 4.0


def test_error_if_missing_entity_id_column(spark):
    """Ref ``main_test.py:187-202``: the spec's frame lacks the pred
    frame's entity column -> SpecError naming the missing column."""
    pred_frame = str_to_df(spark, "no_entity_id,pred_timestamp\n1,2013-01-01")
    value_frame = str_to_df(spark, "entity_id,value,timestamp\n1,1,2021-01-01")
    spec = PredictorSpec(
        value_frame=ValueFrame(df=value_frame),
        lookbehind_distances=[dt.timedelta(days=1)],
        aggregators=[MeanAggregator()],
        fallback=NAN,
    )
    with pytest.raises(SpecError, match="missing"):
        Flattener(
            predictiontime_frame=PredictionTimeFrame(
                df=pred_frame, entity_id_col_name="no_entity_id"
            )
        ).aggregate_timeseries(specs=[spec])


def test_error_if_missing_column_in_valueframe(spark):
    """Ref ``main_test.py:204-206``: ValueFrame without the entity id
    column fails at CONSTRUCTION (matching SpecColumnError timing)."""
    df = str_to_df(spark, "value,timestamp\n1,2021-01-01")
    with pytest.raises(ValueError, match="missing required columns"):
        ValueFrame(df=df)


def test_non_default_entity_id_col_name(spark):
    """Ref ``main_test.py:290-319``: custom entity column threads through
    join keys, uuid rendering, and interval lookahead masking."""
    pred_frame = str_to_df(spark, "dw_ek_borger,pred_timestamp\n1,2022-01-01 00:00:00")
    outcome_frame = str_to_df(
        spark,
        """dw_ek_borger,timestamp,value
        1,2022-01-02 00:00:01,2
        1,2022-01-15 00:00:00,1""",
    )
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(
            df=pred_frame, entity_id_col_name="dw_ek_borger"
        )
    ).aggregate_timeseries(
        specs=[
            OutcomeSpec(
                value_frame=ValueFrame(df=outcome_frame, entity_id_col_name="dw_ek_borger"),
                lookahead_distances=[(dt.timedelta(days=5), dt.timedelta(days=30))],
                aggregators=[MeanAggregator()],
                fallback=NAN,
            )
        ]
    )
    rows = rows_as_dicts(result.df)
    assert len(rows) == 1
    assert rows[0]["prediction_time_uuid"] == "1-2022-01-01 00:00:00.000000"
    # only the +14d value (1) is inside [5, 30]; the +1d value is not
    assert rows[0]["outc_value_within_5_to_30_days_mean_fallback_nan"] == 1.0


def test_same_timestamp_col_name_on_both_frames(spark):
    """Ref ``processors/temporal_test.py:121-144``: pred frame's timestamp
    column is also named ``timestamp`` — name collision with the value
    frame must not corrupt the timedelta computation."""
    pred_frame = str_to_df(spark, "entity_id,timestamp\n1,2021-01-03")
    value_frame = str_to_df(
        spark,
        """entity_id,value,timestamp
        1,1,2021-01-01
        1,2,2021-01-02
        1,3,2021-01-03""",
    )
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_frame, timestamp_col_name="timestamp")
    ).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame),
                lookbehind_distances=[dt.timedelta(days=2)],
                aggregators=[MeanAggregator()],
                fallback=NAN,
            )
        ]
    )
    rows = rows_as_dicts(result.df)
    # td = -2d, -1d, 0d -> all within [-2d, 0] -> mean(1,2,3) = 2
    assert rows[0]["pred_value_within_0_to_2_days_mean_fallback_nan"] == 2.0


@pytest.mark.parametrize("step_days", [None, 30])
def test_interval_lookperiod_with_step_size(spark, step_days):
    """Interval lookperiods x step_size chunking (ref combines them in
    ``main_test.py:209-234`` + ``:321-364``): chunked evaluation must not
    change interval-window membership at chunk edges."""
    pred_frame = str_to_df(
        spark,
        """entity_id,pred_timestamp
        1,2022-01-01
        1,2022-03-15
        2,2022-02-01""",
    )
    value_frame = str_to_df(
        spark,
        """entity_id,value,timestamp
        1,2,2021-12-30
        1,1,2021-12-15
        1,8,2022-03-01
        2,4,2022-01-20""",
    )
    step = dt.timedelta(days=step_days) if step_days else None
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_frame)
    ).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame),
                lookbehind_distances=[(dt.timedelta(days=5), dt.timedelta(days=30))],
                aggregators=[MeanAggregator()],
                fallback=NAN,
            )
        ],
        step_size=step,
    )
    rows = {r["prediction_time_uuid"]: r for r in rows_as_dicts(result.df)}
    col = "pred_value_within_5_to_30_days_mean_fallback_nan"
    assert rows["1-2022-01-01 00:00:00.000000"][col] == 1.0  # only -17d value
    assert rows["1-2022-03-15 00:00:00.000000"][col] == 8.0  # -14d value
    assert rows["2-2022-02-01 00:00:00.000000"][col] == 4.0  # -12d value


def test_lookbehind_days_handles_floats(spark):
    """Ref ``test_feature_spec_objects.py:58-79``: fractional lookbehind
    days must window correctly (12h window here) and render with the
    reference's flooring ``.days`` naming."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2022-01-02 00:00:00")
    value_frame = str_to_df(
        spark,
        """entity_id,timestamp,value
        1,2022-01-01 18:00:00,5
        1,2022-01-01 06:00:00,100""",
    )
    from timeseriesflattener_spark import PredictorSpec as PS

    spec = PS.from_primitives(
        df=value_frame,
        entity_id_col_name="entity_id",
        lookbehind_days=[0.5],
        aggregators=["max"],
        fallback=0,
    )
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_frame)
    ).aggregate_timeseries(specs=[spec])
    row = rows_as_dicts(result.df)[0]
    # naming floors the NEGATIVE normalised first (-0.5d).days -> -1,
    # abs -> "0_to_1_days" — same as the reference's timedelta.days
    assert row["pred_value_within_0_to_1_days_max_fallback_0"] == 5.0  # -6h in, -18h out


def test_invalid_lookbehind_raises(spark):
    """Ref ``test_feature_spec_objects.py:93-103``: a non-positive
    lookdistance produces an invalid LookPeriod -> ValueError."""
    value_frame = str_to_df(spark, "entity_id,timestamp,value\n1,2021-01-01,1")
    with pytest.raises(ValueError, match="first value"):
        PredictorSpec(
            value_frame=ValueFrame(df=value_frame),
            lookbehind_distances=[dt.timedelta(days=-1)],
            aggregators=[MeanAggregator()],
            fallback=0,
        )
