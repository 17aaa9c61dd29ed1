"""Port of v1 aggregation-fn golden tests (the 'aggregation function
tests' suite named in BASELINE.json;
``v1/tests/test_timeseriesflattener/test_aggregation_fns.py:287-439``)
run through the Spark engine with v2 window semantics, plus boundary
in/exclusion goldens adapted from ``test_add_values.py:18-111``."""

from __future__ import annotations

import datetime as dt
import math

from timeseriesflattener_spark import (
    Flattener,
    OutcomeSpec,
    PredictionTimeFrame,
    PredictorSpec,
    ValueFrame,
    strings_to_aggregators,
)
from timeseriesflattener_spark.testing import rows_as_dicts, str_to_df

NAN = float("nan")


def _slope_lookahead(spark, events_csv, lookahead_days=4, fallback=NAN):
    pred_frame = str_to_df(
        spark, "entity_id,pred_timestamp\n1,2021-12-31 00:00:00\n2,2021-12-31 00:00:00"
    )
    result = Flattener(predictiontime_frame=PredictionTimeFrame(df=pred_frame)).aggregate_timeseries(
        specs=[
            OutcomeSpec(
                value_frame=ValueFrame(df=str_to_df(spark, events_csv)),
                lookahead_distances=[dt.timedelta(days=lookahead_days)],
                aggregators=strings_to_aggregators(["change_per_day"]),
                fallback=fallback,
            )
        ]
    )
    col = f"outc_value_within_0_to_{lookahead_days}_days_slope_fallback_{fallback}"
    return {r["entity_id"]: r[col] for r in rows_as_dicts(result.df)}


def test_change_per_day(spark):
    """Ref ``test_aggregation_fns.py:287-311``: expected [1, NaN]
    (entity 2's second event is outside the lookahead -> 1 point -> fallback)."""
    out = _slope_lookahead(
        spark,
        """entity_id,timestamp,value
        1,2022-01-01 00:00:00,1
        1,2022-01-02 00:00:00,2
        2,2022-01-01 00:00:00,1
        2,2023-01-08 00:00:00,2""",
    )
    assert out[1] == 1.0
    assert math.isnan(out[2])


def test_change_per_day_unordered(spark):
    """Ref ``:313-337``: input order irrelevant -> [1, 1]."""
    out = _slope_lookahead(
        spark,
        """entity_id,timestamp,value
        1,2022-01-02 00:00:00,2
        1,2022-01-01 00:00:00,1
        2,2022-01-02 00:00:00,2
        2,2022-01-01 00:00:00,1""",
    )
    assert out[1] == 1.0 and out[2] == 1.0


def test_change_per_day_negative(spark):
    """Ref ``:339-363``: descending values -> negative slope."""
    out = _slope_lookahead(
        spark,
        """entity_id,timestamp,value
        1,2022-01-02 00:00:00,2
        1,2022-01-01 00:00:00,1
        2,2022-01-02 00:00:00,1
        2,2022-01-01 00:00:00,2""",
    )
    assert out[1] == 1.0 and out[2] == -1.0


def test_change_per_day_single_observation_falls_back(spark):
    """Ref ``:391-414``: one observation -> undefined slope -> fallback."""
    out = _slope_lookahead(
        spark,
        """entity_id,timestamp,value
        1,2022-01-01 00:00:00,1
        2,2022-01-01 00:00:00,1""",
        fallback=99.0,
    )
    assert out[1] == 99.0 and out[2] == 99.0


def test_boundary_inclusion(spark):
    """Adapted from v1 ``test_add_values.py:18-111``: a value 1s inside
    the window start counts; a value 1s after the prediction instant
    does not (v2 closed-window semantics: first <= td <= last)."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2021-12-31 00:00:00")
    value_frame = str_to_df(
        spark,
        """entity_id,timestamp,value
        1,2021-12-30 00:00:01,5
        1,2021-12-31 00:00:01,100""",
    )
    result = Flattener(predictiontime_frame=PredictionTimeFrame(df=pred_frame)).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame),
                lookbehind_distances=[dt.timedelta(days=1)],
                aggregators=strings_to_aggregators(["mean", "count"]),
                fallback=NAN,
            )
        ]
    )
    row = rows_as_dicts(result.df)[0]
    assert row["pred_value_within_0_to_1_days_mean_fallback_nan"] == 5.0
    assert row["pred_value_within_0_to_1_days_count_fallback_nan"] == 1


def test_boundary_exact_endpoints_inclusive(spark):
    """v2 masks on first <= td <= last — BOTH endpoints inclusive
    (``processors/temporal.py:75-77``)."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2021-12-31 00:00:00")
    value_frame = str_to_df(
        spark,
        """entity_id,timestamp,value
        1,2021-12-30 00:00:00,1
        1,2021-12-31 00:00:00,2""",
    )
    result = Flattener(predictiontime_frame=PredictionTimeFrame(df=pred_frame)).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame),
                lookbehind_distances=[dt.timedelta(days=1)],
                aggregators=strings_to_aggregators(["count"]),
                fallback=0,
            )
        ]
    )
    row = rows_as_dicts(result.df)[0]
    assert row["pred_value_within_0_to_1_days_count_fallback_0"] == 2
