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


# ---------------------------------------------------------------- v1 boundary
# Ports of ``v1/tests/.../test_flattened_dataset/test_add_values.py`` run
# with boundary="v1" (the legacy engine's exclusive-near-endpoint filter,
# ``v1/flattened_dataset.py:266-273``). Golden values are the reference
# suite's expected_values verbatim.


def _v1_predictor(spark, pred_csv, value_csv, lookbehind, agg="max", fallback=NAN):
    pred_frame = str_to_df(spark, pred_csv)
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_frame)
    ).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=str_to_df(spark, value_csv)),
                lookbehind_distances=[lookbehind],
                aggregators=strings_to_aggregators([agg]),
                fallback=fallback,
                boundary="v1",
            )
        ]
    )
    col = [c for c in result.df.columns if c.startswith("pred_value_within")][0]
    return [r[col] for r in rows_as_dicts(result.df.orderBy("prediction_time_uuid"))]


def _v1_outcome(spark, pred_csv, value_csv, lookahead, agg="max", fallback=NAN):
    pred_frame = str_to_df(spark, pred_csv)
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_frame)
    ).aggregate_timeseries(
        specs=[
            OutcomeSpec(
                value_frame=ValueFrame(df=str_to_df(spark, value_csv)),
                lookahead_distances=[lookahead],
                aggregators=strings_to_aggregators([agg]),
                fallback=fallback,
                boundary="v1",
            )
        ]
    )
    col = [c for c in result.df.columns if c.startswith("outc_value_within")][0]
    return [r[col] for r in rows_as_dicts(result.df.orderBy("prediction_time_uuid"))]


def test_v1_predictor_after_prediction_time(spark):
    """Ref test_add_values.py:18-39: future value not in lookbehind -> NaN."""
    out = _v1_predictor(
        spark,
        "entity_id,pred_timestamp\n1,2021-12-31 00:00:00",
        "entity_id,timestamp,value\n1,2022-01-01 00:00:01,1.0",
        dt.timedelta(days=2),
    )
    assert math.isnan(out[0])


def test_v1_predictor_before_prediction(spark):
    """Ref :42-60: value ~1h before prediction, lookbehind 2d -> 1."""
    out = _v1_predictor(
        spark,
        "entity_id,pred_timestamp\n1,2021-12-31 00:00:00",
        "entity_id,timestamp,value\n1,2021-12-30 22:59:59,1",
        dt.timedelta(days=2),
    )
    assert out == [1.0]


def test_v1_multiple_citizens_predictor(spark):
    """Ref :63-89: expected [0, 1, 0, 2, NaN]."""
    out = _v1_predictor(
        spark,
        """entity_id,pred_timestamp
        1,2021-12-31 00:00:00
        1,2022-01-02 00:00:00
        5,2022-01-02 00:00:00
        5,2022-01-05 00:00:00
        6,2022-01-05 00:00:00""",
        """entity_id,timestamp,value
        1,2021-12-30 00:00:01,0
        1,2022-01-01 00:00:00,1
        5,2022-01-01 00:00:00,0
        5,2022-01-04 00:00:01,2
        7,2022-01-05 00:00:00,5""",
        dt.timedelta(days=2),
    )
    assert out[0] == 0.0 and out[1] == 1.0 and out[2] == 0.0 and out[3] == 2.0
    assert math.isnan(out[4])


def test_v1_predictor_interval_lookperiod(spark):
    """Ref :92-111: lookbehind (5,30) -> value 1.99d back excluded, 17d back kept."""
    out = _v1_predictor(
        spark,
        "entity_id,pred_timestamp\n1,2022-01-01 00:00:00",
        """entity_id,timestamp,value
        1,2021-12-30 00:00:01,2
        1,2021-12-15 00:00:00,1""",
        (dt.timedelta(days=5), dt.timedelta(days=30)),
    )
    assert out == [1.0]


def test_v1_event_after_prediction_time(spark):
    """Ref :115-135: outcome 1d1s ahead, lookahead 2d -> 1."""
    out = _v1_outcome(
        spark,
        "entity_id,pred_timestamp\n1,2021-12-31 00:00:00",
        "entity_id,timestamp,value\n1,2022-01-01 00:00:01,1",
        dt.timedelta(days=2),
    )
    assert out == [1.0]


def test_v1_event_before_prediction(spark):
    """Ref :138-157: outcome 1s BEFORE prediction -> NaN."""
    out = _v1_outcome(
        spark,
        "entity_id,pred_timestamp\n1,2021-12-31 00:00:00",
        "entity_id,timestamp,value\n1,2021-12-30 23:59:59,1.0",
        dt.timedelta(days=2),
    )
    assert math.isnan(out[0])


def test_v1_multiple_citizens_outcome(spark):
    """Ref :160-184: expected [1, NaN, 1, NaN]."""
    out = _v1_outcome(
        spark,
        """entity_id,pred_timestamp
        1,2021-12-31 00:00:00
        1,2022-01-02 00:00:00
        5,2025-01-02 00:00:00
        5,2025-08-05 00:00:00""",
        """entity_id,timestamp,value
        1,2021-12-31 00:00:01,1.0
        1,2023-01-02 00:00:00,1.0
        5,2025-01-03 00:00:00,1.0
        5,2022-01-05 00:00:01,1.0""",
        dt.timedelta(days=2),
    )
    assert out[0] == 1.0 and math.isnan(out[1]) and out[2] == 1.0 and math.isnan(out[3])


def test_v1_outcome_interval_lookperiod_outside(spark):
    """Ref :187-206: lookahead (2,10), value at exactly +1d -> fallback 0."""
    out = _v1_outcome(
        spark,
        "entity_id,pred_timestamp\n1,2022-01-01 00:00:00",
        "entity_id,timestamp,value\n1,2022-01-02 00:00:00,1",
        (dt.timedelta(days=2), dt.timedelta(days=10)),
        fallback=0,
    )
    assert out[0] == 0


def test_v1_outcome_interval_lookperiod_inside(spark):
    """Ref :209-228: lookahead (1,10), value at +2d -> 1."""
    out = _v1_outcome(
        spark,
        "entity_id,pred_timestamp\n1,2022-01-01 00:00:00",
        "entity_id,timestamp,value\n1,2022-01-03 00:00:00,1",
        (dt.timedelta(days=1), dt.timedelta(days=10)),
        fallback=0,
    )
    assert out[0] == 1


def test_v1_citizen_without_outcome(spark):
    """Ref :231-249: outcome belongs to another entity -> NaN."""
    out = _v1_outcome(
        spark,
        "entity_id,pred_timestamp\n1,2021-12-31 00:00:00",
        "entity_id,timestamp,value\n0,2021-12-31 00:00:01,1.0",
        dt.timedelta(days=2),
    )
    assert math.isnan(out[0])


def test_v1_boundary_discriminating_cases(spark):
    """The endpoints where v1 and v2 genuinely disagree
    (v1/flattened_dataset.py:266-273 vs processors/temporal.py:75-77):
    - value exactly AT the prediction instant: v1 behind EXcludes (td<0
      fails), v1 ahead EXcludes (td>0 fails); v2 includes both.
    - value exactly at the far endpoint: included under BOTH.
    - interval lookbehind (5,30): value exactly 5d back is EXcluded
      under v1 (td < -5d fails), included under v2."""
    # behind, simple window
    behind = _v1_predictor(
        spark,
        "entity_id,pred_timestamp\n1,2021-12-31 00:00:00",
        """entity_id,timestamp,value
        1,2021-12-31 00:00:00,100
        1,2021-12-29 00:00:00,7""",
        dt.timedelta(days=2),
        agg="max",
    )
    assert behind == [7.0]  # at-instant 100 excluded; far endpoint -2d kept
    # ahead, simple window
    ahead = _v1_outcome(
        spark,
        "entity_id,pred_timestamp\n1,2021-12-31 00:00:00",
        """entity_id,timestamp,value
        1,2021-12-31 00:00:00,100
        1,2022-01-02 00:00:00,7""",
        dt.timedelta(days=2),
        agg="max",
    )
    assert ahead == [7.0]  # at-instant 100 excluded; far endpoint +2d kept
    # interval behind: near endpoint exclusive
    interval = _v1_predictor(
        spark,
        "entity_id,pred_timestamp\n1,2022-01-31 00:00:00",
        """entity_id,timestamp,value
        1,2022-01-26 00:00:00,100
        1,2022-01-01 00:00:00,7""",
        (dt.timedelta(days=5), dt.timedelta(days=30)),
        agg="max",
    )
    assert interval == [7.0]  # exactly-5d-back 100 excluded, exactly-30d kept


def test_v1_outcome_timestamps_as_values(spark):
    """Ref ``test_add_values.py:594-652`` (test_add_outcome_timestamps):
    the outcome VALUE column is itself a timestamp; ``latest`` must
    select the max-ts event's timestamp value, fallback NaN -> null."""
    pred_frame = str_to_df(
        spark,
        """entity_id,pred_timestamp
        1,2021-11-05 00:00:00
        1,2021-11-01 00:00:00
        1,2023-11-05 00:00:00""",
    )
    value_frame = str_to_df(
        spark,
        """entity_id,timestamp,ts_value
        1,2021-11-06 00:00:01,2021-11-06 00:00:01
        1,2021-11-13 00:00:01,2021-11-13 00:00:01""",
    )
    result = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_frame)
    ).aggregate_timeseries(
        specs=[
            OutcomeSpec(
                value_frame=ValueFrame(df=value_frame),
                lookahead_distances=[dt.timedelta(days=10)],
                aggregators=strings_to_aggregators(["latest"]),
                fallback=None,
                boundary="v1",
            )
        ]
    )
    col = "outc_ts_value_within_0_to_10_days_latest_fallback_None"
    rows = {r["pred_timestamp"].isoformat(): r[col] for r in rows_as_dicts(result.df)}
    # ts_value stays a string column (like the reference's str-cast
    # output); ISO ordering == chronological ordering for max_by
    # from 2021-11-01: only 11-06 (+5d) is within 10d -> latest = 11-06
    assert rows["2021-11-01T00:00:00"] == "2021-11-06 00:00:01"
    # from 2021-11-05: both within (+1d, +8d) -> latest = 11-13
    assert rows["2021-11-05T00:00:00"] == "2021-11-13 00:00:01"
    # from 2023-11-05: nothing ahead -> null (NaN in the reference)
    assert rows["2023-11-05T00:00:00"] is None
