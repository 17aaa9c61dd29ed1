"""Port of the reference aggregator golden tests
(``aggregators_test.py:74-197``) through the Spark temporal pipeline.

The reference tests aggregate an already-masked frame; here each example
runs through the full flatten plan with a lookbehind window wide enough
to admit every value row — same observable semantics, plus it exercises
the join/mask path.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriesflattener_spark import (
    Flattener,
    PredictionTimeFrame,
    PredictorSpec,
    PredictionTimeFrame as _PTF,
    ValueFrame,
    strings_to_aggregators,
    string_to_aggregator,
    validate_compatible_fallback_type_for_aggregator,
)
from timeseriesflattener_spark.testing import rows_as_dicts, str_to_df

NAN = float("nan")
WIDE = [dt.timedelta(days=10)]


def _flatten_single_entity(spark, values_csv: str, aggregators, fallback):
    """One entity, pred time 2021-01-10, lookbehind 10d covers all values."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2021-01-10")
    value_frame = str_to_df(spark, values_csv)
    result = Flattener(predictiontime_frame=PredictionTimeFrame(df=pred_frame)).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame),
                lookbehind_distances=WIDE,
                aggregators=strings_to_aggregators(aggregators)
                if isinstance(aggregators[0], str)
                else aggregators,
                fallback=fallback,
            )
        ]
    )
    rows = rows_as_dicts(result.df)
    assert len(rows) == 1
    return rows[0]


@pytest.mark.parametrize(
    ("agg", "values", "expected", "fallback"),
    [
        # golden values from reference ``aggregators_test.py:76-106``
        ("min", [1, 2], 1.0, NAN),
        ("max", [1, 2], 2.0, NAN),
        ("mean", [1, 2], 1.5, NAN),
        ("count", [1, 2], 2, NAN),
        ("unique_count", [1, 2, 1], 2, NAN),
        ("sum", [1, 2], 3.0, NAN),
        ("var", [1, 2], 0.5, NAN),
        ("bool", [1, 2], True, False),
    ],
    ids=lambda x: str(x)[:24],
)
def test_single_var_aggregators(spark, agg, values, expected, fallback):
    csv = "entity_id,value,timestamp\n" + "\n".join(
        f"1,{v},2021-01-0{i + 1}" for i, v in enumerate(values)
    )
    row = _flatten_single_entity(spark, csv, [agg], fallback)
    fb_str = "nan" if isinstance(fallback, float) and math.isnan(fallback) else str(fallback)
    name = f"pred_value_within_0_to_10_days_{agg}_fallback_{fb_str}"
    assert row[name] == expected


def test_has_values_empty_window_is_false(spark):
    """Ref ``aggregators_test.py:100-106``: all-null window -> False, not fallback."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2021-01-10")
    value_frame = str_to_df(spark, "entity_id,value,timestamp\n1,1,2020-01-01")  # outside window
    result = Flattener(predictiontime_frame=PredictionTimeFrame(df=pred_frame)).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame),
                lookbehind_distances=WIDE,
                aggregators=strings_to_aggregators(["bool", "count", "unique_count"]),
                fallback=False,
            )
        ]
    )
    row = rows_as_dicts(result.df)[0]
    assert row["pred_value_within_0_to_10_days_bool_fallback_False"] is False
    assert row["pred_value_within_0_to_10_days_count_fallback_False"] == 0
    assert row["pred_value_within_0_to_10_days_unique_count_fallback_False"] == 0


def test_slope(spark):
    """Ref ``aggregators_test.py:108-123``: [1@2013-01-01, 3@2013-01-02] -> 2.0."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2013-01-05")
    value_frame = str_to_df(
        spark, "entity_id,value,timestamp\n1,1,2013-01-01\n1,3,2013-01-02"
    )
    result = Flattener(predictiontime_frame=PredictionTimeFrame(df=pred_frame)).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame),
                lookbehind_distances=WIDE,
                aggregators=strings_to_aggregators(["slope"]),
                fallback=NAN,
            )
        ]
    )
    row = rows_as_dicts(result.df)[0]
    assert row["pred_value_within_0_to_10_days_slope_fallback_nan"] == pytest.approx(2.0)


def test_slope_single_point_falls_back(spark):
    """One point -> undefined slope -> fallback (ref v1
    ``test_aggregation_fns.py`` change_per_day single-observation case)."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2013-01-05")
    value_frame = str_to_df(spark, "entity_id,value,timestamp\n1,1,2013-01-01")
    result = Flattener(predictiontime_frame=PredictionTimeFrame(df=pred_frame)).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame),
                lookbehind_distances=WIDE,
                aggregators=strings_to_aggregators(["slope"]),
                fallback=99.0,
            )
        ]
    )
    row = rows_as_dicts(result.df)[0]
    assert row["pred_value_within_0_to_10_days_slope_fallback_99.0"] == 99.0


def test_earliest_latest(spark):
    """Ref ``aggregators_test.py:125-155``: value at min/max timestamp per group."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2013-01-10\n2,2013-01-10")
    value_frame = str_to_df(
        spark,
        """entity_id,value,timestamp
        1,1,2013-01-01
        1,2,2013-01-02
        2,3,2013-01-04
        2,4,2013-01-03""",
    )
    result = Flattener(predictiontime_frame=PredictionTimeFrame(df=pred_frame)).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame),
                lookbehind_distances=WIDE,
                aggregators=strings_to_aggregators(["earliest", "latest"]),
                fallback=NAN,
            )
        ]
    )
    rows = {r["entity_id"]: r for r in rows_as_dicts(result.df)}
    assert rows[1]["pred_value_within_0_to_10_days_earliest_fallback_nan"] == 1
    assert rows[2]["pred_value_within_0_to_10_days_earliest_fallback_nan"] == 4
    assert rows[1]["pred_value_within_0_to_10_days_latest_fallback_nan"] == 2
    assert rows[2]["pred_value_within_0_to_10_days_latest_fallback_nan"] == 3


def test_earliest_latest_tie_break_by_order_col(spark):
    """Timestamp ties resolved by the stable order column (turn_idx on
    transcripts): earliest -> lowest order, latest -> highest order."""
    pred_frame = str_to_df(spark, "entity_id,pred_timestamp\n1,2013-01-10")
    value_frame = str_to_df(
        spark,
        """entity_id,turn_idx,value,timestamp
        1,0,10,2013-01-01
        1,1,20,2013-01-01
        1,2,30,2013-01-02
        1,3,40,2013-01-02""",
    )
    result = Flattener(predictiontime_frame=PredictionTimeFrame(df=pred_frame)).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=value_frame, order_col_name="turn_idx"),
                lookbehind_distances=WIDE,
                aggregators=strings_to_aggregators(["earliest", "latest"]),
                fallback=NAN,
            )
        ]
    )
    row = rows_as_dicts(result.df)[0]
    assert row["pred_value_within_0_to_10_days_earliest_fallback_nan"] == 10
    assert row["pred_value_within_0_to_10_days_latest_fallback_nan"] == 40


@pytest.mark.parametrize(
    ("agg_name", "fallback", "valid"),
    [
        # ref ``aggregators_test.py:172-197``
        ("mean", 1, True),
        ("mean", NAN, True),
        ("bool", NAN, False),
        ("bool", False, True),
        ("bool", 1, False),
    ],
)
def test_fallback_validation(agg_name, fallback, valid):
    aggregator = string_to_aggregator(agg_name)
    if valid:
        validate_compatible_fallback_type_for_aggregator(aggregator, fallback)
    else:
        with pytest.raises(ValueError):
            validate_compatible_fallback_type_for_aggregator(aggregator, fallback)


def test_unique_count_null_parity_semantics(spark):
    """Substitute for a live-reference differential (polars is not
    installed in this sandbox): hand-computed polars ``n_unique``
    semantics on null-bearing masked windows (reference
    aggregators.py:115-122 over masked frames). ``unique_count`` counts
    distinct non-null values; ``unique_count_with_null`` adds the null
    bucket whenever the window has any out-of-window row or no rows at
    all — the reference's actual (+1) behaviour."""
    import datetime as dt

    from timeseriesflattener_spark import (
        Flattener,
        PredictionTimeFrame,
        PredictorSpec,
        ValueFrame,
        strings_to_aggregators,
    )
    from timeseriesflattener_spark.testing import rows_as_dicts, str_to_df

    pred = str_to_df(
        spark,
        "entity_id,pred_timestamp\n1,2022-01-10\n2,2022-01-10\n3,2022-01-10",
    )
    # entity 1: two in-window values + one out-of-window row
    # entity 2: only an out-of-window row
    # entity 3: no rows at all
    vals = str_to_df(
        spark,
        """entity_id,timestamp,value
        1,2022-01-09 00:00:00,5
        1,2022-01-08 00:00:00,7
        1,2021-06-01 00:00:00,9
        2,2021-06-01 00:00:00,3""",
    )
    out = Flattener(predictiontime_frame=PredictionTimeFrame(df=pred)).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=vals),
                lookbehind_distances=[dt.timedelta(days=5)],
                aggregators=strings_to_aggregators(
                    ["unique_count", "unique_count_with_null"]
                ),
                fallback=0,
            )
        ]
    )
    rows = {r["entity_id"]: r for r in rows_as_dicts(out.df)}
    p = "pred_value_within_0_to_5_days"
    assert rows[1][f"{p}_unique_count_fallback_0"] == 2
    assert rows[1][f"{p}_unique_count_with_null_fallback_0"] == 3  # +null bucket
    assert rows[2][f"{p}_unique_count_fallback_0"] == 0
    assert rows[2][f"{p}_unique_count_with_null_fallback_0"] == 1
    assert rows[3][f"{p}_unique_count_fallback_0"] == 0
    assert rows[3][f"{p}_unique_count_with_null_fallback_0"] == 1
