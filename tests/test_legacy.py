"""v1-compatible facade (legacy TimeseriesFlattener API)."""

from __future__ import annotations

import datetime as dt
import math

from timeseriesflattener_spark.legacy import TimeseriesFlattener, expand_group_spec
from timeseriesflattener_spark import strings_to_aggregators
from timeseriesflattener_spark.specs import PredictorSpec
from timeseriesflattener_spark.testing import rows_as_dicts, str_to_df


def test_legacy_add_spec_and_age(spark):
    pred = str_to_df(spark, "entity_id,timestamp\n1,2021-01-03\n2,2021-01-03")
    values = str_to_df(
        spark,
        """entity_id,value,timestamp
        1,1,2021-01-01
        1,2,2021-01-02
        1,4,2021-01-03""",
    )
    dob = str_to_df(spark, "entity_id,date_of_birth\n1,2000-01-03\n2,1990-01-03")

    def run(boundary):
        flattener = TimeseriesFlattener(prediction_times_df=pred, boundary=boundary)
        flattener.add_spec(
            PredictorSpec.from_primitives(
                df=values,
                entity_id_col_name="entity_id",
                lookbehind_days=[1],
                aggregators=["mean"],
                fallback=float("nan"),
            )
        )
        flattener.add_age_from_date_of_birth(dob)
        return {r["entity_id"]: r for r in rows_as_dicts(flattener.get_df())}

    # default = v1 semantics (v1/flattened_dataset.py:266-273): the value
    # AT the prediction instant (2021-01-03, value 4) is EXCLUDED -> mean 2.0
    # — reported under v1 NAMES (single_specs.py:78-93): min=0 renders as
    # "within_1_days", age as "{prefix}_age_in_years"
    rows = run("v1")
    assert rows[1]["pred_value_within_1_days_mean_fallback_nan"] == 2.0
    assert math.isnan(rows[2]["pred_value_within_1_days_mean_fallback_nan"])
    # age: 2021-01-03 - 2000-01-03 = 7671 days / 365.25
    assert rows[1]["pred_age_in_years"] == 7671 / 365.25
    # opt-in v2 closed windows include the prediction-instant value -> mean 3.0
    assert run("v2")[1]["pred_value_within_1_days_mean_fallback_nan"] == 3.0


def test_legacy_incident_outcome(spark):
    pred = str_to_df(spark, "entity_id,timestamp\n1,2021-01-01\n1,2021-08-01")
    outcomes = str_to_df(spark, "entity_id,timestamp\n1,2021-01-20")
    flattener = TimeseriesFlattener(prediction_times_df=pred)
    flattener.add_incident_outcome(outcomes, lookahead_days=30)
    rows = rows_as_dicts(flattener.get_df())
    # the 2021-08-01 pred time is after the outcome -> dropped
    assert len(rows) == 1
    assert rows[0]["outc_incident"] == 1


def test_expand_group_spec(spark):
    a = str_to_df(spark, "entity_id,value,timestamp\n1,1,2021-01-01")
    b = str_to_df(spark, "entity_id,value,timestamp\n1,2,2021-01-01")
    specs = expand_group_spec(
        {"hba1c": a, "hdl": b},
        lookdistance_days=[30, 365],
        aggregators=["mean", "max"],
        fallbacks=[0],
    )
    assert len(specs) == 2  # one per (df, fallback)
    assert all(len(s.normalised_lookperiod) == 2 for s in specs)
    assert {s.value_frame.value_col_names[0] for s in specs} == {"hba1c", "hdl"}


def test_legacy_v1_column_names(spark):
    """v1 column-name goldens verbatim from the reference suite:
    ``outc_value_within_2_days_maximum_fallback_nan_dichotomous``
    (test_add_values.py:395-406), static ``pred_male``
    (:438-452), interval ``within_{min}_to_{max}_days`` and the
    naming="v2" opt-out."""
    import datetime as dtm

    from timeseriesflattener_spark.specs import OutcomeSpec, StaticSpec
    from timeseriesflattener_spark.frames import StaticFrame, ValueFrame

    pred = str_to_df(spark, "entity_id,timestamp\n1,2021-11-05 00:00:00")
    events = str_to_df(spark, "entity_id,timestamp,value\n1,2021-11-06 00:00:01,1")
    male = str_to_df(spark, "entity_id,male\n1,1")

    def build(naming):
        fl = TimeseriesFlattener(prediction_times_df=pred, naming=naming)
        fl.add_spec(
            OutcomeSpec(
                value_frame=ValueFrame(df=events),
                lookahead_distances=[dtm.timedelta(days=2)],
                aggregators=strings_to_aggregators(["max"]),
                fallback=float("nan"),
            )
        )
        fl.add_static_spec(male)
        return fl.get_df()

    v1_cols = set(build("v1").columns)
    assert "outc_value_within_2_days_maximum_fallback_nan_dichotomous" in v1_cols
    assert "pred_male" in v1_cols
    v2_cols = set(build("v2").columns)
    assert "outc_value_within_0_to_2_days_max_fallback_nan" in v2_cols

    # interval window renders min_to_max
    fl = TimeseriesFlattener(prediction_times_df=pred)
    fl.add_spec(
        OutcomeSpec(
            value_frame=ValueFrame(df=events),
            lookahead_distances=[(dtm.timedelta(days=1), dtm.timedelta(days=10))],
            aggregators=strings_to_aggregators(["max"]),
            fallback=0,
        )
    )
    assert "outc_value_within_1_to_10_days_maximum_fallback_0_dichotomous" in fl.get_df().columns
