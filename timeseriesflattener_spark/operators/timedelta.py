"""Time-since-event feature (e.g. age). Reference ``processors/timedelta.py:23-52``.

Parity traps honoured:

- the delta is truncated to WHOLE days first (polars ``.dt.total_days()``,
  reference ``processors/timedelta.py:40-43``) and only then divided by
  the unit divisor — a 366-day delta in years is 366/365.25 =
  1.002053388090349 (reference ``processors/temporal_test.py:257-261``),
  not the fractional-day value.
- <=1 row per entity is enforced (reference ``specs/timedelta.py:36-42``)
  — here as a distributed check at flatten time.

Spark-first: single-event-per-entity side -> broadcast left join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..functions.timeutils import micros

from ..frames import PredictionTimeFrame
from ..specs import TIME_FORMAT_DIVISORS, TimeDeltaSpec, fallback_str

MICROS_PER_DAY = 86_400_000_000


def timedelta_feature_name(spec: TimeDeltaSpec) -> str:
    return (
        f"{spec.column_prefix}_{spec.output_name}_{spec.time_format}"
        f"_fallback_{fallback_str(spec.fallback)}"
    )


def validate_one_row_per_entity(spec: TimeDeltaSpec) -> None:
    """Reference ``specs/timedelta.py:36-42`` — eager uniqueness check."""
    ent = spec.init_frame.entity_id_col_name
    row = (
        spec.init_frame.df.groupBy(ent)
        .count()
        .agg(F.max("count").alias("max_count"))
        .first()
    )
    max_count = row["max_count"] if row else 0
    if max_count is not None and max_count > 1:
        raise ValueError(
            f"Expected only one value per {ent} in the TimestampValueFrame, "
            f"but found up to {max_count}."
        )


def process_timedelta_spec(
    spec: TimeDeltaSpec,
    predictiontime_frame: PredictionTimeFrame,
    broadcast: bool = True,
    validate: bool = True,
) -> DataFrame:
    if validate:
        validate_one_row_per_entity(spec)

    pred = predictiontime_frame
    event_df = spec.init_frame.df.select(
        F.col(spec.init_frame.entity_id_col_name).alias("__event_entity"),
        F.col(spec.init_frame.value_timestamp_col_name).alias("__event_time"),
    )
    if broadcast:
        event_df = F.broadcast(event_df)

    # truncate-toward-zero to whole days, then unit-convert (parity with
    # polars total_days(); long-cast of a double truncates toward zero).
    whole_days = (
        (
            micros(F.col(pred.timestamp_col_name)) - micros(F.col("__event_time"))
        )
        / F.lit(MICROS_PER_DAY)
    ).cast("long")
    value = whole_days.cast("double") / F.lit(float(TIME_FORMAT_DIVISORS[spec.time_format]))
    if spec.fallback is not None:
        value = F.coalesce(value, F.lit(spec.fallback).cast("double"))

    return (
        pred.df.select(
            pred.prediction_time_uuid_col_name, pred.entity_id_col_name, pred.timestamp_col_name
        )
        .join(event_df, on=F.col(pred.entity_id_col_name) == F.col("__event_entity"), how="left")
        .select(
            F.col(pred.prediction_time_uuid_col_name),
            value.alias(timedelta_feature_name(spec)),
        )
    )
