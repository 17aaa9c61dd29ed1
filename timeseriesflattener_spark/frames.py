"""Typed frame wrappers over ``pyspark.sql.DataFrame``.

Mirrors the reference's frame surface (dynamic column names validated
at runtime), re-expressed over lazy Spark DataFrames:

- ``PredictionTimeFrame``  <- reference ``specs/prediction_times.py:16-46``
- ``ValueFrame``           <- reference ``specs/value.py:14-36``
- ``StaticFrame``          <- reference ``specs/static.py:12-26``
- ``TimestampValueFrame``  <- reference ``specs/timestamp.py:12-32``

Differences from the reference (deliberate, Spark-first):

- Frames stay *lazy*; nothing is computed at construction. The
  reference sorts prediction times eagerly for positional concat —
  Spark assembly joins on the uuid key instead, so no sort is needed
  until the sink.
- ``prediction_time_uuid`` is materialised as
  ``concat(entity_id, '-', date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS'))``
  which renders identically to polars' default datetime str cast
  (expected literal ``1-2021-01-03 00:00:00.000000`` in reference
  ``main_test.py:98-99``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: polars renders datetimes with microsecond precision on str-cast.
UUID_TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _require_columns(df: DataFrame, cols: Sequence[str], frame_name: str) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"{frame_name}: missing required columns {missing}; has {df.columns}")


def uuid_expr(entity_id_col: str, timestamp_col: str) -> Column:
    """Render the reference's prediction_time_uuid string."""
    return F.concat(
        F.col(entity_id_col).cast("string"),
        F.lit("-"),
        F.date_format(F.col(timestamp_col), UUID_TS_FORMAT),
    )


@dataclass
class PredictionTimeFrame:
    """The probe side: when predictions are issued (one row per prediction).

    Reference: ``specs/prediction_times.py:16-46``.
    """

    df: DataFrame
    entity_id_col_name: str = "entity_id"
    timestamp_col_name: str = "pred_timestamp"
    prediction_time_uuid_col_name: str = "prediction_time_uuid"

    def __post_init__(self) -> None:
        _require_columns(
            self.df, [self.entity_id_col_name, self.timestamp_col_name], type(self).__name__
        )
        if self.prediction_time_uuid_col_name not in self.df.columns:
            self.df = self.df.withColumn(
                self.prediction_time_uuid_col_name,
                uuid_expr(self.entity_id_col_name, self.timestamp_col_name),
            )

    def required_columns(self) -> Sequence[str]:
        return [self.entity_id_col_name]

    def collect(self) -> DataFrame:
        return self.df


@dataclass
class ValueFrame:
    """An irregular multi-entity time series; every column that is not
    the id or the timestamp is a value column.

    Reference: ``specs/value.py:14-36`` (value-column inference at 32-36).

    ``order_col_name``: optional stable tiebreaker (e.g. ``turn_idx`` on
    transcript tables) used by earliest/latest on timestamp ties. The
    reference resolves ties by in-memory frame order
    (``aggregators.py:126-156``), which has no distributed equivalent;
    when absent we break ties by value (deterministic, documented).
    """

    df: DataFrame
    entity_id_col_name: str = "entity_id"
    value_timestamp_col_name: str = "timestamp"
    order_col_name: str | None = None
    #: explicit value-column subset. Default (None) infers every non-id/
    #: non-timestamp column, like the reference. Passing a subset lets
    #: several specs share ONE wide df object without a value-column
    #: conflict — the Flattener then fuses them into a single join +
    #: aggregation over that df (and Catalyst prunes the unused columns).
    value_cols: Sequence[str] | None = None
    value_col_names: list[str] = field(init=False)

    def __post_init__(self) -> None:
        _require_columns(
            self.df, [self.entity_id_col_name, self.value_timestamp_col_name], type(self).__name__
        )
        if self.value_cols is not None:
            _require_columns(self.df, list(self.value_cols), type(self).__name__)
            self.value_col_names = list(self.value_cols)
        else:
            reserved = {
                self.entity_id_col_name,
                self.value_timestamp_col_name,
                self.order_col_name,
            }
            self.value_col_names = [c for c in self.df.columns if c not in reserved]

    def collect(self) -> DataFrame:
        return self.df


@dataclass
class StaticFrame:
    """Per-entity constants (no timestamp). Reference ``specs/static.py:12-26``."""

    df: DataFrame
    entity_id_col_name: str = "entity_id"
    value_col_names: list[str] = field(init=False)

    def __post_init__(self) -> None:
        _require_columns(self.df, [self.entity_id_col_name], type(self).__name__)
        self.value_col_names = [c for c in self.df.columns if c != self.entity_id_col_name]

    def collect(self) -> DataFrame:
        return self.df


@dataclass
class TimestampValueFrame:
    """One timestamped event column per entity (e.g. birthdate).

    Reference: ``specs/timestamp.py:12-32``.
    """

    df: DataFrame
    entity_id_col_name: str = "entity_id"
    value_timestamp_col_name: str = "timestamp"

    def __post_init__(self) -> None:
        _require_columns(
            self.df, [self.entity_id_col_name, self.value_timestamp_col_name], type(self).__name__
        )

    def collect(self) -> DataFrame:
        return self.df
