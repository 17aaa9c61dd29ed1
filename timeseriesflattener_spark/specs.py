"""Feature specifications — the reference's query surface.

Parity targets:
- ``LookPeriod`` / lookdistance normalisation  <- ``specs/value.py:39-64``
- ``PredictorSpec``                            <- ``specs/temporal.py:25-81``
- ``OutcomeSpec`` / ``BooleanOutcomeSpec``     <- ``specs/outcome.py:27-138``
- ``StaticSpec``                               <- ``specs/static.py:29-54``
- ``TimeDeltaSpec``                            <- ``specs/timedelta.py:16-75``

A spec is pure query metadata: it never triggers Spark computation.
The only eager check the reference performs at spec construction that
requires data (TimeDeltaSpec's <=1-row-per-entity check,
``specs/timedelta.py:36-42``) is deferred to flatten time here and
executed as a distributed assertion.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field
from typing import Literal, Sequence, Union

from pyspark.sql import functions as F

from .aggregators import (
    Aggregator,
    strings_to_aggregators,
    validate_compatible_fallback_type_for_aggregator,
)
from .frames import PredictionTimeFrame, StaticFrame, TimestampValueFrame, ValueFrame

Lookdistance = Union[dt.timedelta, "tuple[dt.timedelta, dt.timedelta]"]
Fallback = Union[int, float, str, bool, None]

#: Window-endpoint semantics. ``"v2"`` = both ends inclusive
#: (reference ``processors/temporal.py:75-77``). ``"v1"`` = the endpoint
#: nearest the prediction instant is EXCLUSIVE, matching the legacy
#: engine's filter (``v1/flattened_dataset.py:266-273``):
#: behind -> ``td >= -max AND td < -min``; ahead -> ``td > min AND td <= max``.
#: In particular a value AT the prediction instant is excluded under v1.
Boundary = Literal["v2", "v1"]

MICROS_PER_DAY = 86_400_000_000


def timedelta_to_micros(td: dt.timedelta) -> int:
    """Exact integer microseconds (no float round-trip)."""
    return td // dt.timedelta(microseconds=1)


def require_positive_micros(name: str, td: dt.timedelta) -> int:
    """Exact integer microseconds, raising if not strictly positive —
    the shared guard for every bucket/window/halflife parameter."""
    us = timedelta_to_micros(td)
    if us <= 0:
        raise ValueError(f"{name} must be a positive timedelta, got {td!r}")
    return us


def fallback_str(fallback: Fallback) -> str:
    """Render the fallback for column naming exactly as the reference's
    f-string does (``processors/temporal.py:122-131``): ``nan``,
    ``False``, ``0``, ``0.5`` ..."""
    return f"{fallback}"


@dataclass(frozen=True)
class LookPeriod:
    """Closed interval of time-from-prediction-to-value.

    Reference ``specs/value.py:39-49``: ``first < last`` required;
    lookbehind normalises to ``[-d, 0]``, lookahead to ``[0, +d]``.
    """

    first: dt.timedelta
    last: dt.timedelta

    def __post_init__(self) -> None:
        if self.first >= self.last:
            raise ValueError(
                f"Invalid LookPeriod. The first value ({self.first}) must be smaller "
                f"than the large value ({self.last})."
            )

    @property
    def first_micros(self) -> int:
        return timedelta_to_micros(self.first)

    @property
    def last_micros(self) -> int:
        return timedelta_to_micros(self.last)

    def period_string(self) -> str:
        """Reference ``processors/temporal.py:85-97``: lookbehind renders
        ``{|last|}_to_{|first|}_days``, lookahead ``{first}_to_{last}_days``,
        using the (flooring) ``timedelta.days`` attribute."""
        if self.first < dt.timedelta(0):
            return f"{abs(self.last.days)}_to_{abs(self.first.days)}_days"
        return f"{self.first.days}_to_{self.last.days}_days"


def lookdistance_to_normalised_lookperiod(
    lookdistance: Lookdistance, direction: Literal["ahead", "behind"]
) -> LookPeriod:
    """Reference ``specs/value.py:52-64``."""
    is_ahead = direction == "ahead"
    if isinstance(lookdistance, dt.timedelta):
        return LookPeriod(
            first=dt.timedelta(days=0) if is_ahead else -lookdistance,
            last=lookdistance if is_ahead else dt.timedelta(0),
        )
    return LookPeriod(
        first=lookdistance[0] if is_ahead else -lookdistance[1],
        last=lookdistance[1] if is_ahead else -lookdistance[0],
    )


def _lookdistance_to_timedelta_days(
    d: float | tuple[float, float],
) -> dt.timedelta | tuple[dt.timedelta, dt.timedelta]:
    if isinstance(d, tuple):
        return (dt.timedelta(days=d[0]), dt.timedelta(days=d[1]))
    return dt.timedelta(days=d)


def _validate_fallbacks(aggregators: Sequence[Aggregator], fallback: Fallback) -> None:
    for aggregator in aggregators:
        validate_compatible_fallback_type_for_aggregator(aggregator, fallback)


@dataclass
class PredictorSpec:
    """Lookbehind windowed aggregation spec. Ref ``specs/temporal.py:25-81``."""

    value_frame: ValueFrame
    lookbehind_distances: Sequence[Lookdistance]
    aggregators: Sequence[Aggregator]
    fallback: Fallback
    column_prefix: str = "pred"
    boundary: Boundary = "v2"
    normalised_lookperiod: list[LookPeriod] = field(init=False)
    direction: str = field(init=False, default="behind")

    def __post_init__(self) -> None:
        self.normalised_lookperiod = [
            lookdistance_to_normalised_lookperiod(d, "behind") for d in self.lookbehind_distances
        ]
        _validate_fallbacks(self.aggregators, self.fallback)

    @staticmethod
    def from_primitives(
        df,
        entity_id_col_name: str,
        lookbehind_days: Sequence[float | tuple[float, float]],
        aggregators: Sequence[str],
        value_timestamp_col_name: str = "timestamp",
        column_prefix: str = "pred",
        fallback: Fallback = 0,
        boundary: Boundary = "v2",
    ) -> "PredictorSpec":
        return PredictorSpec(
            value_frame=ValueFrame(
                df=df,
                entity_id_col_name=entity_id_col_name,
                value_timestamp_col_name=value_timestamp_col_name,
            ),
            lookbehind_distances=[_lookdistance_to_timedelta_days(d) for d in lookbehind_days],
            aggregators=strings_to_aggregators(aggregators),
            fallback=fallback,
            column_prefix=column_prefix,
            boundary=boundary,
        )


@dataclass
class OutcomeSpec:
    """Lookahead windowed aggregation spec. Ref ``specs/outcome.py:27-76``."""

    value_frame: ValueFrame
    lookahead_distances: Sequence[Lookdistance]
    aggregators: Sequence[Aggregator]
    fallback: Fallback
    column_prefix: str = "outc"
    boundary: Boundary = "v2"
    normalised_lookperiod: list[LookPeriod] = field(init=False)
    direction: str = field(init=False, default="ahead")

    def __post_init__(self) -> None:
        self.normalised_lookperiod = [
            lookdistance_to_normalised_lookperiod(d, "ahead") for d in self.lookahead_distances
        ]
        _validate_fallbacks(self.aggregators, self.fallback)

    @staticmethod
    def from_primitives(
        df,
        entity_id_col_name: str,
        lookahead_days: Sequence[float | tuple[float, float]],
        aggregators: Sequence[str],
        value_timestamp_col_name: str = "timestamp",
        column_prefix: str = "outc",
        fallback: Fallback = 0,
        boundary: Boundary = "v2",
    ) -> "OutcomeSpec":
        return OutcomeSpec(
            value_frame=ValueFrame(
                df=df,
                entity_id_col_name=entity_id_col_name,
                value_timestamp_col_name=value_timestamp_col_name,
            ),
            lookahead_distances=[_lookdistance_to_timedelta_days(d) for d in lookahead_days],
            aggregators=strings_to_aggregators(aggregators),
            fallback=fallback,
            column_prefix=column_prefix,
            boundary=boundary,
        )


@dataclass
class BooleanOutcomeSpec:
    """Event-only outcome: injects a ``lit(1)`` value column and a fixed
    fallback of 0. Ref ``specs/outcome.py:79-138`` (lit(1) at 107)."""

    init_frame: TimestampValueFrame
    lookahead_distances: Sequence[Lookdistance]
    aggregators: Sequence[Aggregator]
    output_name: str
    column_prefix: str = "outc"
    boundary: Boundary = "v2"
    normalised_lookperiod: list[LookPeriod] = field(init=False)
    value_frame: ValueFrame = field(init=False)
    fallback: Fallback = field(init=False)
    direction: str = field(init=False, default="ahead")

    def __post_init__(self) -> None:
        self.normalised_lookperiod = [
            lookdistance_to_normalised_lookperiod(d, "ahead") for d in self.lookahead_distances
        ]
        self.fallback = 0
        _validate_fallbacks(self.aggregators, self.fallback)
        self.value_frame = ValueFrame(
            df=self.init_frame.df.withColumn(self.output_name, F.lit(1)),
            entity_id_col_name=self.init_frame.entity_id_col_name,
            value_timestamp_col_name=self.init_frame.value_timestamp_col_name,
        )

    @staticmethod
    def from_primitives(
        df,
        entity_id_col_name: str,
        lookahead_days: Sequence[float | tuple[float, float]],
        aggregators: Sequence[str],
        value_timestamp_col_name: str = "timestamp",
        column_prefix: str = "outc",
        boundary: Boundary = "v2",
    ) -> "BooleanOutcomeSpec":
        return BooleanOutcomeSpec(
            init_frame=TimestampValueFrame(
                df=df,
                entity_id_col_name=entity_id_col_name,
                value_timestamp_col_name=value_timestamp_col_name,
            ),
            lookahead_distances=[_lookdistance_to_timedelta_days(d) for d in lookahead_days],
            aggregators=strings_to_aggregators(aggregators),
            output_name=column_prefix,
            column_prefix=column_prefix,
            boundary=boundary,
        )


@dataclass(frozen=True)
class StaticSpec:
    """Per-entity constant feature. Ref ``specs/static.py:29-54``."""

    value_frame: StaticFrame
    column_prefix: str
    fallback: Fallback

    @staticmethod
    def from_primitives(
        df, entity_id_col_name: str, column_prefix: str, fallback: Fallback
    ) -> "StaticSpec":
        return StaticSpec(
            value_frame=StaticFrame(df=df, entity_id_col_name=entity_id_col_name),
            column_prefix=column_prefix,
            fallback=fallback,
        )


TIME_FORMAT_DIVISORS: dict[str, float] = {
    # reference ``processors/timedelta.py:14-21`` (_days_to_format_division)
    "seconds": 1 / (60 * 24 * 60),
    "minutes": 1 / (60 * 24),
    "hours": 1 / 24,
    "days": 1.0,
    "years": 365.25,
}


@dataclass
class TimeDeltaSpec:
    """Time between prediction and a single per-entity event (e.g. age).

    Ref ``specs/timedelta.py:16-75``; uniqueness (<=1 row/entity) is
    checked at flatten time as a distributed assertion.
    """

    init_frame: TimestampValueFrame
    fallback: Fallback
    output_name: str
    column_prefix: str = "pred"
    time_format: Literal["seconds", "minutes", "hours", "days", "years"] = "days"

    def __post_init__(self) -> None:
        if self.time_format not in TIME_FORMAT_DIVISORS:
            raise ValueError(f"Unknown time_format {self.time_format}")

    @property
    def value_col_names(self) -> list[str]:
        return [self.output_name]

    @staticmethod
    def from_primitives(
        df,
        entity_id_col_name: str,
        output_name: str,
        value_timestamp_col_name: str = "timestamp",
        column_prefix: str = "pred",
        fallback: Fallback = 0,
        time_format: str = "days",
    ) -> "TimeDeltaSpec":
        return TimeDeltaSpec(
            init_frame=TimestampValueFrame(
                df=df,
                entity_id_col_name=entity_id_col_name,
                value_timestamp_col_name=value_timestamp_col_name,
            ),
            fallback=fallback,
            output_name=output_name,
            column_prefix=column_prefix,
            time_format=time_format,  # type: ignore[arg-type]
        )


TemporalSpec = Union[PredictorSpec, OutcomeSpec, BooleanOutcomeSpec]
ValueSpecification = Union[PredictorSpec, OutcomeSpec, BooleanOutcomeSpec, StaticSpec, TimeDeltaSpec]


def spec_value_col_names(spec: ValueSpecification) -> list[str]:
    if isinstance(spec, TimeDeltaSpec):
        return spec.value_col_names
    return list(spec.value_frame.value_col_names)


__all__ = [
    "Boundary",
    "LookPeriod",
    "lookdistance_to_normalised_lookperiod",
    "PredictorSpec",
    "OutcomeSpec",
    "BooleanOutcomeSpec",
    "StaticSpec",
    "TimeDeltaSpec",
    "TemporalSpec",
    "ValueSpecification",
    "PredictionTimeFrame",
    "fallback_str",
    "timedelta_to_micros",
    "MICROS_PER_DAY",
    "spec_value_col_names",
]
