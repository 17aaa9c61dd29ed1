"""timeseriesflattener_spark — a PySpark-native time-series flattening,
rollup, downsample & retention engine.

Reproduces the query semantics of
``Aarhus-Psychiatry-Research/timeseriesflattener`` v2.5.2 (lookbehind /
lookahead windowed aggregation with fallback imputation over irregular
multi-entity time series) as lazy Catalyst plans, and extends them with
continuous aggregates at 1m/1h/1d retention tiers, gap-fill
(LOCF + linear interpolation), Gorilla chunk compression and
checkpoint-resumable incremental aggregation over conversation
transcript tables.
"""

from .aggregators import (
    Aggregator,
    CountAggregator,
    EarliestAggregator,
    HasValuesAggregator,
    LatestAggregator,
    MaxAggregator,
    MeanAggregator,
    MinAggregator,
    SlopeAggregator,
    SumAggregator,
    UniqueCountAggregator,
    UniqueCountNullsAggregator,
    VarianceAggregator,
    register_aggregator,
    string_to_aggregator,
    strings_to_aggregators,
    validate_compatible_fallback_type_for_aggregator,
)
from .flattener import AggregatedFrame, Flattener, SpecError
from .frames import PredictionTimeFrame, StaticFrame, TimestampValueFrame, ValueFrame
from .legacy import NamedDataframe, PredictorGroupSpec
from .session import get_spark
from .specs import (
    BooleanOutcomeSpec,
    Boundary,
    LookPeriod,
    OutcomeSpec,
    PredictorSpec,
    StaticSpec,
    TimeDeltaSpec,
    lookdistance_to_normalised_lookperiod,
)

__version__ = "0.1.0"

__all__ = [
    "Aggregator",
    "AggregatedFrame",
    "BooleanOutcomeSpec",
    "Boundary",
    "CountAggregator",
    "EarliestAggregator",
    "Flattener",
    "HasValuesAggregator",
    "LatestAggregator",
    "LookPeriod",
    "MaxAggregator",
    "MeanAggregator",
    "MinAggregator",
    "NamedDataframe",
    "OutcomeSpec",
    "PredictionTimeFrame",
    "PredictorGroupSpec",
    "PredictorSpec",
    "SlopeAggregator",
    "SpecError",
    "StaticFrame",
    "StaticSpec",
    "SumAggregator",
    "TimeDeltaSpec",
    "TimestampValueFrame",
    "UniqueCountAggregator",
    "UniqueCountNullsAggregator",
    "ValueFrame",
    "VarianceAggregator",
    "get_spark",
    "lookdistance_to_normalised_lookperiod",
    "register_aggregator",
    "string_to_aggregator",
    "strings_to_aggregators",
    "validate_compatible_fallback_type_for_aggregator",
]
