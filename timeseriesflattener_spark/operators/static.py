"""Static feature join. Reference ``processors/static.py:12-30``.

Spark-first: the static side is per-entity metadata and is always tiny
relative to prediction times — broadcast it so the join is shuffle-free
on the pred side. Note the reference renames with the fallback suffix
but does NOT fill nulls for static features; we match that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..frames import PredictionTimeFrame
from ..specs import StaticSpec, fallback_str


def static_feature_name(spec: StaticSpec, value_col: str) -> str:
    return f"{spec.column_prefix}_{value_col}_fallback_{fallback_str(spec.fallback)}"


def process_static_spec(
    spec: StaticSpec, predictiontime_frame: PredictionTimeFrame, broadcast: bool = True
) -> DataFrame:
    pred = predictiontime_frame
    static_df = spec.value_frame.df
    if broadcast:
        static_df = F.broadcast(static_df)
    renamed = [
        F.col(c).alias(static_feature_name(spec, c)) for c in spec.value_frame.value_col_names
    ]
    return (
        pred.df.select(pred.prediction_time_uuid_col_name, pred.entity_id_col_name)
        .join(
            static_df.withColumnRenamed(spec.value_frame.entity_id_col_name, "__static_entity"),
            on=F.col(pred.entity_id_col_name) == F.col("__static_entity"),
            how="left",
        )
        .select(F.col(pred.prediction_time_uuid_col_name), *renamed)
    )
