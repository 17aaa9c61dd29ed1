"""As-of join: for every left row, the latest right row at or before its
timestamp (pandas ``merge_asof`` semantics) — the point-in-time-correct
"state as of" lookup (latest config/price/profile at each prediction
time) the task's operator list calls out.

Spark-first shape: NOT a join at all. Both sides UNION into one stream
tagged by side, a single window pass per entity carries the last right
value forward, and left rows read the carry — one shuffle (the entity
window), no join fan-out, no skew cliff: a hot entity costs one sorted
partition scan instead of an m:n join explosion. ``tolerance`` bounds
staleness (a carry older than the tolerance nulls out).
"""

from __future__ import annotations

import datetime as dt
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeutils import micros
from ..specs import timedelta_to_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    entity_col: str = "entity_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = ("value",),
    tolerance: dt.timedelta | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + the latest right ``value_cols`` with
    ``right.ts <= left.ts`` per entity (ties: the right row wins, i.e.
    an exact-timestamp match is visible — merge_asof's default).
    Unmatched (or out-of-tolerance) rows carry nulls. Output adds
    ``{col}{suffix}`` per value col and ``{right_ts}{suffix}`` (the
    matched right timestamp)."""
    lcols = left.columns
    l_tagged = left.select(
        F.col(entity_col).alias("__e"),
        micros(F.col(left_ts)).alias("__t"),
        F.lit(1).alias("__side"),  # left sorts AFTER right at equal ts
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        *[F.lit(None).cast("double").alias(f"__v_{c}") for c in value_cols],
        F.lit(None).cast("long").alias("__rt"),
    )
    r_tagged = right.select(
        F.col(entity_col).alias("__e"),
        micros(F.col(right_ts)).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        *[F.col(c).cast("double").alias(f"__v_{c}") for c in value_cols],
        micros(F.col(right_ts)).alias("__rt"),
    )
    w = (
        Window.partitionBy("__e")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "__e",
        "__t",
        "__side",
        "__l",
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__cv_{c}") for c in value_cols],
        F.last("__rt", ignorenulls=True).over(w).alias("__crt"),
    )
    out = carried.filter(F.col("__side") == 1)
    fresh = (
        F.lit(True)
        if tolerance is None
        else (F.col("__t") - F.col("__crt")) <= F.lit(timedelta_to_micros(tolerance))
    )
    cols = [F.col("__l").getField(c).alias(c) for c in lcols]
    cols += [
        F.when(fresh, F.col(f"__cv_{c}")).alias(f"{c}{suffix}") for c in value_cols
    ]
    cols.append(
        F.when(fresh, F.timestamp_micros(F.col("__crt"))).alias(f"{right_ts}{suffix}")
    )
    return out.select(*cols)
