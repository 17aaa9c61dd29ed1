"""Gap-fill over bucket grids: LOCF + linear interpolation.

North-rule component. Input is a finalised tier frame (one row per
(entity, bucket_start)); output is a *dense* grid per entity — every
bucket between the entity's first and last observed bucket — with
missing stats filled by last-observation-carried-forward and/or linear
interpolation between the bracketing observations.

All built-in window functions (SURVEY.md §4.2): the grid comes from
``F.sequence`` + ``explode`` (JVM-side, no Python), LOCF is
``F.last(ignorenulls)`` over an unbounded-preceding window, and linear
interpolation brackets each gap with last/first non-null struct carries.
Edge semantics: leading gaps (before the first observation) stay null
under both methods; trailing gaps LOCF to the last value under ``locf``
and stay null under ``linear`` (no extrapolation).

Scale note: one shuffle for the grid join + one for the window sort,
both keyed by entity — AQE coalesces the tiny grid side. The window is
per-entity over its bucket range; even a year of 1m buckets is ~525k
rows per entity, fine for a single partition, and coarser tiers shrink
it 60-1440x.
"""

from __future__ import annotations

from typing import Literal, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .rollup import tier_micros


def dense_grid(
    points: DataFrame, tier: str, entity_col: str = "conv_id", bucket_col: str = "bucket_start"
) -> DataFrame:
    """Per-entity dense (entity, bucket_start) grid spanning
    [min bucket, max bucket] at the tier's width."""
    width = tier_micros(tier)
    return (
        points.groupBy(entity_col)
        .agg(F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
        .select(
            entity_col,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(width))
            ).alias(bucket_col),
        )
    )


def fill_gaps(
    points: DataFrame,
    value_cols: Sequence[str],
    tier: str,
    method: Literal["locf", "linear"] = "locf",
    entity_col: str = "conv_id",
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Densify and fill the given stat columns. Adds ``is_gap`` marking
    grid rows that had no observation at all."""
    grid = dense_grid(points, tier, entity_col, bucket_col)
    keep = [entity_col, bucket_col, *value_cols]
    joined = grid.join(
        points.select(*keep).withColumn("__observed", F.lit(True)),
        on=[entity_col, bucket_col],
        how="left",
    )

    w_back = (
        Window.partitionBy(entity_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(entity_col)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )

    out = joined
    for c in value_cols:
        if method == "locf":
            out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w_back))
        elif method == "linear":
            prev = F.last(
                F.when(F.col(c).isNotNull(), F.struct(F.col(bucket_col).alias("t"), F.col(c).alias("v"))),
                ignorenulls=True,
            ).over(w_back)
            nxt = F.first(
                F.when(F.col(c).isNotNull(), F.struct(F.col(bucket_col).alias("t"), F.col(c).alias("v"))),
                ignorenulls=True,
            ).over(w_fwd)
            t = F.col(bucket_col).cast("double")
            interp = prev["v"] + (nxt["v"] - prev["v"]) * (t - prev["t"]) / (
                nxt["t"] - prev["t"]
            )
            out = out.withColumn(
                c,
                F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
                    F.when(prev.isNotNull() & nxt.isNotNull(), interp)
                ),
            )
        else:
            raise ValueError(f"Unknown gap-fill method {method!r}")

    return out.withColumn("is_gap", F.col("__observed").isNull()).drop("__observed")
