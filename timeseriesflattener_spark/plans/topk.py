"""Mergeable per-tier frequency tables + heavy hitters, and HLL
mergeable distinct counts — the two remaining continuous-aggregate
families a transcript pipeline serves ("top tools this hour",
"distinct users today") that plain moments cannot answer.

- **frequency partials**: (entity, bucket, key, n) longs. Merging to a
  coarser tier is addition; top-k is a window row_number at query time.
  EXACT (the key universe per transcript channel — tools, roles, event
  types — is small; for unbounded key spaces cap with a min-support
  filter and document the approximation).
- **HLL partials**: Spark 3.5 Datasketches ``hll_sketch_agg`` binary
  state per (entity, bucket); ``hll_union_agg`` merges tiers WITHOUT
  touching raw data — the mergeable counterpart of
  ``rollup.exact_unique_count`` (which must scan raw per tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .rollup import bucket_expr, floor_to_width, tier_micros


# ------------------------------------------------------ frequency/top-k


def partial_frequencies(
    df: DataFrame,
    key_col: str,
    tier: str = "1m",
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Raw rows -> (entity, bucket_start, key, n)."""
    return (
        df.select(
            F.col(entity_col),
            bucket_expr(F.col(ts_col), tier).alias("bucket_start"),
            F.col(key_col).alias("key"),
        )
        .groupBy(entity_col, "bucket_start", "key")
        .agg(F.count("*").alias("n"))
    )


def rollup_frequencies(
    partials: DataFrame, to_tier: str, entity_col: str = "conv_id"
) -> DataFrame:
    width = tier_micros(to_tier)
    return (
        partials.withColumn(
            "bucket_start", floor_to_width(F.col("bucket_start"), width)
        )
        .groupBy(entity_col, "bucket_start", "key")
        .agg(F.sum("n").alias("n"))
    )


def top_k(
    partials: DataFrame, k: int = 3, entity_col: str = "conv_id"
) -> DataFrame:
    """(entity, bucket, key, n, rank<=k); ties break by key for
    determinism."""
    w = Window.partitionBy(entity_col, "bucket_start").orderBy(
        F.desc("n"), F.asc("key")
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(entity_col, "bucket_start", "key", "n", "rank")
    )


# ----------------------------------------------------------------- HLL


def partial_hll(
    df: DataFrame,
    value_col: str,
    tier: str = "1m",
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    lg_k: int = 12,
) -> DataFrame:
    """Raw rows -> (entity, bucket_start, hll: binary sketch)."""
    return (
        df.select(
            F.col(entity_col),
            bucket_expr(F.col(ts_col), tier).alias("bucket_start"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(entity_col, "bucket_start")
        .agg(F.hll_sketch_agg("__v", F.lit(lg_k)).alias("hll"))
    )


def rollup_hll(
    partials: DataFrame, to_tier: str, entity_col: str = "conv_id"
) -> DataFrame:
    """Merge HLL partials to a coarser tier — sketch union, never raw."""
    width = tier_micros(to_tier)
    return (
        partials.withColumn(
            "bucket_start", floor_to_width(F.col("bucket_start"), width)
        )
        .groupBy(entity_col, "bucket_start")
        .agg(F.hll_union_agg("hll").alias("hll"))
    )


def hll_estimates(partials: DataFrame, entity_col: str = "conv_id") -> DataFrame:
    return partials.select(
        entity_col,
        "bucket_start",
        F.hll_sketch_estimate("hll").alias("unique_estimate"),
    )
