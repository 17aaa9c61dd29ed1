"""Mergeable quantile sketches per retention tier (DDSketch-style
log-binned histograms, Masson et al., VLDB 2019 — public algorithm).

The tier rollups in ``plans/rollup.py`` carry algebraic moments
(count/sum/min/max/var/...), which cannot answer percentiles. This
module adds a RELATIVE-ERROR quantile sketch whose partial state is a
sparse (bucket, bin, n) long table:

- ``bin = sign(v) * ceil(ln|v| / ln(gamma))`` with a zero bucket for
  ``|v| < eps`` — any value in bin b is within a factor gamma of the
  bin's representative, so every quantile estimate has bounded RELATIVE
  error ``(gamma-1)/(gamma+1)`` (~1% at the default gamma=1.02).
- partials MERGE by addition: rolling 1m -> 1h -> 1d is the same
  ``groupBy(coarser bucket, bin).sum(n)`` combine the moment tiers use —
  percentiles at ANY tier come from the 1m scan, never from raw.
- everything is plain ``pyspark.sql.functions`` (ln/ceil/sign + one
  window cumsum at query time): whole-stage codegen, SQL-oracle-able.

The reference has no quantile support at all; this is a north-rule
continuous-aggregate extension (p95-per-hour style serving).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .rollup import bucket_expr, floor_to_width, tier_micros

GAMMA = 1.02
EPS = 1e-9
#: most negative magnitude index reachable given the eps cutoff; bins
#: shift by -(LOW-1) so every |v| >= eps lands on a STRICTLY POSITIVE
#: magnitude and 0 stays reserved for the zero bucket (hypothesis found
#: the collision: values in (1/gamma, 1] have ceil(log_gamma) == 0)
LOW = math.ceil(math.log(EPS) / math.log(GAMMA))


def dd_bin(v: Column, gamma: float = GAMMA, eps: float = EPS) -> Column:
    """Signed DDSketch bin index of ``v`` (0 reserved for |v| < eps)."""
    low = math.ceil(math.log(eps) / math.log(gamma))
    mag = (
        F.ceil(F.log(F.abs(v)) / F.lit(math.log(gamma))).cast("long")
        - F.lit(low)
        + F.lit(1)
    )
    return (
        F.when(F.abs(v) < F.lit(eps), F.lit(0).cast("long"))
        .when(v > 0, mag)
        .otherwise(-mag)
    )


def bin_representative(bin_col: Column, gamma: float = GAMMA, eps: float = EPS) -> Column:
    """Midpoint value represented by a bin:
    2*gamma^(|b| + LOW - 1)/(gamma+1), mirrored for negative bins, 0 for
    the zero bucket."""
    low = math.ceil(math.log(eps) / math.log(gamma))
    mag = F.pow(F.lit(gamma), F.abs(bin_col) + F.lit(low) - F.lit(1)) * F.lit(
        2.0 / (gamma + 1.0)
    )
    return (
        F.when(bin_col == 0, F.lit(0.0))
        .when(bin_col > 0, mag)
        .otherwise(-mag)
    )


def partial_sketch(
    df: DataFrame,
    value_col: str,
    tier: str = "1m",
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    gamma: float = GAMMA,
) -> DataFrame:
    """Raw rows -> sparse histogram partials
    (entity, bucket_start, bin, n). One shuffle, map-side combined."""
    return (
        df.select(
            F.col(entity_col),
            bucket_expr(F.col(ts_col), tier).alias("bucket_start"),
            dd_bin(F.col(value_col), gamma).alias("bin"),
        )
        .groupBy(entity_col, "bucket_start", "bin")
        .agg(F.count("*").alias("n"))
    )


def rollup_sketch(
    partials: DataFrame, to_tier: str, entity_col: str = "conv_id"
) -> DataFrame:
    """Combine sketch partials to a coarser tier — pure addition."""
    width = tier_micros(to_tier)
    return (
        partials.withColumn(
            "bucket_start", floor_to_width(F.col("bucket_start"), width)
        )
        .groupBy(entity_col, "bucket_start", "bin")
        .agg(F.sum("n").alias("n"))
    )


def quantiles_from_sketch(
    partials: DataFrame,
    ps: Sequence[float] = (0.5, 0.95, 0.99),
    entity_col: str = "conv_id",
    gamma: float = GAMMA,
) -> DataFrame:
    """Per (entity, bucket) quantile estimates from histogram partials.

    The q-quantile is the representative of the first bin whose
    cumulative count reaches ``ceil(q * total)`` in bin order — the
    DDSketch rank rule; relative error <= (gamma-1)/(gamma+1).
    Implemented as one window cumsum + conditional min aggregation
    (no UDFs, no explode).
    """
    w = Window.partitionBy(entity_col, "bucket_start").orderBy("bin")
    wtot = Window.partitionBy(entity_col, "bucket_start")
    cum = partials.select(
        entity_col,
        "bucket_start",
        "bin",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(wtot).alias("total"),
    )
    aggs = []
    for p in ps:
        rank = F.ceil(F.lit(p) * F.col("total"))
        hit_bin = F.min(F.when(F.col("cum") >= rank, F.col("bin")))
        aggs.append(hit_bin.alias(f"__b{int(p * 100)}"))
    out = cum.groupBy(entity_col, "bucket_start").agg(*aggs)
    for p in ps:
        tag = int(p * 100)
        out = out.withColumn(
            f"p{tag}", bin_representative(F.col(f"__b{tag}"), gamma)
        ).drop(f"__b{tag}")
    return out
