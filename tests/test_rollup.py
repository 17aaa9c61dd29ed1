"""Continuous-aggregate correctness:

1. transcripts synthesizer is deterministic, ordered, skewed;
2. tier finalisation == direct Spark aggregation over the same buckets;
3. coarse tiers rolled up from 1m partials == recomputed from raw
   (algebraic-combine exactness);
4. tier buckets numerically match the reference-semantics Flattener
   (whose own goldens are ported from the reference suites) — the
   BASELINE.json "exact match at each retention tier" requirement.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark import (
    Flattener,
    PredictionTimeFrame,
    PredictorSpec,
    ValueFrame,
    strings_to_aggregators,
)
from timeseriesflattener_spark.plans import rollup as R
from timeseriesflattener_spark.sources.transcripts import (
    derive_channels,
    synthesize_transcripts,
)

VALUE_COLS = ["text_len", "n_tokens", "tool_call"]


@pytest.fixture(scope="module")
def channels(spark):
    t = synthesize_transcripts(spark, n_conversations=40, avg_turns=12, seed=7, span_days=2)
    return derive_channels(t).cache()


def test_transcripts_deterministic_and_ordered(spark):
    a = synthesize_transcripts(spark, n_conversations=30, seed=11).orderBy("conv_id", "turn_idx")
    b = synthesize_transcripts(spark, n_conversations=30, seed=11).orderBy("conv_id", "turn_idx")
    rows_a = [tuple(r) for r in a.collect()]
    rows_b = [tuple(r) for r in b.collect()]
    assert rows_a == rows_b  # per-turn text equality under stable ordering
    # strictly increasing ts within conversation
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = (
        a.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts") >= F.col("ts"))
        .count()
    )
    assert bad == 0


def test_transcripts_skew(spark):
    t = synthesize_transcripts(spark, n_conversations=400, avg_turns=10, seed=3, heavy_every=200)
    sizes = t.groupBy("conv_id").count()
    stats = sizes.agg(F.max("count").alias("mx"), F.expr("percentile(count, 0.5)").alias("med")).first()
    assert stats["mx"] > 10 * stats["med"]  # hot conversations exist


def _direct_tier(channels, tier):
    """Independent per-bucket aggregation using Spark built-ins only."""
    b = channels.withColumn("bucket_start", R.bucket_expr(F.col("ts"), tier))
    exprs = []
    for vc in VALUE_COLS:
        y = F.col(vc)
        x = (F.unix_micros("ts") / F.lit(R.MICROS_PER_DAY)).cast("long").cast("double")
        exprs += [
            F.count(y).alias(f"{vc}_count"),
            F.sum(y).alias(f"{vc}_sum"),
            F.min(y).alias(f"{vc}_min"),
            F.max(y).alias(f"{vc}_max"),
            F.avg(y).alias(f"{vc}_mean"),
            F.var_samp(y).alias(f"{vc}_var"),
            F.regr_slope(y, x).alias(f"{vc}_slope"),
            F.min_by(y, F.struct(F.col("ts"), F.col("turn_idx"))).alias(f"{vc}_earliest"),
            F.max_by(y, F.struct(F.col("ts"), F.col("turn_idx"))).alias(f"{vc}_latest"),
            (F.count(y) > 0).alias(f"{vc}_has_values"),
        ]
    return b.groupBy("conv_id", "bucket_start").agg(*exprs)


def _as_map(df):
    return {
        (r["conv_id"], r["bucket_start"]): r.asDict() for r in df.collect()
    }


def _assert_tier_equal(result_map, expected_map, cols):
    assert set(result_map) == set(expected_map)
    for key, exp in expected_map.items():
        res = result_map[key]
        for c in cols:
            a, b = res[c], exp[c]
            if a is None and b is None:
                continue
            if isinstance(a, float):
                assert a == pytest.approx(b, rel=1e-9, abs=1e-9), (key, c, a, b)
            else:
                assert a == b, (key, c, a, b)


ALL_STATS = [
    f"{vc}_{s}"
    for vc in VALUE_COLS
    for s in ["count", "sum", "min", "max", "mean", "var", "slope", "earliest", "latest", "has_values"]
]


def test_tier_1m_matches_direct_aggregation(channels):
    tier = R.finalize(
        R.partial_aggregate(channels, VALUE_COLS, tier="1m"), VALUE_COLS, include_bucket_ts=False
    )
    _assert_tier_equal(_as_map(tier), _as_map(_direct_tier(channels, "1m")), ALL_STATS)


def test_rollup_from_partials_matches_raw(channels):
    """1h and 1d tiers combined from 1m partials == recomputed from raw."""
    p1m = R.partial_aggregate(channels, VALUE_COLS, tier="1m").cache()
    for tier in ("1h", "1d"):
        rolled = R.finalize(
            R.rollup(p1m, VALUE_COLS, to_tier=tier), VALUE_COLS, include_bucket_ts=False
        )
        from_raw = R.finalize(
            R.partial_aggregate(channels, VALUE_COLS, tier=tier),
            VALUE_COLS,
            include_bucket_ts=False,
        )
        _assert_tier_equal(_as_map(rolled), _as_map(from_raw), ALL_STATS)


def test_salted_aggregation_identical(channels):
    plain = R.finalize(
        R.partial_aggregate(channels, VALUE_COLS, tier="1h"), VALUE_COLS, include_bucket_ts=False
    )
    salted = R.finalize(
        R.partial_aggregate(channels, VALUE_COLS, tier="1h", salt_partitions=8),
        VALUE_COLS,
        include_bucket_ts=False,
    )
    _assert_tier_equal(_as_map(salted), _as_map(plain), ALL_STATS)


def test_tier_matches_reference_semantics_flattener(spark, channels):
    """BASELINE.json correctness gate: rolled-up points at a tier equal
    the reference-semantics flattener run over the same windows.

    A 1h bucket [start, start+1h) equals the flattener's closed window
    [pred - (1h - 1µs), pred] anchored at pred = start + 1h - 1µs,
    because timestamps are integer micros.
    """
    tier = "1h"
    width = R.tier_micros(tier)
    p = R.partial_aggregate(channels, VALUE_COLS, tier=tier)
    tier_df = R.finalize(p, VALUE_COLS, include_bucket_ts=False)

    pred_df = tier_df.select(
        F.col("conv_id").alias("entity_id"),
        F.timestamp_micros(F.col("bucket_start") + F.lit(width - 1)).alias("pred_timestamp"),
        F.col("bucket_start"),
    ).cache()

    flat = Flattener(
        predictiontime_frame=PredictionTimeFrame(df=pred_df.drop("bucket_start"))
    ).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(
                    df=channels.withColumnRenamed("conv_id", "entity_id"),
                    value_timestamp_col_name="ts",
                    order_col_name="turn_idx",
                ),
                lookbehind_distances=[dt.timedelta(microseconds=width - 1)],
                aggregators=strings_to_aggregators(
                    ["mean", "min", "max", "count", "sum", "var", "earliest", "latest"]
                ),
                fallback=None,
            )
        ]
    )
    flat_rows = {
        (r["entity_id"], r["pred_timestamp"]): r.asDict() for r in flat.df.collect()
    }
    tier_rows = {
        (r["conv_id"], r["bucket_start"]): r.asDict() for r in tier_df.collect()
    }
    pred_key = {
        (r["entity_id"], r["bucket_start"]): r["pred_timestamp"] for r in pred_df.collect()
    }
    assert len(flat_rows) == len(tier_rows) > 0
    # timedelta.days floors: -(1h-1µs) has .days == -1 -> "0_to_1_days"
    lp = "within_0_to_1_days"
    for (conv, bucket), trow in tier_rows.items():
        frow = flat_rows[(conv, pred_key[(conv, bucket)])]
        for vc in VALUE_COLS:
            for agg in ["mean", "min", "max", "count", "sum", "var", "earliest", "latest"]:
                got = frow[f"pred_{vc}_{lp}_{agg}_fallback_None"]
                want = trow[f"{vc}_{agg}"]
                if want is None:
                    assert got is None or (isinstance(got, float) and math.isnan(got))
                elif isinstance(want, float):
                    assert got == pytest.approx(want, rel=1e-9), (conv, bucket, vc, agg)
                else:
                    assert got == want, (conv, bucket, vc, agg)


def test_bucket_expr_floors_pre_epoch_timestamps(spark):
    """bucket_expr must FLOOR, not truncate toward zero: 1969-12-31
    23:59:30 belongs to the -60s 1m bucket, not bucket 0. Property-style
    sweep of micros straddling the epoch for every tier width."""
    import random

    rng = random.Random(42)
    widths = {t: R.tier_micros(t) for t in ("1m", "1h", "1d")}
    micros_vals = [0, 1, -1, -30_000_000, 59_999_999, -59_999_999, -60_000_000]
    micros_vals += [rng.randint(-3 * 86_400_000_000, 3 * 86_400_000_000) for _ in range(50)]
    df = spark.createDataFrame(
        [(m,) for m in micros_vals], "m long"
    ).select("m", F.timestamp_micros(F.col("m")).alias("ts"))
    for tier, w in widths.items():
        got = {
            r["m"]: r["b"]
            for r in df.select("m", R.bucket_expr(F.col("ts"), tier).alias("b")).collect()
        }
        for m in micros_vals:
            assert got[m] == (m // w) * w, (tier, m, got[m])
    # named regression: 30s before the epoch, 1m tier
    assert (
        df.filter(F.col("m") == -30_000_000)
        .select(R.bucket_expr(F.col("ts"), "1m").alias("b"))
        .first()["b"]
        == -60_000_000
    )


def test_floor_to_width_partial_rollup_pre_epoch(spark):
    """rollup-to-coarser re-bucketing floors negative bucket_starts too."""
    df = spark.createDataFrame(
        [(-60_000_000,), (-3_600_000_000,), (59_000_000,)], "bucket_start long"
    )
    w = R.tier_micros("1h")
    got = [
        r["b"]
        for r in df.select(
            R.floor_to_width(F.col("bucket_start"), w).alias("b")
        ).collect()
    ]
    assert got == [(-60_000_000 // w) * w, -3_600_000_000, 0]
