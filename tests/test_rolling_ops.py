"""Rolling stats / counter increase / M4 downsample operators.

Goldens are hand-computed; plan pins assert the one-exchange shapes the
docstrings promise (rolling: one entity exchange; m4: one hash aggregate
with map-side partials)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark.operators.rolling import (
    counter_increase,
    downsample_m4,
    rolling_stats,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, e, T0 + dt.timedelta(minutes=m), float(v)) for i, (e, m, v) in enumerate(rows)],
        ["event_id", "user_id", "ts", "value"],
    )


# -------------------------------------------------------------- rolling_stats


def test_rolling_stats_hand_computed(spark):
    """Entity 1: values 10, 20, 40 at t=0, 30m, 50m; 1h window.
    Row 3's frame is all three points (both window ends inclusive)."""
    df = _ev(spark, [(1, 0, 10), (1, 30, 20), (1, 50, 40)])
    out = {
        r["event_id"]: r
        for r in rolling_stats(df, dt.timedelta(hours=1)).collect()
    }
    assert out[0]["roll_n"] == 1
    assert float(out[0]["roll_mean"]) == 10.0
    assert out[0]["roll_std"] is None and out[0]["roll_z"] is None
    assert out[1]["roll_n"] == 2
    assert float(out[1]["roll_mean"]) == 15.0
    assert float(out[1]["roll_std"]) == pytest.approx(
        math.sqrt(50), abs=1e-6
    )
    mean3, sd3 = 70 / 3, math.sqrt(((10 - 70 / 3) ** 2 + (20 - 70 / 3) ** 2 + (40 - 70 / 3) ** 2) / 2)
    assert out[2]["roll_n"] == 3
    assert float(out[2]["roll_z"]) == pytest.approx((40 - mean3) / sd3, abs=1e-6)


def test_rolling_stats_window_boundary_and_constant_series(spark):
    """A point exactly `window` old IS in the frame (both-inclusive);
    a constant window gives std=0 -> z NULL, never inf."""
    df = _ev(spark, [(1, 0, 5), (1, 60, 5), (2, 0, 7), (2, 61, 9)])
    out = {
        (r["user_id"], r["event_id"]): r
        for r in rolling_stats(df, dt.timedelta(hours=1)).collect()
    }
    row = out[(1, 1)]
    assert row["roll_n"] == 2 and float(row["roll_std"]) == 0.0
    assert row["roll_z"] is None
    # entity 2's second point is 61m later -> first point aged out
    assert out[(2, 3)]["roll_n"] == 1


def test_rolling_stats_equal_ts_rows_are_frame_peers(spark):
    """Duplicate timestamps land in one RANGE frame: both rows see both
    values — the partition-order-free contract."""
    df = _ev(spark, [(1, 10, 3), (1, 10, 5)])
    rows = rolling_stats(df, dt.timedelta(hours=1)).collect()
    assert {r["roll_n"] for r in rows} == {2}
    assert {float(r["roll_mean"]) for r in rows} == {4.0}


def test_rolling_stats_validation(spark):
    df = _ev(spark, [(1, 0, 1)])
    with pytest.raises(ValueError, match="positive timedelta"):
        rolling_stats(df, dt.timedelta(0))
    with pytest.raises(ValueError, match="min_periods"):
        rolling_stats(df, dt.timedelta(hours=1), min_periods=1)


def test_rolling_stats_single_exchange_plan(spark):
    """One entity exchange AND one fused Window node: count/avg/stddev
    share a (partition, order, frame) spec emitted in one select, so
    Catalyst must not plan one Window+Sort per stat (the withColumn
    anti-pattern this pin guards against)."""
    df = _ev(spark, [(1, 0, 1), (2, 5, 2)])
    plan = (
        rolling_stats(df, dt.timedelta(hours=1))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert plan.count("Window [") == 1
    assert plan.count("Sort [") == 1


# ----------------------------------------------------------- counter_increase


def test_counter_increase_reset_and_first_sample(spark):
    """Counter 10 -> 25 -> 3 (reset) -> 8: increases 15, 3, 5; the
    first sample contributes nothing."""
    df = _ev(spark, [(1, 0, 10), (1, 10, 25), (1, 20, 3), (1, 30, 8)])
    rows = counter_increase(df, dt.timedelta(hours=1)).collect()
    assert len(rows) == 1
    assert float(rows[0]["increase"]) == 15 + 3 + 5
    assert rows[0]["n_deltas"] == 3


def test_counter_increase_bucket_attribution(spark):
    """A delta straddling a bucket edge lands in the LATER sample's
    bucket (55m -> 65m delta belongs to hour 1)."""
    df = _ev(spark, [(1, 55, 10), (1, 65, 16)])
    rows = {
        r["bucket_start"]: r
        for r in counter_increase(df, dt.timedelta(hours=1)).collect()
    }
    assert list(rows) == [T0 + dt.timedelta(hours=1)]
    assert float(rows[T0 + dt.timedelta(hours=1)]["increase"]) == 6


def test_counter_increase_monotonic_raises_on_reset(spark):
    df = _ev(spark, [(1, 0, 10), (1, 10, 3)])
    out = counter_increase(df, dt.timedelta(hours=1), monotonic=True)
    with pytest.raises(Exception, match="negative delta"):
        out.collect()


def test_counter_increase_equal_ts_tiebreak_on_order_col(spark):
    """Two samples at the SAME timestamp order by event_id, so the
    delta chain is deterministic under any partitioning."""
    df = _ev(spark, [(1, 0, 10), (1, 0, 12), (1, 5, 13)])
    rows = counter_increase(df, dt.timedelta(hours=1)).collect()
    assert float(rows[0]["increase"]) == 3.0  # 10->12->13


# -------------------------------------------------------------- downsample_m4


def test_downsample_m4_hand_computed_with_ties(spark):
    """One 6h bucket; min value 1.0 appears twice -> EARLIEST wins;
    max value 9.0 appears twice -> LATEST wins."""
    df = _ev(
        spark,
        [(1, 0, 5), (1, 10, 1), (1, 20, 9), (1, 30, 1), (1, 40, 9), (1, 50, 2)],
    )
    rows = downsample_m4(df, dt.timedelta(hours=6)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_points"] == 6
    assert r["first_ts"] == T0 and float(r["first_val"]) == 5.0
    assert r["last_ts"] == T0 + dt.timedelta(minutes=50)
    assert r["min_ts"] == T0 + dt.timedelta(minutes=10)
    assert r["max_ts"] == T0 + dt.timedelta(minutes=40)
    assert float(r["min_val"]) == 1.0 and float(r["max_val"]) == 9.0


def test_downsample_m4_bucket_split_and_entities(spark):
    df = _ev(spark, [(1, 0, 5), (1, 361, 7), (2, 0, 3)])
    rows = downsample_m4(df, dt.timedelta(hours=6)).collect()
    assert len(rows) == 3
    assert {(r["entity"], r["bucket_start"]) for r in rows} == {
        (1, T0),
        (1, T0 + dt.timedelta(hours=6)),
        (2, T0),
    }


def test_downsample_m4_one_aggregate_one_exchange(spark):
    """ONE exchange, and the partial struct min/max aggregate runs
    BEFORE it (map-side combine) — the 4 orderings never fan out into
    separate passes. Struct buffers force SortAggregate, not Hash."""
    df = _ev(spark, [(1, 0, 1), (2, 5, 2)])
    plan = (
        downsample_m4(df, dt.timedelta(hours=6))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    pre_exchange = plan.split("Exchange", 1)[1]
    assert "partial_min" in pre_exchange and "partial_max" in pre_exchange
    # exactly one partial+final aggregate pair
    assert plan.count("SortAggregate") + plan.count("HashAggregate") == 2


def test_m4_matches_per_bucket_recompute(spark):
    """Differential on real data: every (entity, bucket) row agrees
    with a per-group recompute via window ranks (independent path)."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = downsample_m4(ev, dt.timedelta(hours=6)).collect()
    b = F.timestamp_micros(
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp")) % (21600 * 1000000)
    )
    base = ev.select(
        F.col("user_id").alias("entity"), b.alias("bucket_start"), "ts", "value"
    )
    wmin = Window.partitionBy("entity", "bucket_start").orderBy(
        F.col("value").asc(), F.col("ts").asc()
    )
    lo = (
        base.withColumn("r", F.row_number().over(wmin))
        .filter("r = 1")
        .select("entity", "bucket_start", "ts", "value")
    )
    want_min = {
        (r["entity"], r["bucket_start"]): (r["ts"], r["value"]) for r in lo.collect()
    }
    for r in got:
        k = (r["entity"], r["bucket_start"])
        assert r["min_ts"] == want_min[k][0]
        assert float(r["min_val"]) == pytest.approx(want_min[k][1], abs=1e-6)


def test_counter_increase_null_scrape_bridges(spark):
    """Samples 10, NULL, 12: the NULL contributes nothing but the next
    sample's delta runs from the last non-NULL value — the +2 increase
    survives (a plain lag() would lose it)."""
    data = [
        (0, 1, T0, 10.0),
        (1, 1, T0 + dt.timedelta(minutes=10), None),
        (2, 1, T0 + dt.timedelta(minutes=20), 12.0),
    ]
    df = spark.createDataFrame(data, ["event_id", "user_id", "ts", "value"])
    out = counter_increase(df, dt.timedelta(hours=1)).collect()
    assert len(out) == 1
    assert float(out[0]["increase"]) == 2.0 and out[0]["n_deltas"] == 1


# ------------------------------------------------------------------------ cusum


def test_cusum_hand_computed_and_null_hold(spark):
    """target=5, slack=1: s_hi over [10,1,8,9,NULL,9] = [4,0,2,5,5,8]
    (clamp at the 1, hold through the NULL); s_lo spikes to 3 at the 1.
    threshold=4 alarms from the 9 at t=3 on."""
    from timeseriesflattener_spark.operators.rolling import cusum

    rows = [
        ("A", T0 + dt.timedelta(minutes=i), i, v)
        for i, v in enumerate([10.0, 1.0, 8.0, 9.0, None, 9.0])
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value double"
    )
    out = {
        r["event_id"]: r
        for r in cusum(df, target=5, slack=1, threshold=4).collect()
    }
    assert [out[i]["cusum_hi"] for i in range(6)] == [4.0, 0.0, 2.0, 5.0, 5.0, 8.0]
    assert [out[i]["cusum_lo"] for i in range(6)] == [0.0, 3.0, 0.0, 0.0, 0.0, 0.0]
    assert [out[i]["alarm_hi"] for i in range(6)] == [False, False, False, True, True, True]
    assert not any(out[i]["alarm_lo"] for i in range(6))


def test_cusum_randomized_differential(spark):
    """20 entities x 40 observations vs the sequential Python
    recurrence (integer domain: exact equality)."""
    import random

    from timeseriesflattener_spark.operators.rolling import cusum

    rng = random.Random(7)
    rows, expect = [], {}
    for e in range(20):
        shi = slo = 0
        for i in range(40):
            v = rng.randrange(-50, 51)
            rows.append((f"u{e}", T0 + dt.timedelta(seconds=i), i, v))
            shi = max(0, shi + v - 12)   # target 10, slack 2
            slo = max(0, slo + 8 - v)
            expect[(f"u{e}", i)] = (shi, slo)
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value long"
    )
    got = {
        (r["user_id"], r["event_id"]): (r["cusum_hi"], r["cusum_lo"])
        for r in cusum(df, target=10, slack=2, threshold=100).collect()
    }
    assert got == expect


def test_cusum_validation_and_plan(spark):
    from timeseriesflattener_spark.operators.rolling import cusum

    df = spark.createDataFrame(
        [("A", T0, 0, 1.0)],
        "user_id string, ts timestamp, event_id long, value double",
    )
    with pytest.raises(ValueError, match="slack"):
        cusum(df, target=0, slack=-1, threshold=1)
    with pytest.raises(ValueError, match="threshold"):
        cusum(df, target=0, slack=0, threshold=0)
    plan = (
        cusum(df, target=0, slack=0, threshold=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # running sum + running min share one entity exchange and one sort
    assert plan.count("Exchange") == 1
    assert plan.count("Sort [") == 1


def test_cusum_null_ts_excluded(spark):
    """NULL-timestamp rows are dropped (Spark orders NULLs first,
    SQL engines last — keeping them would diverge from any SQL twin)."""
    from timeseriesflattener_spark.operators.rolling import cusum

    df = spark.createDataFrame(
        [("A", T0, 0, 10.0), ("A", None, 1, 100.0)],
        "user_id string, ts timestamp, event_id long, value double",
    )
    out = cusum(df, target=5, slack=1, threshold=4).collect()
    assert len(out) == 1
    assert out[0]["event_id"] == 0 and out[0]["cusum_hi"] == 4.0
