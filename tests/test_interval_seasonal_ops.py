"""state_durations / ewma / seasonal_baseline / value_histogram.

Goldens are hand-computed; ewma additionally carries a differential
against pandas ``ewm(halflife=..., times=...)`` (the semantics the
docstring promises) on duplicate-free series, and hand-computed peer
goldens where timestamps collide (pandas is sequential there; we are
peer-grouped, the partition-order-free choice)."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark.operators.intervals import state_durations
from timeseriesflattener_spark.operators.rolling import (
    ewma,
    seasonal_baseline,
    value_histogram,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows, with_state=False):
    if with_state:
        data = [
            (i, e, T0 + dt.timedelta(minutes=m), float(v), s)
            for i, (e, m, v, s) in enumerate(rows)
        ]
        cols = ["event_id", "user_id", "ts", "value", "event_type"]
    else:
        data = [
            (i, e, T0 + dt.timedelta(minutes=m), float(v))
            for i, (e, m, v) in enumerate(rows)
        ]
        cols = ["event_id", "user_id", "ts", "value"]
    return spark.createDataFrame(data, cols)


# ------------------------------------------------------------ state_durations


def test_state_durations_chops_at_bucket_boundaries(spark):
    """Entity 1: A at t=0, B at t=90m, A at t=150m, end_ts t=180m with
    1h buckets. A: [0,90m) -> 60m in bucket0 + 30m in bucket1;
    B: [90m,150m) -> 30m in bucket1 + 30m in bucket2;
    A again: [150m,180m) -> 30m in bucket2."""
    df = _ev(
        spark,
        [(1, 0, 0, "A"), (1, 90, 0, "B"), (1, 150, 0, "A")],
        with_state=True,
    )
    out = state_durations(
        df,
        dt.timedelta(hours=1),
        end_ts=T0 + dt.timedelta(minutes=180),
    ).collect()
    got = {
        (r["state"], r["bucket_start"].minute + 60 * r["bucket_start"].hour): float(
            r["seconds"]
        )
        for r in out
    }
    assert got == {
        ("A", 0): 3600.0,
        ("A", 60): 1800.0,
        ("B", 60): 1800.0,
        ("B", 120): 1800.0,
        ("A", 120): 1800.0,
    }
    total = sum(got.values())
    assert total == 180 * 60  # full horizon accounted for


def test_state_durations_open_interval_dropped_without_end_ts(spark):
    df = _ev(spark, [(1, 0, 0, "A"), (1, 30, 0, "B")], with_state=True)
    out = state_durations(df, dt.timedelta(hours=1)).collect()
    # only A's closed [0, 30m) interval survives
    assert len(out) == 1
    assert out[0]["state"] == "A" and float(out[0]["seconds"]) == 1800.0


def test_state_durations_zero_length_tie_dropped_and_order_col_breaks_tie(spark):
    """Two transitions at the same microsecond: the earlier-by-event_id
    one held the state 0s and is dropped; the later one owns the
    interval to the next event."""
    df = _ev(
        spark,
        [(1, 0, 0, "A"), (1, 0, 0, "B"), (1, 10, 0, "C")],
        with_state=True,
    )
    out = state_durations(
        df, dt.timedelta(hours=1), end_ts=T0 + dt.timedelta(minutes=20)
    ).collect()
    got = {r["state"]: float(r["seconds"]) for r in out}
    assert got == {"B": 600.0, "C": 600.0}


def test_state_durations_clips_at_end_ts_and_drops_later_events(spark):
    df = _ev(
        spark,
        [(1, 0, 0, "A"), (1, 30, 0, "B"), (1, 90, 0, "C")],
        with_state=True,
    )
    out = state_durations(
        df, dt.timedelta(hours=1), end_ts=T0 + dt.timedelta(minutes=45)
    ).collect()
    got = {r["state"]: float(r["seconds"]) for r in out}
    # B clipped at 45m; C starts after end_ts and is dropped entirely
    assert got == {"A": 1800.0, "B": 900.0}


def test_state_durations_interval_ending_on_boundary_stays_out_of_next_bucket(spark):
    df = _ev(spark, [(1, 0, 0, "A"), (1, 60, 0, "B")], with_state=True)
    out = state_durations(
        df, dt.timedelta(hours=1), end_ts=T0 + dt.timedelta(minutes=60)
    ).collect()
    rows = [(r["state"], r["bucket_start"].hour, float(r["seconds"])) for r in out]
    assert rows == [("A", 0, 3600.0)]  # B is zero-length at the horizon


def test_state_durations_validation(spark):
    df = _ev(spark, [(1, 0, 0, "A")], with_state=True)
    with pytest.raises(ValueError, match="positive timedelta"):
        state_durations(df, dt.timedelta(0))


# ----------------------------------------------------------------------- ewma


def test_ewma_matches_pandas_times_halflife(spark):
    """Differential vs pandas ewm(halflife, times) on an irregular,
    duplicate-free series (two entities, interleaved)."""
    rows = [
        (1, 0, 10.0),
        (1, 7, 20.0),
        (2, 3, 5.0),
        (1, 30, 40.0),
        (2, 200, 7.5),
        (1, 31, -3.0),
        (2, 201, 9.0),
    ]
    df = _ev(spark, rows)
    hl = dt.timedelta(minutes=15)
    got = {
        r["event_id"]: float(r["ewma"])
        for r in ewma(df, hl, entity_col="user_id").collect()
    }
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": [r[0] for r in rows],
            "ts": [T0 + dt.timedelta(minutes=r[1]) for r in rows],
            "value": [r[2] for r in rows],
        }
    )
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values("ts")
        exp = g["value"].ewm(halflife=hl, times=g["ts"]).mean()
        for eid, e in zip(g["event_id"], exp):
            assert got[eid] == pytest.approx(e, abs=1e-6), eid


def test_ewma_peer_timestamps_share_value_and_nulls_carry_no_weight(spark):
    """Entity 1: v=10 at t=0; peers v=20 and v=30 at t=1h (= one
    halflife later, decay 0.5). Both peers get
    (10*0.5 + 20 + 30) / (0.5 + 2) = 22. A NULL at t=2h gets the
    decayed mean of its history (unchanged value 22 -- weights decay
    uniformly), and a NULL-only entity gets NULL."""
    data = [
        (0, 1, T0, 10.0),
        (1, 1, T0 + dt.timedelta(hours=1), 20.0),
        (2, 1, T0 + dt.timedelta(hours=1), 30.0),
        (3, 1, T0 + dt.timedelta(hours=2), None),
        (4, 2, T0, None),
    ]
    df = spark.createDataFrame(data, ["event_id", "user_id", "ts", "value"])
    got = {
        r["event_id"]: (None if r["ewma"] is None else float(r["ewma"]))
        for r in ewma(df, dt.timedelta(hours=1)).collect()
    }
    assert got[0] == pytest.approx(10.0)
    assert got[1] == pytest.approx(22.0)
    assert got[2] == pytest.approx(22.0)
    assert got[3] == pytest.approx(22.0)
    assert got[4] is None


def test_ewma_partition_invariant(spark):
    rows = [(e, m, float((e * 7 + m) % 13)) for e in (1, 2, 3) for m in range(0, 120, 7)]
    df = _ev(spark, rows)
    a = sorted(
        (r["event_id"], str(r["ewma"]))
        for r in ewma(df, dt.timedelta(minutes=20)).collect()
    )
    b = sorted(
        (r["event_id"], str(r["ewma"]))
        for r in ewma(df.repartition(7), dt.timedelta(minutes=20)).collect()
    )
    assert a == b


def test_ewma_validation(spark):
    df = _ev(spark, [(1, 0, 1)])
    with pytest.raises(ValueError, match="positive timedelta"):
        ewma(df, dt.timedelta(0))


# ---------------------------------------------------------- seasonal_baseline


def test_seasonal_baseline_hand_computed(spark):
    """Entity 1, hourly slots over a daily period: three days of
    observations at 01:00 (values 10, 20, 30) and one at 02:00.
    Slot 1: n=3, mean=20, std=10; z(day0 obs)=-1. Slot 2: n=1,
    std/z NULL below min_periods."""
    rows = [
        (0, 1, T0 + dt.timedelta(days=d, hours=1), v)
        for d, v in enumerate((10.0, 20.0, 30.0))
    ]
    rows.append((0, 1, T0 + dt.timedelta(hours=2), 99.0))
    df = spark.createDataFrame(
        [(i,) + r[1:] for i, r in enumerate(rows)],
        ["event_id", "user_id", "ts", "value"],
    )
    out = {r["event_id"]: r for r in seasonal_baseline(df).collect()}
    assert out[0]["slot"] == 1 and out[0]["season_n"] == 3
    assert float(out[0]["season_mean"]) == 20.0
    assert float(out[0]["season_std"]) == 10.0
    assert float(out[0]["season_z"]) == -1.0
    assert out[3]["slot"] == 2 and out[3]["season_n"] == 1
    assert out[3]["season_std"] is None and out[3]["season_z"] is None


def test_seasonal_baseline_weekly_period_and_single_window_plan(spark):
    """Same hour on consecutive days falls in DIFFERENT slots under a
    weekly period; plan has exactly one Window node and one exchange."""
    df = _ev(spark, [(1, 0, 1), (1, 24 * 60, 2), (1, 7 * 24 * 60, 3)])
    sb = seasonal_baseline(
        df, period=dt.timedelta(days=7), slot=dt.timedelta(hours=1)
    )
    rows = sorted(
        (r["event_id"], r["slot"], r["season_n"]) for r in sb.collect()
    )
    # t=0 and t=+7d share slot 96 (epoch anchor: 1970-01-01 was a
    # Thursday; 2024-01-01 00:00 is (4*24)h into the epoch-week);
    # t=+1d sits alone in slot 120
    assert rows == [(0, 96, 2), (1, 120, 1), (2, 96, 2)]
    # executed plan: AQE's toString appends "== Initial Plan ==" after
    # execution — count nodes in the final-plan section only
    plan = (
        sb._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Window [") == 1
    assert plan.count("Exchange") == 1


def test_seasonal_baseline_validation(spark):
    df = _ev(spark, [(1, 0, 1)])
    with pytest.raises(ValueError, match="multiple of slot"):
        seasonal_baseline(
            df, period=dt.timedelta(hours=5), slot=dt.timedelta(hours=2)
        )
    with pytest.raises(ValueError, match="min_periods"):
        seasonal_baseline(df, min_periods=1)


# ------------------------------------------------------------ value_histogram


def test_value_histogram_bins_and_negative_values(spark):
    data = [
        (0, 1, T0, -0.1, "a"),
        (1, 1, T0, 0.0, "a"),
        (2, 1, T0, 0.49, "a"),
        (3, 1, T0, 0.5, "a"),
        (4, 1, T0, None, "a"),
        (5, 1, T0, 0.2, "b"),
    ]
    df = spark.createDataFrame(
        data, ["event_id", "user_id", "ts", "value", "event_type"]
    )
    out = {
        (r["event_type"], float(r["bin_lo"])): (r["n"], float(r["total"]))
        for r in value_histogram(df, 0.5).collect()
    }
    assert out == {
        ("a", -0.5): (1, -0.1),
        ("a", 0.0): (2, 0.49),
        ("a", 0.5): (1, 0.5),
        ("b", 0.0): (1, 0.2),
    }


def test_value_histogram_single_aggregate_plan(spark):
    df = _ev(spark, [(1, 0, 1), (1, 5, 2)])
    hist = value_histogram(df, 1.0, group_cols=("user_id",))
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan  # map-side combine before the exchange


def test_value_histogram_validation(spark):
    df = _ev(spark, [(1, 0, 1)])
    with pytest.raises(ValueError, match="bin_width"):
        value_histogram(df, 0.0)


# --------------------------------------------------------------- overlap_join


def _iv(spark, rows):
    """rows: (entity, start_min, end_min, tag)"""
    return spark.createDataFrame(
        [
            (e, T0 + dt.timedelta(minutes=s), T0 + dt.timedelta(minutes=en), t)
            for e, s, en, t in rows
        ],
        ["user_id", "start", "end", "tag"],
    )


def _pt(spark, rows):
    """rows: (pid, entity, minute)"""
    return spark.createDataFrame(
        [(i, e, T0 + dt.timedelta(minutes=m)) for i, e, m in rows],
        ["pid", "user_id", "ts"],
    )


def test_overlap_join_points_basic_and_half_open(spark):
    """Interval [10, 30) catches points at 10 and 29 but not 30 (end
    exclusive) nor 9; entity isolation holds."""
    from timeseriesflattener_spark.operators.intervals import overlap_join

    left = _iv(spark, [(1, 10, 30, "w")])
    right = _pt(spark, [(0, 1, 9), (1, 1, 10), (2, 1, 29), (3, 1, 30), (4, 2, 15)])
    out = overlap_join(left, right, dt.timedelta(minutes=60))
    assert sorted(r["pid"] for r in out.collect()) == [1, 2]


def test_overlap_join_pair_counted_once_across_cells(spark):
    """An interval spanning many cells and a point in its last cell
    yield exactly ONE pair (the greatest-start attribution), not one
    per shared cell."""
    from timeseriesflattener_spark.operators.intervals import overlap_join

    left = _iv(spark, [(1, 0, 300, "w")])  # spans 5 hourly cells
    right = _pt(spark, [(0, 1, 250)])
    out = overlap_join(left, right, dt.timedelta(hours=1)).collect()
    assert len(out) == 1


def test_overlap_join_interval_interval_all_phases(spark):
    """Interval x interval: containment, partial overlap from either
    side, exact-touch (no overlap, half-open), disjoint."""
    from timeseriesflattener_spark.operators.intervals import overlap_join

    left = _iv(spark, [(1, 100, 200, "L")])
    right = _iv(
        spark,
        [
            (1, 120, 130, "contained"),
            (1, 90, 110, "left-partial"),
            (1, 190, 250, "right-partial"),
            (1, 50, 300, "covers"),
            (1, 200, 210, "touch-end"),
            (1, 90, 100, "touch-start"),
            (1, 300, 400, "disjoint"),
        ],
    ).withColumnRenamed("tag", "rtag").withColumnRenamed("start", "rs").withColumnRenamed("end", "re_")
    out = overlap_join(
        left,
        right,
        dt.timedelta(minutes=30),
        left_start="start",
        left_end="end",
        right_start="rs",
        right_end="re_",
    )
    got = sorted(r["rtag"] for r in out.collect())
    assert got == ["contained", "covers", "left-partial", "right-partial"]


def test_overlap_join_differential_vs_plain_inequality_join(spark):
    """Randomized differential: bucketized result == the naive
    inequality join, for every bucket width."""
    from timeseriesflattener_spark.operators.intervals import overlap_join

    ivs, pts = [], []
    for e in (1, 2, 3):
        for k in range(12):
            s = (e * 17 + k * 23) % 240
            ivs.append((e, s, s + 1 + (k * 7) % 50, f"i{e}_{k}"))
            pts.append((e * 100 + k, e, (e * 31 + k * 13) % 240))
    left, right = _iv(spark, ivs), _pt(spark, pts)
    expected = sorted(
        (r["tag"], r["pid"])
        for r in left.join(
            right.withColumnRenamed("user_id", "u2"),
            (F.col("user_id") == F.col("u2"))
            & (F.col("start") <= F.col("ts"))
            & (F.col("ts") < F.col("end")),
        ).collect()
    )
    for mins in (7, 60, 600):
        got = sorted(
            (r["tag"], r["pid"])
            for r in overlap_join(left, right, dt.timedelta(minutes=mins)).collect()
        )
        assert got == expected, mins


def test_overlap_join_validation(spark):
    from timeseriesflattener_spark.operators.intervals import overlap_join

    left = _iv(spark, [(1, 0, 10, "w")])
    with pytest.raises(ValueError, match="positive timedelta"):
        overlap_join(left, left, dt.timedelta(0))


# ----------------------------------------------------------------- signal_corr


def _tev(spark, rows):
    """rows: (entity, minute, type, value)"""
    return spark.createDataFrame(
        [
            (i, e, T0 + dt.timedelta(minutes=m), t, float(v))
            for i, (e, m, t, v) in enumerate(rows)
        ],
        ["event_id", "user_id", "ts", "event_type", "value"],
    )


def test_signal_corr_hand_computed(spark):
    """Three hourly buckets: click 1,2,3; view 2,4,6 (corr +1);
    error 3,2,1 (corr -1 with both). A fourth bucket has only click,
    so every pair's n_buckets stays 3."""
    from timeseriesflattener_spark.operators.rolling import signal_corr

    rows = []
    for h, (c, vv, er) in enumerate([(1, 2, 3), (2, 4, 2), (3, 6, 1)]):
        rows += [(1, h * 60, "click", c), (1, h * 60, "view", vv), (1, h * 60, "error", er)]
    rows.append((1, 3 * 60, "click", 9))
    out = signal_corr(
        _tev(spark, rows), ["click", "view", "error"], dt.timedelta(hours=1)
    ).collect()
    got = {(r["sig_a"], r["sig_b"]): (float(r["corr"]), r["n_buckets"]) for r in out}
    # corr is the RAW co-moment double (never rounded — the module's
    # cross-engine contract), so ±1 holds only to float precision
    assert got[("click", "view")][0] == pytest.approx(1.0) and got[("click", "view")][1] == 3
    assert got[("click", "error")][0] == pytest.approx(-1.0) and got[("click", "error")][1] == 3
    assert got[("view", "error")][0] == pytest.approx(-1.0) and got[("view", "error")][1] == 3


def test_signal_corr_bucket_mean_alignment(spark):
    """Two same-bucket click events average before correlating: click
    means 2,4 vs view 1,2 over two buckets -> corr 1 with n=2."""
    from timeseriesflattener_spark.operators.rolling import signal_corr

    rows = [
        (1, 0, "click", 1),
        (1, 30, "click", 3),  # bucket mean 2
        (1, 0, "view", 1),
        (1, 60, "click", 4),
        (1, 60, "view", 2),
    ]
    out = signal_corr(_tev(spark, rows), ["click", "view"], dt.timedelta(hours=1)).collect()
    assert len(out) == 1
    r = out[0]
    assert float(r["corr"]) == pytest.approx(1.0) and r["n_buckets"] == 2


def test_signal_corr_min_buckets_and_constant_side_null(spark):
    from timeseriesflattener_spark.operators.rolling import signal_corr

    rows = [(1, 0, "click", 1), (1, 0, "view", 2), (1, 60, "click", 2), (1, 60, "view", 4)]
    # n=2 but min_buckets=3 -> corr NULL, n reported
    out = signal_corr(
        _tev(spark, rows), ["click", "view"], dt.timedelta(hours=1), min_buckets=3
    ).collect()
    assert out[0]["corr"] is None and out[0]["n_buckets"] == 2
    # constant side -> corr NULL even with enough buckets
    rows2 = [(1, h * 60, "click", 5) for h in range(3)] + [
        (1, h * 60, "view", h) for h in range(3)
    ]
    out2 = signal_corr(_tev(spark, rows2), ["click", "view"], dt.timedelta(hours=1)).collect()
    assert out2[0]["corr"] is None and out2[0]["n_buckets"] == 3
    # single shared bucket (n=1): must be NULL, not an ANSI
    # divide-by-zero from the sample co-moments
    rows3 = [(1, 0, "click", 1), (1, 0, "view", 2)]
    out3 = signal_corr(_tev(spark, rows3), ["click", "view"], dt.timedelta(hours=1)).collect()
    assert out3[0]["corr"] is None and out3[0]["n_buckets"] == 1


def test_signal_corr_plan_two_aggregates_no_join(spark):
    from timeseriesflattener_spark.operators.rolling import signal_corr

    df = _tev(spark, [(1, 0, "click", 1), (1, 5, "view", 2)])
    sc = signal_corr(df, ["click", "view"], dt.timedelta(hours=1))
    plan = sc._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 2
    assert "partial_corr" in plan or "partial_avg" in plan


def test_signal_corr_validation(spark):
    from timeseriesflattener_spark.operators.rolling import signal_corr

    df = _tev(spark, [(1, 0, "click", 1)])
    with pytest.raises(ValueError, match=">= 2 signals"):
        signal_corr(df, ["click"], dt.timedelta(hours=1))
    with pytest.raises(ValueError, match="duplicate"):
        signal_corr(df, ["click", "click"], dt.timedelta(hours=1))
    with pytest.raises(ValueError, match="min_buckets"):
        signal_corr(df, ["click", "view"], dt.timedelta(hours=1), min_buckets=1)


# ------------------------------------------------------------ bucket_quantiles


def test_bucket_quantiles_hand_computed(spark):
    """Values 1,3,4,10,11 in one bucket: p50=4 (exact middle),
    p95=10.8, p99=10.96 (linear interpolation)."""
    from timeseriesflattener_spark.operators.rolling import bucket_quantiles

    df = _ev(spark, [(1, m, v) for m, v in ((0, 1), (5, 3), (10, 4), (15, 10), (20, 11))])
    out = bucket_quantiles(df, dt.timedelta(hours=1)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 5
    assert float(r["p50"]) == 4.0
    assert float(r["p95"]) == pytest.approx(10.8)
    assert float(r["p99"]) == pytest.approx(10.96)


def test_bucket_quantiles_null_values_and_naming(spark):
    from timeseriesflattener_spark.operators.rolling import bucket_quantiles

    data = [(0, 1, T0, None), (1, 1, T0, 2.0)]
    df = spark.createDataFrame(data, ["event_id", "user_id", "ts", "value"])
    out = bucket_quantiles(df, dt.timedelta(hours=1), qs=(0.5, 0.999)).collect()
    r = out[0]
    assert r["n"] == 1 and float(r["p50"]) == 2.0 and float(r["p99_9"]) == 2.0


def test_bucket_quantiles_validation(spark):
    from timeseriesflattener_spark.operators.rolling import bucket_quantiles

    df = _ev(spark, [(1, 0, 1)])
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        bucket_quantiles(df, dt.timedelta(hours=1), qs=(0.0,))
    with pytest.raises(ValueError, match="duplicate"):
        bucket_quantiles(df, dt.timedelta(hours=1), qs=(0.5, 0.5))
    with pytest.raises(ValueError, match="non-empty"):
        bucket_quantiles(df, dt.timedelta(hours=1), qs=())


def test_bucket_quantiles_single_aggregate_plan(spark):
    from timeseriesflattener_spark.operators.rolling import bucket_quantiles

    df = _ev(spark, [(1, 0, 1), (1, 5, 2)])
    plan = (
        bucket_quantiles(df, dt.timedelta(hours=1))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    # the sorted-array buffer merges map-side like Spark's own
    # percentile (ObjectHashAggregate partial collect_list)
    assert "partial_collect_list" in plan


# ---------------------------------------------------------- threshold_episodes


def test_threshold_episodes_islands_golden(spark):
    """Entity 1 values 1, 20, 30, 5, 40 at 10-min cadence with
    condition value > 15: two episodes — [10m, 20m] (peak 30, 2
    events) and [40m, 40m] (peak 40, 1 event)."""
    from timeseriesflattener_spark.operators.intervals import threshold_episodes

    df = _ev(spark, [(1, 0, 1), (1, 10, 20), (1, 20, 30), (1, 30, 5), (1, 40, 40)])
    out = sorted(
        threshold_episodes(df, F.col("value") > 15).collect(),
        key=lambda r: r["start_ts"],
    )
    assert len(out) == 2
    a, b = out
    assert (a["start_ts"].minute, a["end_ts"].minute, a["n_events"], float(a["peak"])) == (10, 20, 2, 30.0)
    assert (b["start_ts"].minute, b["end_ts"].minute, b["n_events"], float(b["peak"])) == (40, 40, 1, 40.0)


def test_threshold_episodes_null_condition_breaks_run(spark):
    """A NULL value (condition NULL -> False) splits an episode."""
    from timeseriesflattener_spark.operators.intervals import threshold_episodes

    data = [
        (0, 1, T0, 20.0),
        (1, 1, T0 + dt.timedelta(minutes=10), None),
        (2, 1, T0 + dt.timedelta(minutes=20), 25.0),
    ]
    df = spark.createDataFrame(data, ["event_id", "user_id", "ts", "value"])
    out = threshold_episodes(df, F.col("value") > 15).collect()
    assert len(out) == 2 and all(r["n_events"] == 1 for r in out)


def test_threshold_episodes_whole_run_and_entity_isolation(spark):
    from timeseriesflattener_spark.operators.intervals import threshold_episodes

    df = _ev(spark, [(1, 0, 20), (1, 10, 30), (2, 5, 50)])
    out = {r["entity"]: r for r in threshold_episodes(df, F.col("value") > 15).collect()}
    assert out[1]["n_events"] == 2 and float(out[1]["peak"]) == 30.0
    assert out[2]["n_events"] == 1 and float(out[2]["peak"]) == 50.0


def test_threshold_episodes_partition_invariant(spark):
    from timeseriesflattener_spark.operators.intervals import threshold_episodes

    rows = [(e, m, float((e * 13 + m * 7) % 29)) for e in (1, 2, 3) for m in range(0, 300, 10)]
    df = _ev(spark, rows)
    cond = F.col("value") > 14
    a = sorted(map(str, threshold_episodes(df, cond).collect()))
    b = sorted(map(str, threshold_episodes(df.repartition(7), cond).collect()))
    assert a == b


def test_ewma_null_timestamp_gets_null_and_contributes_nothing(spark):
    """A NULL-ts row has no position in time: ewma NULL, history
    unaffected (no int64 NaT wraparound)."""
    data = [
        (0, 1, T0, 10.0),
        (1, 1, None, 99.0),
        (2, 1, T0 + dt.timedelta(hours=1), 30.0),
    ]
    df = spark.createDataFrame(data, ["event_id", "user_id", "ts", "value"])
    got = {
        r["event_id"]: (None if r["ewma"] is None else float(r["ewma"]))
        for r in ewma(df, dt.timedelta(hours=1)).collect()
    }
    assert got[1] is None
    assert got[0] == pytest.approx(10.0)
    assert got[2] == pytest.approx((10 * 0.5 + 30) / 1.5)


def test_bucket_quantiles_rendered_name_collision_raises(spark):
    from timeseriesflattener_spark.operators.rolling import bucket_quantiles

    df = _ev(spark, [(1, 0, 1)])
    with pytest.raises(ValueError, match="colliding column names"):
        bucket_quantiles(
            df, dt.timedelta(hours=1), qs=(0.123456789012, 0.123456789013)
        )


# --------------------------------------------------------------- interval_union


def test_interval_union_hand_computed(spark):
    """A: [0,10) + [5,20) merge; [20,30) touches and merges; [40,50)
    is a new island. B is isolated from A."""
    import datetime as dt

    from timeseriesflattener_spark.operators.intervals import interval_union

    t0 = dt.datetime(2024, 1, 1)

    def mk(e, a, b):
        return (e, t0 + dt.timedelta(minutes=a), t0 + dt.timedelta(minutes=b))

    df = spark.createDataFrame(
        [mk("A", 0, 10), mk("A", 5, 20), mk("A", 20, 30), mk("A", 40, 50),
         mk("B", 0, 100)],
        "user_id string, start_ts timestamp, end_ts timestamp",
    )
    out = {
        (r["entity"], r["start_ts"]): (r["end_ts"], r["n_intervals"],
                                       float(r["covered_secs"]))
        for r in interval_union(df).collect()
    }
    assert out == {
        ("A", t0): (t0 + dt.timedelta(minutes=30), 3, 1800.0),
        ("A", t0 + dt.timedelta(minutes=40)): (
            t0 + dt.timedelta(minutes=50), 1, 600.0),
        ("B", t0): (t0 + dt.timedelta(minutes=100), 1, 6000.0),
    }


def test_interval_union_zero_length_null_and_invariance(spark):
    """A zero-length interval inside a span merges silently; a disjoint
    one forms a zero-coverage island; NULL endpoints drop; result is
    partition-count independent."""
    import datetime as dt

    from timeseriesflattener_spark.operators.intervals import interval_union

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("A", t0, t0 + dt.timedelta(minutes=10)),
        ("A", t0 + dt.timedelta(minutes=5), t0 + dt.timedelta(minutes=5)),
        ("A", t0 + dt.timedelta(minutes=60), t0 + dt.timedelta(minutes=60)),
        ("A", None, t0 + dt.timedelta(minutes=99)),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, start_ts timestamp, end_ts timestamp"
    )
    got = sorted(
        (r["start_ts"], r["end_ts"], r["n_intervals"], float(r["covered_secs"]))
        for r in interval_union(df).collect()
    )
    assert got == [
        (t0, t0 + dt.timedelta(minutes=10), 2, 600.0),
        (t0 + dt.timedelta(minutes=60), t0 + dt.timedelta(minutes=60), 1, 0.0),
    ]
    again = sorted(
        (r["start_ts"], r["end_ts"], r["n_intervals"], float(r["covered_secs"]))
        for r in interval_union(df.repartition(5)).collect()
    )
    assert got == again


def test_interval_union_plan_one_exchange(spark):
    import datetime as dt

    from timeseriesflattener_spark.operators.intervals import interval_union

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("A", t0, t0 + dt.timedelta(minutes=1))],
        "user_id string, start_ts timestamp, end_ts timestamp",
    )
    plan = (
        interval_union(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # the running-max + island cumsum share one entity exchange and one
    # sort, and the (entity, island) groupBy reuses that partitioning
    # (hashpartitioning(entity) clusters any (entity, *) grouping):
    # ONE exchange in the whole plan
    assert plan.count("Exchange") == 1
    assert plan.count("Sort [") == 1
