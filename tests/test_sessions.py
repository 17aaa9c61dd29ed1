"""Gap-based sessionization goldens + plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriesflattener_spark.operators.sessions import session_stats, sessionize


def _df(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")


def test_sessionize_goldens(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = _df(
        spark,
        [
            ("a", 1, t0),
            ("a", 2, t0 + dt.timedelta(minutes=30)),   # gap == 30m: SAME session
            ("a", 3, t0 + dt.timedelta(minutes=60, seconds=1)),  # 30m1s: NEW
            ("b", 1, t0),
        ],
    )
    got = {
        (r.conv_id, r.turn_idx): r.session_id
        for r in sessionize(df, dt.timedelta(minutes=30)).collect()
    }
    assert got == {("a", 1): 0, ("a", 2): 0, ("a", 3): 1, ("b", 1): 0}


def test_sessionize_tie_order_by_turn_idx(spark):
    """Same-timestamp turns never open a session regardless of order."""
    t0 = dt.datetime(2024, 1, 1)
    df = _df(spark, [("a", 2, t0), ("a", 1, t0), ("a", 3, t0 + dt.timedelta(hours=2))])
    out = sessionize(df, dt.timedelta(minutes=30))
    got = {r.turn_idx: r.session_id for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1}


def test_session_stats(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = _df(spark, [("a", 1, t0), ("a", 2, t0 + dt.timedelta(minutes=5)),
                     ("a", 3, t0 + dt.timedelta(hours=3))])
    stats = {
        (r.conv_id, r.session_id): (r.n_events, r.duration_micros)
        for r in session_stats(sessionize(df, dt.timedelta(minutes=30))).collect()
    }
    assert stats == {("a", 0): (2, 300_000_000), ("a", 1): (1, 0)}


def test_sessionize_plan_single_exchange(spark):
    """Both windows share the entity partitioning: ONE exchange total."""
    t0 = dt.datetime(2024, 1, 1)
    df = _df(spark, [("a", 1, t0)])
    plan = (
        sessionize(df, dt.timedelta(minutes=30))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
