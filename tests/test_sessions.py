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


def test_session_window_stats_matches_sessionize(spark):
    """The built-in session_window formulation equals lag+cumsum
    sessionize + session_stats — including the exact-gap boundary
    (an event at exactly `gap` after its predecessor stays in-session)."""
    import datetime as dt

    from timeseriesflattener_spark.operators.sessions import (
        session_stats,
        session_window_stats,
        sessionize,
    )
    from timeseriesflattener_spark.sources.transcripts import (
        derive_channels,
        synthesize_transcripts,
    )

    ch = derive_channels(
        synthesize_transcripts(spark, n_conversations=30, avg_turns=15, seed=5)
    )
    gap = dt.timedelta(minutes=30)
    a = {
        (r["conv_id"], r["session_id"]): (
            r["session_start"], r["session_end"], r["duration_micros"], r["n_events"]
        )
        for r in session_stats(sessionize(ch, gap)).collect()
    }
    b = {
        (r["conv_id"], r["session_id"]): (
            r["session_start"], r["session_end"], r["duration_micros"], r["n_events"]
        )
        for r in session_window_stats(ch, gap).collect()
    }
    assert a == b

    # boundary golden: second event EXACTLY gap after the first -> one session
    base = dt.datetime(2025, 1, 1)
    edge = spark.createDataFrame(
        [("c", 0, base), ("c", 1, base + gap), ("c", 2, base + gap * 2 + dt.timedelta(microseconds=1))],
        "conv_id string, turn_idx int, ts timestamp",
    )
    got = {r["session_id"]: r["n_events"] for r in session_window_stats(edge, gap).collect()}
    assert got == {0: 2, 1: 1}


# -------------------------------------------------- conversation_shape


def _shape_df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )


def test_conversation_shape_golden(spark):
    from timeseriesflattener_spark.operators.sessions import conversation_shape

    t0 = dt.datetime(2024, 1, 1)
    df = _shape_df(
        spark,
        [
            ("a", 0, "user", t0),
            ("a", 1, "assistant", t0 + dt.timedelta(seconds=10)),
            ("a", 2, "assistant", t0 + dt.timedelta(seconds=70)),  # repeat + max gap
            ("a", 3, "user", t0 + dt.timedelta(seconds=75)),
            ("b", 0, "user", t0),  # single-turn conversation
        ],
    )
    got = {
        r["conv_id"]: r.asDict()
        for r in conversation_shape(df, type_col="role").collect()
    }
    a = got["a"]
    assert a["n_events"] == 4 and a["n_types"] == 2
    assert a["span_us"] == 75_000_000
    assert a["max_gap_us"] == 60_000_000
    assert a["n_repeats"] == 1
    b = got["b"]
    assert b["n_events"] == 1 and b["n_types"] == 1
    assert b["span_us"] == 0 and b["max_gap_us"] == 0 and b["n_repeats"] == 0


def test_conversation_shape_tie_break_by_order_col(spark):
    """Equal timestamps: turn_idx decides adjacency, so the repeat count
    is deterministic under any partitioning."""
    from timeseriesflattener_spark.operators.sessions import conversation_shape

    t0 = dt.datetime(2024, 1, 1)
    df = _shape_df(
        spark,
        [
            ("a", 2, "user", t0),
            ("a", 0, "user", t0),
            ("a", 1, "assistant", t0),
        ],
    ).repartition(4)
    row = conversation_shape(df, type_col="role").first()
    # order by turn_idx: user, assistant, user -> zero repeats
    assert row["n_repeats"] == 0 and row["n_events"] == 3


def test_conversation_shape_single_exchange(spark):
    """The lag window and the groupBy share one entity exchange."""
    from timeseriesflattener_spark.operators.sessions import conversation_shape

    df = _shape_df(spark, [("a", 0, "user", dt.datetime(2024, 1, 1))])
    plan = (
        conversation_shape(df, type_col="role")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
