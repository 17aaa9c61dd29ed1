"""Funnel + cohort retention operators (operators/events.py).

Goldens are hand-computed; the randomized funnel differential checks the
one-pass JVM scan against a straightforward Python min-chain reference;
plan pins assert the one-exchange / no-window shapes the docstrings
promise."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark.operators.events import (
    cohort_retention,
    funnel,
    funnel_counts,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
STEPS = ["view", "click", "purchase"]


def _ev(spark, rows):
    """rows: (entity, minutes_from_T0, event_type)."""
    return spark.createDataFrame(
        [(e, T0 + dt.timedelta(minutes=m), y) for e, m, y in rows],
        ["user_id", "ts", "event_type"],
    )


# --------------------------------------------------------------------- funnel


def test_funnel_hand_computed(spark):
    df = _ev(spark, [
        ("A", 0, "view"), ("A", 1, "click"), ("A", 2, "purchase"),
        # click BEFORE the anchor view never counts
        ("B", 0, "click"), ("B", 1, "view"),
        # skipping a step stops the chain
        ("C", 0, "view"), ("C", 5, "purchase"),
        # equal-ts click is not strictly after the view; the later
        # click is outside within=1h
        ("D", 0, "view"), ("D", 0, "click"), ("D", 120, "click"),
        # never performs step 1 -> no row at all
        ("E", 0, "purchase"),
    ])
    out = {
        r["user_id"]: r
        for r in funnel(df, STEPS, within=dt.timedelta(hours=1)).collect()
    }
    assert set(out) == {"A", "B", "C", "D"}
    assert out["A"]["steps_completed"] == 3
    assert out["A"]["ts_step1"] == T0
    assert out["A"]["ts_step2"] == T0 + dt.timedelta(minutes=1)
    assert out["A"]["ts_step3"] == T0 + dt.timedelta(minutes=2)
    for e in "BCD":
        assert out[e]["steps_completed"] == 1
        assert out[e]["ts_step2"] is None and out[e]["ts_step3"] is None
    assert out["B"]["ts_step1"] == T0 + dt.timedelta(minutes=1)


def test_funnel_within_boundary_inclusive(spark):
    """An event landing EXACTLY `within` after the anchor still counts
    (<=), one microsecond past does not."""
    df = _ev(spark, [("A", 0, "view"), ("A", 60, "click")])
    out = funnel(df, ["view", "click"], within=dt.timedelta(hours=1)).collect()
    assert out[0]["steps_completed"] == 2
    df2 = spark.createDataFrame(
        [("A", T0, "view"),
         ("A", T0 + dt.timedelta(hours=1, microseconds=1), "click")],
        ["user_id", "ts", "event_type"],
    )
    out2 = funnel(df2, ["view", "click"], within=dt.timedelta(hours=1)).collect()
    assert out2[0]["steps_completed"] == 1


def test_funnel_anchored_semantics(spark):
    """The documented divergence from sliding-window funnels: the chain
    anchors at the EARLIEST step-1 event, so a completion that only
    works from a later anchor does not count."""
    df = _ev(spark, [
        ("A", 0, "view"),          # anchor; click at 120 is outside 1h
        ("A", 115, "view"),        # a later anchor WOULD complete...
        ("A", 120, "click"),       # ...but anchored semantics say no
    ])
    out = funnel(df, ["view", "click"], within=dt.timedelta(hours=1)).collect()
    assert out[0]["steps_completed"] == 1
    assert out[0]["ts_step1"] == T0


def test_funnel_without_within_and_repeated_step(spark):
    """No `within` disables the horizon; a repeated step type needs a
    strictly later second occurrence."""
    df = _ev(spark, [
        ("A", 0, "view"), ("A", 0, "view"), ("A", 7, "view"),
        ("B", 3, "view"),
    ])
    out = {r["user_id"]: r for r in funnel(df, ["view", "view"]).collect()}
    assert out["A"]["steps_completed"] == 2
    assert out["A"]["ts_step2"] == T0 + dt.timedelta(minutes=7)
    assert out["B"]["steps_completed"] == 1


def test_funnel_null_ts_excluded_and_partition_invariance(spark):
    df = _ev(spark, [("A", 0, "view"), ("A", 1, "click")]).unionByName(
        spark.createDataFrame(
            [("A", None, "purchase")],
            "user_id string, ts timestamp, event_type string",
        )
    )
    base = funnel(df, STEPS).collect()
    assert base[0]["steps_completed"] == 2
    again = funnel(df.repartition(7), STEPS).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, again))


def test_funnel_validation(spark):
    df = _ev(spark, [("A", 0, "view")])
    with pytest.raises(ValueError, match="at least one step"):
        funnel(df, [])
    with pytest.raises(ValueError, match="within must be positive"):
        funnel(df, STEPS, within=dt.timedelta(0))


def _python_funnel(events, steps, within=None):
    """Reference min-chain: events = [(ts_minutes, type)]."""
    hits = []
    for t, y in sorted(events):
        n = len(hits)
        if n >= len(steps):
            break
        if y != steps[n]:
            continue
        if n > 0 and not t > hits[-1]:
            continue
        if within is not None and n > 0 and t - hits[0] > within:
            continue
        hits.append(t)
    return hits


def test_funnel_randomized_differential(spark):
    """200 random entities x random event streams vs the Python
    reference scan, with and without a horizon."""
    rng = random.Random(42)
    types = STEPS + ["signup", "error"]
    rows, expect_plain, expect_within = [], {}, {}
    for i in range(200):
        e = f"u{i}"
        evs = [
            (rng.randrange(0, 500), rng.choice(types))
            for _ in range(rng.randrange(1, 12))
        ]
        rows += [(e, m, y) for m, y in evs]
        fevs = [(m, y) for m, y in evs if y in STEPS]
        expect_plain[e] = _python_funnel(fevs, STEPS)
        expect_within[e] = _python_funnel(fevs, STEPS, within=60)
    df = _ev(spark, rows)
    for within, expect in [
        (None, expect_plain),
        (dt.timedelta(minutes=60), expect_within),
    ]:
        got = {
            r["user_id"]: r
            for r in funnel(df, STEPS, within=within).collect()
        }
        for e, hits in expect.items():
            if not hits:
                assert e not in got
                continue
            r = got[e]
            assert r["steps_completed"] == len(hits), (e, within)
            for j, m in enumerate(hits):
                assert r[f"ts_step{j + 1}"] == T0 + dt.timedelta(minutes=m)


def test_funnel_counts_matches_detail(spark):
    df = _ev(spark, [
        ("A", 0, "view"), ("A", 1, "click"), ("A", 2, "purchase"),
        ("B", 0, "view"), ("B", 1, "click"),
        ("C", 0, "view"),
        ("D", 0, "click"),
    ])
    rows = {
        r["step"]: r for r in funnel_counts(df, STEPS).collect()
    }
    assert [rows[i]["n_entities"] for i in (1, 2, 3)] == [3, 2, 1]
    assert rows[1]["step_type"] == "view"
    assert rows[2]["conversion"] == pytest.approx(2 / 3)
    assert rows[3]["conversion"] == pytest.approx(1 / 3)
    # every step row renders even when nobody reaches it
    empty = funnel_counts(
        _ev(spark, [("A", 0, "signup")]), STEPS
    ).collect()
    assert [r["n_entities"] for r in sorted(empty, key=lambda r: r["step"])] == [0, 0, 0]


def test_funnel_plan_single_exchange_no_window(spark):
    """One groupBy(entity) aggregate, no Window/Sort nodes: the scan is
    a catalyst expression, not a per-step window or join chain."""
    df = _ev(spark, [("A", 0, "view"), ("B", 1, "click")])
    plan = (
        funnel(df, STEPS, within=dt.timedelta(hours=1))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange") == 1
    assert "Window [" not in plan
    assert "Join" not in plan


# ----------------------------------------------------------- cohort_retention


def test_cohort_retention_hand_computed(spark):
    """u1,u2 land in the 7d grid cohort containing 2024-01-01
    (2023-12-28 on the global epoch-aligned grid); u3 in the next.
    u1 active periods {0,1}, u2 {0,2}, u3 {0}."""
    rows = [
        ("u1", T0), ("u1", T0 + dt.timedelta(days=8)),
        ("u2", T0 + dt.timedelta(days=1)), ("u2", T0 + dt.timedelta(days=15)),
        ("u3", T0 + dt.timedelta(days=9)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        (r["cohort"], r["period"]): r
        for r in cohort_retention(df, dt.timedelta(days=7)).collect()
    }
    c0 = dt.datetime(2023, 12, 28)
    c1 = dt.datetime(2024, 1, 4)
    assert set(out) == {(c0, 0), (c0, 1), (c0, 2), (c1, 0)}
    assert out[(c0, 0)]["n_active"] == 2 and out[(c0, 0)]["n_cohort"] == 2
    assert out[(c0, 0)]["retention"] == 1.0
    assert out[(c0, 1)]["n_active"] == 1
    assert out[(c0, 1)]["retention"] == 0.5
    assert out[(c0, 2)]["n_active"] == 1
    assert out[(c1, 0)]["n_active"] == 1 and out[(c1, 0)]["n_cohort"] == 1


def test_cohort_retention_period_width_and_max_periods(spark):
    """Daily periods inside weekly cohorts; max_periods clips."""
    rows = [
        ("u1", T0), ("u1", T0 + dt.timedelta(days=2)),
        ("u1", T0 + dt.timedelta(days=30)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = cohort_retention(
        df, dt.timedelta(days=7), period_width=dt.timedelta(days=1),
        max_periods=10,
    ).collect()
    # first event 2024-01-01 -> cohort 2023-12-28; daily periods measure
    # from the cohort floor: day-0 event is period 4, +2d is period 6;
    # +30d (period 34) is clipped by max_periods=10
    periods = sorted(r["period"] for r in out)
    assert periods == [4, 6]
    assert all(r["n_cohort"] == 1 for r in out)


def test_cohort_retention_null_ts_and_dedup(spark):
    """NULL ts rows are dropped; multiple events in one period count the
    entity once."""
    rows = [
        ("u1", T0), ("u1", T0 + dt.timedelta(hours=1)),
        ("u1", None),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = cohort_retention(df, dt.timedelta(days=7)).collect()
    assert len(out) == 1
    assert out[0]["n_active"] == 1 and out[0]["period"] == 0


def test_cohort_retention_validation(spark):
    df = spark.createDataFrame([("u1", T0)], ["user_id", "ts"])
    with pytest.raises(ValueError, match="cohort_width"):
        cohort_retention(df, dt.timedelta(0))
    with pytest.raises(ValueError, match="period_width"):
        cohort_retention(df, dt.timedelta(days=7), period_width=dt.timedelta(0))
    with pytest.raises(ValueError, match="max_periods"):
        cohort_retention(df, dt.timedelta(days=7), max_periods=0)


def test_cohort_retention_plan_no_window_broadcast_sizes(spark):
    """No Window nodes; the cohort-sizes join is a broadcast."""
    df = spark.createDataFrame([("u1", T0), ("u2", T0)], ["user_id", "ts"])
    plan = (
        cohort_retention(df, dt.timedelta(days=7))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Window [" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------- event_transitions


def test_event_transitions_hand_computed(spark):
    from timeseriesflattener_spark.operators.events import event_transitions

    df = _ev(spark, [
        ("A", 0, "view"), ("A", 1, "click"), ("A", 2, "view"),
        ("B", 0, "view"), ("B", 1, "view"),
    ])
    out = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transitions(df).collect()
    }
    # from view: ->click (A), ->view (B) ; from click: ->view (A)
    assert out == {
        ("view", "click"): (1, 0.5),
        ("view", "view"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }


def test_event_transitions_terminal_and_tie_order(spark):
    from timeseriesflattener_spark.operators.events import event_transitions

    # equal timestamps order by the type string (click < view), so the
    # pair is (click -> view); terminal rows carry NULL to_type
    df = _ev(spark, [("A", 0, "view"), ("A", 0, "click")])
    out = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in event_transitions(df, include_terminal=True).collect()
    }
    assert out == {("click", "view"): 1, ("view", None): 1}
    # with an explicit order column the tie follows it instead
    df2 = spark.createDataFrame(
        [("A", T0, "view", 1), ("A", T0, "click", 2)],
        "user_id string, ts timestamp, event_type string, event_id long",
    )
    out2 = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in event_transitions(df2, order_col="event_id").collect()
    }
    assert out2 == {("view", "click"): 1}


def test_event_transitions_plan_one_exchange_broadcast(spark):
    from timeseriesflattener_spark.operators.events import event_transitions

    df = _ev(spark, [("A", 0, "view"), ("A", 1, "click")])
    out = event_transitions(df)
    out.collect()  # AQE must finalize: the denom branch reuses the
    # count exchange (ReusedExchange), so the lead window runs ONCE
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Window [") == 1
    assert "ReusedExchange" in plan
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------- funnel_reached


def test_funnel_reached_sliding_vs_anchored(spark):
    """The sliding scan credits a completion anchored at a LATER step-1
    event (which the anchored funnel deliberately misses), enforces
    strict t_j > t_{j-1} at equal timestamps, and never chains
    backwards."""
    from timeseriesflattener_spark.operators.events import funnel_reached

    df = _ev(spark, [
        ("A", 0, "view"), ("A", 115, "view"), ("A", 120, "click"),
        ("B", 0, "view"), ("B", 1, "click"), ("B", 2, "purchase"),
        ("C", 0, "view"), ("C", 0, "click"),
        ("D", 0, "purchase"), ("D", 1, "view"),
        ("E", 0, "click"), ("E", 1, "purchase"),
    ])
    W = dt.timedelta(hours=1)
    r = {
        x["user_id"]: x["steps_reached"]
        for x in funnel_reached(df, STEPS, within=W).collect()
    }
    assert r == {"A": 2, "B": 3, "C": 1, "D": 1}
    a = {
        x["user_id"]: x["steps_completed"]
        for x in funnel(df, STEPS, within=W).collect()
    }
    assert a["A"] == 1  # the documented anchored-semantics divergence


def _python_reach(events, steps, within=None):
    """Brute-force EXISTS reference: max j with a strictly-increasing
    typed chain within `within` of its own anchor."""
    import itertools

    evs = sorted(events)
    best = 0
    for j in range(len(steps), 0, -1):
        for combo in itertools.combinations(evs, j):
            ts = [t for t, _ in combo]
            ys = [y for _, y in combo]
            if ys != steps[:j]:
                continue
            if any(ts[i + 1] <= ts[i] for i in range(j - 1)):
                continue
            if within is not None and ts[-1] - ts[0] > within:
                continue
            best = j
            break
        if best:
            break
    return best


def test_funnel_reached_randomized_differential(spark):
    """150 random entities vs the brute-force EXISTS reference, with
    and without a horizon — the greedy max-anchor DP must agree with
    exhaustive chain enumeration."""
    rng = random.Random(11)
    types = STEPS + ["signup"]
    rows, exp_plain, exp_w = [], {}, {}
    for i in range(150):
        e = f"u{i}"
        evs = [
            (rng.randrange(0, 300), rng.choice(types))
            for _ in range(rng.randrange(1, 10))
        ]
        rows += [(e, m, y) for m, y in evs]
        fevs = [(m, y) for m, y in evs if y in STEPS]
        exp_plain[e] = _python_reach(fevs, STEPS)
        exp_w[e] = _python_reach(fevs, STEPS, within=45)
    df = _ev(spark, rows)
    from timeseriesflattener_spark.operators.events import funnel_reached

    for within, expect in [
        (None, exp_plain),
        (dt.timedelta(minutes=45), exp_w),
    ]:
        got = {
            r["user_id"]: r["steps_reached"]
            for r in funnel_reached(df, STEPS, within=within).collect()
        }
        for e, want in expect.items():
            assert got.get(e, 0) == want, (e, within, got.get(e, 0), want)


def test_funnel_reached_validation_and_invariance(spark):
    from timeseriesflattener_spark.operators.events import funnel_reached

    df = _ev(spark, [("A", 0, "view"), ("A", 1, "click")])
    with pytest.raises(ValueError, match="at least one step"):
        funnel_reached(df, [])
    with pytest.raises(ValueError, match="within must be positive"):
        funnel_reached(df, STEPS, within=dt.timedelta(0))
    base = sorted(map(tuple, funnel_reached(df, STEPS).collect()))
    again = sorted(
        map(tuple, funnel_reached(df.repartition(5), STEPS).collect())
    )
    assert base == again == [("A", 2)]


def test_funnel_reached_repeated_step_types(spark):
    """A repeated step type is creditable at EVERY position it occupies
    (regression: array_position credited only the first), and sliding
    reach is never below anchored completion."""
    from timeseriesflattener_spark.operators.events import funnel_reached

    df = _ev(spark, [
        ("A", 0, "view"), ("A", 1, "view"),
        ("B", 0, "view"),
        # C: view,view,click with a too-early first view under within
        ("C", 0, "view"), ("C", 115, "view"), ("C", 116, "view"),
        ("C", 120, "click"),
    ])
    r = {
        x["user_id"]: x["steps_reached"]
        for x in funnel_reached(df, ["view", "view"]).collect()
    }
    assert r == {"A": 2, "B": 1, "C": 2}
    r3 = {
        x["user_id"]: x["steps_reached"]
        for x in funnel_reached(
            df, ["view", "view", "click"], within=dt.timedelta(hours=1)
        ).collect()
    }
    # C: chain 115 -> 116 -> 120 fits in 1h (the 0-anchored one doesn't)
    assert r3["C"] == 3 and r3["A"] == 2
    # randomized duplicate-step differential vs brute force
    rng = random.Random(3)
    rows = []
    expect = {}
    dup_steps = ["view", "click", "view"]
    for i in range(80):
        e = f"d{i}"
        evs = [
            (rng.randrange(0, 120), rng.choice(["view", "click"]))
            for _ in range(rng.randrange(1, 9))
        ]
        rows += [(e, m, y) for m, y in evs]
        expect[e] = _python_reach(sorted(evs), dup_steps, within=30)
    got = {
        x["user_id"]: x["steps_reached"]
        for x in funnel_reached(
            _ev(spark, rows), dup_steps, within=dt.timedelta(minutes=30)
        ).collect()
    }
    for e, want in expect.items():
        assert got.get(e, 0) == want, (e, got.get(e, 0), want)


# ------------------------------------------------- hot-entity cap (skew guard)


def test_funnel_cap_flags_and_lower_bounds(spark):
    """max_events_per_entity keeps the EARLIEST prefix: entity A's
    chain completes inside the prefix (cap changes nothing, flag set);
    entity B's chain extends past it (capped result is the documented
    lower bound); entity C fits under the cap (flag False)."""
    from timeseriesflattener_spark.operators.events import funnel_reached

    rows = (
        # A: full chain in the first 3 events, then noise past the cap
        [("A", 0, "view"), ("A", 1, "click"), ("A", 2, "purchase")]
        + [("A", 10 + i, "view") for i in range(5)]
        # B: 5 views first, the click/purchase only past a cap of 5
        + [("B", i, "view") for i in range(5)]
        + [("B", 6, "click"), ("B", 7, "purchase")]
        # C: tiny, under the cap
        + [("C", 0, "view"), ("C", 1, "click")]
    )
    df = _ev(spark, rows)
    got = {
        r["user_id"]: (r["steps_completed"], r["truncated"])
        for r in funnel(df, STEPS, max_events_per_entity=5).collect()
    }
    assert got["A"] == (3, True)
    assert got["B"] == (1, True)  # lower bound: uncapped would be 3
    assert got["C"] == (2, False)
    un = {
        r["user_id"]: r["steps_completed"]
        for r in funnel(df, STEPS).collect()
    }
    assert un["B"] == 3 and "truncated" not in funnel(df, STEPS).columns
    for e in got:
        assert got[e][0] <= un[e]  # prefix cap can only lower-bound

    reach = {
        r["user_id"]: (r["steps_reached"], r["truncated"])
        for r in funnel_reached(df, STEPS, max_events_per_entity=5).collect()
    }
    assert reach["A"] == (3, True) and reach["C"] == (2, False)
    with pytest.raises(ValueError, match="max_events_per_entity"):
        funnel(df, STEPS, max_events_per_entity=0)


def test_funnel_extreme_skew_single_hot_entity(spark):
    """VERDICT r6 #3: one entity with 200k step-typed events (the bot
    shape). The uncapped scan must still finish (measured: 1e6 events
    in ~17 s / one task on this box — bound committed to BENCH.md) and
    the capped scan must agree when the chain completes in the prefix."""
    from timeseriesflattener_spark.operators.events import funnel_reached

    n = 200_000
    ev = spark.range(n).select(
        F.lit("hot").alias("user_id"),
        F.timestamp_micros(
            F.lit(1704067200000000) + F.col("id") * 1_000_000
        ).alias("ts"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("event_type"),
    )
    full = funnel(ev, STEPS, within=dt.timedelta(days=3)).collect()
    assert len(full) == 1 and full[0]["steps_completed"] == 3
    capped = funnel(
        ev, STEPS, within=dt.timedelta(days=3), max_events_per_entity=10_000
    ).collect()
    assert capped[0]["steps_completed"] == 3 and capped[0]["truncated"]
    assert capped[0]["ts_step3"] == full[0]["ts_step3"]
    r = funnel_reached(
        ev, STEPS, within=dt.timedelta(days=3), max_events_per_entity=10_000
    ).collect()
    assert r[0]["steps_reached"] == 3 and r[0]["truncated"]
