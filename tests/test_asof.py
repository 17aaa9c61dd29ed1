"""As-of join (union+window, no join fan-out): goldens, tolerance,
tie semantics, plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriesflattener_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1)),
            (1, dt.datetime(2024, 1, 10)),
            (2, dt.datetime(2024, 1, 5)),
        ],
        "entity_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 3), 10.0),
            (1, dt.datetime(2024, 1, 10), 20.0),
            (3, dt.datetime(2024, 1, 1), 9.0),
        ],
        "entity_id int, ts timestamp, value double",
    )
    return left, right


def test_asof_goldens(spark):
    left, right = _frames(spark)
    got = {
        (r["entity_id"], r["ts"]): (r["value_asof"], r["ts_asof"])
        for r in asof_join(left, right).collect()
    }
    # before any right row -> null; exact-ts match visible; absent entity -> null
    assert got[(1, dt.datetime(2024, 1, 1))] == (None, None)
    assert got[(1, dt.datetime(2024, 1, 10))] == (20.0, dt.datetime(2024, 1, 10))
    assert got[(2, dt.datetime(2024, 1, 5))] == (None, None)


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    got = {
        (r["entity_id"], r["ts"]): r["value_asof"]
        for r in asof_join(left, right, tolerance=dt.timedelta(days=2)).collect()
    }
    # Jan 10 match is exact (age 0) -> kept; a stale carry nulls out
    assert got[(1, dt.datetime(2024, 1, 10))] == 20.0
    left2 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 8))], "entity_id int, ts timestamp"
    )
    got2 = asof_join(left2, right, tolerance=dt.timedelta(days=2)).collect()[0]
    assert got2["value_asof"] is None  # latest right (Jan 3) is 5 days stale
    got3 = asof_join(left2, right, tolerance=dt.timedelta(days=5)).collect()[0]
    assert got3["value_asof"] == 10.0


def test_asof_plan_is_join_free(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan  # union + window only
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_directions(spark):
    """forward = earliest right at/after; nearest = closer side,
    backward wins exact ties (pandas merge_asof semantics)."""
    left = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 5)),
            (1, dt.datetime(2024, 1, 10)),
            (1, dt.datetime(2024, 1, 20)),
        ],
        "entity_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 3), 10.0),
            (1, dt.datetime(2024, 1, 10), 20.0),
            (1, dt.datetime(2024, 1, 12), 30.0),
        ],
        "entity_id int, ts timestamp, value double",
    )

    def run(direction, **kw):
        return {
            r["ts"].day: r["value_asof"]
            for r in asof_join(left, right, direction=direction, **kw).collect()
        }

    assert run("backward") == {5: 10.0, 10: 20.0, 20: 30.0}
    assert run("forward") == {5: 20.0, 10: 20.0, 20: None}
    # nearest: day 5 -> Jan 3 (2d back) beats Jan 10 (5d fwd); day 20 -> Jan 12
    assert run("nearest") == {5: 10.0, 10: 20.0, 20: 30.0}
    # forward tolerance: day 5 -> Jan 10 is 5 days ahead, too stale at 2d
    assert run("forward", tolerance=dt.timedelta(days=2)) == {
        5: None,
        10: 20.0,
        20: None,
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown direction"):
        asof_join(left, right, direction="sideways")


def test_asof_join_preserves_string_payload(spark):
    """The canonical 'state as of' use: a STRING config column rides
    through unchanged (pandas merge_asof preserves dtype; the old
    implementation cast to double -> every match looked unmatched)."""
    import datetime as dt

    from timeseriesflattener_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 5)), (1, dt.datetime(2024, 1, 1)),
         (2, dt.datetime(2024, 1, 5))],
        "entity_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2), "cfg-a", 1.5),
         (1, dt.datetime(2024, 1, 4), "cfg-b", 2.5)],
        "entity_id long, ts timestamp, config string, score double",
    )
    out = asof_join(left, right, value_cols=["config", "score"])
    assert dict(out.dtypes)["config_asof"] == "string"
    rows = {(r["entity_id"], r["ts"]): r for r in out.collect()}
    assert rows[(1, dt.datetime(2024, 1, 5))]["config_asof"] == "cfg-b"
    assert rows[(1, dt.datetime(2024, 1, 5))]["score_asof"] == 2.5
    assert rows[(1, dt.datetime(2024, 1, 1))]["config_asof"] is None
    assert rows[(2, dt.datetime(2024, 1, 5))]["config_asof"] is None
    # nearest direction carries strings too
    near = asof_join(left, right, value_cols=["config"], direction="nearest")
    nrows = {(r["entity_id"], r["ts"]): r for r in near.collect()}
    assert nrows[(1, dt.datetime(2024, 1, 1))]["config_asof"] == "cfg-a"


def test_asof_join_unknown_value_col_raises(spark):
    import datetime as dt

    import pytest as _pt

    from timeseriesflattener_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, dt.datetime(2024, 1, 5))], "entity_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2), 1.0)], "entity_id long, ts timestamp, value double"
    )
    with _pt.raises(ValueError, match="value_cols"):
        asof_join(left, right, value_cols=["nope"])


def test_asof_join_multi_key(spark):
    """entity_col accepts a list (pandas merge_asof by=[...] parity):
    matches require BOTH keys equal."""
    import datetime as dt

    from timeseriesflattener_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "x", dt.datetime(2024, 1, 5)), (1, "y", dt.datetime(2024, 1, 5))],
        "user long, device string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, "x", dt.datetime(2024, 1, 2), 10.0),
         (1, "y", dt.datetime(2024, 1, 3), 20.0)],
        "user long, device string, ts timestamp, value double",
    )
    out = asof_join(left, right, entity_col=["user", "device"])
    rows = {(r["user"], r["device"]): r["value_asof"] for r in out.collect()}
    assert rows == {(1, "x"): 10.0, (1, "y"): 20.0}
    # nearest works across the multi-key path too
    near = asof_join(left, right, entity_col=["user", "device"], direction="nearest")
    nrows = {(r["user"], r["device"]): r["value_asof"] for r in near.collect()}
    assert nrows == rows
