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
