"""Gap-fill goldens: hand-computed LOCF and linear interpolation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark.plans.gapfill import dense_grid, fill_gaps

M = 60_000_000  # 1m in micros


@pytest.fixture()
def points(spark):
    # entity a: buckets 0, 3, 4 with values 10, 40, nan-free 50; b: single bucket
    rows = [
        ("a", 0 * M, 10.0),
        ("a", 3 * M, 40.0),
        ("a", 4 * M, 50.0),
        ("b", 10 * M, 7.0),
    ]
    return spark.createDataFrame(rows, "conv_id string, bucket_start long, v double")


def _vals(df):
    return {
        (r["conv_id"], r["bucket_start"]): (r["v"], r["is_gap"]) for r in df.collect()
    }


def test_dense_grid(spark, points):
    grid = dense_grid(points, "1m")
    got = {(r["conv_id"], r["bucket_start"]) for r in grid.collect()}
    assert got == {("a", i * M) for i in range(5)} | {("b", 10 * M)}


def test_locf(spark, points):
    out = _vals(fill_gaps(points, ["v"], "1m", method="locf"))
    assert out[("a", 0 * M)] == (10.0, False)
    assert out[("a", 1 * M)] == (10.0, True)
    assert out[("a", 2 * M)] == (10.0, True)
    assert out[("a", 3 * M)] == (40.0, False)
    assert out[("a", 4 * M)] == (50.0, False)
    assert out[("b", 10 * M)] == (7.0, False)


def test_linear(spark, points):
    out = _vals(fill_gaps(points, ["v"], "1m", method="linear"))
    assert out[("a", 0 * M)] == (10.0, False)
    assert out[("a", 1 * M)] == (20.0, True)  # 10 + (40-10)*1/3
    assert out[("a", 2 * M)] == (30.0, True)
    assert out[("a", 3 * M)] == (40.0, False)
    assert out[("a", 4 * M)] == (50.0, False)


def test_linear_no_extrapolation(spark):
    rows = [("a", 1 * M, None), ("a", 0 * M, 5.0), ("a", 2 * M, None), ("a", 3 * M, 8.0), ("a", 5 * M, None)]
    pts = spark.createDataFrame(rows, "conv_id string, bucket_start long, v double")
    out = _vals(fill_gaps(pts, ["v"], "1m", method="linear"))
    assert out[("a", 1 * M)][0] == pytest.approx(6.0)
    assert out[("a", 2 * M)][0] == pytest.approx(7.0)
    assert out[("a", 5 * M)][0] is None  # trailing gap: no extrapolation
    # observed-null rows are not gaps (row existed), but do get interpolated
    assert out[("a", 1 * M)][1] is False
