"""DDSketch-style tier quantiles: relative-error bound, merge-equals-
direct, and the zero/negative bucket paths."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F

from timeseriesflattener_spark.plans.sketch import (
    GAMMA,
    partial_sketch,
    quantiles_from_sketch,
    rollup_sketch,
)

REL_ERR = (GAMMA - 1) / (GAMMA + 1)


def _events(spark, values, t0=dt.datetime(2024, 1, 1)):
    rows = [
        ("c", t0 + dt.timedelta(seconds=7 * i), float(v)) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "conv_id string, ts timestamp, value double")


def test_quantile_relative_error_bound(spark):
    rng = np.random.default_rng(3)
    vals = np.exp(rng.normal(2.0, 1.5, 4000))  # heavy-tailed positives
    df = _events(spark, vals)
    p = partial_sketch(df, "value", tier="1d")
    q = quantiles_from_sketch(p, ps=(0.5, 0.95, 0.99)).collect()[0]
    for tag, quant in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
        exact = float(np.quantile(vals, quant, method="inverted_cdf"))
        est = q[tag]
        assert abs(est - exact) <= REL_ERR * exact * 1.0001 + 1e-12, (tag, est, exact)


def test_rollup_merge_equals_direct(spark):
    rng = np.random.default_rng(4)
    vals = rng.uniform(0.01, 500.0, 3000)
    df = _events(spark, vals)
    via_1m = rollup_sketch(partial_sketch(df, "value", tier="1m"), "1h")
    direct = partial_sketch(df, "value", tier="1h")
    a = {(r["conv_id"], r["bucket_start"], r["bin"]): r["n"] for r in via_1m.collect()}
    b = {(r["conv_id"], r["bucket_start"], r["bin"]): r["n"] for r in direct.collect()}
    assert a == b


def test_zero_and_negative_bins(spark):
    df = _events(spark, [0.0, -10.0, -10.0, 5.0])
    p = partial_sketch(df, "value", tier="1d")
    q = quantiles_from_sketch(p, ps=(0.5,)).collect()[0]
    # sorted: -10, -10, 0, 5 -> p50 = 2nd value = -10 (within rel err)
    assert abs(q["p50"] - (-10.0)) <= REL_ERR * 10.0 * 1.0001
