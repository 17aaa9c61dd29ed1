"""Tests for the deterministic distributed synthetic-data generator
(synth.py), mirroring the reference generator's semantics
(``testing/synth_data_generator/synth_col_generators.py:50-144``,
``synth_prediction_times_generator.py:18-75``, ``utils.py:12-34``)
minus its RNG: every assertion here must hold at ANY partitioning."""

from __future__ import annotations

import math
import statistics

import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark import synth

PREDICTORS = [
    {"neg_id": {"column_type": "id"}},
    {"val_int": {"column_type": "uniform_int", "min": 2, "max": 12}},
    {"val_float": {"column_type": "uniform_float", "min": -1.0, "max": 3.0}},
    {"score": {"column_type": "normal", "mean": 5.0, "sd": 2.0}},
    {"ts": {"column_type": "datetime_uniform", "min": 0, "max": 365}},
]


def _collect(df):
    return {r["sample_id"]: r.asDict() for r in df.collect()}


def test_partition_invariance_and_determinism(spark):
    a = synth.generate_synth_frame(
        spark, PREDICTORS, 500, seed="s", num_partitions=1
    )
    b = synth.generate_synth_frame(
        spark, PREDICTORS, 500, seed="s", num_partitions=7
    )
    assert _collect(a) == _collect(b)
    # and a re-run is bit-identical (no RNG state anywhere)
    c = synth.generate_synth_frame(
        spark, PREDICTORS, 500, seed="s", num_partitions=7
    )
    assert _collect(b) == _collect(c)


def test_seed_changes_draws(spark):
    a = _collect(synth.generate_synth_frame(spark, PREDICTORS, 100, seed="s1"))
    b = _collect(synth.generate_synth_frame(spark, PREDICTORS, 100, seed="s2"))
    assert any(
        a[i]["val_float"] != b[i]["val_float"] for i in a
    ), "different seeds must give different draws"


def test_column_families(spark):
    rows = _collect(synth.generate_synth_frame(spark, PREDICTORS, 4000, seed="f"))
    assert len(rows) == 4000
    # id: reference returns -arange (synth_col_generators.py:66-67)
    assert all(r["neg_id"] == -sid for sid, r in rows.items())
    # uniform_int: high-exclusive as np.random.randint
    ints = [r["val_int"] for r in rows.values()]
    assert min(ints) == 2 and max(ints) == 11
    assert len(set(ints)) == 10
    # uniform_float in [min, max), roughly centred
    floats = [r["val_float"] for r in rows.values()]
    assert min(floats) >= -1.0 and max(floats) < 3.0
    assert abs(statistics.mean(floats) - 1.0) < 0.1
    # normal: moments within sampling tolerance
    scores = [r["score"] for r in rows.values()]
    assert abs(statistics.mean(scores) - 5.0) < 0.15
    assert abs(statistics.pstdev(scores) - 2.0) < 0.15
    # datetime_uniform: in range, minute-rounded (reference rounds to
    # "min"), microseconds/seconds zero
    for r in rows.values():
        ts = r["ts"]
        assert ts.year in (1970, 1971)
        assert ts.second == 0 and ts.microsecond == 0


def test_normal_clipping(spark):
    preds = [
        {"score": {"column_type": "normal", "mean": 0.0, "sd": 1.0, "min": 0.0, "max": 1.0}}
    ]
    rows = _collect(synth.generate_synth_frame(spark, preds, 2000, seed="c"))
    vals = [r["score"] for r in rows.values()]
    assert min(vals) == 0.0 and max(vals) == 1.0  # mass clipped to both edges
    assert any(0.0 < v < 1.0 for v in vals)


def test_unknown_column_type_raises(spark):
    with pytest.raises(ValueError, match="Unknown distribution"):
        synth.generate_col("zipf", {})
    with pytest.raises(ValueError, match="n_samples"):
        synth.generate_synth_frame(spark, PREDICTORS, -1)


def test_replace_vals_with_na(spark):
    df = synth.generate_synth_frame(spark, PREDICTORS, 5000, seed="na")
    out = synth.replace_vals_with_na(
        df, 0.2, na_ignore_cols=["ts"], seed="na"
    )
    rows = list(_collect(out).values())
    n = len(rows)
    for col, injected in [
        ("val_int", True), ("val_float", True), ("score", True),
        ("ts", False), ("sample_id", False),
    ]:
        frac = sum(1 for r in rows if r[col] is None) / n
        if injected:
            assert abs(frac - 0.2) < 0.03, (col, frac)
        else:
            assert frac == 0.0, col
    # per-cell independence: the union of nulls across two injected
    # columns must exceed a single column's rate
    both = sum(
        1 for r in rows if r["val_int"] is None and r["val_float"] is None
    ) / n
    assert abs(both - 0.04) < 0.02
    with pytest.raises(ValueError, match="na_prob"):
        synth.replace_vals_with_na(df, 1.5)


def test_outcome_model(spark):
    preds = [
        {"a": {"column_type": "uniform_float", "min": 0.0, "max": 1.0}},
        {"b": {"column_type": "uniform_float", "min": 0.0, "max": 1.0}},
    ]
    df = synth.generate_synth_frame(spark, preds, 6000, seed="o")
    out = synth.create_outcome_values(
        df, "1*a+2*b", noise_mean_sd=(0.0, 0.5), seed="o"
    )
    rows = list(_collect(out).values())
    probs = [r["outcome_prob"] for r in rows]
    assert all(0.0 < p < 1.0 for p in probs)
    # sigmoid of a zero-mean z-score: mean prob ~0.5
    assert abs(statistics.mean(probs) - 0.5) < 0.05
    # the model is DEcreasing in y (reference: 1/(1+exp(y))): higher
    # a+2b => lower probability
    hi = statistics.mean(p for r, p in zip(rows, probs) if r["a"] + 2 * r["b"] > 1.5)
    lo = statistics.mean(p for r, p in zip(rows, probs) if r["a"] + 2 * r["b"] < 1.5)
    assert hi < lo


def test_generate_synth_data_end_to_end(spark):
    df = synth.generate_synth_data(
        spark,
        predictors=PREDICTORS,
        outcome_column_name="outc",
        n_samples=5000,
        logistic_outcome_model="1*val_float+0.5*score",
        na_prob=0.1,
        na_ignore_cols=["neg_id", "ts"],
        prob_outcome=0.08,
        seed="e2e",
    )
    rows = list(_collect(df).values())
    assert len(rows) == 5000
    outc = [r["outc"] for r in rows]
    assert set(outc) <= {0, 1}
    assert all(o is not None for o in outc)  # outcome excluded from NA injection
    rate = sum(outc) / len(outc)
    # P(sigmoid(z + noise) < 0.08) with z~N(0,1), noise~N(0,1):
    # 1 - Phi(ln(11.5)/sqrt(2)) ~= 0.042 — sanity band, not equality
    assert 0.01 < rate < 0.12, rate
    na_rate = sum(1 for r in rows if r["val_int"] is None) / len(rows)
    assert abs(na_rate - 0.1) < 0.03
    assert all(r["ts"] is not None for r in rows)
    # deterministic end-to-end
    again = synth.generate_synth_data(
        spark,
        predictors=PREDICTORS,
        outcome_column_name="outc",
        n_samples=5000,
        logistic_outcome_model="1*val_float+0.5*score",
        na_prob=0.1,
        na_ignore_cols=["neg_id", "ts"],
        prob_outcome=0.08,
        seed="e2e",
    )
    assert _collect(df) == _collect(again)


def test_u01_cross_engine_exact(spark):
    """The documented contract: u01 is bit-identical when recomputed
    from the md5 hex digits in any engine (here: plain Python)."""
    import hashlib

    df = spark.range(0, 50).withColumnRenamed("id", "sample_id")
    got = {
        r["sample_id"]: r["u"]
        for r in df.select(
            "sample_id", synth.u01(F.col("sample_id"), "x:").alias("u")
        ).collect()
    }
    for i in range(50):
        h = hashlib.md5(f"x:{i}".encode()).hexdigest()
        assert got[i] == int(h[:13], 16) / float(1 << 52)


def test_generation_is_one_narrow_stage(spark):
    """Plan shape: no Exchange anywhere in a generated frame — the
    generator must stay a single narrow stage over the id range."""
    df = synth.generate_synth_frame(spark, PREDICTORS, 1000, seed="p")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # outcome path adds exactly the one broadcast of the 1-row stats
    out = synth.create_outcome_values(df, "1*val_float", seed="p")
    plan2 = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan2 or "BroadcastExchange" in plan2
    assert "ShuffleExchange" not in plan2.replace(
        "BroadcastExchange", ""
    ) and "Exchange hashpartitioning" not in plan2


def test_constant_model_mirrors_scipy_nan(spark):
    """sd = 0 (constant model / n_samples=1) must yield NaN probs —
    exactly what scipy.stats.zscore of a constant vector produces —
    and binarise to outcome 0 (np.where(nan < p, 1, 0) == 0), never
    NULL."""
    preds = [{"c": {"column_type": "uniform_int", "min": 5, "max": 6}}]  # constant 5
    df = synth.generate_synth_frame(spark, preds, 20, seed="k")
    probs = [
        r["outcome_prob"]
        for r in synth.create_outcome_values(df, "1*c", seed="k").collect()
    ]
    assert all(p is not None and math.isnan(p) for p in probs)
    out = synth.generate_synth_data(
        spark, preds, "outc", 20, "1*c", na_prob=None, seed="k"
    )
    vals = [r["outc"] for r in out.collect()]
    assert vals == [0] * 20
