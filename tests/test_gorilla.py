"""Gorilla chunk codec: hypothesis roundtrip properties + Spark
encode/decode roundtrip + compression sanity (SURVEY.md §5 strategy (c))."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from timeseriesflattener_spark.functions.gorilla import (
    decode_chunks,
    decode_series,
    encode_chunks,
    encode_series,
)
from timeseriesflattener_spark.sources.transcripts import (
    derive_channels,
    synthesize_transcripts,
)


def _roundtrip(ts, vals):
    t2, v2 = decode_series(encode_series(np.asarray(ts, dtype=np.int64), np.asarray(vals)))
    assert list(t2) == list(ts)
    assert len(v2) == len(vals)
    for a, b in zip(v2, vals):
        if math.isnan(b):
            assert math.isnan(a)
        else:
            assert a == b  # bit-exact


def test_roundtrip_basic():
    _roundtrip([0, 60, 120, 185, 250], [1.0, 1.0, 2.5, -3.0, float("nan")])


def test_roundtrip_empty_and_single():
    _roundtrip([], [])
    _roundtrip([123456789], [math.pi])


def test_constant_series_compresses_well():
    n = 10_000
    ts = np.arange(n, dtype=np.int64) * 60_000_000  # perfectly regular
    vals = np.full(n, 42.0)
    blob = encode_series(ts, vals)
    assert len(blob) < n * 16 / 50  # >50x on constant+regular


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        min_size=0,
        max_size=400,
    )
)
def test_roundtrip_property(pairs):
    pairs.sort(key=lambda p: p[0])
    ts = [p[0] for p in pairs]
    vals = [p[1] for p in pairs]
    _roundtrip(ts, vals)


def test_spark_roundtrip(spark):
    t = synthesize_transcripts(spark, n_conversations=12, avg_turns=30, seed=5, span_days=1)
    ch = derive_channels(t).cache()
    chunks = encode_chunks(ch, "text_len", tier="1h").cache()
    assert chunks.count() > 0
    decoded = decode_chunks(chunks, value_col="text_len")

    orig = {
        (r["conv_id"], r["ts"]): r["text_len"]
        for r in ch.select("conv_id", "ts", "text_len").collect()
    }
    got = {(r["conv_id"], r["ts"]): r["text_len"] for r in decoded.collect()}
    assert got == orig

    # compression: chunk bytes well under 16 bytes/point raw
    from pyspark.sql import functions as F

    sizes = chunks.agg(
        F.sum(F.length("chunk")).alias("enc"), F.sum("raw_bytes").alias("raw")
    ).first()
    assert sizes["enc"] < sizes["raw"]


def test_decode_time_range_pruning(spark, tmp_path):
    """time_range decode: values exactly equal the full decode filtered
    to [lo, hi), chunk pruning reaches the parquet scan, and untouched
    chunks are excluded before decoding."""
    import datetime as dt

    from pyspark.sql import functions as F

    from timeseriesflattener_spark.functions.gorilla import decode_chunks, encode_chunks

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c", i, t0 + dt.timedelta(hours=6 * i), float(i)) for i in range(20)
    ]  # 5 day-chunks of 4 points
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp, value double")
    path = str(tmp_path / "chunks")
    encode_chunks(df, "value", tier="1d").write.parquet(path)
    chunks = spark.read.parquet(path)

    lo, hi = t0 + dt.timedelta(days=1, hours=3), t0 + dt.timedelta(days=3)
    pruned = decode_chunks(chunks, time_range=(lo, hi), tier="1d")
    full = decode_chunks(chunks)
    want = {
        (r["conv_id"], r["ts"], r["value"])
        for r in full.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))).collect()
    }
    got = {(r["conv_id"], r["ts"], r["value"]) for r in pruned.collect()}
    assert got == want and len(got) == 7  # 1d03h..3d at 6h cadence

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "chunk_start" in plan.split("PushedFilters")[1][:200]


def test_decode_column_pruning(spark, tmp_path):
    """Codec-level column pruning: values-only and ts-only decodes equal
    the full decode's projections, and combine with time_range trimming
    (which forces ts decoding internally but keeps it out of the output)."""
    import datetime as dt

    from timeseriesflattener_spark.functions.gorilla import decode_chunks, encode_chunks

    t0 = dt.datetime(2024, 1, 1)
    rows = [("c", i, t0 + dt.timedelta(hours=i), float(i) * 1.5) for i in range(30)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp, value double")
    chunks = encode_chunks(df, "value", tier="1d")
    chunks.write.parquet(str(tmp_path / "c"))
    chunks = spark.read.parquet(str(tmp_path / "c"))

    full = decode_chunks(chunks).collect()
    vals_only = decode_chunks(chunks, columns=["conv_id", "value"]).collect()
    ts_only = decode_chunks(chunks, columns=["conv_id", "ts"]).collect()
    assert sorted(r["value"] for r in vals_only) == sorted(r["value"] for r in full)
    assert sorted(r["ts"] for r in ts_only) == sorted(r["ts"] for r in full)
    assert vals_only[0].asDict().keys() == {"conv_id", "value"}

    lo, hi = t0 + dt.timedelta(hours=5), t0 + dt.timedelta(hours=10)
    trimmed = decode_chunks(
        chunks, columns=["conv_id", "value"], time_range=(lo, hi), tier="1d"
    ).collect()
    want = sorted(
        r["value"] for r in full if lo <= r["ts"] < hi
    )
    assert sorted(r["value"] for r in trimmed) == want

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown decode columns"):
        decode_chunks(chunks, columns=["nope"])
