"""Z-order layout: key correctness vs a Python bit-interleave reference,
the range-partitioned write contract (disjoint per-file key ranges,
near-square (a, b) tiles), and validation.

Scale rationale under test: at 100 TB a (conv, time) table laid out by
Z-key gives every parquet file a bounded rectangle in both dimensions,
so min/max stats prune on EITHER axis — the property asserted here on
real files, not just on the plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark.operators.layout import apply_zorder_layout, zorder_key


def _py_zkey(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 19723), (65535, 65535)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_zkey(a, b), (a, b)


def test_zorder_key_masks_overflow_and_validates():
    with pytest.raises(ValueError, match="bits"):
        zorder_key(F.col("a"), F.col("b"), bits=0)
    with pytest.raises(ValueError, match="bits"):
        zorder_key(F.col("a"), F.col("b"), bits=32)


def test_zorder_key_overflow_aliases_to_low_bits(spark):
    """Values beyond 2^bits alias onto their low bits (documented
    contract): key(2^bits + x) == key(x)."""
    df = spark.createDataFrame([(5, 9)], "a long, b long")
    base, shifted = df.select(
        zorder_key(F.col("a"), F.col("b"), bits=8).alias("z1"),
        zorder_key(F.col("a") + 256, F.col("b") + 256, bits=8).alias("z2"),
    ).first()
    assert base == shifted


def test_apply_zorder_layout_files_are_disjoint_tiles(spark, tmp_path):
    """After the layout write: per-file zkey ranges are DISJOINT (range
    partitioning) and each file's (a, b) footprint is a small tile —
    max per-file side span well under the global span, which is what
    makes min/max stats prune on both axes."""
    n, n_files = 4096, 8
    df = spark.range(n).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
    )
    out = apply_zorder_layout(
        df, F.col("a"), F.col("b"), n_files=n_files, bits=6, keep_key=True
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan
    path = str(tmp_path / "zorder")
    out.write.parquet(path)

    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("__zkey").alias("zlo"),
            F.max("__zkey").alias("zhi"),
            (F.max("a") - F.min("a")).alias("aspan"),
            (F.max("b") - F.min("b")).alias("bspan"),
        )
        .collect()
    )
    assert len(per_file) == n_files
    ranges = sorted((r["zlo"], r["zhi"]) for r in per_file)
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo, ranges  # disjoint key ranges across files
    # global span is 63 on both axes; 8 z-tiles of a 64x64 grid keep
    # every per-file side span strictly below the full span
    for r in per_file:
        assert r["aspan"] < 63 or r["bspan"] < 63, per_file
    avg_a = sum(r["aspan"] for r in per_file) / n_files
    avg_b = sum(r["bspan"] for r in per_file) / n_files
    assert avg_a < 48 and avg_b < 48, (avg_a, avg_b)


def test_apply_zorder_layout_validates_and_drops_key(spark):
    df = spark.range(4).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError, match="n_files"):
        apply_zorder_layout(df, F.col("a"), F.col("b"), n_files=0)
    out = apply_zorder_layout(df, F.col("a"), F.col("b"), n_files=2)
    assert out.columns == ["a", "b"]
