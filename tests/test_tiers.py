"""Checkpoint-resumable tier materialisation: kill mid-run, resume,
assert no recompute and identical output (SURVEY.md §5 strategy (e));
plus retention expiry and the lineage/metrics ledger."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark.plans.tiers import TierStore
from timeseriesflattener_spark.sources.transcripts import (
    derive_channels,
    synthesize_transcripts,
)

VALUE_COLS = ["text_len", "n_tokens", "tool_call"]


@pytest.fixture(scope="module")
def channels(spark):
    t = synthesize_transcripts(spark, n_conversations=30, avg_turns=10, seed=13, span_days=3)
    return derive_channels(t).cache()


def _points_map(store, tier):
    return {
        (r["conv_id"], r["bucket_start"]): tuple(
            r[c] for c in [f"{vc}_mean" for vc in VALUE_COLS]
        )
        for r in store.read_points(tier).collect()
    }


class Boom(Exception):
    pass


def test_kill_resume_no_recompute(spark, channels, tmp_path):
    # one-shot reference run
    ref_store = TierStore(spark, str(tmp_path / "ref"), VALUE_COLS)
    ref_store.materialize(channels)
    ref_points = {t: _points_map(ref_store, t) for t in ("1m", "1h", "1d")}

    # killed run: die after 4 completed units
    seen: list[tuple[str, dt.date]] = []

    def killer(tier, day):
        if len(seen) >= 4:
            raise Boom()
        seen.append((tier, day))

    store = TierStore(spark, str(tmp_path / "resume"), VALUE_COLS, on_unit_start=killer)
    with pytest.raises(Boom):
        store.materialize(channels)
    assert len(store.completed_units()) == 4

    # resume: completed units must NOT be recomputed
    recomputed: list[tuple[str, dt.date]] = []
    store.on_unit_start = lambda tier, day: recomputed.append((tier, day))
    result = store.materialize(channels)
    assert set(result["skipped"]) == set(seen)
    assert not (set(recomputed) & set(seen))

    # identical output to the one-shot run
    for tier in ("1m", "1h", "1d"):
        assert _points_map(store, tier) == ref_points[tier]


def test_ledger_lineage_and_metrics(spark, channels, tmp_path):
    store = TierStore(spark, str(tmp_path / "ledger"), VALUE_COLS)
    store.materialize(channels)
    ledger = store.read_ledger()
    rows = ledger.collect()
    assert all(r["state"] == "done" for r in rows)
    by_tier = {r["tier"]: r for r in rows}
    assert by_tier["1m"]["source"] == "raw"
    assert by_tier["1h"]["source"] == "tier:1m"
    assert by_tier["1d"]["source"] == "tier:1h"
    assert all(r["output_rows"] > 0 and r["wall_s"] > 0 for r in rows)
    # coarser tiers shrink
    sums = (
        ledger.groupBy("tier").agg(F.sum("output_rows").alias("rows")).collect()
    )
    sizes = {r["tier"]: r["rows"] for r in sums}
    assert sizes["1m"] >= sizes["1h"] >= sizes["1d"]


def test_retention_expiry(spark, channels, tmp_path):
    store = TierStore(spark, str(tmp_path / "retention"), VALUE_COLS)
    store.materialize(channels)
    days = sorted({r["day"] for r in store.read_ledger().collect()})
    now = days[-1] + dt.timedelta(days=1)
    removed = store.apply_retention({"1m": 1}, now=now)
    # every 1m partition except the last day(s) within horizon is gone
    assert removed and all(t == "1m" for t, _ in removed)
    remaining_1m = {r["bucket_start"] for r in store.read_tier("1m").collect()}
    assert remaining_1m  # horizon day survives
    # coarse tiers untouched
    assert store.read_tier("1d").count() > 0


def test_compact_day(spark, tmp_path):
    """Many-file day (several incremental merges) compacts to one file
    with identical points; resume still sees the unit as done."""
    from pyspark.sql import functions as F

    from timeseriesflattener_spark.sources.transcripts import (
        derive_channels,
        synthesize_transcripts,
    )
    from timeseriesflattener_spark.streaming.incremental import merge_batch

    ch = derive_channels(
        synthesize_transcripts(spark, n_conversations=10, avg_turns=8, seed=9, span_days=1)
    )
    store = TierStore(spark, str(tmp_path / "cstore"), ["text_len"])
    merge_batch(store, ch, batch_id=0)
    day = store._raw_days(ch)[0]
    # simulate a many-files day (high write parallelism / many appends)
    from timeseriesflattener_spark.plans.tiers import _day_dir
    import shutil as _sh

    ddir = _day_dir(store.root, "1m", day)
    many = store.read_tier_day("1m", day).repartition(4)
    many.write.mode("overwrite").parquet(ddir + ".many")
    _sh.rmtree(ddir)
    import os as _os

    _os.replace(ddir + ".many", ddir)
    before_points = {
        (r["conv_id"], r["bucket_start"]): (r["text_len_count"], r["text_len_sum"])
        for r in store.read_points("1m").collect()
    }
    n_before, n_after = store.compact_day("1m", day, target_files=1)
    assert n_before > 1 and n_after == 1
    after_points = {
        (r["conv_id"], r["bucket_start"]): (r["text_len_count"], r["text_len_sum"])
        for r in store.read_points("1m").collect()
    }
    assert after_points == before_points
    # the ledger records compact lineage and the unit stays done
    assert ("1m", day) in store.completed_units()
    sources = {r["source"] for r in store.read_ledger().collect()}
    assert "compact" in sources


def test_iceberg_format_gated(spark, channels, tmp_path):
    """format='iceberg' is feature-detected (VERDICT r3 #8): without a
    runtime jar the ctor raises a clear error instead of failing deep
    inside a write; unknown formats are rejected; the parquet default is
    untouched (every other test in this file)."""
    from timeseriesflattener_spark.plans.tiers import iceberg_available

    with pytest.raises(ValueError, match="unknown TierStore format"):
        TierStore(spark, str(tmp_path / "x"), ["text_len"], format="delta")
    if iceberg_available(spark):
        pytest.skip("Iceberg jar present: gated-error path not reachable")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        TierStore(spark, str(tmp_path / "x"), ["text_len"], format="iceberg")
    # streaming merge explicitly refuses non-parquet stores
    from timeseriesflattener_spark.streaming.incremental import merge_batch

    class _FakeIceStore:
        format = "iceberg"

    with pytest.raises(NotImplementedError, match="parquet partition layout"):
        merge_batch(_FakeIceStore(), channels.limit(1))


def test_iceberg_roundtrip(spark, channels, tmp_path):
    """With a real Iceberg catalog configured: materialize -> read_tier
    -> apply_retention through the catalog tables, values equal to the
    parquet store on the same input. Skips (like skipif, but probed on
    the live session) when no runtime jar is on the classpath."""
    import uuid

    from timeseriesflattener_spark.plans.tiers import iceberg_available

    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar on the classpath")

    prefix = f"tsf_test.t{uuid.uuid4().hex[:8]}"
    ice = TierStore(
        spark, str(tmp_path / "ice"), ["text_len"],
        tiers=["1m", "1h"], format="iceberg", iceberg_table_prefix=prefix,
    )
    pq = TierStore(spark, str(tmp_path / "pq"), ["text_len"], tiers=["1m", "1h"])
    ice.materialize(channels, bulk=True)
    pq.materialize(channels, bulk=True)
    a = ice.read_tier("1h")
    b = pq.read_tier("1h")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_day_partitioned_source_pruning_equals_flat(spark, channels, tmp_path):
    """write_transcripts day-partitions on ts_day; materializing from the
    partitioned layout (the `ts_day` pruning branch in both the unit and
    bulk paths) must produce tiers identical to the flat frame."""
    from timeseriesflattener_spark.sources.transcripts import (
        read_transcripts,
        write_transcripts,
    )

    path = str(tmp_path / "day_part")
    write_transcripts(channels, path)
    rt = read_transcripts(spark, path)
    assert "ts_day" not in rt.columns and rt.count() == channels.count()

    raw_part = spark.read.parquet(path)  # keeps ts_day for pruning
    assert "ts_day" in raw_part.columns

    flat = TierStore(spark, str(tmp_path / "flat"), ["text_len"], tiers=["1m", "1h"])
    part_unit = TierStore(spark, str(tmp_path / "pu"), ["text_len"], tiers=["1m", "1h"])
    part_bulk = TierStore(spark, str(tmp_path / "pb"), ["text_len"], tiers=["1m", "1h"])
    flat.materialize(channels, bulk=True)
    part_unit.materialize(raw_part, bulk=False)
    part_bulk.materialize(raw_part, bulk=True)

    ref = flat.read_tier("1h")
    for st in (part_unit, part_bulk):
        got = st.read_tier("1h")
        assert got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty()
