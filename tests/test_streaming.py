"""Incremental merge correctness: merging batches (any split, any
order) equals one-shot materialisation; plus a Structured Streaming
end-to-end smoke with availableNow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark.plans.tiers import TierStore
from timeseriesflattener_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    derive_channels,
    synthesize_transcripts,
)
from timeseriesflattener_spark.streaming.incremental import merge_batch, stream_into_store

VALUE_COLS = ["text_len", "n_tokens", "tool_call"]
CHANNEL_SCHEMA = "conv_id string, turn_idx int, ts timestamp, text_len double, n_tokens double, tool_call double"


@pytest.fixture(scope="module")
def channels(spark):
    t = synthesize_transcripts(spark, n_conversations=25, avg_turns=10, seed=21, span_days=2)
    return derive_channels(t).cache()


def _points(store, tier):
    return {
        (r["conv_id"], r["bucket_start"]): tuple(
            round(r[f"{vc}_mean"], 9) for vc in VALUE_COLS
        )
        for r in store.read_points(tier).collect()
    }


def test_merge_batches_equals_one_shot(spark, channels, tmp_path):
    ref = TierStore(spark, str(tmp_path / "ref"), VALUE_COLS)
    ref.materialize(channels)

    inc = TierStore(spark, str(tmp_path / "inc"), VALUE_COLS)
    # split by turn parity — both batches touch every day and entity,
    # so merge must combine, not overwrite
    merge_batch(inc, channels.filter(F.col("turn_idx") % 2 == 0))
    merge_batch(inc, channels.filter(F.col("turn_idx") % 2 == 1))

    for tier in ("1m", "1h", "1d"):
        assert _points(inc, tier) == _points(ref, tier), tier

    ledger = inc.read_ledger()
    assert ledger.filter(F.col("source").startswith("merge")).count() > 0


def test_structured_streaming_availablenow(spark, channels, tmp_path):
    in_dir = str(tmp_path / "in")
    channels.write.mode("overwrite").parquet(in_dir)

    store = TierStore(spark, str(tmp_path / "stream"), VALUE_COLS)
    q = stream_into_store(
        spark,
        in_dir,
        store,
        schema=CHANNEL_SCHEMA,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    ref = TierStore(spark, str(tmp_path / "ref2"), VALUE_COLS)
    ref.materialize(channels)
    assert _points(store, "1h") == _points(ref, "1h")


def _count_sums(store, tier):
    """(count, sum) per bucket — the stats that DETECT double-counting
    (means are invariant when identical rows merge twice)."""
    return {
        (r["conv_id"], r["bucket_start"]): (
            r["text_len_count"],
            round(r["text_len_sum"], 9),
        )
        for r in store.read_points(tier).collect()
    }


def test_merge_batch_replay_is_idempotent(spark, channels, tmp_path):
    """foreachBatch is at-least-once: replaying the SAME batch_id must
    not combine the same rows into the 1m partials twice (ADVICE r1)."""
    ref = TierStore(spark, str(tmp_path / "refr"), VALUE_COLS)
    ref.materialize(channels)

    inc = TierStore(spark, str(tmp_path / "incr"), VALUE_COLS)
    even = channels.filter(F.col("turn_idx") % 2 == 0)
    odd = channels.filter(F.col("turn_idx") % 2 == 1)
    merge_batch(inc, even, batch_id=0)
    merge_batch(inc, even, batch_id=0)  # crash-replay of batch 0
    merge_batch(inc, odd, batch_id=1)
    merge_batch(inc, odd, batch_id=1)  # crash-replay of batch 1

    for tier in ("1m", "1h", "1d"):
        assert _count_sums(inc, tier) == _count_sums(ref, tier), tier

    # without a batch_id the merge is NOT idempotent (documented):
    # replaying doubles counts and sums
    naive = TierStore(spark, str(tmp_path / "naive"), VALUE_COLS)
    merge_batch(naive, even)
    merge_batch(naive, even)
    once = TierStore(spark, str(tmp_path / "once"), VALUE_COLS)
    merge_batch(once, even)
    doubled = _count_sums(naive, "1m")
    single = _count_sums(once, "1m")
    assert doubled.keys() == single.keys()
    assert all(doubled[k][0] == 2 * single[k][0] for k in single)


def test_snapshot_diff_ingest(spark, channels, tmp_path):
    """Iceberg snapshot-diff analog: late-arriving data FILES re-open only
    the units they touch; already-ingested files are never rescanned; a
    repeat call with no new files is a no-op."""
    from timeseriesflattener_spark.streaming.incremental import ingest_new_files

    in_dir = str(tmp_path / "snap_in")
    even = channels.filter(F.col("turn_idx") % 2 == 0)
    odd = channels.filter(F.col("turn_idx") % 2 == 1)
    even.coalesce(1).write.mode("overwrite").parquet(in_dir)

    store = TierStore(spark, str(tmp_path / "snap_store"), VALUE_COLS)
    first = ingest_new_files(store, in_dir)
    assert len(first) >= 1
    # a late file lands (backfill drop) — only IT is ingested
    odd.coalesce(1).write.mode("append").parquet(in_dir)
    second = ingest_new_files(store, in_dir)
    assert len(second) >= 1 and not set(second) & set(first)
    # no new files -> no-op
    assert ingest_new_files(store, in_dir) == []

    ref = TierStore(spark, str(tmp_path / "snap_ref"), VALUE_COLS)
    ref.materialize(channels)
    for tier in ("1m", "1h", "1d"):
        assert _count_sums(store, tier) == _count_sums(ref, tier), tier
