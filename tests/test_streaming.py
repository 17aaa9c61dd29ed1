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


def test_ingest_crash_between_merge_and_manifest(spark, channels, tmp_path):
    """ADVICE r2 #2: a crash AFTER merge but BEFORE the manifest append,
    with MORE files landing before the retry, must not double-count the
    already-merged files — the pending record fixes the replay key."""
    import os

    from timeseriesflattener_spark.streaming import incremental as I

    in_dir = str(tmp_path / "crash_in")
    even = channels.filter(F.col("turn_idx") % 2 == 0)
    odd = channels.filter(F.col("turn_idx") % 2 == 1)
    even.coalesce(1).write.mode("overwrite").parquet(in_dir)

    store = TierStore(spark, str(tmp_path / "crash_store"), VALUE_COLS)

    # simulate the crash: run ingest but blow up inside _commit_batch
    real_commit = I._commit_batch

    def exploding_commit(manifest, pending_path, files):
        raise RuntimeError("crash before manifest append")

    I._commit_batch = exploding_commit
    try:
        import pytest as _pt

        with _pt.raises(RuntimeError):
            I.ingest_new_files(store, in_dir)
    finally:
        I._commit_batch = real_commit
    # merge completed, manifest did NOT; pending record exists
    assert os.path.isfile(os.path.join(store.root, "ingest_pending.json"))
    assert not os.path.isfile(os.path.join(store.root, "ingest_manifest.txt"))

    # more files land BEFORE the retry — the old bug: a fresh file-set
    # hash re-merges the even files on top of the crashed (completed) merge
    odd.coalesce(1).write.mode("append").parquet(in_dir)
    ingested = I.ingest_new_files(store, in_dir)
    # retry ingests the pending set (as a ledgered no-op) plus the new file
    assert len(ingested) >= 2

    ref = TierStore(spark, str(tmp_path / "crash_ref"), VALUE_COLS)
    ref.materialize(channels)
    for tier in ("1m", "1h", "1d"):
        assert _count_sums(store, tier) == _count_sums(ref, tier), tier
    # steady state: no pending left, repeat is a no-op
    assert not os.path.isfile(os.path.join(store.root, "ingest_pending.json"))
    assert I.ingest_new_files(store, in_dir) == []


def test_publish_crash_before_ledger_append_replays_as_noop(
    spark, channels, tmp_path
):
    """ADVICE r2 #3: the job marker published atomically with the data
    dir covers the publish->ledger-append crash window — the replay of
    the same batch_id sees the marker and skips the 1m re-combine."""
    from timeseriesflattener_spark.plans import tiers as T_
    from timeseriesflattener_spark.streaming import incremental as I

    even = channels.filter(F.col("turn_idx") % 2 == 0)
    store = TierStore(spark, str(tmp_path / "pub_store"), VALUE_COLS)

    # crash: ledger append raises AFTER the data dir swap
    real_append = type(store)._append_ledger
    calls = {"n": 0}

    def exploding_append(self, row):
        calls["n"] += 1
        if calls["n"] == 1 and row["tier"] == "1m":
            raise RuntimeError("crash before ledger append")
        return real_append(self, row)

    import pytest as _pt

    type(store)._append_ledger = exploding_append
    try:
        with _pt.raises(RuntimeError):
            I.merge_batch(store, even, batch_id=7)
    finally:
        type(store)._append_ledger = real_append

    # replay of batch 7 (foreachBatch at-least-once): must be a no-op
    # for the published 1m unit despite the missing ledger row
    I.merge_batch(store, even, batch_id=7)

    once = TierStore(spark, str(tmp_path / "pub_once"), VALUE_COLS)
    I.merge_batch(once, even, batch_id=7)
    for tier in ("1m", "1h", "1d"):
        assert _count_sums(store, tier) == _count_sums(once, tier), tier
