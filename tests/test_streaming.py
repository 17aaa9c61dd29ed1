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
