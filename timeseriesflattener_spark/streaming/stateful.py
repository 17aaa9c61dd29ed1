"""Custom stateful streaming operator via ``applyInPandasWithState``:
a continuously-updated per-conversation profile (running count / sum /
min / max / last event time) maintained in the streaming state store
across micro-batches.

This is the escape hatch the built-in operators can't express: the
state is an arbitrary Python/Arrow structure updated per group per
batch (here a fixed numeric profile; swap the update function for any
incremental model — sketch, decay counter, per-conv quality monitor).
Batches arrive as Arrow-backed pandas frames — no per-row Python beyond
the per-GROUP state bookkeeping.

Emission is ``update`` mode: every micro-batch emits the refreshed
profile of each conversation it touched; the LATEST row per
conversation is the current profile. Use foreachBatch or an
update-capable sink downstream.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = (
    "conv_id string, n_events long, v_sum double, v_min double, v_max double, "
    "last_ts timestamp"
)
_STATE_SCHEMA = "n long, s double, mn double, mx double, last long"


def _update_profile(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n, s, mn, mx, last = state.get
    else:
        n, s, mn, mx, last = 0, 0.0, None, None, None
    for pdf in pdfs:
        if pdf.empty:
            continue
        v = pdf["v"].astype(float)
        n += int(v.count())
        s += float(v.sum())
        bmn, bmx = float(v.min()), float(v.max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
        bl = int(pdf["ts"].astype("int64").max())  # ns since epoch
        last = bl if last is None else max(last, bl)
    state.update((n, s, mn, mx, last))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_events": [n],
            "v_sum": [s],
            "v_min": [mn],
            "v_max": [mx],
            "last_ts": [pd.Timestamp(last)],
        }
    )


def running_profiles(stream_df: DataFrame) -> DataFrame:
    """Streaming (conv_id, ts, v) -> per-batch updated profiles."""
    return stream_df.groupBy("conv_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_profile_stream(
    spark,
    input_path: str,
    schema: str,
    out_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """readStream -> stateful profiles -> foreachBatch parquet appends
    (each update batch lands with its batch_id; the max-batch_id row per
    conversation is the current profile)."""
    from pyspark.sql import functions as F

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    profiles = running_profiles(reader.parquet(input_path))

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_path
        )

    writer = (
        profiles.writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
