"""Incremental tier maintenance: merge new transcript turns into the
materialised continuous aggregates without recomputing history.

The reference has no streaming at all (SURVEY.md §2.6) — its closest
analog is ``step_size`` chunking. Here incrementality falls out of the
algebra: partial states combine, so

    new 1m partials(batch)  ∪  existing 1m partials(day)
        --combine-->  updated 1m partials(day)
        --rollup-->   updated 1h/1d partials(day)

Each merge touches only the (tier, day) units the batch lands in; the
ledger records them like any other materialisation (source="merge").

Two entry points:

- ``merge_batch(store, batch_df)`` — the micro-batch kernel (pure
  batch-DataFrame logic, unit-testable).
- ``stream_into_store(spark, input_path, store)`` — Structured
  Streaming wrapper: ``readStream`` on a parquet directory ->
  ``foreachBatch(merge_batch)`` with a checkpointLocation. foreachBatch
  is only AT-LEAST-ONCE: a micro-batch can replay after a crash between
  a publish and the streaming checkpoint commit. The 1m combine step is
  not naturally idempotent (replaying it would double-count sums), so
  ``merge_batch`` ledgers every publish under ``job_id =
  "stream-{batch_id}"`` and skips (tier, day) units already ledgered
  for that batch_id — replays become no-ops, giving effectively-once
  results. Late data within a day merges naturally (combine is
  order-independent); a watermark is unnecessary because state lives in
  the store, not in streaming memory.
"""

from __future__ import annotations

import datetime as dt
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import rollup as R
from ..plans.tiers import TierStore, _day_dir


def _affected_days(batch: DataFrame, ts_col: str) -> list[dt.date]:
    rows = batch.select(F.to_date(ts_col).alias("d")).distinct().collect()
    return sorted(r["d"] for r in rows)


def merge_batch(
    store: TierStore, batch: DataFrame, batch_id: int | str | None = None
) -> list[dt.date]:
    """Merge a batch of raw rows into every tier. Returns affected days.

    ``batch_id`` makes the merge idempotent under foreachBatch's
    at-least-once replay: units already ledgered under this batch's
    job_id are skipped, so re-running the same batch never combines the
    same rows into the 1m partials twice. Pass None only for ad-hoc
    batches that will not be replayed.
    """
    if getattr(store, "format", "parquet") != "parquet":
        raise NotImplementedError(
            "streaming merge targets the parquet partition layout; for an "
            "Iceberg store run batch materialize() per micro-batch window "
            "(the MERGE-INTO streaming path needs a live catalog to build on)"
        )
    days = _affected_days(batch, store.ts_col)
    if not days:
        return []
    spark = store.spark
    job_id = f"stream-{batch_id}" if batch_id is not None else "stream"

    already: set[tuple[str, dt.date]] = set()
    if batch_id is not None:
        ledger = store.read_ledger()
        if not ledger.isEmpty():
            already = {
                (r["tier"], r["day"])
                for r in ledger.filter(
                    (F.col("job_id") == job_id) & (F.col("state") == "done")
                )
                .select("tier", "day")
                .collect()
            }
        # the job marker travels INSIDE the published data directory
        # (written before the atomic os.replace), so a crash in the
        # window between publish and ledger append still leaves proof —
        # without it, a replay would re-combine already-published 1m
        # partials and double-count
        for day in days:
            if ("1m", day) not in already and os.path.isfile(
                os.path.join(_day_dir(store.root, "1m", day), f"_job-{job_id}")
            ):
                already.add(("1m", day))

    for day in days:
        if ("1m", day) in already:
            pass  # replayed batch: 1m already combined — never re-combine
        else:
            day_start = dt.datetime.combine(day, dt.time.min)
            day_end = day_start + dt.timedelta(days=1)
            ts = F.col(store.ts_col)
            day_rows = batch.filter((ts >= F.lit(day_start)) & (ts < F.lit(day_end)))

            new_1m = R.partial_aggregate(
                day_rows,
                store.value_cols,
                entity_col=store.entity_col,
                ts_col=store.ts_col,
                order_col=store.order_col,
                tier="1m",
                salt_partitions=store.salt_partitions,
            )
            base_dir = _day_dir(store.root, "1m", day)
            if os.path.isdir(base_dir):
                existing = spark.read.parquet(base_dir)
                # combine = rollup to the same tier (same bucket width)
                merged = R.rollup(
                    existing.unionByName(new_1m),
                    store.value_cols,
                    to_tier="1m",
                    entity_col=store.entity_col,
                )
            else:
                merged = new_1m
            _publish(store, merged, "1m", day, source="merge", job_id=job_id)

        # coarser tiers rebuild from the stored 1m partials of the day —
        # a deterministic overwrite, so re-running them on replay is safe
        # (and necessary if the crash hit between 1m and 1h publishes)
        for tier in store.tiers:
            if tier == "1m":
                continue
            rolled = R.rollup(
                spark.read.parquet(_day_dir(store.root, "1m", day)),
                store.value_cols,
                to_tier=tier,
                entity_col=store.entity_col,
            )
            _publish(store, rolled, tier, day, source="merge:1m", job_id=job_id)
    return days


def _publish(
    store: TierStore, df: DataFrame, tier: str, day: dt.date, source: str,
    job_id: str = "stream",
) -> None:
    import shutil
    import time
    import uuid as uuidlib

    t0 = time.time()
    out_dir = _day_dir(store.root, tier, day)
    tmp = out_dir + f".tmp-{uuidlib.uuid4().hex[:8]}"
    df.write.option("compression", store._codec(tier)).mode("overwrite").parquet(tmp)
    rows = store.spark.read.parquet(tmp).count()
    # job marker inside the data dir, atomically published with it:
    # 'this job already produced this unit' survives a crash before the
    # ledger append (parquet readers ignore _-prefixed files)
    with open(os.path.join(tmp, f"_job-{job_id}"), "w") as fh:
        fh.write(source)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    store._append_ledger(
        {
            "tier": tier,
            "day": day,
            "state": "done",
            "source": source,
            "input_rows": rows,
            "output_rows": rows,
            "wall_s": time.time() - t0,
            "attempt": 1,
            "job_id": job_id,
            "finished_at": dt.datetime.now(),
        }
    )


def stream_into_store(
    spark: SparkSession,
    input_path: str,
    store: TierStore,
    schema: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Structured Streaming: watch ``input_path`` for new parquet files
    of raw turns and merge each micro-batch into the tier store.
    ``max_files_per_trigger`` bounds micro-batch size (availableNow
    otherwise drains everything already present in ONE batch)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch(store, batch_df, batch_id=batch_id)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ------------------------------------------------- snapshot-diff ingest

def list_data_files(input_dir: str) -> list[str]:
    """All parquet data files under ``input_dir`` (recursing into
    day-partition subdirectories), sorted for deterministic batch ids."""
    found: list[str] = []
    for root, _dirs, files in os.walk(input_dir):
        for f in files:
            if f.endswith(".parquet") and not f.startswith("_"):
                found.append(os.path.join(root, f))
    return sorted(found)


def ingest_new_files(
    store: TierStore, input_dir: str, schema: str | None = None
) -> list[str]:
    """Snapshot-diff ingestion — the Iceberg ``incrementalScan`` analog
    over the parquet layout (no Iceberg runtime jar in this sandbox;
    with a real catalog this becomes snapshot-id bookkeeping instead of
    a file manifest).

    Lists the input table's data files, diffs against the manifest of
    files already ingested into ``store``, reads ONLY the new files and
    merges them into every tier — so late-arriving data files (backfill
    drops, upstream compactions landing new partitions) re-open exactly
    the (tier, day) units they touch, without rescanning ingested data.

    Crash-safe: the pending file list (and its batch token) is recorded
    DURABLY before the merge starts, so the replay key cannot depend on
    files that arrive later — a crash between merge and manifest append
    resumes from the recorded pending set (whose token matches the
    half-done merge, making the replay a no-op via ``merge_batch``) and
    only then diffs for newer files. Returns the newly ingested paths.
    """
    manifest = os.path.join(store.root, "ingest_manifest.txt")
    pending_path = os.path.join(store.root, "ingest_pending.json")
    seen: set[str] = set()
    if os.path.isfile(manifest):
        with open(manifest) as fh:
            seen = {line.strip() for line in fh if line.strip()}

    ingested: list[str] = []
    # resume a crashed batch first: its token was fixed when it was
    # recorded, so later arrivals cannot change the replay key
    pending = _read_pending(pending_path)
    if pending is not None:
        files = [f for f in pending["files"] if f not in seen]
        if files:
            _merge_files(store, files, pending["token"], schema)
            _commit_batch(manifest, pending_path, files)
            seen.update(files)
            ingested.extend(files)
        else:
            os.remove(pending_path)

    new = [f for f in list_data_files(input_dir) if f not in seen]
    if not new:
        return ingested
    batch_token = _batch_token(new)
    _write_pending(pending_path, {"token": batch_token, "files": new})
    _merge_files(store, new, batch_token, schema)
    _commit_batch(manifest, pending_path, new)
    return ingested + new


def _batch_token(files: Sequence[str]) -> str:
    import hashlib

    return hashlib.sha256("\n".join(files).encode()).hexdigest()[:16]


def _read_pending(path: str) -> dict | None:
    import json

    if not os.path.isfile(path):
        return None
    try:
        with open(path) as fh:
            pending = json.load(fh)
        if isinstance(pending.get("files"), list) and pending.get("token"):
            return pending
    except (ValueError, OSError):
        pass
    return None  # torn write before the batch started: nothing was merged


def _write_pending(path: str, pending: dict) -> None:
    import json

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(pending, fh)
    os.replace(tmp, path)


def _merge_files(
    store: TierStore, files: Sequence[str], token: str, schema: str | None
) -> None:
    reader = store.spark.read
    if schema:
        reader = reader.schema(schema)
    # the recorded file-set hash keys idempotent replay exactly like a
    # streaming batch id
    merge_batch(store, reader.parquet(*files), batch_id=token)


def _commit_batch(manifest: str, pending_path: str, files: Sequence[str]) -> None:
    with open(manifest, "a") as fh:
        fh.writelines(f + "\n" for f in files)
    if os.path.isfile(pending_path):
        os.remove(pending_path)
