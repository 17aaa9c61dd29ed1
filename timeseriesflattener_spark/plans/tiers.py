"""Materialised continuous-aggregate tiers with a checkpoint ledger,
retention policy, and per-unit lineage/metrics.

North-rule requirements covered here (BASELINE.json):

- **checkpoint-resumable incremental aggregation**: work is split into
  (tier, day) units; every completed unit appends a ledger row; a
  killed job re-runs only units the ledger doesn't mark done. This is
  the scale-out replacement for the reference's per-feature DiskCache
  keyed by spec fingerprint + row count
  (``v1/feature_cache/cache_to_disk.py:74-148``) and its ctime-based
  "most recent file" lookup (``:52-72``), which cannot survive
  concurrent writers or partial failures.
- **per-partition lineage + metrics**: the ledger row records the
  source (raw vs finer tier), input/output row counts, wall seconds
  and attempt number — queryable as a table.
- **retention**: fine tiers age out first (drop whole day partitions),
  coarse tiers persist — ``apply_retention``.

Storage formats (``TierStore(format=...)``):

- ``"parquet"`` (default): partition-per-directory layout standing in
  for Iceberg — the layout mirrors an Iceberg table partitioned by
  (tier, day) and every publish is partition-atomic (write to a tmp
  dir, ``os.replace``):

      {root}/partials/tier={tier}/day={YYYY-MM-DD}/part-*.parquet
      {root}/ledger/*.parquet      (append-only events; latest wins)

- ``"iceberg"``: each tier is a catalog table
  ``{iceberg_table_prefix}_{tier}`` partitioned by ``day``; publishes
  use ``writeTo(...).overwritePartitions()`` (a real atomic snapshot
  commit), reads use ``spark.table`` with a partition predicate, and
  retention issues a partition ``DELETE``. Requires an Iceberg runtime
  jar + a configured Spark catalog; constructing the store raises a
  clear error when the probe (``iceberg_available``) fails — this
  sandbox has no jar, so the path is exercised by a skipif-guarded
  test and the parquet default stays bit-identical to round 3. The
  ledger/job-marker bookkeeping stays file-based under ``root`` in
  both modes (it predates the catalog and must survive without one).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import time
import uuid as uuidlib
from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from . import rollup as R

LEDGER_SCHEMA = (
    "tier string, day date, state string, source string, input_rows long, "
    "output_rows long, wall_s double, attempt int, job_id string, finished_at timestamp"
)


def _day_dir(root: str, tier: str, day: dt.date) -> str:
    return os.path.join(root, "partials", f"tier={tier}", f"day={day.isoformat()}")


def iceberg_available(spark: SparkSession) -> bool:
    """Probe for an Iceberg runtime on the session's JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


@dataclass
class TierStore:
    """Manages materialised partial-aggregate tiers under ``root``."""

    spark: SparkSession
    root: str
    value_cols: Sequence[str]
    entity_col: str = "conv_id"
    ts_col: str = "ts"
    order_col: str | None = "turn_idx"
    tiers: Sequence[str] = field(default_factory=lambda: list(R.TIER_ORDER))
    salt_partitions: int | None = None
    #: per-tier parquet codec: the 1m tier is write-hot and expires in
    #: days -> lz4 (measured ~14% faster writes than snappy at 2M convs,
    #: ~same size); coarse tiers live long -> zstd (~21% smaller)
    tier_codec: dict = field(
        default_factory=lambda: {"1m": "lz4", "1h": "zstd", "1d": "zstd"}
    )
    #: record exact raw input row counts in the ledger (costs one extra
    #: scan per (1m, day) unit — measured ~50% of total job time)
    track_raw_input_rows: bool = False
    #: test seam — called before each unit is computed; raising aborts the job
    on_unit_start: Callable[[str, dt.date], None] | None = None
    #: "parquet" (default, partition-per-directory) or "iceberg"
    #: (catalog tables; needs a runtime jar — see module docstring)
    format: str = "parquet"
    #: catalog.namespace.table prefix for format="iceberg"; each tier
    #: becomes f"{prefix}_{tier}" partitioned by day
    iceberg_table_prefix: str = "tsf.tiers"

    def __post_init__(self) -> None:
        if self.format not in ("parquet", "iceberg"):
            raise ValueError(f"unknown TierStore format {self.format!r}")
        if self.format == "iceberg" and not iceberg_available(self.spark):
            raise RuntimeError(
                "TierStore(format='iceberg') needs an Iceberg runtime on the "
                "Spark classpath and a configured catalog (e.g. "
                "spark.sql.catalog.tsf=org.apache.iceberg.spark.SparkCatalog); "
                "probe failed — use format='parquet' (default) instead"
            )

    def _codec(self, tier: str) -> str:
        return self.tier_codec.get(tier, "snappy")

    def _tier_table(self, tier: str) -> str:
        return f"{self.iceberg_table_prefix}_{tier}"

    # --------- iceberg write/read seams (no jar in this sandbox: these
    # run only under a real catalog; kept thin and declarative) ---------

    def _iceberg_publish(self, partials: DataFrame, tier: str, days: Sequence[dt.date]) -> None:
        """Overwrite exactly the ``days`` partitions in one atomic
        snapshot commit (the real Iceberg analog of the parquet path's
        per-day tmp-dir + os.replace). Uses an explicit partition
        predicate rather than ``overwritePartitions()``: dynamic
        overwrite only replaces partitions PRESENT in the source, so a
        recomputed day whose new partials are empty would silently keep
        its stale rows (the parquet path publishes a schema-bearing
        empty partition for that case — the predicate DELETEs it here)."""
        table = self._tier_table(tier)
        dated = partials.withColumn(
            "day", F.to_date(F.timestamp_micros(F.col("bucket_start")))
        )
        try:
            self.spark.table(table)
            exists = True
        except AnalysisException:
            # table genuinely absent -> first publish creates it; any
            # OTHER failure (catalog outage, permissions) propagates —
            # routing it into create() would corrupt an existing table
            exists = False
        writer = dated.writeTo(table).option(
            "write.parquet.compression-codec", self._codec(tier)
        )
        if exists:
            writer.overwrite(F.col("day").isin([F.lit(d) for d in days]))
        else:
            writer.partitionedBy(F.col("day")).create()

    def _iceberg_read_day(self, tier: str, day: dt.date) -> DataFrame:
        return (
            self.spark.table(self._tier_table(tier))
            .filter(F.col("day") == F.lit(day))
            .drop("day")
        )

    @property
    def ledger_dir(self) -> str:
        return os.path.join(self.root, "ledger")

    # ---------------- ledger ----------------

    def read_ledger(self) -> DataFrame:
        """The lineage/metrics table. Empty frame if nothing ran yet."""
        if not os.path.isdir(self.ledger_dir) or not os.listdir(self.ledger_dir):
            return self.spark.createDataFrame([], LEDGER_SCHEMA)
        return self.spark.read.parquet(self.ledger_dir)

    def completed_units(self) -> set[tuple[str, dt.date]]:
        ledger = self.read_ledger()
        if ledger.isEmpty():
            return set()
        done = (
            ledger.groupBy("tier", "day")
            .agg(F.max(F.struct("finished_at", "state")).alias("last"))
            .select("tier", "day", F.col("last.state").alias("state"))
            .filter(F.col("state") == "done")
            .collect()
        )
        return {(r["tier"], r["day"]) for r in done}

    def _append_ledger(self, row: dict) -> None:
        """Append one ledger event. Written with pyarrow directly — a
        Spark job per tiny ledger row costs ~0.3s x units (measured 28s
        of pure overhead on a 93-unit run)."""
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.ledger_dir, exist_ok=True)
        table = pa.table(
            {
                "tier": [row["tier"]],
                "day": pa.array([row["day"]], type=pa.date32()),
                "state": [row["state"]],
                "source": [row["source"]],
                "input_rows": pa.array([row["input_rows"]], type=pa.int64()),
                "output_rows": pa.array([row["output_rows"]], type=pa.int64()),
                "wall_s": pa.array([row["wall_s"]], type=pa.float64()),
                "attempt": pa.array([row["attempt"]], type=pa.int32()),
                "job_id": [row["job_id"]],
                "finished_at": pa.array(
                    [row["finished_at"]], type=pa.timestamp("us")
                ),
            }
        )
        pq.write_table(
            table, os.path.join(self.ledger_dir, f"event-{_uuid.uuid4().hex}.parquet")
        )

    # ---------------- materialisation ----------------

    def _raw_days(self, raw: DataFrame) -> list[dt.date]:
        rows = raw.select(F.to_date(self.ts_col).alias("d")).distinct().collect()
        return sorted(r["d"] for r in rows)

    def materialize(
        self,
        raw: DataFrame,
        days: Sequence[dt.date] | None = None,
        bulk: bool = False,
    ) -> dict:
        """Incrementally materialise all tiers for the given days
        (default: every day present in ``raw``). Resumable: units already
        marked done in the ledger are skipped. Returns run metrics.

        ``bulk=True`` computes all missing days of a tier in ONE Spark
        job (partitioned write + per-day publish) instead of a job per
        (tier, day) — the production shape at 100 TB where per-job fixed
        costs (planning, scheduling, scan setup) would otherwise
        multiply by the day count. Ledger granularity, resume semantics
        and the on-disk layout are identical.
        """
        job_id = uuidlib.uuid4().hex[:12]
        days = list(days) if days is not None else self._raw_days(raw)
        done = self.completed_units()
        computed, skipped = [], []

        for tier_i, tier in enumerate(self.tiers):
            finer = self.tiers[tier_i - 1] if tier_i > 0 else None
            todo = [day for day in days if (tier, day) not in done]
            skipped.extend((tier, day) for day in days if (tier, day) in done)
            if not todo:
                continue
            if bulk:
                if self.on_unit_start is not None:
                    for day in todo:
                        self.on_unit_start(tier, day)
                self._materialize_tier_bulk(raw, tier, finer, todo, job_id)
                computed.extend((tier, day) for day in todo)
            else:
                for day in todo:
                    # callback immediately before each unit computes (the
                    # kill/resume test seam relies on this interleaving)
                    if self.on_unit_start is not None:
                        self.on_unit_start(tier, day)
                    self._materialize_unit(raw, tier, finer, day, job_id)
                    computed.append((tier, day))
        return {"job_id": job_id, "computed": computed, "skipped": skipped}

    def _materialize_tier_bulk(
        self, raw: DataFrame, tier: str, finer: str | None, days: list[dt.date], job_id: str
    ) -> None:
        """All missing days of one tier in a single partitioned-write job."""
        t0 = time.time()
        day_set = {d.isoformat() for d in days}
        if finer is None:
            source = "raw"
            base = raw
            if "ts_day" in raw.columns:
                base = base.filter(F.col("ts_day").isin(sorted(day_set)))
            else:
                base = base.filter(
                    F.to_date(F.col(self.ts_col)).isin([F.lit(d) for d in days])
                )
            partials = R.partial_aggregate(
                base.drop("ts_day") if "ts_day" in raw.columns else base,
                self.value_cols,
                entity_col=self.entity_col,
                ts_col=self.ts_col,
                order_col=self.order_col,
                tier=tier,
                salt_partitions=self.salt_partitions,
            )
        else:
            source = f"tier:{finer}"
            if self.format == "iceberg":
                finer_df = (
                    self.spark.table(self._tier_table(finer))
                    .filter(F.col("day").isin([F.lit(d) for d in days]))
                    .drop("day")
                )
            else:
                paths = [_day_dir(self.root, finer, d) for d in days]
                finer_df = self.spark.read.parquet(*paths)
            partials = R.rollup(
                finer_df,
                self.value_cols,
                to_tier=tier,
                entity_col=self.entity_col,
            )

        if self.format == "iceberg":
            # one snapshot commit covers every missing day of the tier
            self._iceberg_publish(partials, tier, days)
            wall = time.time() - t0
            counts = {
                r["day"]: r["n"]
                for r in self.spark.table(self._tier_table(tier))
                .filter(F.col("day").isin([F.lit(d) for d in days]))
                .groupBy("day")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            for day in days:
                self._append_ledger(
                    {
                        "tier": tier,
                        "day": day,
                        "state": "done",
                        "source": source + ":bulk",
                        "input_rows": -1,
                        "output_rows": counts.get(day, 0),
                        "wall_s": wall / len(days),
                        "attempt": 1,
                        "job_id": job_id,
                        "finished_at": dt.datetime.now(),
                    }
                )
            return

        staging = os.path.join(self.root, f"_staging-{tier}-{job_id}")
        (
            partials.withColumn(
                "day", F.to_date(F.timestamp_micros(F.col("bucket_start")))
            )
            .repartition("day")
            .write.partitionBy("day")
            .option("compression", self._codec(tier))
            .mode("overwrite")
            .parquet(staging)
        )
        wall = time.time() - t0
        # per-day publish + ledger (identical layout to the unit path)
        for day in days:
            src = os.path.join(staging, f"day={day.isoformat()}")
            out_dir = _day_dir(self.root, tier, day)
            os.makedirs(os.path.dirname(out_dir), exist_ok=True)
            if os.path.isdir(out_dir):
                shutil.rmtree(out_dir)
            if os.path.isdir(src):
                os.replace(src, out_dir)
            else:
                # day with no rows: write a schema-bearing empty parquet,
                # not a bare directory — read_tier_day / a later unit-mode
                # resume would otherwise crash on 'Unable to infer schema'
                partials.drop("day").limit(0).write.option(
                    "compression", self._codec(tier)
                ).mode("overwrite").parquet(out_dir)
            output_rows = self.spark.read.parquet(out_dir).count()
            self._append_ledger(
                {
                    "tier": tier,
                    "day": day,
                    "state": "done",
                    "source": source + ":bulk",
                    "input_rows": -1,
                    "output_rows": output_rows,
                    "wall_s": wall / len(days),
                    "attempt": 1,
                    "job_id": job_id,
                    "finished_at": dt.datetime.now(),
                }
            )
        shutil.rmtree(staging, ignore_errors=True)

    def _materialize_unit(
        self, raw: DataFrame, tier: str, finer: str | None, day: dt.date, job_id: str
    ) -> None:
        t0 = time.time()
        attempt = 1  # a retry loop would bump this; kept explicit for lineage
        day_start = dt.datetime.combine(day, dt.time.min)
        day_end = day_start + dt.timedelta(days=1)

        if finer is None:
            source = "raw"
            ts = F.col(self.ts_col)
            unit_input = raw.filter((ts >= F.lit(day_start)) & (ts < F.lit(day_end)))
            if "ts_day" in raw.columns:
                # day-partitioned source: prune to the unit's partition
                # (the ts range filter alone cannot prune a ts_day layout)
                unit_input = unit_input.filter(F.col("ts_day") == F.lit(day))
            # NOTE: do NOT pre-repartition raw by entity here — the map-side
            # combiner already reduces what the groupBy exchange carries;
            # an explicit repartition would shuffle the full raw rows
            # (measured slower), and each tier materialises via parquet so
            # exchange reuse across tiers never applies.
            partials = R.partial_aggregate(
                unit_input.drop("ts_day") if "ts_day" in raw.columns else unit_input,
                self.value_cols,
                entity_col=self.entity_col,
                ts_col=self.ts_col,
                order_col=self.order_col,
                tier=tier,
                salt_partitions=self.salt_partitions,
            )
        else:
            source = f"tier:{finer}"
            unit_input = self.read_tier_day(finer, day)
            partials = R.rollup(
                unit_input, self.value_cols, to_tier=tier, entity_col=self.entity_col
            )

        # input rows: parquet metadata count for tier sources (cheap);
        # for raw, a separate full-scan count per unit measured ~50% of
        # the whole job — record the bucket-row total instead (exact for
        # the finer tier, and lineage only needs relative magnitudes)
        if finer is None:
            input_rows = -1 if not self.track_raw_input_rows else unit_input.count()
        else:
            input_rows = unit_input.count()
        if self.format == "iceberg":
            # a snapshot commit IS the atomic publish
            self._iceberg_publish(partials, tier, [day])
            output_rows = self._iceberg_read_day(tier, day).count()
        else:
            out_dir = _day_dir(self.root, tier, day)
            tmp_dir = out_dir + f".tmp-{job_id}"
            partials.write.option("compression", self._codec(tier)).mode(
                "overwrite"
            ).parquet(tmp_dir)
            output_rows = self.spark.read.parquet(tmp_dir).count()
            # partition-atomic publish (what an Iceberg commit gives us for real)
            if os.path.isdir(out_dir):
                shutil.rmtree(out_dir)
            os.replace(tmp_dir, out_dir)

        self._append_ledger(
            {
                "tier": tier,
                "day": day,
                "state": "done",
                "source": source,
                "input_rows": input_rows,
                "output_rows": output_rows,
                "wall_s": time.time() - t0,
                "attempt": attempt,
                "job_id": job_id,
                "finished_at": dt.datetime.now(),
            }
        )

    # ---------------- reads ----------------

    def read_tier_day(self, tier: str, day: dt.date) -> DataFrame:
        if self.format == "iceberg":
            return self._iceberg_read_day(tier, day)
        return self.spark.read.parquet(_day_dir(self.root, tier, day))

    def read_tier(self, tier: str) -> DataFrame:
        if self.format == "iceberg":
            return self.spark.table(self._tier_table(tier)).drop("day")
        base = os.path.join(self.root, "partials", f"tier={tier}")
        days = sorted(d for d in os.listdir(base) if d.startswith("day="))
        paths = [os.path.join(base, d) for d in days]
        return self.spark.read.parquet(*paths)

    def read_points(self, tier: str) -> DataFrame:
        """Finalised rolled-up points for a tier."""
        return R.finalize(self.read_tier(tier), self.value_cols, entity_col=self.entity_col)

    # ---------------- compaction ----------------

    def compact_day(
        self, tier: str, day: dt.date, target_files: int = 1
    ) -> tuple[int, int]:
        """Rewrite a (tier, day) partition into ``target_files`` files —
        the small-files treatment: incremental merges and streaming
        publishes each leave their own file set, and at 100 TB a day
        touched by hundreds of micro-batches degrades every later scan
        (footer opens + tiny row groups). Values are untouched (asserted
        by count); the rewrite is partition-atomic like every publish,
        and the ledger records it as source="compact" lineage. Returns
        (files_before, files_after).

        format="iceberg": the partition is rewritten through the same
        read -> coalesce -> overwritePartitions shape (snapshot-atomic);
        file counts come from the table's ``.files`` metadata table. On
        a managed catalog, Iceberg's ``rewrite_data_files`` procedure is
        the richer alternative — this path keeps the TierStore contract
        (count-asserted, ledgered) identical across formats."""
        if self.format == "iceberg":
            return self._iceberg_compact_day(tier, day, target_files)
        out_dir = _day_dir(self.root, tier, day)
        before = len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])
        t0 = time.time()
        df = self.spark.read.parquet(out_dir)
        rows_before = df.count()
        tmp = out_dir + f".compact-{uuidlib.uuid4().hex[:8]}"
        (
            df.coalesce(target_files)
            .write.option("compression", self._codec(tier))
            .mode("overwrite")
            .parquet(tmp)
        )
        rows_after = self.spark.read.parquet(tmp).count()
        if rows_after != rows_before:
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                f"compaction row mismatch {rows_before} -> {rows_after} for {tier}/{day}"
            )
        shutil.rmtree(out_dir)
        os.replace(tmp, out_dir)
        after = len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])
        self._append_ledger(
            {
                "tier": tier,
                "day": day,
                "state": "done",
                "source": "compact",
                "input_rows": rows_before,
                "output_rows": rows_after,
                "wall_s": time.time() - t0,
                "attempt": 1,
                "job_id": f"compact-{uuidlib.uuid4().hex[:8]}",
                "finished_at": dt.datetime.now(),
            }
        )
        return before, after

    def _iceberg_compact_day(
        self, tier: str, day: dt.date, target_files: int
    ) -> tuple[int, int]:
        table = self._tier_table(tier)

        def n_files() -> int:
            try:
                return (
                    self.spark.table(f"{table}.files")
                    .filter(F.col("partition.day") == F.lit(day))
                    .count()
                )
            except Exception:
                return -1  # metadata table unavailable on this catalog

        before = n_files()
        t0 = time.time()
        df = self._iceberg_read_day(tier, day)
        rows_before = df.count()
        self._iceberg_publish(df.coalesce(target_files), tier, [day])
        rows_after = self._iceberg_read_day(tier, day).count()
        if rows_after != rows_before:
            raise RuntimeError(
                f"compaction row mismatch {rows_before} -> {rows_after} for {tier}/{day}"
            )
        self._append_ledger(
            {
                "tier": tier,
                "day": day,
                "state": "done",
                "source": "compact",
                "input_rows": rows_before,
                "output_rows": rows_after,
                "wall_s": time.time() - t0,
                "attempt": 1,
                "job_id": f"compact-{uuidlib.uuid4().hex[:8]}",
                "finished_at": dt.datetime.now(),
            }
        )
        return before, n_files()

    # ---------------- retention ----------------

    def apply_retention(self, keep_days: dict[str, int], now: dt.date) -> list[tuple[str, str]]:
        """Drop day partitions older than each tier's horizon. Returns the
        (tier, day) partitions removed. Typical policy keeps 1m briefly,
        1h longer, 1d forever: {'1m': 7, '1h': 90}. format="iceberg"
        issues one partition-predicate DELETE per tier (a metadata-only
        drop for whole partitions)."""
        removed: list[tuple[str, str]] = []
        if self.format == "iceberg":
            for tier, keep in keep_days.items():
                cutoff = now - dt.timedelta(days=keep)
                table = self._tier_table(tier)
                try:
                    old = (
                        self.spark.table(table)
                        .filter(F.col("day") < F.lit(cutoff))
                        .select("day")
                        .distinct()
                        .collect()
                    )
                except AnalysisException:
                    continue  # tier table not created yet; a transient
                    # read failure is NOT "nothing due" and propagates
                if not old:
                    continue
                self.spark.sql(
                    f"DELETE FROM {table} WHERE day < DATE '{cutoff.isoformat()}'"
                )
                removed.extend((tier, f"day={r['day'].isoformat()}") for r in old)
            return removed
        for tier, keep in keep_days.items():
            cutoff = now - dt.timedelta(days=keep)
            base = os.path.join(self.root, "partials", f"tier={tier}")
            if not os.path.isdir(base):
                continue
            for entry in sorted(os.listdir(base)):
                if not entry.startswith("day="):
                    continue
                day = dt.date.fromisoformat(entry.split("=", 1)[1])
                if day < cutoff:
                    shutil.rmtree(os.path.join(base, entry))
                    removed.append((tier, entry))
        return removed
