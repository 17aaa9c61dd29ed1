"""Sources / sinks (SURVEY.md §2.1).

Reference equivalents: CSV scan with timestamp parse
(``testing/load_synth_data.py:16-22``), suffix-dispatched load/store
(``v1/misc_utils.py:88-109,151-166``), long->wide split
(``v1/df_transforms.py:8-28``), and the per-feature DiskCache
(``v1/feature_cache/cache_to_disk.py:15-167``) reimagined as a
spec-fingerprint parquet cache (the *tier* materialisation analog lives
in ``plans/tiers.py``).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..frames import ValueFrame


def read_csv(
    spark: SparkSession,
    path: str,
    timestamp_cols: Sequence[str] = ("timestamp",),
    schema: str | None = None,
) -> DataFrame:
    """CSV scan with timestamp parsing (ref ``load_synth_data.py:16-22``).
    Prefer an explicit ``schema`` at scale — inferSchema is a full extra
    pass over the data."""
    reader = spark.read.option("header", "true")
    df = reader.csv(path, schema=schema) if schema else reader.option("inferSchema", "true").csv(path)
    for col in timestamp_cols:
        if col in df.columns:
            df = df.withColumn(col, F.to_timestamp(col))
    return df


def load_dataset(spark: SparkSession, path: str) -> DataFrame:
    """Suffix-dispatched load (ref ``v1/misc_utils.py:88-109``)."""
    if path.endswith(".csv"):
        return read_csv(spark, path)
    if path.endswith(".parquet") or os.path.isdir(path):
        return spark.read.parquet(path)
    raise ValueError(f"Unsupported dataset suffix: {path}")


def write_dataset(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Suffix-dispatched store (ref ``v1/misc_utils.py:151-166``)."""
    if path.endswith(".csv"):
        df.write.mode(mode).option("header", "true").csv(path)
    else:
        df.write.mode(mode).parquet(path)


def split_long_to_value_frames(
    df: DataFrame,
    name_col: str = "value_names",
    value_col: str = "value",
    entity_id_col_name: str = "entity_id",
    value_timestamp_col_name: str = "timestamp",
) -> dict[str, ValueFrame]:
    """Split a long frame on its name column into per-name ValueFrames
    (ref ``v1/df_transforms.py:8-28``). The distinct-name scan is one
    small job; each resulting frame is a pushdown-friendly filter over
    the same source (no data copied)."""
    names = [r[0] for r in df.select(name_col).distinct().collect()]
    return {
        name: ValueFrame(
            df=df.filter(F.col(name_col) == name)
            .withColumnRenamed(value_col, name)
            .drop(name_col),
            entity_id_col_name=entity_id_col_name,
            value_timestamp_col_name=value_timestamp_col_name,
        )
        for name in names
    }


class FeatureCache:
    """Spec-fingerprint parquet cache for flattened feature frames.

    Replaces the reference DiskCache's ctime-based most-recent-file
    lookup (``cache_to_disk.py:52-72``) with a deterministic key:
    sha256 of (spec description, input row count). Unlike the reference
    we do not drop/re-expand fallback rows (``:114-148``) — parquet
    encodes constant columns away, so the sparsity trick buys nothing.
    """

    def __init__(self, spark: SparkSession, cache_dir: str):
        self.spark = spark
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    @staticmethod
    def fingerprint(spec_description: dict, input_rows: int) -> str:
        payload = json.dumps({**spec_description, "rows": input_rows}, sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:24]

    def _path(self, key: str) -> str:
        return os.path.join(self.cache_dir, key)

    def get(self, key: str) -> DataFrame | None:
        path = self._path(key)
        if os.path.isdir(path):
            return self.spark.read.parquet(path)
        return None

    def put(self, key: str, df: DataFrame) -> DataFrame:
        path = self._path(key)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "entity_id",
    num_buckets: int = 64,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed catalog table so joins/aggregations keyed on
    ``bucket_col`` read pre-partitioned data — the co-located-join story
    for repeated flattens at 100 TB: bucket the events table and every
    prediction-time table by entity once, and the temporal fan-out join
    runs with NO exchange on either side (measured: 5 -> 2 exchanges in
    the flatten plan; the survivors are the post-join uuid aggregation).
    Both sides must use the same ``num_buckets``. On a real deployment
    the catalog is Hive/Iceberg; locally Spark's session catalog works.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    ``spark.read.parquet`` of the files would LOSE the bucketing
    metadata and reintroduce the shuffle)."""
    return spark.table(table)
