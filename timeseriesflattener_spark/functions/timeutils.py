"""Timestamp helpers.

Parquet timestamps arrive as TIMESTAMP_NTZ when written without UTC
adjustment; ``unix_micros`` only accepts TIMESTAMP. ``micros`` casts
first — with the session timezone pinned to UTC (``session.get_spark``
does this; ``__spark_entry__`` re-pins defensively) the NTZ->LTZ cast is
the identity on wall-clock values, so bucket arithmetic matches DuckDB's
``epoch_us`` exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def micros(col: Column) -> Column:
    """Microseconds since epoch for TIMESTAMP or TIMESTAMP_NTZ columns."""
    return F.unix_micros(col.cast("timestamp"))
