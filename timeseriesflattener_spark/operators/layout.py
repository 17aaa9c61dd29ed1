"""Z-order data layout: multi-dimensional clustering for data skipping.

At 100 TB a tier/transcript table is queried along TWO axes at once —
"this conversation over this time range" — but parquet/Iceberg file
pruning is one-dimensional: min/max stats prune well only on the column
the file happens to be sorted by. Interleaving the bits of an entity
bucket and a time bucket into one Z-order (Morton) key and range-
partitioning + sorting on that key gives every file a SMALL RECTANGLE
in (entity, time) space, so min/max stats on BOTH columns prune: a
point/range query on either axis touches O(sqrt(n_files)) files instead
of all of them. This is the layout behind Delta/Iceberg ``OPTIMIZE
ZORDER BY`` — re-expressed here as plain Catalyst integer expressions
so it runs on any DataFrame before any sink (no table-format extension
required; the reference's on-disk cache — SURVEY §2.1 — has no
multi-dimensional analog, this is a scale addendum op).

The key construction is pure JVM integer arithmetic (shift/and/or,
statically unrolled, whole-stage-codegen friendly): no UDF, no shuffle.
``apply_zorder_layout`` adds exactly one range-exchange — the same
exchange any explicit layout write pays.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "apply_zorder_layout"]


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    bucket columns into one Morton key (bit ``2i`` = ``a``'s bit ``i``,
    bit ``2i+1`` = ``b``'s bit ``i``).

    Callers bucket first (e.g. ``entity_id % 1024``, epoch-day): the key
    only sees the low ``bits`` bits, so out-of-range values silently
    alias — masked here to make that contract explicit. ``bits <= 31``
    keeps the result in a positive BIGINT. The unrolled expression is
    ``2*bits`` shift/and/or terms, all inside one codegen stage.
    """
    if not (1 <= bits <= 31):
        raise ValueError(f"bits must be in [1, 31], got {bits!r}")
    one = F.lit(1).cast("long")
    av = a.cast("long")
    bv = b.cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(av, i).bitwiseAND(one), 2 * i))
        terms.append(F.shiftleft(F.shiftright(bv, i).bitwiseAND(one), 2 * i + 1))
    return functools.reduce(lambda x, y: x.bitwiseOR(y), terms)


def apply_zorder_layout(
    df: DataFrame,
    a: Column,
    b: Column,
    n_files: int,
    bits: int = 16,
    key_col: str = "__zkey",
    keep_key: bool = False,
) -> DataFrame:
    """Cluster ``df`` for a layout write: range-partition into
    ``n_files`` partitions by the Z-order key of ``(a, b)`` and sort
    within each partition by it, so a subsequent ``write.parquet``
    emits one file per partition whose per-file min/max zkey ranges are
    DISJOINT and whose (a, b) footprints are near-square tiles.

    One range exchange (Spark samples the key to pick balanced bounds —
    skewed hot entities spread across files instead of hotspotting one).
    ``keep_key=True`` retains the key column for stats/debugging;
    default drops it so the layout is invisible to readers.
    """
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files!r}")
    keyed = df.withColumn(key_col, zorder_key(a, b, bits))
    out = keyed.repartitionByRange(n_files, F.col(key_col)).sortWithinPartitions(
        F.col(key_col)
    )
    return out if keep_key else out.drop(key_col)
