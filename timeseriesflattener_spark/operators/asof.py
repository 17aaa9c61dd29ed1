"""As-of join: for every left row, the latest right row at or before its
timestamp (pandas ``merge_asof`` semantics) — the point-in-time-correct
"state as of" lookup (latest config/price/profile at each prediction
time) the task's operator list calls out.

Spark-first shape: NOT a join at all. Both sides UNION into one stream
tagged by side, a single window pass per entity carries the last right
value forward, and left rows read the carry — one shuffle (the entity
window), no join fan-out, no skew cliff: a hot entity costs one sorted
partition scan instead of an m:n join explosion. ``tolerance`` bounds
staleness (a carry older than the tolerance nulls out).
"""

from __future__ import annotations

import datetime as dt
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeutils import micros
from ..specs import timedelta_to_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    entity_col: str | Sequence[str] = "entity_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = ("value",),
    tolerance: dt.timedelta | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Left rows + the matched right ``value_cols`` per entity (merge_asof
    semantics; exact-timestamp matches are visible in every direction).
    ``entity_col`` accepts a single column or a list (pandas
    ``merge_asof(by=[...])`` parity — e.g. match on (user, device)):

    - ``backward`` (default): latest right with ``right.ts <= left.ts``;
    - ``forward``: earliest right with ``right.ts >= left.ts`` (the same
      window pass over the time-reversed stream);
    - ``nearest``: whichever of the two is closer in time (backward wins
      exact ties, like pandas).

    Unmatched (or out-of-tolerance) rows carry nulls. Output adds
    ``{col}{suffix}`` per value col and ``{right_ts}{suffix}`` (the
    matched right timestamp). One entity-window shuffle per direction
    (two for ``nearest``), never a join."""
    if direction == "forward":
        return _asof_directional(
            left, right, entity_col, left_ts, right_ts, value_cols, tolerance,
            suffix, forward=True,
        )
    if direction == "nearest":
        b = _asof_directional(
            left, right, entity_col, left_ts, right_ts, value_cols, tolerance,
            "__b", forward=False,
        )
        bf = _asof_directional(
            b, right, entity_col, left_ts, right_ts, value_cols, tolerance,
            "__f", forward=True,
        )
        lt = micros(F.col(left_ts))
        back_age = lt - micros(F.col(f"{right_ts}__b"))
        fwd_age = micros(F.col(f"{right_ts}__f")) - lt
        # backward wins ties; a missing side loses automatically
        use_back = F.col(f"{right_ts}__b").isNotNull() & (
            F.col(f"{right_ts}__f").isNull() | (back_age <= fwd_age)
        )
        cols = [F.col(c) for c in left.columns]
        for c in value_cols:
            cols.append(
                F.when(use_back, F.col(f"{c}__b")).otherwise(F.col(f"{c}__f")).alias(
                    f"{c}{suffix}"
                )
            )
        cols.append(
            F.when(use_back, F.col(f"{right_ts}__b"))
            .otherwise(F.col(f"{right_ts}__f"))
            .alias(f"{right_ts}{suffix}")
        )
        return bf.select(*cols)
    if direction != "backward":
        raise ValueError(f"unknown direction {direction!r}")
    return _asof_directional(
        left, right, entity_col, left_ts, right_ts, value_cols, tolerance,
        suffix, forward=False,
    )


def _asof_directional(
    left: DataFrame,
    right: DataFrame,
    entity_col: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: dt.timedelta | None,
    suffix: str,
    forward: bool,
) -> DataFrame:
    """Shared union+window kernel; ``forward`` flips the time axis by
    negating the sort key (and the side order, so exact-ts right rows
    still sort before the left rows that should see them)."""
    sign = -1 if forward else 1
    entity_cols = [entity_col] if isinstance(entity_col, str) else list(entity_col)
    ekeys = [f"__e{i}" for i in range(len(entity_cols))]
    lcols = left.columns
    # Carry right values in their OWN types (string state columns are the
    # canonical "config as of" use; pandas merge_asof preserves dtype) —
    # the union's left side projects typed nulls per value column.
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    missing = [c for c in value_cols if c not in rtypes]
    if missing:
        raise ValueError(f"value_cols {missing} not in right frame {right.columns}")
    l_tagged = left.select(
        *[F.col(c).alias(k) for c, k in zip(entity_cols, ekeys)],
        (micros(F.col(left_ts)) * sign).alias("__t"),
        F.lit(1).alias("__side"),  # left sorts AFTER right at equal (signed) ts
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        *[F.lit(None).cast(rtypes[c]).alias(f"__v_{c}") for c in value_cols],
        F.lit(None).cast("long").alias("__rt"),
    )
    r_tagged = right.select(
        *[F.col(c).alias(k) for c, k in zip(entity_cols, ekeys)],
        (micros(F.col(right_ts)) * sign).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        micros(F.col(right_ts)).alias("__rt"),
    )
    w = (
        Window.partitionBy(*ekeys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *ekeys,
        "__t",
        "__side",
        "__l",
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__cv_{c}") for c in value_cols],
        F.last("__rt", ignorenulls=True).over(w).alias("__crt"),
    )
    out = carried.filter(F.col("__side") == 1)
    age = F.col("__t") * sign  # back to real micros
    age = (F.col("__crt") - age) if forward else (age - F.col("__crt"))
    fresh = (
        F.lit(True)
        if tolerance is None
        else age <= F.lit(timedelta_to_micros(tolerance))
    )
    cols = [F.col("__l").getField(c).alias(c) for c in lcols]
    cols += [
        F.when(fresh, F.col(f"__cv_{c}")).alias(f"{c}{suffix}") for c in value_cols
    ]
    cols.append(
        F.when(fresh, F.timestamp_micros(F.col("__crt"))).alias(f"{right_ts}{suffix}")
    )
    return out.select(*cols)
