"""Conversation sessionization: split each entity's event stream into
sessions separated by inactivity gaps — the standard pre-processing step
before per-session rollups/features on transcript tables (the reference
has no equivalent; transcripts-domain addition per the north rule).

Pure window functions (lag + conditional cumsum), whole-stage codegen,
one shuffle by entity. At 100 TB the shuffle is the same entity
partitioning every downstream per-conversation op needs anyway.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeutils import micros
from ..specs import timedelta_to_micros


def sessionize(
    df: DataFrame,
    gap: dt.timedelta,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str | None = "turn_idx",
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-entity session index (0-based): a new session starts
    when the time since the previous event EXCEEDS ``gap`` (a gap of
    exactly ``gap`` stays in-session). Ties in ``ts`` order by
    ``order_col`` when given, else by timestamp alone (ties then share a
    frame-order-free outcome because td == 0 never opens a session)."""
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    prev = F.lag(micros(F.col(ts_col))).over(w)
    opens = (
        prev.isNotNull()
        & ((micros(F.col(ts_col)) - prev) > F.lit(timedelta_to_micros(gap)))
    ).cast("long")
    return df.withColumn(
        session_col,
        F.sum(opens).over(
            Window.partitionBy(entity_col).orderBy(*order).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )


def session_stats(
    sessions: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    session_col: str = "session_id",
) -> DataFrame:
    """Per-(entity, session) summary: bounds, duration, event count."""
    return sessions.groupBy(entity_col, session_col).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (micros(F.max(ts_col)) - micros(F.min(ts_col))).alias("duration_micros"),
        F.count("*").alias("n_events"),
    )


def session_window_stats(
    df: DataFrame,
    gap: dt.timedelta,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Same result shape as ``sessionize`` + ``session_stats`` via
    Spark's built-in ``session_window`` — the streaming-ready form (the
    identical expression runs under ``readStream`` with a watermark,
    where the lag+cumsum window formulation cannot).

    Boundary alignment (verified by golden test): ``session_window``
    merges an event landing exactly ON the previous window's end —
    i.e. ties at exactly ``gap`` stay in-session — which is precisely
    ``sessionize``'s ``td > gap`` opening rule, so the gap passes
    through unchanged. ``session_id`` is re-derived as the 0-based
    per-entity index of the window start, matching ``sessionize``."""
    gap_expr = f"{timedelta_to_micros(gap)} microseconds"
    agg = (
        df.groupBy(entity_col, F.session_window(F.col(ts_col), gap_expr).alias("__sw"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (micros(F.max(ts_col)) - micros(F.min(ts_col))).alias("duration_micros"),
            F.count("*").alias("n_events"),
        )
    )
    idx = Window.partitionBy(entity_col).orderBy(F.col("__sw.start"))
    return agg.select(
        entity_col,
        (F.row_number().over(idx) - 1).cast("long").alias("session_id"),
        "session_start",
        "session_end",
        "duration_micros",
        "n_events",
    )


def conversation_shape(
    df: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    type_col: str = "role",
    order_col: str | None = "turn_idx",
) -> DataFrame:
    """Per-conversation shape profile: the structural quality stats a
    transcript-training pipeline gates on before a conversation enters
    the corpus (too-short threads, role-alternation violations, stalls).

    One row per entity:

    - ``n_events``       turns in the conversation
    - ``n_types``        distinct ``type_col`` values (roles/event kinds)
    - ``span_us``        first->last turn in exact integer micros
    - ``max_gap_us``     longest inter-turn gap in exact integer micros
                         (0 for single-turn conversations)
    - ``n_repeats``      adjacent turn pairs with the SAME type — for
                         role columns this counts alternation
                         violations (double-user / double-assistant)

    All stats are exact integer arithmetic over epoch-micros — BIGINT
    end to end, no division anywhere (the r7 exact-partials contract;
    callers wanting seconds divide at the edge). Plan: one lag window +
    one groupBy sharing a single entity exchange (the groupBy reuses the
    window's hash partitioning); everything whole-stage codegen.
    ``order_col`` breaks timestamp ties deterministically — pass None
    only when (entity, ts) is known unique.
    """
    order = [micros(F.col(ts_col))]
    if order_col is not None:
        order.append(F.col(order_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    us = micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    rep = (F.col(type_col) == F.lag(type_col).over(w)).cast("long")
    return (
        df.select(
            entity_col,
            F.col(type_col).alias("__t"),
            us.alias("__us"),
            gap.alias("__gap"),
            rep.alias("__rep"),
        )
        .groupBy(entity_col)
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("__t").alias("n_types"),
            (F.max("__us") - F.min("__us")).alias("span_us"),
            F.coalesce(F.max("__gap"), F.lit(0).cast("long")).alias("max_gap_us"),
            F.coalesce(F.sum("__rep"), F.lit(0).cast("long")).alias("n_repeats"),
        )
    )
