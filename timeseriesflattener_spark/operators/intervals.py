"""Interval analytics: bucketized time-in-state over state-change event
streams, and a generic interval-overlap join.

The reference consumes pre-shaped value frames (its predictors are
point-in-time observations — `src/timeseriesflattener/main.py`); it has
no notion of a state that HOLDS between events, and its only join is the
prediction-time range join inside flatten. This module closes both gaps
for raw streams: ``state_durations`` treats each event as a state
transition (the entity occupies ``state_col`` from the event until the
entity's next event) and chops the occupancy intervals into fixed
buckets — the shape behind "time in status per day", uptime/error
budgets, and billing meters; ``overlap_join`` is the general
interval x interval (or interval x point) range join.

Scale shape (100 TB): everything here keys on the entity.
``state_durations`` is one entity exchange (lead) + a PURE PROJECTION
chop — ``sequence`` + ``explode`` fan each interval out to the buckets
it overlaps, bounded by ceil(span / bucket) rows per interval, never by
input density — + one map-side-combined groupBy; the bucket grid is
arithmetic, not a generated dimension table. ``overlap_join`` turns the
inequality join Spark would execute as a per-entity cross filter into an
(entity, grid-cell) EQUI-join, with each qualifying pair attributed to
exactly one cell so no dedup pass is needed.

Cross-engine determinism (the repo-wide "exact partials" contract —
see ``operators/rolling.py``): interval ends come from ``lead`` ordered
by (epoch-micros, order_col) so equal-timestamp transitions are ordered
identically in every engine; durations are exact integer microsecond
arithmetic end to end, and the seconds views are ONE final IEEE
division of that exact integer by 1e6 — bit-identical in any engine —
emitted raw (never rounded, never DECIMAL-cast). ``peak`` selects an
input value (max), so it keeps the input column's type.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeutils import micros
from ..plans.rollup import floor_to_width
from ..specs import require_positive_micros, timedelta_to_micros


def state_durations(
    df: DataFrame,
    bucket: dt.timedelta,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    order_col: str | None = "event_id",
    end_ts: dt.datetime | None = None,
) -> DataFrame:
    """Seconds each entity spent in each state per ``bucket``: every
    event opens an occupancy interval ``[ts, next event's ts)`` for its
    ``state_col`` value; intervals are chopped at bucket boundaries and
    the overlap summed per (entity, state, bucket). Returns
    ``(entity, state, bucket_start, seconds, n_intervals)`` with
    ``seconds`` a raw double — the exact integer-microsecond sum
    divided once by 1e6 (bit-identical in any engine) — and
    ``n_intervals`` the number of interval fragments that touched the
    bucket.

    ``end_ts`` must be a NAIVE datetime interpreted as UTC wall-clock
    (the same contract as the session timezone every timestamp column
    goes through); a tz-aware value raises rather than silently mixing
    epoch bases.

    The entity's LAST event has no successor: with ``end_ts`` given its
    interval closes there (events at/after ``end_ts`` are dropped, and
    earlier intervals are clipped to it); with ``end_ts=None`` the open
    interval is dropped — an unclosed state contributes nothing rather
    than a guessed duration. Zero-length intervals (two transitions at
    the same microsecond — the earlier one, ordered by ``order_col``,
    held the state for 0 time) are dropped. ``order_col`` breaks
    equal-timestamp ties so ``lead`` is deterministic under any
    partitioning; pass None only when (entity, ts) is known unique.

    One entity exchange (lead), one arithmetic explode whose fanout per
    interval is ceil(interval span / bucket) — bound it by closing
    streams with a sane ``end_ts`` rather than letting a years-idle
    entity fan one interval across the whole calendar — then one
    map-side-combined groupBy.
    """
    us = require_positive_micros("bucket", bucket)
    order = [micros(F.col(ts_col))]
    if order_col is not None:
        order.append(F.col(order_col))
    w = Window.partitionBy(entity_col).orderBy(*order)

    start = micros(F.col(ts_col))
    nxt = F.lead(start).over(w)
    if end_ts is not None:
        if end_ts.tzinfo is not None:
            raise ValueError(
                "state_durations end_ts must be a naive UTC datetime "
                f"(the session-timezone contract), got tz-aware {end_ts!r}"
            )
        end_us = timedelta_to_micros(end_ts - dt.datetime(1970, 1, 1))
        nxt = F.least(F.coalesce(nxt, F.lit(end_us)), F.lit(end_us))

    iv = (
        df.select(
            F.col(entity_col).alias("entity"),
            F.col(state_col).alias("state"),
            start.alias("__start"),
            nxt.alias("__end"),
        )
        # drops open last intervals (end NULL when end_ts=None),
        # zero-length ties, and post-end_ts starts in one predicate
        .filter(F.col("__end") > F.col("__start"))
    )

    b0 = floor_to_width(F.col("__start"), us)
    # __end is exclusive: an interval ending exactly on a boundary does
    # not touch the next bucket
    b1 = floor_to_width(F.col("__end") - F.lit(1), us)
    chopped = iv.select(
        "entity",
        "state",
        "__start",
        "__end",
        F.explode(
            F.sequence(b0, b1, F.lit(us).cast("long"))
        ).alias("__bucket_us"),
    )
    dur = F.least(F.col("__end"), F.col("__bucket_us") + F.lit(us)) - F.greatest(
        F.col("__start"), F.col("__bucket_us")
    )
    return (
        chopped.withColumn("__dur_us", dur)
        .groupBy(
            "entity",
            "state",
            F.timestamp_micros(F.col("__bucket_us")).alias("bucket_start"),
        )
        .agg(
            # exact integer-µs sum, ONE IEEE division — bit-identical
            # in any engine; emitted raw (module contract)
            (F.sum("__dur_us").cast("double") / F.lit(1_000_000.0)).alias(
                "seconds"
            ),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    bucket: dt.timedelta,
    entity_col: str = "user_id",
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "ts",
    right_end: str | None = None,
) -> DataFrame:
    """Distributed interval-overlap join (the generic range join Spark
    lacks): pair every left interval ``[left_start, left_end)`` with
    every right interval — or point, when ``right_end=None`` — of the
    SAME entity that overlaps it. Overlap is half-open
    (``l.start < r.end AND r.start < l.end``); a point overlaps when
    ``l.start <= t < l.end``. Returns all left columns joined with all
    right columns (collisions on shared names must be resolved by the
    caller renaming beforehand; ``entity_col`` is emitted once).

    Why not a plain conditional join: Spark executes a join whose ONLY
    equality key is the entity as one sort-merge join per entity with a
    full per-entity cross filter — fine until one entity is hot. This
    operator adds a derived equality key: both sides explode to the
    ``bucket``-grid cells they span, the join runs on
    ``(entity, cell)`` — an equi-join AQE can split on skew — and each
    qualifying pair is counted EXACTLY ONCE by keeping it only in the
    cell containing ``greatest(l.start, r.start)`` (every overlapping
    pair shares that cell by construction, so no post-join ``distinct``
    pass and no duplicate inflation). Explode fanout per row is
    ceil(span / bucket): pick ``bucket`` near the typical interval
    length; a years-long interval with a tiny bucket trades fanout for
    join selectivity.

    Cross-engine determinism: pure integer epoch-micros arithmetic;
    output is a plain inner join, order-free.
    """
    us = require_positive_micros("bucket", bucket)

    def _cells(df, start_col, end_col, prefix):
        s = micros(F.col(start_col))
        e = micros(F.col(end_col)) if end_col is not None else s + F.lit(1)
        b0 = floor_to_width(s, us)
        b1 = floor_to_width(e - F.lit(1), us)
        return (
            df.filter(e > s)
            .withColumn(f"__{prefix}s", s)
            .withColumn(f"__{prefix}e", e)
            .withColumn(
                "__cell" if prefix == "l" else "__rcell",
                F.explode(F.sequence(b0, b1, F.lit(us).cast("long"))),
            )
        )

    lc = _cells(left, left_start, left_end, "l")
    rc = _cells(right, right_start, right_end, "r").withColumnRenamed(
        entity_col, "__r_entity"
    )
    pair_cell = floor_to_width(F.greatest(F.col("__ls"), F.col("__rs")), us)
    joined = lc.join(
        rc,
        (lc["__cell"] == rc["__rcell"])
        & (F.col(entity_col) == F.col("__r_entity"))
        & (F.col("__ls") < F.col("__re"))
        & (F.col("__rs") < F.col("__le"))
        & (F.col("__cell") == pair_cell),
        "inner",
    )
    drop = ["__ls", "__le", "__rs", "__re", "__cell", "__rcell", "__r_entity"]
    return joined.drop(*drop)


def threshold_episodes(
    df: DataFrame,
    condition: Column,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = "event_id",
) -> DataFrame:
    """Maximal runs of CONSECUTIVE events satisfying ``condition``
    (gaps-and-islands): per entity, events are ordered by
    (epoch-micros, order_col); every flip of the condition starts a new
    run; rows failing the condition are dropped after run assignment
    (they are the gaps). One row per episode: ``(entity, start_ts,
    end_ts, n_events, peak)`` — the alert-episode shape ("value stayed
    over threshold from X to Y, peaking at Z"). ``peak`` SELECTS an
    input value (max, never an accumulation), so it keeps
    ``value_col``'s type — integer in, integer out, reproducible in any
    engine (NULL if the episode's values are all NULL — e.g. a
    condition on another column). A NULL condition counts as False.

    One entity exchange shared by the lag and the running flip-count
    (same window spec, ROWS frame over the unique (ts, order) key so
    the cumsum is engine-independent), then one map-side-combined
    groupBy on (entity, run). Episodes are bounded by the condition's
    flip count, never input density.
    """
    order = [micros(F.col(ts_col))]
    if order_col is not None:
        order.append(F.col(order_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    flag = F.when(condition, F.lit(1)).otherwise(F.lit(0))
    prev = F.lag(flag).over(w)
    flip = F.when(prev.isNull() | (flag != prev), F.lit(1)).otherwise(F.lit(0))
    runs = (
        df.withColumn("__f", flag)
        .withColumn("__run", F.sum(flip).over(wrun))
        .filter(F.col("__f") == 1)
    )
    return (
        runs.groupBy(F.col(entity_col).alias("entity"), F.col("__run"))
        .agg(
            F.min(F.col(ts_col)).alias("start_ts"),
            F.max(F.col(ts_col)).alias("end_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.col(value_col)).alias("peak"),
        )
        .drop("__run")
    )


def interval_union(
    df: DataFrame,
    entity_col: str = "user_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """Merge each entity's overlapping-or-touching intervals into their
    union (gaps-and-islands over a running max end): one row per
    maximal covered span — ``(entity, start_ts, end_ts, n_intervals,
    covered_secs)`` with ``covered_secs`` the exact integer-microsecond
    span divided once by 1e6 (a raw double, bit-identical in any
    engine). The coverage/uptime primitive: overlapping
    sessions, redundant monitors, and billing windows collapse to the
    time actually covered. Half-open [start, end) semantics; intervals
    that merely TOUCH (one ends exactly where the next starts) merge —
    their union is the same contiguous span either way. Rows with a
    NULL endpoint are excluded; zero-length intervals participate (a
    disjoint one forms its own zero-coverage island). Caller contract:
    ``end >= start`` (the entry query constructs ends additively).

    ONE exchange total (plan-pinned): the running-max window and the
    island cumsum share the same (start, end)-ordered ROWS spec over
    one entity exchange — duplicate rows are interchangeable, so island
    assignment is engine- and partition-order-independent — and the
    (entity, island) groupBy reuses the entity partitioning
    (hashpartitioning(entity) clusters any (entity, *) grouping).
    Output is bounded by the number of GAPS, never input density.
    """
    s = micros(F.col(start_col))
    e = micros(F.col(end_col))
    iv = df.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    ).select(
        F.col(entity_col).alias("__entity"),
        s.alias("__s"),
        e.alias("__e"),
    )
    w = Window.partitionBy("__entity").orderBy("__s", "__e")
    prev_max = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max.isNull() | (F.col("__s") > prev_max), F.lit(1)
    ).otherwise(F.lit(0))
    islands = iv.withColumn(
        "__isl",
        F.sum(opens).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy(F.col("__entity").alias("entity"), F.col("__isl"))
        .agg(
            F.timestamp_micros(F.min("__s")).alias("start_ts"),
            F.timestamp_micros(F.max("__e")).alias("end_ts"),
            F.count(F.lit(1)).alias("n_intervals"),
            (
                (F.max("__e") - F.min("__s")).cast("double")
                / F.lit(1_000_000.0)
            ).alias("covered_secs"),
        )
        .drop("__isl")
    )
