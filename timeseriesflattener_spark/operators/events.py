"""Event-stream product analytics: ordered funnels, cohort retention,
and next-event transition matrices — the canonical "how do entities
move through the product" queries over the events table (the reference
has no equivalent; event/transcript-stream addition per the north
rule, same family as sessionization in `sessions.py`).

Scale shape: every operator here is one entity-keyed exchange plus
map-side-combinable aggregates — the same entity partitioning every
per-conversation op in this package already shuffles by. Nothing is
iterative, nothing collects to the driver, and the per-entity state is
bounded by the number of FUNNEL-RELEVANT events (inputs are
pre-filtered to the step types before the groupBy).

Funnel semantics (documented contract, pinned by tests and the DuckDB
oracle): the funnel is ANCHORED at the entity's earliest step-1 event
(a strict sequential min-chain — t1 = min ts of step 1, t_i = min ts of
step i strictly after t_{i-1}, all within `within` of t1). This is
exactly expressible in ANSI SQL (the oracle) and deterministic; it
deliberately does NOT slide the anchor to later step-1 events the way
ClickHouse's windowFunnel does, so an entity whose only completion
starts at a later step-1 occurrence counts only as far as the anchored
chain reaches.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeutils import micros
from ..plans.rollup import floor_to_width
from ..specs import timedelta_to_micros


def _steps_completed_scan(
    steps: list[str], within_us: int | None
) -> "callable":
    """Merge fn for the per-entity sorted scan: greedy first-match state
    machine over (t, o, y) structs. State is struct(hits: array<bigint>
    of accepted step times so far, n: int). Greedy-first-match equals
    the sequential-min chain because acceptance only ever tests the
    previous ACCEPTED time, and the first match in time order IS the
    min among candidates (strictly-greater comparisons keep equal-ts
    events from double-counting across steps, in both engines).

    `F.get` (0-based, NULL out of range) instead of `element_at`
    everywhere: under ANSI mode element_at raises on index 0 / out of
    range, and `when()` does not short-circuit argument evaluation.
    The NULL propagates into a comparison guarded by an `(n == 0) |`
    disjunct, where TRUE | NULL is TRUE.
    """
    k = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])

    def merge(acc: Column, e: Column) -> Column:
        prev_t = F.get(acc["hits"], acc["n"] - 1)  # NULL when n == 0
        first_t = F.get(acc["hits"], F.lit(0))
        cond = (
            (acc["n"] < k)
            & (e["y"] == F.get(steps_lit, acc["n"]))
            & ((acc["n"] == 0) | (e["t"] > prev_t))
        )
        if within_us is not None:
            cond = cond & (
                (acc["n"] == 0) | ((e["t"] - first_t) <= F.lit(within_us))
            )
        return F.when(
            cond,
            F.struct(
                F.concat(acc["hits"], F.array(e["t"])).alias("hits"),
                (acc["n"] + 1).alias("n"),
            ),
        ).otherwise(acc)

    return merge


def funnel(
    df: DataFrame,
    steps: list[str],
    within: dt.timedelta | None = None,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str | None = None,
    max_events_per_entity: int | None = None,
) -> DataFrame:
    """Per-entity funnel progress: one row per entity that performed
    step 1, with ``steps_completed`` (1..k) and ``ts_step{i}``
    (timestamp of the accepted step-i event, NULL past the last
    completed step). Anchored min-chain semantics — see module
    docstring. NULL timestamps are excluded; equal-timestamp events
    never satisfy the strictly-after requirement (so one instant cannot
    complete two steps). ``order_col`` only stabilizes scan order among
    equal timestamps; acceptance depends on timestamps alone, so the
    result is order_col-free either way (pinned by test).

    One exchange: pre-filter to the step types, then a single
    groupBy(entity) whose sorted-array scan runs in JVM catalyst
    expressions (`array_sort` + `aggregate`) — no Python, no window.
    Per-entity memory is bounded by that entity's step-type event
    count, the same bound the SQL formulation's join fan-out carries.

    ``max_events_per_entity`` caps that bound for hot entities (bot
    traffic: one entity with tens of millions of step-typed events is
    otherwise a single-task buffer cliff — the one scale-killer shape
    in this family): only each entity's EARLIEST ``max_events``
    step-typed events (by (ts, order)) enter the scan, and the output
    gains a ``truncated`` boolean flagging entities that had more (the
    ``exact_duplicates`` ids_truncated pattern). Truncation keeps a
    time PREFIX, so a truncated entity's ``steps_completed`` is a
    lower bound — the anchored chain can only extend past the prefix,
    never change inside it. The cap adds one row_number over the same
    entity exchange (no extra shuffle); ``None`` (default) keeps the
    exact zero-window path and emits no ``truncated`` column.
    """
    if not steps:
        raise ValueError("funnel requires at least one step")
    within_us = None
    if within is not None:
        within_us = timedelta_to_micros(within)
        if within_us <= 0:
            raise ValueError(f"within must be positive, got {within!r}")
    k = len(steps)

    order = (
        F.col(order_col).cast("long")
        if order_col is not None
        else F.lit(0).cast("long")
    )
    ev = df.filter(
        F.col(ts_col).isNotNull() & F.col(type_col).isin(list(set(steps)))
    ).select(
        F.col(entity_col).alias("__entity"),
        F.struct(
            micros(F.col(ts_col)).alias("t"),
            order.alias("o"),
            F.col(type_col).alias("y"),
        ).alias("__e"),
    )

    init = F.struct(
        F.expr("CAST(array() AS array<bigint>)").alias("hits"),
        F.lit(0).alias("n"),
    )
    scan = _steps_completed_scan(steps, within_us)
    if max_events_per_entity is None:
        scanned = ev.groupBy("__entity").agg(
            F.aggregate(
                F.array_sort(F.collect_list("__e")), init, scan
            ).alias("__s")
        )
    else:
        capped, trunc = _cap_per_entity(ev, max_events_per_entity)
        scanned = capped.groupBy("__entity").agg(
            F.aggregate(
                F.array_sort(F.collect_list("__kept")), init, scan
            ).alias("__s"),
            trunc,
        )
    out = [F.col("__entity").alias(entity_col)]
    out.append(F.col("__s")["n"].alias("steps_completed"))
    for i in range(k):
        out.append(
            F.timestamp_micros(F.get(F.col("__s")["hits"], F.lit(i))).alias(
                f"ts_step{i + 1}"
            )
        )
    if max_events_per_entity is not None:
        out.append(F.col("__trunc").alias("truncated"))
    return scanned.select(*out).filter(F.col("steps_completed") >= 1)


def _cap_per_entity(ev: DataFrame, cap: int):
    """Shared hot-entity guard for the funnel scans: keep each entity's
    EARLIEST ``cap`` step events (row_number over the same entity
    exchange the groupBy uses — no extra shuffle) as ``__kept`` (NULL
    past the cap; collect_list drops NULLs), plus the aggregate
    expression flagging entities that overflowed."""
    if cap < 1:
        raise ValueError(f"max_events_per_entity must be >= 1, got {cap!r}")
    w = Window.partitionBy("__entity").orderBy(F.col("__e"))
    capped = ev.withColumn("__rn", F.row_number().over(w)).select(
        "__entity",
        F.when(F.col("__rn") <= cap, F.col("__e")).alias("__kept"),
        "__rn",
    )
    return capped, (F.max("__rn") > F.lit(cap)).alias("__trunc")


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    within: dt.timedelta | None = None,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str | None = None,
) -> DataFrame:
    """Classic funnel report: one row per step with the number of
    entities whose anchored chain reached at least that step, plus
    ``conversion`` = n_step / n_step1 (double; both engines divide the
    same exact integers, so the IEEE result is bit-identical — NULL when
    nobody reached step 1, since ANSI mode raises on 0/0). The k
    per-step counts reduce in ONE aggregate over the funnel detail (a
    single row), then explode to rows — no second scan of the events.
    """
    detail = funnel(
        df, steps, within=within, entity_col=entity_col,
        ts_col=ts_col, type_col=type_col, order_col=order_col,
    )
    return counts_from_detail(detail, steps)


def counts_from_detail(detail: DataFrame, steps: list[str]) -> DataFrame:
    """Reduce a funnel detail frame (any frame with a
    ``steps_completed`` column, batch or streaming-final) to the
    per-step report — shared by ``funnel_counts`` and the streaming
    twin so the two gates cannot drift."""
    k = len(steps)
    counts = detail.agg(
        *[
            F.coalesce(
                F.sum((F.col("steps_completed") >= i + 1).cast("long")),
                F.lit(0).cast("long"),
            ).alias(f"__n{i + 1}")
            for i in range(k)
        ]
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step"),
                        F.lit(steps[i]).alias("step_type"),
                        F.col(f"__n{i + 1}").alias("n_entities"),
                    )
                    for i in range(k)
                ]
            )
        ).alias("s"),
        F.col("__n1").alias("__first"),
    )
    return rows.select(
        "s.step",
        "s.step_type",
        "s.n_entities",
        F.when(
            F.col("__first") > 0,
            F.col("s.n_entities").cast("double")
            / F.col("__first").cast("double"),
        ).alias("conversion"),
    )


def cohort_retention(
    df: DataFrame,
    cohort_width: dt.timedelta,
    period_width: dt.timedelta | None = None,
    max_periods: int | None = None,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: entities are grouped into acquisition
    cohorts by the global-grid floor of their FIRST event, and each
    later event marks its entity active in period
    ``(floor(ts) - floor(first)) / period_width`` (both on the
    period grid, so the quotient is an exact integer). Output one row
    per (cohort, period): ``cohort`` (timestamp), ``period`` (0-based
    long), ``n_active``, ``n_cohort``, ``retention`` = n_active /
    n_cohort. With the default ``period_width == cohort_width`` the
    first event lands in period 0, so period 0 is 1.0 by construction;
    with a FINER ``period_width`` an entity's first activity lands in
    the period of its first event relative to the cohort floor, which
    can be > 0 (no period-0 row is guaranteed). NULL timestamps are
    excluded.

    Shape at scale: one groupBy(entity) for first-seen, an equi-join of
    activity back on entity (co-partitioned with the agg it follows),
    a distinct on (cohort, period, entity) — map-side combinable, NOT
    countDistinct's expand — then a tiny (cohort, period) count joined
    to broadcast cohort sizes. No windows, no Python.
    """
    cw = timedelta_to_micros(cohort_width)
    if cw <= 0:
        raise ValueError(f"cohort_width must be positive, got {cohort_width!r}")
    pw = timedelta_to_micros(period_width) if period_width is not None else cw
    if pw <= 0:
        raise ValueError(f"period_width must be positive, got {period_width!r}")
    if max_periods is not None and max_periods < 1:
        raise ValueError(f"max_periods must be >= 1, got {max_periods!r}")

    ev = df.filter(F.col(ts_col).isNotNull()).select(
        F.col(entity_col).alias("__entity"), micros(F.col(ts_col)).alias("__us")
    )
    firsts = ev.groupBy("__entity").agg(F.min("__us").alias("__first_us"))
    firsts = firsts.withColumn(
        "__cohort_us", floor_to_width(F.col("__first_us"), cw)
    )
    sizes = firsts.groupBy("__cohort_us").agg(
        F.count("*").alias("n_cohort")
    )
    # (floor(us) - floor(cohort)) is a non-negative multiple of pw well
    # under 2^53, so the double division below is exact.
    period = (
        (
            floor_to_width(F.col("__us"), pw)
            - floor_to_width(F.col("__cohort_us"), pw)
        )
        / F.lit(pw)
    ).cast("long")
    active = (
        ev.join(firsts, "__entity")
        .select(F.col("__cohort_us"), period.alias("period"), F.col("__entity"))
        .distinct()
    )
    if max_periods is not None:
        active = active.filter(F.col("period") < max_periods)
    out = (
        active.groupBy("__cohort_us", "period")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "__cohort_us")
        .select(
            F.timestamp_micros(F.col("__cohort_us")).alias("cohort"),
            "period",
            "n_active",
            "n_cohort",
            (
                F.col("n_active").cast("double")
                / F.col("n_cohort").cast("double")
            ).alias("retention"),
        )
    )
    return out


def event_transitions(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str | None = None,
    include_terminal: bool = False,
) -> DataFrame:
    """Next-event transition counts (the Markov/"flows" diagram behind
    product path analysis): for each consecutive event pair within an
    entity's time-ordered stream, count (from_type, to_type), plus the
    row probability ``p`` = n / sum(n) over each from_type. Equal
    timestamps order by ``order_col`` when given, else by the type
    string itself, so the pairing is deterministic in any engine
    without a frame-order dependency. ``include_terminal=True`` adds a
    NULL to_type row per entity's last event (exit rates). NULL
    timestamps are excluded.

    Shape: one entity exchange for the lag, then a map-side-combinable
    (from, to) count — output cardinality is |types|², independent of
    input size. The per-from denominator joins back by broadcast (the
    transition matrix is tiny by construction).
    """
    from pyspark.sql.window import Window

    selected = (
        df.filter(F.col(ts_col).isNotNull()).select(
            F.col(entity_col).alias("__entity"),
            F.col(ts_col).alias("__ts"),
            F.col(type_col).alias("from_type"),
            *([F.col(order_col).alias("__o")] if order_col else []),
        )
    )
    order = [F.col("__ts")] + (
        [F.col("__o")] if order_col else [F.col("from_type")]
    )
    w = Window.partitionBy("__entity").orderBy(*order)
    paired = selected.withColumn("to_type", F.lead("from_type").over(w))
    if not include_terminal:
        paired = paired.filter(F.col("to_type").isNotNull())
    counts = paired.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n")
    )
    denom = counts.groupBy("from_type").agg(F.sum("n").alias("__d"))
    return counts.join(F.broadcast(denom), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("__d").cast("double")).alias("p"),
    )


def _sliding_scan(steps: list[str], within_us: int | None) -> "callable":
    """Merge fn for the sliding-anchor reach scan. State is
    struct(dp: array<bigint>, pend: array<bigint>, t: bigint): dp[j]
    is the MAXIMUM anchor time among strictly-increasing chains that
    reached step j+1 at a STRICTLY EARLIER timestamp, pend[j] the same
    for chains completed at the CURRENT timestamp. Buffering same-
    timestamp completions in pend enforces t_j > t_{j-1}: an event can
    only extend chains from dp (strictly earlier), never from pend.
    Max-anchor is the Pareto-dominant value: any future event is
    strictly later than every completed chain's last time, so
    feasibility depends only on the anchor (the `within` horizon), and
    a larger anchor is always weakly better."""
    k = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])

    def merge(acc: Column, e: Column) -> Column:
        roll = acc["t"].isNull() | (e["t"] > acc["t"])
        dp1 = F.when(
            roll,
            F.zip_with(acc["dp"], acc["pend"], lambda x, y: F.greatest(x, y)),
        ).otherwise(acc["dp"])
        pend1 = F.when(
            roll,
            F.expr(f"CAST(array_repeat(NULL, {k}) AS array<bigint>)"),
        ).otherwise(acc["pend"])

        # candidate anchor per 0-based step index i — evaluated for
        # EVERY index whose step type matches the event (not just the
        # first occurrence: a repeated step type must be creditable at
        # each of its positions). All candidates read dp1, the
        # pre-update strictly-earlier state, so within one timestamp
        # the updates stay isolated in pend.
        def cand(i: Column) -> Column:
            prev_anchor = F.get(dp1, i - 1)  # NULL when i == 0
            c = F.when(i == 0, e["t"])
            if within_us is None:
                return c.otherwise(prev_anchor)
            return c.otherwise(
                F.when(
                    (e["t"] - prev_anchor) <= F.lit(within_us), prev_anchor
                )
            )

        pend2 = F.transform(
            pend1,
            lambda v, i: F.when(
                F.get(steps_lit, i) == e["y"], F.greatest(v, cand(i))
            ).otherwise(v),
        )
        return F.struct(
            dp1.alias("dp"), pend2.alias("pend"), e["t"].alias("t")
        )

    return merge


def funnel_reached(
    df: DataFrame,
    steps: list[str],
    within: dt.timedelta | None = None,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_events_per_entity: int | None = None,
) -> DataFrame:
    """SLIDING-anchor funnel reach (ClickHouse-windowFunnel-style
    EXISTS semantics — the complement of ``funnel``'s anchored
    min-chain): per entity, ``steps_reached`` is the maximum j such
    that SOME strictly-increasing chain t_1 < ... < t_j with
    type(t_i) = steps[i] fits inside ``within`` of its own t_1 —
    anchored anywhere, not just at the earliest step-1 event. One row
    per entity with steps_reached >= 1.

    Same one-exchange shape as ``funnel``: pre-filter to step types,
    one groupBy(entity), and a greedy max-anchor dynamic program as a
    catalyst `aggregate` lambda (see ``_sliding_scan``) — no windows,
    no k-way self-join. The DuckDB oracle IS the literal k-way EXISTS
    join, so the gate is a semantic differential between two
    independent formulations. Repeated step types are supported: the
    scan credits an event at EVERY position whose type matches.

    ``max_events_per_entity`` is the same hot-entity guard as
    ``funnel``'s (earliest-prefix cap + ``truncated`` flag, one
    row_number on the shared entity exchange); a truncated entity's
    ``steps_reached`` is a lower bound.
    """
    if not steps:
        raise ValueError("funnel_reached requires at least one step")
    within_us = None
    if within is not None:
        within_us = timedelta_to_micros(within)
        if within_us <= 0:
            raise ValueError(f"within must be positive, got {within!r}")
    k = len(steps)
    ev = df.filter(
        F.col(ts_col).isNotNull() & F.col(type_col).isin(list(set(steps)))
    ).select(
        F.col(entity_col).alias("__entity"),
        F.struct(
            micros(F.col(ts_col)).alias("t"),
            F.col(type_col).alias("y"),
        ).alias("__e"),
    )
    nulls = f"CAST(array_repeat(NULL, {k}) AS array<bigint>)"
    init = F.struct(
        F.expr(nulls).alias("dp"),
        F.expr(nulls).alias("pend"),
        F.lit(None).cast("bigint").alias("t"),
    )
    def _agg(col: str) -> Column:
        return F.aggregate(
            F.array_sort(F.collect_list(col)),
            init,
            _sliding_scan(steps, within_us),
            lambda acc: F.zip_with(
                acc["dp"], acc["pend"], lambda x, y: F.greatest(x, y)
            ),
        ).alias("__dp")

    if max_events_per_entity is None:
        scanned = ev.groupBy("__entity").agg(_agg("__e"))
    else:
        capped, trunc = _cap_per_entity(ev, max_events_per_entity)
        scanned = capped.groupBy("__entity").agg(_agg("__kept"), trunc)
    reach = F.size(F.filter(F.col("__dp"), lambda x: x.isNotNull()))
    cols = [
        F.col("__entity").alias(entity_col),
        reach.cast("int").alias("steps_reached"),
    ]
    if max_events_per_entity is not None:
        cols.append(F.col("__trunc").alias("truncated"))
    return scanned.select(*cols).filter(F.col("steps_reached") >= 1)
