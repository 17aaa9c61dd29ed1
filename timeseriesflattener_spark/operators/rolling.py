"""Per-observation trailing-window statistics, counter rates, and
visualization downsampling over raw event streams.

These are the observability-side timeseries primitives the reference's
flatten step assumes already happened upstream (the reference consumes
pre-shaped predictor frames — `src/timeseriesflattener/main.py` — and
has no raw-stream operators): rolling anomaly scores at every
observation, PromQL-style counter ``increase`` per bucket (reset-aware),
the M4 min/max/first/last downsample (Jugel et al., VLDB 2014) that
renders a billion-point series into the <= 4 points per pixel column a
plot can actually show, time-decayed EWMA for irregular cadences,
seasonal ("normal for 3am?") profile z-scores, fixed-width value
histograms, exact per-bucket quantiles, and cross-signal Pearson
correlation on bucket-aligned means.

Scale shape (100 TB): every operator here shuffles at most once or
twice, always keyed on the entity (plus slot/bucket refinements) — the
same partitioning every per-entity op in this repo (sessionize, asof,
flatten) already uses. Rolling stats are a single window pass ordered by
event time with a RANGE frame (whole-stage codegen, no Python);
counter_increase is lag + one map-side-combined groupBy; downsample_m4
is ONE groupBy with min/max-of-struct aggregates (4 orderings in one
hash aggregate, partial merge on the map side), emitting <= 4 rows per
(entity, bucket) regardless of input density; ewma is the one Python
crossing (an O(n) per-entity recurrence no window frame expresses),
Arrow-batched; seasonal_baseline is one whole-partition Window;
value_histogram and signal_corr are pure map-side-combined aggregates.

Cross-engine determinism (the repo-wide "exact partials" contract,
proven by the rollup tier oracles): statistics are ACCUMULATED as
count/sum/sum-of-squares partials in the input column's native type —
feed an integer column (e.g. cents) and every partial is an exact
integer in ANY accumulation order and ANY engine — and the final
mean/std/z doubles are derived from those partials by ONE pinned
arithmetic expression (a short chain of IEEE-exact ops: cast, divide,
subtract, sqrt), so two engines computing the same formula over the
same integers produce bit-identical doubles.  Derived doubles are
emitted RAW (never rounded, never DECIMAL-cast: a rounding step turns
a last-ulp difference into a visible flip, and DECIMAL output types
normalize differently across client fetch paths).  Window frames are
RANGE frames over integer epoch-microsecond keys so timestamp peers
land in the same frame in every engine, and every argmin/argmax tie is
broken inside an explicit struct ordering.  Callers feeding float
columns get the same formulas over order-dependent float sums —
fine within one engine, not reproducible across engines.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence
from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType
from pyspark.sql.window import Window

from ..functions.timeutils import micros
from ..plans.rollup import floor_to_width
from ..specs import require_positive_micros as _require_positive


def _moment_stats(
    v: Column, n: Column, s1: Column, s2: Column, min_periods: int
) -> tuple[Column, Column, Column]:
    """The pinned finalize shared by rolling_stats and seasonal_baseline:
    (mean, std, z) from exact (count, sum, sum-of-squares) partials.

    Formula text is part of the cross-engine contract — the DuckDB
    oracles state literally ``s/n``, ``sqrt((ss - s*s/n)/(n-1))`` and
    ``(v - s/n) / sqrt(...)`` over partials cast to DOUBLE, so every
    FP operation happens in the same order in both engines. std/z are
    NULL below ``min_periods`` or when the window is constant
    (``ss - s*s/n <= 0``): a too-young or flat series is "no evidence",
    never ±inf."""
    s1d, s2d, vd = s1.cast("double"), s2.cast("double"), v.cast("double")
    mean = s1d / n
    var_num = s2d - s1d * s1d / n
    std = F.sqrt(var_num / (n - F.lit(1)))
    ok_std = n >= F.lit(min_periods)
    ok_z = ok_std & (var_num > 0)
    return (
        mean,
        F.when(ok_std, std),
        F.when(ok_z, (vd - s1d / n) / F.sqrt(var_num / (n - F.lit(1)))),
    )


def rolling_stats(
    df: DataFrame,
    window: dt.timedelta,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    min_periods: int = 2,
) -> DataFrame:
    """Trailing-window statistics AT EVERY OBSERVATION: for each input
    row, the count / mean / sample-stddev of ``value_col`` over the
    entity's events in ``[ts - window, ts]`` (both ends inclusive, the
    v2 flatten convention), plus ``roll_z`` — the z-score of the current
    value against that trailing window — the standard streaming anomaly
    score. ``roll_std``/``roll_z`` are NULL when the frame holds fewer
    than ``min_periods`` points or the window is constant: a too-young
    or flat series is "no evidence", never ±inf.

    Unlike ``Flattener`` (stats at chosen prediction times) this scores
    every event — the shape needed for alerting/outlier-tagging passes.

    One exchange (entity), ONE window pass: the three partials (count,
    sum, sum of squares) are window expressions over the same
    (partition, order, frame) spec emitted in a single ``select``, so
    Catalyst plans exactly one Window node with one Sort — a
    ``withColumn`` chain would plan one Window+Sort per column. The
    RANGE frame is over integer epoch-micros, so rows with identical
    timestamps are frame peers and get identical stats and the result
    is partition- and arrival-order-free. Partials accumulate in the
    input column's native type (module contract: integer input =>
    bit-reproducible doubles; the caller owns not overflowing
    sum(v*v) at the feeding scale), and mean/std/z are the pinned
    ``_moment_stats`` finalize. Stats stay in whole-stage codegen;
    nothing leaves the JVM. Appends columns; all input columns pass
    through."""
    us = _require_positive("window", window)
    if min_periods < 2:
        raise ValueError(f"min_periods must be >= 2, got {min_periods}")
    w = (
        Window.partitionBy(entity_col)
        .orderBy(micros(F.col(ts_col)))
        .rangeBetween(-us, 0)
    )
    v = F.col(value_col)
    n = F.count(v).over(w)
    s1 = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    mean, std, z = _moment_stats(v, n, s1, s2, min_periods)
    return df.select(
        "*",
        n.alias("roll_n"),
        mean.alias("roll_mean"),
        std.alias("roll_std"),
        z.alias("roll_z"),
    )


def counter_increase(
    df: DataFrame,
    bucket: dt.timedelta,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = "event_id",
    monotonic: bool = False,
) -> DataFrame:
    """Per-``bucket`` increase of a cumulative counter, reset-aware
    (PromQL ``increase`` semantics, rate()'s building block): within
    each entity, order samples by time, take adjacent deltas, and treat
    a NEGATIVE delta as a counter reset — the post-reset VALUE is the
    increase (the counter restarted from 0 and climbed back). Each
    delta is attributed to the bucket of its LATER sample; an entity's
    first-ever sample contributes nothing (no predecessor — PromQL
    drops it too). A NULL sample (failed scrape) contributes nothing
    itself but does NOT break the chain: the delta runs from the last
    NON-NULL sample, so the increase across the gap is preserved.
    Returns one row per (entity, bucket_start) that saw at least one
    delta: ``(entity, bucket_start, increase, n_deltas)``; ``increase``
    keeps the input column's type (module contract: integer input =>
    exact integer output, any engine).

    ``monotonic=True`` asserts the no-reset fast path: negative deltas
    raise instead of being reinterpreted, catching broken feeds where a
    gauge was wired into a counter pipeline.

    ``order_col`` breaks equal-timestamp ties so the predecessor is
    deterministic under any partitioning; pass None only when
    (entity, ts) is known unique.

    One exchange on the entity key for the predecessor pass; the bucket
    groupBy then combines map-side (each task already holds whole
    entities, so the second aggregation shuffles at most one partial
    row per (entity, bucket) — in Spark the optimizer reuses the entity
    exchange because bucket is a function of ts within the entity
    partition)."""
    us = _require_positive("bucket", bucket)
    order: list[Column] = [micros(F.col(ts_col))]
    if order_col is not None:
        order.append(F.col(order_col))
    w = Window.partitionBy(entity_col).orderBy(*order)
    v = F.col(value_col)
    # last non-NULL predecessor, not lag(): a NULL scrape between two
    # samples must not swallow the bridging increase
    prev = F.last(v, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    delta = v - prev
    if monotonic:
        contrib = F.when(
            delta < 0,
            F.raise_error(
                F.concat(
                    F.lit("counter_increase(monotonic=True): negative delta "),
                    delta.cast("string"),
                    F.lit(" for entity "),
                    F.col(entity_col).cast("string"),
                )
            ).cast(df.schema[value_col].dataType),
        ).otherwise(delta)
    else:
        contrib = F.when(delta < 0, v).otherwise(delta)
    bucketed = df.withColumn("__contrib", contrib).withColumn(
        "__bucket_us", floor_to_width(micros(F.col(ts_col)), us)
    )
    return (
        bucketed.filter(F.col("__contrib").isNotNull())
        .groupBy(
            F.col(entity_col).alias("entity"),
            F.timestamp_micros(F.col("__bucket_us")).alias("bucket_start"),
        )
        .agg(
            F.sum("__contrib").alias("increase"),
            F.count(F.lit(1)).alias("n_deltas"),
        )
    )


def downsample_m4(
    df: DataFrame,
    bucket: dt.timedelta,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """M4 downsampling (Jugel et al., "M4: A Visualization-Oriented Time
    Series Data Aggregation", VLDB 2014): per (entity, bucket) keep the
    FIRST, LAST, MIN and MAX points — the exact set needed for a
    pixel-perfect line rendering of the bucket, and the standard
    preview/dashboard reduction for raw series. Emits ONE wide row per
    (entity, bucket_start): ``first_ts first_val min_ts min_val max_ts
    max_val last_ts last_val n_points``; values keep the input column's
    type (min/max/first/last SELECT an input value, they never
    accumulate — integer in, integer out).

    Ties are deterministic by construction: first/last order by
    (ts, value) — equal-timestamp duplicates resolve to the smaller /
    larger value — and min/max order by (value, ts), so the min point
    is the EARLIEST minimal sample and the max point the LATEST maximal
    sample. Each argmin/argmax is a lexicographic min/max over an
    explicit struct, identical in every engine. NULL values/timestamps
    sort engine-dependently inside struct comparisons — drop or impute
    them upstream (the quality/gap-fill operators) before downsampling.

    ONE map-side-combined aggregate, one exchange on (entity, bucket):
    the 4 struct min/max partials merge associatively, so a 100 TB scan
    reduces locally to <= 1 partial row per group per task before the
    shuffle. Struct aggregation buffers aren't UnsafeRow-mutable, so
    Spark plans this as a SortAggregate (partial_min/max BEFORE the
    exchange — pinned) rather than a hash aggregate: each task pays one
    in-memory sort by (entity, bucket) but never spills more than its
    partial rows, and the shuffle itself stays <= one row per group per
    task. Output is <= 4 points per group no matter how dense the input
    — the 100× cliff is capped by ceil(span/bucket) × entities, not by
    input rows."""
    us = _require_positive("bucket", bucket)
    ts_us = micros(F.col(ts_col))
    grouped = df.groupBy(
        F.col(entity_col).alias("entity"),
        F.timestamp_micros(floor_to_width(ts_us, us)).alias("bucket_start"),
    ).agg(*m4_agg_exprs(ts_us, F.col(value_col)))
    return m4_finalize(grouped)


def m4_agg_exprs(ts_us: Column, value: Column) -> list[Column]:
    """The M4 aggregate set — THE single definition of the tie-break
    contract (first/last by (ts, value); min/max by (value, ts)),
    shared by batch ``downsample_m4`` and the streaming twin
    (``streaming.windowed.m4_partials``) so the two can never drift
    apart. ``ts_us`` must be integer epoch-micros. The value keeps its
    native type (selection ops, never accumulation)."""
    by_time = F.struct(ts_us.alias("t"), value.alias("v"))
    by_value = F.struct(value.alias("v"), ts_us.alias("t"))
    return [
        F.min(by_time).alias("__first"),
        F.max(by_time).alias("__last"),
        F.min(by_value).alias("__min"),
        F.max(by_value).alias("__max"),
        F.count(F.lit(1)).alias("n_points"),
    ]


def m4_finalize(grouped: DataFrame) -> DataFrame:
    """Unpack the ``m4_agg_exprs`` structs to the public wide schema
    (``entity, bucket_start, first_ts/val, min, max, last, n_points``);
    values pass through in their native type."""
    return grouped.select(
        "entity",
        "bucket_start",
        F.timestamp_micros(F.col("__first.t")).alias("first_ts"),
        F.col("__first.v").alias("first_val"),
        F.timestamp_micros(F.col("__min.t")).alias("min_ts"),
        F.col("__min.v").alias("min_val"),
        F.timestamp_micros(F.col("__max.t")).alias("max_ts"),
        F.col("__max.v").alias("max_val"),
        F.timestamp_micros(F.col("__last.t")).alias("last_ts"),
        F.col("__last.v").alias("last_val"),
        "n_points",
    )


def ewma(
    df: DataFrame,
    halflife: dt.timedelta,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-decayed exponentially-weighted mean at every observation
    for IRREGULARLY spaced series: each prior point's weight is
    ``0.5 ** (Δt / halflife)`` (pandas ``ewm(halflife=..., times=...)``
    semantics, adjust=True), so the smoothing horizon is WALL-CLOCK
    time, not a row count — the correct baseline for event streams
    whose cadence varies per entity. Appends ``ewma`` (double).

    Semantics: rows with identical timestamps are peers — they all
    receive the same ewma, computed over every point at-or-before that
    timestamp, regardless of arrival or partition order. NULL values
    carry no weight (the row still gets the mean of its history); a row
    with no non-NULL history yet gets NULL. A NULL-timestamp row has
    no position in time: it gets NULL and contributes no history.

    This is a per-entity linear recurrence (``num/den`` decay-and-add),
    which no Spark window frame expresses — weights depend on the
    CURRENT row's timestamp. It runs as ONE entity exchange into an
    Arrow-batched ``applyInPandas`` doing the O(n) two-accumulator scan
    (numerically stable: the decay factor is always <= 1, so
    accumulators never overflow, unlike the closed-form
    ``exp(t/tau)`` factorization). At 100 TB the recurrence
    parallelises across entities; a single entity's history bounds one
    task, same contract as sessionize/pack_documents.

    Cross-engine reproducibility: the recurrence is pinned to one
    operation ORDER — per distinct timestamp, ``d = 0.5 ** (Δt_ns /
    halflife_ns)``, ``num = num * d + sum(block values)``, ``den =
    den * d + count(block values)``, ``ewma = num / den`` — so a SQL
    twin replaying the same recurrence (order-pinned recursive CTE)
    over the same inputs executes the same float ops in the same order
    and reproduces the doubles bit-for-bit (pow/mul/add/div resolve to
    the platform libm in both this scan and a C-engine oracle; feed an
    integer column to make the block sums exact — the entry-point
    query's cents channel). The output is emitted RAW, never rounded."""
    us = _require_positive("halflife", halflife)

    out_schema = StructType(
        list(df.schema.fields) + [StructField("ewma", DoubleType())]
    )
    hl_ns = float(us) * 1000.0

    def _scan(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        ts = pd.to_datetime(pdf[ts_col]).astype("datetime64[ns]")
        # a NULL timestamp has no position in time: it neither receives
        # an ewma nor contributes history (NaT's int64 is INT64_MIN —
        # left in, the delta subtraction would wrap around)
        valid = ts.notna().to_numpy()
        t = ts.astype("int64").to_numpy()
        v = pd.to_numeric(pdf[value_col], errors="coerce").to_numpy(dtype=float)
        out = np.full(len(t), np.nan)
        num = den = 0.0
        last = None
        i, n = 0, len(t)
        while i < n:
            if not valid[i]:
                i += 1
                continue
            j = i
            while j + 1 < n and valid[j + 1] and t[j + 1] == t[i]:
                j += 1
            if last is not None:
                d = 0.5 ** ((t[i] - last) / hl_ns)
                num *= d
                den *= d
            blk = v[i : j + 1]
            m = ~np.isnan(blk)
            num += float(blk[m].sum())
            den += float(m.sum())
            if den > 0:
                out[i : j + 1] = num / den
            last = t[i]
            i = j + 1
        pdf["ewma"] = out
        return pdf

    out = df.groupBy(entity_col).applyInPandas(_scan, schema=out_schema)
    # NaN (no history / NULL ts) casts to NULL; the double is emitted
    # raw — the recurrence order above IS the reproducibility contract
    return out.select(
        *df.columns, F.nanvl(F.col("ewma"), F.lit(None)).alias("ewma")
    )


def seasonal_baseline(
    df: DataFrame,
    period: dt.timedelta = dt.timedelta(days=1),
    slot: dt.timedelta = dt.timedelta(hours=1),
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    min_periods: int = 3,
) -> DataFrame:
    """Seasonal-profile z-score: score every observation against the
    entity's OWN history for the same phase of a recurring ``period``
    (default: same hour-of-day) — the standard "is this normal for
    3am?" anomaly baseline that a plain trailing window cannot express.
    Appends ``slot`` (0-based slot index within the period),
    ``season_n``, ``season_mean``, ``season_std``, ``season_z`` —
    std/z NULL below ``min_periods`` or on flat slots. The baseline
    INCLUDES the current point (profile semantics — leave-one-out would
    shift every historical mean when a point arrives late).

    The slot index is pure integer arithmetic on epoch-micros
    (``pmod(t, period) // slot``, UTC — sessions here pin UTC), so it
    is engine- and timezone-independent and correct pre-1970. ONE
    exchange on (entity, slot) and ONE whole-partition Window node (no
    sort needed — the frame is the entire partition); everything stays
    in whole-stage codegen. Partials accumulate in the input column's
    native type and finalize through the pinned ``_moment_stats``
    formulas (module contract: integer input => bit-reproducible
    doubles in any engine).

    ``period`` must be a positive multiple of ``slot`` so slots tile
    the period exactly.
    """
    p_us = _require_positive("period", period)
    s_us = _require_positive("slot", slot)
    if p_us % s_us != 0:
        raise ValueError(
            f"period must be a multiple of slot, got {period!r} % {slot!r}"
        )
    if min_periods < 2:
        raise ValueError(f"min_periods must be >= 2, got {min_periods}")

    slot_idx = (
        F.pmod(micros(F.col(ts_col)), F.lit(p_us)) / F.lit(s_us)
    ).cast("long")
    w = Window.partitionBy(F.col(entity_col), slot_idx)
    v = F.col(value_col)
    n = F.count(v).over(w)
    s1 = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    mean, std, z = _moment_stats(v, n, s1, s2, min_periods)
    return df.select(
        "*",
        slot_idx.alias("slot"),
        n.alias("season_n"),
        mean.alias("season_mean"),
        std.alias("season_std"),
        z.alias("season_z"),
    )


def value_histogram(
    df: DataFrame,
    bin_width: float | int,
    group_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Fixed-width value histogram per group: NULL-value rows are
    excluded, each remaining value lands in the bin
    ``[floor(v / bin_width) * bin_width, +bin_width)`` (floor-toward
    -inf, so negative values bin correctly), and the result is one row
    per non-empty (group, bin): ``(*group_cols, bin_lo, n, total)``.
    The density companion to :func:`downsample_m4` — M4 renders the
    line, this renders the distribution heatmap.

    With an INTEGER ``bin_width`` over an integer value column the
    whole computation is exact integer arithmetic — ``bin_lo`` is
    ``v - pmod(v, w)`` (the floored multiple, correct for negatives via
    the pmod identity, no float division anywhere) and ``total`` an
    exact integer sum — reproducible bit-for-bit in any engine (the
    module's exact-partials contract; feed cents and a cents-scaled
    width). With a float width, bin assignment is a double division +
    floor and ``total`` a float sum — fine within one engine.

    ONE map-side-combined hash aggregate; output is bounded by
    groups x occupied bins, never input rows.
    """
    if not bin_width > 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width!r}")
    v = F.col(value_col)
    if isinstance(bin_width, int):
        w = F.lit(bin_width)
        bin_lo = v - F.pmod(v, w)
    else:
        vd = v.cast("double")
        bin_lo = F.floor(vd / F.lit(float(bin_width))) * F.lit(float(bin_width))
    return (
        df.filter(v.isNotNull())
        .groupBy(*[F.col(c) for c in group_cols], bin_lo.alias("bin_lo"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("total"),
        )
    )


def signal_corr(
    df: DataFrame,
    signals: Sequence[str],
    bucket: dt.timedelta,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    min_buckets: int = 2,
    exact_quantum: int | None = None,
) -> DataFrame:
    """Pairwise Pearson correlation between named signals of the SAME
    entity, after aligning the irregular streams onto a common
    ``bucket`` grid (correlating raw irregular series is meaningless —
    the observations never line up; bucket means are the standard
    alignment). Returns one row per (entity, unordered signal pair):
    ``(entity, sig_a, sig_b, corr, n_buckets)`` — ``corr`` double, NULL
    when fewer than ``min_buckets`` buckets have BOTH signals (or
    either side is constant); ``n_buckets`` is that both-present count.
    Pair order follows the ``signals`` list (sig_a earlier), so output
    keys are deterministic.

    ``exact_quantum=Q`` (requires an integer value column, e.g. cents)
    switches alignment to the FLOOR-QUANTIZED bucket mean
    ``(sum*Q - pmod(sum*Q, n)) / n`` — an exact integer in units of
    1/Q — and computes Pearson from exact integer co-moments
    (n, Σx, Σy, Σxy, Σx², Σy² over both-present buckets) finalized by
    one pinned float expression: bit-reproducible in any engine (the
    module contract), at the cost of quantizing each bucket mean by
    <= 1/Q. Pearson is scale-invariant, so the quantum's unit drops
    out. With ``exact_quantum=None`` the alignment is the plain float
    bucket mean and the co-moments are float sums (one-engine only).

    Two map-side-combined aggregates, no joins and no pivot shuffle:
    stage 1 reduces the stream to one row per (entity, bucket) with one
    conditional column per signal; stage 2 computes all k(k-1)/2
    pairwise co-moments in ONE aggregate over those reduced rows, then
    an explode-of-struct-array projection unpivots to long form. Cost
    is bounded by entities x buckets, not input rows; the signal list
    is a fixed O(k^2) column budget, not a data-dependent pivot.
    Caller owns co-moment magnitude: quantized means times Q must keep
    Σx² under 2^63 at the feeding scale.
    """
    us = _require_positive("bucket", bucket)
    sigs = list(signals)
    if len(sigs) < 2:
        raise ValueError(f"need >= 2 signals, got {sigs!r}")
    if len(set(sigs)) != len(sigs):
        raise ValueError(f"duplicate signals in {sigs!r}")
    if min_buckets < 2:
        raise ValueError(f"min_buckets must be >= 2, got {min_buckets}")
    if exact_quantum is not None and exact_quantum < 1:
        raise ValueError(f"exact_quantum must be >= 1, got {exact_quantum!r}")

    v = F.col(value_col)
    if exact_quantum is not None:
        q = F.lit(exact_quantum)

        def _aligned_val(i: int, s: str) -> Column:
            sv = F.sum(F.when(F.col(type_col) == s, v))
            nn = F.count(F.when(F.col(type_col) == s, v))
            num = sv * q
            # floor-quantized mean: exact multiple of nn, so the double
            # division is exact and the long cast lossless
            return ((num - F.pmod(num, nn)) / nn).cast("long").alias(f"__s{i}")

    else:

        def _aligned_val(i: int, s: str) -> Column:
            return F.avg(F.when(F.col(type_col) == s, v.cast("double"))).alias(
                f"__s{i}"
            )

    aligned = (
        df.filter(F.col(type_col).isin(sigs))
        .groupBy(
            F.col(entity_col).alias("entity"),
            floor_to_width(micros(F.col(ts_col)), us).alias("__b"),
        )
        .agg(*[_aligned_val(i, s) for i, s in enumerate(sigs)])
    )
    # Pearson from co-moments rather than F.corr: under ANSI mode corr
    # raises DIVIDE_BY_ZERO on a constant side, while the contract here
    # is NULL ("no evidence"). Pairwise deletion masks every sum to
    # both-present rows (a bucket where only one signal fired must not
    # widen the other's spread).
    aggs, pairs = [], []
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            ci, cj = F.col(f"__s{i}"), F.col(f"__s{j}")
            both = ci.isNotNull() & cj.isNotNull()
            aggs.append(
                F.count(F.when(both, F.lit(1))).alias(f"__n_{i}_{j}")
            )
            aggs.append(F.sum(F.when(both, ci)).alias(f"__sx_{i}_{j}"))
            aggs.append(F.sum(F.when(both, cj)).alias(f"__sy_{i}_{j}"))
            aggs.append(F.sum(F.when(both, ci * cj)).alias(f"__sxy_{i}_{j}"))
            aggs.append(F.sum(F.when(both, ci * ci)).alias(f"__sxx_{i}_{j}"))
            aggs.append(F.sum(F.when(both, cj * cj)).alias(f"__syy_{i}_{j}"))
            pairs.append((i, j))
    wide = aligned.groupBy("entity").agg(*aggs)
    # unpivot to long form; pure projection (CASE branches evaluate
    # lazily, so the division never fires on a constant/thin pair).
    # Finalize formula text pinned (mirrored by the SQL oracle):
    # num = sxy - sx*sy/n; dx = sxx - sx*sx/n; dy = syy - sy*sy/n;
    # corr = num / (sqrt(dx) * sqrt(dy)) — partials cast to double first
    parts = []
    for i, j in pairs:
        n = F.col(f"__n_{i}_{j}")
        sx = F.col(f"__sx_{i}_{j}").cast("double")
        sy = F.col(f"__sy_{i}_{j}").cast("double")
        sxy = F.col(f"__sxy_{i}_{j}").cast("double")
        sxx = F.col(f"__sxx_{i}_{j}").cast("double")
        syy = F.col(f"__syy_{i}_{j}").cast("double")
        dx = sxx - sx * sx / n
        dy = syy - sy * sy / n
        gate = F.when(
            (n >= F.lit(min_buckets)) & (dx > 0) & (dy > 0),
            (sxy - sx * sy / n) / (F.sqrt(dx) * F.sqrt(dy)),
        )
        parts.append(
            F.struct(
                F.lit(sigs[i]).alias("sig_a"),
                F.lit(sigs[j]).alias("sig_b"),
                gate.alias("corr"),
                n.alias("n_buckets"),
            )
        )
    return wide.select(
        "entity", F.explode(F.array(*parts)).alias("__p")
    ).select("entity", "__p.sig_a", "__p.sig_b", "__p.corr", "__p.n_buckets")


def _quantile_fraction(q: float) -> Fraction:
    frac = Fraction(str(q)).limit_denominator(10**6)
    if not 0 < frac < 1:
        raise ValueError(f"quantiles must be in (0, 1), got {q!r}")
    return frac


def bucket_quantiles(
    df: DataFrame,
    bucket: dt.timedelta,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """EXACT per-(entity, bucket) quantiles — p50/p95/p99 latency
    percentiles, the canonical observability rollup. One map-side-
    combined aggregate emitting ``(entity, bucket_start, n, p50, p95,
    ...)``; quantile columns are named from the q values (0.5 -> p50,
    0.999 -> p99_9) and hold the CONTINUOUS (linear-interpolation,
    type-7) quantile as a double. NULL values carry no weight (``n``
    counts non-NULL; all-NULL buckets keep the row with NULL
    quantiles).

    The interpolation is stated EXPLICITLY as order statistics rather
    than delegated to an engine quantile primitive (whose index/
    midpoint formulas drift across engines and versions): with q =
    num/den exact and the group's sorted non-NULL values a[0..n-1],
    ``h = (n-1)*num``, ``idx = floor(h/den)``, ``rem = h - idx*den``
    (all exact integers), and the result is the single pinned float
    expression ``(a[idx]*den + (a[idx+1]-a[idx])*rem) / den`` — for an
    integer value column the numerator is an exact integer, so the
    quantile is one IEEE division and bit-reproducible in any engine
    (the module contract); identical in real arithmetic to
    quantile_cont/percentile.

    Exactness vs mergeability: the sorted-array aggregate buffers each
    group's values (exactly like Spark's own ``percentile``), so task
    memory is bounded by the largest (entity, bucket) group — the
    right tool for bounded buckets needing exact tails. For unbounded
    groups or cross-tier re-aggregation use the DDSketch quantile
    tiers (``plans/sketch.py``): mergeable, fixed-size state,
    rank-error-bounded.
    """
    us = _require_positive("bucket", bucket)
    qlist = list(qs)
    if not qlist:
        raise ValueError("qs must be non-empty")
    if len(set(qlist)) != len(qlist):
        raise ValueError(f"duplicate quantiles in {qlist!r}")
    fracs = [_quantile_fraction(q) for q in qlist]

    def _name(q: float) -> str:
        return "p" + format(q * 100, ".10g").replace(".", "_")

    names = [_name(q) for q in qlist]
    if len(set(names)) != len(names):
        raise ValueError(
            f"quantiles {qlist!r} render to colliding column names {names!r}"
        )

    v = F.col(value_col)
    grouped = df.groupBy(
        F.col(entity_col).alias("entity"),
        F.timestamp_micros(floor_to_width(micros(F.col(ts_col)), us)).alias(
            "bucket_start"
        ),
    ).agg(F.array_sort(F.collect_list(v)).alias("__a"))

    arr, n = F.col("__a"), F.size(F.col("__a"))
    cols = []
    for q, fr, name in zip(qlist, fracs, names):
        num, den = F.lit(fr.numerator), F.lit(fr.denominator)
        h = (n - F.lit(1)) * num
        # h/den lands strictly inside (k, k+1) with margin >= 1/den when
        # not exact, so the double division can't cross an integer
        # boundary and floor is the true floor
        idx = F.floor(h / den)
        rem = h - idx * den
        lo = F.element_at(arr, (idx + F.lit(1)).cast("int"))
        hi = F.when(
            rem > 0, F.element_at(arr, (idx + F.lit(2)).cast("int"))
        ).otherwise(lo)
        val = (lo * den + (hi - lo) * rem).cast("double") / den
        cols.append(F.when(n > 0, val).alias(name))
    return grouped.select(
        "entity",
        "bucket_start",
        n.cast("long").alias("n"),
        *cols,
    )


def cusum(
    df: DataFrame,
    target: float,
    slack: float,
    threshold: float,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = "event_id",
) -> DataFrame:
    """Two-sided CUSUM drift detection (Page 1954) at every
    observation: ``cusum_hi`` accumulates excess above ``target +
    slack``, ``cusum_lo`` deficit below ``target - slack``, both
    clamped at zero; ``alarm_hi``/``alarm_lo`` flag statistics
    exceeding ``threshold``. The sequential recurrence
    ``s_t = max(0, s_{t-1} + d_t)`` is NOT computed in Python: by the
    classic prefix identity ``s_t = p_t - min(0, min_{j<=t} p_j)``
    (p = running sum of deviations), it is two built-in window passes —
    a running sum and a running min — over ONE entity exchange and one
    sort, whole-stage codegen end to end.

    NULL values contribute nothing to the running sums, so the
    statistic HOLDS through a NULL scrape (the row repeats the previous
    state; rows before any observation are NULL). NULL-timestamp rows
    are EXCLUDED (the repo-wide contract — Spark windows order NULLs
    first and SQL engines last, so keeping them would silently diverge
    from any SQL twin). Equal timestamps
    order by ``order_col`` for an engine-independent scan. Integer
    inputs stay in exact integer arithmetic (the oracle runs in the
    cents domain); float inputs follow the engines' shared sequential
    running-aggregate order.
    """
    if slack < 0:
        raise ValueError(f"slack must be >= 0, got {slack!r}")
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold!r}")
    # materialize the sort key ONCE and build each window pair in a
    # single select: per-withColumn window exprs regenerate the
    # micros() sort key, and Catalyst then plans one Window+Sort per
    # stat (the anti-pattern the rolling_stats plan pin guards
    # against). This shape is 2 Window nodes / 1 sort / 1 exchange.
    order = [F.col("__us")] + (
        [F.col(order_col)] if order_col is not None else []
    )
    w = (
        Window.partitionBy(entity_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.col(value_col)
    df = df.filter(F.col(ts_col).isNotNull())
    with_p = df.withColumn("__us", micros(F.col(ts_col))).select(
        "*",
        F.sum(x - F.lit(target + slack)).over(w).alias("__phi"),
        F.sum(F.lit(target - slack) - x).over(w).alias("__plo"),
    )
    s_hi = F.col("__phi") - F.least(F.lit(0), F.min("__phi").over(w))
    s_lo = F.col("__plo") - F.least(F.lit(0), F.min("__plo").over(w))
    return (
        with_p.select(
            "*", s_hi.alias("cusum_hi"), s_lo.alias("cusum_lo")
        )
        .withColumn("alarm_hi", F.col("cusum_hi") > F.lit(threshold))
        .withColumn("alarm_lo", F.col("cusum_lo") > F.lit(threshold))
        .drop("__phi", "__plo", "__us")
    )
