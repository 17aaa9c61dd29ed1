"""Deterministic, distributed synthetic-data generation.

Spark-first re-expression of the reference's synthetic-data generators
(``testing/synth_data_generator/synth_col_generators.py:50-144``,
``synth_prediction_times_generator.py:18-75``,
``synth_data_generator/utils.py:12-34``). The reference draws
``np.random`` samples into a single pandas frame on one node; at the
scale this engine targets the generator itself has to be a distributed
job, and for testing it has to be REPRODUCIBLE. So every draw here is a
pure function of ``(seed, sample_id, column)`` via md5 — the same
randomness-free scaffold the packing/sampling family uses
(``operators/pipeline._hash_u32``). Consequences:

- no RNG state anywhere: re-running at any partitioning, any engine,
  yields bit-identical rows (the ``synth_frame`` driver oracle
  recomputes the uniform draws in DuckDB and hash-matches exactly);
- rows come from ``spark.range(n)`` — generation parallelises over the
  id space, so a 10^12-row synthetic corpus is one narrow stage, no
  driver materialisation, no shuffle;
- the uniform family (``uniform_int``/``uniform_float``/
  ``datetime_uniform``) uses only exactly-representable IEEE ops
  (52-bit md5 prefix / 2^52, then one multiply-add), making draws
  bit-identical across engines. The ``normal`` family goes through
  libm (`log`/`cos`), which is deterministic per platform but not
  bit-portable — it is pytest-verified (moment checks) rather than
  oracle-hashed.

Supported ``column_type`` values mirror the reference exactly:
``id``, ``uniform_int``, ``uniform_float``, ``normal``,
``datetime_uniform`` (reference ``synth_col_generators.py:63-88``),
plus the reference's min/max clipping (``:131-136``), logistic outcome
model (``create_outcome_values``, ``:14-48``) and NA injection
(``replace_vals_with_na``, ``utils.py:12-34``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "u01",
    "generate_col",
    "generate_data_columns",
    "generate_synth_frame",
    "create_outcome_values",
    "replace_vals_with_na",
    "generate_synth_data",
]

_TWO_52 = float(1 << 52)

# pandas ``to_datetime(..., unit="D")`` counts from the unix epoch
# (reference synth_col_generators.py:78-88)
_EPOCH = "1970-01-01 00:00:00"


def u01(key: Column, salt: str) -> Column:
    """Uniform [0, 1) draw as a pure function of ``(salt, key)``: the
    first 13 md5 hex digits (52 bits — every value exact in a double)
    over 2^52. Integer-to-double and the power-of-two division are both
    exact, so any engine recomputing the same md5 arithmetic gets the
    bit-identical double."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(_TWO_52)
    )


def _u01_pair(key: Column, salt: str) -> tuple[Column, Column]:
    """Two independent draws from ONE md5 evaluation (hex digits 1-13
    and 14-26) — Box-Muller needs a pair per sample."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    u1 = F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(_TWO_52)
    u2 = F.conv(F.substring(h, 14, 13), 16, 10).cast("double") / F.lit(_TWO_52)
    return u1, u2


def generate_col(
    column_type: str,
    col_specs: dict,
    *,
    id_col: str = "sample_id",
    seed: str = "synth",
    col_name: str = "",
) -> Column:
    """One synthetic column as a Spark ``Column`` over ``id_col``
    (reference ``generate_col_from_specs``,
    ``synth_col_generators.py:50-88``). The draw is salted by
    ``seed:col_name`` so distinct columns of the same type are
    independent."""
    key = F.col(id_col)
    salt = f"{seed}:{col_name}:"
    if column_type == "id":
        # reference: -np.arange(n_samples)
        return (-key).cast("long")
    if column_type == "uniform_int":
        lo, hi = float(col_specs["min"]), float(col_specs["max"])
        # np.random.randint: high exclusive
        return (F.lit(lo) + F.floor(u01(key, salt) * F.lit(hi - lo))).cast(
            "long"
        )
    if column_type == "uniform_float":
        lo, hi = float(col_specs["min"]), float(col_specs["max"])
        return F.lit(lo) + u01(key, salt) * F.lit(hi - lo)
    if column_type == "normal":
        mean = float(col_specs["mean"])
        sd = float(col_specs["sd"])
        u1, u2 = _u01_pair(key, salt)
        # Box-Muller; 1-u1 keeps log() off exact zero
        z = F.sqrt(-2.0 * F.log(1.0 - u1)) * F.cos(
            F.lit(2.0 * math.pi) * u2
        )
        return F.lit(mean) + F.lit(sd) * z
    if column_type == "datetime_uniform":
        lo, hi = float(col_specs["min"]), float(col_specs["max"])
        days = F.lit(lo) + u01(key, salt) * F.lit(hi - lo)
        # reference rounds to the minute (pandas .round("min") — half to
        # even, hence bround)
        minutes = F.bround(days * F.lit(1440.0), 0)
        return F.timestamp_seconds((minutes * 60).cast("long"))
    raise ValueError(f"Unknown distribution: {column_type}")


def generate_data_columns(
    df: DataFrame,
    predictors: list[dict],
    *,
    id_col: str = "sample_id",
    seed: str = "synth",
) -> DataFrame:
    """Append every column described by ``predictors`` (a list of
    ``{col_name: {column_type, ...}}`` dicts, the reference's exact spec
    shape — ``synth_col_generators.py:91-144``) to ``df``. Applies the
    reference's min/max clipping to non-datetime columns (``:131-136``);
    clipping matters for ``normal`` draws, the uniforms are in-range by
    construction."""
    cols = [F.col(c) for c in df.columns]
    for predictor_spec in predictors:
        for col_name, props in predictor_spec.items():
            ctype = props["column_type"]
            c = generate_col(
                ctype, props, id_col=id_col, seed=seed, col_name=col_name
            )
            # the reference clips every non-datetime column with
            # min/max; here only the normal family needs it — uniforms
            # are in-range by construction (the reference's clip on
            # them is an identity), and clipping a long column against
            # float literals would silently promote its type
            if ctype == "normal":
                if "min" in props:
                    c = F.greatest(c, F.lit(float(props["min"])))
                if "max" in props:
                    c = F.least(c, F.lit(float(props["max"])))
            cols.append(c.alias(col_name))
    return df.select(*cols)


def generate_synth_frame(
    spark: SparkSession,
    predictors: list[dict],
    n_samples: int,
    *,
    seed: str = "synth",
    id_col: str = "sample_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed frame of ``n_samples`` rows with one ``id_col``
    column (0..n-1) plus every spec'd column. ``spark.range`` splits the
    id space across ``num_partitions`` (defaults to
    ``spark.sparkContext.defaultParallelism``), so generation is a
    single narrow stage at any scale."""
    if n_samples < 0:
        raise ValueError(f"n_samples must be >= 0, got {n_samples}")
    parts = num_partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_samples, 1, parts).withColumnRenamed(
        "id", id_col
    )
    return generate_data_columns(base, predictors, id_col=id_col, seed=seed)


def create_outcome_values(
    df: DataFrame,
    logistic_outcome_model: str,
    *,
    intercept: float = 0.0,
    noise_mean_sd: tuple[float, float] = (0.0, 1.0),
    id_col: str = "sample_id",
    seed: str = "synth",
    outcome_col: str = "outcome_prob",
) -> DataFrame:
    """Logistic outcome probabilities from a ``'w1*col1+w2*col2'`` model
    string (reference ``create_outcome_values``,
    ``synth_col_generators.py:14-48``): linear combination -> z-score
    (population sd, matching ``scipy.stats.zscore``'s ddof=0 default)
    -> + gaussian noise -> sigmoid ``1/(1+exp(y))``. The z-score needs
    the global mean/sd — one map-side-combined aggregate broadcast back
    via a literal-free crossJoin of a 1-row frame, not a collect-loop.

    A constant model (sd = 0 — e.g. n_samples=1 or a degenerate
    column) yields NaN probabilities, mirroring ``scipy.stats.zscore``
    of a constant vector exactly; ``generate_synth_data`` then
    binarises NaN to outcome 0, which is what the reference's
    ``np.where(nan < p, 1, 0)`` does too. Spark's non-ANSI 0/0 would
    have produced NULL instead — close, but a silent semantic drift,
    hence the explicit NaN."""
    y = F.lit(float(intercept))
    for term in logistic_outcome_model.split("+"):
        effect, col = term.split("*")
        y = y + F.lit(float(effect)) * F.col(col.strip())
    with_y = df.withColumn("__y", y)
    stats = with_y.agg(
        F.avg("__y").alias("__y_mean"),
        F.stddev_pop("__y").alias("__y_sd"),
    )
    u1, u2 = _u01_pair(F.col(id_col), f"{seed}:__noise:")
    noise = F.lit(float(noise_mean_sd[0])) + F.lit(
        float(noise_mean_sd[1])
    ) * F.sqrt(-2.0 * F.log(1.0 - u1)) * F.cos(F.lit(2.0 * math.pi) * u2)
    z = F.when(
        F.col("__y_sd") != 0.0,
        (F.col("__y") - F.col("__y_mean")) / F.col("__y_sd"),
    ).otherwise(F.lit(float("nan")))
    prob = 1.0 / (1.0 + F.exp(z + noise))
    return (
        with_y.crossJoin(F.broadcast(stats))
        .withColumn(outcome_col, prob)
        .drop("__y", "__y_mean", "__y_sd")
    )


def replace_vals_with_na(
    df: DataFrame,
    na_prob: float,
    *,
    na_ignore_cols: list[str] | None = None,
    id_col: str = "sample_id",
    seed: str = "synth",
) -> DataFrame:
    """Independently NULL each (row, column) cell with probability
    ``na_prob`` (reference ``utils.py:12-34``), as a deterministic
    per-cell md5 draw salted by the column name. ``id_col`` and
    ``na_ignore_cols`` pass through untouched."""
    if not 0.0 <= na_prob <= 1.0:
        raise ValueError(f"na_prob must be in [0, 1], got {na_prob}")
    ignore = set(na_ignore_cols or []) | {id_col}
    out = []
    for name in df.columns:
        if name in ignore:
            out.append(F.col(name))
            continue
        draw = u01(F.col(id_col), f"{seed}:__na:{name}:")
        out.append(
            F.when(draw < F.lit(float(na_prob)), F.lit(None))
            .otherwise(F.col(name))
            .alias(name)
        )
    return df.select(*out)


def generate_synth_data(
    spark: SparkSession,
    predictors: list[dict],
    outcome_column_name: str,
    n_samples: int,
    logistic_outcome_model: str,
    *,
    intercept: float = 0.0,
    na_prob: float | None = 0.1,
    na_ignore_cols: list[str] | None = None,
    prob_outcome: float = 0.08,
    noise_mean_sd: tuple[float, float] = (0.0, 1.0),
    seed: str = "synth",
    id_col: str = "sample_id",
) -> DataFrame:
    """Full mirror of the reference's top-level generator
    (``synth_prediction_times_generator.py:18-75``): spec'd columns,
    logistic outcome binarised at ``prob_outcome``, then NA injection
    over the predictor columns (the outcome is computed BEFORE NAs, as
    in the reference, and is excluded from injection alongside
    ``na_ignore_cols``)."""
    df = generate_synth_frame(
        spark, predictors, n_samples, seed=seed, id_col=id_col
    )
    df = create_outcome_values(
        df,
        logistic_outcome_model,
        intercept=intercept,
        noise_mean_sd=noise_mean_sd,
        id_col=id_col,
        seed=seed,
        outcome_col="__prob",
    )
    df = df.withColumn(
        outcome_column_name,
        F.when(F.col("__prob") < F.lit(float(prob_outcome)), 1).otherwise(0),
    ).drop("__prob")
    if na_prob:
        df = replace_vals_with_na(
            df,
            na_prob,
            na_ignore_cols=(na_ignore_cols or []) + [outcome_column_name],
            id_col=id_col,
            seed=seed,
        )
    return df
