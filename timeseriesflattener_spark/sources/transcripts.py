"""Deterministic synthetic conversation-transcript source + channel
derivation.

The engine's primary input (BASELINE.json ``input_hint``) is a table of
multi-turn conversation / agent transcripts:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Everything here is generated *Spark-side* from ``spark.range`` with
hash-derived columns — no driver loops, no Python RNG per row — so the
same (seed, n_conversations) pair produces byte-identical tables at any
parallelism, and generation itself scales to arbitrarily large inputs
(10^12 turns is just a bigger ``spark.range``).

Skew is intentional (north rule axis: a few very long conversations):
every ``heavy_every``-th conversation gets ``heavy_factor`` x the turns,
so downstream groupBys/joins see realistic hot keys.

Timestamps are strictly increasing within a conversation: turn k sits at
``conv_start + k*step + jitter(k)`` with ``jitter < step``.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_VOCAB = [
    "the", "model", "ran", "tool", "call", "plan", "spark", "join", "scan",
    "query", "result", "user", "asked", "about", "data", "pipeline", "batch",
    "stream", "window", "aggregate", "bucket", "shuffle", "partition", "skew",
    "checkpoint", "resume", "retry", "ok", "done", "error",
]

_TOOLS = ["search", "bash", "python", "browser", "editor"]
_EPOCH = dt.datetime(2024, 1, 1)


def _h(seed: int, *cols: Column) -> Column:
    """Deterministic non-negative 31-bit hash of (seed, cols)."""
    return F.pmod(F.hash(F.lit(seed), *cols), F.lit(2_147_483_647))


def synthesize_transcripts(
    spark: SparkSession,
    n_conversations: int = 1000,
    avg_turns: int = 20,
    seed: int = 42,
    heavy_every: int = 200,
    heavy_factor: int = 50,
    start: dt.datetime = _EPOCH,
    span_days: int = 30,
    step_seconds: int = 45,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the transcript table. One row per turn."""
    convs = spark.range(0, n_conversations, 1, num_partitions or spark.sparkContext.defaultParallelism)
    conv = F.col("id")

    base_turns = (_h(seed, conv) % F.lit(2 * avg_turns - 2)) + F.lit(2)
    n_turns = F.when(
        (conv % F.lit(heavy_every)) == F.lit(0), base_turns * F.lit(heavy_factor)
    ).otherwise(base_turns)

    # conversation start offset within the span, whole seconds
    span_seconds = span_days * 86_400
    conv_start_s = _h(seed + 1, conv) % F.lit(span_seconds)

    df = convs.select(
        F.concat(F.lit("conv-"), F.format_string("%08d", conv)).alias("conv_id"),
        conv.alias("__conv_no"),
        conv_start_s.alias("__start_s"),
        F.explode(F.sequence(F.lit(0), (n_turns - 1).cast("int"))).alias("turn_idx"),
    )

    turn = F.col("turn_idx")
    cno = F.col("__conv_no")
    jitter_s = _h(seed + 2, cno, turn) % F.lit(step_seconds)
    ts_micros = (
        F.lit(int(start.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000)
        + (F.col("__start_s") + turn.cast("long") * F.lit(step_seconds) + jitter_s)
        * F.lit(1_000_000)
    )

    role = (
        F.when(turn % 2 == 0, F.lit("user"))
        .otherwise(
            F.when(_h(seed + 3, cno, turn) % 5 == 0, F.lit("tool")).otherwise(F.lit("assistant"))
        )
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]), (_h(seed + 4, cno, turn) % len(_TOOLS) + 1).cast("int")
        ),
    )

    n_words = (_h(seed + 5, cno, turn) % F.lit(40)) + F.lit(3)
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_words.cast("int")),
            lambda i: F.element_at(vocab, (F.pmod(F.hash(F.lit(seed + 6), cno, turn, i), F.lit(len(_VOCAB))) + 1).cast("int")),
        ),
        " ",
    )

    return df.select(
        F.col("conv_id"),
        turn.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_micros(ts_micros).alias("ts"),
    )


def derive_channels(transcripts: DataFrame) -> DataFrame:
    """Project the numeric channels the rollup engine aggregates —
    the transcript-table analog of the reference's value columns
    (FIXTURES.md §1): text length, a whitespace token estimate, and a
    tool-call indicator. Keeps conv_id/turn_idx/ts (and text equality is
    preserved upstream — channels are projections, never mutations)."""
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.length("text").cast("double").alias("text_len"),
        F.size(F.split(F.col("text"), r"\s+")).cast("double").alias("n_tokens"),
        F.col("tool").isNotNull().cast("double").alias("tool_call"),
    )


def write_transcripts(df: DataFrame, path: str, partition_by_day: bool = True) -> None:
    """Materialise as parquet (Iceberg-shaped layout: day-partitioned on
    ts; an Iceberg catalog would replace this with a real table — no
    Iceberg runtime jar ships in this sandbox, SURVEY.md §7.2)."""
    out = df.withColumn("ts_day", F.to_date("ts"))
    writer = out.repartition("ts_day").write.mode("overwrite")
    if partition_by_day:
        writer = writer.partitionBy("ts_day")
    writer.parquet(path)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("ts_day")
