"""End-to-end corpus cleaning pipeline: the standard pre-training
hygiene sequence composed from the individually-verified operators —

    1. quality gate   (C4/Gopher rules, ``text.quality_filter``)
    2. exact dedup    (keep lowest id per normalised text,
                       ``dedup.drop_exact_duplicates``)
    3. near-dup dedup (n-gram Jaccard pairs -> connected components ->
                       keep cluster minimum, ``dedup.ngram_jaccard_pairs``
                       + ``dedup.duplicate_clusters``)
    4. decontamination (drop docs sharing word n-grams with a benchmark
                       set, ``dedup.drop_contaminated``)

``clean_corpus`` returns the AUDIT frame — one row per input doc with
the FIRST stage that dropped it (or ``kept``) — because at 100 TB you
commit a cleaning run only after inspecting per-stage drop rates;
``drop_unclean`` applies it (left-semi join on the kept ids).

Each stage operates on the previous stage's survivors, so drop
attribution is unambiguous (a doc that is both low-quality and a
near-dup reports ``quality``). Scale shape: every stage is the
already-audited distributed formulation (no new shuffles beyond the
component operators); the audit assembles with id-only broadcast-sized
flag joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import (
    drop_contaminated,
    drop_exact_duplicates,
    duplicate_clusters,
    ngram_jaccard_pairs,
)
from .text import quality_filter

#: audit stages in drop order
STAGES = ["quality", "exact_dup", "near_dup", "contaminated", "kept"]


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark: DataFrame | None = None,
    quality_kwargs: dict | None = None,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    max_shingle_freq: int | None = 1000,
    contamination_n: int = 8,
    bench_text_col: str = "text",
    bench_id_col: str = "doc_id",
) -> DataFrame:
    """(id, stage) audit frame for the 4-stage cleaning pipeline; stage
    is the first stage that dropped the doc, or ``kept``."""
    q = quality_filter(df, text_col, id_col, **(quality_kwargs or {}))
    s1 = df.join(q.filter("passed").select(id_col), id_col, "left_semi")

    s2 = drop_exact_duplicates(s1, text_col, id_col)

    pairs = ngram_jaccard_pairs(
        s2,
        k=shingle_k,
        threshold=jaccard_threshold,
        text_col=text_col,
        id_col=id_col,
        max_shingle_freq=max_shingle_freq,
    )
    clusters = duplicate_clusters(s2, pairs.select("doc_a", "doc_b"), id_col=id_col)
    s3 = s2.join(
        clusters.filter(F.col("doc") == F.col("cluster")).select(
            F.col("doc").alias(id_col)
        ),
        id_col,
        "left_semi",
    )

    if benchmark is not None:
        s4 = drop_contaminated(
            s3,
            benchmark,
            n=contamination_n,
            text_col=text_col,
            id_col=id_col,
            bench_text_col=bench_text_col,
            bench_id_col=bench_id_col,
        )
    else:
        s4 = s3

    def flag(surv: DataFrame, name: str) -> DataFrame:
        return surv.select(F.col(id_col), F.lit(True).alias(name))

    audit = (
        df.select(id_col)
        .join(q.select(id_col, "passed"), id_col, "left")
        .join(flag(s2, "__s2"), id_col, "left")
        .join(flag(s3, "__s3"), id_col, "left")
        .join(flag(s4, "__s4"), id_col, "left")
    )
    stage: Column = (
        F.when(~F.col("passed"), F.lit("quality"))
        .when(F.col("__s2").isNull(), F.lit("exact_dup"))
        .when(F.col("__s3").isNull(), F.lit("near_dup"))
        .when(F.col("__s4").isNull(), F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    return audit.select(F.col(id_col), stage.alias("stage"))


def drop_unclean(df: DataFrame, audit: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep only docs the audit marked ``kept``."""
    return df.join(
        audit.filter(F.col("stage") == "kept").select(id_col), id_col, "left_semi"
    )
