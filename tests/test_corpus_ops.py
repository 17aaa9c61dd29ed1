"""Tests for the round-6 late additions: corpus-level line dedup
(RefinedWeb/MassiveText boilerplate pass), tokenizer-induction vocab
statistics, and deterministic leakage-aware train/val/test splitting.

These are beyond-reference training-pipeline mandate ops; the reference
(timeseriesflattener v2.5.2) has no counterpart surface. Each also has a
full DuckDB oracle in ``__spark_entry__.oracle_sql()``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark.operators.dedup import dedup_lines
from timeseriesflattener_spark.operators.pipeline import split_corpus
from timeseriesflattener_spark.operators.text import adjacent_pairs, vocab_induct


# ---------------------------------------------------------------- dedup_lines


@pytest.fixture(scope="module")
def line_corpus(spark):
    rows = [
        # boilerplate "Subscribe now" appears in docs 1, 2, 3
        (1, "Unique opening line\nSubscribe now\nBody of doc one"),
        (2, "Subscribe now\n\nBody of doc two"),
        (3, "  Subscribe now  \nBody of doc three"),  # trims to same key
        # doc 4: intra-doc duplicate only — NOT removed (1 distinct doc)
        (4, "echo line\necho line\ntail four"),
        # doc 5: every line is boilerplate shared with doc 6
        (5, "shared a\nshared b"),
        (6, "shared a\nshared b\nsix only"),
        # doc 7: single line, unique
        (7, "solo seven"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_lines_removes_cross_doc_boilerplate(spark, line_corpus):
    out = {r["doc_id"]: r for r in dedup_lines(line_corpus).collect()}
    assert out[1]["text"] == "Unique opening line\nBody of doc one"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    # blank line is structure: preserved even though '' trims empty
    assert out[2]["text"] == "\nBody of doc two"
    # whitespace-edge variants share one trimmed key
    assert out[3]["text"] == "Body of doc three"


def test_dedup_lines_intra_doc_duplicates_survive(spark, line_corpus):
    out = {r["doc_id"]: r for r in dedup_lines(line_corpus).collect()}
    # duplicate WITHIN one doc is repetition_stats' business, not ours
    assert out[4]["text"] == "echo line\necho line\ntail four"
    assert out[4]["n_removed"] == 0


def test_dedup_lines_fully_removed_doc_preserved_as_empty(spark, line_corpus):
    out = {r["doc_id"]: r for r in dedup_lines(line_corpus).collect()}
    assert out[5]["text"] == "" and out[5]["n_removed"] == 2
    assert out[6]["text"] == "six only" and out[6]["n_removed"] == 2
    assert out[7]["text"] == "solo seven" and out[7]["n_removed"] == 0
    assert len(out) == 7  # no row vanishes


def test_dedup_lines_min_docs_threshold(spark, line_corpus):
    out = {r["doc_id"]: r for r in dedup_lines(line_corpus, min_docs=4).collect()}
    # 'Subscribe now' spans only 3 docs: below the threshold, kept
    assert out[2]["n_removed"] == 0
    with pytest.raises(ValueError, match="min_docs"):
        dedup_lines(line_corpus, min_docs=1)


def test_dedup_lines_partition_invariance(spark, line_corpus):
    a = sorted(map(tuple, dedup_lines(line_corpus).collect()))
    b = sorted(map(tuple, dedup_lines(line_corpus.repartition(7)).collect()))
    assert a == b


# --------------------------------------------------------------- vocab_induct


def test_adjacent_pairs_unit(spark):
    df = spark.createDataFrame([("a b c",), ("x",), ("",)], ["t"])
    from timeseriesflattener_spark.operators.text import bpe_ish_tokens

    got = df.select(adjacent_pairs(bpe_ish_tokens(F.col("t"))).alias("p")).collect()
    assert [r["p"] for r in got] == [["a b", "b c"], [], []]


def test_vocab_induct_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "aa bb aa bb"), (2, "aa cc, aa")], ["doc_id", "text"]
    )
    # tokens: doc1 [aa bb aa bb]; doc2 [aa cc , aa]
    out = vocab_induct(df, top_terms=2, top_pairs=3)
    rows = {(r["kind"], r["token"]): r["freq"] for r in out.collect()}
    # aa:4 wins; bb:2 vs cc:1 ',':1 — bb second
    assert rows[("term", "aa")] == 4 and rows[("term", "bb")] == 2
    # pairs: doc1 'aa bb','bb aa','aa bb'; doc2 'aa cc','cc ,',', aa'
    assert rows[("pair", "aa bb")] == 2
    # freq-1 pairs tie: lexicographic token order decides which two of
    # {', aa', 'aa cc', 'bb aa', 'cc ,'} fill the remaining top-3 slots
    one_freq = sorted(t for (k, t), f in rows.items() if k == "pair" and f == 1)
    assert one_freq == [", aa", "aa cc"]


def test_vocab_induct_validates(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="top_terms"):
        vocab_induct(df, top_terms=0)


def test_vocab_induct_topk_plan_has_no_total_sort(spark):
    """The top-K must be TakeOrderedAndProject (per-partition heaps),
    never a global Sort + Limit — the difference between moving 2K rows
    and sorting the whole vocabulary at 100 TB."""
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    plan = vocab_induct(df)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort [freq" not in plan


# --------------------------------------------------------------- split_corpus


@pytest.fixture(scope="module")
def fam_docs(spark):
    return spark.createDataFrame(
        [(i, f"fam{i % 17}") for i in range(500)], ["doc_id", "family"]
    )


def test_split_corpus_total_split_covers_everything(spark, fam_docs):
    out = split_corpus(fam_docs, {"train": 0.75, "val": 0.125, "test": 0.125})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert None not in counts and sum(counts.values()) == 500
    # rough proportions at n=500 (md5 is uniform; 3-sigma bands)
    assert 320 <= counts["train"] <= 430
    assert 30 <= counts["val"] <= 100 and 30 <= counts["test"] <= 100


def test_split_corpus_partial_split_leaves_explicit_null_pool(spark, fam_docs):
    out = split_corpus(fam_docs, {"train": 0.5})
    n_null = out.filter(F.col("split").isNull()).count()
    assert 0 < n_null < 500


def test_split_corpus_group_col_prevents_leakage(spark, fam_docs):
    out = split_corpus(
        fam_docs, {"train": 0.6, "test": 0.4}, group_col="family"
    )
    # every family lands wholly inside ONE split
    spread = (
        out.groupBy("family")
        .agg(F.count_distinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert spread == 0


def test_split_corpus_deterministic_and_partition_invariant(spark, fam_docs):
    fr = {"train": 0.75, "val": 0.125, "test": 0.125}
    a = sorted(map(tuple, split_corpus(fam_docs, fr).collect()))
    b = sorted(map(tuple, split_corpus(fam_docs.repartition(13), fr).collect()))
    assert a == b


def test_split_corpus_salt_draws_independent_assignment(spark, fam_docs):
    fr = {"train": 0.5, "test": 0.5}
    a = {r["doc_id"]: r["split"] for r in split_corpus(fam_docs, fr).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_corpus(fam_docs, fr, salt="v2").collect()
    }
    assert any(a[k] != b[k] for k in a)


def test_split_corpus_validates(spark, fam_docs):
    with pytest.raises(ValueError, match="at least one"):
        split_corpus(fam_docs, {})
    with pytest.raises(ValueError, match="sum"):
        split_corpus(fam_docs, {"a": 0.8, "b": 0.3})
    with pytest.raises(ValueError, match="must be in"):
        split_corpus(fam_docs, {"a": 0.0})
    with pytest.raises(ValueError, match="must be in"):
        split_corpus(fam_docs, {"a": -0.1, "b": 0.5})


# ------------------------------------------------------------ chunk_documents


def test_chunk_documents_overlapping_windows(spark):
    from timeseriesflattener_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, ""), (3, "  \n ")],
        ["doc_id", "text"],
    )
    rows = sorted(
        map(tuple, chunk_documents(df, size=4, stride=2).collect())
    )
    # doc 1: starts 0,2,4,6,8; the final window is short
    assert rows == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 2, 4, "t2 t3 t4 t5"),
        (1, 2, 4, 4, "t4 t5 t6 t7"),
        (1, 3, 6, 4, "t6 t7 t8 t9"),
        (1, 4, 8, 2, "t8 t9"),
    ]
    # docs 2/3 (zero tokens) produce zero chunks — and every token of
    # doc 1 is covered at least once
    covered = set()
    for _, _, s, n, _ in rows:
        covered.update(range(s, s + n))
    assert covered == set(range(10))


def test_chunk_documents_disjoint_default_and_validation(spark):
    from timeseriesflattener_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    rows = sorted(map(tuple, chunk_documents(df, size=2).collect()))
    assert [r[4] for r in rows] == ["a b", "c d", "e"]
    with pytest.raises(ValueError, match="size"):
        chunk_documents(df, size=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, size=2, stride=3)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, size=2, stride=0)


def test_chunk_documents_plan_is_shuffle_free(spark):
    """Chunking must stay a pure projection + explode: NO exchange in
    the physical plan — at 100 TB it runs entirely map-side, one pass,
    co-partitioned with the input."""
    from timeseriesflattener_spark.operators.text import chunk_documents

    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("a b c d").alias("text")
    )
    plan = (
        chunk_documents(df, size=2, stride=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ------------------------------------------------------------------- lm_score


def test_lm_score_hand_computed_bigram_model(spark):
    """ref 'a b a' -> c('a b')=1, c('b a')=1, V=2, c_left(a)=1,
    c_left(b)=1. Scoring 'a b c': P(b|a)=(1+1)/(1+2), P(c|b)=(0+1)/(1+2)
    -> mean(-log2) = log2(3) - 0.5. Scoring 'c a' (unseen left word):
    P(a|c)=(0+1)/(0+2) -> score 1.0."""
    import math

    from timeseriesflattener_spark.operators.text import lm_score

    ref = spark.createDataFrame([(100, "a b a")], ["doc_id", "text"])
    df = spark.createDataFrame([(1, "a b c"), (2, "c a")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in lm_score(df, ref=ref).collect()}
    assert out[1]["n_bigrams"] == 2 and out[1]["n_unseen"] == 1
    assert float(out[1]["lm_score"]) == pytest.approx(
        math.log2(3) - 0.5, abs=1e-6
    )
    assert out[2]["n_bigrams"] == 1 and out[2]["n_unseen"] == 1
    assert float(out[2]["lm_score"]) == pytest.approx(1.0, abs=1e-6)


def test_lm_score_self_scoring_ranks_repetitive_text_lower(spark):
    """Self-scored corpus: a doc made of the corpus' dominant bigram
    must score lower (more likely) than one of rare bigrams."""
    from timeseriesflattener_spark.operators.text import lm_score

    df = spark.createDataFrame(
        [
            (1, "the cat the cat the cat the cat"),
            (2, "the cat sat on a quiet old mat"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: float(r["lm_score"]) for r in lm_score(df).collect()}
    assert out[1] < out[2]
    # self-scoring never sees an unseen bigram
    assert all(
        r["n_unseen"] == 0 for r in lm_score(df).collect()
    )


def test_lm_score_case_normalisation_and_validation(spark):
    from timeseriesflattener_spark.operators.text import lm_score

    ref = spark.createDataFrame([(9, "Hello World")], ["doc_id", "text"])
    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    out = lm_score(df, ref=ref).collect()
    assert out[0]["n_unseen"] == 0  # 'Hello World' lowercased matches
    with pytest.raises(ValueError, match="alpha"):
        lm_score(df, alpha=0)


# ------------------------------------------- hypothesis differentials (Python)


def _py_dedup_lines(docs: dict[int, str], min_docs: int = 2):
    """Independent pure-Python replay of the dedup_lines contract."""
    import re as _re

    trim = lambda s: _re.sub(r"^[ \t\r\n\f]+|[ \t\r\n\f]+$", "", s)  # noqa: E731
    owners: dict[str, set[int]] = {}
    for i, t in docs.items():
        for ln in t.split("\n"):
            k = trim(ln)
            if k:
                owners.setdefault(k, set()).add(i)
    dup = {k for k, o in owners.items() if len(o) >= min_docs}
    out = {}
    for i, t in docs.items():
        lines = t.split("\n")
        kept = [ln for ln in lines if trim(ln) == "" or trim(ln) not in dup]
        out[i] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


def test_dedup_lines_hypothesis_differential(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    # line alphabet engineered for collisions: few distinct payloads,
    # whitespace-edge variants, blanks
    line = st.sampled_from(
        ["dup one", " dup one ", "dup two", "uniq", "", "  ", "\tdup two"]
    )
    corpus = st.dictionaries(
        st.integers(min_value=1, max_value=8),
        st.lists(line, min_size=1, max_size=5).map("\n".join),
        min_size=1,
        max_size=6,
    )

    @settings(
        max_examples=10, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(docs=corpus)
    def inner(docs):
        from timeseriesflattener_spark.operators.dedup import dedup_lines

        df = spark.createDataFrame(
            list(docs.items()), ["doc_id", "text"]
        )
        got = {
            r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
            for r in dedup_lines(df).collect()
        }
        assert got == _py_dedup_lines(docs)

    inner()


def test_chunk_documents_hypothesis_differential(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    texts = st.lists(
        st.lists(
            st.sampled_from(["tok", "x", "longer-token", "9"]),
            min_size=0, max_size=13,
        ).map(" ".join),
        min_size=1, max_size=5,
    )

    @settings(
        max_examples=10, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(texts=texts, size=st.integers(1, 5), stride_off=st.integers(0, 4))
    def inner(texts, size, stride_off):
        from timeseriesflattener_spark.operators.text import chunk_documents

        stride = max(1, size - stride_off)
        df = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        got = sorted(
            map(tuple, chunk_documents(df, size, stride).collect())
        )
        want = []
        for i, t in enumerate(texts):
            toks = t.split()
            for s in range(0, len(toks), stride):
                want.append(
                    (i, s // stride, s, min(size, len(toks) - s),
                     " ".join(toks[s : s + size]))
                )
        assert got == sorted(want)

    inner()


def test_split_corpus_python_md5_differential(spark, fam_docs):
    """The split label must be recomputable from the documented md5-u32
    contract in plain Python — the cross-engine reproducibility claim."""
    import hashlib

    out = {
        r["doc_id"]: r["split"]
        for r in split_corpus(
            fam_docs, {"train": 0.75, "val": 0.125, "test": 0.125}
        ).collect()
    }
    for i, got in out.items():
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        want = (
            "train" if u < 3221225472
            else ("val" if u < 3758096384 else "test")
        )
        assert got == want, (i, u, got, want)


def test_ngram_builders_bind_tokeniser_once(spark):
    """Expression-tree pin for the shingles_from_tokens pitfall: the
    tokeniser regex must appear exactly ONCE in the n-gram builders'
    trees (bound via the single-element transform wrapper) — the
    pre-fix trees carried it into the per-element lambda, re-running
    the regex per n-gram position (O(len^2) per doc; measured 16x wall
    on vocab_induct at sf0.1)."""
    from timeseriesflattener_spark.operators.text import (
        bpe_ish_tokens,
        word_ngrams,
    )

    for expr in (
        word_ngrams(F.col("text"), 2),
        adjacent_pairs(bpe_ish_tokens(F.col("text"))),
    ):
        assert expr._jc.toString().count("regexp_extract_all") == 1


# ------------------------------------------------------- write_training_shards


def test_write_training_shards_layout_and_order(spark, tmp_path):
    """Shard directories, jsonl + parquet roundtrip, and the loader
    contract: rows inside each shard's files, read in file-name order,
    replay the packing order exactly."""
    import glob
    import json as jsonlib

    from timeseriesflattener_spark.sources.io import write_training_shards

    df = spark.createDataFrame(
        [(i, i % 3, f"doc-{i}") for i in range(60)],
        ["pos", "shard", "text"],
    )
    # parquet roundtrip
    p = str(tmp_path / "shards_pq")
    write_training_shards(df, p, order_col="pos")
    back = spark.read.parquet(p)
    assert back.count() == 60
    assert sorted(
        r["shard"] for r in back.select("shard").distinct().collect()
    ) == [0, 1, 2]
    # jsonl + max_records_per_file: name-ordered files replay pos order
    j = str(tmp_path / "shards_jl")
    write_training_shards(
        df, j, order_col="pos", fmt="jsonl", max_records_per_file=7
    )
    for shard in (0, 1, 2):
        rows = []
        for f in sorted(glob.glob(f"{j}/shard={shard}/part-*.json")):
            with open(f) as fh:
                rows += [jsonlib.loads(line) for line in fh if line.strip()]
        assert [r["pos"] for r in rows] == sorted(r["pos"] for r in rows)
        assert len(rows) == 20
    with pytest.raises(ValueError, match="fmt"):
        write_training_shards(df, str(tmp_path / "x"), fmt="csv")
    with pytest.raises(ValueError, match="max_records_per_file"):
        write_training_shards(
            df, str(tmp_path / "y"), max_records_per_file=0
        )


def test_lm_score_hypothesis_differential(spark):
    """Pure-Python replay of the smoothed-bigram NLL contract on
    generated ref/score corpora (small token alphabet so seen, unseen-
    pair and unseen-left-word paths all fire)."""
    import math
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from timeseriesflattener_spark.operators.text import lm_score

    text = st.lists(
        st.sampled_from(["aa", "bb", "cc", "Dd"]), min_size=0, max_size=6
    ).map(" ".join)
    corpus = st.lists(text, min_size=1, max_size=4)

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(ref_texts=corpus, score_texts=corpus)
    def inner(ref_texts, score_texts):
        from hypothesis import assume

        # an empty-vocabulary reference makes the smoothed denominator
        # log2(0): degenerate user error, not part of the contract
        assume(any(t.split() for t in ref_texts))
        ref = spark.createDataFrame(
            list(enumerate(ref_texts)), ["doc_id", "text"]
        )
        df = spark.createDataFrame(
            list(enumerate(score_texts)), ["doc_id", "text"]
        )
        got = {
            r["doc_id"]: (r["n_bigrams"], r["n_unseen"], float(r["lm_score"]))
            for r in lm_score(df, ref=ref).collect()
        }
        # python model
        pc: Counter = Counter()
        vocab = set()
        for t in ref_texts:
            toks = t.lower().split()
            vocab.update(toks)
            pc.update(zip(toks, toks[1:]))
        lc: Counter = Counter()
        for (w1, _), c in pc.items():
            lc[w1] += c
        V = len(vocab)
        want = {}
        for i, t in enumerate(score_texts):
            toks = t.lower().split()
            pairs = list(zip(toks, toks[1:]))
            if not pairs:
                continue
            nll = [
                math.log2(lc.get(p[0], 0) + 1.0 * V) - math.log2(pc.get(p, 0) + 1.0)
                for p in pairs
            ]
            want[i] = (
                len(pairs),
                sum(1 for p in pairs if p not in pc),
                sum(nll) / len(pairs),
            )
        assert set(got) == set(want)
        for i in want:
            assert got[i][:2] == want[i][:2]
            assert got[i][2] == pytest.approx(want[i][2], abs=1e-6)

    inner()


# --------------------------------------------------------------- domain_tfidf


def test_domain_tfidf_golden_and_tiebreak(spark):
    """Two domains, hand-computed scores: 'web' owns 'spam' (tf 2,
    df 1 of 2 domains -> 2*ln(2)); 'the' appears in both domains
    (idf 0 -> tfidf 0, ranked by term tie-break after positives)."""
    import math

    from timeseriesflattener_spark.operators.text import domain_tfidf_topk

    df = spark.createDataFrame(
        [
            (1, "web", "the spam spam"),
            (2, "wiki", "the atom"),
        ],
        ["doc_id", "source", "text"],
    )
    out = domain_tfidf_topk(df, k=5)
    rows = {(r["domain"], r["term"]): r for r in out.collect()}
    web_spam = rows[("web", "spam")]
    assert web_spam["tf"] == 2 and web_spam["df_t"] == 1
    assert float(web_spam["tfidf"]) == pytest.approx(2 * math.log(2), abs=1e-6)
    assert web_spam["rank"] == 1
    assert float(rows[("web", "the")]["tfidf"]) == 0.0
    assert rows[("wiki", "atom")]["rank"] == 1
    with pytest.raises(ValueError, match="k must be"):
        domain_tfidf_topk(df, k=0)


def test_domain_tfidf_two_stage_equals_one_window(spark):
    """The de-funnelled (domain, md5-bucket) prune + exact re-rank must
    be value-identical to the naive one-window top-k (the oracle's
    formulation)."""
    from pyspark.sql.window import Window

    from timeseriesflattener_spark.operators.text import (
        domain_tfidf_topk,
        tokens,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(map(tuple, domain_tfidf_topk(docs, k=7, quantize=10**6).collect()))

    tf = (
        docs.select(
            F.col("source").alias("domain"),
            F.explode(tokens(F.lower(F.col("text")))).alias("term"),
        )
        .groupBy("domain", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    ndom = docs.agg(F.count_distinct("source").alias("n_domains"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(ndom)
        .select(
            "domain", "term", "tf", "df_t",
            F.round(
                F.col("tf")
                * F.log(F.col("n_domains").cast("double") / F.col("df_t"))
                * F.lit(10**6),
                0,
            ).cast("long").alias("tfidf_q"),
        )
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("tfidf_q").desc(), F.col("term").asc()
    )
    naive = scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= 7)
    want = sorted(map(tuple, naive.collect()))
    assert got == want


def test_domain_tfidf_plan_has_no_domain_only_window_on_full_stream(spark):
    """Both Window nodes exist, and the FIRST (full-stream) one
    partitions by (domain, md5-prefix bucket) — the low-cardinality
    domain alone only ever ranks the pruned <=16k survivors."""
    from timeseriesflattener_spark.operators.text import domain_tfidf_topk

    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("source"),
        F.lit("alpha beta gamma delta").alias("text"),
    )
    plan = (
        domain_tfidf_topk(df, k=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    windows = [ln for ln in plan.split("\n") if "Window [" in ln]
    assert len(windows) == 2
    # partition spec is the second bracketed list on the Window line;
    # the optimizer pre-projects the md5 bucket as an attribute, so pin
    # the SHAPE: outer (survivor re-rank) window partitions by domain
    # alone, inner full-stream window by (domain, bucket)
    specs = [
        re.search(r"\], \[([^\]]*)\], \[", ln).group(1).split(", ")
        for ln in windows
    ]
    assert sorted(len(s) for s in specs) == [1, 2]
    # and Spark's rank-limit pushdown pre-prunes BOTH windows
    assert plan.count("WindowGroupLimit") == 2
