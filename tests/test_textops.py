"""Training-data operators over the driver-provided documents/embeddings
tables: dedup (exact/jaccard/minhash/simhash/embedding), similarity
search (brute force vs LSH recall), text stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseriesflattener_spark.operators import dedup as D
from timeseriesflattener_spark.operators import similarity as S
from timeseriesflattener_spark.operators import text as T

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_text_stats(spark, docs):
    stats = T.text_stats(docs).cache()
    assert stats.count() == docs.count()
    row = (
        stats.join(docs.select("doc_id", "text"), "doc_id")
        .select("n_chars", "n_tokens", "text")
        .first()
    )
    assert row["n_chars"] == len(row["text"])
    assert row["n_tokens"] == len(row["text"].split())
    # quality in [0,1]; lang guess non-null
    bad = stats.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count()
    assert bad == 0


def test_exact_dedup(spark, docs):
    # inject exact duplicates
    dups = docs.limit(5).withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    with_dups = docs.unionByName(dups)
    groups = D.exact_duplicates(with_dups).filter(F.col("n_docs") > 1)
    assert groups.count() == 5
    kept = D.drop_exact_duplicates(with_dups)
    assert kept.count() == docs.count()
    # keep-first: original low ids survive
    assert kept.filter(F.col("doc_id") >= 1_000_000).count() == 0


def test_ngram_jaccard_self_duplicates(spark, docs):
    dups = docs.limit(3).withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    with_dups = docs.unionByName(dups)
    pairs = D.ngram_jaccard_pairs(with_dups, threshold=0.99).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    for r in dups.select("doc_id").collect():
        assert (r["doc_id"] - 1_000_000, r["doc_id"]) in found
    assert all(r["jaccard"] == 1.0 for r in pairs if r["doc_b"] >= 1_000_000)


def test_minhash_matches_exact_jaccard(spark, docs):
    """LSH candidates + exact verify finds the same >=0.8 pairs as the
    all-pairs baseline on this corpus (recall check)."""
    sample = docs.limit(120)
    dups = sample.limit(4).withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    corpus = sample.unionByName(dups)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(corpus, threshold=0.8).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_dedup_pairs(corpus, threshold=0.8).collect()
    }
    assert lsh <= exact or exact == set()  # verification kills false positives
    if exact:
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.75, (recall, exact - lsh)


def test_banded_bucket_hash_pairing_equivalence(spark, docs):
    """r8 `_banded` pins the bucket to xxhash64 over the band's signature
    LONGS (no string render/concat). The candidate-pair multiset —
    including n_bands_shared — must equal the reference formulation
    (bucket = xxhash64(concat_ws(",", casts)) + banded self-join, the
    pre-r8 shape): equal slices collide under any deterministic hash and
    candidates are only ever consumed through exact verification."""
    sample = docs.limit(80)
    dups = sample.limit(5).withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    corpus = sample.unionByName(dups)
    sig = D._signatures_from_exploded(
        D._hashed_exploded(corpus, "text", "doc_id", 3, persist=False), 64
    ).cache()
    prod = {
        (r["doc_a"], r["doc_b"]): r["n_bands_shared"]
        for r in D._candidates_from_signatures(sig, 64, 16).collect()
    }
    # reference: old string-keyed bucket + self-join pairing
    rpb = 64 // 16
    ref_banded = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"s{b * rpb + r}").cast("string")
                                    for r in range(rpb)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(16)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    a = ref_banded.select(F.col("doc").alias("doc_a"), "band", "bucket")
    b = ref_banded.select(F.col("doc").alias("doc_b"), "band", "bucket")
    ref = {
        (r["doc_a"], r["doc_b"]): r["n_bands_shared"]
        for r in a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_bands_shared"))
        .collect()
    }
    sig.unpersist()
    assert prod == ref
    assert prod, "vacuous: the injected dups must produce candidates"


def test_simhash_identical_docs_collide(spark, docs):
    dups = docs.limit(3).withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    corpus = docs.limit(50).unionByName(dups)
    pairs = D.simhash_near_pairs(corpus, max_hamming=3).collect()
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    for r in dups.select("doc_id").collect():
        key = (r["doc_id"] - 1_000_000, r["doc_id"])
        assert key in found and found[key] == 0


def test_cosine_topk_and_lsh_recall(spark, embs):
    queries = embs.limit(12)
    exact = S.cosine_topk(queries, embs, k=5).cache()
    assert exact.groupBy("query_id").count().filter("count <> 5").count() == 0
    # self excluded
    assert exact.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0

    approx = S.lsh_topk(queries, embs, k=5, dim=64, bits=6, tables=12)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.5, recall  # probabilistic but seeded-deterministic


def test_embedding_near_dup(spark, embs):
    dups = embs.limit(3).withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000))
    corpus = embs.unionByName(dups)
    pairs = D  # noqa: F841  (namespacing clarity)
    found = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in S.embedding_near_dup_pairs(corpus, threshold=0.999).collect()
    }
    for r in dups.select("vec_id").collect():
        assert (r["vec_id"] - 1_000_000, r["vec_id"]) in found


def test_ivf_topk_recall_and_determinism(spark):
    """IVF-flat: recall versus brute force must beat the scanned-fraction
    baseline (on isotropic vectors a random nprobe/nlist scan gets
    ~nprobe/nlist recall; the quantizer must do better on the probed
    cells), and the operator must be fully deterministic."""
    import numpy as np
    from pyspark.sql import functions as F

    from timeseriesflattener_spark.operators.similarity import cosine_topk, ivf_topk

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((400, 16)).astype(float)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(400)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = embs.filter(F.col("vec_id") < 10)

    ivf1 = {(r.query_id, r.neighbor_id, r.rank) for r in ivf_topk(qs, embs, k=5, nlist=16, nprobe=6).collect()}
    ivf2 = {(r.query_id, r.neighbor_id, r.rank) for r in ivf_topk(qs, embs, k=5, nlist=16, nprobe=6).collect()}
    assert ivf1 == ivf2  # deterministic pivots -> identical output

    brute = {(r.query_id, r.neighbor_id) for r in cosine_topk(qs, embs, k=5).collect()}
    hits = len({(q, n) for q, n, _ in ivf1} & brute)
    recall = hits / len(brute)
    assert recall >= 6 / 16  # must beat blind scanned-fraction
    # every query still returns a full top-k (cells are non-degenerate)
    from collections import Counter
    per_q = Counter(q for q, _, _ in ivf1)
    assert all(v == 5 for v in per_q.values())


def test_duplicate_clusters_transitivity(spark):
    """Pair graph A~B, B~C (A!~C) must resolve to ONE cluster {A,B,C}
    (keeping one per PAIR would under-drop); chains longer than one
    propagation round converge; singletons keep their own id."""
    from timeseriesflattener_spark.operators.dedup import (
        drop_near_duplicates,
        duplicate_clusters,
    )

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(10)], "doc_id long, text string")
    # chain 0-1-2-3-4 (diameter 4 -> needs >1 propagation round) + pair 7-8
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (7, 8)], "doc_a long, doc_b long"
    )
    got = {r["doc"]: r["cluster"] for r in duplicate_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 6, 7: 7, 8: 7, 9: 9}
    kept = sorted(r.doc_id for r in drop_near_duplicates(docs, pairs).collect())
    assert kept == [0, 5, 6, 7, 9]


def test_exact_dedup_doc_ids_bounded(spark, docs):
    """doc_ids caps at max_ids with the LOWEST ids, while n_docs/keep_id
    reflect the full group — the hot-fingerprint (boilerplate doc) guard."""
    base = docs.limit(1)
    clones = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000 + i))
        for i in range(6)
    ]
    frame = base
    for c in clones:
        frame = frame.unionByName(c)
    row = (
        D.exact_duplicates(frame, max_ids=3)
        .filter(F.col("n_docs") > 1)
        .first()
    )
    assert row["n_docs"] == 7
    assert len(row["doc_ids"]) == 3
    assert row["doc_ids"] == sorted(row["doc_ids"])
    assert row["keep_id"] == row["doc_ids"][0]
    unbounded = (
        D.exact_duplicates(frame, max_ids=None).filter(F.col("n_docs") > 1).first()
    )
    assert len(unbounded["doc_ids"]) == 7


def test_cap_hot_shingles_no_window_skew(spark, docs):
    """The stop-shingle cap must not use a count window partitioned by
    the hot key (that materialises the hot partition on one task).
    Plan shape: no Window node; a broadcast anti-join instead. Results
    identical to the semantic definition (freq <= cap survives)."""
    ex = D._hashed_exploded(docs.limit(50), "text", "doc_id", 3, persist=False)
    capped = D._cap_hot_shingles(ex, 5)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    freq = {r["__h"]: r["cnt"] for r in ex.groupBy("__h").agg(F.count("*").alias("cnt")).collect()}
    surviving = {r["__h"] for r in capped.select("__h").distinct().collect()}
    expect = {h for h, c in freq.items() if c <= 5}
    assert surviving == expect


def test_release_shingle_caches(spark, docs):
    D.release_shingle_caches()  # drain any prior state
    pairs = D.minhash_dedup_pairs(docs.limit(30), threshold=0.9)
    pairs.count()
    assert len(D._SHINGLE_CACHES) == 1
    cached = D._SHINGLE_CACHES[0]
    assert cached.storageLevel.useMemory
    released = D.release_shingle_caches()
    assert released == 1 and not D._SHINGLE_CACHES
    assert not cached.storageLevel.useMemory


def test_star_components_match_labelprop_on_chains(spark):
    """large-star/small-star and min-label propagation agree on chains,
    cliques, and singletons; star converges on a 64-node path (which
    would need ~64 label-prop rounds) well inside its O(log n) budget."""
    n = 64
    docs = spark.createDataFrame([(i,) for i in range(n + 3)], "doc_id long")
    # one long path 0-1-...-63, plus a triangle clique {64,65,66}... as pairs
    chain = [(i, i + 1) for i in range(n - 1)]
    clique = [(n, n + 1), (n + 1, n + 2), (n, n + 2)]
    pairs = spark.createDataFrame(chain + clique, "doc_a long, doc_b long")
    star = {
        (r["doc"], r["cluster"])
        for r in D.duplicate_clusters(docs, pairs, algorithm="star", max_iterations=10).collect()
    }
    lp = {
        (r["doc"], r["cluster"])
        for r in D.duplicate_clusters(docs, pairs, algorithm="labelprop", max_iterations=100).collect()
    }
    assert star == lp
    assert all(c == 0 for d, c in star if d < n)  # the chain collapses to 0
    assert all(c == n for d, c in star if d >= n)  # clique to its min


def test_duplicate_clusters_unknown_algorithm(spark):
    docs = spark.createDataFrame([(1,)], "doc_id long")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    import pytest as _pt

    with _pt.raises(ValueError, match="algorithm"):
        D.duplicate_clusters(docs, pairs, algorithm="nope")


def test_repetition_stats_lines_golden(spark):
    """Hand-computed line-repetition golden incl. empty doc and
    whitespace-only lines."""
    from timeseriesflattener_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "aa\nbb\naa\n  \ncc"),   # 4 non-empty lines, 'aa' x2
            (2, "unique\nlines\nonly"),
            (3, ""),                      # no lines at all
            (4, "x\nx\nx"),               # everything duplicate
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert rows[1]["n_lines"] == 4 and rows[1]["n_dup_lines"] == 1
    assert rows[1]["dup_line_ratio"] == 0.25
    # dup chars: 'aa' occurs twice -> 4 of 8 total chars (aa,bb,aa,cc)
    assert rows[1]["dup_char_ratio"] == 0.5
    assert rows[2]["n_dup_lines"] == 0 and rows[2]["dup_char_ratio"] == 0.0
    assert rows[3]["n_lines"] == 0 and rows[3]["dup_line_ratio"] == 0.0
    assert rows[4]["dup_line_ratio"] == round(2 / 3, 9)
    assert rows[4]["dup_char_ratio"] == 1.0


def test_repetition_stats_ngram_unit(spark):
    """word_ngrams override: Gopher duplicate-2-gram fraction."""
    from timeseriesflattener_spark.operators.text import repetition_stats, word_ngrams

    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a")],  # bigrams: [a b, b a, a b, b a] -> all dup
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(
            docs, lines=word_ngrams(F.col("text"), 2)
        ).collect()
    }
    assert rows[1]["n_lines"] == 4 and rows[1]["n_dup_lines"] == 2
    assert rows[1]["dup_line_ratio"] == 0.5 and rows[1]["dup_char_ratio"] == 1.0
    assert rows[2]["n_lines"] == 0  # shorter than n -> empty unit array


def test_contamination_pairs_and_drop(spark, docs):
    """Docs sharing a 3-gram with the benchmark are flagged (benchmark
    side broadcast — asserted in the plan); drop_contaminated removes
    exactly the flagged ids."""
    bench = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    pairs = D.contamination_pairs(docs, bench, n=3, bench_id_col="bench_id")
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {(r["doc_id"], r["bench_id"]) for r in pairs.collect()}
    # every benchmark doc trivially matches itself (>= 3 tokens each)
    for i in range(5):
        assert (i, i) in got
    flagged = {p[0] for p in got}
    kept = D.drop_contaminated(docs, bench, n=3, bench_id_col="bench_id")
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept_ids == all_ids - flagged


def test_scrub_pii_golden(spark):
    """Email, phone, and digit-run redaction goldens; order matters
    (emails first so digits inside them aren't half-eaten)."""
    from timeseriesflattener_spark.operators.text import pii_counts, scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@corp.example.com today"),
            (2, "call +1 (555) 010-1234 or 555-010-9876 now"),
            (3, "card 4111111111111111 and id 123456789"),
            (4, "clean text, no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in docs.select(
            "doc_id", *pii_counts(F.col("text")), scrub_pii(F.col("text")).alias("s")
        ).collect()
    }
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["s"]
    assert "alice" not in out[1]["s"]
    assert out[2]["n_phone"] >= 1 and "<PHONE>" in out[2]["s"]
    assert "555" not in out[2]["s"]
    assert out[3]["n_digits"] == 2 and out[3]["s"].count("<DIGITS>") == 2
    assert "4111" not in out[3]["s"]
    assert out[4]["s"] == "clean text, no pii here"
    assert out[4]["n_email"] == out[4]["n_phone"] == out[4]["n_digits"] == 0


def test_quality_filter_golden(spark):
    """Each rule fires in order (first failed rule wins); drop_low_quality
    keeps exactly the passers."""
    from timeseriesflattener_spark.operators.text import drop_low_quality, quality_filter

    docs = spark.createDataFrame(
        [
            (1, "too short"),
            (2, "the cat sat on the mat and it was a very good mat indeed"),
            (3, "a a a a a a a a a a a a"),            # heavy 2-gram repetition
            (4, "!!! ??? ... ,,, ;;; ::: !!! ??? ... ,,,"),  # punct AND repetition -> punct first
        ],
        "doc_id long, text string",
    )
    from timeseriesflattener_spark.operators.text import word_ngrams

    out = {
        r["doc_id"]: (r["passed"], r["fail_reason"])
        for r in quality_filter(
            docs,
            min_tokens=5,
            max_punct_ratio=0.3,
            min_stopword_ratio=0.01,
            max_dup_line_ratio=0.5,
            lines=word_ngrams(F.col("text"), 2),
        ).collect()
    }
    assert out[1] == (False, "too_short")
    assert out[2] == (True, None)
    assert out[3] == (False, "stopword") or out[3] == (False, "repetition")
    assert out[4] == (False, "punct")  # rule order: punct precedes repetition
    kept = {r["doc_id"] for r in drop_low_quality(
        docs, min_tokens=5, max_punct_ratio=0.3, min_stopword_ratio=0.01,
        max_dup_line_ratio=0.5, lines=word_ngrams(F.col("text"), 2),
    ).collect()}
    assert kept == {2}


def test_quality_rules_gopher_goldens(spark):
    """Per-rule goldens for the round-4 Gopher rules (VERDICT r3 #4):
    symbol-to-word, mean-word-length band, bullet/ellipsis line
    fractions, alpha-word ratio — each crafted doc passes every EARLIER
    rule so the first-failed reason is exactly the targeted one."""
    from timeseriesflattener_spark.operators.text import quality_filter, word_ngrams

    docs = spark.createDataFrame(
        [
            # 25 tokens, 4x '#': symbol = 4/25 = 0.16 > 0.1
            (1, "the quick brown vixen jumps # over lazily dozing hounds # "
                "while keen birds circle # above misty ridges and # vast "
                "silent valleys tonight"),
            # all 5 lines bulleted: bullet = 1.0 > 0.9
            (2, "- morning fog settles gently across the quiet harbors\n"
                "- golden light spreads slowly over distant meadows\n"
                "- evening breeze carries softly through ancient forests\n"
                "- winter frost glitters brightly upon silent rooftops\n"
                "- summer rain patters warmly against wooden shutters"),
            # 2/3 lines end '...': ellipsis = 0.667 > 0.3 (symbol 2/32 passes)
            (3, "travelers wander far beyond familiar roads seeking "
                "something new and the journey continues...\n"
                "strange cities reveal hidden corners where old stories "
                "linger quietly...\n"
                "finally weary wanderers return home carrying memories "
                "worth keeping"),
            # 20/26 tokens numeric: alpha = 6/26 = 0.23 < 0.5
            (4, "the survey recorded 48213 59630 71425 83047 92158 60371 "
                "54892 67210 78534 81956 90763 43125 56789 64208 75310 "
                "86421 97532 40826 51937 62048 readings overall yesterday"),
            # short words: mean word length 29/15 = 1.93 < 4.2 band floor
            (5, "it is so on we go to be at an as do my up the oak elm fig "
                "and ash cut saw log"),
            # a normal passing doc under the same thresholds
            (6, "the ancient library holds countless manuscripts and "
                "travelers often spend entire afternoons reading quietly "
                "beneath its vaulted ceilings while scholars debate ideas "
                "over strong coffee nearby every single evening"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["passed"], r["fail_reason"])
        for r in quality_filter(
            docs,
            min_tokens=20,
            min_stopword_ratio=0.02,
            max_dup_line_ratio=0.5,
            min_mean_word_length=4.2,
            min_alpha_word_ratio=0.5,
            lines=word_ngrams(F.col("text"), 2),
        ).collect()
    }
    assert out[1] == (False, "symbol")
    assert out[2] == (False, "bullet")
    assert out[3] == (False, "ellipsis")
    assert out[4] == (False, "alpha")
    assert out[5] == (False, "word_length")
    assert out[6] == (True, None)


def test_quality_rule_columns_golden(spark):
    """Direct column-factory goldens for the new rule inputs."""
    from timeseriesflattener_spark.operators import text as TT

    df = spark.createDataFrame(
        [("ab cdef # ... ghij\n- klm\nnopq...",)], "text string"
    )
    row = df.select(
        TT.symbol_word_ratio(F.col("text")).alias("sw"),
        TT.mean_word_length(F.col("text")).alias("mwl"),
        TT.bullet_line_ratio(F.col("text")).alias("bl"),
        TT.ellipsis_line_ratio(F.col("text")).alias("el"),
        TT.alpha_word_ratio(F.col("text")).alias("aw"),
    ).first()
    # tokens: ab cdef # ... ghij - klm nopq... -> 8
    assert row["sw"] == pytest.approx(3 / 8)  # '#' + two '...'
    assert row["mwl"] == pytest.approx((2 + 4 + 1 + 3 + 4 + 1 + 3 + 7) / 8)
    # non-empty lines: 'ab cdef # ... ghij', '- klm', 'nopq...'
    assert row["bl"] == pytest.approx(1 / 3)
    assert row["el"] == pytest.approx(1 / 3)  # only 'nopq...' ends with '...'
    assert row["aw"] == pytest.approx(5 / 8)  # '#', '...', '-' carry no letter


def test_exact_duplicates_truncation_flag_and_plan(spark, docs):
    """ids_truncated marks capped groups (ADVICE r3); the capped path
    must contain NO window partitioned solely by the fingerprint
    (VERDICT r3 #5) — hot groups spread over (fingerprint, salt)."""
    base = docs.limit(1)
    frame = base
    for i in range(6):
        frame = frame.unionByName(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000 + i))
        )
    out = D.exact_duplicates(frame, max_ids=3)
    hot = out.filter(F.col("n_docs") > 1).first()
    assert hot["ids_truncated"] is True
    assert len(hot["doc_ids"]) == 3
    ok = out.filter(F.col("n_docs") == 1).first()
    if ok is not None:
        assert ok["ids_truncated"] is False
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "__salt" in line, f"fingerprint-only window in plan: {line}"


def test_exact_duplicates_salted_equals_uncapped_prefix(spark, docs):
    """On groups smaller than the cap, the salted two-stage output is
    identical to the uncapped aggregation (modulo the flag column)."""
    capped = D.exact_duplicates(docs, max_ids=100).drop("ids_truncated")
    uncapped = D.exact_duplicates(docs, max_ids=None).drop("ids_truncated")
    assert capped.exceptAll(uncapped).isEmpty()
    assert uncapped.exceptAll(capped).isEmpty()


def test_star_components_nonconvergence_raises(spark):
    """Exhausting max_iterations on a non-star edge set must raise, not
    silently return conflicting labels (ADVICE r3)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8)],
        "doc_a long, doc_b long",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        D.star_connected_components(pairs, max_iterations=0)


def test_bpe_ish_tokens_golden(spark):
    """BPE-ish pre-tokeniser: words, digit runs and single punctuation
    marks each count; whitespace never does."""
    df = spark.createDataFrame(
        [(1, "don't count2 me-out!"), (2, ""), (3, "  \n ")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", T.bpe_ish_tokens(F.col("text")).alias("t")).collect()
    }
    assert got[1] == ["don", "'", "t", "count", "2", "me", "-", "out", "!"]
    assert got[2] == []
    assert got[3] == []


def test_clean_corpus_stage_attribution(spark):
    """4-stage pipeline audit: first drop stage wins; each stage operates
    on the previous stage's survivors; drop_unclean keeps exactly the
    'kept' rows."""
    from timeseriesflattener_spark.operators.pipeline import clean_corpus, drop_unclean

    base = (
        "the ancient library holds countless manuscripts and travelers "
        "often spend entire afternoons reading quietly beneath vaulted "
        "ceilings while scholars debate ideas over strong coffee nearby "
        "every single evening without fail"
    )
    near = base.replace("strong coffee", "fresh tea")  # high Jaccard vs base
    docs = spark.createDataFrame(
        [
            (1, base),                     # kept
            (2, "too short"),              # quality (too_short)
            (3, base),                     # exact dup of 1
            (4, near),                     # near-dup of 1
            (5, "the quiet harbor town watched tall ships arrive slowly "
                "carrying spices silk and stories from distant warm "
                "coasts while merchants bargained loudly near wooden "
                "piers all morning long today"),   # kept, then contaminated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "merchants bargained loudly near wooden piers")],
        "bench_id long, text string",
    )
    audit = {
        r["doc_id"]: r["stage"]
        for r in clean_corpus(
            docs,
            benchmark=bench,
            bench_id_col="bench_id",
            quality_kwargs=dict(min_tokens=5),
            jaccard_threshold=0.5,
            contamination_n=3,
        ).collect()
    }
    assert audit == {
        1: "kept", 2: "quality", 3: "exact_dup", 4: "near_dup", 5: "contaminated"
    }, audit
    kept = sorted(r["doc_id"] for r in drop_unclean(docs, clean_corpus(
        docs, benchmark=bench, bench_id_col="bench_id",
        quality_kwargs=dict(min_tokens=5), jaccard_threshold=0.5,
        contamination_n=3,
    )).collect())
    assert kept == [1]


def test_clean_corpus_minhash_path_subset(spark, docs):
    """The minhash near-dup path drops a SUBSET of what exact jaccard
    drops (candidates are exact-verified -> identical precision; recall
    bounded by banding) and agrees on this corpus."""
    from timeseriesflattener_spark.operators.pipeline import clean_corpus

    corpus = docs.select("doc_id", "text").limit(150)
    kw = dict(quality_kwargs=dict(min_tokens=5), jaccard_threshold=0.5)
    exact = {r["doc_id"]: r["stage"] for r in clean_corpus(corpus, **kw).collect()}
    mh = {
        r["doc_id"]: r["stage"]
        for r in clean_corpus(corpus, near_dup="minhash", **kw).collect()
    }
    ex_near = {d for d, s in exact.items() if s == "near_dup"}
    mh_near = {d for d, s in mh.items() if s == "near_dup"}
    assert mh_near <= ex_near
    for d in set(exact) - ex_near - mh_near:
        assert exact[d] == mh[d]
    import pytest as _p

    with _p.raises(ValueError, match="unknown near_dup"):
        clean_corpus(corpus, near_dup="simhash", **kw).collect()


def test_clean_corpus_persisted_ids_resume(spark, docs, tmp_path):
    """VERDICT r4 #4: persist_ids_to=<dir> gives the same audit as the
    localCheckpoint default, writes per-stage survivor-id parquet, and
    a second run over the same dir RESUMES — markers intact, ids served
    from parquet (byte-stable dir), identical audit."""
    import os

    from timeseriesflattener_spark.operators.pipeline import clean_corpus

    corpus = docs.select("doc_id", "text").limit(150)
    kw = dict(quality_kwargs=dict(min_tokens=5), jaccard_threshold=0.5)
    base = {r["doc_id"]: r["stage"] for r in clean_corpus(corpus, **kw).collect()}
    pdir = str(tmp_path / "stages")
    pers = {
        r["doc_id"]: r["stage"]
        for r in clean_corpus(corpus, persist_ids_to=pdir, **kw).collect()
    }
    assert pers == base
    stage_dirs = sorted(os.listdir(pdir))
    # each stage = ids parquet + a one-row __commit artifact written
    # AFTER it (the commit boundary; carries the params fingerprint)
    assert stage_dirs == [
        "ids_exact_dup", "ids_exact_dup__commit",
        "ids_near_dup", "ids_near_dup__commit",
        "ids_quality", "ids_quality__commit",
    ]

    def snapshot():
        return {
            os.path.join(d, f): os.path.getmtime(os.path.join(r, f))
            for r, _, fs in os.walk(pdir)
            for d, f in [(os.path.relpath(r, pdir), "")] + [
                (os.path.relpath(r, pdir), f) for f in fs
            ]
        }

    before = snapshot()
    # resume must not even CONSTRUCT completed stages (the quality scan
    # and star contraction run eager actions at build time): poison the
    # stage operators — a marker-served rerun never calls them
    import timeseriesflattener_spark.operators.pipeline as P

    def _boom(*a, **k):
        raise AssertionError("stage recomputed on resume")

    originals = {
        n: getattr(P, n)
        for n in ("quality_filter", "drop_exact_duplicates",
                  "ngram_jaccard_pairs", "minhash_dedup_pairs",
                  "duplicate_clusters")
    }
    try:
        for n in originals:
            setattr(P, n, _boom)
        again = {
            r["doc_id"]: r["stage"]
            for r in clean_corpus(corpus, persist_ids_to=pdir, **kw).collect()
        }
    finally:
        for n, f in originals.items():
            setattr(P, n, f)
    assert again == base
    assert snapshot() == before  # resume: nothing rewritten

    # mid-pipeline crash: later stages gone (as after a kill between
    # stage commits) -> only they recompute; audit identical, stage-1
    # parquet untouched
    import shutil

    shutil.rmtree(os.path.join(pdir, "ids_near_dup"))
    shutil.rmtree(os.path.join(pdir, "ids_near_dup__commit"))
    s1_before = {
        k: v for k, v in before.items() if k.startswith("ids_quality")
    }
    resumed = {
        r["doc_id"]: r["stage"]
        for r in clean_corpus(corpus, persist_ids_to=pdir, **kw).collect()
    }
    assert resumed == base
    after = snapshot()
    assert {k: v for k, v in after.items() if k.startswith("ids_quality")} == s1_before
    assert any(k.startswith("ids_near_dup") for k in after)


def test_clean_corpus_commit_fingerprint_and_fallback(spark, docs, tmp_path):
    """Round-6 hardening (VERDICT #4 + ADVICE): (a) reusing a persist
    dir with DIFFERENT parameters raises instead of silently serving
    stale ids; (b) a kill between the ids write and the commit write
    recomputes that stage (ids without commit are uncommitted); (c) the
    Connect fallback of ``_read_commit`` can actually SEE the marker
    (the old binaryFile _SUCCESS probe could not — Spark's file index
    hides underscore-prefixed files) and propagates non-not-found
    errors instead of mapping them to 'not done'."""
    import os
    import shutil

    import pytest

    from timeseriesflattener_spark.operators.pipeline import (
        _read_commit,
        clean_corpus,
    )

    corpus = docs.select("doc_id", "text").limit(120)
    kw = dict(quality_kwargs=dict(min_tokens=5), jaccard_threshold=0.5)
    pdir = str(tmp_path / "stages")
    base = {
        r["doc_id"]: r["stage"]
        for r in clean_corpus(corpus, persist_ids_to=pdir, **kw).collect()
    }

    # (a) different thresholds over the same dir -> loud failure
    with pytest.raises(ValueError, match="different[\\s\\S]*parameters"):
        clean_corpus(
            corpus, persist_ids_to=pdir,
            quality_kwargs=dict(min_tokens=5), jaccard_threshold=0.9,
        ).collect()

    # (c) fallback path (no JVM FS probe) reads the committed marker...
    qpath = os.path.join(pdir, "ids_quality")
    fp = _read_commit(spark, qpath, _force_fallback=True)
    assert fp is not None and len(fp) == 16
    assert fp == _read_commit(spark, qpath)  # == the classic-path read
    # ...absent marker -> None (not an error)
    assert _read_commit(spark, os.path.join(pdir, "ids_nope"),
                        _force_fallback=True) is None
    # ...and a corrupt marker PROPAGATES (never "recompute + overwrite")
    bad = str(tmp_path / "corrupt")
    os.makedirs(bad + "__commit")
    with open(os.path.join(bad + "__commit", "part-00000.parquet"), "w") as f:
        f.write("this is not parquet")
    with pytest.raises(Exception, match="(?i)parquet|footer|corrupt"):
        _read_commit(spark, bad, _force_fallback=True)

    # (b) ids present but commit absent == uncommitted -> stage re-runs
    shutil.rmtree(qpath + "__commit")
    again = {
        r["doc_id"]: r["stage"]
        for r in clean_corpus(corpus, persist_ids_to=pdir, **kw).collect()
    }
    assert again == base
    assert os.path.isdir(qpath + "__commit")  # re-committed

    # (d) a kill DURING the marker write leaves the dir with only
    # Spark's _temporary staging — must read as uncommitted (None) on
    # both probe paths, not raise UNABLE_TO_INFER_SCHEMA
    partial = str(tmp_path / "partial")
    os.makedirs(partial + "__commit/_temporary/0")
    assert _read_commit(spark, partial) is None
    assert _read_commit(spark, partial, _force_fallback=True) is None
    # and a full clean_corpus resume over that state recomputes the
    # stage instead of aborting
    shutil.rmtree(qpath + "__commit")
    os.makedirs(qpath + "__commit/_temporary/0")
    resumed = {
        r["doc_id"]: r["stage"]
        for r in clean_corpus(corpus, persist_ids_to=pdir, **kw).collect()
    }
    assert resumed == base


def test_deterministic_sample_requires_rate(spark, docs):
    """Round-6 safety: a bare deterministic_sample(df) must raise, not
    silently return the empty frame (the old rate=0.0 default)."""
    import pytest

    from timeseriesflattener_spark.operators.pipeline import (
        deterministic_sample,
    )

    ids = docs.select("doc_id")
    with pytest.raises(ValueError, match="explicit rate"):
        deterministic_sample(ids)
    # explicit rates still work exactly as before
    assert deterministic_sample(ids, rate=1.0).count() == ids.count()
    assert deterministic_sample(ids, rate=0.0).count() == 0  # explicit 0 ok
    # rates= without rate=: listed strata sampled, unlisted dropped
    docs2 = docs.selectExpr("doc_id", "cast(doc_id % 2 as string) as src")
    only_even = deterministic_sample(
        docs2, rates={"0": 1.0}, stratify_col="src"
    )
    assert only_even.filter("src = '1'").count() == 0
    assert only_even.count() == docs2.filter("src = '0'").count()


def test_deterministic_resample(spark, docs):
    """Epoch upsampling: exact multiset vs a Python md5 reference,
    monotone in rate, full copies unconditional, guards raise."""
    import hashlib

    import pytest

    from timeseriesflattener_spark.operators.pipeline import (
        deterministic_resample,
    )

    ids = docs.select("doc_id", "lang").limit(200)
    src = ids.collect()
    got = sorted(
        (r["doc_id"], r["copy_idx"])
        for r in deterministic_resample(
            ids, rate=0.4, rates={"en": 1.7, "zh": 2.5},
            stratify_col="lang", salt="s",
        ).collect()
    )

    def u32(k: int, i: int) -> int:
        return int(hashlib.md5(f"s{k}:{i}".encode()).hexdigest()[:8], 16)

    exp = sorted(
        (r["doc_id"], k)
        for r in src
        for k in range(3)
        if u32(k, r["doc_id"])
        < min(max({"en": 1.7, "zh": 2.5}.get(r["lang"], 0.4) - k, 0.0), 1.0)
        * (1 << 32)
    )
    assert got == exp

    # monotone: raising the rate only ADDS rows
    a = {(r["doc_id"], r["copy_idx"])
         for r in deterministic_resample(ids, rate=2.2).collect()}
    b = {(r["doc_id"], r["copy_idx"])
         for r in deterministic_resample(ids, rate=2.5).collect()}
    assert a <= b and len(b) > len(a)
    # floor(rate)=2 full copies are unconditional at rate 2.2
    n = ids.count()
    assert sum(1 for (_, k) in a if k in (0, 1)) == 2 * n

    with pytest.raises(ValueError, match="explicit rate"):
        deterministic_resample(ids)
    with pytest.raises(ValueError, match=">= 0"):
        deterministic_resample(ids, rate=-0.5)
    # ...and deterministic_sample refuses rates above 1 (it would
    # silently cap at keep-everything; resample is the upsampling tool)
    from timeseriesflattener_spark.operators.pipeline import (
        deterministic_sample,
    )

    with pytest.raises(ValueError, match="resample"):
        deterministic_sample(ids, rate=1.5)


def test_pack_contexts_budget_validation(spark, docs):
    """Round-6 safety: budget < 1 raises at call time instead of
    producing divide-by-zero NaN contexts deep in the plan."""
    import pytest

    from timeseriesflattener_spark.operators.pipeline import (
        context_manifest,
        pack_contexts,
    )

    d = docs.selectExpr("doc_id", "length(text) as n")
    for bad in (0, -3):
        with pytest.raises(ValueError, match="budget"):
            pack_contexts(d, bad, "n")
        with pytest.raises(ValueError, match="budget"):
            context_manifest(d, bad, "n")


def test_assign_shards_deterministic_and_balanced(spark, docs):
    """pack_shards: stable across runs, salt changes the permutation,
    positions are dense 0..n-1 per shard."""
    from timeseriesflattener_spark.operators.pipeline import assign_shards

    ids = docs.select("doc_id")
    a = {(r["doc_id"]): (r["shard"], r["pos"]) for r in assign_shards(ids, 8).collect()}
    b = {(r["doc_id"]): (r["shard"], r["pos"]) for r in assign_shards(ids, 8).collect()}
    assert a == b
    c = {(r["doc_id"]): (r["shard"], r["pos"]) for r in assign_shards(ids, 8, salt="x").collect()}
    assert c != a  # salt reshuffles
    from collections import defaultdict

    per = defaultdict(list)
    for _, (s, p) in a.items():
        per[s].append(p)
    for s, ps in per.items():
        assert sorted(ps) == list(range(len(ps)))  # dense tie-free positions
    assert len(per) == 8  # every shard populated at 500 docs


def test_pack_contexts_stream_semantics(spark, docs):
    """pack_contexts == brute-force concat-and-chunk packing in md5
    order: offsets are the exact running token sum per shard, contexts
    partition the stream at every multiple of budget, zero-token docs
    pin to their offset's context, and the plan holds no window
    partitioned by shard alone."""
    import hashlib
    import re

    from pyspark.sql import functions as F

    from timeseriesflattener_spark.operators.pipeline import pack_contexts
    from timeseriesflattener_spark.operators.text import token_count

    d = docs.select("doc_id", token_count(F.col("text")).alias("n_toks"))
    out = pack_contexts(d, budget=128, token_col="n_toks", n_shards=3)
    got = {
        r["doc_id"]: (r["shard"], r["tok_start"], r["first_ctx"], r["last_ctx"])
        for r in out.collect()
    }
    toks = {r["doc_id"]: r["n_toks"] for r in d.collect()}
    by_shard = {}
    for doc_id in toks:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        by_shard.setdefault(int(h[:8], 16) % 3, []).append((h, doc_id))
    expect = {}
    for s, items in by_shard.items():
        cum = 0
        for h, doc_id in sorted(items):
            n = toks[doc_id]
            expect[doc_id] = (s, cum, cum // 128, (cum + max(n, 1) - 1) // 128)
            cum += n
    assert got == expect
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "shard" in spec:
            assert "__b" in spec, spec


def test_packing_family_partition_invariant(spark, docs):
    """The reproducibility contract of the packing/sampling family:
    identical output regardless of the input's physical partitioning
    (1 partition vs 13) — no partition-order or task-scheduling
    sensitivity anywhere in shard, pos, context, or sample membership."""
    from pyspark.sql import functions as F

    from timeseriesflattener_spark.operators.pipeline import (
        assign_shards,
        context_manifest,
        deterministic_sample,
    )
    from timeseriesflattener_spark.operators.text import token_count

    d = docs.select("doc_id", "lang", token_count(F.col("text")).alias("n_toks"))
    one, many = d.coalesce(1), d.repartition(13)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(assign_shards(one.select("doc_id"), 5)) == rows(
        assign_shards(many.select("doc_id"), 5)
    )
    assert rows(
        context_manifest(one, budget=64, token_col="n_toks", n_shards=2)
    ) == rows(context_manifest(many, budget=64, token_col="n_toks", n_shards=2))
    assert rows(deterministic_sample(one, rate=0.3)) == rows(
        deterministic_sample(many, rate=0.3)
    )


def test_deterministic_sample_exact_and_monotone(spark, docs):
    """deterministic_sample == the md5-threshold reference exactly;
    nested rates are monotone (0.1 sample ⊆ 0.5 ⊆ 1.0 with one salt);
    a different salt draws a different subset; per-stratum rates apply
    per stratum; the plan is a single filtered scan (no shuffle)."""
    import hashlib

    from timeseriesflattener_spark.operators.pipeline import deterministic_sample

    d = docs.select("doc_id", "lang")

    def u(doc_id, salt=""):
        return int(hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8], 16)

    all_ids = [r["doc_id"] for r in d.select("doc_id").collect()]
    langs = {r["doc_id"]: r["lang"] for r in d.collect()}
    for rate in (0.1, 0.5):
        got = {r["doc_id"] for r in deterministic_sample(d, rate=rate).collect()}
        expect = {i for i in all_ids if u(i) < int(rate * (1 << 32))}
        assert got == expect, rate
    s01 = {r["doc_id"] for r in deterministic_sample(d, rate=0.1).collect()}
    s05 = {r["doc_id"] for r in deterministic_sample(d, rate=0.5).collect()}
    assert s01 <= s05  # monotone nesting under one salt
    other = {r["doc_id"] for r in deterministic_sample(d, rate=0.5, salt="x").collect()}
    assert other != s05
    strat = deterministic_sample(
        d, rate=0.0, rates={"en": 1.0}, stratify_col="lang"
    )
    got = {r["doc_id"] for r in strat.collect()}
    assert got == {i for i in all_ids if langs[i] == "en"}
    plan = strat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # one filtered pass, no shuffle


def test_context_manifest_tiles_contexts(spark, docs):
    """context_manifest slices tile each context exactly: per
    (shard, ctx) slices are disjoint, contiguous from 0, and sum to the
    budget for every context except each shard's last; doc totals equal
    token counts."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from timeseriesflattener_spark.operators.pipeline import context_manifest
    from timeseriesflattener_spark.operators.text import token_count

    d = docs.select("doc_id", token_count(F.col("text")).alias("n_toks"))
    rows = context_manifest(d, budget=128, token_col="n_toks", n_shards=3).collect()
    toks = {r["doc_id"]: r["n_toks"] for r in d.collect()}
    per_ctx = defaultdict(list)
    per_doc = defaultdict(int)
    for r in rows:
        per_ctx[(r["shard"], r["ctx"])].append((r["slice_start"], r["slice_len"]))
        per_doc[r["doc_id"]] += r["slice_len"]
    assert per_doc == {d_: n for d_, n in toks.items()}  # no token lost
    last_ctx = {}
    for (s, c) in per_ctx:
        last_ctx[s] = max(last_ctx.get(s, -1), c)
    for (s, c), slices in per_ctx.items():
        pos = 0
        for start, ln in sorted(slices):
            assert start == pos, (s, c, slices)  # contiguous, disjoint
            pos += ln
        if c < last_ctx[s]:
            assert pos == 128, (s, c, pos)  # full context
        else:
            assert 0 < pos <= 128 or pos == 0, (s, c, pos)


def test_assign_shards_two_stage_rank(spark, docs):
    """VERDICT r4 #3: positions come from a two-stage rank — the plan
    must hold NO window partitioned by the low-cardinality shard alone
    (n_shards=2 would funnel half the corpus through one task), and the
    result must equal the single-window reference order exactly."""
    from pyspark.sql import functions as F

    from timeseriesflattener_spark.operators.pipeline import assign_shards

    ids = docs.select("doc_id")
    out = assign_shards(ids, 2)
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in out.collect()}
    # reference: the one-window formulation the two-stage rank replaces
    ref_rows = ids.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).collect()
    by_shard = {}
    for r in ref_rows:
        s = int(r["h"][:8], 16) % 2
        by_shard.setdefault(s, []).append((r["h"], r["doc_id"]))
    expect = {}
    for s, items in by_shard.items():
        for pos, (_, d) in enumerate(sorted(items)):
            expect[d] = (s, pos)
    assert got == expect
    # plan: every window spec over shard also carries the __b bucket
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        if "shard" in spec:
            assert "__b" in spec, spec


def test_mixture_plan_and_mix_domains(spark, docs):
    """Source mixing to target budgets: plan rates = target/available
    (capped), drop/under/over/cap branches all exercised, counts land
    near target, draws monotone in target, guards raise."""
    import pytest

    from timeseriesflattener_spark.operators.pipeline import (
        mix_domains,
        mixture_plan,
    )

    d = docs.select(
        "doc_id", "lang", T.token_count(F.col("text")).alias("n_toks")
    )
    avail = {
        r["lang"]: r["toks"]
        for r in d.groupBy("lang").agg(F.sum("n_toks").alias("toks")).collect()
    }
    targets = {
        "en": avail["en"] * 0.5,   # undersample
        "zh": avail["zh"] * 2.5,   # epoch oversample
        "de": avail["de"] * 99.0,  # impossible -> capped at 10
        "xx": 1000.0,              # domain with no rows
    }
    plan = {
        r["lang"]: r.asDict()
        for r in mixture_plan(d, targets, unit_col="n_toks").collect()
    }
    assert set(plan) == set(targets)  # one row per TARGET domain
    assert plan["en"]["rate"] == pytest.approx(0.5)
    assert plan["zh"]["rate"] == pytest.approx(2.5)
    assert plan["de"]["rate"] == 10.0  # cap is visible in the plan
    assert plan["xx"]["available"] == 0.0 and plan["xx"]["rate"] == 0.0

    out = mix_domains(d, targets, unit_col="n_toks").cache()
    got = {
        r["lang"]: r["toks"]
        for r in out.groupBy("lang").agg(F.sum("n_toks").alias("toks")).collect()
    }
    # unlisted (es/fr) and empty (xx) domains are absent
    assert set(got) <= {"en", "zh", "de"}
    # sampled token mass within sampling noise of the target
    assert abs(got["en"] - targets["en"]) / targets["en"] < 0.25
    assert abs(got["zh"] - targets["zh"]) / targets["zh"] < 0.25
    # capped domain delivers ~10 epochs, NOT the impossible target
    assert abs(got["de"] - 10 * avail["de"]) / (10 * avail["de"]) < 0.25
    # every full copy below ceil(rate) is unconditional for zh: copies
    # 0 and 1 contain every zh doc
    n_zh = d.filter("lang = 'zh'").count()
    for k in (0, 1):
        assert out.filter((F.col("lang") == "zh") & (F.col("copy_idx") == k)).count() == n_zh

    # monotone in target: raising one target only ADDS (doc, copy) rows
    lower = mix_domains(
        d, {**targets, "zh": avail["zh"] * 1.5}, unit_col="n_toks"
    )
    assert lower.exceptAll(out).count() == 0

    # row-count mixing when unit_col omitted
    n_en = d.filter("lang = 'en'").count()
    by_rows = mix_domains(d, {"en": float(n_en)}, salt="rows")
    assert by_rows.count() == n_en

    with pytest.raises(ValueError, match="at least one target"):
        mixture_plan(d, {})
    with pytest.raises(ValueError, match=">= 0"):
        mixture_plan(d, {"en": -1.0})
    with pytest.raises(ValueError, match="max_rate"):
        mixture_plan(d, {"en": 1.0}, max_rate=0.5)


def test_resample_rate_cap(spark, docs):
    """A typo'd epoch rate (250 for 2.50) must raise instead of
    silently exploding every row 250-fold; an explicit cap override
    still works."""
    import pytest

    from timeseriesflattener_spark.operators.pipeline import (
        deterministic_resample,
    )

    ids = docs.select("doc_id").limit(10)
    with pytest.raises(ValueError, match="max_rate_cap"):
        deterministic_resample(ids, rate=250.0)
    with pytest.raises(ValueError, match="max_rate_cap"):
        deterministic_resample(
            ids, rate=0.5, rates={"en": 1700.0}, stratify_col="doc_id"
        )
    out = deterministic_resample(ids, rate=101.0, max_rate_cap=150.0)
    assert out.count() >= 101 * 10  # 101 full copies each


def test_mixture_plan_broadcasts_aggregate(spark, docs):
    """Plan shape: the per-domain aggregate is broadcast (hint on the
    non-preserved side of the right-outer join is honorable); no
    sort-merge join appears."""
    from timeseriesflattener_spark.operators.pipeline import mixture_plan

    plan = mixture_plan(
        docs.select("doc_id", "lang"), {"en": 10.0, "xx": 5.0}
    )
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s


# ------------------------------------- incremental (batch-vs-corpus) dedup


def _py_shingles(text: str, k: int = 3) -> set:
    toks = " ".join(text.lower().split()).split(" ")
    if len(toks) >= k:
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return {" ".join(toks)}


@pytest.fixture(scope="module")
def split_corpus(spark, docs):
    """(new_batch, ref) pair: ref = even docs; new = odd docs (novel)
    + exact copies of even ids < 20 (id+3e6) + one-token-appended
    near-dups of even ids in [20, 60) (id+4e6)."""
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    exact = (
        ref.filter(F.col("doc_id") < 20)
        .withColumn("doc_id", F.col("doc_id") + F.lit(3_000_000))
    )
    near = (
        ref.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 60))
        .withColumn("doc_id", F.col("doc_id") + F.lit(4_000_000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" tailmarker")))
    )
    new = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .unionByName(exact)
        .unionByName(near)
        .cache()
    )
    return new, ref.cache()


def test_cross_minhash_pairs_matches_exact(spark, split_corpus):
    """Differential vs an all-pairs exact-Jaccard recomputation in
    Python: at threshold 0.5 the LSH+verify cross pairs must be exactly
    the pairs whose true 3-shingle Jaccard >= 0.5 (recall 100% here:
    injected pairs sit at J ~ (n-2)/(n-1))."""
    new, ref = split_corpus
    got = {
        (r["doc_new"], r["doc_ref"]): r["jaccard"]
        for r in D.cross_minhash_pairs(new, ref, threshold=0.5).collect()
    }
    nrows = {r["doc_id"]: r["text"] for r in new.collect()}
    rrows = {r["doc_id"]: r["text"] for r in ref.collect()}
    expected = {}
    for nid, ntext in nrows.items():
        sn = _py_shingles(ntext)
        for rid, rtext in rrows.items():
            sr = _py_shingles(rtext)
            j = len(sn & sr) / len(sn | sr)
            if round(j, 6) >= 0.5:
                expected[(nid, rid)] = round(j, 6)
    assert set(got) == set(expected)
    for pair, j in expected.items():
        assert abs(got[pair] - j) < 1e-9
    # every exact copy and every near-dup injection is found
    assert all((i + 3_000_000, i) in got for i in range(0, 20, 2))


def test_dedup_against_exact_and_near(spark, split_corpus, docs):
    new, ref = split_corpus
    n_odd = docs.filter(F.col("doc_id") % 2 == 1).count()
    # exact-only path: the 10 verbatim copies are dropped, near-dups kept
    exact_only = D.dedup_against(new, ref)
    assert exact_only.filter(F.col("doc_id") >= 3_000_000).filter(
        F.col("doc_id") < 4_000_000
    ).count() == 0
    assert exact_only.filter(F.col("doc_id") >= 4_000_000).count() == 20
    # minhash path: near-dups above threshold are dropped too
    survivors = D.dedup_against(new, ref, near_dup="minhash", threshold=0.5)
    ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    assert not any(i >= 3_000_000 and i < 4_000_000 for i in ids)
    assert not any(i >= 4_000_000 for i in ids)
    # odd docs survive EXACTLY unless they truly near-collide with ref
    # (the synthetic corpus has natural J>=0.5 cross pairs; the pair set
    # itself is differentially verified in the test above)
    flagged = {
        r["doc_new"]
        for r in D.cross_minhash_pairs(new, ref, threshold=0.5)
        .select("doc_new")
        .collect()
    }
    odd_survivors = sum(1 for i in ids if i < 1_000_000)
    odd_flagged = sum(1 for i in flagged if i < 1_000_000)
    assert odd_survivors == n_odd - odd_flagged
    assert odd_flagged < n_odd / 10  # natural near-dup rate stays small
    # schema passes through unchanged
    assert survivors.columns == new.columns
    with pytest.raises(ValueError, match="near_dup"):
        D.dedup_against(new, ref, near_dup="bogus")


# ----------------------------------------------- corpus stats / data card


def test_corpus_stats_golden(spark):
    from timeseriesflattener_spark.operators.pipeline import corpus_stats

    rows = [
        # en/web: 3 docs, one exact dup pair (b == c modulo whitespace)
        (1, "the quick brown fox jumps over the lazy dog today", "en", "web"),
        (2, "alpha beta gamma delta epsilon zeta", "en", "web"),
        (3, "alpha  beta gamma   delta epsilon zeta", "en", "web"),
        # de/books: 1 doc, too short to pass min_tokens=5? it has 5
        (4, "eins zwei drei vier funf", "de", "books"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {
        (r["lang"], r["source"]): r
        for r in corpus_stats(df, quality_kwargs={"min_tokens": 7}).collect()
    }
    en = out[("en", "web")]
    assert en["n_docs"] == 3
    assert en["n_tokens"] == 10 + 6 + 6
    assert en["n_exact_dups"] == 1  # b and c normalise identically
    assert en["n_quality_pass"] == 1  # only the 10-token doc reaches 7
    assert abs(en["mean_doc_tokens"] - 22 / 3) < 1e-12
    assert en["quality_pass_rate"] == pytest.approx(1 / 3)
    de = out[("de", "books")]
    assert de["n_docs"] == 1 and de["n_exact_dups"] == 0
    assert de["n_quality_pass"] == 0  # 5 tokens < 7
    # mean_quality is the mean of the per-doc quality_score values
    qs = {
        r["doc_id"]: r["quality"]
        for r in df.select(
            "doc_id", T.quality_score(F.col("text")).alias("quality")
        ).collect()
    }
    assert en["mean_quality"] == pytest.approx((qs[1] + qs[2] + qs[3]) / 3)


def test_corpus_stats_single_agg_plan(spark, docs):
    """Plan shape: one aggregation chain (partial + distinct expansion +
    final), no join, no window — the data-card rollup must stay a single
    map-side-combined pass over the corpus."""
    from timeseriesflattener_spark.operators.pipeline import corpus_stats

    plan = corpus_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" not in plan


# ----------------------------------------------------- curriculum binning


def test_quality_bins_consistent_with_score(spark, docs):
    got = docs.select(
        T.quality_score(F.col("text")).alias("q"),
        T.quality_bins(F.col("text")).alias("bin"),
    ).collect()
    assert len(got) > 0
    seen = set()
    for r in got:
        expect = sum(1 for e in (0.4, 0.7, 0.9) if r["q"] >= e)
        assert r["bin"] == expect
        seen.add(r["bin"])
    assert len(seen) >= 2  # the corpus spans bins; a constant would be vacuous


def test_quality_bins_validation(spark):
    with pytest.raises(ValueError, match="increasing"):
        T.quality_bins(F.col("text"), edges=(0.7, 0.4))
    with pytest.raises(ValueError, match="edge"):
        T.quality_bins(F.col("text"), edges=())


# ----------------------------------------------- no-split (next-fit) packing


def test_pack_documents_matches_python_nextfit(spark, docs):
    """Differential vs a Python replay of the recurrence over the same
    md5 order, plus the packing invariants: bins never exceed the
    budget except a single oversized doc alone, bins are contiguous
    from 0 per shard, bin_tok_start is the running fill."""
    from timeseriesflattener_spark.operators.pipeline import pack_documents
    from timeseriesflattener_spark.operators.text import token_count

    budget, n_shards = 256, 4
    sized = docs.select("doc_id", token_count(F.col("text")).alias("n_toks"))
    got = pack_documents(
        sized, budget, "n_toks", n_shards=n_shards
    ).collect()
    toks = {r["doc_id"]: r["n_toks"] for r in sized.collect()}
    import hashlib

    def md5hex(i):
        return hashlib.md5(str(i).encode()).hexdigest()

    def shard_of(i):
        return int(md5hex(i)[:8], 16) % n_shards

    expect = {}
    for sh in range(n_shards):
        ids = sorted(
            (i for i in toks if shard_of(i) == sh), key=md5hex
        )
        b, fill = 0, 0
        for i in ids:
            t = toks[i]
            if fill + t > budget and fill > 0:
                b, fill = b + 1, 0
            expect[i] = (sh, b, fill)
            fill += t
    assert len(got) == len(expect)
    for r in got:
        assert (r["shard"], r["bin"], r["bin_tok_start"]) == expect[r["doc_id"]], r
    # invariants
    from collections import defaultdict

    fills = defaultdict(list)
    for r in got:
        fills[(r["shard"], r["bin"])].append(toks[r["doc_id"]])
    for (sh, b), ts in fills.items():
        assert sum(ts) <= budget or len(ts) == 1  # oversized doc sits alone
    for sh in range(n_shards):
        bs = sorted(b for s2, b in fills if s2 == sh)
        assert bs == list(range(len(bs)))  # contiguous bin ids from 0


def test_pack_documents_partition_invariant(spark, docs):
    from timeseriesflattener_spark.operators.pipeline import pack_documents
    from timeseriesflattener_spark.operators.text import token_count

    sized = docs.select("doc_id", token_count(F.col("text")).alias("n_toks"))
    a = pack_documents(sized, 256, "n_toks", n_shards=3).collect()
    b = pack_documents(
        sized.repartition(17), 256, "n_toks", n_shards=3
    ).collect()
    key = lambda r: r["doc_id"]
    assert sorted(map(tuple, a), key=lambda t: t[0]) == sorted(
        map(tuple, b), key=lambda t: t[0]
    )
    with pytest.raises(ValueError, match="budget"):
        pack_documents(sized, 0, "n_toks")


# ------------------------------------------------- curriculum scheduling


def test_curriculum_schedule_total_order(spark, docs):
    """pos is a permutation of [0, n); bins are nondecreasing along pos;
    within a bin the order is exactly the md5(salt||id) permutation
    (replayed in Python); a salt change re-permutes within bins but
    never across bins."""
    import hashlib

    from timeseriesflattener_spark.operators.pipeline import curriculum_schedule

    got = curriculum_schedule(docs).collect()
    n = len(got)
    assert sorted(r["pos"] for r in got) == list(range(n))
    by_pos = sorted(got, key=lambda r: r["pos"])
    bins = [r["bin"] for r in by_pos]
    assert bins == sorted(bins)  # schedule walks bins ascending
    for b in set(bins):
        ids = [r["doc_id"] for r in by_pos if r["bin"] == b]
        expect = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
        assert ids == expect
    salted = curriculum_schedule(docs, salt="v2").collect()
    assert {r["doc_id"]: r["bin"] for r in salted} == {
        r["doc_id"]: r["bin"] for r in got
    }  # bins are salt-free
    assert {r["doc_id"]: r["pos"] for r in salted} != {
        r["doc_id"]: r["pos"] for r in got
    }  # order re-permutes


def test_curriculum_schedule_no_binwide_window(spark, docs):
    """Plan pin: the corpus-wide rank window (the only one ordered by
    the full md5 key ``__h``) must be partitioned by the h-prefix
    bucket ``__b`` too — a regression to one window per low-cardinality
    bin would order by ``__h`` WITHOUT ``__b`` in the spec and fail
    here. The remaining windows (bucket/bin offset cumsums) run on
    aggregated frames of <= #bins*256 rows and never reference __h."""
    from timeseriesflattener_spark.operators.pipeline import curriculum_schedule

    plan = (
        curriculum_schedule(docs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    specs = [
        m.group(1)
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan)
    ]
    corpus_specs = [s for s in specs if "__h" in s]
    assert corpus_specs, specs  # the rank window must exist (non-vacuous)
    for s in corpus_specs:
        assert "__b" in s, s  # ...and must be bucketed, never bin-only


def test_pack_documents_string_ids(spark):
    """The id column passes through with its own type (string ids pack
    exactly like longs — same contract as assign_shards/pack_contexts)."""
    from timeseriesflattener_spark.operators.pipeline import pack_documents

    rows = [(f"doc-{i:03d}", 10 + (i % 50)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id string, n_toks long")
    out = pack_documents(df, 64, "n_toks", n_shards=2)
    assert dict(out.dtypes)["doc_id"] == "string"
    got = out.collect()
    assert {r["doc_id"] for r in got} == {r[0] for r in rows}
    assert all(r["bin_tok_start"] + 0 >= 0 for r in got)


def test_release_pipeline_caches(spark, docs):
    from timeseriesflattener_spark.operators.pipeline import (
        curriculum_schedule,
        release_pipeline_caches,
    )

    release_pipeline_caches()  # start clean
    curriculum_schedule(docs).count()
    assert release_pipeline_caches() >= 1
    assert release_pipeline_caches() == 0


def test_bloom_filter_words_no_false_negatives(spark):
    """Every inserted hash tests positive (Bloom guarantee); a disjoint
    probe set sees a low FP rate at the default sizing."""
    from timeseriesflattener_spark.operators.dedup import (
        _bloom_might_contain,
        bloom_filter_words,
    )

    m, k = 1 << 12, 4
    inserted = spark.range(0, 200).select(F.xxhash64("id").alias("__h"))
    words = bloom_filter_words(inserted, "__h", m_bits=m, k_hashes=k)
    assert len(words) == m // 64
    hits = inserted.filter(
        _bloom_might_contain(F.lit(words), F.col("__h"), m, k)
    ).count()
    assert hits == 200  # no false negatives, ever
    probe = spark.range(10_000, 12_000).select(F.xxhash64("id").alias("__h"))
    fp = probe.filter(
        _bloom_might_contain(F.lit(words), F.col("__h"), m, k)
    ).count()
    # 200 keys in 4096 bits, k=4 -> theoretical FP ~ (1-e^(-800/4096))^4
    # ~ 0.1%; assert an order of magnitude of slack
    assert fp / 2000 < 0.05, fp


def test_bloom_filter_words_validation(spark):
    from timeseriesflattener_spark.operators.dedup import bloom_filter_words

    h = spark.range(1).select(F.xxhash64("id").alias("__h"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_filter_words(h, "__h", m_bits=100)
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_filter_words(h, "__h", k_hashes=0)


def test_contamination_pairs_bloom_equals_exact(spark, docs):
    """The Bloom-prefiltered pass returns EXACTLY the exact pass's pairs
    (confirm join absorbs false positives) — through both the broadcast
    and the shuffle-join confirm paths."""
    bench = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    exact = {
        (r["doc_id"], r["bench_id"], r["n_shared"])
        for r in D.contamination_pairs(
            docs, bench, n=3, bench_id_col="bench_id"
        ).collect()
    }
    for bcast in (True, False):
        got = {
            (r["doc_id"], r["bench_id"], r["n_shared"])
            for r in D.contamination_pairs_bloom(
                docs,
                bench,
                n=3,
                bench_id_col="bench_id",
                m_bits=1 << 14,
                k_hashes=4,
                broadcast_benchmark=bcast,
            ).collect()
        }
        assert got == exact, f"broadcast_benchmark={bcast}"


# ------------------------------------------------ semantic clustering


def test_kmeans_matches_python_lloyd(spark, embs):
    """The full deterministic contract (grid snap, min-id init, BIGINT
    argmin with small-j ties, half-up integer centroid means, empty-
    cluster carry) replayed in pure Python over the same vectors."""
    from timeseriesflattener_spark.operators.similarity import (
        kmeans_fit,
        release_kmeans_caches,
        semantic_clusters,
    )

    k, n_iter, scale = 4, 2, 10_000
    rows = sorted(
        ((r["vec_id"], list(r["embedding"])) for r in embs.collect()),
    )[:80]
    q = {
        vid: [int(__import__("math").floor(float(x) * scale + 0.5)) for x in v]
        for vid, v in rows
    }

    def dist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cent = [q[vid] for vid in sorted(q)[:k]]
    for _ in range(n_iter):
        members = {}
        for vid, v in q.items():
            j = min(range(k), key=lambda j: (dist(v, cent[j]), j))
            members.setdefault(j, []).append(v)
        for j, vs in members.items():
            n = len(vs)
            cent[j] = [
                (2 * sum(col) + n) // (2 * n) for col in zip(*vs)
            ]
    expect = {
        vid: min(range(k), key=lambda j: (dist(v, cent[j]), j)) for vid, v in q.items()
    }

    sub = embs.filter(F.col("vec_id").isin(list(q.keys())))
    got_cent = kmeans_fit(sub, k=k, n_iter=n_iter, scale=scale)
    assert got_cent == cent
    got = {
        r["vec_id"]: r["cluster"]
        for r in semantic_clusters(sub, k=k, n_iter=n_iter, scale=scale).collect()
    }
    assert got == expect
    release_kmeans_caches()


def test_kmeans_partition_invariant(spark, embs):
    from timeseriesflattener_spark.operators.similarity import (
        release_kmeans_caches,
        semantic_clusters,
    )

    a = sorted(
        tuple(r) for r in semantic_clusters(embs, k=8, n_iter=2).collect()
    )
    b = sorted(
        tuple(r)
        for r in semantic_clusters(embs.repartition(13), k=8, n_iter=2).collect()
    )
    assert a == b
    release_kmeans_caches()


def test_kmeans_assignment_plan_is_map_side(spark, embs):
    """The final assignment is pure projection over literal centroids —
    NO join, NO exchange (the scale contract: at 100 TB the assignment
    never shuffles vectors)."""
    from timeseriesflattener_spark.operators.similarity import (
        release_kmeans_caches,
        semantic_clusters,
    )

    out = semantic_clusters(embs, k=4, n_iter=1)
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "Join" not in plan and "Exchange" not in plan, plan
    release_kmeans_caches()


def test_semantic_dedup_reps_and_flags(spark, embs):
    from timeseriesflattener_spark.operators.similarity import (
        release_kmeans_caches,
        semantic_dedup,
    )

    rows = semantic_dedup(embs, k=8, n_iter=2, threshold_sq=10**9).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cl, members in by_cluster.items():
        rep = min(m["vec_id"] for m in members)
        assert all(m["rep_id"] == rep for m in members)
        for m in members:
            if m["vec_id"] == rep:
                assert m["rep_dist_sq"] == 0 and not m["is_dup"]
            else:
                assert m["is_dup"] == (m["rep_dist_sq"] <= 10**9)
    release_kmeans_caches()


def test_kmeans_validation(spark, embs):
    from timeseriesflattener_spark.operators.similarity import kmeans_fit

    with pytest.raises(ValueError, match="k must be"):
        kmeans_fit(embs, k=0)
    with pytest.raises(ValueError, match="n_iter"):
        kmeans_fit(embs, k=2, n_iter=-1)
    with pytest.raises(ValueError, match="only"):
        kmeans_fit(embs.limit(3), k=5)


def test_drop_semantic_duplicates_keeps_reps(spark, embs):
    from timeseriesflattener_spark.operators.similarity import (
        drop_semantic_duplicates,
        release_kmeans_caches,
        semantic_dedup,
    )

    thr = 10**9
    flags = semantic_dedup(embs, k=8, n_iter=2, threshold_sq=thr).collect()
    dropped = {r["vec_id"] for r in flags if r["is_dup"]}
    assert dropped  # threshold chosen to flag some
    kept = drop_semantic_duplicates(embs, k=8, n_iter=2, threshold_sq=thr)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    all_ids = {r["vec_id"] for r in embs.select("vec_id").collect()}
    assert kept_ids == all_ids - dropped
    assert kept.columns == embs.columns  # full schema preserved
    reps = {r["rep_id"] for r in flags}
    assert reps <= kept_ids  # representatives always survive
    release_kmeans_caches()
