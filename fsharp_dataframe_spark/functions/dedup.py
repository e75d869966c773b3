"""Deduplication at training-data scale.

Four tiers, cheapest first:

1. **Exact** — hash-groupBy on a normalized fingerprint (md5).  One
   shuffle on a short key; at 100 TB use it as the first pass — it
   kills the bulk of duplication for pennies.
2. **N-gram Jaccard** — exact set overlap via shingle explode +
   self-join on shingle.  Exact but quadratic in bucket size; apply
   after candidate generation, or alone at moderate scale.
3. **MinHash + LSH** — shingle → k minhashes → band buckets →
   candidate pairs from bucket joins, verified by estimated Jaccard.
   Near-linear: the only shuffle keys are (band, signature), and
   candidate verification touches only colliding pairs.
4. **SimHash** — 64-bit sketch; near-dup = small Hamming distance.
   Cheapest sketch to store/compare; bucket by rotated prefixes for
   sub-linear candidate generation.

All pure Column expressions (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions.text import fingerprint, tokens


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by normalized fingerprint: one row per
    distinct content with the keeper id (min) and duplicate count."""
    from fsharp_dataframe_spark.functions.util import spread

    return (
        spread(df, id_col, text_col)
        .select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep exactly one row per distinct normalized content (the min id).
    Implemented as min_by over the fingerprint groups — one shuffle."""
    keepers = exact_dedup_groups(df, id_col, text_col).select(F.col("keep_id").alias(id_col))
    return df.join(keepers, on=id_col, how="left_semi")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the lowercased text."""
    toks = tokens(F.lower(text))
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(grams)


def shingle_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct-shingle relation.  Tokenization
    is the CPU-heavy step — spread() rebalances a few-partition input
    so it parallelizes (no-op when the input is already split)."""
    from fsharp_dataframe_spark.functions.util import spread

    return (
        spread(df, id_col, text_col)
        .select(F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("shingle"))
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3, threshold: float = 0.5,
                        max_doc_freq: int | None = None,
                        reuse_shingles: bool = True) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle.

    explode → self-join on shingle (the join key distributes by
    shingle hash; hot shingles are the skew risk — AQE skew-join
    handles moderate skew).  Returns (id_a, id_b, jaccard) with
    id_a < id_b and jaccard >= threshold.

    ``max_doc_freq`` is the skew guard for heavy-tailed corpora: a
    shingle appearing in more than that many documents is excluded
    from CANDIDATE GENERATION (its self-join bucket is quadratic in
    its document frequency — one boilerplate phrase shared by 1M docs
    is 5·10¹¹ join rows in a single key), and the surviving candidate
    pairs are re-scored with the skew-immune per-pair intersection
    (jaccard_verify_pairs), so every emitted jaccard is still EXACT
    over the FULL shingle sets (hot shingles included).  Recall
    contract: a pair is found iff it shares at least one sub-cap
    shingle — pairs whose overlap is exclusively boilerplate hotter
    than the cap are (deliberately) not near-duplicates worth pairing.
    ``reuse_shingles`` materializes the (id, shingle) relation once
    (MEMORY_AND_DISK, spillable) before fanning it out to the join's
    two sides and the per-doc size aggregate.  Without it Catalyst
    plans each consumer as its own subtree, so the corpus is
    re-tokenized FOUR times per query (measured: both join sides plus
    two copies of the size aggregate — broadcast build sides cannot
    share a shuffle exchange).  Tokenization is the CPU-heavy step;
    this is the in-session equivalent of a pipeline writing its
    shingle table to parquet before the pair join.  Blocks are released
    deterministically via util.release_cached()/cache_scope() (pipeline
    callers) or by the ContextCleaner when the result goes out of scope.
    """
    from fsharp_dataframe_spark.functions.util import track_persist

    def _mat(rel: DataFrame) -> DataFrame:
        return track_persist(rel) if reuse_shingles else rel

    if max_doc_freq is not None:
        # Guarded EXACT path, decomposed so no second tokenization pass
        # and no per-pair full-array intersect are needed:
        #   inter(a,b) = inter_subcap(a,b) + |hot(a) ∩ hot(b)|
        # inter_subcap falls out of the capped self-join's aggregation
        # (the same count shape as the unguarded path, minus hot keys);
        # the hot correction joins per-doc HOT-shingle arrays, which
        # are tiny by construction — a doc holds at most a handful of
        # above-cap boilerplate shingles, so the per-pair payload is
        # bytes, not the full shingle set.  Union uses FULL set sizes,
        # so every emitted jaccard is exact over the full sets.
        sh_all = _mat(shingle_table(df, id_col, text_col, n))
        hot = (sh_all.groupBy("shingle").agg(F.count("*").alias("_df"))
               .filter(F.col("_df") > max_doc_freq).select("shingle"))
        # ADAPTIVE: when the corpus has no shingle above the cap (the
        # clean common case) the whole hot machinery — two anti-joins,
        # hot-array aggregates, correction joins — is dead weight
        # (measured +4s at sf0.1).  Probing emptiness is one small
        # aggregate over the ALREADY-PERSISTED shingle relation, whose
        # materialization the final action reuses; with skew present
        # the guarded plan below runs, which is the point of the cap.
        if reuse_shingles and hot.isEmpty():
            return _ngram_pairs_plain(sh_all, id_col, threshold)
        # capped feeds BOTH self-join sides: materialize it too, or the
        # anti-join against the hot set runs once per side
        capped = _mat(sh_all.join(hot, on="shingle", how="left_anti"))
        sizes = sh_all.groupBy(id_col).agg(F.count("*").alias("n_sh"))
        l, r = capped.alias("l"), capped.alias("r")
        pairs = (
            l.join(r, on="shingle")
            .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .groupBy(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"))
            .agg(F.count("*").alias("_inter_sub"))
        )
        hot_arrays = (sh_all.join(hot, on="shingle")
                      .groupBy(id_col)
                      .agg(F.collect_list("shingle").alias("_hot")))
        empty = F.array().cast("array<string>")
        ha = hot_arrays.select(F.col(id_col).alias("id_a"),
                               F.col("_hot").alias("_hot_a"))
        hb = hot_arrays.select(F.col(id_col).alias("id_b"),
                               F.col("_hot").alias("_hot_b"))
        sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"))
        sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"))
        inter = (F.col("_inter_sub")
                 + F.size(F.array_intersect(F.coalesce(F.col("_hot_a"), empty),
                                            F.coalesce(F.col("_hot_b"), empty))))
        return (
            pairs.join(ha, "id_a", "left").join(hb, "id_b", "left")
            .join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.round(inter / (F.col("na") + F.col("nb") - inter), 4))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    # Shape notes (both alternatives measured at sf0.1):
    # - join sides stay NARROW (id, shingle); doc shingle-counts come
    #   from a separate tiny aggregate broadcast-joined onto the
    #   aggregated pairs.  Carrying n_sh inline through the explode is
    #   40x worse: project collapsing pushes size(word_shingles(text))
    #   AFTER the Generate, re-tokenizing per exploded shingle row.
    # - a posting-list variant (collect_list per shingle + double
    #   explode) is ~25x worse: hot shingles expand quadratically
    #   inside single tasks, while the sort-merge join streams them.
    base = _mat(shingle_table(df, id_col, text_col, n))
    return _ngram_pairs_plain(base, id_col, threshold)


def _ngram_pairs_plain(shingles: DataFrame, id_col: str,
                       threshold: float) -> DataFrame:
    """All-pairs exact jaccard from an (id, shingle) relation: shingle
    self-join → per-pair intersection counts → size join."""
    sh = shingles.alias("l")
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    r = shingles.alias("r")
    pairs = (
        sh.join(r, on="shingle")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"))
    # no explicit broadcast hint: the size table is one row per DOC
    # (O(corpus) at scale, a driver-OOM risk if force-broadcast); AQE
    # broadcasts it when it is actually small and shuffle-joins when not
    out = (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       n: int = 3, k: int = 32,
                       hash_family: str = "xxh64") -> DataFrame:
    """k-permutation MinHash signature per document.

    Permutation i is hash(i || shingle) — k independent hash families.
    Shingles are built ONCE per document (explode), each shingle is
    hashed k times, and k partial-aggregating F.min reduce to the
    signature — one shuffle keyed by id.

    ``hash_family``: "xxh64" (default; array<long> signature, one
    JVM-native hash per permutation — the production hot path) or
    "md5" (array<string> of 8-hex-char digest lanes; the numeric MIN
    is taken LEXICOGRAPHICALLY, which for fixed-width lowercase hex
    equals numeric order — and md5 is byte-identical across engines,
    so an md5-family signature is replayable by a DuckDB oracle, the
    hard signal the driver's minhash query runs with).  The md5
    family hashes each shingle only ceil(k/4) times: the four
    disjoint 32-bit lanes of one digest are independent hash
    functions, so permutation i reads lane i%4 of digest i//4
    (measured: the 1-lane-per-digest form cost +1.4s at sf0.1, ~2.7×
    the xxh64 baseline; 4 lanes bring the family within noise of it).

    The earlier one-projection form (array_min(transform(sh, ...)) per
    permutation) was 30× slower: Catalyst's project collapsing inlines
    the shingle-construction expression into every one of the k
    branches, so tokenization ran k times per row.
    """
    # r16 (guide §7.3): aggregates rendered as SQL text — the former
    # Column-built k-ary list cost ~250 py4j round-trips of pure
    # driver time per call; the parsed expressions are identical
    # (oracle-re-verified).
    if hash_family == "md5":
        def perm_sql(i: int) -> str:
            return (f"substring(md5(concat('{i // 4}|', shingle)),"
                    f" {1 + 8 * (i % 4)}, 8)")
    elif hash_family == "xxh64":
        def perm_sql(i: int) -> str:
            return f"xxhash64(concat('{i}|', shingle))"
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    sh = shingle_table(df, id_col, text_col, n)
    mins = sh.groupBy(id_col).agg(*[
        F.expr(f"min({perm_sql(i)})").alias(f"_h{i}") for i in range(k)
    ])
    arr = ",".join(f"_h{i}" for i in range(k))
    return mins.select(F.col(id_col),
                       F.expr(f"array({arr})").alias("minhash"))


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      n: int = 3, k: int = 32, bands: int = 8,
                      threshold: float = 0.5,
                      hash_family: str = "xxh64") -> DataFrame:
    """MinHash+LSH near-duplicate pairs.

    Signature → `bands` bands of k/bands rows; band signature =
    hash of its slice; candidates = ids colliding in any band
    (shuffle key: (band, signature) — uniform by construction);
    verification = estimated Jaccard (fraction of equal minhashes)
    >= threshold.  At 100 TB: linear scan + one groupBy on band keys
    + pair verification only on collisions.
    ``hash_family`` — see minhash_signatures ("md5" is replayable by a
    DuckDB oracle; band signatures then hash with md5 too, used only
    for equality so the digest string itself is the join key).
    """
    from fsharp_dataframe_spark.functions.util import track_persist

    r = k // bands
    # one row per doc (id + k minhash components): materialize so the
    # band join's two sides and the estimate both read the computed
    # signatures instead of re-running the shingle explode + k-way
    # aggregate — sketch tables are O(corpus row count), not O(corpus
    # bytes), so this caches cheaply even when the corpus itself could
    # not
    sigs = track_persist(minhash_signatures(df, id_col, text_col, n, k,
                                            hash_family=hash_family))
    hf = "md5" if hash_family == "md5" else "xxhash64"
    band_sqls = ",".join(
        f"{hf}(concat_ws(','," + ",".join(
            f"cast(minhash[{b * r + j}] as string)" for j in range(r))
        + "))"
        for b in range(bands))
    banded = sigs.select(
        id_col, "minhash",
        # SQL-rendered band array (one py4j call — guide §7.3); the
        # parsed tree is the same hash(concat_ws(casts)) per band
        F.posexplode(F.expr(f"array({band_sqls})"))
        .alias("band", "band_sig"),
    )
    l = banded.alias("l")
    rr = banded.alias("r")
    cand = (
        l.join(rr, on=["band", "band_sig"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.minhash").alias("mh_a"),
            F.col("r.minhash").alias("mh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(F.filter(F.zip_with(F.col("mh_a"), F.col("mh_b"), lambda a, b: a == b),
                          lambda x: x)) / F.lit(k)
    return (
        cand.withColumn("est_jaccard", F.round(est, 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def jaccard_verify_pairs(df: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 3) -> DataFrame:
    """EXACT n-gram Jaccard computed only for the given candidate
    (id_a, id_b) pairs — the verification tier.

    Unlike the all-pairs shingle self-join (quadratic in hot-shingle
    bucket size), this joins each pair to its two docs' distinct
    shingle ARRAYS and intersects them per pair: cost is
    O(|pairs| · doc_len), independent of shingle frequency skew —
    the only shape that survives when candidates come from LSH at
    100 TB."""
    from fsharp_dataframe_spark.functions.util import spread, track_persist

    # the (id, shingle-array) relation feeds both the id_a and id_b
    # probes; materialize it once (spillable) — the in-session
    # equivalent of writing the shingle table before the verify join
    sh = track_persist(spread(df, id_col, text_col).select(
        F.col(id_col), word_shingles(F.col(text_col), n).alias("_sh")))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_sh_b"))
    j = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect(F.col("_sh_a"), F.col("_sh_b")))
    union = F.size(F.col("_sh_a")) + F.size(F.col("_sh_b")) - inter
    return j.select(
        "id_a", "id_b",
        F.round(inter / union, 4).alias("jaccard"),
    )


def contamination_overlap(docs: DataFrame, benchmark: DataFrame,
                          id_col: str = "doc_id", text_col: str = "text",
                          bench_text_col: str | None = None,
                          n: int = 3) -> DataFrame:
    """Benchmark DECONTAMINATION: per training document, its distinct
    word n-gram shingles that appear in ANY benchmark document.

    The training-data hygiene step run before every model train: eval
    benchmarks must not leak into the corpus, and the standard test is
    n-gram overlap.  Returns (id_col, n_sh, n_hit, contamination)
    where contamination = n_hit / n_sh; filter contamination >= τ (or
    n_hit >= k) to quarantine.

    Scale shape: the benchmark side is SMALL by nature (eval sets are
    thousands of documents, not billions), so its distinct shingle set
    is broadcast and the probe is a map-side LEFT SEMI join — the
    corpus-side shingle relation never shuffles on the shingle key.
    For a benchmark too large to broadcast, drop the hint and the same
    plan degrades to a shuffle semi-join, still O(corpus shingles).
    """
    bench_sh = (
        shingle_table(benchmark, id_col=id_col,
                      text_col=bench_text_col or text_col, n=n)
        .select("shingle").distinct()
    )
    doc_sh = shingle_table(docs, id_col=id_col, text_col=text_col, n=n)
    sizes = doc_sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    hits = (doc_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
            .groupBy(id_col).agg(F.count("*").alias("n_hit")))
    return (
        sizes.join(hits, id_col, "left")
        .select(F.col(id_col), F.col("n_sh"),
                F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
                F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_sh"), 4)
                 .alias("contamination"))
    )


def near_dedup_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                     n: int = 3, k: int = 32, bands: int = 8,
                     threshold: float = 0.5, candidate_margin: float = 0.15) -> DataFrame:
    """The production near-dedup cascade: MinHash+LSH candidate
    generation (linear, banded) → EXACT Jaccard verification on the
    candidates only (jaccard_verify_pairs) → threshold filter.

    The LSH estimate admits candidates down to ``threshold -
    candidate_margin`` so near-threshold pairs are not lost to
    signature noise; the exact verification then decides.  Both stages
    are skew-safe: no all-pairs join ever touches the full corpus."""
    cands = minhash_lsh_pairs(df, id_col, text_col, n, k, bands,
                              threshold=max(0.0, threshold - candidate_margin))
    exact = jaccard_verify_pairs(df, cands, id_col, text_col, n)
    return exact.filter(F.col("jaccard") >= threshold)


def cross_near_dup_pairs(new: DataFrame, existing: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 3, threshold: float = 0.5,
                         max_doc_freq: int | None = None) -> DataFrame:
    """DIRECTIONAL near-duplicate pairs between a NEW batch and an
    EXISTING corpus — the incremental-ingest hygiene step: freshly
    crawled data must be deduplicated against what is already in the
    training set, not only against itself.  Returns (new_id, old_id,
    jaccard >= threshold); drop each new doc with any row here.

    Shape: one shingle relation per side, joined on shingle — the
    candidate space is new×existing co-occurrence, never existing²
    (the expensive side is never self-joined; re-ingesting a batch is
    |new|-bounded work however large the corpus grew).  With
    ``max_doc_freq``, shingles hotter than the cap IN THE EXISTING
    CORPUS are excluded from candidate generation and corrected
    exactly per pair, as in ngram_jaccard_pairs."""
    from fsharp_dataframe_spark.functions.util import track_persist

    sh_new = track_persist(shingle_table(new, id_col, text_col, n))
    sh_old = track_persist(shingle_table(existing, id_col, text_col, n))
    sizes_new = sh_new.groupBy(id_col).agg(F.count("*").alias("n_new"))
    sizes_old = sh_old.groupBy(id_col).agg(F.count("*").alias("n_old"))
    j_new, j_old, hot_new, hot_old = sh_new, sh_old, None, None
    if max_doc_freq is not None:
        hot = (sh_old.groupBy("shingle").agg(F.count("*").alias("_df"))
               .filter(F.col("_df") > max_doc_freq).select("shingle"))
        # adaptive, as in ngram_jaccard_pairs: the hot-correction
        # machinery only enters the plan when the existing corpus
        # actually has above-cap shingles (emptiness probe runs over
        # the persisted relation the final action reuses)
        if not hot.isEmpty():
            j_new = sh_new.join(hot, on="shingle", how="left_anti")
            j_old = sh_old.join(hot, on="shingle", how="left_anti")
            hot_new = (sh_new.join(hot, on="shingle").groupBy(id_col)
                       .agg(F.collect_list("shingle").alias("_hot_a")))
            hot_old = (sh_old.join(hot, on="shingle").groupBy(id_col)
                       .agg(F.collect_list("shingle").alias("_hot_b")))
    pairs = (
        j_new.alias("l").join(j_old.alias("r"), on="shingle")
        .groupBy(F.col(f"l.{id_col}").alias("new_id"),
                 F.col(f"r.{id_col}").alias("old_id"))
        .agg(F.count("*").alias("_inter"))
    )
    inter = F.col("_inter")
    if hot_new is not None:
        empty = F.array().cast("array<string>")
        pairs = (pairs
                 .join(hot_new.select(F.col(id_col).alias("new_id"), "_hot_a"),
                       "new_id", "left")
                 .join(hot_old.select(F.col(id_col).alias("old_id"), "_hot_b"),
                       "old_id", "left"))
        inter = inter + F.size(F.array_intersect(
            F.coalesce(F.col("_hot_a"), empty),
            F.coalesce(F.col("_hot_b"), empty)))
    out = (
        pairs
        .join(sizes_new.select(F.col(id_col).alias("new_id"), "n_new"), "new_id")
        .join(sizes_old.select(F.col(id_col).alias("old_id"), "n_old"), "old_id")
        .withColumn("jaccard",
                    F.round(inter / (F.col("n_new") + F.col("n_old") - inter), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "old_id", "jaccard")
    )
    return out


def incremental_dedup(new: DataFrame, existing: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 3, threshold: float = 0.5,
                      max_doc_freq: int | None = None) -> DataFrame:
    """Keep the rows of ``new`` that survive ingest against an existing
    corpus: (1) not an EXACT duplicate of any existing doc (fingerprint
    anti-join — broadcast-able when the fingerprint set is extracted,
    shuffle semi-join otherwise), (2) not a NEAR duplicate (>= threshold
    n-gram jaccard vs any existing doc), and (3) self-deduplicated
    exactly (the new batch can contain its own duplicates).  This is
    the composed incremental-ingest operator a training pipeline runs
    per crawl batch."""
    from fsharp_dataframe_spark.functions.util import track_persist

    old_fps = (existing.select(fingerprint(F.col(text_col)).alias("fp"))
               .distinct())
    fresh = (new.withColumn("_fp", fingerprint(F.col(text_col)))
             .join(old_fps, F.col("_fp") == F.col("fp"), "left_anti")
             .drop("_fp"))
    # stage boundary: the exact-deduped batch feeds the near-dup pair
    # join (via its shingle table) AND the final anti-join — persist
    # it once instead of re-running fingerprint+anti-join+groupBy per
    # consumer (the in-session analog of writing the intermediate
    # batch to parquet; measured 14.9s → ~8s at sf0.1)
    fresh = track_persist(exact_dedup(fresh, id_col, text_col))
    near = (cross_near_dup_pairs(fresh, existing, id_col, text_col, n,
                                 threshold, max_doc_freq)
            .select(F.col("new_id").alias(id_col)).distinct())
    return fresh.join(near, on=id_col, how="left_anti")


def simhash(text: Column, bits: int = 64) -> Column:
    """SimHash sketch: sign-sum of per-token hash bits.

    Token hash = xxhash64(token); bit j's vote = +1/-1 by bit value;
    sketch bit j = 1 if the sum is positive.  Computed with array
    transforms + aggregate — one pass, no explode."""
    toks = tokens(F.lower(text))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # shift amounts must be Python ints (Spark's shiftleft/right take
    # literals), so the per-bit votes are an unrolled literal array
    acc = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda a, h: F.zip_with(
            a,
            F.array(*[
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                for j in range(bits)
            ]),
            lambda x, y: x + y,
        ),
    )
    sketch = F.lit(0).cast("long")
    for j in range(bits):
        bit_j = F.when(F.element_at(acc, j + 1) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        sketch = sketch.bitwiseOR(F.shiftleft(bit_j, j))
    return sketch


def simhash_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  bits: int = 64, hash_family: str = "xxh64") -> DataFrame:
    """(id, sh) sketches via explode + groupBy — one token hash per
    token and ``bits`` trivial partial-aggregating sums, instead of the
    Column-expression form's per-token 64-wide array fold (which
    allocates a vote array per token).  Bit-identical to `simhash`:
    vote_j = Σ(±1 per token) = 2·Σbit_j − n, same >0 threshold.

    ``hash_family`` picks the per-token hash: "xxh64" (default — one
    JVM-native hash, the production hot path) or "md5" (two 32-bit
    halves parsed from the md5 hex digest — ~2× more expression work,
    but md5 is byte-identical across engines, so an md5-family sketch
    is replayable by a DuckDB SQL oracle; the driver's simhash_pairs
    query runs this family for exactly that hard signal).
    """
    from fsharp_dataframe_spark.functions.util import spread

    toks = tokens(F.lower(F.col(text_col)))
    ex = spread(df, id_col, text_col).select(
        F.col(id_col), F.explode_outer(toks).alias("__tok"))
    # hash once, then plain bit-count sums (no per-row CASE WHEN): the
    # ±1 vote sum is 2·cnt_j − n, so vote_j > 0 ⟺ 2·cnt_j > n — exact
    # integers, bit-identical sketches at half the expression width.
    # xxhash64(NULL) is the seed (42), NOT NULL, so the NULL row that
    # explode_outer adds for empty docs must be nulled explicitly or
    # sum() would count 42's bits; with the guard, empty docs get
    # all-NULL bit sums (NULL > 0 is NULL → bit 0) and sketch to 0,
    # bit-identical with simhash()'s empty-array fold.
    # r16 (guide §7.3): the former Column-built form issued ~800 py4j
    # round-trips per call (64 aggregate columns of ~6 nodes each plus
    # a 64-term shiftleft/bitwiseOR chain) — pure Python driver time.
    # The SAME expressions are now rendered as SQL text (one F.expr per
    # aggregate, one for the whole sketch assembly): identical
    # functions, identical NULL semantics (if() with a NULL condition
    # takes the else-branch exactly like when().otherwise()), so
    # sketches are bit-identical — oracle-re-verified.
    if hash_family == "md5":
        if bits != 64:
            raise ValueError("md5 hash_family supports bits=64 only")
        # bit j < 32 comes from the LOW half (md5 hex chars 9-16), bit
        # j >= 32 from the HIGH half (chars 1-8): each half parses to a
        # 32-bit value via conv(hex, 16, 10), overflow-free in a long.
        ex = ex.selectExpr(
            f"`{id_col}`", "__tok",
            "cast(conv(substring(md5(__tok), 1, 8), 16, 10) as bigint)"
            " as __hi",
            "cast(conv(substring(md5(__tok), 9, 8), 16, 10) as bigint)"
            " as __lo")

        def bit_sql(j: int) -> str:
            src = "__lo" if j < 32 else "__hi"
            return f"shiftright({src}, {j % 32}) & 1"
    elif hash_family == "xxh64":
        # xxhash64(NULL) is the seed (42), NOT NULL — guard explicitly
        ex = ex.selectExpr(
            f"`{id_col}`", "__tok",
            "if(__tok is not null, xxhash64(__tok),"
            " cast(null as bigint)) as __h")

        def bit_sql(j: int) -> str:
            return f"shiftright(__h, {j}) & 1"
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    aggs = [F.expr(f"sum({bit_sql(j)})").alias(f"__c{j}")
            for j in range(bits)]
    g = ex.groupBy(id_col).agg(*aggs, F.count(F.col("__tok")).alias("__n"))
    sketch = " | ".join(
        f"shiftleft(if(__c{j} * 2 > __n, 1L, 0L), {j})"
        for j in range(bits))
    return g.select(F.col(id_col),
                    F.expr(f"cast(0 as bigint) | {sketch}").alias("sh"))


def pigeonhole_pieces(bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """(offset, width) cuts for pigeonhole Hamming banding: the sketch
    splits into ``max_hamming + 1`` disjoint pieces so any pair within
    the bound shares >= 1 equal piece.  Fail-fast validation (the
    _uniform_bin discipline): a plan-build ValueError beats the opaque
    executor-side LongType overflow ``F.lit(1 << 64)`` used to raise
    for the max_hamming=0 full-width piece (ADVICE r10)."""
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in 1..64, got {bits}")
    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0, got {max_hamming}")
    if max_hamming + 1 > bits:
        raise ValueError(
            f"max_hamming={max_hamming} needs {max_hamming + 1} pieces "
            f"but the sketch has only {bits} bits")
    n_pieces = max_hamming + 1
    widths = [bits // n_pieces + (1 if i < bits % n_pieces else 0)
              for i in range(n_pieces)]
    offs, o = [], 0
    for w in widths:
        offs.append((o, w))
        o += w
    return offs


def piece_expr(col, off: int, w: int):
    """Extract the ``w``-bit piece at ``off`` of a long sketch column.
    A 64-bit-wide piece (max_hamming=0) is the column itself — the
    mask (1<<64)-1 would overflow LongType at plan build, and masking
    the full width is the identity anyway."""
    x = F.shiftright(col, off) if off else col
    return x if w >= 64 else x.bitwiseAND(F.lit((1 << w) - 1))


def banded_hamming_pairs(sketches: DataFrame, id_col: str = "doc_id",
                         sketch_col: str = "sh",
                         max_hamming: int = 8,
                         bits: int = 64) -> DataFrame:
    """Pigeonhole-banded Hamming candidate join over any 64-bit-or-less
    sketch column — COMPLETE for the given bound: the sketch is cut
    into ``max_hamming + 1`` disjoint pieces, so any pair within the
    bound shares at least one equal piece and is generated as a
    candidate; verification = popcount of XOR.  Piece width shrinks as
    the bound grows (the candidate/recall trade is explicit, not
    silent).  The substrate under both text SimHash (simhash_pairs)
    and image dHash (multimodal.dhash_media) near-dedup — shuffle key
    = (piece index, piece bits), uniform for hash-like sketches, never
    all-pairs.

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    offs = pigeonhole_pieces(bits, max_hamming)
    from fsharp_dataframe_spark.functions.util import track_persist

    # (id, sh) is one long per row: materialize so both sides of the
    # piece self-join read computed sketches instead of recomputing
    # them (a broadcast build side cannot share the shuffle exchange)
    sh = track_persist(sketches.select(F.col(id_col),
                                       F.col(sketch_col).alias("sh"))
                       .filter(F.col("sh").isNotNull()))
    quarters = sh.select(
        id_col, "sh",
        F.posexplode(F.array(*[
            piece_expr(F.col("sh"), off, w) for off, w in offs
        ])).alias("q", "qv"),
    )
    l, r = quarters.alias("l"), quarters.alias("r")
    # Hamming filter BEFORE the pair dedup: the piece join emits every
    # bucket collision (7M rows at 5000 docs measured) and bit_count is
    # one codegen'd instruction, so filtering first shrinks the dedup
    # shuffle to the ~0.2% of pairs that are actually near-dups
    ham = F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh")))
    return (
        l.join(r, on=["q", "qv"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"),
                ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def hamming_piece_table(sketches: DataFrame, id_col: str = "doc_id",
                        sketch_col: str = "sh",
                        max_hamming: int = 8,
                        bits: int = 64) -> DataFrame:
    """(id, sh, q, qv) exploded pigeonhole-piece relation for a sketch
    column — the PERSISTABLE half of banded Hamming join pipelines: a
    nightly image-ingest job writes this once for the landed corpus
    (partitioned by q, or bucketed by (q, qv)) and every new batch
    joins against the stored table without re-hashing or re-exploding
    the corpus.  Piece cuts are validated (pigeonhole_pieces) and the
    NULL sketches rows no decoder could produce are dropped."""
    offs = pigeonhole_pieces(bits, max_hamming)
    return (sketches.select(F.col(id_col),
                            F.col(sketch_col).alias("sh"))
            .filter(F.col("sh").isNotNull())
            .select(id_col, "sh",
                    F.posexplode(F.array(*[
                        piece_expr(F.col("sh"), off, w) for off, w in offs
                    ])).alias("q", "qv")))


def cross_banded_hamming_pairs(new: DataFrame, existing: DataFrame,
                               id_col: str = "doc_id",
                               sketch_col: str = "sh",
                               max_hamming: int = 8,
                               bits: int = 64,
                               existing_is_piece_table: bool = False
                               ) -> DataFrame:
    """DIRECTIONAL banded Hamming pairs between a NEW batch of sketches
    and a LANDED corpus (r10 VERDICT ask #4) — the image face of
    cross_near_dup_pairs: a nightly ingest must near-dedup fresh
    images against everything already landed WITHOUT re-running the
    corpus self-join.  The candidate space is new×existing piece
    co-occurrence — the existing side is never self-joined, so
    re-ingesting a batch is |new|-bounded work however large the
    corpus grew (reference alignment discipline:
    src/JoinHelpers.fs:42-53 — restrict to the relevant range before
    joining).

    Pigeonhole-complete for the bound: both sides cut into
    ``max_hamming + 1`` disjoint pieces (shared validated substrate,
    pigeonhole_pieces), any pair within the bound collides in >= 1
    piece, popcount verifies BEFORE the pair dedup (the
    banded_hamming_pairs ordering — collisions shrink to actual
    near-dups before the dedup shuffle).

    ``existing_is_piece_table``: pass True when ``existing`` is a
    stored hamming_piece_table relation (the production shape — the
    corpus piece table persists across ingests; shuffle keys (q, qv)
    stay uniform for hash-like sketches).

    Returns (new_id, old_id, hamming) — no id ordering: the sides are
    distinct relations, and every emitted row means "this NEW item
    duplicates something ALREADY LANDED"."""
    npc = hamming_piece_table(new, id_col, sketch_col, max_hamming, bits)
    opc = (existing if existing_is_piece_table
           else hamming_piece_table(existing, id_col, sketch_col,
                                    max_hamming, bits))
    l, r = npc.alias("l"), opc.alias("r")
    ham = F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh")))
    return (
        l.join(r, on=["q", "qv"])
        .select(F.col(f"l.{id_col}").alias("new_id"),
                F.col(f"r.{id_col}").alias("old_id"),
                ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["new_id", "old_id"])
    )


def simhash_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 8, hash_family: str = "xxh64") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance — the text face of
    banded_hamming_pairs (pigeonhole-complete banding, see there).
    ``hash_family`` — see simhash_table ("md5" gives an engine-
    replayable sketch at ~2× token-hash expression cost).
    """
    return banded_hamming_pairs(
        simhash_table(df, id_col, text_col, hash_family=hash_family),
        id_col=id_col, sketch_col="sh", max_hamming=max_hamming)


def remove_duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 20,
                           min_count: int = 2) -> DataFrame:
    """Exact duplicate-SPAN removal: delete every token that lies
    inside any k-token gram occurring >= ``min_count`` times across
    the corpus (within-document repeats included) — the token-gram
    analog of suffix-array ExactSubstr dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499), with remove-ALL semantics (the conservative
    variant: no canonical copy survives; document-level near-dedup
    keeps canonicals, this pass targets boilerplate fragments).

    Returns one row per input row: (id, clean_text,
    n_tokens_removed).  Whitespace is normalized to single spaces in
    the reassembled text (tokens are whitespace-split).

    100 TB shape — every stage is LINEAR and relational; there is no
    per-document expression whose cost grows with the document's
    duplication level (a boilerplate-heavy 100k-token doc is the rule,
    not the edge case, in web corpora):

    1. gram hashes as one per-doc array projection (md5 of the joined
       slice: 128-bit, collision-free at corpus scale and
       byte-identical across engines for the SQL oracle; the k× text
       blowup is per-row transient — only 32-char hashes are exploded
       into the shuffle.  A rolling hash would make it O(n); measured
       irrelevant here, tokenization dominates);
    2. posexplode → (id, pos, gh), groupBy(gh) count >= min_count —
       one shuffle on the hash, uniform by construction;
    3. covered token indices = semi-join + explode(sequence(pos,
       pos+k-1)) + per-doc dedup — O(k · duplicated occurrences)
       rows, NOT O(corpus);
    4. kept tokens = posexplode(tokens) anti-join covered on
       (id, idx), reassembled per doc by array_sort(collect_list) —
       grouping is bounded by single-document size.
    """
    from fsharp_dataframe_spark.functions.util import spread, track_persist

    toks = tokens(F.col(text_col))
    base = track_persist(
        spread(df, id_col, text_col)
        .select(F.col(id_col), toks.alias("_t"), F.size(toks).alias("_n")))
    starts = F.when(F.col("_n") >= k,
                    F.sequence(F.lit(0), F.col("_n") - k)
                    ).otherwise(F.array().cast("array<int>"))
    ghs = F.transform(starts,
                      lambda p: F.md5(F.concat_ws(" ", F.slice(F.col("_t"), p + 1, k))))
    grams = base.select(F.col(id_col), F.posexplode(ghs).alias("pos", "gh"))
    dup = (grams.groupBy("gh").count()
           .filter(F.col("count") >= min_count).select("gh"))
    covered = (
        grams.join(dup, "gh", "left_semi")
        .select(F.col(id_col), F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("idx"))
        .dropDuplicates([id_col, "idx"])
    )
    tok_rows = base.select(F.col(id_col), F.posexplode("_t").alias("idx", "tok"))
    clean = (
        tok_rows.join(covered, [id_col, "idx"], "left_anti")
        .groupBy(id_col)
        .agg(F.concat_ws(" ", F.transform(
                 F.array_sort(F.collect_list(F.struct("idx", "tok"))),
                 lambda s: s["tok"])).alias("clean_text"),
             F.count("*").alias("_n_kept"))
    )
    return (
        base.join(clean, id_col, "left")
        .select(F.col(id_col),
                F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
                (F.col("_n") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias("n_tokens_removed"))
    )


def dedup_paragraphs(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """CCNet-style paragraph-level deduplication (Wenzek et al. 2020
    §3.1: web text duplicates at the PARAGRAPH grain — boilerplate
    headers/footers/menus repeat across pages while the documents stay
    distinct): drop every paragraph whose exact content appeared
    earlier in the corpus — the first occurrence by (doc id, position)
    survives, so one canonical copy remains (unlike
    remove_duplicate_spans' remove-all semantics, which targets
    fragments) — then reassemble documents from the survivors.

    Scale shape: paragraphs shuffle ONCE on their md5 (128-bit,
    collision-free at corpus scale and byte-identical across engines
    for the SQL oracle); the first-occurrence winner is a map-side
    combined min over the (doc_id, idx) struct; reassembly is one
    groupBy(doc) with a deterministic sort_array.  A boilerplate
    paragraph shared by 1M docs is 1M rows on one hash key — partial
    aggregation absorbs the min side, and AQE's skew-join splits the
    winner attach.

    Returns (id_col, clean_text, n_paras, n_removed), one row per
    input document; fully-boilerplate documents survive with empty
    text (filter ``n_removed == n_paras`` downstream to drop them).
    Paragraphs are trimmed non-empty lines; reassembly joins with
    single newlines (blank-line runs collapse — documented
    normalization, same discipline as remove_duplicate_spans).
    """
    paras = F.filter(F.transform(F.split(F.col(text_col), "\n"),
                                 lambda x: F.trim(x)),
                     lambda x: x != "")
    ex = (df.select(F.col(id_col), F.posexplode(paras).alias("idx", "para"))
          .withColumn("ph", F.md5(F.col("para"))))
    winners = ex.groupBy("ph").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("idx").alias("i")))
         .alias("_w"))
    kept = (ex.join(winners, "ph")
            .filter((F.col(id_col) == F.col("_w.d"))
                    & (F.col("idx") == F.col("_w.i"))))
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("_n_kept"),
        F.concat_ws("\n", F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "para"))),
            lambda s: s["para"])).alias("clean_text"))
    totals = df.select(F.col(id_col), F.size(paras).cast("long").alias("n_paras"))
    return (totals.join(rebuilt, on=id_col, how="left")
            .select(F.col(id_col),
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    "n_paras",
                    (F.col("n_paras") - F.coalesce("_n_kept", F.lit(0)))
                    .cast("long").alias("n_removed")))


def dedup_report(df: DataFrame, by: list[str],
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Duplicate-rate rollup per corpus slice — the ops dashboard of a
    dedup pipeline (which sources/languages are polluting the corpus):
    per ``by`` group, document count, distinct normalized contents
    (fingerprint — same key exact_dedup keeps), and the duplicate rate.

    ONE pass: groupBy (by..., fp) with map-side combine, then a
    group-cardinality rollup.  The rate is pinned as an exact integer
    floor division in basis points ((n - n_unique)·10⁴ div n — the
    vwap discipline; a double round() sits on ties engines break
    differently), then one identical int→double conversion.
    """
    fp = fingerprint(F.col(text_col))
    per_fp = (df.groupBy(*[F.col(c) for c in by], fp.alias("__fp"))
              .agg(F.count("*").alias("__n")))
    m = (per_fp.groupBy(*by)
         .agg(F.sum("__n").alias("n_docs"),
              F.count("*").alias("n_unique")))
    rate = (F.expr("CAST((n_docs - n_unique) * 10000 AS DECIMAL(38,0))"
                   " div n_docs").cast("double") / 10000.0)
    return m.select(*by, "n_docs", "n_unique", rate.alias("dup_rate"))


def source_overlap(df: DataFrame, group_col: str = "source",
                   id_col: str = "doc_id", text_col: str = "text",
                   n: int = 3) -> DataFrame:
    """Cross-source contamination matrix: for every pair of corpus
    sources, how many distinct word n-gram shingles they share, plus
    the shingle-set Jaccard — the audit that catches one ingest feed
    plagiarizing another (mirrored sites, laundered crawls) before
    both inflate the training mix.

    Scale shape: the per-(source, shingle) DISTINCT relation bounds
    the self-join fan-out to |sources| rows per shingle (never
    documents²), the join distributes by shingle hash exactly like the
    dedup family, and totals ride a broadcast source-sized relation.

    Returns (source_a, source_b, n_shared, jaccard) for source_a <
    source_b, jaccard rounded 6dp.
    """
    from fsharp_dataframe_spark.functions.util import spread

    # docs with fewer than n tokens would emit one TRUNCATED shingle
    # (and blank docs the empty-string shingle), so two sources that
    # each contain any short/blank doc would count phantom shared
    # shingles and inflate jaccard (ADVICE r9) — drop them before the
    # distinct/self-join; a doc shorter than one n-gram has no n-grams.
    gs = (spread(df, group_col, id_col, text_col)
          .filter(F.size(tokens(F.lower(F.col(text_col)))) >= n)
          .select(F.col(group_col).alias("g"),
                  F.explode(word_shingles(F.col(text_col), n))
                  .alias("shingle"))
          .distinct())
    tot = gs.groupBy("g").agg(F.count("*").alias("n_sh"))
    a, b = gs.alias("a"), gs.alias("b")
    pairs = (a.join(b, "shingle")
             .filter(F.col("a.g") < F.col("b.g"))
             .groupBy(F.col("a.g").alias("source_a"),
                      F.col("b.g").alias("source_b"))
             .agg(F.count("*").alias("n_shared")))
    ta = tot.select(F.col("g").alias("source_a"), F.col("n_sh").alias("na"))
    tb = tot.select(F.col("g").alias("source_b"), F.col("n_sh").alias("nb"))
    j = (pairs.join(F.broadcast(ta), "source_a")
         .join(F.broadcast(tb), "source_b"))
    jac = (F.col("n_shared").cast("double")
           / (F.col("na") + F.col("nb") - F.col("n_shared")).cast("double"))
    return (j.select("source_a", "source_b", "n_shared",
                     F.round(jac, 6).alias("jaccard"))
            .orderBy("source_a", "source_b"))


def containment_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      threshold: float = 0.8,
                      max_doc_freq: int | None = None) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT pairs — the sub-document dup
    detector Jaccard misses: containment(small ⊂ big) =
    |shingles(a) ∩ shingles(b)| / min(|a|, |b|), so a short document
    quoted verbatim inside a long one scores 1.0 while its Jaccard is
    tiny (Broder 1997's containment measure next to his resemblance).
    The signal that catches wrapper pages, quote farms and
    re-publications padding a source article.

    Scale shape: identical to ngram_jaccard_pairs' plain path — one
    shingle-keyed self-join (the join key distributes by shingle hash)
    over the PERSISTED (id, shingle) relation, per-pair intersection
    counts, a per-doc size join AQE broadcasts when small.  Docs
    shorter than one shingle emit nothing (the source_overlap
    discipline).

    ``max_doc_freq`` is the hot-shingle skew guard — MORE important
    here than for Jaccard, because the sub-document regime this
    operator targets (wrapper pages, quote farms, boilerplate-padded
    republications) is exactly the regime where one shared legal
    footer joins 1M documents on a single shingle key (5·10¹¹ rows in
    one bucket).  Same EXACT decomposition as ngram_jaccard_pairs
    (dedup.py ngram_jaccard_pairs guarded path): shingles hotter than
    the cap are excluded from CANDIDATE GENERATION only, and the
    numerator is recovered exactly as
    ``inter = inter_subcap + |hot(a) ∩ hot(b)|`` via per-doc
    hot-shingle arrays (bytes per doc by construction).  Containment
    has no union term, so only the numerator decomposes — strictly
    simpler than Jaccard's.  The denominator min(|a|, |b|) always uses
    FULL set sizes, so every emitted containment is exact over the
    full shingle sets.  Recall contract: a pair is found iff it shares
    at least one sub-cap shingle — a pair whose entire overlap is
    boilerplate hotter than the cap is not a containment dup worth
    pairing.  When no shingle exceeds the cap (the clean common case)
    an emptiness probe over the already-persisted shingle relation
    falls through to the plain plan, so the guard costs one small
    aggregate, not two anti-joins.

    Returns (id_a, id_b, n_a, n_b, containment) with id_a < id_b and
    containment >= threshold, rounded 4dp.
    """
    from fsharp_dataframe_spark.functions.util import track_persist

    sh = track_persist(shingle_table(
        df.filter(F.size(tokens(F.lower(F.col(text_col)))) >= n),
        id_col, text_col, n))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))

    if max_doc_freq is not None:
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("_df"))
               .filter(F.col("_df") > max_doc_freq).select("shingle"))
        if not hot.isEmpty():
            # guarded EXACT path: capped self-join for the sub-cap
            # intersection, tiny per-doc hot arrays for the correction
            capped = track_persist(sh.join(hot, on="shingle",
                                           how="left_anti"))
            l, r = capped.alias("l"), capped.alias("r")
            pairs = (
                l.join(r, on="shingle")
                .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
                .groupBy(F.col(f"l.{id_col}").alias("id_a"),
                         F.col(f"r.{id_col}").alias("id_b"))
                .agg(F.count("*").alias("_inter_sub"))
            )
            hot_arrays = (sh.join(hot, on="shingle")
                          .groupBy(id_col)
                          .agg(F.collect_list("shingle").alias("_hot")))
            empty = F.array().cast("array<string>")
            ha = hot_arrays.select(F.col(id_col).alias("id_a"),
                                   F.col("_hot").alias("_hot_a"))
            hb = hot_arrays.select(F.col(id_col).alias("id_b"),
                                   F.col("_hot").alias("_hot_b"))
            inter = (F.col("_inter_sub")
                     + F.size(F.array_intersect(
                         F.coalesce(F.col("_hot_a"), empty),
                         F.coalesce(F.col("_hot_b"), empty))))
            cont = F.round(inter / F.least(F.col("n_a"), F.col("n_b")), 4)
            return (
                pairs.join(ha, "id_a", "left").join(hb, "id_b", "left")
                .join(sa, "id_a").join(sb, "id_b")
                .withColumn("containment", cont)
                .filter(F.col("containment") >= threshold)
                .select("id_a", "id_b", "n_a", "n_b", "containment")
            )
    l, r = sh.alias("l"), sh.alias("r")
    pairs = (
        l.join(r, on="shingle")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(F.col(f"l.{id_col}").alias("id_a"),
                 F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    cont = F.round(F.col("inter")
                   / F.least(F.col("n_a"), F.col("n_b")), 4)
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .withColumn("containment", cont)
            .filter(F.col("containment") >= threshold)
            .select("id_a", "id_b", "n_a", "n_b", "containment"))
