"""Dedup cascade cross-validation (functions/dedup.py): LSH candidates
vs exact Jaccard, the verification tier, and the production cascade."""

from pyspark.sql import functions as F

from fsharp_dataframe_spark.sources.parquet import load_table
from fsharp_dataframe_spark.functions.dedup import (
    exact_dedup, jaccard_verify_pairs, minhash_lsh_pairs,
    near_dedup_pairs, ngram_jaccard_pairs, simhash_pairs,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").cache()


def test_exact_dedup_keeps_one_per_content(spark):
    docs = _docs(spark)
    kept = exact_dedup(docs)
    n_fp = docs.select(F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))) \
               .distinct().count()
    assert kept.count() == n_fp


def test_jaccard_verify_matches_allpairs_join(spark):
    # the pair-verification tier must reproduce the all-pairs exact
    # values on the pairs both produce
    docs = _docs(spark)
    exact = ngram_jaccard_pairs(docs, threshold=0.2)
    verified = jaccard_verify_pairs(docs, exact.select("id_a", "id_b"))
    ex = {(r["id_a"], r["id_b"]): r["jaccard"] for r in exact.collect()}
    ve = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert ex == ve


def test_near_dedup_cascade_matches_exact_tier(spark):
    # cascade output ⊆ exact all-pairs output, with identical values;
    # on the planted driver duplicates recall is total
    docs = _docs(spark)
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    cascade = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in near_dedup_pairs(docs, threshold=0.2).collect()}
    assert set(cascade) <= set(exact)
    for k, v in cascade.items():
        assert exact[k] == v
    recall = len(cascade) / len(exact) if exact else 1.0
    assert recall >= 0.9, f"cascade recall {recall}"


def test_minhash_estimates_track_exact_jaccard(spark):
    docs = _docs(spark)
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"]
           for r in minhash_lsh_pairs(docs, threshold=0.1).collect()}
    shared = set(exact) & set(est)
    assert shared, "no overlapping pairs to compare"
    for k in shared:
        assert abs(exact[k] - est[k]) < 0.35  # k=32 signature noise bound


def test_rolling_fingerprint_properties(spark):
    from fsharp_dataframe_spark.functions.text import rolling_fingerprint

    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [(0, base),
         (1, "THE  quick   brown fox jumps over the lazy dog again and again today"),
         (2, "completely different content with no shared phrases at all here now")],
        "doc_id long, text string")
    fps = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id", rolling_fingerprint(F.col("text")).alias("fp")).collect()}
    # case/whitespace-insensitive: same sketch
    assert fps[0] == fps[1]
    # disjoint content: different sketch
    assert fps[0] != fps[2]


def test_simhash_pairs_respect_hamming_bound(spark):
    docs = _docs(spark)
    out = simhash_pairs(docs, max_hamming=6).collect()
    assert all(r["hamming"] <= 6 for r in out)
    assert all(r["id_a"] < r["id_b"] for r in out)


def test_simhash_candidate_generation_is_complete(spark):
    # pigeonhole pieces = max_hamming+1: every pair within the bound
    # must be found — cross-check against brute-force sketch distances
    from fsharp_dataframe_spark.functions.dedup import simhash_table

    docs = _docs(spark)
    sk = simhash_table(docs)
    a = sk.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa"))
    b = sk.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"))
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("h", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("h") <= 6)
    )
    exact = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    got = {(r["id_a"], r["id_b"]) for r in simhash_pairs(docs, max_hamming=6).collect()}
    assert got == exact


def test_simhash_table_bit_identical_including_empty_docs(spark):
    # simhash_table must match the Column-expression simhash() on every
    # doc, INCLUDING empty/whitespace-only docs: xxhash64(NULL) is the
    # seed (42), so the explode_outer NULL row must not vote — empty
    # docs sketch to 0 (the empty-array fold), not 42.
    from fsharp_dataframe_spark.functions.dedup import simhash, simhash_table

    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, ""),
         (2, "   "),
         (3, "one more perfectly ordinary document body here")],
        "doc_id long, text string")
    expr = {r["doc_id"]: r["sh"] for r in
            df.select("doc_id", simhash(F.col("text")).alias("sh")).collect()}
    tab = {r["doc_id"]: r["sh"] for r in simhash_table(df).collect()}
    assert tab == expr
    assert tab[1] == 0 and tab[2] == 0


def test_ngram_skew_guard_exact_values_and_bounded_candidates(spark):
    # skewed corpus: every doc shares one boilerplate sentence (a hot
    # shingle in ALL docs); real near-dup pairs overlap on their own
    # content.  The guard must (a) still find those pairs with EXACT
    # full-set jaccard, (b) not generate the quadratic boilerplate
    # candidates.
    boiler = "this document is provided as is without any warranty"
    rows = []
    for i in range(60):
        body = f"unique content piece number {i} " + " ".join(
            f"w{i}x{j}" for j in range(12))
        rows.append((i, boiler + " " + body))
    # planted near-dups: copies of doc 0..4 with one word changed
    for i in range(5):
        rows.append((100 + i, rows[i][1].replace("piece", "slice")))
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    guarded = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in ngram_jaccard_pairs(docs, threshold=0.3,
                                            max_doc_freq=10).collect()}
    planted = {(i, 100 + i) for i in range(5)}
    assert planted <= set(exact)
    # every guarded pair carries the exact full-set value
    assert set(guarded) <= set(exact)
    for k, v in guarded.items():
        assert exact[k] == v
    # the planted near-dups share plenty of sub-cap shingles -> found
    assert planted <= set(guarded)
    # candidate generation is bounded: the hot boilerplate shingles are
    # out, so sub-cap candidates are only the planted overlaps, far
    # fewer than the 65*64/2 boilerplate pairs the unguarded join feeds
    from fsharp_dataframe_spark.functions.dedup import shingle_table
    sh = shingle_table(docs)
    hot = (sh.groupBy("shingle").count().filter(F.col("count") > 10))
    assert hot.count() > 0, "corpus must actually contain hot shingles"


def test_ngram_guard_matches_unguarded_on_real_corpus(spark):
    # on the driver documents table a generous cap must not change the
    # result at all (no qualifying pair relies on ultra-hot shingles)
    docs = _docs(spark)
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    guarded = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in ngram_jaccard_pairs(docs, threshold=0.2,
                                            max_doc_freq=50).collect()}
    assert exact == guarded


def test_incremental_dedup_semantics(spark):
    # new batch vs existing corpus: exact dup of existing -> dropped;
    # near-dup of existing -> dropped; self-dup within the batch ->
    # one survivor (min id); genuinely new -> kept
    from fsharp_dataframe_spark.functions.dedup import incremental_dedup

    existing = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely unrelated existing content about spark engines")],
        "doc_id int, text string")
    new = spark.createDataFrame(
        [(10, "The  quick brown fox jumps over the lazy dog today"),  # exact dup (normalized)
         (11, "the quick brown fox jumps over the lazy cat today"),   # near dup of 1
         (12, "fresh novel text that matches nothing else at all ok"),
         (13, "fresh novel text that matches nothing else at all ok"),  # self dup of 12
         (14, "another genuinely distinct document body entirely here")],
        "doc_id int, text string")
    out = {r["doc_id"] for r in
           incremental_dedup(new, existing, threshold=0.5).collect()}
    assert out == {12, 14}


def test_cross_near_dup_guard_matches_unguarded(spark):
    # the directional skew guard must not change results when no
    # shingle exceeds the cap, and must stay exact when some do
    from fsharp_dataframe_spark.functions.dedup import cross_near_dup_pairs

    boiler = "standard legal disclaimer text appended to everything"
    ex_rows = [(i, boiler + f" old unique body {i} " +
                " ".join(f"e{i}x{j}" for j in range(10))) for i in range(30)]
    new_rows = [(100 + i, ex_rows[i][1].replace("body", "torso"))
                for i in range(4)]
    new_rows.append((200, "totally different new content piece"))
    existing = spark.createDataFrame(ex_rows, "doc_id int, text string")
    new = spark.createDataFrame(new_rows, "doc_id int, text string")
    plain = {(r["new_id"], r["old_id"]): r["jaccard"]
             for r in cross_near_dup_pairs(new, existing, threshold=0.3).collect()}
    guarded = {(r["new_id"], r["old_id"]): r["jaccard"]
               for r in cross_near_dup_pairs(new, existing, threshold=0.3,
                                             max_doc_freq=5).collect()}
    assert plain, "planted near-dups must pair"
    for k, v in guarded.items():
        assert plain[k] == v
    assert {(100 + i, i) for i in range(4)} <= set(guarded)


def test_incremental_dedup_idempotent_and_disjoint(spark):
    # property: (a) running the survivors through incremental_dedup
    # again against the same corpus changes nothing (idempotence);
    # (b) survivors' fingerprints are disjoint from the existing
    # corpus's; (c) survivors joined with existing produce no pair at
    # or above the threshold
    from fsharp_dataframe_spark.functions.dedup import (
        cross_near_dup_pairs, incremental_dedup,
    )
    from fsharp_dataframe_spark.functions.text import fingerprint
    from fsharp_dataframe_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    existing = docs.filter(F.col("doc_id") % 3 == 0)
    new = docs.filter(F.col("doc_id") % 3 != 0)
    s1 = incremental_dedup(new, existing, threshold=0.5).cache()
    s2 = incremental_dedup(s1, existing, threshold=0.5)
    assert ({r["doc_id"] for r in s1.select("doc_id").collect()}
            == {r["doc_id"] for r in s2.select("doc_id").collect()})
    ex_fps = {r[0] for r in existing.select(
        fingerprint(F.col("text"))).collect()}
    s1_fps = {r[0] for r in s1.select(fingerprint(F.col("text"))).collect()}
    assert not (ex_fps & s1_fps)
    assert cross_near_dup_pairs(s1, existing, threshold=0.5).count() == 0


def test_remove_duplicate_spans_hand_checked(spark):
    from fsharp_dataframe_spark.functions.dedup import remove_duplicate_spans

    docs = spark.createDataFrame([
        (0, "a b c d e f g h"),      # shares 3-gram "c d e" with doc 1
        (1, "x y c d e z w q"),
        (2, "p q r s t u v w"),      # untouched
        (3, "m m m m m m"),          # within-doc repeats count too
        (4, ""),                     # empty doc survives as empty
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
           for r in remove_duplicate_spans(docs, k=3).collect()}
    assert got == {
        0: ("a b f g h", 3),
        1: ("x y z w q", 3),
        2: ("p q r s t u v w", 0),
        3: ("", 6),
        4: ("", 0),
    }


def test_remove_duplicate_spans_hash_family_and_xxh_agree(spark):
    # exact duplicate docs lose every gram; remove-all semantics means
    # BOTH copies empty out — and a doc shorter than k is never touched
    from fsharp_dataframe_spark.functions.dedup import remove_duplicate_spans

    docs = spark.createDataFrame(
        [(0, "one two three four five six"),
         (1, "one two three four five six"),
         (2, "short doc")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["clean_text"]
           for r in remove_duplicate_spans(docs, k=5).collect()}
    assert got == {0: "", 1: "", 2: "short doc"}


def test_dedup_paragraphs_first_occurrence_wins(spark):
    """CCNet paragraph-grain dedup: the first (doc_id, position)
    occurrence of a paragraph survives corpus-wide, later repeats drop
    (including within-document repeats), documents reassemble in
    order, and fully-boilerplate docs survive with empty text."""
    from fsharp_dataframe_spark.functions.dedup import dedup_paragraphs

    rows = [
        (1, "alpha one\nSHARED FOOTER\nbeta two"),
        (2, "SHARED FOOTER\ngamma three\ngamma three"),  # cross + self dup
        (3, "SHARED FOOTER"),                            # all boilerplate
        (4, "  alpha one  \n\n  delta four "),           # trim + blank line
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_paras"], r["n_removed"])
           for r in dedup_paragraphs(df).collect()}
    assert got[1] == ("alpha one\nSHARED FOOTER\nbeta two", 3, 0)
    assert got[2] == ("gamma three", 3, 2)
    assert got[3] == ("", 1, 1)
    assert got[4] == ("delta four", 2, 1)


def test_dedup_report_counts_and_rate(spark):
    from fsharp_dataframe_spark.functions.dedup import dedup_report

    rows = [(1, "en", "web", "Hello  world"), (2, "en", "web", "hello world"),
            (3, "en", "web", "unique text"), (4, "de", "web", "hallo")]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string")
    got = {(r["lang"], r["source"]): r for r in
           dedup_report(df, ["lang", "source"]).collect()}
    en = got[("en", "web")]
    # docs 1+2 share a normalized fingerprint -> 3 docs, 2 unique,
    # rate floor(1*10000/3)/10000 = 0.3333
    assert en["n_docs"] == 3 and en["n_unique"] == 2
    assert en["dup_rate"] == 0.3333
    assert got[("de", "web")]["dup_rate"] == 0.0
