"""Round-10 pins: the r9 ADVICE fixes (stream_bm25 corpus-absent terms
+ Unicode-whitespace tokenization parity, _uniform_bin / packing
validation, source_overlap phantom shingles) and the round's new
operators."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- bm25


def _stream_scores(spark, tmp_path, corpus, streamed, query):
    from fsharp_dataframe_spark.streaming.ops import (
        read_stream_parquet, run_to_memory, stream_bm25_score,
    )

    d = str(tmp_path / "bm25_src")
    streamed.coalesce(1).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, streamed.schema)
    out = stream_bm25_score(s, corpus, query)
    name = run_to_memory(out, "t_r10_bm25")
    return {r["doc_id"]: (r["score"], r["n_hit"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()}


def test_stream_bm25_corpus_absent_query_term(spark, tmp_path):
    """ADVICE r9 (high): a streamed document containing a query term
    with ZERO landed-corpus df — the incremental-ingest case — must
    score with the df_t = 0 idf instead of dying with a KeyError."""
    corpus = spark.createDataFrame(
        [(1, "spark joins data"), (2, "merge sort")],
        "doc_id long, text string")
    new_doc = spark.createDataFrame(
        [(10, "zebra zebra spark")], "doc_id long, text string")
    rows = _stream_scores(spark, tmp_path, corpus, new_doc, "spark zebra")
    score, n_hit = rows[10]
    assert n_hit == 2

    # replay the documented quantization driver-side: N=2, avgdl=2.5,
    # dl=3; df(spark)=1, df(zebra)=0 -> idf = ln(1 + (N+0.5)/0.5)
    def contrib(idf, tf, dl, avgdl, k1=1.2, b=0.75):
        return (idf * tf) * (k1 + 1.0) / (
            tf + k1 * ((1.0 - b) + (b * dl) / avgdl))

    units = 0
    for idf, tf in ((math.log(1.0 + ((2 - 1) + 0.5) / 1.5), 1),
                    (math.log(1.0 + (2 + 0.5) / 0.5), 2)):
        x = contrib(idf, tf, 3, 2.5) * 1_000_000
        units += int(math.floor(abs(x) + 0.5)) * (-1 if x < 0 else 1)
    y = units / 1_000_000.0 * 10_000
    exp = int(math.floor(abs(y) + 0.5)) * (-1 if y < 0 else 1) / 10_000.0
    assert score == exp


def test_stream_bm25_unicode_whitespace_parity(spark, tmp_path):
    """ADVICE r9 (medium): Python's \\s is Unicode-aware while Spark
    tokens() splits on Java's ASCII \\s — a document with NBSP /
    U+2028 must get the SAME dl/tf (hence score) from the streaming
    scorer as from the batch bm25_topk over the same corpus."""
    corpus = spark.createDataFrame(
        [(1, "spark\u00a0joins spark data"),       # NBSP: ONE token
         (2, "merge\u2028spark lines"),            # U+2028: ONE token
         (3, "plain spark prose here")],
        "doc_id long, text string")
    from fsharp_dataframe_spark.functions.search import bm25_topk

    batch = {r["doc_id"]: (r["score"], r["n_hit"])
             for r in bm25_topk(corpus, "spark merge", k=10).collect()}
    stream = _stream_scores(spark, tmp_path, corpus, corpus, "spark merge")
    got = {k: v for k, v in stream.items() if v[1] > 0}
    assert got == batch
    # and the Unicode glue really is load-bearing: doc 1's tf(spark)
    # must be 1 (NBSP did NOT split), so its dl is 3 not 4
    assert stream[1][1] == 1


# ---------------------------------------------------- input validation


def test_uniform_bin_validates_bounds(spark):
    from fsharp_dataframe_spark.functions.drift import (
        binned_auc, population_stability,
    )

    df = spark.createDataFrame([(1.0, 1)], "v double, y int")
    with pytest.raises(ValueError, match="hi > lo"):
        population_stability(df, df, "v", lo=1.0, hi=1.0)
    with pytest.raises(ValueError, match="hi > lo"):
        population_stability(df, df, "v", lo=2.0, hi=1.0)
    with pytest.raises(ValueError, match="n_bins"):
        population_stability(df, df, "v", lo=0.0, hi=1.0, n_bins=0)
    with pytest.raises(ValueError, match="hi > lo"):
        binned_auc(df, "v", "y", lo=5.0, hi=5.0)


def test_packing_efficiency_validates_seq_lens(spark):
    from fsharp_dataframe_spark.functions.sampling import packing_efficiency

    df = spark.createDataFrame([("one two",)], "text string")
    with pytest.raises(ValueError, match="positive"):
        packing_efficiency(df, [0])
    with pytest.raises(ValueError, match="positive"):
        packing_efficiency(df, [128, -4])
    with pytest.raises(ValueError, match="non-empty"):
        packing_efficiency(df, [])


# ------------------------------------------------------ source_overlap


def test_source_overlap_ignores_short_and_blank_docs(spark):
    """ADVICE r9: blank docs used to emit the empty-string shingle and
    sub-n docs one truncated shingle, so two sources each containing
    any blank/short doc counted phantom shared shingles."""
    from fsharp_dataframe_spark.functions.dedup import source_overlap

    df = spark.createDataFrame(
        [("A", 1, ""), ("A", 2, "   "), ("A", 3, "hi there"),
         ("A", 4, "one two three four"),
         ("B", 5, ""), ("B", 6, "hi there"),
         ("B", 7, "five six seven eight")],
        "source string, doc_id long, text string")
    assert source_overlap(df).count() == 0  # no phantom pairs

    # genuine overlap still reported
    df2 = df.union(spark.createDataFrame(
        [("A", 8, "alpha beta gamma delta"),
         ("B", 9, "alpha beta gamma delta")],
        df.schema))
    rows = source_overlap(df2).collect()
    assert len(rows) == 1
    r = rows[0]
    # shared shingles: "alpha beta gamma", "beta gamma delta"
    assert (r["source_a"], r["source_b"], r["n_shared"]) == ("A", "B", 2)


# ----------------------------------------------------- image near-dup


def test_dhash_decode_reconstructs_closed_form_pattern(spark):
    """The decode -> block-mean resize -> gradient-bit pipeline must
    reconstruct the generator's md5-derived pattern EXACTLY for every
    image (the closed-form contract the image_near_dup oracle rides)."""
    from fsharp_dataframe_spark.functions.multimodal import (
        _dhash_pattern, dhash_media, make_fake_dhash_media,
    )

    media = make_fake_dhash_media(spark, 40)
    rows = {r["media_id"]: (r["dhash"], r["decode_ok"])
            for r in dhash_media(media).collect()}
    assert len(rows) == 40
    for i, (h, ok) in rows.items():
        assert ok and h == _dhash_pattern(i), i


def test_image_near_dup_recovers_planted_twins_and_chains(spark):
    """Every 8th image is a planted Hamming-1 twin of its predecessor,
    and every 16th a Hamming-2 chain tail; the banded join must
    recover exactly those pairs — and NOT the Hamming-3 chain
    endpoints."""
    from fsharp_dataframe_spark.functions.dedup import banded_hamming_pairs
    from fsharp_dataframe_spark.functions.multimodal import (
        dhash_media, make_fake_dhash_media,
    )

    hashes = dhash_media(make_fake_dhash_media(spark, 64))
    pairs = banded_hamming_pairs(hashes, id_col="media_id",
                                 sketch_col="dhash", max_hamming=2)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    exp = {(8 * k + 6, 8 * k + 7): 1 for k in range(8)}
    exp.update({(16 * k + 7, 16 * k + 12): 2 for k in range(4)})
    assert got == exp  # (6, 12) etc. — Hamming 3 — must be absent


def test_image_dedup_clusters_transitive_closure(spark):
    """The (i−6, i−5, i) planted chain must collapse into ONE cluster
    although its endpoints are Hamming 3 — transitivity through the
    component closure, the thing a pair list alone cannot give."""
    import __spark_entry__ as entry
    from fsharp_dataframe_spark.functions.util import release_cached

    try:
        rows = {r["media_id"]: (r["cluster_id"], r["cluster_size"],
                                r["is_canonical"])
                for r in entry._all_queries()["image_dedup_clusters"](
                    spark, "/root/testdata/sf0.001").collect()}
    finally:
        release_cached()
    # chain {6, 7, 12}: one cluster, canonical = min id
    assert rows[6] == (6, 3, 1)
    assert rows[7] == (6, 3, 0)
    assert rows[12] == (6, 3, 0)
    # plain twin pair {14, 15}
    assert rows[14] == (14, 2, 1) and rows[15] == (14, 2, 0)
    # an untouched image is its own singleton cluster
    assert rows[0] == (0, 1, 1)


def test_image_near_dup_plan_never_cartesian(spark):
    from fsharp_dataframe_spark.functions.util import release_cached
    import __spark_entry__ as entry

    try:
        plan = (entry._all_queries()["image_near_dup"]
                (spark, "/root/testdata/sf0.001")
                ._jdf.queryExecution().executedPlan().toString())
    finally:
        release_cached()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dhash_undecodable_payload_gets_null_hash(spark):
    from fsharp_dataframe_spark.functions.multimodal import dhash_media

    df = spark.createDataFrame(
        [(1, bytearray(b"not a png")), (2, None)],
        "media_id long, payload binary")
    rows = {r["media_id"]: (r["dhash"], r["decode_ok"])
            for r in dhash_media(df).collect()}
    assert rows == {1: (None, False), 2: (None, False)}


# --------------------------------------------- tpch_q18 / ngram_novelty


def test_tpch_q18_plan_takeordered_no_global_sort(spark):
    # the HAVING-filtered semi-join class: top-100 must plan as
    # TakeOrderedAndProject (never a global sort), nothing cartesian,
    # no SinglePartition exchange anywhere
    import __spark_entry__ as entry

    df = entry._all_queries()["tpch_q18"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_ngram_repetition_share_semantics(spark):
    from fsharp_dataframe_spark.functions.quality import (
        ngram_repetition_share,
    )

    df = spark.createDataFrame(
        [(1, "one two three four"),   # "one two three" shared with 2
         (2, "one two three"),
         (3, "zz yy xx ww vv"),       # 3 shingles, none shared
         (4, "hi")],                  # too short: no shingles
        "doc_id long, text string")
    rows = {r["doc_id"]: (r["n_shingles"], r["n_common"],
                          r["repeated_share"])
            for r in ngram_repetition_share(df).collect()}
    assert rows == {
        1: (2, 1, 0.5),
        2: (1, 1, 1.0),
        3: (3, 0, 0.0),
        4: (0, 0, None),
    }


# ------------------------------------------ tpch_q22 / containment


def test_tpch_q22_anti_join_plan(spark):
    # the scalar-subquery + anti-join class: the one-row average rides
    # a broadcast, the NOT EXISTS plans as an equi LEFT ANTI join on
    # custkey with the urgent filter pushed below the exchange
    import __spark_entry__ as entry

    df = entry._all_queries()["tpch_q22"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan  # pushed filter


def test_containment_pairs_semantics(spark):
    """A short doc quoted inside a long one scores containment 1.0
    while its Jaccard is small — the sub-document signal."""
    from fsharp_dataframe_spark.functions.dedup import (
        containment_pairs, ngram_jaccard_pairs,
    )

    quote = "alpha beta gamma delta"
    df = spark.createDataFrame(
        [(1, quote),
         (2, f"intro words here {quote} and a very long tail "
             "of unrelated filler text goes on and on"),
         (3, "completely different content nothing shared here"),
         (4, "hi")],  # sub-n doc: contributes nothing
        "doc_id long, text string")
    rows = {(r["id_a"], r["id_b"]): (r["n_a"], r["n_b"], r["containment"])
            for r in containment_pairs(df, threshold=0.8).collect()}
    assert set(rows) == {(1, 2)}
    n_a, n_b, c = rows[(1, 2)]
    assert n_a == 2 and c == 1.0  # both of doc 1's shingles inside doc 2
    # and jaccard would NOT flag the pair at the same bar
    j = {(r["id_a"], r["id_b"]) for r in
         ngram_jaccard_pairs(df, threshold=0.8).collect()}
    assert (1, 2) not in j
