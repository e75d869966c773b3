"""Round-11 pins: the r10 VERDICT asks (containment hot-shingle cap,
Q21-style multi-EXISTS plan class, batch incremental image near-dup,
stream_vocab_divergence) and the r10 ADVICE fixes (centroid-drift
label dtype, banded_hamming max_hamming=0 validation, int8 overflow
accounting)."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------- containment guard


def test_containment_guard_contract(spark):
    """r10 VERDICT ask #2 + 'What's wrong' #2: the hot-shingle cap must
    (a) keep every emitted containment EXACT over the FULL shingle
    sets, (b) still find pairs whose overlap includes boilerplate
    (the hot correction), (c) not feed the quadratic boilerplate
    buckets into candidate generation."""
    from fsharp_dataframe_spark.functions.dedup import (
        containment_pairs, shingle_table,
    )

    boiler = "this page is served by the example content network inc"
    rows = []
    for i in range(40):
        body = f"article number {i} body " + " ".join(
            f"c{i}w{j}" for j in range(10))
        rows.append((i, boiler + " " + body))
    # planted containments: the core of doc i quoted inside a wrapper
    for i in range(4):
        rows.append((100 + i, rows[i][1] + " extra wrapper padding "
                     + " ".join(f"p{i}q{j}" for j in range(30))))
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    exact = {(r["id_a"], r["id_b"]): (r["n_a"], r["n_b"], r["containment"])
             for r in containment_pairs(docs, threshold=0.9).collect()}
    guarded = {(r["id_a"], r["id_b"]): (r["n_a"], r["n_b"], r["containment"])
               for r in containment_pairs(docs, threshold=0.9,
                                          max_doc_freq=10).collect()}
    planted = {(i, 100 + i) for i in range(4)}
    assert planted <= set(exact)
    # the corpus must actually contain above-cap shingles (else this
    # test exercises nothing)
    sh = shingle_table(docs)
    hot_n = (sh.groupBy("shingle").count()
             .filter(F.col("count") > 10).count())
    assert hot_n > 0, "fixture must contain hot shingles"
    # guarded = exact on every pair it emits, full-set sizes included
    assert set(guarded) == set(exact)
    for k, v in guarded.items():
        assert exact[k] == v
    assert planted <= set(guarded)


def test_containment_guard_empty_hot_fast_path(spark):
    """A generous cap on a clean corpus must not change results (the
    adaptive emptiness probe falls through to the plain plan)."""
    from fsharp_dataframe_spark.functions.dedup import containment_pairs

    quote = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [(1, quote),
         (2, f"wrapper start {quote} wrapper end with long tail "
             "of filler text that keeps going for a while"),
         (3, "unrelated content that matches nothing else here")],
        "doc_id long, text string")
    plain = {(r["id_a"], r["id_b"]): r["containment"]
             for r in containment_pairs(docs, threshold=0.8).collect()}
    guarded = {(r["id_a"], r["id_b"]): r["containment"]
               for r in containment_pairs(docs, threshold=0.8,
                                          max_doc_freq=1000).collect()}
    assert plain == guarded and (1, 2) in plain


# ------------------------------------------------------ tpch q21


def test_tpch_q21_both_existentials_one_lineitem_scan(spark):
    """The multi-EXISTS decorrelation contract (r10 VERDICT ask #3):
    both correlated existentials must ride ONE scan + ONE exchange of
    the fact table — a self-join decorrelation plants a second
    lineitem subtree (pruned-filter divergence defeats ReuseExchange),
    which this pin would catch."""
    import re

    import __spark_entry__ as entry

    df = entry._all_queries()["tpch_q21"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"FileScan parquet[^\n]*lineitem", plan)) == 1
    assert plan.count("Window") == 1  # both existentials in one pass
    assert "SinglePartition" not in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_tpch_q21_semantics_planted(spark):
    """Hand-built corpus covering every qualification arm: the lone
    offender on a multi-supplier order counts; single-supplier orders,
    multi-offender orders, non-'F' orders and clean suppliers don't."""
    import __spark_entry__ as entry
    from pyspark.sql import Row

    # order 1: supp 10 returned + supp 11 clean, status F -> 10 waits
    # order 2: supp 10 returned, sole supplier, F        -> no (no EXISTS)
    # order 3: supp 10 + supp 11 both returned, F        -> no (NOT EXISTS fails)
    # order 4: supp 11 returned + supp 10 clean, status O -> no ('F' only)
    # order 5: supp 12 returned twice + supp 10 clean, F -> 12 waits 2x
    li = spark.createDataFrame(
        [(1, 10, "R"), (1, 11, "N"),
         (2, 10, "R"),
         (3, 10, "R"), (3, 11, "R"),
         (4, 11, "R"), (4, 10, "N"),
         (5, 12, "R"), (5, 12, "R"), (5, 10, "N")],
        "l_orderkey long, l_suppkey long, l_returnflag string")
    o = spark.createDataFrame(
        [(1, "F"), (2, "F"), (3, "F"), (4, "O"), (5, "F")],
        "o_orderkey long, o_orderstatus string")
    s = spark.createDataFrame(
        [(10, "SuppA"), (11, "SuppB"), (12, "SuppC")],
        "s_suppkey long, s_name string")

    import fsharp_dataframe_spark  # noqa: F401  (same session confs)
    # replay the registered query's logic on the fixture tables
    from pyspark.sql import Window
    from pyspark.sql import functions as FF

    late = (FF.col("l_returnflag") == "R").cast("int")
    per_supp = (li.groupBy("l_orderkey", "l_suppkey")
                .agg(FF.max(late).alias("has_late"),
                     FF.sum(late).alias("n_late_lines")))
    w = Window.partitionBy("l_orderkey")
    waiting = (per_supp
               .withColumn("n_supp", FF.count("*").over(w))
               .withColumn("n_late_supp", FF.sum("has_late").over(w))
               .filter((FF.col("has_late") == 1)
                       & (FF.col("n_supp") >= 2)
                       & (FF.col("n_late_supp") == 1)))
    j = waiting.join(o.filter(FF.col("o_orderstatus") == "F"),
                     waiting["l_orderkey"] == FF.col("o_orderkey"))
    got = {r["s_name"]: r["numwait"] for r in
           j.join(s, j["l_suppkey"] == s["s_suppkey"])
            .groupBy("s_name").agg(FF.sum("n_late_lines").alias("numwait"))
            .collect()}
    assert got == {"SuppA": 1, "SuppC": 2}


# ---------------------------------------------------- tpch q10 / q19


def test_tpch_q19_disjunction_pushes_to_both_scans(spark):
    """The OR-of-ANDs pushdown contract: the cross-relation
    disjunction must be distributed per relation — the part scan
    receives the brand/size union, the lineitem scan the
    quantity-range union — so each side prunes BEFORE the join."""
    import __spark_entry__ as entry

    df = entry._all_queries()["tpch_q19"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    li_scan = next(l for l in plan.splitlines()
                   if "FileScan" in l and "lineitem" in l)
    pt_scan = next(l for l in plan.splitlines()
                   if "FileScan" in l and "part.parquet" in l)
    assert "l_quantity" in li_scan  # quantity union reached the scan
    assert "p_brand" in pt_scan and "p_size" in pt_scan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q10_topk_then_dimension_fetch(spark):
    """The post-limit dimension-fetch contract: a
    TakeOrderedAndProject produces the top-20 BEFORE customer/nation
    join (the 20-row relation broadcasts into the dimension scans),
    and the returnflag/date filters reach their scans."""
    import __spark_entry__ as entry

    df = entry._all_queries()["tpch_q10"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") == 1
    assert "SortMergeJoin" not in plan
    li_scan = next(l for l in plan.splitlines()
                   if "FileScan" in l and "lineitem" in l)
    o_scan = next(l for l in plan.splitlines()
                  if "FileScan" in l and "orders" in l)
    assert "l_returnflag" in li_scan and "o_orderdate" in o_scan


# ---------------------------------------------------- tpch q13 / q15


def test_tpch_q13_outer_join_covers_every_customer(spark):
    """The distribution must cover every customer exactly once (an
    inner join would silently drop customers with no qualifying
    order), and the plan must be a genuine LEFT outer join."""
    import __spark_entry__ as entry

    df = entry._all_queries()["tpch_q13"](spark, "/root/testdata/sf0.001")
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    assert sum(rows.values()) == 150  # every customer, once
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftOuter" in plan


def test_tpch_q13_zero_bucket_planted(spark):
    """The zero bucket itself (the synthetic orders are dense, so the
    real tables never exercise it): a customer with no qualifying
    order — none at all, or only URGENT ones — must land in
    c_count = 0 under the registered query's exact construction."""
    from pyspark.sql import functions as FF

    c = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey long")
    o = spark.createDataFrame(
        [(10, 1, "2-HIGH"), (11, 1, "3-MEDIUM"),
         (12, 2, "1-URGENT")],  # cust 2: urgent only; cust 3: none
        "o_orderkey long, o_custkey long, o_orderpriority string")
    oc = (o.filter(FF.col("o_orderpriority") != "1-URGENT")
          .groupBy("o_custkey").agg(FF.count("*").alias("_n")))
    co = (c.join(oc, c["c_custkey"] == oc["o_custkey"], "left")
          .select(FF.coalesce(FF.col("_n"), FF.lit(0)).alias("c_count")))
    dist = {r["c_count"]: r["custdist"] for r in
            co.groupBy("c_count").agg(FF.count("*").alias("custdist"))
            .collect()}
    assert dist == {2: 1, 0: 2}


def test_tpch_q15_plan_single_scan_broadcast_max(spark):
    """The argmax-over-aggregate contract: the persisted revenue
    relation feeds BOTH the max and the probe (two cache reads — the
    plan STRING reprints the cached build plan under each
    InMemoryTableScan, so count cache reads, not FileScan lines: the
    q17 pin's lesson), the max arrives by broadcast — never a
    SinglePartition window — and the date prune reaches the scan."""
    import __spark_entry__ as entry
    from fsharp_dataframe_spark.functions.util import release_cached

    try:
        df = entry._all_queries()["tpch_q15"](
            spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        release_cached()
    assert plan.count("InMemoryTableScan") == 2
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan  # the max is a broadcast, not a window
    # the date prune reaches the (single, cache-reprinted) scan
    assert "IsNotNull(l_shipdate)" in plan or "l_shipdate" in \
        plan.split("PushedFilters", 1)[-1][:400]


# -------------------------------------- incremental image near-dup


def test_cross_banded_hamming_directional_guard(spark):
    """The corpus side must NEVER self-pair: two existing sketches at
    Hamming 0 of each other produce no output row when nothing in the
    new batch is near them — and new×new must not pair either."""
    from fsharp_dataframe_spark.functions.dedup import (
        cross_banded_hamming_pairs,
    )

    existing = spark.createDataFrame(
        [(1, 0x0F0F), (2, 0x0F0F),        # exact dups of each other
         (3, 0x7777000012340000)],
        "media_id long, sh long")
    new = spark.createDataFrame(
        [(10, 0x00FF), (11, 0x00FF)],     # new×new exact dups
        "media_id long, sh long")
    got = cross_banded_hamming_pairs(new, existing, id_col="media_id",
                                     max_hamming=2).collect()
    assert got == []  # no old×old, no new×new

    # and a genuine new→old near-dup IS found, with the exact distance
    new2 = spark.createDataFrame(
        [(10, 0x0F0F ^ (1 << 40))], "media_id long, sh long")
    got2 = {(r["new_id"], r["old_id"]): r["hamming"]
            for r in cross_banded_hamming_pairs(
                new2, existing, id_col="media_id", max_hamming=2).collect()}
    assert got2 == {(10, 1): 1, (10, 2): 1}


def test_cross_banded_hamming_piece_table_path(spark):
    """The production shape — a persisted hamming_piece_table for the
    landed corpus — must give identical pairs to the sketch path."""
    from fsharp_dataframe_spark.functions.dedup import (
        cross_banded_hamming_pairs, hamming_piece_table,
    )

    existing = spark.createDataFrame(
        [(i, (0x1234_5678_9ABC << 4) ^ i) for i in range(8)],
        "media_id long, sh long")
    new = spark.createDataFrame(
        [(100, 0x1234_5678_9ABC0 ^ 3)], "media_id long, sh long")
    direct = {(r["new_id"], r["old_id"]): r["hamming"]
              for r in cross_banded_hamming_pairs(
                  new, existing, id_col="media_id",
                  max_hamming=2).collect()}
    pieces = hamming_piece_table(existing, id_col="media_id",
                                 max_hamming=2)
    via_table = {(r["new_id"], r["old_id"]): r["hamming"]
                 for r in cross_banded_hamming_pairs(
                     new, pieces, id_col="media_id", max_hamming=2,
                     existing_is_piece_table=True).collect()}
    assert direct == via_table and direct


def test_image_incr_dedup_plan_never_cartesian(spark):
    import __spark_entry__ as entry
    from fsharp_dataframe_spark.functions.util import release_cached

    try:
        df = entry._all_queries()["image_incr_dedup"](
            spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        release_cached()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # one decode pass: both split sides read the persisted hash table
    assert plan.count("InMemoryTableScan") == 2


# -------------------------------------- incremental embedding dedup


def test_cross_cosine_directional_guard(spark):
    """The corpus side must NEVER self-pair: two identical landed
    vectors produce no row when nothing in the new batch is near
    them — and new×new must not pair either."""
    from fsharp_dataframe_spark.functions.similarity import (
        cross_cosine_near_dup_pairs,
    )

    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    existing = spark.createDataFrame(
        [(1, v), (2, v)],              # exact landed dups of each other
        "vec_id long, embedding array<float>")
    new = spark.createDataFrame(
        [(10, w), (11, w)],            # new×new exact dups
        "vec_id long, embedding array<float>")
    got = cross_cosine_near_dup_pairs(new, existing, threshold=0.9,
                                      dim=4, n_bits=2,
                                      n_tables=8).collect()
    assert got == []  # no old×old, no new×new

    # a genuine new→old near-dup IS found, with the exact score
    new2 = spark.createDataFrame([(10, v)],
                                 "vec_id long, embedding array<float>")
    got2 = {(r["new_id"], r["old_id"]): r["cosine_sim"]
            for r in cross_cosine_near_dup_pairs(
                new2, existing, threshold=0.9, dim=4, n_bits=2,
                n_tables=8).collect()}
    assert got2 == {(10, 1): 1.0, (10, 2): 1.0}


def test_cross_cosine_bucket_table_path(spark):
    """The production shape — a persisted cosine_bucket_table for the
    landed corpus — must give identical pairs to the direct path."""
    from fsharp_dataframe_spark.functions.similarity import (
        cosine_bucket_table, cross_cosine_near_dup_pairs,
    )

    import random
    rng = random.Random(3)
    mk = lambda: [rng.uniform(-1, 1) for _ in range(8)]  # noqa: E731
    base = mk()
    existing = spark.createDataFrame(
        [(i, mk()) for i in range(12)] + [(50, base)],
        "vec_id long, embedding array<float>")
    near = [x + rng.uniform(-0.01, 0.01) for x in base]
    new = spark.createDataFrame(
        [(100, near), (101, mk())],
        "vec_id long, embedding array<float>")
    kw = dict(threshold=0.95, dim=8, n_bits=2, n_tables=12)
    direct = {(r["new_id"], r["old_id"]): r["cosine_sim"]
              for r in cross_cosine_near_dup_pairs(
                  new, existing, **kw).collect()}
    bt = cosine_bucket_table(existing, dim=8, n_bits=2, n_tables=12)
    via_table = {(r["new_id"], r["old_id"]): r["cosine_sim"]
                 for r in cross_cosine_near_dup_pairs(
                     new, existing, existing_buckets=bt,
                     **kw).collect()}
    assert direct == via_table
    assert (100, 50) in direct  # the planted near-dup is found


def test_embed_incr_dedup_plan_never_cartesian(spark):
    import __spark_entry__ as entry
    from fsharp_dataframe_spark.functions.util import release_cached

    try:
        df = entry._all_queries()["embed_incr_dedup"](
            spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        release_cached()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# -------------------------------------------- audio fingerprint tier


def test_audio_fixture_fingerprint_closed_form(spark):
    """The REAL pipeline — stdlib WAV decode + vectorized rFFT band
    deltas — must land exactly on the engineered closed form for
    every clip, including both planted-twin rules (i%8==7 Hamming-1,
    i%16==12 chain-of-3)."""
    from fsharp_dataframe_spark.functions.multimodal import (
        _afp_pattern, audio_fingerprint, make_fake_audio_media,
    )

    got = {r["media_id"]: r["afp"]
           for r in audio_fingerprint(
               make_fake_audio_media(spark, 64)).collect()}
    assert len(got) == 64
    for i in range(64):
        assert got[i] == _afp_pattern(i), i
    # planted chain: 6-7 at Hamming 1, 7-12 at 2, endpoints at 3
    h = lambda a, b: bin(got[a] ^ got[b]).count("1")  # noqa: E731
    assert h(6, 7) == 1 and h(7, 12) == 2 and h(6, 12) == 3


def test_audio_fingerprint_undecodable_rows(spark):
    """NULL payloads, non-WAV bytes, stereo/8-bit WAVs and sub-frame
    clips degrade to (NULL, decode_ok=False) per row — never an
    executor exception; a longer clip fingerprints its FIRST frame."""
    import io
    import wave

    import numpy as np

    from fsharp_dataframe_spark.functions.multimodal import (
        _afp_pattern, audio_fingerprint, make_fake_audio_media,
    )

    good = make_fake_audio_media(spark, 1).collect()[0]["payload"]

    def wav(samples, ch=1, width=2):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(ch)
            wf.setsampwidth(width)
            wf.setframerate(8000)
            wf.writeframes(samples)
        return buf.getvalue()

    short = wav(np.zeros(100, dtype=np.int16).tobytes())
    stereo = wav(np.zeros(8192, dtype=np.int16).tobytes(), ch=2)
    longer = bytes(good) + b""  # same header; first frame decides
    rows = spark.createDataFrame(
        [(0, bytearray(good)), (1, None), (2, bytearray(b"not a wav")),
         (3, bytearray(short)), (4, bytearray(stereo))],
        "media_id long, payload binary")
    got = {r["media_id"]: (r["afp"], r["decode_ok"])
           for r in audio_fingerprint(rows).collect()}
    assert got[0] == (_afp_pattern(0), True)
    for i in (1, 2, 3, 4):
        assert got[i] == (None, False), i
    # a clip longer than one frame keeps its first-frame fingerprint
    with wave.open(io.BytesIO(bytes(good)), "rb") as wf:
        raw = wf.readframes(wf.getnframes())
    ext = wav(raw + np.zeros(4096, dtype=np.int16).tobytes())
    rows2 = spark.createDataFrame([(9, bytearray(ext))],
                                  "media_id long, payload binary")
    r9 = audio_fingerprint(rows2).collect()[0]
    assert (r9["afp"], r9["decode_ok"]) == (_afp_pattern(0), True)


def test_cached_audio_media_roundtrip(spark, tmp_path):
    """The write-once parquet cache returns exactly the generated
    fixture and reuses files on the second call."""
    import os

    from fsharp_dataframe_spark.functions.multimodal import (
        _cache_layout_files, audio_fingerprint, cached_audio_media,
        make_fake_audio_media,
    )

    root = str(tmp_path / "media_cache")
    a = cached_audio_media(spark, 16, cache_root=root)
    # r16: the layout file count is folded into the cache path so a
    # layout change can never silently reuse a stale-layout cache.
    path = os.path.join(root, f"audio_n16_f{_cache_layout_files()}.parquet")
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    mtime = os.path.getmtime(os.path.join(path, "_SUCCESS"))
    b = cached_audio_media(spark, 16, cache_root=root)
    assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == mtime
    gen = {r["media_id"]: r["afp"] for r in audio_fingerprint(
        make_fake_audio_media(spark, 16)).collect()}
    got = {r["media_id"]: r["afp"] for r in audio_fingerprint(b).collect()}
    assert got == gen and len(got) == 16
    assert a.columns == b.columns


# ----------------------------------------------------- video tier


def test_video_frame_hashes_closed_form_and_degradation(spark):
    """Container parse + per-frame real decode must land exactly on
    the closed form for every sampled frame; malformed payloads
    (NULL, wrong magic, truncated container) degrade per row."""
    from fsharp_dataframe_spark.functions.multimodal import (
        _video_frame_pattern, make_fake_video_media, pack_frames,
        video_frame_count, video_frame_hashes,
    )

    fh = {(r["media_id"], r["frame_idx"]): (r["dhash"], r["decode_ok"])
          for r in video_frame_hashes(
              make_fake_video_media(spark, 32)).collect()}
    for i in range(32):
        for f in range(0, video_frame_count(i), 2):
            assert fh[(i, f)] == (_video_frame_pattern(i, f), True)
    # every sampled position accounted for, nothing extra
    assert len(fh) == sum(len(range(0, video_frame_count(i), 2))
                          for i in range(32))

    good = pack_frames([b"not a png"])  # container ok, frame undecodable
    bad = spark.createDataFrame(
        [(0, None), (1, bytearray(b"JUNKJUNKJUNK")),
         (2, bytearray(good[:6])), (3, bytearray(good))],
        "media_id long, payload binary")
    got = {(r["media_id"], r["frame_idx"]): (r["dhash"], r["decode_ok"])
           for r in video_frame_hashes(bad).collect()}
    assert got == {(0, 0): (None, False), (1, 0): (None, False),
                   (2, 0): (None, False), (3, 0): (None, False)}


def test_video_near_dup_planted_and_threshold(spark):
    """The planted re-uploads (i ≡ 7 mod 8, one-bit watermark change
    on frame 0) are found with FULL frame coverage; unrelated videos
    never pair; and the half-coverage threshold is exact — 2 matches
    of 4 compared passes, 1 of 4 does not."""
    from fsharp_dataframe_spark.functions.multimodal import (
        _pattern_png_bytes, make_fake_video_media, pack_frames,
        video_near_dup,
    )

    got = {(r["id_a"], r["id_b"]): (r["matched_frames"],
                                    r["compared_frames"])
           for r in video_near_dup(
               make_fake_video_media(spark, 16)).collect()}
    assert set(got) == {(6, 7), (14, 15)}
    for (a, b), (m, c) in got.items():
        assert m == c  # every sampled position matches

    # threshold boundary: 8-frame videos (4 sampled); video 1 shares
    # exactly 2 sampled frames with video 0 (passes 2*2 >= 4), video 2
    # shares exactly 1 (fails 2*1 < 4)
    def pat(tag, f):
        import hashlib
        return int(hashlib.md5(f"{tag}_{f}".encode()).hexdigest()[:15],
                   16)

    def vid(pats):
        return pack_frames([_pattern_png_bytes(p) for p in pats])

    base = [pat("x", f) for f in range(8)]
    share2 = [base[0], pat("y", 1), base[2], pat("y", 3),
              pat("y", 4), pat("y", 5), pat("y", 6), pat("y", 7)]
    share1 = [base[0], pat("z", 1), pat("z", 2), pat("z", 3),
              pat("z", 4), pat("z", 5), pat("z", 6), pat("z", 7)]
    rows = spark.createDataFrame(
        [(0, bytearray(vid(base))), (1, bytearray(vid(share2))),
         (2, bytearray(vid(share1)))],
        "media_id long, payload binary")
    out = {(r["id_a"], r["id_b"]): (r["matched_frames"],
                                    r["compared_frames"])
           for r in video_near_dup(rows).collect()}
    assert out == {(0, 1): (2, 4)}


def test_cached_video_media_roundtrip(spark, tmp_path):
    import os

    from fsharp_dataframe_spark.functions.multimodal import (
        _cache_layout_files, cached_video_media, make_fake_video_media,
        video_frame_hashes,
    )

    root = str(tmp_path / "media_cache")
    cached_video_media(spark, 8, cache_root=root)
    path = os.path.join(root, f"video_n8_f{_cache_layout_files()}.parquet")
    mtime = os.path.getmtime(os.path.join(path, "_SUCCESS"))
    b = cached_video_media(spark, 8, cache_root=root)
    assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == mtime
    gen = {(r["media_id"], r["frame_idx"]): r["dhash"]
           for r in video_frame_hashes(
               make_fake_video_media(spark, 8)).collect()}
    got = {(r["media_id"], r["frame_idx"]): r["dhash"]
           for r in video_frame_hashes(b).collect()}
    assert got == gen


def test_cross_video_near_dup_directional_guard(spark):
    """The corpus side must NEVER self-pair: two identical landed
    videos produce no row when nothing in the new batch matches —
    and new×new must not pair either; a genuine new→old re-crawl IS
    found against BOTH its landed copies, and the persisted
    piece-table path gives identical results."""
    from fsharp_dataframe_spark.functions.multimodal import (
        _pattern_png_bytes, cross_video_near_dup, pack_frames,
        video_frame_piece_table,
    )

    def vid(tag):
        import hashlib
        pats = [int(hashlib.md5(f"{tag}_{f}".encode())
                    .hexdigest()[:15], 16) for f in range(4)]
        return bytearray(pack_frames(
            [_pattern_png_bytes(p) for p in pats]))

    existing = spark.createDataFrame(
        [(1, vid("dup")), (2, vid("dup")), (3, vid("other"))],
        "media_id long, payload binary")
    new = spark.createDataFrame(
        [(10, vid("fresh")), (11, vid("fresh"))],
        "media_id long, payload binary")
    assert cross_video_near_dup(new, existing).collect() == []

    recrawl = spark.createDataFrame([(10, vid("dup"))],
                                    "media_id long, payload binary")
    direct = {(r["new_id"], r["old_id"]):
              (r["matched_frames"], r["compared_frames"])
              for r in cross_video_near_dup(recrawl, existing).collect()}
    assert direct == {(10, 1): (2, 2), (10, 2): (2, 2)}
    pt = video_frame_piece_table(existing)
    via = {(r["new_id"], r["old_id"]):
           (r["matched_frames"], r["compared_frames"])
           for r in cross_video_near_dup(
               recrawl, pt, existing_is_piece_table=True).collect()}
    assert via == direct


# ------------------------------------------------- vectorized dhash


def test_dhash_vectorized_equals_reference():
    """The reduceat-vectorized dHash (the measured ~18× win that made
    the image bench entries track the operator, not the per-block
    .mean() loop) must equal the array_split reference bit for bit:
    random images, block-constant ties, ragged split boundaries, and
    the small-image fallback route."""
    import numpy as np

    from fsharp_dataframe_spark.functions.multimodal import (
        _dhash_from_gray, _dhash_from_gray_ref,
    )

    rng = np.random.default_rng(7)
    for _ in range(300):
        h = int(rng.integers(8, 70))
        w = int(rng.integers(9, 70))
        arr = rng.integers(0, 256, size=(h, w)).astype(np.float32)
        assert _dhash_from_gray(arr) == _dhash_from_gray_ref(arr)
    for v in (0.0, 128.0, 255.0):  # all-tie images hash to 0
        arr = np.full((32, 36), v, dtype=np.float32)
        assert _dhash_from_gray(arr) == 0 == _dhash_from_gray_ref(arr)
    # ragged boundaries (dims not divisible by the grid)
    arr = rng.integers(0, 256, size=(13, 23)).astype(np.float32)
    assert _dhash_from_gray(arr) == _dhash_from_gray_ref(arr)
    # sub-grid images route to the reference (empty-split semantics)
    small = rng.integers(0, 256, size=(4, 5)).astype(np.float32)
    assert _dhash_from_gray(small) == _dhash_from_gray_ref(small)


# ------------------------------------------------ media fixture cache


def test_cached_dhash_media_roundtrip(spark, tmp_path):
    """The write-once parquet cache must return exactly the generated
    fixture (ids, payload bytes, meta) and reuse the files on the
    second call (r10 VERDICT ask #5 — keep PNG encode out of the
    bench's timed loop)."""
    import os

    from fsharp_dataframe_spark.functions.multimodal import (
        _cache_layout_files, cached_dhash_media, dhash_media,
        make_fake_dhash_media,
    )

    root = str(tmp_path / "media_cache")
    a = cached_dhash_media(spark, 32, cache_root=root)
    path = os.path.join(root, f"dhash_n32_f{_cache_layout_files()}.parquet")
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    mtime = os.path.getmtime(os.path.join(path, "_SUCCESS"))
    b = cached_dhash_media(spark, 32, cache_root=root)
    assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == mtime
    # cached == generated, down to the decoded hash
    gen = {r["media_id"]: r["dhash"]
           for r in dhash_media(make_fake_dhash_media(spark, 32)).collect()}
    got = {r["media_id"]: r["dhash"] for r in dhash_media(b).collect()}
    assert got == gen and len(got) == 32
    assert a.columns == b.columns


# --------------------------------------------- banded hamming edges


def test_banded_hamming_zero_bound(spark):
    """ADVICE r10: max_hamming=0 means ONE full-width piece; the old
    mask F.lit((1 << 64) - 1) overflowed LongType at plan build.  Now
    it degrades to an exact-sketch equality join."""
    from fsharp_dataframe_spark.functions.dedup import banded_hamming_pairs

    df = spark.createDataFrame(
        [(0, 7), (1, 7), (2, -5), (3, -5), (4, 12)],
        "doc_id long, sh long")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in banded_hamming_pairs(df, max_hamming=0).collect()}
    assert got == {(0, 1): 0, (2, 3): 0}


def test_pigeonhole_validation_fail_fast(spark):
    from fsharp_dataframe_spark.functions.dedup import pigeonhole_pieces

    with pytest.raises(ValueError, match="max_hamming"):
        pigeonhole_pieces(64, -1)
    with pytest.raises(ValueError, match="bits"):
        pigeonhole_pieces(0, 0)
    with pytest.raises(ValueError, match="pieces"):
        pigeonhole_pieces(8, 8)
    # full coverage of the cut arithmetic at the edges
    assert pigeonhole_pieces(64, 0) == [(0, 64)]
    offs = pigeonhole_pieces(64, 2)
    assert offs == [(0, 22), (22, 21), (43, 21)]


def test_stream_image_near_dup_zero_bound_builds(spark):
    """The streaming twin shares the validated substrate: a
    max_hamming=0 plan must BUILD (no LongType overflow)."""
    from fsharp_dataframe_spark.functions.dedup import (
        piece_expr, pigeonhole_pieces,
    )

    offs = pigeonhole_pieces(64, 0)
    df = spark.createDataFrame([(1, 7)], "id long, sh long")
    got = df.select(*[piece_expr(F.col("sh"), o, w).alias(f"p{i}")
                      for i, (o, w) in enumerate(offs)]).first()
    assert got["p0"] == 7


def test_cross_cosine_empty_new_batch(spark):
    """An EMPTY nightly batch is routine: typed-empty result (and
    explicit-dim calls also return empty), never a crash on dim
    inference; the bucket-table builder raises a clear error when dim
    is uninferable."""
    import pytest as _pytest

    from fsharp_dataframe_spark.functions.similarity import (
        cosine_bucket_table, cross_cosine_near_dup_pairs,
    )

    existing = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>")
    empty = existing.limit(0)
    out = cross_cosine_near_dup_pairs(empty, existing, threshold=0.9)
    assert out.columns == ["new_id", "old_id", "cosine_sim"]
    assert out.collect() == []
    out2 = cross_cosine_near_dup_pairs(empty, existing, threshold=0.9,
                                       dim=2, n_bits=2, n_tables=2)
    assert out2.collect() == []
    with _pytest.raises(ValueError, match="dim"):
        cosine_bucket_table(empty)


def test_video_hostile_header_bounded(spark):
    """A truncated container whose header DECLARES billions of frames
    must degrade per row instantly (the loop is bounded by what the
    payload can physically hold), in the batch and stream hash paths
    alike."""
    import struct

    from fsharp_dataframe_spark.functions.multimodal import (
        _FSV_MAGIC, video_frame_hashes,
    )

    hostile = _FSV_MAGIC + struct.pack("<I", 2_000_000_000)
    rows = spark.createDataFrame([(0, bytearray(hostile))],
                                 "media_id long, payload binary")
    got = video_frame_hashes(rows).collect()
    assert [(r["media_id"], r["frame_idx"], r["dhash"], r["decode_ok"])
            for r in got] == [(0, 0, None, False)]


def test_sniff_routes_all_modalities(spark):
    """The no-decode metadata pass routes a mixed corpus by modality:
    PNG with dims, WAV, and the FSV1 container whose frame dims come
    from frame 0's own header — plus the hostile declared-count case
    degrading to mime-only."""
    import struct

    from fsharp_dataframe_spark.functions.multimodal import (
        _FSV_MAGIC, make_fake_audio_media, make_fake_dhash_media,
        make_fake_video_media, sniff_image_metadata,
    )

    png = make_fake_dhash_media(spark, 1).collect()[0]["payload"]
    wav = make_fake_audio_media(spark, 1).collect()[0]["payload"]
    vid = make_fake_video_media(spark, 1).collect()[0]["payload"]
    assert sniff_image_metadata(png) == ("image/png", 36, 32)
    assert sniff_image_metadata(wav) == ("audio/x-wav", None, None)
    assert sniff_image_metadata(vid) == ("video/x-fsv", 36, 32)
    hostile = _FSV_MAGIC + struct.pack("<I", 2_000_000_000)
    assert sniff_image_metadata(hostile) == ("video/x-fsv", None, None)


def test_cross_semantic_dedup_directional_guard(spark):
    """The IVF-path incremental: the corpus never self-pairs, new
    never self-pairs, a genuine new→old in-cell dup IS found, and the
    persisted-assignment path is identical to the direct path."""
    from fsharp_dataframe_spark.functions.similarity import (
        cross_semantic_dedup, semantic_assignment_table,
    )

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    v, w = [0.9, 0.1, 0.0], [0.1, 0.9, 0.0]
    existing = spark.createDataFrame(
        [(1, v), (2, v), (3, w)],   # 1 and 2 are exact landed dups
        "vec_id long, embedding array<float>")
    new = spark.createDataFrame(
        [(10, w), (11, w)],         # new x new exact dups, cell 1
        "vec_id long, embedding array<float>")
    got = {(r["new_id"], r["old_id"]): r["cosine_sim"]
           for r in cross_semantic_dedup(new, existing, cents,
                                         threshold=0.99).collect()}
    # no old x old (1,2), no new x new (10,11); (10,3)/(11,3) ARE
    # found — same cell, cosine 1.0
    assert got == {(10, 3): 1.0, (11, 3): 1.0}

    at = semantic_assignment_table(existing, cents)
    via = {(r["new_id"], r["old_id"]): r["cosine_sim"]
           for r in cross_semantic_dedup(
               new, existing, cents, threshold=0.99,
               existing_assignments=at).collect()}
    assert via == got

    # cross-cell dups are BY CONTRACT not considered (SemDeDup's
    # approximation): an exact dup of v in cell 0 vs a new w-cell row
    # emits nothing even at threshold 0
    far = spark.createDataFrame([(20, v)],
                                "vec_id long, embedding array<float>")
    none = cross_semantic_dedup(
        far, existing.filter(F.col("vec_id") == 3), cents,
        threshold=0.0).collect()
    assert none == []
