"""Unit pins for the round-8 additions (sampling.training_mix): span
tiling invariants, determinism under repartitioning, the lazy uid
guard, and plan shape — the SQL-oracle gate covers full-corpus replays
at three SFs (tools/check_oracle.py)."""

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions.sampling import training_mix


def _docs(spark, n=60, langs=("en", "de", "fr", "sw")):
    # deterministic toy corpus: language shares 3:2:1:..., doc length
    # grows with id so length-weighting is observable
    rows = []
    for i in range(n):
        lang = langs[(i * i) % len(langs)]
        words = ["w%d" % ((i * 7 + j) % 23) for j in range(5 + (i % 40))]
        rows.append((i, " ".join(words), lang))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_training_mix_span_tiling(spark):
    """Every sequence must be tiled exactly: spans within a seq_id are
    contiguous, start at seq_begin 0-padded order, and sum to seq_len
    for all but the final sequence."""
    df = _docs(spark)
    out = training_mix(df, 30, seq_len=16, max_tokens=8, overlap=2).collect()
    assert out, "empty pipeline output"
    by_seq = {}
    for r in out:
        by_seq.setdefault(r["seq_id"], []).append(r)
    last = max(by_seq)
    for sid, rows in by_seq.items():
        rows.sort(key=lambda r: r["seq_begin"])
        pos = 0
        for r in rows:
            assert r["seq_begin"] == pos, (sid, rows)
            assert 0 <= r["tok_begin"] < r["tok_end"]
            pos += r["tok_end"] - r["tok_begin"]
        if sid != last:
            assert pos == 16, (sid, pos)
        else:
            assert 0 < pos <= 16
    # sequence ids are the full contiguous range
    assert sorted(by_seq) == list(range(last + 1))


def test_training_mix_deterministic_and_repartition_stable(spark):
    df = _docs(spark)
    cols = ["doc_id", "chunk_id", "seq_id", "tok_begin", "tok_end",
            "seq_begin", "lang"]
    a = sorted(map(tuple, training_mix(df, 25).select(cols).collect()))
    b = sorted(map(tuple,
                   training_mix(df.repartition(7), 25).select(cols).collect()))
    assert a == b and len(a) > 0


def test_training_mix_temperature_tilts_sample(spark):
    """alpha<1 up-weights rare languages: with a quota smaller than the
    corpus, the rare language's sampled share must exceed its corpus
    share (deterministic here — fixed corpus, fixed salt).

    The corpus is built here, not from _docs: its ``(i*i) % 4`` lang
    rule only ever yields two languages at EXACTLY equal shares
    (squares mod 4 are 0 or 1), so "the rare language" was a tie the
    old test broke by dict order — collect() row order made it a coin
    flip per run.  This corpus has real shares 5:2:1 and the rare pick
    tie-breaks deterministically."""
    langs = ["en"] * 5 + ["de"] * 2 + ["fr"]
    rows = []
    for i in range(80):
        words = ["w%d" % ((i * 7 + j) % 23) for j in range(5 + (i % 40))]
        rows.append((i, " ".join(words), langs[i % 8]))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    corpus = {r["lang"]: r["cnt"] for r in
              df.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    picked = (training_mix(df, 20).select("doc_id", "lang").distinct()
              .groupBy("lang").agg(F.count("*").alias("cnt")).collect())
    got = {r["lang"]: r["cnt"] for r in picked}
    rare = min(sorted(corpus), key=corpus.get)
    assert corpus[rare] < min(v for k, v in corpus.items() if k != rare)
    tot_c = sum(corpus.values())
    assert got.get(rare, 0) / 20 > corpus[rare] / tot_c


def test_training_mix_uid_guard_raises_in_plan(spark):
    df = spark.createDataFrame([(-1, "a b c", "en")],
                               "doc_id long, text string, lang string")
    with pytest.raises(Exception, match="chunk_uid packing"):
        training_mix(df, 5).collect()


def test_training_mix_plan_audit_clean(spark):
    from fsharp_dataframe_spark.functions.util import release_cached
    from fsharp_dataframe_spark.plan_audit import audit

    try:
        out = training_mix(_docs(spark), 30)
        # allowances, each bounded by construction: the lang_mix stage's
        # ONE-row totals cross join + its single-partition 1-row
        # aggregate (the same allowance the lang_mix query carries in
        # _AUDIT_ALLOW), and this test's in-memory createDataFrame
        # scans (the registered query reads parquet)
        assert audit(out, allow=("cartesian", "single_partition",
                                 "rdd_scan")) == []
    finally:
        release_cached()


# --- mixed-mime metadata tier -------------------------------------------


def test_sniff_image_metadata_formats():
    import struct

    from fsharp_dataframe_spark.functions.multimodal import (
        sniff_image_metadata,
    )
    from fsharp_dataframe_spark.functions.png import encode_png

    png = encode_png(bytes(range(16)) * 16, 16, 16, 1)
    assert sniff_image_metadata(png) == ("image/png", 16, 16)

    # JPEG: APP0 + a *skipped* DHT (C4) before the SOF0 frame header
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dht = bytes(7)
    sof = b"\x08" + struct.pack(">HH", 99, 123) + b"\x01\x01\x11\x00"
    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
            + b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
            + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
            + b"\xff\xd9")
    assert sniff_image_metadata(jpeg) == ("image/jpeg", 123, 99)
    # truncated mid-marker: mime known, dims not — and never a raise
    assert sniff_image_metadata(jpeg[:6]) == ("image/jpeg", None, None)

    # ISO 10918-1 B.1.1.2: 0xFF fill bytes may pad any marker — the
    # walk must consume them instead of reading marker==0xFF + a
    # garbage seglen and desyncing (ADVICE r8)
    padded = (b"\xff\xd8"
              + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
              + b"\xff\xff\xff"  # fill bytes before the next marker
              + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
              + b"\xff\xd9")
    assert sniff_image_metadata(padded) == ("image/jpeg", 123, 99)
    # all-fill tail: walk terminates cleanly, dims unknown
    assert sniff_image_metadata(b"\xff\xd8" + b"\xff" * 8) == \
        ("image/jpeg", None, None)

    wav = b"RIFF" + bytes(4) + b"WAVE" + bytes(8)
    assert sniff_image_metadata(wav) == ("audio/x-wav", None, None)

    assert sniff_image_metadata(b"\x00\x01garbage") == (None, None, None)
    assert sniff_image_metadata(b"") == (None, None, None)
    assert sniff_image_metadata(None) == (None, None, None)


def test_mixed_media_decode_flags_and_sniff(spark):
    from fsharp_dataframe_spark.functions.multimodal import (
        extract_features, make_fake_mixed_media, media_metadata,
    )

    media = make_fake_mixed_media(spark, n=30)
    sniff = {r["media_id"]: r for r in media_metadata(media).collect()}
    feats = {r["media_id"]: r for r in
             extract_features(media, real_decode=True).collect()}
    assert len(sniff) == len(feats) == 30
    n_bad = 0
    for i in range(30):
        if i % 3 == 0:
            assert feats[i]["decode_ok"] is True
            assert sniff[i]["sniff_mime"] == "image/png"
            assert (sniff[i]["sniff_width"], sniff[i]["sniff_height"]) == (32, 32)
        else:
            assert feats[i]["decode_ok"] is False
            n_bad += 1
            # the fallback byte features still exist (never NULL feat)
            assert feats[i]["feat"] is not None
        if i % 3 == 1:
            assert sniff[i]["sniff_mime"] == "image/jpeg"
            assert sniff[i]["sniff_width"] == 16 + i % 8
            assert sniff[i]["sniff_height"] == 8 + i % 5
        if i % 3 == 2:
            assert sniff[i]["sniff_mime"] is None
    assert n_bad == 20


# --- hybrid retrieval (RRF) ---------------------------------------------


def test_hybrid_rrf_hand_computed(spark):
    from fsharp_dataframe_spark.functions.search import hybrid_rrf

    lex = spark.createDataFrame(
        [(10, 3.0), (20, 2.0), (30, 1.0)], "doc_id long, score double")
    vec = spark.createDataFrame(
        [(20, 0.9), (40, 0.8)], "doc_id long, cosine_sim double")
    out = {r["doc_id"]: r for r in hybrid_rrf(lex, vec, k=10).collect()}
    # doc 20: rank 2 lexical + rank 1 vector
    assert out[20]["lex_rank"] == 2 and out[20]["vec_rank"] == 1
    assert out[20]["rrf_micro"] == round(1e6 / 62) + round(1e6 / 61)
    # single-list docs carry one term and a NULL rank for the other
    assert out[10]["vec_rank"] is None
    assert out[10]["rrf_micro"] == round(1e6 / 61)
    assert out[40]["lex_rank"] is None
    assert out[40]["rrf_micro"] == round(1e6 / 62)
    # both-lists doc fuses above every single-list doc here
    ranks = sorted(out.values(), key=lambda r: (-r["rrf_micro"], r["doc_id"]))
    assert ranks[0]["doc_id"] == 20


def test_hybrid_rrf_tie_and_k(spark):
    from fsharp_dataframe_spark.functions.search import hybrid_rrf

    # equal scores -> rank by id; k truncates deterministically
    lex = spark.createDataFrame(
        [(i, 1.0) for i in range(5)], "doc_id long, score double")
    vec = spark.createDataFrame(
        [(i, 0.5) for i in range(5)], "doc_id long, cosine_sim double")
    rows = hybrid_rrf(lex, vec, k=3).collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    assert rows[0]["lex_rank"] == rows[0]["vec_rank"] == 1


# --- domain token budgeting ---------------------------------------------


def test_token_budget_mix_hand_computed(spark):
    from fsharp_dataframe_spark.functions.sampling import token_budget_mix

    # domains: a has 10 tokens over 2 docs, b has 40 over 1 doc
    df = spark.createDataFrame(
        [(1, "w " * 5, "a"), (2, "w " * 5, "a"), (3, "w " * 40, "b")],
        "doc_id long, text string, source string")
    out = {r["domain"]: r for r in
           token_budget_mix(df, {"a": 3.0}, total_tokens=100).collect()}
    # weights renormalize over present domains: a=3e6, b=1e6, den=4e6
    assert out["a"]["avail_tokens"] == 10 and out["a"]["n_docs"] == 2
    assert out["b"]["avail_tokens"] == 40
    assert out["a"]["target_tokens"] == (100 * 3_000_000) // 4_000_000  # 75
    assert out["b"]["target_tokens"] == 25
    assert out["a"]["epochs"] == 7.5          # needs 7.5 epochs of a
    assert out["a"]["sample_rate"] == 1.0     # capped
    assert out["b"]["epochs"] == 0.625
    assert out["b"]["sample_rate"] == 0.625


def test_token_budget_mix_default_weight_and_missing_domain(spark):
    from fsharp_dataframe_spark.functions.sampling import token_budget_mix

    df = spark.createDataFrame(
        [(1, "x y z", "seen")], "doc_id long, text string, source string")
    # budget names a domain the corpus lacks: it simply contributes
    # nothing (weights renormalize over what exists)
    out = token_budget_mix(df, {"ghost": 9.0}, total_tokens=50).collect()
    assert len(out) == 1 and out[0]["domain"] == "seen"
    assert out[0]["target_tokens"] == 50


# --- CUSUM changepoints --------------------------------------------------


def test_cusum_hand_computed(spark):
    from fsharp_dataframe_spark.functions.timeseries import (
        cusum_changepoints,
    )

    # target 10, slack 2: x-target-slack = x-12 (pos), -(x-8) (neg)
    rows = [("k", i, float(v), i) for i, v in
            enumerate([10, 20, 20, 5, 1, 1, 1])]
    df = spark.createDataFrame(
        rows, "key string, ts long, value double, eid long")
    out = [tuple(r) for r in
           cusum_changepoints(df, "key", "ts", "value", 10.0, 2.0, 9.0,
                              scale=1, tiebreak="eid")
           .orderBy("ts").collect()]
    # s_pos: max(0, prev + x-12); s_neg: max(0, prev - (x-8))
    exp = [
        ("k", 0, 0, 0, 0, False),     # 10: pos 0, neg 0
        ("k", 1, 1, 8, 0, False),     # 20: pos 8, neg 0
        ("k", 2, 2, 16, 0, True),     # 20: pos 16 > 9 -> alarm
        ("k", 3, 3, 9, 3, False),     # 5: pos 9 (not >9), neg 3
        ("k", 4, 4, 0, 10, True),     # 1: neg 10 > 9 -> alarm
        ("k", 5, 5, 0, 17, True),
        ("k", 6, 6, 0, 24, True),
    ]
    assert out == exp


def test_cusum_null_skip_and_key_isolation(spark):
    from fsharp_dataframe_spark.functions.timeseries import (
        cusum_changepoints,
    )

    df = spark.createDataFrame(
        [("a", 1, 100.0, 1), ("a", 2, None, 2), ("a", 3, 100.0, 3),
         ("b", 1, 0.0, 4)],
        "key string, ts long, value double, eid long")
    out = {(r["key"], r["ts"]): r for r in
           cusum_changepoints(df, "key", "ts", "value", 0.0, 0.0, 1e9,
                              scale=1, tiebreak="eid").collect()}
    # NULL row absent; fold skips it (100 then 100 accumulates to 200)
    assert ("a", 2) not in out and len(out) == 3
    assert out[("a", 3)]["s_pos"] == 200
    # keys never share state
    assert out[("b", 1)]["s_pos"] == 0


# --- rolling median ------------------------------------------------------


def test_rolling_median_hand_computed(spark):
    from fsharp_dataframe_spark.functions.timeseries import rolling_median

    rows = [("k", i, float(v), i) for i, v in
            enumerate([5, 1, 9, 3, 7])]
    df = spark.createDataFrame(
        rows, "key string, ts long, value double, eid long")
    out = [r["med"] for r in
           rolling_median(df, "key", "ts", "value", k=3, tiebreak="eid")
           .orderBy("ts").collect()]
    # windows: [5] [5,1] [5,1,9] [1,9,3] [9,3,7]
    assert out == [5.0, 3.0, 5.0, 3.0, 7.0]


def test_rolling_median_skips_nulls_and_isolates_keys(spark):
    from fsharp_dataframe_spark.functions.timeseries import rolling_median

    df = spark.createDataFrame(
        [("a", 1, 10.0, 1), ("a", 2, None, 2), ("a", 3, 20.0, 3),
         ("b", 1, 99.0, 4)],
        "key string, ts long, value double, eid long")
    out = {(r["key"], r["ts"]): r["med"] for r in
           rolling_median(df, "key", "ts", "value", k=2,
                          tiebreak="eid").collect()}
    assert ("a", 2) not in out
    # the NULL row neither appears nor occupies a window slot
    assert out[("a", 3)] == 15.0
    assert out[("b", 1)] == 99.0


# --- hard-negative mining ------------------------------------------------


def test_hard_negatives_label_mask_and_paths_agree(spark, monkeypatch):
    import fsharp_dataframe_spark.functions.similarity as S

    # 2D unit-ish vectors; ids 0..5, labels alternate 0/1; vector i is
    # closest to its neighbors by angle
    import math

    rows = [(i, [math.cos(i * 0.3), math.sin(i * 0.3)], i % 2)
            for i in range(6)]
    rows.append((6, [1.0, 0.0], None))  # NULL label: never mines/serves
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    got_b = {(r["vec_id"], r["nbr_id"]) for r in
             S.hard_negatives(df, k=2).collect()}
    # every neighbor must carry the opposite label; no NULL-label rows
    lab = {i: i % 2 for i in range(6)}
    assert got_b, "empty result"
    for a, b in got_b:
        assert a != 6 and b != 6
        assert lab[a] != lab[b], (a, b)
    # anchors with a label each get exactly k=2 negatives (5 candidates
    # of the opposite label exist minus... 3 opposite-label rows >= 2)
    from collections import Counter

    per = Counter(a for a, _ in got_b)
    assert all(v == 2 for v in per.values()) and len(per) == 6

    # join-fallback path (budget forced to 0) agrees exactly
    got_j = {(r["vec_id"], r["nbr_id"]) for r in
             S.knn_join_exact(df, k=2, neq_label_col="label",
                              broadcast_budget_bytes=0).collect()}
    assert got_j == got_b


def test_ivf_hard_negatives_matches_exact_with_full_probes(spark):
    """The IVF scale path's label mask: with n_probe covering every
    cell, ivf_knn_join(neq_label_col=...) must equal the exact
    hard_negatives set (same rounding, same tiebreak)."""
    import math

    from fsharp_dataframe_spark.functions.similarity import (
        hard_negatives, ivf_knn_join,
    )

    rows = [(i, [math.cos(i * 0.5), math.sin(i * 0.5)], i % 3)
            for i in range(12)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    cents = [[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]]
    exact = {tuple(r) for r in hard_negatives(df, k=2).collect()}
    ivf = {tuple(r) for r in
           ivf_knn_join(df, cents, k=2, n_probe=4,
                        neq_label_col="label").collect()}
    assert ivf == exact and len(exact) == 24


# --- trimmed mean --------------------------------------------------------


def test_trimmed_mean_hand_computed(spark):
    from fsharp_dataframe_spark.functions.stats import grouped_trimmed_mean

    # 10 values 1..10 with one wild outlier replacing 10 -> trim=0.1
    # drops exactly the min and the outlier
    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]
    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate(vals)],
        "g string, eid long, v double")
    r = grouped_trimmed_mean(df, "g", F.col("v"), trim=0.1,
                             tiebreak=F.col("eid")).collect()[0]
    assert r["n"] == 10 and r["n_kept"] == 8
    assert r["trimmed_mean"] == sum(range(2, 10)) / 8  # 5.5
    # trim=0 is the plain mean
    r0 = grouped_trimmed_mean(df, "g", F.col("v"), trim=0.0,
                              tiebreak=F.col("eid")).collect()[0]
    assert r0["n_kept"] == 10 and r0["trimmed_mean"] == sum(vals) / 10

    import pytest

    with pytest.raises(ValueError, match="trim"):
        grouped_trimmed_mean(df, "g", F.col("v"), trim=0.5)


def test_trimmed_mean_tie_determinism_under_repartition(spark):
    from fsharp_dataframe_spark.functions.stats import grouped_trimmed_mean

    # all values tie: the kept SET differs only by tiebreak rank, and
    # the mean is invariant — but n_kept must be deterministic
    df = spark.createDataFrame(
        [("g", i, 7.0) for i in range(10)], "g string, eid long, v double")
    a = grouped_trimmed_mean(df, "g", F.col("v"), trim=0.2,
                             tiebreak=F.col("eid")).collect()[0]
    b = grouped_trimmed_mean(df.repartition(5), "g", F.col("v"), trim=0.2,
                             tiebreak=F.col("eid")).collect()[0]
    assert (a["n_kept"], a["trimmed_mean"]) == (b["n_kept"], 7.0) == (6, 7.0)
