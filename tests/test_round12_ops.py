"""Round-12 operators: whole-stream audio fingerprints, temporal-
offset-tolerant audio/video matching, the FSV1 head-trim transform,
and the nullable-Int64 fingerprint-batch regression.

Reference anchors: the stream tiers are parity-plus LLM-pipeline
operators (no reference twin); the matching discipline follows
Haitsma & Kalker (2002) windowed fingerprinting, banded via the
pigeonhole substrate of functions/dedup.py.
"""

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions import multimodal as M


# ----------------------------------------------------------------------
# the nullable-Int64 regression: one undecodable row in a batch used to
# coerce the whole hash column to float64, zeroing the low ~7 bits of
# every 60-bit fingerprint in the batch
# ----------------------------------------------------------------------


def test_one_bad_row_does_not_corrupt_batch_hashes(spark):
    n = 60
    media = M.make_fake_video_media(spark, n)
    # trimming 2 frames off a 2-frame video leaves a ZERO-frame (still
    # well-formed) container -> one NULL-hash row sharing batches with
    # real ones; ids where (i % 13) == 0 hit that edge
    clones = (M.trim_video_head(media.filter(F.col("media_id") % 7 == 3), 2)
              .withColumn("media_id", F.col("media_id") + n))
    got = {(r["media_id"], r["frame_idx"]): r["dhash"]
           for r in M.video_frame_hashes(clones, every_n=2).collect()
           if r["dhash"] is not None}
    assert got, "expected decodable clone frames"
    for (mid, f), dh in got.items():
        assert dh == M._video_frame_pattern(mid - n, f + 2), (mid, f)
    # the zero-frame clone degrades to a NULL row, not an exception
    empties = [r for r in M.video_frame_hashes(clones, every_n=2).collect()
               if not r["decode_ok"]]
    assert any(M.video_frame_count(r["media_id"] - n) == 2
               for r in empties)


def test_nullable_i64_preserves_exact_int64():
    vals = M._nullable_i64([(1 << 60) - 1, None, 123])
    assert vals[0] == (1 << 60) - 1 and vals[2] == 123
    assert vals[1] is not True and str(vals[1]) == "<NA>"


# ----------------------------------------------------------------------
# whole-stream audio windows
# ----------------------------------------------------------------------


def test_audio_window_fingerprints_match_closed_form(spark):
    df = M.make_fake_audio_stream_media(spark, 36)
    rows = M.audio_window_fingerprints(df).filter("decode_ok").collect()
    counts = {}
    for r in rows:
        assert r["afp"] == M._afp_stream_pattern(r["media_id"],
                                                 r["win_idx"])
        counts[r["media_id"]] = counts.get(r["media_id"], 0) + 1
    for i in range(36):
        assert counts[i] == M.audio_stream_window_count(i)


def test_audio_window_zero_equals_first_window_fast_path(spark):
    df = M.make_fake_audio_stream_media(spark, 12)
    fast = {r["media_id"]: r["afp"]
            for r in M.audio_fingerprint(df).filter("decode_ok").collect()}
    w0 = {r["media_id"]: r["afp"]
          for r in M.audio_window_fingerprints(df)
          .filter("decode_ok and win_idx = 0").collect()}
    assert fast == w0


def test_afp_all_windows_short_and_null():
    assert M._afp_all_windows(None) == []
    assert M._afp_all_windows([0.0] * (M.AFP_FRAME - 1)) == []


def test_audio_stream_near_dup_catches_trimmed_head(spark):
    n = 36
    df = M.make_fake_audio_stream_media(spark, n)
    pairs = {(r["id_a"], r["id_b"]):
             (r["offset"], r["matched_windows"], r["comparable_windows"])
             for r in M.audio_stream_near_dup(df).collect()}
    planted = [(i - 1, i) for i in range(n) if i % 6 == 5]
    for a, b in planted:
        off, m, c = pairs[(a, b)]
        assert off == 1 and m == c == M.audio_stream_window_count(b)
    assert set(pairs) == set(planted)
    # the first-window fast path provably misses every planted pair:
    # window 0 of the trimmed clip is window 1 of its source
    from fsharp_dataframe_spark.functions.dedup import (
        banded_hamming_pairs,
    )
    fps = (M.audio_fingerprint(df).filter("decode_ok")
           .select(F.col("media_id").alias("doc_id"),
                   F.col("afp").alias("sh")))
    fast_pairs = {(r["id_a"], r["id_b"]) for r in banded_hamming_pairs(
        fps, id_col="doc_id", sketch_col="sh", max_hamming=2).collect()}
    assert not (fast_pairs & set(planted))


def test_cross_audio_stream_near_dup_directional(spark):
    n = 36
    df = M.make_fake_audio_stream_media(spark, n)
    new = df.filter(F.col("media_id") % 6 == 5)
    old = df.filter(F.col("media_id") % 6 != 5)
    got = {(r["new_id"], r["old_id"]): r["offset"]
           for r in M.cross_audio_stream_near_dup(new, old).collect()}
    assert got == {(i, i - 1): 1 for i in range(n) if i % 6 == 5}
    # piece-table shape: landed corpus joined as a persisted relation
    pt = M.audio_window_piece_table(old)
    got2 = {(r["new_id"], r["old_id"]): r["offset"]
            for r in M.cross_audio_stream_near_dup(
                new, pt, existing_is_piece_table=True).collect()}
    assert got2 == got


# ----------------------------------------------------------------------
# offset-tolerant video matching
# ----------------------------------------------------------------------


def _video_corpus_with_trims(spark, n):
    media = M.make_fake_video_media(spark, n)
    clones = (M.trim_video_head(
        media.filter(F.col("media_id") % 7 == 3), 2)
        .withColumn("media_id", F.col("media_id") + n))
    return media, clones, media.unionByName(clones)


def test_video_near_dup_offset_catches_trims(spark):
    n = 60
    media, clones, corpus = _video_corpus_with_trims(spark, n)
    got = {(r["id_a"], r["id_b"]):
           (r["offset"], r["matched_frames"], r["comparable_frames"])
           for r in M.video_near_dup_offset(corpus, every_n=2,
                                            max_hamming=2).collect()}
    planted = [(i, i + n) for i in range(n)
               if i % 7 == 3 and M.video_frame_count(i) > 2]
    for a, b in planted:
        off, m, c = got[(a, b)]
        assert off == 2 and m == c
    # the same-position matcher provably misses every planted trim pair
    sp = {(r["id_a"], r["id_b"]) for r in M.video_near_dup(
        corpus, every_n=2, max_hamming=2).collect()}
    assert not (sp & set(planted))
    # and the offset matcher still finds the same-position re-uploads
    # (dominant offset 0) the old operator finds
    assert sp <= {k for k, v in got.items() if v[0] == 0}


def test_cross_video_near_dup_offset_directional(spark):
    n = 42
    media, clones, _ = _video_corpus_with_trims(spark, n)
    got = {(r["new_id"], r["old_id"]): r["offset"]
           for r in M.cross_video_near_dup_offset(
               clones, media, every_n=2, max_hamming=2).collect()}
    planted = {(i + n, i): 2 for i in range(n)
               if i % 7 == 3 and M.video_frame_count(i) > 2}
    for k, off in planted.items():
        assert got.get(k) == off, (k, got.get(k))
    # persisted-piece-table shape gives identical results
    pt = M.video_frame_piece_table(media, every_n=2, max_hamming=2)
    got2 = {(r["new_id"], r["old_id"]): r["offset"]
            for r in M.cross_video_near_dup_offset(
                clones, pt, every_n=2, max_hamming=2,
                existing_is_piece_table=True).collect()}
    assert got2 == got


def test_trim_video_head_meta_and_degradation(spark):
    media = M.make_fake_video_media(spark, 10)
    t = M.trim_video_head(media, 2)
    rows = {r["media_id"]: r for r in t.collect()}
    for i, r in rows.items():
        want = max(0, M.video_frame_count(i) - 2)
        assert r["meta"]["n_frames"] == want
        if r["payload"] is not None:
            import struct

            assert struct.unpack_from("<I", bytes(r["payload"]), 4)[0] \
                == want
    # malformed container degrades to NULL payload, no exception
    bad = spark.createDataFrame(
        [(0, bytearray(b"NOTAVIDEO")), (1, None)],
        "media_id long, payload binary")
    out = {r["media_id"]: r["payload"]
           for r in M.trim_video_head(bad, 1).collect()}
    assert out[0] is None and out[1] is None


def test_offset_vote_comparable_formula(spark):
    # trim 4 (= 2 sampled positions at stride 2): comparable at the
    # dominant offset must be min(nb-1, na-1-t) - max(0,-t) + 1
    n = 30
    media = M.make_fake_video_media(spark, n)
    big = media.filter(F.col("media_id") == 12)  # nf = 14, sampled 7
    clone = (M.trim_video_head(big, 4)
             .withColumn("media_id", F.lit(99).cast("long")))
    got = M.video_near_dup_offset(big.unionByName(clone), every_n=2,
                                  max_hamming=2).collect()
    assert len(got) == 1
    r = got[0]
    # na=7, nb=5, offset 4 frames -> t=2: min(4, 7-1-2)=4 -> 4-0+1=5
    assert (r["id_a"], r["id_b"], r["offset"]) == (12, 99, 4)
    assert r["comparable_frames"] == 5 and r["matched_frames"] == 5


# ----------------------------------------------------------------------
# audio snippet search (query-by-example containment)
# ----------------------------------------------------------------------


def test_slice_audio_windows_roundtrip_and_degradation(spark):
    media = M.make_fake_audio_stream_media(spark, 14)
    sl = M.slice_audio_windows(media, 1, 2)
    rows = {r["media_id"]: r for r in sl.collect()}
    for i, r in rows.items():
        nw = M.audio_stream_window_count(i)
        if nw >= 3:
            # the slice's window fingerprints are the source's 1..2
            fps = M._afp_all_windows(
                M._decode_wav_samples(r["payload"]))
            assert fps == [M._afp_stream_pattern(i, 1),
                           M._afp_stream_pattern(i, 2)]
            assert r["meta"]["n_frames"] == 2 * M.AFP_FRAME
        else:
            assert r["payload"] is None
            assert r["meta"]["n_frames"] == 0


def test_audio_snippet_search_containment(spark):
    n = 42
    media = M.make_fake_audio_stream_media(spark, n)
    src = media.filter(F.col("media_id") % 7 == 2)
    snips = (M.slice_audio_windows(src, 1, 2)
             .withColumn("media_id", F.col("media_id") + n))
    hits = {(r["snippet_id"], r["clip_id"]): (r["offset"], r["n_windows"])
            for r in M.audio_snippet_search(snips, media).collect()}
    # every viable snippet finds its source clip at window offset 1
    for i in range(n):
        if i % 7 == 2 and M.audio_stream_window_count(i) >= 3:
            assert hits[(i + n, i)] == (1, 2), i
    # the piece substrate finds the re-upload family for free:
    # snippet of 16 occurs in 17 (17 = 16 minus window 0) at offset 0
    assert hits[(16 + n, 17)] == (0, 2)
    # snippet of the TRIMMED clip 23 occurs in its source 22 shifted
    assert hits[(23 + n, 22)] == (2, 2)
    # containment is strict: no partial (1-of-2) hits are emitted
    assert all(v[1] == 2 for v in hits.values())
    # searching a persisted piece table gives identical results
    pt = M.audio_window_piece_table(media)
    hits2 = {(r["snippet_id"], r["clip_id"]):
             (r["offset"], r["n_windows"])
             for r in M.audio_snippet_search(
                 snips, pt, corpus_is_piece_table=True).collect()}
    assert hits2 == hits


def test_video_snippet_search_containment(spark):
    n = 54
    media = M.make_fake_video_media(spark, n)
    src = media.filter(F.col("media_id") % 9 == 4)
    snips = (M.slice_video_frames(src, 2, 4)
             .withColumn("media_id", F.col("media_id") + n))
    hits = {(r["snippet_id"], r["clip_id"]): (r["offset"], r["n_frames"])
            for r in M.video_snippet_search(snips, media,
                                            every_n=2).collect()}
    for i in range(n):
        if i % 9 == 4 and M.video_frame_count(i) >= 6:
            assert hits[(i + n, i)] == (2, 2), i
    # re-upload family found for free: 85 = excerpt of 31 (twin of 30)
    assert hits[(31 + n, 30)] == (2, 2)
    assert all(v[1] == 2 for v in hits.values())  # strict containment
    # slice degradation: too-short or malformed -> NULL payload
    sl = {r["media_id"]: r for r in M.slice_video_frames(
        media.limit(12), 2, 4).collect()}
    for i, r in sl.items():
        if M.video_frame_count(i) < 6:
            assert r["payload"] is None and r["meta"]["n_frames"] == 0
        else:
            assert r["meta"]["n_frames"] == 4
    # persisted-index path identical
    pt = M.video_frame_piece_table(media, every_n=2, max_hamming=2)
    hits2 = {(r["snippet_id"], r["clip_id"]): (r["offset"], r["n_frames"])
             for r in M.video_snippet_search(
                 snips, pt, every_n=2,
                 corpus_is_piece_table=True).collect()}
    assert hits2 == hits


def test_video_shared_segments_resolves_compilations(spark):
    n = 44
    media = M.make_fake_video_media(spark, n)
    heads = media.filter((F.col("media_id") % 11 == 6)
                         & (F.col("media_id") + 3 < n))
    tails = media.select(F.col("media_id").alias("tid"),
                         F.col("payload").alias("tail_payload"))
    paired = heads.join(tails, F.col("tid") == F.col("media_id") + 3)
    comps = (M.concat_video_payloads(paired, "tail_payload")
             .withColumn("media_id", F.col("media_id") + n)
             .select("media_id", "payload", "meta"))
    corpus = media.unionByName(comps)
    segs = {(r["id_a"], r["id_b"], r["offset"]): r["matched_frames"]
            for r in M.video_shared_segments(
                corpus, every_n=2, max_hamming=2, min_run=2).collect()}
    import math

    for i in (6, 17, 28, 39):
        nf_h = M.video_frame_count(i)
        nf_t = M.video_frame_count(i + 3)
        cid = i + n
        # head segment at offset 0 with the head's sampled count
        assert segs[(i, cid, 0)] == math.ceil(nf_h / 2), i
        # tail segment at offset -nf_head (all fixture heads are even,
        # so the spliced tail keeps the sampling parity)
        assert nf_h % 2 == 0
        assert segs[(i + 3, cid, -nf_h)] == math.ceil(nf_t / 2), i
    # the differentiator vs the dominant-offset matcher: a video
    # containing TWO segments of the SAME source (here: a doubled
    # video — source spliced with itself) yields TWO segment rows for
    # ONE pair; the dominant-offset matcher can only report one
    src6 = media.filter(F.col("media_id") == 6)
    doubled = (M.concat_video_payloads(
        src6.withColumn("tail_payload", F.col("payload")),
        "tail_payload")
        .withColumn("media_id", F.lit(2 * n).cast("long"))
        .select("media_id", "payload", "meta"))
    duo = media.filter(F.col("media_id") == 6).unionByName(doubled)
    segs2 = {(r["id_a"], r["id_b"], r["offset"]): r["matched_frames"]
             for r in M.video_shared_segments(
                 duo, every_n=2, max_hamming=2, min_run=2).collect()}
    nf6 = M.video_frame_count(6)
    assert segs2[(6, 2 * n, 0)] == math.ceil(nf6 / 2)
    assert segs2[(6, 2 * n, -nf6)] == math.ceil(nf6 / 2)
    one = M.video_near_dup_offset(duo, every_n=2,
                                  max_hamming=2).collect()
    assert len([r for r in one
                if (r["id_a"], r["id_b"]) == (6, 2 * n)]) <= 1
    # malformed degradation: concat with a bad side yields NULL
    bad = spark.createDataFrame(
        [(0, bytearray(b"FSV1\x00\x00\x00\x00"), bytearray(b"junk"))],
        "media_id long, payload binary, tail_payload binary")
    assert M.concat_video_payloads(bad, "tail_payload") \
        .collect()[0]["payload"] is None


def test_offset_vote_comparable_formula_matches_brute_force():
    """The closed-form alignable-position count used by every offset
    matcher and oracle — comparable(t) = min(n_second-1, n_first-1-t)
    - max(0, -t) + 1 — equals the brute-force count of aligned index
    pairs for every (n_first, n_second, t) in a dense grid."""
    for n_first in range(1, 9):
        for n_second in range(1, 9):
            for t in range(-10, 11):
                brute = sum(1 for k in range(n_second)
                            if 0 <= k + t < n_first)
                formula = max(0, min(n_second - 1, n_first - 1 - t)
                              - max(0, -t) + 1)
                assert brute == formula, (n_first, n_second, t)
