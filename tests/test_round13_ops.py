"""Round-13 operators: overlapped-hop audio framing, dual-parity
video sampling, rate-normalized audio decode, index retirement — plus
the four ADVICE r12 regressions (read_index_table partition-dtype
cast, trim_video_head NULL-payload meta guard, floor-semantics offset
scaling, directional self-pair guard).

Reference anchors: the media tiers are parity-plus LLM-pipeline
operators (no reference twin); the overlapped framing follows
Haitsma & Kalker (2002) hop-based sub-fingerprints, banded via the
pigeonhole substrate of functions/dedup.py.
"""

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions import multimodal as M


# ----------------------------------------------------------------------
# ADVICE r12 regressions
# ----------------------------------------------------------------------


def test_trim_video_head_nulls_meta_on_degraded_rows(spark):
    # a malformed container degrades to a NULL payload; meta.n_frames
    # must read 0, not a phantom src-minus-trim count (ADVICE r12)
    bad = spark.createDataFrame(
        [(0, bytearray(b"NOTAVIDEO"),
          {"mime": "video/x-fsv", "width": 36, "height": 32,
           "n_frames": 9, "duration_s": 2.25})],
        M.MEDIA_SCHEMA)
    r = M.trim_video_head(bad, 2).collect()[0]
    assert r["payload"] is None
    assert r["meta"]["n_frames"] == 0


def test_offset_vote_scaling_uses_floor_not_truncation(spark):
    # a mixed-parity grid (right side sampled off the canonical
    # stride-2 grid) produces a negative non-multiple offset; the
    # alignable count must use floor(offset/stride), not trunc
    # (ADVICE r12): t = floor(-1/2) = -1 -> comparable = 2, where
    # truncation's t = 0 silently miscounted 3
    from fsharp_dataframe_spark.functions.dedup import (
        pigeonhole_pieces,
    )

    offs = pigeonhole_pieces(64, 2)
    rows = []
    for mid, idxs in ((1, (0, 2, 4)), (2, (1, 3, 5))):
        for k, idx in enumerate(idxs):
            sh = 0x0F0F0F + k * 0x101010101
            for q, (o, w) in enumerate(offs):
                rows.append((mid, idx, sh, q, (sh >> o) & ((1 << w) - 1)))
    pieces = spark.createDataFrame(
        rows, "id long, idx long, sh long, q int, qv long")
    got = M._offset_vote_pairs(pieces, pieces, stride=2, max_hamming=2,
                               directional=False).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id_l"], r["id_r"], r["offset"]) == (1, 2, -1)
    assert r["comparable"] == 2


def test_directional_offset_vote_guards_self_pairs(spark):
    # a partial re-ingest overlaps ids between batch and corpus; the
    # directional join must not emit trivial self-pairs (ADVICE r12)
    df = M.make_fake_audio_stream_media(spark, 12)
    got = M.cross_audio_stream_near_dup(df, df).collect()
    assert all(r["new_id"] != r["old_id"] for r in got)
    # the real cross pairs (planted trims, both directions) survive
    assert {(r["new_id"], r["old_id"]) for r in got} == {
        (i, i - 1) for i in range(12) if i % 6 == 5} | {
        (i - 1, i) for i in range(12) if i % 6 == 5}


def test_read_index_table_casts_string_partition_cols(spark, tmp_path):
    from fsharp_dataframe_spark.functions.index_store import (
        read_index_table, save_index_table,
    )

    pt = M.video_frame_piece_table(M.make_fake_video_media(spark, 8))
    path = str(tmp_path / "pieces_idx")
    save_index_table(pt, path, partition_by=("q",))
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        back = read_index_table(spark, path)
        assert dict(back.dtypes)["q"] == "int"
        assert back.count() == pt.count()
    finally:
        spark.conf.set(key, old)
