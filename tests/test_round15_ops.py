"""Round-15 regressions for the three ADVICE r14 items:

- _pair_payloads joins LEFT from the (deduped) pair relation, so a
  candidate pair whose id is missing from the media relation is still
  REPORTED by the verify stages (NULL metric), and duplicate input
  pairs neither duplicate output rows nor repeat FFT work;
- the retirement ops (delete/expire) restore int dtypes for ALL their
  partition_by columns under disabled partition type inference, so
  the documented time-partitioned retention shape ("q", "day") works
  in inference-off sessions instead of failing _validate_int_partitions.

Reference anchors: the media tiers are parity-plus LLM-pipeline
operators (no reference twin); audio framing follows Haitsma & Kalker
(2002).
"""

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions import multimodal as M


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols)
                  for r in df.select(*cols).collect())


# ----------------------------------------------------------------------
# _pair_payloads contract: left join + dedupe (ADVICE r14)
# ----------------------------------------------------------------------


def test_audio_ber_verify_missing_id_reported(spark):
    # a candidate id absent from the media relation (takedown landed
    # between tiers): the pair is still REPORTED, with NULL lag/ber
    # and n_windows = 0 — same degradation row as an undecodable clip
    n = 8
    media = M.make_fake_audio_stream_media(spark, n)
    pairs = spark.createDataFrame(
        [(0, 999), (998, 997), (2, 4)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r for r in
           M.audio_ber_verify(pairs, media).collect()}
    assert set(got) == {(0, 999), (998, 997), (2, 4)}
    for k in [(0, 999), (998, 997)]:
        assert got[k]["n_windows"] == 0
        assert got[k]["ber"] is None
        assert got[k]["lag"] is None
    assert got[(2, 4)]["n_windows"] >= 1
    assert got[(2, 4)]["ber"] is not None


def test_image_shift_verify_missing_id_reported(spark):
    media = M.make_fake_png_media(spark, 6)
    pairs = spark.createDataFrame(
        [(1, 777), (3, 5)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r for r in
           M.image_shift_verify(pairs, media).collect()}
    assert set(got) == {(1, 777), (3, 5)}
    assert got[(1, 777)]["overlap_px"] == 0
    assert got[(1, 777)]["agreement"] is None
    assert got[(1, 777)]["dy"] is None
    assert got[(3, 5)]["overlap_px"] > 0


def test_pair_payloads_dedupes_duplicate_pairs(spark):
    # a coarse tier emitting the same candidate twice must not
    # duplicate verify output rows (or the FFT work behind them)
    n = 8
    media = M.make_fake_audio_stream_media(spark, n)
    pairs = spark.createDataFrame(
        [(0, 2), (0, 2), (0, 2), (4, 6)], "id_a long, id_b long")
    rows = M.audio_ber_verify(pairs, media).collect()
    keys = [(r["id_a"], r["id_b"]) for r in rows]
    assert sorted(keys) == [(0, 2), (4, 6)]


# ----------------------------------------------------------------------
# retirement ops under disabled partition type inference (ADVICE r14)
# ----------------------------------------------------------------------


@pytest.fixture
def inference_off(spark):
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def test_expire_time_partitioned_inference_off(spark, tmp_path,
                                               inference_off):
    # the documented nightly retention layout partition_by=("q","day")
    # must work when the session reads partition columns as strings:
    # "day" is not in INT_PARTITION_COLS, so the retirement op itself
    # restores its int dtype from the directory names (ADVICE r14)
    from fsharp_dataframe_spark.functions.index_store import (
        expire_index_rows, read_index_table, save_index_table,
    )

    n = 12
    media = M.make_fake_video_media(spark, n)
    pt = (M.video_frame_piece_table(media, every_n=2)
          .withColumn("day", (F.col("vid") % 3).cast("int")))
    path = str(tmp_path / "daykeyed_inf_off")
    save_index_table(pt, path, partition_by=("q", "day"))
    n_old = pt.filter(F.col("day") < 1).count()
    assert expire_index_rows(spark, path, "day", 1,
                             partition_by=("q", "day")) == n_old
    cols = ["vid", "frame_idx", "sh", "q", "qv"]
    rebuilt = M.video_frame_piece_table(
        media.filter(F.col("media_id") % 3 >= 1), every_n=2)
    got = read_index_table(spark, path)
    assert _sorted_rows(got, cols) == _sorted_rows(rebuilt, cols)
    # idempotent under the same session state
    assert expire_index_rows(spark, path, "day", 1,
                             partition_by=("q", "day")) == 0


def test_delete_index_rows_extra_partition_col_inference_off(
        spark, tmp_path, inference_off):
    from fsharp_dataframe_spark.functions.index_store import (
        delete_index_rows, read_index_table, save_index_table,
    )

    n = 12
    media = M.make_fake_video_media(spark, n)
    pt = (M.video_frame_piece_table(media, every_n=2)
          .withColumn("day", (F.col("vid") % 2).cast("int")))
    path = str(tmp_path / "del_inf_off")
    save_index_table(pt, path, partition_by=("q", "day"))
    delete_index_rows(spark, path, [0, 5], "vid",
                      partition_by=("q", "day"))
    left = read_index_table(spark, path)
    assert left.filter(F.col("vid").isin(0, 5)).count() == 0
    cols = ["vid", "frame_idx", "sh", "q", "qv"]
    rebuilt = M.video_frame_piece_table(
        media.filter(~F.col("media_id").isin(0, 5)), every_n=2)
    assert _sorted_rows(left, cols) == _sorted_rows(rebuilt, cols)
