"""Index-half maintenance (functions/index_store.py): appended table
== rebuilt table, incremental matchers identical over either, re-ingest
replaces, compaction preserves rows while cutting files."""

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions import multimodal as M
from fsharp_dataframe_spark.functions.index_store import (
    append_index_rows, compact_index_table, read_index_table,
    save_index_table,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols)
                  .collect())


PIECE_COLS = ["vid", "frame_idx", "sh", "q", "qv"]


def test_video_piece_append_equals_rebuild(spark, tmp_path):
    n = 48
    media = M.make_fake_video_media(spark, n)
    corpus = media.filter(F.col("media_id") % 5 != 4)
    batch = media.filter(F.col("media_id") % 5 == 4)
    path = str(tmp_path / "video_pieces")
    save_index_table(
        M.video_frame_piece_table(corpus, every_n=2, max_hamming=2),
        path, partition_by=("q",))
    append_index_rows(
        spark, path,
        M.video_frame_piece_table(batch, every_n=2, max_hamming=2),
        id_col="vid", partition_by=("q",))
    appended = read_index_table(spark, path)
    rebuilt = M.video_frame_piece_table(media, every_n=2, max_hamming=2)
    assert _rows(appended, PIECE_COLS) == _rows(rebuilt, PIECE_COLS)


def test_incremental_match_over_appended_table(spark, tmp_path):
    """Tomorrow's batch matched against the APPENDED index equals a
    match against a freshly rebuilt index — the drift the append path
    exists to prevent."""
    n = 48
    media = M.make_fake_video_media(spark, n)
    # split so a planted twin pair crosses the boundary: 39 (tonight)
    # is the re-upload of 38 (landed via the append)
    landed0 = media.filter(F.col("media_id") < 30)
    landed1 = media.filter((F.col("media_id") >= 30)
                           & (F.col("media_id") < 39))
    tonight = media.filter(F.col("media_id") >= 39)
    path = str(tmp_path / "pieces")
    save_index_table(
        M.video_frame_piece_table(landed0, every_n=2, max_hamming=2),
        path, partition_by=("q",))
    append_index_rows(
        spark, path,
        M.video_frame_piece_table(landed1, every_n=2, max_hamming=2),
        id_col="vid", partition_by=("q",))
    stored = read_index_table(spark, path)
    got = sorted(
        (r["new_id"], r["old_id"], r["matched_frames"])
        for r in M.cross_video_near_dup(
            tonight, stored, every_n=2, max_hamming=2,
            existing_is_piece_table=True).collect())
    fresh = sorted(
        (r["new_id"], r["old_id"], r["matched_frames"])
        for r in M.cross_video_near_dup(
            tonight, media.filter(F.col("media_id") < 39), every_n=2,
            max_hamming=2).collect())
    assert got == fresh
    assert any(p[:2] == (39, 38) for p in got)  # the planted twin
    # the offset-tolerant matcher rides the SAME stored index
    got_off = sorted(
        (r["new_id"], r["old_id"], r["offset"])
        for r in M.cross_video_near_dup_offset(
            tonight, stored, every_n=2, max_hamming=2,
            existing_is_piece_table=True).collect())
    fresh_off = sorted(
        (r["new_id"], r["old_id"], r["offset"])
        for r in M.cross_video_near_dup_offset(
            tonight, media.filter(F.col("media_id") < 39), every_n=2,
            max_hamming=2).collect())
    assert got_off == fresh_off


def test_audio_window_piece_append(spark, tmp_path):
    n = 30
    media = M.make_fake_audio_stream_media(spark, n)
    corpus = media.filter(F.col("media_id") % 3 != 0)
    batch = media.filter(F.col("media_id") % 3 == 0)
    path = str(tmp_path / "audio_pieces")
    save_index_table(M.audio_window_piece_table(corpus), path,
                     partition_by=("q",))
    append_index_rows(spark, path, M.audio_window_piece_table(batch),
                      id_col="aid", partition_by=("q",))
    cols = ["aid", "win_idx", "sh", "q", "qv"]
    assert _rows(read_index_table(spark, path), cols) == \
        _rows(M.audio_window_piece_table(media), cols)


def test_reingest_replaces_rows(spark, tmp_path):
    n = 24
    media = M.make_fake_video_media(spark, n)
    path = str(tmp_path / "pieces")
    save_index_table(
        M.video_frame_piece_table(media, every_n=2, max_hamming=2),
        path, partition_by=("q",))
    # re-ingest video 5 sampling EVERY frame (a backfill changing its
    # rows): ids_are_new=False must REPLACE, not duplicate
    re5 = M.video_frame_piece_table(
        media.filter(F.col("media_id") == 5), every_n=1, max_hamming=2)
    append_index_rows(spark, path, re5, id_col="vid",
                      partition_by=("q",), ids_are_new=False)
    stored = read_index_table(spark, path)
    assert _rows(stored.filter("vid = 5"), PIECE_COLS) == \
        _rows(re5, PIECE_COLS)
    # every other id untouched
    others = M.video_frame_piece_table(
        media.filter(F.col("media_id") != 5), every_n=2, max_hamming=2)
    assert _rows(stored.filter("vid <> 5"), PIECE_COLS) == \
        _rows(others, PIECE_COLS)


def test_compaction_preserves_rows_and_cuts_files(spark, tmp_path):
    import glob

    n = 40
    media = M.make_fake_video_media(spark, n)
    path = str(tmp_path / "pieces")
    save_index_table(
        M.video_frame_piece_table(
            media.filter(F.col("media_id") < 10), every_n=2,
            max_hamming=2),
        path, partition_by=("q",))
    for lo in (10, 20, 30):  # three nightly appends -> small files
        append_index_rows(
            spark, path,
            M.video_frame_piece_table(
                media.filter((F.col("media_id") >= lo)
                             & (F.col("media_id") < lo + 10)),
                every_n=2, max_hamming=2),
            id_col="vid", partition_by=("q",))
    before_rows = _rows(read_index_table(spark, path), PIECE_COLS)
    before_files = len(glob.glob(f"{path}/*/*.parquet"))
    n_files = compact_index_table(spark, path, partition_by=("q",))
    after_rows = _rows(read_index_table(spark, path), PIECE_COLS)
    assert after_rows == before_rows
    after_files = len(glob.glob(f"{path}/*/*.parquet"))
    assert n_files == after_files
    assert after_files < before_files
    # the crash-window safety dirs are cleaned up
    assert not glob.glob(f"{path}.__old__") and \
        not glob.glob(f"{path}.__staging__")


def test_cosine_bucket_append_and_match(spark, tmp_path, sf_dir):
    from fsharp_dataframe_spark.functions.similarity import (
        cosine_bucket_table, cross_cosine_near_dup_pairs,
    )
    from fsharp_dataframe_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(400)
    landed0 = emb.filter(F.col("vec_id") % 5 < 3)
    landed1 = emb.filter(F.col("vec_id") % 5 == 3)
    tonight = emb.filter(F.col("vec_id") % 5 == 4)
    path = str(tmp_path / "buckets")
    save_index_table(cosine_bucket_table(landed0), path,
                     partition_by=("tbl",))
    append_index_rows(spark, path, cosine_bucket_table(landed1),
                      id_col="vec_id", partition_by=("tbl",))
    stored = read_index_table(spark, path)
    cols = ["vec_id", "tbl", "bucket"]
    rebuilt = cosine_bucket_table(landed0.unionByName(landed1))
    assert _rows(stored, cols) == _rows(rebuilt, cols)
    landed = landed0.unionByName(landed1)
    got = sorted(
        (r["new_id"], r["old_id"], round(r["cosine_sim"], 9))
        for r in cross_cosine_near_dup_pairs(
            tonight, landed, threshold=0.8,
            existing_buckets=stored).collect())
    fresh = sorted(
        (r["new_id"], r["old_id"], round(r["cosine_sim"], 9))
        for r in cross_cosine_near_dup_pairs(
            tonight, landed, threshold=0.8).collect())
    assert got == fresh
