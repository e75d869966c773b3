"""Round-15 optimization pins.

The optimization round must not change what any query computes, so
every plumbing change gets an equivalence pin here.  The first family:
clone-transform relations moved into the write-once parquet fixture
cache (multimodal.cached_clone, VERDICT r14 ask #6) — the cached
relation must be row-identical to the inline transform it replaced,
and the cache must be write-once (second call reads, never re-runs
the builder)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from fsharp_dataframe_spark.functions.multimodal import (
    CLONE_CACHE_VERSION, _cache_layout_files, cached_audio_stream_media,
    cached_clone, trim_audio_head,
)


@pytest.fixture(scope="module")
def spark():
    from fsharp_dataframe_spark import get_spark

    return get_spark(app_name="test_round15_opt", master="local[2]",
                     shuffle_partitions=2)


def _rows(df):
    return sorted(
        (r["media_id"],
         bytes(r["payload"]) if r["payload"] is not None else None,
         r["meta"]["n_frames"], r["meta"]["duration_s"])
        for r in df.collect())


def test_cached_clone_equals_inline_transform(spark, tmp_path):
    """The parquet-cached clone relation is row/byte-identical to the
    inline transform output it replaced (media_id, payload bytes, the
    patched meta fields)."""
    n = 24
    media = cached_audio_stream_media(spark, n,
                                      cache_root=str(tmp_path / "m"))
    inline = (trim_audio_head(media.filter(F.col("media_id") % 4 == 2),
                              1024)
              .withColumn("media_id", F.col("media_id") + F.lit(n)))
    cached = cached_clone(
        spark, f"t1024_m4r2_n{n}",
        lambda: trim_audio_head(media.filter(F.col("media_id") % 4 == 2),
                                1024)
        .withColumn("media_id", F.col("media_id") + F.lit(n)),
        cache_root=str(tmp_path / "c"))
    assert _rows(cached) == _rows(inline)
    # schema column order is normalized to MEDIA_SCHEMA
    assert cached.columns == ["media_id", "payload", "meta"]


def test_cached_clone_is_write_once(spark, tmp_path):
    """Second call must read the parquet, not re-run the builder."""
    n = 8
    media = cached_audio_stream_media(spark, n,
                                      cache_root=str(tmp_path / "m"))
    calls = []

    def builder():
        calls.append(1)
        return trim_audio_head(media.filter(F.col("media_id") % 4 == 2),
                               100)

    root = str(tmp_path / "c")
    first = cached_clone(spark, f"t100_m4r2_n{n}", builder,
                         cache_root=root)
    assert calls == [1]
    assert os.path.exists(os.path.join(root,
                                       f"clone_t100_m4r2_n{n}"
                                       f"_v{CLONE_CACHE_VERSION}"
                                       f"_f{_cache_layout_files()}.parquet",
                                       "_SUCCESS"))
    again = cached_clone(spark, f"t100_m4r2_n{n}", builder,
                         cache_root=root)
    assert calls == [1]  # builder not re-run
    assert _rows(again) == _rows(first)


def test_registry_clone_specs_cover_their_queries(spark):
    """Every _clone_specs key resolves and the warm-up entry point is
    importable — bench.py's warm-up contract."""
    specs = entrymod._clone_specs()
    assert set(specs) == {
        "audio_trim1024_m4r2", "audio_trim768_m4r1", "audio_trim100_m6r1",
        "audio_trim768_m6r3", "audio_rs16k_m9r4", "video_trim2_m7r3",
        "video_trim1_m5r1", "video_trim2_m5r3", "image_crop3x2_m5r2",
    }
    assert callable(entrymod.warm_fixture_caches)
