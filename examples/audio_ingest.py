"""Audio-ingest job — the round-13 audio tier composed end-to-end,
each stage a scale-audited engine operator:

    audio parquet (WAV payloads + typed metadata)
      → overlap fingerprints (one Haitsma-Kalker sub-fingerprint per
                              2048-sample window every 512 samples;
                              real stdlib-WAV decode, rate-normalized
                              to the canonical 8 kHz so 16/44.1/48 kHz
                              re-encodes fingerprint bit-identically)
      → corpus index        (audio_overlap_piece_table written ONCE,
                              hive-partitioned by the piece index —
                              the half every nightly batch joins)
      → nightly increment    (tonight's clips — including head-trimmed
                              and resampled re-uploads — matched
                              against the STORED index via the offset
                              vote; |new|-bounded, the corpus is never
                              re-decoded or self-joined)
      → snippet search       (query-by-example containment over the
                              SAME stored index, at hop resolution —
                              a snippet cut mid-window still lands)
      → append + takedown    (survivors land as a pure partitioned
                              append; a retirement request retires ids
                              in place; vacuum clears crash leftovers)
      → retention            (expire_index_rows sweeps rows older
                              than the retention horizon by their
                              ingest-day watermark — the TTL half of
                              the maintenance loop)

Run:  python examples/audio_ingest.py [sf_dir]

Prints one JSON line per stage.  The demo corpus is the engine's
executor-generated closed-form WAV fixture; on a real corpus, point
the reader at your payload parquet and the stages are unchanged.
For a CONTINUOUS ingest, stream_cross_audio_overlap_near_dup joins
the live stream against the same stored index (stateless per
micro-batch; re-read the index and restart the checkpointed query on
the append cadence — the pinned refresh contract), or
run_stream_cross_refreshed runs the batch matcher inside
foreachBatch with a per-micro-batch index re-read, so appends become
visible with NO restart (pinned in test_round14_ops).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fsharp_dataframe_spark import get_spark
from fsharp_dataframe_spark.functions.index_store import (
    append_index_rows, delete_index_rows, expire_index_rows,
    read_index_table, save_index_table, vacuum_index_table,
)
from fsharp_dataframe_spark.functions.multimodal import (
    audio_overlap_piece_table, audio_overlap_snippet_search,
    cross_audio_overlap_near_dup, make_fake_audio_stream_media,
    resample_audio, slice_audio_samples, trim_audio_head,
)


def run(spark, sf_dir: str) -> dict:
    out = {}
    n = 240
    media = make_fake_audio_stream_media(spark, n)
    landed = media.filter(F.col("media_id") % 3 != 2)

    with tempfile.TemporaryDirectory() as tmp:
        store = os.path.join(tmp, "overlap_pieces.parquet")

        # 1. corpus index: written once, partitioned by the piece
        #    index so nightly joins prune directories
        save_index_table(
            audio_overlap_piece_table(landed)
            .withColumn("ingest_day", F.lit(0)), store,
            partition_by=("q",))
        idx_rows = read_index_table(spark, store).count()
        out["index"] = {"landed_clips": int(landed.count()),
                        "index_rows": int(idx_rows)}

        # 2. nightly batch: genuinely new clips + two kinds of
        #    re-upload a real feed delivers — a 1024-sample head trim
        #    (two hops, invisible to non-overlapping framing) and a
        #    16 kHz re-encode (invisible without rate normalization)
        fresh = media.filter(F.col("media_id") % 3 == 2)
        trims = (trim_audio_head(
            landed.filter(F.col("media_id") % 5 == 0), 1024)
            .withColumn("media_id", F.col("media_id") + n))
        reenc = (resample_audio(
            landed.filter(F.col("media_id") % 5 == 1), 16000)
            .withColumn("media_id", F.col("media_id") + 2 * n))
        batch = fresh.unionByName(trims).unionByName(reenc)
        stored = read_index_table(spark, store)
        dups = cross_audio_overlap_near_dup(
            batch, stored, existing_is_piece_table=True)
        n_dup = dups.select("new_id").distinct().count()
        n_batch = batch.filter(F.col("payload").isNotNull()).count()
        out["nightly"] = {"batch": int(n_batch),
                          "dup_of_landed": int(n_dup),
                          "kept": int(n_batch - n_dup)}

        # 3. snippet search over the SAME stored index: a 2560-sample
        #    query cut at sample 1536 (mid-window) still lands
        snips = (slice_audio_samples(
            landed.filter(F.col("media_id") % 7 == 3), 1536, 2560)
            .withColumn("media_id", F.col("media_id") + 3 * n))
        hits = audio_overlap_snippet_search(
            snips, stored, corpus_is_piece_table=True)
        out["snippets"] = {"queries": int(
            snips.filter(F.col("payload").isNotNull()).count()),
            "containment_hits": int(hits.count())}

        # 4. survivors land as a pure |new|-bounded append
        survivors = batch.join(
            dups.select(F.col("new_id").alias("media_id")).distinct(),
            "media_id", "left_anti")
        append_index_rows(spark, store,
                          audio_overlap_piece_table(survivors)
                          .withColumn("ingest_day", F.lit(1)),
                          id_col="aid", partition_by=("q",))
        out["append"] = {"index_rows_after": int(
            read_index_table(spark, store).count())}

        # 5. takedown + vacuum: retire ids in place, then clear any
        #    crash-window leftovers (vacuum verifies the live table
        #    reads before touching anything)
        retired = [int(r["media_id"]) for r in
                   survivors.select("media_id").limit(2).collect()]
        delete_index_rows(spark, store, retired, id_col="aid",
                          partition_by=("q",))
        removed = vacuum_index_table(spark, store)
        out["takedown"] = {"retired_ids": retired,
                           "index_rows_after": int(
                               read_index_table(spark, store).count()),
                           "vacuumed": removed}

        # 6. retention: expire every index row older than the current
        #    ingest day (the TTL sweep — media indexes age out by
        #    watermark as well as by explicit takedown ids)
        expired = expire_index_rows(spark, store, "ingest_day", 1,
                                    partition_by=("q",))
        out["retention"] = {"expired_rows": int(expired),
                            "index_rows_after": int(
                                read_index_table(spark, store).count())}
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="audio-ingest-example",
                      master="local[8]", shuffle_partitions=8)
    for stage, payload in run(spark, sf_dir).items():
        print(json.dumps({"stage": stage, **payload}))


if __name__ == "__main__":
    main()
