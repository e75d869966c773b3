"""Multimodal dedup job — the round-10 image tier composed end-to-end,
each stage a scale-audited engine operator:

    media parquet (binary payloads + typed metadata)
      → metadata sniff     (stdlib container-header parse — mime +
                            dimensions WITHOUT decoding; the pass that
                            routes rows to the expensive decode tier)
      → dHash              (real decode → 64-bit perceptual hash,
                            Arrow-batched; undecodable rows degrade to
                            a NULL hash, never an executor exception)
      → near-dup pairs     (pigeonhole-complete banded Hamming join —
                            the SimHash band substrate; shuffle key =
                            (piece, piece-bits), never all-pairs)
      → duplicate clusters (connected components, min-id canonicals —
                            transitive chains collapse even when their
                            endpoints were never a direct pair)
      → keep-one survivors (filter is_canonical — the corpus that
                            ships to training)
      → nightly increment   (the landed survivors' piece table is
                            WRITTEN ONCE to parquet; tonight's batch
                            joins against the stored table via
                            cross_banded_hamming_pairs — directional,
                            |new|-bounded, the corpus never
                            self-joined again)
      → other modalities   (audio spectral fingerprints and
                            temporally-aligned video frame hashes ride
                            the SAME band substrate — the pipeline is
                            modality-agnostic below the fingerprint)

Run:  python examples/multimodal_dedup.py [sf_dir]

Prints one JSON line per stage — the shape of a nightly image-corpus
dedup job.  The demo corpus is the engine's executor-generated
closed-form PNG fixture; on a real corpus, point the reader at your
payload parquet and the stages are unchanged.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fsharp_dataframe_spark import get_spark
from fsharp_dataframe_spark.sources.parquet import load_table


def run(spark, sf_dir: str) -> dict[str, object]:
    from fsharp_dataframe_spark.functions.dedup import banded_hamming_pairs
    from fsharp_dataframe_spark.functions.graph import duplicate_clusters
    from fsharp_dataframe_spark.functions.multimodal import (
        dhash_media, make_fake_dhash_media, media_metadata,
    )

    n = load_table(spark, sf_dir, "documents").count()
    media = make_fake_dhash_media(spark, n)
    out: dict[str, object] = {}

    # 1. metadata BEFORE decode: mime/dimension profile at scan speed
    meta = media_metadata(media)
    prof = (meta.groupBy("sniff_mime")
            .agg(F.count("*").alias("n")).collect())
    out["sniff"] = {str(r["sniff_mime"]): int(r["n"]) for r in prof}

    # 2. perceptual hash over the real decode tier
    hashes = dhash_media(media)
    ok = hashes.agg(
        F.sum(F.col("decode_ok").cast("long")).alias("ok"),
        F.count("*").alias("n")).first()
    out["decode"] = {"n": int(ok["n"]), "decode_ok": int(ok["ok"])}

    # 3. near-dup pairs within Hamming 2 (pigeonhole-complete)
    pairs = banded_hamming_pairs(hashes, id_col="media_id",
                                 sketch_col="dhash", max_hamming=2)
    by_h = {int(r["hamming"]): int(r["n"]) for r in
            pairs.groupBy("hamming").agg(F.count("*").alias("n"))
            .collect()}
    out["pairs"] = {"n_pairs": sum(by_h.values()), "by_hamming": by_h}

    # 4. transitive clusters + canonical survivors
    ids = spark.range(n).select(F.col("id").alias("media_id"))
    clusters = duplicate_clusters(ids, pairs.select("id_a", "id_b"),
                                  id_col="media_id")
    agg = clusters.agg(
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.max("cluster_size").alias("max_size"),
        F.sum(F.col("is_canonical").cast("long")).alias("survivors"),
        F.count("*").alias("n")).first()
    out["clusters"] = {
        "n_clusters": int(agg["n_clusters"]),
        "max_cluster_size": int(agg["max_size"]),
        "survivors": int(agg["survivors"]),
        "removed": int(agg["n"] - agg["survivors"]),
    }

    # 5. the NIGHTLY path: persist the landed survivors' piece table
    #    once, then dedup tonight's batch against the STORED relation —
    #    directional (new × landed), |new|-bounded however large the
    #    corpus grows; the corpus is never re-hashed or self-joined.
    import tempfile

    from fsharp_dataframe_spark.functions.dedup import (
        cross_banded_hamming_pairs, hamming_piece_table,
    )

    canon = clusters.filter(F.col("is_canonical")).select("media_id")
    landed = hashes.join(canon, "media_id", "left_semi")
    with tempfile.TemporaryDirectory() as tmp:
        store = os.path.join(tmp, "corpus_pieces.parquet")
        from fsharp_dataframe_spark.functions.index_store import (
            save_index_table,
        )

        save_index_table(
            hamming_piece_table(landed, id_col="media_id",
                                sketch_col="dhash", max_hamming=2),
            store, partition_by=("q",))
        # tonight's batch: 48 genuinely new images (fresh fixture ids)
        # plus 16 RE-CRAWLS of landed content under new media ids —
        # the mix a real ingest feed delivers
        fresh = (make_fake_dhash_media(spark, n + 48)
                 .filter(F.col("media_id") >= n))
        recrawl = (make_fake_dhash_media(spark, 16)
                   .withColumn("media_id", F.col("media_id") + n + 48))
        batch = dhash_media(fresh.union(recrawl))
        dups = cross_banded_hamming_pairs(
            batch, spark.read.parquet(store), id_col="media_id",
            sketch_col="dhash", max_hamming=2,
            existing_is_piece_table=True)
        n_dup = dups.select("new_id").distinct().count()
        n_batch = batch.count()
        # close the loop (the index-maintenance story): tonight's
        # SURVIVORS land in the stored piece table as a pure
        # |new|-bounded append — the corpus index is never rebuilt,
        # and tomorrow's batch joins the grown table.  Run
        # compact_index_table periodically once per-append files
        # accumulate.
        from fsharp_dataframe_spark.functions.index_store import (
            append_index_rows,
        )

        survivors = batch.join(dups.select(F.col("new_id").alias(
            "media_id")).distinct(), "media_id", "left_anti")
        before = spark.read.parquet(store).count()
        append_index_rows(
            spark, store,
            hamming_piece_table(survivors, id_col="media_id",
                                sketch_col="dhash", max_hamming=2),
            id_col="media_id", partition_by=("q",))
        after = spark.read.parquet(store).count()

        # 6. TAKEDOWN: a retirement request (rights revoked, user
        #    deletion) retires ids from the stored index in place —
        #    partition-scoped antijoin rewrite, untouched partitions
        #    keep their files; the retired media can never match
        #    again (delete_index_rows: removed == rebuilt-without,
        #    pinned in test_round13_ops).
        from fsharp_dataframe_spark.functions.index_store import (
            delete_index_rows, read_index_table,
        )

        retired = [int(r["media_id"]) for r in
                   survivors.select("media_id").limit(3).collect()]
        delete_index_rows(spark, store, retired, id_col="media_id",
                          partition_by=("q",))
        after_del = read_index_table(spark, store).count()
    out["nightly"] = {"batch": int(n_batch),
                      "dup_of_landed": int(n_dup),
                      "kept": int(n_batch - n_dup),
                      "index_rows_before": int(before),
                      "index_rows_after": int(after)}
    out["takedown"] = {"retired_ids": retired,
                       "index_rows_after": int(after_del)}

    # 7. the SAME substrate carries the other modalities: audio
    #    spectral-band fingerprints (real stdlib-WAV decode) ride the
    #    identical pigeonhole band join, and video near-dup is
    #    temporally-aligned per-frame dHash over a really-decodable
    #    multi-frame container — nothing modality-specific exists
    #    below the fingerprint, so the cluster/increment stages above
    #    apply unchanged.
    from fsharp_dataframe_spark.functions.multimodal import (
        audio_fingerprint, make_fake_audio_media, make_fake_video_media,
        video_near_dup,
    )

    na, nv = min(n, 256), min(n, 128)
    a_pairs = banded_hamming_pairs(
        audio_fingerprint(make_fake_audio_media(spark, na)),
        id_col="media_id", sketch_col="afp", max_hamming=2)
    v_pairs = video_near_dup(make_fake_video_media(spark, nv))
    out["other_modalities"] = {"audio_n": int(na),
                               "audio_pairs": int(a_pairs.count()),
                               "video_n": int(nv),
                               "video_pairs": int(v_pairs.count())}
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="multimodal-dedup-example",
                      master="local[8]", shuffle_partitions=8)
    for stage, payload in run(spark, sf_dir).items():
        print(json.dumps({"stage": stage, **payload}
                         if isinstance(payload, dict)
                         else {"stage": stage, "value": payload}))


if __name__ == "__main__":
    main()
