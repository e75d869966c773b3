"""End-to-end corpus-cleaning pipeline — every stage is one of the
engine's audited operators, composed the way a production training-data
job runs them:

    raw parquet/JSONL
      → exact dedup            (fingerprint groupBy, keep min id)
      → near-dedup             (MinHash-LSH candidates → exact Jaccard
                                verify → connected-component clusters →
                                keep one canonical doc per cluster)
      → benchmark decontamination (broadcast shingle semi-join)
      → repetition filter      (Gopher thresholds, zero-shuffle)
      → quality gate           (C4 lines, heuristic score, unigram- and
                                bigram-LM perplexity proxies)
      → deterministic split    (salted hash, BY DOCUMENT before
                                chunking so no document straddles
                                train/heldout, stable under re-ingest)
      → context-window chunking (token-budget slices with overlap —
                                narrow, no shuffle)
      → token-budget sharding  (bucketed prefix sum over the chunk
                                stream, no global window)
      → partitioned parquet    (split-partitioned, shard-sorted)

Run:  python examples/clean_pipeline.py [sf_dir] [out_dir]

Defaults: sf_dir=/root/testdata/sf0.001, out_dir=/tmp/clean_corpus_out.
Prints one JSON line per stage with the surviving row count — the
audit trail a real pipeline logs.  Every stage is lazy; Spark runs the
whole cascade as a handful of jobs at the final writes.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fsharp_dataframe_spark import get_spark
from fsharp_dataframe_spark.functions.dedup import (
    contamination_overlap,
    exact_dedup,
    near_dedup_pairs,
)
from fsharp_dataframe_spark.functions.graph import duplicate_clusters
from fsharp_dataframe_spark.functions.quality import repetition_filter
from fsharp_dataframe_spark.functions.sampling import (
    chunk_documents,
    hash_split,
    pack_shards,
)
from fsharp_dataframe_spark.functions.text import (
    bigram_logprob_score,
    bpe_ish_token_count,
    quality_score,
)
from fsharp_dataframe_spark.functions.util import cache_scope
from fsharp_dataframe_spark.sources.parquet import load_table, save_parquet


def clean_corpus(spark, sf_dir: str, out_dir: str,
                 near_dup_threshold: float = 0.5,
                 max_bench_hits: int = 0,
                 min_quality: float = 0.5,
                 split_weights: dict[str, float] | None = None,
                 shard_tokens: int = 20_000) -> dict[str, int]:
    """Run the full cascade; returns {stage: surviving_rows}.

    The sketch relations the dedup operators persist (shingle tables,
    MinHash signatures) are scoped to this function: the stages are
    lazy, so the FINAL write re-walks the whole cascade and reuses the
    caches — they must stay alive until then, and cache_scope releases
    them deterministically on exit instead of leaving the blocks to
    the ContextCleaner."""
    with cache_scope():
        return _clean_corpus(spark, sf_dir, out_dir, near_dup_threshold,
                             max_bench_hits, min_quality, split_weights,
                             shard_tokens)


def _clean_corpus(spark, sf_dir, out_dir, near_dup_threshold,
                  max_bench_hits, min_quality, split_weights,
                  shard_tokens) -> dict[str, int]:
    counts: dict[str, int] = {}
    docs = load_table(spark, sf_dir, "documents")
    counts["raw"] = docs.count()

    # 1. exact dedup — kills byte-identical duplication for one shuffle
    kept = exact_dedup(docs)
    counts["exact_dedup"] = kept.count()

    # 2. near-dedup: LSH candidates → exact verify → components →
    #    canonical survivor per cluster (transitivity-correct)
    pairs = near_dedup_pairs(kept, threshold=near_dup_threshold)
    clusters = duplicate_clusters(kept, pairs)
    survivors = kept.join(
        clusters.filter(F.col("is_canonical")).select("doc_id"),
        on="doc_id", how="left_semi")
    counts["near_dedup"] = survivors.count()

    # 3. decontamination vs the held-out benchmark slice
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    overlap = contamination_overlap(survivors, bench)
    clean = survivors.join(
        overlap.filter(F.col("n_hit") <= max_bench_hits).select("doc_id"),
        on="doc_id", how="left_semi")
    counts["decontaminated"] = clean.count()

    # 4. quality gates, the published-filter stack: Gopher repetition
    #    (narrow Arrow pass) → C4 line heuristics (Column exprs) →
    #    heuristic score → unigram-LM perplexity proxy (corpus-trained
    #    on the decontaminated survivors; threshold = bottom-decile
    #    style fixed floor).  All narrow except the unigram model's
    #    one token-keyed count aggregate.
    from fsharp_dataframe_spark.functions.quality import c4_filter
    from fsharp_dataframe_spark.functions.text import unigram_logprob_score

    unrepetitive = repetition_filter(clean)
    c4_ok = c4_filter(unrepetitive, min_terminal_punct_frac=0.0)
    quality = c4_ok.filter(
        F.round(quality_score(F.col("text")), 4) >= min_quality)
    lm = unigram_logprob_score(quality)
    quality = quality.join(
        lm.filter(F.col("mean_logprob") >= -12.0).select("doc_id"),
        on="doc_id", how="left_semi")
    lm2 = bigram_logprob_score(quality)
    quality = quality.join(
        lm2.filter(F.col("mean_logprob") >= -12.0).select("doc_id"),
        on="doc_id", how="left_semi")
    counts["quality"] = quality.count()

    # 5. deterministic split BY DOCUMENT (before chunking, so no
    #    document leaks across train/heldout), then context-window
    #    chunking, then token-budget shards over the CHUNK stream —
    #    the unit a training run actually consumes
    split = hash_split(quality, "doc_id",
                       split_weights or {"train": 0.95, "heldout": 0.05},
                       salt="clean-v1")
    chunks = (chunk_documents(split, max_tokens=256, overlap=16)
              .join(split.select("doc_id", "split"), on="doc_id")
              .withColumn("chunk_uid",
                          F.col("doc_id") * F.lit(1_000_000)
                          + F.col("chunk_id"))
              .withColumn("n_tokens",
                          bpe_ish_token_count(F.col("chunk_text"))))
    counts["chunks"] = chunks.count()

    sharded = chunks.join(
        pack_shards(chunks, shard_tokens, id_col="chunk_uid",
                    text_col="chunk_text").select("chunk_uid", "shard"),
        on="chunk_uid")
    counts["final"] = sharded.count()

    save_parquet(sharded, out_dir, partition_by=["split"],
                 sort_by=["shard", "chunk_uid"])
    return counts


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/clean_corpus_out"
    spark = get_spark(app_name="clean-pipeline-example")
    counts = clean_corpus(spark, sf_dir, out_dir)
    for stage, n in counts.items():
        print(json.dumps({"stage": stage, "rows": n}))


if __name__ == "__main__":
    main()
