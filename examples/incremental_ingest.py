"""Incremental ingest — the job a training-data pipeline runs per
crawl batch once a cleaned corpus exists:

    new batch (parquet/JSONL)
      → dedup against the EXISTING corpus   (incremental_dedup:
        fingerprint anti-join + directional near-dup join — the
        corpus side is never self-joined, so the cost is bounded by
        the batch, however large the corpus has grown)
      → quality gate                         (same thresholds as the
        initial clean — a batch must not lower the corpus bar)
      → upsert as a new partition            (merge_parquet: a re-run
        or corrected batch REPLACES its own rows — partition-scoped
        dynamic overwrite, earlier batches' files untouched)

Run:  python examples/incremental_ingest.py [sf_dir] [out_dir]

The demo splits the documents table: doc_id % 3 == 0 plays the
existing corpus, the rest arrive as the new batch.  Prints one JSON
line per stage with surviving row counts.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fsharp_dataframe_spark import get_spark
from fsharp_dataframe_spark.functions.dedup import incremental_dedup
from fsharp_dataframe_spark.functions.text import quality_score
from fsharp_dataframe_spark.functions.util import cache_scope
from fsharp_dataframe_spark.sources.parquet import load_table, merge_parquet


def ingest_batch(spark, sf_dir: str, out_dir: str,
                 min_quality: float = 0.5) -> dict[str, int]:
    counts: dict[str, int] = {}
    with cache_scope():
        docs = load_table(spark, sf_dir, "documents")
        existing = docs.filter(F.col("doc_id") % 3 == 0)
        batch = docs.filter(F.col("doc_id") % 3 != 0)
        counts["batch"] = batch.count()

        surv = incremental_dedup(batch, existing, threshold=0.5,
                                 max_doc_freq=10_000)
        counts["deduped"] = surv.count()

        quality = surv.filter(
            F.round(quality_score(F.col("text")), 4) >= min_quality)
        counts["quality"] = quality.count()

        # upsert rather than append: replaying batch-001 (a re-crawl,
        # a fixed extractor) replaces exactly its own partition
        merge_parquet(spark, out_dir,
                      quality.withColumn("ingest_batch", F.lit("batch-001")),
                      id_col="doc_id", partition_by=["ingest_batch"],
                      sort_by=["doc_id"])
    return counts


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/incremental_ingest_out"
    spark = get_spark(app_name="incremental-ingest-example")
    for stage, n in ingest_batch(spark, sf_dir, out_dir).items():
        print(json.dumps({"stage": stage, "rows": n}))


if __name__ == "__main__":
    main()
