"""Pretraining data-mix job — the round-8 tier composed end-to-end
over the documents corpus, each stage a scale-audited engine operator:

    documents parquet
      → token budgeting    (domain weights → exact integer token
                            targets, epochs and capped sample rates —
                            the Gopher/LLaMA mixture table)
      → training mix       (language-temperature boosts → boost×length
                            weighted deterministic sample → token-
                            budget chunking → packed fixed-length
                            training sequences, one pipeline)
      → hybrid retrieval   (BM25 ⊕ cosine RRF: the corpus-audit query
                            "which docs dominate my mix for topic X")
      → hard negatives     (different-label nearest neighbors over the
                            embeddings table — contrastive pairs)

Run:  python examples/pretraining_mix.py [sf_dir]

Prints one JSON line per stage — the shape of a nightly
training-data-refresh job.
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
    from fsharp_dataframe_spark.functions.sampling import (
        token_budget_mix, training_mix,
    )
    from fsharp_dataframe_spark.functions.search import bm25_topk, hybrid_rrf
    from fsharp_dataframe_spark.functions.similarity import (
        brute_force_topk, hard_negatives,
    )

    docs = load_table(spark, sf_dir, "documents")
    out: dict[str, object] = {}

    # 1. the mixture table: how many epochs of each domain
    budget = token_budget_mix(docs, {"src0": 3.0, "src1": 2.0},
                              total_tokens=100_000)
    rows = budget.collect()
    out["token_budget"] = {
        "domains": len(rows),
        "oversampled": sum(1 for r in rows if r["epochs"] > 1.0)}

    # 2. the mix itself: sampled, chunked, packed sequences
    mix = training_mix(docs, 200)
    seqs = mix.agg(F.count("*").alias("spans"),
                   F.countDistinct("seq_id").alias("sequences"),
                   F.countDistinct("doc_id").alias("docs")).first()
    out["training_mix"] = {"spans": seqs["spans"],
                           "sequences": seqs["sequences"],
                           "docs": seqs["docs"]}

    # 3. corpus audit: hybrid lexical+vector retrieval
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    fused = hybrid_rrf(
        bm25_topk(docs, "spark merge vector", k=20),
        brute_force_topk(emb.filter(F.col("vec_id") != 0), qvec, k=20)
        .withColumnRenamed("vec_id", "doc_id"),
        k=10)
    out["hybrid_search"] = {
        "hits": fused.count(),
        "both_lists": fused.filter(F.col("lex_rank").isNotNull()
                                   & F.col("vec_rank").isNotNull()).count()}

    # 4. contrastive pairs: hardest different-label neighbors
    hn = hard_negatives(emb, k=3)
    out["hard_negatives"] = {"pairs": hn.count()}
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="pretraining-mix-example")
    for stage, payload in run(spark, sf_dir).items():
        print(json.dumps({"stage": stage, **payload}))


if __name__ == "__main__":
    main()
