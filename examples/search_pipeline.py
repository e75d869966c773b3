"""Corpus search — index once, query many times:

    documents (parquet)
      → build_term_index          (postings/ stats/ meta/: postings
        range-partitioned AND sorted by token, so parquet min/max
        stats act as a zone map over terms)
      → bm25_topk_indexed         (per query: a token-pruned scan of
        a few row groups + broadcast stats join + TakeOrdered top-k —
        read cost is O(query), not O(index))

Run:  python examples/search_pipeline.py [sf_dir] [index_dir] [query...]

Prints one JSON line per query with the top hits, and cross-checks
the first query against the direct (tokenize-at-query-time) path —
the two are bit-identical by construction.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fsharp_dataframe_spark import get_spark
from fsharp_dataframe_spark.functions.search import (
    bm25_topk, bm25_topk_indexed, build_term_index,
)
from fsharp_dataframe_spark.sources.parquet import load_table


def search_corpus(spark, sf_dir: str, idx: str,
                  queries: list[str], k: int = 5) -> list[dict]:
    """Build the index and answer each query; the first query is
    cross-checked against the direct path (bit-identity)."""
    docs = load_table(spark, sf_dir, "documents")
    build_term_index(docs, idx)
    results = []
    for i, q in enumerate(queries):
        hits = bm25_topk_indexed(spark, idx, q, k=k).collect()
        if i == 0:
            direct = bm25_topk(docs, q, k=k).collect()
            assert [tuple(r) for r in direct] == [tuple(r) for r in hits], \
                "indexed path diverged from the direct path"
        results.append({"query": q, "hits": [
            {"doc_id": r["doc_id"], "score": r["score"], "n_hit": r["n_hit"]}
            for r in hits]})
    return results


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    idx = sys.argv[2] if len(sys.argv) > 2 else "/tmp/term_index_demo"
    queries = sys.argv[3:] or ["spark merge vector", "window hash join"]

    spark = get_spark(app_name="search-pipeline", master="local[8]",
                      shuffle_partitions=8)
    for line in search_corpus(spark, sf_dir, idx, queries):
        print(json.dumps(line))


if __name__ == "__main__":
    main()
