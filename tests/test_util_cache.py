"""Deterministic release of the corpus operators' sketch caches
(functions/util.py: track_persist / release_cached / cache_scope).

ADVICE r4: the MEMORY_AND_DISK persists inside ngram_jaccard_pairs /
minhash_lsh_pairs / jaccard_verify_pairs / simhash_pairs /
cosine_near_dup_pairs were never unpersisted, so a long session
composing them accumulated cached blocks until the ContextCleaner got
around to them.  These tests pin the release contract.
"""

from pyspark import StorageLevel
from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions import util
from fsharp_dataframe_spark.functions.dedup import ngram_jaccard_pairs
from fsharp_dataframe_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_release_cached_unpersists_sketches(spark):
    util.release_cached()  # clean slate
    docs = load_table(spark, SF, "documents").limit(200)
    pairs = ngram_jaccard_pairs(docs, threshold=0.2)
    pairs.count()
    tracked = list(util._TRACKED_PERSISTS)
    assert tracked, "ngram_jaccard_pairs must register its shingle cache"
    assert all(t.storageLevel != StorageLevel.NONE for t in tracked)
    n = util.release_cached()
    assert n == len(tracked)
    assert all(t.storageLevel == StorageLevel.NONE for t in tracked)
    assert util.release_cached() == 0  # idempotent


def test_cache_scope_releases_only_inner(spark):
    util.release_cached()
    docs = load_table(spark, SF, "documents").limit(100)
    outer = util.track_persist(docs.select("doc_id"))
    with util.cache_scope():
        pairs = ngram_jaccard_pairs(docs, threshold=0.2)
        pairs.count()
        assert len(util._TRACKED_PERSISTS) > 1
    # inner sketches released, the pre-existing persist untouched
    assert util._TRACKED_PERSISTS == [outer]
    assert outer.storageLevel != StorageLevel.NONE
    util.release_cached()


def test_spread_npart_memoized(spark):
    # repeated spread() of the same relation must hit the memo instead
    # of re-materializing an RDD conversion plan each call
    docs = load_table(spark, SF, "documents")
    util._NPART_CACHE.clear()
    a = util.spread(docs, "doc_id", "text")
    before = dict(util._NPART_CACHE)
    b = util.spread(docs, "doc_id", "text")
    assert util._NPART_CACHE == before and before, "second call memoized"
    assert a.schema == b.schema
