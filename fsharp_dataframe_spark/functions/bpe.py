"""Tokenizer-training primitives: distributed BPE (byte-pair encoding,
Sennrich et al. 2016, arXiv:1508.07909) over a corpus.

BPE training is an iterative reduction — count adjacent symbol pairs,
merge the most frequent, repeat — with the same distributed shape as
Lloyd iterations (functions/similarity.kmeans_fit): per merge ONE
pair-count job over the (distinct-word, count) table, a 1-row argmax
fetch, and a narrow Arrow-batched merge application.  The corpus-sized
work happens once (the word-count shuffle); every iteration after that
runs on the distinct-word table, which is zipf-bounded (vocabulary
size, not corpus size) — the property that makes tokenizer training on
a 100 TB corpus feasible at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from fsharp_dataframe_spark.functions.text import tokens


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) distinct lowercased whitespace words with corpus
    frequency — ONE token-keyed shuffle with map-side combine; every
    BPE iteration afterwards runs on this vocabulary-sized table."""
    from fsharp_dataframe_spark.functions.util import spread

    return (spread(df, text_col)
            .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
            .groupBy("word").agg(F.count("*").alias("n")))


def char_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Merge-0 pair statistics straight off the corpus: adjacent
    CHARACTER pairs (2-char substrings) of every word, weighted by
    word frequency — the first BPE iteration's count table, and the
    engine-exact form (substring arithmetic, so a SQL oracle replays
    it byte-for-byte).  Returns (pair, n_pairs)."""
    w = word_counts(df, text_col)
    idx = F.sequence(F.lit(1), F.length("word") - 1)
    pair = F.explode(F.transform(idx, lambda i: F.substring("word", i, 2)))
    return (w.filter(F.length("word") >= 2)
            .select(pair.alias("pair"), F.col("n"))
            .groupBy("pair").agg(F.sum("n").cast("long").alias("n_pairs")))


def symbol_pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, n_pairs) over a (word, n, sym: array<string>) table —
    the per-iteration count job of the trainer."""
    m = F.size("sym") - 1
    pairs = F.explode(F.transform(
        F.sequence(F.lit(1), F.greatest(m, F.lit(0))),
        lambda i: F.struct(F.element_at("sym", i).alias("a"),
                           F.element_at("sym", i + 1).alias("b"))))
    return (words.filter(F.size("sym") >= 2)
            .select(pairs.alias("p"), "n")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").cast("long").alias("n_pairs")))


def _merge_symbols(sym: list, a: str, b: str) -> list:
    """Greedy left-to-right merge of non-overlapping (a, b) — the
    classic BPE apply step."""
    out, i, n = [], 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def apply_merge(words: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one merge to every symbol array — a narrow Arrow-batched
    pass (the scan-and-merge is inherently sequential WITHIN a word;
    words are independent, so the corpus-wide pass is embarrassingly
    parallel)."""
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def merge_udf(col):
        return col.map(lambda s: _merge_symbols(list(s), a, b))

    return words.withColumn("sym", merge_udf("sym"))


def bpe_train(df: DataFrame, n_merges: int,
              text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Deterministic:
    ties in pair frequency break on (a, b) lexicographic order, so two
    runs (or two engines) learn the identical merge sequence.

    Per iteration: ONE vocabulary-sized count job + a 1-row argmax +
    a lazy merge application; the symbol table is re-persisted and the
    previous round released every iteration (graph.py's contraction
    discipline) so lineage stays flat for large n_merges.
    """
    from fsharp_dataframe_spark.functions.util import track_persist

    from fsharp_dataframe_spark.functions.util import cache_scope

    # terminal operation (returns a plain list): scope every round's
    # persist so nothing stays cached after training, and release each
    # superseded round eagerly — n_merges can be 10k+, so leaking one
    # vocabulary-table copy per merge is a real storage-pressure bug
    with cache_scope():
        words = track_persist(
            word_counts(df, text_col)
            .withColumn("sym", F.split("word", "").cast("array<string>")))
        merges: list[tuple[str, str]] = []
        for _ in range(int(n_merges)):
            best = (symbol_pair_counts(words)
                    .orderBy(F.col("n_pairs").desc(), F.col("a").asc(),
                             F.col("b").asc())
                    .limit(1).collect())
            if not best:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))
            prev = words
            words = track_persist(apply_merge(words, a, b))
            words.count()  # materialize this round, keep lineage flat
            prev.unpersist()
    return merges


def bpe_encode_count(df: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text") -> DataFrame:
    """Token counts per document under a learned merge list — the
    budget-estimation pass a sharding/packing step wants.  One narrow
    Arrow-batched pass; merges apply per word via a driver-broadcast
    list (a real tokenizer ships its merges file the same way)."""
    rank = {m: i for i, m in enumerate(merges)}

    def encode(word: str) -> int:
        sym = list(word)
        while len(sym) >= 2:
            best_i, best_r = -1, None
            for i in range(len(sym) - 1):
                r = rank.get((sym[i], sym[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            sym = (sym[:best_i] + [sym[best_i] + sym[best_i + 1]]
                   + sym[best_i + 2:])
        return len(sym)

    @F.pandas_udf(T.LongType())
    def count_udf(texts):
        def doc_tokens(t):
            if t is None:
                return 0
            return sum(encode(w) for w in t.lower().split() if w)
        return texts.map(doc_tokens)

    return df.withColumn("n_bpe_tokens", count_udf(F.col(text_col)))
