"""Distributed lexical corpus search: term statistics and BM25 top-k.

The retrieval half of a training-data pipeline: score every document
against a bag-of-words query with Okapi BM25 (Robertson & Walker 1994;
the k1/b formulation of Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework: BM25 and Beyond", §3.3) and keep the k best —
corpus audits ("which docs mention X"), quality-targeted subset
selection, and contamination triage all reduce to this.

Scale shape: one explode → token-keyed groupBy for per-(doc, term)
frequencies, an early semi-join against the (tiny, literal) query term
set BEFORE the groupBy so the shuffle carries only matching tokens, a
broadcast of the per-term document frequencies (|query| rows), and a
global TakeOrderedAndProject for the top-k.  No driver-side loops; the
only collected values are two scalar corpus totals.

Determinism: per-(doc, term) BM25 contributions are quantized to
integer millionths BEFORE the per-doc sum (the same fixed-point
discipline as unigram_logprob_score), so scores are
partition-order-invariant and a DuckDB oracle replays the ranking
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fsharp_dataframe_spark.functions.text import tokens
from fsharp_dataframe_spark.functions.util import spread, track_persist


def query_terms(query: str) -> list[str]:
    """Distinct lowercased whitespace tokens of a query string, sorted
    (so literal plans — and oracles built from the same helper — are
    stable)."""
    return sorted({t for t in query.lower().split() if t})


def doc_term_freq(df: DataFrame, terms: list[str] | None = None,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, token, tf, dl): per-document term frequency plus document
    length in tokens.  ``terms`` (when given) filters tokens BEFORE the
    groupBy — the shuffle then carries only query-relevant rows, which
    is what makes a 3-term search over 100 TB cheap.  dl always counts
    ALL tokens (BM25's length normalization needs the true length); it
    is a per-row expression computed alongside the explode, so no
    second pass and no corpus-wide dl join.
    """
    t = tokens(F.lower(F.col(text_col)))
    toks = spread(df, id_col, text_col).select(
        F.col(id_col),
        F.size(t).cast("long").alias("dl"),
        F.explode(t).alias("token"),
    )
    if terms is not None:
        toks = toks.filter(F.col("token").isin(list(terms)))
    return toks.groupBy(id_col, "token").agg(
        F.count("*").alias("tf"), F.min("dl").alias("dl"))


def bm25_topk(df: DataFrame, query: str, k: int = 20,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k documents by BM25 score for a bag-of-words query.

    idf(t)  = ln(1 + (N − df_t + 0.5) / (df_t + 0.5))   [RSJ idf, §3.3]
    s(d, t) = idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    score(d) = Σ_t round(s(d, t)·10⁶) / 10⁶   (fixed-point per-term)

    One token shuffle (pre-filtered to the query terms), a broadcast
    df_t join (|query| rows), and a TakeOrderedAndProject — the plan a
    1000-executor search should have.  avgdl and N are exact integer
    totals fetched once (2 scalars), embedded as literals so the idf /
    normalization doubles are identical constants in every task and in
    the oracle.

    Returns (id, score, n_hit) ordered score desc, id asc — n_hit is
    how many distinct query terms the document contains.
    """
    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no tokens")
    # two consumers (df_t aggregate + the score join) — persist so the
    # corpus is tokenized ONCE, not re-exploded per consumer (the
    # broadcast side builds first and materializes the blocks); released
    # via util.release_cached()/cache_scope() like the dedup sketches
    tfdl = track_persist(doc_term_freq(df, terms, id_col, text_col))

    totals = df.select(
        F.count("*").alias("n"),
        F.sum(F.size(tokens(F.lower(F.col(text_col)))).cast("long")).alias("tok"),
    ).first()
    n_docs, total_tokens = int(totals["n"]), int(totals["tok"] or 0)
    if n_docs == 0:
        return tfdl.select(F.col(id_col), F.lit(0.0).alias("score"),
                           F.lit(0).cast("long").alias("n_hit")).limit(0)

    # tfdl is unique per (doc, term), so document frequency is a plain
    # count — no countDistinct expand
    dfreq = tfdl.groupBy("token").agg(F.count("*").alias("df_t"))
    return _bm25_score(tfdl, dfreq, n_docs, total_tokens, k, id_col, k1, b)


def _bm25_score(tfdl: DataFrame, dfreq: DataFrame, n_docs: int,
                total_tokens: int, k: int, id_col: str,
                k1: float, b: float) -> DataFrame:
    """Shared scoring core: (id, token, tf, dl) postings + (token, df_t)
    stats → top-k.  Both the direct path and the index-backed path end
    here, so their results are bit-identical by construction."""
    avgdl = total_tokens / n_docs  # exact BIGINT/BIGINT -> double
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5))
    scored = tfdl.join(F.broadcast(dfreq), on="token")
    norm = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl") / F.lit(float(avgdl)))
    contrib = idf * F.col("tf") * F.lit(float(k1 + 1.0)) / norm
    units = F.round(contrib * 1_000_000).cast("long")
    per_doc = scored.groupBy(id_col).agg(
        F.sum(units).alias("_units"),
        F.count("*").alias("n_hit"))
    return (per_doc
            .select(F.col(id_col),
                    F.round(F.col("_units") / 1_000_000.0, 4).alias("score"),
                    F.col("n_hit").cast("long"))
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(k))


def bm25_topk_batch(df: DataFrame, queries: dict[str, str], k: int = 20,
                    id_col: str = "doc_id", text_col: str = "text",
                    k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Score MANY queries in ONE corpus pass — the eval-set /
    contamination-triage shape (10k benchmark queries against a
    corpus must not mean 10k scans).  One tokenization filtered to
    the union of all query terms, one broadcast (query_id, token)
    expansion join, one (query_id, doc) aggregate, and a per-query
    window top-k (partitioned by query_id — parallel across queries,
    k-bounded within one).

    Per-(doc, term) scoring is identical to bm25_topk (same integer
    quantization), so each query's rows equal its single-query result.
    Returns (query_id, id, score, n_hit, rank).
    """
    pairs = [(qid, t) for qid, q in queries.items() for t in query_terms(q)]
    if not pairs:
        raise ValueError("no query has any tokens")
    union_terms = sorted({t for _, t in pairs})
    tfdl = track_persist(doc_term_freq(df, union_terms, id_col, text_col))
    totals = df.select(
        F.count("*").alias("n"),
        F.sum(F.size(tokens(F.lower(F.col(text_col)))).cast("long")).alias("tok"),
    ).first()
    n_docs, total_tokens = int(totals["n"]), int(totals["tok"] or 0)
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = total_tokens / n_docs

    dfreq = tfdl.groupBy("token").agg(F.count("*").alias("df_t"))
    spark = df.sparkSession
    qdf = spark.createDataFrame(pairs, "query_id string, token string")
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5))
    norm = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl") / F.lit(float(avgdl)))
    contrib = idf * F.col("tf") * F.lit(float(k1 + 1.0)) / norm
    units = F.round(contrib * 1_000_000).cast("long")
    scored = (tfdl.join(F.broadcast(qdf), on="token")
              .join(F.broadcast(dfreq), on="token")
              .groupBy("query_id", id_col)
              .agg(F.sum(units).alias("_units"),
                   F.count("*").alias("n_hit")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (scored
            .select("query_id", F.col(id_col),
                    F.round(F.col("_units") / 1_000_000.0, 4).alias("score"),
                    F.col("n_hit").cast("long"))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))


def doc_keywords(df: DataFrame, k: int = 5, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Top-k distinctive terms per document by smoothed TF-IDF
    (idf = ln((1+N)/(1+df_t)) + 1, the sklearn-style smooth variant —
    strictly positive, so common-everywhere terms still rank below
    rare ones without sign flips).

    Shape: one corpus tokenization → (doc, term) tf groupBy; document
    frequencies join back on the term key (the df table is
    vocabulary-sized — AQE broadcasts it while small and
    shuffle-joins at web scale, both O(tokens)); per-doc top-k is a
    doc-partitioned window (parallel across docs, k-bounded within
    one).  Scores quantized to integer millionths before ranking —
    deterministic, oracle-replayable.  Returns
    (id, token, tf, score, rank).
    """
    tfdl = track_persist(doc_term_freq(df, None, id_col, text_col))
    n_docs = df.count()
    if n_docs == 0:
        return (tfdl.select(F.col(id_col), F.col("token"), F.col("tf"),
                            F.lit(0.0).alias("score"),
                            F.lit(0).cast("long").alias("rank")).limit(0))
    dfreq = tfdl.groupBy("token").agg(F.count("*").alias("df_t"))
    idf = F.log((F.lit(1.0 + n_docs)) / (F.col("df_t") + 1.0)) + F.lit(1.0)
    units = F.round(F.col("tf") * idf * 1_000_000).cast("long")
    w = Window.partitionBy(id_col).orderBy(
        F.col("_units").desc(), F.col("token").asc())
    return (tfdl.join(dfreq, on="token")
            .withColumn("_units", units)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(F.col(id_col), "token", "tf",
                    F.round(F.col("_units") / 1_000_000.0, 4).alias("score"),
                    "rank"))


def build_term_index(df: DataFrame, path: str, id_col: str = "doc_id",
                     text_col: str = "text",
                     n_range_files: int | None = None) -> None:
    """Persist an inverted index as three parquet relations under
    ``path``: ``postings/`` (id, token, tf, dl — range-partitioned AND
    sorted by token, so every file and row group carries disjoint
    token min/max stats), ``stats/`` (token, df_t), ``meta/`` (one row:
    n_docs, total_tokens).

    This is the pay-once artifact of a corpus search pipeline: the
    token sort turns parquet min/max statistics into a zone map, so a
    query-time ``token IN (...)`` filter skips every file and row
    group whose token range can't contain a query term — the read cost
    of a 3-term search is a handful of row groups, not the index.
    """
    from fsharp_dataframe_spark.functions.util import cache_scope

    spark = df.sparkSession
    # terminal operation (three writes): scope the postings persist so
    # its blocks are released when the build finishes
    with cache_scope():
        tfdl = track_persist(doc_term_freq(df, None, id_col, text_col))
        n_files = n_range_files or spark.sparkContext.defaultParallelism
        (tfdl.repartitionByRange(n_files, "token")
             .sortWithinPartitions("token", id_col)
             .write.mode("overwrite").parquet(f"{path}/postings"))
        (tfdl.groupBy("token").agg(F.count("*").alias("df_t"))
             .repartitionByRange(max(1, n_files // 4), "token")
             .sortWithinPartitions("token")
             .write.mode("overwrite").parquet(f"{path}/stats"))
        meta = df.select(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum(F.size(tokens(F.lower(F.col(text_col))))
                             .cast("long")), F.lit(0)).alias("total_tokens"))
        meta.coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def bm25_topk_indexed(spark, path: str, query: str, k: int = 20,
                      id_col: str = "doc_id",
                      k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 top-k against a persisted term index (build_term_index):
    no tokenization at query time — the postings and stats scans are
    filtered to the query terms, which parquet's token-sorted min/max
    stats prune down to a handful of row groups (the filter shows up
    as PushedFilters in the scan; tests pin it).  Results are
    bit-identical to bm25_topk on the corpus the index was built from
    (same scoring core, same integer totals)."""
    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no tokens")
    m = spark.read.parquet(f"{path}/meta").first()
    n_docs, total_tokens = int(m["n_docs"]), int(m["total_tokens"])
    if n_docs == 0:
        empty = spark.read.parquet(f"{path}/postings").limit(0)
        return empty.select(F.col(id_col), F.lit(0.0).alias("score"),
                            F.lit(0).cast("long").alias("n_hit"))
    tfdl = (spark.read.parquet(f"{path}/postings")
            .filter(F.col("token").isin(terms)))
    dfreq = (spark.read.parquet(f"{path}/stats")
             .filter(F.col("token").isin(terms)))
    return _bm25_score(tfdl, dfreq, n_docs, total_tokens, k, id_col, k1, b)


def phrase_search(df: DataFrame, phrase: str, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Exact phrase match via POSITIONAL postings: documents containing
    the phrase's tokens at consecutive positions, with the occurrence
    count — the positional-index sibling of the bm25 bag-of-words tier
    (same whitespace/lowercase tokenizer, functions/text.tokens, so a
    phrase hit here is always a term hit there).

    Plan shape: posexplode the tokens (narrow), FILTER the postings to
    the phrase's term SET before any shuffle and PERSIST that one
    small relation (the same selectivity-first discipline as
    doc_term_freq — without the persist each phrase slot would re-scan
    and re-tokenize the whole corpus), then chain n-1 equi-joins on
    (doc, position + offset) — each join key includes the position,
    so the fan-out per document is its occurrence count of the rarest
    prefix, not |doc|.  For an n-term phrase the joins are a LINEAR
    chain over the persisted postings.

    Returns (id_col, n_hits) for documents with >= 1 occurrence.
    """
    from fsharp_dataframe_spark.functions.text import tokens
    from fsharp_dataframe_spark.functions.util import spread, track_persist

    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    base = track_persist(
        spread(df, id_col, text_col)
        .select(F.col(id_col).alias("__id"),
                F.posexplode(tokens(F.lower(F.col(text_col))))
                .alias("__p", "__t"))
        .filter(F.col("__t").isin(list(set(terms)))))
    # one filtered postings branch per phrase slot, joined on aligned
    # positions — all branches read the persisted term postings
    out = (base.filter(F.col("__t") == terms[0])
           .select("__id", F.col("__p").alias("__p0")))
    for i, t in enumerate(terms[1:], start=1):
        nxt = (base.filter(F.col("__t") == t)
               .select(F.col("__id"), (F.col("__p") - i).alias("__p0")))
        out = out.join(nxt, ["__id", "__p0"])
    return (out.groupBy("__id").agg(F.count("*").alias("n_hits"))
            .select(F.col("__id").alias(id_col), "n_hits"))


def hybrid_rrf(lex: DataFrame, vec: DataFrame, k: int = 20,
               k_rrf: int = 60, id_col: str = "doc_id",
               lex_score: str = "score",
               vec_score: str = "cosine_sim") -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a vector ranking —
    the standard hybrid-retrieval combiner (Cormack, Clarke &
    Buettcher 2009, "Reciprocal Rank Fusion outperforms Condorcet and
    individual rank learning methods"):

        rrf(d) = Σ_lists 1 / (k_rrf + rank_list(d))

    summed over the lists that retrieved d.  Each term is quantized to
    integer micro-units (round(10^6/(k_rrf+r))) so the fused score is
    an exact BIGINT sum a SQL oracle replays; ranks are dense
    row_numbers over (score DESC, id ASC) — fully deterministic given
    deterministic input scores (both producers here quantize theirs).

    Contract: BOTH inputs must already be bounded top-k relations
    (LIMIT outputs — bm25_topk / brute_force_topk shapes).  The rank
    windows are global row_numbers, which plan a single-partition
    exchange over ≤ list-length rows — k-bounded by construction; the
    corpus itself never reaches this operator, so the expensive halves
    (token shuffle, vector scan) keep their audited distributed
    shapes.

    Returns (id_col, lex_rank, vec_rank, rrf_micro), the k best by
    fused score (ties broken by id).
    """
    wl = Window.orderBy(F.col(lex_score).desc(), F.col(id_col))
    wv = Window.orderBy(F.col(vec_score).desc(), F.col(id_col))
    l = lex.select(F.col(id_col),
                   F.row_number().over(wl).cast("long").alias("lex_rank"))
    v = vec.select(F.col(id_col),
                   F.row_number().over(wv).cast("long").alias("vec_rank"))

    def term(r):
        return F.round(F.lit(1000000.0) / (F.lit(int(k_rrf)) + r)).cast("long")

    fused = (l.join(v, on=id_col, how="full")
             .select(id_col, "lex_rank", "vec_rank",
                     (F.coalesce(term(F.col("lex_rank")), F.lit(0))
                      + F.coalesce(term(F.col("vec_rank")), F.lit(0)))
                     .alias("rrf_micro")))
    return fused.orderBy(F.col("rrf_micro").desc(), F.col(id_col)).limit(int(k))
