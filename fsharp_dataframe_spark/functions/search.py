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

from pyspark.sql import DataFrame, functions as F

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
    avgdl = total_tokens / n_docs  # exact BIGINT/BIGINT -> double

    # tfdl is unique per (doc, term), so document frequency is a plain
    # count — no countDistinct expand
    dfreq = tfdl.groupBy("token").agg(F.count("*").alias("df_t"))
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
