"""Column-level data profiling: the one-table audit a pipeline runs
before trusting a new source (null rates, exact cardinalities, numeric
ranges) — the frame-wide sibling of the per-series stats family
(reference src/SeriesModule.fs:183-188 countValues/countKeys,
src/FrameModule.fs:385-404 frame-wide mean/sdv/countValues melt the
same per-column facts; this adds nulls + exact cardinality + range in
one declared plan).

Scale shape: ONE aggregation branch per column, unioned into a single
plan — each branch's parquet scan is pruned to ITS column (ReadSchema
shows one field), so profiling an N-column 100 TB table reads each
column once and nothing twice.  Exact distinct counts deliberately run
per-branch: a single multi-countDistinct aggregate plans an Expand
that duplicates every row once per distinct column — O(rows × cols)
shuffle — while per-branch distincts stay O(rows) each with map-side
partial aggregation.  Pass ``exact_distinct=False`` to swap in
approx_count_distinct (HLL, one pass, ~2% error) when exactness isn't
worth the shuffle at the target scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType


def key_skew_stats(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """The pre-join skew audit: the ``top_n`` heaviest values of a
    prospective join/aggregation key with row counts and corpus share,
    plus the key-space totals every row carries (total_rows, n_keys).
    A key whose top value holds 1% of 100 TB is a 1 TB single-task
    shuffle partition — this is the table you read before deciding on
    salting / AQE skew-join / the max_doc_freq-style cap.

    One count aggregate on the key (map-side combine absorbs the hot
    keys — the skew being measured never concentrates in the shuffle
    measuring it), a 2-scalar total, and a TakeOrdered top-n with a
    deterministic (count desc, key asc) tie-break.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n_rows"))
    totals = counts.agg(F.sum("n_rows").cast("long").alias("total_rows"),
                        F.count("*").alias("n_keys"))
    top = (counts.orderBy(F.col("n_rows").desc(), F.col("key").asc())
           .limit(top_n))
    return (top.crossJoin(F.broadcast(totals))
            .select("key", "n_rows",
                    F.round(F.col("n_rows") / F.col("total_rows"), 6)
                     .alias("share"),
                    "total_rows", "n_keys"))


def profile_columns(df: DataFrame, cols: list[str] | None = None,
                    exact_distinct: bool = True) -> DataFrame:
    """One row per column: (column, n_rows, n_null, n_distinct,
    min_val, max_val) — min/max as doubles for numeric columns, NULL
    otherwise (a uniform schema beats per-type string formatting,
    which no two engines render identically).

    n_distinct counts non-null values (SQL count-distinct semantics).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(cols) if cols is not None else list(fields)
    branches = []
    for c in cols:
        if c not in fields:
            raise ValueError(f"no such column: {c}")
        col = F.col(c)
        nd = (F.countDistinct(col) if exact_distinct
              else F.approx_count_distinct(col))
        if isinstance(fields[c], NumericType):
            mn = F.min(col).cast("double")
            mx = F.max(col).cast("double")
        else:
            mn = F.lit(None).cast("double")
            mx = F.lit(None).cast("double")
        branches.append(
            df.select(col).agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(col.isNull(), 1).otherwise(0))
                 .cast("long").alias("n_null"),
                nd.cast("long").alias("n_distinct"),
                mn.alias("min_val"),
                mx.alias("max_val"),
            ))
    return reduce(DataFrame.unionAll, branches)


def vocab_divergence(df_a: DataFrame, df_b: DataFrame,
                     text_col: str = "text", alpha: float = 1.0) -> DataFrame:
    """Per-token contribution to KL(P‖Q) between two corpora's
    add-alpha unigram distributions over their UNION vocabulary — the
    drift/mixing QA op a training pipeline runs when a new crawl,
    domain slice, or re-weighted mixture arrives: the total is the
    divergence, and the top contributing tokens are the actionable
    diagnosis (which vocabulary makes corpus A unlike corpus B).

    kl_term = p·ln(p/q) with p = (c_a+α)/(N_a+α·V), q analog; terms
    are rounded to millionths so the per-token table (and any sum over
    it) is reproducible across engines — ln() ulp differences sit ~4
    orders below the quantum.  Σ kl_term ≥ 0 up to quantization
    (Gibbs), 0 iff the distributions agree.

    Scale shape: one token-keyed groupBy per corpus, a full-outer join
    of the two count tables (vocabulary-sized, not corpus-sized), and
    a 3-scalar totals fetch — nothing larger than the vocabulary ever
    shuffles twice.  Returns (token, c_a, c_b, kl_term).
    """
    from fsharp_dataframe_spark.functions.text import tokens
    from fsharp_dataframe_spark.functions.util import spread, track_persist

    def counts(src: DataFrame, out: str) -> DataFrame:
        return (spread(src, text_col)
                .select(F.explode(tokens(F.lower(F.col(text_col))))
                        .alias("token"))
                .groupBy("token").agg(F.count("*").alias(out)))

    joined = track_persist(
        counts(df_a, "_ca").join(counts(df_b, "_cb"), on="token",
                                 how="full_outer")
        .select("token",
                F.coalesce("_ca", F.lit(0)).alias("c_a"),
                F.coalesce("_cb", F.lit(0)).alias("c_b")))
    tot = joined.agg(F.sum("c_a"), F.sum("c_b"), F.count("*")).first()
    n_a, n_b, v = int(tot[0] or 0), int(tot[1] or 0), int(tot[2] or 0)
    denom_a = float(n_a + alpha * v)
    denom_b = float(n_b + alpha * v)
    p = (F.col("c_a") + F.lit(float(alpha))) / F.lit(denom_a)
    q = (F.col("c_b") + F.lit(float(alpha))) / F.lit(denom_b)
    return joined.select("token", "c_a", "c_b",
                         F.round(p * F.log(p / q), 6).alias("kl_term"))
