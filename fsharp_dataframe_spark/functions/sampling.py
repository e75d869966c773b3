"""Deterministic sampling / splitting / sharding for training-data
pipelines.

Everything here is HASH-deterministic, never rand()-based: a 100 TB
pipeline re-runs stages, re-partitions inputs, and retries tasks, so a
row's split/sample fate must be a pure function of the row (Spark's
rand() is seeded per-partition — a repartition reassigns every row).
The hash is the first 8 hex digits of md5, which every engine in the
stack can compute (Spark `conv(substring(md5(x),1,8),16,10)`, DuckDB
`('0x' || substring(md5(x),1,8))::BIGINT`), so the DuckDB oracles
replay splits EXACTLY — and so would a downstream pandas/Polars
consumer checking a sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.column import Column

from fsharp_dataframe_spark.functions.text import bpe_ish_token_count

_SCALE = float(1 << 32)


def hash32(col: Column, salt: str = "") -> Column:
    """Deterministic uniform BIGINT in [0, 2^32) from md5(value||salt) —
    the portable primitive every split/sample here builds on."""
    return F.conv(F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))),
                              1, 8), 16, 10).cast("long")


def hash_unit(col: Column, salt: str = "") -> Column:
    """Deterministic uniform double in [0, 1): hash32 / 2^32.

    32 hash bits give ~2.3e-10 resolution — plenty for split fractions,
    and small enough that the integer fits a BIGINT in every engine.
    """
    return hash32(col, salt) / F.lit(_SCALE)


def split_bounds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(label, exclusive upper hash32 bound) per split, in order.

    Bounds are EXACT integers (floor of the cumulative fraction of
    2^32), so split membership is an integer compare — no accumulated
    float thresholds (0.8 + 0.1 = 0.9000000000000001 would disagree
    with an oracle's literal 0.9 for ~1 hash value in 10^16; integer
    bounds make Spark, SQL oracles, and any other engine agree on
    every row).  The last bound is exactly 2^32.
    """
    total = sum(weights.values())
    items = list(weights.items())
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for name, w in items[:-1]:
        acc += w
        bounds.append((name, int((acc / total) * _SCALE)))
    bounds.append((items[-1][0], 1 << 32))
    return bounds


def hash_split(df: DataFrame, id_col: str,
               weights: dict[str, float] | None = None,
               salt: str = "", split_col: str = "split") -> DataFrame:
    """Assign every row a deterministic split label ("train"/"test"/...)
    with the given weights (need not sum to 1; they are normalized).

    Pure narrow projection — no shuffle, no state, stable under
    re-partitioning and incremental ingest (a new row's label never
    depends on other rows).  Change `salt` to draw a fresh split.
    """
    weights = weights or {"train": 0.9, "test": 0.1}
    h = hash32(F.col(id_col), salt)
    expr = None
    bounds = split_bounds(weights)
    for name, hi in bounds[:-1]:
        cond = h < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = bounds[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def stratified_hash_sample(df: DataFrame, id_col: str,
                           fractions: float | dict[str, float],
                           strata_col: str | None = None,
                           salt: str = "") -> DataFrame:
    """Deterministic (repartition-stable) sample: keep a row iff
    hash_unit(id) < fraction, optionally with a per-stratum fraction
    map (strata_col value -> fraction; absent strata keep nothing).

    Unlike DataFrame.sample / sampleBy, the kept set is a pure function
    of ids — reruns, retries and incremental appends agree on it.
    """
    u = hash_unit(F.col(id_col), salt)
    if isinstance(fractions, dict):
        if strata_col is None:
            raise ValueError("strata_col required with a fractions dict")
        pairs = []
        for k, v in fractions.items():
            pairs.extend([F.lit(k), F.lit(float(v))])
        frac = F.coalesce(
            F.element_at(F.create_map(*pairs), F.col(strata_col).cast("string")),
            F.lit(0.0))
    else:
        frac = F.lit(float(fractions))
    return df.filter(u < frac)


def with_global_weighted_cumsum(df: DataFrame, key_cols: list[str],
                                weight_col: str, n_buckets: int | None = None,
                                cum_col: str = "__gcum") -> tuple[DataFrame, int]:
    """EXCLUSIVE global prefix sum of an integer weight along key order,
    without a global window: quantile range buckets on the leading key,
    one per-bucket sum census (n_buckets rows to the driver), then an
    intra-bucket window cumsum plus the bucket's literal offset — the
    weighted sibling of bucketed.with_global_positions.  Keys must be
    unique (ties would make the prefix order nondeterministic).

    Returns (df + cum_col, grand_total).
    """
    from fsharp_dataframe_spark.operators.bucketed import (
        _bucket_expr, attach_mapping, range_cuts,
    )

    cuts = range_cuts(df, key_cols[0], n_buckets)
    b = _bucket_expr(F.col(key_cols[0]), cuts) if cuts else F.lit(0)
    tmp = df.withColumn("__wb", b)
    per = {r["__wb"]: r["s"] or 0
           for r in tmp.groupBy("__wb")
                       .agg(F.sum(F.col(weight_col).cast("long")).alias("s"))
                       .collect()}
    offsets: dict[int, int] = {}
    run = 0
    for k in sorted(per):
        offsets[k] = run
        run += per[k]
    w = (Window.partitionBy("__wb").orderBy(*[F.col(k) for k in key_cols])
         .rowsBetween(Window.unboundedPreceding, -1))
    out = attach_mapping(tmp, "__wb", offsets, "__boff", "long", default=0)
    out = out.withColumn(
        cum_col,
        (F.col("__boff")
         + F.coalesce(F.sum(F.col(weight_col).cast("long")).over(w), F.lit(0))
         ).cast("long"))
    return out.drop("__wb", "__boff"), run


def pack_shards(df: DataFrame, target_tokens: int,
                id_col: str = "doc_id", text_col: str = "text",
                n_buckets: int | None = None) -> DataFrame:
    """Pack documents (in id order) into contiguous shards of ~target
    tokens: shard = floor(exclusive_prefix_tokens / target).

    This is offset binning, the contiguous-shard discipline a training
    run wants (shard boundaries are reproducible byte offsets into the
    token stream, shards differ from target by at most one document).
    The prefix sum runs on the bucketed substrate — no global window,
    no single-task sort, one tiny census collect — so the plan is the
    same shape at 100 TB.

    Returns (id_col, n_tokens, shard).
    """
    wdf = df.select(F.col(id_col),
                    bpe_ish_token_count(F.col(text_col)).cast("long").alias("n_tokens"))
    out, _total = with_global_weighted_cumsum(wdf, [id_col], "n_tokens", n_buckets)
    return out.select(
        id_col, "n_tokens",
        F.floor(F.col("__gcum") / F.lit(int(target_tokens))).cast("long").alias("shard"))


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str = "doc_id", salt: str = "",
                    priority_col: str = "priority_micro") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    exponential-race form of Efraimidis & Spirakis (2006): row i gets
    priority e_i = -ln(u_i) / w_i (u_i hash-uniform in (0,1)); the k
    SMALLEST priorities win.  This is exactly "draw without
    replacement with probability ∝ weight" (each e_i is an Exp(w_i)
    arrival time), and because u_i comes from `hash_unit`, the chosen
    set is a pure function of (ids, weights, salt): reruns, task
    retries, repartitioning, and incremental appends agree on it —
    quality-weighted or length-weighted corpus subsampling that a
    resumed 100 TB job reproduces bit-for-bit.

    Rows with NULL or non-positive weight never win.  Priorities are
    quantized to integer MICRO-units (round(e·1e6) as BIGINT) with the
    id as tiebreak, so selection and ordering replay exactly in a SQL
    oracle (ln() ulp differences between libm and the JVM are buried
    below the quantum).

    Scale shape: a narrow projection plus ONE global TakeOrdered of k
    rows — no shuffle of the data, no per-group state.
    """
    # +0.5 keeps u strictly inside (0,1): u=0 (1 in 2^32 ids) would
    # make -ln(u) infinite
    u = (hash32(F.col(id_col), salt) + F.lit(0.5)) / F.lit(_SCALE)
    w = F.col(weight_col).cast("double")
    prio = F.round((-F.log(u) / w) * 1e6).cast("long")
    return (df.filter(w.isNotNull() & (w > 0))
            .withColumn(priority_col, prio)
            .orderBy(F.col(priority_col).asc(), F.col(id_col).asc())
            .limit(int(k)))


def pack_sequences(df: DataFrame, seq_len: int,
                   id_col: str = "doc_id", text_col: str = "text",
                   n_buckets: int | None = None) -> DataFrame:
    """Concat-and-split sequence packing: lay every document's tokens
    end-to-end in id order and cut the stream into fixed ``seq_len``
    training sequences — the packing discipline of GPT-style
    pretraining (one sequence = seq_len tokens, documents split across
    sequence boundaries rather than padded).

    Output: one row per (document × overlapped sequence) with
    ``seq_id``, the doc-relative token span [tok_begin, tok_end) that
    lands in the sequence, and ``seq_begin`` — where that span starts
    inside the sequence.  A downstream tokenizer shuffle-reads by
    seq_id and reassembles each sequence from its (few) contributing
    spans; the last sequence may be short.

    Scale shape: the global token offset comes from the bucketed
    exclusive prefix sum (`with_global_weighted_cumsum` — quantile
    buckets + an n_buckets-row census, no global window); the
    per-sequence fan-out is a narrow explode of at most
    ceil(n_tokens/seq_len)+1 rows per document.  Pure integer
    arithmetic end to end — ingest/retry/partition-stable.
    """
    L = int(seq_len)
    wdf = df.select(F.col(id_col),
                    bpe_ish_token_count(F.col(text_col)).cast("long")
                    .alias("n_tokens")).filter(F.col("n_tokens") > 0)
    out, _total = with_global_weighted_cumsum(wdf, [id_col], "n_tokens", n_buckets)
    cum = F.col("__gcum")
    first_seq = F.floor(cum / L)
    last_seq = F.floor((cum + F.col("n_tokens") - 1) / L)
    s = F.col("seq_id")
    return (out.select(
        id_col, "n_tokens", cum.alias("__cum"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"))
        .select(
            id_col, "seq_id",
            F.greatest(s * L - F.col("__cum"), F.lit(0)).cast("long")
            .alias("tok_begin"),
            F.least((s + 1) * L - F.col("__cum"), F.col("n_tokens"))
            .cast("long").alias("tok_end"),
            F.greatest(F.col("__cum") - s * L, F.lit(0)).cast("long")
            .alias("seq_begin")))


def stratified_sample(df: DataFrame, group_col: str, k: int,
                      id_col: str = "doc_id") -> DataFrame:
    """Exactly min(k, group size) rows per group, deterministically:
    rank by md5(group|id) — a uniform, ingest/partition/retry-stable
    order (the same determinism contract as hash_split; md5 so a SQL
    oracle replays it byte-identically) — and keep the k smallest.

    Balanced eval-set / per-language quota construction.  One shuffle
    on the group key; the per-group rank is a window sort, which Spark
    spills for giant groups — at extreme group sizes (10^10-row
    languages) pre-thin first with hash_split to a few × k per group,
    then rank exactly (the hash order makes the two-phase result
    identical to the one-phase one).

    Returns the input columns plus ``rk`` (1-based rank within the
    group).
    """
    from pyspark.sql import Window

    h = F.md5(F.concat_ws("|", F.col(group_col), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def language_mix_weights(df: DataFrame, lang_col: str = "lang",
                         alpha: float = 0.5) -> DataFrame:
    """Temperature-based multilingual sampling weights (the
    alpha-sampling of multilingual pretraining: q_l ∝ p_l^alpha with
    p_l the corpus share of language l — Conneau & Lample 2019,
    arXiv:1901.07291 §3.1; mC4/mT5 use the same scheme).  Lower alpha
    flattens the mix toward low-resource languages; ``boost`` =
    q_l / p_l is the per-document up/down-sampling factor a sampler
    applies.

    One groupBy on the language key plus a single-row total joined
    back (Catalyst broadcasts it); the language table is tiny by
    nature, so every arithmetic step after the count is effectively
    driver-scale while staying in the plan.

    Determinism: because q only needs p^alpha UP TO NORMALIZATION,
    N^alpha cancels and q_l = n_l^alpha / Σ n_m^alpha — so the
    normalizer is accumulated in FIXED-POINT integer units
    (round(n^alpha · 10^6)), never as a raw double sum whose value
    depends on partition/combine order (the _isum hazard).  alpha=0.5
    computes n^alpha via sqrt (IEEE-exact in every engine, so the SQL
    oracle matches bit-for-bit); other alphas use pow (correct to
    ~1 ulp — cross-engine oracle comparisons should stick to 0.5).

    Returns (lang, n_docs, p, q, boost) with p/q/boost rounded 4dp.
    """
    counts = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count("*").alias("n_docs"))
    nw = (F.sqrt(F.col("n_docs")) if alpha == 0.5
          else F.pow(F.col("n_docs"), F.lit(alpha)))
    scored = counts.withColumn("_s", F.round(nw * 1e6).cast("long"))
    totals = scored.agg(F.sum("n_docs").alias("_tot"),
                        F.sum("_s").alias("_den"))
    p = F.col("n_docs") / F.col("_tot")
    q = F.col("_s") / F.col("_den")
    return (
        scored.crossJoin(F.broadcast(totals))
        .select("lang", "n_docs",
                F.round(p, 4).alias("p"),
                F.round(q, 4).alias("q"),
                F.round(q / p, 4).alias("boost"))
    )


def chunk_documents(df: DataFrame, max_tokens: int = 64, overlap: int = 8,
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Split documents into token-budget chunks with overlap — the
    standard pre-tokenization slicing for LLM context windows (RAG
    passage windows, long-doc training examples).  stride = max_tokens -
    overlap; successive chunks share `overlap` tokens; the final partial
    chunk is kept; an empty document yields one empty chunk.

    n_chunks = max(ceil((n_tokens - overlap) / stride), 1) — pure
    integer arithmetic so the SQL oracle replays the count exactly.

    Pure narrow per-row Column work (whitespace tokens → explode of an
    index sequence → slice → join): no shuffle, no UDF, runs at scan
    speed and preserves the input partitioning, so chunk output feeds
    pack_shards / the parquet sink without a repartition.  Fan-out is
    bounded: output rows ≈ total_tokens / stride, each chunk row
    materializing only its own slice (Tungsten copies the slice, it
    does not duplicate the parent array per row).

    Returns (id_col, chunk_id, n_tokens, chunk_text).
    """
    if overlap >= max_tokens:
        raise ValueError(f"overlap ({overlap}) must be < max_tokens ({max_tokens})")
    stride = max_tokens - overlap
    from fsharp_dataframe_spark.functions.text import tokens
    t = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    n = F.size("_t")
    n_chunks = F.greatest(
        F.floor((n - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride)),
        F.lit(1)).cast("int")
    exploded = t.select(
        id_col, "_t",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"))
    piece = F.slice(F.col("_t"), F.col("chunk_id") * stride + 1, max_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"))


def training_mix(df: DataFrame, k: int, *, alpha: float = 0.5,
                 max_tokens: int = 32, overlap: int = 4,
                 seq_len: int = 64, salt: str = "mix-v1",
                 lang_col: str = "lang", id_col: str = "doc_id",
                 text_col: str = "text", uid_factor: int = 1000,
                 n_buckets: int | None = None) -> DataFrame:
    """End-to-end training-mix pipeline — the nightly pretraining-data
    job shape, composed from this module's audited stages:

    1. `language_mix_weights` (alpha-sampling, Conneau & Lample 2019):
       per-language boost = q_l / p_l from the corpus language shares;
    2. `weighted_sample` (Efraimidis-Spirakis exponential race):
       ``k`` documents drawn without replacement with probability
       ∝ token_count × boost — length-weighted so sampling is
       per-TOKEN not per-document, temperature-flattened so
       low-resource languages are up-sampled;
    3. `chunk_documents`: token-budget context windows with overlap;
    4. `pack_sequences` (GPT-style concat-and-split): the chunks laid
       end-to-end in (doc, chunk) order and cut into fixed ``seq_len``
       training sequences via the bucketed global prefix sum.

    Scale shape, stage by stage: the language table is vocabulary-
    sized (broadcast); the sample is a narrow projection + ONE global
    TakeOrdered of k rows; chunking is narrow per-row Column work; the
    pack offset is the quantile-bucketed exclusive cumsum (no global
    window).  No stage shuffles the corpus on an unbounded key, so the
    plan survives a 100x scale-up unchanged — this is the composition
    a real pipeline runs, not a demo join of the pieces.

    Determinism: every stage is hash/fixed-point deterministic (see
    the stage docstrings), so the full pipeline — selection set,
    chunk boundaries, sequence spans — is a pure function of
    (corpus, salt) and a SQL oracle replays it row for row.

    Chunks are keyed for packing by ``chunk_uid = doc_id * uid_factor
    + chunk_id``; ``uid_factor`` must exceed the per-document chunk
    count (ceil(longest_doc_tokens / (max_tokens - overlap))) and ids
    must be non-negative — both enforced IN-PLAN by an `assert_true`
    guard on the chunk relation (lazy, no driver-side pre-scan; a
    violating row fails the job loudly instead of mis-keying a
    sequence).

    Returns (doc_id, chunk_id, lang, seq_id, tok_begin, tok_end,
    seq_begin): for each training sequence, the chunk spans that land
    in it — the relation a tokenizer shuffle-reads by seq_id.
    """
    mix = language_mix_weights(df, lang_col, alpha)
    wdf = (df.select(F.col(id_col), F.col(lang_col).alias("lang"),
                     F.col(text_col).alias("__text"),
                     bpe_ish_token_count(F.col(text_col)).cast("long")
                     .alias("n_tokens"))
           .join(F.broadcast(mix.select("lang", "boost")), on="lang"))
    wdf = wdf.withColumn("__w", F.col("n_tokens") * F.col("boost"))
    sampled = weighted_sample(wdf, k, "__w", id_col=id_col, salt=salt)
    from fsharp_dataframe_spark.functions.util import track_persist

    # stage boundary: the k-row sample feeds chunking AND the lang
    # re-attach below — k rows, persist instead of re-running the race
    sampled = track_persist(
        sampled.select(id_col, "lang", F.col("__text").alias(text_col)))
    chunks = chunk_documents(sampled.select(id_col, text_col),
                             max_tokens=max_tokens, overlap=overlap,
                             id_col=id_col, text_col=text_col)
    # uid-packing contract, enforced lazily in-plan: assert_true is
    # NULL when the guard holds (the coalesce adds exactly 0), and
    # fails the job with a row-specific message when it does not —
    # a sequence is never silently mis-keyed
    ok = F.assert_true(
        (F.col(id_col) >= 0) & (F.col("chunk_id") < uid_factor),
        F.concat(
            F.lit(f"training_mix chunk_uid packing needs 0 <= {id_col} "
                  f"and chunk_id < uid_factor={uid_factor}; got "
                  f"{id_col}="),
            F.col(id_col).cast("string"),
            F.lit(" chunk_id="), F.col("chunk_id").cast("string")))
    chunks = chunks.select(
        (F.col(id_col) * uid_factor + F.col("chunk_id")
         + F.coalesce(ok.cast("long"), F.lit(0))).alias("chunk_uid"),
        "chunk_text")
    packed = pack_sequences(chunks, seq_len, id_col="chunk_uid",
                            text_col="chunk_text", n_buckets=n_buckets)
    out = packed.select(
        F.expr(f"chunk_uid div {uid_factor}").alias(id_col),
        (F.col("chunk_uid") % uid_factor).alias("chunk_id"),
        "seq_id", "tok_begin", "tok_end", "seq_begin")
    return out.join(F.broadcast(sampled.select(id_col, "lang")), on=id_col)


def token_budget_mix(df: DataFrame, budgets: dict[str, float],
                     total_tokens: int, domain_col: str = "source",
                     text_col: str = "text",
                     default_weight: float = 1.0) -> DataFrame:
    """Per-domain token budgeting — the epochs / sampling-rate table a
    pretraining run derives from its target data mixture (the
    domain-weighting discipline of Gopher / LLaMA-style training:
    domain weights → token targets → epochs over each domain's
    available pool; Rae et al. 2021 §A3.1, Touvron et al. 2023 tab 1
    describe exactly this table).

    ``budgets`` maps domain → relative weight (domains absent from the
    dict get ``default_weight``); weights renormalize over the domains
    PRESENT in the corpus.  Exactness discipline: available tokens are
    exact BIGINT sums of bpe-ish token counts; weights quantize to
    integer micro-units; each domain's token target is the exact
    integer ``(total_tokens * w_micro) div Σ w_micro``; only the final
    epochs/sample-rate ratios are doubles (one division of identical
    ints, rounded 4dp) — so a SQL oracle replays the whole table.

    ``epochs`` > 1 means the domain must repeat to meet its target;
    ``sample_rate`` = min(epochs, 1) is the keep-fraction a
    single-pass sampler applies.  One groupBy on the domain key plus a
    broadcast one-row normalizer — the domain table is tiny by nature.

    Returns (domain, n_docs, avail_tokens, target_tokens, epochs,
    sample_rate).
    """
    wmic_map = {k: int(round(float(v) * 1e6)) for k, v in budgets.items()}
    default_mic = int(round(float(default_weight) * 1e6))
    avail = (df.groupBy(F.col(domain_col).alias("domain"))
             .agg(F.count("*").alias("n_docs"),
                  F.sum(bpe_ish_token_count(F.col(text_col)).cast("long"))
                  .alias("avail_tokens")))
    if wmic_map:
        pairs = []
        for k, v in wmic_map.items():
            pairs.extend([F.lit(k), F.lit(v)])
        wmic = F.coalesce(
            F.element_at(F.create_map(*pairs), F.col("domain")),
            F.lit(default_mic))
    else:
        wmic = F.lit(default_mic)
    scored = avail.withColumn("__wmic", wmic.cast("long"))
    totals = scored.agg(F.sum("__wmic").alias("__den"))
    target = F.expr(f"({int(total_tokens)} * __wmic) div __den")
    ratio = target / F.col("avail_tokens")
    return (scored.crossJoin(F.broadcast(totals))
            .select("domain", "n_docs", "avail_tokens",
                    target.cast("long").alias("target_tokens"),
                    F.round(ratio, 4).alias("epochs"),
                    F.round(F.least(ratio, F.lit(1.0)), 4)
                    .alias("sample_rate")))


def packing_efficiency(df: DataFrame, seq_lens: list[int],
                       text_col: str = "text") -> DataFrame:
    """Sequence-length planning table: for each candidate training
    ``seq_len``, how many document-respecting sequences the corpus
    packs into (each document padded to its own sequence boundary —
    the no-cross-document packing discipline) and what fraction of
    those tokens is padding waste.  The planner every pretraining run
    consults before choosing a context length / packing strategy
    (pack_sequences above is the cross-document alternative with zero
    padding).

    Exactness: per-document token counts are integers, sequences per
    document is the exact integer ceil (tok + L - 1) div L, and the
    whole table comes from ONE scan — per-L conditional sums in a
    single aggregate (map-side combine), fanned out over the
    L-bounded literal list.

    Returns one row per seq_len: (seq_len, n_docs, total_tokens,
    n_seqs, padded_tokens, waste_pct), waste rounded 6dp.
    """
    from fsharp_dataframe_spark.functions.text import bpe_ish_token_count

    Ls = [int(x) for x in seq_lens]
    # validate up front (ADVICE r9): L = 0 reaches the interpolated
    # `(t + -1) div 0` and dies with an opaque ANSI divide-by-zero at
    # runtime; L < 0 silently computes wrong negative ceils.
    if not Ls:
        raise ValueError("seq_lens must be non-empty")
    bad = [L for L in Ls if L <= 0]
    if bad:
        raise ValueError(f"seq_lens must be positive ints, got {bad}")
    t = df.select(bpe_ish_token_count(F.col(text_col)).cast("long")
                  .alias("t"))
    row = t.agg(
        F.count("*").alias("n_docs"),
        F.sum("t").alias("total_tokens"),
        *[F.sum(F.expr(f"(t + {L} - 1) div {L}")).alias(f"__ns_{L}")
          for L in Ls])
    fan = F.explode(F.array(*[
        F.struct(F.lit(L).cast("long").alias("seq_len"),
                 F.col(f"__ns_{L}").alias("n_seqs")) for L in Ls]))
    out = row.select("n_docs", "total_tokens", fan.alias("s"))
    padded = F.col("s.n_seqs") * F.col("s.seq_len")
    # an all-empty corpus packs zero sequences: ANSI division would
    # throw, so the waste of nothing is NULL
    waste = F.when(padded > 0,
                   (padded - F.col("total_tokens")).cast("double")
                   / padded.cast("double"))
    return out.select(
        F.col("s.seq_len").alias("seq_len"), "n_docs", "total_tokens",
        F.col("s.n_seqs").alias("n_seqs"), padded.alias("padded_tokens"),
        F.round(waste, 6).alias("waste_pct"))
