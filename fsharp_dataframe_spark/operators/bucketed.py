"""Scale path for UN-KEYED (global) ordered-series ops.

A series with no ``by=`` entity partition needs a total key order;
Spark's naive plan is a single-partition window — the one shape that
cannot survive a 100× scale-up.  This module replaces it with:

1. **range buckets** from sampled quantiles (`approxQuantile`, the
   mechanism behind repartitionByRange): bucket id is a pure function
   of the key, so equal keys share a bucket and no global sort exists;
2. a **driver-side bucket census** (one cheap count-by-bucket job,
   n_buckets rows): buckets are greedily merged until each holds at
   least ``min_rows`` rows, and the running-total start offset of each
   bucket becomes a PLAIN LITERAL in the final plan;
3. per-bucket `row_number` + literal offset = exact global position —
   hash-partitioned, no single-partition exchange anywhere;
4. for lag/lead ops, a **halo**: the last/first ``halo`` rows of every
   bucket are replicated into the neighbouring bucket as ghost rows
   (possible because step 2 guarantees bucket size ≥ halo), windows run
   inside buckets only, ghosts are dropped after.

Cost: one quantile scan + one census aggregate up front, then a single
hash shuffle on bucket id — versus the plain path's total-order sort
into one task.  Correctness is pinned by equivalence tests against the
plain path (tests/test_bucketed.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_B = "__gbucket"
_GHOST = "__ghost"


def _bucket_expr(key_col: Column, cuts: list[float]) -> Column:
    kd = key_col.cast("double")
    barr = F.array(*[F.lit(c) for c in cuts])
    return F.size(F.filter(barr, lambda b: b <= kd))


def range_cuts(df: DataFrame, key_col: str, n_buckets: int = 64) -> list[float]:
    """Quantile cut points for range bucketing (one sketch job).  The
    bucket id from `_bucket_expr` is a pure function of the key, so no
    census is needed when the consumer tolerates sparse/unbalanced raw
    bucket ids (e.g. the chunk_dist carry cascade, which iterates
    whatever ids exist)."""
    kd = F.col(key_col).cast("double")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.select(kd.alias("_kd")).approxQuantile("_kd", probs, 0.001)
    return sorted({c for c in cuts if c is not None and c == c})


def bucket_census(
    df: DataFrame,
    key_cols: list[str],
    n_buckets: int = 64,
    min_rows: int = 1,
) -> tuple[Column, dict[int, int], dict[int, int], int]:
    """Compute (bucket_expr, remap, offsets, total).

    bucket_expr assigns a RAW bucket; ``remap[raw] -> merged`` merges
    adjacent raw buckets (greedy, left-to-right) until each merged
    bucket holds >= min_rows rows; ``offsets[merged]`` is the global
    position of the merged bucket's first row.  Two small jobs
    (quantile sketch + census aggregate); everything else is literal.
    """
    k = key_cols[0]
    kd = F.col(k).cast("double")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.select(kd.alias("_kd")).approxQuantile("_kd", probs, 0.001)
    cuts = sorted({c for c in cuts if c is not None and c == c})
    if cuts:
        bexpr = _bucket_expr(F.col(k), cuts)
    else:
        bexpr = F.lit(0)
    counts = {
        r["b"]: r["n"]
        for r in df.select(bexpr.alias("b")).groupBy("b").agg(F.count("*").alias("n")).collect()
    }
    # greedy merge so every merged bucket has >= min_rows (the halo
    # guarantee); the trailing remainder merges into the last group
    remap: dict[int, int] = {}
    merged_counts: list[int] = []
    acc = 0
    for raw in sorted(counts):
        remap[raw] = len(merged_counts)
        acc += counts[raw]
        if acc >= min_rows:
            merged_counts.append(acc)
            acc = 0
    if acc > 0:  # tail short of min_rows → fold into previous group
        if merged_counts:
            merged_counts[-1] += acc
            last = len(merged_counts) - 1
            for raw, m in remap.items():
                if m > last:
                    remap[raw] = last
        else:
            merged_counts.append(acc)
    offsets: dict[int, int] = {}
    run = 0
    for m, n in enumerate(merged_counts):
        offsets[m] = run
        run += n
    if not offsets:  # empty input
        offsets = {0: 0}
    return bexpr, remap, offsets, run


def _remap_expr(raw: Column, remap: dict[int, int]) -> Column:
    if not remap or all(k == v for k, v in remap.items()):
        return raw
    pairs = []
    for k, v in remap.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.coalesce(F.element_at(F.create_map(*pairs), raw + F.lit(0)), raw)


def _offset_expr(bucket: Column, offsets: dict[int, int]) -> Column:
    pairs = []
    for k, v in offsets.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.coalesce(F.element_at(F.create_map(*pairs), bucket + F.lit(0)), F.lit(0))


def with_global_positions(
    df: DataFrame,
    key_cols: list[str],
    n_buckets: int = 64,
    pos_col: str = "__gpos",
) -> tuple[DataFrame, int]:
    """Exact 0-based global position along key order WITHOUT a global
    window: per-bucket row_number + literal census offset.  Returns
    (df_with_pos, total_rows) — the census knows the total for free."""
    bexpr, remap, offsets, total = bucket_census(df, key_cols, n_buckets, min_rows=1)
    b = _remap_expr(bexpr, remap)
    out = df.withColumn(_B, b)
    w = Window.partitionBy(_B).orderBy(*[F.col(k) for k in key_cols])
    out = out.withColumn(
        pos_col,
        (_offset_expr(F.col(_B), offsets) + F.row_number().over(w) - 1).cast("long"),
    )
    return out.drop(_B), total


def haloed_lag_frame(
    df: DataFrame,
    key_cols: list[str],
    halo_back: int = 0,
    halo_fwd: int = 0,
    n_buckets: int = 64,
) -> tuple[DataFrame, Window, Column]:
    """Bucketed substrate for lag/lead ops of bounded reach.

    Returns (augmented_df, window_spec, keep_cond): augmented_df holds
    every original row plus ghost replicas of each bucket's boundary
    rows in the neighbouring bucket (halo_back trailing rows copied
    forward, halo_fwd leading rows copied backward); window_spec
    partitions by bucket and orders by key; keep_cond selects the
    original (non-ghost) rows.  Census merging guarantees every bucket
    holds >= max(halo_back, halo_fwd) rows, so one-hop replication is
    complete.
    """
    need = max(halo_back, halo_fwd, 1)
    bexpr, remap, offsets, total = bucket_census(df, key_cols, n_buckets, min_rows=need)
    n_merged = len(offsets)
    b = _remap_expr(bexpr, remap)
    base = df.withColumn(_B, b)
    parts = [base.withColumn(_GHOST, F.lit(False))]
    order = [F.col(k) for k in key_cols]
    if halo_back and n_merged > 1:
        w_desc = Window.partitionBy(_B).orderBy(*[c.desc() for c in order])
        tail = (
            base.withColumn("__rn", F.row_number().over(w_desc))
            .filter((F.col("__rn") <= halo_back) & (F.col(_B) < n_merged - 1))
            .drop("__rn")
            .withColumn(_B, F.col(_B) + 1)
            .withColumn(_GHOST, F.lit(True))
        )
        parts.append(tail)
    if halo_fwd and n_merged > 1:
        w_asc = Window.partitionBy(_B).orderBy(*order)
        head = (
            base.withColumn("__rn", F.row_number().over(w_asc))
            .filter((F.col("__rn") <= halo_fwd) & (F.col(_B) > 0))
            .drop("__rn")
            .withColumn(_B, F.col(_B) - 1)
            .withColumn(_GHOST, F.lit(True))
        )
        parts.append(head)
    aug = parts[0]
    for p in parts[1:]:
        aug = aug.unionByName(p)
    w = Window.partitionBy(_B).orderBy(*order)
    return aug, w, ~F.col(_GHOST)


def bucketed_directional_fill(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | str,
    direction: str = "forward",
    n_buckets: int = 64,
) -> DataFrame:
    """Global forward/backward fill WITHOUT a single-partition window.

    The fill's reach is unbounded (a value can carry across the whole
    series), so halos don't apply — but the cross-bucket state is one
    value per filled column per bucket: fill inside each range bucket,
    take each bucket's last (first) non-null ORIGINAL value per column,
    cascade those over the tiny bucket spine (n_buckets rows — the same
    broadcast carry the bucketed as-of uses), and patch rows the
    in-bucket fill left NULL.  The carry spine is every bucket that HAS
    rows, so a bucket whose values are all missing still receives the
    carry from its predecessors (sparse-bucket completeness, pinned by
    tests).  All columns share one window pass and one carry join.
    """
    if isinstance(value_cols, str):
        value_cols = [value_cols]
    order = [F.col(c) for c in key_cols]
    cuts = range_cuts(df, key_cols[0], n_buckets)
    b = _bucket_expr(F.col(key_cols[0]), cuts) if cuts else F.lit(0)
    base = df.withColumn(_B, b)
    if direction == "forward":
        w_in = Window.partitionBy(_B).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, 0)
        fill_in = {c: F.last(F.col(c), ignorenulls=True).over(w_in)
                   for c in value_cols}
        edges = [F.max_by(F.col(c),
                          F.when(F.col(c).isNotNull(), F.struct(*order)))
                 .alias(f"__edge_{c}") for c in value_cols]
        cascade_w = Window.orderBy(F.col(_B)).rowsBetween(
            Window.unboundedPreceding, -1)
        carry_picks = [F.last(F.col(f"__edge_{c}"), ignorenulls=True)
                       .over(cascade_w).alias(f"__carry_{c}") for c in value_cols]
    elif direction == "backward":
        w_in = Window.partitionBy(_B).orderBy(*order).rowsBetween(
            0, Window.unboundedFollowing)
        fill_in = {c: F.first(F.col(c), ignorenulls=True).over(w_in)
                   for c in value_cols}
        edges = [F.min_by(F.col(c),
                          F.when(F.col(c).isNotNull(), F.struct(*order)))
                 .alias(f"__edge_{c}") for c in value_cols]
        cascade_w = Window.orderBy(F.col(_B)).rowsBetween(
            1, Window.unboundedFollowing)
        carry_picks = [F.first(F.col(f"__edge_{c}"), ignorenulls=True)
                       .over(cascade_w).alias(f"__carry_{c}") for c in value_cols]
    else:
        raise ValueError(direction)
    filled = base.withColumns(fill_in)
    spine = base.select(_B).distinct()
    per_bucket = base.groupBy(_B).agg(*edges)
    carry = spine.join(per_bucket, _B, "left").select(F.col(_B), *carry_picks)
    out = (
        filled.join(F.broadcast(carry), on=_B, how="left")
        .withColumns({c: F.coalesce(F.col(c), F.col(f"__carry_{c}"))
                      for c in value_cols})
        .drop(_B, *[f"__carry_{c}" for c in value_cols])
    )
    return out


def bucketed_linear_interpolate(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | str,
    n_buckets: int = 64,
) -> DataFrame:
    """Global linear interpolation of interior missing values WITHOUT a
    single-partition window (the two-directional sibling of
    `bucketed_directional_fill`).

    A missing row takes ``pv + (nv - pv) * ((k - pk) / (nk - pk))``
    where (pk, pv) / (nk, nv) are the nearest non-null neighbours by
    key on either side and k is the row's leading key cast to double
    (numeric or timestamp x-axis).  Values before the first known or
    after the last known point stay NULL — interpolation is strictly
    interior, matching the edge discipline of the reference's
    directional fills (src/SeriesModule.fs:652-655; parity-plus: the
    reference has Forward/Backward only).

    Scale shape: per-bucket prev/next (key,value) structs via two
    in-bucket window passes, then ONE carry value per bucket per
    direction cascaded over the tiny bucket spine and broadcast back —
    identical cost profile to the directional fill (one hash shuffle on
    bucket id + an n_buckets-row cascade), valid at any series length.
    """
    if isinstance(value_cols, str):
        value_cols = [value_cols]
    order = [F.col(c) for c in key_cols]
    kd = F.col(key_cols[0]).cast("double")
    cuts = range_cuts(df, key_cols[0], n_buckets)
    b = _bucket_expr(F.col(key_cols[0]), cuts) if cuts else F.lit(0)
    base = df.withColumn(_B, b)
    w_p = Window.partitionBy(_B).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0)
    w_n = Window.partitionBy(_B).orderBy(*order).rowsBetween(
        0, Window.unboundedFollowing)

    def known(c: str) -> Column:
        return F.when(F.col(c).isNotNull(),
                      F.struct(kd.alias("k"), F.col(c).alias("v")))

    prev_in = {f"__p_{c}": F.last(known(c), ignorenulls=True).over(w_p)
               for c in value_cols}
    next_in = {f"__n_{c}": F.first(known(c), ignorenulls=True).over(w_n)
               for c in value_cols}
    # per-bucket boundary structs: the LAST non-null (k,v) carries
    # forward into later buckets, the FIRST carries backward
    edges = []
    for c in value_cols:
        sel = F.when(F.col(c).isNotNull(), F.struct(*order))
        kv = F.struct(kd.alias("k"), F.col(c).alias("v"))
        edges.append(F.max_by(F.when(F.col(c).isNotNull(), kv), sel)
                     .alias(f"__last_{c}"))
        edges.append(F.min_by(F.when(F.col(c).isNotNull(), kv), sel)
                     .alias(f"__first_{c}"))
    w_fwd = Window.orderBy(F.col(_B)).rowsBetween(Window.unboundedPreceding, -1)
    w_bwd = Window.orderBy(F.col(_B)).rowsBetween(1, Window.unboundedFollowing)
    carry_picks = []
    for c in value_cols:
        carry_picks.append(F.last(F.col(f"__last_{c}"), ignorenulls=True)
                           .over(w_fwd).alias(f"__cp_{c}"))
        carry_picks.append(F.first(F.col(f"__first_{c}"), ignorenulls=True)
                           .over(w_bwd).alias(f"__cn_{c}"))
    spine = base.select(_B).distinct()
    per_bucket = base.groupBy(_B).agg(*edges)
    carry = spine.join(per_bucket, _B, "left").select(F.col(_B), *carry_picks)
    staged = (base.withColumns(prev_in).withColumns(next_in)
              .join(F.broadcast(carry), on=_B, how="left"))
    fills = {}
    for c in value_cols:
        p = F.coalesce(F.col(f"__p_{c}"), F.col(f"__cp_{c}"))
        n = F.coalesce(F.col(f"__n_{c}"), F.col(f"__cn_{c}"))
        interp = F.when(
            n["k"] != p["k"],
            p["v"] + (n["v"] - p["v"]) * ((kd - p["k"]) / (n["k"] - p["k"]))
        ).otherwise(p["v"])
        fills[c] = F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
            F.when(p.isNotNull() & n.isNotNull(), interp))
    out = staged.withColumns(fills).drop(
        _B, *[f"__{pre}_{c}" for c in value_cols for pre in ("p", "n", "cp", "cn")])
    return out
