"""Grouped statistical modeling operators — the analytics tier above
the reference's per-series mean/sdv/median aggregates
(src/SeriesModule.fs:79-96): closed-form regression and robust outlier
flagging, shaped for grouped 100 TB data (one shuffle per pass, exact
integer moment sums so a SQL oracle replays every value bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pct(v: Column, probs: Column, exact: bool,
         accuracy: int = 10000) -> Column:
    """The percentile-family tier switch.  exact=True → `percentile`
    (sort-based: deterministic and interpolated, but the aggregation
    state is a per-group value→count buffer that is NOT a mergeable
    sketch — on a low-cardinality group key every value of a hot group
    lands in one reducer's memory, the named 100 TB scale-killer).
    exact=False → `approx_percentile` (Greenwald-Khanna summary:
    bounded-size, MERGEABLE state with map-side partial aggregation —
    no hot reducer, error ≤ 1/accuracy of rank).  Exact stays the
    default because it is the oracle-pinned contract; callers at real
    scale flip the flag instead of editing the operator."""
    if exact:
        return F.percentile(v, probs)
    return F.approx_percentile(v, probs, F.lit(int(accuracy)))


def grouped_ols(df: DataFrame, by: str, x: "F.Column", y: "F.Column",
                y_scale: int = 10000) -> DataFrame:
    """Per-group simple linear regression y ~ a + b·x via closed-form
    moment sums.

    ``x`` must be an INTEGER-valued Column (a day index, an epoch
    bucket, a version number...) and ``y`` is quantized to integer
    1/y_scale units, so all five moments (n, Σx, Σy, Σxy, Σx²) are
    exact BIGINT sums — partial aggregation order can never move them,
    which is what lets the DuckDB oracle replay slope/intercept/r²
    exactly (the remaining double arithmetic is one fixed association).
    Integer-overflow envelope: |Σx²| and |Σxy| must fit int64 — at
    10^12 rows per group widen the sums to DECIMAL(38,0) (Spark and
    DuckDB both sum decimals exactly); the int64 form is the
    common-case fast path.

    Scale shape: ONE groupBy shuffle with map-side partial aggregation
    (five sums + count); the per-group algebra is a narrow projection.
    Degenerate groups (n < 2 or zero x-variance) yield NULL
    slope/intercept/r2 — guarded outside the division (ANSI-safe).

    Returns (by, n, slope, intercept, r2), each statistic rounded to 6
    decimals.
    """
    xi = x.cast("long")
    yi = F.round(y * y_scale).cast("long")
    # complete-case: count(*) with NULL-skipping sums would mix row
    # populations per moment (n and sxx including a NULL-y row whose
    # sy/sxy skipped it — a silently wrong slope); drop incomplete
    # rows before aggregating, as correlation_matrix does
    df = df.filter(xi.isNotNull() & yi.isNotNull())
    m = df.groupBy(by).agg(
        F.count("*").alias("n"),
        F.sum(xi).alias("sx"),
        F.sum(yi).alias("sy"),
        F.sum(xi * yi).alias("sxy"),
        F.sum(xi * xi).alias("sxx"),
        F.sum(yi * yi).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (F.col("sxy").cast("double"), F.col("sxx").cast("double"),
                     F.col("syy").cast("double"))
    # fixed associations: (n*sxy - sx*sy) etc. — the oracle carries the
    # identical parenthesization
    cov_n = (n * sxy) - (sx * sy)
    var_x = (n * sxx) - (sx * sx)
    var_y = (n * syy) - (sy * sy)
    slope_units = cov_n / var_x
    intercept_units = (sy - slope_units * sx) / n
    r2 = (cov_n * cov_n) / (var_x * var_y)
    ok_x = (F.col("n") >= 2) & (var_x > 0)
    scale = float(y_scale)
    return m.select(
        by,
        F.col("n"),
        F.round(F.when(ok_x, slope_units / scale), 6).alias("slope"),
        F.round(F.when(ok_x, intercept_units / scale), 6).alias("intercept"),
        F.round(F.when(ok_x & (var_y > 0), r2), 6).alias("r2"),
    )


def grouped_mad_outliers(df: DataFrame, by: str, value: "F.Column",
                         k: float = 3.0, exact: bool = True) -> DataFrame:
    """Per-group robust outlier census: a row is an outlier when
    |value - median| > k · MAD (median absolute deviation) — the
    standard heavy-tail-safe alternative to z-scores (a z-score's mean
    and sdv are themselves dragged by the outliers they are supposed
    to flag).

    Two grouped EXACT medians (`percentile(0.5)` — sort-based,
    deterministic, interpolation on identical doubles is identical
    across engines, so the DuckDB `median()` oracle replays it): pass
    1 computes each group's median, pass 2 the median of absolute
    deviations, pass 3 the flag counts — three shuffles on the group
    key, each with map-side partial aggregation.  ``exact=False`` flips
    both medians to `approx_percentile` (mergeable sketch state,
    map-side combined — no per-group value buffer on a hot reducer);
    the exact form stays the oracle-pinned default (see `_pct`).

    A zero-MAD group (over half the values identical) flags ANY
    deviating value — the conventional MAD=0 degeneracy, left as-is
    and documented rather than fudged.

    Plan: median pass → MAD pass → flag-count pass; the per-group
    stats relations are group-cardinality-sized, so both re-joins
    broadcast at any corpus size (AQE handles it; group stats of a
    100 TB table are still tiny).

    Returns (by, n, med, mad, n_outliers), med/mad rounded to 4
    decimals.
    """
    v = value.cast("double")
    med = df.groupBy(by).agg(
        _pct(v, F.lit(0.5), exact).cast("double").alias("__med"))
    j1 = df.join(F.broadcast(med), on=by, how="inner")
    dev = F.abs(v - F.col("__med"))
    mad = (j1.groupBy(by)
           .agg(_pct(dev, F.lit(0.5), exact).cast("double").alias("__mad")))
    j2 = j1.join(F.broadcast(mad), on=by, how="inner")
    return (j2.groupBy(by).agg(
                F.count(v).alias("n"),
                F.round(F.first("__med"), 4).alias("med"),
                F.round(F.first("__mad"), 4).alias("mad"),
                F.sum(F.when(dev > F.lit(float(k)) * F.col("__mad"), 1)
                      .otherwise(0)).cast("long").alias("n_outliers"))
            .select(by, "n", "med", "mad", "n_outliers"))


def winsorize(df: DataFrame, by: str, value: "F.Column",
              lo: float = 0.05, hi: float = 0.95,
              out_col: str = "value_w", exact: bool = True) -> DataFrame:
    """Per-group winsorization: clip values to the group's [lo, hi]
    exact interpolated quantiles — the standard heavy-tail
    normalization before training-weight or quality-score use (a
    handful of 10^6x outliers otherwise own any mean-based statistic).

    One grouped percentile pass (sort-based exact by default — the
    oracle-pinned contract; ``exact=False`` flips to approx_percentile,
    a mergeable sketch with no per-group value buffer), broadcast the
    group-cardinality bounds relation back, clip with
    least/greatest.  Input rows pass through unchanged except the
    clipped copy in ``out_col``; NULL values stay NULL.
    """
    v = value.cast("double")
    q = df.groupBy(by).agg(
        _pct(v, F.lit(float(lo)), exact).cast("double").alias("__qlo"),
        _pct(v, F.lit(float(hi)), exact).cast("double").alias("__qhi"),
    )
    j = df.join(F.broadcast(q), on=by, how="left")
    # least/greatest IGNORE nulls (both engines), which would clip a
    # NULL value to the lower bound — guard explicitly instead
    clipped = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("__qlo")), F.col("__qhi")))
    return j.withColumn(out_col, clipped).drop("__qlo", "__qhi")


def value_histogram(df: DataFrame, value: "F.Column", n_bins: int,
                    lo: float, hi: float,
                    by: str | None = None) -> DataFrame:
    """Fixed-width histogram of a numeric column (optionally per
    group): bin i covers [lo + i*w, lo + (i+1)*w) with w =
    (hi-lo)/n_bins; values below lo clamp into bin 0, at/above hi
    into the last bin, NULLs are dropped.  The bin id is pure integer
    arithmetic on (v-lo)/w — exactly replayable in SQL — and the
    aggregation is ONE groupBy with map-side combine (the profiling
    histogram a 100 TB column costs one scan).

    Returns (by?, bin, bin_lo, n), ordered by (by?, bin); empty bins
    are absent (a dense axis is the plot layer's job, not the scan's).
    """
    v = value.cast("double")
    w = (float(hi) - float(lo)) / int(n_bins)
    # clamp in the LONG domain BEFORE the int cast: a heavy-tailed
    # value makes floor() exceed int32, and the ANSI cast (Spark 4
    # default) would throw CAST_OVERFLOW on exactly the rows the edge
    # clamp exists for
    raw = F.floor((v - F.lit(float(lo))) / F.lit(w)).cast("long")
    b = F.least(F.greatest(raw, F.lit(0).cast("long")),
                F.lit(int(n_bins) - 1).cast("long")).cast("int")
    keys = ([F.col(by)] if by else []) + [b.alias("bin")]
    out = (df.filter(v.isNotNull())
           .groupBy(*keys)
           .agg(F.count("*").alias("n"))
           .withColumn("bin_lo",
                       F.round(F.lit(float(lo)) + F.col("bin") * F.lit(w), 6))
           .select(*([by] if by else []), "bin", "bin_lo", "n"))
    return out.orderBy(*([by] if by else []), "bin")


def grouped_quantiles(df: DataFrame, by: str, value: "F.Column",
                      qs: list[float] = (0.5, 0.9, 0.99),
                      exact: bool = True) -> DataFrame:
    """Per-group exact interpolated quantiles (the p50/p95/p99 latency
    rollup): ONE groupBy shuffle computing all requested quantiles in a
    single `percentile` state — sort-based exact, and interpolation on
    identical doubles is identical across engines (the same parity
    contract grouped_mad_outliers pins for the median; DuckDB's
    quantile_cont interpolates identically).

    ``exact=False`` flips to `approx_percentile` (mergeable sketch,
    map-side combined, no per-group value buffer — the 100 TB tier);
    the exact form stays the oracle-pinned default (see `_pct`).
    Returns (by, n, q_<name>...) with quantile columns rounded to 4;
    names use the percent with the dot as an underscore (0.99 -> q99,
    0.055 -> q5_5 — injective, unlike dot-stripping which collides
    0.55 with 0.055).
    """
    v = value.cast("double")
    names = [("q" + ("%g" % (q * 100)).replace(".", "_")) for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantiles requested: {list(qs)}")
    # ONE percentile state per group (array form), not one buffer per
    # requested quantile — the single-state claim in this docstring
    arr = _pct(v, F.array(*[F.lit(float(q)) for q in qs]), exact)
    m = df.groupBy(by).agg(F.count(v).alias("n"), arr.alias("__qs"))
    return m.select(
        by, "n",
        *[F.round(F.col("__qs")[i].cast("double"), 4).alias(n)
          for i, n in enumerate(names)])


def cross_sectional_zscore(df: DataFrame, bucket: "F.Column",
                           value: "F.Column", id_cols: list[str],
                           scale: int = 10000,
                           bucket_name: str = "bucket") -> DataFrame:
    """Standardize each value within its cross-section (time bucket):
    z = (v - mean) / sdv over the bucket's population — the
    rank-free cousin of the reference's Stats.mean/sdv series
    aggregates (SeriesModule.fs:79-96), applied per cross-section the
    way factor pipelines demean each day.

    Mean and variance come from exact BIGINT sums of integer 1/scale
    units (one groupBy with map-side combine), broadcast back to the
    rows (bucket-cardinality relation — tiny at any corpus size), and
    the z algebra is one fixed association on those identical ints:
    z = (n·u - su) / sqrt((n·ssu - su²) · n / (n-1)) — numerator and
    denominator both scale-invariant, so the units cancel.  Two
    shuffles total (the stats groupBy + none for the broadcast join).
    Degenerate buckets (n < 2 or zero variance) yield NULL z.

    int64 envelope: Σu² must fit — at 10^7-scale units that is ~10^4
    rows per bucket; pass a smaller ``scale`` or widen to DECIMAL for
    bigger cross-sections (autocorr shows the decimal form).
    """
    u = F.round(value.cast("double") * scale).cast("long")
    b = df.withColumn(bucket_name, bucket).withColumn("__u", u)
    stats = (b.groupBy(bucket_name)
             .agg(F.count("__u").alias("__n"),
                  F.sum("__u").alias("__su"),
                  F.sum(F.col("__u") * F.col("__u")).alias("__ssu")))
    j = b.join(F.broadcast(stats), on=bucket_name, how="left")
    n = F.col("__n").cast("double")
    su, ssu = F.col("__su").cast("double"), F.col("__ssu").cast("double")
    uu = F.col("__u").cast("double")
    num = (n * uu) - su
    den = F.sqrt(((n * ssu) - (su * su)) * (n / (n - F.lit(1.0))))
    z = F.when((F.col("__n") >= 2) & (((n * ssu) - (su * su)) > 0),
               F.round(num / den, 6))
    return (j.select(*id_cols, bucket_name, z.alias("z"))
            )


def quantile_bin(df: DataFrame, value: "F.Column", n_bins: int,
                 out_col: str = "bin", exact: bool = True) -> DataFrame:
    """Equal-frequency discretization (the exact sibling of Spark ML's
    approx QuantileDiscretizer): bin i holds values in
    [q_i, q_{i+1}) of the EXACT interpolated quantile grid — one
    percentile aggregate (single state, array form), cut literals
    folded back as an indicator-sum bucket id.  Values below/above the
    grid clamp to the edge bins; NULLs stay NULL.

    Two jobs: the (tiny) exact-quantile aggregate, then a narrow map —
    nothing shuffles.  The exact percentile is ONE global aggregation
    state buffering every distinct value (the named scale-killer);
    ``exact=False`` flips it to approx_percentile (mergeable sketch,
    map-side combined — constant-size state at any corpus size).  The
    exact form stays the oracle-pinned default (see `_pct`).
    """
    from fsharp_dataframe_spark.operators.bucketed import _bucket_expr

    v = value.cast("double")
    probs = [i / n_bins for i in range(1, int(n_bins))]
    row = df.agg(_pct(v, F.array(
        *[F.lit(float(p)) for p in probs]), exact).alias("q")).first()
    cuts = sorted({float(c) for c in (row["q"] or []) if c is not None})
    # the count-of-cuts bucket rule is the substrate's _bucket_expr
    # (flat indicator sum, Arrow search past 128 cuts) — one shared
    # implementation; NULL values stay NULL rather than bucket 0
    bin_id = F.when(v.isNotNull(), _bucket_expr(v, cuts))
    return df.withColumn(out_col, bin_id.cast("int"))


def target_encode_loo(df: DataFrame, category: str, target: "F.Column",
                      scale: int = 10000,
                      out_col: str = "te") -> DataFrame:
    """Leave-one-out target encoding: each row gets the mean target of
    its OWN category computed over the other rows —
    (Σ_cat − v) / (n_cat − 1) — the standard leakage-guard for
    categorical features feeding a model trained on the same rows.

    One groupBy on the category (exact integer unit sums, map-side
    combined) broadcast back; the per-row arithmetic is a fixed
    association on identical ints, so the SQL oracle replays every
    encoding exactly.  Singleton categories (n = 1: nothing to leave
    out) and NULL targets yield NULL.
    """
    u = F.round(target.cast("double") * scale).cast("long")
    b = df.withColumn("__u", u)
    stats = (b.groupBy(category)
             .agg(F.sum("__u").alias("__su"),
                  F.count("__u").alias("__n")))
    j = b.join(F.broadcast(stats), on=category, how="left")
    n = F.col("__n").cast("double")
    su, uu = F.col("__su").cast("double"), F.col("__u").cast("double")
    te = F.when((F.col("__n") >= 2) & F.col("__u").isNotNull(),
                F.round(((su - uu) / (n - F.lit(1.0))) / scale, 6))
    return j.withColumn(out_col, te).drop("__u", "__su", "__n")


def correlation_matrix(df: DataFrame, cols: list[str],
                       scale: int = 10000) -> DataFrame:
    """Pairwise Pearson correlation of numeric columns in ONE scan:
    every moment (n, Σx, Σx², Σxy per pair) is an exact DECIMAL sum of
    integer 1/scale units, aggregated map-side into a single 1-row
    relation — so the whole d-column matrix costs one pass and the
    double algebra is one fixed association the SQL oracle replays
    bit-for-bit (corr is invariant to the positive affine quantization
    up to the quantization error itself, which is part of the pinned
    contract; the oracle sums in HUGEINT, and int128/decimal(38) agree
    exactly in the shared envelope).  Rows with a NULL in ANY listed
    column are excluded (complete-case, the convention dataframe
    libraries use for corr()).  d(d-1)/2 output rows, col_a < col_b.

    Exactness envelope: units must fit decimal(18,0) (|x|·scale <
    10^18) and each Σ of unit-products must fit decimal(38,0) — that
    is ~10^20 rows of price-scale data, so BIGINT-overflow (the
    failure a long-based version hits at one month of a busy fact
    table) is out of the picture.
    """
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs >= 2 columns")
    base = df
    for c in cols:
        base = base.filter(F.col(c).isNotNull())
    units = {c: F.round(F.col(c).cast("double") * scale)
             .cast("decimal(18,0)") for c in cols}
    aggs = [F.count("*").alias("n")]
    for c in cols:
        aggs.append(F.sum(units[c]).alias(f"s_{c}"))
        aggs.append(F.sum(units[c] * units[c]).alias(f"ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        aggs.append(F.sum(units[a] * units[b]).alias(f"sp_{a}_{b}"))
    m = base.agg(*aggs)
    rows = []
    n = F.col("n").cast("double")
    for a, b in pairs:
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        ssa, ssb = (F.col(f"ss_{a}").cast("double"),
                    F.col(f"ss_{b}").cast("double"))
        sab = F.col(f"sp_{a}_{b}").cast("double")
        num = (n * sab) - (sa * sb)
        da = (n * ssa) - (sa * sa)
        db = (n * ssb) - (sb * sb)
        c = F.when((F.col("n") >= 2) & (da > 0) & (db > 0),
                   F.round(num / F.sqrt(da * db), 6))
        rows.append(m.select(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                             c.alias("corr"), F.col("n")))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def grouped_rank_features(df: DataFrame, by: str, value: "F.Column",
                          id_cols: list[str], tiebreak: str,
                          n_tiles: int = 10) -> DataFrame:
    """Per-group rank features: dense value order position,
    percent_rank and the n-tile bucket within each group — the
    rank-based cousins of cross_sectional_zscore (distribution-free,
    so heavy tails cannot drag them).

    percent_rank follows the SQL standard (rank-1)/(n-1) on the VALUE
    ordering alone (ties share a percent_rank — engine-stable), while
    ntile needs a total order to be deterministic: the ``tiebreak``
    column is REQUIRED in the ntile ordering, the same
    grouped_topk/ohlc tie discipline (an untied ntile silently
    reshuffles equal values across bucket boundaries between runs).

    ONE window over the group partition; no joins, no second pass.
    Returns (*id_cols, by, rnk, pct_rank 6dp, tile).
    """
    from pyspark.sql import Window

    v = value.cast("double")
    w_val = Window.partitionBy(by).orderBy(v)
    w_tot = Window.partitionBy(by).orderBy(v, F.col(tiebreak))
    return df.select(
        *id_cols, by,
        F.rank().over(w_val).cast("long").alias("rnk"),
        F.round(F.percent_rank().over(w_val), 6).alias("pct_rank"),
        F.ntile(int(n_tiles)).over(w_tot).cast("long").alias("tile"))


def grouped_trimmed_mean(df: DataFrame, by: str, value: Column,
                         trim: float = 0.1, tiebreak: Column | None = None,
                         scale: int = 10000) -> DataFrame:
    """Per-group trimmed mean: drop the floor(trim·n) smallest and
    largest observations, average the rest — the robust location
    estimate between mean (trim=0) and median (trim→0.5), the standard
    latency/metric rollup that one stuck sensor cannot move.

    Exactness discipline: values quantize to integer 1/scale units
    BEFORE ranking, so the trim ranks, the kept multiset, and the
    BIGINT sum are all engine-exact; ``tiebreak`` (required for a
    deterministic kept-set when quantized values tie at the trim
    boundary — same contract as ntile in grouped_rank_features) breaks
    rank ties.  The mean itself is one division of identical ints,
    rounded 4dp.

    Shape: ONE shuffle on the group key reused by the rank window and
    the final aggregate (same-key exchange collapse); per-group state
    is the window sort, which Spark spills for giant groups.

    Returns (by, n, n_kept, trimmed_mean).
    """
    from pyspark.sql import Window as W

    t = float(trim)
    if not 0.0 <= t < 0.5:
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")
    u = F.round(value.cast("double") * scale).cast("long")
    order = [F.col("__u")] + ([tiebreak] if tiebreak is not None else [])
    base = df.filter(value.isNotNull()).withColumn("__u", u)
    w = W.partitionBy(by).orderBy(*order)
    wall = W.partitionBy(by)
    ranked = (base.withColumn("__rn", F.row_number().over(w))
              .withColumn("__n", F.count("*").over(wall)))
    cut = F.floor(F.col("__n") * t).cast("long")
    kept = ranked.filter((F.col("__rn") > cut)
                         & (F.col("__rn") <= F.col("__n") - cut))
    return (kept.groupBy(by)
            .agg(F.max("__n").alias("n"),
                 F.count("*").alias("n_kept"),
                 F.round((F.sum("__u") / F.count("*")) / scale, 4)
                 .alias("trimmed_mean")))
