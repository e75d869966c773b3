"""Keyed time-series analytics — the composition tier the reference
demonstrates over price series (samples/timeseries.fsx:233-320 windows
means over MSFT closes; SeriesModule.fs `diff`/`shift`/`windowInto` are
the primitives): OHLC resampling, VWAP, running drawdown, returns and
lagged autocorrelation, each shaped as grouped one-shuffle plans so the
same code runs per-instrument on a 100 TB tick table.

Every operator keys its windows by an explicit series key (per-key data
fits a partition after the key shuffle; there is NO global un-keyed
window in this module), aggregates with map-side combine where the
output is per-group, and pins cross-engine exactness the same way
functions/stats.py does: moment sums in integer/decimal units, double
algebra as one fixed association, results rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ohlc_resample(df: DataFrame, key: str, ts: str, value: str,
                  unit: str = "week", tiebreak: str | None = None) -> DataFrame:
    """Per-key OHLC bars: open/high/low/close + count per calendar
    bucket — the reference's `resampleEquiv` + first/last/min/max
    aggregation idiom (SeriesModule.fs resampling + firstValue/lastValue)
    fused into ONE groupBy.

    Open/close are `min_by`/`max_by` over a (ts, tiebreak) struct so
    intra-bucket timestamp ties are deterministic (struct comparison is
    lexicographic in both engines).  Scale shape: one shuffle on
    (key, bucket) with full map-side partial aggregation — min_by/max_by
    carry a single struct per partial state, so a 100 TB tick table
    costs one pass and bar-cardinality memory.
    """
    tie = [F.col(tiebreak)] if tiebreak else []
    order = F.struct(F.col(ts), *tie)
    bucket = F.date_trunc(unit, F.col(ts)).cast("date").alias("bucket")
    v = F.col(value)
    return (df.groupBy(F.col(key), bucket)
            .agg(F.min_by(v, order).alias("open"),
                 F.max(v).alias("high"),
                 F.min(v).alias("low"),
                 F.max_by(v, order).alias("close"),
                 F.count(v).alias("n"))
            .select(key, "bucket", "open", "high", "low", "close", "n"))


def vwap(df: DataFrame, key: str, ts: str, price: str, qty: str,
         unit: str = "month", price_scale: int = 10000,
         qty_scale: int = 100) -> DataFrame:
    """Volume-weighted average price per key per calendar bucket:
    Σ(p·q)/Σq with both sums carried as exact DECIMAL(38,0) products of
    quantized units — partial-aggregation order cannot move them.  ONE
    shuffle on (key, bucket), map-side combined.

    The quotient itself is pinned as an exact integer FLOOR division in
    micro-units ((Σpq · 10⁶) div Σq — a double round(x, 6) sits on
    half-way ties the engines break differently; floor of positives is
    truncation in both), then one int→double conversion + one IEEE
    division, both bit-identical across engines.  Exactness envelope:
    Σpq·10⁶ fits decimal(38,0) to ~10^25 per bar of price-scale data;
    the micro-unit quotient must fit int64 (prices < ~10⁸).
    """
    bucket = F.date_trunc(unit, F.col(ts)).cast("date").alias("bucket")
    p = F.round(F.col(price).cast("double") * price_scale).cast("decimal(19,0)")
    q = F.round(F.col(qty).cast("double") * qty_scale).cast("decimal(19,0)")
    m = (df.groupBy(F.col(key), bucket)
         .agg(F.sum(p * q).alias("spq"), F.sum(q).alias("sq"),
              F.count("*").alias("n")))
    micro = F.expr("CAST(spq * 1000000 AS DECIMAL(38,0)) div sq")
    w = F.when(F.col("sq") > 0,
               micro.cast("double") / float(1_000_000 * price_scale))
    return m.select(key, "bucket", w.alias("vwap"), "n")


def max_drawdown(df: DataFrame, key: str, ts: str, value: str,
                 tiebreak: str | None = None) -> DataFrame:
    """Per-key maximum drawdown: the largest peak-to-trough fraction
    (peak - v) / peak over the running maximum — the canonical
    risk statistic over the reference's ordered-series running
    aggregations (samples/timeseries.fsx windowed means; Series.diff's
    ordered-walk contract).

    One window pass per key (running max, ordered by ts + tiebreak) and
    one groupBy — two shuffles on the SAME key, which Spark collapses
    into one exchange reused by both (the window's required
    distribution satisfies the aggregation).  Per-key history must fit
    a partition — the per-instrument regime; for one global un-keyed
    series use the bucketed substrate's prefix-max instead.

    Ratio of identical doubles is identical IEEE arithmetic in both
    engines; rounded to 6.
    """
    from pyspark.sql import Window

    tie = [tiebreak] if tiebreak else []
    w = (Window.partitionBy(key).orderBy(ts, *tie)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    v = F.col(value).cast("double")
    peak = F.max(v).over(w)
    dd = F.when(peak > 0, (peak - v) / peak)
    return (df.withColumn("__dd", dd)
            .groupBy(key)
            .agg(F.round(F.max("__dd"), 6).alias("max_drawdown"),
                 F.count("*").alias("n")))


def returns(df: DataFrame, key: str, ts: str, value: str,
            tiebreak: str | None = None) -> DataFrame:
    """Per-key simple returns and cumulative growth: ret = v/lag(v) - 1
    and cum = v/first(v) — the reference's
    `series / Series.shift 1 series - 1` idiom (SeriesModule.fs shift;
    samples/timeseries.fsx joining MSFT opens to shifted closes) as one
    keyed window pass.

    Both statistics are ratios of identical doubles (no accumulation),
    so the SQL oracle replays them exactly; one shuffle on the key.
    First row per key has NULL ret and cum = 1.
    """
    from pyspark.sql import Window

    tie = [tiebreak] if tiebreak else []
    w = Window.partitionBy(key).orderBy(ts, *tie)
    v = F.col(value).cast("double")
    prev = F.lag(v).over(w)
    first = F.first(v).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.select(
        key, ts, *tie,
        F.round(v, 4).alias("value"),
        F.round(F.when(prev != 0, v / prev - 1.0), 6).alias("ret"),
        F.round(F.when(first != 0, v / first), 6).alias("cum"),
    ))


def autocorr(df: DataFrame, key: str, ts: str, value: str, lag: int = 1,
             scale: int = 10000, tiebreak: str | None = None) -> DataFrame:
    """Per-key lag-k autocorrelation: Pearson correlation of the series
    with its own lag — seasonality/persistence screening over the
    reference's shift/zip algebra (SeriesModule.fs shift + Series.zip
    pairing a series with its own past).

    One keyed window pass builds (v, lag_k(v)) pairs; the correlation
    then runs on exact BIGINT moment sums of integer 1/scale units
    (same pinned contract as functions/stats.correlation_matrix, int64
    envelope documented there) in one further groupBy — two shuffles on
    the same key, one exchange after collapse.  Pairs with either side
    NULL are excluded (complete-case).  Degenerate keys (n < 2, zero
    variance) yield NULL.

    The moment sums are DECIMAL, not BIGINT: Su^2 of 10^7-unit values
    overflows int64 at ~10^5 rows per key, which sf0.1 already reaches --
    decimal(15,0) units give a decimal(31,0) product and an exact
    decimal(38,0) sum (the oracle sums HUGEINT; both exact).
    """
    from pyspark.sql import Window

    tie = [tiebreak] if tiebreak else []
    w = Window.partitionBy(key).orderBy(ts, *tie)
    u = F.round(F.col(value).cast("double") * scale).cast("decimal(15,0)")
    pairs = (df.select(F.col(key), u.alias("__y"),
                       F.lag(u, lag).over(w).alias("__x"))
             .filter(F.col("__x").isNotNull() & F.col("__y").isNotNull()))
    x, y = F.col("__x"), F.col("__y")
    m = pairs.groupBy(key).agg(
        F.count("*").alias("n"), F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"), F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    num = (n * sxy) - (sx * sy)
    dx = (n * sxx) - (sx * sx)
    dy = (n * syy) - (sy * sy)
    ac = F.when((F.col("n") >= 2) & (dx > 0) & (dy > 0),
                F.round(num / F.sqrt(dx * dy), 6))
    return m.select(key, "n", ac.alias(f"autocorr_{lag}"))


def rolling_zscore(df: DataFrame, key: str, ts: str, value: str, k: int,
                   scale: int = 10000,
                   tiebreak: str | None = None) -> DataFrame:
    """Trailing-window z-score per key: how far today's value sits from
    the mean of its own last ``k`` observations (the Bollinger-band
    flag) — the reference's `windowInto k Series.mean/sdv` pair
    (samples/timeseries.fsx:251-267) fused into one keyed window pass.

    Both moments are EXACT integer sums over the ROWS frame (Σu, Σu²
    of 1/scale units — frame sums are order-deterministic and replay
    in SQL), and z is one fixed association:
    z = (n·u - su) / sqrt((n·ssu - su²) · n/(n-1)).  Rows with fewer
    than ``k`` trailing observations, or a zero-variance window, yield
    NULL z.  One shuffle on the key; int64 envelope: k·u² must fit
    (~10^4 rows of 10^7-unit values), beyond that lower ``scale``.
    """
    from pyspark.sql import Window

    tie = [tiebreak] if tiebreak else []
    w = (Window.partitionBy(key).orderBy(ts, *tie)
         .rowsBetween(-(int(k) - 1), Window.currentRow))
    u = F.round(F.col(value).cast("double") * scale).cast("long")
    b = (df.withColumn("__u", u)
         .withColumn("__n", F.count("__u").over(w))
         .withColumn("__su", F.sum("__u").over(w))
         .withColumn("__ssu", F.sum(F.col("__u") * F.col("__u")).over(w)))
    n = F.col("__n").cast("double")
    su, ssu = F.col("__su").cast("double"), F.col("__ssu").cast("double")
    uu = F.col("__u").cast("double")
    var_n = (n * ssu) - (su * su)
    z = F.when((F.col("__n") >= int(k)) & (var_n > 0),
               F.round(((n * uu) - su)
                       / F.sqrt(var_n * (n / (n - F.lit(1.0)))), 6))
    return (b.select(key, ts, *tie,
                     F.round(F.col(value).cast("double"), 4).alias("value"),
                     z.alias("z")))


def market_beta(df: DataFrame, key: str, ts: str, value: str,
                scale: int = 10000, mean_scale: int = 1_000_000) -> DataFrame:
    """Per-key beta/alpha against the cross-sectional "market": regress
    each key's daily mean value on the all-keys daily mean — the factor
    regression a risk pipeline runs per instrument, built on the
    reference's grouped mean/zip algebra (SeriesModule.fs meanBy +
    Series.zip of two aligned series).

    Exactness: daily sums are integer 1/scale units; each daily MEAN is
    re-quantized to integer 1/mean_scale mean-units (one double
    division + round on identical ints — deterministic), and the
    regression moments are then exact DECIMAL sums over days.  The
    market relation is day-cardinality (calendar-bounded), broadcast
    back to the per-key days.  Two shuffles: the (key, day) rollup and
    the per-key moment aggregation.

    Returns (key, n_days, beta, alpha) rounded to 6; degenerate keys
    (n < 2 or zero market variance among that key's days) yield NULL.
    """
    u = F.round(F.col(value).cast("double") * scale).cast("long")
    day = F.col(ts).cast("date").alias("day")
    d = (df.groupBy(F.col(key), day)
         .agg(F.sum(u).alias("su"), F.count("*").alias("n")))
    mq = F.round((F.sum("su").cast("double") / F.sum("n").cast("double"))
                 * mean_scale).cast("decimal(25,0)")
    mkt = d.groupBy("day").agg(mq.alias("xq"))
    yq = F.round((F.col("su").cast("double") / F.col("n").cast("double"))
                 * mean_scale).cast("decimal(25,0)")
    a = (d.join(F.broadcast(mkt), on="day")
         .select(key, yq.alias("yq"), "xq"))
    x, y = F.col("xq"), F.col("yq")
    m = a.groupBy(key).agg(
        F.count("*").alias("n_days"), F.sum(x).alias("sx"),
        F.sum(y).alias("sy"), F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"))
    n = F.col("n_days").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    var_x = (n * sxx) - (sx * sx)
    beta = ((n * sxy) - (sx * sy)) / var_x
    alpha_units = (sy - beta * sx) / n
    ok = (F.col("n_days") >= 2) & (var_x > 0)
    out_scale = float(scale) * float(mean_scale)
    return m.select(
        key, "n_days",
        F.round(F.when(ok, beta), 6).alias("beta"),
        F.round(F.when(ok, alpha_units / out_scale), 6).alias("alpha"))


def seasonal_profile(df: DataFrame, key: str, ts: str, value: str,
                     scale: int = 10000) -> DataFrame:
    """Activity seasonality: per (key, hour-of-day, weekday) event count
    and mean value — the calendar profile behind load forecasting and
    anomaly baselines.  ONE groupBy with map-side combine; the mean is
    one double division on an exact integer sum (pinned association).
    ``weekday`` is 0=Monday (Spark `weekday` == DuckDB `isodow - 1` —
    the one cross-engine-stable day numbering).  The mean is pinned as
    an exact integer floor division in 1e-4-of-unit precision (the
    vwap discipline — a double round() sits on ties engines break
    differently), then one identical int→double conversion.
    """
    u = F.round(F.col(value).cast("double") * scale).cast("long")
    m = (df.groupBy(F.col(key),
                    F.hour(ts).alias("hour"),
                    F.weekday(ts).alias("weekday"))
         .agg(F.count("*").alias("n"), F.sum(u).alias("su")))
    mean = (F.expr("CAST(su * 10000 AS DECIMAL(38,0)) div n")
            .cast("double") / (10000.0 * scale))
    return m.select(key, "hour", "weekday", "n", mean.alias("mean_value"))


def _auto_bin_seconds(intervals: DataFrame, start: str, end: str) -> int:
    """Derive the global interval join's bin width: the approx median
    interval length in whole seconds (floored, min 1).  One tiny
    aggregate over the intervals side; approx_percentile because the
    probe sizes a plan — it needs no exactness, only a mergeable
    constant-size state.  Raises on an empty/degenerate intervals side
    (no lengths to size from) — pass bin_seconds explicitly there."""
    ln = (F.col(end).cast("timestamp").cast("double")
          - F.col(start).cast("timestamp").cast("double"))
    row = intervals.agg(
        F.approx_percentile(ln, F.lit(0.5), F.lit(1000)).alias("m")).first()
    med = row["m"] if row else None
    if med is None or med <= 0:
        raise ValueError(
            "interval_join: cannot auto-derive bin_seconds (empty "
            "intervals side or non-positive median length) — pass "
            "bin_seconds explicitly")
    return max(1, int(med))


def interval_join(points: DataFrame, intervals: DataFrame, point_ts: str,
                  start: str, end: str, keys: list[str] | None = None,
                  bin_seconds: int | None = None,
                  how: str = "inner") -> DataFrame:
    """Join point rows into [start, end) intervals — the range-predicate
    join Spark's equi-join machinery can't plan directly (a bare
    `ON t >= s AND t < e` is a broadcast-nested-loop or worse).  The
    reference reaches the same semantics through ordered lookups
    (Series.lookupAll with Lookup.NearestSmaller over an interval-start
    index); here it is a first-class relational operator.

    Keyed path (``keys`` given): equi-join on the keys carries the
    shuffle, the range predicate rides along as a join condition — a
    plain hash join whose fan-out is bounded by per-key interval
    cardinality.

    Global path (no keys): both sides are binned to ``bin_seconds``
    buckets — each interval EXPLODES to the buckets it covers
    (`sequence()`, one narrow map), each point maps to one bucket, and
    the join is an equi-join on the bucket id with the range predicate
    as a residual filter.  Choose bin_seconds near the median interval
    length: shorter bins multiply interval copies, longer bins multiply
    residual-filter misses.  Fan-out is (interval_len/bin)+1 copies per
    interval — bounded and declared, never a cartesian.

    ``bin_seconds=None`` on the global path auto-derives the bin from a
    ONE-ROW approx-median of interval lengths over the intervals side
    (mirroring operators/bucketed.auto_n_buckets: a cheap sizing probe
    instead of a silently wrong constant) — median-length bins put each
    interval in ~2 buckets while a point's residual miss window stays
    one interval-length wide.  The intervals side is the SMALL side by
    construction (it broadcasts its copies into the equi-join), so the
    probe costs one scan of the small side, not the points.

    Interval columns must not collide with point columns (rename
    upstream); `how='left'` keeps unmatched points with NULL interval
    fields.
    """
    p = points.alias("__pts")
    i = intervals.alias("__iv")
    t = F.col(f"__pts.{point_ts}")
    cond = (t >= F.col(f"__iv.{start}")) & (t < F.col(f"__iv.{end}"))
    if keys:
        on = [F.col(f"__pts.{k}") == F.col(f"__iv.{k}") for k in keys]
        out = p.join(i, on + [cond], how)
        for k in keys:
            out = out.drop(i[k])
        return out
    if not bin_seconds:
        bin_seconds = _auto_bin_seconds(intervals, start, end)
    b = int(bin_seconds)

    def epoch(c: "F.Column") -> "F.Column":
        # NTZ-safe epoch seconds: cast through timestamp (session-TZ
        # consistent on both sides, so the binning is self-consistent)
        return (c.cast("timestamp").cast("double") / b).cast("long")

    pb = p.withColumn("__bin", epoch(t))
    ib = i.withColumn(
        "__bin",
        F.explode(F.sequence(epoch(F.col(f"__iv.{start}")),
                             epoch(F.col(f"__iv.{end}")))))
    out = pb.join(ib, (pb["__bin"] == ib["__bin"]) & cond, how)
    return out.drop("__bin")


def sample_per_group(df: DataFrame, by: str, k: int, id_col: str,
                     hash_family: str = "xxh64") -> DataFrame:
    """Deterministic uniform k-per-group sample: rank rows inside each
    group by a content hash of their id and keep the smallest k — the
    scale-safe replacement for per-group reservoir sampling ("keep 100
    documents per domain"): reproducible across runs and engines, one
    groupBy-window shuffle, and the rank-k limit is pushed below the
    sort (WindowGroupLimit) so each group heap-selects its slice
    instead of fully sorting.

    ``xxh64`` is the production default (fast, JVM-side);
    ``md5`` is the cross-engine oracle family (identical in DuckDB),
    same two-tier policy as functions/dedup.py minhash.
    """
    from pyspark.sql import Window

    sid = F.col(id_col).cast("string")
    if hash_family == "md5":
        h = F.md5(sid)
    elif hash_family == "xxh64":
        h = F.xxhash64(sid)
    else:
        raise ValueError(f"unknown hash_family: {hash_family}")
    w = Window.partitionBy(by).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= int(k))
            .drop("__rk"))


def twap(df: DataFrame, key: str, ts: str, value: str,
         unit: str = "day", value_scale: int = 10000,
         tiebreak: str | None = None) -> DataFrame:
    """Time-weighted average value per key per calendar bucket — the
    TIME-weighted sibling of `vwap` (irregular observation spacing:
    each observation holds until the next one, so sparse quotes don't
    over-count).  Convention: within a bucket, observation i covers
    [ts_i, ts_{i+1}) with the LAST observation extending to the bucket
    end; the averaging span is [first_ts, bucket_end), so a bucket's
    TWAP never reaches before its first observation (no carry-in from
    the previous bucket — stated, not hidden; a carry-in variant is
    `point_in_time_join` against the previous bucket's close).

    Exactness: weights are integer MICROSECOND durations, values
    integer 1/value_scale units, the weighted sum an exact
    DECIMAL(38,0) product sum, and the quotient a pinned integer floor
    division in micro-units (the vwap discipline).  Shape: one lag/lead
    window on (key, bucket) + one groupBy — both on the same keyed
    shuffle.

    Returns (key, bucket, twap, n) with twap NULL for empty spans
    (single observation exactly at bucket end cannot happen — the end
    is exclusive).
    """
    from pyspark.sql import Window as W

    bucket = F.date_trunc(unit, F.col(ts)).cast("timestamp")
    us = F.unix_micros(F.col(ts))
    order = [us] + ([F.col(tiebreak)] if tiebreak else [])
    b = df.withColumn("__bk", bucket).withColumn("__us", us)
    w = W.partitionBy(key, "__bk").orderBy(*order)
    bucket_end = F.unix_micros(
        F.col("__bk") + F.expr(f"INTERVAL 1 {unit}"))
    nxt = F.coalesce(F.lead("__us").over(w), bucket_end)
    dur = (nxt - F.col("__us")).cast("decimal(19,0)")
    v = F.round(F.col(value).cast("double") * value_scale) \
         .cast("decimal(19,0)")
    # group on the window's OWN partition keys (key, __bk) — the date
    # cast happens after aggregation, so the groupBy reuses the
    # window's hash exchange instead of shuffling a second time
    m = (b.withColumn("__dur", dur).withColumn("__v", v)
         .groupBy(F.col(key), F.col("__bk"))
         .agg(F.sum(F.col("__v") * F.col("__dur")).alias("svd"),
              F.sum("__dur").alias("sd"),
              F.count("*").alias("n")))
    micro = F.expr("CAST(svd * 1000000 AS DECIMAL(38,0)) div sd")
    out = F.when(F.col("sd") > 0,
                 micro.cast("double") / float(1_000_000 * value_scale))
    # DATE labels only for day-or-coarser units — a date cast on an
    # 'hour' bucket would collapse a day's 24 distinct buckets into
    # one indistinguishable label
    bk = (F.col("__bk").cast("date")
          if unit.lower() in {"day", "week", "month", "quarter", "year"}
          else F.col("__bk"))
    return m.select(key, bk.alias("bucket"), out.alias("twap"), "n")


def gap_report(df: DataFrame, key: str, ts: str, min_gap_s: int,
               tiebreak: str | None = None) -> DataFrame:
    """Data-completeness report: per key, every span between
    consecutive observations longer than ``min_gap_s`` seconds — the
    monitoring query behind "which sensors went dark when" (and the
    complement of sessionize: sessions are where the data is, gaps are
    where it is not).

    One keyed lag window; gap boundaries are exact integer
    microseconds.  Returns (key, gap_start, gap_end, gap_s), gap_s
    strictly greater than min_gap_s (the `sessionize` strict->break
    convention: a gap of exactly min_gap_s is NOT reported, matching
    "events exactly gap apart share a session").
    """
    from pyspark.sql import Window as W

    us = F.unix_micros(F.col(ts))
    order = [us] + ([F.col(tiebreak)] if tiebreak else [])
    w = W.partitionBy(key).orderBy(*order)
    prev_us = F.lag(us).over(w)
    prev_ts = F.lag(F.col(ts)).over(w)
    gap_us = us - prev_us
    return (df.withColumn("__gap_us", gap_us)
            .withColumn("__prev", prev_ts)
            .filter(F.col("__gap_us") > int(min_gap_s) * 1_000_000)
            .select(F.col(key),
                    F.col("__prev").alias("gap_start"),
                    F.col(ts).alias("gap_end"),
                    (F.col("__gap_us") / F.lit(1_000_000)).cast("long")
                    .alias("gap_s")))


def cusum_changepoints(df: DataFrame, key: str, ts: str, value: str,
                       target: float, slack: float, threshold: float,
                       scale: int = 10000,
                       tiebreak: str | None = None) -> DataFrame:
    """Two-sided CUSUM drift detector (Page 1954, "Continuous
    inspection schemes") per key:

        S⁺_i = max(0, S⁺_{i-1} + (x_i - target - slack))
        S⁻_i = max(0, S⁻_{i-1} - (x_i - target + slack))

    with an alarm whenever either statistic exceeds ``threshold`` —
    the classic sequential test for a sustained mean shift beyond the
    slack band (sensor drift, metric regressions, data-quality decay).

    The max-with-zero clip looks like a non-decomposable carry, but it
    has a closed form: with per-row increment a_i = x_i − target −
    slack and prefix sums P_n (P_0 = 0),

        S⁺_n = P_n − min(0, min_{1≤j≤n} P_j)

    (induction: P_n − min(m_{n-1}, P_n) = max(0, P_n − m_{n-1})), and
    S⁻ is the mirror with b_i = −(x_i − target) − slack.  So the whole
    operator is FOUR JVM window expressions — a running BIGINT sum and
    a running min per side — over ONE keyed exchange: whole-stage
    codegen, streaming window frames, no Python worker, no
    materialized per-key Arrow group (a 10⁹-row hot key streams
    through the running frame instead of OOMing an executor).  The
    sequential fold survives as ``_cusum_fold_reference`` below, the
    test cross-check.

    Exactness: x/target/slack/threshold quantize to integer 1/scale
    units up front, so both statistics are exact BIGINT window sums —
    a SQL oracle replays every value and alarm with a list_reduce over
    the same integers (no float drift anywhere).  NULL values are
    excluded (the recurrence is over observed points, the ewma
    convention).

    Returns one row per non-null observation: (key, ts[, tiebreak],
    s_pos, s_neg, alarm) with the statistics in 1/scale units.
    """
    from pyspark.sql import Window as W

    t_units = int(round(float(target) * scale))
    k_units = int(round(float(slack) * scale))
    h_units = int(round(float(threshold) * scale))
    order = [ts] + ([tiebreak] if tiebreak else [])
    base = (df.filter(F.col(value).isNotNull())
            .select(key, *order,
                    F.round(F.col(value).cast("double") * scale)
                    .cast("long").alias("__xu")))
    w = (W.partitionBy(key).orderBy(*[F.col(c) for c in order])
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    a = F.col("__xu") - F.lit(t_units + k_units)   # S⁺ increment
    b = F.lit(t_units - k_units) - F.col("__xu")   # S⁻ increment
    # both running sums share w, and the running mins below reuse the
    # same (partition, order) spec — one hash exchange + one sort total
    pref = base.select(key, *order,
                       F.sum(a).over(w).alias("__p"),
                       F.sum(b).over(w).alias("__q"))
    zero = F.lit(0).cast("long")
    s_pos = F.col("__p") - F.least(zero, F.min("__p").over(w))
    s_neg = F.col("__q") - F.least(zero, F.min("__q").over(w))
    return (pref.select(key, *order,
                        s_pos.alias("s_pos"), s_neg.alias("s_neg"))
            .withColumn("alarm", (F.col("s_pos") > h_units)
                        | (F.col("s_neg") > h_units)))


def _cusum_fold_reference(xs: list[int], t_units: int, k_units: int,
                          h_units: int) -> list[tuple[int, int, bool]]:
    """Sequential Page-fold over pre-quantized integer units — the
    original per-key recurrence, kept as the test reference that the
    window closed-form in :func:`cusum_changepoints` must match
    value-for-value (tests/test_properties.py)."""
    sp = sn = 0
    out = []
    for x in xs:
        x = int(x)
        sp = max(0, sp + (x - t_units - k_units))
        sn = max(0, sn - (x - t_units + k_units))
        out.append((sp, sn, sp > h_units or sn > h_units))
    return out


def rolling_median(df: DataFrame, key: str, ts: str, value: str, k: int,
                   tiebreak: str | None = None,
                   out_col: str = "med") -> DataFrame:
    """Exact rolling median of the last ``k`` observations per key —
    the robust sibling of the moving average (SeriesModule.fs:281-301
    gives the reference's finite moving windows; median is the robust
    upgrade every monitoring stack wants).  Head windows shorter than
    k use the observations available (the reference's Boundary.AtBeginning
    convention for incomplete windows).

    Median rule: sorted middle for odd counts, mean of the two middle
    values for even counts (both engines average the identical
    doubles, so a SQL oracle replays it bit-for-bit with list_sort +
    the same two-element mean).

    Shape: ONE keyed window carrying a k-bounded collect_list — state
    per row is O(k) values, independent of series length, hash-
    partitioned on the key; no global sort, no UDF (sort_array and
    element_at are JVM-side).
    """
    from pyspark.sql import Window as W

    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (W.partitionBy(key).orderBy(*order)
         .rowsBetween(-(int(k) - 1), 0))
    arr = F.sort_array(F.collect_list(F.col(value).cast("double")).over(w))
    n = F.size(arr)
    # 1-based middles: odd n -> (n+1)/2 twice; even n -> n/2, n/2+1
    i_lo = F.floor((n + 1) / 2).cast("int")
    i_hi = F.floor(n / 2).cast("int") + 1
    med = (F.element_at(arr, i_lo) + F.element_at(arr, i_hi)) / 2.0
    cols = [key, ts] + ([tiebreak] if tiebreak else [])
    return (df.filter(F.col(value).isNotNull())
            .select(*cols, F.col(value).cast("double").alias(value))
            .withColumn(out_col, med.alias(out_col)))
