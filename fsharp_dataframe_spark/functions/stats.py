"""Grouped statistical modeling operators — the analytics tier above
the reference's per-series mean/sdv/median aggregates
(src/SeriesModule.fs:79-96): closed-form regression and robust outlier
flagging, shaped for grouped 100 TB data (one shuffle per pass, exact
integer moment sums so a SQL oracle replays every value bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
                         k: float = 3.0) -> DataFrame:
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
    key, each with map-side partial aggregation.  At real scale swap
    `percentile` for `approx_percentile` and accept sketch error —
    the exact form is the oracle-pinned contract.

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
    med = df.groupBy(by).agg(F.percentile(v, F.lit(0.5)).alias("__med"))
    j1 = df.join(F.broadcast(med), on=by, how="inner")
    dev = F.abs(v - F.col("__med"))
    mad = (j1.groupBy(by)
           .agg(F.percentile(dev, F.lit(0.5)).alias("__mad")))
    j2 = j1.join(F.broadcast(mad), on=by, how="inner")
    return (j2.groupBy(by).agg(
                F.count(v).alias("n"),
                F.round(F.first("__med"), 4).alias("med"),
                F.round(F.first("__mad"), 4).alias("mad"),
                F.sum(F.when(dev > F.lit(float(k)) * F.col("__mad"), 1)
                      .otherwise(0)).cast("long").alias("n_outliers"))
            .select(by, "n", "med", "mad", "n_outliers"))
