"""Exponentially weighted moving average — a seemingly sequential
recurrence run in parallel.

Semantics (the standard adjust=False convention, pandas `ewm`):

    y_0 = x_0
    y_i = (1 - alpha) * y_{i-1} + alpha * x_i

The reference's moving-window API (src/SeriesModule.fs:281-301) stops
at finite windows; EWMA is the canonical infinite-memory sibling every
time-series stack carries (parity-plus).  NULL values are excluded up
front: the recurrence is defined over the non-null observations in key
order, and only those rows appear in the output.

## Why this parallelizes

The recurrence looks like a chain, but the state entering any segment
is a single number, and a segment's output decomposes as

    y_i = local_i + (1 - alpha)^(pos_i + 1) * inc

where ``local`` is the segment's ZERO-init fold (y = (1-a)·y + a·x
starting from 0), ``pos`` is the 0-based offset inside the segment,
and ``inc`` is the incoming state.  The y_0 = x_0 head convention
falls out for free: the very first segment's incoming state is simply
x_0 itself (substituting inc = x_0 makes y_0 = a·x_0 + (1-a)·x_0 =
x_0).  Segment summaries chain by

    inc_{b+1} = local_final_b + inc_b * (1 - alpha)^(n_b)

so the plan is: per-bucket zero-init folds in parallel (one
Arrow-batched pass), a driver-side cascade over ~n_buckets scalar
summaries (the same carry-spine discipline as chunk_dist and the
bucketed fills), then one narrow Column expression patches every row.
No global window, no sequential task over the data.

Sizing: each bucket is ONE Arrow group (a pandas frame in a worker),
so ``n_buckets`` must scale with the series — n/n_buckets rows have
to fit executor memory.  The cascade is O(n_buckets) driver scalars,
cheap up to millions of buckets.  By default (``n_buckets=None``) the
count is derived from a row estimate (`bucketed.auto_n_buckets`,
~2M rows per bucket, floor 64), so a 10^12-row series auto-sizes to
~5×10^5 buckets; past ~4k buckets the carry patch switches from a
create_map literal to a broadcast join (`bucketed.attach_mapping`).

Bucketing: by default, quantile range buckets (`range_cuts`).  Pass
``bucket_width`` to use fixed key-width buckets instead —
deterministic bucket boundaries make the whole computation replayable
step-for-step by a SQL oracle (the quantile sketch is
partitioning-dependent; the VALUES agree either way, but last-ulp
float rounding differs with the decomposition).

With ``by=`` the recurrence runs per entity as one Arrow pass per
group — embarrassingly parallel across entities, the 100 TB path for
keyed series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fsharp_dataframe_spark.series import Series

_B = "__ewma_bucket"


def _fold_zero_init(values, alpha: float):
    """Sequential zero-init fold y = (1-a)*y + a*x, returning the per-row
    series.  Plain Python loop over one Arrow batch: the association is
    exactly the textbook recurrence, so a SQL oracle's list_reduce with
    the same lambda reproduces it bit-for-bit."""
    one_m_a = 1.0 - alpha
    y = 0.0
    out = []
    for x in values:
        y = one_m_a * y + alpha * x
        out.append(y)
    return out


def series_ewma(s: Series, alpha: float, by: list[str] | None = None,
                n_buckets: int | None = None,
                bucket_width: float | None = None) -> Series:
    """EWMA of an ordered series (see module docstring for semantics
    and the parallel decomposition).  Returns one row per non-null
    input row with the value column replaced by the EWMA.
    ``n_buckets=None`` (default) auto-sizes from a row estimate
    (`bucketed.auto_n_buckets`, floor 64)."""
    import pandas as pd

    s._require_ordered("ewma")
    a = float(alpha)
    if not 0.0 < a <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    key_cols, value_col = s.key_cols, s.value_col
    # the fold produces float64 whatever the input type — declare the
    # value as double in BOTH applyInPandas schemas, or an int-typed
    # column crashes the Arrow conversion (or silently truncates with
    # safe-conversion off)
    df = (s.df.filter(s.value.isNotNull())
          .withColumn(value_col, s.value.cast("double")))
    order = [F.col(k) for k in key_cols]

    if by:
        rest = [k for k in key_cols if k not in by] or key_cols
        schema = df.select(*key_cols, s.value).schema

        def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values(rest, ignore_index=True)
            vals = pdf[value_col].to_numpy()
            if len(vals):
                local = _fold_zero_init(vals, a)
                inc = float(vals[0])
                dec = 1.0 - a
                # pow (libm), not a running product: a SQL oracle's
                # pow() call replays it bit-for-bit
                pdf[value_col] = [loc + dec ** (i + 1) * inc
                                  for i, loc in enumerate(local)]
            return pdf[[*key_cols, value_col]]

        # hot-key guard (r8 VERDICT ask #6): each by-entity's history
        # is one Arrow group — fail loudly on a pathological key
        from fsharp_dataframe_spark.functions.util import (
            guard_arrow_group, pin_group_parallelism,
        )

        # pin the exchange at session parallelism: AQE's byte-based
        # coalescing is blind to the per-group Python cost and was
        # measured running this fold on 2 of 32 cores (r15)
        out = pin_group_parallelism(df, by).groupBy(*by).applyInPandas(
            guard_arrow_group(fn, f"ewma(by={by})"), schema)
        return Series(out, key=key_cols, value=value_col, ordered=True,
                      _canonicalize=False)

    # ---------------- global bucketed path ----------------
    from fsharp_dataframe_spark.operators.bucketed import (
        _bucket_expr,
        attach_mapping,
        range_cuts,
    )

    axis = key_cols[0]
    if bucket_width is not None:
        b = F.floor(F.col(axis).cast("double") / float(bucket_width)).cast("int")
    else:
        cuts = range_cuts(df, axis, n_buckets)
        b = _bucket_expr(F.col(axis), cuts) if cuts else F.lit(0)
    base = df.withColumn(_B, b)

    loc_schema = base.select(_B, *key_cols, s.value).schema \
        .add("__pos", "long", False).add("__first_x", "double", True)

    def local_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(key_cols, ignore_index=True)
        vals = pdf[value_col].to_numpy()
        # carry the RAW first value alongside the fold so the census
        # below is ONE aggregate over `local` (r6 ask #9: the old
        # shape ran a second collect over `base` just for first_x;
        # deriving it as local_first/alpha would cost a float division
        # and break the bit-exact y_0 = x_0 head convention)
        first_x = float(vals[0]) if len(vals) else None
        pdf[value_col] = _fold_zero_init(vals, a)
        pdf["__pos"] = range(len(pdf))
        pdf["__first_x"] = first_x
        return pdf[[_B, *key_cols, value_col, "__pos", "__first_x"]]

    from fsharp_dataframe_spark.functions.util import (
        pin_group_parallelism, track_persist,
    )

    # persisted: the census below and the final patch both consume it —
    # without a stage boundary the Arrow fold would run twice.  The
    # bucket exchange is pinned at session parallelism (AQE's byte
    # heuristic under-parallelizes Python folds — r15)
    local = track_persist(
        pin_group_parallelism(base, [_B]).groupBy(_B)
        .applyInPandas(local_fn, loc_schema))

    # census: one scalar summary per bucket (n, local_final, first_x) —
    # a SINGLE job over the persisted fold output (min_by on __pos is
    # the constant-per-bucket first_x; max_by the segment's last fold)
    census = (local.groupBy(_B).agg(
        F.count("*").alias("n"),
        F.min_by(F.col("__first_x"), F.col("__pos")).alias("first_x"),
        F.max_by(F.col(value_col), F.col("__pos")).alias("lf"))
        .collect())
    info = sorted(((r[_B], r["n"], r["first_x"], r["lf"]) for r in census))
    dec = 1.0 - a
    incs: dict[int, float] = {}
    inc = None
    for bid, n_b, first_x, local_final in info:
        if inc is None:
            inc = float(first_x)  # y_0 = x_0 head convention
        incs[bid] = inc
        inc = local_final + inc * (dec ** n_b)

    # carry patch: create_map literal for few buckets, broadcast join
    # past MAP_LITERAL_MAX — at the documented 10^5-bucket sizing the
    # literal form is a 2·10^5-node expression tree in one plan node
    patched = attach_mapping(
        local, _B, {int(k): float(v) for k, v in incs.items()},
        "__inc", "double", default=0.0)
    y = F.col(value_col) + F.pow(F.lit(dec), F.col("__pos") + 1) * F.col("__inc")
    out = patched.withColumn(value_col, y).drop(_B, "__pos", "__inc",
                                                "__first_x")
    return Series(out, key=key_cols, value=value_col, ordered=True,
                  _canonicalize=False)
