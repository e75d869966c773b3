"""Ordered-series operators: shift/diff/pairwise, sliding windows, chunks
(SURVEY.md §2.6).

Reference engine: ``Aggregation<'K>`` (WindowSize/ChunkSize/...,
src/Indices/Index.fs:35-52) executed over sequence combinators with
``Boundary`` flags AtBeginning | AtEnding | Skip
(src/Common/Common.fs:79-83, 507-654).  Semantics pinned by
tests/FSharp.DataFrame.Tests/Common.fs:132-191:

- windowSize n, AtBeginning: incomplete prefix windows kept, window
  keyed by its LAST key;
- windowSize n, AtEnding: incomplete suffix windows kept, window keyed
  by its FIRST key;
- Skip: only complete windows;
- chunkSize n, AtEnding: chunks aligned from the start, incomplete
  chunk at the end;  AtBeginning: aligned from the END, incomplete
  chunk at the beginning;  Skip drops the incomplete chunk.
- shift/diff (src/SeriesModule.fs:207-219; test Series.fs:74-81) use
  WindowSize(|n|+1, Skip) → boundary keys are DROPPED, not made missing.

Spark mapping: Window frames (`rowsBetween`) — pure Column expressions,
whole-stage codegen.  Every function takes ``by=`` to partition the
window per entity; that is the scale path (per-key series at 100 TB).
Without ``by``, Spark plans a single-partition window — correct, and
acceptable for series that fit one executor; large global series should
pass an entity partition or pre-chunk by key range.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from fsharp_dataframe_spark.series import AT_BEGINNING, AT_ENDING, SKIP, Series

_POS = "__pos"
_N = "__n"
_VAL = "__winval"


def _w(s: Series, by: list[str] | None) -> Window:
    """Ordered window; ``by`` columns must be key levels (a Series only
    carries key+value columns), and order is over the remaining levels."""
    by = by or []
    order = [F.col(k) for k in s.key_cols if k not in by] or [F.col(k) for k in s.key_cols]
    return Window.partitionBy(*by).orderBy(*order)


def _lag_substrate(s: Series, n: int, by: list[str] | None, bucketed: bool,
                   n_buckets: int | None):
    """(df, window, keep_cond) for a lag/lead of reach |n|.  With
    ``bucketed`` (and no by=) the substrate is the halo-replicated
    bucket frame from operators.bucketed — no single-partition window;
    otherwise the plain (possibly by=-partitioned) window."""
    if bucketed and not by:
        from fsharp_dataframe_spark.operators.bucketed import haloed_lag_frame

        return haloed_lag_frame(
            s.df, s.key_cols,
            halo_back=n if n > 0 else 0,
            halo_fwd=-n if n < 0 else 0,
            n_buckets=n_buckets,
        )
    return s.df, _w(s, by), F.lit(True)


def series_shift(s: Series, n: int, by: list[str] | None = None,
                 bucketed: bool = False, n_buckets: int | None = None) -> Series:
    """`shift n`: value at key[i] becomes value[i-n]; boundary keys
    dropped (reference builds it from WindowSize(|n|+1, Skip))."""
    s._require_ordered("shift")
    df, w, keep = _lag_substrate(s, n, by, bucketed, n_buckets)
    shifted = F.lag(s.value, n).over(w)  # lag handles negative n as lead
    in_range = F.lag(F.lit(1), n).over(w).isNotNull()
    out = (
        df.withColumns({_VAL: shifted, "__ok": in_range & keep})
        .filter(F.col("__ok"))
        .select(*s.key_cols, F.col(_VAL).alias(s.value_col))
    )
    return s._with_df(out)


def series_diff(s: Series, n: int, by: list[str] | None = None,
                bucketed: bool = False, n_buckets: int | None = None) -> Series:
    """`diff n`: x[k] - x[k-n]; boundary keys dropped
    (tests/FSharp.DataFrame.Tests/Series.fs:74-81)."""
    s._require_ordered("diff")
    df, w, keep = _lag_substrate(s, n, by, bucketed, n_buckets)
    d = s.value - F.lag(s.value, n).over(w)
    in_range = F.lag(F.lit(1), n).over(w).isNotNull()
    out = (
        df.withColumns({_VAL: d, "__ok": in_range & keep})
        .filter(F.col("__ok"))
        .select(*s.key_cols, F.col(_VAL).alias(s.value_col))
    )
    return s._with_df(out)


def series_pairwise(s: Series, f: Callable[[Column, Column], Column] | None = None,
                    by: list[str] | None = None,
                    bucketed: bool = False, n_buckets: int | None = None) -> Series:
    """(prev, cur) combined by *f* (default: struct pair) — `Pairwise`
    (src/Series.fs:461-500).  One key shorter (first key dropped)."""
    s._require_ordered("pairwise")
    df, w, keep = _lag_substrate(s, 1, by, bucketed, n_buckets)
    prev = F.lag(s.value, 1).over(w)
    in_range = F.lag(F.lit(1), 1).over(w).isNotNull()
    combined = f(prev, s.value) if f else F.struct(prev.alias("prev"), s.value.alias("cur"))
    out = (
        df.withColumns({_VAL: combined, "__ok": in_range & keep})
        .filter(F.col("__ok"))
        .select(*s.key_cols, F.col(_VAL).alias(s.value_col))
    )
    return s._with_df(out, canonicalize=False)


def series_window_size(s: Series, n: int, agg: Callable[[Column], Column],
                       boundary: str = AT_BEGINNING, by: list[str] | None = None,
                       bucketed: bool = False, n_buckets: int | None = None) -> Series:
    """Sliding n-row windows aggregated by *agg* — `windowSizeInto`
    (src/SeriesModule.fs:281-301).  *agg* receives the value Column and
    must return a window-aggregable Column expression (F.sum/avg/...).

    ``bucketed=True`` (global series): halo-replicated range buckets
    instead of a single-partition window; completeness for Skip is
    decided by the in-frame row count, not a global row_number.
    """
    s._require_ordered("window_size")
    if bucketed and not by:
        from fsharp_dataframe_spark.operators.bucketed import haloed_lag_frame

        df, base, keep = haloed_lag_frame(
            s.df, s.key_cols,
            halo_back=n - 1 if boundary in (AT_BEGINNING, SKIP) else 0,
            halo_fwd=n - 1 if boundary == AT_ENDING else 0,
            n_buckets=n_buckets,
        )
    else:
        df, base, keep = s.df, _w(s, by), F.lit(True)
    if boundary in (AT_BEGINNING, SKIP):
        frame = base.rowsBetween(-(n - 1), 0)  # keyed by last key of window
    elif boundary == AT_ENDING:
        frame = base.rowsBetween(0, n - 1)  # keyed by first key of window
    else:
        raise ValueError(boundary)
    out = df.withColumns({_VAL: agg(s.value).over(frame), "__keep": keep})
    if boundary == SKIP:
        # complete ⇔ the frame actually holds n rows (equals the
        # row_number>=n test on the plain path, and counts halo ghosts
        # on the bucketed path — exactly the true sliding window)
        out = out.withColumn(_N, F.count(F.lit(1)).over(frame)).filter(F.col(_N) >= n)
    out = out.filter(F.col("__keep")).select(*s.key_cols, F.col(_VAL).alias(s.value_col))
    return s._with_df(out, canonicalize=True)


def frame_rolling_corr(df, key_cols: list[str], x_col: str, y_col: str,
                       n: int, by: list[str] | None = None,
                       bucketed: bool = False, n_buckets: int | None = None,
                       out_col: str = "rolling_corr"):
    """Trailing n-row Pearson correlation of two frame columns — the
    two-column sibling of `windowSizeInto` (src/SeriesModule.fs:281-301;
    parity-plus: the reference aggregates one series per window, rolling
    pairwise stats are the standard finance extension of its
    moving-window API).

    Each row gets `corr(x, y)` over the trailing window of up to n rows
    (window shrinks at the series head — SQL frame semantics).  Windows
    with < 2 pairs, or a zero-variance side, yield NULL.

    The correlation is computed from six windowed moment sums with the
    guard OUTSIDE the division — not via `F.corr`, whose internal
    ``ck / sqrt(xMk·yMk)`` THROWS under Spark 4's default ANSI mode the
    moment one window has zero variance (a constant 20-row run of a
    metric is routine in real data).  Bonus: when x and y are
    integer-valued (quantize first if needed — corr is invariant to
    positive affine scaling), every windowed sum is exact whatever the
    engine's fold order, so the remaining double arithmetic is one
    fixed association and the result replays bit-identically in a SQL
    oracle.

    Scale shape: with ``by=`` a per-entity window (linear scale-out);
    the global form with ``bucketed=True`` runs on halo-replicated range
    buckets (ghost rows give every bucket its n-1 predecessors) — no
    single-partition window at any series length.
    """
    from pyspark.sql import functions as F

    order = [F.col(k) for k in key_cols]
    if bucketed and not by:
        from fsharp_dataframe_spark.operators.bucketed import haloed_lag_frame

        aug, base, keep = haloed_lag_frame(
            df, key_cols, halo_back=n - 1, n_buckets=n_buckets)
    else:
        by = by or []
        o = [F.col(k) for k in key_cols if k not in by] or order
        aug, base, keep = df, Window.partitionBy(*by).orderBy(*o), F.lit(True)
    frame = base.rowsBetween(-(n - 1), 0)
    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    pair = F.when(x.isNotNull() & y.isNotNull(), 1)
    cnt = F.sum(pair).over(frame).cast("double")
    sx = F.sum(F.when(pair.isNotNull(), x)).over(frame)
    sy = F.sum(F.when(pair.isNotNull(), y)).over(frame)
    sxx = F.sum(F.when(pair.isNotNull(), x * x)).over(frame)
    syy = F.sum(F.when(pair.isNotNull(), y * y)).over(frame)
    sxy = F.sum(F.when(pair.isNotNull(), x * y)).over(frame)
    num = cnt * sxy - sx * sy
    den1 = cnt * sxx - sx * sx
    den2 = cnt * syy - sy * sy
    c = F.when((cnt >= 2) & (den1 > 0) & (den2 > 0),
               num / F.sqrt(den1 * den2))
    out = (aug.withColumns({out_col: c, "__keep": keep})
           .filter(F.col("__keep"))
           .drop("__keep", "__gbucket", "__ghost"))
    return out


def series_chunk_size(s: Series, n: int, agg: Callable[[Column], Column],
                      boundary: str = AT_ENDING, by: list[str] | None = None,
                      bucketed: bool = False, n_buckets: int | None = None) -> Series:
    """Non-overlapping n-row chunks — `chunkSizeInto`
    (src/SeriesModule.fs:383-399).  Chunk keyed by its FIRST key.

    AtEnding (and the plain `chunk`): chunks aligned from the start,
    incomplete chunk last.  AtBeginning: aligned from the end,
    incomplete chunk first.  Skip: incomplete chunk dropped (semantics
    tests/FSharp.DataFrame.Tests/Common.fs:152-191; Skip composes with
    either alignment — here Skip alone means start-aligned + drop).

    ``bucketed=True`` (global series): exact positions come from the
    bucket census (operators.bucketed) — literal offsets + per-bucket
    row_number, and the total row count is a census literal, so no
    global window and no whole-relation count exist in the plan.
    """
    s._require_ordered("chunk_size")
    by = by or []
    if bucketed and not by:
        from fsharp_dataframe_spark.operators.bucketed import with_global_positions

        df, total = with_global_positions(s.df, s.key_cols, n_buckets, pos_col=_POS)
        n_total = F.lit(total)
    else:
        base = _w(s, by)
        cw = Window.partitionBy(*by)
        df = s.df.withColumn(_POS, F.row_number().over(base) - 1)
        n_total = F.count(F.lit(1)).over(cw)
    if boundary in (AT_ENDING, SKIP):
        chunk_id = F.floor(F.col(_POS) / n)
        df = df.withColumn("__chunk", chunk_id)
        if boundary == SKIP:
            df = df.withColumn(_N, n_total)
            df = df.filter((F.col("__chunk") + 1) * n <= F.col(_N))
    elif boundary == AT_BEGINNING:
        df = df.withColumn(_N, n_total)
        pos_from_end = F.col(_N) - 1 - F.col(_POS)
        df = df.withColumn("__chunk", -F.floor(pos_from_end / n))
    else:
        raise ValueError(boundary)
    rest = [k for k in s.key_cols if k not in by]
    # chunk key = the FIRST ROW's full key: min over a struct of the key
    # levels (lexicographic = key order), not independent per-column
    # mins, which could compose a key belonging to no actual row
    first_key = F.min(F.struct(*[F.col(k) for k in rest])).alias("__fk")
    out = df.groupBy(*by, "__chunk").agg(first_key, agg(s.value).alias(s.value_col))
    out = out.select(*by, *[F.col(f"__fk.{k}").alias(k) for k in rest], s.value_col)
    return Series(out, key=s.key_cols, value=s.value_col, ordered=True, _canonicalize=True)


def series_window_dist_bucketed(s: Series, dist, agg: Callable[[Column], Column],
                                n_buckets: int | None = None) -> Series:
    """Global (un-keyed) windowDist WITHOUT a single-partition window.

    The range-frame analog of the halo trick: quantile cut points are
    MERGED until every bucket spans at least ``dist`` in KEY space, so
    a window [k, k+dist) starting anywhere in bucket i can only reach
    into bucket i+1 — one-hop ghost replication (bucket i+1's first
    dist-range of rows copied into bucket i) makes every in-bucket
    range window complete.  One quantile sketch job, one hash shuffle
    on bucket id, no global sort.
    """
    from fsharp_dataframe_spark.operators.bucketed import range_cuts

    s._require_ordered("window_dist")
    key = s.key_cols[0]
    kcol = F.col(key)
    df = s.df
    order_col = key
    dtype = dict(df.dtypes)[key]
    if dtype.startswith("timestamp"):
        df = df.withColumn("__ord", F.unix_timestamp(kcol))
        order_col, dtype = "__ord", "bigint"
    integral = dtype in ("tinyint", "smallint", "int", "bigint")
    hi = dist - 1 if integral else dist
    # keep ALL key comparisons in the key's own type: the quantile
    # sketch returns float cuts (fine — cut placement only affects
    # balance), but the bucket-id and ghost comparisons below decide
    # CORRECTNESS, and float64 silently loses integer precision above
    # 2^53 (epoch nanoseconds).  For integral keys the cuts are
    # floored to ints and all arithmetic stays in bigint.
    dist_n = int(dist) if integral else float(dist)

    cuts = range_cuts(df, order_col, n_buckets)
    if integral:
        cuts = sorted({int(math.floor(c)) for c in cuts})
    # merge cuts until adjacent intervals span >= dist (the one-hop
    # completeness guarantee); a window never reaches past the next cut
    merged: list = []
    for c in cuts:
        if not merged or c - merged[-1] >= dist_n:
            merged.append(c)
    if not merged:
        # degenerate: one bucket — fall through to a single range window
        # over one partition (the data is one quantile-less sliver)
        w = Window.orderBy(F.col(order_col)).rangeBetween(0, hi)
        out = df.withColumn(_VAL, agg(s.value).over(w)).select(
            *s.key_cols, F.col(_VAL).alias(s.value_col))
        return s._with_df(out, canonicalize=True)

    ocol = F.col(order_col) if integral else F.col(order_col).cast("double")
    from fsharp_dataframe_spark.functions.util import lit_array_sql

    # r16 (guide §7.3): one parse instead of one py4j call per cut;
    # identical double Literals (cuts are approxQuantile floats)
    barr = (lit_array_sql(merged, "double")
            if all(type(c) is float for c in merged) else None)
    if barr is None:
        barr = F.array(*[F.lit(c) for c in merged])
    b = F.size(F.filter(barr, lambda x: x <= ocol))
    base = df.withColumn("__wb", b).withColumn("__ghost", F.lit(False))
    # ghost: bucket i>=1 starts at merged[i-1]; its rows with
    # key < start + dist also serve bucket i-1's trailing windows.
    # greatest(__wb, 1) keeps element_at total — __wb=0 rows are
    # filtered out by the first conjunct, but ANSI element_at(.., 0)
    # always raises, and relying on And short-circuit order surviving
    # the optimizer is fragile.
    start = F.element_at(barr, F.greatest(F.col("__wb"), F.lit(1)))
    ghosts = (
        base.filter((F.col("__wb") >= 1) & (ocol < start + F.lit(dist_n)))
        .withColumn("__wb", F.col("__wb") - 1)
        .withColumn("__ghost", F.lit(True))
    )
    aug = base.unionByName(ghosts)
    w = Window.partitionBy("__wb").orderBy(F.col(order_col)).rangeBetween(0, hi)
    out = (
        aug.withColumn(_VAL, agg(s.value).over(w))
        .filter(~F.col("__ghost"))
        .select(*s.key_cols, F.col(_VAL).alias(s.value_col))
    )
    return s._with_df(out, canonicalize=True)


def series_window_dist(s: Series, dist, agg: Callable[[Column], Column],
                       by: list[str] | None = None,
                       bucketed: bool = True) -> Series:
    """Windows by key distance — `windowDistInto`
    (src/SeriesModule.fs:318-341): a window starts at every key k and
    holds values whose keys satisfy ``(key - k) < dist`` — the
    reference predicate is STRICT, so a key at exactly k + dist is
    excluded.  `rangeBetween` keeps this a native window (no
    self-join): for integral order columns (ints, timestamps as epoch
    seconds) the frame is rangeBetween(0, dist - 1) ≡ [k, k + dist).
    For fractional keys the exclusive bound is not frame-expressible;
    rangeBetween(0, dist) is used and the boundary divergence (keys at
    exactly k + dist included) is accepted.  *dist* is in key units —
    for timestamp keys pass seconds.

    With no ``by=`` and a single key level the global form routes to
    series_window_dist_bucketed (dist-wide range buckets + one-hop
    ghosts — no single-partition window); pass ``bucketed=False`` on
    the Series method to force the plain shape.
    """
    s._require_ordered("window_dist")
    by = by or []
    if bucketed and not by and len(s.key_cols) == 1:
        return series_window_dist_bucketed(s, dist, agg)
    # the range-order level is the first key level NOT covered by the
    # partition columns (with by=[entity], that's the time level)
    key = next((k for k in s.key_cols if k not in by), s.key_cols[0])
    kcol = F.col(key)
    df = s.df
    order_col = key
    dtype = dict(df.dtypes)[key]
    # rangeBetween needs a numeric ordering column; timestamps → epoch seconds
    if dtype.startswith("timestamp"):
        df = df.withColumn("__ord", F.unix_timestamp(kcol))
        order_col, dtype = "__ord", "bigint"
    integral = dtype in ("tinyint", "smallint", "int", "bigint")
    hi = dist - 1 if integral else dist
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(order_col))
        .rangeBetween(0, hi)
    )
    out = df.withColumn(_VAL, agg(s.value).over(w)).select(
        *s.key_cols, F.col(_VAL).alias(s.value_col)
    )
    return s._with_df(out, canonicalize=True)


def _while_schema(s: Series, out_type: str):
    from pyspark.sql.types import StructField, StructType, _parse_datatype_string

    val_type = _parse_datatype_string(out_type)
    fields = [s.df.schema[k] for k in s.key_cols]
    return StructType(fields + [StructField(s.value_col, val_type, True)])


def _while_apply(s: Series, cond, agg, by: list[str] | None, out_type: str, mode: str) -> Series:
    """Shared predicate-window/chunk engine.

    Arbitrary key predicates are inherently sequential (the reference
    scans the key sequence, src/Common/Common.fs:507-547), so this runs
    as `applyInPandas` over ``by=`` partitions — per-entity sequential
    scan, embarrassingly parallel across entities (the 100 TB path).
    Without ``by`` the whole series is one group; use the native
    `series_window_dist` / `series_chunk_size` forms where the
    predicate allows.

    cond: Python ``(first_key, current_key) -> bool`` over the first
    non-``by`` key level.  agg: ``(pandas sub-frame) -> scalar`` — the
    sub-frame carries the key and value columns of the segment.
    """
    import pandas as pd

    s._require_ordered(mode)
    by = by or []
    rest = [k for k in s.key_cols if k not in by] or s.key_cols
    okey = rest[0]
    key_cols = s.key_cols
    value_col = s.value_col
    schema = _while_schema(s, out_type)

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(rest, ignore_index=True)
        keys = pdf[okey].tolist()
        n = len(pdf)
        rows = []
        if mode == "window_while":
            # one window per start i, covering [i, first j where cond
            # fails); empty if cond(k_i, k_i) is itself false
            for i in range(n):
                j = i
                while j < n and cond(keys[i], keys[j]):
                    j += 1
                seg = pdf.iloc[i:j]
                # column-first indexing: pdf.iloc[i][k] builds a row
                # Series upcast to the common dtype (float64), which
                # silently rounds int64 keys above 2^53
                key_vals = [pdf[k].iloc[i] for k in key_cols]
                rows.append((*key_vals, agg(seg) if len(seg) else None))
        else:  # chunk_while: sequential, start row always included
            i = 0
            while i < n:
                j = i + 1
                while j < n and cond(keys[i], keys[j]):
                    j += 1
                seg = pdf.iloc[i:j]
                # column-first indexing: pdf.iloc[i][k] builds a row
                # Series upcast to the common dtype (float64), which
                # silently rounds int64 keys above 2^53
                key_vals = [pdf[k].iloc[i] for k in key_cols]
                rows.append((*key_vals, agg(seg)))
                i = j
        return pd.DataFrame(rows, columns=key_cols + [value_col])

    if by:
        # hot-key guard (r8 VERDICT ask #6): the per-entity scan
        # materializes each entity's history as one Arrow group
        from fsharp_dataframe_spark.functions.util import (
            guard_arrow_group, pin_group_parallelism,
        )

        fn = guard_arrow_group(fn, f"{mode}(by={by})")
        # pin at session parallelism — AQE byte-coalescing is blind to
        # the per-group Python scan cost (r15)
        grouped = pin_group_parallelism(s.df, by).groupBy(*by)
    else:
        # mirror Spark's own WindowExec warning: an arbitrary-predicate
        # scan over the whole series is ONE task; the distance forms
        # (chunk_dist/window_dist) have parallel paths — route there
        # when the predicate allows
        import warnings

        warnings.warn(
            f"global (no by=) {mode} runs as a single sequential task; "
            "use chunk_dist/window_dist for distance predicates, pass "
            "by= for per-entity parallelism, or (window_while only) "
            "declare max_rows= for the bounded parallel path",
            stacklevel=3,
        )
        grouped = s.df.withColumn("__g", F.lit(0)).groupBy("__g")
        schema = schema  # __g not in output schema → dropped automatically
    out = grouped.applyInPandas(fn, schema)
    return Series(out, key=s.key_cols, value=s.value_col, ordered=True, _canonicalize=True)


def series_window_while(s: Series, cond, agg, by: list[str] | None = None,
                        out_type: str = "double",
                        max_rows: int | None = None,
                        n_buckets: int | None = None) -> Series:
    """`windowWhileInto` (src/SeriesModule.fs:336-352): a window starts
    at every element and extends while ``cond(first_key, current_key)``
    holds; ends at the FIRST failure.  Window keyed by its first key.
    Pinned by tests/FSharp.DataFrame.Tests/Common.fs:119-125.

    Unlike chunkWhile (each chunk starts where the previous ended — an
    inherently sequential dependency), every windowWhile window is
    INDEPENDENT of the others: only the data's order, not a carried
    state, feeds it.  So the global (no ``by=``) form parallelizes
    whenever the caller can bound window length: pass ``max_rows`` and
    the series runs on halo-replicated range buckets (each bucket
    ghosted with its next ``max_rows`` rows), one Arrow scan per
    bucket.  A window that would exceed ``max_rows`` rows raises
    ValueError — the declared bound is a CONTRACT, not a truncation
    (silent truncation would corrupt results at exactly the moment the
    data surprises you).  Without ``max_rows`` the global form remains
    the warned single sequential task.

    Sizing: each bucket is one Arrow group, so scale ``n_buckets``
    with the series (n/n_buckets + max_rows rows per group must fit a
    worker); the default 64 suits test scale.
    """
    if max_rows is not None and not by:
        return _window_while_bounded(s, cond, agg, int(max_rows),
                                     out_type, n_buckets)
    return _while_apply(s, cond, agg, by, out_type, "window_while")


def _window_while_bounded(s: Series, cond, agg, max_rows: int,
                          out_type: str, n_buckets: int | None) -> Series:
    import pandas as pd

    from fsharp_dataframe_spark.operators.bucketed import haloed_lag_frame

    s._require_ordered("window_while")
    if max_rows < 1:
        raise ValueError(f"max_rows must be >= 1, got {max_rows}")
    key_cols, value_col = s.key_cols, s.value_col
    okey = key_cols[0]
    schema = _while_schema(s, out_type)
    aug, _w_unused, _keep = haloed_lag_frame(
        s.df, key_cols, halo_fwd=max_rows, n_buckets=n_buckets)

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(key_cols, ignore_index=True)
        keys = pdf[okey].tolist()
        ghost = pdf["__ghost"].tolist()
        # select the contract columns ONCE; per-window iloc is then a
        # view-backed row slice, not a column copy per window
        base = pdf[[*key_cols, value_col]]
        n = len(pdf)
        rows = []
        for i in range(n):
            if ghost[i]:
                continue
            j = i
            while j < n and cond(keys[i], keys[j]):
                j += 1
            if j - i > max_rows:
                raise ValueError(
                    f"window_while(max_rows={max_rows}): window starting "
                    f"at key {keys[i]!r} spans more than max_rows rows — "
                    f"raise max_rows (or drop it for the sequential path)")
            seg = base.iloc[i:j]
            key_vals = [base[c].iloc[i] for c in key_cols]
            rows.append((*key_vals, agg(seg) if len(seg) else None))
        return pd.DataFrame(rows, columns=key_cols + [value_col])

    from fsharp_dataframe_spark.functions.util import pin_group_parallelism

    # pin at session parallelism — the per-bucket Python scan is
    # compute-bound at byte sizes AQE would coalesce away (r15)
    out = (pin_group_parallelism(aug, ["__gbucket"])
           .groupBy("__gbucket").applyInPandas(fn, schema))
    return Series(out, key=key_cols, value=value_col, ordered=True,
                  _canonicalize=True)


def series_chunk_while(s: Series, cond, agg, by: list[str] | None = None,
                       out_type: str = "double") -> Series:
    """`chunkWhileInto` (src/SeriesModule.fs:436-452): adjacent chunks;
    a chunk starts where the previous ended, always contains its start
    row, and extends while ``cond(first_key, current_key)`` holds.
    Chunk keyed by its first key.  Pinned by
    tests/FSharp.DataFrame.Tests/Common.fs:109-117.
    """
    return _while_apply(s, cond, agg, by, out_type, "chunk_while")


def series_chunk_dist(s: Series, dist, agg, by: list[str] | None = None,
                      out_type: str = "double", bucketed: bool = True,
                      n_buckets: int | None = None) -> Series:
    """`chunkDistInto` (src/SeriesModule.fs:416-423): chunkWhile with
    the strict distance predicate ``(current - first) < dist``.

    Unlike arbitrary chunkWhile predicates (inherently sequential), the
    distance form has enough structure to parallelize: chunk starts obey
    ``s_{i+1} = first key >= s_i + dist``, a pointer-chase whose only
    cross-bucket state is the open chunk's start key.  With no ``by=``
    and a single numeric key level the default path is therefore
    series_chunk_dist_bucketed (no single-partition stage); pass
    ``bucketed=False`` to force the sequential reference shape."""
    if not by and bucketed and len(s.key_cols) == 1:
        from pyspark.sql.types import NumericType

        if isinstance(s.df.schema[s.key_cols[0]].dataType, NumericType):
            return series_chunk_dist_bucketed(s, dist, agg, out_type, n_buckets)
    return series_chunk_while(s, lambda f, t: (t - f) < dist, agg, by, out_type)


def series_chunk_dist_bucketed(s: Series, dist, agg, out_type: str = "double",
                               n_buckets: int | None = None) -> Series:
    """Global (un-keyed) chunkDist WITHOUT a single sequential task.

    The recurrence ``start_{i+1} = first key >= start_i + dist`` looks
    sequential, but all any bucket needs from its predecessors is ONE
    number — the open chunk's start key at bucket entry — and that
    entry state can only be (a) "fresh" or (b) a key within ``dist``
    of the bucket's first key.  So:

    1. range-bucket the keys (operators.bucketed census, no sort);
    2. per bucket (parallel applyInPandas): backward DP computes
       ``exit_if_started_at(k)`` for every key in O(n_b); emit it only
       for the possible FIRST-starts — keys in
       ``[first_b, first_b + dist]`` plus their one successor (the
       image of ``min key >= t`` over all feasible entry states);
    3. driver cascade (n_buckets dict lookups, no data): thread the
       open-chunk start through the per-bucket maps, recording each
       bucket's true entry state;
    4. per bucket (parallel): re-derive the in-bucket orbit from the
       (now literal) entry state, label every row with its chunk start,
       then groupBy(chunk_start) + applyInPandas for the aggregate —
       chunks crossing bucket borders meet again in that hash shuffle.

    Driver-side data is the candidate maps: O(n_buckets × keys within
    one dist-window of a bucket start) — boundary data only, tiny
    whenever chunks are smaller than buckets.  That regime is ENFORCED,
    not assumed: when ``dist`` is at least the narrowest bucket span
    (so a bucket's dist-window could cover the whole bucket and the
    candidate collect would pull ~the full key column to the driver),
    the call falls back to the sequential reference shape instead.
    Equivalence vs the sequential path is pinned by
    tests/test_window.py and tests/test_bucketed.py.
    """
    import bisect
    import warnings

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegralType, StructField, StructType, _parse_datatype_string

    from fsharp_dataframe_spark.operators.bucketed import _bucket_expr, range_cuts

    s._require_ordered("chunk_dist")
    k = s.key_cols[0]
    value_col = s.value_col
    key_type = s.df.schema[k].dataType
    # key arithmetic stays in the key's OWN type: float64 is exact for
    # double keys but silently rounds integers above 2^53 (epoch
    # nanoseconds), and the sequential path it must match uses exact
    # Python ints
    integral = isinstance(key_type, IntegralType)
    dist_n = int(dist) if integral else float(dist)

    # cuts only — no census job: the carry cascade iterates whatever
    # raw bucket ids exist (sparse ids with gaps are fine), so one
    # quantile sketch replaces the census's extra count-by-bucket pass
    cuts = range_cuts(s.df, k, n_buckets)
    spans = [b - a for a, b in zip(cuts, cuts[1:])]
    if len(cuts) < 2 or float(dist) >= min(spans):
        # degenerate regime: chunks are bucket-scale or the data is a
        # quantile-less sliver — candidate maps would be ~the whole
        # column.  The output here is tiny (≤ ~n_buckets chunks), so
        # the sequential scan's single task is the honest plan.
        warnings.warn(
            "global chunk_dist: dist >= bucket key spacing — falling back "
            "to the sequential single-task path (chunks are bucket-scale; "
            "raise n_buckets only if the key range genuinely spans many "
            "chunks)",
            stacklevel=3,
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return series_chunk_while(
                s, lambda f, t: (t - f) < dist, agg, None, out_type)
    bexpr = _bucket_expr(F.col(k), cuts)
    out_schema = StructType([
        s.df.schema[k],
        StructField(value_col, _parse_datatype_string(out_type), True),
    ])
    base = s.df.withColumn("__cb", bexpr)

    cand_schema = StructType([
        StructField("__cb", _parse_datatype_string("int"), False),
        StructField("cand", key_type, False),
        StructField("exit", key_type, False),
    ])

    def cand_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        keys = np.sort(pdf[k].to_numpy())
        n = len(keys)
        exits = np.empty(n, dtype=keys.dtype)
        for i in range(n - 1, -1, -1):
            j = int(np.searchsorted(keys, keys[i] + dist_n, side="left"))
            exits[i] = keys[i] if j >= n else exits[j]
        hi = int(np.searchsorted(keys, keys[0] + dist_n, side="right"))
        m = min(hi + 1, n)
        return pd.DataFrame({
            "__cb": [int(pdf["__cb"].iloc[0])] * m,
            "cand": keys[:m],
            "exit": exits[:m],
        })

    cand_rows = (base.select("__cb", k).groupBy("__cb")
                 .applyInPandas(cand_fn, cand_schema).collect())
    # collected values arrive as exact Python scalars (int for integral
    # keys), so the cascade arithmetic below matches the sequential
    # path bit-for-bit at any key magnitude
    by_bucket: dict[int, list[tuple]] = {}
    for r in cand_rows:
        by_bucket.setdefault(r["__cb"], []).append((r["cand"], r["exit"]))

    open_start = None
    entry: dict[int, object] = {}
    for bkt in sorted(by_bucket):
        lst = sorted(by_bucket[bkt])
        cand_keys = [c for c, _ in lst]
        if open_start is None:
            entry[bkt] = lst[0][0]
            open_start = lst[0][1]
            continue
        entry[bkt] = open_start
        i = bisect.bisect_left(cand_keys, open_start + dist_n)
        if i < len(lst):
            open_start = lst[i][1]
        # else: the open chunk swallows the whole bucket — carry unchanged

    chunk_col_type = s.df.schema[k].dataType
    mid_schema = StructType([
        s.df.schema[k], s.df.schema[value_col],
        StructField("__chunk", chunk_col_type, False),
    ])

    def assign_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(k, ignore_index=True)
        keys = pdf[k].to_numpy()
        n = len(keys)
        starts = [entry[int(pdf["__cb"].iloc[0])]]
        while True:
            j = int(np.searchsorted(keys, starts[-1] + dist_n, side="left"))
            if j >= n:
                break
            starts.append(keys[j].item())
        idx = np.searchsorted(np.asarray(starts, dtype=keys.dtype), keys,
                              side="right") - 1
        out = pdf[[k, value_col]].copy()
        out["__chunk"] = [starts[i] for i in idx]
        return out

    from fsharp_dataframe_spark.functions.util import pin_group_parallelism

    labeled = (pin_group_parallelism(base, ["__cb"])
               .groupBy("__cb").applyInPandas(assign_fn, mid_schema))

    def agg_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(k, ignore_index=True)
        return pd.DataFrame([[pdf["__chunk"].iloc[0], agg(pdf)]],
                            columns=[k, value_col])

    out = (pin_group_parallelism(labeled, ["__chunk"])
           .groupBy("__chunk").applyInPandas(agg_fn, out_schema))
    return Series(out, key=[k], value=value_col, ordered=True, _canonicalize=True)
