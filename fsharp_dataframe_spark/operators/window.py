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


def series_shift(s: Series, n: int, by: list[str] | None = None) -> Series:
    """`shift n`: value at key[i] becomes value[i-n]; boundary keys
    dropped (reference builds it from WindowSize(|n|+1, Skip))."""
    s._require_ordered("shift")
    w = _w(s, by)
    shifted = F.lag(s.value, n).over(w)  # lag handles negative n as lead
    in_range = F.lag(F.lit(1), n).over(w).isNotNull()
    out = (
        s.df.withColumn(_VAL, shifted)
        .withColumn("__ok", in_range)
        .filter(F.col("__ok"))
        .select(*s.key_cols, F.col(_VAL).alias(s.value_col))
    )
    return s._with_df(out)


def series_diff(s: Series, n: int, by: list[str] | None = None) -> Series:
    """`diff n`: x[k] - x[k-n]; boundary keys dropped
    (tests/FSharp.DataFrame.Tests/Series.fs:74-81)."""
    s._require_ordered("diff")
    w = _w(s, by)
    d = s.value - F.lag(s.value, n).over(w)
    in_range = F.lag(F.lit(1), n).over(w).isNotNull()
    out = (
        s.df.withColumn(_VAL, d)
        .withColumn("__ok", in_range)
        .filter(F.col("__ok"))
        .select(*s.key_cols, F.col(_VAL).alias(s.value_col))
    )
    return s._with_df(out)


def series_pairwise(s: Series, f: Callable[[Column, Column], Column] | None = None,
                    by: list[str] | None = None) -> Series:
    """(prev, cur) combined by *f* (default: struct pair) — `Pairwise`
    (src/Series.fs:461-500).  One key shorter (first key dropped)."""
    s._require_ordered("pairwise")
    w = _w(s, by)
    prev = F.lag(s.value, 1).over(w)
    in_range = F.lag(F.lit(1), 1).over(w).isNotNull()
    combined = f(prev, s.value) if f else F.struct(prev.alias("prev"), s.value.alias("cur"))
    out = (
        s.df.withColumn(_VAL, combined)
        .withColumn("__ok", in_range)
        .filter(F.col("__ok"))
        .select(*s.key_cols, F.col(_VAL).alias(s.value_col))
    )
    return s._with_df(out, canonicalize=False)


def series_window_size(s: Series, n: int, agg: Callable[[Column], Column],
                       boundary: str = AT_BEGINNING, by: list[str] | None = None) -> Series:
    """Sliding n-row windows aggregated by *agg* — `windowSizeInto`
    (src/SeriesModule.fs:281-301).  *agg* receives the value Column and
    must return a window-aggregable Column expression (F.sum/avg/...).
    """
    s._require_ordered("window_size")
    base = _w(s, by)
    if boundary in (AT_BEGINNING, SKIP):
        frame = base.rowsBetween(-(n - 1), 0)  # keyed by last key of window
    elif boundary == AT_ENDING:
        frame = base.rowsBetween(0, n - 1)  # keyed by first key of window
    else:
        raise ValueError(boundary)
    out = s.df.withColumn(_VAL, agg(s.value).over(frame))
    if boundary == SKIP:
        out = out.withColumn(_POS, F.row_number().over(base)).filter(F.col(_POS) >= n)
    out = out.select(*s.key_cols, F.col(_VAL).alias(s.value_col))
    return s._with_df(out, canonicalize=True)


def series_chunk_size(s: Series, n: int, agg: Callable[[Column], Column],
                      boundary: str = AT_ENDING, by: list[str] | None = None) -> Series:
    """Non-overlapping n-row chunks — `chunkSizeInto`
    (src/SeriesModule.fs:383-399).  Chunk keyed by its FIRST key.

    AtEnding (and the plain `chunk`): chunks aligned from the start,
    incomplete chunk last.  AtBeginning: aligned from the end,
    incomplete chunk first.  Skip: incomplete chunk dropped (semantics
    tests/FSharp.DataFrame.Tests/Common.fs:152-191; Skip composes with
    either alignment — here Skip alone means start-aligned + drop).
    """
    s._require_ordered("chunk_size")
    by = by or []
    base = _w(s, by)
    cw = Window.partitionBy(*by)
    df = s.df.withColumn(_POS, F.row_number().over(base) - 1)
    if boundary in (AT_ENDING, SKIP):
        chunk_id = F.floor(F.col(_POS) / n)
        df = df.withColumn("__chunk", chunk_id)
        if boundary == SKIP:
            df = df.withColumn(_N, F.count(F.lit(1)).over(cw))
            df = df.filter((F.col("__chunk") + 1) * n <= F.col(_N))
    elif boundary == AT_BEGINNING:
        df = df.withColumn(_N, F.count(F.lit(1)).over(cw))
        pos_from_end = F.col(_N) - 1 - F.col(_POS)
        df = df.withColumn("__chunk", -F.floor(pos_from_end / n))
    else:
        raise ValueError(boundary)
    rest = [k for k in s.key_cols if k not in by]
    first_key = [F.min(F.col(k)).alias(k) for k in rest]
    out = df.groupBy(*by, "__chunk").agg(*first_key, agg(s.value).alias(s.value_col))
    out = out.select(*s.key_cols, s.value_col)
    return Series(out, key=s.key_cols, value=s.value_col, ordered=True, _canonicalize=True)


def series_window_dist(s: Series, dist, agg: Callable[[Column], Column],
                       by: list[str] | None = None) -> Series:
    """Windows by key distance — `windowDistInto`
    (src/SeriesModule.fs:318-341): for each key k, aggregate values with
    keys in [k, k + dist].  `rangeBetween` keeps this a native window
    (no self-join).  *dist* is in key units (numeric key) — for
    timestamp keys pass seconds and the key is range-ordered on its
    epoch value.
    """
    s._require_ordered("window_dist")
    key = s.key_cols[0]
    kcol = F.col(key)
    df = s.df
    order_col = key
    # rangeBetween needs a numeric ordering column; timestamps → epoch seconds
    if dict(df.dtypes)[key].startswith("timestamp"):
        df = df.withColumn("__ord", F.unix_timestamp(kcol))
        order_col = "__ord"
    w = (
        Window.partitionBy(*(by or []))
        .orderBy(F.col(order_col))
        .rangeBetween(0, dist)
    )
    out = df.withColumn(_VAL, agg(s.value).over(w)).select(
        *s.key_cols, F.col(_VAL).alias(s.value_col)
    )
    return s._with_df(out, canonicalize=True)
