"""Key-aligned set operations and zipping (SURVEY.md §2.3, §2.4 exact paths).

Reference semantics reproduced here:

- ``Series.Union(other, behavior)`` — key union; overlap resolved by
  PreferLeft (default) / PreferRight / Exclusive-throws
  (src/Series.fs:17-23, 346-359; index union
  src/Indices/LinearIndex.fs:300-309).
- ``Series.Append`` — disjoint-key union, throws if both sides define a
  value (src/Series.fs:293-300; the LeftOrRight transform
  src/Vectors/VectorHelpers.fs:176-180).
- ``Series.Zip(other, kind, lookup)`` — align by key into value pairs;
  Outer/Inner/Left/Right; inexact lookups only with Left/Right
  (enforced src/JoinHelpers.fs:58-61).

Spark mapping: one ``full_outer``/``inner``/``left``/``right`` join on
the key column(s) + ``coalesce`` for overlap preference.  The reference
picks merge-join for ordered and hash-join for unordered inputs
(src/Common/Common.fs:684-730); Catalyst makes the same choice from
stats (sort-merge vs broadcast-hash), with AQE re-planning at runtime —
we do not hand-schedule it.

The Exclusive conflict check is an aggregate over the joined result
(one extra job) — the reference throws eagerly too; this is the
distributed equivalent of src/Vectors/VectorHelpers.fs:176-180.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fsharp_dataframe_spark.series import (
    EXACT,
    EXCLUSIVE,
    NEAREST_GREATER,
    NEAREST_SMALLER,
    PREFER_LEFT,
    PREFER_RIGHT,
    KeyConflictError,
    Series,
)


def _aligned(left: Series, right: Series) -> tuple[DataFrame, DataFrame, list[str]]:
    """Rename both sides onto common key column names + l/r value names."""
    keys = left.key_cols
    l = left.df.select(*keys, F.col(left.value_col).alias("_l"))
    r = right.df.select(
        *[F.col(rk).alias(lk) for rk, lk in zip(right.key_cols, keys)],
        F.col(right.value_col).alias("_r"),
    )
    return l, r, keys


def series_union(left: Series, right: Series, behavior: str = PREFER_LEFT) -> Series:
    """Union of two series by key (see module docstring)."""
    l, r, keys = _aligned(left, right)
    joined = l.join(r, on=keys, how="full_outer")
    if behavior == PREFER_LEFT:
        value = F.coalesce(F.col("_l"), F.col("_r"))
    elif behavior == PREFER_RIGHT:
        value = F.coalesce(F.col("_r"), F.col("_l"))
    elif behavior == EXCLUSIVE:
        conflicts = joined.filter(F.col("_l").isNotNull() & F.col("_r").isNotNull()).limit(1).count()
        if conflicts:
            raise KeyConflictError(
                "union(Exclusive)/append: key defined on both sides "
                "(reference throws, src/Vectors/VectorHelpers.fs:176-180)"
            )
        value = F.coalesce(F.col("_l"), F.col("_r"))
    else:
        raise ValueError(behavior)
    out = joined.select(*keys, value.alias(left.value_col))
    # union of ordered indices stays ordered only when key ranges permit;
    # the reference re-detects (src/Indices/LinearIndex.fs:298-309) — we
    # conservatively keep ordered iff both inputs were ordered (key order
    # is logical, not physical, so this is safe).
    return Series(out, key=keys, value=left.value_col,
                  ordered=left.ordered and right.ordered, _canonicalize=False)


_JOIN_KIND = {"outer": "full_outer", "inner": "inner", "left": "left", "right": "right"}


def series_zip(left: Series, right: Series, kind: str = "outer", lookup: str = EXACT) -> DataFrame:
    """Align two series by key → DataFrame (key, left_value, right_value).

    Exact: one equi-join.  Inexact (Left/Right + NearestSmaller/Greater):
    the as-of align — keys of the *probe* side, values of the other side
    filled from the nearest key with a value (src/JoinHelpers.fs:42-61:
    restrictToRowIndex + fillMissing rewrite).  Implemented in
    operators/asof.py as a union-of-keys + ignorenulls window fill.
    """
    if lookup == EXACT:
        l, r, keys = _aligned(left, right)
        joined = l.join(r, on=keys, how=_JOIN_KIND[kind])
        return joined.select(*keys, F.col("_l").alias("left_value"), F.col("_r").alias("right_value"))

    if kind not in ("left", "right"):
        raise ValueError(
            "inexact lookup is only valid with left/right zip "
            "(reference enforces this, src/JoinHelpers.fs:58-61)"
        )
    from fsharp_dataframe_spark.operators.asof import asof_zip

    direction = "backward" if lookup == NEAREST_SMALLER else "forward"
    if lookup not in (NEAREST_SMALLER, NEAREST_GREATER):
        raise ValueError(lookup)
    if kind == "left":
        return asof_zip(left, right, direction)
    out = asof_zip(right, left, direction)
    return out.select(*right.key_cols,
                      F.col("right_value").alias("left_value"),
                      F.col("left_value").alias("right_value"))


def series_zip_into(left: Series, right: Series, f: Callable[[Column, Column], Column],
                    kind: str = "inner", lookup: str = EXACT) -> Series:
    """Zip + combine — `zipInto`/`zipAlignInto` (src/SeriesModule.fs:1012-1034).
    Missing where either side is missing (the combiner sees NULLs and
    Column arithmetic propagates them, matching reference outer-zip
    missing semantics src/Series.fs:589-595)."""
    zipped = series_zip(left, right, kind, lookup)
    out = zipped.select(
        *left.key_cols,
        f(F.col("left_value"), F.col("right_value")).alias(left.value_col),
    )
    return Series(out, key=left.key_cols, value=left.value_col,
                  ordered=left.ordered and kind in ("left",), _canonicalize=True)
