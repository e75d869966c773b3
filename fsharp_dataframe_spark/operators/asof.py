"""As-of (inexact-lookup) alignment — the core custom primitive.

Reference semantics (SURVEY.md §2.4, §7.2 step 4): an inexact
Left/Right join with ``Lookup.NearestSmaller``/``NearestGreater`` finds,
for each probe key, the nearest source key <= / >= it **that has a
value**.  The reference implements this as a fill-then-reindex rewrite:
forward/backward-fill the source vector, then reindex by nearest key
(src/JoinHelpers.fs:49-53; lookup engine
src/Indices/LinearIndex.fs:105-148; behavior pinned by
tests/FSharp.DataFrame.Tests/Series.fs:330-345).

Spark-first equivalent (no native SQL as-of): **union-of-keys +
ignorenulls window fill**:

1. union source rows and probe rows into one keyed relation, tagging
   the side;
2. over a window ordered by (key, side) — side-tiebreak so an exact
   key match is visible to its own probe row — take
   ``last(value, ignorenulls=True)`` over the preceding frame
   (NearestSmaller) or ``first(...)`` over the following frame
   (NearestGreater), per value column;
3. keep only probe rows.

Cost model: one union + one window sort — O(n log n), no join
explosion, and *one* pass regardless of how many value columns are
filled (the reference applies one relocation plan to every column,
src/Frame.fs:155-156 — same shape).

Scale: with a ``by=`` entity partition (events per user, quotes per
ticker) the window is hash-partitioned and scales linearly — this is
the 100 TB path.  Without ``by`` a total key order is required; Spark
plans a single-partition window.  For large un-keyed as-ofs use
``bucketed=True``: rows are range-bucketed by key, filled within each
bucket, and bucket-boundary carry-in values are computed from a tiny
per-bucket aggregate joined back by broadcast — two narrow passes, no
single-task bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fsharp_dataframe_spark.series import Series

_SIDE = "__asof_side"
_BUCKET = "__asof_bucket"


def _typed_null(df: DataFrame, col: str):
    return F.lit(None).cast(df.schema[col].dataType)


def _tolerance_axis(df: DataFrame, key: str) -> tuple["F.Column", float]:
    """Distance axis for the ``tolerance`` lapse rule: exact integer
    microseconds for timestamp keys (tolerance given in SECONDS, the
    pandas merge_asof convention), the key's own units for numeric
    keys.  Any other leading-key type raises up front — on the
    non-tolerance path every orderable key works, but a distance bound
    needs subtraction, and a silent cast of e.g. a string key would
    either throw an opaque ANSI error or null the axis and drop every
    match."""
    dt = dict(df.dtypes)[key]
    if dt == "timestamp_ntz":
        return F.unix_micros(F.col(key).cast("timestamp")), 1_000_000.0
    if dt.startswith("timestamp"):
        return F.unix_micros(F.col(key)), 1_000_000.0
    if dt in ("tinyint", "smallint", "int", "bigint", "float",
              "double") or dt.startswith("decimal"):
        return F.col(key).cast("double"), 1.0
    raise TypeError(
        f"as-of tolerance requires a numeric or timestamp leading key; "
        f"got {key!r}: {dt} (supported: tinyint/smallint/int/bigint/"
        f"float/double/decimal, timestamp/timestamp_ntz)")


def _union_fill(
    probe_df: DataFrame,
    source_df: DataFrame,
    key_cols: list[str],
    fill_cols: list[str],
    probe_cols: list[str],
    direction: str,
    by: list[str] | None,
    bucketed: bool = False,
    n_buckets: int | None = None,
    tolerance: float | None = None,
) -> DataFrame:
    """Shared engine: fill *fill_cols* (from source) onto probe rows.

    probe_df: columns = by + key_cols + probe_cols
    source_df: columns = by + key_cols + fill_cols
    Returns: by + key_cols + probe_cols + fill_cols (probe rows only).

    ``tolerance`` (pandas merge_asof parity): a match is only kept when
    |probe_key - matched_source_key| <= tolerance, measured on the
    LEADING key — in the key's own units for numeric keys, in SECONDS
    for timestamp keys.  Per-column semantics are preserved (the
    reference's "nearest key that HAS a value", Index.fs:15-28): each
    fill column independently carries the last source row where THAT
    column is non-null, and the tolerance tests that row's key.  Same
    single window pass — the carried value just rides a (key, value)
    struct so the matched key is testable.  Exact matches (distance 0)
    always survive.
    """
    by = by or []
    src = source_df.select(
        *by, *key_cols, *fill_cols,
        *[_typed_null(probe_df, c).alias(c) for c in probe_cols],
        F.lit(0).alias(_SIDE),
    )
    prb = probe_df.select(
        *by, *key_cols,
        *[_typed_null(source_df, c).alias(c) for c in fill_cols],
        *probe_cols,
        F.lit(1).alias(_SIDE),
    )
    u = src.unionByName(prb)

    if bucketed and not by:
        return _bucketed_fill(u, src, prb, key_cols, fill_cols, probe_cols,
                              direction, n_buckets, tolerance=tolerance)

    key_order = [F.col(k) for k in key_cols]
    if direction == "backward":
        # source (side=0) sorts before probe (side=1) at equal key →
        # exact matches are inside the preceding frame.
        w = (
            Window.partitionBy(*by)
            .orderBy(*key_order, F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = {c: F.last(F.col(c), ignorenulls=True).over(w) for c in fill_cols}
    elif direction == "forward":
        # probe (side=1) sorts before source (side=0) at equal key →
        # exact matches are inside the following frame.
        w = (
            Window.partitionBy(*by)
            .orderBy(*key_order, F.col(_SIDE).desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        filled = {c: F.first(F.col(c), ignorenulls=True).over(w) for c in fill_cols}
    else:
        raise ValueError(direction)

    if tolerance is not None:
        axis, unit = _tolerance_axis(u, key_cols[0])
        tol = float(tolerance) * unit
        pick = F.first if direction == "forward" else F.last
        filled = {}
        for c in fill_cols:
            carried = pick(
                F.when((F.col(_SIDE) == 0) & F.col(c).isNotNull(),
                       F.struct(axis.alias("__k"), F.col(c).alias("__v"))),
                ignorenulls=True).over(w)
            dist = ((carried["__k"] - axis) if direction == "forward"
                    else (axis - carried["__k"]))
            filled[c] = F.when(dist <= F.lit(tol), carried["__v"])

    out = u.withColumns(filled).filter(F.col(_SIDE) == 1)
    return out.select(*by, *key_cols, *probe_cols, *fill_cols)


def _bucketed_fill(
    u: DataFrame,
    src: DataFrame,
    prb: DataFrame,
    key_cols: list[str],
    fill_cols: list[str],
    probe_cols: list[str],
    direction: str,
    n_buckets: int | None,
    tolerance: float | None = None,
) -> DataFrame:
    """Scalable global as-of: range-bucket the key space, window within
    buckets, then patch bucket-local misses with a broadcast of each
    bucket's carry-in value (the last non-null value of earlier buckets).

    ``tolerance``: same lapse rule as the keyed path — the carried
    value rides a (matched-key, value) struct through BOTH the
    in-bucket window and the per-bucket carry cascade, so the match
    distance is testable after the coalesce patch.  Bucket boundaries,
    exchanges, and the broadcast-scale carry relation are identical to
    the non-tolerance plan.

    Bucket boundaries come from sampled quantiles (approxQuantile — the
    same mechanism repartitionByRange uses), so bucket assignment is a
    pure function of the key: no global window anywhere in the plan,
    and rows with equal keys always share a bucket (exact-match
    side-tiebreaks resolve inside one window partition).

    The bucket column is attached to EACH side before the union (the
    sketch still reads the pre-built union): above >128 cuts the
    bucket expression carries a higher-order-function lambda, and a
    lambda ABOVE a Union crashes constraint propagation
    (UnionBase.rewriteConstraints "key not found") — the same analyzer
    bug the flat path's indicator-sum rewrite dodges, reproduced at
    the auto-sized scale this operator targets.
    """
    from fsharp_dataframe_spark.operators.bucketed import (
        _bucket_expr, range_cuts,
    )

    # Composite keys (r9, closes VERDICT r8 "missing" #2): bucket on
    # the LEADING key only — lexicographic order means every row of
    # bucket i sorts before every row of bucket i+1 by leading key
    # alone, and rows tied on the leading key share a bucket (cut
    # assignment is a pure function of it), so the remaining key
    # levels only ever break ties INSIDE one window partition.  The
    # in-bucket window sorts the full composite; the per-bucket carry
    # orders by a composite struct (Spark struct comparison is
    # lexicographic).
    k = key_cols[0]
    composite = (F.col(k) if len(key_cols) == 1
                 else F.struct(*[F.col(c) for c in key_cols]))
    cuts = range_cuts(u, k, n_buckets)

    def bucket() -> "F.Column":
        # a FRESH expression per union branch: the >128-cut form holds
        # lambda variables with unique expression ids — sharing one
        # Column instance across branches mis-binds them at runtime
        if cuts:
            return _bucket_expr(F.col(k), cuts)
        # non-numeric or single-valued key space: one bucket (correct,
        # just not parallel — the plain path's behavior)
        return F.lit(0)

    u = (src.withColumn(_BUCKET, bucket())
         .unionByName(prb.withColumn(_BUCKET, bucket())))
    asc = direction == "backward"
    side_order = F.col(_SIDE).asc() if asc else F.col(_SIDE).desc()
    if asc:
        w = (
            Window.partitionBy(_BUCKET)
            .orderBy(*[F.col(c) for c in key_cols], side_order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = F.last
    else:
        w = (
            Window.partitionBy(_BUCKET)
            .orderBy(*[F.col(c) for c in key_cols], side_order)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = F.first
    if tolerance is None:
        local = {c: pick(F.col(c), ignorenulls=True).over(w)
                 for c in fill_cols}
        carried_of = None
    else:
        axis, unit = _tolerance_axis(u, k)
        tol = float(tolerance) * unit

        def carried_of(c: str) -> "F.Column":
            return F.struct(axis.alias("__k"), F.col(c).alias("__v"))

        # the carried value rides a (key, value) struct so the lapse
        # rule can test the matched key after the carry patch
        local = {f"__s_{c}": pick(
            F.when((F.col(_SIDE) == 0) & F.col(c).isNotNull(),
                   carried_of(c)),
            ignorenulls=True).over(w) for c in fill_cols}
    filled = u.withColumns(local)

    # carry-in per bucket: last (first) NON-NULL source value of each
    # bucket — masking the ordering key on null values makes max_by /
    # min_by skip them, so a bucket whose boundary row has a missing
    # value still carries its newest *valued* row ("nearest key that
    # has a value") — cascaded across buckets (n_buckets rows, a
    # broadcast-scale relation).  The cascade runs over a COMPLETE
    # bucket spine: buckets holding only probe rows have no per_bucket
    # row, and without the spine their probes would read a NULL carry
    # instead of the newest earlier bucket's value (bug surfaced at
    # sparse scale factors where many buckets contain no source rows).
    n_merged = len(cuts) + 1 if cuts else 1
    spine = u.sparkSession.range(n_merged).select(F.col("id").cast("int").alias(_BUCKET))
    src_only = u.filter(F.col(_SIDE) == 0)
    # per-bucket carried payload: the raw value without tolerance, the
    # (key, value) struct with it — the cascade and patch below are
    # payload-agnostic (last/first ignorenulls skips NULL structs from
    # source-free spine buckets exactly like NULL scalars)
    payload = carried_of if carried_of is not None else F.col
    best_by = F.max_by if asc else F.min_by
    per_bucket = src_only.groupBy(_BUCKET).agg(
        *[best_by(payload(c), F.when(F.col(c).isNotNull(), composite)).alias(c)
          for c in fill_cols]
    )
    if asc:
        cascade_w = Window.orderBy(F.col(_BUCKET)).rowsBetween(Window.unboundedPreceding, -1)
        cascade = F.last
    else:
        cascade_w = Window.orderBy(F.col(_BUCKET)).rowsBetween(1, Window.unboundedFollowing)
        cascade = F.first
    carry = spine.join(per_bucket, _BUCKET, "left").select(
        _BUCKET, *[cascade(F.col(c), ignorenulls=True).over(cascade_w).alias(f"__carry_{c}") for c in fill_cols]
    )
    out = filled.join(F.broadcast(carry), on=_BUCKET, how="left")
    if carried_of is None:
        patched = {c: F.coalesce(F.col(c), F.col(f"__carry_{c}"))
                   for c in fill_cols}
    else:
        # lapse rule AFTER the coalesce patch: the nearest valued
        # source row (in-bucket or carried) must sit within tolerance
        # of the probe key; exact matches (distance 0) always survive
        patched = {}
        for c in fill_cols:
            s = F.coalesce(F.col(f"__s_{c}"), F.col(f"__carry_{c}"))
            dist = (axis - s["__k"]) if asc else (s["__k"] - axis)
            patched[c] = F.when(dist <= F.lit(tol), s["__v"])
    out = out.withColumns(patched).filter(F.col(_SIDE) == 1)
    return out.select(*key_cols, *probe_cols, *fill_cols)


def asof_lookup(
    probe_keys_df: DataFrame,
    source_df: DataFrame,
    key_cols: list[str],
    value_col: str,
    direction: str = "backward",
    by: list[str] | None = None,
    bucketed: bool = False,
    tolerance: float | None = None,
) -> DataFrame:
    """Reindex a (key, value) source to a probe key list with as-of
    semantics — reference ``GetItems(keys, lookup)`` / ``Reindex``
    (src/Series.fs:133-152, src/Indices/LinearIndex.fs:354-360).
    ``tolerance`` bounds the match distance (see _union_fill).

    Returns DataFrame(key_cols..., value_col).
    """
    probe = probe_keys_df.select(*(by or []), *key_cols)
    src = source_df.select(*(by or []), *key_cols, value_col)
    return _union_fill(probe, src, key_cols, [value_col], [], direction, by,
                       bucketed, tolerance=tolerance)


def asof_zip(left: Series, right: Series, direction: str = "backward",
             by: list[str] | None = None, bucketed: bool = False,
             tolerance: float | None = None) -> DataFrame:
    """Left as-of zip: left's keys and values + right's value as-of each
    left key — reference ``Series.Zip(other, JoinKind.Left, NearestX)``
    (src/Series.fs:303-335).  Returns (key..., left_value, right_value).
    """
    keys = left.key_cols
    probe = left.df.select(*(by or []), *keys, F.col(left.value_col).alias("left_value"))
    src = right.df.select(
        *(by or []),
        *[F.col(rk).alias(lk) for rk, lk in zip(right.key_cols, keys)],
        F.col(right.value_col).alias("right_value"),
    )
    return _union_fill(probe, src, keys, ["right_value"], ["left_value"],
                       direction, by, bucketed, tolerance=tolerance)


def asof_align_frame(
    probe_df: DataFrame,
    source_df: DataFrame,
    key_cols: list[str],
    fill_cols: list[str] | None = None,
    direction: str = "backward",
    by: list[str] | None = None,
    bucketed: bool = False,
    tolerance: float | None = None,
) -> DataFrame:
    """Frame-level as-of join: every *fill_cols* column of source is
    aligned to probe's keys in ONE window pass — the Spark analog of the
    reference's plan-once / execute-per-column join
    (src/Frame.fs:146-167, 155-156).
    """
    by = by or []
    if fill_cols is None:
        fill_cols = [c for c in source_df.columns if c not in key_cols and c not in by]
    probe_cols = [c for c in probe_df.columns if c not in key_cols and c not in by]
    return _union_fill(
        probe_df.select(*by, *key_cols, *probe_cols),
        source_df.select(*by, *key_cols, *fill_cols),
        key_cols,
        fill_cols,
        probe_cols,
        direction,
        by,
        bucketed,
        tolerance=tolerance,
    )
