"""Series: a key-indexed single-valued column over a Spark DataFrame.

Reference: ``Series<'K,'V>`` = one index + one vector (src/Series.fs:43-47).
Here a Series is a DataFrame with ``key_cols + [value_col]`` plus metadata:

- ``key_cols``  — one column per key level.  Multi-level (tuple) keys of
  the reference (src/Indices/MultiKey.fs) are simply multiple key columns.
- ``ordered``   — orderedness flag.  The reference detects sortedness at
  index construction (src/Indices/LinearIndex.fs:26-43); a distributed
  engine cannot probe cheaply, so the flag is explicit: ``order_rows()``
  sets it, constructors accept it, and ordered-only operators raise
  ``UnorderedSeriesError`` exactly where the reference throws
  (src/Indices/LinearIndex.fs:210-211, 263-264).

Every operator is a Column-expression transformation — Catalyst plans it,
whole-stage codegen runs it.  No collect()s in transformations; actions
happen only in explicitly point-wise APIs (``get``, ``first_value``, ...)
and in the test comparator.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fsharp_dataframe_spark.missing import canonicalize_missing


class UnorderedSeriesError(RuntimeError):
    """Raised when an ordered-only operator hits an unordered series.

    Mirrors the reference's invalidOp for unordered indices
    (src/Indices/LinearIndex.fs:210-211, 263-264).
    """


class KeyConflictError(RuntimeError):
    """Raised when Append / Union(Exclusive) sees a doubly-defined key
    (src/Vectors/VectorHelpers.fs:176-180)."""


# Lookup semantics (reference src/Indices/Index.fs:15-28)
EXACT = "exact"
NEAREST_SMALLER = "nearest_smaller"  # Lookup.NearestSmaller: nearest key <= k with a value
NEAREST_GREATER = "nearest_greater"  # Lookup.NearestGreater: nearest key >= k with a value

# Union behavior (reference src/Series.fs:17-23)
PREFER_LEFT = "prefer_left"
PREFER_RIGHT = "prefer_right"
EXCLUSIVE = "exclusive"

# Boundary behavior for windowing/chunking (src/Common/Common.fs:79-83)
AT_BEGINNING = "at_beginning"
AT_ENDING = "at_ending"
SKIP = "skip"


class WindowSize:
    """Aggregation spec — reference `WindowSize(n, Boundary)`
    (src/Indices/Index.fs:35-52)."""

    def __init__(self, n: int, boundary: str = AT_BEGINNING):
        self.n, self.boundary = n, boundary


class ChunkSize:
    def __init__(self, n: int, boundary: str = AT_ENDING):
        self.n, self.boundary = n, boundary


class WindowDist:
    def __init__(self, dist):
        self.dist = dist


class ChunkDist:
    def __init__(self, dist):
        self.dist = dist


class WindowWhile:
    def __init__(self, cond):
        self.cond = cond


class ChunkWhile:
    def __init__(self, cond):
        self.cond = cond


def _as_list(x) -> list:
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


class Series:
    """Key-indexed series over a Spark DataFrame (see module docstring)."""

    def __init__(
        self,
        df: DataFrame,
        key: str | list[str] = "key",
        value: str = "value",
        ordered: bool = False,
        _canonicalize: bool = True,
    ):
        self.key_cols: list[str] = _as_list(key)
        self.value_col: str = value
        cols = self.key_cols + [value]
        df = df.select(*cols)
        if _canonicalize:
            df = canonicalize_missing(df)
        self.df: DataFrame = df
        self.ordered: bool = ordered

    # ------------------------------------------------------------------
    # construction (reference src/Series.fs:774-781, src/SeriesExtensions.fs:19-29)
    # ------------------------------------------------------------------

    @staticmethod
    def of_observations(
        spark, pairs: Iterable[tuple], schema: str = "key string, value double", ordered: bool = False
    ) -> "Series":
        """Build from (key, value) pairs — `Series.ofObservations`."""
        df = spark.createDataFrame(list(pairs), schema)
        key, value = [f.name for f in df.schema.fields][:2]
        return Series(df, key=key, value=value, ordered=ordered)

    @staticmethod
    def of_values(spark, values: Iterable, value_type: str = "double") -> "Series":
        """Ordinal int keys 0..n-1 — `Series.ofValues`."""
        rows = [(i, v) for i, v in enumerate(values)]
        df = spark.createDataFrame(rows, f"key long, value {value_type}")
        return Series(df, key="key", value="value", ordered=True)

    @staticmethod
    def of_nullables(spark, values: Iterable, value_type: str = "double") -> "Series":
        """`Series.ofNullables` (src/SeriesExtensions.fs:25-29): ordinal
        keys, None entries become missing."""
        return Series.of_values(spark, values, value_type)

    # ------------------------------------------------------------------
    # metadata / plumbing
    # ------------------------------------------------------------------

    @property
    def key(self) -> Column:
        """Single-level key column (raises on multi-level)."""
        if len(self.key_cols) != 1:
            raise ValueError(f"series has multi-level key {self.key_cols}")
        return F.col(self.key_cols[0])

    @property
    def value(self) -> Column:
        return F.col(self.value_col)

    def _with_df(self, df: DataFrame, ordered: bool | None = None, canonicalize: bool = False) -> "Series":
        return Series(
            df,
            key=self.key_cols,
            value=self.value_col,
            ordered=self.ordered if ordered is None else ordered,
            _canonicalize=canonicalize,
        )

    def _require_ordered(self, op: str) -> None:
        if not self.ordered:
            raise UnorderedSeriesError(
                f"{op} requires an ordered series; call .order_rows() first "
                "(reference throws for unordered indices, src/Indices/LinearIndex.fs:210-211)"
            )

    def _key_order(self) -> list[Column]:
        return [F.col(k) for k in self.key_cols]

    def _w(self) -> Window:
        """Ordered window over the whole series.

        Scale note: a global (unpartitioned) window collapses to one
        task.  Series-level ordered ops are inherently a total order —
        at 100 TB the same operators are used *grouped* (per entity key)
        via the ``by=`` parameters on Frame/grouped variants, which
        partition the window and scale linearly.
        """
        return Window.orderBy(*self._key_order())

    def count_keys(self) -> int:
        """Total key count — `Series.countKeys` (src/SeriesModule.fs:186-188)."""
        return self.df.count()

    def count_values(self) -> int:
        """Non-missing count — `Series.countValues` (src/SeriesModule.fs:183-185)."""
        return self.df.filter(self.value.isNotNull()).count()

    # Driver materializers.  Like `Frame.transpose`, these collect the
    # whole relation to one process — inherently small-data ops, so they
    # carry the same smallness guard (refuse past ``max_rows`` instead
    # of silently OOMing the driver on a 100 TB series; raise the limit
    # explicitly when you really mean it).

    def _guard_collect(self, max_rows: int, what: str, df=None) -> None:
        # count the SAME relation the caller collects: observations()
        # drops null-valued rows, so guarding on the unfiltered frame
        # would refuse collects whose actual size is fine
        n = (df if df is not None else self.df).limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"Series.{what} would collect >{max_rows} rows to the driver; "
                "pass a larger max_rows explicitly if you really want this"
            )

    def keys(self, max_rows: int = 100_000) -> list:
        self._guard_collect(max_rows, "keys")
        return [r[0] for r in self.df.select(*self.key_cols).collect()]

    def observations(self, max_rows: int = 100_000) -> list[tuple]:
        """Materialized (key, value) pairs, missing dropped — test helper."""
        rows = self.df.filter(self.value.isNotNull())
        self._guard_collect(max_rows, "observations", df=rows)
        if self.ordered:
            rows = rows.orderBy(*self._key_order())
        return [tuple(r) for r in rows.collect()]

    def to_pandas(self, max_rows: int = 100_000):
        self._guard_collect(max_rows, "to_pandas")
        df = self.df.orderBy(*self._key_order()) if self.ordered else self.df
        return df.toPandas()

    def __repr__(self) -> str:  # pragma: no cover
        head = self.df.limit(10).toPandas()
        return f"Series(key={self.key_cols}, value={self.value_col!r}, ordered={self.ordered})\n{head}"

    # ------------------------------------------------------------------
    # projection / filtering (§2.2)
    # ------------------------------------------------------------------

    def map_values(self, f: Callable[[Column], Column]) -> "Series":
        """Map over values, missing-preserving — `Series.Select`
        (src/Series.fs:259-270).  *f* gets the value Column and returns a
        Column; NaN results are re-canonicalized to NULL (reference
        re-canonicalizes after mapping, src/Vectors/ArrayVector.fs:213-223)."""
        out = self.df.withColumn(self.value_col, f(self.value))
        return self._with_df(out, canonicalize=True)

    def map_all(self, f: Callable[[Column], Column]) -> "Series":
        """Map that also sees missing (can fill/create) — `Series.SelectOptional`
        (src/Series.fs:281-286)."""
        return self.map_values(f)

    def map_keys(self, f: Callable[[Column], Column], level: int = 0) -> "Series":
        """Rewrite one key level — `Series.SelectKeys` (src/Series.fs:273-278).
        Multi-level keys pick the level to rewrite (reference tuple-key
        mapping); orderedness is not preserved (transform may reorder)."""
        k = self.key_cols[level]
        out = self.df.withColumn(k, f(F.col(k)))
        return self._with_df(out, ordered=False)

    def where(self, pred: Callable[[Column, Column], Column]) -> "Series":
        """Predicate on (key, value) — `Series.Where` (src/Series.fs:230-245).
        The reference skips missing values BEFORE the predicate runs
        (src/Series.fs:231 opt.HasValue check), so even a key-only
        predicate drops NULL-valued rows; we filter isNotNull first
        rather than relying on three-valued logic (which would keep a
        NULL-valued row when the predicate only touches the key)."""
        return self._with_df(
            self.df.filter(self.value.isNotNull())
                   .filter(pred(self.key, self.value)))

    def where_all(self, pred: Callable[[Column, Column], Column]) -> "Series":
        """Predicate that SEES missing — `Series.WhereOptional`/`filterAll`
        (src/Series.fs:248-256): the value Column is nullable and the
        predicate may test ``isNull`` (e.g. keep only missing keys)."""
        return self._with_df(self.df.filter(pred(self.key, self.value)))

    def where_indexed(self, pred: Callable[[Column, Column, Column], Column],
                      bucketed: bool = True) -> "Series":
        """`Series.Where` ordinal overload (src/Series.fs:236-240): the
        predicate also receives the 0-based position along key order —
        positions from the bucket census (no global window)."""
        self._require_ordered("where_indexed")
        if bucketed:
            from fsharp_dataframe_spark.operators.bucketed import with_global_positions

            df, _ = with_global_positions(self.df, self.key_cols, pos_col="__idx")
        else:
            df = self.df.withColumn("__idx", F.row_number().over(self._w()) - 1)
        out = df.filter(pred(self.key, self.value, F.col("__idx"))).drop("__idx")
        return self._with_df(out)

    def filter_values(self, pred: Callable[[Column], Column]) -> "Series":
        return self._with_df(self.df.filter(pred(self.value)))

    # ------------------------------------------------------------------
    # lookups / slicing (§2.2)
    # ------------------------------------------------------------------

    def get(self, k: Any, lookup: str = EXACT):
        """Point lookup — `Series.Get` (src/Series.fs:156-199).

        Inexact lookups find the nearest key <=/>= *k* **that has a
        value** on an ordered series (src/Indices/LinearIndex.fs:105-148).
        This is an action (returns the scalar).  Catalyst compiles the
        filter+limit to a parquet-pushed scan + top-1 sort.
        """
        if lookup == EXACT:
            rows = self.df.filter(self.key == F.lit(k)).select(self.value_col).take(1)
            if not rows:
                raise KeyError(k)
            return rows[0][0]
        self._require_ordered(f"get(lookup={lookup})")
        nn = self.value.isNotNull()
        if lookup == NEAREST_SMALLER:
            cand = self.df.filter((self.key <= F.lit(k)) & nn).orderBy(self.key.desc())
        elif lookup == NEAREST_GREATER:
            cand = self.df.filter((self.key >= F.lit(k)) & nn).orderBy(self.key.asc())
        else:
            raise ValueError(lookup)
        rows = cand.select(self.value_col).take(1)
        if not rows:
            raise KeyError(k)
        return rows[0][0]

    def try_get(self, k: Any, lookup: str = EXACT):
        try:
            return self.get(k, lookup)
        except KeyError:
            return None

    def between(self, lo=None, hi=None, lo_inclusive: bool = True, hi_inclusive: bool = True) -> "Series":
        """Key-range slice — `GetSubrange`/`Between/After/Before/StartAt/EndAt`
        (src/Series.fs:111-120, src/SeriesExtensions.fs:106-125).
        The range predicate pushes down to the parquet scan."""
        self._require_ordered("between")
        k = F.col(self.key_cols[0])  # range slicing is on the leading key level
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (k >= F.lit(lo) if lo_inclusive else k > F.lit(lo))
        if hi is not None:
            cond = cond & (k <= F.lit(hi) if hi_inclusive else k < F.lit(hi))
        return self._with_df(self.df.filter(cond))

    def __getitem__(self, item) -> "Series":
        """Slice sugar — reference ``s.[lo .. hi]`` (`GetSlice`,
        src/Series.fs:111-120): ``s[lo:hi]`` is an inclusive key-range
        slice; open ends supported (``s[lo:]``, ``s[:hi]``)."""
        if isinstance(item, slice):
            if item.step is not None:
                raise ValueError("key-range slices have no step")
            return self.between(item.start, item.stop)
        return self.get(item)

    def stat_summary(self) -> dict:
        """`Series.stat` (src/SeriesModule.fs:62-65, Math.NET
        DescriptiveStatistics analog): count/mean/sdv/min/max of the
        non-missing values, one aggregate pass."""
        row = self.df.agg(
            F.count(self.value).alias("count"),
            F.avg(self.value).alias("mean"),
            F.stddev_samp(self.value).alias("sdv"),
            F.min(self.value).alias("min"),
            F.max(self.value).alias("max"),
        ).collect()[0]
        return row.asDict()

    def after(self, k) -> "Series":
        return self.between(lo=k, lo_inclusive=False)

    def before(self, k) -> "Series":
        return self.between(hi=k, hi_inclusive=False)

    def start_at(self, k) -> "Series":
        return self.between(lo=k, lo_inclusive=True)

    def end_at(self, k) -> "Series":
        return self.between(hi=k, hi_inclusive=True)

    def get_items(self, keys_df: DataFrame | "Series", lookup: str = EXACT,
                  bucketed: bool = False) -> "Series":
        """Reindex to a new key list; missing where not found — `GetItems`
        / `Realign` (src/Series.fs:133-152, 552-559).

        Exact = left join from the new-keys side.  Inexact = as-of align
        (operators/asof.py).  *keys_df* is a DataFrame whose first
        column(s) are the new keys (or another Series, whose keys are
        used).  The key spine is typically small → broadcast.
        """
        if isinstance(keys_df, Series):
            keys_df = keys_df.df.select(*keys_df.key_cols)
        keys_df = keys_df.toDF(*self.key_cols)
        if lookup == EXACT:
            out = keys_df.join(self.df, on=self.key_cols, how="left")
            return self._with_df(out.select(*self.key_cols, self.value_col), ordered=False)
        self._require_ordered(f"get_items(lookup={lookup})")
        from fsharp_dataframe_spark.operators.asof import asof_lookup

        out = asof_lookup(
            keys_df,
            self.df,
            key_cols=self.key_cols,
            value_col=self.value_col,
            direction="backward" if lookup == NEAREST_SMALLER else "forward",
            bucketed=bucketed,
        )
        return self._with_df(out, ordered=False)

    def get_at(self, pos: int):
        """Positional access — `GetAt` (src/Series.fs:202-209).  Positions
        follow key order (reference addresses).  Test-support op."""
        self._require_ordered("get_at")
        w = self._w()
        rows = (
            self.df.withColumn("_pos", F.row_number().over(w) - 1)
            .filter(F.col("_pos") == pos)
            .select(self.value_col)
            .take(1)
        )
        if not rows:
            raise IndexError(pos)
        return rows[0][0]

    def get_key_at(self, pos: int):
        self._require_ordered("get_key_at")
        w = self._w()
        rows = (
            self.df.withColumn("_pos", F.row_number().over(w) - 1)
            .filter(F.col("_pos") == pos)
            .select(*self.key_cols)
            .take(1)
        )
        if not rows:
            raise IndexError(pos)
        return rows[0][0]

    def first_key(self):
        """`Series.firstKey` (src/SeriesModule.fs:199-202)."""
        self._require_ordered("first_key")
        return self.df.agg(F.min(self.key_cols[0])).collect()[0][0]

    def last_key(self):
        self._require_ordered("last_key")
        return self.df.agg(F.max(self.key_cols[0])).collect()[0][0]

    def first_value(self):
        """First non-missing value in key order — `firstValue`."""
        self._require_ordered("first_value")
        rows = self.df.filter(self.value.isNotNull()).orderBy(self.key.asc()).take(1)
        if not rows:
            raise KeyError("empty series")
        return rows[0][self.value_col]

    def last_value(self):
        self._require_ordered("last_value")
        rows = self.df.filter(self.value.isNotNull()).orderBy(self.key.desc()).take(1)
        if not rows:
            raise KeyError("empty series")
        return rows[0][self.value_col]

    def take_last(self, n: int) -> "Series":
        """Last n observations — `takeLast` (src/SeriesModule.fs:221-223).
        Top-k by key: Spark plans this as a TakeOrderedAndProject (no full
        sort at scale)."""
        self._require_ordered("take_last")
        return self._with_df(
            self.df.orderBy(*[F.col(k).desc() for k in self.key_cols]).limit(n)
        )

    def lookup_level(self, level: int, key_value) -> "Series":
        """Match one level of a multi-level key — `GetByLevel`/`LookupNOfM`
        (src/Indices/MultiKey.fs:114-159).  Levels are columns; level
        lookup is a pushed-down filter."""
        col = self.key_cols[level]
        return self._with_df(self.df.filter(F.col(col) == F.lit(key_value)))

    # ------------------------------------------------------------------
    # sorting / index manipulation (§2.9)
    # ------------------------------------------------------------------

    def order_rows(self) -> "Series":
        """Mark ordered-by-key — `OrderIndex` (src/Indices/LinearIndex.fs:286-295).

        No physical sort is forced here: ordered operators each impose
        the order they need via Window.orderBy, so eager global sorting
        would be a wasted shuffle.  The flag is the semantic contract.
        """
        return self._with_df(self.df, ordered=True)

    def index_ordinally(self, bucketed: bool = False) -> "Series":
        """0..n-1 keys — `indexOrdinally` (src/Series.fs:566-573).
        ``bucketed=True`` computes exact positions from the bucket
        census (operators/bucketed.py) — no global window."""
        self._require_ordered("index_ordinally")
        if bucketed:
            from fsharp_dataframe_spark.operators.bucketed import with_global_positions

            pos_df, _ = with_global_positions(self.df, self.key_cols, pos_col="_ord")
            out = pos_df.select(F.col("_ord").alias("key"), self.value_col)
        else:
            w = self._w()
            out = (
                self.df.withColumn("_ord", F.row_number().over(w) - 1)
                .select(F.col("_ord").alias("key"), self.value_col)
            )
        return Series(out, key="key", value=self.value_col, ordered=True, _canonicalize=False)

    def drop_key(self, k) -> "Series":
        """`DropItem` (src/Indices/LinearIndex.fs:373-382)."""
        return self._with_df(self.df.filter(self.key != F.lit(k)))

    # ------------------------------------------------------------------
    # missing-data operators (§2.8)
    # ------------------------------------------------------------------

    def drop_missing(self) -> "Series":
        """`dropMissing` (src/SeriesModule.fs:594-595)."""
        return self._with_df(self.df.filter(self.value.isNotNull()))

    def fill_missing_with(self, const) -> "Series":
        """`fillMissingWith c` (src/SeriesModule.fs:624-627)."""
        return self.map_all(lambda v: F.coalesce(v, F.lit(const)))

    def fill_missing_using(self, f: Callable[[Column], Column]) -> "Series":
        """`fillMissingUsing f` — compute fill from key (src/SeriesModule.fs:612-615)."""
        out = self.df.withColumn(self.value_col, F.coalesce(self.value, f(self.key)))
        return self._with_df(out, canonicalize=True)

    def fill_missing(self, direction: str = "forward", by: list[str] | None = None,
                     bucketed: bool = True) -> "Series":
        """Directional fill — `fillMissing Direction.Forward/Backward`
        (src/SeriesModule.fs:652-655; engine src/Vectors/ArrayVector.fs:80-101).

        Forward = last non-null over preceding keys; values at the edges
        may remain missing — exactly the reference semantics.  Pass
        ``by=`` to partition the fill per entity; the global (no-``by``)
        form defaults to the bucketed carry-cascade path (per-bucket
        fill + one cascaded edge value per bucket — no data-sized
        single-partition window; ``bucketed=False`` forces the plain
        shape).

        ``direction="linear"`` (parity-plus — the reference enum stops
        at Forward/Backward) interpolates interior gaps between the
        nearest known neighbours along the leading key's numeric axis;
        edge gaps stay missing.
        """
        self._require_ordered("fill_missing(direction)")
        if not by and bucketed:
            from fsharp_dataframe_spark.operators.bucketed import (
                bucketed_directional_fill,
                bucketed_linear_interpolate,
            )

            if direction == "linear":
                out = bucketed_linear_interpolate(
                    self.df, self.key_cols, self.value_col)
            elif direction in ("forward", "backward"):
                out = bucketed_directional_fill(
                    self.df, self.key_cols, self.value_col, direction)
            else:
                raise ValueError(direction)
            return self._with_df(out)
        w = Window.partitionBy(*(by or [])).orderBy(*self._key_order())
        if direction == "forward":
            w = w.rowsBetween(Window.unboundedPreceding, 0)
            fill = F.last(self.value, ignorenulls=True).over(w)
        elif direction == "backward":
            w = w.rowsBetween(0, Window.unboundedFollowing)
            fill = F.first(self.value, ignorenulls=True).over(w)
        elif direction == "linear":
            # interpolation x-axis = the leading ORDER key (the first
            # key level not consumed by the by= partitioning)
            axis = next((k for k in self.key_cols if k not in (by or [])),
                        self.key_cols[0])
            kd = F.col(axis).cast("double")
            known = F.when(self.value.isNotNull(),
                           F.struct(kd.alias("k"), self.value.alias("v")))
            w_p = w.rowsBetween(Window.unboundedPreceding, 0)
            w_n = w.rowsBetween(0, Window.unboundedFollowing)
            p = F.last(known, ignorenulls=True).over(w_p)
            n = F.first(known, ignorenulls=True).over(w_n)
            interp = F.when(
                n["k"] != p["k"],
                p["v"] + (n["v"] - p["v"]) * ((kd - p["k"]) / (n["k"] - p["k"]))
            ).otherwise(p["v"])
            fill = F.when(self.value.isNotNull(), self.value).otherwise(
                F.when(p.isNotNull() & n.isNotNull(), interp))
        else:
            raise ValueError(direction)
        out = self.df.withColumn(self.value_col, fill)
        return self._with_df(out)

    # ------------------------------------------------------------------
    # aggregates (§2.5) — all built-in JVM aggregates, missing skipped
    # (Spark skips NULL; NaN was canonicalized: src/Common/Common.fs:331-361)
    # ------------------------------------------------------------------

    def _agg_scalar(self, agg: Column):
        return self.df.agg(agg).collect()[0][0]

    def sum(self):
        return self._agg_scalar(F.sum(self.value))

    def mean(self):
        return self._agg_scalar(F.avg(self.value))

    def sdv(self):
        """Sample standard deviation — `Series.sdv` (src/SeriesModule.fs:59-61)."""
        return self._agg_scalar(F.stddev_samp(self.value))

    def median(self, exact: bool = True):
        """Exact median — `Series.median` (the reference's exact
        contract).  The exact state buffers the series' distinct
        values in ONE aggregation buffer (the stats-family
        hot-reducer shape); ``exact=False`` flips to
        approx_percentile's mergeable sketch for 10^10+-row series.
        Both tiers delegate to functions/stats._pct — ONE place owns
        the switch and its accuracy constant."""
        from fsharp_dataframe_spark.functions.stats import _pct

        return self._agg_scalar(_pct(self.value, F.lit(0.5), exact))

    def min(self):
        return self._agg_scalar(F.min(self.value))

    def max(self):
        return self._agg_scalar(F.max(self.value))

    def max_by(self):
        """Observation with max value — `maxBy` (src/SeriesModule.fs:225-229)."""
        row = self.df.filter(self.value.isNotNull()).orderBy(self.value.desc()).take(1)
        return tuple(row[0]) if row else None

    def min_by(self):
        """Reference bug: its `minBy` calls Seq.maxBy
        (src/SeriesModule.fs:228-229); we implement the intended min
        (divergence noted per SURVEY.md §7.3)."""
        row = self.df.filter(self.value.isNotNull()).orderBy(self.value.asc()).take(1)
        return tuple(row[0]) if row else None

    def group_by(self, proj: Callable[[Column], Column], group_col: str = "group") -> "GroupedSeries":
        """Group by f(key) — `Series.groupBy`/`groupInto`
        (src/Series.fs:536-545).  Elements whose group key is missing
        are dropped (src/Indices/LinearIndex.fs:242-243)."""
        df = self.df.withColumn(group_col, proj(self.key)).filter(F.col(group_col).isNotNull())
        return GroupedSeries(df, group_cols=[group_col], value_col=self.value_col)

    def group_by_level(self, levels: list[int]) -> "GroupedSeries":
        """Grouped aggregation over key levels — `sumBy/meanBy/...` with
        `Pair.getNOfM` projections (src/SeriesModule.fs:41-98)."""
        group_cols = [self.key_cols[i] for i in levels]
        return GroupedSeries(self.df, group_cols=group_cols, value_col=self.value_col)

    # ------------------------------------------------------------------
    # set-like ops (§2.3) and zip/align (§2.4) — delegated to operators
    # ------------------------------------------------------------------

    def union(self, other: "Series", behavior: str = PREFER_LEFT) -> "Series":
        from fsharp_dataframe_spark.operators.align import series_union

        return series_union(self, other, behavior)

    def append(self, other: "Series") -> "Series":
        """Disjoint-key union; raises on conflict — `Series.Append`
        (src/Series.fs:293-300)."""
        from fsharp_dataframe_spark.operators.align import series_union

        return series_union(self, other, EXCLUSIVE)

    def zip(self, other: "Series", kind: str = "outer", lookup: str = EXACT) -> DataFrame:
        from fsharp_dataframe_spark.operators.align import series_zip

        return series_zip(self, other, kind, lookup)

    def zip_into(self, other: "Series", f: Callable[[Column, Column], Column],
                 kind: str = "inner", lookup: str = EXACT) -> "Series":
        from fsharp_dataframe_spark.operators.align import series_zip_into

        return series_zip_into(self, other, f, kind, lookup)

    # ------------------------------------------------------------------
    # ordered-series ops (§2.6) — delegated to operators.window
    # ------------------------------------------------------------------

    def shift(self, n: int, by: list[str] | None = None, bucketed: bool = False) -> "Series":
        from fsharp_dataframe_spark.operators.window import series_shift

        return series_shift(self, n, by=by, bucketed=bucketed)

    def diff(self, n: int, by: list[str] | None = None, bucketed: bool = False) -> "Series":
        from fsharp_dataframe_spark.operators.window import series_diff

        return series_diff(self, n, by=by, bucketed=bucketed)

    def pairwise(self, f: Callable[[Column, Column], Column] | None = None,
                 by: list[str] | None = None, bucketed: bool = False) -> "Series":
        from fsharp_dataframe_spark.operators.window import series_pairwise

        return series_pairwise(self, f, by=by, bucketed=bucketed)

    def window_size_into(self, n: int, agg: Callable[[Column], Column], boundary: str = AT_BEGINNING,
                         by: list[str] | None = None, bucketed: bool = False) -> "Series":
        from fsharp_dataframe_spark.operators.window import series_window_size

        return series_window_size(self, n, agg, boundary, by=by, bucketed=bucketed)

    def chunk_size_into(self, n: int, agg: Callable[[Column], Column], boundary: str = AT_BEGINNING,
                        by: list[str] | None = None, bucketed: bool = False) -> "Series":
        from fsharp_dataframe_spark.operators.window import series_chunk_size

        return series_chunk_size(self, n, agg, boundary, by=by, bucketed=bucketed)

    def window_dist_into(self, dist, agg: Callable[[Column], Column],
                         by: list[str] | None = None, bucketed: bool = True) -> "Series":
        from fsharp_dataframe_spark.operators.window import series_window_dist

        return series_window_dist(self, dist, agg, by=by, bucketed=bucketed)

    def window_while_into(self, cond, agg, by: list[str] | None = None,
                          out_type: str = "double",
                          max_rows: int | None = None) -> "Series":
        """`windowWhileInto`; pass ``max_rows`` (a hard per-window row
        bound, violations raise) to run the global form parallel on
        halo-replicated buckets instead of one sequential task."""
        from fsharp_dataframe_spark.operators.window import series_window_while

        return series_window_while(self, cond, agg, by=by, out_type=out_type,
                                   max_rows=max_rows)

    def chunk_while_into(self, cond, agg, by: list[str] | None = None,
                         out_type: str = "double") -> "Series":
        from fsharp_dataframe_spark.operators.window import series_chunk_while

        return series_chunk_while(self, cond, agg, by=by, out_type=out_type)

    def chunk_dist_into(self, dist, agg, by: list[str] | None = None,
                        out_type: str = "double", bucketed: bool = True,
                        n_buckets: int | None = None) -> "Series":
        from fsharp_dataframe_spark.operators.window import series_chunk_dist

        return series_chunk_dist(self, dist, agg, by=by, out_type=out_type,
                                 bucketed=bucketed, n_buckets=n_buckets)

    def ewma(self, alpha: float, by: list[str] | None = None,
             n_buckets: int | None = None,
             bucket_width: float | None = None) -> "Series":
        """Exponentially weighted moving average, y_0 = x_0 and
        y_i = (1-α)·y_{i-1} + α·x_i (parity-plus over the finite
        moving-window API, src/SeriesModule.fs:281-301) — the global
        form runs parallel via per-bucket zero-init folds plus a
        decay-weighted carry cascade (operators/ewma.py)."""
        from fsharp_dataframe_spark.operators.ewma import series_ewma

        return series_ewma(self, alpha, by=by, n_buckets=n_buckets,
                           bucket_width=bucket_width)

    def aggregate_into(self, spec, agg, by: list[str] | None = None, **kw) -> "Series":
        """`Series.Aggregate` umbrella (src/Series.fs:514-523): dispatch
        on an ``Aggregation`` spec — WindowSize/ChunkSize (boundary
        flags), WindowWhile/ChunkWhile (predicates), WindowDist/
        ChunkDist (distances) — reference src/Indices/Index.fs:35-52.
        *agg* is a Column aggregator for the native specs and a
        pandas-segment function for the While specs."""
        if isinstance(spec, WindowSize):
            return self.window_size_into(spec.n, agg, spec.boundary, by=by, **kw)
        if isinstance(spec, ChunkSize):
            return self.chunk_size_into(spec.n, agg, spec.boundary, by=by, **kw)
        if isinstance(spec, WindowDist):
            return self.window_dist_into(spec.dist, agg, by=by, **kw)
        if isinstance(spec, ChunkDist):
            return self.chunk_dist_into(spec.dist, agg, by=by, **kw)
        if isinstance(spec, WindowWhile):
            return self.window_while_into(spec.cond, agg, by=by, **kw)
        if isinstance(spec, ChunkWhile):
            return self.chunk_while_into(spec.cond, agg, by=by, **kw)
        raise TypeError(f"unknown Aggregation spec: {spec!r}")

    # ------------------------------------------------------------------
    # resampling (§2.7) — delegated to operators.resample
    # ------------------------------------------------------------------

    def resample_equiv_into(self, proj: Callable[[Column], Column], agg: Callable[[Column], Column]) -> "Series":
        from fsharp_dataframe_spark.operators.resample import resample_equiv

        return resample_equiv(self, proj, agg)

    def resample_into(self, keys: list, direction: str, agg: Callable[[Column], Column]) -> "Series":
        from fsharp_dataframe_spark.operators.resample import resample_explicit

        return resample_explicit(self, keys, direction, agg)

    def resample_uniform_into(self, proj, step, agg=None) -> "Series":
        from fsharp_dataframe_spark.operators.resample import resample_uniform

        return resample_uniform(self, proj, step, agg)

    def sample_time_into(self, interval: str, agg: Callable[[Column], Column],
                         direction: str = "forward", origin=None) -> "Series":
        from fsharp_dataframe_spark.operators.resample import sample_time

        return sample_time(self, interval, agg, direction, origin=origin)

    # ------------------------------------------------------------------
    # arithmetic (§2.10) — pointwise scalar ops; series⊙series via zip
    # ------------------------------------------------------------------

    def _arith_scalar(self, other, op) -> "Series":
        return self.map_values(lambda v: op(v, F.lit(other)))

    def __add__(self, other):
        if isinstance(other, Series):
            return self.zip_into(other, lambda a, b: a + b, kind="outer")
        return self._arith_scalar(other, lambda a, b: a + b)

    def __radd__(self, other):
        return self._arith_scalar(other, lambda a, b: b + a)

    def __sub__(self, other):
        if isinstance(other, Series):
            return self.zip_into(other, lambda a, b: a - b, kind="outer")
        return self._arith_scalar(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._arith_scalar(other, lambda a, b: b - a)

    def __mul__(self, other):
        if isinstance(other, Series):
            return self.zip_into(other, lambda a, b: a * b, kind="outer")
        return self._arith_scalar(other, lambda a, b: a * b)

    def __rmul__(self, other):
        return self._arith_scalar(other, lambda a, b: b * a)

    def __truediv__(self, other):
        if isinstance(other, Series):
            return self.zip_into(other, lambda a, b: a / b, kind="outer")
        return self._arith_scalar(other, lambda a, b: a / b)

    def __rtruediv__(self, other):
        return self._arith_scalar(other, lambda a, b: b / a)

    def __pow__(self, other):
        if isinstance(other, Series):
            return self.zip_into(other, lambda a, b: F.pow(a, b), kind="outer")
        return self._arith_scalar(other, lambda a, b: F.pow(a, b))

    def cast(self, t: str) -> "Series":
        """Type conversion — `As<'R>`/`changeType` (src/Series.fs:793-818)."""
        return self.map_values(lambda v: v.cast(t))


class GroupedSeries:
    """Intermediate for grouped aggregation (reference `sumBy/meanBy/...`).

    Aggregates are built-in JVM functions → partial (map-side) aggregation
    happens automatically; the shuffle moves only per-group partials.
    """

    def __init__(self, df: DataFrame, group_cols: list[str], value_col: str):
        self.df = df
        self.group_cols = group_cols
        self.value_col = value_col

    def _agg(self, agg: Column) -> Series:
        out = self.df.groupBy(*self.group_cols).agg(agg.alias(self.value_col))
        return Series(out, key=self.group_cols, value=self.value_col, ordered=False, _canonicalize=False)

    def sum(self) -> Series:
        return self._agg(F.sum(F.col(self.value_col)))

    def mean(self) -> Series:
        return self._agg(F.avg(F.col(self.value_col)))

    def count(self) -> Series:
        """Non-missing count per group — `countBy`."""
        return self._agg(F.count(F.col(self.value_col)))

    def sdv(self) -> Series:
        return self._agg(F.stddev_samp(F.col(self.value_col)))

    def median(self, exact: bool = True) -> Series:
        """Per-group exact median; ``exact=False`` = the mergeable
        approx_percentile sketch (delegates to functions/stats._pct,
        see Series.median)."""
        from fsharp_dataframe_spark.functions.stats import _pct

        return self._agg(_pct(F.col(self.value_col), F.lit(0.5), exact))

    def min(self) -> Series:
        return self._agg(F.min(F.col(self.value_col)))

    def max(self) -> Series:
        return self._agg(F.max(F.col(self.value_col)))

    def agg_expr(self, agg: Column) -> Series:
        """Escape hatch: arbitrary Column aggregate (reference: arbitrary
        valueSelector over the group, src/Series.fs:536-545).  For true
        whole-group lambdas use .apply_in_pandas."""
        return self._agg(agg)

    def apply_in_pandas(self, fn, schema,
                        max_group_rows: int | None = None,
                        pin_parallelism: bool = True) -> DataFrame:
        """Whole-group user lambda — the direct analog of the reference's
        valueSelector-sees-whole-group (SURVEY.md §2.11): grouped-map
        Pandas UDF, Arrow-batched.  Each group materializes as ONE
        Arrow batch in one worker, so a pathological hot key fails
        loudly against ``max_group_rows`` (default
        util.MAX_ARROW_GROUP_ROWS) instead of OOMing the executor.

        ``pin_parallelism``: pin the feeding exchange at session
        parallelism — AQE's byte-based coalescing under-parallelizes
        opaque Python group lambdas (r15).  Pass False when the input
        is ALREADY hash-partitioned on the group columns (e.g. the
        output of a previous grouped op on the same key): the pin's
        explicit repartition would force an extra full exchange there
        (ADVICE r15)."""
        from fsharp_dataframe_spark.functions.util import (
            guard_arrow_group, pin_group_parallelism,
        )

        src = (pin_group_parallelism(self.df, list(self.group_cols))
               if pin_parallelism else self.df)
        return (src.groupBy(*self.group_cols).applyInPandas(
                    guard_arrow_group(fn, "apply_in_pandas",
                                      max_group_rows),
                    schema))
