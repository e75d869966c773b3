"""Frame: a keyed, column-oriented table over a Spark DataFrame.

Reference: ``Frame<'R,'C>`` = rowIndex + colIndex + vector of column
vectors (src/Frame.fs:24-26) — column-oriented with heterogeneously
typed columns, exactly Tungsten's layout.  Here a Frame is a DataFrame
whose schema is ``key_cols + data columns`` plus metadata
``{key_cols, ordered}``; the column index IS the DataFrame schema
(SURVEY.md §1.2).

Hierarchical (multi-level) row keys are multiple key columns — the
reference's tuple keys (src/Indices/MultiKey.fs:10-13) with level
lookups becoming filters on one key column.  ``group_rows_by`` adds a
column as a new leading key level *without any data movement*
(src/Frame.fs:826-839 → here: metadata change only); the shuffle
happens only when an aggregation is finally requested — strictly lazier
than the reference, and the Spark-scale win.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fsharp_dataframe_spark.missing import canonicalize_missing
from fsharp_dataframe_spark.series import Series, UnorderedSeriesError, _as_list

_NUMERIC = (
    T.DoubleType, T.FloatType, T.IntegerType, T.LongType, T.ShortType,
    T.ByteType, T.DecimalType,
)


class Frame:
    """Keyed multi-column frame (see module docstring)."""

    def __init__(self, df: DataFrame, key: str | list[str] | None = None,
                 ordered: bool = False, _canonicalize: bool = True):
        self.key_cols: list[str] = _as_list(key)
        if _canonicalize:
            df = canonicalize_missing(df)
        self.df = df
        self.ordered = ordered

    # ------------------------------------------------------------------
    # construction / IO (§2.1)
    # ------------------------------------------------------------------

    @staticmethod
    def read_parquet(spark, path: str, key: str | list[str] | None = None,
                     ordered: bool = False, nan_free: bool = False) -> "Frame":
        """Columnar ingest (TIMESTAMP-NANOS normalized); column pruning
        and predicate pushdown reach the scan once operators apply.

        ``nan_free=True`` asserts the source already satisfies the
        engine's canonical missing-value contract (no NaN in float
        columns — true for engine-written sinks and validated
        generators) and skips the NaN→NULL wrap.  This matters for
        scans: the wrap expression is not a pushable predicate, so
        float-column filters on a wrapped frame cannot reach the
        parquet reader (the reference analog: its vector builder
        materializes canonicalization once at construction,
        src/Vectors/ArrayVector.fs:56-67 — data at rest is canonical)."""
        from fsharp_dataframe_spark.sources.parquet import read_parquet

        return Frame(read_parquet(spark, path), key=key, ordered=ordered,
                     _canonicalize=not nan_free)

    @staticmethod
    def read_csv(spark, path: str, key: str | list[str] | None = None, **kwargs) -> "Frame":
        """CSV→Frame with schema inference — `Frame.ReadCsv`
        (src/FrameExtensions.fs:45-78).  See sources/csv.py for the
        dialect-parity flags (separators, missing tokens, culture)."""
        from fsharp_dataframe_spark.sources.csv import read_csv

        return read_csv(spark, path, key=key, **kwargs)

    @staticmethod
    def of_columns(columns: dict[str, Series]) -> "Frame":
        """Frame from column series; key sets unioned (outer-join
        construction — src/Frame.fs:745-812)."""
        frames = []
        key_cols = None
        for name, s in columns.items():
            if key_cols is None:
                key_cols = s.key_cols
            frames.append(s.df.select(
                *[F.col(a).alias(b) for a, b in zip(s.key_cols, key_cols)],
                F.col(s.value_col).alias(name),
            ))
        out = frames[0]
        for f in frames[1:]:
            out = out.join(f, on=key_cols, how="full_outer")
        ordered = all(s.ordered for s in columns.values())
        return Frame(out, key=key_cols, ordered=ordered, _canonicalize=False)

    @staticmethod
    def of_records(spark, records: list, key: str | list[str] | None = None) -> "Frame":
        """`Frame.ofRecords` (src/FrameUtils.fs:25-52) — native in Spark."""
        return Frame(spark.createDataFrame(records), key=key)

    @staticmethod
    def of_rows(spark, rows: list[tuple], key_name: str = "key") -> "Frame":
        """Frame from (row_key, {col: value}) pairs — `Frame.ofRows`
        (src/FrameExtensions.fs:90-196).  Column sets are UNIONED
        (outer-join construction, src/Frame.fs:765-804): a row lacking
        a column gets a missing value there."""
        all_cols: list[str] = []
        for _, d in rows:
            for c in d:
                if c not in all_cols:
                    all_cols.append(c)
        recs = [{key_name: k, **{c: d.get(c) for c in all_cols}} for k, d in rows]
        # createDataFrame sorts dict keys; restore insertion column order
        df = spark.createDataFrame(recs).select(key_name, *all_cols)
        return Frame(df, key=key_name)

    @staticmethod
    def of_rows_ordinal(spark, rows: list[dict]) -> "Frame":
        """`Frame.ofRowsOrdinal` (src/FrameExtensions.fs:150-158):
        rows with 0..n-1 ordinal keys."""
        return Frame.of_rows(spark, list(enumerate(rows)), key_name="ordinal")

    @staticmethod
    def of_row_keys(spark, keys: list, key_name: str = "key") -> "Frame":
        """`Frame.ofRowKeys` (src/FrameExtensions.fs:160-167): a frame
        with row keys and no columns yet."""
        return Frame(spark.createDataFrame([(k,) for k in keys], [key_name]),
                     key=key_name)

    @staticmethod
    def collapse_rows(frames: dict, level_name: str = "group") -> "Frame":
        """Series-of-frames → one frame with a new leading key level —
        `collapseRows` (src/Frame.fs:815-818; src/FrameModule.fs:29-58).
        The union of per-group frames, each tagged with its group key;
        column sets are unioned with missing padding (unionByName)."""
        out_df = None
        key_cols = None
        for gk, fr in frames.items():
            tagged = fr.df.select(F.lit(gk).alias(level_name), "*")
            if key_cols is None:
                key_cols = [level_name] + fr.key_cols
            out_df = tagged if out_df is None else out_df.unionByName(
                tagged, allowMissingColumns=True)
        if out_df is None:
            raise ValueError("collapse_rows of empty dict")
        return Frame(out_df, key=key_cols, ordered=False, _canonicalize=False)

    @staticmethod
    def from_values(spark, triples: list[tuple], row: str = "row", col: str = "col",
                    value: str = "value") -> "Frame":
        """(row, col, value) triples → pivoted frame — `Frame.FromValues`
        (src/FrameExtensions.fs:275-302)."""
        df = spark.createDataFrame(triples, [row, col, value])
        out = df.groupBy(row).pivot(col).agg(F.first(value))
        return Frame(out, key=row)

    def to_csv(self, path: str, include_row_keys: bool = True, **kwargs) -> None:
        from fsharp_dataframe_spark.sources.csv import write_csv

        write_csv(self, path, include_row_keys=include_row_keys, **kwargs)

    # ------------------------------------------------------------------
    # metadata / plumbing
    # ------------------------------------------------------------------

    @property
    def column_keys(self) -> list[str]:
        """The column index — data columns only (src/Frame.fs:41-43)."""
        return [c for c in self.df.columns if c not in self.key_cols]

    def numeric_columns(self) -> list[str]:
        return [
            f.name for f in self.df.schema.fields
            if f.name not in self.key_cols and isinstance(f.dataType, _NUMERIC)
        ]

    def _with_df(self, df: DataFrame, ordered: bool | None = None,
                 key: list[str] | None = None, canonicalize: bool = False) -> "Frame":
        return Frame(df, key=self.key_cols if key is None else key,
                     ordered=self.ordered if ordered is None else ordered,
                     _canonicalize=canonicalize)

    def _require_ordered(self, op: str) -> None:
        if not self.ordered:
            raise UnorderedSeriesError(f"{op} requires ordered rows; call .order_rows() first")

    def row_count(self) -> int:
        return self.df.count()

    def to_pandas(self):
        df = self.df.orderBy(*self.key_cols) if (self.ordered and self.key_cols) else self.df
        return df.toPandas()

    def __repr__(self) -> str:  # pragma: no cover
        return (f"Frame(key={self.key_cols}, ordered={self.ordered}, "
                f"columns={self.column_keys})\n{self.df.limit(10).toPandas()}")

    # ------------------------------------------------------------------
    # column access (§2.2) — GetColumn / dynamic access
    # ------------------------------------------------------------------

    def __getitem__(self, col: str) -> Series:
        """`frame?Col` / `GetColumn` (src/Frame.fs:275-406): a Series
        view — pure column pruning, no data movement."""
        return Series(self.df.select(*self.key_cols, col),
                      key=self.key_cols, value=col,
                      ordered=self.ordered, _canonicalize=False)

    def get_series(self, col: str, cast_to: str | None = None) -> Series:
        """Typed extraction — `GetSeries<'R>` with conversion
        (src/Series.fs:793-818)."""
        s = self[col]
        return s.cast(cast_to) if cast_to else s

    def add_col(self, name: str, series_or_col) -> "Frame":
        """`AddSeries/addCol` (src/Frame.fs:315-380): a Column expression
        is added in place; a Series is left-joined on the row key; a
        plain Python sequence is zipped POSITIONALLY along row-key order
        — padded with missing / trimmed to the row count, the reference
        seq overload (src/Frame.fs:323-342)."""
        if isinstance(series_or_col, Column):
            return self._with_df(self.df.withColumn(name, series_or_col), canonicalize=True)
        if isinstance(series_or_col, (list, tuple)):
            self._require_ordered("add_col(sequence)")
            from fsharp_dataframe_spark.operators.bucketed import with_global_positions

            spark = self.df.sparkSession
            vals = spark.createDataFrame(
                [(i, v) for i, v in enumerate(series_or_col)], ["__pos", name])
            pos, _ = with_global_positions(self.df, self.key_cols, pos_col="__pos")
            out = pos.join(F.broadcast(vals), "__pos", "left").drop("__pos")
            return self._with_df(out)
        s = series_or_col
        rhs = s.df.select(
            *[F.col(a).alias(b) for a, b in zip(s.key_cols, self.key_cols)],
            F.col(s.value_col).alias(name),
        )
        out = self.df.join(rhs, on=self.key_cols, how="left")
        return self._with_df(out)

    def rows(self) -> Series:
        """Row-series view — `frame.Rows` (src/Frame.fs:223-254): one
        struct of all data columns per row key."""
        v = F.struct(*[F.col(c) for c in self.column_keys])
        out = self.df.select(*self.key_cols, v.alias("row"))
        return Series(out, key=self.key_cols, value="row",
                      ordered=self.ordered, _canonicalize=False)

    def rows_dense(self) -> Series:
        """`RowsDense` (src/Frame.fs:229-254): rows with any missing
        cell are dropped before the struct view."""
        return Series(self.drop_sparse_rows().df.select(
            *self.key_cols,
            F.struct(*[F.col(c) for c in self.column_keys]).alias("row")),
            key=self.key_cols, value="row", ordered=self.ordered, _canonicalize=False)

    def drop_col(self, *names: str) -> "Frame":
        """`DropSeries` (src/Frame.fs:359-362)."""
        return self._with_df(self.df.drop(*names))

    def rename_col(self, mapping: dict[str, str]) -> "Frame":
        out = self.df
        for a, b in mapping.items():
            out = out.withColumnRenamed(a, b)
        return self._with_df(out)

    def select_cols(self, cols: list[str]) -> "Frame":
        return self._with_df(self.df.select(*self.key_cols, *cols))

    # ------------------------------------------------------------------
    # row ops (§2.2)
    # ------------------------------------------------------------------

    def filter_rows(self, pred: Callable[[DataFrame], Column] | Column) -> "Frame":
        """`Frame.filterRows` (src/FrameModule.fs:337-344)."""
        cond = pred(self.df) if callable(pred) else pred
        return self._with_df(self.df.filter(cond))

    def map_cols(self, exprs: dict[str, Column]) -> "Frame":
        """Columnwise projection — `mapCols`/`SeriesApply`
        (src/Frame.fs:304-312)."""
        return self._with_df(self.df.withColumns(exprs), canonicalize=True)

    def get_row(self, key_value) -> dict:
        """`GetRow` — exact row lookup (src/Frame.fs:280-293)."""
        kv = key_value if isinstance(key_value, (list, tuple)) else [key_value]
        cond = F.lit(True)
        for k, v in zip(self.key_cols, kv):
            cond = cond & (F.col(k) == F.lit(v))
        rows = self.df.filter(cond).take(1)
        if not rows:
            raise KeyError(key_value)
        return rows[0].asDict()

    def between(self, lo=None, hi=None) -> "Frame":
        """Row-key range slice (ordered frames)."""
        self._require_ordered("between")
        k = F.col(self.key_cols[0])
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (k >= F.lit(lo))
        if hi is not None:
            cond = cond & (k <= F.lit(hi))
        return self._with_df(self.df.filter(cond))

    def take_last(self, n: int) -> "Frame":
        self._require_ordered("take_last")
        return self._with_df(self.df.orderBy(*[F.col(k).desc() for k in self.key_cols]).limit(n))

    # ------------------------------------------------------------------
    # frame-level ordered ops (§2.6): window / shift / diff
    # (ref src/FrameModule.fs:71-75, 450-454; src/FrameExtensions.fs:560-565,
    # 626-631) — ONE window pass over all affected columns, the Spark
    # analog of the reference's plan-once / execute-per-column model.
    # ------------------------------------------------------------------

    def _ordered_window(self, by: list[str] | None) -> Window:
        by = by or []
        order = [F.col(k) for k in self.key_cols if k not in by] or \
                [F.col(k) for k in self.key_cols]
        return Window.partitionBy(*by).orderBy(*order)

    def shift(self, n: int, by: list[str] | None = None) -> "Frame":
        """`Frame.shift` (src/FrameModule.fs:450-451): every data column
        shifted by n along row-key order; boundary rows dropped (each
        per-column Series.shift drops them, so their union does too)."""
        self._require_ordered("shift")
        w = self._ordered_window(by)
        data = self.column_keys
        shifted = {c: F.lag(F.col(c), n).over(w) for c in data}
        ok = F.lag(F.lit(1), n).over(w).isNotNull()
        out = (
            self.df.withColumns({**shifted, "__ok": ok})
            .filter(F.col("__ok"))
            .select(*self.key_cols, *data)
        )
        return self._with_df(out)

    def rolling_corr(self, x_col: str, y_col: str, n: int,
                     by: list[str] | None = None, bucketed: bool = False,
                     out_col: str = "rolling_corr") -> "Frame":
        """Trailing n-row Pearson correlation of two columns (parity-plus
        over `windowSizeInto`, src/SeriesModule.fs:281-301 — see
        operators/window.frame_rolling_corr for the scale story)."""
        self._require_ordered("rolling_corr")
        from fsharp_dataframe_spark.operators.window import frame_rolling_corr

        out = frame_rolling_corr(self.df, self.key_cols, x_col, y_col, n,
                                 by=by, bucketed=bucketed, out_col=out_col)
        return self._with_df(out)

    def ohlc(self, key: str, ts: str, value: str, unit: str = "week",
             tiebreak: str | None = None) -> "Frame":
        """Per-key OHLC bars per calendar bucket (parity-plus over the
        reference's resample + first/last/min/max idiom,
        samples/timeseries.fsx; see functions/timeseries.ohlc_resample
        for the one-shuffle scale story)."""
        from fsharp_dataframe_spark.functions.timeseries import ohlc_resample

        out = ohlc_resample(self.df, key, ts, value, unit=unit,
                            tiebreak=tiebreak)
        return Frame(out, key=[key, "bucket"], ordered=False)

    def drawdown(self, key: str, ts: str, value: str,
                 tiebreak: str | None = None) -> "Frame":
        """Per-key maximum peak-to-trough drawdown
        (functions/timeseries.max_drawdown)."""
        from fsharp_dataframe_spark.functions.timeseries import max_drawdown

        out = max_drawdown(self.df, key, ts, value, tiebreak=tiebreak)
        return Frame(out, key=[key], ordered=False)

    def returns(self, key: str, ts: str, value: str,
                tiebreak: str | None = None) -> "Frame":
        """Per-key simple returns + cumulative growth — the reference's
        `series / Series.shift 1 series - 1` idiom
        (functions/timeseries.returns)."""
        from fsharp_dataframe_spark.functions.timeseries import returns

        out = returns(self.df, key, ts, value, tiebreak=tiebreak)
        return Frame(out, key=[key, ts], ordered=False)

    def diff(self, n: int, by: list[str] | None = None) -> "Frame":
        """`Frame.diff` (src/FrameModule.fs:453-454): float-convertible
        columns become x[k]-x[k-n]; other columns pass through unchanged
        (SeriesApply strict=false), so row keys are preserved and numeric
        columns are missing at the first |n| rows."""
        self._require_ordered("diff")
        w = self._ordered_window(by)
        diffed = {c: F.col(c) - F.lag(F.col(c), n).over(w) for c in self.numeric_columns()}
        return self._with_df(self.df.withColumns(diffed))

    def window_size_into(self, n: int, aggs: dict[str, Callable[[Column], Column]],
                         boundary: str = "at_beginning",
                         by: list[str] | None = None) -> "Frame":
        """`Frame.windowInto` (src/FrameModule.fs:71-75): sliding n-row
        windows of the frame, each aggregated per column by *aggs* —
        all columns in one window pass.  Boundary semantics match
        Series.window_size_into (window keyed by last key AtBeginning /
        first key AtEnding; Skip keeps only complete windows)."""
        self._require_ordered("window_size")
        base = self._ordered_window(by)
        if boundary in ("at_beginning", "skip"):
            frame = base.rowsBetween(-(n - 1), 0)
        elif boundary == "at_ending":
            frame = base.rowsBetween(0, n - 1)
        else:
            raise ValueError(boundary)
        out = self.df.withColumns({c: agg(F.col(c)).over(frame) for c, agg in aggs.items()})
        if boundary == "skip":
            out = out.withColumn("__pos", F.row_number().over(base)).filter(F.col("__pos") >= n)
        out = out.select(*self.key_cols, *self.column_keys)
        return self._with_df(out)

    # ------------------------------------------------------------------
    # sorting / indexing (§2.9)
    # ------------------------------------------------------------------

    def order_rows(self) -> "Frame":
        """Mark ordered-by-key — `Frame.orderRows` (src/FrameModule.fs:313-331).
        Logical, not physical (each ordered op imposes its own order)."""
        return self._with_df(self.df, ordered=True)

    def index_rows(self, col: str | list[str], drop: bool = False, validate: bool = False) -> "Frame":
        """Use column(s) as the new row key — `Frame.IndexRows<'T>`
        (src/Frame.fs:850-855).  ``validate=True`` runs the duplicate-key
        check the reference does eagerly (src/Indices/LinearIndex.fs:53-56)
        — a full shuffle, so opt-in (SURVEY.md §7.3)."""
        key = _as_list(col)
        if validate:
            dups = self.df.groupBy(*key).count().filter(F.col("count") > 1).limit(1).count()
            if dups:
                raise ValueError(f"duplicate row keys in {key} (reference rejects duplicates)")
        df = self.df
        if drop:
            # drop the FORMER key columns (the promoted column always
            # becomes the key; without drop the old key cols remain as
            # ordinary data columns)
            former = [k for k in self.key_cols if k not in key]
            if former:
                df = df.drop(*former)
        return Frame(df, key=key, ordered=False, _canonicalize=False)

    def index_rows_with(self, keys: list, key_name: str = "key") -> "Frame":
        """Replace row keys POSITIONALLY with the given key list —
        `indexRowsWith` (src/FrameModule.fs:271-290).  Requires ordered
        rows (position = row_number over key order); the key list is
        driver-side, zipped in via a broadcast ordinal join."""
        self._require_ordered("index_rows_with")
        spark = self.df.sparkSession
        keys_df = spark.createDataFrame(
            [(i, k) for i, k in enumerate(keys)], ["__pos", "__newkey"])
        w = Window.orderBy(*[F.col(k) for k in self.key_cols])
        pos = self.df.withColumn("__pos", F.row_number().over(w) - 1)
        out = (
            pos.join(F.broadcast(keys_df), "__pos", "inner")
            .select(F.col("__newkey").alias(key_name), *self.column_keys)
        )
        return Frame(out, key=key_name, ordered=False, _canonicalize=False)

    def index_cols_with(self, names: list[str]) -> "Frame":
        """Rename data columns positionally — `indexColsWith`
        (src/FrameModule.fs:282-290)."""
        data = self.column_keys
        if len(names) != len(data):
            raise ValueError(f"{len(names)} names for {len(data)} columns")
        out = self.df.select(
            *self.key_cols,
            *[F.col(c).alias(nm) for c, nm in zip(data, names)],
        )
        return self._with_df(out)

    def index_ordinally(self) -> "Frame":
        """0..n-1 row keys — `indexOrdinally` (src/FrameModule.fs:179-181)."""
        self._require_ordered("index_ordinally")
        w = Window.orderBy(*[F.col(k) for k in self.key_cols])
        out = self.df.withColumn("__ord", F.row_number().over(w) - 1)
        cols = ["__ord"] + self.column_keys
        return Frame(out.select(*cols).withColumnRenamed("__ord", "ordinal"),
                     key="ordinal", ordered=True, _canonicalize=False)

    def transpose(self, max_rows: int = 10_000) -> "Frame":
        """`Frame.transpose` (src/FrameModule.fs:301-303): swap rows and
        columns via melt + pivot.  The result has one column per input
        ROW, so this is inherently a small-data op (the reference itself
        warns row access is the slow path, src/FrameModule.fs:292-295);
        an explicit ``max_rows`` guard refuses frames whose transpose
        would be pathologically wide.  Values go through a string cast
        (a transposed row mixes the source columns' types — the
        reference's ObjectSeries equivalent)."""
        if len(self.key_cols) != 1:
            raise ValueError("transpose requires a single-level row key")
        n = self.df.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"transpose of >{max_rows} rows would create >{max_rows} columns; "
                "raise max_rows explicitly if you really want this"
            )
        rk = self.key_cols[0]
        data = self.column_keys
        melt_expr = F.explode(F.array(*[
            F.struct(F.lit(c).alias("col"), F.col(c).cast("string").alias("val"))
            for c in data
        ])).alias("kv")
        long = self.df.select(F.col(rk).cast("string").alias("__rk"), melt_expr) \
                      .select("__rk", "kv.col", "kv.val")
        out = long.groupBy("col").pivot("__rk").agg(F.first("val"))
        return Frame(out.withColumnRenamed("col", "column"), key="column",
                     ordered=False, _canonicalize=False)

    # ------------------------------------------------------------------
    # joins / zip / append (§2.3, §2.4)
    # ------------------------------------------------------------------

    _JOIN_KIND = {"outer": "full_outer", "inner": "inner", "left": "left", "right": "right"}

    def join(self, other: "Frame", kind: str = "outer", lookup: str = "exact",
             by: list[str] | None = None) -> "Frame":
        """Row-key join; column sets must be disjoint — `Frame.Join`
        (src/Frame.fs:146-167).  Inexact lookup (as-of) only with
        left/right, via the one-pass frame as-of
        (operators/asof.py:asof_align_frame)."""
        overlap = set(self.column_keys) & set(other.column_keys)
        if overlap:
            raise ValueError(
                f"joined frames must have disjoint columns, got {sorted(overlap)} "
                "(reference appends column indices with conflict check, src/Frame.fs:150-153)"
            )
        if lookup == "exact":
            rhs = other.df.select(
                *[F.col(a).alias(b) for a, b in zip(other.key_cols, self.key_cols)],
                *other.column_keys,
            )
            out = self.df.join(rhs, on=self.key_cols, how=self._JOIN_KIND[kind])
            return self._with_df(out, ordered=self.ordered and kind in ("left", "inner"))
        if kind not in ("left", "right"):
            raise ValueError("inexact join requires left/right (src/JoinHelpers.fs:58-61)")
        from fsharp_dataframe_spark.operators.asof import asof_align_frame

        direction = "backward" if lookup == "nearest_smaller" else "forward"
        probe, source = (self, other) if kind == "left" else (other, self)
        src = source.df.select(
            *[F.col(a).alias(b) for a, b in zip(source.key_cols, probe.key_cols)],
            *source.column_keys,
        )
        out = asof_align_frame(probe.df, src, key_cols=probe.key_cols,
                               fill_cols=source.column_keys, direction=direction, by=by)
        return Frame(out, key=probe.key_cols, ordered=probe.ordered, _canonicalize=False)

    def zip_frames(self, other: "Frame", op: Callable[[Column, Column], Column],
                   kind: str = "outer") -> "Frame":
        """Cell-wise combine of shared columns; exclusive columns pass
        through — `Frame.Zip` (src/Frame.fs:103-142)."""
        shared = [c for c in self.column_keys if c in other.column_keys]
        l_only = [c for c in self.column_keys if c not in shared]
        r_only = [c for c in other.column_keys if c not in shared]
        l = self.df.select(*self.key_cols, *[F.col(c).alias(f"__l_{c}") for c in shared], *l_only)
        r = other.df.select(
            *[F.col(a).alias(b) for a, b in zip(other.key_cols, self.key_cols)],
            *[F.col(c).alias(f"__r_{c}") for c in shared], *r_only,
        )
        joined = l.join(r, on=self.key_cols, how=self._JOIN_KIND[kind])
        cols = [F.col(k) for k in self.key_cols]
        cols += [op(F.col(f"__l_{c}"), F.col(f"__r_{c}")).alias(c) for c in shared]
        cols += [F.col(c) for c in l_only + r_only]
        return self._with_df(joined.select(*cols), canonicalize=True)

    def zip_align_frames(self, other: "Frame", op: Callable[[Column, Column], Column],
                         col_kind: str = "inner", lookup: str = "nearest_smaller") -> "Frame":
        """`Frame.zipAlign` (src/Frame.fs:103-142): align *other*'s rows
        to THIS frame's row keys with an as-of lookup, then combine the
        SHARED columns cell-wise with *op*.  ``col_kind`` picks the
        surviving column set: 'inner' keeps shared columns only, 'left'
        additionally passes this frame's exclusive columns through
        untouched.  Row join kind is left (this frame is the spine) —
        the only row kind the reference exercises with inexact lookups
        (tests/FSharp.DataFrame.Tests/Frame.fs:322-470, the
        market-cap/EV scenario).  One as-of pass aligns every column
        (the plan-once shape of asof_align_frame)."""
        if col_kind not in ("inner", "left"):
            raise ValueError("col_kind must be inner|left")
        if lookup not in ("nearest_smaller", "nearest_greater"):
            raise ValueError("lookup must be nearest_smaller|nearest_greater")
        shared = [c for c in self.column_keys if c in other.column_keys]
        l_only = [c for c in self.column_keys if c not in shared]
        from fsharp_dataframe_spark.operators.asof import asof_align_frame

        direction = "backward" if lookup == "nearest_smaller" else "forward"
        src = other.df.select(
            *[F.col(a).alias(b) for a, b in zip(other.key_cols, self.key_cols)],
            *[F.col(c).alias(f"__r_{c}") for c in shared],
        )
        aligned = asof_align_frame(
            self.df.select(*self.key_cols, *shared, *l_only), src,
            key_cols=self.key_cols,
            fill_cols=[f"__r_{c}" for c in shared],
            direction=direction,
        )
        cols = [F.col(k) for k in self.key_cols]
        cols += [op(F.col(c), F.col(f"__r_{c}")).alias(c) for c in shared]
        if col_kind == "left":
            cols += [F.col(c) for c in l_only]
        return Frame(aligned.select(*cols), key=self.key_cols,
                     ordered=self.ordered, _canonicalize=True)

    def append(self, other: "Frame") -> "Frame":
        """Union column sets, append rows — `Frame.Append`
        (src/Frame.fs:171-207): missing columns padded with NULL.
        Duplicate-key conflicts are the caller's contract (opt-in check
        via index_rows(validate=True))."""
        out = self.df.unionByName(other.df, allowMissingColumns=True)
        return self._with_df(out, ordered=False)

    def realign_rows(self, keys_df: DataFrame) -> "Frame":
        """Reindex rows to a given key list — `Frame.realignRows`
        (src/FrameModule.fs:165-169): left join from the new key spine."""
        keys_df = keys_df.toDF(*self.key_cols)
        out = keys_df.join(self.df, on=self.key_cols, how="left")
        return self._with_df(out, ordered=False)

    # ------------------------------------------------------------------
    # grouping & aggregation (§2.5) — hierarchical keys as key columns
    # ------------------------------------------------------------------

    def group_rows_by(self, *cols: str) -> "Frame":
        """Group rows by column values → new leading key level(s) —
        `Frame.GroupRowsBy` (src/Frame.fs:826-839).  Pure metadata: the
        grouping columns become key columns; no shuffle until an
        aggregation runs (Catalyst fuses the later groupBy with
        whatever precedes it)."""
        new_key = list(cols) + self.key_cols
        return Frame(self.df, key=new_key, ordered=False, _canonicalize=False)

    def agg_by_level(self, levels: list[int] | None, aggs: dict[str, Callable[[Column], Column]],
                     aliases: dict[str, str] | None = None) -> "Frame":
        """Grouped per-column aggregates over key levels —
        `Frame.meanBy/sumBy/...` (src/FrameModule.fs:413-435).
        *aggs* maps column → aggregate fn; result keyed by the chosen
        levels.  Map-side partial aggregation applies (built-in aggs)."""
        group_cols = self.key_cols if levels is None else [self.key_cols[i] for i in levels]
        aliases = aliases or {}
        exprs = [f(F.col(c)).alias(aliases.get(c, c)) for c, f in aggs.items()]
        out = self.df.groupBy(*group_cols).agg(*exprs)
        return Frame(out, key=group_cols, ordered=False, _canonicalize=False)

    def cube_by(self, cols: list[str], aggs: dict[str, Callable[[Column], Column]],
                aliases: dict[str, str] | None = None) -> DataFrame:
        """Parity-plus (SURVEY §2.5 note): grouping-set cube over the
        given columns — the reference has no grouping sets; Spark gives
        them free."""
        aliases = aliases or {}
        exprs = [agg(F.col(c)).alias(aliases.get(c, c)) for c, agg in aggs.items()]
        return self.df.cube(*cols).agg(*exprs)

    def rollup_by(self, cols: list[str], aggs: dict[str, Callable[[Column], Column]],
                  aliases: dict[str, str] | None = None) -> DataFrame:
        """Parity-plus: hierarchical rollup over the given columns."""
        aliases = aliases or {}
        exprs = [agg(F.col(c)).alias(aliases.get(c, c)) for c, agg in aggs.items()]
        return self.df.rollup(*cols).agg(*exprs)

    def rank_within(self, by: list[str], order_col: str, method: str = "rank",
                    ascending: bool = False, out_col: str = "rank") -> "Frame":
        """Parity-plus: rank/dense_rank/row_number per group (the
        reference has no ranking windows; SURVEY §2.6 note)."""
        fns = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number}
        o = F.col(order_col).asc() if ascending else F.col(order_col).desc()
        w = Window.partitionBy(*by).orderBy(o)
        return self._with_df(self.df.withColumn(out_col, fns[method]().over(w)))

    def stats(self, agg: Callable[[Column], Column], cols: list[str] | None = None,
              col_name: str = "column", value_name: str = "value") -> Series:
        """Per-numeric-column whole-frame aggregate → series keyed by
        column name — `Frame.mean/sum/...` (src/FrameModule.fs:385-407).
        One pass over the data computing every column's aggregate, then
        an unpivot of the 1-row result (driver-side trivial)."""
        cols = cols or self.numeric_columns()
        row = self.df.agg(*[agg(F.col(c)).alias(c) for c in cols])
        melted = row.unpivot([], cols, col_name, value_name)
        return Series(melted, key=col_name, value=value_name, ordered=False)

    def pivot(self, row_key: str, col_key: str, value: str,
              agg: Callable[[Column], Column] = F.first, values: list | None = None) -> "Frame":
        """`unstack`-style pivot (src/FrameModule.fs:437-448).  Passing
        ``values=`` skips the distinct-values job Spark otherwise runs."""
        p = self.df.groupBy(row_key).pivot(col_key, values) if values else self.df.groupBy(row_key).pivot(col_key)
        return Frame(p.agg(agg(F.col(value))), key=row_key, ordered=False)

    def melt(self, id_cols: list[str], value_cols: list[str],
             var_name: str = "column", value_name: str = "value") -> "Frame":
        """`stack` (src/FrameModule.fs:437-448) — unpivot, built-in."""
        out = self.df.unpivot(id_cols, value_cols, var_name, value_name)
        return Frame(out, key=id_cols + [var_name], ordered=False, _canonicalize=False)

    # ------------------------------------------------------------------
    # missing-data (§2.8)
    # ------------------------------------------------------------------

    def fill_missing_with(self, const) -> "Frame":
        """`Frame.fillMissingWith` — type-matched columns only
        (src/FrameModule.fs:471-508): Spark's fillna has exactly that
        semantics (fills only columns whose type matches the constant)."""
        return self._with_df(self.df.fillna(const))

    def fill_missing(self, direction: str = "forward", cols: list[str] | None = None,
                     by: list[str] | None = None, bucketed: bool = True) -> "Frame":
        """Directional fill on every (or selected) data column — one
        window pass for all columns.  The global (no-``by``) form uses
        the bucketed carry cascade (operators/bucketed.py), same as the
        Series fill."""
        self._require_ordered("fill_missing(direction)")
        cols = cols or self.column_keys
        if not by and bucketed:
            from fsharp_dataframe_spark.operators.bucketed import (
                bucketed_directional_fill,
            )

            out = bucketed_directional_fill(self.df, self.key_cols, cols, direction)
            return self._with_df(out)
        w = Window.partitionBy(*(by or [])).orderBy(*[F.col(k) for k in self.key_cols])
        if direction == "forward":
            w = w.rowsBetween(Window.unboundedPreceding, 0)
            exprs = {c: F.last(F.col(c), ignorenulls=True).over(w) for c in cols}
        elif direction == "backward":
            w = w.rowsBetween(0, Window.unboundedFollowing)
            exprs = {c: F.first(F.col(c), ignorenulls=True).over(w) for c in cols}
        else:
            raise ValueError(direction)
        return self._with_df(self.df.withColumns(exprs))

    def describe(self, cols: list[str] | None = None,
                 exact_distinct: bool = True):
        """Per-column audit of the frame's data columns (frame-wide
        melt of the reference's per-series facts — countValues
        src/SeriesModule.fs:183-188, frame-wide stat maps
        src/FrameModule.fs:385-404): one row per column with row/null/
        distinct counts and numeric min/max.  Returns a plain
        DataFrame (the profile is a report, not a keyed frame).
        Delegates to functions/profile.profile_columns — one pruned
        scan per column, no multi-countDistinct Expand."""
        from fsharp_dataframe_spark.functions.profile import profile_columns

        return profile_columns(self.df, cols or self.column_keys,
                               exact_distinct=exact_distinct)

    def drop_sparse_rows(self) -> "Frame":
        """`dropSparseRows` (src/FrameModule.fs:519-532): drop rows with
        any missing data column."""
        return self._with_df(self.df.dropna(how="any", subset=self.column_keys))

    def drop_sparse_cols(self) -> "Frame":
        """`dropSparseCols` (src/FrameModule.fs:534-554): drop columns
        containing any missing value.  Needs one null-count aggregate
        over the data (an action) — same contract as the reference,
        which scans every vector."""
        counts = self.df.agg(*[
            F.sum(F.col(c).isNull().cast("long")).alias(c) for c in self.column_keys
        ]).collect()[0].asDict()
        keep = [c for c in self.column_keys if (counts[c] or 0) == 0]
        return self.select_cols(keep)

    # ------------------------------------------------------------------
    # frame arithmetic (§2.10) — applied to every numeric column
    # ------------------------------------------------------------------

    def _arith(self, other, op) -> "Frame":
        num = self.numeric_columns()
        if isinstance(other, Frame):
            return self.zip_frames(other, op)
        if isinstance(other, Series):
            rhs = other.df.select(
                *[F.col(a).alias(b) for a, b in zip(other.key_cols, self.key_cols)],
                F.col(other.value_col).alias("__rhs"),
            )
            joined = self.df.join(rhs, on=self.key_cols, how="left")
            out = joined.withColumns({c: op(F.col(c), F.col("__rhs")) for c in num}).drop("__rhs")
            return self._with_df(out, canonicalize=True)
        return self.map_cols({c: op(F.col(c), F.lit(other)) for c in num})

    def __add__(self, other):
        return self._arith(other, lambda a, b: a + b)

    def __sub__(self, other):
        return self._arith(other, lambda a, b: a - b)

    def __mul__(self, other):
        return self._arith(other, lambda a, b: a * b)

    def __truediv__(self, other):
        return self._arith(other, lambda a, b: a / b)

    # reflected forms — the reference supports scalar-on-left frame
    # arithmetic (2.0 - df, 2.0 / df: tests/.../Frame.fs:62-82); only
    # scalar/Series reach these (Frame+Frame binds the normal form)
    def __radd__(self, other):
        return self._arith(other, lambda a, b: b + a)

    def __rsub__(self, other):
        return self._arith(other, lambda a, b: b - a)

    def __rmul__(self, other):
        return self._arith(other, lambda a, b: b * a)

    def __rtruediv__(self, other):
        return self._arith(other, lambda a, b: b / a)
