"""Parquet ingest with timestamp normalization.

Spark (4.x) has no TIMESTAMP(NANOS) type: with
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py) a
nanosecond column arrives as LongType nanoseconds-since-epoch.  This
loader detects those fields from the parquet footer (pyarrow, driver
side, metadata-only — no data read) and converts them to proper
microsecond timestamps so downstream temporal operators behave
identically across tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _footer_schema(path: str):
    try:
        import pyarrow.dataset as ds

        return ds.dataset(path, format="parquet").schema
    except Exception:
        return None


def _nanos_fields(path: str) -> list[str]:
    schema = _footer_schema(path)
    if schema is None:
        return []
    return [f.name for f in schema if str(f.type) == "timestamp[ns]"]


def _ntz_fields(path: str) -> list[str]:
    """Fields stored as parquet TIMESTAMP(isAdjustedToUTC=false) —
    wall-clock local time per the parquet spec (pyarrow: timestamp
    without tz, excluding the ns case handled separately)."""
    schema = _footer_schema(path)
    if schema is None:
        return []
    import pyarrow as pa

    return [f.name for f in schema
            if pa.types.is_timestamp(f.type) and f.type.tz is None
            and f.type.unit != "ns"]


def read_parquet(spark: SparkSession, path: str, ntz: str = "utc",
                 _warn_ntz: bool = True) -> DataFrame:
    """Read parquet with the engine's timestamp normalization.

    ``ntz`` controls TIMESTAMP(isAdjustedToUTC=false) columns — per the
    parquet spec those are WALL-CLOCK local times:

    - ``"utc"`` (default): read the stored micros as UTC-epoch
      TimestampType (LTZ), the engine's canonical temporal type.  This
      matches how the engine and the driver testdata write timestamps
      (wall-clock == UTC), but REINTERPRETS foreign files whose NTZ
      columns genuinely mean local time — a warning is emitted naming
      the affected columns (footer metadata check, no data read).
    - ``"keep"``: preserve TIMESTAMP_NTZ.  NTZ refuses numeric casts,
      so key-arithmetic operators (range bucketing, as-of distance,
      resampling) require an explicit cast by the caller.
    """
    if ntz not in ("utc", "keep"):
        raise ValueError(f"ntz must be 'utc' or 'keep', got {ntz!r}")
    # Runtime SQL conf: must be set on whatever session the caller supplies
    # (the driver's harness builds its own vanilla SparkSession), not just
    # on sessions built by get_spark().  Without it, any parquet file with
    # TIMESTAMP(NANOS) columns fails with PARQUET_TYPE_ILLEGAL.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ-inference conf is consulted at schema-inference time (the
    # eager spark.read.parquet below), so setting it per-read scopes the
    # reinterpretation to THIS loader's files rather than silently
    # changing the session for foreign reads.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled",
                   "true" if ntz == "keep" else "false")
    if ntz == "utc" and _warn_ntz:
        reinterpreted = _ntz_fields(path)
        if reinterpreted:
            import warnings

            warnings.warn(
                f"read_parquet(ntz='utc'): columns {reinterpreted} are "
                f"stored as parquet TIMESTAMP(isAdjustedToUTC=false) "
                f"(wall-clock local time) and are being read as UTC-epoch "
                f"instants; pass ntz='keep' to preserve TIMESTAMP_NTZ",
                stacklevel=2)
    df = spark.read.parquet(path)
    for c in _nanos_fields(path):
        if dict(df.dtypes).get(c) == "bigint":
            # integer DIV: ns values exceed double's 53-bit mantissa, so
            # float division would round the microseconds
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md) with normalization.

    The testdata's NTZ timestamps are DEFINED as UTC wall-clock
    (TESTDATA.md), so the foreign-file reinterpretation warning is
    suppressed for this known-provenance path."""
    return read_parquet(spark, f"{sf_dir}/{name}.parquet", _warn_ntz=False)


def save_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                 partition_by: list[str] | None = None,
                 sort_by: list[str] | None = None,
                 max_records_per_file: int | None = None,
                 compression: str | None = None) -> None:
    """Scale-aware parquet sink.

    The write SHAPE decides every downstream read's cost at 100 TB:

    - ``partition_by``: hive-style directory partitioning → partition
      PRUNING (a reader filtering on the partition column never lists,
      let alone scans, the other directories).  The data is first
      repartitioned BY the partition columns so each output directory
      is written by the tasks owning its rows — without this, every
      task appends a file to every directory and a 1000-task × 1000-
      partition write melts the namenode with a million small files.
    - ``sort_by``: sortWithinPartitions before writing → parquet
      row-group min/max stats become narrow and disjoint, so range
      predicates skip whole row groups (zone-map behavior for free).
    - ``max_records_per_file``: bounds file size so a single task's
      output stays splittable and memory-sized.
    """
    w = df
    if partition_by:
        w = w.repartition(*[F.col(c) for c in partition_by])
    if sort_by:
        w = w.sortWithinPartitions(*[F.col(c) for c in sort_by])
    writer = w.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def merge_parquet(spark: SparkSession, path: str, updates: DataFrame,
                  id_col: str = "doc_id",
                  partition_by: list[str] | None = None,
                  sort_by: list[str] | None = None) -> None:
    """Upsert into a parquet table without a lakehouse format: rows in
    ``updates`` replace existing rows with the same ``id_col``, new ids
    append, everything else is untouched — the MERGE INTO every
    incremental ingest needs, done with plain parquet.

    Scale shape — **partition-scoped rewrite**: with ``partition_by``
    (the table's layout), only the partitions PRESENT in ``updates``
    are read (a pruned scan driven by the updates' distinct partition
    values — a bounded driver list) and only those directories are
    replaced, via Spark's dynamic partitionOverwriteMode.  A 10-row
    update against a 100 TB table touches one partition directory, not
    the table.  An id must never move between partitions across
    updates (standard upsert-partitioning contract: the partition
    columns are a function of the id); a moved id would leave its old
    row in the old partition.

    Unpartitioned tables are rewritten whole through a staging
    directory + rename (atomic on HDFS-like stores; object stores get
    a copy window — partition the table instead at any real size).

    The merged slice is localCheckpoint-ed before the write: Spark
    refuses to overwrite a path it is lazily reading from, and the
    checkpoint also bounds the re-read to the affected partitions.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        save_parquet(updates, path, partition_by=partition_by,
                     sort_by=sort_by)
        return
    existing = read_parquet(spark, path)
    if partition_by:
        touched = updates.select(*partition_by).distinct().collect()
        cond = None
        for r in touched:
            c = None
            for k in partition_by:
                eq = F.col(k).eqNullSafe(F.lit(r[k]))
                c = eq if c is None else (c & eq)
            cond = c if cond is None else (cond | c)
        affected = existing.filter(cond) if cond is not None else existing.limit(0)
        merged = (affected.join(updates.select(id_col), on=id_col,
                                how="left_anti")
                  .unionByName(updates.select(*affected.columns))
                  .localCheckpoint(eager=True))
        w = merged.repartition(*[F.col(c) for c in partition_by])
        if sort_by:
            w = w.sortWithinPartitions(*[F.col(c) for c in sort_by])
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (w.write.mode("overwrite").partitionBy(*partition_by)
             .parquet(path))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        return
    merged = (existing.join(updates.select(id_col), on=id_col,
                            how="left_anti")
              .unionByName(updates.select(*existing.columns)))
    if sort_by:
        merged = merged.sortWithinPartitions(*[F.col(c) for c in sort_by])
    staging = path.rstrip("/") + ".__staging__"
    spath = jvm.org.apache.hadoop.fs.Path(staging)
    merged.write.mode("overwrite").parquet(staging)
    # swap via rename-aside, never delete-then-rename: a crash between
    # a delete and the staging rename would leave NO table at `path`.
    # Renames are atomic on HDFS-like stores, so the only non-atomic
    # window is between the two renames — and the old table survives it
    # in `old` for manual (or the except-branch's automatic) restore.
    old = path.rstrip("/") + ".__old__"
    opath = jvm.org.apache.hadoop.fs.Path(old)
    if fs.exists(opath):  # leftover from an earlier crashed merge
        fs.delete(opath, True)
    if not fs.rename(jpath, opath):
        raise IOError(f"merge_parquet: rename-aside {path} -> {old} failed "
                      f"(table untouched; merged data is in {staging})")
    try:
        if not fs.rename(spath, jpath):
            raise IOError(f"merge_parquet: rename {staging} -> {path} failed")
    except BaseException:
        fs.rename(opath, jpath)  # restore the pre-merge table
        raise
    fs.delete(opath, True)


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_bytes: int = 256 * 1024 * 1024,
                    sort_by: list[str] | None = None) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_bytes`` files (the maintenance job every incremental
    pipeline needs — a stream or per-batch append leaves thousands of
    KB-sized files whose open/footer cost dominates reads at scale).

    File count = ceil(input bytes / target); ``sort_by`` optionally
    re-sorts within files so row-group stats stay narrow after
    compaction.  Writes to ``dst`` (never in place — the swap is the
    caller's transactional rename/catalog move).  Returns the number
    of files written."""
    import math

    from pyspark.sql import functions as _F

    df = read_parquet(spark, src)
    # size the input through the Hadoop FileSystem of the path's
    # scheme (works for hdfs://, s3a://, file:// alike) — a local
    # glob would lie on a cluster store
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = int(fs.getContentSummary(jpath).getLength())
    n = max(1, math.ceil(total / max(1, int(target_bytes))))
    w = df.repartition(n)
    if sort_by:
        w = w.sortWithinPartitions(*[_F.col(c) for c in sort_by])
    w.write.mode("overwrite").parquet(dst)
    return sum(1 for _ in fs.globStatus(
        jvm.org.apache.hadoop.fs.Path(dst + "/*.parquet")) or [])


def zorder_column(df: DataFrame, cols: list[str], bits: int = 16) -> "F.Column":
    """Z-order (Morton) key over 2+ numeric/timestamp columns: each
    column is min-max scaled to ``bits`` bits (one tiny stats action),
    then the bits are interleaved — points close in EVERY dimension get
    close keys, so sorting by the key clusters the file into row groups
    whose min/max stats are narrow in ALL the columns at once (a
    single-column sort buys pruning on that column only).  Pure
    bitwise Column expression (codegen); 2 cols × 16 bits = a 32-bit
    key, plenty of resolution for row-group-sized buckets."""
    mins_maxs = df.agg(*[F.min(F.col(c).cast("double")).alias(f"mn_{i}")
                         for i, c in enumerate(cols)],
                       *[F.max(F.col(c).cast("double")).alias(f"mx_{i}")
                         for i, c in enumerate(cols)]).first()
    top = float((1 << bits) - 1)
    scaled = []
    for i, c in enumerate(cols):
        mn, mx = mins_maxs[f"mn_{i}"], mins_maxs[f"mx_{i}"]
        if mn is None or mx is None or mx == mn:
            scaled.append(F.lit(0).cast("long"))
        else:
            frac = (F.col(c).cast("double") - F.lit(float(mn))) \
                   / F.lit(float(mx - mn))
            scaled.append(F.round(frac * top).cast("long"))
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(s, bit).bitwiseAND(F.lit(1)),
                            bit * len(cols) + i))
    return z


def save_parquet_zorder(df: DataFrame, path: str, zorder_by: list[str],
                        bits: int = 16, mode: str = "overwrite",
                        n_files: int | None = None) -> None:
    """Parquet sink clustered by a Z-order key over ``zorder_by``:
    range-repartition + sort on the Morton key, so row-group min/max
    stats are narrow in EVERY listed column and point/range filters on
    ANY of them skip most of the file (the multi-dimensional sibling
    of save_parquet's single-column sort_by; tests verify the stat
    narrowing through pyarrow row-group metadata)."""
    spark = df.sparkSession
    z = zorder_column(df, zorder_by, bits)
    n = n_files or spark.sparkContext.defaultParallelism
    (df.withColumn("__z", z)
       .repartitionByRange(n, F.col("__z"))
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode(mode).parquet(path))


def save_bucketed_table(df: DataFrame, name: str, bucket_by: list[str],
                        n_buckets: int, sort_by: list[str] | None = None,
                        mode: str = "overwrite") -> None:
    """Persist as a BUCKETED managed table (`bucketBy` requires the
    table catalog, not a bare path): rows are hash-bucketed on the join
    key at write time, so joins/aggregations between co-bucketed tables
    need NO shuffle at read time — the Exchange disappears from the
    plan (tests/test_sink.py pins this).  This is how repeatedly-joined
    100 TB fact tables amortize their shuffle: pay it once at write."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(name)
