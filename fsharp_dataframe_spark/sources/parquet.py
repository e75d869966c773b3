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


def _nanos_fields(path: str) -> list[str]:
    try:
        import pyarrow.parquet as pq
        import pyarrow.dataset as ds

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name for f in schema
            if str(f.type) == "timestamp[ns]"
        ]
    except Exception:
        return []


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    # Runtime SQL conf: must be set on whatever session the caller supplies
    # (the driver's harness builds its own vanilla SparkSession), not just
    # on sessions built by get_spark().  Without it, any parquet file with
    # TIMESTAMP(NANOS) columns fails with PARQUET_TYPE_ILLEGAL.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Parquet TIMESTAMP(isAdjustedToUTC=false) columns: Spark 4 infers
    # TIMESTAMP_NTZ by default, a type that refuses numeric casts and so
    # breaks every key-arithmetic path (range bucketing, as-of distance,
    # resampling).  Disabling the inference reads the stored micros as
    # UTC-epoch TimestampType (LTZ) — the engine's canonical temporal
    # type, identical to what the nanos conversion below produces.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    for c in _nanos_fields(path):
        if dict(df.dtypes).get(c) == "bigint":
            # integer DIV: ns values exceed double's 53-bit mantissa, so
            # float division would round the microseconds
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md) with normalization."""
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


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
