"""ORC source/sink — the second columnar format large pipelines meet
(Hive-era lakes are ORC; parquet-first shops still read ORC inputs).

Spark's ORC reader/writer is built in and gets the same treatment as
parquet: column pruning and predicate pushdown reach the scan
(`spark.sql.orc.filterPushdown` is on by default in Spark 4), writes
can partition/sort for pruning and zone-map row-group skipping, and
the engine's NaN→NULL ingest rule applies.

No reference analog (the reference is CSV-only, src/FrameUtils.fs) —
this is a parity-plus source like JSONL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def save_orc(df: DataFrame, path: str, mode: str = "overwrite",
             partition_by: list[str] | None = None,
             sort_by: list[str] | None = None,
             compression: str | None = None) -> None:
    """Scale-aware ORC sink — same write-shape rules as save_parquet:
    repartition BY the partition columns (one writer set per output
    directory, not every task appending to every directory) and
    sortWithinPartitions for narrow, disjoint stripe statistics."""
    w = df
    if partition_by:
        w = w.repartition(*[F.col(c) for c in partition_by])
    if sort_by:
        w = w.sortWithinPartitions(*[F.col(c) for c in sort_by])
    writer = w.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
