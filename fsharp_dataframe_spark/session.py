"""SparkSession factory tuned for this engine.

Local mode is the test bed; the configs are chosen so the same code path
scales to a real cluster: AQE on (runtime re-planning + skew-join
handling), shuffle partitions sized to cores locally (a cluster deploy
overrides via ``spark.sql.shuffle.partitions``), Arrow enabled for the
few Pandas-UDF operators, session timezone pinned to UTC so timestamp
semantics match the DuckDB oracle used in tests.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fsharp_dataframe_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults are env-overridable: ``SPARK_GRAFT_CPUS`` sets local
    parallelism; on a real cluster pass ``master=None`` with an external
    conf and only the semantic configs below matter.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
    if master is None:
        master = f"local[{cpus}]" if cpus > 0 else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus if cpus > 0 else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # read INT64 TIMESTAMP(NANOS) parquet columns as long instead of
        # erroring; sources/parquet.py converts them back to timestamps
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
