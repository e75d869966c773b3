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
