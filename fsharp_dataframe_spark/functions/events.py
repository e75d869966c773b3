"""Event-stream batch analytics: gap-based sessionization.

The batch sibling of streaming/ops.stream_session_windows (which uses
Structured Streaming's session_window): assign every event a session id
such that two consecutive events of the same key belong to the same
session iff they are at most ``gap`` apart — the classic
clickstream/telemetry rollup, and the reference's grouped time-series
semantics (Series groupBy + ordered chunking, reference
src/FSharp.DataFrame/Series.fs chunkWhile family) applied to event
logs.

Scale shape: ONE shuffle on the session key; inside each key the
boundary flag is a lag() and the session index a running sum over the
same window — Spark computes both in a single per-key sort that spills
past memory.  A pathological key (one bot with 10^9 events) serializes
into one task: pre-split such keys by a coarse time bucket first if the
corpus has them (the session that straddles a bucket boundary is the
price; telemetry pipelines routinely accept it).  All boundary
arithmetic is integer microseconds (unix_micros), so a SQL oracle
replays membership exactly — no float epoch drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _isum(c, scale: int = 10000):
    """Order-independent exact sum: round to integer 1/scale units
    first (double summation order varies with partitioning; BIGINT
    sums don't)."""
    return F.sum(F.round(c * scale).cast("long"))


def sessionize(df: DataFrame, key_col: str = "user_id", ts_col: str = "ts",
               gap_seconds: int = 1800, order_col: str = "event_id",
               session_col: str = "session_idx") -> DataFrame:
    """Tag every event with its 1-based per-key session index.

    A session breaks when the gap to the previous event of the same key
    exceeds ``gap_seconds`` (strict >, so events exactly ``gap`` apart
    share a session).  ``order_col`` breaks timestamp ties so the lag —
    and therefore session membership — is deterministic under reruns
    and repartitioning.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(us, F.col(order_col))
    prev = F.lag(us).over(w)
    brk = F.when(prev.isNull() | (us - prev > gap_seconds * 1_000_000), 1) \
           .otherwise(0)
    run = Window.partitionBy(key_col).orderBy(us, F.col(order_col)) \
                .rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("__brk", brk) \
             .withColumn(session_col, F.sum("__brk").over(run).cast("long")) \
             .drop("__brk")


def session_stats(df: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", gap_seconds: int = 1800,
                  order_col: str = "event_id",
                  value_col: str | None = "value") -> DataFrame:
    """Per-session rollup: event count, start/end timestamps, duration
    in whole seconds, and (optionally) the fixed-point-exact sum of
    ``value_col`` (the _isum discipline — partition-order-invariant, so
    an oracle replays it bit-for-bit).

    Same single shuffle as sessionize (the groupBy reuses the session
    key's partitioning).  Returns
    (key, session_idx, n_events, t_start, t_end, duration_s[, sum_value]).
    """
    s = sessionize(df, key_col, ts_col, gap_seconds, order_col)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
        ((F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
         / F.lit(1_000_000)).cast("long").alias("duration_s"),
    ]
    if value_col is not None:
        aggs.append(F.round(_isum(F.col(value_col)) / 10000.0, 2)
                    .alias("sum_value"))
    return s.groupBy(F.col(key_col), F.col("session_idx")).agg(*aggs)
