"""Warehouse analytics — the round-6 tier composed end-to-end over the
event log, each stage a scale-audited engine operator:

    events (ns-timestamp parquet)
      → sketch table        (per-day HLL distinct-user sketches — the
                             pay-once rollup; any date range answers
                             by MERGING sketches, never rescanning)
      → seasonal anomalies  (hour × weekday baseline → residual →
                             robust MAD flags per event type)
      → first-week cohort   (keyed interval join: each user's events
                             inside their own [first_ts, +7d) window)
      → market rollup       (weekly OHLC bars + worst drawdown + lag-1
                             persistence per type)

Run:  python examples/warehouse_rollups.py [sf_dir]

Prints one JSON line per stage — the shape of a daily warehouse job.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fsharp_dataframe_spark import get_spark
from fsharp_dataframe_spark.sources.parquet import load_table


def run(spark, sf_dir: str) -> dict[str, object]:
    from fsharp_dataframe_spark.functions.sketch import (
        distinct_sketch_rollup, merge_distinct_sketches,
    )
    from fsharp_dataframe_spark.functions.stats import grouped_mad_outliers
    from fsharp_dataframe_spark.functions.timeseries import (
        interval_join, max_drawdown, ohlc_resample, seasonal_profile,
    )

    ev = load_table(spark, sf_dir, "events")
    out: dict[str, object] = {}

    # 1. per-day sketch table; a week's distinct users = merge 7 rows
    daily = distinct_sketch_rollup(
        ev.withColumn("day", F.col("ts").cast("date")), "day", "user_id")
    week1 = merge_distinct_sketches(
        daily.filter(F.col("day") < F.lit("2024-01-08")), by=None)
    # hll_union_agg over zero rows estimates NULL — report 0 users
    est = week1.first()["n_distinct"]
    out["sketches"] = {"days": daily.count(),
                       "week1_users": int(est or 0)}

    # 2. seasonality-aware anomaly flags per type
    base = seasonal_profile(ev, "event_type", "ts", "value").drop("n")
    ev2 = (ev.withColumn("hour", F.hour("ts"))
           .withColumn("weekday", F.weekday("ts")))
    j = ev2.join(F.broadcast(base), ["event_type", "hour", "weekday"])
    anom = grouped_mad_outliers(
        j, "event_type", F.col("value") - F.col("mean_value"), k=3.0)
    out["anomalies"] = {
        r["event_type"]: r["n_outliers"] for r in anom.collect()}

    # 3. first-week engagement via the keyed interval join
    iv = (ev.groupBy("user_id").agg(F.min("ts").alias("w_start"))
          .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 7 DAYS")))
    wk1 = interval_join(ev.select("user_id", "ts"), iv,
                        "ts", "w_start", "w_end", keys=["user_id"])
    out["week1_cohort"] = {"events": wk1.count()}

    # 4. market-style rollup
    bars = ohlc_resample(ev, "user_id", "ts", "value",
                         unit="week", tiebreak="event_id")
    dd = max_drawdown(ev, "user_id", "ts", "value", tiebreak="event_id")
    out["market"] = {
        "bars": bars.count(),
        "worst_drawdown": float(dd.agg(
            F.round(F.max("max_drawdown"), 4).alias("w")).first()["w"])}
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="warehouse-rollups-example")
    for stage, payload in run(spark, sf_dir).items():
        print(json.dumps({"stage": stage, **payload}))


if __name__ == "__main__":
    main()
