"""Time-series analytics — the reference's §2 core composed end-to-end
over the event log, each stage a scale-audited engine operator:

    events (ns-timestamp parquet)
      → hourly grid         (per-type hourly value sums realigned to
                             the full hour spine — gaps become NULL)
      → linear interpolation (fill_missing("linear"): interior gaps
                             rebuilt from nearest known neighbours on
                             the bucketed carry-cascade substrate)
      → rolling correlation  (Frame.rolling_corr: trailing 24-hour
                             Pearson corr of view vs purchase volume,
                             halo-bucketed global window)
      → per-user EWMA        (Series.ewma: one Arrow fold per user;
                             the same recurrence streams via
                             streaming.stream_ewma with one double of
                             state per key)
      → as-of enrichment     (per-user backward as-of: every purchase
                             tagged with the user's last prior click)

Run:  python examples/timeseries_analytics.py [sf_dir]

Prints one JSON line per stage — the shape of a daily metrics job.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fsharp_dataframe_spark import Frame, Series, get_spark
from fsharp_dataframe_spark.operators.asof import asof_align_frame
from fsharp_dataframe_spark.sources.parquet import load_table


def analyze_timeseries(spark, sf_dir: str) -> dict[str, object]:
    ev = load_table(spark, sf_dir, "events")
    out: dict[str, object] = {}

    # 1. hourly per-type volume on the full hour spine (missing hours
    #    surface as NULL rather than silently vanishing)
    hourly = (ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
              .pivot("event_type", ["view", "purchase"])
              .agg(F.sum("value")))
    bounds = ev.agg(F.date_trunc("hour", F.min("ts")).alias("lo"),
                    F.date_trunc("hour", F.max("ts")).alias("hi"))
    spine = bounds.select(F.explode(
        F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour"))
    grid = spine.join(hourly, on="hour", how="left")
    out["hourly_grid"] = {"rows": grid.count()}

    # 2. interior gaps in purchase volume interpolated along the hour
    #    axis (edges stay NULL — no data is invented before the first
    #    or after the last observation)
    s = Series(grid.select("hour", "purchase"), key="hour",
               value="purchase", ordered=True)
    filled = s.fill_missing("linear").df.withColumnRenamed(
        "purchase", "purchase_filled")
    joined = grid.join(filled, on="hour")
    out["interpolated"] = {
        "gaps_filled": joined.filter(
            F.col("purchase").isNull()
            & F.col("purchase_filled").isNotNull()).count()}

    # 3. does view volume track purchase volume? trailing 24-hour
    #    Pearson correlation over the global hourly series
    fr = Frame(joined.select("hour", "view", "purchase_filled"),
               key="hour", ordered=True)
    corr = fr.rolling_corr("view", "purchase_filled", 24, bucketed=True)
    stats = corr.df.agg(
        F.round(F.avg("rolling_corr"), 4).alias("avg_corr24"),
        F.round(F.min("rolling_corr"), 4).alias("min_corr24")).first()
    out["rolling_corr"] = {"avg_corr24": stats["avg_corr24"],
                           "min_corr24": stats["min_corr24"]}

    # 4. per-user smoothed purchase value (EWMA, α=0.2) — the noisy
    #    per-event value vs its smoothed level
    purchases = ev.filter(F.col("event_type") == "purchase")
    ps = Series(purchases.select("user_id", "ts", "event_id", "value"),
                key=["user_id", "ts", "event_id"], value="value",
                ordered=True)
    smooth = ps.ewma(0.2, by=["user_id"])
    out["ewma"] = {"rows": smooth.df.count()}

    # 5. as-of enrichment: every purchase tagged with the same user's
    #    last prior click value (backward nearest lookup, per-entity)
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("user_id", "ts", F.col("value").alias("last_click_value"))
    probe = purchases.select("user_id", "ts", "event_id")
    enriched = asof_align_frame(probe, clicks, key_cols=["ts"],
                                fill_cols=["last_click_value"],
                                direction="backward", by=["user_id"])
    out["asof"] = {
        "purchases": enriched.count(),
        "with_prior_click": enriched.filter(
            F.col("last_click_value").isNotNull()).count()}

    # 6. market-style rollup (functions/timeseries): weekly OHLC bars
    #    per user, worst peak-to-trough drawdown, and the lag-1
    #    persistence of each event type's value series
    from fsharp_dataframe_spark.functions.timeseries import (
        autocorr, max_drawdown, ohlc_resample)

    bars = ohlc_resample(ev, "user_id", "ts", "value",
                         unit="week", tiebreak="event_id")
    dd = max_drawdown(ev, "user_id", "ts", "value", tiebreak="event_id")
    ac = autocorr(ev, "event_type", "ts", "value", lag=1,
                  tiebreak="event_id")
    worst = dd.agg(F.round(F.max("max_drawdown"), 4)
                   .alias("worst")).first()["worst"]
    out["market"] = {"bars": bars.count(), "worst_drawdown": worst,
                     "types_with_autocorr": ac.count()}
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="timeseries-analytics-example")
    for stage, payload in analyze_timeseries(spark, sf_dir).items():
        print(json.dumps({"stage": stage, **payload}))


if __name__ == "__main__":
    main()
