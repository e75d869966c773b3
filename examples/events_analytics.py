"""Event-log analytics — the product-analytics triple over one log:

    events (parquet)
      → session_stats      (30-min gap sessionization: ONE user-keyed
                            shuffle shared by lag, running sum, rollup)
      → funnel             (view → click → purchase, first-touch
                            anchors, strictly-after boundaries)
      → retention          (daily cohorts, epoch-anchored integer-µs
                            periods)
      → key_skew_stats     (is user_id safe to join/aggregate on at
                            scale, or does it need salting?)

Run:  python examples/events_analytics.py [sf_dir]

Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fsharp_dataframe_spark import get_spark
from fsharp_dataframe_spark.functions.events import (
    funnel, retention, session_stats,
)
from fsharp_dataframe_spark.functions.profile import key_skew_stats
from fsharp_dataframe_spark.sources.parquet import load_table


def analyze_events(spark, sf_dir: str) -> dict[str, object]:
    ev = load_table(spark, sf_dir, "events")
    out: dict[str, object] = {}

    sess = session_stats(ev, gap_seconds=1800)
    agg = sess.agg(F.count("*").alias("n_sessions"),
                   F.round(F.avg("n_events"), 2).alias("avg_events"),
                   F.round(F.avg("duration_s"), 1).alias("avg_duration_s")
                   ).first()
    out["sessions"] = {k: agg[k] for k in
                       ("n_sessions", "avg_events", "avg_duration_s")}

    out["funnel"] = [
        {"step": r["step"], "n_keys": r["n_keys"], "conversion": r["conversion"]}
        for r in funnel(ev, ["view", "click", "purchase"]).collect()]

    ret = retention(ev, period_seconds=86400)
    day1 = (ret.filter(F.col("offset") == 1)
            .agg(F.round(F.avg("rate"), 4).alias("avg_day1")).first())
    out["retention"] = {"n_cells": ret.count(), "avg_day1_rate": day1["avg_day1"]}

    top = key_skew_stats(ev, "user_id", top_n=1).first()
    out["key_skew"] = {"heaviest_user_share": top["share"],
                       "n_keys": top["n_keys"]}
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="events-analytics", master="local[8]",
                      shuffle_partitions=8)
    for stage, payload in analyze_events(spark, sf_dir).items():
        print(json.dumps({stage: payload}))


if __name__ == "__main__":
    main()
