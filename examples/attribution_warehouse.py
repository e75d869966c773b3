"""Attribution warehouse — the round-7 tier composed end-to-end over
the event log, each stage a scale-audited engine operator:

    events (ns-timestamp parquet)
      → SCD2 dimension     (each user's value-band history from view
                            events: change-detected validity intervals)
      → point-in-time join (every purchase reads the band valid at its
                            OWN event time — keyed hash join, 1:1 by
                            interval construction)
      → last-touch credit  (most recent strictly-preceding click within
                            3 days; ONE key-windowed carry, no
                            self-join)
      → transition matrix  (what users do NEXT, exact basis-point
                            probabilities)
      → basket pairs       (which event types co-occur per user:
                            support / confidence / lift)

Run:  python examples/attribution_warehouse.py [sf_dir]

Prints one JSON line per stage — the shape of a daily attribution job.
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
    from fsharp_dataframe_spark.functions.events import (
        event_cooccurrence, event_transitions, last_touch_attribution,
    )
    from fsharp_dataframe_spark.functions.scd import (
        point_in_time_join, scd2_from_events,
    )

    ev = load_table(spark, sf_dir, "events")
    out: dict[str, object] = {}

    # 1. SCD2 dimension: the user's view-value band history
    views = (ev.filter(F.col("event_type") == "view")
             .withColumn("band", F.floor(F.col("value") / 50)
                         .cast("long")))
    dim = scd2_from_events(views, "user_id", "ts", ["band"],
                           tiebreak="event_id")
    out["scd2_dim"] = {"intervals": dim.count()}

    # 2. purchases read the band valid at their own time
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    pit = point_in_time_join(
        purchases, dim.select("user_id", "band", "valid_from", "valid_to"),
        "user_id", "ts", how="left")
    out["point_in_time"] = {
        "purchases": pit.count(),
        "with_band": pit.filter(F.col("band").isNotNull()).count()}

    # 3. last-touch attribution with a 3-day window
    attr = last_touch_attribution(ev, "purchase", ["click"],
                                  max_lag_s=3 * 86400)
    out["attribution"] = {
        "conversions": attr.count(),
        "attributed": attr.filter(F.col("touch_type").isNotNull()).count()}

    # 4. what happens next: transition matrix
    tr = event_transitions(ev)
    top = (tr.orderBy(F.desc("prob_bp")).limit(3)
           .select("from_type", "to_type", "prob_bp").collect())
    out["transitions"] = {
        "pairs": tr.count(),
        "top": [f"{r['from_type']}->{r['to_type']}:{r['prob_bp']}bp"
                for r in top]}

    # 5. co-occurrence (support/confidence/lift)
    bk = event_cooccurrence(ev)
    out["basket"] = {"pairs": bk.count()}
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="attribution-warehouse-example")
    for stage, payload in run(spark, sf_dir).items():
        print(json.dumps({"stage": stage, **payload}))


if __name__ == "__main__":
    main()
