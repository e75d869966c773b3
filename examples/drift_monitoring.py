"""Pipeline-health monitoring job — the round-8/9 monitoring tier
composed end-to-end over the events + documents corpora, each stage a
scale-audited engine operator:

    events parquet
      → PSI drift          (value distribution, first half of the
                            month vs the rest — the score-drift check
                            every nightly pipeline runs first)
      → CUSUM changepoints (per-user sustained mean shift; the JVM
                            window closed form, alarms counted)
      → gap report         (which users went dark for > 1 hour)
    documents parquet
      → Zipf fit           (vocabulary health: natural text ≈ −1)
      → classifier AUC     (does doc length separate English docs —
                            sanity check on a cheap routing feature)
      → packing efficiency (padding waste at candidate context lengths)

Run:  python examples/drift_monitoring.py [sf_dir]

Prints one JSON line per stage — the shape of the morning data-health
dashboard job.
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
    from fsharp_dataframe_spark.functions.drift import (
        binned_auc, population_stability, zipf_fit,
    )
    from fsharp_dataframe_spark.functions.sampling import packing_efficiency
    from fsharp_dataframe_spark.functions.timeseries import (
        cusum_changepoints, gap_report,
    )

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    out: dict[str, object] = {}

    # 1. distribution drift of the value column, early vs late month
    split = F.lit("2024-01-15").cast("timestamp")
    psi = population_stability(ev.filter(F.col("ts") < split),
                               ev.filter(F.col("ts") >= split),
                               "value", lo=0.0, hi=500.0, n_bins=20)
    terms = psi.agg(F.round(F.sum("psi_term"), 8).alias("psi")).first()
    out["psi_drift"] = {"psi": float(terms["psi"]),
                        "alert": bool(terms["psi"] > 0.2)}

    # 2. per-user sustained drift alarms (window closed form)
    cc = cusum_changepoints(ev, "user_id", "ts", "value",
                            target=50.0, slack=25.0, threshold=400.0,
                            tiebreak="event_id")
    al = cc.agg(F.sum(F.col("alarm").cast("long")).alias("alarms"),
                F.countDistinct(F.when(F.col("alarm"),
                                       F.col("user_id"))).alias("users"))
    r = al.first()
    out["cusum"] = {"alarms": int(r["alarms"] or 0),
                    "alarmed_users": int(r["users"] or 0)}

    # 3. data-completeness: users dark for more than an hour
    gaps = gap_report(ev, "user_id", "ts", min_gap_s=3600,
                      tiebreak="event_id")
    out["gaps"] = {"n_gaps": gaps.count()}

    # 4. corpus vocabulary health
    zf = zipf_fit(docs, k=300).first()
    out["zipf"] = {"slope": float(zf["slope"]), "r2": float(zf["r2"])}

    # 5. cheap-feature sanity: length vs English
    auc = binned_auc(docs, F.col("n_chars").cast("double"),
                     (F.col("lang") == "en").cast("int"),
                     lo=0.0, hi=600.0, n_bins=64).first()
    out["auc"] = {"auc": float(auc["auc"]),
                  "n_pos": int(auc["n_pos"])}

    # 6. context-length planning for the next packing run
    pe = {int(r["seq_len"]): float(r["waste_pct"]) for r in
          packing_efficiency(docs, [32, 64, 128]).collect()}
    out["packing"] = {"waste_pct_by_len": pe}
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="drift-monitoring-example")
    for stage, payload in run(spark, sf_dir).items():
        print(json.dumps({"stage": stage, **payload}))


if __name__ == "__main__":
    main()
