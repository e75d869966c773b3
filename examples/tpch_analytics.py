"""The complete TPC-H plan-class suite, run as a user would run it —
all 22 classic query shapes (Q1–Q22) adapted to the synthetic star
schema, each executed to completion with its wall time and row count.

Every query is a registered engine query (__spark_entry__), so the
same code paths are value-pinned against DuckDB oracles at three
scale factors and plan-pinned by the test suite; this example is the
ergonomic front door: point it at a sf dir and read the timings.

Run:  python examples/tpch_analytics.py [sf_dir]

Prints one JSON line per query plus a total — the shape of a nightly
reporting batch over the warehouse.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, sf_dir: str) -> list[dict]:
    import __spark_entry__ as entry
    from fsharp_dataframe_spark.functions.util import release_cached

    qs = entry._all_queries()
    names = sorted((k for k in qs if k.startswith("tpch_q")),
                   key=lambda s: int(s[6:]))
    assert len(names) == 22, names
    out = []
    for name in names:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        release_cached()
        out.append({"query": name, "rows": n, "sec": sec})
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from fsharp_dataframe_spark import get_spark

    spark = get_spark(app_name="tpch-suite-example",
                      master="local[8]", shuffle_partitions=8)
    rows = run(spark, sf_dir)
    for r in rows:
        print(json.dumps(r))
    print(json.dumps({"query": "TOTAL", "n_queries": len(rows),
                      "sec": round(sum(r["sec"] for r in rows), 2),
                      "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
