"""Pinned repeated micro-bench for attributing round-over-round bench
drift (VERDICT r11 ask #2).

bench.py's per-query numbers are single-shot (min-of-2 on the >2s
tail) inside one 190-query session — good for a round artifact, too
noisy to attribute a 20-40% family drift.  This tool pins a small
query set the judge's way: ONE fresh session, the same warm-up
discipline as bench.py, then N>=5 repeats per query with
release_cached() between repeats, reporting every raw run plus the
median and min.  Run it before and after a change (or against two
checkouts on the same box back-to-back) and compare MEDIANS — the
median of 5 fresh-session repeats is stable to ~±3% on a quiet box,
where bench.py single-shots swing ±20% on the Python-heavy tail.

Usage:
    python tools/microbench.py [SF_DIR] [-n REPEATS] QUERY [QUERY ...]
    # e.g. the r11 shingle-drift family + flat control:
    python tools/microbench.py /root/testdata/sf0.1 -n 5 \
        minhash_pairs ngram_jaccard incremental_dedup quantile_bins \
        containment_pairs ivf_train

Prints one JSON line per query to stdout:
    {"q": name, "runs": [...], "median": m, "min": lo, "load": [a, b]}
and a trailing summary line {"total_median": ..., "n_queries": ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from fsharp_dataframe_spark import get_spark


def main() -> None:
    argv = sys.argv[1:]
    repeats = 5
    if "-n" in argv:
        i = argv.index("-n")
        repeats = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sf_dir = "/root/testdata/sf0.1"
    if argv and os.path.isdir(argv[0]):
        sf_dir = argv[0]
        argv = argv[1:]
    names = argv
    if not names:
        print("usage: microbench.py [SF_DIR] [-n N] QUERY...", file=sys.stderr)
        sys.exit(2)
    qs = entrymod._all_queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="fsharp_dataframe_spark-microbench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    # bench.py's warm-up discipline: JVM/codegen, first shuffle, Arrow
    # workers — so repeat #1 measures the plan, not cold-start.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs["group_agg"](spark, sf_dir).count()
    qs["asof_join"](spark, sf_dir).count()
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda v: v * 1.0, "double")
    spark.range(10_000).repartition(cpus).select(
        _warm(F.col("id").cast("double"))).count()

    from fsharp_dataframe_spark.functions.util import release_cached

    load0 = round(os.getloadavg()[0], 2)
    total_median = 0.0
    for name in names:
        q = qs[name]
        runs: list[float] = []
        for _ in range(repeats):
            t0 = time.time()
            q(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
            release_cached()
        med = round(statistics.median(runs), 3)
        total_median += med
        print(json.dumps({
            "q": name, "runs": runs, "median": med,
            "min": min(runs),
            "load": [load0, round(os.getloadavg()[0], 2)],
        }, separators=(",", ":")))
        sys.stdout.flush()
    print(json.dumps({
        "total_median": round(total_median, 3),
        "n_queries": len(names), "repeats": repeats, "sf_dir": sf_dir,
        "cpus": cpus,
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
