"""HLL sketch rollups (functions/sketch.py): the merge-equality
invariant (union of slice sketches == sketch of the union, EXACTLY),
error bounds vs exact distinct counts, and plan shape."""

from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions.sketch import (
    distinct_sketch_rollup, estimate_distinct, merge_distinct_sketches,
)
from fsharp_dataframe_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_merge_of_slices_equals_direct_sketch(spark):
    ev = load_table(spark, SF, "events")
    # fine-grain rollup (per day), then merged to one global estimate
    daily = distinct_sketch_rollup(
        ev.withColumn("day", F.col("ts").cast("date")), "day", "user_id")
    merged = merge_distinct_sketches(daily, by=None).first()["n_distinct"]
    # direct single sketch over all rows — must be EXACTLY equal (the
    # lossless-merge contract, not an approximation)
    direct = (ev.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg("user_id", F.lit(12))).alias("n"))
        .first()["n"])
    assert merged == direct


def test_estimate_within_hll_error_of_exact(spark):
    ev = load_table(spark, SF, "events")
    exact = ev.select("user_id").distinct().count()
    est = merge_distinct_sketches(
        distinct_sketch_rollup(
            ev.withColumn("g", F.lit(1)), "g", "user_id"),
        by=None).first()["n_distinct"]
    # lg_k=12 -> ~1.6% RSE; allow 5 sigma on a small cardinality
    assert abs(est - exact) <= max(3, 0.08 * exact), (est, exact)


def test_rollup_is_one_mapside_combined_shuffle(spark):
    ev = load_table(spark, SF, "events")
    daily = distinct_sketch_rollup(
        ev.withColumn("day", F.col("ts").cast("date")), "day", "user_id")
    plan = daily._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    out = estimate_distinct(daily)
    rows = out.collect()
    assert all(r["n_distinct"] >= 1 for r in rows) and len(rows) >= 25
