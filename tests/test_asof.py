"""As-of alignment tests — semantics from the reference's zip/sampling
tests (tests/FSharp.DataFrame.Tests/Series.fs:288-345, 180-189)."""

from datetime import datetime

from fsharp_dataframe_spark.series import NEAREST_GREATER, NEAREST_SMALLER, Series
from fsharp_dataframe_spark.comparator import assert_rows_equal, assert_series_equal
from fsharp_dataframe_spark.operators.asof import asof_zip


def sob(spark, pairs, schema="key int, value double", ordered=True):
    return Series.of_observations(spark, pairs, schema, ordered=ordered)


def test_get_items_nearest_smaller_with_missing_before_start(spark):
    # TestExplicitTimeSamples shape: probe before first key → missing
    # (tests/.../Series.fs:180-189)
    src = sob(spark, [(10, 1.0), (13, 2.0), (16, 3.0)])
    probe = spark.createDataFrame([(5,), (13,), (15,), (99,)], "key int")
    out = src.get_items(probe, NEAREST_SMALLER)
    assert_series_equal(out, [(5, None), (13, 2.0), (15, 2.0), (99, 3.0)])


def test_get_items_nearest_greater(spark):
    src = sob(spark, [(10, 1.0), (13, 2.0), (16, 3.0)])
    probe = spark.createDataFrame([(5,), (14,), (16,), (99,)], "key int")
    out = src.get_items(probe, NEAREST_GREATER)
    assert_series_equal(out, [(5, 1.0), (14, 3.0), (16, 3.0), (99, None)])


def test_asof_skips_missing_values(spark):
    # "nearest key with a VALUE": NULL at key 13 must be skipped
    # (fill-then-reindex rewrite, src/JoinHelpers.fs:49-53)
    src = sob(spark, [(10, 1.0), (13, None), (16, 3.0)])
    probe = spark.createDataFrame([(14,), (13,)], "key int")
    out = src.get_items(probe, NEAREST_SMALLER)
    assert_series_equal(out, [(13, 1.0), (14, 1.0)])


def test_asof_zip_left(spark):
    left = sob(spark, [(1, 100.0), (5, 500.0), (9, 900.0)])
    right = sob(spark, [(0, 1.0), (4, 2.0), (20, 9.0)])
    out = asof_zip(left, right, "backward")
    assert_rows_equal(out, [(1, 100.0, 1.0), (5, 500.0, 2.0), (9, 900.0, 2.0)], ["key"])
    out_f = asof_zip(left, right, "forward")
    assert_rows_equal(out_f, [(1, 100.0, 2.0), (5, 500.0, 9.0), (9, 900.0, 9.0)], ["key"])


def test_asof_zip_exact_key_match_included(spark):
    left = sob(spark, [(4, 40.0)])
    right = sob(spark, [(4, 1.0), (5, 2.0)])
    assert_rows_equal(asof_zip(left, right, "backward"), [(4, 40.0, 1.0)], ["key"])
    assert_rows_equal(asof_zip(left, right, "forward"), [(4, 40.0, 1.0)], ["key"])


def test_asof_bucketed_matches_plain(spark):
    # scalable bucketed path must agree with the single-window path
    src = sob(spark, [(i * 3, float(i)) for i in range(0, 200)])
    probe = spark.createDataFrame([(i,) for i in range(0, 600, 7)], "key int")
    plain = src.get_items(probe, NEAREST_SMALLER).df.orderBy("key").collect()
    from fsharp_dataframe_spark.operators.asof import asof_lookup

    bucketed = asof_lookup(probe, src.df, ["key"], "value", "backward", bucketed=True)
    got = bucketed.orderBy("key").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in plain]

    plain_f = src.get_items(probe, NEAREST_GREATER).df.orderBy("key").collect()
    bucketed_f = asof_lookup(probe, src.df, ["key"], "value", "forward", bucketed=True)
    assert [tuple(r) for r in bucketed_f.orderBy("key").collect()] == [tuple(r) for r in plain_f]


def test_asof_bucketed_skips_nulls_at_bucket_boundaries(spark):
    # every 5th source value missing: a bucket whose newest row is NULL
    # must carry its newest NON-NULL value, not skip to an older bucket
    src = sob(spark, [(i * 3, None if i % 5 == 4 else float(i)) for i in range(0, 200)])
    probe = spark.createDataFrame([(i,) for i in range(0, 600, 7)], "key int")
    from fsharp_dataframe_spark.operators.asof import asof_lookup

    for direction in ("backward", "forward"):
        lookup = NEAREST_SMALLER if direction == "backward" else NEAREST_GREATER
        plain = src.get_items(probe, lookup).df.orderBy("key").collect()
        bucketed = asof_lookup(probe, src.df, ["key"], "value", direction,
                               bucketed=True).orderBy("key").collect()
        assert [tuple(r) for r in bucketed] == [tuple(r) for r in plain], direction


def test_asof_bucketed_sparse_source_dense_probe(spark):
    # few source rows + many probes → most range buckets contain NO
    # source rows; their probes must read the carry cascade, not NULL
    # (regression: carry relation once only held non-empty buckets)
    src = sob(spark, [(0, 10.0), (500, 20.0), (990, 30.0)])
    probe = spark.createDataFrame([(i,) for i in range(0, 1000, 3)], "key int")
    for direction, lookup in (("backward", NEAREST_SMALLER), ("forward", NEAREST_GREATER)):
        from fsharp_dataframe_spark.operators.asof import asof_lookup

        plain = src.get_items(probe, lookup).df.orderBy("key").collect()
        bucketed = asof_lookup(probe, src.df, ["key"], "value", direction,
                               bucketed=True).orderBy("key").collect()
        assert [tuple(r) for r in bucketed] == [tuple(r) for r in plain], direction


def test_asof_bucketed_plan_has_no_global_window(spark):
    # the point of the bucketed path: no single-partition total-order
    # window anywhere in the physical plan
    src = sob(spark, [(i * 3, float(i)) for i in range(0, 200)])
    probe = spark.createDataFrame([(i,) for i in range(0, 600, 7)], "key int")
    from fsharp_dataframe_spark.operators.asof import asof_lookup

    plan = asof_lookup(probe, src.df, ["key"], "value", "backward",
                       bucketed=True)._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan
    # the data-sized fill window must be hash-partitioned by bucket ...
    assert "Exchange hashpartitioning(__asof_bucket" in plan
    # ... and the only single-partition exchange is the n_buckets-row
    # carry cascade (feeds the broadcast join), never the fill window
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition(__asof_bucket#" in line:
            assert "], [__asof_bucket" in line, f"fill window not partitioned: {line}"


def test_asof_with_by_partition(spark):
    # per-entity as-of: the 100 TB path
    left = Series(
        spark.createDataFrame(
            [("u1", 5, 1.0), ("u2", 5, 2.0)], "uid string, key int, value double"
        ).select("uid", "key", "value"),
        key=["uid", "key"], value="value", ordered=True,
    )
    right_df = spark.createDataFrame(
        [("u1", 3, 30.0), ("u1", 6, 60.0), ("u2", 4, 40.0)],
        "uid string, key int, rv double",
    )
    from fsharp_dataframe_spark.operators.asof import asof_align_frame

    out = asof_align_frame(
        left.df, right_df, key_cols=["key"], fill_cols=["rv"], direction="backward", by=["uid"]
    )
    assert_rows_equal(out, [("u1", 5, 1.0, 30.0), ("u2", 5, 2.0, 40.0)], ["uid", "key"])


def test_bucketed_asof_survives_large_cut_counts(spark):
    # >128 cuts switches _bucket_expr to the binary-search path; the
    # old two-level filter(array, lambda) form crashed Union constraint
    # propagation ("key not found") above the as-of's two-sided union
    # and mis-bound per-branch — both regressions this pins
    from pyspark.sql import functions as F

    from fsharp_dataframe_spark.operators.asof import _union_fill

    src = spark.range(3000).select((F.col("id") * 10).alias("k"),
                                   (F.col("id") * 1.0).alias("v"))
    prb = spark.range(500).select((F.col("id") * 61 + 3).alias("k"))
    out = _union_fill(prb, src, ["k"], ["v"], [], "backward", [], True, 200)
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert len(rows) == 500
    # as-of semantics: last source key <= probe key, key = 10*v
    assert rows[64] == 6.0 and rows[3] == 0.0 and rows[61 * 499 + 3] == 2999.0


def test_asof_tolerance_numeric_backward_and_forward(spark):
    from fsharp_dataframe_spark.operators.asof import asof_align_frame

    probe = spark.createDataFrame(
        [("u", 10, 1), ("u", 50, 2)], "uid string, k long, pid long")
    src = spark.createDataFrame(
        [("u", 8, 1.0), ("u", 60, 2.0)], "uid string, k long, v double")
    back = {r["pid"]: r["v"] for r in asof_align_frame(
        probe, src, ["k"], ["v"], "backward", by=["uid"],
        tolerance=5).collect()}
    # k=10 matches k=8 (dist 2 <= 5); k=50's nearest smaller is 8 (dist
    # 42) -> lapses to NULL instead of a stale match
    assert back == {1: 1.0, 2: None}
    fwd = {r["pid"]: r["v"] for r in asof_align_frame(
        probe, src, ["k"], ["v"], "forward", by=["uid"],
        tolerance=15).collect()}
    assert fwd == {1: None, 2: 2.0}  # 60-50=10 <= 15; 8 is behind


def test_asof_tolerance_exact_match_and_per_column_keys(spark):
    from fsharp_dataframe_spark.operators.asof import asof_align_frame

    probe = spark.createDataFrame([("u", 100, 1)],
                                  "uid string, k long, pid long")
    # column a last non-null at k=100 (exact), column b at k=40 (stale):
    # per-column carry must keep a and lapse b
    src = spark.createDataFrame(
        [("u", 40, 7.0, 8.0), ("u", 100, 9.0, None)],
        "uid string, k long, a double, b double")
    out = asof_align_frame(probe, src, ["k"], ["a", "b"], "backward",
                           by=["uid"], tolerance=10).collect()[0]
    assert out["a"] == 9.0 and out["b"] is None


def test_asof_tolerance_bucketed_equals_keyed(spark):
    """Bucketed tolerance (r9): on random data, the bucketed global
    path must agree row-for-row with the single-partition keyed path
    under the same tolerance, both directions, including per-column
    lapse (a sparse column whose carry crosses bucket boundaries)."""
    import random

    from fsharp_dataframe_spark.operators.asof import _union_fill

    rng = random.Random(909)
    src_rows = sorted(rng.sample(range(0, 100_000), 800))
    # column b is sparse (70% null) so its nearest valued key is often
    # far behind -> exercises carry-across-buckets + lapse together
    src = spark.createDataFrame(
        [(k, float(k), float(k) * 2 if rng.random() > 0.7 else None)
         for k in src_rows], "k long, a double, b double")
    prb = spark.createDataFrame(
        [(rng.randrange(0, 100_000),) for _ in range(600)], "k long")
    for direction in ("backward", "forward"):
        for tol in (25.0, 400.0):
            plain = _union_fill(prb, src, ["k"], ["a", "b"], [],
                                direction, [], tolerance=tol)
            buck = _union_fill(prb, src, ["k"], ["a", "b"], [],
                               direction, [], bucketed=True,
                               n_buckets=40, tolerance=tol)
            p = sorted((r["k"], r["a"], r["b"]) for r in plain.collect())
            b = sorted((r["k"], r["a"], r["b"]) for r in buck.collect())
            assert p == b, (direction, tol)


def test_asof_tolerance_rejects_string_key(spark):
    import pytest

    from fsharp_dataframe_spark.operators.asof import asof_align_frame

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(TypeError, match="numeric or timestamp"):
        asof_align_frame(df.selectExpr("k", "1 as pid"), df, ["k"], ["v"],
                         "backward", by=None, tolerance=1)


def test_asof_bucketed_composite_key_equals_plain(spark):
    """Composite-key bucketed as-of (r9): bucket on the leading key,
    full-composite ordering inside buckets, composite-struct carry.
    Heavy leading-key ties force tiebreaks through the second level
    and across the carry cascade; must agree with the single-partition
    path row-for-row, both directions."""
    import random

    from fsharp_dataframe_spark.operators.asof import _union_fill

    rng = random.Random(911)
    # leading key coarse (many ties), second key fine
    src = spark.createDataFrame(
        [(rng.randrange(0, 300), rng.randrange(0, 1000),
          float(i), float(i) if rng.random() > 0.5 else None)
         for i in range(900)], "k1 long, k2 long, a double, b double")
    prb = spark.createDataFrame(
        [(rng.randrange(0, 300), rng.randrange(0, 1000), i)
         for i in range(700)], "k1 long, k2 long, pid long")
    for direction in ("backward", "forward"):
        plain = _union_fill(prb, src, ["k1", "k2"], ["a", "b"], ["pid"],
                            direction, [])
        buck = _union_fill(prb, src, ["k1", "k2"], ["a", "b"], ["pid"],
                           direction, [], bucketed=True, n_buckets=30)
        p = sorted(map(tuple, plain.collect()))
        g = sorted(map(tuple, buck.collect()))
        assert p == g, direction


def test_asof_bucketed_composite_key_with_tolerance(spark):
    """Tolerance composes with composite keys on the bucketed path:
    the lapse rule measures the LEADING key (documented), tiebreaks
    still resolve through the lower levels."""
    import random

    from fsharp_dataframe_spark.operators.asof import _union_fill

    rng = random.Random(912)
    src = spark.createDataFrame(
        [(rng.randrange(0, 200), rng.randrange(0, 50), float(i))
         for i in range(400)], "k1 long, k2 long, a double")
    prb = spark.createDataFrame(
        [(rng.randrange(0, 200), rng.randrange(0, 50), i)
         for i in range(300)], "k1 long, k2 long, pid long")
    for direction in ("backward", "forward"):
        plain = _union_fill(prb, src, ["k1", "k2"], ["a"], ["pid"],
                            direction, [], tolerance=7.0)
        buck = _union_fill(prb, src, ["k1", "k2"], ["a"], ["pid"],
                           direction, [], bucketed=True, n_buckets=20,
                           tolerance=7.0)
        assert sorted(map(tuple, plain.collect())) == \
            sorted(map(tuple, buck.collect())), direction
