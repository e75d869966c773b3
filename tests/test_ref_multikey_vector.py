"""Direct ports of the two reference test files not previously cited
verbatim — tests/FSharp.DataFrame.Tests/MultiKey.fs (all 2 tests) and
Vector.fs (all 4) — closing the loop on the reference suite: every
reference test FILE now has a cited counterpart here (Series.fs,
Frame.fs and the Documentation/CSharp suites are ported across the
test_golden_* / test_series_core / test_frame_ops / test_api_parity
files).

The reference's Lookup1Of3/Lookup2Of3/Lookup3Of3 templates
(tests/MultiKey.fs:22-36, src/Indices/MultiKey.fs:114-159) are
hole-matching over tuple keys; the engine's multi-level keys are
columns, so a template with one filled hole IS Series.lookup_level.
The reference's Vector missing-value canonicalization
(tests/Vector.fs:19-39) is the engine's construction-boundary
NaN→NULL rule (missing.py, SURVEY §7.0)."""

import math

from pyspark.sql import functions as F

from fsharp_dataframe_spark import Series


def _mk(spark):
    # the reference's sampleKey1 = ('a', "hi", 1) lives among decoys
    # differing in exactly one level each, so every hole position is
    # discriminating (tests/MultiKey.fs:17-36)
    rows = [("a", "hi", 1, 10.0),
            ("!", "hi", 1, 11.0),
            ("a", "hi!", 1, 12.0),
            ("a", "hi", 999, 13.0)]
    df = spark.createDataFrame(rows, "k1 string, k2 string, k3 int, v double")
    return Series(df, key=["k1", "k2", "k3"], value="v")


def test_multikey_template_with_holes_matches(spark):
    """MultiKey.fs `Sample multi-level key matches templates with
    holes`: each one-hole template keeps the sample key."""
    s = _mk(spark)
    for level, val in [(0, "a"), (1, "hi"), (2, 1)]:
        got = {(r["k1"], r["k2"], r["k3"])
               for r in s.lookup_level(level, val).df.collect()}
        assert ("a", "hi", 1) in got


def test_multikey_template_other_values_do_not_match(spark):
    """MultiKey.fs `does not match templates with other values`: a
    template filled with a non-matching value drops the sample key."""
    s = _mk(spark)
    for level, val in [(0, "!"), (1, "hi!"), (2, 999)]:
        got = {(r["k1"], r["k2"], r["k3"])
               for r in s.lookup_level(level, val).df.collect()}
        assert ("a", "hi", 1) not in got
        assert got  # the decoy with that value IS matched


def test_vector_equality(spark):
    """Vector.fs `Equality on vectors works as expected`: a series
    equals its own observations under the structural comparator."""
    from fsharp_dataframe_spark.comparator import assert_series_equal

    s = Series.of_values(spark, [float(i) for i in range(1, 11)])
    obs = [tuple(r) for r in s.df.orderBy(*s.key_cols).collect()]
    assert_series_equal(s, obs)


def test_vector_nan_becomes_missing(spark):
    """Vector.fs `Double.NaN is turned into a missing value`:
    ofValues [1.0; NaN; 10.1] == ofOptionalValues [Some 1.0; None;
    Some 10.1] — NaN canonicalizes to NULL at construction."""
    actual = Series.of_values(spark, [1.0, float("nan"), 10.1])
    expected = Series.of_nullables(spark, [1.0, None, 10.1])
    a = [r["value"] for r in actual.df.orderBy("key").collect()]
    e = [r["value"] for r in expected.df.orderBy("key").collect()]
    assert a == e == [1.0, None, 10.1]
    assert not any(isinstance(v, float) and math.isnan(v) for v in a)


def test_vector_nullable_null_becomes_missing(spark):
    """Vector.fs `null of Nullable type is turned into a missing
    value`: SQL NULL is the engine's native missing — of_nullables
    round-trips None as NULL."""
    s = Series.of_nullables(spark, [1.0, None, 10.1])
    vals = [r["value"] for r in s.df.orderBy("key").collect()]
    assert vals == [1.0, None, 10.1]
    assert s.df.filter(F.col("value").isNull()).count() == 1


def test_vector_select_nan_becomes_missing(spark):
    """Vector.fs `Select method correctly turns Double.NaN into a
    missing value`: a map producing NaN yields missing everywhere —
    map_values re-canonicalizes after mapping (the reference does the
    same post-map, src/Vectors/ArrayVector.fs:213-223)."""
    s = Series.of_values(spark, [float(i) for i in range(1, 11)])
    mapped = s.map_values(lambda c: F.lit(float("nan")).cast("double"))
    assert mapped.df.count() == 10
    assert mapped.df.filter(F.col(mapped.value_col).isNotNull()).count() == 0


# ----------------------------------------------------------------------
# LazySeries.fs — the DelayedSeries tests' OBSERVABLE semantics.  The
# reference records which (lo, hi) range its loader is called with;
# the Spark analogue of "the loader saw a restricted range" is "the
# range predicate reached the parquet scan as PushedFilters" (plans
# are lazy by construction — DelayedSeries-as-API is subsumed,
# SURVEY §7.4).  tests/LazySeries.fs:37-72.
# ----------------------------------------------------------------------


def _lazy_series(spark, tmp_path):
    p = str(tmp_path / "lazy_ints.parquet")
    spark.createDataFrame([(i, i) for i in range(0, 101)],
                          "key int, value int").write.mode(
        "overwrite").parquet(p)
    df = spark.read.parquet(p)
    return Series(df, key=["key"], value="value", ordered=True)


def _pushed(series):
    plan = series.df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    return scan.split("PushedFilters:", 1)[-1]


def test_lazy_after_before_combined_restriction(spark, tmp_path):
    """`Multiple range restrictions are combined for sample calls`
    (LazySeries.fs:55-62): after(10).before(90) yields 11..89 AND the
    combined exclusive range reaches the scan as pushed filters —
    the engine's equivalent of the loader seeing
    [(10, Exclusive), (90, Exclusive)]."""
    s = _lazy_series(spark, tmp_path).after(10).before(90)
    vals = [r["value"] for r in s.df.orderBy("key").collect()]
    assert vals == list(range(11, 90))
    pushed = _pushed(s)
    assert "GreaterThan(key,10)" in pushed
    assert "LessThan(key,90)" in pushed


def test_lazy_splicing_inclusive_restriction(spark, tmp_path):
    """`Splicing syntax creates inclusive restrictions`
    (LazySeries.fs:64-71): between(50, 60) yields 50..60 with the
    inclusive bounds pushed to the scan."""
    s = _lazy_series(spark, tmp_path).between(50, 60)
    vals = [r["value"] for r in s.df.orderBy("key").collect()]
    assert vals == list(range(50, 61))
    pushed = _pushed(s)
    assert "GreaterThanOrEqual(key,50)" in pushed
    assert "LessThanOrEqual(key,60)" in pushed
