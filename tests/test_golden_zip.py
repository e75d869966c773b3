"""Golden port of the reference's series zip/align tests
(tests/FSharp.DataFrame.Tests/Series.fs:276-344): ZipInto, the four
ZipAlignInto kind×lookup combinations, and the lookup-skips-missing
rule.  Every expected value is the reference test's own literal.
"""

from datetime import date

from fsharp_dataframe_spark.series import Series

D = date
A = [(D(2013, 9, 9), 1.0), (D(2013, 9, 10), 2.0),
     (D(2013, 9, 11), 3.0), (D(2013, 9, 12), 4.0)]
B = [(D(2013, 9, 8), 8.0), (D(2013, 9, 11), 11.0)]


def _series(spark, rows, schema="day date, value double"):
    return Series(spark.createDataFrame(rows, schema),
                  key=schema.split(" ")[0], value="value", ordered=True)


def _vals(s):
    return [r["value"] for r in s.df.orderBy(*s.key_cols).collect()]


def _f(l, r):
    return (l ** 2.0) * r


def test_zip_into_inner_exact(spark):
    # Series.fs:288-291: only 9/11 matches; 3^2 * 11 = 99
    res = _series(spark, A).zip_into(_series(spark, B), _f, kind="inner")
    assert _vals(res) == [99.0]


def test_zip_align_left_nearest_smaller(spark):
    # Series.fs:294-300
    res = _series(spark, A).zip_into(_series(spark, B), _f,
                                     kind="left", lookup="nearest_smaller")
    assert _vals(res) == [8.0, 32.0, 99.0, 16.0 * 11.0]


def test_zip_align_left_nearest_greater(spark):
    # Series.fs:303-309: 9/12 has no greater key in b -> missing (row
    # kept, value NULL — reference TryGetAt = Missing)
    res = _series(spark, A).zip_into(_series(spark, B), _f,
                                     kind="left", lookup="nearest_greater")
    assert _vals(res) == [11.0, 44.0, 99.0, None]


def test_zip_align_right_nearest_smaller(spark):
    # Series.fs:312-318: right align — spine is a's keys, b as-of
    res = _series(spark, B).zip_into(_series(spark, A), _f,
                                     kind="right", lookup="nearest_smaller")
    assert _vals(res) == [64.0 * 1.0, 64.0 * 2.0, 121.0 * 3.0, 121.0 * 4.0]


def test_zip_align_right_nearest_greater(spark):
    # Series.fs:321-327: last key has no greater b key -> missing
    res = _series(spark, B).zip_into(_series(spark, A), _f,
                                     kind="right", lookup="nearest_greater")
    assert _vals(res) == [121.0 * 1.0, 121.0 * 2.0, 121.0 * 3.0, None]


def test_zip_lookup_skips_missing_values(spark):
    # Series.fs:330-344: NaN is missing, and the as-of lookup must skip
    # over missing values to the nearest key that HAS one
    l = _series(spark, [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)],
                "key int, value double")
    r = _series(spark, [(1, 10.0), (2, float("nan")), (3, float("nan")),
                        (4, 40.0)], "key int, value double")
    sm = l.zip(r, kind="left", lookup="nearest_smaller")
    got = {row["key"]: (row["left_value"], row["right_value"])
           for row in sm.collect()}
    assert got == {1: (1.0, 10.0), 2: (2.0, 10.0),
                   3: (3.0, 10.0), 4: (4.0, 40.0)}
    gr = l.zip(r, kind="left", lookup="nearest_greater")
    got = {row["key"]: (row["left_value"], row["right_value"])
           for row in gr.collect()}
    assert got == {1: (1.0, 10.0), 2: (2.0, 40.0),
                   3: (3.0, 40.0), 4: (4.0, 40.0)}
