"""Golden port of the reference's frame join/align tests
(tests/FSharp.DataFrame.Tests/Frame.fs:176-305): joinAlign in all four
kind × lookup directions over the days/times fixture, and the
missing-value fill rules of as-of joins and zips.  Expected values are
the reference's own literals.
"""

from datetime import datetime

from fsharp_dataframe_spark.frame import Frame

DAYS = [(datetime(2013, 9, 9), 0.0), (datetime(2013, 9, 10), 1.0),
        (datetime(2013, 9, 11), 2.0)]
TIMES = [(datetime(2013, 9, 9, 9, 31, 59), 0.5),
         (datetime(2013, 9, 10, 9, 31, 59), 1.5),
         (datetime(2013, 9, 11, 9, 31, 59), 2.5)]


def _frame(spark, rows, col):
    return Frame(spark.createDataFrame(rows, f"key timestamp, {col} double"),
                 key="key", ordered=True)


def _col(fr, name):
    return [r[name] for r in fr.df.orderBy("key").collect()]


def test_left_align_nearest_smaller_missing_before_start(spark):
    # Frame.fs:190-200: no time smaller than the first day -> missing
    days, times = _frame(spark, DAYS, "Days"), _frame(spark, TIMES, "Times")
    out = days.join(times, kind="left", lookup="nearest_smaller")
    assert _col(out, "Times") == [None, 0.5, 1.5]
    assert _col(out, "Days") == [0.0, 1.0, 2.0]


def test_left_align_nearest_greater_always_finds(spark):
    # Frame.fs:203-213
    days, times = _frame(spark, DAYS, "Days"), _frame(spark, TIMES, "Times")
    out = days.join(times, kind="left", lookup="nearest_greater")
    assert _col(out, "Times") == [0.5, 1.5, 2.5]


def test_right_align_nearest_smaller_always_finds(spark):
    # Frame.fs:216-225: spine = times keys, Days as-of backward
    days, times = _frame(spark, DAYS, "Days"), _frame(spark, TIMES, "Times")
    out = days.join(times, kind="right", lookup="nearest_smaller")
    assert _col(out, "Days") == [0.0, 1.0, 2.0]
    assert _col(out, "Times") == [0.5, 1.5, 2.5]


def test_right_align_nearest_greater_missing_after_end(spark):
    # Frame.fs:228-237: no day greater than the last time -> missing
    days, times = _frame(spark, DAYS, "Days"), _frame(spark, TIMES, "Times")
    out = days.join(times, kind="right", lookup="nearest_greater")
    assert _col(out, "Days") == [1.0, 2.0, None]


def _int_frame(spark, rows, col):
    return Frame(spark.createDataFrame(rows, f"key int, {col} double"),
                 key="key", ordered=True)


def test_left_join_fill_searches_previous_no_exact_key(spark):
    # Frame.fs:273-279: A = {1: 1.0, 2: NaN}; probe keys {1, 3};
    # key 3 has no exact A -> previous WITH a value -> 1.0
    miss = _int_frame(spark, [(1, 1.0), (2, float("nan"))], "A")
    full = _int_frame(spark, [(1, 2.0), (3, 3.0)], "B")
    out = full.join(miss, kind="left", lookup="nearest_smaller")
    assert _col(out, "A") == [1.0, 1.0]


def test_left_join_fill_searches_previous_missing_at_exact_key(spark):
    # Frame.fs:281-287: key 2 exists in A but is MISSING there — the
    # as-of lookup must skip over it to the previous key with a value
    miss = _int_frame(spark, [(1, 1.0), (2, float("nan"))], "A")
    full = _int_frame(spark, [(1, 2.0), (2, 3.0)], "B")
    out = full.join(miss, kind="left", lookup="nearest_smaller")
    assert _col(out, "A") == [1.0, 1.0]


def test_left_zip_fills_missing_from_previous(spark):
    # Frame.fs:289-295: full.Zip(miss, Inner, Left, NearestSmaller, +)
    miss = _int_frame(spark, [(1, 1.0), (2, float("nan"))], "A")
    full = _int_frame(spark, [(1, 2.0), (3, 3.0)], "A")
    out = full.zip_align_frames(miss, lambda a, b: a + b,
                                col_kind="inner", lookup="nearest_smaller")
    assert _col(out, "A") == [3.0, 4.0]


def test_left_zip_only_fills_missing_in_joined_series(spark):
    # Frame.fs:297-305: the LEFT side's own missing stays missing —
    # only the looked-up (right) side is as-of-filled
    miss = _int_frame(spark, [(1, 1.0), (2, float("nan"))], "A")
    full = _int_frame(spark, [(1, 2.0), (2, 3.0)], "A")
    out = miss.zip_align_frames(full, lambda a, b: a + b,
                                col_kind="inner", lookup="nearest_smaller")
    assert _col(out, "A") == [3.0, None]
