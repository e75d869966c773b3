"""Resampling/time-sampling — ports of the reference's sampling tests
(tests/FSharp.DataFrame.Tests/Series.fs:117-235)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from fsharp_dataframe_spark.series import Series
from fsharp_dataframe_spark.comparator import assert_series_equal
from fsharp_dataframe_spark.operators.resample import lookup_time, sample_time


def generate(spark, start: datetime, delta: timedelta, count: int, plus: int = 0) -> Series:
    rows = [(start + delta * i, i + plus) for i in range(count)]
    return Series.of_observations(spark, rows, "key timestamp, value int", ordered=True)


def dt(*args):
    return datetime(*args)


def test_resample_equiv_day_sampling(spark):
    # TestDaySampling (Series.fs:134-142): latest value per date
    s = generate(spark, dt(2011, 12, 2), timedelta(hours=5.23), 20)
    out = s.resample_equiv_into(lambda k: F.date_trunc("day", k), lambda v: F.max_by(v, s.key))
    assert_series_equal(out, [
        (dt(2011, 12, 2), 4), (dt(2011, 12, 3), 9), (dt(2011, 12, 4), 13),
        (dt(2011, 12, 5), 18), (dt(2011, 12, 6), 19),
    ])


def test_resample_uniform_forward_fill(spark):
    # TestForwardFillSampling (Series.fs:180-189)
    rows = [(dt(2012, 5, 25), 1.0), (dt(2012, 5, 26), 2.0),
            (dt(2012, 5, 29), 5.0), (dt(2012, 5, 30), 6.0)]
    s = Series.of_observations(spark, rows, "key timestamp, value double", ordered=True)
    out = s.resample_uniform_into(lambda k: F.date_trunc("day", k), "interval 1 day")
    assert_series_equal(out, [
        (dt(2012, 5, 25), 1.0), (dt(2012, 5, 26), 2.0), (dt(2012, 5, 27), 2.0),
        (dt(2012, 5, 28), 2.0), (dt(2012, 5, 29), 5.0), (dt(2012, 5, 30), 6.0),
    ])


def test_sample_time_backward_downsampling(spark):
    # TestDownSampling (Series.fs:155-165): last previous value per hour
    s = generate(spark, dt(2012, 2, 12), timedelta(minutes=5.37), 50)
    out = s.sample_time_into("1 hour", None, direction="backward")
    assert_series_equal(out, [
        (dt(2012, 2, 12, 0), 0), (dt(2012, 2, 12, 1), 11), (dt(2012, 2, 12, 2), 22),
        (dt(2012, 2, 12, 3), 33), (dt(2012, 2, 12, 4), 44), (dt(2012, 2, 12, 5), 49),
    ])


def test_sample_time_forward(spark):
    # Series.fs:193-203: first value per hour, forward
    s = generate(spark, dt(2012, 2, 12), timedelta(minutes=5.37), 50)
    out = s.sample_time_into("1 hour", None, direction="forward")
    assert_series_equal(out, [
        (dt(2012, 2, 12, 0), 0), (dt(2012, 2, 12, 1), 12), (dt(2012, 2, 12, 2), 23),
        (dt(2012, 2, 12, 3), 34), (dt(2012, 2, 12, 4), 45),
    ])


def test_resample_explicit_forward(spark):
    # Series.fs:205-211: first chunk absorbs earlier rows
    s = generate(spark, dt(2012, 2, 12), timedelta(hours=5.37), 20)
    out = s.resample_into([dt(2012, 2, 13), dt(2012, 2, 15)], "forward",
                          lambda v: F.min_by(v, s.key))
    assert_series_equal(out, [(dt(2012, 2, 13), 0), (dt(2012, 2, 15), 14)])


def test_resample_explicit_backward(spark):
    # Series.fs:213-218: last chunk absorbs later rows
    s = generate(spark, dt(2012, 2, 12), timedelta(hours=5.37), 20)
    out = s.resample_into([dt(2012, 2, 13), dt(2012, 2, 15)], "backward",
                          lambda v: F.max_by(v, s.key))
    assert_series_equal(out, [(dt(2012, 2, 13), 4), (dt(2012, 2, 15), 19)])


def test_resample_explicit_empty_chunks(spark):
    # Series.fs:221-227: empty chunks for boundary keys with no rows
    s = generate(spark, dt(2012, 2, 12), timedelta(hours=48), 5)
    keys = [dt(2012, 2, d) for d in range(12, 21)]
    out = s.resample_into(keys, "forward", lambda v: F.min_by(v, s.key))
    vals = [0, None, 1, None, 2, None, 3, None, 4]
    assert_series_equal(out, list(zip(keys, vals)))


def test_lookup_time_minute_sampling(spark):
    # TestMinuteSampling (Series.fs:144-153): grid at 1-min steps,
    # as-of (at-or-before) lookups, grid runs to lastKey + interval
    s = generate(spark, dt(2011, 12, 2), timedelta(seconds=2.5), 50)
    out = lookup_time(s, "1 minute", "nearest_smaller")
    assert_series_equal(out, [
        (dt(2011, 12, 2, 0, 0), 0), (dt(2011, 12, 2, 0, 1), 24),
        (dt(2011, 12, 2, 0, 2), 48), (dt(2011, 12, 2, 0, 3), 49),
    ])


def test_lookup_time_daily_backward(spark):
    # "get value at or just before specified time" (Series.fs:120-132)
    s = generate(spark, dt(2011, 12, 27), timedelta(hours=11.23), 20, plus=1)
    out = lookup_time(s, "1 day", "nearest_smaller", start=dt(2011, 12, 27, 15))
    assert_series_equal(out, [
        (dt(2011, 12, 27, 15), 2), (dt(2011, 12, 28, 15), 4), (dt(2011, 12, 29, 15), 6),
        (dt(2011, 12, 30, 15), 8), (dt(2011, 12, 31, 15), 10), (dt(2012, 1, 1, 15), 13),
        (dt(2012, 1, 2, 15), 15), (dt(2012, 1, 3, 15), 17), (dt(2012, 1, 4, 15), 19),
        (dt(2012, 1, 5, 15), 20),
    ])
