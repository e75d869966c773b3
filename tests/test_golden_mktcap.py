"""Golden port of the reference's richest end-to-end scenario: the
market-cap / enterprise-value alignment with a stock split
(tests/FSharp.DataFrame.Tests/Frame.fs:322-470).

The flow chains Series.zipAlignInto, Frame.zipAlign (inner/left column
kinds × NearestSmaller/NearestGreater lookups) and frame arithmetic:

- prices (daily) × shares outstanding (sparse, with a split on 9/14)
  via NearestSmaller → per-stock market cap;
- commons + prefs (prefs not traded every day) via left column join →
  company market cap;
- + year-end net-debt forecast via NearestGreater → enterprise value.

Every expected value below is the reference test's own literal.
"""

from datetime import date

from pyspark.sql import functions as F

from fsharp_dataframe_spark.frame import Frame
from fsharp_dataframe_spark.series import Series

D = date

PX_A = [(D(2013, 9, 10), 100.0), (D(2013, 9, 11), 101.0),
        (D(2013, 9, 12), 101.0), (D(2013, 9, 13), 101.0),
        (D(2013, 9, 14), 102.0), (D(2013, 9, 15), 103.0),
        (D(2013, 9, 16), 104.0)]
PX_B = [(D(2013, 9, 10), 200.0), (D(2013, 9, 11), 200.0),
        (D(2013, 9, 12), 200.0), (D(2013, 9, 13), 201.0),
        (D(2013, 9, 14), 101.0), (D(2013, 9, 15), 101.5),
        (D(2013, 9, 16), 102.0)]
PX_B_PREF = [(D(2013, 9, 10), 20.0), (D(2013, 9, 13), 21.0),
             (D(2013, 9, 14), 22.0), (D(2013, 9, 15), 23.0),
             (D(2013, 9, 16), 24.0)]
SHARES_A = [(D(2012, 12, 31), 10.0)]
SHARES_B = [(D(2012, 12, 31), 20.0), (D(2013, 9, 14), 40.0)]  # split
SHARES_B_PREF = [(D(2012, 12, 31), 20.0)]
ND_A = [(D(2013, 12, 31), 100.0)]
ND_B = [(D(2013, 12, 31), 1000.0)]


def _series(spark, rows, value="value"):
    return Series(spark.createDataFrame(rows, f"day date, {value} double"),
                  key="day", value=value, ordered=True)


def _frame_of(spark, cols: dict):
    """Frame.ofColumns from {name: [(day, v), ...]} — outer-join the
    column series on the day key (reference Frame.ofColumns)."""
    fr = None
    for name, rows in cols.items():
        df = spark.createDataFrame(rows, f"day date, {name} double")
        fr = df if fr is None else fr.join(df, on="day", how="full_outer")
    return Frame(fr, key="day", ordered=True)


def _col(fr, name):
    return [r[name] for r in fr.df.orderBy("day").collect()]


def test_series_zip_align_into_nearest_smaller(spark):
    # Series.zipAlignInto JoinKind.Left Lookup.NearestSmaller (l*r)
    pxA = _series(spark, PX_A)
    sharesA = _series(spark, SHARES_A)
    mktcapA = pxA.zip_into(sharesA, lambda l, r: l * r,
                           kind="left", lookup="nearest_smaller")
    vals = [r["value"] for r in mktcapA.df.orderBy("day").collect()]
    assert vals == [1000.0, 1010.0, 1010.0, 1010.0, 1020.0, 1030.0, 1040.0]


def test_frame_zip_align_inner_left_nearest_smaller(spark):
    # Frame.zipAlign Inner Left NearestSmaller (l*r): the stock split on
    # 9/14 doubles B's share count mid-series
    pxCommons = _frame_of(spark, {"A": PX_A, "B": PX_B})
    sharesCommons = _frame_of(spark, {"A": SHARES_A, "B": SHARES_B})
    mktCapCommons = pxCommons.zip_align_frames(
        sharesCommons, lambda l, r: l * r, col_kind="inner",
        lookup="nearest_smaller")
    assert _col(mktCapCommons, "A") == [1000.0, 1010.0, 1010.0, 1010.0,
                                        1020.0, 1030.0, 1040.0]
    assert _col(mktCapCommons, "B") == [4000.0, 4000.0, 4000.0, 4020.0,
                                        4040.0, 4060.0, 4080.0]


def _company_mktcap(spark):
    pxCommons = _frame_of(spark, {"A": PX_A, "B": PX_B})
    sharesCommons = _frame_of(spark, {"A": SHARES_A, "B": SHARES_B})
    mktCapCommons = pxCommons.zip_align_frames(
        sharesCommons, lambda l, r: l * r, col_kind="inner",
        lookup="nearest_smaller")
    pxPrefs = _frame_of(spark, {"B": PX_B_PREF})
    sharesPrefs = _frame_of(spark, {"B": SHARES_B_PREF})
    mktCapPrefs = pxPrefs.zip_align_frames(
        sharesPrefs, lambda l, r: l * r, col_kind="inner",
        lookup="nearest_smaller")
    # left column kind: A (no prefs) passes through untouched; B adds
    # the as-of pref cap (prefs not traded 9/11-9/12 -> 9/10 value)
    return mktCapCommons.zip_align_frames(
        mktCapPrefs, lambda l, r: l + r, col_kind="left",
        lookup="nearest_smaller")


def test_frame_zip_align_different_column_sets(spark):
    mktCap = _company_mktcap(spark)
    assert _col(mktCap, "A") == [1000.0, 1010.0, 1010.0, 1010.0,
                                 1020.0, 1030.0, 1040.0]
    assert _col(mktCap, "B") == [4400.0, 4400.0, 4400.0, 4440.0,
                                 4480.0, 4520.0, 4560.0]


def test_enterprise_value_nearest_greater(spark):
    # + net debt forecast dated at the FOLLOWING year end: NearestGreater
    mktCap = _company_mktcap(spark)
    netDebt = _frame_of(spark, {"A": ND_A, "B": ND_B})
    ev = mktCap.zip_align_frames(netDebt, lambda l, r: l + r,
                                 col_kind="inner", lookup="nearest_greater")
    assert _col(ev, "A") == [1100.0, 1110.0, 1110.0, 1110.0,
                             1120.0, 1130.0, 1140.0]
    assert _col(ev, "B") == [5400.0, 5400.0, 5400.0, 5440.0,
                             5480.0, 5520.0, 5560.0]
