"""Golden end-to-end tests against the reference's own MSFT.csv dataset
— the reference test strategy's layer 2 (SURVEY.md §5; shapes from
tests/FSharp.DataFrame.Tests/Frame.fs:26-117).  Skipped when the
reference checkout is not present."""

import os

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.frame import Frame
from fsharp_dataframe_spark.sources.csv import read_csv, write_csv

MSFT = "/root/reference/tests/FSharp.DataFrame.Tests/data/MSFT.csv"

pytestmark = pytest.mark.skipif(not os.path.exists(MSFT),
                                reason="reference MSFT.csv not available")


def msft(spark) -> Frame:
    # ``Frame.ReadCsv |> indexRowsDate "Date"`` — the file arrives
    # date-DESCENDING, so ordered ops need an explicit order_rows
    # (mirrors tests/.../Frame.fs:109, 157)
    return read_csv(spark, MSFT, key="Date")


def test_read_msft_shape(spark):
    # Frame.fs:26-30: 6527 rows, 7 columns (Date + 6 data)
    fr = msft(spark)
    assert fr.df.count() == 6527
    assert len(fr.df.columns) == 7
    assert dict(fr.df.dtypes)["Volume"] == "int"
    assert dict(fr.df.dtypes)["Open"] == "double"


def test_msft_csv_round_trip(spark, tmp_path):
    # Frame.fs:32-39: save then re-read reproduces the frame
    fr = msft(spark)
    out = os.path.join(str(tmp_path), "msft_out.csv")
    write_csv(fr, out)
    back = read_csv(spark, out, key="Date")
    a = {r["Date"]: (r["Open"], r["Close"], r["Volume"])
         for r in fr.df.collect()}
    b = {r["Date"]: (r["Open"], r["Close"], r["Volume"])
         for r in back.df.collect()}
    assert a == b


def test_msft_scalar_arithmetic_spot_checks(spark):
    # Frame.fs:61-81: (df * 2)?Open at a fixed position equals
    # df?Open * 2 — per-row arithmetic against collected truth
    fr = msft(spark).order_rows()
    doubled = (fr * 2.0).df
    base = {r["Date"]: r["Open"] for r in fr.df.collect()}
    got = {r["Date"]: r["Open"] for r in doubled.collect()}
    assert all(got[d] == base[d] * 2.0 for d in base)
    # non-numeric (Date is the key) untouched; string columns would be
    # (Frame.fs:55-59 analog: numeric op does not affect non-numeric)
    assert set(doubled.columns) == set(fr.df.columns)


def test_msft_shift_and_frame_diff(spark):
    # Frame.fs:107-117 analog: ordered shift(1) then frame arithmetic
    fr = msft(spark).order_rows()
    shifted = fr.shift(1)
    assert shifted.df.count() == 6526
    # df2 - df1 at a joined date equals the per-column difference
    j = (shifted.df.alias("s")
         .join(fr.df.alias("f"), F.col("s.Date") == F.col("f.Date"))
         .select(F.col("s.Close").alias("prev"), F.col("f.Close").alias("cur"))
         .limit(50).collect())
    assert len(j) == 50


def test_msft_monthly_resample(spark):
    # the SURVEY §7.1 flagship shape: mean Close by month
    from fsharp_dataframe_spark.series import Series

    fr = msft(spark)
    s = Series(fr.df.select(F.to_date("Date").alias("d"), "Close"),
               key="d", value="Close", ordered=True)
    monthly = s.resample_equiv_into(lambda k: F.date_trunc("month", k), F.avg)
    n = monthly.df.count()
    assert 250 <= n <= 320  # ~26 years of months


def test_zip_row_key_kinds_exact(spark):
    # Frame.fs:134-145: zipAlign with Exact lookup across the four row
    # join kinds — surviving row-key sets are the reference's literals
    df1 = Frame(spark.createDataFrame([(1, 1), (2, 2)], "key int, A int"),
                key="key", ordered=True)
    df2 = Frame(spark.createDataFrame([(2, 2), (3, 3)], "key int, A int"),
                key="key", ordered=True)
    keys = lambda fr: sorted(r["key"] for r in fr.df.collect())
    add = lambda a, b: a + b
    assert keys(df1.zip_frames(df2, add, kind="inner")) == [2]
    assert keys(df1.zip_frames(df2, add, kind="outer")) == [1, 2, 3]
    assert keys(df1.zip_frames(df2, add, kind="left")) == [1, 2]
    assert keys(df1.zip_frames(df2, add, kind="right")) == [2, 3]


def test_zip_subtract_msft_self_is_zero(spark):
    # Frame.fs:148-154: every zipped value of msft - msft is 0
    fr1, fr2 = msft(spark), msft(spark)
    z = fr1.zip_frames(fr2, lambda a, b: a - b)
    data_cols = [c for c in z.column_keys]
    assert len(data_cols) == 6
    nonzero = z.df.filter(
        " OR ".join(f"(`{c}` <> 0 OR `{c}` IS NULL)" for c in data_cols)).count()
    assert nonzero == 0
    assert z.df.count() == 6527


def test_zip_subtract_msft_with_rows_dropped(spark):
    # Frame.fs:156-162: left frame sliced to 2000+; zip keeps the
    # left row count (inner on the subset) and still all-zero
    fr1 = msft(spark)
    sliced = Frame(fr1.df.filter(F.col("Date") >= "2000-01-01"),
                   key="Date", ordered=True)
    n = sliced.df.count()
    z = sliced.zip_frames(msft(spark), lambda a, b: a - b, kind="inner")
    assert z.df.count() == n
    bad = z.df.filter(" OR ".join(
        f"(`{c}` <> 0 OR `{c}` IS NULL)" for c in z.column_keys)).count()
    assert bad == 0


def test_zip_subtract_msft_with_column_dropped(spark):
    # Frame.fs:164-170: a column present on one side only passes
    # through untouched (sum > 0); shared columns subtract to zero
    fr1 = msft(spark).drop_col("Adj Close")
    z = fr1.zip_frames(msft(spark), lambda a, b: a - b)
    adj = z.df.agg(F.sum("`Adj Close`")).first()[0]
    assert adj is not None and adj > 0.0
    low = z.df.agg(F.sum("Low")).first()[0]
    assert low == 0.0


def test_msft_reflected_scalar_and_series_arithmetic(spark):
    # Frame.fs:62-106: scalar-on-left forms (2.0 - df, 2.0 / df) and
    # frame ⊙ series — both operand orders, non-commutative ops pinned
    fr = msft(spark).order_rows()
    base = {r["Date"]: r["Open"] for r in fr.df.collect()}
    inv = {r["Date"]: r["Open"] for r in (2.0 - fr).df.collect()}
    assert all(inv[d] == 2.0 - base[d] for d in base)
    recip = {r["Date"]: r["Open"] for r in (2.0 / fr).df.collect()}
    assert all(recip[d] == 2.0 / base[d] for d in base)
    opens = fr.get_series("Open")
    # df - series: every numeric column reduced by that row's Open
    diff = {r["Date"]: r["High"] for r in (fr - opens).df.collect()}
    high = {r["Date"]: r["High"] for r in fr.df.collect()}
    assert all(diff[d] == high[d] - base[d] for d in base)
