"""CSV dialect parity (sources/csv.py) — reference ReadCsv/SaveCsv
semantics: header, separators incl. .tsv sniffing, missing tokens,
type inference, round-trip (ref src/FrameExtensions.fs:45-78, 320-356;
tests/FSharp.DataFrame.Tests/Frame.fs:26-49)."""

import os

from pyspark.sql import functions as F

from fsharp_dataframe_spark.frame import Frame
from fsharp_dataframe_spark.sources.csv import read_csv, write_csv


def _write(tmp_path, name, text):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        f.write(text)
    return p


def test_read_csv_infers_types_and_missing_tokens(spark, tmp_path):
    p = _write(tmp_path, "t.csv",
               "id,price,note\n1,1.5,hello\n2,NaN,NA\n3,2.5,#N/A\n4,3.0,:\n")
    fr = read_csv(spark, p, key="id")
    types = dict(fr.df.dtypes)
    assert types["id"] == "int"
    assert types["price"] == "double"
    rows = {r["id"]: (r["price"], r["note"]) for r in fr.df.collect()}
    assert rows[1] == (1.5, "hello")
    assert rows[2][0] is None          # NaN token → missing (ref §1.4)
    assert rows[2][1] is None          # NA token
    assert rows[3][1] is None          # #N/A token
    assert rows[4][1] is None          # ':' token


def test_read_csv_custom_separator(spark, tmp_path):
    p = _write(tmp_path, "t_semi.csv", "a;b\n1;x\n2;y\n")
    fr = read_csv(spark, p, sep=";")
    assert fr.df.columns == ["a", "b"]
    assert fr.df.count() == 2


def test_tsv_auto_separator(spark, tmp_path):
    p = _write(tmp_path, "t.tsv", "a\tb\n1\tx\n")
    fr = read_csv(spark, p)
    assert fr.df.columns == ["a", "b"]
    assert fr.df.collect()[0]["b"] == "x"


def test_csv_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 1.5, "x"), (2, None, "y"), (3, 2.25, None)],
        "id int, price double, tag string")
    fr = Frame(df, key="id")
    out_dir = os.path.join(str(tmp_path), "out.csv")
    write_csv(fr, out_dir)
    back = read_csv(spark, out_dir, key="id")
    got = sorted(tuple(r) for r in back.df.collect())
    assert got == [(1, 1.5, "x"), (2, None, "y"), (3, 2.25, None)]


def test_write_csv_without_row_keys(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    fr = Frame(df, key="id")
    out_dir = os.path.join(str(tmp_path), "nokeys.csv")
    write_csv(fr, out_dir, include_row_keys=False)
    back = spark.read.option("header", True).csv(out_dir)
    assert back.columns == ["v"]
