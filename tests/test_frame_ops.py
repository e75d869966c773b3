"""Frame-level ordered ops + construction/rekeying —
(ref src/FrameModule.fs:71-75, 271-290, 301-303, 450-454;
src/FrameExtensions.fs:90-196; src/Frame.fs:815-818)."""

from pyspark.sql import functions as F

from fsharp_dataframe_spark.frame import Frame


def mkframe(spark, ordered=True):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (4, 40.0, "d")],
        "key int, x double, tag string",
    )
    return Frame(df, key="key", ordered=ordered)


def rows(fr):
    return [tuple(r) for r in fr.df.orderBy(*fr.key_cols).collect()]


def test_frame_shift_drops_boundary_rows(spark):
    # every column shifts (strings too); boundary rows dropped
    out = mkframe(spark).shift(1)
    assert rows(out) == [(2, 10.0, "a"), (3, 20.0, "b"), (4, 30.0, "c")]


def test_frame_diff_keeps_rows_and_nonnumeric(spark):
    # numeric diffed (missing at boundary), non-numeric untouched,
    # row count unchanged (SeriesApply strict=false)
    out = mkframe(spark).diff(1)
    assert rows(out) == [
        (1, None, "a"), (2, 10.0, "b"), (3, 10.0, "c"), (4, 10.0, "d")]


def test_frame_window_size_into(spark):
    out = mkframe(spark).window_size_into(2, {"x": F.sum}, "skip")
    assert rows(out) == [(2, 30.0, "b"), (3, 50.0, "c"), (4, 70.0, "d")]


def test_frame_of_rows_unions_columns(spark):
    fr = Frame.of_rows(spark, [
        ("r1", {"a": 1.0, "b": 2.0}),
        ("r2", {"b": 3.0, "c": 4.0}),
    ])
    assert fr.column_keys == ["a", "b", "c"]
    assert rows(fr) == [("r1", 1.0, 2.0, None), ("r2", None, 3.0, 4.0)]


def test_collapse_rows(spark):
    f1 = Frame(spark.createDataFrame([(1, 1.0)], "key int, x double"), key="key")
    f2 = Frame(spark.createDataFrame([(1, 2.0), (2, 3.0)], "key int, x double"), key="key")
    out = Frame.collapse_rows({"g1": f1, "g2": f2})
    assert out.key_cols == ["group", "key"]
    assert rows(out) == [("g1", 1, 1.0), ("g2", 1, 2.0), ("g2", 2, 3.0)]


def test_index_rows_with_positional(spark):
    out = mkframe(spark).index_rows_with(["w", "x", "y", "z"])
    assert rows(out) == [("w", 10.0, "a"), ("x", 20.0, "b"),
                         ("y", 30.0, "c"), ("z", 40.0, "d")]


def test_index_cols_with(spark):
    out = mkframe(spark).index_cols_with(["col1", "col2"])
    assert out.column_keys == ["col1", "col2"]
    assert rows(out)[0] == (1, 10.0, "a")


def test_index_rows_drop_former_key(spark):
    fr = mkframe(spark).index_rows("tag")
    assert "key" in fr.column_keys  # kept by default
    fr2 = mkframe(spark).index_rows("tag", drop=True)
    assert fr2.column_keys == ["x"]


def test_transpose_small(spark):
    fr = mkframe(spark)
    t = fr.transpose()
    got = {r["column"]: (r["1"], r["4"]) for r in t.df.collect()}
    assert got["x"] == ("10.0", "40.0")
    assert got["tag"] == ("a", "d")
    # guard refuses wide transposes
    import pytest
    with pytest.raises(ValueError):
        fr.transpose(max_rows=2)
