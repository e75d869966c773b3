"""API-parity closures: Aggregate umbrella, WhereOptional, ordinal
Where, SelectKeys levels, Rows views, seq add_col, ofRowsOrdinal/
ofRowKeys (ref citations in the implementations)."""

from pyspark.sql import functions as F

from fsharp_dataframe_spark.frame import Frame
from fsharp_dataframe_spark.series import (
    ChunkSize, ChunkWhile, Series, WindowDist, WindowSize,
)
from fsharp_dataframe_spark.comparator import assert_series_equal


def sob(spark, pairs, schema="key int, value double", ordered=True):
    return Series.of_observations(spark, pairs, schema, ordered=ordered)


def test_aggregate_umbrella_dispatch(spark):
    s = sob(spark, [(i, float(i)) for i in [1, 2, 3, 4]])
    assert_series_equal(s.aggregate_into(WindowSize(3, "skip"), F.sum),
                        [(3, 6.0), (4, 9.0)])
    assert_series_equal(s.aggregate_into(ChunkSize(3, "at_ending"), F.sum),
                        [(1, 6.0), (4, 4.0)])
    assert_series_equal(s.aggregate_into(WindowDist(2), F.sum),
                        [(1, 3.0), (2, 5.0), (3, 7.0), (4, 4.0)])
    out = s.aggregate_into(ChunkWhile(lambda f, t: t - f < 2),
                           lambda seg: float(seg["value"].sum()))
    assert_series_equal(out, [(1, 3.0), (3, 7.0)])


def test_where_all_sees_missing(spark):
    s = sob(spark, [(1, 1.0), (2, None), (3, 3.0)])
    only_missing = s.where_all(lambda k, v: v.isNull())
    assert [r["key"] for r in only_missing.df.collect()] == [2]
    # plain where drops NULL-valued predicate rows (three-valued logic)
    gt = s.where(lambda k, v: v > 0)
    assert sorted(r["key"] for r in gt.df.collect()) == [1, 3]
    # reference skips missing BEFORE the predicate (src/Series.fs:231):
    # a key-only predicate must still drop NULL-valued rows
    key_only = s.where(lambda k, v: k < 10)
    assert sorted(r["key"] for r in key_only.df.collect()) == [1, 3]
    # where_all with a key-only predicate keeps the missing row
    key_only_all = s.where_all(lambda k, v: k < 10)
    assert sorted(r["key"] for r in key_only_all.df.collect()) == [1, 2, 3]


def test_where_indexed_positions(spark):
    s = sob(spark, [(i * 10, float(i)) for i in range(10)])
    evens = s.where_indexed(lambda k, v, i: i % 2 == 0)
    assert sorted(r["key"] for r in evens.df.collect()) == [0, 20, 40, 60, 80]


def test_map_keys_level(spark):
    s = Series(
        spark.createDataFrame([("a", 1, 1.0), ("b", 2, 2.0)],
                              "g string, key int, value double"),
        key=["g", "key"], value="value", ordered=True)
    out = s.map_keys(lambda c: F.upper(c), level=0)
    assert sorted(r["g"] for r in out.df.collect()) == ["A", "B"]


def test_rows_views(spark):
    df = spark.createDataFrame([(1, 1.0, "x"), (2, None, "y")],
                               "key int, a double, b string")
    fr = Frame(df, key="key")
    rows = {r["key"]: r["row"].asDict() for r in fr.rows().df.collect()}
    assert rows[1] == {"a": 1.0, "b": "x"}
    assert rows[2] == {"a": None, "b": "y"}
    dense = fr.rows_dense().df.collect()
    assert [r["key"] for r in dense] == [1]


def test_add_col_sequence_pads_and_trims(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], "key int, v double")
    fr = Frame(df, key="key", ordered=True)
    # shorter seq → padded with missing
    out = fr.add_col("tag", ["a", "b"])
    got = {r["key"]: r["tag"] for r in out.df.collect()}
    assert got == {1: "a", 2: "b", 3: None}
    # longer seq → trimmed
    out2 = fr.add_col("tag", ["a", "b", "c", "d"])
    assert out2.df.count() == 3


def test_slice_sugar_and_stat_summary(spark):
    s = sob(spark, [(i, float(i)) for i in range(10)])
    assert_series_equal(s[3:5], [(3, 3.0), (4, 4.0), (5, 5.0)])
    assert_series_equal(s[8:], [(8, 8.0), (9, 9.0)])
    assert s[4] == 4.0
    st = s.stat_summary()
    assert st["count"] == 10 and st["mean"] == 4.5
    assert st["min"] == 0.0 and st["max"] == 9.0


def test_of_nullables(spark):
    s = Series.of_nullables(spark, [1.0, None, 3.0])
    assert s.count_keys() == 3 and s.count_values() == 2


def test_of_rows_ordinal_and_row_keys(spark):
    fr = Frame.of_rows_ordinal(spark, [{"a": 1.0}, {"a": 2.0}])
    assert [tuple(r) for r in fr.df.orderBy("ordinal").collect()] == [(0, 1.0), (1, 2.0)]
    fk = Frame.of_row_keys(spark, ["r1", "r2"])
    assert fk.column_keys == []
    assert fk.df.count() == 2


def test_driver_entry_contract(spark):
    """The driver smoke-checks entry(): it must run, produce rows, and
    keep a stable schema across rounds — pin all three."""
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["l_returnflag", "l_linestatus", "sum_qty",
                          "sum_price", "avg_disc", "n_rows"]
