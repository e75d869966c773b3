"""Direct tests for units previously covered only transitively:
of_columns/from_values, get_row, frame fill variants, drop_sparse_cols,
count_values/count_keys, fill_missing_using, positional access."""

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.frame import Frame
from fsharp_dataframe_spark.series import Series


def test_frame_of_columns_outer_joins_indices(spark):
    a = Series.of_observations(spark, [(1, 1.0), (2, 2.0)], "key int, value double")
    b = Series.of_observations(spark, [(2, 20.0), (3, 30.0)], "key int, value double")
    fr = Frame.of_columns({"a": a, "b": b})
    rows = {r["key"]: (r["a"], r["b"]) for r in fr.df.collect()}
    assert rows == {1: (1.0, None), 2: (2.0, 20.0), 3: (None, 30.0)}


def test_frame_from_values_pivots_triples(spark):
    fr = Frame.from_values(spark, [("r1", "x", 1.0), ("r1", "y", 2.0), ("r2", "x", 3.0)])
    rows = {r["row"]: (r["x"], r["y"]) for r in fr.df.collect()}
    assert rows == {"r1": (1.0, 2.0), "r2": (3.0, None)}


def test_get_row_exact_and_missing(spark):
    fr = Frame(spark.createDataFrame([(1, "a"), (2, "b")], "key int, v string"), key="key")
    assert fr.get_row(2) == {"key": 2, "v": "b"}
    with pytest.raises(KeyError):
        fr.get_row(99)


def test_frame_fill_variants(spark):
    df = spark.createDataFrame(
        [(1, None, "x"), (2, 2.0, None), (3, None, "z")],
        "key int, num double, s string")
    fr = Frame(df, key="key", ordered=True)
    filled = {r["key"]: r["num"] for r in fr.fill_missing_with(0.0).df.collect()}
    assert filled == {1: 0.0, 2: 2.0, 3: 0.0}
    fwd = {r["key"]: r["num"] for r in fr.fill_missing("forward").df.collect()}
    assert fwd == {1: None, 2: 2.0, 3: 2.0}
    bwd = {r["key"]: r["num"] for r in fr.fill_missing("backward").df.collect()}
    assert bwd == {1: 2.0, 2: 2.0, 3: None}


def test_drop_sparse_cols(spark):
    df = spark.createDataFrame(
        [(1, 1.0, None, "x"), (2, 2.0, 5.0, "y")],
        "key int, full double, holey double, s string")
    fr = Frame(df, key="key")
    out = fr.drop_sparse_cols()
    assert out.column_keys == ["full", "s"]


def test_count_values_and_keys(spark):
    s = Series.of_observations(spark, [(1, 1.0), (2, None), (3, 3.0)],
                               "key int, value double")
    assert s.count_keys() == 3
    assert s.count_values() == 2


def test_fill_missing_using_computes_from_key(spark):
    s = Series.of_observations(spark, [(1, None), (2, 5.0)], "key int, value double",
                               ordered=True)
    out = dict(s.fill_missing_using(lambda k: (k * 10).cast("double")).observations())
    assert out == {1: 10.0, 2: 5.0}


def test_positional_access(spark):
    s = Series.of_observations(spark, [(10, 1.0), (20, 2.0), (30, 3.0)],
                               "key int, value double", ordered=True)
    assert s.get_at(1) == 2.0
    assert s.get_key_at(2) == 30
    assert s.try_get(20) == 2.0
    assert s.try_get(99) is None


def test_cube_rollup_rank_parity_plus(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0)],
        "g string, h string, v double")
    fr = Frame(df, key=None)
    cube = fr.cube_by(["g", "h"], {"v": F.sum}, aliases={"v": "s"}).collect()
    # cube of 2 cols over 3 distinct combos: combos + per-g + per-h + grand
    assert len(cube) == 3 + 2 + 2 + 1
    grand = [r for r in cube if r["g"] is None and r["h"] is None]
    assert grand[0]["s"] == 6.0
    roll = fr.rollup_by(["g"], {"v": F.sum}, aliases={"v": "s"}).collect()
    assert {(r["g"], r["s"]) for r in roll} == {("a", 3.0), ("b", 3.0), (None, 6.0)}
    ranked = fr.rank_within(["g"], "v", "row_number", out_col="rn")
    top = {(r["g"], r["h"]) for r in ranked.df.filter(F.col("rn") == 1).collect()}
    assert top == {("a", "y"), ("b", "x")}


def test_series_append_disjoint_and_conflict(spark):
    a = Series.of_observations(spark, [(1, 1.0)], "key int, value double")
    b = Series.of_observations(spark, [(2, 2.0)], "key int, value double")
    assert dict(a.append(b).observations()) == {1: 1.0, 2: 2.0}
    c = Series.of_observations(spark, [(1, 9.0)], "key int, value double")
    with pytest.raises(Exception):
        a.append(c).df.collect()


def test_bench_line_budget_headroom():
    """The driver captures only a 2000-char stdout tail (BENCH_r06/r07
    recorded parsed:null when the line outgrew it — r7 VERDICT ask #2).
    bench.py asserts at runtime; this pins the budget BEFORE a driver
    run: a worst-case line (every timing '99.99') for the CURRENT
    registry must clear bench.MAX_LINE with margin, so registry growth
    trips a test, not a driver artifact."""
    import json

    import bench
    import __spark_entry__ as entrymod

    names = sorted(entrymod._all_queries())
    line = json.dumps({
        "metric": "registry_queries_total_wall",
        "value": 99999.999, "unit": "sec", "sf": 0.1,
        "n_queries": len(names), "order": "sorted-registry-names",
        "notes": "BENCH_NOTES.md",
        "qh": bench._registry_hash(names),
        "load": [99.9, 99.9],
        "qv": [99.99] * len(names),
    }, separators=(",", ":"))
    assert len(line) < bench.MAX_LINE - 100, (
        f"bench line {len(line)} chars at {len(names)} queries — "
        "approaching the driver tail budget; move qv to lower precision "
        "or split the artifact")
