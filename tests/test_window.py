"""Window/chunk boundary semantics — pinned by the reference's
sequence-combinator tests (tests/FSharp.DataFrame.Tests/Common.fs:132-191)."""

from pyspark.sql import functions as F

from fsharp_dataframe_spark.series import AT_BEGINNING, AT_ENDING, SKIP, Series
from fsharp_dataframe_spark.comparator import assert_series_equal


def sob(spark, pairs, schema="key int, value int", ordered=True):
    return Series.of_observations(spark, pairs, schema, ordered=ordered)


def s1234(spark):
    return sob(spark, [(i, i) for i in [1, 2, 3, 4]])


def test_window_at_beginning(spark):
    # windows over [1..4], n=3, AtBeginning: [1],[1,2],[1,2,3],[2,3,4]
    # keyed by last key (Common.fs:132-137)
    out = s1234(spark).window_size_into(3, F.sum, AT_BEGINNING)
    assert_series_equal(out, [(1, 1), (2, 3), (3, 6), (4, 9)])


def test_window_skip(spark):
    # only complete windows (Common.fs:139-144)
    out = s1234(spark).window_size_into(3, F.sum, SKIP)
    assert_series_equal(out, [(3, 6), (4, 9)])


def test_window_at_ending(spark):
    # complete then incomplete suffix, keyed by FIRST key (Common.fs:146-151)
    out = s1234(spark).window_size_into(3, F.sum, AT_ENDING)
    assert_series_equal(out, [(1, 6), (2, 9), (3, 7), (4, 4)])


def test_chunk_at_ending(spark):
    # [1..10] n=3 start-aligned: [1,2,3],[4,5,6],[7,8,9],[10] (Common.fs:177-183)
    s = sob(spark, [(i, i) for i in range(1, 11)])
    out = s.chunk_size_into(3, F.sum, AT_ENDING)
    assert_series_equal(out, [(1, 6), (4, 15), (7, 24), (10, 10)])


def test_chunk_at_beginning(spark):
    # [1..10] n=3 end-aligned: [1],[2,3,4],[5,6,7],[8,9,10] (Common.fs:160-166)
    s = sob(spark, [(i, i) for i in range(1, 11)])
    out = s.chunk_size_into(3, F.sum, AT_BEGINNING)
    assert_series_equal(out, [(1, 1), (2, 9), (5, 18), (8, 27)])


def test_chunk_skip(spark):
    # start-aligned, incomplete dropped (Common.fs:185-191)
    s = sob(spark, [(i, i) for i in range(1, 11)])
    out = s.chunk_size_into(3, F.sum, SKIP)
    assert_series_equal(out, [(1, 6), (4, 15), (7, 24)])


def test_chunk_exact_multiple(spark):
    # length divisible by n: all complete either alignment (Common.fs:152-158, 168-175)
    s = sob(spark, [(i, i) for i in range(1, 10)])
    for b in (AT_BEGINNING, AT_ENDING):
        assert_series_equal(s.chunk_size_into(3, F.sum, b), [(1, 6), (4, 15), (7, 24)])


def test_shift(spark):
    s = sob(spark, [(i, i * 10) for i in [1, 2, 3]])
    assert_series_equal(s.shift(1), [(2, 10), (3, 20)])
    assert_series_equal(s.shift(-1), [(1, 20), (2, 30)])


def test_pairwise(spark):
    s = sob(spark, [(i, i * i) for i in [1, 2, 3]])
    out = s.pairwise(lambda prev, cur: cur - prev)
    assert_series_equal(out, [(2, 3), (3, 5)])


def test_window_dist(spark):
    # for each key k: aggregate values with keys in [k, k+10) — the
    # reference predicate (ekey - skey) < dist is STRICT, so key 11 is
    # NOT in key 1's window (src/SeriesModule.fs:318-319)
    s = sob(spark, [(1, 1), (4, 4), (11, 11), (20, 20)])
    out = s.window_dist_into(10, F.sum)
    assert_series_equal(out, [(1, 5), (4, 15), (11, 31), (20, 20)])


def test_window_while_reference_shape(spark):
    # Seq.windowedWhile (t - f < 10) [1;4;11;12;13;15;20;25] →
    # [1,4],[4..13],[11..20],[12..20],[13..20],[15,20],[20,25],[25]
    # (tests/FSharp.DataFrame.Tests/Common.fs:119-125); keyed by first key
    keys = [1, 4, 11, 12, 13, 15, 20, 25]
    s = sob(spark, [(k, k) for k in keys])
    out = s.window_while_into(lambda f, t: t - f < 10, lambda seg: float(seg["value"].sum()))
    exp = [(1, 5.0), (4, 40.0), (11, 71.0), (12, 60.0), (13, 48.0),
           (15, 35.0), (20, 45.0), (25, 25.0)]
    assert_series_equal(out, exp)


def test_chunk_while_reference_shape(spark):
    # Seq.chunkedWhile (t - f < 10) [1;4;11;12;13;15;20;25] →
    # [1,4],[11,12,13,15,20],[25] (Common.fs:109-113); keyed by first key
    keys = [1, 4, 11, 12, 13, 15, 20, 25]
    s = sob(spark, [(k, k) for k in keys])
    out = s.chunk_while_into(lambda f, t: t - f < 10, lambda seg: float(seg["value"].sum()))
    assert_series_equal(out, [(1, 5.0), (11, 71.0), (25, 25.0)])
    # chunk_dist is the same predicate packaged
    out2 = s.chunk_dist_into(10, lambda seg: float(seg["value"].sum()))
    assert_series_equal(out2, [(1, 5.0), (11, 71.0), (25, 25.0)])


def test_while_ops_lose_no_values(spark):
    # property pinned by Common.fs:115-117 / 127-129: chunks partition
    # the input; windows cover every element
    import random

    rng = random.Random(7)
    keys = sorted(rng.sample(range(1000), 60))
    s = sob(spark, [(k, 1) for k in keys])
    chunks = s.chunk_while_into(lambda f, t: t - f < 25, lambda seg: float(len(seg)))
    total = sum(v for _, v in chunks.to_pandas().itertuples(index=False))
    assert total == len(keys)


def test_window_while_by_partition(spark):
    # per-entity predicate windows — the scale path
    s = Series(
        spark.createDataFrame(
            [("a", 1, 1.0), ("a", 4, 4.0), ("a", 20, 20.0), ("b", 2, 2.0), ("b", 3, 3.0)],
            "uid string, key int, value double",
        ),
        key=["uid", "key"], value="value", ordered=True,
    )
    out = s.chunk_while_into(lambda f, t: t - f < 10, lambda seg: float(seg["value"].sum()), by=["uid"])
    assert sorted(tuple(r) for r in out.df.collect()) == [
        ("a", 1, 5.0), ("a", 20, 20.0), ("b", 2, 5.0)]


def test_moving_mean_matches_pandas(spark):
    import pandas as pd

    vals = [float(i * 7 % 13) for i in range(50)]
    s = sob(spark, [(i, v) for i, v in enumerate(vals)], schema="key int, value double")
    got = s.window_size_into(5, F.avg, AT_BEGINNING).to_pandas()["value"].tolist()
    exp = pd.Series(vals).rolling(5, min_periods=1).mean().tolist()
    assert got == exp


def test_window_while_bounded_matches_sequential(spark):
    import warnings

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(4)
    keys = np.sort(rng.choice(5000, size=400, replace=False)).astype("int64")
    pdf = pd.DataFrame({"key": keys, "value": rng.normal(size=400)})
    s = Series(spark.createDataFrame(pdf), key="key", value="value",
               ordered=True)
    agg = lambda seg: float(seg["value"].sum())  # noqa: E731
    cond = lambda f, t: t - f < 40  # noqa: E731
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        seq = s.window_while_into(cond, agg).df.orderBy("key").toPandas()
    # force many tiny buckets so windows routinely cross bucket edges
    par = s.window_while_into(cond, agg, max_rows=50).df \
        .orderBy("key").toPandas()
    from fsharp_dataframe_spark.operators.window import series_window_while
    par2 = series_window_while(s, cond, agg, max_rows=50, n_buckets=23).df \
        .orderBy("key").toPandas()
    for got in (par, par2):
        assert (seq["key"] == got["key"]).all()
        assert np.allclose(seq["value"].to_numpy(), got["value"].to_numpy(),
                           equal_nan=True)


def test_window_while_bounded_violation_raises(spark):
    import numpy as np
    import pandas as pd
    import pytest

    pdf = pd.DataFrame({"key": np.arange(200, dtype="int64"),
                        "value": np.ones(200)})
    s = Series(spark.createDataFrame(pdf), key="key", value="value",
               ordered=True)
    with pytest.raises(Exception, match="max_rows"):
        s.window_while_into(lambda f, t: True,
                            lambda seg: float(len(seg)),
                            max_rows=20).df.count()


def test_window_while_bounded_plan_has_no_global_exchange(spark):
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame({"key": np.arange(500, dtype="int64"),
                        "value": np.ones(500)})
    s = Series(spark.createDataFrame(pdf), key="key", value="value",
               ordered=True)
    out = s.window_while_into(lambda f, t: t - f < 5,
                              lambda seg: float(len(seg)), max_rows=10)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
