"""Bucketed (no-global-window) variants of un-keyed ordered ops must
match the plain single-window path exactly, and their physical plans
must contain no data-sized single-partition exchange
(operators/bucketed.py)."""

import random

from pyspark.sql import functions as F

from fsharp_dataframe_spark.series import AT_BEGINNING, AT_ENDING, SKIP, Series
from fsharp_dataframe_spark.operators.bucketed import with_global_positions


def _series(spark, n=500, dup_heavy=False):
    rng = random.Random(3)
    if dup_heavy:
        # few distinct keys → raw quantile buckets collapse, exercising
        # census merging; duplicates are disambiguated by a second level
        keys = sorted(rng.choice(range(5)) for _ in range(n))
        rows = [(k, i, float(rng.randint(0, 99))) for i, k in enumerate(keys)]
        df = spark.createDataFrame(rows, "key int, sub int, value double")
        return Series(df, key=["key", "sub"], value="value", ordered=True)
    rows = [(i * 3, float(rng.randint(0, 99))) for i in range(n)]
    df = spark.createDataFrame(rows, "key int, value double")
    return Series(df, key="key", value="value", ordered=True)


def _collect(s):
    return [tuple(r) for r in s.df.orderBy(*s.key_cols).collect()]


def test_global_positions_exact(spark):
    s = _series(spark)
    out, total = with_global_positions(s.df, s.key_cols, n_buckets=8)
    assert total == 500
    got = [r["__gpos"] for r in out.orderBy("key").collect()]
    assert got == list(range(500))


def test_bucketed_shift_diff_pairwise_match_plain(spark):
    for dup in (False, True):
        s = _series(spark, dup_heavy=dup)
        for n in (1, 3, -2):
            assert _collect(s.shift(n, bucketed=True)) == _collect(s.shift(n)), (dup, n)
        assert _collect(s.diff(2, bucketed=True)) == _collect(s.diff(2)), dup
        p1 = _collect(s.pairwise(lambda a, b: b - a, bucketed=True))
        assert p1 == _collect(s.pairwise(lambda a, b: b - a)), dup


def test_bucketed_window_chunk_match_plain(spark):
    s = _series(spark)
    for boundary in (AT_BEGINNING, AT_ENDING, SKIP):
        w_b = _collect(s.window_size_into(5, F.sum, boundary, bucketed=True))
        w_p = _collect(s.window_size_into(5, F.sum, boundary))
        assert w_b == w_p, boundary
        c_b = _collect(s.chunk_size_into(7, F.sum, boundary, bucketed=True))
        c_p = _collect(s.chunk_size_into(7, F.sum, boundary))
        assert c_b == c_p, boundary


def test_bucketed_plan_has_no_global_exchange(spark):
    s = _series(spark)
    for made in (s.shift(2, bucketed=True), s.chunk_size_into(7, F.sum, "skip", bucketed=True),
                 s.window_size_into(5, F.sum, "at_beginning", bucketed=True)):
        plan = made.df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan, plan[:2000]


def test_bucketed_chunk_dist_matches_sequential(spark):
    # the pointer-chase chunk recurrence across buckets must reproduce
    # the sequential reference shape on irregular keys with gaps
    # (gap > dist forces fresh starts; dist > range collapses to one
    # chunk that swallows every bucket)
    import random

    from fsharp_dataframe_spark.operators.window import (
        series_chunk_dist_bucketed, series_chunk_while,
    )

    rng = random.Random(13)
    keys = sorted(rng.sample(range(0, 4000), 500))
    df = spark.createDataFrame([(k, float(rng.randint(0, 9))) for k in keys],
                               "key int, value double")
    s = Series(df, key="key", value="value", ordered=True)
    agg = lambda seg: float(seg["value"].sum())
    for dist in (5, 37, 900, 10_000):
        seq = series_chunk_while(s, lambda f, t: (t - f) < dist, agg, None, "double")
        buck = series_chunk_dist_bucketed(s, dist, agg, n_buckets=16)
        assert _collect(buck) == _collect(seq), f"dist={dist}"


def test_bucketed_chunk_dist_plan_has_no_global_exchange(spark):
    s = _series(spark)
    out = s.chunk_dist_into(7, lambda seg: float(seg["value"].sum()))
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan[:2000]


def test_bucketed_window_dist_matches_plain(spark):
    # dist-wide range buckets + one-hop ghosts must equal the plain
    # single-window shape for dists smaller/larger than bucket widths
    from fsharp_dataframe_spark.operators.window import (
        series_window_dist, series_window_dist_bucketed,
    )

    rng = random.Random(5)
    keys = sorted(rng.sample(range(0, 3000), 400))
    df = spark.createDataFrame([(k, float(rng.randint(0, 9))) for k in keys],
                               "key int, value double")
    s = Series(df, key="key", value="value", ordered=True)
    for dist in (4, 150, 9999):
        plain = _collect(series_window_dist(s, dist, F.sum, bucketed=False))
        buck = _collect(series_window_dist_bucketed(s, dist, F.sum))
        assert buck == plain, f"dist={dist}"


def test_chunk_dist_guard_falls_back_when_dist_spans_buckets(spark):
    # dist >= bucket key spacing would make the candidate collect pull
    # ~the whole key column to the driver; the guard must reroute to the
    # sequential path (with a warning) and still produce exact results
    import warnings

    from fsharp_dataframe_spark.operators.window import (
        series_chunk_dist_bucketed, series_chunk_while,
    )

    s = _series(spark)  # keys 0..1497, 64-bucket spacing ~23
    agg = lambda seg: float(seg["value"].sum())
    dist = 400
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        buck = series_chunk_dist_bucketed(s, dist, agg)
        got = _collect(buck)
    assert any("falling back" in str(w.message) for w in caught)
    seq = series_chunk_while(s, lambda f, t: (t - f) < dist, agg, None, "double")
    assert got == _collect(seq)


def test_bucketed_paths_exact_above_2_53(spark):
    # integer keys above 2^53 (epoch nanoseconds) are NOT representable
    # in float64; the bucketed chunk_dist/window_dist arithmetic must
    # stay in int64 and match the exact sequential/plain shapes
    from fsharp_dataframe_spark.operators.window import (
        series_chunk_dist_bucketed, series_chunk_while,
        series_window_dist, series_window_dist_bucketed,
    )

    base = 2 ** 53 + 1  # odd: rounds to 2^53 in float64
    rng = random.Random(7)
    keys = sorted(rng.sample(range(base, base + 3000), 400))
    df = spark.createDataFrame([(k, float(rng.randint(0, 9))) for k in keys],
                               "key long, value double")
    s = Series(df, key="key", value="value", ordered=True)
    agg = lambda seg: float(seg["value"].sum())
    for dist in (4, 11):
        seq = series_chunk_while(s, lambda f, t: (t - f) < dist, agg, None, "double")
        buck = series_chunk_dist_bucketed(s, dist, agg, n_buckets=16)
        assert _collect(buck) == _collect(seq), f"chunk dist={dist}"
        plain = _collect(series_window_dist(s, dist, F.sum, bucketed=False))
        wbuck = _collect(series_window_dist_bucketed(s, dist, F.sum, n_buckets=16))
        assert wbuck == plain, f"window dist={dist}"


def test_bucketed_window_dist_plan_has_no_global_exchange(spark):
    s = _series(spark)
    out = s.window_dist_into(9, F.sum)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan[:2000]


def test_bucketed_directional_fill_matches_plain(spark):
    # the carry cascade must equal the single-window fill, including
    # buckets whose values are ALL missing (carry crosses them) and
    # missing runs at the series edges (stay missing)
    rng = random.Random(9)
    rows = []
    for i in range(400):
        v = None if (i < 3 or i > 396 or rng.random() < 0.4) else float(i)
        rows.append((i * 2, v))
    # a long all-missing stretch spanning several buckets
    rows[100:140] = [(k, None) for k, _ in rows[100:140]]
    df = spark.createDataFrame(rows, "key int, value double")
    s = Series(df, key="key", value="value", ordered=True)
    for direction in ("forward", "backward"):
        plain = _collect(s.fill_missing(direction, bucketed=False))
        buck = _collect(s.fill_missing(direction))
        assert buck == plain, direction


def test_bucketed_fill_plan_no_data_sized_single_partition(spark):
    # the only single-partition window allowed is the n_buckets-row
    # carry spine; the data-path fill must partition by bucket
    s = _series(spark)
    out = s.fill_missing("forward")
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__gbucket" in plan, plan[:2000]


def test_bucketed_frame_fill_matches_plain(spark):
    from fsharp_dataframe_spark.frame import Frame

    rng = random.Random(11)
    rows = [(i, None if rng.random() < 0.5 else float(i),
             None if rng.random() < 0.5 else float(i * 2)) for i in range(300)]
    df = spark.createDataFrame(rows, "key int, a double, b double")
    fr = Frame(df, key="key", ordered=True)
    for direction in ("forward", "backward"):
        plain = [tuple(r) for r in fr.fill_missing(direction, bucketed=False)
                 .df.orderBy("key").collect()]
        buck = [tuple(r) for r in fr.fill_missing(direction)
                .df.orderBy("key").collect()]
        assert buck == plain, direction
