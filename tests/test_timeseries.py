"""Unit pins for functions/timeseries.py: hand-computable OHLC/VWAP/
drawdown/returns/autocorr values, interval-join correctness on both
paths (keyed and global-binned) plus the no-cartesian plan pin, and
sample_per_group determinism — the SQL-oracle gate covers the
full-corpus replays (tests/test_oracle_extra.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions.timeseries import (
    autocorr, interval_join, max_drawdown, ohlc_resample, returns,
    sample_per_group, vwap,
)


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_ohlc_resample_bars_and_tie_determinism(spark):
    rows = [
        # one week, deterministic open/close under a timestamp tie:
        # two rows at the same ts — tiebreak id orders them
        ("a", _ts(1, 9), 1, 10.0),
        ("a", _ts(1, 9), 2, 11.0),   # same ts, higher id
        ("a", _ts(3, 9), 3, 5.0),
        ("a", _ts(5, 9), 4, 8.0),
        # second week
        ("a", _ts(8, 9), 5, 20.0),
        ("b", _ts(1, 9), 6, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, id long, v double")
    got = {(r["k"], r["bucket"].isoformat()): r
           for r in ohlc_resample(df, "k", "ts", "v",
                                  unit="week", tiebreak="id").collect()}
    bar = got[("a", "2024-01-01")]
    assert (bar["open"], bar["high"], bar["low"], bar["close"], bar["n"]) == \
        (10.0, 11.0, 5.0, 8.0, 4)
    assert got[("a", "2024-01-08")]["open"] == 20.0
    assert got[("b", "2024-01-01")]["n"] == 1


def test_vwap_exact_and_zero_qty(spark):
    rows = [
        ("a", _ts(1), 10.0, 2.0),   # pq = 20
        ("a", _ts(2), 20.0, 1.0),   # pq = 20 -> vwap 40/3
        ("b", _ts(1), 5.0, 0.0),    # zero volume -> NULL
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, p double, q double")
    got = {r["k"]: r for r in
           vwap(df, "k", "ts", "p", "q", unit="month").collect()}
    # floor((40/3)*1e10 micro-units)/1e10
    assert got["a"]["vwap"] == pytest.approx(13.3333333333, abs=1e-9)
    assert got["a"]["n"] == 2
    assert got["b"]["vwap"] is None


def test_max_drawdown_known_path(spark):
    # peak path: 10 -> 8 (dd .2) -> 12 -> 6 (dd .5) -> 9
    rows = [("a", _ts(d), float(v)) for d, v in
            [(1, 10), (2, 8), (3, 12), (4, 6), (5, 9)]]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = max_drawdown(df, "k", "ts", "v").collect()[0]
    assert got["max_drawdown"] == 0.5
    assert got["n"] == 5


def test_returns_and_cumulative(spark):
    rows = [("a", _ts(1), 1, 100.0), ("a", _ts(2), 2, 110.0),
            ("a", _ts(3), 3, 99.0)]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, id long, v double")
    got = {r["id"]: r for r in
           returns(df, "k", "ts", "v", tiebreak="id").collect()}
    assert got[1]["ret"] is None and got[1]["cum"] == 1.0
    assert got[2]["ret"] == 0.1 and got[2]["cum"] == 1.1
    assert got[3]["ret"] == 0.1 - 0.2 and got[3]["cum"] == 0.99


def test_autocorr_perfect_alternation(spark):
    # strict alternation has lag-1 autocorrelation -1
    rows = [("a", _ts(1, h), h, 1.0 if h % 2 else 2.0) for h in range(10)]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, id long, v double")
    got = autocorr(df, "k", "ts", "v", lag=1, tiebreak="id").collect()[0]
    assert got["autocorr_1"] == -1.0
    assert got["n"] == 9
    # constant series -> zero variance -> NULL
    const = spark.createDataFrame(
        [("c", _ts(1, h), h, 5.0) for h in range(5)],
        "k string, ts timestamp, id long, v double")
    got_c = autocorr(const, "k", "ts", "v", lag=1, tiebreak="id").collect()[0]
    assert got_c["autocorr_1"] is None


def _points_and_intervals(spark):
    pts = spark.createDataFrame(
        [(1, _ts(1, 12)), (2, _ts(2, 12)), (3, _ts(5, 12)), (4, _ts(9, 0))],
        "pid long, t timestamp")
    iv = spark.createDataFrame(
        [(100, _ts(1), _ts(3)),    # covers pids 1, 2
         (200, _ts(2), _ts(6)),    # covers pids 2, 3 (overlapping!)
         (300, _ts(7), _ts(9))],   # covers nothing (end exclusive)
        "wid long, s timestamp, e timestamp")
    return pts, iv


def test_interval_join_global_binned_matches_spec(spark):
    pts, iv = _points_and_intervals(spark)
    got = sorted((r["pid"], r["wid"]) for r in
                 interval_join(pts, iv, "t", "s", "e",
                               bin_seconds=86400).collect())
    assert got == [(1, 100), (2, 100), (2, 200), (3, 200)]


def test_interval_join_global_is_equi_join_not_cartesian(spark):
    pts, iv = _points_and_intervals(spark)
    plan = (interval_join(pts, iv, "t", "s", "e", bin_seconds=86400)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_keyed_path_and_left_nulls(spark):
    pts = spark.createDataFrame(
        [("u1", 1, _ts(1, 12)), ("u1", 2, _ts(4, 12)), ("u2", 3, _ts(1, 12))],
        "k string, pid long, t timestamp")
    iv = spark.createDataFrame(
        [("u1", _ts(1), _ts(3)), ("u2", _ts(2), _ts(5))],
        "k string, s timestamp, e timestamp")
    inner = interval_join(pts, iv, "t", "s", "e", keys=["k"])
    assert sorted(r["pid"] for r in inner.collect()) == [1]
    left = interval_join(pts, iv, "t", "s", "e", keys=["k"], how="left")
    rows = {r["pid"]: r for r in left.collect()}
    assert len(rows) == 3 and rows[3]["s"] is None
    # key column appears exactly once in the output
    assert [c for c in left.columns].count("k") == 1


def test_interval_join_global_auto_bin_matches_median_and_explicit(spark):
    """bin_seconds=None derives the bin from the approx-median interval
    length (r6 ask #6): the fixture's lengths are [2d, 4d, 2d], so the
    derived bin is exactly 172800 s — and the auto-binned join returns
    the same rows as any explicit bin (the bin only shapes the plan,
    the residual range filter fixes semantics)."""
    from fsharp_dataframe_spark.functions.timeseries import _auto_bin_seconds

    pts, iv = _points_and_intervals(spark)
    assert _auto_bin_seconds(iv, "s", "e") == 2 * 86400
    got = sorted((r["pid"], r["wid"]) for r in
                 interval_join(pts, iv, "t", "s", "e").collect())
    assert got == [(1, 100), (2, 100), (2, 200), (3, 200)]


def test_interval_join_auto_bin_rejects_empty_or_degenerate(spark):
    pts, iv = _points_and_intervals(spark)
    with pytest.raises(ValueError, match="bin_seconds"):
        interval_join(pts, iv.filter("wid < 0"), "t", "s", "e")
    zero = iv.withColumn("e", F.col("s"))  # zero-length intervals
    with pytest.raises(ValueError, match="bin_seconds"):
        interval_join(pts, zero, "t", "s", "e")


def test_sample_per_group_deterministic_and_sized(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(200)], "id long, g string")
    a = sorted((r["g"], r["id"]) for r in
               sample_per_group(df, "g", 5, "id").collect())
    b = sorted((r["g"], r["id"]) for r in
               sample_per_group(df, "g", 5, "id").collect())
    assert a == b                       # reproducible
    from collections import Counter
    assert set(Counter(g for g, _ in a).values()) == {5}
    # md5 family picks a (different, but equally deterministic) sample
    m = sorted((r["g"], r["id"]) for r in
               sample_per_group(df, "g", 5, "id", hash_family="md5").collect())
    assert m == sorted(m)
    with pytest.raises(ValueError, match="hash_family"):
        sample_per_group(df, "g", 5, "id", hash_family="sha9")


def test_rolling_zscore_known_window(spark):
    from fsharp_dataframe_spark.functions.timeseries import rolling_zscore

    # k=3 over 1,2,3,10: third row window {1,2,3} -> z = 1; fourth row
    # window {2,3,10} -> mean 5, sdv sqrt(19), z = 5/sqrt(19)
    rows = [("a", _ts(1, h), h, float(v))
            for h, v in enumerate([1, 2, 3, 10], start=1)]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, id long, v double")
    got = {r["id"]: r["z"] for r in
           rolling_zscore(df, "k", "ts", "v", k=3, tiebreak="id").collect()}
    assert got[1] is None and got[2] is None      # under-filled windows
    assert got[3] == 1.0
    assert got[4] == pytest.approx(5 / 19 ** 0.5, abs=1e-6)


def test_market_beta_exact_line(spark):
    from fsharp_dataframe_spark.functions.timeseries import market_beta

    # asset "a" daily mean = 2 * market mean exactly; single-key market
    # means both assets move together: beta_a vs the composite
    rows = []
    for d in range(1, 6):
        m = float(d)                 # asset b mean = d
        rows.append(("b", _ts(d), m))
        rows.append(("a", _ts(d), 3.0 * m))  # asset a mean = 3d
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    # market daily mean = (d + 3d)/2 = 2d; a = 3d = 1.5*market + 0;
    # b = d = 0.5*market + 0
    got = {r["k"]: r for r in market_beta(df, "k", "ts", "v").collect()}
    assert got["a"]["beta"] == 1.5 and got["a"]["alpha"] == 0.0
    assert got["b"]["beta"] == 0.5 and got["b"]["alpha"] == 0.0
    assert got["a"]["n_days"] == 5


def test_seasonal_profile_buckets_and_exact_mean(spark):
    from fsharp_dataframe_spark.functions.timeseries import seasonal_profile

    # Mon 2024-01-01 09:xx twice (mean 1.5), Tue 2024-01-02 10:xx once
    rows = [("t", dt.datetime(2024, 1, 1, 9, 5), 1.0),
            ("t", dt.datetime(2024, 1, 1, 9, 55), 2.0),
            ("t", dt.datetime(2024, 1, 2, 10, 0), 7.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {(r["hour"], r["weekday"]): r for r in
           seasonal_profile(df, "k", "ts", "v").collect()}
    assert got[(9, 0)]["n"] == 2 and got[(9, 0)]["mean_value"] == 1.5
    assert got[(10, 1)]["n"] == 1 and got[(10, 1)]["mean_value"] == 7.0


def test_frame_level_timeseries_wrappers(spark):
    from fsharp_dataframe_spark import Frame

    rows = [("a", _ts(1), 1, 10.0), ("a", _ts(2), 2, 8.0),
            ("a", _ts(3), 3, 12.0)]
    fr = Frame(spark.createDataFrame(
        rows, "k string, ts timestamp, id long, v double"),
        key=["k", "ts", "id"], ordered=True)
    bars = fr.ohlc("k", "ts", "v", tiebreak="id")
    assert bars.df.count() == 1 and bars.df.first()["open"] == 10.0
    dd = fr.drawdown("k", "ts", "v", tiebreak="id")
    assert dd.df.first()["max_drawdown"] == 0.2
    rets = fr.returns("k", "ts", "v", tiebreak="id")
    assert rets.df.count() == 3


def test_twap_holds_until_next_and_weights_time(spark):
    """TWAP convention: observation i covers [ts_i, ts_{i+1}), the
    last extends to the bucket end, the span starts at the FIRST
    observation.  Hand-computed: v=10 for 6h then v=20 for the
    remaining 12h of the day (first obs at 06:00) ->
    (10*6 + 20*12)/18 = 16.6667."""
    from fsharp_dataframe_spark.functions.timeseries import twap

    rows = [("k", 1, _ts(1, 6), 10.0),    # 06:00 -> holds 6h
            ("k", 2, _ts(1, 12), 20.0)]   # 12:00 -> holds 12h to EOD
    df = spark.createDataFrame(
        rows, "k string, eid long, t timestamp, v double")
    got = twap(df, "k", "t", "v", unit="day", tiebreak="eid").collect()
    assert len(got) == 1
    r = got[0]
    assert r["n"] == 2
    assert abs(r["twap"] - (10 * 6 + 20 * 12) / 18) < 1e-4
    # single observation: whole remaining day at its value
    one = spark.createDataFrame([("k", 1, _ts(2, 18), 7.0)],
                                "k string, eid long, t timestamp, v double")
    r1 = twap(one, "k", "t", "v", unit="day", tiebreak="eid").collect()[0]
    assert r1["twap"] == 7.0 and r1["n"] == 1


def test_gap_report_strict_threshold_and_boundaries(spark):
    from fsharp_dataframe_spark.functions.timeseries import gap_report

    rows = [("u", 1, _ts(1, 0)), ("u", 2, _ts(1, 4)),   # exactly 4h
            ("u", 3, _ts(1, 9)),                        # 5h gap
            ("v", 4, _ts(1, 0))]                        # single: no gaps
    df = spark.createDataFrame(rows, "k string, eid long, t timestamp")
    got = gap_report(df, "k", "t", min_gap_s=4 * 3600,
                     tiebreak="eid").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["k"], r["gap_s"]) == ("u", 5 * 3600)
    assert r["gap_start"] == _ts(1, 4) and r["gap_end"] == _ts(1, 9)
