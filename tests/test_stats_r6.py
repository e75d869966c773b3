"""Unit pins for the round-6 analytics operators (functions/stats.py,
functions/text.char_entropy / clean_text): degenerate groups, NULL
policy, and hand-computable values — the SQL-oracle gate covers the
full-corpus replays (tests/test_oracle_extra.py)."""

import math

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions.stats import (
    grouped_mad_outliers, grouped_ols,
)
from fsharp_dataframe_spark.functions.text import char_entropy, clean_text


def test_grouped_ols_exact_line_and_degenerates(spark):
    rows = (
        # g=a: exact line y = 2x + 1 -> slope 2, intercept 1, r2 1
        [("a", x, 2.0 * x + 1.0) for x in range(10)]
        # g=b: single point -> NULLs
        + [("b", 5, 3.0)]
        # g=c: zero x-variance -> NULLs
        + [("c", 7, 1.0), ("c", 7, 9.0)]
        # g=d: zero y-variance -> slope 0, r2 NULL (var_y = 0)
        + [("d", 1, 4.0), ("d", 2, 4.0), ("d", 3, 4.0)]
    )
    df = spark.createDataFrame(rows, "g string, x int, y double")
    got = {r["g"]: r for r in
           grouped_ols(df, "g", F.col("x"), F.col("y")).collect()}
    assert got["a"]["slope"] == 2.0 and got["a"]["intercept"] == 1.0
    assert got["a"]["r2"] == 1.0
    assert got["b"]["slope"] is None and got["b"]["r2"] is None
    assert got["c"]["slope"] is None
    assert got["d"]["slope"] == 0.0 and got["d"]["intercept"] == 4.0
    assert got["d"]["r2"] is None


def test_grouped_mad_outliers_flags_and_zero_mad(spark):
    rows = (
        # g=a: 1..9 plus a wild 1000 -> med 5.5, MAD 2.5, one outlier
        [("a", float(v)) for v in range(1, 10)] + [("a", 1000.0)]
        # g=b: all identical -> MAD 0; the single deviant IS flagged
        # (the documented MAD=0 degeneracy)
        + [("b", 7.0)] * 5 + [("b", 7.1)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in
           grouped_mad_outliers(df, "g", F.col("v"), k=3.0).collect()}
    assert got["a"]["n"] == 10 and got["a"]["med"] == 5.5
    assert got["a"]["mad"] == 2.5 and got["a"]["n_outliers"] == 1
    assert got["b"]["mad"] == 0.0 and got["b"]["n_outliers"] == 1


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert set(got) == {1, 2, 3}          # empty/NULL docs excluded
    assert got[1]["entropy_bits"] == 0.0  # one symbol
    assert got[1]["top_char_frac"] == 1.0
    assert got[2]["entropy_bits"] == 1.0  # two symbols, uniform
    assert got[3]["entropy_bits"] == 2.0  # four symbols, uniform
    assert got[3]["top_char_frac"] == 0.25
    assert all(got[i]["n_chars"] == 4 for i in (1, 2, 3))


def test_clean_text_normalization(spark):
    zwsp, bom = "​", "﻿"
    df = spark.createDataFrame(
        [(1, f"  a{zwsp}b\tc\x00d  e{bom}  "),
         (2, "already clean"),
         (3, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in clean_text(df).collect()}
    # zero-widths removed outright; tab/NUL become spaces; runs
    # collapse; ends trim
    assert got[1]["text_clean"] == "ab c d e"
    assert got[1]["n_removed"] == len(f"  a{zwsp}b\tc\x00d  e{bom}  ") - len("ab c d e")
    assert got[2]["text_clean"] == "already clean" and got[2]["n_removed"] == 0
    # NULL text passes through with n_removed = 0 (the whole-difference
    # coalesce — the earlier minuend-only coalesce left this NULL)
    assert got[3]["text_clean"] is None and got[3]["n_removed"] == 0


def test_winsorize_clips_to_group_quantiles(spark):
    from fsharp_dataframe_spark.functions.stats import winsorize

    rows = [("a", float(v)) for v in range(1, 101)] + [("a", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "g", F.col("v"), lo=0.10, hi=0.90).collect()
    vals = sorted(r["value_w"] for r in out if r["value_w"] is not None)
    # exact interpolated p10/p90 of 1..100 are 10.9 and 90.1
    assert vals[0] == pytest.approx(10.9) and vals[-1] == pytest.approx(90.1)
    assert sum(1 for v in vals if v == pytest.approx(10.9)) == 10
    assert any(r["value_w"] is None for r in out)   # NULL passes through


def test_value_histogram_bins_and_clamps(spark):
    from fsharp_dataframe_spark.functions.stats import value_histogram

    df = spark.createDataFrame(
        [(float(v),) for v in (-5, 0, 4.99, 5, 12, 97, 150)] + [(None,)],
        "v double")
    got = {r["bin"]: (r["bin_lo"], r["n"]) for r in
           value_histogram(df, F.col("v"), n_bins=20, lo=0.0, hi=100.0).collect()}
    # -5 clamps into bin 0; 150 into bin 19; NULL dropped
    assert got[0] == (0.0, 3)   # -5, 0, 4.99
    assert got[1] == (5.0, 1)   # 5
    assert got[2] == (10.0, 1)  # 12
    assert got[19] == (95.0, 2)  # 97 and the 150 clamp
    assert sum(n for _, n in got.values()) == 7


def test_correlation_matrix_known_values(spark):
    import numpy as np

    from fsharp_dataframe_spark.functions.stats import correlation_matrix

    rng = np.random.default_rng(21)
    x = rng.normal(50, 10, 300).round(3)
    y = (2 * x + rng.normal(0, 1, 300)).round(3)   # strongly correlated
    z = rng.normal(0, 1, 300).round(3)             # independent
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double")
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in
           correlation_matrix(df, ["x", "y", "z"]).collect()}
    ref = np.corrcoef(np.vstack([x, y, z]))
    assert got[("x", "y")] == pytest.approx(ref[0, 1], abs=1e-3)
    assert got[("x", "z")] == pytest.approx(ref[0, 2], abs=1e-3)
    assert got[("y", "z")] == pytest.approx(ref[1, 2], abs=1e-3)
    assert len(got) == 3


def test_grouped_topk_ties_and_limit_pushdown(spark):
    from fsharp_dataframe_spark.functions.events import grouped_topk

    rows = [("u1", i, float(v)) for i, v in enumerate([5, 5, 3, 2, 1, 1])] \
         + [("u2", 10, 9.0)]
    df = spark.createDataFrame(rows, "u string, eid long, v double")
    out = grouped_topk(df, "u", "v", k=3, tiebreak_col="eid")
    got = {(r["u"], r["eid"]): r["rnk"] for r in out.collect()}
    # ties on v=5 break by eid asc; u2's single row ranks 1
    assert got == {("u1", 0): 1, ("u1", 1): 2, ("u1", 2): 3, ("u2", 10): 1}
    # the rank-k limit is pushed below the sort (WindowGroupLimit)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    # the NO-tiebreak default is deterministic too (VERDICT r6 minor
    # #5): ties break by a content hash of the whole row, so the same
    # data gives the same winners whatever the partitioning — and the
    # rank-k pushdown survives the composite ordering
    d2 = grouped_topk(df, "u", "v", k=1)
    a = {(r["u"], r["eid"]) for r in d2.collect()}
    b = {(r["u"], r["eid"])
         for r in grouped_topk(df.repartition(7), "u", "v", k=1).collect()}
    assert a == b and len(a) == 2
    assert "WindowGroupLimit" in \
        d2._jdf.queryExecution().executedPlan().toString()


def test_daily_activity_counts(spark):
    import datetime as dt

    from fsharp_dataframe_spark.functions.events import daily_activity

    def t(day, h):
        return dt.datetime(2024, 1, day, h, 0, 0)

    rows = [(1, t(1, 9)), (2, t(1, 10)), (1, t(2, 9)),
            (3, t(2, 10)), (3, t(2, 11)), (4, t(4, 9))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {str(r["day"]): (r["n_events"], r["n_active"], r["n_new"],
                           r["cum_users"])
           for r in daily_activity(df).collect()}
    assert got == {
        "2024-01-01": (2, 2, 2, 2),
        "2024-01-02": (3, 2, 1, 3),   # users 1,3 active; 3 is new
        "2024-01-04": (1, 1, 1, 4),
    }


def test_grouped_quantiles_exact_interpolation(spark):
    from fsharp_dataframe_spark.functions.stats import grouped_quantiles

    # 1..5: p50 = 3 exactly, p90 = 1 + 0.9*4 = 4.6 (the (n-1)*q
    # convention both engines share), p99 = 4.96
    rows = [("a", float(v)) for v in range(1, 6)] + [("b", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in
           grouped_quantiles(df, "g", F.col("v"),
                             qs=[0.5, 0.9, 0.99]).collect()}
    assert got["a"]["n"] == 5 and got["a"]["q50"] == 3.0
    assert got["a"]["q90"] == 4.6 and got["a"]["q99"] == 4.96
    # a single-row group: every quantile IS the value
    assert got["b"]["q50"] == got["b"]["q99"] == 7.0


def test_cross_sectional_zscore_known_values(spark):
    import datetime as dt

    from fsharp_dataframe_spark.functions.stats import cross_sectional_zscore

    day1 = dt.datetime(2024, 1, 1, 9)
    day2 = dt.datetime(2024, 1, 2, 9)
    rows = [(1, day1, 1.0), (2, day1, 2.0), (3, day1, 3.0),
            (4, day2, 5.0)]                      # singleton bucket -> NULL
    df = spark.createDataFrame(rows, "id long, ts timestamp, v double")
    out = cross_sectional_zscore(df, F.col("ts").cast("date"),
                                 F.col("v"), ["id"], bucket_name="day")
    got = {r["id"]: r["z"] for r in out.collect()}
    # day1: mean 2, sample sdv 1 -> z = -1, 0, 1
    assert got[1] == -1.0 and got[2] == 0.0 and got[3] == 1.0
    assert got[4] is None
    # the bucket stats come back via a BROADCAST join, not a shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_grouped_quantiles_injective_names_and_single_state(spark):
    from fsharp_dataframe_spark.functions.stats import grouped_quantiles

    df = spark.createDataFrame([("a", float(v)) for v in range(1, 101)],
                               "g string, v double")
    out = grouped_quantiles(df, "g", F.col("v"), qs=[0.55, 0.055])
    # dot-stripping collided 0.55 with 0.055 — names must be injective
    assert out.columns == ["g", "n", "q55", "q5_5"]
    r = out.first()
    assert r["q55"] != r["q5_5"] and r["q5_5"] < r["q55"]
    # all quantiles come from ONE percentile buffer (array form): the
    # physical plan carries exactly one percentile aggregate per stage
    # (partial + final = 2 occurrences); the per-quantile regression
    # would show 2 * len(qs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("percentile(") == 2, plan[:2000]
    import pytest
    with pytest.raises(ValueError, match="duplicate"):
        grouped_quantiles(df, "g", F.col("v"), qs=[0.5, 0.5])


def test_value_histogram_clamps_extreme_values_under_ansi(spark):
    from fsharp_dataframe_spark.functions.stats import value_histogram

    # a heavy-tailed value whose raw bin index exceeds int32 must CLAMP
    # into the last bin (the ANSI long->int cast crashed here before)
    df = spark.createDataFrame(
        [(1.0,), (1.1e10,), (-5e9,)], "v double")
    got = {r["bin"]: r["n"] for r in
           value_histogram(df, F.col("v"), n_bins=20, lo=0.0,
                           hi=100.0).collect()}
    assert got == {0: 2, 19: 1}


def test_quantile_bin_equal_frequency_and_edges(spark):
    from fsharp_dataframe_spark.functions.stats import quantile_bin

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)] + [(None,)], "v double")
    out = quantile_bin(df, F.col("v"), 4)
    got = {r["v"]: r["bin"] for r in out.collect()}
    # quartile cuts of 1..100 at (n-1)*q: 25.75, 50.5, 75.25
    assert got[1.0] == 0 and got[25.0] == 0
    assert got[26.0] == 1 and got[50.0] == 1
    assert got[51.0] == 2 and got[75.0] == 2
    assert got[76.0] == 3 and got[100.0] == 3
    assert got[None] is None
    from collections import Counter
    sizes = Counter(b for v, b in got.items() if v is not None)
    assert set(sizes.values()) == {25}          # equal frequency


def test_target_encode_loo_known_values(spark):
    from fsharp_dataframe_spark.functions.stats import target_encode_loo

    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0),
            (4, "b", 7.0),                       # singleton -> NULL
            (5, "c", 1.0), (6, "c", None)]       # NULL target -> NULL
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    got = {r["id"]: r["te"] for r in
           target_encode_loo(df, "cat", F.col("y")).collect()}
    assert got[1] == 25.0 and got[2] == 20.0 and got[3] == 15.0
    assert got[4] is None                # nothing to leave out
    assert got[6] is None                # NULL target
    # id 5: category c has ONE non-null target (its own) -> n=1 -> NULL
    assert got[5] is None


# ----------------------------------------------------------------------
# approx tier (exact=False): sketch-backed percentile family
# ----------------------------------------------------------------------

def test_percentile_family_approx_tier_equivalence(spark):
    """exact=False flips percentile -> approx_percentile.  At a few
    thousand values per group the GK summary (accuracy=10000) is exact
    to well under 0.5% of rank, so the approx tier must agree with the
    exact tier within a tight tolerance — and exactly on n/flag counts,
    which do not touch the sketch."""
    from fsharp_dataframe_spark.functions.stats import (
        grouped_quantiles, quantile_bin, winsorize,
    )
    from fsharp_dataframe_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    v = F.col("value")

    qe = {r["event_type"]: (r["n"], r["q50"], r["q90"])
          for r in grouped_quantiles(ev, "event_type", v,
                                     qs=[0.5, 0.9]).collect()}
    qa = {r["event_type"]: (r["n"], r["q50"], r["q90"])
          for r in grouped_quantiles(ev, "event_type", v, qs=[0.5, 0.9],
                                     exact=False).collect()}
    assert qe.keys() == qa.keys()
    # the sketch's guarantee is on RANK, not value (in a sparse tail a
    # tiny rank slip is a visible value gap) — so pin the rank: the
    # fraction of the group at or below the approx quantile must
    # bracket the target percent tightly
    ranks = {(r["event_type"], q): r["frac"] for q, col in
             [(0.5, "q50"), (0.9, "q90")] for r in
             ev.join(spark.createDataFrame(
                 [(k, qa[k][1], qa[k][2]) for k in qa],
                 "event_type string, a50 double, a90 double"),
                 "event_type")
             .groupBy("event_type")
             .agg((F.sum(F.when(v <= F.col("a50" if q == 0.5 else "a90"),
                                1).otherwise(0)) / F.count("*"))
                  .alias("frac")).collect()}
    for k in qe:
        assert qe[k][0] == qa[k][0]                       # n exact
        assert 0.48 <= ranks[(k, 0.5)] <= 0.52, (k, ranks[(k, 0.5)])
        assert 0.88 <= ranks[(k, 0.9)] <= 0.92, (k, ranks[(k, 0.9)])

    me = {r["event_type"]: r for r in
          grouped_mad_outliers(ev, "event_type", v, k=3.0).collect()}
    ma = {r["event_type"]: r for r in
          grouped_mad_outliers(ev, "event_type", v, k=3.0,
                               exact=False).collect()}
    for k in me:
        assert me[k]["n"] == ma[k]["n"]
        assert abs(me[k]["med"] - ma[k]["med"]) <= \
            max(0.5, 0.02 * abs(me[k]["med"])), k
        assert abs(me[k]["mad"] - ma[k]["mad"]) <= \
            max(0.5, 0.02 * abs(me[k]["mad"])), k
        # flag counts may differ by the sketch's rank error on values
        # near the threshold — bound the drift, don't demand identity
        assert abs(me[k]["n_outliers"] - ma[k]["n_outliers"]) <= \
            max(5, 0.01 * me[k]["n"])

    we = winsorize(ev, "event_type", v).agg(
        F.round(F.sum("value_w"), 2).alias("s")).first()["s"]
    wa = winsorize(ev, "event_type", v, exact=False).agg(
        F.round(F.sum("value_w"), 2).alias("s")).first()["s"]
    assert abs(we - wa) <= max(1.0, 0.01 * abs(we))

    be = quantile_bin(ev, v, 4, out_col="b")
    ba = quantile_bin(ev, v, 4, exact=False, out_col="b")
    ne = {r["b"]: r["n"] for r in be.groupBy("b").count()
          .withColumnRenamed("count", "n").collect()}
    na = {r["b"]: r["n"] for r in ba.groupBy("b").count()
          .withColumnRenamed("count", "n").collect()}
    assert set(ne) == set(na) == {0, 1, 2, 3}
    total = sum(ne.values())
    for b in ne:
        assert abs(ne[b] - na[b]) <= max(10, 0.02 * total), b


def test_percentile_approx_tier_plan_is_mergeable(spark):
    """The point of exact=False: the aggregate must be
    approx_percentile (mergeable GK summary with a partial_ map-side
    phase), with no exact `percentile(` value-buffer state anywhere in
    the plan."""
    from fsharp_dataframe_spark.functions.stats import grouped_quantiles
    from fsharp_dataframe_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = grouped_quantiles(ev, "event_type", F.col("value"),
                            qs=[0.5, 0.9], exact=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "approx_percentile" in plan
    assert "partial_approx_percentile" in plan       # map-side combine
    import re
    assert not re.search(r"(?<!approx_)percentile\(", plan)


def test_series_median_approx_tier(spark):
    """Series.median's exact=False tier: mergeable sketch, value
    within the GK rank bound of the exact median on a real column;
    grouped form likewise."""
    from fsharp_dataframe_spark.series import Series
    from fsharp_dataframe_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    s = Series(ev.select("event_id", "value"), key="event_id",
               value="value", ordered=True)
    exact = s.median()
    approx = s.median(exact=False)
    assert abs(exact - approx) <= max(0.5, 0.02 * abs(exact))
    g = s.group_by(lambda k: k % 5)
    ge = {r["group"]: r["value"] for r in g.median().df.collect()}
    ga = {r["group"]: r["value"]
          for r in g.median(exact=False).df.collect()}
    assert ge.keys() == ga.keys()
    for k in ge:
        assert abs(ge[k] - ga[k]) <= max(0.5, 0.02 * abs(ge[k])), k
