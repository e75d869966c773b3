"""Golden port of the reference's volatility workflow
(samples/samples/volatility.fsx:60-95): minute-interval exact lookup →
log → pairwise log-return diffs → hourly sampleTime chunks → per-chunk
mean / standard deviation.

The reference generates its prices with .NET's RNG (unreproducible
here), so this port pins the COMPOSITION: the same operator chain over
a deterministic geometric-Brownian series, verified against an
independent plain-Python replay of every step (the role MathNet +
eager evaluation play in the sample).
"""

import math
import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.series import Series

START = datetime(2024, 3, 1)
N_SECONDS = 4 * 60 * 60  # four hours of 1-second prices


def _prices():
    # randomPrice seed=7 drift=0.1 volatility=3.0 initial=20.0, 1s span
    rng = random.Random(7)
    dt = (1.0 / 86400.0) / 250.0
    drift_exp = (0.1 - 0.5 * 3.0 ** 2) * dt
    rand_exp = 3.0 * math.sqrt(dt)
    price = 20.0
    out = []
    for i in range(N_SECONDS):
        price = price * math.exp(drift_exp + rand_exp * rng.gauss(0, 1))
        out.append((START + timedelta(seconds=i), price))
    return out


@pytest.fixture(scope="module")
def hourly_stats(spark):
    rows = _prices()
    s = Series(spark.createDataFrame(rows, "ts timestamp, price double"),
               key="ts", value="price", ordered=True)

    # Series.lookupAll intervals Lookup.Exact — the minute grid exists
    # in the data, so exact lookup == filter on whole minutes
    minutes = s.df.filter(F.second("ts") == 0)
    logs = Series(minutes.select("ts", F.log("price").alias("logp")),
                  key="ts", value="logp", ordered=True)
    # Series.pairwiseWith (fun _ (v1, v2) -> v2 - v1)
    diffs = logs.pairwise(lambda prev, cur: cur - prev)
    dser = Series(diffs.df.select("ts", F.col("logp").alias("d")),
                  key="ts", value="d", ordered=True)
    # Series.sampleTime (1 hour) Forward + per-chunk sdv/mean
    # (the frame-of-columns detour in the sample exists only for
    # charting; the statistics are per-hour aggregates)
    out = dser.sample_time_into(
        "1 hour",
        lambda v: F.struct(
            F.avg(v).alias("mean"),
            F.stddev_samp(v).alias("sdv"),
            F.count(v).alias("n")),
        direction="forward", origin=START)
    got = {}
    for r in out.df.collect():
        got[r["ts"]] = (r["d"]["mean"], r["d"]["sdv"], r["d"]["n"])
    return rows, got


def test_volatility_chain_matches_python_replay(hourly_stats):
    rows, got = hourly_stats
    # independent replay: minute grid → log → diff → hour buckets
    by_minute = [(ts, p) for ts, p in rows if ts.second == 0]
    logs = [(ts, math.log(p)) for ts, p in by_minute]
    diffs = [(logs[i][0], logs[i][1] - logs[i - 1][1])
             for i in range(1, len(logs))]
    buckets = {}
    for ts, d in diffs:
        b = ts.replace(minute=0, second=0)
        buckets.setdefault(b, []).append(d)
    assert set(got) == set(buckets)
    for b, vals in buckets.items():
        n = len(vals)
        mean = sum(vals) / n
        sdv = (math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1))
               if n > 1 else None)
        g_mean, g_sdv, g_n = got[b]
        assert g_n == n
        assert g_mean == pytest.approx(mean, abs=1e-12)
        if sdv is None:
            assert g_sdv is None
        else:
            assert g_sdv == pytest.approx(sdv, rel=1e-9)


def test_volatility_hourly_shape(hourly_stats):
    rows, got = hourly_stats
    # four hours of data → four hourly buckets; the first bucket has
    # one fewer diff (pairwise drops the first minute)
    assert len(got) == 4
    ns = [got[k][2] for k in sorted(got)]
    assert ns[0] == 59 and all(n == 60 for n in ns[1:])
