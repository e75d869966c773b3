"""Property-based tests (Hypothesis) — the FsCheck layer of the
reference's test strategy (SURVEY.md §5):

- windowing/chunking lose no values
  (tests/FSharp.DataFrame.Tests/Common.fs:112-129),
- union key-set/value-preference laws (src/Series.fs:17-23),
- as-of lookup agrees with pandas merge_asof (the independent model).

Small max_examples: every example drives real Spark jobs.
"""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fsharp_dataframe_spark.series import Series

KEYSETS = st.lists(st.integers(min_value=0, max_value=400), min_size=1,
                   max_size=30, unique=True)

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


def sob(spark, pairs, ordered=True):
    return Series.of_observations(spark, [(int(k), float(v)) for k, v in pairs],
                                  "key int, value double", ordered=ordered)


@given(keys=KEYSETS, n=st.integers(min_value=1, max_value=5))
@settings(**SETTINGS)
def test_chunks_partition_the_input(spark, keys, n):
    s = sob(spark, [(k, k) for k in sorted(keys)])
    for boundary in ("at_beginning", "at_ending"):
        counts = s.chunk_size_into(n, F.count, boundary)
        total = sum(v for _, v in counts.observations())
        assert total == len(keys), boundary


@given(keys=KEYSETS, dist=st.integers(min_value=1, max_value=50))
@settings(**SETTINGS)
def test_chunk_while_partitions_the_input(spark, keys, dist):
    s = sob(spark, [(k, 1) for k in sorted(keys)])
    chunks = s.chunk_while_into(lambda f, t: t - f < dist,
                                lambda seg: float(len(seg)))
    assert sum(v for _, v in chunks.observations()) == len(keys)


@given(ka=KEYSETS, kb=KEYSETS)
@settings(**SETTINGS)
def test_union_prefer_laws(spark, ka, kb):
    a = sob(spark, [(k, k) for k in ka], ordered=False)
    b = sob(spark, [(k, -k - 1) for k in kb], ordered=False)
    for behavior, pick in [("prefer_left", lambda k: float(k)),
                           ("prefer_right", lambda k: float(-k - 1))]:
        u = dict(a.union(b, behavior).observations())
        assert set(u) == set(ka) | set(kb)
        for k in set(ka) & set(kb):
            assert u[k] == pick(k), (behavior, k)
        for k in set(ka) - set(kb):
            assert u[k] == float(k)
        for k in set(kb) - set(ka):
            assert u[k] == float(-k - 1)


@given(src_keys=KEYSETS, probe_keys=KEYSETS)
@settings(**SETTINGS)
def test_asof_matches_pandas_merge_asof(spark, src_keys, probe_keys):
    src = sob(spark, [(k, k) for k in sorted(src_keys)])
    probe = spark.createDataFrame([(int(k),) for k in sorted(probe_keys)], "key int")
    got = {r["key"]: r["value"]
           for r in src.get_items(probe, "nearest_smaller").df.collect()}
    model = pd.merge_asof(
        pd.DataFrame({"key": sorted(probe_keys)}),
        pd.DataFrame({"key": sorted(src_keys), "value": [float(k) for k in sorted(src_keys)]}),
        on="key", direction="backward")
    for _, row in model.iterrows():
        exp = None if pd.isna(row["value"]) else row["value"]
        assert got[row["key"]] == exp
