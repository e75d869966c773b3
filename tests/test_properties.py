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

SETTINGS = dict(max_examples=8, deadline=None, derandomize=True,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


def spark_round(x, scale=0):
    """Exact model of Spark's Round on DoubleType: HALF_UP over
    BigDecimal.valueOf(x), i.e. the shortest round-trip decimal repr of
    the double — NOT floor(x+0.5), which disagrees one ulp below a .5
    boundary (e.g. 0.49999999999999994 + 0.5 rounds to 1.0 in binary,
    but the true value is < 0.5 so Spark yields 0)."""
    from decimal import ROUND_HALF_UP, Decimal
    return float(Decimal(repr(float(x)))
                 .quantize(Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP))


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


VALS = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False,
              allow_infinity=False, width=64),
    min_size=1, max_size=25)


@given(vals=VALS)
@settings(**SETTINGS)
def test_nan_from_mapping_becomes_missing_on_aggregates(spark, vals):
    """The reference canonicalizes NaN produced by a mapping function
    back to *missing* (src/Vectors/ArrayVector.fs:213-223), and every
    aggregate then SKIPS it (src/Common/Common.fs:331-361).  Property:
    for any input values, sqrt() — NaN on negatives — must aggregate
    exactly like the reference model (python sum/count over the
    non-negative subset), and the NaN keys must read back as missing."""
    import math

    s = sob(spark, list(enumerate(vals)))
    mapped = s.map_values(lambda c: F.sqrt(c))
    ok = {k: math.sqrt(v) for k, v in enumerate(vals) if v >= 0}
    obs = dict(mapped.observations())
    assert set(obs) == set(ok)
    for k, v in obs.items():
        assert abs(v - ok[k]) < 1e-12
    assert mapped.count_values() == len(ok)
    got_sum = mapped.sum()
    if ok:
        assert got_sum is not None and abs(got_sum - sum(ok.values())) < 1e-9
        mean = mapped.mean()
        assert abs(mean - sum(ok.values()) / len(ok)) < 1e-9
    else:
        assert got_sum is None or got_sum == 0.0


@given(vals=st.lists(st.floats(min_value=0.1, max_value=100), min_size=1, max_size=10))
@settings(**SETTINGS)
def test_infinity_is_not_missing(spark, vals):
    """±Infinity is NOT missing in the reference
    (tests/FSharp.DataFrame.Tests/Common.fs:18-28) — canonicalization
    must drop only NaN, never infinities."""
    s = sob(spark, list(enumerate(vals)))
    # positive × inf = inf (double overflow semantics; ANSI division
    # by zero throws in Spark 4, so build the infinity by product)
    mapped = s.map_values(lambda c: c * F.lit(float("inf")))
    obs = dict(mapped.observations())
    assert set(obs) == set(range(len(vals)))
    assert all(v == float("inf") for v in obs.values())


@given(keys=st.lists(st.integers(min_value=0, max_value=2000),
                     min_size=2, max_size=40, unique=True),
       dist=st.integers(min_value=1, max_value=300))
@settings(**SETTINGS)
def test_chunk_dist_bucketed_matches_sequential(spark, keys, dist):
    # the carry cascade (per-bucket DP + driver boundary thread) must
    # equal the sequential recurrence on ANY key distribution; when the
    # degenerate-regime guard trips it falls back, which is equality by
    # construction — hypothesis explores both regimes
    import warnings

    s = sob(spark, [(k, k % 7) for k in sorted(keys)])
    agg = lambda seg: float(seg["value"].sum())
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        seq = s.chunk_dist_into(dist, agg, bucketed=False)
        buck = s.chunk_dist_into(dist, agg, bucketed=True, n_buckets=4)
    assert sorted(map(tuple, seq.df.collect())) == \
        sorted(map(tuple, buck.df.collect()))


@given(keys=st.lists(st.integers(min_value=0, max_value=500),
                     min_size=1, max_size=30, unique=True),
       dist=st.integers(min_value=1, max_value=120))
@settings(**SETTINGS)
def test_window_dist_bucketed_matches_plain(spark, keys, dist):
    import warnings

    s = sob(spark, [(k, k % 5) for k in sorted(keys)])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        plain = s.window_dist_into(dist, F.sum, bucketed=False)
        buck = s.window_dist_into(dist, F.sum, bucketed=True)
    assert sorted(map(tuple, plain.df.collect())) == \
        sorted(map(tuple, buck.df.collect()))


@given(vals=st.lists(st.one_of(st.none(),
                               st.integers(min_value=-50, max_value=50)),
                     min_size=1, max_size=25),
       direction=st.sampled_from(["forward", "backward"]))
@settings(**SETTINGS)
def test_global_fill_bucketed_matches_plain(spark, vals, direction):
    import warnings

    pairs = [(i, None if v is None else float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(pairs, "key int, value double")
    s = Series(df, key="key", value="value", ordered=True)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        plain = s.fill_missing(direction, bucketed=False)
        buck = s.fill_missing(direction, bucketed=True)
    assert sorted(map(tuple, plain.df.collect())) == \
        sorted(map(tuple, buck.df.collect()))


def test_vocab_topk_ordering_and_conservation(spark):
    # top-k rows are ordered (count desc, token asc), counts are
    # positive, n_docs <= n_occurrences, and the top-k total never
    # exceeds the corpus token count
    from pyspark.sql import functions as F

    from fsharp_dataframe_spark.functions.text import token_count, vocab_topk
    from fsharp_dataframe_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = vocab_topk(docs, k=25).collect()
    assert rows
    keys = [(-r["n_occurrences"], r["token"]) for r in rows]
    assert keys == sorted(keys)
    assert all(0 < r["n_docs"] <= r["n_occurrences"] for r in rows)
    total = docs.select(F.sum(token_count(F.col("text")))).collect()[0][0]
    assert sum(r["n_occurrences"] for r in rows) <= total


def test_unigram_scores_bounded_by_floor_and_zero(spark):
    # every mean log-prob lies in [floor, 0): probabilities are < 1,
    # and no doc can average below the least-likely token's log-prob
    import math

    from pyspark.sql import functions as F

    from fsharp_dataframe_spark.functions.text import (
        tokens, unigram_logprob_score,
    )
    from fsharp_dataframe_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = unigram_logprob_score(docs).collect()
    assert out
    stats = (docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("t"))
             .agg(F.count("*"), F.countDistinct("t")).collect()[0])
    n, v = int(stats[0]), int(stats[1])
    floor = math.log(1.0 / (n + v))  # least-likely: count-1 token
    assert all(floor - 1e-6 <= r["mean_logprob"] < 0 for r in out)


# events: (user, seconds) pairs with unique (user, sec) — sessionize
# must agree with a direct sequential reference on any input
EVENTSETS = st.lists(
    st.tuples(st.integers(min_value=1, max_value=3),
              st.integers(min_value=0, max_value=10_000)),
    min_size=1, max_size=25, unique=True)


@given(evs=EVENTSETS, gap=st.integers(min_value=1, max_value=5_000))
@settings(**SETTINGS)
def test_sessionize_matches_sequential_reference(spark, evs, gap):
    import datetime as dt

    from fsharp_dataframe_spark.functions.events import sessionize

    rows = [(u, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
            for i, (u, s) in enumerate(evs)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {r["event_id"]: r["session_idx"]
           for r in sessionize(df, gap_seconds=gap).collect()}

    # sequential reference: per user, sorted by (sec, event_id), break
    # when the gap strictly exceeds `gap`
    exp = {}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, s) in enumerate(evs):
        by_user.setdefault(u, []).append((s, i))
    for u, items in by_user.items():
        items.sort()
        idx, prev = 0, None
        for s, i in items:
            if prev is None or s - prev > gap:
                idx += 1
            exp[i] = idx
            prev = s
    assert got == exp


FUNNEL_EVENTS = st.lists(
    st.tuples(st.integers(min_value=1, max_value=4),      # user
              st.integers(min_value=0, max_value=500),    # sec
              st.sampled_from(["view", "click", "purchase", "noise"])),
    min_size=1, max_size=30)


@given(evs=FUNNEL_EVENTS)
@settings(**SETTINGS)
def test_funnel_matches_sequential_reference(spark, evs):
    import datetime as dt

    from fsharp_dataframe_spark.functions.events import funnel

    rows = [(u, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), t)
            for i, (u, s, t) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string")
    steps = ["view", "click", "purchase"]
    got = {r["step"]: r["n_keys"] for r in funnel(df, steps).collect()}

    # sequential reference: greedy first-touch state machine per user
    # over time-ordered events (ties at equal seconds cannot advance
    # two stages — strict > — so any stable order gives the same count)
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, s, t in evs:
        by_user.setdefault(u, []).append((s, t))
    exp = {s: 0 for s in steps}
    for items in by_user.values():
        items.sort(key=lambda x: x[0])
        stage, anchor = 0, None
        for s, t in items:
            if stage >= len(steps):
                break
            if t == steps[stage] and (stage == 0 or s > anchor):
                anchor = s
                stage += 1
        for k in range(stage):
            exp[steps[k]] += 1
    assert got == exp


@given(
    texts=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                 min_size=0, max_size=40).map(" ".join),
        min_size=1, max_size=8),
    max_tokens=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=6),
)
@settings(**SETTINGS)
def test_chunk_documents_matches_sequential(spark, texts, max_tokens, overlap):
    """Any (max_tokens, overlap < max_tokens) config reproduces the
    sequential chunker: coverage (concatenating chunks at stride
    offsets rebuilds the token stream), counts, and slicing."""
    from fsharp_dataframe_spark.functions.sampling import chunk_documents

    overlap = min(overlap, max_tokens - 1)
    stride = max_tokens - overlap
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"])
        for r in chunk_documents(df, max_tokens=max_tokens,
                                 overlap=overlap).collect())
    ref = []
    for doc_id, text in enumerate(texts):
        t = text.split()
        n_chunks = max(-(-(len(t) - overlap) // stride), 1)
        for i in range(n_chunks):
            ref.append((doc_id, i, " ".join(t[i * stride:i * stride + max_tokens])))
    assert got == sorted(ref)


@given(
    paras=st.lists(
        st.lists(st.sampled_from(["p1", "p2", "p3", "p4", "p5"]),
                 min_size=0, max_size=6).map("\n".join),
        min_size=1, max_size=8),
)
@settings(**SETTINGS)
def test_dedup_paragraphs_survivors_are_distinct_set(spark, paras):
    """Corpus-wide invariants for any paragraph layout: surviving
    paragraphs = exactly the DISTINCT paragraph set, removals account
    for every repeat, and survivors keep first-occurrence positions."""
    from collections import Counter

    from fsharp_dataframe_spark.functions.dedup import dedup_paragraphs

    df = spark.createDataFrame(list(enumerate(paras)),
                               "doc_id long, text string")
    rows = dedup_paragraphs(df).collect()
    all_paras = Counter()
    for text in paras:
        all_paras.update(p for p in (x.strip() for x in text.split("\n")) if p)
    survivors = Counter()
    for r in rows:
        survivors.update(p for p in r["clean_text"].split("\n") if p)
    assert survivors == Counter(set(all_paras))
    assert sum(r["n_removed"] for r in rows) == (
        sum(all_paras.values()) - len(set(all_paras)))
    # first occurrence wins: doc order of each survivor == min doc
    # containing it
    first_doc = {}
    for doc_id, text in enumerate(paras):
        for p in (x.strip() for x in text.split("\n")):
            if p and p not in first_doc:
                first_doc[p] = doc_id
    for r in rows:
        for p in (x for x in r["clean_text"].split("\n") if x):
            assert first_doc[p] == r["doc_id"]


@given(keys=KEYSETS,
       null_every=st.integers(min_value=2, max_value=5))
@settings(**SETTINGS)
def test_fill_linear_agrees_with_pandas(spark, keys, null_every):
    import numpy as np

    ks = sorted(keys)
    pairs = [(k, None if i % null_every == 0 else float(k) * 1.5)
             for i, k in enumerate(ks)]
    pdf = pd.DataFrame(pairs, columns=["key", "value"])
    pdf["value"] = pdf["value"].astype("float64")
    s = Series(spark.createDataFrame(pdf, "key int, value double"),
               key="key", value="value", ordered=True)
    for bucketed in (False, True):
        out = s.fill_missing("linear", bucketed=bucketed).df \
            .orderBy("key").toPandas()
        ref = pdf.set_index("key")["value"].interpolate(
            method="index", limit_area="inside")
        assert np.allclose(out["value"].to_numpy(), ref.to_numpy(),
                           equal_nan=True), bucketed


@given(keys=KEYSETS,
       alpha_num=st.integers(min_value=1, max_value=7),
       width=st.integers(min_value=1, max_value=500))
@settings(**SETTINGS)
def test_ewma_decomposition_matches_sequential_reference(spark, keys,
                                                         alpha_num, width):
    import numpy as np

    a = alpha_num / 8.0
    ks = sorted(keys)
    vals = [float((k * 37) % 101) + 1.0 for k in ks]
    y, seq = None, []
    for x in vals:
        y = x if y is None else (1 - a) * y + a * x
        seq.append(y)
    s = sob(spark, list(zip(ks, vals)))
    out = s.ewma(a, bucket_width=float(width)).df.orderBy("key") \
        .toPandas()["value"].to_numpy()
    assert np.allclose(out, np.array(seq), rtol=1e-10)


@given(texts=st.lists(st.text(alphabet="ab ", min_size=0, max_size=40),
                      min_size=1, max_size=12),
       seq_len=st.integers(min_value=1, max_value=64))
@settings(**SETTINGS)
def test_pack_sequences_tiles_any_corpus(spark, texts, seq_len):
    from fsharp_dataframe_spark.functions.sampling import pack_sequences

    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    out = pack_sequences(docs, seq_len).toPandas()
    if out.empty:
        return
    out["span"] = out.tok_end - out.tok_begin
    assert (out["span"] > 0).all()
    per_seq = out.groupby("seq_id")["span"].sum().sort_index()
    assert (per_seq.iloc[:-1] == seq_len).all()
    assert per_seq.iloc[-1] <= seq_len
    assert list(per_seq.index) == list(range(len(per_seq)))


@given(
    pts=st.lists(st.integers(min_value=0, max_value=500_000), min_size=1,
                 max_size=25),
    ivs=st.lists(st.tuples(st.integers(min_value=0, max_value=500_000),
                           st.integers(min_value=0, max_value=200_000)),
                 min_size=1, max_size=10),
    bin_s=st.sampled_from([60, 3600, 86400]),
)
@settings(**SETTINGS)
def test_interval_join_binned_matches_naive_range_join(spark, pts, ivs, bin_s):
    # the binned global interval join must equal the naive range join
    # for ANY bin width — bin-boundary off-by-ones (a point on a bin
    # edge, an interval ending exactly on one) are exactly what this
    # hunts.  Seconds offset from a fixed epoch; [s, s+len) half-open.
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    from fsharp_dataframe_spark.functions.timeseries import interval_join

    p = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(pts)],
        "pid long, t timestamp")
    iv = spark.createDataFrame(
        [(j, base + dt.timedelta(seconds=s),
          base + dt.timedelta(seconds=s + ln))
         for j, (s, ln) in enumerate(ivs)],
        "wid long, s timestamp, e timestamp")
    got = sorted((r["pid"], r["wid"]) for r in
                 interval_join(p, iv, "t", "s", "e",
                               bin_seconds=bin_s).collect())
    exp = sorted((i, j) for i, s in enumerate(pts)
                 for j, (ws, ln) in enumerate(ivs) if ws <= s < ws + ln)
    assert got == exp


@given(vals=st.lists(st.tuples(st.integers(min_value=0, max_value=4),
                               st.integers(min_value=-1000, max_value=1000)),
                     min_size=1, max_size=40),
       n_salts=st.sampled_from([1, 3, 16]))
@settings(**SETTINGS)
def test_salted_agg_equals_naive_for_any_salt_count(spark, vals, n_salts):
    from fsharp_dataframe_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [(f"k{k}", float(v)) for k, v in vals], "k string, v double")
    aggs = {"n": F.count("*"),
            "su": F.sum(F.round(F.col("v") * 100).cast("long")),
            "lo": F.min("v"), "hi": F.max("v")}
    salted = {r["k"]: (r["n"], r["su"], r["lo"], r["hi"]) for r in
              salted_agg(df, "k", aggs, n_salts=n_salts).collect()}
    naive = {r["k"]: (r["n"], r["su"], r["lo"], r["hi"]) for r in
             df.groupBy("k").agg(
                 *[c.alias(n) for n, c in aggs.items()]).collect()}
    assert salted == naive


@given(rows=st.lists(st.tuples(st.integers(min_value=0, max_value=6),
                               st.integers(min_value=0, max_value=50)),
                     min_size=1, max_size=30))
@settings(**SETTINGS)
def test_ohlc_bars_agree_with_pandas_reference(spark, rows):
    # open/close = first/last by (ts, id) within the bucket; ties on ts
    # broken by the id — validated against a pandas groupby reference
    import datetime as dt

    from fsharp_dataframe_spark.functions.timeseries import ohlc_resample

    base = dt.datetime(2024, 1, 1)
    data = [("k", base + dt.timedelta(days=d), i, float(v * 10 + d))
            for i, (d, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "k string, ts timestamp, id long, v double")
    got = {r["bucket"]: (r["open"], r["high"], r["low"], r["close"], r["n"])
           for r in ohlc_resample(df, "k", "ts", "v", unit="week",
                                  tiebreak="id").collect()}
    pdf = pd.DataFrame(data, columns=["k", "ts", "id", "v"])
    pdf["bucket"] = pdf["ts"].dt.to_period("W-SUN").dt.start_time.dt.date
    exp = {}
    for b, g in pdf.sort_values(["ts", "id"]).groupby("bucket"):
        exp[b] = (g["v"].iloc[0], g["v"].max(), g["v"].min(),
                  g["v"].iloc[-1], len(g))
    assert got == exp


# ---------------------------------------------------------------------------
# round-7 operators: SCD2 interval laws, snapshot-diff laws, transition sums
# ---------------------------------------------------------------------------

@given(events=st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),     # key
              st.integers(min_value=0, max_value=50),    # ts offset (s)
              st.sampled_from(["A", "B", "C"])),         # attr
    min_size=1, max_size=25))
@settings(**SETTINGS)
def test_scd2_intervals_partition_time(spark, events):
    """SCD2 laws: per key, intervals are disjoint, contiguous
    (valid_to == next valid_from), open-ended at the tail, start at
    the key's first event, and adjacent intervals always CHANGE the
    attribute (change detection admits no A->A seam)."""
    import datetime as dt

    from fsharp_dataframe_spark.functions.scd import scd2_from_events

    rows = [(k, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), a)
            for i, (k, s, a) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "k long, eid long, ts timestamp, attr string")
    h = scd2_from_events(df, "k", "ts", ["attr"], tiebreak="eid")
    by_key: dict = {}
    for r in h.collect():
        by_key.setdefault(r["k"], []).append(
            (r["valid_from"], r["valid_to"], r["attr"]))
    firsts = {k: min(t for kk, _, t, _ in rows if kk == k)
              for k in {kk for kk, *_ in rows}}
    # deterministic first attr: min (ts, eid) row per key
    first_attr = {}
    for k, eid, t, a in sorted(rows, key=lambda x: (x[0], x[2], x[1])):
        first_attr.setdefault(k, a)
    for k, ivs in by_key.items():
        ivs.sort(key=lambda x: x[0])
        assert ivs[0][0] == firsts[k]          # history opens at first event
        assert ivs[0][2] == first_attr[k]
        assert ivs[-1][1] is None              # tail open-ended
        for (f1, t1, a1), (f2, t2, a2) in zip(ivs, ivs[1:]):
            assert t1 == f2                    # contiguous, disjoint
            assert a1 != a2                    # every seam is a change


@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=20),
              st.integers(min_value=0, max_value=3)),
    min_size=0, max_size=20, unique_by=lambda x: x[0]))
@settings(**SETTINGS)
def test_snapshot_diff_laws(spark, rows):
    """diff(X, X) is empty; diff(X, Y) statuses invert under argument
    swap (added <-> removed, changed stays changed with the same
    column list)."""
    from fsharp_dataframe_spark.functions.diff import snapshot_diff

    old = spark.createDataFrame(rows + [(999, 0)], "k long, v long")
    # perturb: drop k%3==0, bump v of k%3==1
    new = (old.filter(F.col("k") % 3 != 0)
           .withColumn("v", F.when(F.col("k") % 3 == 1,
                                   F.col("v") + 1).otherwise(F.col("v"))))
    assert snapshot_diff(old, old, "k").count() == 0
    fwd = {r["k"]: (r["status"], tuple(r["changed_cols"]))
           for r in snapshot_diff(old, new, "k").collect()}
    rev = {r["k"]: (r["status"], tuple(r["changed_cols"]))
           for r in snapshot_diff(new, old, "k").collect()}
    assert set(fwd) == set(rev)
    inv = {"added": "removed", "removed": "added", "changed": "changed"}
    for k, (s, cols) in fwd.items():
        assert rev[k] == (inv[s], cols), k


@given(events=st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),
              st.sampled_from(["x", "y", "z"])),
    min_size=2, max_size=30))
@settings(**SETTINGS)
def test_transition_probs_sum_to_one_in_floor_units(spark, events):
    """Per from_type: Σn == n_from, and Σprob_bp lands in
    (10000 - n_pairs, 10000] — the floor-division residue bound."""
    import datetime as dt

    from fsharp_dataframe_spark.functions.events import event_transitions

    rows = [(i, k, t, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i))
            for i, (k, t) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    out = event_transitions(df).collect()
    by_from: dict = {}
    for r in out:
        by_from.setdefault(r["from_type"], []).append(r)
    for f, rs in by_from.items():
        n_from = rs[0]["n_from"]
        assert sum(r["n"] for r in rs) == n_from
        s = sum(r["prob_bp"] for r in rs)
        assert 10000 - len(rs) < s <= 10000, (f, s)


@given(docs=st.lists(
    st.lists(st.sampled_from(["a", "b", "ab"]), min_size=0, max_size=8),
    min_size=1, max_size=12),
    phrase=st.lists(st.sampled_from(["a", "b", "ab"]),
                    min_size=1, max_size=3))
@settings(**SETTINGS)
def test_phrase_search_matches_naive_reference(spark, docs, phrase):
    """phrase_search equals the naive per-document sliding-window count
    on low-alphabet random token streams (repeated tokens, repeated
    phrase terms, phrases longer than documents — all the positional
    join's edge regimes)."""
    from fsharp_dataframe_spark.functions.search import phrase_search

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_hits"] for r in
           phrase_search(df, " ".join(phrase)).collect()}
    exp = {}
    for i, toks in enumerate(docs):
        n = sum(1 for j in range(len(toks) - len(phrase) + 1)
                if toks[j:j + len(phrase)] == phrase)
        if n:
            exp[i] = n
    assert got == exp


@given(texts=st.lists(st.lists(st.sampled_from("abcd"), min_size=0,
                               max_size=40).map(lambda ws: " ".join(ws)),
                      min_size=1, max_size=8),
       k=st.integers(min_value=1, max_value=6),
       seq_len=st.integers(min_value=2, max_value=16))
@settings(**SETTINGS)
def test_training_mix_spans_reconstruct_chunk_stream(spark, texts, k, seq_len):
    """End-to-end law for the training-mix capstone: laying every
    emitted (chunk × sequence) span end-to-end in (seq_id, seq_begin)
    order must reproduce each sampled chunk's tokens exactly once, in
    chunk_uid order — no token lost, duplicated, or reordered by the
    sample/chunk/pack composition."""
    from fsharp_dataframe_spark.functions.sampling import training_mix

    rows = [(i, t, ["en", "fr"][i % 2]) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = training_mix(df, k, seq_len=seq_len, max_tokens=6, overlap=2)
    got = out.collect()

    # independent reference for the span laws: per (doc, chunk), the
    # spans across sequences must tile [0, n_chunk_tokens) contiguously
    from collections import defaultdict

    per_chunk = defaultdict(list)
    for r in got:
        per_chunk[(r["doc_id"], r["chunk_id"])].append(r)
    for key, rows_ in per_chunk.items():
        rows_.sort(key=lambda r: r["seq_id"])
        pos = 0
        for r in rows_:
            assert r["tok_begin"] == pos, (key, rows_)
            pos = r["tok_end"]
        # and consecutive spans sit in consecutive sequences
        sids = [r["seq_id"] for r in rows_]
        assert sids == list(range(sids[0], sids[0] + len(sids)))
    # every sequence except the last is exactly seq_len tokens
    per_seq = defaultdict(int)
    for r in got:
        per_seq[r["seq_id"]] += r["tok_end"] - r["tok_begin"]
    if per_seq:
        last = max(per_seq)
        assert all(v == seq_len for s, v in per_seq.items() if s != last)
        assert 0 < per_seq[last] <= seq_len


@given(vals=st.lists(st.integers(min_value=-50, max_value=50),
                     min_size=1, max_size=25),
       target=st.integers(min_value=-10, max_value=10),
       slack=st.integers(min_value=0, max_value=5),
       h=st.integers(min_value=1, max_value=60))
@settings(**SETTINGS)
def test_cusum_matches_sequential_reference(spark, vals, target, slack, h):
    from fsharp_dataframe_spark.functions.timeseries import (
        cusum_changepoints,
    )

    rows = [("k", i, float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "key string, ts long, value double, eid long")
    got = [(r["s_pos"], r["s_neg"], r["alarm"]) for r in
           cusum_changepoints(df, "key", "ts", "value", float(target),
                              float(slack), float(h), scale=1,
                              tiebreak="eid").orderBy("ts").collect()]
    from fsharp_dataframe_spark.functions.timeseries import (
        _cusum_fold_reference,
    )

    exp = _cusum_fold_reference(vals, target, slack, h)
    assert got == exp


@given(vals=st.lists(st.integers(min_value=0, max_value=9),
                     min_size=1, max_size=20),
       k=st.integers(min_value=1, max_value=7))
@settings(**SETTINGS)
def test_rolling_median_matches_sequential_reference(spark, vals, k):
    import statistics

    from fsharp_dataframe_spark.functions.timeseries import rolling_median

    rows = [("k", i, float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "key string, ts long, value double, eid long")
    got = [r["med"] for r in
           rolling_median(df, "key", "ts", "value", k=k, tiebreak="eid")
           .orderBy("ts").collect()]
    exp = [statistics.median(vals[max(0, i - k + 1):i + 1])
           for i in range(len(vals))]
    assert got == [float(x) for x in exp]


@given(lex=st.lists(st.tuples(st.integers(0, 30), st.integers(0, 5)),
                    min_size=1, max_size=10),
       vec=st.lists(st.tuples(st.integers(0, 30), st.integers(0, 5)),
                    min_size=1, max_size=10),
       k=st.integers(min_value=1, max_value=8))
@settings(**SETTINGS)
def test_hybrid_rrf_matches_python_reference(spark, lex, vec, k):
    from fsharp_dataframe_spark.functions.search import hybrid_rrf

    lex = list({i: s for i, s in lex}.items())  # unique ids per list
    vec = list({i: s for i, s in vec}.items())
    ldf = spark.createDataFrame([(i, float(s)) for i, s in lex],
                                "doc_id long, score double")
    vdf = spark.createDataFrame([(i, float(s)) for i, s in vec],
                                "doc_id long, cosine_sim double")
    got = [(r["doc_id"], r["lex_rank"], r["vec_rank"], r["rrf_micro"])
           for r in hybrid_rrf(ldf, vdf, k=k).collect()]

    def ranks(items):
        o = sorted(items, key=lambda t: (-t[1], t[0]))
        return {i: r + 1 for r, (i, _) in enumerate(o)}

    lr, vr = ranks(lex), ranks(vec)
    fused = {}
    for i in set(lr) | set(vr):
        m = 0
        for r in (lr.get(i), vr.get(i)):
            if r is not None:
                m += round(1e6 / (60 + r))
        fused[i] = (lr.get(i), vr.get(i), m)
    exp = sorted(((i, *v) for i, v in fused.items()),
                 key=lambda t: (-t[3], t[0]))[:k]
    assert got == exp


@given(src_keys=KEYSETS, probe_keys=KEYSETS,
       tol=st.integers(min_value=0, max_value=60),
       direction=st.sampled_from(["backward", "forward"]))
@settings(**SETTINGS)
def test_asof_tolerance_matches_pandas_merge_asof(spark, src_keys,
                                                  probe_keys, tol,
                                                  direction):
    """The tolerance path against the independent model: pandas
    merge_asof(tolerance=) on the same keys must agree row for row in
    both directions (pandas treats tolerance inclusively, like the
    engine's dist <= tol)."""
    from fsharp_dataframe_spark.operators.asof import asof_align_frame

    probe = spark.createDataFrame(
        [(int(k), int(k)) for k in sorted(probe_keys)], "k long, pid long")
    src = spark.createDataFrame(
        [(int(k), float(k)) for k in sorted(src_keys)], "k long, v double")
    got = {r["pid"]: r["v"] for r in
           asof_align_frame(probe, src, ["k"], ["v"], direction,
                            tolerance=tol).collect()}
    model = pd.merge_asof(
        pd.DataFrame({"k": sorted(probe_keys)}),
        pd.DataFrame({"k": sorted(src_keys),
                      "v": [float(k) for k in sorted(src_keys)]}),
        on="k", direction=direction, tolerance=tol)
    for _, row in model.iterrows():
        exp = None if pd.isna(row["v"]) else row["v"]
        assert got[row["k"]] == exp, (row["k"], direction, tol)


@given(docs=st.lists(st.tuples(st.sampled_from("abcde"),
                               st.integers(min_value=1, max_value=30)),
                     min_size=1, max_size=20),
       w0=st.integers(min_value=1, max_value=9),
       total=st.integers(min_value=10, max_value=100000))
@settings(**SETTINGS)
def test_token_budget_matches_python_reference(spark, docs, w0, total):
    """Budget-table laws on arbitrary corpora: integer targets follow
    the exact (total*w)div(Σw) rule, Σ targets <= total (floor-division
    slack only), epochs = target/avail, sample_rate caps at 1."""
    from collections import defaultdict

    from fsharp_dataframe_spark.functions.sampling import token_budget_mix

    rows = [(i, "w " * n, d) for i, (d, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["domain"]: r for r in
           token_budget_mix(df, {"a": float(w0)}, total).collect()}

    avail = defaultdict(int)
    for d, n in docs:
        avail[d] += n
    wmic = {d: (w0 if d == "a" else 1) * 1_000_000 for d in avail}
    den = sum(wmic.values())
    assert set(got) == set(avail)
    tsum = 0
    for d in avail:
        r = got[d]
        assert r["avail_tokens"] == avail[d]
        tgt = (total * wmic[d]) // den
        assert r["target_tokens"] == tgt
        tsum += tgt
        assert r["epochs"] == round(tgt / avail[d], 4)
        assert r["sample_rate"] == round(min(tgt / avail[d], 1.0), 4)
    assert tsum <= total


@given(base=st.lists(st.floats(min_value=-5, max_value=105,
                               allow_nan=False), min_size=1, max_size=40),
       cur=st.lists(st.floats(min_value=-5, max_value=105,
                              allow_nan=False), min_size=1, max_size=40),
       nb=st.integers(min_value=2, max_value=8))
@settings(**SETTINGS)
def test_psi_matches_pure_python_reference(spark, base, cur, nb):
    """population_stability equals a pure-python PSI on arbitrary
    bounded floats (clamped-edge binning, add-one smoothing, 1e-8-unit
    HALF_UP quantization) and is antisymmetric under side swap."""
    import math

    from fsharp_dataframe_spark.functions.drift import population_stability

    lo, hi = 0.0, 100.0
    bdf = spark.createDataFrame([(float(v),) for v in base], "v double")
    cdf = spark.createDataFrame([(float(v),) for v in cur], "v double")
    got = {r["bin"]: (r["n_base"], r["n_cur"], r["psi_term"]) for r in
           population_stability(bdf, cdf, "v", lo, hi, nb).collect()}

    w = (hi - lo) / nb

    def binof(v):
        return min(max(int(math.floor((v - lo) / w)), 0), nb - 1)

    cb = [0] * nb
    cc = [0] * nb
    for v in base:
        cb[binof(v)] += 1
    for v in cur:
        cc[binof(v)] += 1
    tb, tc = sum(cb), sum(cc)
    assert set(got) == set(range(nb))
    for i in range(nb):
        p = (cb[i] + 1) / (tb + nb)
        q = (cc[i] + 1) / (tc + nb)
        x = (p - q) * math.log(p / q) * 1e8
        u = int(math.floor(abs(x) + 0.5)) * (-1 if x < 0 else 1)
        assert got[i] == (cb[i], cc[i], round(u / 1e8, 8)), i
    # symmetry: (q-p)ln(q/p) = (p-q)ln(p/q) — swapping the sides
    # leaves every term unchanged (PSI is a symmetric divergence)
    rev = {r["bin"]: r["psi_term"] for r in
           population_stability(cdf, bdf, "v", lo, hi, nb).collect()}
    for i in range(nb):
        assert abs(rev[i] - got[i][2]) < 2e-8, i


@given(rows=st.lists(st.tuples(
    st.floats(min_value=0, max_value=100, allow_nan=False),
    st.integers(min_value=0, max_value=1)), min_size=2, max_size=60),
    nb=st.integers(min_value=2, max_value=16))
@settings(**SETTINGS)
def test_binned_auc_matches_pairwise_on_arbitrary_data(spark, rows, nb):
    from fsharp_dataframe_spark.functions.drift import binned_auc

    df = spark.createDataFrame([(float(s), int(y)) for s, y in rows],
                               "s double, y int")
    got = binned_auc(df, "s", "y", 0.0, 100.0, nb).first()
    w = 100.0 / nb
    binned = [(min(max(int(s // w), 0), nb - 1), y) for s, y in rows]
    pos = [b for b, y in binned if y == 1]
    neg = [b for b, y in binned if y == 0]
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    if not pos or not neg:
        assert got["auc"] is None
        return
    num = sum(2 * sum(1 for n in neg if n < p)
              + sum(1 for n in neg if n == p) for p in pos)
    assert got["auc"] == round(num / (2 * len(pos) * len(neg)), 6)


@given(toks=st.lists(st.integers(min_value=0, max_value=300),
                     min_size=1, max_size=25),
       l0=st.sampled_from([2, 4, 8, 16]))
@settings(**SETTINGS)
def test_packing_efficiency_laws(spark, toks, l0):
    """Exact ceil counts vs a python reference, and padded_tokens is
    monotone over doubling sequence lengths (ceil(t/2L)*2L >=
    ceil(t/L)*L per document)."""
    from fsharp_dataframe_spark.functions.sampling import packing_efficiency

    df = spark.createDataFrame([(" ".join(["w"] * t),) for t in toks],
                               "text string")
    Ls = [l0, 2 * l0, 4 * l0]
    got = {r["seq_len"]: r for r in packing_efficiency(df, Ls).collect()}
    for L in Ls:
        r = got[L]
        exp_seqs = sum((t + L - 1) // L for t in toks)
        assert r["n_docs"] == len(toks)
        assert r["total_tokens"] == sum(toks)
        assert r["n_seqs"] == exp_seqs
        assert r["padded_tokens"] == exp_seqs * L
        if exp_seqs == 0:  # all-empty corpus: waste of nothing is NULL
            assert r["waste_pct"] is None
    assert got[Ls[0]]["padded_tokens"] <= got[Ls[1]]["padded_tokens"] \
        <= got[Ls[2]]["padded_tokens"]


@given(docs=st.lists(st.tuples(
    st.sampled_from(["s1", "s2", "s3"]),
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=8)),
    min_size=1, max_size=12))
@settings(**SETTINGS)
def test_source_overlap_matches_brute_force(spark, docs):
    """source_overlap equals the brute-force python shingle-set
    computation on arbitrary tiny corpora (n=3 word shingles; docs
    shorter than one shingle contribute NOTHING — the r10 ADVICE fix
    that stopped blank/short docs creating phantom shared shingles)."""
    from fsharp_dataframe_spark.functions.dedup import source_overlap

    rows = [(i, " ".join(toks), src) for i, (src, toks) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): (r["n_shared"], r["jaccard"])
           for r in source_overlap(df).collect()}

    def shingles(toks):
        n = 3
        if len(toks) < n:
            return set()  # no n-grams in a sub-n doc (r10 fix)
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    per_src = {}
    for src, toks in docs:
        per_src.setdefault(src, set()).update(shingles(toks))
    expect = {}
    srcs = sorted(per_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = per_src[a] & per_src[b]
            if inter:
                union = len(per_src[a] | per_src[b])
                expect[(a, b)] = (len(inter),
                                  round(len(inter) / union, 6))
    assert got == expect


@given(vecs=st.lists(st.lists(st.floats(min_value=-50, max_value=50,
                                        allow_nan=False),
                              min_size=3, max_size=3),
                     min_size=1, max_size=15))
@settings(**SETTINGS)
def test_int8_quantize_matches_numpy_reference(spark, vecs):
    """quantize_embeddings_int8 equals a numpy reference (symmetric
    max-abs/127 scale, HALF_UP integer codes, 1e-9-unit error sums)
    on arbitrary small vector sets, including zero-variance dims."""
    from fsharp_dataframe_spark.functions.similarity import (
        quantize_embeddings_int8,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    got = {r["dim"]: r for r in quantize_embeddings_int8(df).collect()}
    for d in range(3):
        xs = [v[d] for v in vecs]
        ma = max(abs(x) for x in xs)
        scale = ma / 127.0
        r = got[d]
        assert r["n"] == len(xs)
        assert r["scale"] == spark_round(scale, 9)
        if scale == 0:
            assert r["mean_abs_err"] is None
            continue
        # every rounding below uses spark_round: floor(x+0.5) is NOT
        # Spark's semantics one ulp below a .5 boundary (the r15 driver
        # gate failure; see test_int8_quantize_halfup_boundary_pin)
        units = 0
        for x in xs:
            q = spark_round(x / scale)
            e = abs(x - q * scale)
            units += int(spark_round(e * 1e9))
        m = (units / len(xs)) / 1e9
        exp = spark_round(m, 8)
        assert r["mean_abs_err"] == exp, d


def test_int8_quantize_halfup_boundary_pin(spark):
    """Deterministic pin of the r15 driver-gate counterexample: an
    element whose |err|*1e9 is 0.49999999999999994 (one ulp below 0.5).
    floor(e*1e9+0.5) says 1 unit (binary x+0.5 rounds up to 1.0);
    Spark's Round (HALF_UP on the shortest decimal repr) says 0.  The
    third element puts the dim total at 14-vs-15 units over n=3 so the
    disagreement survives the 8dp output round: the buggy model
    predicts mean_abs_err=1e-08, the engine (and DuckDB oracle
    semantics) produce 0.0."""
    from fsharp_dataframe_spark.functions.similarity import (
        quantize_embeddings_int8,
    )

    xb = float.fromhex("0x1.12e0be826d694p-31")  # 4.999999999999999e-10
    vals = [1.0, xb, 1.42e-8]
    df = spark.createDataFrame(
        [(i, [v, 0.0]) for i, v in enumerate(vals)],
        "vec_id long, embedding array<double>")
    got = {r["dim"]: r for r in quantize_embeddings_int8(df).collect()}
    assert got[0]["n"] == 3
    assert got[0]["scale"] == spark_round(1.0 / 127.0, 9)
    assert got[0]["mean_abs_err"] == 0.0   # floor(+0.5) model says 1e-08
    assert got[1]["mean_abs_err"] is None  # zero-variance dim


@given(rows=st.lists(st.tuples(
    st.integers(min_value=0, max_value=2),   # label
    st.booleans(),                           # side
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False),
             min_size=2, max_size=2)),
    min_size=2, max_size=20))
@settings(**SETTINGS)
def test_centroid_drift_matches_numpy_reference(spark, rows):
    import math

    from fsharp_dataframe_spark.functions.drift import centroid_drift

    base = [(i, v, lab) for i, (lab, s, v) in enumerate(rows) if s]
    cur = [(i, v, lab) for i, (lab, s, v) in enumerate(rows) if not s]
    schema = "vec_id long, embedding array<double>, label int"
    got = {r["label"]: r for r in centroid_drift(
        spark.createDataFrame(base or [(0, [0.0, 0.0], 99)], schema),
        spark.createDataFrame(cur or [(0, [0.0, 0.0], 98)], schema))
        .collect()}

    def centroid_units(side, lab, d):
        xs = [int(math.floor(abs(v[d]) * 1e7 + 0.5))
              * (1 if v[d] >= 0 else -1) for _, v, l in side if l == lab]
        return (sum(xs), len(xs)) if xs else None

    labs = ({l for _, _, l in base} & {l for _, _, l in cur})
    assert set(got) == labs
    for lab in labs:
        su = 0
        for d in range(2):
            sb, nb = centroid_units(base, lab, d)
            sc, nc = centroid_units(cur, lab, d)
            diff = (sb / nb) / 1e7 - (sc / nc) / 1e7
            su += int(math.floor(abs(diff * diff) * 1e12 + 0.5))
        exp = round(math.sqrt(su / 1e12), 6)
        assert got[lab]["l2_drift"] == exp, lab


@given(sketches=st.lists(
    st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    min_size=1, max_size=12),
    max_hamming=st.integers(min_value=1, max_value=4))
@settings(**SETTINGS)
def test_banded_hamming_pairs_complete_and_exact(spark, sketches,
                                                 max_hamming):
    """banded_hamming_pairs equals the brute-force all-pairs popcount
    filter on arbitrary 64-bit sketches INCLUDING sign-bit-set
    (negative long) values — pigeonhole completeness means no pair
    within the bound may ever be missed, and arithmetic shiftright's
    sign-extension must be fully masked out of the piece keys."""
    from fsharp_dataframe_spark.functions.dedup import banded_hamming_pairs

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sketches)], "id long, sh long")
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           banded_hamming_pairs(df, id_col="id", sketch_col="sh",
                                max_hamming=max_hamming).collect()}
    expect = {}
    for i, a in enumerate(sketches):
        for j in range(i + 1, len(sketches)):
            h = bin((a ^ sketches[j]) & ((1 << 64) - 1)).count("1")
            if h <= max_hamming:
                expect[(i, j)] = h
    assert got == expect


@given(docs=st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
             min_size=0, max_size=6),
    min_size=1, max_size=8))
@settings(**SETTINGS)
def test_ngram_repetition_share_matches_brute_force(spark, docs):
    """ngram_repetition_share equals the brute-force python shingle-df
    computation on arbitrary tiny corpora (sub-n docs report NULL)."""
    from fsharp_dataframe_spark.functions.quality import (
        ngram_repetition_share,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_shingles"], r["n_common"],
                         r["repeated_share"])
           for r in ngram_repetition_share(df).collect()}

    def shingles(toks):
        if len(toks) < 3:
            return set()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    per_doc = {i: shingles(toks) for i, toks in enumerate(docs)}
    dfreq = {}
    for sset in per_doc.values():
        for sh in sset:
            dfreq[sh] = dfreq.get(sh, 0) + 1
    expect = {}
    for i, sset in per_doc.items():
        if not sset:
            expect[i] = (0, 0, None)
            continue
        common = sum(1 for sh in sset if dfreq[sh] >= 2)
        expect[i] = (len(sset), common,
                     (common * 10000 // len(sset)) / 10000.0)
    assert got == expect


def test_audio_fingerprint_amplitude_invariance():
    """The spectral-band fingerprint compares RATIOS of band energies
    (bit = e_b > e_{b+1}), so uniform gain must not change it — the
    property that makes it a perceptual hash (a re-encoded clip at a
    different volume is the same audio).  Pinned over random PCM:
    scaling float samples by any positive constant preserves the
    fingerprint bit for bit; negation (phase flip) preserves it too
    (energies are magnitudes)."""
    import numpy as np

    from fsharp_dataframe_spark.functions.multimodal import (
        _afp_from_samples,
    )

    rng = np.random.default_rng(11)
    for _ in range(50):
        s = rng.normal(0.0, 1000.0, size=2048)
        base = _afp_from_samples(s)
        for g in (0.25, 3.0, 17.5):
            assert _afp_from_samples(s * g) == base
        assert _afp_from_samples(-s) == base
    # sub-frame clips stay None under any gain
    short = rng.normal(0.0, 1000.0, size=500)
    assert _afp_from_samples(short) is None
    assert _afp_from_samples(short * 4.0) is None


def test_fsv_container_roundtrip_property():
    """pack_frames/unpack_frame round-trip over random frame lists
    (including empty frames and high-byte payloads), and every
    corruption class degrades to None instead of raising: truncation
    at any prefix length, magic damage, out-of-range index."""
    import random

    from fsharp_dataframe_spark.functions.multimodal import (
        pack_frames, unpack_frame,
    )

    rng = random.Random(13)
    for _ in range(40):
        frames = [bytes(rng.randrange(256) for _ in
                        range(rng.randrange(0, 40)))
                  for _ in range(rng.randrange(1, 9))]
        p = pack_frames(frames)
        assert [unpack_frame(p, i) for i in range(len(frames))] == frames
        assert unpack_frame(p, len(frames)) is None
        assert unpack_frame(p, -1) is None
        # truncation degrades to None exactly when frame 0's bytes
        # no longer fit, and never raises at ANY cut point
        end0 = 8 + 4 * len(frames) + len(frames[0])
        for cut in range(0, len(p), max(1, len(p) // 7)):
            got = unpack_frame(p[:cut], 0)
            assert got == (frames[0] if cut >= end0 else None)
        assert unpack_frame(b"XXXX" + p[4:], 0) is None
