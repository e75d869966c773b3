"""Scale smoke for the bucketed global-series substrate (VERDICT r5
ask #6): synthesize millions of rows IN-SESSION, run the substrate ops
with auto-sized buckets, and pin the property the sf0.1 bench cannot
see — that no single Arrow group / task holds more than ~a bucket's
worth of rows, i.e. the local[32] stand-in for the 100x claim.

The auto-sizing target is shrunk (monkeypatch) so the row counts that
fit a CI box exercise the ABOVE-FLOOR sizing path: buckets derived
from the row estimate, bucket population bounded by ~2x target (range
cuts are quantile-approximate, never exact), results equal to the
plain/sequential reference.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

import fsharp_dataframe_spark.operators.bucketed as B
from fsharp_dataframe_spark.series import Series

pytestmark = pytest.mark.slow


def test_scale_smoke_positions_and_fill_20m(spark, monkeypatch):
    # 20M rows, auto target shrunk to 500k -> 40 raw buckets (floor
    # lifts to 64); assert exact global positions at the edges and a
    # bounded per-bucket population via the census itself
    monkeypatch.setattr(B, "_AUTO_TARGET_ROWS", 250_000)
    n = 20_000_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 97 == 0, None)
         .otherwise((F.col("id") % 1000).cast("double")).alias("v"))

    nb = B.auto_n_buckets(df, None)
    assert nb == 80  # ceil(20M / 250k) — above the 64 floor

    out, total = B.with_global_positions(df, ["k"], n_buckets=None)
    assert total == n
    # spot-check exact positions without materializing 20M rows
    edge = {r["k"]: r["__gpos"] for r in
            out.filter(F.col("k").isin(0, 1, n // 2, n - 1)).collect()}
    assert edge == {0: 0, 1: 1, n // 2: n // 2, n - 1: n - 1}

    # the task-size bound: every census bucket holds <= ~2x the target
    cuts = B.range_cuts(df, "k", None)
    assert len(cuts) >= 64
    sizes = [r["n"] for r in
             df.select(B._bucket_expr(F.col("k"), cuts).alias("b"))
               .groupBy("b").agg(F.count("*").alias("n")).collect()]
    assert max(sizes) <= 2 * 250_000, max(sizes)

    # directional fill over the same relation completes and fills every
    # interior NULL (first row k=0 is NULL-seeded by 0 % 97 == 0)
    filled = B.bucketed_directional_fill(df, ["k"], "v", n_buckets=None)
    assert filled.filter(F.col("v").isNull()).count() == 1  # k=0 only


def test_scale_smoke_ewma_5m_matches_pandas(spark, monkeypatch):
    monkeypatch.setattr(B, "_AUTO_TARGET_ROWS", 250_000)
    n = 5_000_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        ((F.col("id") * 2654435761 % 1000) / 7.0).alias("v"))
    s = Series(df, key="k", value="v", ordered=True)
    out = s.ewma(0.25)  # auto-sized: 20 raw -> floor 64 applies? no: 5M/250k=20 -> floor 64
    head = out.df.filter(F.col("k") < 1000).orderBy("k").toPandas()
    tail = out.df.filter(F.col("k") >= n - 3).orderBy("k").toPandas()
    pdf = df.orderBy("k").toPandas()
    ref = pdf["v"].ewm(alpha=0.25, adjust=False).mean()
    assert np.allclose(head["v"].to_numpy(), ref.iloc[:1000].to_numpy(),
                       rtol=1e-9)
    assert np.allclose(tail["v"].to_numpy(), ref.iloc[-3:].to_numpy(),
                       rtol=1e-9)


def test_scale_smoke_chunk_dist_2m(spark, monkeypatch):
    monkeypatch.setattr(B, "_AUTO_TARGET_ROWS", 250_000)
    n = 2_000_000
    df = spark.range(n).select(F.col("id").alias("k"),
                               F.lit(1.0).alias("v"))
    s = Series(df, key="k", value="v", ordered=True)
    out = s.chunk_dist_into(
        1000, lambda seg: float(seg["v"].sum()), out_type="double").df
    rows = out.orderBy("k").collect()
    # chunks are exact [i*1000, (i+1)*1000) blocks of ones
    assert len(rows) == n // 1000
    assert all(r["v"] == 1000.0 for r in rows[:10] + rows[-10:])


def test_scale_smoke_window_while_bounded_200k(spark, monkeypatch):
    monkeypatch.setattr(B, "_AUTO_TARGET_ROWS", 25_000)
    n = 200_000
    df = spark.range(n).select(F.col("id").alias("k"),
                               F.lit(1.0).alias("v"))
    s = Series(df, key="k", value="v", ordered=True)
    out = s.window_while_into(lambda f, t: t - f < 5,
                              lambda seg: float(seg["v"].sum()),
                              max_rows=8, out_type="double").df
    rows = out.orderBy("k").collect()
    assert len(rows) == n
    # interior windows span exactly 5 rows of ones; the tail shrinks
    assert all(r["v"] == 5.0 for r in rows[:10])
    assert [r["v"] for r in rows[-4:]] == [4.0, 3.0, 2.0, 1.0]


def test_scale_smoke_snapshot_diff_5m(spark):
    """The round-7 full-outer diff primitive at millions of rows: two
    5M-row synthetic versions with closed-form perturbations — the
    change census must be exact and the output change-sized (never
    materializing the unchanged majority)."""
    from fsharp_dataframe_spark.functions.diff import snapshot_diff

    n = 5_000_000
    old = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
        (F.col("id") % 7).cast("string").alias("s"))
    # v2: drop k%101==0, bump v of k%103==1, append n..n+999
    new = (old.filter(F.col("k") % 101 != 0)
           .withColumn("v", F.when(F.col("k") % 103 == 1,
                                   F.col("v") + 0.5)
                       .otherwise(F.col("v"))))
    added = spark.range(n, n + 1000).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v"),
        F.lit("x").alias("s"))
    new = new.unionByName(added)

    d = snapshot_diff(old, new, "k")
    counts = {r["status"]: r["n"] for r in
              d.groupBy("status").agg(F.count("*").alias("n")).collect()}
    n_removed = sum(1 for k in range(0, n, 101))
    # changed = k%103==1 minus those also removed (k%101==0)
    n_changed = sum(1 for k in range(1, n, 103) if k % 101 != 0)
    assert counts == {"removed": n_removed, "changed": n_changed,
                      "added": 1000}
    # change-sized: the diff's row count is ~1.5% of the corpus
    assert sum(counts.values()) < 0.02 * n


def test_scale_smoke_twap_10m_closed_form(spark):
    """TWAP at 10M rows with a closed-form expectation: 100 keys x
    ~100k observations each, one observation per key per 36-second
    slot over ~41 days, value = slot % 2 scaled — every observation
    holds exactly 36 s except each day's last (which extends to
    midnight), so the analytic average is computable per (key, day)
    and the whole job must agree while keeping the one-exchange
    keyed-window shape."""
    from fsharp_dataframe_spark.functions.timeseries import twap

    n = 10_000_000
    df = spark.range(n).select(
        (F.col("id") % 100).alias("k"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("id") / 100).cast("long") * 36
        ).alias("t"),
        ((F.col("id") / 100).cast("long") % 2).cast("double").alias("v"))
    out = twap(df, "k", "t", "v", unit="day", tiebreak="k")
    rows = out.filter(F.col("k") == 7).orderBy("bucket").collect()
    # 2400 slots/day alternating 0/1, all 36 s (incl. the last, which
    # abuts midnight exactly) -> every FULL day's TWAP is exactly 0.5
    full_days = [r for r in rows[:-1]]
    assert len(full_days) >= 40
    assert all(r["twap"] == 0.5 for r in full_days), \
        [r["twap"] for r in full_days[:3]]
    assert all(r["n"] == 2400 for r in full_days)
    # plan shape survives scale: exactly one hash exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_scale_smoke_gap_report_10m(spark):
    """gap_report at 10M rows: per-key regular 36 s spacing with every
    1000th slot's observation removed — each removal creates exactly
    one 72 s gap; the report must count them exactly, via one keyed
    window."""
    from fsharp_dataframe_spark.functions.timeseries import gap_report

    n = 10_000_000
    base = spark.range(n).select(
        (F.col("id") % 100).alias("k"),
        (F.col("id") / 100).cast("long").alias("slot"))
    kept = base.filter(F.col("slot") % 1000 != 500)
    df = kept.select(
        "k",
        F.timestamp_seconds(F.lit(1704067200)
                            + F.col("slot") * 36).alias("t"))
    g = gap_report(df, "k", "t", min_gap_s=36)   # strict >36 -> only 72s
    agg = g.agg(F.count("*").alias("n"),
                F.min("gap_s").alias("lo"),
                F.max("gap_s").alias("hi")).first()
    slots = n // 100
    holes_per_key = sum(1 for s in range(slots) if s % 1000 == 500)
    assert agg["n"] == 100 * holes_per_key
    assert agg["lo"] == agg["hi"] == 72


def test_scale_smoke_approx_quantiles_10m(spark):
    """The `exact=False` percentile tier at 10M rows / 5 hot groups
    (r7 VERDICT ask #4).  The exact path's aggregation state is a
    per-group value->count buffer — 2M entries per group here, and at
    100 TB a hot group's entire value set in one reducer's memory,
    the scale-killer the flag exists to escape.  Pins:
    (a) rank-bounded equivalence to the exact path — Greenwald-Khanna
        guarantees rank error <= n/accuracy; the values are uniform on
        [0, 1M) so value error ~ range/accuracy = 100, asserted at a
        10x margin;
    (b) the plan runs approx_percentile in partial/merge mode — the
        aggregate carries the bounded MERGEABLE sketch, not the exact
        percentile's unbounded buffer (boundedness itself is not
        plan-visible; the function name is the pin, so the test
        asserts partial_approx_percentile is present and no exact
        partial_percentile state appears anywhere)."""
    from fsharp_dataframe_spark.functions.stats import grouped_quantiles

    n = 10_000_000
    # Weyl-style mixing: (id * 2654435761) mod 1000003 is an (almost)
    # uniform, deterministic value stream with no id/group correlation
    df = spark.range(n).select(
        (F.col("id") % 5).alias("g"),
        ((F.col("id") * 2654435761) % 1000003).cast("double").alias("v"))

    approx = grouped_quantiles(df, "g", F.col("v"),
                               qs=[0.5, 0.9, 0.99], exact=False)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "partial_approx_percentile" in plan, plan
    assert "partial_percentile(" not in plan, plan

    got = {r["g"]: r for r in approx.collect()}
    exact = {r["g"]: r for r in
             grouped_quantiles(df, "g", F.col("v"),
                               qs=[0.5, 0.9, 0.99], exact=True).collect()}
    assert set(got) == set(exact) == set(range(5))
    for g in range(5):
        assert got[g]["n"] == exact[g]["n"] == n // 5
        for c in ("q50", "q90", "q99"):
            assert abs(got[g][c] - exact[g][c]) <= 1000.0, (g, c, got[g][c], exact[g][c])


def test_scale_smoke_cusum_10m_closed_form(spark):
    """CUSUM at 10M rows / 100 keys: a square-wave value stream (80
    slots at target, then 20 slots at target+10) makes every
    statistic closed-form — S+ ramps 0,10,...,200 inside each burst
    and resets to 0 one slot after it (slack 5 drains 5/slot at
    target... chosen so the reset is immediate: at target the
    increment is -slack).  Pins exact fold values at scale and the
    one-exchange keyed plan."""
    from fsharp_dataframe_spark.functions.timeseries import (
        cusum_changepoints,
    )

    n = 10_000_000
    df = spark.range(n).select(
        (F.col("id") % 100).alias("k"),
        (F.col("id") / 100).cast("long").alias("slot"))
    df = df.select(
        "k", "slot",
        F.timestamp_seconds(F.lit(1704067200) + F.col("slot") * 60)
        .alias("ts"),
        F.when(F.col("slot") % 100 >= 80, 20.0).otherwise(10.0)
        .alias("v"))
    out = cusum_changepoints(df, "k", "ts", "v", target=10.0, slack=5.0,
                             threshold=30.0, scale=1, tiebreak="slot")
    # burst slots: S+ = 5, 10, ..., 100 within each 20-slot burst
    # (x - t - k = +5/slot); at-target slots drain 5/slot
    got = (out.filter(F.col("alarm"))
           .agg(F.count("*").alias("n_alarms"),
                F.min("s_pos").alias("lo"), F.max("s_pos").alias("hi"))
           .first())
    slots = n // 100
    bursts = slots // 100
    # alarm while S+ > 30: the last 14 burst slots (S+ 35..100) plus 13
    # post-burst drain slots (S+ 95,90,...,35 at -5/slot) — except the
    # final burst, whose drain tail falls past the end of the series
    per_burst = 14 + 13
    assert got["n_alarms"] == 100 * (bursts * per_burst - 13)
    assert got["lo"] == 35 and got["hi"] == 100
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    # r9 window rewrite: the recurrence decomposes (prefix sum minus
    # running min), so no per-key Arrow fold may appear in the plan
    assert "FlatMapGroupsInPandas" not in plan


def test_scale_smoke_cusum_hot_key_skew(spark):
    """CUSUM with a planted hot key (one key owns 80% of 2M rows):
    the window closed-form streams each key through a running frame,
    so a pathological key is a big sorted partition, not a
    materialized Arrow group.  Pins closed-form values on the hot key
    and the fold-free single-exchange plan."""
    from fsharp_dataframe_spark.functions.timeseries import (
        cusum_changepoints,
    )

    n = 2_000_000
    hot = int(n * 0.8)
    df = spark.range(n).select(
        F.when(F.col("id") < hot, F.lit("hot"))
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 64).cast("string")))
        .alias("k"),
        F.col("id").alias("slot"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
        F.lit(11.0).alias("v"))  # constant drift: +1/slot above target
    out = cusum_changepoints(df, "k", "ts", "v", target=10.0, slack=0.0,
                             threshold=float(hot), scale=1,
                             tiebreak="slot")
    top = (out.filter(F.col("k") == "hot")
           .agg(F.max("s_pos").alias("mx"), F.count("*").alias("n"),
                F.sum(F.col("alarm").cast("long")).alias("alarms"))
           .first())
    # S+ on the hot key ramps 1..hot; threshold == hot so no alarm
    assert top["n"] == hot and top["mx"] == hot and top["alarms"] == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_scale_smoke_rolling_median_10m(spark):
    """Rolling median at 10M rows / 100 keys, k=5: values cycle
    0,1,2,3,4 so every full window's sorted middle is exactly 2 —
    pins the k-bounded window at scale and the single keyed
    exchange."""
    from fsharp_dataframe_spark.functions.timeseries import rolling_median

    n = 10_000_000
    df = spark.range(n).select(
        (F.col("id") % 100).alias("k"),
        (F.col("id") / 100).cast("long").alias("slot"))
    df = df.select("k", "slot", (F.col("slot") % 5).cast("double").alias("v"))
    out = rolling_median(df, "k", "slot", "v", k=5)
    agg = (out.filter(F.col("slot") >= 4)
           .agg(F.count("*").alias("n"),
                F.min("med").alias("lo"), F.max("med").alias("hi"))
           .first())
    assert agg["n"] == n - 4 * 100
    assert agg["lo"] == agg["hi"] == 2.0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_scale_smoke_training_mix_10m_composition(spark):
    """The training_mix capstone run END-TO-END at 10M docs (r8 VERDICT
    ask #4: stages were individually smoked, the composition was not).
    A constant-text corpus makes every output property closed-form:
    40 tokens/doc, max_tokens=16 overlap=4 -> exactly 3 full 16-token
    chunks/doc; seq_len=64 = 4 chunks -> every chunk lands in exactly
    one sequence.  Plan pins: the k-row persisted stage boundary
    (InMemoryTableScan) holds, the audit allowance stays at the
    inherited lang_mix one-row shapes, and the ONLY hash exchanges in
    the whole composed plan ride bounded keys — `lang` (vocabulary)
    and `__wb` (quantile buckets) — never the corpus doc ids."""
    import re

    from fsharp_dataframe_spark.functions.sampling import training_mix
    from fsharp_dataframe_spark.functions.util import release_cached
    from fsharp_dataframe_spark.plan_audit import audit

    n, k = 10_000_000, 400
    text = " ".join(["w"] * 40)
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, "hi").otherwise("lo").alias("lang"),
        F.lit(text).alias("text"))
    out = training_mix(df, k, alpha=0.5, max_tokens=16, overlap=4,
                       seq_len=64)
    try:
        agg = out.agg(
            F.count("*").alias("spans"),
            F.countDistinct("doc_id").alias("docs"),
            F.countDistinct("seq_id").alias("seqs"),
            F.min(F.col("tok_end") - F.col("tok_begin")).alias("lo"),
            F.max(F.col("tok_end") - F.col("tok_begin")).alias("hi"),
            F.countDistinct("seq_begin").alias("begins")).first()
        # 400 docs x 3 chunks, one span each; 1200*16/64 = 300 sequences
        assert agg["spans"] == k * 3 and agg["docs"] == k
        assert agg["seqs"] == k * 3 * 16 // 64
        assert agg["lo"] == agg["hi"] == 16  # never a straddle
        assert agg["begins"] == 4  # {0, 16, 32, 48}
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the k-row sample is persisted once and re-read twice
        assert "InMemoryTableScan" in plan
        # inherited lang_mix allowance only — nothing else may smell
        assert audit(out, allow=("cartesian", "single_partition")) == []
        # no unbounded-key corpus shuffle: every hash exchange is on a
        # bounded key (language vocabulary / quantile bucket id)
        keys = set()
        for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
            for part in m.group(1).split(","):
                part = part.strip()
                if part and not part.isdigit():
                    keys.add(re.sub(r"#\d+L?", "", part))
        assert keys <= {"lang", "__wb"}, keys
    finally:
        release_cached()


def test_scale_smoke_asof_composite_bucketed_10m(spark):
    """Composite-key bucketed as-of at 10M probe rows (r9): leading
    key carries heavy ties (1M distinct dates x 10 tiebreak values),
    closed-form expectation, and the fill window stays hash-partitioned
    by bucket — no data-sized single-partition exchange."""
    from fsharp_dataframe_spark.operators.asof import _union_fill

    n = 10_000_000
    # source: one row per (k1 = i, k2 = 5), value = k1
    src = spark.range(0, n, 10).select(
        (F.col("id") / 10).cast("long").alias("k1"),
        F.lit(5).cast("long").alias("k2"),
        (F.col("id") / 10).cast("double").alias("v"))
    # probes: (k1 = i//10, k2 = i%10) — k2 < 5 matches k1-1's source
    # row (composite order), k2 >= 5 matches k1's own
    prb = spark.range(n).select(
        (F.col("id") / 10).cast("long").alias("k1"),
        (F.col("id") % 10).alias("k2"))
    out = _union_fill(prb, src, ["k1", "k2"], ["v"], [], "backward",
                      [], bucketed=True, n_buckets=64)
    expect = F.when(F.col("k2") >= 5, F.col("k1").cast("double")) \
        .otherwise((F.col("k1") - 1).cast("double"))
    bad = out.filter(
        ~(F.col("v").eqNullSafe(expect))
        # the k1=0, k2<5 probes precede every source row -> NULL
        & ~((F.col("k1") == 0) & (F.col("k2") < 5)
            & F.col("v").isNull())).count()
    assert bad == 0
    assert out.count() == n
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(__asof_bucket" in plan
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition(__asof_bucket#" in line:
            assert "], [__asof_bucket" in line, line
    # r10 (VERDICT r9 ask #7): every exchange rides a bounded key and
    # the n_buckets-row carry cascade joins back as a BROADCAST — a
    # SortMergeJoin would re-shuffle the 10M probe stream against a
    # 64-row relation
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Exchange" in line and "hashpartitioning" in line:
            assert "__asof_bucket" in line or "rangepartitioning" in line, line
