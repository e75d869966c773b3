"""Round-9 operator pins: hot-key guards on the remaining per-key
Arrow folds (r8 VERDICT ask #6) and round-9 additions."""

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.series import Series


# --- hot-key guard on per-key Arrow folds --------------------------------


def _hot_df(spark, n_hot=100):
    rows = [("hot", i, float(i)) for i in range(n_hot)] + \
        [("cold", 0, 1.0)]
    return spark.createDataFrame(rows, "by string, k long, v double")


def test_guard_arrow_group_trips_on_planted_hot_key_while(spark, monkeypatch):
    import fsharp_dataframe_spark.functions.util as U
    from pyspark.errors.exceptions.captured import PythonException

    monkeypatch.setattr(U, "MAX_ARROW_GROUP_ROWS", 50)
    s = Series(_hot_df(spark), key=["by", "k"], value="v", ordered=True)
    out = s.chunk_while_into(lambda a, b: b - a < 5,
                             lambda seg: float(seg["v"].sum()), by=["by"])
    with pytest.raises(PythonException, match="max_group_rows"):
        out.df.collect()


def test_guard_arrow_group_trips_on_planted_hot_key_ewma(spark, monkeypatch):
    import fsharp_dataframe_spark.functions.util as U
    from pyspark.errors.exceptions.captured import PythonException

    monkeypatch.setattr(U, "MAX_ARROW_GROUP_ROWS", 50)
    s = Series(_hot_df(spark), key=["by", "k"], value="v", ordered=True)
    with pytest.raises(PythonException, match="max_group_rows"):
        s.ewma(0.5, by=["by"]).df.collect()


def test_guard_arrow_group_passes_under_bound_and_apply_in_pandas(spark):
    import pandas as pd
    from pyspark.errors.exceptions.captured import PythonException

    s = Series(_hot_df(spark), key=["by", "k"], value="v", ordered=True)
    # under the default bound everything works unchanged
    got = {r["by"] for r in
           s.chunk_while_into(lambda a, b: b - a < 1000,
                              lambda seg: float(seg["v"].sum()),
                              by=["by"]).df.collect()}
    assert got == {"hot", "cold"}

    # user whole-group lambda path: explicit per-call bound
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.groupby("by", as_index=False).agg(n=("v", "size"))

    gb = s.group_by_level([0])
    ok = gb.apply_in_pandas(fn, "by string, n long").collect()
    assert {(r["by"], r["n"]) for r in ok} == {("hot", 100), ("cold", 1)}
    with pytest.raises(PythonException, match="max_group_rows"):
        gb.apply_in_pandas(fn, "by string, n long",
                           max_group_rows=50).collect()


# --- drift / eval tier (round 9) ------------------------------------------


def test_population_stability_hand_computed(spark):
    import math

    from fsharp_dataframe_spark.functions.drift import population_stability

    base = spark.createDataFrame([(float(v),) for v in
                                  [1, 1, 1, 5, 5, 9]], "v double")
    cur = spark.createDataFrame([(float(v),) for v in
                                 [1, 5, 5, 5, 9, 9]], "v double")
    out = population_stability(base, cur, "v", lo=0.0, hi=12.0, n_bins=3)
    rows = {r["bin"]: r for r in out.collect()}
    assert {r["bin"] for r in rows.values()} == {0, 1, 2}
    assert (rows[0]["n_base"], rows[0]["n_cur"]) == (3, 1)
    assert (rows[1]["n_base"], rows[1]["n_cur"]) == (2, 3)
    assert (rows[2]["n_base"], rows[2]["n_cur"]) == (1, 2)

    def term(nb, nc):
        p, q = (nb + 1) / 9.0, (nc + 1) / 9.0
        x = (p - q) * math.log(p / q)
        u = int(math.floor(abs(x) * 1e8 + 0.5)) * (-1 if x < 0 else 1)
        return round(u / 1e8, 8)

    for b, (nb, nc) in {0: (3, 1), 1: (2, 3), 2: (1, 2)}.items():
        assert rows[b]["psi_term"] == term(nb, nc), b
    # identical distributions -> every term 0
    same = population_stability(base, base, "v", 0.0, 12.0, 3)
    assert all(r["psi_term"] == 0.0 for r in same.collect())


def test_binned_auc_matches_pairwise_reference(spark):
    """Binned AUC equals the O(n^2) Mann-Whitney reference computed on
    the binned scores (ties count half) — random data, several bin
    widths, including a perfect separator (auc=1) and a constant
    scorer (auc=0.5)."""
    import random

    from fsharp_dataframe_spark.functions.drift import binned_auc

    rng = random.Random(99)
    data = [(rng.uniform(0, 100) + (20 if rng.random() < 0.5 else 0),)
            for _ in range(300)]
    rows = [(s, 1 if s > 60 or rng.random() < 0.3 else 0) for (s,) in data]
    df = spark.createDataFrame(rows, "s double, y int")
    for nb in (8, 64):
        got = binned_auc(df, "s", "y", lo=0.0, hi=120.0, n_bins=nb).first()
        w = 120.0 / nb
        binned = [(min(max(int((s - 0.0) // w), 0), nb - 1), y)
                  for s, y in rows]
        pos = [b for b, y in binned if y == 1]
        neg = [b for b, y in binned if y == 0]
        num = sum(2 * sum(1 for n in neg if n < p)
                  + sum(1 for n in neg if n == p) for p in pos)
        ref = round(num / (2 * len(pos) * len(neg)), 6)
        assert got["auc"] == ref and got["n_pos"] == len(pos), nb
    # perfect separator / constant scorer
    perf = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (90.0, 1), (95.0, 1)], "s double, y int")
    assert binned_auc(perf, "s", "y", 0.0, 100.0, 10).first()["auc"] == 1.0
    const = spark.createDataFrame(
        [(5.0, 0), (5.0, 1), (5.0, 0), (5.0, 1)], "s double, y int")
    assert binned_auc(const, "s", "y", 0.0, 100.0, 10).first()["auc"] == 0.5


def test_zipf_fit_recovers_planted_slope(spark):
    """A corpus built token-by-token with freq(rank) = C / rank (an
    exact Zipf law) must fit slope ~= -1 with r2 ~= 1."""
    from fsharp_dataframe_spark.functions.drift import zipf_fit

    words = []
    for r in range(1, 41):
        words += [f"w{r:02d}"] * max(2400 // r, 1)
    docs = [(i, " ".join(words[i::10])) for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = zipf_fit(df, k=40).first()
    assert got["n_terms"] == 40
    assert abs(got["slope"] + 1.0) < 0.02, got["slope"]
    assert got["r2"] > 0.999


def test_quantize_embeddings_int8_hand_computed(spark):
    from fsharp_dataframe_spark.functions.similarity import (
        quantize_embeddings_int8,
    )

    # dim 0: values ±127-scale-exact (zero error); dim 1: constant 0
    # (zero scale -> NULL error); dim 2: known residue
    df = spark.createDataFrame(
        [(1, [127.0, 0.0, 1.0]), (2, [-254.0, 0.0, 2.54])],
        "vec_id long, embedding array<double>")
    rows = {r["dim"]: r for r in quantize_embeddings_int8(df).collect()}
    assert rows[0]["scale"] == 2.0  # 254/127
    # 127/2 = 63.5 -> q=64 (HALF_UP) -> err |127-128| = 1; -254 exact
    assert rows[0]["mean_abs_err"] == 0.5
    assert rows[1]["scale"] == 0.0 and rows[1]["mean_abs_err"] is None
    s2 = 2.54 / 127.0
    q1 = round(1.0 / s2 + 0.5 - 1e-12)  # 50.0 exactly
    import math
    e1 = abs(1.0 - math.floor(abs(1.0 / s2) + 0.5) * s2)
    u1 = math.floor(e1 * 1e9 + 0.5)
    exp = round(((u1 + 0) / 2) / 1e9, 8)  # second element exact (127*s2)
    assert rows[2]["mean_abs_err"] == exp


def test_source_overlap_hand_computed(spark):
    from fsharp_dataframe_spark.functions.dedup import source_overlap

    df = spark.createDataFrame([
        (1, "a b c d", "s1"),       # shingles: "a b c", "b c d"
        (2, "a b c x", "s2"),       # shares "a b c" with s1
        (3, "q r s t", "s3"),       # shares nothing
    ], "doc_id long, text string, source string")
    rows = {(r["source_a"], r["source_b"]): r for r in
            source_overlap(df).collect()}
    assert set(rows) == {("s1", "s2")}
    r = rows[("s1", "s2")]
    # s1 has {a b c, b c d}, s2 has {a b c, b c x}: 1 shared, union 3
    assert r["n_shared"] == 1
    assert r["jaccard"] == round(1 / 3, 6)


def test_packing_efficiency_hand_computed(spark):
    from fsharp_dataframe_spark.functions.sampling import packing_efficiency

    # token counts: 3, 5, 0 (empty doc -> 0 sequences at every L)
    df = spark.createDataFrame(
        [("x y z",), ("a b c d e",), ("",)], "text string")
    rows = {r["seq_len"]: r for r in
            packing_efficiency(df, [4, 8]).collect()}
    r4 = rows[4]
    assert (r4["n_docs"], r4["total_tokens"]) == (3, 8)
    assert r4["n_seqs"] == 1 + 2 + 0 and r4["padded_tokens"] == 12
    assert r4["waste_pct"] == round(4 / 12, 6)
    r8 = rows[8]
    assert r8["n_seqs"] == 2 and r8["padded_tokens"] == 16
    assert r8["waste_pct"] == 0.5


def test_centroid_drift_hand_computed(spark):
    from fsharp_dataframe_spark.functions.drift import centroid_drift

    base = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [3.0, 0.0], 0), (3, [5.0, 5.0], 1)],
        "vec_id long, embedding array<double>, label int")
    cur = spark.createDataFrame(
        [(4, [2.0, 4.0], 0), (5, [9.0, 9.0], 2)],
        "vec_id long, embedding array<double>, label int")
    rows = {r["label"]: r for r in centroid_drift(base, cur).collect()}
    # label 0: base centroid (2, 0), cur (2, 4) -> drift 4; labels 1/2
    # appear on only one side -> omitted
    assert set(rows) == {0}
    r = rows[0]
    assert (r["n_base"], r["n_cur"]) == (2, 1)
    assert r["l2_drift"] == 4.0
    # identical snapshots -> zero drift everywhere
    same = {r["label"]: r["l2_drift"]
            for r in centroid_drift(base, base).collect()}
    assert same == {0: 0.0, 1: 0.0}
