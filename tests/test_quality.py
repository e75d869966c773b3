"""Repetition-quality metrics (functions/quality.py) against
hand-computed values, plus the Gopher-threshold filter."""

import pytest

from fsharp_dataframe_spark.functions.quality import (
    GOPHER_REPETITION_THRESHOLDS,
    repetition_filter,
    repetition_stats,
)


def _row(spark, text, doc_id=1):
    df = spark.createDataFrame([(doc_id, text)], "doc_id long, text string")
    out = repetition_stats(df, top_ns=(2, 3), dup_ns=(2, 5))
    return out.collect()[0].asDict()


def test_top_ngram_char_frac(spark):
    # "a b a b": bigrams {"a b": 2, "b a": 1} -> max c*len = 2*3 = 6
    # trigrams {"a b a": 1, "b a b": 1}       -> max c*len = 5
    m = _row(spark, "a b a b")  # len 7
    assert m["top2_char_frac"] == pytest.approx(6 / 7)
    assert m["top3_char_frac"] == pytest.approx(5 / 7)
    # dup2: only "a b" repeats -> 2*3/7; dup5: fewer than 5 tokens -> 0
    assert m["dup2_char_frac"] == pytest.approx(6 / 7)
    assert m["dup5_char_frac"] == 0.0


def test_line_metrics(spark):
    # lines [x, x, y]: 3 lines, 2 distinct; dup chars 1 of 3 total
    m = _row(spark, "x\nx\ny")
    assert m["n_lines"] == 3
    assert m["dup_line_frac"] == pytest.approx(1 / 3)
    assert m["dup_line_char_frac"] == pytest.approx(1 / 3)


def test_empty_and_null_text(spark):
    df = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    for d in (1, 2):
        assert rows[d]["n_lines"] == 0
        assert all(v == 0.0 for k, v in rows[d].items()
                   if k.endswith("_frac"))


def test_case_folding_and_blank_lines(spark):
    # tokens lowercase ("A b" == "a b"); blank lines dropped before
    # line counting
    m = _row(spark, "A b\n\na B")
    assert m["n_lines"] == 2
    assert m["dup_line_frac"] == 0.0  # "A b" != "a B" (lines keep case)
    assert m["top2_char_frac"] == pytest.approx(2 * 3 / len("A b\n\na B"))


def test_repetition_filter_drops_spam(spark):
    spam = " ".join(["spam"] * 40)                    # top2 ~ 9*39/199 >> 0.2
    clean = " ".join(f"w{i}" for i in range(40))      # all n-grams unique
    df = spark.createDataFrame(
        [(1, spam), (2, clean)], "doc_id long, text string")
    kept = repetition_filter(df)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    # and the survivors keep their full row, untouched
    assert kept.columns == ["doc_id", "text"]


def test_gopher_thresholds_cover_declared_metrics():
    ns = {k for k in GOPHER_REPETITION_THRESHOLDS}
    assert {"dup_line_frac", "top2_char_frac", "dup5_char_frac"} <= ns


def test_c4_line_stats_hand_computed(spark):
    from fsharp_dataframe_spark.functions.quality import c4_line_stats
    from pyspark.sql import functions as F

    rows = [
        (1, 'A good sentence here.\nAnother proper line!\nshort one\n'),
        (2, 'code { return 1; }\nreal text ends well.'),
        (3, '\n\n  \n'),  # only blank lines
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    st = c4_line_stats(F.col("text"))
    got = {r["doc_id"]: (r["s"]["n_lines"], r["s"]["n_short_lines"],
                         r["s"]["terminal_punct_frac"], r["s"]["brace_frac"])
           for r in df.select("doc_id", st.alias("s")).collect()}
    # doc 1: 3 non-empty lines; "short one" has 2 tokens (<3); two end
    # in terminal punctuation
    assert got[1] == (3, 1, round(2 / 3, 4), 0.0)
    # doc 2: brace line + one good line
    assert got[2] == (2, 0, 0.5, 0.5)
    # doc 3: no non-empty lines -> zero fractions
    assert got[3] == (0, 0, 0.0, 0.0)


def test_c4_filter_gates(spark):
    from fsharp_dataframe_spark.functions.quality import c4_filter

    rows = [
        (1, "This is a perfectly fine document sentence.\nIt ends with punctuation."),
        (2, "lorem ipsum dolor sit amet and more filler text here."),  # blocklist
        (3, "int main() {\nreturn 0;\n}"),                             # braces
        (4, "no terminal punctuation on this line at all\nnor here"),  # punct frac
        (5, "Tiny."),                                                  # < min_words
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    kept = {r["doc_id"] for r in c4_filter(df).collect()}
    assert kept == {1}


def test_unigram_logprob_score_semantics(spark):
    # frequent-token docs must outscore rare-token docs; scoring a
    # separate df against a train corpus uses the smoothed floor for
    # unseen tokens
    import math

    from fsharp_dataframe_spark.functions.text import unigram_logprob_score

    rows = [(i, "common common common") for i in range(9)] + [(9, "rareword")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r["mean_logprob"]
           for r in unigram_logprob_score(df).collect()}
    assert out[0] > out[9]
    # hand-check: N=28 tokens (27 common + 1 rare), V=2
    # p_common=(27+1)/(28+2)=28/30; p_rare=(1+1)/30
    assert out[0] == round(round(math.log(28 / 30) * 10000) / 10000.0, 4)
    assert out[9] == round(round(math.log(2 / 30) * 10000) / 10000.0, 4)
    # unseen tokens against a train corpus -> the alpha floor
    new = spark.createDataFrame([(100, "unseen tokens only")],
                                "doc_id int, text string")
    floor = round(round(math.log(1 / 30) * 10000) / 10000.0, 4)
    got = unigram_logprob_score(new, train_df=df).collect()[0]
    assert got["mean_logprob"] == floor


def test_bigram_logprob_score_reference_and_floors(spark):
    """Bigram scores == a sequential reference model, including the
    unseen-bigram and unseen-context floors when scoring against a
    separate training corpus; shuffled-token text scores below its
    fluent source under the model trained on fluent text."""
    import math
    from collections import Counter

    from fsharp_dataframe_spark.functions.text import bigram_logprob_score

    train = [(0, "the cat sat on the mat"),
             (1, "the dog sat on the rug"),
             (2, "the cat ran to the dog")]
    score = [(10, "the cat sat on the mat"),   # all seen
             (11, "the cat flew"),             # unseen bigram, seen context
             (12, "zebra quux"),               # unseen context
             (13, "mat the on sat cat the")]   # shuffled tokens
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["mean_logprob"])
           for r in bigram_logprob_score(sdf, train_df=tdf).collect()}

    # sequential reference with the same quantization
    cb, cw, w2s = Counter(), Counter(), set()
    for _, t in train:
        toks = t.split()
        for a, b in zip(toks, toks[1:]):
            cb[(a, b)] += 1
            cw[a] += 1
            w2s.add(b)
    V = len(w2s)

    def units(a, b):
        x = math.log((cb[(a, b)] + 1.0) / (cw[a] + 1.0 * V)) * 10000
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    def round4_half_up(x):
        # F.round / DuckDB round are HALF-AWAY-FROM-ZERO; Python
        # round() is banker's
        return math.copysign(math.floor(abs(x) * 10000 + 0.5), x) / 10000

    for doc_id, t in score:
        toks = t.split()
        lps = [units(a, b) for a, b in zip(toks, toks[1:])]
        assert got[doc_id][0] == len(lps)
        assert abs(got[doc_id][1]
                   - round4_half_up(sum(lps) / len(lps) / 10000.0)) < 1e-9
    # fluency separation: the shuffled doc scores below the fluent one
    assert got[13][1] < got[10][1]


def test_logreg_learns_separable_data_and_is_partition_invariant(spark):
    """Batch-GD logreg drives a linearly separable planted set to
    perfect accuracy, and the trained weights are bit-identical under
    repartitioning (fixed-point gradient aggregation)."""
    import random

    from pyspark.sql import functions as F

    from fsharp_dataframe_spark.functions.quality import logreg_fit, logreg_score

    rng = random.Random(7)
    rows = []
    for i in range(400):
        y = i % 2
        # class 1 centered at (2, 2), class 0 at (-2, -2): separable
        rows.append((i, rng.uniform(1.0, 3.0) * (1 if y else -1),
                     rng.uniform(1.0, 3.0) * (1 if y else -1), float(y)))
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y double")
    w = logreg_fit(df, ["x1", "x2"], "y", n_iter=20, lr=1.0)
    scored = logreg_score(df, w, ["x1", "x2"])
    acc = scored.filter(
        ((F.col("prob") >= 0.5) & (F.col("y") == 1.0))
        | ((F.col("prob") < 0.5) & (F.col("y") == 0.0))).count() / 400
    assert acc == 1.0, (acc, w)
    w_re = logreg_fit(df.repartition(7, "id"), ["x1", "x2"], "y",
                      n_iter=20, lr=1.0)
    assert w == w_re
