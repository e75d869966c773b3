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
