"""Distributed BPE trainer vs an independent sequential reference."""

import collections

import pytest

from fsharp_dataframe_spark.functions.bpe import (
    bpe_encode_count, bpe_train, char_pair_counts, word_counts,
)

CORPUS = ["low low lower lowest newest newest", "widest newest low"]


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Sequential BPE (Sennrich et al. 2016 alg.): same tie-break
    (count desc, then (a, b) lexicographic asc)."""
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: collections.Counter = collections.Counter()
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (a, b), _n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def _df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], "text string")


def test_word_and_char_pair_counts(spark):
    wc = {r["word"]: r["n"] for r in word_counts(_df(spark)).collect()}
    assert wc == {"low": 3, "lower": 1, "lowest": 1, "newest": 3, "widest": 1}
    pc = {r["pair"]: r["n_pairs"]
          for r in char_pair_counts(_df(spark)).collect()}
    assert pc["es"] == 5 and pc["lo"] == 5 and pc["ne"] == 3


def test_bpe_train_matches_sequential_reference(spark):
    wf = {"low": 3, "lower": 1, "lowest": 1, "newest": 3, "widest": 1}
    ref_merges, ref_syms = _ref_bpe(wf, 6)
    got = bpe_train(_df(spark), 6)
    assert got == ref_merges


def test_bpe_encode_count_matches_reference_segmentation(spark):
    wf = {"low": 3, "lower": 1, "lowest": 1, "newest": 3, "widest": 1}
    merges, ref_syms = _ref_bpe(wf, 4)
    out = {r["text"]: r["n_bpe_tokens"]
           for r in bpe_encode_count(_df(spark), merges).collect()}
    for text in CORPUS:
        expected = sum(len(ref_syms[w]) for w in text.split())
        assert out[text] == expected
    # merges strictly reduce the token count vs characters
    chars = sum(len(w) for w in CORPUS[0].split())
    assert out[CORPUS[0]] < chars


def test_bpe_train_exhausts_gracefully(spark):
    df = spark.createDataFrame([("ab ab",)], "text string")
    merges = bpe_train(df, 10)  # only one merge possible
    assert merges == [("a", "b")]
