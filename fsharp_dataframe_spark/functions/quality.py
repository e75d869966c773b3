"""Repetition-based quality metrics for training corpora.

The reference library has no text-quality operators; this module adds
the repetition family popularized by Gopher's quality filtering (Rae
et al. 2021, "Scaling Language Models: ... Gopher", §A1.1) and used in
essentially every public LLM-corpus pipeline since (C4, RefinedWeb,
Dolma): documents dominated by repeated lines or repeated n-grams are
boilerplate/spam and should be filtered before training.

Metric definitions (documented here because several public variants
exist; both the Spark path and the SQL oracle in __spark_entry__.py
implement exactly these):

- ``dup_line_frac``      = (n_lines − n_distinct_lines) / n_lines
- ``dup_line_char_frac`` = Σ_over-distinct-lines (cnt−1)·len(line) /
                           Σ cnt·len(line)  — characters in occurrences
                           beyond a line's first, over all line chars
- ``top{n}_char_frac``   = max_over-n-grams cnt·len(gram) / len(text)
                           — characters covered by the single most
                           repeated word n-gram (count × joined length)
- ``dup{n}_char_frac``   = Σ_over-n-grams-with-cnt>1 cnt·len(gram) /
                           len(text) — characters covered by ALL
                           repeated n-grams; overlapping occurrences
                           are counted per occurrence (the cheap upper
                           bound every public implementation uses, so
                           values can exceed 1 on pathological docs)

Lines split on '\\n' with empty lines dropped; words split on
whitespace runs, lowercased, empties dropped (same token family as
functions/text.tokens).

Scale shape: every metric is a function of ONE document, so the whole
extraction is a narrow per-row map — NO shuffle, no explode+groupBy
round-trip through a corpus-wide (doc, gram) key.  Python-per-doc via
an Arrow-batched pandas UDF is the honest implementation: the pure
Column-HOF form needs O(tokens²) nested higher-order functions per
n (interpreted, not codegen'd), and the explode+groupBy form shuffles
~10 gram rows per token of corpus.  One UDF pass computing ALL the
metrics amortizes tokenization exactly the way public pipeline taggers
(Dolma, DataTrove) batch their per-doc scorers.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_WS = re.compile(r"\s+")

#: (metric name, output Spark type) in output order
_FIELDS = [
    ("n_lines", "bigint"),
    ("dup_line_frac", "double"),
    ("dup_line_char_frac", "double"),
]


def _doc_metrics(text: str | None, top_ns: tuple[int, ...],
                 dup_ns: tuple[int, ...]) -> list:
    if text is None:
        return [0, 0.0, 0.0] + [0.0] * (len(top_ns) + len(dup_ns))
    lines = [ln for ln in text.split("\n") if ln != ""]
    n_lines = len(lines)
    if n_lines:
        lc = Counter(lines)
        tot_chars = sum(len(ln) for ln in lines)
        dup_line_frac = (n_lines - len(lc)) / n_lines
        dup_chars = sum((c - 1) * len(ln) for ln, c in lc.items() if c > 1)
        dup_line_char_frac = dup_chars / tot_chars if tot_chars else 0.0
    else:
        dup_line_frac = dup_line_char_frac = 0.0
    toks = [t for t in _WS.split(text.lower()) if t != ""]
    tlen = len(text)
    out = [n_lines, dup_line_frac, dup_line_char_frac]
    for n in top_ns:
        if tlen == 0 or len(toks) < n:
            out.append(0.0)
            continue
        grams = Counter(" ".join(toks[i:i + n])
                        for i in range(len(toks) - n + 1))
        out.append(max(c * len(g) for g, c in grams.items()) / tlen)
    for n in dup_ns:
        if tlen == 0 or len(toks) < n:
            out.append(0.0)
            continue
        grams = Counter(" ".join(toks[i:i + n])
                        for i in range(len(toks) - n + 1))
        out.append(sum(c * len(g) for g, c in grams.items() if c > 1) / tlen)
    return out


def _metrics_udf(top_ns: tuple[int, ...], dup_ns: tuple[int, ...]):
    cols = _FIELDS + [(f"top{n}_char_frac", "double") for n in top_ns] \
                   + [(f"dup{n}_char_frac", "double") for n in dup_ns]

    @pandas_udf(
        "struct<" + ", ".join(f"{c}: {t}" for c, t in cols) + ">")
    def metrics(texts: pd.Series) -> pd.DataFrame:
        rows = [_doc_metrics(t, top_ns, dup_ns) for t in texts]
        return pd.DataFrame(rows, columns=[c for c, _ in cols])

    return metrics, [c for c, _ in cols]


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     top_ns: tuple[int, ...] = (2, 3, 4),
                     dup_ns: tuple[int, ...] = (5, 10)) -> DataFrame:
    """Per-document repetition metrics (see module docstring for the
    exact definitions): (id, n_lines, dup_line_frac,
    dup_line_char_frac, top{n}_char_frac..., dup{n}_char_frac...).

    Narrow per-row map — embarrassingly parallel, zero shuffle."""
    from fsharp_dataframe_spark.functions.util import spread

    metrics, names = _metrics_udf(top_ns, dup_ns)
    out = spread(df, id_col, text_col).select(
        F.col(id_col), metrics(F.col(text_col)).alias("_m"))
    return out.select(id_col, *[F.col(f"_m.{c}").alias(c) for c in names])


#: Gopher's published repetition thresholds (Rae et al. 2021 table A1):
#: a document is kept only if every metric is BELOW its cap.
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top2_char_frac": 0.20,
    "top3_char_frac": 0.18,
    "top4_char_frac": 0.16,
    "dup5_char_frac": 0.15,
    "dup10_char_frac": 0.10,
}


def repetition_filter(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      thresholds: dict[str, float] | None = None) -> DataFrame:
    """Drop documents whose repetition metrics exceed the thresholds
    (default: Gopher's published caps).  Returns the surviving rows of
    ``df`` unchanged — metrics are computed, applied, and discarded in
    one narrow pass (no shuffle, no second scan)."""
    th = dict(GOPHER_REPETITION_THRESHOLDS if thresholds is None else thresholds)
    top_ns = tuple(sorted(int(k[3:-10]) for k in th if k.startswith("top")))
    dup_ns = tuple(sorted(int(k[3:-10]) for k in th
                          if k.startswith("dup") and not k.startswith("dup_line")))
    metrics, _ = _metrics_udf(top_ns or (2,), dup_ns or (5,))
    cond = F.lit(True)
    for name, cap in th.items():
        cond = cond & (F.col("_m")[name] <= F.lit(float(cap)))
    return (df.withColumn("_m", metrics(F.col(text_col)))
            .filter(cond).drop("_m"))


# ----------------------------------------------------------------------
# C4-style line/document heuristics (Raffel et al. 2020, "Exploring the
# Limits of Transfer Learning with a Unified Text-to-Text Transformer",
# §2.2 — the published C4 cleaning rules, re-expressed as pure Column
# expressions: narrow maps, no shuffle, stream-applicable unchanged)
# ----------------------------------------------------------------------

def c4_line_stats(text):
    """Per-document C4 line heuristics as a struct Column:

    - ``n_lines``: non-empty lines
    - ``n_short_lines``: lines with < 3 whitespace tokens (C4 drops
      lines with too few words)
    - ``terminal_punct_frac``: fraction of lines ending in terminal
      punctuation (. ! ? ") — C4 keeps only such lines
    - ``brace_frac``: fraction of lines containing '{' or '}' (code
      contamination signal; C4 drops pages with braces)
    """
    from pyspark.sql import functions as F

    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")
    n = F.size(lines)
    short = F.size(F.filter(
        lines, lambda l: F.size(F.filter(F.split(F.trim(l), r"\s+"),
                                         lambda t: t != "")) < 3))
    term = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike(r'[.!?"]$')))
    brace = F.size(F.filter(lines, lambda l: l.contains("{") | l.contains("}")))
    zero = F.lit(0.0)
    return F.struct(
        n.alias("n_lines"),
        short.alias("n_short_lines"),
        F.when(n > 0, F.round(term / n, 4)).otherwise(zero)
         .alias("terminal_punct_frac"),
        F.when(n > 0, F.round(brace / n, 4)).otherwise(zero)
         .alias("brace_frac"),
    )


def c4_filter(df, text_col: str = "text",
              min_words: int = 5,
              max_brace_frac: float = 0.0,
              min_terminal_punct_frac: float = 0.5,
              blocklist: tuple[str, ...] = ("lorem ipsum",)):
    """Document-level C4 gate: >= min_words tokens, no (or bounded)
    brace lines, most lines ending in terminal punctuation, and none
    of the blocklist phrases (C4 drops any page containing
    "lorem ipsum" or bad words; the tiny default list is the published
    placeholder-text rule — extend with a real blocklist in
    production).  All pure Column expressions — applies to streams
    unchanged."""
    from pyspark.sql import functions as F

    from fsharp_dataframe_spark.functions.text import token_count

    c = F.col(text_col)
    st = c4_line_stats(c)
    cond = (
        (token_count(c) >= min_words)
        & (st["brace_frac"] <= max_brace_frac)
        & (st["terminal_punct_frac"] >= min_terminal_punct_frac)
    )
    low = F.lower(c)
    for phrase in blocklist:
        cond = cond & ~low.contains(phrase.lower())
    return df.filter(cond)


def logreg_fit(df: DataFrame, feature_cols: list[str], label_col: str,
               n_iter: int = 5, lr: float = 1.0) -> list[float]:
    """Distributed logistic-regression training — the linear
    quality-classifier probe of published pipelines (fasttext-style
    filters: GPT-3/Brown et al. 2020 §A "high-quality document"
    classifier; CCNet's linear head), trained the only way that scales:
    weights live on the DRIVER (d+1 doubles), the corpus never moves.

    Per iteration ONE Spark job: a narrow Column expression computes
    each row's sigmoid from literal weights, and the d+1 gradient
    components aggregate as fixed-point integer units (map-side
    combine reduces every partition to one d+1-value row before the
    single-row shuffle) — the kmeans_fit shape.  Batch gradient
    descent: deterministic, partition-order-exact (integer sums), and
    SQL-replayable; sigmoid probabilities are quantized to MILLIONTHS
    before the gradient so cross-engine exp() ulp differences cannot
    propagate into the update.

    Features must be plain numeric columns (materialize ratios first);
    returns [w_0..w_{d-1}, bias].
    """
    w = [0.0] * len(feature_cols)
    b = 0.0
    for _ in range(n_iter):
        z = F.lit(b)
        for wj, c in zip(w, feature_cols):
            z = z + F.lit(wj) * F.col(c)
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
        err = p - F.col(label_col).cast("double")
        aggs = [F.sum(F.round(err * F.col(c) * 10000).cast("long")).alias(f"g{j}")
                for j, c in enumerate(feature_cols)]
        aggs.append(F.sum(F.round(err * 10000).cast("long")).alias("gb"))
        aggs.append(F.count("*").alias("n"))
        row = df.agg(*aggs).first()
        n = int(row["n"] or 0)
        if n == 0:
            break
        for j in range(len(w)):
            w[j] -= lr * (row[f"g{j}"] / 10000.0 / n)
        b -= lr * (row["gb"] / 10000.0 / n)
    return w + [b]


def logreg_score(df: DataFrame, weights: list[float],
                 feature_cols: list[str], out_col: str = "prob") -> DataFrame:
    """Score rows with trained logreg weights ([w..., bias]): appends
    sigmoid(w·x + b) rounded to 6 decimals (the same quantum the
    trainer uses) — a pure narrow Column map, literal weights, no
    shuffle; threshold downstream for keep/drop filtering."""
    if len(weights) != len(feature_cols) + 1:
        raise ValueError("weights must be [w per feature..., bias]")
    z = F.lit(float(weights[-1]))
    for wj, c in zip(weights, feature_cols):
        z = z + F.lit(float(wj)) * F.col(c)
    return df.withColumn(
        out_col, F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6))


def ngram_repetition_share(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", n: int = 3) -> DataFrame:
    """Per-document n-gram repetition share — the boilerplate /
    memorization signal a pretraining pipeline scores before mixing
    (document-level face of Lee 2022's duplicated-span observation):
    for each document, the share of its DISTINCT n-gram shingles that
    also occur in at least one other document.  Docs shorter than one
    shingle report (0, 0, NULL) — a doc with no n-grams has no share
    (the source_overlap short-doc discipline).

    Scale shape: one shingle-keyed groupBy for document frequency
    (map-side combine, uniform hash keys), one equi-join back on the
    shingle, one doc-keyed aggregate — the dedup family's exchange
    discipline, never documents².  The share is the exact basis-points
    integer div (the dedup_report discipline), so a SQL oracle replays
    it bit-for-bit.

    Returns (id, n_shingles, n_common, repeated_share) for EVERY input
    document, ordered by id.
    """
    from fsharp_dataframe_spark.functions.dedup import shingle_table
    from fsharp_dataframe_spark.functions.text import tokens

    sh = shingle_table(
        df.filter(F.size(tokens(F.lower(F.col(text_col)))) >= n),
        id_col=id_col, text_col=text_col, n=n)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    per_doc = (sh.join(dfreq, "shingle")
               .groupBy(id_col)
               .agg(F.count("*").alias("n_shingles"),
                    F.sum((F.col("df") >= 2).cast("long"))
                    .alias("n_common")))
    share = (F.expr("CAST(n_common * 10000 AS DECIMAL(38,0))"
                    " div n_shingles").cast("double") / 10000.0)
    return (df.select(id_col).join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
                    F.coalesce("n_common", F.lit(0)).alias("n_common"),
                    share.alias("repeated_share"))
            .orderBy(id_col))
