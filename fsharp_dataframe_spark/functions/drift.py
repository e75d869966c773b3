"""Distribution-drift and ranking-quality monitors — the evaluation
tier a production data pipeline runs next to its transforms: PSI
between a baseline and a current snapshot of any numeric column
(feature drift, score drift), a distributed binned ROC-AUC for
classifier monitoring, and a Zipf-law fit over the corpus vocabulary
(tokenizer / corpus-health audit).

Reference anchor: the reference's statistical tier stops at per-group
moments (src/Series.fs:536-585, SeriesStatsExtensions); these are the
parity-plus monitors built on the same aggregate discipline.

Exactness discipline (the package-wide oracle contract): every
data-sized aggregate is an exact BIGINT count or a BIGINT sum of
quantized units, so partial-aggregation order can never move a result;
the remaining double arithmetic is a fixed association over identical
integers that a DuckDB oracle replays bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _uniform_bin(x: "F.Column", lo: float, hi: float, n_bins: int) -> "F.Column":
    """Clamped uniform bin id in [0, n_bins): a pure per-row function
    of the value (no sketch, no sort), identical in Spark and SQL —
    outliers land in the edge bins instead of erroring.

    Validates its arguments (ADVICE r9): lo == hi would give a zero
    bin width (0/0 → NaN silently clamped to the top bin), lo > hi a
    negative one, and n_bins < 1 nonsense downstream — every caller
    (population_stability, binned_auc, stream_psi, stream_binned_auc)
    invokes this at plan-build time, so the check fails fast at the
    entry point rather than misbinning."""
    if not float(hi) > float(lo):
        raise ValueError(
            f"uniform bins need hi > lo, got lo={lo!r} hi={hi!r}")
    if int(n_bins) < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins!r}")
    w = (float(hi) - float(lo)) / int(n_bins)
    raw = F.floor((x.cast("double") - F.lit(float(lo))) / F.lit(w))
    return F.least(F.greatest(raw, F.lit(0)),
                   F.lit(int(n_bins) - 1)).cast("int")


def population_stability(base: DataFrame, current: DataFrame,
                         value: "F.Column | str", lo: float, hi: float,
                         n_bins: int = 20) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard drift score of model-monitoring practice
    (a binned symmetric-KL variant: PSI = Σ_b (p_b − q_b)·ln(p_b/q_b)).

    Bins are uniform over [lo, hi] with clamped edges (a pure per-row
    expression, so the two sides bin identically with no shared
    sketch).  Add-one smoothing keeps empty bins finite: p_b =
    (n_b + 1) / (N + n_bins), an exact integer ratio.  Each bin's PSI
    term is quantized to integer 1e-8 units before any cross-bin
    arithmetic, so the column hashes are stable.

    Scale shape: one groupBy-bin aggregate per side (map-side combine,
    n_bins keys), an n_bins-row spine outer-joined to both (empty bins
    participate), and one-row totals broadcast — the token_budget
    shape; nothing data-sized crosses the exchange after the combine.

    Returns one row per bin: (bin, n_base, n_cur, psi_term), psi_term
    in PSI units rounded 8dp; the index itself is Σ psi_term.
    """
    col = F.col(value) if isinstance(value, str) else value
    nb = int(n_bins)

    def side(df: DataFrame, name: str) -> DataFrame:
        return (df.filter(col.isNotNull())
                .select(_uniform_bin(col, lo, hi, nb).alias("bin"))
                .groupBy("bin").agg(F.count("*").alias(name)))

    b = side(base, "n_base")
    c = side(current, "n_cur")
    spine = base.sparkSession.range(nb).select(
        F.col("id").cast("int").alias("bin"))
    j = (spine.join(b, "bin", "left").join(c, "bin", "left")
         .select("bin",
                 F.coalesce("n_base", F.lit(0)).alias("n_base"),
                 F.coalesce("n_cur", F.lit(0)).alias("n_cur")))
    totals = j.agg(F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc"))
    j = j.crossJoin(F.broadcast(totals))
    # add-one smoothing: exact integer numerators/denominators, ONE
    # double division each — the oracle carries the same association
    p = (F.col("n_base") + 1).cast("double") / (F.col("tb") + nb).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / (F.col("tc") + nb).cast("double")
    term = (p - q) * F.log(p / q)
    units = F.round(term * 100_000_000).cast("long")
    return (j.select("bin", "n_base", "n_cur",
                     F.round(units / 100_000_000.0, 8).alias("psi_term"))
            .orderBy("bin"))


def binned_auc(df: DataFrame, score: "F.Column | str",
               label: "F.Column | str", lo: float, hi: float,
               n_bins: int = 256) -> DataFrame:
    """Distributed ROC-AUC via score binning — classifier monitoring at
    corpus scale.  The exact rank-sum AUC needs a global sort; binning
    the score into ``n_bins`` uniform buckets makes the statistic a
    bounded-relation computation: AUC = P(score⁺ > score⁻) +
    ½·P(score⁺ = score⁻) evaluated on the binned scores (ties within a
    bin count half, the Mann-Whitney tie convention) — exact for the
    binned scorer, and within 1/n_bins of the raw-score AUC.

    Scale shape: ONE groupBy-bin aggregate over the corpus (map-side
    combine, n_bins keys), then a running sum over the n_bins-row
    relation (bounded by construction — the corr_matrix allowance
    class) and one exact integer ratio:

        num = Σ_b pos_b · (2·neg_below_b + neg_b),  den = 2·P·N

    both BIGINT, auc = round(num/den, 6).

    Returns one row: (n_pos, n_neg, auc).
    """
    from pyspark.sql import Window as W

    s = F.col(score) if isinstance(score, str) else score
    y = (F.col(label) if isinstance(label, str) else label).cast("int")
    nb = int(n_bins)
    per_bin = (df.filter(s.isNotNull() & y.isNotNull())
               .select(_uniform_bin(s, lo, hi, nb).alias("bin"),
                       y.alias("y"))
               .groupBy("bin")
               .agg(F.sum("y").cast("long").alias("pos"),
                    F.sum(1 - F.col("y")).cast("long").alias("neg")))
    # n_bins-row relation: the un-keyed window is construction-bounded
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, -1)
    below = F.coalesce(F.sum("neg").over(w), F.lit(0))
    scored = per_bin.select(
        "pos", "neg",
        (F.col("pos") * (2 * below + F.col("neg"))).alias("contrib"))
    agg = scored.agg(F.sum("pos").alias("n_pos"),
                     F.sum("neg").alias("n_neg"),
                     F.sum("contrib").alias("num"))
    den = (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
    return agg.select(
        "n_pos", "n_neg",
        F.round(F.when(den > 0, F.col("num").cast("double") / den), 6)
        .alias("auc"))


def zipf_fit(df: DataFrame, k: int = 300, text_col: str = "text",
             id_col: str = "doc_id", min_count: int = 1) -> DataFrame:
    """Zipf-law fit over the corpus vocabulary: OLS of ln(frequency) on
    ln(rank) for the top-``k`` tokens — the corpus-health audit every
    tokenizer-training run wants (natural text slopes ≈ −1; templated/
    synthetic corpora flatten, boilerplate floods steepen; Zipf 1949,
    Piantadosi 2014 review).

    Built on vocab_topk's plan (explode → ONE token groupBy with
    map-side combine → TakeOrdered k), then the k-row relation is
    ranked and both axes are quantized to integer 1e-6 ln-units so the
    five OLS moments are exact BIGINT sums (the grouped_ols
    discipline) — slope is the unitless ratio of identical integers in
    both engines.  k-bounded everywhere past the TakeOrdered, so the
    rank window's single partition is construction-bounded.

    Returns one row: (n_terms, slope, intercept, r2), slope/intercept
    in ln-space (intercept in 1e-6 ln-units scale), rounded 6dp.
    """
    from pyspark.sql import Window as W

    from fsharp_dataframe_spark.functions.text import vocab_topk

    top = vocab_topk(df, k=k, text_col=text_col, id_col=id_col,
                     min_count=min_count)
    rk = F.row_number().over(
        W.orderBy(F.col("n_occurrences").desc(), F.col("token").asc()))
    pts = top.select(
        F.round(F.log(rk.cast("double")) * 1_000_000).cast("long").alias("xi"),
        F.round(F.log(F.col("n_occurrences").cast("double")) * 1_000_000)
        .cast("long").alias("yi"))
    m = pts.agg(F.count("*").alias("n"),
                F.sum("xi").alias("sx"), F.sum("yi").alias("sy"),
                F.sum(F.col("xi") * F.col("yi")).alias("sxy"),
                F.sum(F.col("xi") * F.col("xi")).alias("sxx"),
                F.sum(F.col("yi") * F.col("yi")).alias("syy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov_n = (n * sxy) - (sx * sy)
    var_x = (n * sxx) - (sx * sx)
    var_y = (n * syy) - (sy * sy)
    slope = cov_n / var_x                      # ln-units cancel
    intercept = ((sy - slope * sx) / n) / 1_000_000.0
    r2 = (cov_n * cov_n) / (var_x * var_y)
    ok = (F.col("n") >= 2) & (var_x > 0)
    return m.select(
        F.col("n").alias("n_terms"),
        F.round(F.when(ok, slope), 6).alias("slope"),
        F.round(F.when(ok, intercept), 6).alias("intercept"),
        F.round(F.when(ok & (var_y > 0), r2), 6).alias("r2"))


def centroid_drift(base: DataFrame, current: DataFrame,
                   vec_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """Per-label embedding-centroid shift between two corpus snapshots
    — the embedding-space drift monitor (did retraining / a new crawl
    move what "label 3" means?): L2 distance between each label's mean
    vector on the base side and on the current side.

    Exactness: every element is quantized to integer 1e-7 units before
    the per-(label, dim) BIGINT sum (order-free), the per-dim mean is
    one division of identical integers, and the squared per-dim gaps
    are re-quantized to integer 1e-12 units before the cross-dim sum —
    so the only remaining doubles are fixed associations plus one
    correctly-rounded IEEE sqrt, which a DuckDB oracle replays
    bit-for-bit.

    Scale shape: one narrow posexplode + ONE (label, dim)-keyed
    aggregate per side (bounded keys, map-side combine), an equi-join
    of the two bounded centroid relations, and a label-keyed rollup.

    Returns (label, n_base, n_cur, l2_drift), drift rounded 6dp;
    labels present on only one side are omitted (no centroid to
    compare).
    """

    def side(df: DataFrame, sn: str, nn: str) -> DataFrame:
        el = df.filter(F.col(vec_col).isNotNull()).select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col)).alias("dim", "x"))
        xu = F.round(F.col("x").cast("double") * 10_000_000).cast("long")
        return (el.groupBy("label", "dim")
                .agg(F.sum(xu).alias(sn), F.count("*").alias(nn)))

    b = side(base, "sb", "nb")
    c = side(current, "sc", "nc")
    j = b.join(c, ["label", "dim"])
    mb = (F.col("sb").cast("double") / F.col("nb").cast("double")) / 1e7
    mc = (F.col("sc").cast("double") / F.col("nc").cast("double")) / 1e7
    d = mb - mc
    units = F.round((d * d) * 1_000_000_000_000).cast("long")
    per_label = (j.select("label", F.col("nb"), F.col("nc"),
                          units.alias("u"))
                 .groupBy("label")
                 .agg(F.max("nb").alias("n_base"),
                      F.max("nc").alias("n_cur"),
                      F.sum("u").alias("su")))
    drift = F.sqrt(F.col("su").cast("double") / 1e12)
    return (per_label.select("label", "n_base", "n_cur",
                             F.round(drift, 6).alias("l2_drift"))
            .orderBy("label"))
