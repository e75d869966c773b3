"""Skew-handling join/aggregate shapes — the explicit counterparts of
AQE's runtime skew mitigation, for when the hot keys are known or
cardinality is tiny (a 5-value status column on a 10^12-row fact table
sends everything to 5 reducers no matter how many executors exist).

`functions/profile.key_skew_stats` measures the heat; these operators
act on it.  Both are RESULT-IDENTICAL to their naive forms (pinned by
equivalence tests and a SQL oracle) — only the shuffle layout changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, by: list[str] | str,
               aggs: dict[str, Column], n_salts: int = 32,
               salt_on: str | Column | None = None) -> DataFrame:
    """Two-phase aggregation over hot keys: phase 1 aggregates on
    (keys..., salt) — n_salts× more reduce slots, each holding 1/n of a
    hot key's rows — phase 2 re-aggregates the per-salt partials on the
    true keys (a relation of |keys|·n_salts rows — trivial).

    ``aggs`` maps output name → a DECOMPOSABLE aggregate column (sum,
    count, min, max, or integer-unit sums — the engine's fixed-point
    discipline makes even "mean" decomposable as sum+count).  Both
    phases apply the same expression, so the caller's aggregate must be
    idempotent under re-aggregation of partials: pass `F.sum(x)` and
    re-summing partial sums is exact; a raw `F.avg` would average
    averages and is rejected nowhere — the contract is documented, the
    oracle pins the composition.

    Floating-point caveat: `sum` over DOUBLE/FLOAT columns is
    "result-identical" only up to addition reordering — the two-phase
    plan groups addends per salt, so the last-ulp rounding can differ
    from the naive single groupBy (both are equally valid FP sums; the
    registered callers keep the engine's integer/decimal fixed-point
    discipline, where re-summation is bit-exact).  For strict
    reproducibility, sum integral or decimal units.

    The salt is deterministic (hash of ``salt_on`` or a stable row
    column) so reruns are identical; map-side combine already collapses
    each task's rows, so phase 1's shuffle carries at most
    tasks × keys × n_salts rows.
    """
    keys = [by] if isinstance(by, str) else list(by)
    # pmod, never abs(hash) % n: abs(Integer.MIN_VALUE) throws under
    # ANSI (Spark 4 default) and wraps negative without it — a salt
    # that can never match the 0..n-1 range
    if salt_on is None:
        salt_col = F.pmod(F.hash(*[F.col(c) for c in df.columns]),
                          F.lit(int(n_salts)))
    else:
        s = F.col(salt_on) if isinstance(salt_on, str) else salt_on
        salt_col = F.pmod(F.hash(s), F.lit(int(n_salts)))
    p1 = (df.withColumn("__salt", salt_col)
          .groupBy(*[F.col(k) for k in keys], F.col("__salt"))
          .agg(*[c.alias(n) for n, c in aggs.items()]))
    p2 = p1.groupBy(*keys).agg(
        *[_reagg(df, n, c).alias(n) for n, c in aggs.items()])
    return p2


def _reagg(df: DataFrame, name: str, col: Column) -> Column:
    """Phase-2 re-aggregation of a phase-1 partial: sums and counts
    re-SUM (a count of partials would count salt groups), min/max
    re-apply.  Detection probes the ANALYZED plan of the aggregate (a
    driver-side analysis, no job) rather than the Column repr —
    `countDistinct` prints as a plain `count(...)` in the repr and
    would silently re-sum overlapping per-salt distinct counts.  The
    whitelist is strict: non-decomposable aggregates (count DISTINCT,
    min_by/max_by — re-applying min to the carried VALUE is wrong,
    avg — an average of averages) raise instead of mis-aggregating."""
    import re

    plan = (df.limit(0).groupBy().agg(col.alias("__reagg_probe"))
            ._jdf.queryExecution().analyzed().toString())
    # inspect ONLY the aggregate expression (first line: "Aggregate
    # [<expr> AS __reagg_probe#N]") — matching the whole plan string
    # falsely rejects frames whose COLUMN NAMES contain "distinct"
    first = plan.splitlines()[0].lower()
    m = re.search(r"aggregate \[(.*) as __reagg_probe#", first)
    agg_expr = m.group(1) if m else first
    # the DISTINCT keyword prints as "(distinct <expr>" — a column
    # merely NAMED n_distinct prints as "(n_distinct#12L)" and must
    # not trip the guard
    if re.search(r"\(distinct\s", agg_expr):
        raise ValueError(
            "salted_agg: DISTINCT aggregates are not decomposable across "
            "salts (per-salt distinct sets overlap); pre-deduplicate or "
            "aggregate unsalted")
    m = re.search(r"^(\w+)\(", agg_expr)
    token = m.group(1) if m else ""
    if token == "count":
        return F.sum(F.col(name))
    if token == "min":
        return F.min(F.col(name))
    if token == "max":
        return F.max(F.col(name))
    if token == "sum":
        return F.sum(F.col(name))
    raise ValueError(
        f"salted_agg: aggregate {token or str(col)!r} is not in the "
        "decomposable whitelist (sum/count/min/max); express it as "
        "integer-unit sums (mean = sum + count) or aggregate unsalted")


def salted_join(left: DataFrame, right: DataFrame, on: list[str] | str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: LEFT rows take a deterministic salt in
    [0, n_salts); the (small) RIGHT side replicates once per salt
    (explode of a literal sequence — n_salts× the small side, nothing
    of the big side moves twice); the join key becomes (keys..., salt),
    so a hot key's rows spread over n_salts reducers instead of one.

    Use when the RIGHT side is modest (dimension-sized — its
    replication is the price) but too big or too hot for a plain
    broadcast, and AQE's split-on-skew isn't available or isn't
    triggering.  Result-identical to the naive join (equivalence
    tests); the salt column never escapes.

    ``how`` is restricted to left-preserving modes: because the right
    side is replicated once per salt, any mode that emits UNMATCHED
    right rows ("right"/"full") would surface each of them n_salts
    times null-extended — so those raise rather than corrupt.  Allowed:
    inner, left/left_outer, left_semi/semi, left_anti/anti (the left
    side carries exactly one salt per row, so left-preserving semantics
    are exact).
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    if str(how).lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-safe — the right side "
            "is replicated once per salt, so unmatched right rows would "
            "be emitted n_salts times under right/full outer joins. "
            "Allowed: inner, left(_outer), left_semi, left_anti. "
            "For right/full semantics, swap the sides or use AQE skew "
            "join handling")
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = F.pmod(F.hash(*[F.col(c) for c in left.columns]),
                   F.lit(int(n_salts)))
    l2 = left.withColumn("__salt", lsalt)
    r2 = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(int(n_salts) - 1))))
    out = l2.join(r2, keys + ["__salt"], how)
    return out.drop("__salt")
