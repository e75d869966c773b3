"""Mergeable-sketch rollups — the pre-aggregated answer tables a
100 TB warehouse keeps so "distinct users over any date range" costs a
sketch merge instead of a rescan.  Built on Spark's native Apache
DataSketches HLL functions (hll_sketch_agg / hll_union_agg /
hll_sketch_estimate — JVM-side, mergeable, whole-stage codegen).

The load-bearing property (pinned by tests): merging per-slice
sketches is LOSSLESS with respect to the sketch itself — the estimate
from a union of slice sketches EQUALS the estimate from one sketch
over the union of rows, exactly, not approximately.  That is what
makes a (day, sketch) table answer any date-range distinct query with
the same accuracy as a full rescan.

No SQL oracle here: DuckDB's approx_count_distinct is a different HLL
implementation, so estimates cannot hash-match across engines — the
operators are pinned by the merge-equality invariant and an
error-bound check against exact counts instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch_rollup(df: DataFrame, by: list[str] | str,
                           col: str, lg_k: int = 12,
                           sketch_col: str = "sketch") -> DataFrame:
    """Per-group HLL sketch of ``col``'s distinct values — the pay-once
    artifact: ONE groupBy with map-side combined sketch states (each
    partial is ~2^lg_k bytes regardless of row count).  Persist this
    per fine slice (e.g. per day) and answer ANY coarser slice with
    merge_distinct_sketches; lg_k=12 gives ~1.6% relative standard
    error."""
    keys = [by] if isinstance(by, str) else list(by)
    return (df.groupBy(*keys)
            .agg(F.hll_sketch_agg(F.col(col), F.lit(int(lg_k)))
                 .alias(sketch_col)))


def merge_distinct_sketches(df: DataFrame, by: list[str] | str | None,
                            sketch_col: str = "sketch",
                            out_col: str = "n_distinct") -> DataFrame:
    """Merge sketch rows down to ``by`` (or to one global row with
    ``by=None``) and read the distinct estimate: hll_union_agg +
    hll_sketch_estimate.  The merge is exact over sketches — the
    result is identical to having sketched the union directly."""
    keys = ([] if by is None else ([by] if isinstance(by, str) else list(by)))
    g = df.groupBy(*keys) if keys else df.groupBy()
    return g.agg(F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketch_col))).alias(out_col))


def estimate_distinct(df: DataFrame, sketch_col: str = "sketch",
                      out_col: str = "n_distinct") -> DataFrame:
    """Read each row's sketch estimate (no merge)."""
    return df.withColumn(
        out_col, F.hll_sketch_estimate(F.col(sketch_col)))
