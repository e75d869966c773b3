"""Snapshot diffing — the ingest/versioning face of the reference's
frame alignment algebra (Frame.Join outer + cell-wise Zip,
src/Frame.fs join/zip family): align two table versions on a key and
classify every key as added / removed / changed / unchanged.

Scale shape: ONE full-outer equi-join on the key (the unavoidable
shuffle — co-locate via bucketing when diffing the same table
repeatedly), then a narrow null-safe column comparison.  No collect,
no per-column passes: all compare columns ride one projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key_cols: list[str] | str,
                  compare_cols: list[str] | None = None,
                  include_unchanged: bool = False) -> DataFrame:
    """Classify every key across two snapshots:

    - ``added``     — key only in ``new``
    - ``removed``   — key only in ``old``
    - ``changed``   — key in both, any compare column differs
      (NULL-safe: NULL→NULL is unchanged, NULL→value is a change)
    - ``unchanged`` — key in both, all compare columns equal
      (emitted only with ``include_unchanged=True`` — at corpus scale
      the unchanged set IS the table, and the diff's point is that the
      output is change-sized)

    ``compare_cols`` defaults to the non-key columns present in BOTH
    schemas.  Returns (key_cols..., status, changed_cols) where
    changed_cols is the sorted array of differing column names (empty
    for added/removed/unchanged).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        compare_cols = sorted((set(old.columns) & set(new.columns))
                              - set(keys))
    o = old.select(*keys, *[F.col(c).alias(f"__o_{c}")
                            for c in compare_cols],
                   F.lit(1).alias("__in_o"))
    n = new.select(*keys, *[F.col(c).alias(f"__n_{c}")
                            for c in compare_cols],
                   F.lit(1).alias("__in_n"))
    j = o.join(n, on=keys, how="full_outer")
    diffs = F.array_compact(F.array(*[
        F.when(~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
               F.lit(c))
        for c in compare_cols])) if compare_cols else \
        F.array().cast("array<string>")
    status = (F.when(F.col("__in_o").isNull(), F.lit("added"))
              .when(F.col("__in_n").isNull(), F.lit("removed"))
              .when(F.size("__diffs") > 0, F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    out = (j.withColumn("__diffs", diffs)
           .withColumn("status", status)
           .withColumn(
               "changed_cols",
               F.when(F.col("status") == "changed",
                      F.array_sort("__diffs"))
               .otherwise(F.array().cast("array<string>")))
           .select(*keys, "status", "changed_cols"))
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
