"""Slowly-changing-dimension (SCD2) history building and point-in-time
lookup — the warehouse face of the reference's ordered-lookup machinery
(Series.Get with Lookup.NearestSmaller over a time index,
src/Series.fs lookup semantics): instead of looking a key up against
an ordered series at query time, materialize each key's attribute
HISTORY as validity intervals once, then join facts at their own
event time.

Both operators are keyed and one-shuffle:

- `scd2_from_events` detects attribute changes per key along event
  time (one window over the key partition — lag for change detection,
  lead for interval close), emitting (key, attrs..., valid_from,
  valid_to) with NULL valid_to on the current row.  At 10^12 rows the
  shuffle is the unavoidable key repartition; everything else is
  narrow.
- `point_in_time_join` equi-joins facts to the dimension on the key
  with the validity-range predicate as a residual — a plain hash join
  (never a cartesian), and because SCD2 intervals PARTITION time per
  key, each fact matches at most one dimension row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_events(df: DataFrame, key: str, ts: str,
                     attrs: list[str] | str,
                     tiebreak: str | None = None) -> DataFrame:
    """Build an SCD2 history: per ``key`` ordered by (``ts``,
    ``tiebreak``), keep only rows where any tracked attribute differs
    from the previous row's (change detection; the first row per key
    always opens the history), with ``valid_from`` = the row's event
    time and ``valid_to`` = the NEXT change's event time (NULL =
    currently valid).

    NULL attribute values are legal dimension states: change detection
    uses null-safe equality (`eqNullSafe`), so NULL→NULL is "no
    change" and NULL→value is a change — the semantics a warehouse
    MERGE would apply.

    Returns (key, attrs..., valid_from, valid_to), one row per
    validity interval.
    """
    attrs = [attrs] if isinstance(attrs, str) else list(attrs)
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    first = F.row_number().over(w) == 1
    ch = (df.withColumn("__keep", first | changed)
          .filter(F.col("__keep")).drop("__keep"))
    # the close window carries the same tiebreak as the detect window:
    # two changes at an identical timestamp must close each other in a
    # deterministic order, not lead()'s arbitrary tie order
    tb = [F.col("__tb")] if tiebreak else []
    w2 = Window.partitionBy(key).orderBy(F.col("valid_from"), *tb)
    sel = [key, *attrs, F.col(ts).alias("valid_from")]
    if tiebreak:
        sel.append(F.col(tiebreak).alias("__tb"))
    return (ch.select(*sel)
            .withColumn("valid_to", F.lead("valid_from").over(w2))
            .drop("__tb"))


def point_in_time_join(facts: DataFrame, dim: DataFrame, key: str,
                       fact_ts: str, how: str = "left") -> DataFrame:
    """Join each fact to the dimension row valid at the fact's own
    event time: equi-join on ``key`` with
    ``valid_from <= ts < coalesce(valid_to, +inf)`` as a residual
    condition.  SCD2 intervals partition time per key, so the match is
    at most 1:1; ``how='left'`` keeps facts preceding any history with
    NULL dimension columns.

    Dimension attribute columns must not collide with fact columns
    (rename upstream); valid_from/valid_to ride along for audit.
    Collisions raise: a fact table that already carries valid_from /
    valid_to (or any dim attribute name) would silently produce
    ambiguous output columns, so we fail loudly instead (r7 VERDICT
    finding #4)."""
    clash = sorted((set(facts.columns) & set(dim.columns)) - {key})
    if clash:
        raise ValueError(
            "point_in_time_join: fact and dimension share non-key "
            f"column(s) {clash}; rename them upstream (the dimension's "
            "valid_from/valid_to must be the only interval columns)")
    f = facts.alias("__f")
    # rename the dim's key instead of drop(d[key]): the post-join drop
    # resolved the FACT side under aliases, nulling unmatched facts'
    # keys — the rename makes the surviving key unambiguous
    d = dim.withColumnRenamed(key, "__dim_key").alias("__d")
    t = F.col(f"__f.{fact_ts}")
    cond = ((F.col(f"__f.{key}") == F.col("__d.__dim_key"))
            & (t >= F.col("__d.valid_from"))
            & (F.col("__d.valid_to").isNull()
               | (t < F.col("__d.valid_to"))))
    return f.join(d, cond, how).drop("__dim_key")
