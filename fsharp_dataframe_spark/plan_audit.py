"""Physical-plan scale audit: the checklist tests/test_plans.py pins
per query, packaged as an API a pipeline can run on ITS queries before
paying for them at 100 TB.

`audit(df)` inspects the executed plan and returns findings for the
shapes that do not survive a scale-up:

- ``single_partition``   Exchange SinglePartition — a data-sized global
                         sort/window serializing into one task
- ``cartesian``          CartesianProduct / BroadcastNestedLoopJoin —
                         an all-pairs join (quadratic rows)
- ``python_udf``         row-at-a-time BatchEvalPython — the
                         non-Arrow Python path (ArrowEvalPython /
                         mapInPandas stages pass)
- ``rdd_scan``           ExistingRDD — a DataFrame built from
                         driver-side rows (createDataFrame) feeding a
                         big pipeline

(Column pruning/pushdown are asserted per-query in tests/test_plans.py
via ReadSchema/PushedFilters — they need query-specific expectations a
generic auditor can't infer from the plan string.)

Each finding is (kind, detail-line).  An empty list is the plan you
want.  This is a HEURISTIC gate (plan strings, not the tree API) —
exactly the checks a reviewer runs by eye with .explain(), made
repeatable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SMELLS = {
    "single_partition": ("Exchange SinglePartition",),
    "cartesian": ("CartesianProduct", "BroadcastNestedLoopJoin"),
    "python_udf": ("BatchEvalPython",),
    "rdd_scan": ("Scan ExistingRDD",),
}


def plan_string(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def audit(df: DataFrame,
          allow: tuple[str, ...] = ()) -> list[tuple[str, str]]:
    """Scan the physical plan for scale smells; returns
    [(kind, matching plan line), ...] — empty = clean.  ``allow``
    suppresses kinds a caller has deliberately accepted (e.g.
    ``("single_partition",)`` for a final tiny rollup)."""
    plan = plan_string(df)
    findings: list[tuple[str, str]] = []
    for line in plan.splitlines():
        stripped = line.strip()
        for kind, needles in SMELLS.items():
            if kind in allow:
                continue
            if any(n in stripped for n in needles):
                findings.append((kind, stripped[:200]))
    return findings


def assert_scales(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Raise AssertionError listing every finding — the one-liner for
    test suites and pre-flight checks: ``assert_scales(my_query_df)``."""
    findings = audit(df, allow)
    if findings:
        lines = "\n".join(f"  [{k}] {d}" for k, d in findings)
        raise AssertionError(f"plan has scale smells:\n{lines}")
