"""Structural equality for tests.

The reference defines structural equality over keys+values
(src/Series.fs:706-715, src/Frame.fs:606-613) and its tests compare
literal series (SURVEY.md §5).  Here: sort by key, collect both sides,
compare with NULL/NaN canonicalization and float tolerance.
Test-only — never used in transformations.
"""

from __future__ import annotations

import math

from fsharp_dataframe_spark.frame import Frame
from fsharp_dataframe_spark.series import Series


def _canon(v):
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def _rows(df, sort_cols):
    return [tuple(_canon(v) for v in r) for r in df.orderBy(*sort_cols).collect()]


def _eq(a, b, tol=1e-9) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=tol, abs_tol=tol)
        except (TypeError, ValueError):
            return False
    return a == b


def assert_rows_equal(actual_df, expected_rows, sort_cols):
    got = _rows(actual_df, sort_cols)
    exp = [tuple(_canon(v) for v in r) for r in expected_rows]
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}\n got={got}\n exp={exp}"
    for g, e in zip(got, exp):
        assert len(g) == len(e) and all(_eq(x, y) for x, y in zip(g, e)), (
            f"row mismatch: got {g}, expected {e}\nall got={got}\nall exp={exp}"
        )


def assert_series_equal(actual: Series, expected_obs: list[tuple]):
    """Compare a Series against literal (key..., value) observations."""
    assert_rows_equal(actual.df, expected_obs, actual.key_cols)


def assert_frame_equal(actual: Frame, expected_rows: list[tuple], columns: list[str] | None = None):
    df = actual.df.select(*(columns or actual.df.columns))
    assert_rows_equal(df, expected_rows, actual.key_cols or df.columns[:1])
