"""Round-9 operator pins: hot-key guards on the remaining per-key
Arrow folds (r8 VERDICT ask #6) and round-9 additions."""

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.series import Series


# --- hot-key guard on per-key Arrow folds --------------------------------


def _hot_df(spark, n_hot=100):
    rows = [("hot", i, float(i)) for i in range(n_hot)] + \
        [("cold", 0, 1.0)]
    return spark.createDataFrame(rows, "by string, k long, v double")


def test_guard_arrow_group_trips_on_planted_hot_key_while(spark, monkeypatch):
    import fsharp_dataframe_spark.functions.util as U
    from pyspark.errors.exceptions.captured import PythonException

    monkeypatch.setattr(U, "MAX_ARROW_GROUP_ROWS", 50)
    s = Series(_hot_df(spark), key=["by", "k"], value="v", ordered=True)
    out = s.chunk_while_into(lambda a, b: b - a < 5,
                             lambda seg: float(seg["v"].sum()), by=["by"])
    with pytest.raises(PythonException, match="max_group_rows"):
        out.df.collect()


def test_guard_arrow_group_trips_on_planted_hot_key_ewma(spark, monkeypatch):
    import fsharp_dataframe_spark.functions.util as U
    from pyspark.errors.exceptions.captured import PythonException

    monkeypatch.setattr(U, "MAX_ARROW_GROUP_ROWS", 50)
    s = Series(_hot_df(spark), key=["by", "k"], value="v", ordered=True)
    with pytest.raises(PythonException, match="max_group_rows"):
        s.ewma(0.5, by=["by"]).df.collect()


def test_guard_arrow_group_passes_under_bound_and_apply_in_pandas(spark):
    import pandas as pd
    from pyspark.errors.exceptions.captured import PythonException

    s = Series(_hot_df(spark), key=["by", "k"], value="v", ordered=True)
    # under the default bound everything works unchanged
    got = {r["by"] for r in
           s.chunk_while_into(lambda a, b: b - a < 1000,
                              lambda seg: float(seg["v"].sum()),
                              by=["by"]).df.collect()}
    assert got == {"hot", "cold"}

    # user whole-group lambda path: explicit per-call bound
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.groupby("by", as_index=False).agg(n=("v", "size"))

    gb = s.group_by_level([0])
    ok = gb.apply_in_pandas(fn, "by string, n long").collect()
    assert {(r["by"], r["n"]) for r in ok} == {("hot", 100), ("cold", 1)}
    with pytest.raises(PythonException, match="max_group_rows"):
        gb.apply_in_pandas(fn, "by string, n long",
                           max_group_rows=50).collect()
