"""fsharp_dataframe_spark — a PySpark-native series/frame analytics engine.

A brand-new engine with the query/data-processing capabilities of
``Andy-P/FSharp.DataFrame`` (the ancestor of Deedle), re-expressed as
idiomatic Spark DataFrame transformations.  See SURVEY.md for the
blueprint; every operator cites the reference behavior it reproduces
(citations are ``file:line`` into /root/reference, used only to pin
*semantics* — no code is ported).

Design stance (SURVEY.md §7.0):

- ``Series``  = a DataFrame of ``key_cols + [value_col]`` plus metadata
  ``{key_cols, value_col, ordered}``.
- ``Frame``   = a DataFrame of ``key_cols + data columns`` plus the same
  metadata.
- Missing     = SQL NULL.  Float NaN is canonicalized to NULL at every
  construction boundary (reference ``isNA``: src/Common/Common.fs:264-276).
- Ordered-only operators (windowing, resampling, as-of) assert the
  ``ordered`` flag, matching the reference's ``invalidOp``
  (src/Indices/LinearIndex.fs:210-211, 263-264).
- Everything compiles to Column expressions / built-in functions so that
  Catalyst plans it and whole-stage codegen applies; ``applyInPandas`` is
  reserved for whole-group user lambdas (SURVEY.md §2.11).
"""

from fsharp_dataframe_spark.session import get_spark
from fsharp_dataframe_spark.series import Series
from fsharp_dataframe_spark.frame import Frame
from fsharp_dataframe_spark.missing import nan_to_null, canonicalize_missing
from fsharp_dataframe_spark.functions.util import cache_scope, release_cached

__all__ = ["get_spark", "Series", "Frame", "nan_to_null",
           "canonicalize_missing", "cache_scope", "release_cached"]

__version__ = "0.1.0"
