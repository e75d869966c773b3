"""JSON-Lines ingest/egress — the LLM-corpus interchange format.

The reference stops at CSV (src/FrameExtensions.fs:45-78); a
training-data pipeline lives on JSONL (one document object per line:
WebText/C4/RedPajama-style dumps), so this source is parity-plus.
Everything maps onto Spark's native json reader/writer — splittable,
distributed, schema-on-read — with three 100 TB-minded choices:

- **Explicit schema by default.** ``spark.read.json`` without a schema
  runs a FULL extra pass over the data just to infer one; at corpus
  scale that doubles the read.  ``read_jsonl(schema=...)`` skips the
  pass entirely; ``infer_sample`` infers from a bounded sample instead
  (one cheap job on ``limit(n)``), then enforces the result.
- **Corrupt lines are data, not exceptions.**  Real crawl dumps carry
  truncated/garbled lines; mode=PERMISSIVE + ``_corrupt_record``
  quarantines them as rows (filterable, countable) instead of failing
  a 10-hour job (FAILFAST) or silently dropping them (DROPMALFORMED).
- **Missing-value parity.**  JSON ``null``/absent fields arrive as
  NULL already; explicit ``NaN`` literals in numeric fields are
  canonicalized to NULL to match the engine's missing model
  (SURVEY §1.4) — same contract as the CSV source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, FloatType, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark, path: str, key=None, schema: StructType | str | None = None,
               infer_sample: int | None = None, keep_corrupt: bool = False):
    """JSONL → Frame.

    schema: explicit StructType/DDL string (the scale path — no
    inference pass).  infer_sample: infer from the first n lines only,
    then read the full data WITH that schema (bounded inference cost;
    fields missing from the sample read as NULL rather than failing).
    With neither, falls back to Spark's full inference pass (fine for
    small files, documented-slow at corpus scale).

    keep_corrupt: keep the ``_corrupt_record`` quarantine column on the
    result (else unparseable lines are still counted but dropped —
    use corrupt_lines() to audit them).
    """
    from fsharp_dataframe_spark.frame import Frame

    if schema is None and infer_sample is not None:
        sampled = spark.read.json(spark.read.text(path).limit(infer_sample)
                                  .rdd.map(lambda r: r[0]))
        schema = sampled.schema
    if schema is None:
        # full-inference fallback: one extra pass over the data just
        # for the schema — fine for small files, documented-slow at
        # corpus scale (prefer schema=... or infer_sample=...)
        schema = spark.read.json(path).schema
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    schema = StructType([f for f in schema.fields if f.name != CORRUPT_COL])
    parse_schema = schema.add(CORRUPT_COL, "string", True)
    # text scan + from_json instead of spark.read.json: same parse cost
    # and schema pruning (OptimizeJsonExprs), but the corrupt-record
    # quarantine stays an ordinary column — the json datasource refuses
    # any downstream query that prunes to the corrupt column alone
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which a filter+drop+count
    # pipeline hits immediately
    raw = spark.read.text(path).filter(F.trim("value") != "")
    df = raw.select(F.from_json(
        "value", parse_schema,
        {"columnNameOfCorruptRecord": CORRUPT_COL}).alias("__j")).select("__j.*")
    df = _canonicalize_nan(df)
    if not keep_corrupt:
        df = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return Frame(df, key=key)


def corrupt_lines(spark, path: str, schema: StructType | str | None = None) -> DataFrame:
    """The quarantine view: raw lines that failed to parse.  One narrow
    text scan + from_json (malformed → NULL struct) — Spark refuses
    corrupt-column-only queries on raw JSON scans
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) and the documented workaround
    (cache the parse) is exactly what a 100 TB audit can't afford.
    At scale this is the query a pipeline runs before trusting a dump."""
    fr = read_jsonl(spark, path, schema=schema,
                    infer_sample=None if schema is not None else 1000,
                    keep_corrupt=True)
    # the corrupt column is populated with the raw line on parse
    # failure (and NULL on success — {} parses to all-NULL fields with
    # a NULL corrupt column, so the two are distinguishable)
    return (fr.df.filter(F.col(CORRUPT_COL).isNotNull())
            .select(F.col(CORRUPT_COL).alias("raw_line")))


def write_jsonl(frame, path: str, mode: str = "overwrite",
                compression: str | None = None) -> None:
    """Frame → JSONL directory (one part file per partition — the
    shape downstream distributed readers want; use coalesce(1)
    upstream only for tiny exports)."""
    w = frame.df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def _canonicalize_nan(df: DataFrame) -> DataFrame:
    """JSON can carry literal NaN in double fields (Spark parses it via
    allowNonNumericNumbers); the engine's missing model treats NaN as
    missing (SURVEY §1.4), so normalize on entry like every source."""
    float_cols = [f.name for f in df.schema.fields
                  if isinstance(f.dataType, (DoubleType, FloatType))]
    if not float_cols:
        return df
    return df.withColumns({
        c: F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c))
        for c in float_cols
    })
