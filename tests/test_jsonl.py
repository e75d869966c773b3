"""JSONL source/sink (sources/jsonl.py): round-trip, bounded-sample
schema inference, corrupt-line quarantine, NaN canonicalization."""

import json
import os

from pyspark.sql import functions as F

from fsharp_dataframe_spark.sources.jsonl import (
    corrupt_lines, read_jsonl, write_jsonl,
)
from fsharp_dataframe_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _write_lines(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines))


def test_jsonl_round_trip_documents(spark, tmp_path):
    docs = load_table(spark, SF, "documents").limit(200)
    from fsharp_dataframe_spark.frame import Frame

    out = str(tmp_path / "docs_jsonl")
    write_jsonl(Frame(docs, key="doc_id"), out)
    back = read_jsonl(spark, out, key="doc_id",
                      schema=docs.schema)
    a = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    b = {r["doc_id"]: r["text"] for r in back.df.select("doc_id", "text").collect()}
    assert a == b


def test_jsonl_explicit_schema_skips_inference_and_quarantines(spark, tmp_path):
    p = str(tmp_path / "mixed.jsonl")
    _write_lines(p, [
        json.dumps({"doc_id": 1, "text": "hello world", "score": 0.5}),
        json.dumps({"doc_id": 2, "text": "second", "score": None}),
        '{"doc_id": 3, "text": "truncated...',          # corrupt
        "not json at all",                                # corrupt
        json.dumps({"doc_id": 4, "text": "fourth", "score": 1.25}),
    ])
    fr = read_jsonl(spark, p, schema="doc_id long, text string, score double")
    rows = {r["doc_id"]: (r["text"], r["score"]) for r in fr.df.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[2] == ("second", None)
    bad = [r["raw_line"] for r in corrupt_lines(
        spark, p, schema="doc_id long, text string, score double").collect()]
    assert len(bad) == 2
    assert "not json at all" in bad


def test_jsonl_sampled_inference_bounds_the_pass(spark, tmp_path):
    p = str(tmp_path / "sampled.jsonl")
    # field `late` appears only after the sample window: with bounded
    # inference it must read as absent (no column), NOT fail the read
    lines = [json.dumps({"doc_id": i, "text": f"doc {i}"}) for i in range(50)]
    lines.append(json.dumps({"doc_id": 50, "text": "tail", "late": "x"}))
    _write_lines(p, lines)
    fr = read_jsonl(spark, p, infer_sample=10)
    assert set(fr.df.columns) == {"doc_id", "text"}
    assert fr.df.count() == 51


def test_jsonl_nan_becomes_null(spark, tmp_path):
    p = str(tmp_path / "nan.jsonl")
    _write_lines(p, [
        '{"doc_id": 1, "score": NaN}',
        '{"doc_id": 2, "score": 2.5}',
    ])
    fr = read_jsonl(spark, p, schema="doc_id long, score double")
    rows = {r["doc_id"]: r["score"] for r in fr.df.collect()}
    assert rows[1] is None and rows[2] == 2.5
    # and the aggregate skips it, per the missing model
    assert fr.df.agg(F.avg("score")).first()[0] == 2.5
