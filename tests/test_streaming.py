"""Structured-Streaming variants (fsharp_dataframe_spark/streaming):
each streaming plan, driven to completion over a static parquet
directory (availableNow + memory sink), must agree with its batch
analog on the same data."""

import shutil

import pytest
from pyspark.sql import functions as F

from fsharp_dataframe_spark.sources.parquet import load_table
from fsharp_dataframe_spark.streaming import (
    read_stream_parquet,
    run_to_memory,
    stream_exact_dedup,
    stream_latest_by,
    stream_sample_time,
    stream_session_windows,
    stream_text_quality,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    # re-write the events table as a 4-file directory so the stream
    # sees several micro-batches; ns timestamps normalized by load_table
    d = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(d, ignore_errors=True)
    load_table(spark, SF, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def _events_stream(spark, d):
    batch = load_table(spark, SF, "events")
    return read_stream_parquet(spark, d, batch.schema)


def test_stream_sample_time_matches_batch(spark, events_stream_dir):
    s = _events_stream(spark, events_stream_dir)
    out = stream_sample_time(s, "6 hours", {"n": F.count("*"), "v": F.round(F.sum("value"), 4)})
    # complete mode so the final (still-open) window is also emitted —
    # append mode correctly withholds windows the watermark hasn't closed
    name = run_to_memory(out, "t_sample", output_mode="complete")
    got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}
    exp = {
        tuple(r)
        for r in load_table(spark, SF, "events")
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
        .select(F.col("w.start").alias("bucket"), "n", "v")
        .collect()
    }
    assert got == exp


def test_stream_exact_dedup(spark, events_stream_dir):
    s = _events_stream(spark, events_stream_dir)
    out = stream_exact_dedup(s, ["user_id"])
    name = run_to_memory(out, "t_dedup")
    got = spark.sql(f"SELECT count(*) AS n, count(DISTINCT user_id) AS d FROM {name}").collect()[0]
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert got["n"] == got["d"] == n_users


def test_stream_latest_by_matches_batch(spark, events_stream_dir):
    s = _events_stream(spark, events_stream_dir)
    out = stream_latest_by(s, ["user_id"])
    name = run_to_memory(out, "t_latest", output_mode="complete")
    got = {r["user_id"]: (r["latest_value"], r["latest_ts"])
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    exp = {r["user_id"]: (r["lv"], r["lt"])
           for r in load_table(spark, SF, "events").groupBy("user_id")
           .agg(F.max_by("value", "ts").alias("lv"), F.max("ts").alias("lt")).collect()}
    assert got == exp


def test_stream_session_windows_runs(spark, events_stream_dir):
    s = _events_stream(spark, events_stream_dir)
    out = stream_session_windows(s, "2 hours", ["user_id"])
    name = run_to_memory(out, "t_sessions", output_mode="complete")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(rows) > 0
    # sessions are per-user, start <= end, and cover every event
    assert all(r["session_start"] <= r["session_end"] and r["n_events"] >= 1 for r in rows)
    total = sum(r["n_events"] for r in rows)
    assert total == load_table(spark, SF, "events").count()


def test_stream_text_quality_stateless(spark):
    docs = load_table(spark, SF, "documents")
    import tempfile

    d = tempfile.mkdtemp(prefix="docs_stream")
    docs.repartition(2).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, docs.schema)
    out = stream_text_quality(s).select("doc_id", "n_tokens", "lang_pred")
    name = run_to_memory(out, "t_text")
    got = {r["doc_id"]: (r["n_tokens"], r["lang_pred"])
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    from fsharp_dataframe_spark.functions import text as TX

    exp = {r["doc_id"]: (r["n_tokens"], r["lang_pred"])
           for r in docs.select("doc_id", TX.token_count(F.col("text")).alias("n_tokens"),
                                TX.lang_id(F.col("text")).alias("lang_pred")).collect()}
    assert got == exp
