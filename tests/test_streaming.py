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


def test_stream_near_dup_candidates_match_batch_bands(spark, tmp_path):
    # the stream-stream band join must produce exactly the batch LSH
    # candidate pairs (same xxhash64 signature family) for docs within
    # one watermark horizon of each other
    import datetime

    from fsharp_dataframe_spark.functions.dedup import minhash_lsh_pairs
    from fsharp_dataframe_spark.streaming.ops import stream_near_dup_candidates

    docs = load_table(spark, SF, "documents").limit(120)
    t0 = datetime.datetime(2024, 1, 1)
    timed = docs.select(
        "doc_id", "text",
        F.to_timestamp(F.lit(t0) + F.make_interval(
            secs=F.col("doc_id").cast("double") % 60)).alias("ts"))
    d = str(tmp_path / "docs_stream")
    timed.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, timed.schema)
    out = stream_near_dup_candidates(s, watermark="10 minutes")
    name = run_to_memory(out, "t_neardup")
    got = {(r["id_a"], r["id_b"])
           for r in spark.sql(f"SELECT DISTINCT id_a, id_b FROM {name}").collect()}
    # batch candidates = pairs sharing any band (threshold 0: keep all
    # LSH collisions, the candidate tier the stream mirrors)
    exp = {(r["id_a"], r["id_b"])
           for r in minhash_lsh_pairs(timed, threshold=0.0).collect()}
    assert got == exp
    assert got, "planted duplicates must collide"


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


@pytest.mark.slow
def test_stream_fill_forward_state_survives_batches_and_restart(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-entity
    LOCF fill whose carry must survive (a) micro-batch boundaries and
    (b) a full stop/start cycle through the checkpoint.  Phase 2's
    first rows are missing for every key — they can only be filled
    from phase 1's state."""
    from datetime import datetime

    from fsharp_dataframe_spark.streaming import stream_fill_forward

    d = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id int, ts timestamp, value double"

    def ts(h):
        return datetime(2024, 1, 1, h)

    phase1 = [(1, ts(0), 10.0), (1, ts(1), None), (1, ts(2), 20.0),
              (2, ts(0), None), (2, ts(1), 5.0)]
    phase2 = [(1, ts(3), None), (1, ts(4), 30.0),
              (2, ts(3), None), (2, ts(4), None)]

    outdir = str(tmp_path / "out")

    def run_phase(batch_schema):
        # memory sink cannot recover from a checkpoint — a file sink can
        q = (stream_fill_forward(read_stream_parquet(spark, d, batch_schema))
             .writeStream.outputMode("append").format("parquet")
             .option("path", outdir).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    spark.createDataFrame(phase1, schema).coalesce(1).write.mode("overwrite").parquet(d)
    batch_schema = spark.read.parquet(d).schema
    run_phase(batch_schema)
    got1 = {(r["user_id"], r["ts"]): r["value"]
            for r in spark.read.parquet(outdir).collect()}
    assert got1[(1, ts(1))] == 10.0      # filled within the batch
    assert got1[(2, ts(0))] is None      # nothing before it to carry

    spark.createDataFrame(phase2, schema).coalesce(1).write.mode("append").parquet(d)
    run_phase(batch_schema)
    got2 = {(r["user_id"], r["ts"]): r["value"]
            for r in spark.read.parquet(outdir).collect()}
    # the restarted query processes ONLY the new file (checkpoint),
    # filling its leading missing rows from the carried state
    assert got2[(1, ts(3))] == 20.0      # phase-1 carry across restart
    assert got2[(1, ts(4))] == 30.0
    assert got2[(2, ts(3))] == 5.0
    assert got2[(2, ts(4))] == 5.0
    assert len(got2) == len(phase1) + len(phase2)


def test_stateless_pipeline_ops_run_on_streams(spark, tmp_path):
    # hash_split / quality gates / PII scrub are pure narrow
    # projections, so the SAME functions apply to a readStream
    # DataFrame unchanged — the unified-API ingest story: label and
    # gate documents at ingest time, no batch/stream code fork
    from fsharp_dataframe_spark.functions.sampling import hash_split
    from fsharp_dataframe_spark.functions.text import quality_score, scrub_pii

    docs = load_table(spark, SF, "documents").limit(100)
    d = str(tmp_path / "docs_split_stream")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, docs.schema)
    out = hash_split(s, "doc_id", {"train": 0.9, "test": 0.1}, salt="s").select(
        "doc_id", "split", F.round(quality_score(F.col("text")), 4).alias("q"),
        scrub_pii(F.col("text")).alias("clean"))
    name = run_to_memory(out, "t_stateless")
    got = {(r["doc_id"], r["split"], r["q"])
           for r in spark.sql(f"SELECT doc_id, split, q FROM {name}").collect()}
    exp = {(r["doc_id"], r["split"], r["q"])
           for r in hash_split(docs, "doc_id", {"train": 0.9, "test": 0.1}, salt="s")
           .select("doc_id", "split",
                   F.round(quality_score(F.col("text")), 4).alias("q")).collect()}
    assert got == exp and len(got) == 100


def test_stream_decontaminate_matches_batch(spark, tmp_path):
    from fsharp_dataframe_spark.functions.dedup import contamination_overlap
    from fsharp_dataframe_spark.streaming import stream_decontaminate

    docs = load_table(spark, SF, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    d = str(tmp_path / "train_stream")
    train.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, train.schema)
    name = run_to_memory(stream_decontaminate(s, bench, max_hits=0),
                         "t_decontam")
    got = {r["doc_id"] for r in
           spark.sql(f"SELECT doc_id FROM {name}").collect()}
    # batch oracle: docs with zero benchmark-shingle hits
    exp = {r["doc_id"] for r in
           contamination_overlap(train, bench)
           .filter(F.col("n_hit") == 0).collect()}
    assert got == exp and got


def test_stream_repetition_filter_matches_batch(spark, tmp_path):
    from fsharp_dataframe_spark.functions.quality import repetition_filter
    from fsharp_dataframe_spark.streaming import stream_repetition_filter

    rows = [(1, " ".join(["spam"] * 40)),
            (2, " ".join(f"w{i}" for i in range(40))),
            (3, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "rep_stream")
    docs.repartition(2).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, docs.schema)
    name = run_to_memory(stream_repetition_filter(s), "t_repfilter")
    got = {r["doc_id"] for r in
           spark.sql(f"SELECT doc_id FROM {name}").collect()}
    exp = {r["doc_id"] for r in repetition_filter(docs).collect()}
    assert got == exp == {2, 3}


def test_stream_corpus_stats_matches_batch(spark, tmp_path):
    from fsharp_dataframe_spark.streaming import stream_corpus_stats

    docs = load_table(spark, SF, "documents")
    d = str(tmp_path / "docs_stats_stream")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, docs.schema)
    name = run_to_memory(stream_corpus_stats(s), "t_cstats",
                         output_mode="complete")
    got = {tuple(r) for r in spark.sql(
        f"SELECT lang, n_docs, total_tokens, mean_quality FROM {name}").collect()}
    exp = {tuple(r) for r in stream_corpus_stats(docs).collect()}
    assert got == exp and len(got) >= 2


def test_stream_corpus_stats_matches_duckdb_oracle(spark, tmp_path):
    """The HARD streaming signal (r4 VERDICT ask #7): the streaming
    rollup's output is compared against the BATCH ORACLE SQL — the
    same DuckDB contract the driver applies to q_corpus_stats — not
    merely against the batch run of the same Spark code.  The stream
    omits the exact percentiles (unbounded state), so the oracle is
    projected to the streaming columns; the strict comparator (dtype
    kind + exact values) is the one tools/check_oracle.py uses."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming import stream_corpus_stats

    docs = load_table(spark, SF, "documents")
    d = str(tmp_path / "docs_oracle_stream")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, docs.schema)
    name = run_to_memory(stream_corpus_stats(s), "t_cstats_oracle",
                         output_mode="complete")
    got = spark.sql(
        f"SELECT lang, n_docs, total_tokens, mean_quality FROM {name}"
    ).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    oracle = con.execute(
        "SELECT lang, n_docs, total_tokens, mean_quality FROM ("
        + entrymod._all_oracle_sql()["corpus_stats"] + ")").df()
    con.close()
    problems = compare("stream_corpus_stats", got, oracle)
    assert not problems, "; ".join(problems)


def _latest_summary(spark, name):
    # update-mode memory sink appends each batch's emissions; the
    # current summary for a token is its LAST emitted row
    return spark.sql(f"""
        SELECT shard, token, est_count, max_err FROM (
          SELECT *, row_number() OVER (PARTITION BY shard, token
            ORDER BY mono DESC) AS rn
          FROM (SELECT *, monotonically_increasing_id() AS mono FROM {name}))
        WHERE rn = 1""")


def test_stream_vocab_heavy_hitters_exact_when_state_fits(spark, tmp_path):
    # with m larger than any shard's vocabulary, Misra-Gries never
    # decrements: every emitted count is EXACT and equals the batch
    # vocab count, with max_err = 0
    from fsharp_dataframe_spark.functions.text import tokens
    from fsharp_dataframe_spark.streaming import stream_vocab_heavy_hitters

    docs = load_table(spark, SF, "documents")
    d = str(tmp_path / "vocab_stream")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, docs.schema)
    name = run_to_memory(stream_vocab_heavy_hitters(s, m=100_000),
                         "t_vocab_exact", output_mode="update")
    got = {r["token"]: (r["est_count"], r["max_err"])
           for r in _latest_summary(spark, name).collect()}
    exp = {r["token"]: r["n"] for r in docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token").agg(F.count("*").alias("n")).collect()}
    assert {t: c for t, (c, _) in got.items()} == exp
    assert all(e == 0 for _, e in got.values())


def test_stream_vocab_heavy_hitters_bounded_state_small_m(spark, tmp_path):
    # with a tiny m the summary must stay bounded (<= m counters per
    # shard) and every emitted estimate must satisfy the Misra-Gries
    # bound est <= true <= est + max_err against the batch truth
    from fsharp_dataframe_spark.functions.text import tokens
    from fsharp_dataframe_spark.streaming import stream_vocab_heavy_hitters

    docs = load_table(spark, SF, "documents")
    d = str(tmp_path / "vocab_stream_small")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, docs.schema)
    name = run_to_memory(stream_vocab_heavy_hitters(s, m=5, n_shards=4),
                         "t_vocab_small", output_mode="update")
    summary = _latest_summary(spark, name).collect()
    per_shard = {}
    for r in summary:
        per_shard.setdefault(r["shard"], []).append(r)
    assert per_shard and all(len(v) <= 5 for v in per_shard.values())
    exp = {r["token"]: r["n"] for r in docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token").agg(F.count("*").alias("n")).collect()}
    for r in summary:
        true = exp[r["token"]]
        assert r["est_count"] <= true <= r["est_count"] + r["max_err"], r


@pytest.mark.slow
def test_stream_vocab_heavy_hitters_state_survives_restart(spark, tmp_path):
    """The Misra-Gries summaries must accumulate across a stop/start
    cycle: phase 2's counts add onto phase 1's checkpointed state, so
    the final estimate for a token seen in both phases is the TOTAL."""
    from fsharp_dataframe_spark.streaming import stream_vocab_heavy_hitters

    d = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")
    schema = "doc_id int, text string"

    def sink(batch_df, batch_id):
        # parquet sinks reject update mode; foreachBatch is the
        # standard recoverable escape hatch for update-mode stateful
        # output (it still replays through the checkpoint)
        batch_df.write.mode("append").parquet(outdir)

    def run_phase(batch_schema):
        q = (stream_vocab_heavy_hitters(
                read_stream_parquet(spark, d, batch_schema), m=1000)
             .writeStream.outputMode("update").foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    phase1 = [(1, "alpha beta alpha"), (2, "beta gamma")]
    phase2 = [(3, "alpha delta"), (4, "beta beta")]
    spark.createDataFrame(phase1, schema).coalesce(1).write.mode("overwrite").parquet(d)
    batch_schema = spark.read.parquet(d).schema
    run_phase(batch_schema)
    spark.createDataFrame(phase2, schema).coalesce(1).write.mode("append").parquet(d)
    run_phase(batch_schema)
    rows = spark.read.parquet(outdir).collect()
    latest = {}
    for r in rows:  # last write wins: phase-2 emissions carry totals
        latest[r["token"]] = max(latest.get(r["token"], 0), r["est_count"])
    assert latest["alpha"] == 3   # 2 in phase 1 + 1 in phase 2
    assert latest["beta"] == 4    # 2 + 2
    assert latest["gamma"] == 1 and latest["delta"] == 1


def test_c4_filter_runs_on_streams(spark, tmp_path):
    # c4_filter is pure Column expressions, so the SAME gate applies
    # to a readStream DataFrame unchanged and keeps exactly the batch
    # survivors
    from fsharp_dataframe_spark.functions.quality import c4_filter

    docs = load_table(spark, SF, "documents").limit(150)
    d = str(tmp_path / "docs_c4_stream")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, docs.schema)
    name = run_to_memory(
        c4_filter(s, min_terminal_punct_frac=0.0).select("doc_id"),
        "t_c4_stream")
    got = {r["doc_id"] for r in spark.sql(
        f"SELECT doc_id FROM {name}").collect()}
    exp = {r["doc_id"] for r in
           c4_filter(docs, min_terminal_punct_frac=0.0)
           .select("doc_id").collect()}
    assert got == exp and got


def test_stream_sessions_match_batch_sessionize(spark, events_stream_dir):
    """Stream session_window vs batch functions/events.sessionize on the
    same data.  The engines disagree only when a consecutive same-user
    gap is EXACTLY the session gap (session_window splits at >= gap,
    the batch operator at > gap — both published conventions), so first
    prove the corpus has no exact-gap adjacency, then require identical
    per-user session counts and identical total event coverage."""
    from pyspark.sql import Window

    from fsharp_dataframe_spark.functions.events import sessionize

    GAP_S = 7200
    ev = load_table(spark, SF, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    exact_gap = (ev.withColumn("_d", us - F.lag(us).over(w))
                 .filter(F.col("_d") == GAP_S * 1_000_000).count())
    assert exact_gap == 0, "corpus hits the boundary; pick another gap"

    s = _events_stream(spark, events_stream_dir)
    name = run_to_memory(stream_session_windows(s, "2 hours", ["user_id"]),
                         "t_sessions_eq", output_mode="complete")
    got = {(r["user_id"], r["n_sessions"], r["n_events"]) for r in spark.sql(
        f"SELECT user_id, count(*) AS n_sessions, sum(n_events) AS n_events "
        f"FROM {name} GROUP BY user_id").collect()}
    exp = {(r["user_id"], r["n_sessions"], r["n_events"]) for r in
           sessionize(ev, gap_seconds=GAP_S)
           .groupBy("user_id")
           .agg(F.countDistinct("session_idx").alias("n_sessions"),
                F.count("*").alias("n_events")).collect()}
    assert got == exp


def test_stream_funnel_matches_batch_single_batch(spark, events_stream_dir):
    """One availableNow batch ⇒ each key's full history replays in
    event-time order, so per-level counts (keys with max stage >= k)
    must equal the batch funnel exactly."""
    from fsharp_dataframe_spark.functions.events import funnel
    from fsharp_dataframe_spark.streaming.ops import stream_funnel_state

    steps = ["view", "click", "purchase"]
    s = _events_stream(spark, events_stream_dir)
    name = run_to_memory(stream_funnel_state(s, steps), "t_funnel_eq")
    rows = spark.sql(
        f"SELECT user_id, max(stage) AS st FROM {name} GROUP BY user_id"
    ).collect()
    got = {k: sum(1 for r in rows if r["st"] >= k) for k in (1, 2, 3)}
    exp = {r["step_idx"]: r["n_keys"]
           for r in funnel(load_table(spark, SF, "events"), steps).collect()}
    assert got == exp


@pytest.mark.slow
def test_stream_funnel_state_carries_across_restart(spark, tmp_path):
    """A key that did 'view' in phase 1 and 'click' in phase 2 advances
    to stage 2 only if phase 1's anchor survived the checkpoint."""
    from datetime import datetime

    from fsharp_dataframe_spark.streaming.ops import stream_funnel_state

    d = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")
    schema = "user_id int, ts timestamp, event_type string"

    def ts(h):
        return datetime(2024, 1, 1, h)

    phase1 = [(1, ts(0), "view"), (2, ts(0), "click")]
    phase2 = [(1, ts(2), "click"), (2, ts(2), "view"), (1, ts(3), "purchase")]

    def run_phase(batch_schema):
        q = (stream_funnel_state(
                read_stream_parquet(spark, d, batch_schema),
                ["view", "click", "purchase"])
             .writeStream.outputMode("append").format("parquet")
             .option("path", outdir).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    spark.createDataFrame(phase1, schema).coalesce(1).write.mode("overwrite").parquet(d)
    batch_schema = spark.read.parquet(d).schema
    run_phase(batch_schema)
    spark.createDataFrame(phase2, schema).coalesce(1).write.mode("append").parquet(d)
    run_phase(batch_schema)

    rows = spark.read.parquet(outdir).collect()
    final = {}
    for r in rows:
        final[r["user_id"]] = max(final.get(r["user_id"], 0), r["stage"])
    # user 1: view → click → purchase across the restart = stage 3
    # user 2: click BEFORE its view never counts; view in phase 2 = stage 1
    assert final == {1: 3, 2: 1}


def test_stream_funnel_multi_chunk_group_is_time_ordered(spark, tmp_path):
    """Force the Arrow iterator to split one key's batch into many
    chunks (maxRecordsPerBatch=4): the replay must still be globally
    event-time ordered, so a progression whose steps land in different
    chunks is not missed."""
    from datetime import datetime, timedelta

    from fsharp_dataframe_spark.streaming.ops import stream_funnel_state

    d = str(tmp_path / "in")
    schema = "user_id int, ts timestamp, event_type string"
    base = datetime(2024, 1, 1)
    # 30 events for ONE user, written in REVERSE time order so chunk 1
    # holds the latest events; correct replay still finds
    # view(t0) -> click(t1) -> purchase(t2)
    rows = [(1, base + timedelta(seconds=29 - i), "error") for i in range(27)]
    rows += [(1, base + timedelta(seconds=0), "view"),
             (1, base + timedelta(seconds=1), "click"),
             (1, base + timedelta(seconds=2), "purchase")]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(d)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        s = read_stream_parquet(spark, d, spark.read.parquet(d).schema)
        name = run_to_memory(
            stream_funnel_state(s, ["view", "click", "purchase"]),
            "t_funnel_chunks")
        stages = [r["stage"] for r in
                  spark.sql(f"SELECT stage FROM {name}").collect()]
        assert max(stages) == 3
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_chunk_documents_runs_on_streams(spark, tmp_path):
    # chunk_documents is a pure narrow Column map (tokens -> explode ->
    # slice), so the SAME chunker applies to a readStream DataFrame
    # unchanged and yields exactly the batch chunk set — the streaming
    # half of the chunk -> pack ingest story (pack_shards stays batch:
    # a global prefix sum has no bounded-state streaming analog)
    from fsharp_dataframe_spark.functions.sampling import chunk_documents

    docs = load_table(spark, SF, "documents").limit(120)
    d = str(tmp_path / "docs_chunk_stream")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, docs.schema)
    name = run_to_memory(
        chunk_documents(s, max_tokens=32, overlap=4), "t_chunk_stream")
    got = {(r["doc_id"], r["chunk_id"], r["chunk_text"])
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    exp = {(r["doc_id"], r["chunk_id"], r["chunk_text"])
           for r in chunk_documents(docs, max_tokens=32, overlap=4).collect()}
    assert got == exp and got


def test_stream_ewma_matches_batch_and_carries_state(spark, tmp_path):
    """Streaming EWMA: one double of state per key; a single-batch run
    must equal the batch Series.ewma to float tolerance, and phase 2
    must continue the recurrence from phase 1's checkpointed state."""
    from datetime import datetime

    import numpy as np

    from fsharp_dataframe_spark import Series
    from fsharp_dataframe_spark.streaming import stream_ewma

    d = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")
    schema = "user_id int, ts timestamp, value double"

    def ts(h):
        return datetime(2024, 1, 1, h)

    phase1 = [(1, ts(0), 10.0), (1, ts(1), None), (1, ts(2), 20.0),
              (2, ts(0), 8.0), (2, ts(1), 4.0)]
    phase2 = [(1, ts(3), 30.0), (2, ts(2), 2.0)]

    def run_phase(batch_schema):
        q = (stream_ewma(read_stream_parquet(spark, d, batch_schema), 0.5)
             .writeStream.outputMode("append").format("parquet")
             .option("path", outdir).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    spark.createDataFrame(phase1, schema).coalesce(1).write.mode("overwrite").parquet(d)
    batch_schema = spark.read.parquet(d).schema
    run_phase(batch_schema)
    got1 = {(r["user_id"], r["ts"]): r["value"]
            for r in spark.read.parquet(outdir).collect()}
    # null row dropped, not emitted
    assert (1, ts(1)) not in got1 and len(got1) == 4
    # single-batch outputs == batch operator
    batch = Series(spark.createDataFrame(phase1, schema),
                   key=["user_id", "ts"], value="value", ordered=True)
    exp = {(r["user_id"], r["ts"]): r["value"]
           for r in batch.ewma(0.5, by=["user_id"]).df.collect()}
    assert set(got1) == set(exp)
    for k in exp:
        assert np.isclose(got1[k], exp[k], rtol=1e-12), k

    spark.createDataFrame(phase2, schema).coalesce(1).write.mode("append").parquet(d)
    run_phase(batch_schema)
    got2 = {(r["user_id"], r["ts"]): r["value"]
            for r in spark.read.parquet(outdir).collect()}
    # continues from phase-1 state: u1 y=.5*15+.5*30, u2 y=.5*6+.5*2
    assert np.isclose(got2[(1, ts(3))], 22.5)
    assert np.isclose(got2[(2, ts(2))], 4.0)


def test_stream_rolling_corr_matches_batch_and_carries_ring(spark, tmp_path):
    """Streaming rolling corr: ring-buffer state bounded by n; a
    single-batch run equals Frame.rolling_corr per key, and phase 2's
    windows span the restart boundary through the checkpointed ring."""
    from datetime import datetime

    import numpy as np

    from fsharp_dataframe_spark import Frame
    from fsharp_dataframe_spark.streaming import stream_rolling_corr

    d = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")
    schema = "user_id int, ts timestamp, x double, y double"

    def ts(h):
        return datetime(2024, 1, 1, h)

    rng = np.random.default_rng(9)
    phase1 = [(u, ts(h), float(rng.normal()), float(rng.normal()))
              for u in (1, 2) for h in range(8)]
    phase2 = [(1, ts(9), 1.5, -0.5), (2, ts(9), 0.25, 2.0)]

    def run_phase(batch_schema):
        q = (stream_rolling_corr(
                read_stream_parquet(spark, d, batch_schema), 4, "x", "y")
             .writeStream.outputMode("append").format("parquet")
             .option("path", outdir).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    spark.createDataFrame(phase1, schema).coalesce(1).write.mode("overwrite").parquet(d)
    batch_schema = spark.read.parquet(d).schema
    run_phase(batch_schema)
    got1 = {(r["user_id"], r["ts"]): r["rolling_corr"]
            for r in spark.read.parquet(outdir).collect()}
    fr = Frame(spark.createDataFrame(phase1, schema),
               key=["user_id", "ts"], ordered=True)
    exp = {(r["user_id"], r["ts"]): r["rolling_corr"]
           for r in fr.rolling_corr("x", "y", 4, by=["user_id"]).df.collect()}
    assert set(got1) == set(exp)
    for k in exp:
        a, b = got1[k], exp[k]
        assert (a is None and b is None) or np.isclose(a, b, atol=1e-9), k

    spark.createDataFrame(phase2, schema).coalesce(1).write.mode("append").parquet(d)
    run_phase(batch_schema)
    got2 = {(r["user_id"], r["ts"]): r["rolling_corr"]
            for r in spark.read.parquet(outdir).collect()}
    # phase-2 windows = last 3 phase-1 pairs + the new pair (via the
    # checkpointed ring) — replicate in numpy
    for u in (1, 2):
        hist = [(x, y) for (uu, _, x, y) in phase1 if uu == u][-3:]
        newp = [(x, y) for (uu, _, x, y) in phase2 if uu == u]
        xs = np.array([p[0] for p in hist + newp])
        ys = np.array([p[1] for p in hist + newp])
        want = np.corrcoef(xs, ys)[0, 1]
        assert np.isclose(got2[(u, ts(9))], want, atol=1e-9), u


def test_stream_sessionize_matches_duckdb_oracle(spark, events_stream_dir):
    """r5 VERDICT ask #5: availableNow streaming sessionization
    hash-compared against the SAME DuckDB oracle SQL the driver applies
    to q_sessionize (gap 1800s), projected to the streaming-expressible
    columns — session_idx is a batch-window artifact, but membership
    determines (user, start, n_events, sum_value) completely, and the
    stream's fixed-point sum_value replays the oracle bit-for-bit.
    Timestamps compare as integer epoch-µs (no tz/precision slack)."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare

    GAP_S = 1800
    ev = load_table(spark, SF, "events")
    us = F.unix_micros(F.col("ts"))
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(us, F.col("event_id"))
    exact_gap = (ev.withColumn("_d", us - F.lag(us).over(w))
                 .filter(F.col("_d") == GAP_S * 1_000_000).count())
    assert exact_gap == 0, "corpus hits the >= vs > gap boundary"

    s = _events_stream(spark, events_stream_dir)
    name = run_to_memory(stream_session_windows(s, "30 minutes", ["user_id"]),
                         "t_sess_oracle", output_mode="complete")
    got = spark.sql(
        f"SELECT user_id, unix_micros(session_start) AS start_us, "
        f"n_events, sum_value FROM {name}"
    ).toPandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    oracle = con.execute(
        "SELECT user_id, epoch_us(t_start) AS start_us, n_events, sum_value "
        "FROM (" + entrymod._all_oracle_sql()["sessionize"] + ")").df()
    con.close()
    problems = compare("stream_sessionize", got, oracle)
    assert not problems, "; ".join(problems)


def test_stream_ohlc_matches_duckdb_oracle(spark, events_stream_dir):
    """Streaming weekly OHLC bars against the SAME DuckDB oracle SQL
    the driver applies to q_ohlc_weekly: the 4-day startTime offset
    aligns Spark's epoch-anchored tumbling grid (1970-01-01 is a
    Thursday) to the oracle's Monday `date_trunc('week')` calendar,
    and min_by/max_by over the (ts, event_id) struct reproduce the
    oracle's two row_number orderings exactly."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming import stream_ohlc

    s = _events_stream(spark, events_stream_dir)
    bars = stream_ohlc(s, "user_id", interval="7 days",
                       start_offset="4 days", tiebreak="event_id")
    name = run_to_memory(bars, "t_ohlc_oracle", output_mode="complete")
    got = spark.sql(
        f"SELECT user_id, bucket, round(open, 4) AS open, "
        f"round(high, 4) AS high, round(low, 4) AS low, "
        f"round(close, 4) AS close, n FROM {name}").toPandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["ohlc_weekly"]).df()
    con.close()
    problems = compare("stream_ohlc", got, oracle)
    assert not problems, "; ".join(problems)


def test_stream_interval_join_matches_duckdb_oracle(spark, events_stream_dir,
                                                    tmp_path):
    """Streaming keyed interval join (stream-stream equi-join with the
    event-time range condition) driven availableNow over the events
    stream joined to a streamed per-user first-week window table, then
    rolled up and hash-compared against the SAME DuckDB oracle SQL the
    batch interval_week1 query is checked against."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming import stream_interval_join

    ev = load_table(spark, SF, "events")
    iv = (ev.groupBy("user_id").agg(F.min("ts").alias("w_start"))
          .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 7 DAYS")))
    ivd = str(tmp_path / "iv_stream")
    iv.repartition(2).write.mode("overwrite").parquet(ivd)

    pts = _events_stream(spark, events_stream_dir).select(
        "user_id", "ts", "value")
    ivs = read_stream_parquet(spark, ivd, iv.schema)
    joined = stream_interval_join(pts, ivs, ["user_id"],
                                  point_ts="ts", start="w_start",
                                  end="w_end")
    name = run_to_memory(joined, "t_ij_oracle")
    got = spark.sql(
        f"SELECT user_id, count(*) AS n_week1, "
        f"round(sum(cast(round(value * 100) AS bigint)) / 100.0, 2) "
        f"AS sum_value FROM {name} GROUP BY user_id").toPandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["interval_week1"]).df()
    con.close()
    problems = compare("stream_interval_join", got, oracle)
    assert not problems, "; ".join(problems)


def test_stream_dedup_exact_matches_duckdb_oracle(spark, tmp_path):
    """r5 VERDICT ask #5, second op: streaming exact dedup against the
    batch dedup_exact oracle SQL.  dropDuplicates keeps an ARRIVAL-
    dependent representative, so the oracle-pinned projection is the
    surviving fingerprint set (exactly one row per distinct normalized
    content — the dedup contract itself)."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.functions.text import fingerprint
    from fsharp_dataframe_spark.streaming import stream_exact_dedup

    docs = load_table(spark, SF, "documents")
    timed = docs.withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")))
    d = str(tmp_path / "dedup_oracle_stream")
    timed.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, timed.schema)
    deduped = stream_exact_dedup(
        s.withColumn("fp", fingerprint(F.col("text"))), ["fp"])
    name = run_to_memory(deduped, "t_dedup_oracle")
    got = spark.sql(f"SELECT fp FROM {name}").toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    oracle = con.execute(
        "SELECT fp FROM (" + entrymod._all_oracle_sql()["dedup_exact"] + ")").df()
    con.close()
    problems = compare("stream_dedup_exact", got, oracle)
    assert not problems, "; ".join(problems)


def test_stream_ohlc_sub_weekly_interval_analyzes(spark, events_stream_dir):
    # a fixed 4-day start offset would fail analysis for any interval
    # shorter than 4 days (offset must be < slide); the derived default
    # must make daily bars just work
    from fsharp_dataframe_spark.streaming import stream_ohlc

    s = _events_stream(spark, events_stream_dir)
    daily = stream_ohlc(s, "user_id", interval="1 day", tiebreak="event_id")
    assert "bucket" in daily.schema.fieldNames()   # analysis succeeds


def test_stream_funnel_matches_duckdb_oracle(spark, events_stream_dir):
    """r6 VERDICT ask #4: availableNow streaming funnel hash-compared
    against the SAME DuckDB oracle SQL the driver applies to q_funnel.
    The stream emits per-key stage advances; per-step key counts (keys
    whose max stage >= k) and the derived conversion ratios reproduce
    the oracle's (step_idx, step, n_keys, conversion) rows completely —
    the full oracle relation, not a projection."""
    import duckdb
    import numpy as np
    import pandas as pd

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming.ops import stream_funnel_state

    steps = ["view", "click", "purchase"]
    s = _events_stream(spark, events_stream_dir)
    name = run_to_memory(stream_funnel_state(s, steps), "t_funnel_oracle")
    rows = spark.sql(
        f"SELECT user_id, max(stage) AS st FROM {name} GROUP BY user_id"
    ).collect()
    n_keys = [sum(1 for r in rows if r["st"] >= k) for k in (1, 2, 3)]
    conv = [np.nan] + [round(n_keys[i] / n_keys[i - 1], 4) if n_keys[i - 1]
                       else np.nan for i in (1, 2)]
    got = pd.DataFrame({
        "step_idx": pd.array([1, 2, 3], dtype="int64"),
        "step": steps,
        "n_keys": pd.array(n_keys, dtype="int64"),
        "conversion": pd.array(conv, dtype="float64"),
    })

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["funnel"]).df()
    con.close()
    problems = compare("stream_funnel", got, oracle)
    assert not problems, "; ".join(problems)


def test_stream_exact_dedup_matches_duckdb_oracle(spark, tmp_path):
    """r6 VERDICT ask #4: availableNow streaming exact dedup against
    the q_dedup_exact oracle, projected to its streaming-expressible
    columns (fp, keep_id): the kept-row SET per fingerprint is fully
    determined, and writing the corpus as ONE sorted parquet file makes
    arrival order = doc_id order (single split, order-preserving
    shuffle from one map partition), so first-arrival == min(doc_id)
    == the oracle's keep_id.  n_dups is a property of the DISCARDED
    rows and is inherently absent from a dedup stream's output — the
    batch q_dedup_exact keeps it under the driver gate."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.functions.text import fingerprint

    d = str(tmp_path / "docs_dedup_stream")
    docs = load_table(spark, SF, "documents")
    (docs.orderBy("doc_id").coalesce(1)
     .write.mode("overwrite").parquet(d))

    s = read_stream_parquet(spark, d, docs.schema)
    s = s.withColumn("fp", fingerprint(F.col("text"))).withColumn(
        "ts", F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")))
    name = run_to_memory(stream_exact_dedup(s, ["fp"]), "t_dedup_oracle")
    got = spark.sql(
        f"SELECT fp, doc_id AS keep_id FROM {name}").toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    oracle = con.execute(
        "SELECT fp, keep_id FROM ("
        + entrymod._all_oracle_sql()["dedup_exact"] + ")").df()
    con.close()
    problems = compare("stream_exact_dedup", got, oracle)
    assert not problems, "; ".join(problems)


def test_stream_ohlc_multiweek_bars_align_to_monday(spark, events_stream_dir):
    """Multi-week bars must land on the Monday grid, not the epoch
    Thursday grid: the derived start offset is 345600 % interval_s
    (reduces to 4 days for weekly), so '14 days' / '2 weeks' / '28
    days' bars all start on Mondays and nest inside the weekly
    calendar."""
    from fsharp_dataframe_spark.streaming.ops import (
        _interval_seconds, stream_ohlc,
    )

    assert _interval_seconds("2 weeks") == 14 * 86_400
    for iv, qn in (("14 days", "t_ohlc_2w"), ("28 days", "t_ohlc_4w")):
        s = _events_stream(spark, events_stream_dir)
        bars = stream_ohlc(s, "user_id", interval=iv, tiebreak="event_id")
        name = run_to_memory(bars, qn, output_mode="complete")
        # Spark weekday(): Monday = 0
        off = spark.sql(
            f"SELECT count(*) AS bad FROM {name} "
            f"WHERE weekday(bucket) != 0").collect()[0]["bad"]
        n = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0]["n"]
        assert n > 0 and off == 0, (iv, n, off)
        # and the grid is anchored at Monday 1970-01-05 exactly: every
        # bar start is a whole number of intervals from the anchor
        days = int(iv.split()[0])
        anchored = spark.sql(
            f"SELECT count(*) AS bad FROM {qn} "
            f"WHERE pmod(datediff(bucket, DATE'1970-01-05'), {days}) != 0"
        ).collect()[0]["bad"]
        assert anchored == 0, iv


def test_stream_last_touch_matches_duckdb_oracle(spark, events_stream_dir):
    """Streaming last-touch attribution (stream_last_touch) driven
    availableNow and hash-compared against the SAME DuckDB oracle SQL
    as the batch q_attribution — per-conversion rows, so every
    attribution decision (touch choice, 3-day window cut, strictness
    at equal timestamps) is value-pinned, not just counts."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming.ops import stream_last_touch

    s = _events_stream(spark, events_stream_dir)
    out = stream_last_touch(s, "purchase", ["click"], max_lag_s=3 * 86400)
    name = run_to_memory(out, "t_attr_oracle")
    got = spark.sql(
        f"SELECT event_id, user_id, conv_ts_us, touch_ts_us, lag_s "
        f"FROM {name}").toPandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["attribution"]).df()
    con.close()
    problems = compare("stream_last_touch", got, oracle)
    assert not problems, "; ".join(problems)


def test_stream_last_touch_state_carries_across_batches(spark, tmp_path):
    """The carried touch survives micro-batch boundaries and restarts:
    a click in batch 1 credits a purchase arriving in batch 2 through
    the checkpointed state."""
    import shutil

    from fsharp_dataframe_spark.streaming.ops import stream_last_touch

    d = str(tmp_path / "attr_batches")
    ckpt = str(tmp_path / "attr_ckpt")
    shutil.rmtree(d, ignore_errors=True)
    schema = "event_id long, user_id long, event_type string, ts timestamp"

    def ts(h):
        return F.lit(f"2024-01-01 {h:02d}:00:00").cast("timestamp")

    outdir = str(tmp_path / "attr_out")

    def run_phase():
        # memory sink cannot recover from a checkpoint — a file sink can
        src = read_stream_parquet(
            spark, d, spark.createDataFrame([], schema).schema)
        q = (stream_last_touch(src, "purchase", ["click"])
             .writeStream.outputMode("append").format("parquet")
             .option("path", outdir).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    b1 = spark.createDataFrame(
        [(1, 7, "click"), (2, 8, "purchase")],
        "event_id long, user_id long, event_type string")
    b1.withColumn("ts", ts(1)).coalesce(1).write.mode("overwrite").parquet(d)
    run_phase()
    r1 = spark.read.parquet(outdir).collect()
    assert len(r1) == 1 and r1[0]["touch_type"] is None  # u8: no touch

    b2 = spark.createDataFrame(
        [(3, 7, "purchase")],
        "event_id long, user_id long, event_type string")
    b2.withColumn("ts", ts(2)).coalesce(1).write.mode("append").parquet(d)
    run_phase()
    r2 = {r["event_id"]: r for r in spark.read.parquet(outdir).collect()}
    assert 3 in r2 and r2[3]["touch_type"] == "click"    # carried state
    assert r2[3]["lag_s"] == 3600


def test_stream_gap_report_matches_duckdb_oracle(spark, events_stream_dir):
    """Streaming gap monitor (stream_gap_report) driven availableNow
    and hash-compared against the SAME DuckDB oracle SQL as the batch
    q_gap_report — every reported gap's exact µs boundaries and
    whole-second duration value-pinned."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming.ops import stream_gap_report

    s = _events_stream(spark, events_stream_dir)
    out = stream_gap_report(s, min_gap_s=4 * 3600)
    name = run_to_memory(out, "t_gaps_oracle")
    got = spark.sql(f"SELECT * FROM {name}").toPandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["gap_report"]).df()
    con.close()
    problems = compare("stream_gap_report", got, oracle)
    assert not problems, "; ".join(problems)


def test_stream_gap_report_state_carries_across_batches(spark, tmp_path):
    """A gap spanning two micro-batches is reported from the
    checkpointed last-timestamp state, and a restart resumes from the
    checkpoint without duplicating it."""
    import shutil

    from fsharp_dataframe_spark.streaming.ops import stream_gap_report

    d = str(tmp_path / "gap_batches")
    ckpt = str(tmp_path / "gap_ckpt")
    outdir = str(tmp_path / "gap_out")
    shutil.rmtree(d, ignore_errors=True)
    schema = "event_id long, user_id long, ts timestamp"

    def ts(h):
        return F.lit(f"2024-01-01 {h:02d}:00:00").cast("timestamp")

    def run_phase():
        src = read_stream_parquet(
            spark, d, spark.createDataFrame([], schema).schema)
        q = (stream_gap_report(src, min_gap_s=3600)
             .writeStream.outputMode("append").format("parquet")
             .option("path", outdir).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    b1 = spark.createDataFrame([(1, 7), (2, 7)], "event_id long, user_id long")
    b1 = b1.withColumn("ts", F.when(F.col("event_id") == 1, ts(1)).otherwise(ts(2)))
    b1.coalesce(1).write.mode("overwrite").parquet(d)
    run_phase()
    # 1h apart exactly == min_gap -> strict > means silence
    assert spark.read.parquet(outdir).count() == 0

    b2 = spark.createDataFrame([(3, 7)], "event_id long, user_id long")
    b2.withColumn("ts", ts(7)).coalesce(1).write.mode("append").parquet(d)
    run_phase()
    rows = spark.read.parquet(outdir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 7 and r["gap_s"] == 5 * 3600
    # restart with no new data: nothing re-emitted
    run_phase()
    assert spark.read.parquet(outdir).count() == 1


def test_stream_cusum_matches_duckdb_oracle(spark, events_stream_dir):
    """Streaming CUSUM (stream_cusum) driven availableNow and
    hash-compared against the SAME DuckDB oracle SQL as the batch
    q_cusum — every fold step and alarm value-pinned."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming.ops import stream_cusum

    s = _events_stream(spark, events_stream_dir)
    out = stream_cusum(s, target=50.0, slack=25.0, threshold=400.0)
    name = run_to_memory(out, "t_cusum_oracle")
    got = spark.sql(f"SELECT * FROM {name}").toPandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["cusum"]).df()
    con.close()
    problems = compare("stream_cusum", got, oracle)
    assert not problems, "; ".join(problems)


def test_stream_cusum_state_accumulates_across_batches(spark, tmp_path):
    """Drift accumulated in batch 1 persists through the checkpoint:
    batch 2's first observation folds onto the carried (S+, S-)."""
    import shutil

    from fsharp_dataframe_spark.streaming.ops import stream_cusum

    d = str(tmp_path / "cusum_batches")
    ckpt = str(tmp_path / "cusum_ckpt")
    outdir = str(tmp_path / "cusum_out")
    shutil.rmtree(d, ignore_errors=True)
    schema = "event_id long, user_id long, value double, ts timestamp"

    def ts(h):
        return F.lit(f"2024-01-01 {h:02d}:00:00").cast("timestamp")

    def run_phase():
        src = read_stream_parquet(
            spark, d, spark.createDataFrame([], schema).schema)
        q = (stream_cusum(src, target=10.0, slack=0.0, threshold=25.0,
                          scale=1)
             .writeStream.outputMode("append").format("parquet")
             .option("path", outdir).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    b1 = spark.createDataFrame([(1, 7, 30.0)],
                               "event_id long, user_id long, value double")
    b1.withColumn("ts", ts(1)).coalesce(1).write.mode("overwrite").parquet(d)
    run_phase()
    r1 = {r["event_id"]: r for r in spark.read.parquet(outdir).collect()}
    assert r1[1]["s_pos"] == 20 and not r1[1]["alarm"]

    b2 = spark.createDataFrame([(2, 7, 20.0)],
                               "event_id long, user_id long, value double")
    b2.withColumn("ts", ts(2)).coalesce(1).write.mode("append").parquet(d)
    run_phase()
    r2 = {r["event_id"]: r for r in spark.read.parquet(outdir).collect()}
    # 20 + (20-10) = 30 > 25: alarm only because batch-1 state carried
    assert r2[2]["s_pos"] == 30 and r2[2]["alarm"]


def test_stream_rolling_median_matches_duckdb_oracle(spark, events_stream_dir):
    """Streaming rolling median (stream_rolling_median) driven
    availableNow and hash-compared against the SAME DuckDB oracle as
    the batch q_rolling_median."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming.ops import stream_rolling_median

    s = _events_stream(spark, events_stream_dir)
    out = stream_rolling_median(s, k=7)
    name = run_to_memory(out, "t_rmed_oracle")
    got = spark.sql(
        f"SELECT user_id, event_id, round(value, 4) AS value, "
        f"round(med, 6) AS med FROM {name}").toPandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["rolling_median"]).df()
    con.close()
    problems = compare("stream_rolling_median", got, oracle)
    assert not problems, "; ".join(problems)


def test_stream_rolling_median_buffer_carries_across_batches(spark, tmp_path):
    import shutil

    from fsharp_dataframe_spark.streaming.ops import stream_rolling_median

    d = str(tmp_path / "rmed_batches")
    ckpt = str(tmp_path / "rmed_ckpt")
    outdir = str(tmp_path / "rmed_out")
    shutil.rmtree(d, ignore_errors=True)
    schema = "event_id long, user_id long, value double, ts timestamp"

    def ts(h):
        return F.lit(f"2024-01-01 {h:02d}:00:00").cast("timestamp")

    def run_phase():
        src = read_stream_parquet(
            spark, d, spark.createDataFrame([], schema).schema)
        q = (stream_rolling_median(src, k=3)
             .writeStream.outputMode("append").format("parquet")
             .option("path", outdir).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    b1 = spark.createDataFrame([(1, 7, 10.0), (2, 7, 30.0)],
                               "event_id long, user_id long, value double")
    b1 = b1.withColumn("ts", F.when(F.col("event_id") == 1, ts(1)).otherwise(ts(2)))
    b1.coalesce(1).write.mode("overwrite").parquet(d)
    run_phase()
    r1 = {r["event_id"]: r["med"] for r in spark.read.parquet(outdir).collect()}
    assert r1 == {1: 10.0, 2: 20.0}

    b2 = spark.createDataFrame([(3, 7, 50.0)],
                               "event_id long, user_id long, value double")
    b2.withColumn("ts", ts(3)).coalesce(1).write.mode("append").parquet(d)
    run_phase()
    r2 = {r["event_id"]: r["med"] for r in spark.read.parquet(outdir).collect()}
    # window [10, 30, 50] spans the batch boundary via the carried buffer
    assert r2[3] == 30.0


def test_stream_bm25_matches_duckdb_oracle(spark, tmp_path):
    """Streaming BM25 (stream_bm25_score) scoring the documents corpus
    against its OWN landed snapshot, driven availableNow: the landed
    scores' top-50 must hash-match the SAME DuckDB oracle as the batch
    bm25_search query — every quantized contribution value-pinned."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming.ops import stream_bm25_score

    docs = load_table(spark, SF, "documents")
    d = str(tmp_path / "docs_bm25_stream")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, docs.schema)
    out = stream_bm25_score(s, docs, "spark merge vector")
    name = run_to_memory(out, "t_bm25_oracle")
    got = spark.sql(f"""
        SELECT doc_id, score, n_hit FROM {name}
        WHERE n_hit > 0 ORDER BY score DESC, doc_id LIMIT 50
    """).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["bm25_search"]).df()
    con.close()
    problems = compare("stream_bm25_score", got, oracle)
    assert not problems, "; ".join(problems)


@pytest.mark.slow
def test_stream_bm25_checkpoint_restart_exactly_once(spark, tmp_path):
    """Stateless scoring + checkpoint = exactly-once across a restart:
    phase 2 scores ONLY the new file; phase 1's documents are not
    reprocessed, and both phases score against the same snapshot."""
    import shutil

    from fsharp_dataframe_spark.streaming.ops import stream_bm25_score

    corpus = spark.createDataFrame(
        [(1, "spark joins data"), (2, "merge sort"), (3, "plain prose")],
        "doc_id long, text string")
    d = str(tmp_path / "bm25_batches")
    ckpt = str(tmp_path / "bm25_ckpt")
    outdir = str(tmp_path / "bm25_out")
    shutil.rmtree(d, ignore_errors=True)

    def run_phase():
        src = read_stream_parquet(
            spark, d, corpus.schema)
        q = (stream_bm25_score(src, corpus, "spark merge")
             .writeStream.outputMode("append").format("parquet")
             .option("path", outdir).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    spark.createDataFrame([(10, "spark spark merge")], corpus.schema) \
        .coalesce(1).write.mode("overwrite").parquet(d)
    run_phase()
    spark.createDataFrame([(11, "nothing relevant")], corpus.schema) \
        .coalesce(1).write.mode("append").parquet(d)
    run_phase()

    rows = {r["doc_id"]: (r["score"], r["n_hit"])
            for r in spark.read.parquet(outdir).collect()}
    assert set(rows) == {10, 11}  # each doc exactly once
    assert rows[10][1] == 2 and rows[10][0] > 0.0
    assert rows[11] == (0.0, 0)
    assert spark.read.parquet(outdir).count() == 2


def test_stream_psi_matches_duckdb_oracle(spark, events_stream_dir):
    """Streaming PSI (stream_psi) against the landed first-half
    baseline, driven availableNow over the second-half events: the
    last emission per bin must hash-match the SAME DuckDB oracle as
    the batch psi_drift query."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming.ops import stream_psi

    split = F.lit("2024-01-15").cast("timestamp")
    base = load_table(spark, SF, "events").filter(F.col("ts") < split)
    s = _events_stream(spark, events_stream_dir).filter(
        F.col("ts") >= split)
    out = stream_psi(s, base, "value", lo=0.0, hi=500.0, n_bins=20)
    name = run_to_memory(out, "t_psi_oracle", output_mode="update")
    got = spark.sql(f"""
        SELECT bin, n_base, n_cur, psi_term FROM (
          SELECT *, row_number() OVER (PARTITION BY bin
            ORDER BY mono DESC) AS rn
          FROM (SELECT *, monotonically_increasing_id() AS mono
                FROM {name}))
        WHERE rn = 1 ORDER BY bin""").toPandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["psi_drift"]).df()
    con.close()
    problems = compare("stream_psi", got, oracle)
    assert not problems, "; ".join(problems)


@pytest.mark.slow
def test_stream_psi_state_accumulates_across_restart(spark, tmp_path):
    """Bin counts carried through the checkpoint: batch 2's emission
    reflects batch 1's observations too."""
    import shutil

    from fsharp_dataframe_spark.streaming.ops import stream_psi

    base = spark.createDataFrame([(float(v),) for v in
                                  [5, 15, 25]], "value double")
    d = str(tmp_path / "psi_batches")
    ckpt = str(tmp_path / "psi_ckpt")
    outdir = str(tmp_path / "psi_out")
    shutil.rmtree(d, ignore_errors=True)

    emissions = []

    def run_phase():
        src = read_stream_parquet(
            spark, d, spark.createDataFrame([], "value double").schema)

        def sink(bdf, _epoch):
            emissions.extend(bdf.collect())

        # memory sink cannot recover from a checkpoint — foreachBatch can
        q = (stream_psi(src, base, "value", 0.0, 30.0, 3)
             .writeStream.outputMode("update").foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    spark.createDataFrame([(5.0,), (5.0,)], "value double") \
        .coalesce(1).write.mode("overwrite").parquet(d)
    run_phase()
    emissions.clear()
    spark.createDataFrame([(25.0,)], "value double") \
        .coalesce(1).write.mode("append").parquet(d)
    run_phase()
    # phase 2's emission must already include phase 1's two bin-0
    # observations via the checkpointed state vector
    last = {r["bin"]: (r["n_base"], r["n_cur"]) for r in emissions}
    assert last[0] == (1, 2) and last[1] == (1, 0) and last[2] == (1, 1)


def test_stream_binned_auc_matches_duckdb_oracle(spark, tmp_path):
    """Streaming binned AUC driven availableNow over the documents
    corpus: the last emission must hash-match the SAME DuckDB oracle
    as the batch classifier_auc query."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming.ops import stream_binned_auc

    docs = load_table(spark, SF, "documents")
    d = str(tmp_path / "docs_auc_stream")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, docs.schema)
    out = stream_binned_auc(
        s.select(F.col("n_chars").cast("double").alias("score"),
                 (F.col("lang") == "en").cast("int").alias("y")),
        "score", "y", lo=0.0, hi=600.0, n_bins=64)
    name = run_to_memory(out, "t_auc_oracle", output_mode="update")
    got = spark.sql(f"""
        SELECT n_pos, n_neg, auc FROM (
          SELECT *, row_number() OVER (
            ORDER BY mono DESC) AS rn
          FROM (SELECT *, monotonically_increasing_id() AS mono
                FROM {name}))
        WHERE rn = 1""").toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["classifier_auc"]).df()
    con.close()
    problems = compare("stream_binned_auc", got, oracle)
    assert not problems, "; ".join(problems)


@pytest.mark.slow
def test_stream_binned_auc_state_across_restart(spark, tmp_path):
    """Per-bin (pos, neg) counts survive a checkpoint restart: batch
    2's AUC reflects batch 1's rows too."""
    import shutil

    from fsharp_dataframe_spark.streaming.ops import stream_binned_auc

    d = str(tmp_path / "auc_batches")
    ckpt = str(tmp_path / "auc_ckpt")
    shutil.rmtree(d, ignore_errors=True)
    schema = "score double, y int"
    emissions = []

    def run_phase():
        src = read_stream_parquet(
            spark, d, spark.createDataFrame([], schema).schema)

        def sink(bdf, _epoch):
            emissions.extend(bdf.collect())

        q = (stream_binned_auc(src, "score", "y", 0.0, 100.0, 10)
             .writeStream.outputMode("update").foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    spark.createDataFrame([(10.0, 0), (90.0, 1)], schema) \
        .coalesce(1).write.mode("overwrite").parquet(d)
    run_phase()
    emissions.clear()
    spark.createDataFrame([(95.0, 1)], schema) \
        .coalesce(1).write.mode("append").parquet(d)
    run_phase()
    # 2 positives above the 1 negative -> perfect separation over ALL
    # three rows (phase 1's counts carried through the checkpoint)
    assert len(emissions) == 1
    r = emissions[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 1, 1.0)


def test_stream_centroid_drift_matches_duckdb_oracle(spark, tmp_path):
    """Streaming centroid drift (stream_centroid_drift) driven
    availableNow over the odd-vec_id half against the landed even
    half: the last emission per label must hash-match the SAME DuckDB
    oracle as the batch centroid_drift query."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming.ops import stream_centroid_drift

    emb = load_table(spark, SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    d = str(tmp_path / "emb_cd_stream")
    cur.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, emb.schema)
    out = stream_centroid_drift(s, base)
    name = run_to_memory(out, "t_cd_oracle", output_mode="update")
    got = spark.sql(f"""
        SELECT label, n_base, n_cur, l2_drift FROM (
          SELECT *, row_number() OVER (PARTITION BY label
            ORDER BY mono DESC) AS rn
          FROM (SELECT *, monotonically_increasing_id() AS mono
                FROM {name}))
        WHERE rn = 1 ORDER BY label""").toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["centroid_drift"]).df()
    con.close()
    problems = compare("stream_centroid_drift", got, oracle)
    assert not problems, "; ".join(problems)


@pytest.mark.slow
def test_stream_centroid_drift_state_across_restart(spark, tmp_path):
    """Per-label (sums, counts) carried through the checkpoint: batch
    2's drift reflects batch 1's vectors too."""
    import shutil

    from fsharp_dataframe_spark.streaming.ops import stream_centroid_drift

    schema = "vec_id long, embedding array<float>, label int"
    base = spark.createDataFrame(
        [(0, [0.0], 1), (2, [2.0], 1)], schema)  # centroid 1.0
    d = str(tmp_path / "cd_batches")
    ckpt = str(tmp_path / "cd_ckpt")
    shutil.rmtree(d, ignore_errors=True)
    emissions = []

    def run_phase():
        src = read_stream_parquet(
            spark, d, spark.createDataFrame([], schema).schema)

        def sink(bdf, _epoch):
            emissions.extend(bdf.collect())

        # memory sink cannot recover from a checkpoint — foreachBatch can
        q = (stream_centroid_drift(src, base)
             .writeStream.outputMode("update").foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    spark.createDataFrame([(1, [3.0], 1)], schema) \
        .coalesce(1).write.mode("overwrite").parquet(d)
    run_phase()
    assert [(r["n_cur"], r["l2_drift"]) for r in emissions] == [(1, 2.0)]
    emissions.clear()
    spark.createDataFrame([(3, [1.0], 1)], schema) \
        .coalesce(1).write.mode("append").parquet(d)
    run_phase()
    # state carried: current centroid (3+1)/2 = 2.0, drift |2-1| = 1.0
    assert [(r["n_cur"], r["l2_drift"]) for r in emissions] == [(2, 1.0)]


def test_stream_int8_quantize_matches_duckdb_oracle(spark, tmp_path):
    """Streaming int8 audit (stream_int8_quantize) scoring the corpus
    against its OWN frozen-scale snapshot: the last emission per dim
    must hash-match the SAME DuckDB oracle as the batch int8_quantize
    query."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming.ops import stream_int8_quantize

    emb = load_table(spark, SF, "embeddings")
    d = str(tmp_path / "emb_q8_stream")
    emb.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, emb.schema)
    out = stream_int8_quantize(s, emb)
    name = run_to_memory(out, "t_q8_oracle", output_mode="update")
    got = spark.sql(f"""
        SELECT dim, n, scale, mean_abs_err FROM (
          SELECT *, row_number() OVER (PARTITION BY dim
            ORDER BY mono DESC) AS rn
          FROM (SELECT *, monotonically_increasing_id() AS mono
                FROM {name}))
        WHERE rn = 1 ORDER BY dim""").toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["int8_quantize"]).df()
    con.close()
    problems = compare("stream_int8_quantize", got, oracle)
    assert not problems, "; ".join(problems)


@pytest.mark.slow
def test_stream_int8_quantize_state_across_restart(spark, tmp_path):
    """Per-dim error sums carried through the checkpoint, scale frozen
    from the landed snapshot."""
    import shutil

    from fsharp_dataframe_spark.streaming.ops import stream_int8_quantize

    schema = "vec_id long, embedding array<float>"
    base = spark.createDataFrame([(0, [127.0])], schema)  # scale 1.0
    d = str(tmp_path / "q8_batches")
    ckpt = str(tmp_path / "q8_ckpt")
    shutil.rmtree(d, ignore_errors=True)
    emissions = []

    def run_phase():
        src = read_stream_parquet(
            spark, d, spark.createDataFrame([], schema).schema)

        def sink(bdf, _epoch):
            emissions.extend(bdf.collect())

        q = (stream_int8_quantize(src, base)
             .writeStream.outputMode("update").foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    # q = round(1.5/1.0) = 2 (HALF_UP), err 0.5
    spark.createDataFrame([(1, [1.5])], schema) \
        .coalesce(1).write.mode("overwrite").parquet(d)
    run_phase()
    assert [(r["n"], r["scale"], r["mean_abs_err"])
            for r in emissions] == [(1, 1.0, 0.5)]
    emissions.clear()
    spark.createDataFrame([(2, [2.0])], schema) \
        .coalesce(1).write.mode("append").parquet(d)
    run_phase()
    # err 0.0 joins the carried 0.5: mean (0.5+0)/2 = 0.25 over n=2
    assert [(r["n"], r["scale"], r["mean_abs_err"])
            for r in emissions] == [(2, 1.0, 0.25)]


def test_stream_image_near_dup_matches_batch_pairs(spark, tmp_path):
    """Streaming dHash candidates over the closed-form image fixture:
    the deduped (id_a, id_b, hamming) set after an availableNow drive
    must equal the batch banded_hamming_pairs result on the same
    corpus (all images inside one watermark horizon)."""
    from fsharp_dataframe_spark.functions.dedup import banded_hamming_pairs
    from fsharp_dataframe_spark.functions.multimodal import (
        dhash_media, make_fake_dhash_media,
    )
    from fsharp_dataframe_spark.streaming.ops import stream_image_near_dup

    media = make_fake_dhash_media(spark, 64).withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
        + F.make_interval(mins=F.col("media_id").cast("int")))
    d = str(tmp_path / "img_stream")
    media.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, media.schema)
    out = stream_image_near_dup(s, watermark="2 hours")
    name = run_to_memory(out, "t_img_nd")
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in
           spark.sql(f"SELECT DISTINCT id_a, id_b, hamming "
                     f"FROM {name}").collect()}
    exp = {(r["id_a"], r["id_b"], r["hamming"]) for r in
           banded_hamming_pairs(dhash_media(media), id_col="media_id",
                                sketch_col="dhash",
                                max_hamming=2).collect()}
    assert got == exp
    # 8 planted twins (64/8) + 4 planted chain tails (64/16)
    assert len(exp) == 12


@pytest.mark.slow
def test_stream_image_near_dup_join_state_across_restart(spark, tmp_path):
    """Stream-stream join state survives a checkpoint restart: a phase-2
    image pairs with its phase-1 twin (still inside the watermark
    horizon) WITHOUT phase 1 being reprocessed — the (6, 7) planted
    pair from phase 1 is emitted exactly once across both phases."""
    import shutil

    from fsharp_dataframe_spark.functions.multimodal import (
        make_fake_dhash_media,
    )
    from fsharp_dataframe_spark.streaming.ops import stream_image_near_dup

    media = make_fake_dhash_media(spark, 16).withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
        + F.make_interval(mins=F.col("media_id").cast("int")))
    d = str(tmp_path / "img_restart")
    ckpt = str(tmp_path / "img_ckpt")
    shutil.rmtree(d, ignore_errors=True)
    emissions = []

    def run_phase():
        src = read_stream_parquet(spark, d, media.schema)

        def sink(bdf, _epoch):
            emissions.extend(bdf.collect())

        q = (stream_image_near_dup(src, watermark="4 hours")
             .writeStream.outputMode("append").foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    # phase 1: images 0..14 — contains the (6, 7) planted twin but NOT
    # image 15 (the twin of 14)
    media.filter(F.col("media_id") <= 14) \
        .coalesce(1).write.mode("overwrite").parquet(d)
    run_phase()
    p1 = {(r["id_a"], r["id_b"]) for r in emissions}
    assert (6, 7) in p1
    n_67_phase1 = sum(1 for r in emissions
                      if (r["id_a"], r["id_b"]) == (6, 7))
    emissions.clear()
    # phase 2: ONLY image 15 arrives — it must pair with the
    # checkpoint-carried image 14 from phase 1
    media.filter(F.col("media_id") == 15) \
        .coalesce(1).write.mode("append").parquet(d)
    run_phase()
    p2 = {(r["id_a"], r["id_b"]) for r in emissions}
    assert (14, 15) in p2
    assert (6, 7) not in p2  # phase 1 pairs are not re-emitted
    assert n_67_phase1 >= 1


def test_stream_vocab_divergence_matches_duckdb_oracle(spark, tmp_path):
    """Streaming vocab divergence (stream_vocab_divergence) driving the
    english docs against the landed non-english baseline: the last
    emission per token, top-20 by kl_term, must hash-match the SAME
    DuckDB oracle as the batch vocab_drift query."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming.ops import stream_vocab_divergence

    docs = load_table(spark, SF, "documents")
    base = docs.filter(F.col("lang") != "en")
    cur = docs.filter(F.col("lang") == "en")
    d = str(tmp_path / "docs_vd_stream")
    cur.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, docs.schema)
    out = stream_vocab_divergence(s, base)
    name = run_to_memory(out, "t_vd_oracle", output_mode="update")
    got = spark.sql(f"""
        SELECT token, c_a, c_b, kl_term FROM (
          SELECT *, row_number() OVER (PARTITION BY token
            ORDER BY mono DESC) AS rn
          FROM (SELECT *, monotonically_increasing_id() AS mono
                FROM {name}))
        WHERE rn = 1
        ORDER BY kl_term DESC, token LIMIT 20""").toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["vocab_drift"]).df()
    con.close()
    problems = compare("stream_vocab_divergence", got, oracle)
    assert not problems, "; ".join(problems)


@pytest.mark.slow
def test_stream_vocab_divergence_state_across_restart(spark, tmp_path):
    """Vocab counts carried through the checkpoint: after batch 2 the
    emission equals the batch operator over batch1 ∪ batch2."""
    from fsharp_dataframe_spark.functions.profile import vocab_divergence
    from fsharp_dataframe_spark.streaming.ops import stream_vocab_divergence

    schema = "doc_id long, text string"
    base = spark.createDataFrame(
        [(100, "red red green blue")], schema)
    b1 = spark.createDataFrame([(1, "red yellow")], schema)
    b2 = spark.createDataFrame([(2, "yellow yellow purple")], schema)
    d = str(tmp_path / "vd_batches")
    ckpt = str(tmp_path / "vd_ckpt")
    emissions = []

    def run_phase():
        src = read_stream_parquet(
            spark, d, spark.createDataFrame([], schema).schema)

        def sink(bdf, _epoch):
            emissions.extend(bdf.collect())

        # memory sink cannot recover from a checkpoint — foreachBatch can
        q = (stream_vocab_divergence(src, base)
             .writeStream.outputMode("update").foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    b1.coalesce(1).write.mode("overwrite").parquet(d)
    run_phase()
    first = {r["token"]: (r["c_a"], r["c_b"], r["kl_term"])
             for r in emissions}
    exp1 = {r["token"]: (r["c_a"], r["c_b"], r["kl_term"])
            for r in vocab_divergence(b1, base).collect()}
    assert first == exp1
    emissions.clear()
    b2.coalesce(1).write.mode("append").parquet(d)
    run_phase()
    second = {r["token"]: (r["c_a"], r["c_b"], r["kl_term"])
              for r in emissions}
    exp2 = {r["token"]: (r["c_a"], r["c_b"], r["kl_term"])
            for r in vocab_divergence(b1.union(b2), base).collect()}
    assert second == exp2 and second != exp1


def test_stream_centroid_drift_string_labels(spark, tmp_path):
    """ADVICE r10: the label column keeps its own type — a
    string-labeled stream must run (the old hardcoded int schema died
    executor-side) and produce the batch-identical drift."""
    from fsharp_dataframe_spark.streaming.ops import stream_centroid_drift

    schema = "vec_id long, embedding array<float>, label string"
    base = spark.createDataFrame(
        [(0, [0.0], "u"), (2, [2.0], "u"), (4, [9.0], "w")], schema)
    cur = spark.createDataFrame([(1, [3.0], "u")], schema)
    d = str(tmp_path / "cd_str_stream")
    cur.coalesce(1).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, cur.schema)
    out = stream_centroid_drift(s, base)
    assert out.schema["label"].dataType.simpleString() == "string"
    name = run_to_memory(out, "t_cd_str", output_mode="update")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    got = {r["label"]: (r["n_cur"], r["l2_drift"]) for r in rows}
    # base centroid("u") = 1.0, stream centroid = 3.0 -> drift 2.0;
    # label "w" never streamed -> no emission
    assert got == {"u": (1, 2.0)}


def test_stream_zipf_fit_matches_duckdb_oracle(spark, tmp_path):
    """Streaming Zipf fit (stream_zipf_fit) driven availableNow over
    the documents corpus: the last emission must hash-match the SAME
    DuckDB oracle as the batch zipf_fit query."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare
    from fsharp_dataframe_spark.streaming.ops import stream_zipf_fit

    docs = load_table(spark, SF, "documents")
    d = str(tmp_path / "docs_zipf_stream")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, docs.schema)
    out = stream_zipf_fit(s, k=300)
    name = run_to_memory(out, "t_zipf_oracle", output_mode="update")
    got = spark.sql(f"""
        SELECT n_terms, slope, intercept, r2 FROM (
          SELECT *, row_number() OVER (
            ORDER BY monotonically_increasing_id() DESC) AS rn
          FROM {name})
        WHERE rn = 1""").toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    oracle = con.execute(entrymod._all_oracle_sql()["zipf_fit"]).df()
    con.close()
    problems = compare("stream_zipf_fit", got, oracle)
    assert not problems, "; ".join(problems)


@pytest.mark.slow
def test_stream_zipf_fit_state_across_restart(spark, tmp_path):
    """Vocabulary counts carried through the checkpoint: after batch 2
    the emission equals the batch operator over batch1 ∪ batch2."""
    from fsharp_dataframe_spark.functions.drift import zipf_fit
    from fsharp_dataframe_spark.streaming.ops import stream_zipf_fit

    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(1, "the the the cat sat on the mat"),
         (2, "the cat ran far away today")], schema)
    b2 = spark.createDataFrame(
        [(3, "the dog and the cat and the bird sat")], schema)
    d = str(tmp_path / "zipf_batches")
    ckpt = str(tmp_path / "zipf_ckpt")
    emissions = []

    def run_phase():
        src = read_stream_parquet(
            spark, d, spark.createDataFrame([], schema).schema)

        def sink(bdf, _epoch):
            emissions.extend(bdf.collect())

        q = (stream_zipf_fit(src, k=10)
             .writeStream.outputMode("update").foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    b1.coalesce(1).write.mode("overwrite").parquet(d)
    run_phase()
    exp1 = zipf_fit(b1, k=10).first()
    got1 = emissions[-1]
    assert (got1["n_terms"], got1["slope"], got1["intercept"], got1["r2"]) \
        == (exp1["n_terms"], exp1["slope"], exp1["intercept"], exp1["r2"])
    emissions.clear()
    b2.coalesce(1).write.mode("append").parquet(d)
    run_phase()
    exp2 = zipf_fit(b1.union(b2), k=10).first()
    got2 = emissions[-1]
    assert (got2["n_terms"], got2["slope"], got2["intercept"], got2["r2"]) \
        == (exp2["n_terms"], exp2["slope"], exp2["intercept"], exp2["r2"])
    assert got2["slope"] != got1["slope"]


def test_stream_audio_near_dup_matches_batch_pairs(spark, tmp_path):
    """Streaming audio candidates over the closed-form WAV fixture:
    the deduped (id_a, id_b, hamming) set after an availableNow drive
    must equal the batch banded_hamming_pairs result on the same
    corpus (all clips inside one watermark horizon) — the image
    stream's contract under the shared piece-join core."""
    from fsharp_dataframe_spark.functions.dedup import banded_hamming_pairs
    from fsharp_dataframe_spark.functions.multimodal import (
        audio_fingerprint, make_fake_audio_media,
    )
    from fsharp_dataframe_spark.streaming.ops import stream_audio_near_dup

    media = make_fake_audio_media(spark, 64).withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
        + F.make_interval(mins=F.col("media_id").cast("int")))
    d = str(tmp_path / "aud_stream")
    media.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, media.schema)
    out = stream_audio_near_dup(s, watermark="2 hours")
    name = run_to_memory(out, "t_aud_nd")
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in
           spark.sql(f"SELECT DISTINCT id_a, id_b, hamming "
                     f"FROM {name}").collect()}
    exp = {(r["id_a"], r["id_b"], r["hamming"]) for r in
           banded_hamming_pairs(audio_fingerprint(media),
                                id_col="media_id", sketch_col="afp",
                                max_hamming=2).collect()}
    assert got == exp
    # 8 planted twins (64/8) + 4 planted chain tails (64/16)
    assert len(exp) == 12


def test_stream_video_near_dup_matches_batch_pairs(spark, tmp_path):
    """Streaming video frame candidates over the closed-form fixture:
    the video-level rollup of the deduped frame candidates (the
    consumer's first groupBy) must equal batch video_near_dup on the
    same corpus (all videos inside one watermark horizon)."""
    from fsharp_dataframe_spark.functions.multimodal import (
        make_fake_video_media, video_near_dup,
    )
    from fsharp_dataframe_spark.streaming.ops import stream_video_near_dup

    media = make_fake_video_media(spark, 32).withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
        + F.make_interval(mins=F.col("media_id").cast("int")))
    d = str(tmp_path / "vid_stream")
    media.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, media.schema)
    out = stream_video_near_dup(s, watermark="2 hours")
    name = run_to_memory(out, "t_vid_nd")
    # consumer-side rollup: distinct matched frame positions per pair
    got = {(r["id_a"], r["id_b"]): r["m"] for r in spark.sql(
        f"SELECT id_a, id_b, count(DISTINCT frame_idx) AS m "
        f"FROM {name} GROUP BY 1, 2").collect()}
    exp = {(r["id_a"], r["id_b"]): r["matched_frames"] for r in
           video_near_dup(media).collect()}
    # batch applies the half-coverage threshold; the stream emits raw
    # candidates — every batch pair must appear with the same count
    # (the planted re-uploads match at EVERY sampled position, so no
    # sub-threshold candidate pairs exist in this fixture)
    assert got == exp
    assert set(exp) == {(6, 7), (14, 15), (22, 23), (30, 31)}


def test_stream_distinct_sketch_matches_batch(spark, tmp_path):
    """Streaming HLL distinct estimates equal the batch sketch rollup
    EXACTLY (same engine, same mergeable sketch — the batch module's
    lossless-merge invariant), even when the rows arrive as multiple
    files/micro-batches."""
    from fsharp_dataframe_spark.functions.sketch import (
        distinct_sketch_rollup, estimate_distinct,
    )
    from fsharp_dataframe_spark.streaming.ops import stream_distinct_sketch

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    d = str(tmp_path / "ev_sketch")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, ev.schema)
    out = stream_distinct_sketch(s, "event_type", "user_id")
    name = run_to_memory(out, "t_hll", output_mode="complete")
    got = {r["event_type"]: r["n_distinct"] for r in
           spark.sql(f"SELECT * FROM {name}").collect()}
    exp = {r["event_type"]: r["n_distinct"] for r in
           estimate_distinct(
               distinct_sketch_rollup(ev, "event_type", "user_id"))
           .collect()}
    assert got == exp and len(exp) >= 3
    # and the estimates are sane vs exact distinct counts (~1.6% rse
    # at lg_k=12; these groups are small enough to be near-exact)
    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    for k, v in exp.items():
        assert abs(v - exact[k]) <= max(2, 0.05 * exact[k])


def test_stream_media_catalog_matches_batch(spark, tmp_path):
    """The streaming modality monitor equals the batch catalog rollup
    over the same mixed image+audio+video corpus — exact counts, same
    header-only sniff."""
    from fsharp_dataframe_spark.functions.multimodal import (
        make_fake_audio_media, make_fake_dhash_media,
        make_fake_video_media, media_metadata,
    )
    from fsharp_dataframe_spark.streaming.ops import stream_media_catalog

    img = make_fake_dhash_media(spark, 16)
    aud = make_fake_audio_media(spark, 16).withColumn(
        "media_id", F.col("media_id") + 16)
    vid = make_fake_video_media(spark, 16).withColumn(
        "media_id", F.col("media_id") + 32)
    corpus = img.unionByName(aud).unionByName(vid)
    d = str(tmp_path / "media_cat")
    corpus.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, corpus.schema)
    out = stream_media_catalog(s)
    name = run_to_memory(out, "t_mcat", output_mode="complete")
    got = {r["sniff_mime"]: (r["n_rows"], r["n_with_dims"]) for r in
           spark.sql(f"SELECT * FROM {name}").collect()}
    exp = {r["sniff_mime"]: (r["n_rows"], r["n_with_dims"]) for r in
           media_metadata(corpus).groupBy("sniff_mime")
           .agg(F.count("*").alias("n_rows"),
                F.sum(F.col("sniff_width").isNotNull().cast("long"))
                .alias("n_with_dims")).collect()}
    assert got == exp
    assert got == {"image/png": (16, 16), "audio/x-wav": (16, 0),
                   "video/x-fsv": (16, 16)}


@pytest.mark.slow
def test_stream_distinct_sketch_state_across_restart(spark, tmp_path):
    """HLL aggregation state survives a checkpoint restart: phase 2
    adds users to a group WITHOUT phase 1 being reprocessed, and the
    final per-group estimates equal the batch sketch over the UNION
    of both phases — the lossless-merge invariant carried through the
    state store."""
    import shutil

    from fsharp_dataframe_spark.functions.sketch import (
        distinct_sketch_rollup, estimate_distinct,
    )
    from fsharp_dataframe_spark.streaming.ops import stream_distinct_sketch

    rows = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", i % 37) for i in range(200)],
        "event_id long, event_type string, user_id long")
    d = str(tmp_path / "hll_restart")
    ckpt = str(tmp_path / "hll_ckpt")
    shutil.rmtree(d, ignore_errors=True)
    latest = {}

    def run_phase():
        src = read_stream_parquet(spark, d, rows.schema)

        def sink(bdf, _epoch):
            for r in bdf.collect():
                latest[r["event_type"]] = r["n_distinct"]

        q = (stream_distinct_sketch(src, "event_type", "user_id")
             .writeStream.outputMode("update").foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    rows.filter(F.col("event_id") < 100).coalesce(1) \
        .write.mode("overwrite").parquet(d)
    run_phase()
    # phase 2: the rest arrive into the SAME groups
    rows.filter(F.col("event_id") >= 100).coalesce(1) \
        .write.mode("append").parquet(d)
    run_phase()
    exp = {r["event_type"]: r["n_distinct"] for r in
           estimate_distinct(
               distinct_sketch_rollup(rows, "event_type", "user_id"))
           .collect()}
    assert latest == exp and set(exp) == {"a", "b"}


def test_stream_audio_window_near_dup_offset_parity(spark, tmp_path):
    """Streaming whole-stream audio candidates carry both window
    indexes; the consumer's offset vote (its first batch aggregate)
    must reproduce batch audio_stream_near_dup on the same corpus —
    including the planted head-trimmed re-uploads that same-position
    matching misses."""
    from fsharp_dataframe_spark.functions.multimodal import (
        audio_stream_near_dup, make_fake_audio_stream_media,
    )
    from fsharp_dataframe_spark.streaming.ops import (
        stream_audio_window_near_dup,
    )

    media = make_fake_audio_stream_media(spark, 24).withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
        + F.make_interval(mins=F.col("media_id").cast("int")))
    d = str(tmp_path / "aud_stream")
    media.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, media.schema)
    out = stream_audio_window_near_dup(s, watermark="2 hours")
    name = run_to_memory(out, "t_aud_off")
    got = {(r["id_a"], r["id_b"]): (r["off"], r["m"]) for r in spark.sql(
        f"""WITH c AS (SELECT DISTINCT id_a, id_b, win_idx_a,
                              win_idx_b, win_idx_delta FROM {name}),
            v AS (SELECT id_a, id_b, win_idx_delta AS d,
                         count(*) AS m FROM c GROUP BY 1, 2, 3),
            r AS (SELECT *, row_number() OVER (PARTITION BY id_a, id_b
                         ORDER BY m DESC, d ASC) AS rk FROM v)
            SELECT id_a, id_b, d AS off, m FROM r WHERE rk = 1
        """).collect()}
    exp = {(r["id_a"], r["id_b"]): (r["offset"], r["matched_windows"])
           for r in audio_stream_near_dup(media).collect()}
    assert got == exp
    assert all(off == 1 for off, _ in exp.values()) and exp


def test_stream_video_offset_near_dup_parity(spark, tmp_path):
    """Streaming offset-tolerant video candidates: the consumer's
    offset vote reproduces batch video_near_dup_offset over a corpus
    holding both same-position re-uploads (offset 0) and real
    head-trimmed clones (offset 2, built through trim_video_head)."""
    from fsharp_dataframe_spark.functions.multimodal import (
        make_fake_video_media, trim_video_head, video_near_dup_offset,
    )
    from fsharp_dataframe_spark.streaming.ops import (
        stream_video_offset_near_dup,
    )

    n = 32
    base = make_fake_video_media(spark, n)
    clones = (trim_video_head(base.filter(F.col("media_id") % 7 == 3), 2)
              .withColumn("media_id", F.col("media_id") + n))
    media = base.unionByName(clones).withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
        + F.make_interval(mins=F.col("media_id").cast("int")))
    d = str(tmp_path / "vid_off_stream")
    media.repartition(3).write.mode("overwrite").parquet(d)
    s = read_stream_parquet(spark, d, media.schema)
    out = stream_video_offset_near_dup(s, watermark="3 hours")
    name = run_to_memory(out, "t_vid_off")
    got = {(r["id_a"], r["id_b"]): (r["off"], r["m"]) for r in spark.sql(
        f"""WITH c AS (SELECT DISTINCT id_a, id_b, frame_idx_a,
                              frame_idx_b, frame_idx_delta FROM {name}),
            v AS (SELECT id_a, id_b, frame_idx_delta AS d,
                         count(*) AS m FROM c GROUP BY 1, 2, 3),
            r AS (SELECT *, row_number() OVER (PARTITION BY id_a, id_b
                         ORDER BY m DESC, d ASC) AS rk FROM v)
            SELECT id_a, id_b, d AS off, m FROM r WHERE rk = 1
        """).collect()}
    exp = {(r["id_a"], r["id_b"]): (r["offset"], r["matched_frames"])
           for r in video_near_dup_offset(media).collect()}
    assert got == exp
    offsets = {v[0] for v in exp.values()}
    assert 0 in offsets and 2 in offsets  # both planted shapes present
