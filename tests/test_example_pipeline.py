"""The examples/clean_pipeline.py cascade must run end-to-end and
write a readable split-partitioned corpus."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

from clean_pipeline import clean_corpus  # noqa: E402


def test_clean_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "corpus")
    counts = clean_corpus(spark, "/root/testdata/sf0.001", out)
    order = ["raw", "exact_dedup", "near_dedup", "decontaminated",
             "quality", "chunks", "final"]
    assert list(counts) == order
    # the doc-level stages only ever remove rows; chunking fans out
    # (>= one chunk per surviving doc); sharding re-attaches 1:1
    for a, b in zip(order[:4], order[1:5]):
        assert counts[b] <= counts[a]
    assert counts["chunks"] >= counts["quality"] > 0
    assert counts["final"] == counts["chunks"]
    # the written corpus is split-partitioned, shard-labeled, and
    # holds exactly the surviving chunk rows
    back = spark.read.parquet(out)
    assert counts["final"] == back.count()
    assert {"doc_id", "chunk_id", "chunk_text", "split", "shard",
            "n_tokens"} <= set(back.columns)
    splits = {r["split"] for r in back.select("split").distinct().collect()}
    assert splits <= {"train", "heldout"} and "train" in splits
    # hive partition pruning is available to readers
    assert any(p.startswith("split=") for p in os.listdir(out))


def test_incremental_ingest_end_to_end(spark, tmp_path):
    from incremental_ingest import ingest_batch

    from fsharp_dataframe_spark.functions import util

    # cache_scope is nesting-safe: earlier tests in the shared session
    # may legitimately have live tracked persists — the pipeline must
    # add NONE of its own on exit (compare against the snapshot, not
    # the empty list)
    before = list(util._TRACKED_PERSISTS)
    out = str(tmp_path / "ingest")
    counts = ingest_batch(spark, "/root/testdata/sf0.001", out)
    assert list(counts) == ["batch", "deduped", "quality"]
    assert 0 < counts["quality"] <= counts["deduped"] <= counts["batch"]
    back = spark.read.parquet(out)
    assert back.count() == counts["quality"]
    assert any(p.startswith("ingest_batch=") for p in os.listdir(out))
    assert util._TRACKED_PERSISTS == before


def test_search_pipeline_end_to_end(spark, tmp_path):
    from search_pipeline import search_corpus

    out = search_corpus(spark, "/root/testdata/sf0.001",
                        str(tmp_path / "idx"), ["spark merge", "window"])
    assert len(out) == 2
    for r in out:
        assert r["hits"] and all(h["score"] > 0 for h in r["hits"])
        scores = [h["score"] for h in r["hits"]]
        assert scores == sorted(scores, reverse=True)


def test_events_analytics_end_to_end(spark):
    from events_analytics import analyze_events

    out = analyze_events(spark, "/root/testdata/sf0.001")
    assert out["sessions"]["n_sessions"] > 0
    steps = [s["n_keys"] for s in out["funnel"]]
    assert len(steps) == 3 and steps == sorted(steps, reverse=True)
    assert out["retention"]["n_cells"] > 0
    assert 0 < out["key_skew"]["heaviest_user_share"] < 1


def test_timeseries_analytics_end_to_end(spark):
    from timeseries_analytics import analyze_timeseries

    out = analyze_timeseries(spark, "/root/testdata/sf0.001")
    assert out["hourly_grid"]["rows"] == 720
    assert out["interpolated"]["gaps_filled"] > 0
    assert -1.0 <= out["rolling_corr"]["avg_corr24"] <= 1.0
    assert out["ewma"]["rows"] > 0
    # every purchase emits a row; only those with a prior click fill
    assert out["asof"]["with_prior_click"] <= out["asof"]["purchases"]
    assert out["asof"]["with_prior_click"] > 0


def test_attribution_warehouse_end_to_end(spark):
    from attribution_warehouse import run

    out = run(spark, "/root/testdata/sf0.001")
    assert out["scd2_dim"]["intervals"] > 0
    # point-in-time: every purchase row survives the left join; only
    # those with a prior view carry a band
    assert out["point_in_time"]["with_band"] <= \
        out["point_in_time"]["purchases"]
    assert out["point_in_time"]["with_band"] > 0
    assert 0 < out["attribution"]["attributed"] <= \
        out["attribution"]["conversions"]
    # 5 event types -> at most 25 transition pairs, 10 unordered pairs
    assert 0 < out["transitions"]["pairs"] <= 25
    assert 0 < out["basket"]["pairs"] <= 10


def test_pretraining_mix_end_to_end(spark):
    from pretraining_mix import run

    out = run(spark, "/root/testdata/sf0.001")
    assert out["token_budget"]["domains"] == 20
    assert out["token_budget"]["oversampled"] >= 1  # src0 weight 3x
    tm = out["training_mix"]
    assert 0 < tm["docs"] <= 200 and tm["spans"] >= tm["sequences"] > 0
    assert out["hybrid_search"]["hits"] == 10
    assert out["hard_negatives"]["pairs"] > 0


def test_drift_monitoring_end_to_end(spark):
    from drift_monitoring import run

    out = run(spark, "/root/testdata/sf0.001")
    assert isinstance(out["psi_drift"]["psi"], float)
    assert out["cusum"]["alarms"] >= out["cusum"]["alarmed_users"] >= 0
    assert out["gaps"]["n_gaps"] >= 0
    assert -2.5 < out["zipf"]["slope"] < 0  # heavy-tailed vocab
    assert 0.0 <= out["auc"]["auc"] <= 1.0
    waste = out["packing"]["waste_pct_by_len"]
    assert set(waste) == {32, 64, 128}
    # longer contexts waste at least as much padding per doc
    assert waste[128] >= waste[64] >= waste[32] >= 0.0


def test_multimodal_dedup_end_to_end(spark):
    from multimodal_dedup import run

    out = run(spark, "/root/testdata/sf0.001")
    n = out["decode"]["n"]
    assert out["sniff"].get("image/png") == n  # all fixture rows sniff PNG
    assert out["decode"]["decode_ok"] == n     # and all decode
    # planted twins (n/8) + chain tails (n/16), nothing else
    assert out["pairs"]["n_pairs"] == n // 8 + n // 16
    assert out["pairs"]["by_hamming"] == {1: n // 8, 2: n // 16}
    c = out["clusters"]
    assert c["max_cluster_size"] == 3          # the transitive chain
    assert c["survivors"] + c["removed"] == n
    # every pair member except one canonical per cluster is removed:
    # chains remove 2 of 3, twin pairs remove 1 of 2
    assert c["removed"] == 2 * (n // 16) + (n // 8 - n // 16)
    # the modality-agnostic substrate: the audio fixture plants the
    # same twin (n/8) + chain-tail (n/16) pair structure; the video
    # fixture plants one re-upload pair per 8 videos
    om = out["other_modalities"]
    na, nv = om["audio_n"], om["video_n"]
    assert om["audio_pairs"] == na // 8 + na // 16
    assert om["video_pairs"] == nv // 8


def test_tpch_suite_example_runs_all_22(spark):
    from tpch_analytics import run

    rows = run(spark, "/root/testdata/sf0.001")
    assert [r["query"] for r in rows] == [f"tpch_q{i}"
                                          for i in range(1, 23)]
    # every query returns rows at the smallest SF (q20's qualifying
    # population is the only one allowed to thin out to zero there)
    empty_ok = {name for name, n in
                ((r["query"], r["rows"]) for r in rows) if n == 0}
    assert empty_ok <= {"tpch_q20"}, empty_ok


def test_audio_ingest_end_to_end(spark):
    from audio_ingest import run

    from fsharp_dataframe_spark.functions.multimodal import (
        audio_stream_window_count as nw,
    )

    out = run(spark, "/root/testdata/sf0.001")
    n = 240
    landed = [i for i in range(n) if i % 3 != 2]
    rows = lambda i: (4 * nw(i) - 3) * 3  # noqa: E731
    assert out["index"]["landed_clips"] == len(landed)
    assert out["index"]["index_rows"] == sum(rows(i) for i in landed)
    # nightly: every fixture plant (i % 6 == 5, all of which fall in
    # the fresh third), every 1024-sample trim and every 16 kHz
    # re-encode is a dup; only non-plant fresh clips survive
    plants = [i for i in range(n) if i % 3 == 2 and i % 6 == 5]
    trims = [i for i in landed if i % 5 == 0 and nw(i) >= 2]
    reenc = [i for i in landed if i % 5 == 1]
    fresh = [i for i in range(n) if i % 3 == 2]
    assert out["nightly"]["batch"] == len(fresh) + len(trims) + len(reenc)
    assert out["nightly"]["dup_of_landed"] == (
        len(plants) + len(trims) + len(reenc))
    assert out["nightly"]["kept"] == len(fresh) - len(plants)
    # snippets: one containment hit per query — no landed clip is a
    # plant (every i % 6 == 5 has i % 3 == 2), so only the source hits
    snips = [i for i in landed if i % 7 == 3 and nw(i) >= 2]
    assert out["snippets"]["queries"] == len(snips)
    assert out["snippets"]["containment_hits"] == len(snips)
    # append is |survivors|-bounded; takedown removes exactly the
    # retired clips' rows (clone ids offset by n keep the source nw)
    kept = [i for i in fresh if i % 6 != 5]
    before = out["index"]["index_rows"] + sum(rows(i) for i in kept)
    assert out["append"]["index_rows_after"] == before
    retired = out["takedown"]["retired_ids"]
    assert len(retired) == 2
    assert out["takedown"]["index_rows_after"] == before - sum(
        rows(i % n) for i in retired)
    assert out["takedown"]["vacuumed"] == []
    # retention: the TTL sweep expires exactly the day-0 (initial
    # corpus) rows, leaving the day-1 survivors minus the takedown
    assert out["retention"]["expired_rows"] == \
        out["index"]["index_rows"]
    assert out["retention"]["index_rows_after"] == (
        out["takedown"]["index_rows_after"]
        - out["index"]["index_rows"])
