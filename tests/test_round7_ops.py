"""Unit pins for the round-7 operators (functions/scd.py, the events
attribution/co-occurrence additions, search.phrase_search,
stats.grouped_rank_features): hand-computable values, NULL policy, tie
determinism, and plan shape — the SQL-oracle gate covers full-corpus
replays (tools/check_oracle.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_scd2_from_events_change_detection_and_intervals(spark):
    from fsharp_dataframe_spark.functions.scd import scd2_from_events

    rows = [
        ("u1", 1, _t(1), "A"),
        ("u1", 2, _t(2), "A"),      # no change -> absorbed
        ("u1", 3, _t(3), "B"),      # change
        ("u1", 4, _t(4), None),     # change to NULL
        ("u1", 5, _t(5), None),     # NULL -> NULL: no change
        ("u1", 6, _t(6), "B"),      # NULL -> B: change
        ("u2", 7, _t(1), "X"),
    ]
    df = spark.createDataFrame(
        rows, "k string, eid long, ts timestamp, attr string")
    h = scd2_from_events(df, "k", "ts", ["attr"], tiebreak="eid")
    got = sorted(
        ((r["k"], r["attr"], r["valid_from"].hour,
          r["valid_to"].hour if r["valid_to"] else None)
         for r in h.collect()),
        key=lambda x: (x[0], x[2]))
    assert got == [
        ("u1", "A", 1, 3),
        ("u1", "B", 3, 4),
        ("u1", None, 4, 6),
        ("u1", "B", 6, None),
        ("u2", "X", 1, None),
    ]


def test_point_in_time_join_matches_interval_and_keeps_prehistory(spark):
    from fsharp_dataframe_spark.functions.scd import (
        point_in_time_join, scd2_from_events,
    )

    dim_ev = spark.createDataFrame(
        [("u1", 1, _t(2), "old"), ("u1", 2, _t(6), "new")],
        "k string, eid long, ts timestamp, state string")
    dim = scd2_from_events(dim_ev, "k", "ts", ["state"], tiebreak="eid")
    facts = spark.createDataFrame(
        [(10, "u1", _t(1)),   # pre-history -> NULL state
         (11, "u1", _t(2)),   # valid_from inclusive -> old
         (12, "u1", _t(5, 59)),
         (13, "u1", _t(6)),   # boundary: new interval opens
         (14, "u2", _t(3))],  # unknown key -> NULL
        "fid long, k string, ts timestamp")
    out = {r["fid"]: r["state"]
           for r in point_in_time_join(facts, dim, "k", "ts").collect()}
    assert out == {10: None, 11: "old", 12: "old", 13: "new", 14: None}
    # the fact's own key must survive the left join for unmatched rows
    keys = {r["fid"]: r["k"] for r in
            point_in_time_join(facts, dim, "k", "ts").collect()}
    assert keys[14] == "u2" and keys[10] == "u1"


def test_point_in_time_join_raises_on_schema_collision(spark):
    import pytest

    from fsharp_dataframe_spark.functions.scd import point_in_time_join

    dim = spark.createDataFrame(
        [("u1", _t(1), None, "s")],
        "k string, valid_from timestamp, valid_to timestamp, state string")
    facts = spark.createDataFrame(
        [("u1", _t(2), _t(0))],
        "k string, ts timestamp, valid_from timestamp")
    with pytest.raises(ValueError, match="valid_from"):
        point_in_time_join(facts, dim, "k", "ts")
    facts2 = spark.createDataFrame(
        [("u1", _t(2), "x")], "k string, ts timestamp, state string")
    with pytest.raises(ValueError, match="state"):
        point_in_time_join(facts2, dim, "k", "ts")


def test_last_touch_attribution_strictness_and_window(spark):
    from fsharp_dataframe_spark.functions.events import (
        last_touch_attribution,
    )

    rows = [
        (1, 7, "click", _t(1)),
        (2, 7, "click", _t(3)),
        (3, 7, "purchase", _t(3)),   # same-instant touch must NOT count
        (4, 7, "purchase", _t(4)),   # -> click@3, lag 3600
        (5, 7, "purchase", _t(10)),  # lag 7*3600 > max_lag -> NULL
        (6, 8, "purchase", _t(2)),   # no touches at all
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    out = {r["event_id"]: (r["touch_ts"], r["lag_s"]) for r in
           last_touch_attribution(df, "purchase", ["click"],
                                  max_lag_s=4 * 3600).collect()}
    assert set(out) == {3, 4, 5, 6}
    assert out[3] == (_t(1), 2 * 3600)   # strictly-before click@1
    assert out[4] == (_t(3), 3600)
    assert out[5] == (None, None)
    assert out[6] == (None, None)


def test_event_cooccurrence_exact_counts(spark):
    from fsharp_dataframe_spark.functions.events import event_cooccurrence

    # u1: a,b  u2: a,b  u3: a  u4: b,c  -> 4 keys
    rows = [(1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b"),
            (3, "a"), (4, "b"), (4, "c")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {(r["type_a"], r["type_b"]): r for r in
           event_cooccurrence(df).collect()}
    ab = got[("a", "b")]
    assert (ab["n_both"], ab["n_a"], ab["n_b"]) == (2, 3, 3)
    assert ab["support_bp"] == 2 * 10000 // 4        # 5000
    assert ab["confidence_bp"] == 2 * 10000 // 3     # 6666
    assert ab["lift_bp"] == 2 * 4 * 10000 // 9       # 8888
    bc = got[("b", "c")]
    assert (bc["n_both"], bc["n_a"], bc["n_b"]) == (1, 3, 1)
    assert ("a", "c") not in got                     # no co-occurrence


def test_phrase_search_positions_and_counts(spark):
    from fsharp_dataframe_spark.functions.search import phrase_search

    docs = spark.createDataFrame(
        [(1, "sort merge join beats sort merge scan"),
         (2, "merge sort is not sort  merge"),       # double space: same
         (3, "sort  then merge"),                    # not adjacent
         (4, "SORT MERGE uppercase"),                # case-folded
         (5, "sort")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_hits"]
           for r in phrase_search(docs, "sort merge").collect()}
    assert got == {1: 2, 2: 1, 4: 1}
    # three-term phrase chains two positional joins
    got3 = {r["doc_id"]: r["n_hits"]
            for r in phrase_search(docs, "sort merge join").collect()}
    assert got3 == {1: 1}
    with pytest.raises(ValueError, match="empty"):
        phrase_search(docs, "   ")


def test_grouped_rank_features_ties_and_tiles(spark):
    from fsharp_dataframe_spark.functions.stats import grouped_rank_features

    rows = [("g", i, v) for i, v in
            enumerate([10.0, 10.0, 20.0, 30.0, 40.0])]
    df = spark.createDataFrame(rows, "g string, eid long, v double")
    out = {r["eid"]: (r["rnk"], r["pct_rank"], r["tile"]) for r in
           grouped_rank_features(df, "g", F.col("v"), ["eid"],
                                 tiebreak="eid", n_tiles=2).collect()}
    # ties share rank and pct_rank; tiles split 3/2 with eid tiebreak
    assert out[0] == (1, 0.0, 1) and out[1] == (1, 0.0, 1)
    assert out[2] == (3, 0.5, 1)
    assert out[3] == (4, 0.75, 2) and out[4] == (5, 1.0, 2)
    # determinism under repartitioning (the content-hash/tiebreak
    # discipline): same tiles whatever the physical layout
    out2 = {r["eid"]: r["tile"] for r in
            grouped_rank_features(df.repartition(5), "g", F.col("v"),
                                  ["eid"], tiebreak="eid",
                                  n_tiles=2).collect()}
    assert out2 == {k: v[2] for k, v in out.items()}


def test_phrase_search_plan_filters_before_join(spark):
    """The postings must be term-filtered BELOW the join — the join
    never sees the full posting list (the selectivity-first discipline
    the docstring claims)."""
    from fsharp_dataframe_spark.functions.search import phrase_search
    from fsharp_dataframe_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = phrase_search(docs, "sort merge")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("= sort") >= 1 and plan.count("= merge") >= 1
    exec_plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in exec_plan


def test_snapshot_diff_statuses_and_null_safety(spark):
    from fsharp_dataframe_spark.functions.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double")
    new = spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged
         (2, "b", None),        # NULL == NULL -> unchanged
         (3, "c", 31.0),        # changed (v)
         (5, "e", 50.0),        # added
         # 4 removed
         ], "k long, s string, v double")
    got = {r["k"]: (r["status"], list(r["changed_cols"])) for r in
           snapshot_diff(old, new, "k").collect()}
    assert got == {3: ("changed", ["v"]), 4: ("removed", []),
                   5: ("added", [])}
    # include_unchanged surfaces the full census; NULL->value is a change
    new2 = new.withColumn("s", F.when(F.col("k") == 2, "x")
                          .otherwise(F.col("s")))
    got2 = {r["k"]: r["status"] for r in
            snapshot_diff(old, new2, "k",
                          include_unchanged=True).collect()}
    assert got2[1] == "unchanged" and got2[2] == "changed"
    # multi-column change lists both names, sorted
    new3 = new.withColumn("s", F.when(F.col("k") == 3, "z")
                          .otherwise(F.col("s")))
    got3 = {r["k"]: list(r["changed_cols"]) for r in
            snapshot_diff(old, new3, "k").collect()}
    assert got3[3] == ["s", "v"]


def test_event_transitions_counts_and_probs(spark):
    from fsharp_dataframe_spark.functions.events import event_transitions

    rows = [(1, 7, "a", _t(1)), (2, 7, "b", _t(2)), (3, 7, "a", _t(3)),
            (4, 7, "b", _t(4)),   # a->b, b->a, a->b
            (5, 8, "a", _t(1)), (6, 8, "a", _t(2))]  # a->a
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    got = {(r["from_type"], r["to_type"]): (r["n"], r["n_from"],
                                            r["prob_bp"]) for r in
           event_transitions(df).collect()}
    assert got == {
        ("a", "b"): (2, 3, 6666),
        ("a", "a"): (1, 3, 3333),
        ("b", "a"): (1, 1, 10000),
    }


def test_last_touch_attribution_window_is_microsecond_exact(spark):
    """The max-lag bound compares exact microseconds, not
    whole-second-truncated lags: a touch max_lag_s + 0.4s before the
    conversion must NOT be credited (the µs-exact DuckDB oracle and
    stream_last_touch both reject it), while one exactly max_lag_s
    before must be."""
    from fsharp_dataframe_spark.functions.events import (
        last_touch_attribution,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # lag = 3600.4 s -> beyond a 3600 s window despite trunc==3600
        (1, 7, "click", base - dt.timedelta(seconds=3600, microseconds=400_000)),
        (2, 7, "purchase", base),
        # lag exactly 3600 s -> inside (<=)
        (3, 8, "click", base - dt.timedelta(seconds=3600)),
        (4, 8, "purchase", base),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    out = {r["event_id"]: (r["touch_type"], r["lag_s"]) for r in
           last_touch_attribution(df, "purchase", ["click"],
                                  max_lag_s=3600).collect()}
    assert out[2] == (None, None)
    assert out[4] == ("click", 3600)


def test_grouped_topk_default_tiebreak_skips_map_columns(spark):
    """xxhash64 rejects MAP-typed inputs — the auto content-hash
    tiebreak must skip them instead of failing analysis (regression:
    pre-r7 such frames worked, with arbitrary tie order)."""
    from fsharp_dataframe_spark.functions.events import grouped_topk

    df = spark.createDataFrame(
        [("u", 1, 5.0, {"a": 1}), ("u", 2, 9.0, {"b": 2})],
        "u string, eid long, v double, m map<string,int>")
    got = [r["eid"] for r in grouped_topk(df, "u", "v", k=1).collect()]
    assert got == [2]


def test_grouped_topk_tiebreak_skips_nested_maps(spark):
    """The map skip must recurse: maps nested in structs/arrays also
    crash xxhash64 (DATATYPE_MISMATCH.HASH_MAP_TYPE)."""
    from fsharp_dataframe_spark.functions.events import grouped_topk

    df = spark.createDataFrame(
        [("u", 1, 5.0, ({"a": 1},), [{"b": 2}]),
         ("u", 2, 9.0, ({"c": 3},), [])],
        "u string, eid long, v double, "
        "s struct<m:map<string,int>>, am array<map<string,int>>")
    got = [r["eid"] for r in grouped_topk(df, "u", "v", k=1).collect()]
    assert got == [2]


def test_twap_subday_units_keep_timestamp_buckets(spark):
    """Sub-day units must keep the full timestamp bucket — a DATE cast
    would collapse 24 hourly buckets into one label."""
    from fsharp_dataframe_spark.functions.timeseries import twap

    rows = [("k", 1, _t(6, 0), 10.0), ("k", 2, _t(7, 30), 20.0)]
    df = spark.createDataFrame(
        rows, "k string, eid long, t timestamp, v double")
    got = {r["bucket"]: r["twap"] for r in
           twap(df, "k", "t", "v", unit="hour", tiebreak="eid").collect()}
    assert set(got) == {_t(6, 0), _t(7, 0)}   # two DISTINCT hour buckets
    assert got[_t(6, 0)] == 10.0              # 06:00-07:00 all v=10
    # 07:00 bucket: only the 07:30 obs -> holds to 08:00 -> 20
    assert got[_t(7, 0)] == 20.0
