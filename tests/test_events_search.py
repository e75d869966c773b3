"""Unit semantics for batch sessionization and BM25 search.

The driver-facing oracles (sessionize / bm25_search) pin both against
DuckDB on real tables; these tests pin the hand-checkable edge
semantics — gap boundaries, tie-breaks, idf monotonicity — on tiny
constructed inputs.
"""

import datetime as dt
import math

import pytest

from fsharp_dataframe_spark.functions.events import session_stats, sessionize
from fsharp_dataframe_spark.functions.search import (
    bm25_topk, doc_term_freq, query_terms,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, e, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), v)
         for (u, e, s, v) in rows],
        "user_id long, event_id long, ts timestamp, value double")


def test_sessionize_gap_boundary_is_inclusive(spark):
    # 0s, +1800s (exactly the gap: SAME session), +3601s (> gap: break)
    df = _ev(spark, [(1, 1, 0, 1.0), (1, 2, 1800, 1.0), (1, 3, 5401, 1.0)])
    out = {r["event_id"]: r["session_idx"]
           for r in sessionize(df, gap_seconds=1800).collect()}
    assert out == {1: 1, 2: 1, 3: 2}


def test_sessionize_per_key_independent(spark):
    df = _ev(spark, [(1, 1, 0, 1.0), (2, 2, 10, 1.0),
                     (1, 3, 10_000, 1.0), (2, 4, 20, 1.0)])
    out = {r["event_id"]: (r["user_id"], r["session_idx"])
           for r in sessionize(df, gap_seconds=1800).collect()}
    assert out == {1: (1, 1), 3: (1, 2), 2: (2, 1), 4: (2, 1)}


def test_sessionize_ties_break_on_order_col(spark):
    # two events at the identical timestamp: lag order (and therefore
    # the break flag) must follow event_id, not partition luck
    df = _ev(spark, [(1, 2, 0, 1.0), (1, 1, 0, 1.0), (1, 3, 9000, 1.0)])
    out = sessionize(df, gap_seconds=1800).collect()
    assert {r["event_id"]: r["session_idx"] for r in out} == {1: 1, 2: 1, 3: 2}


def test_session_stats_rollup(spark):
    df = _ev(spark, [(7, 1, 0, 1.5), (7, 2, 60, 2.25), (7, 3, 10_000, 4.0)])
    rows = {r["session_idx"]: r
            for r in session_stats(df, gap_seconds=1800).collect()}
    assert rows[1]["n_events"] == 2
    assert rows[1]["duration_s"] == 60
    assert rows[1]["sum_value"] == pytest.approx(3.75)
    assert rows[2]["n_events"] == 1
    assert rows[2]["duration_s"] == 0


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")


def test_query_terms_dedup_lower_sort():
    assert query_terms("  Spark  spark MERGE ") == ["merge", "spark"]
    assert query_terms("") == []


def test_doc_term_freq_tf_and_dl(spark):
    df = _docs(spark, ["a b a c", "b b"])
    out = {(r["doc_id"], r["token"]): (r["tf"], r["dl"])
           for r in doc_term_freq(df, ["a", "b"]).collect()}
    assert out == {(0, "a"): (2, 4), (0, "b"): (1, 4), (1, "b"): (2, 2)}


def test_bm25_ranks_term_matches_sensibly(spark):
    # "rare" appears only in doc 0; "common" in every doc.  Doc 0 must
    # outrank docs that only match the common term, and every returned
    # score is positive with n_hit counting distinct matched terms.
    df = _docs(spark, ["rare common filler filler",
                       "common filler filler filler",
                       "common filler filler filler",
                       "filler filler filler filler"])
    rows = bm25_topk(df, "rare common", k=10).collect()
    assert rows[0]["doc_id"] == 0 and rows[0]["n_hit"] == 2
    got = {r["doc_id"] for r in rows}
    assert got == {0, 1, 2}  # doc 3 matches nothing
    assert all(r["score"] > 0 for r in rows)


def test_bm25_tf_saturation(spark):
    # BM25's tf saturation: 10 repeats of the term beats 1 repeat, but
    # by far less than 10x (k1 bounds the tf term at k1+1)
    df = _docs(spark, ["t " + "x " * 9, ("t " * 10).strip(),
                       "x x x x x x x x x x"])
    rows = {r["doc_id"]: r["score"] for r in bm25_topk(df, "t", k=10).collect()}
    assert rows[0] < rows[1] < rows[0] * 3


def test_bm25_empty_query_raises(spark):
    df = _docs(spark, ["a"])
    with pytest.raises(ValueError):
        bm25_topk(df, "   ")


def test_bm25_idf_monotone_in_df():
    # the RSJ idf itself: rarer terms get strictly larger idf
    n = 100
    idf = lambda dfreq: math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
    assert idf(1) > idf(10) > idf(99) > 0


def test_term_index_roundtrip_bit_identical(spark, tmp_path):
    """bm25_topk_indexed over a built index returns exactly what
    bm25_topk returns on the source corpus — same scoring core, same
    integer totals, so scores match to the last bit, not a tolerance."""
    from fsharp_dataframe_spark.functions.search import (
        bm25_topk_indexed, build_term_index,
    )
    from fsharp_dataframe_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = str(tmp_path / "term_index")
    build_term_index(docs, idx)
    direct = bm25_topk(docs, "spark merge vector", k=25).collect()
    indexed = bm25_topk_indexed(spark, idx, "spark merge vector", k=25).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in indexed]


def test_term_index_scan_pushes_token_filter(spark, tmp_path):
    """The query-time token filter must reach the parquet scan
    (PushedFilters: In(token, ...)), so the token-sorted row-group
    stats can prune — the property that makes index reads O(query),
    not O(index)."""
    from fsharp_dataframe_spark.functions.search import (
        bm25_topk_indexed, build_term_index,
    )

    df = _docs(spark, ["a b c", "b c d", "c d e"])
    idx = str(tmp_path / "tiny_index")
    build_term_index(df, idx)
    plan = (bm25_topk_indexed(spark, idx, "b d", k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [In(token" in plan


def test_funnel_strictly_after_semantics(spark):
    # A: full ordered funnel; B: view only; C: click BEFORE view (must
    # not count); D: click at exactly the view time (not strictly
    # after — must not count)
    df = _ev_typed(spark, [
        (1, 1, 0, "view"), (1, 2, 10, "click"), (1, 3, 20, "purchase"),
        (2, 4, 0, "view"), (2, 5, 5, "purchase"),
        (3, 6, 5, "click"), (3, 7, 10, "view"),
        (4, 8, 10, "view"), (4, 9, 10, "click"),
    ])
    from fsharp_dataframe_spark.functions.events import funnel

    out = {r["step"]: (r["n_keys"], r["conversion"])
           for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert out["view"] == (4, None)
    assert out["click"] == (1, 0.25)
    assert out["purchase"] == (1, 1.0)


def _ev_typed(spark, rows):
    return spark.createDataFrame(
        [(u, e, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), t)
         for (u, e, s, t) in rows],
        "user_id long, event_id long, ts timestamp, event_type string")


def test_profile_columns_facts(spark):
    from fsharp_dataframe_spark.functions.profile import profile_columns

    df = spark.createDataFrame(
        [(1, 2.0, "x"), (2, None, "y"), (3, 4.0, None), (3, 4.0, "y")],
        "a long, b double, c string")
    out = {r["column"]: r for r in profile_columns(df).collect()}
    assert out["a"]["n_rows"] == 4 and out["a"]["n_null"] == 0
    assert out["a"]["n_distinct"] == 3
    assert out["a"]["min_val"] == 1.0 and out["a"]["max_val"] == 3.0
    assert out["b"]["n_null"] == 1 and out["b"]["n_distinct"] == 2
    assert out["c"]["n_null"] == 1 and out["c"]["n_distinct"] == 2
    assert out["c"]["min_val"] is None and out["c"]["max_val"] is None
    with pytest.raises(ValueError):
        profile_columns(df, ["nope"])


def test_profile_columns_approx_mode(spark):
    from fsharp_dataframe_spark.functions.profile import profile_columns

    df = spark.range(1000).selectExpr("id", "id % 7 AS m")
    out = {r["column"]: r["n_distinct"]
           for r in profile_columns(df, exact_distinct=False).collect()}
    # HLL ~2% error: distinct(id)=1000, distinct(m)=7
    assert abs(out["id"] - 1000) <= 50 and out["m"] == 7


def test_retention_cells(spark):
    # period 100s; users 1,2 first in period 0; user 3 first in period 1.
    # period-0 cohort: both active at offset 0; only user 2 returns in
    # offset 1; user 1 returns at offset 3.
    from fsharp_dataframe_spark.functions.events import retention

    df = _ev(spark, [
        (1, 1, 10, 0.0), (2, 2, 20, 0.0),       # cohort 0
        (2, 3, 150, 0.0),                        # offset 1
        (1, 4, 310, 0.0),                        # offset 3
        (3, 5, 130, 0.0), (3, 6, 140, 0.0),      # cohort 1, offset 0 only
    ])
    out = {(r["cohort_start"].second + r["cohort_start"].minute * 60,
            r["offset"]): (r["n_active"], r["n_cohort"], r["rate"])
           for r in retention(df, period_seconds=100).collect()}
    # timestamps floor to epoch-anchored 100s periods; dt(2024,1,1)
    # epoch is a multiple of 100s (86400*diff days), so periods align
    # at :00/:40/:20 second marks — key on (offset) per cohort size
    by_cohort = {}
    for (sec, off), v in out.items():
        by_cohort.setdefault(sec, {})[off] = v
    big = next(v for v in by_cohort.values() if v[0][1] == 2)
    small = next(v for v in by_cohort.values() if v[0][1] == 1)
    assert big[0] == (2, 2, 1.0) and big[1] == (1, 2, 0.5) and big[3] == (1, 2, 0.5)
    assert 2 not in big
    assert small[0] == (1, 1, 1.0) and len(small) == 1


def test_frame_describe_delegates_to_profiler(spark):
    from fsharp_dataframe_spark.frame import Frame

    df = spark.createDataFrame([(1, 10.0, None), (2, None, "x")],
                               "k long, v double, s string")
    f = Frame(df, key=["k"])
    out = {r["column"]: r for r in f.describe().collect()}
    assert set(out) == {"v", "s"}  # data columns only, not the key
    assert out["v"]["n_null"] == 1 and out["v"]["max_val"] == 10.0
    assert out["s"]["n_distinct"] == 1


def test_key_skew_stats(spark):
    from fsharp_dataframe_spark.functions.profile import key_skew_stats

    df = spark.createDataFrame([(k,) for k in [1] * 6 + [2] * 3 + [3]],
                               "k long")
    rows = key_skew_stats(df, "k", top_n=2).collect()
    assert [(r["key"], r["n_rows"]) for r in rows] == [(1, 6), (2, 3)]
    assert rows[0]["share"] == 0.6
    assert rows[0]["total_rows"] == 10 and rows[0]["n_keys"] == 3


def test_bm25_batch_equals_per_query(spark):
    """Each query's rows in the one-pass batch scorer must equal its
    single-query bm25_topk result (same quantized scoring core)."""
    from fsharp_dataframe_spark.functions.search import bm25_topk_batch
    from fsharp_dataframe_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    queries = {"q1": "spark merge vector", "q2": "window hash join",
               "q3": "customer"}
    batch = bm25_topk_batch(docs, queries, k=10).collect()
    for qid, q in queries.items():
        single = [(r["doc_id"], r["score"], r["n_hit"])
                  for r in bm25_topk(docs, q, k=10).collect()]
        got = [(r["doc_id"], r["score"], r["n_hit"])
               for r in sorted((r for r in batch if r["query_id"] == qid),
                               key=lambda r: r["rank"])]
        assert got == single, qid


def test_funnel_within_window(spark):
    # user 1 converts within 60s of first view; user 2's purchase falls
    # outside the window (click inside, purchase at +120s)
    from fsharp_dataframe_spark.functions.events import funnel

    df = _ev_typed(spark, [
        (1, 1, 0, "view"), (1, 2, 30, "click"), (1, 3, 50, "purchase"),
        (2, 4, 0, "view"), (2, 5, 40, "click"), (2, 6, 120, "purchase"),
    ])
    out = {r["step"]: r["n_keys"]
           for r in funnel(df, ["view", "click", "purchase"],
                           within_seconds=60).collect()}
    assert out == {"view": 2, "click": 2, "purchase": 1}
    # unconstrained: both convert
    out2 = {r["step"]: r["n_keys"]
            for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert out2["purchase"] == 2


def test_doc_keywords_ranks_distinctive_terms(spark):
    from fsharp_dataframe_spark.functions.search import doc_keywords

    # 'zebra' appears in doc 0 only; 'common' in every doc — at EQUAL
    # tf the rare term must outrank the ubiquitous one
    df = _docs(spark, ["zebra common", "common filler",
                       "common filler", "common filler"])
    rows = doc_keywords(df, k=2).collect()
    d0 = sorted((r for r in rows if r["doc_id"] == 0),
                key=lambda r: r["rank"])
    assert d0[0]["token"] == "zebra" and d0[0]["rank"] == 1
    assert all(r["score"] > 0 for r in rows)
    # rank is dense 1..k per doc, deterministic tie-break by token
    for did in {r["doc_id"] for r in rows}:
        ranks = sorted(r["rank"] for r in rows if r["doc_id"] == did)
        assert ranks == list(range(1, len(ranks) + 1))
