"""Skew-shape operators (operators/skew.py): result-identity with the
naive forms, plan shape (salted shuffle key), and the re-aggregation
contract (counts re-sum, min/max re-apply)."""

from pyspark.sql import functions as F

from fsharp_dataframe_spark.operators.skew import salted_agg, salted_join
from fsharp_dataframe_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_salted_agg_matches_naive(spark):
    ev = load_table(spark, SF, "events")
    u = F.round(F.col("value") * 10000).cast("long")
    aggs = {"n": F.count("*"), "su": F.sum(u),
            "lo": F.min("value"), "hi": F.max("value")}
    salted = {r["event_type"]: (r["n"], r["su"], r["lo"], r["hi"])
              for r in salted_agg(ev, "event_type", aggs, n_salts=16).collect()}
    naive = {r["event_type"]: (r["n"], r["su"], r["lo"], r["hi"])
             for r in ev.groupBy("event_type")
             .agg(*[c.alias(n) for n, c in aggs.items()]).collect()}
    assert salted == naive and len(salted) == 5


def test_salted_agg_phase1_keys_include_salt(spark):
    ev = load_table(spark, SF, "events")
    out = salted_agg(ev, "event_type", {"n": F.count("*")}, n_salts=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan          # phase-1 shuffle carries the salt
    assert "__salt" not in out.columns


def test_salted_join_matches_naive_and_spreads_key(spark):
    ev = load_table(spark, SF, "events").select("event_id", "event_type", "value")
    dim = (ev.groupBy("event_type")
           .agg(F.count("*").alias("type_n")))
    naive = {(r["event_id"], r["type_n"])
             for r in ev.join(dim, "event_type").collect()}
    salted_df = salted_join(ev, dim, "event_type", n_salts=4)
    salted = {(r["event_id"], r["type_n"]) for r in salted_df.collect()}
    assert salted == naive
    # left outer keeps unmatched rows exactly once
    dim2 = dim.filter(F.col("event_type") == "view")
    left = salted_join(ev, dim2, "event_type", n_salts=4, how="left")
    assert left.count() == ev.count()
    assert left.filter(F.col("type_n").isNull()).count() == \
        ev.filter(F.col("event_type") != "view").count()


def test_salted_join_rejects_right_preserving_modes(spark):
    # right/full replicate unmatched RIGHT rows n_salts× (the right
    # side carries every salt; an unmatched key null-extends once per
    # copy) — the guard must raise instead of corrupting
    import pytest

    ev = load_table(spark, SF, "events").select("event_id", "event_type")
    dim = ev.groupBy("event_type").agg(F.count("*").alias("type_n"))
    for how in ("right", "right_outer", "full", "full_outer", "outer",
                "cross"):
        with pytest.raises(ValueError, match="salt-safe"):
            salted_join(ev, dim, "event_type", n_salts=4, how=how)


def test_salted_join_semi_anti_match_naive(spark):
    ev = load_table(spark, SF, "events").select("event_id", "event_type")
    dim = (ev.groupBy("event_type").agg(F.count("*").alias("type_n"))
           .filter(F.col("event_type").isin("view", "click")))
    for how in ("left_semi", "left_anti"):
        naive = {r["event_id"]
                 for r in ev.join(dim, "event_type", how).collect()}
        salted = {r["event_id"] for r in
                  salted_join(ev, dim, "event_type", n_salts=4,
                              how=how).collect()}
        assert salted == naive, how
    assert len(naive) > 0


def test_salted_agg_non_power_of_two_salts_and_min_value_hash(spark):
    # pmod salt: equivalence must hold for n_salts that do NOT divide
    # 2^31 (the abs(hash)%n form went negative there) — and a row whose
    # murmur3 hash is Integer.MIN_VALUE must not kill the job under
    # ANSI (abs would overflow)
    ev = load_table(spark, SF, "events")
    aggs = {"n": F.count("*"), "lo": F.min("value")}
    for n_salts in (5, 10, 12):
        salted = {r["event_type"]: (r["n"], r["lo"]) for r in
                  salted_agg(ev, "event_type", aggs, n_salts=n_salts).collect()}
        naive = {r["event_type"]: (r["n"], r["lo"]) for r in
                 ev.groupBy("event_type")
                 .agg(*[c.alias(n) for n, c in aggs.items()]).collect()}
        assert salted == naive, n_salts


def test_salted_agg_rejects_non_decomposable_aggregates(spark):
    import pytest

    ev = load_table(spark, SF, "events")
    with pytest.raises(ValueError, match="DISTINCT"):
        salted_agg(ev, "event_type", {"nd": F.countDistinct("value")})
    with pytest.raises(ValueError, match="whitelist"):
        salted_agg(ev, "event_type", {"f": F.min_by("value", "ts")})
    with pytest.raises(ValueError, match="whitelist"):
        salted_agg(ev, "event_type", {"m": F.avg("value")})


def test_salted_agg_accepts_columns_named_distinct(spark):
    # the DISTINCT guard must inspect the aggregate expression only:
    # a frame whose COLUMN is called n_distinct (e.g. sketch.py's
    # merge output) with a plain sum was falsely rejected
    df = spark.createDataFrame(
        [("a", 3), ("a", 4), ("b", 5)], "k string, n_distinct long")
    got = {r["k"]: r["distinct_total"] for r in
           salted_agg(df, "k", {"distinct_total": F.sum("n_distinct")},
                      n_salts=4).collect()}
    assert got == {"a": 7, "b": 5}
