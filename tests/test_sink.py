"""Write-side scale shape (sources/parquet.save_parquet /
save_bucketed_table): partition pruning, row-group stats from
sort_by, and shuffle-free co-bucketed joins — checked in the plans
and footers, not just round-trip values."""

import glob
import os

from pyspark.sql import functions as F

from fsharp_dataframe_spark.sources.parquet import (
    load_table, read_parquet, save_bucketed_table, save_parquet,
)

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    p = str(tmp_path / "orders_part")
    save_parquet(orders, p, partition_by=["o_orderpriority"])
    # one directory per priority, no file fan-out explosion: each
    # directory's rows were written by the tasks owning them
    dirs = [d for d in os.listdir(p) if d.startswith("o_orderpriority=")]
    assert len(dirs) == orders.select("o_orderpriority").distinct().count()
    back = spark.read.parquet(p).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan
    assert back.count() == orders.filter(F.col("o_orderpriority") == "1-URGENT").count()


def test_sorted_write_produces_narrow_row_group_stats(spark, tmp_path):
    import pyarrow.parquet as pq

    li = load_table(spark, SF, "lineitem")
    p = str(tmp_path / "li_sorted")
    save_parquet(li.repartition(1), p, sort_by=["l_orderkey"],
                 max_records_per_file=100000)
    f = glob.glob(f"{p}/*.parquet")[0]
    md = pq.ParquetFile(f).metadata
    idx = next(i for i in range(md.num_columns)
               if md.row_group(0).column(i).path_in_schema == "l_orderkey")
    # row groups must be disjoint, ascending ranges — the property that
    # lets a range predicate skip whole row groups
    prev_max = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        assert st is not None and st.has_min_max
        if prev_max is not None:
            assert st.min >= prev_max
        prev_max = st.max


def test_cobucketed_join_plans_without_exchange(spark, tmp_path):
    import shutil

    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_orders_b", "t_lineitem_b"):  # orphans from killed runs
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    save_bucketed_table(orders, "t_orders_b", ["o_orderkey"], 4,
                        sort_by=["o_orderkey"])
    save_bucketed_table(li.withColumnRenamed("l_orderkey", "o_orderkey"),
                        "t_lineitem_b", ["o_orderkey"], 4,
                        sort_by=["o_orderkey"])
    # at sf0.001 AQE would just broadcast one side (correctly —
    # broadcast beats bucketing at toy sizes); pin the shuffle-join
    # path the bucketing exists for, as it would plan on two 100 TB
    # fact tables where neither side broadcasts
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("t_orders_b")
             .join(spark.table("t_lineitem_b").hint("merge"), "o_orderkey"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the whole point of co-bucketing: the join needs NO shuffle
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert j.count() == orders.join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey").count()
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_read_parquet_ntz_modes(spark, tmp_path):
    # ADVICE r4: foreign parquet TIMESTAMP(isAdjustedToUTC=false) means
    # wall-clock local time; the default utc reinterpretation must WARN
    # (not silently shift), and ntz='keep' must preserve TIMESTAMP_NTZ
    import datetime
    import warnings

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fsharp_dataframe_spark.sources.parquet import read_parquet

    p = str(tmp_path / "foreign_ntz.parquet")
    t = pa.table({"id": [1, 2],
                  "ts": pa.array([datetime.datetime(2024, 1, 1, 12, 0),
                                  datetime.datetime(2024, 6, 1, 0, 30)],
                                 type=pa.timestamp("us"))})
    pq.write_table(t, p)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        df = read_parquet(spark, p)
        assert any("isAdjustedToUTC=false" in str(x.message) for x in w)
    assert dict(df.dtypes)["ts"] == "timestamp"

    kept = read_parquet(spark, p, ntz="keep")
    assert dict(kept.dtypes)["ts"] == "timestamp_ntz"
    # stored micros identical either way — 'utc' relabels, never shifts
    a = [r["ts"].replace(tzinfo=None) for r in df.orderBy("id").collect()]
    b = [r["ts"] for r in kept.orderBy("id").collect()]
    assert a == b


def test_orc_round_trip_with_partitioning_and_pushdown(spark, tmp_path):
    # parity-plus ORC source/sink: partitioned write prunes directories,
    # filter pushdown reaches the ORC scan, values round-trip exactly
    from fsharp_dataframe_spark.sources.orc import read_orc, save_orc
    from fsharp_dataframe_spark.sources.parquet import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    out = str(tmp_path / "orders_orc")
    save_orc(orders, out, partition_by=["o_orderpriority"],
             sort_by=["o_orderkey"])
    back = read_orc(spark, out)
    assert back.count() == orders.count()
    a = orders.agg(F.sum("o_totalprice"), F.min("o_orderkey"),
                   F.max("o_orderkey")).collect()[0]
    b = back.agg(F.sum("o_totalprice"), F.min("o_orderkey"),
                 F.max("o_orderkey")).collect()[0]
    assert (a[1], a[2]) == (b[1], b[2])
    assert abs(a[0] - b[0]) < 1e-6
    # partition pruning: a filter on the partition column reads only
    # that directory (PartitionFilters in the scan)
    q = back.filter(F.col("o_orderpriority") == "1-URGENT")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "1-URGENT" in plan
    # predicate pushdown on a data column reaches the ORC scan
    q2 = back.filter(F.col("o_orderkey") < 100)
    plan2 = q2._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan2 and "LessThan(o_orderkey" in plan2


def test_zorder_write_narrows_rowgroup_stats_in_both_dims(spark, tmp_path):
    """Z-order clustering must make parquet row-group min/max ranges
    narrow in BOTH listed columns (single-column sorting narrows only
    its own).  Verified through pyarrow row-group metadata — the same
    stats a 100 TB reader's predicate pushdown prunes with."""
    import glob

    import pyarrow.parquet as pq

    from fsharp_dataframe_spark.sources.parquet import (
        load_table, save_parquet_zorder,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events") \
        .select("user_id", "value", "event_id")
    out = str(tmp_path / "zordered")
    save_parquet_zorder(ev, out, ["user_id", "value"], n_files=4)

    def rel_widths(path_glob, col, lo, hi):
        widths = []
        for f in glob.glob(path_glob):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                widths.append((st.max - st.min) / (hi - lo))
        return widths

    bounds = ev.agg(F.min("user_id"), F.max("user_id"),
                    F.min("value"), F.max("value")).first()
    wu = rel_widths(out + "/part-*.parquet", "user_id", bounds[0], bounds[1])
    wv = rel_widths(out + "/part-*.parquet", "value", bounds[2], bounds[3])
    assert wu and wv
    # every z-run covers a bounded sub-rectangle — compare against an
    # UNSORTED 4-file write of the same data (each of whose files spans
    # ~the full range in both dims).  A comparative bound is stable:
    # repartitionByRange's boundary sampling is seeded by the session's
    # RDD-id counter, so absolute widths shift a few percent with how
    # many jobs ran earlier; the z-vs-plain narrowing is the invariant.
    plain = str(tmp_path / "plain")
    ev.repartition(4).write.parquet(plain)
    pu = rel_widths(plain + "/part-*.parquet", "user_id",
                    bounds[0], bounds[1])
    pv = rel_widths(plain + "/part-*.parquet", "value", bounds[2], bounds[3])
    assert sum(wu) / len(wu) < 0.8 * (sum(pu) / len(pu))
    assert sum(wv) / len(wv) < 0.8 * (sum(pv) / len(pv))
    # and in absolute terms each dimension still averages a strict
    # sub-range (an unsorted file averages ~1.0)
    assert sum(wu) / len(wu) < 0.75
    assert sum(wv) / len(wv) < 0.75
    # round-trip: no rows lost or duplicated
    assert spark.read.parquet(out).count() == ev.count()


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from fsharp_dataframe_spark.sources.parquet import (
        compact_parquet, load_table,
    )

    src = str(tmp_path / "fragmented")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(20).write.parquet(src)  # 20 tiny files
    import glob
    assert len(glob.glob(src + "/*.parquet")) == 20

    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_bytes=64 * 1024 * 1024,
                        sort_by=["ts"])
    assert n == 1  # tiny input fits one target-sized file
    back = spark.read.parquet(dst)
    assert back.count() == ev.count()


def test_merge_parquet_flat_upsert(spark, tmp_path):
    from fsharp_dataframe_spark.sources.parquet import (
        merge_parquet, read_parquet,
    )

    p = str(tmp_path / "flat")
    base = spark.createDataFrame([(i, f"v{i}") for i in range(10)],
                                 "id long, val string")
    merge_parquet(spark, p, base, "id")
    up = spark.createDataFrame([(3, "NEW3"), (99, "NEW99")],
                               "id long, val string")
    merge_parquet(spark, p, up, "id")
    out = {r["id"]: r["val"] for r in read_parquet(spark, p).collect()}
    assert len(out) == 11
    assert out[3] == "NEW3" and out[99] == "NEW99" and out[4] == "v4"
    # no staging directory left behind
    assert not (tmp_path / "flat.__staging__").exists()


def test_merge_parquet_partition_scoped_rewrite(spark, tmp_path):
    import glob
    import os

    from fsharp_dataframe_spark.sources.parquet import (
        merge_parquet, read_parquet,
    )

    p = str(tmp_path / "part")
    base = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr", f"v{i}") for i in range(10)],
        "id long, lang string, val string")
    merge_parquet(spark, p, base, "id", partition_by=["lang"])
    fr_files = sorted(glob.glob(p + "/lang=fr/*.parquet"))
    fr_mtimes = [os.path.getmtime(f) for f in fr_files]
    assert fr_files

    up = spark.createDataFrame(
        [(1, "en", "EN-NEW"), (101, "en", "EN-ADD")],
        "id long, lang string, val string")
    merge_parquet(spark, p, up, "id", partition_by=["lang"])
    out = {r["id"]: (r["lang"], r["val"])
           for r in read_parquet(spark, p).collect()}
    assert len(out) == 11
    assert out[1] == ("en", "EN-NEW") and out[101] == ("en", "EN-ADD")
    assert out[2] == ("fr", "v2")
    # the UNTOUCHED partition's files are bit-identical (same paths,
    # same mtimes): the rewrite was scoped to lang=en only
    fr_files2 = sorted(glob.glob(p + "/lang=fr/*.parquet"))
    assert fr_files2 == fr_files
    assert [os.path.getmtime(f) for f in fr_files2] == fr_mtimes

    # idempotence: replaying the same update changes nothing
    merge_parquet(spark, p, up, "id", partition_by=["lang"])
    out2 = {r["id"]: (r["lang"], r["val"])
            for r in read_parquet(spark, p).collect()}
    assert out2 == out
