"""DuckDB oracle parity for the held-out queries.

The driver's correctness harness checks the first 50 entries of
``__spark_entry__.queries()``; the queries in ``EXTRA_QUERIES`` are held
out of that registry to keep every declared query under the hard
signal.  This test keeps the SAME oracle comparison running for them
locally (sf0.001), using the identical canonicalize/compare contract as
tools/check_oracle.py.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_oracle import TABLES, compare

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(entrymod.EXTRA_QUERIES))
def test_extra_query_matches_oracle(spark, con, name):
    q = entrymod.extra_queries()[name]
    sql = entrymod.extra_oracle_sql()[name]
    sdf = q(spark, SF).toPandas()
    odf = con.execute(sql).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_registry_is_within_driver_window():
    # exactly the split we promised: every declared query fits the
    # driver's 50-query harness window, extras stay locally checked
    qs = entrymod.queries()
    assert len(qs) <= 50, len(qs)
    assert not set(entrymod.EXTRA_QUERIES) & set(qs)
    assert set(entrymod.extra_oracle_sql()) == set(entrymod.EXTRA_QUERIES)
