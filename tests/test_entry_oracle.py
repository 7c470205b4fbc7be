"""Emulates the driver's correctness gate: run every __spark_entry__
queries() entry at sf0.01 and compare row count + schema + order-insensitive
values against its DuckDB oracle.  (Shared harness: oracle_sweep.py; the
sf0.1 twin is slow-marked in test_entry_oracle_sf01.py.)"""

import pytest

from oracle_sweep import check_against_oracle, make_duck

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    return make_duck(SF_DIR)


ORACLES = entrymod.oracle_sql()
ALL = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    check_against_oracle(spark, duck, name, SF_DIR)


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = ALL[name](spark, SF_DIR)
    assert df.count() >= 0 and len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
