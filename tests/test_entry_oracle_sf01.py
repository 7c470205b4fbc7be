"""Full oracle sweep at sf0.1 (slow-marked; VERDICT r02 item 8): rerun
every oracle-backed __spark_entry__ query against DuckDB at the 10× scale,
so scale-dependent bugs (block boundaries, multi-file merges, LSH bucket
splits) can't hide behind sf0.01's 500-row documents table.

Excluded from the default run (`addopts = -m "not slow"` in pytest.ini);
run with: python -m pytest tests/test_entry_oracle_sf01.py -m slow -q
"""

import pytest

from oracle_sweep import check_against_oracle, make_duck

pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def duck():
    return make_duck(SF_DIR)


def _oracle_names():
    import __spark_entry__ as entrymod

    return sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle_sf01(spark, duck, name):
    check_against_oracle(spark, duck, name, SF_DIR)
