"""Every oracle-backed query must match DuckDB exactly at sf0.01 — the
same gate the driver runs (CORRECTNESS_r{N}.json)."""

import pytest

from hoopstat_haus_spark import registry
from tests.compare import assert_query_matches

SF = "/root/testdata/sf0.01"

QUERIES = registry.all_queries()
ORACLES = registry.all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    assert_query_matches(spark, SF, name, QUERIES[name], ORACLES[name])


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing


def test_rows_only_queries_run(spark):
    """Non-SQL-expressible ops still must execute and return a frame."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF)
        assert df.count() >= 0, name
