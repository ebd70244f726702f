"""Every registry query with an oracle must match DuckDB at sf0.01 —
the same check the driver's correctness gate runs."""

from __future__ import annotations

import pytest

from datapipeline_gcp_spark import registry

from tests.conftest import SF_CORRECTNESS, run_oracle_check

_QUERIES = registry.all_queries()
_ORACLES = registry.all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, name):
    run_oracle_check(spark, name, _QUERIES[name], _ORACLES[name], SF_CORRECTNESS)


def test_every_query_is_oracle_checked():
    """Since r5 the registry carries no oracle-less queries (the sketch
    twins emit their accuracy contracts as data). A future genuinely
    non-SQL-expressible op must be declared in registry.ROWS_ONLY, at
    which point this becomes a parametrized run-and-schema check again."""
    assert set(_QUERIES) == set(_ORACLES)
    assert registry.ROWS_ONLY == set()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
