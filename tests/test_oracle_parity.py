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


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle still must run and return a stable schema."""
    df = _QUERIES[name](spark, SF_CORRECTNESS)
    assert df.columns, name
    assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
