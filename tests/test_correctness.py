"""The t2 gate, locally: every registered query with an oracle must match
DuckDB exactly at sf0.01 (same check the driver runs). Queries without an
oracle are smoke-run (non-empty schema, executes)."""

from __future__ import annotations

import pytest

from chatdata_spark.registry import oracle_sql, queries
from tests.conftest import SF_ORACLE, assert_matches_oracle

_QUERIES = queries()
_ORACLES = oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, name):
    df = _QUERIES[name](spark, SF_ORACLE)
    if name in _ORACLES:
        assert_matches_oracle(df, _ORACLES[name], SF_ORACLE, name=name)
    else:
        # rows-only smoke for non-SQL-expressible ops
        assert df.columns, f"{name}: empty schema"
        df.limit(5).collect()
