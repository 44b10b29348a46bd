"""The t2 gate, locally: every registered query with an oracle must match
DuckDB exactly at sf0.01 (same check the driver runs). Queries without an
oracle are smoke-run (non-empty schema, executes)."""

from __future__ import annotations

import pytest

from chatdata_spark.registry import oracle_sql, queries
from tests.conftest import (
    SF_ORACLE,
    assert_driver_hashable_schema,
    assert_matches_oracle,
)

_QUERIES = queries()
_ORACLES = oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, name):
    df = _QUERIES[name](spark, SF_ORACLE)
    assert_driver_hashable_schema(df, name=name)
    if name in _ORACLES:
        assert_matches_oracle(df, _ORACLES[name], SF_ORACLE, name=name)
    else:
        # rows-only smoke for non-SQL-expressible ops
        assert df.columns, f"{name}: empty schema"
        df.limit(5).collect()


def test_no_oracle_produces_hugeint():
    """Type-sweep guard: DuckDB types SUM(CASE...)/SUM(int) as HUGEINT, which
    pandas materializes as float64 — the driver then hashes 20882.0 against
    Spark's bigint 20882 and goes red even though values match (the one red
    row of round 4, data_quality_report). Our local comparator maps HUGEINT
    to the bigint family so pytest alone can't catch it; this sweep runs
    every oracle through DuckDB's relation type API (bind/plan only, no
    execution) and pins the HUGEINT column count at zero. Fix sites by
    wrapping the aggregate in CAST(... AS BIGINT)."""
    from tests.conftest import duck_con

    con = duck_con(SF_ORACLE)
    offenders = {}
    for name, sql in sorted(_ORACLES.items()):
        rel = con.sql(sql)
        bad = [c for c, t in zip(rel.columns, rel.types) if str(t) == "HUGEINT"]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles with HUGEINT columns (pandas->float64 driver hash hazard): {offenders}"
    )
