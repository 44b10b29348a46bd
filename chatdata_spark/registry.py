"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers a named query here
with (a) a Spark callable ``(spark, sf_dir) -> DataFrame`` and (b) where
SQL-expressible, an equivalent ANSI-SQL oracle string DuckDB runs on the
same parquet tables. ``__spark_entry__.py`` re-exports the three driver
hooks from this module.

Determinism conventions (SURVEY §5):
- every float output is produced bit-identically on both sides: money
  aggregates go through ``CAST(x AS DECIMAL(18,d))`` before SUM (exact
  decimal arithmetic in both engines) and back to DOUBLE at the end;
  distances are computed in float64 with the same operation order and
  rounded to 6 digits;
- every LIMIT/top-k query carries a full tie-break ordering;
- aggregate/computed columns are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    """Register ``fn`` as a driver-visible query, optionally with its DuckDB
    oracle SQL. Queries with ``oracle=None`` get the driver's weaker
    rows-only check (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn):
        _REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    # Import for registration side effects; keep cheap (no Spark work at import).
    from chatdata_spark.queries import (  # noqa: F401
        dedup,
        dialect,
        ingest,
        mutations,
        relational,
        sampling,
        stateful,
        text,
        timeseries,
        vector,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {k: v.fn for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {k: v.oracle for k, v in _REGISTRY.items() if v.oracle is not None}
