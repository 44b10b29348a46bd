"""Skew-handling utilities (SURVEY §4 'Spill/shuffle' row; BASELINE north
star: '100 TB scale' — a handful of hot keys is the norm in web-scale
corpora: one domain, one language, one near-empty document cluster).

Two complementary tools:
- AQE skew-join handling is ON in the session factory
  (``spark.sql.adaptive.skewJoin.enabled``) — splits oversized shuffle
  partitions at runtime; zero code.
- ``salted_aggregate`` is the static fallback for single-key hot spots in
  aggregations (AQE cannot split one GROUP BY key): two-phase agg via a
  salt that is DETERMINISTIC (hash of a row id column, not rand()) so
  results stay reproducible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    salt_from: str,
    n_salts: int,
    partial_aggs: dict[str, Callable[[], Column]],
    final_aggs: dict[str, Callable[[str], Column]],
) -> DataFrame:
    """Two-phase aggregation: phase 1 groups on (key, salt) — a hot key's
    rows spread over ``n_salts`` reducers — phase 2 merges partials on the
    key alone (n_keys × n_salts rows, trivially small).

    ``partial_aggs[name]()`` builds the phase-1 aggregate; the phase-2
    ``final_aggs[name](partial_col)`` merges it (COUNT → count then sum;
    SUM/MIN/MAX → same fn twice; AVG must be decomposed into sum+count by
    the caller). Output column = ``name``."""
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).alias("__salt")
    phase1 = df.groupBy(*key_cols, salt).agg(
        *[fn().alias(f"__p_{name}") for name, fn in partial_aggs.items()]
    )
    return phase1.groupBy(*key_cols).agg(
        *[fn(f"__p_{name}").alias(name) for name, fn in final_aggs.items()]
    )
