"""Scale-safe per-group top-k.

The textbook `row_number() OVER (PARTITION BY g ORDER BY ...) <= k` plan
sorts EVERY group on a single task — fine when there are many groups, a
serialization point when there are few, large groups (5 priorities over
10^11 rows = 5 tasks doing all the work). ``grouped_topk`` adds an optional
two-phase refinement: phase 1 computes a local top-k per (group, salt)
bucket — parallelism = n_groups x n_salts, each task sorting only its
bucket — and phase 2 re-ranks the surviving n_groups x n_salts x k rows
(tiny) for the exact global answer. Deterministic: the salt is a hash of a
caller-named tie-break column, not a random number, so results and plans
are stable across runs and layouts.

Reference parity: ClickHouse ``LIMIT k BY group`` (the reference's engine
exposes it via SQL; SURVEY §2.4/T1 covers global top-k, this is the
per-group form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_on: str | None = None,
    n_salts: int = 32,
) -> DataFrame:
    """Exact top-k rows per group under ``order_cols`` (include explicit
    tie-breaks — a non-total order makes any engine's answer arbitrary).

    ``salt_on``: column whose hash spreads each group over ``n_salts``
    buckets for the two-phase plan; ``None`` = single window pass (right
    when groups are plentiful/small).
    """
    if salt_on is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts))
        local = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
        df = (
            df.withColumn("__salt", salt)
            .withColumn("__rn", F.row_number().over(local))
            .filter(F.col("__rn") <= k)
            .drop("__rn", "__salt")
        )
    final = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(final))
        .filter(F.col("__rn") <= k)
        .withColumn("rnk", F.col("__rn").cast("long"))
        .drop("__rn")
    )
