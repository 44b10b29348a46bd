"""SCD2 (slowly-changing-dimension, type 2) history tracking on immutable
parquet — the history-preserving twin of ``operators/upsert`` (SURVEY §2.8
M1's keep-latest discards history; the reference keeps chat-session history
rows forever and replays them ordered, session_manager.py:178 family).

``scd2_from_changelog`` turns an append-only changelog (key, ts, attrs)
into versioned history rows ``[valid_from, valid_to)`` with consecutive
no-op changes compressed away. ``scd2_merge`` applies a new batch of
changes incrementally: only the touched keys are rebuilt (semi-join scoped
window), untouched history is carried over by anti-join — the 100 TB shape,
where a daily batch touches a small fraction of keys and the merge cost is
O(batch + touched-history), not O(full history).

Scale notes: both builders are one shuffle on the key (two window
functions over the SAME partitioning — Catalyst reuses the Exchange, no
second shuffle); the merge scopes that shuffle to affected keys only.
``as_of`` point-in-time reads are a pure filter (pushed to the scan when
history is stored partitioned/sorted by key).
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tracked_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Compress an ordered changelog into SCD2 history rows.

    Per key (ordered by ``ts_col`` then ``order_cols`` for a full
    deterministic order): keep the first row and every row where ANY
    tracked column differs from the previous row (null-safe), then
    ``valid_to = lead(valid_from)`` — the current row has
    ``valid_to IS NULL`` / ``is_current = true``.
    """
    order_cols = order_cols or []
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = functools.reduce(
        operator.or_,
        [~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w)) for c in tracked_cols],
    )
    first = F.row_number().over(w) == 1
    changes = (
        df.withColumn("__keep", first | changed)
        .filter(F.col("__keep"))
        .withColumnRenamed(ts_col, "valid_from")
        .drop("__keep")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(
        F.col("valid_from").asc(), *[F.col(c).asc() for c in order_cols]
    )
    hist = changes.withColumn("valid_to", F.lead("valid_from").over(w2))
    return hist.withColumn("is_current", F.col("valid_to").isNull()).select(
        *key_cols, *tracked_cols, *order_cols, "valid_from", "valid_to", "is_current"
    )


def scd2_merge(
    history: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tracked_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Incrementally fold a change batch into existing SCD2 history.

    Touched keys are rebuilt from (their history rows re-expressed as
    changelog entries) ∪ (the new changes); untouched keys pass through by
    broadcast anti-join on the batch's distinct keys (a daily batch's key
    set is small next to the full dimension). Result ≡
    ``scd2_from_changelog(full_changelog)`` — asserted in tests.
    """
    order_cols = order_cols or []
    keys = changes.select(*key_cols).distinct()
    untouched = history.join(F.broadcast(keys), key_cols, "left_anti")
    touched_log = (
        history.join(F.broadcast(keys), key_cols, "left_semi")
        .select(*key_cols, *tracked_cols, *order_cols, F.col("valid_from").alias(ts_col))
        .unionByName(changes.select(*key_cols, *tracked_cols, *order_cols, ts_col))
    )
    rebuilt = scd2_from_changelog(touched_log, key_cols, ts_col, tracked_cols, order_cols)
    return untouched.unionByName(rebuilt)


def as_of(history: DataFrame, ts: Column | str) -> DataFrame:
    """Point-in-time read: the row version valid at ``ts`` — a pure filter,
    no shuffle (``valid_from <= ts < valid_to``, open current interval)."""
    t = F.lit(ts) if not isinstance(ts, Column) else ts
    return history.filter(
        (F.col("valid_from") <= t) & (F.col("valid_to").isNull() | (t < F.col("valid_to")))
    )
