"""Time-series operators Spark lacks as built-ins: as-of join and gap
sessionization (extensions; nearest reference artifact is the epoch-float
message ordering, SURVEY §2.5/§1.3 — these are the operators an event
pipeline needs at scale).

Both are **single-shuffle window formulations** — no join explosion:

- as-of join: tag left/right rows, union, one window pass per partition key
  ordered by (ts, side) carrying the last right payload forward
  (``last(..., ignorenulls=True)``). Cost = shuffle on the key + sort
  within partition — the merge-join shape, robust to arbitrarily many
  right rows per left row (a range-condition join would explode).
- sessionize: lag + running sum of gap-breaks. One window, no join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    payload_cols: list[str] | None = None,
    prefix: str = "asof_",
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.ts <= left.ts`` and equal ``on`` key (NULLs when none).

    ``tie_break``: right column used to pick deterministically among right
    rows sharing (key, ts) — highest wins. Required for oracle-stable
    results when right timestamps can collide."""
    rts = right_ts_col or ts_col
    payload_cols = payload_cols or [c for c in right.columns if c not in (on, rts)]

    r = right
    if tie_break is not None:
        w_dedup = Window.partitionBy(on, rts).orderBy(F.col(tie_break).desc())
        r = (
            r.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    payload = F.struct(*[F.col(c).alias(c) for c in [rts, *payload_cols]])
    r_tagged = r.select(
        F.col(on).alias("__k"),
        F.col(rts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    unioned = l_tagged.unionByName(r_tagged.withColumn("__left", F.lit(None).cast(l_tagged.schema["__left"].dataType)))
    # right rows sort before left rows at equal ts → inclusive (<=) semantics
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        F.col(f"__match.{rts}").alias(f"{prefix}{rts}"),
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    lo_col: str,
    hi_col: str,
    right_val_col: str,
    equi_keys: list[str] | None = None,
    bucket_width: float = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """Interval join: pairs where ``right.val ∈ [left.lo, left.hi]``
    (+ optional equi keys) via **bucketized equi-join** — the scalable
    alternative to the nested-loop plan Spark picks for raw inequality
    joins.

    Left intervals explode to the bucket ids they overlap; right rows get
    one bucket; the join is a plain hash join on (equi_keys..., bucket)
    filtered by the exact range predicate. Each qualifying pair appears
    exactly once (a right row has exactly one bucket). Cost scales with
    interval_width/bucket_width per left row instead of |L|×|R|.
    ``lo/hi/val`` are numeric (pass epoch seconds for timestamps).
    Inner semantics only — use :func:`range_join_left` for LEFT (a post-join
    range filter on an outer join would silently drop NULL matches, and
    exploded left rows would duplicate them per bucket)."""
    equi_keys = equi_keys or []
    if how != "inner":
        raise ValueError(f"range_join is inner-only (see range_join_left), got {how}")

    lb = F.explode(
        F.sequence(
            F.floor(F.col(lo_col) / bucket_width).cast("long"),
            F.floor(F.col(hi_col) / bucket_width).cast("long"),
        )
    ).alias("__bucket")
    l = left.select("*", lb)
    r = right.withColumn("__bucket", F.floor(F.col(right_val_col) / bucket_width).cast("long"))
    cond = [l["__bucket"] == r["__bucket"]] + [l[k] == r[k] for k in equi_keys]
    inner = l.join(r, cond, "inner").filter(
        (r[right_val_col] >= l[lo_col]) & (r[right_val_col] <= l[hi_col])
    )
    for c in [l["__bucket"], r["__bucket"]] + [r[k] for k in equi_keys]:
        inner = inner.drop(c)
    return inner


def range_join_left(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    lo_col: str,
    hi_col: str,
    right_val_col: str,
    equi_keys: list[str] | None = None,
    bucket_width: float = 3600.0,
) -> DataFrame:
    """LEFT interval join: inner :func:`range_join` + anti-join restore of
    unmatched left rows (right columns NULL). ``left_id`` must be unique."""
    inner = range_join(
        left, right, lo_col, hi_col, right_val_col, equi_keys, bucket_width, how="inner"
    )
    right_only = [c for c in inner.columns if c not in left.columns]
    unmatched = left.join(inner.select(left_id).distinct(), left_id, "left_anti")
    for c in right_only:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(inner.schema[c].dataType))
    return inner.unionByName(unmatched)


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based session assignment: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_minutes``. Adds
    ``session_idx`` (0-based per user) — one window pass."""
    order = [F.col(ts_col).asc()] + ([F.col(order_tiebreak).asc()] if order_tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_sec = gap_minutes * 60.0
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | (F.unix_timestamp(ts_col) - F.unix_timestamp(prev) > gap_sec), 1
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__new", is_new).withColumn(
        "session_idx", (F.sum("__new").over(running) - 1).cast("int")
    ).drop("__new")
