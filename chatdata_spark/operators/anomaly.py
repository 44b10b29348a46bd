"""Robust per-group outlier detection: median / MAD (median absolute
deviation) flagging — the data-quality monitor for value columns where
mean/stddev break under the very outliers being hunted (a handful of
corrupt rows can move the mean arbitrarily; the median moves only past
50% contamination).

The reference's engine family exposes ``quantileExact``/``medianExact``
aggregates this composes from (/root/reference runs on a ClickHouse-family
engine; cited for capability parity, not code). Re-expressed Spark-first:

- exact path: the explicit discrete-percentile formulation (rn ==
  ceil(0.5·n) over a per-group sort — the same index math as
  queries/analytics.py::percentile_disc_price_by_flag, so the oracle can
  replicate it bit-for-bit), with BOTH medians as windowed
  max(CASE WHEN rn = ceil THEN x END) expressions over the SAME
  partitioning — so the whole operator is ONE scan + ONE hash exchange on
  the group key + two in-partition sorts (value order, then deviation
  order); a join-back formulation would rescan and re-shuffle the input
  four times (measured — see the plan audit). Right when groups are many
  (per-key monitors) — each sort partition is one group's rows.
- approx path (``exact=False``): ``percentile_approx`` for both median
  and MAD — single-pass mergeable sketches, no per-group sort, the 100 TB
  default when a few groups hold billions of rows. Same plan shape as any
  partial-aggregate; flags may differ near the threshold boundary by the
  sketch's rank error, which is the documented trade.

Determinism (exact path): both medians are ACTUAL data elements (never
interpolated arithmetic), deviations are ``abs(x - med)`` with identical
operand order on both engines, and the flag threshold ``dev > k·mad``
multiplies the same float64s — bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _windowed_disc_median(
    df: DataFrame, group_cols: list[str], value_col: str, tie_cols: list[str], out: str
) -> DataFrame:
    """Input rows + ``out`` = the group's discrete median (element at rank
    ceil(n/2) ascending), as pure window expressions over ONE partitioning
    — no join-back, no second scan of the input."""
    w = Window.partitionBy(*group_cols).orderBy(value_col, *tie_cols)
    wn = Window.partitionBy(*group_cols)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    picked = F.when(rn == F.ceil(F.lit(0.5) * n).cast("long"), F.col(value_col))
    return df.withColumn(out, F.max(picked).over(wn))


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tie_cols: list[str],
    k: float = 3.0,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Input rows + (med, mad, is_outlier): is_outlier ⇔
    ``abs(value - med) > k * mad`` within the row's group. Rows with NULL
    ``value_col`` are dropped (a NULL deviation is a missing-value rule,
    not an outlier — the data-quality report family owns those)."""
    clean = df.filter(F.col(value_col).isNotNull())
    if exact:
        with_med = _windowed_disc_median(clean, group_cols, value_col, tie_cols, "med")
        dev = with_med.withColumn("__dev", F.abs(F.col(value_col) - F.col("med")))
        flagged = _windowed_disc_median(dev, group_cols, "__dev", tie_cols, "mad")
    else:
        # Null-safe equi-joins so the approx path keeps NULL group keys,
        # matching the exact path's window PARTITION BY (a plain equi-join
        # would silently drop NULL-keyed groups — ADVICE r6).
        def _nsafe_join(left: DataFrame, agg: DataFrame) -> DataFrame:
            aliased = agg.select(
                *[F.col(c).alias(f"__g_{c}") for c in group_cols],
                *[c for c in agg.columns if c not in group_cols],
            )
            cond = None
            for c in group_cols:
                eq = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
                cond = eq if cond is None else (cond & eq)
            return left.join(F.broadcast(aliased), cond).drop(
                *[f"__g_{c}" for c in group_cols]
            )

        med = clean.groupBy(*group_cols).agg(
            F.percentile_approx(value_col, 0.5, accuracy).alias("med")
        )
        dev = _nsafe_join(clean, med).withColumn(
            "__dev", F.abs(F.col(value_col) - F.col("med"))
        )
        mad = dev.groupBy(*group_cols).agg(
            F.percentile_approx("__dev", 0.5, accuracy).alias("mad")
        )
        flagged = _nsafe_join(dev.drop("mad") if "mad" in dev.columns else dev, mad)
    return flagged.withColumn(
        "is_outlier", F.col("__dev") > F.lit(float(k)) * F.col("mad")
    ).drop("__dev")


def mad_outlier_summary(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tie_cols: list[str],
    k: float = 3.0,
    exact: bool = True,
) -> DataFrame:
    """(group_cols..., med, mad, n_outliers, n_rows): the per-group monitor
    row — what a 100 TB pipeline materializes per partition/day to alert
    on drift without retaining flagged rows."""
    flagged = mad_outliers(df, group_cols, value_col, tie_cols, k=k, exact=exact)
    return flagged.groupBy(*group_cols).agg(
        F.max("med").alias("med"),
        F.max("mad").alias("mad"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )
