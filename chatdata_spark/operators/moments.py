"""Exact mergeable second-moment state + z-score anomaly detection.

The monitors family's "classic" outlier rule (flag |z| > 3) over
per-group mean/std — computed from an EXACT integer moment state
(n, S1 = sum v, S2 = sum v^2 over integer-scaled values), which makes
the operator simultaneously:

- deterministic: no float accumulation anywhere — Welford's online
  update is numerically nice but ORDER-dependent in its last ulp, so
  two partitionings of the same data disagree; integer sums cannot;
- mergeable: (n, S1, S2) adds component-wise, so shard/micro-batch
  states combine associatively — the streaming twin
  (streaming/incremental.py::stream_moments_merge) maintains the same
  3-integer state per group forever, with the batch_id replay guard
  (additive state, the CMS convention);
- oracle-replayable: mean/std are derived by a FIXED short sequence of
  correctly-rounded float64 ops from the exact integers, and the
  outlier PREDICATE never touches floats at all —
      |v - S1/n| > z * sqrt(S2/n - (S1/n)^2)
  multiplied through by n^2 becomes
      (v*n - S1)^2 > z^2 * (n*S2 - S1^2)
  — all-integer (DECIMAL(38,0) on Spark, HUGEINT on DuckDB), so a row
  sitting exactly on the 3-sigma boundary classifies identically in
  every engine, which a float z-comparison cannot promise.

Values enter as integer-scaled fixed-point (e.g. cents: the events
fixture's ``value`` is exactly 2-decimal, so v100 = value * 100 is an
exact integer — same convention as the money-aggregate rule).

Scale shape: the moment pass is ONE map-side-combinable aggregate
(|groups| rows out); the outlier pass is a scan joined to the broadcast
|groups|-row stats frame — two scans total, no corpus-sized shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def exact_moments(
    df: DataFrame, group_cols: list[str], int_col: str | Column
) -> DataFrame:
    """(group_cols..., n, s1, s2): exact integer moment state of an
    integer-valued column. s1/s2 are DECIMAL(38,0) (a BIGINT sum of
    squares overflows ANSI-fatally at warehouse row counts)."""
    v = F.col(int_col) if isinstance(int_col, str) else int_col
    vd = v.cast(_DEC)
    return (
        df.filter(v.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(vd).cast(_DEC).alias("s1"),
            F.sum(vd * vd).cast(_DEC).alias("s2"),
        )
    )


def merge_moments(parts: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Component-wise addition of moment states — the mergeability law
    the streaming path relies on (exact: integer addition)."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*group_cols).agg(
        F.sum("n").alias("n"),
        F.sum("s1").cast(_DEC).alias("s1"),
        F.sum("s2").cast(_DEC).alias("s2"),
    )


def moment_stats(moments: DataFrame, scale: int) -> DataFrame:
    """Adds (mean, std) in ORIGINAL value units to a moment-state frame
    over values that were integer-scaled by ``scale``. Fixed op order:
    two casts + one division each for the raw moments, then var/std —
    identical float64 sequence on any engine given the same integers.

    The variance is clamped at 0 before the sqrt: for a (near-)constant
    group, ex2 and mean^2 take different float paths to the same value
    and can differ by -1 ulp — Spark's sqrt(-tiny) returns NaN while
    DuckDB's THROWS, so without the clamp a constant group is a
    data-dependent oracle crash. greatest() is safe here (operands are
    never NULL; the null-eating clamp trap doesn't apply), and the
    oracle applies the identical GREATEST so both engines clamp the
    same float."""
    mean = F.col("s1").cast("double") / (F.col("n") * F.lit(scale)).cast("double")
    ex2 = F.col("s2").cast("double") / (
        F.col("n") * F.lit(scale) * F.lit(scale)
    ).cast("double")
    return moments.withColumn("mean", mean).withColumn(
        "std", F.sqrt(F.greatest(ex2 - mean * mean, F.lit(0.0)))
    )


def count_outliers(
    df: DataFrame,
    moments: DataFrame,
    group_cols: list[str],
    int_col: str | Column,
    z: int = 3,
) -> DataFrame:
    """(group_cols..., n_outliers): how many rows sit beyond z sigmas,
    decided by the all-integer predicate (v*n - s1)^2 > z^2*(n*s2 - s1^2).
    ``moments`` is broadcast (|groups| rows); z must be an integer so
    z^2 stays exact.

    DOMAIN CONTRACT (r8 verdict #3): every term above must fit
    DECIMAL(38,0) / DuckDB HUGEINT. Both sides are bounded by
    max(4, z^2) * n^2 * s2 (Cauchy-Schwarz: |s1| <= sqrt(n*s2) and
    per-row |v| <= sqrt(s2), so lhs^2 <= 4*n^2*s2 and
    rhs <= z^2*n*s2), so the predicate is exact and throw-free whenever
    max(4, z^2) * n^2 * s2 < 1e37 — roughly n * v_max < 1e18 per group,
    an order of magnitude of headroom under the 38-digit ceiling. The
    bound is ENFORCED per row via CASE-conditional evaluation (ADVICE
    r9: conjunct order inside one Filter is NOT contractual — Catalyst
    may split the AND — but CASE branch laziness IS): the decimal square
    sits in the THEN branch of the domain check, and the ELSE branch is
    an assert_true that raises a clear error telling the caller to
    rescale values or shard groups, so an out-of-domain group can never
    surface the raw ANSI decimal-overflow throw (Spark) / HUGEINT
    overflow (DuckDB) from deep in the predicate. Oracles need no
    mirror: in-domain results are unchanged, and out-of-domain runs
    error on BOTH engines rather than returning anything."""
    v = (F.col(int_col) if isinstance(int_col, str) else int_col).cast(_DEC)
    lhs = v * F.col("n").cast(_DEC) - F.col("s1")
    rhs = F.lit(int(z) * int(z)).cast(_DEC) * (
        F.col("n").cast(_DEC) * F.col("s2") - F.col("s1") * F.col("s1")
    )
    n_f = F.col("n").cast("double")
    domain_ok = (
        F.lit(float(max(4, int(z) * int(z)))) * n_f * n_f * F.col("s2").cast("double")
        < F.lit(1e37)
    )
    guard = F.assert_true(
        domain_ok,
        F.lit(
            "count_outliers: group moment magnitudes exceed the exact "
            "integer predicate's DECIMAL(38,0) domain "
            "(max(4,z^2)*n^2*s2 >= 1e37, i.e. n*v_max ~> 1e18) — rescale "
            "the integer values or shard the group"
        ),
    )
    # the decimal square only evaluates when domain_ok holds (CASE branch
    # laziness — contractual, unlike Filter conjunct order); otherwise the
    # assert_true raises the friendly message
    pred = F.when(domain_ok, lhs * lhs > rhs).otherwise(guard.isNotNull())
    joined = df.join(F.broadcast(moments), group_cols)
    return (
        joined.filter(v.isNotNull() & pred)
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )


def zscore_report(
    df: DataFrame,
    group_cols: list[str],
    int_col: str | Column,
    scale: int,
    z: int = 3,
    moments: DataFrame | None = None,
) -> DataFrame:
    """(group_cols..., n, mean, std, n_outliers): the full per-group
    z-score anomaly report. Pass ``moments`` to reuse an externally
    maintained (e.g. stream-merged) state; groups with no outliers
    report 0 (left join), and n_outliers stays BIGINT."""
    m = moments if moments is not None else exact_moments(df, group_cols, int_col)
    stats = moment_stats(m, scale)
    out = count_outliers(df, m, group_cols, int_col, z=z)
    return (
        stats.join(out, group_cols, "left")
        .select(
            *group_cols,
            "n",
            "mean",
            "std",
            F.coalesce("n_outliers", F.lit(0).cast("long")).alias("n_outliers"),
        )
    )
