"""Deterministic HyperLogLog distinct-count sketch (ClickHouse ``uniq``/
``uniqHLL12`` role; Flajolet et al. 2007) with an EXACT cross-engine
replay oracle — the first sketch family here whose *estimate itself* is
bit-reproducible, not just soundness-bounded (COVERAGE previously noted
"sketch values have no cross-engine twin" for HLL; this operator is the
counterexample by construction).

Reference role: myscale/ChatData's backing engine (MyScaleDB/ClickHouse)
answers DISTINCT-shaped questions with the uniq()/uniqHLL12 HLL family
(the A4 DISTINCT row's approximate sibling); this is the Spark-native,
deterministic re-expression of that aggregate.

Design for determinism (the whole trick):
- the hash is the repo's md5-prefix uint32 (operators/sampling.py::
  hash_bucket — byte-identical in every SQL engine), split into a p-bit
  bucket (top bits) and a (32-p)-bit tail;
- a bucket's register is max over its elements of rho(tail) =
  clz(tail) + 1. clz is monotonically non-increasing in the tail value,
  so max(rho) == rho(MIN(tail)) — the register state collapses to ONE
  exact integer aggregate (MIN), mergeable and partition-order-free;
- rho itself is computed WITHOUT floats: bit_length(x) == length(bin(x))
  (both Spark and DuckDB print bigints in binary with no leading zeros),
  so rho = (32 - p + 1) - length(bin(tail)), tail = 0 -> 32 - p + 1.
  No log2(), no float boundary to disagree on;
- the harmonic sum S = sum_j 2^(w+1-reg_j) is scaled by 2^(w+1) into an
  exact BIGINT (missing buckets carry reg = 0), so the raw estimate
  alpha_m * m^2 * 2^(w+1) / S is ONE IEEE division of a float64 literal
  (computed in Python, inlined identically both sides) by an exact
  integer — a single correctly-rounded op, identical in every engine.
- the textbook small-range linear-counting correction (m * ln(m/V)) is
  OMITTED from the deterministic estimate path by default: ln() is the
  one op whose last ulp is not guaranteed across engines. Callers that
  want it (accuracy over replayability) pass ``linear_correction=True``.

Scale shape: ONE map-side-combinable aggregate over the scan
(group, bucket) -> MIN(tail) — m rows per group forever, mergeable
across shards/micro-batches by taking MIN again; the estimate math runs
on m-row frames. At 100 TB the only corpus-sized exchange is the
(group, bucket) partial-agg shuffle, identical in shape to a plain
GROUP BY count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chatdata_spark.operators.sampling import hash_bucket


def hll_alpha(m: int) -> float:
    """Flajolet's bias-correction constant for m >= 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """(group_cols..., bucket, min_tail): the collapsed register state —
    MIN of the (32-p)-bit hash tail per p-bit bucket. Mergeable: states
    from any shards/micro-batches merge by grouping and taking MIN again
    (an idempotent lattice join, like the bottom-k quantile sample)."""
    w = 32 - p
    hb = hash_bucket(F.col(key_col), salt)
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(
            *group_cols,
            F.shiftright(hb, w).alias("bucket"),
            hb.bitwiseAND(F.lit((1 << w) - 1)).alias("tail"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.min("tail").alias("min_tail"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    p: int = 8,
    linear_correction: bool = False,
) -> DataFrame:
    """(group_cols..., m_used, harmonic_sum, hll_est) from a register
    state frame. ``harmonic_sum`` is the exact BIGINT S (scaled by
    2^(w+1)); ``hll_est`` is the raw HLL estimate — bit-deterministic
    (one float64 division) unless ``linear_correction`` asks for the
    textbook ln()-based small-range path."""
    w = 32 - p
    m = 1 << p
    # register value from the exact MIN tail, no floats:
    # rho = (w + 1) - bit_length(tail); tail == 0 -> w + 1
    reg = F.when(F.col("min_tail") == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(F.col("min_tail")))
    )
    # harmonic term 2^(w+1-reg), scaled so the whole sum stays integer;
    # missing buckets have reg = 0 -> term 2^(w+1), added as a count.
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({w + 1} - __reg AS INT))")
    per_group = (
        registers.withColumn("__reg", reg)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("m_used"),
            F.sum(term).alias("__s_used"),
        )
        .select(
            *group_cols,
            "m_used",
            (
                F.col("__s_used")
                + (F.lit(m) - F.col("m_used")) * F.lit(1 << (w + 1))
            ).alias("harmonic_sum"),
        )
    )
    a_num = hll_alpha(m) * m * m * float(1 << (w + 1))
    est = F.lit(a_num) / F.col("harmonic_sum").cast("double")
    if linear_correction:
        # textbook small-range path: E <= 2.5m and empty buckets present
        # -> linear counting m * ln(m / V). ln's last ulp is not a
        # cross-engine guarantee; opt-in (accuracy over replayability).
        v = F.lit(m) - F.col("m_used")
        est = F.when(
            (est <= F.lit(2.5 * m)) & (v > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
        ).otherwise(est)
    return per_group.withColumn("hll_est", est)


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    p: int = 8,
    salt: str = "hll",
    linear_correction: bool = False,
) -> DataFrame:
    """One-call convenience: registers -> estimate."""
    regs = hll_registers(df, group_cols, key_col, p=p, salt=salt)
    return hll_estimate(regs, group_cols, p=p, linear_correction=linear_correction)
