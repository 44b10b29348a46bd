"""Deterministic mergeable quantile sketch — bottom-k-by-hash uniform
sampling (the ClickHouse ``quantileDeterministic`` role; KMV's sibling
for ranks instead of distincts).

Corpus-scale quantile questions ("p95 document length per source", "the
token-count distribution of each shard") don't need a global sort; they
need a BOUNDED, MERGEABLE per-group summary whose answer is reproducible
across reruns, engines and partition layouts. Classic streaming sketches
(t-digest, KLL, GK) give tighter rank error per byte but are
order-dependent: two runs over differently-partitioned input produce
different digests, so no cross-engine oracle can pin them. This operator
instead keeps, per group, the ``k`` rows with the smallest
``md5(salt || key)`` bucket — a uniform random sample that is a pure
function of (salt, key-set):

- **deterministic**: membership depends only on the hash, so Spark and
  DuckDB materialize the IDENTICAL sample and the driver oracle replays
  every estimate exactly (no soundness margins needed);
- **mergeable**: bottom-k(union of bottom-k samples) = bottom-k(union) —
  per-shard / per-micro-batch samples combine without error, the same
  merge law as the KMV sketch (operators/kmv.py) and the CMS counters;
- **bounded**: k rows per group forever, regardless of corpus size;
- estimate: the discrete q-quantile of the sample (element at rank
  ceil(q·n), ascending). For a uniform sample of size k the rank error
  is O(sqrt(ln(1/δ)/k)) with probability 1-δ (Hoeffding on the empirical
  CDF) — k=256 gives ~±5% rank error at 95% confidence.

Scale shape (100 TB):
- hashing is scan-stage JVM (md5 + conv, no UDF); the only shuffle is
  the per-group window that ranks by hash — and the optional
  ``prefilter_buckets`` cuts that shuffle's input FIRST: a scan-stage
  ``hash < T`` predicate keeps an expected n·T/2³² rows per group, so
  with T sized at ≥4k/n_min the bottom-k survives intact with
  overwhelming probability (Chernoff: P[Binomial(n, 4k/n) < k] ≤
  e^{-9k/8}) and the window touches ~4k rows/group instead of n. If a
  small group DOES clip below k, the sample degrades gracefully to a
  Bernoulli(T/2³²) hash sample — still uniform, still deterministic,
  still replayed exactly by the oracle (the estimate just carries the
  smaller-n error bar).
- the quantile pick is the CLAUDE.md window-only median rewrite
  generalized to multiple q's: ONE partitioning carries row_number,
  count and every per-q pick — one exchange, one scan of the k·|groups|
  sample.

Reference role: ClickHouse ``quantileDeterministic(x, determinator)`` /
``quantilesDeterministic`` (reservoir-with-determinator); re-expressed
as a hash-bottom-k so the sample is partition-order independent (the
reference's reservoir still depends on arrival order between equal
determinators; this one never does).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chatdata_spark.operators.sampling import hash_bucket


def q_fraction(q: float) -> tuple[int, int]:
    """Exact reduced (num, den) for a quantile that is a multiple of
    0.01. Rank math must be INTEGER-exact on both engines: Spark's
    ``ceil(lit(0.95) * n)`` multiplies in float64 while DuckDB parses
    ``0.95`` as DECIMAL(3,2) and multiplies exactly — at an exact
    integer landing (q·n ∈ ℤ) the float product can sit an ulp below
    and the two ceils disagree by 1 (ADVICE r7)."""
    num = int(round(q * 100))
    if abs(num / 100.0 - q) > 1e-9:
        raise ValueError(f"quantile {q!r} must be a multiple of 0.01")
    g = math.gcd(num, 100)
    return num // g, 100 // g


def exact_ceil_rank(n_col, q: float):
    """``ceil(q·n)`` as pure integer arithmetic: with q = num/den,
    ceil(num·n/den) = (num·n + den−1) div den. Spark's Column API has no
    integer division, so compute it as (x − x%den)/den — the difference
    is divisible by den, the float64 quotient is an exact integer, and
    DuckDB's ``//`` replays it bit-identically."""
    num, den = q_fraction(q)
    x = F.lit(num) * n_col + F.lit(den - 1)
    return ((x - x % F.lit(den)) / F.lit(den)).cast("long")


def exact_ceil_rank_sql(n_expr: str, q: float) -> str:
    """DuckDB mirror of :func:`exact_ceil_rank` (``//`` is integer floor
    division; operands are positive so floor ≡ our div)."""
    num, den = q_fraction(q)
    return f"CAST(({num} * {n_expr} + {den - 1}) // {den} AS BIGINT)"


def quantile_sample(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    k: int = 256,
    salt: str = "qsk",
    prefilter_buckets: int | None = None,
) -> DataFrame:
    """Per-group deterministic uniform sample: the ``k`` rows with the
    smallest (md5-bucket(key), key) — columns (group_cols..., __h, __key,
    __v). ``prefilter_buckets`` adds the scan-stage ``hash < T`` cut
    (size T at ≥ 4k/n_min · 2³² — see module doc).

    ``key_col`` must uniquely identify rows (it IS the sample identity —
    the hash, the tie-break, and the merge dedup all key on it). Rows
    with a NULL value are dropped (a missing measurement is a
    data-quality rule, not a sample member — the psi/mad convention);
    rows with a NULL key are dropped too (they hash to NULL, and Spark
    sorts NULLs first where DuckDB sorts them last — a cross-engine
    determinism hole this operator refuses to have)."""
    s = df.select(
        *group_cols,
        F.col(key_col).alias("__key"),
        F.col(value_col).alias("__v"),
    ).filter(F.col(value_col).isNotNull() & F.col(key_col).isNotNull())
    s = s.withColumn("__h", hash_bucket(F.col("__key"), salt))
    if prefilter_buckets is not None:
        s = s.filter(F.col("__h") < int(prefilter_buckets))
    w = Window.partitionBy(*group_cols).orderBy("__h", "__key")
    return s.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= int(k)
    ).drop("__rn")


def merge_samples(
    samples: Sequence[DataFrame], group_cols: list[str], k: int
) -> DataFrame:
    """Exact sketch merge: bottom-k of the union of per-shard bottom-k
    samples ≡ bottom-k of the union of the shards (hash membership is a
    pure row property) — the merge law the unit tests pin."""
    it = iter(samples)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    # a row may appear in several shards' samples (same key — overlapping
    # shards, replayed micro-batches) — dedup on the key identity before
    # re-ranking, or duplicates displace genuine bottom-k members. Exact
    # because key_col uniquely identifies rows (quantile_sample contract):
    # every duplicate carries the identical (__h, __v).
    u = u.dropDuplicates([*group_cols, "__key"])
    w = Window.partitionBy(*group_cols).orderBy("__h", "__key")
    return u.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= int(k)
    ).drop("__rn")


def sketch_quantiles(
    sample: DataFrame, group_cols: list[str], qs: Sequence[float]
) -> DataFrame:
    """(group_cols..., sample_n, p<q>...) from a :func:`quantile_sample`
    frame: for each q the sample element at rank ceil(q·n) ascending —
    ONE window partitioning carries rank, count and every per-q pick
    (the grouped-median one-exchange rewrite, CLAUDE.md), then a
    same-keyed groupBy collapses to one row per group."""
    wv = Window.partitionBy(*group_cols).orderBy("__v", "__key")
    wn = Window.partitionBy(*group_cols)
    ranked = sample.select(
        *group_cols,
        "__v",
        F.row_number().over(wv).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    picks = [
        F.max(
            F.when(
                F.col("__rn") == exact_ceil_rank(F.col("__n"), q),
                F.col("__v"),
            )
        ).alias(f"p{int(round(q * 100))}")
        for q in qs
    ]
    return ranked.groupBy(*group_cols).agg(
        F.max("__n").alias("sample_n"), *picks
    )


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    k: int = 256,
    salt: str = "qsk",
    prefilter_buckets: int | None = None,
) -> DataFrame:
    """One-call convenience: sample then estimate — (group_cols...,
    sample_n, p25, p50, p75, p95)."""
    samp = quantile_sample(
        df, group_cols, value_col, key_col, k=k, salt=salt,
        prefilter_buckets=prefilter_buckets,
    )
    return sketch_quantiles(samp, group_cols, qs)


def ks_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 256,
    salt: str = "ks",
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """(group_cols..., n_ref, n_cur, ks_stat): two-sample
    Kolmogorov-Smirnov distance between the snapshots' value
    distributions — one row per group (the corpus-monitoring question
    "WHICH source drifted?"), or ONE global row when ``group_cols`` is
    empty/None — computed over deterministic bottom-k-by-hash samples
    per group. The distribution-drift monitor that needs NO binning
    choice (PSI's weakness: a drift confined inside one bin is
    invisible; KS compares full empirical CDFs). ks_stat = max over
    observed values v of |F_ref(v) - F_cur(v)|, each F the sample's
    empirical CDF. A group present in only one snapshot has no defined
    statistic: ks_stat is NULL there (n_ref/n_cur show which side is
    empty) rather than a misleading 0 or NaN.

    Because both samples are pure hash functions of their key sets
    (quantile_sample), the whole statistic is bit-reproducible and the
    oracle replays it exactly — and the arithmetic is kept INTEGER until
    the very last step: the CDF gap |cr/tr - cc/tc| is a dyadic-ish exact
    rational, so a round-to-6-decimals convention would hit REAL .5 ties
    (e.g. a 2-rank gap at k=256 is exactly 0.0078125) where Spark HALF_UP
    and DuckDB disagree. Instead the max is taken over the integer
    cross-products |cr·tc - cc·tr| and ONE IEEE float64 division by tr·tc
    produces ks_stat — a single correctly-rounded op, identical in every
    engine, no decimal rounding at all. Scale shape: two sample passes
    (each ONE window exchange over the scan, k-bounded output), then all
    arithmetic happens on <= 2k rows per group; the grouped variant
    shares ONE partitioning (group keys) across the cumulative window,
    the totals window and the final groupBy — one exchange."""
    g = list(group_cols or [])
    a = quantile_sample(ref, g, value_col, key_col, k=k, salt=salt)
    b = quantile_sample(cur, g, value_col, key_col, k=k, salt=salt)
    u = a.select(*g, "__v", F.lit(1).alias("__r"), F.lit(0).alias("__c")).unionByName(
        b.select(*g, "__v", F.lit(0).alias("__r"), F.lit(1).alias("__c"))
    )
    per_v = u.groupBy(*g, "__v").agg(
        F.sum("__r").alias("nr"), F.sum("__c").alias("nc")
    )
    w = (
        Window.partitionBy(*g)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(*g)
    cum = per_v.select(
        *g,
        "__v",
        F.sum("nr").over(w).alias("cr"),
        F.sum("nc").over(w).alias("cc"),
        F.sum("nr").over(wn).alias("tr"),
        F.sum("nc").over(wn).alias("tc"),
    )
    gap_num = F.abs(F.col("cr") * F.col("tc") - F.col("cc") * F.col("tr"))
    return (
        cum.groupBy(*g)
        .agg(
            F.max("tr").alias("n_ref"),
            F.max("tc").alias("n_cur"),
            F.max(gap_num).alias("__gn"),
        )
        .select(
            *g,
            "n_ref",
            "n_cur",
            F.when(
                (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
                F.col("__gn").cast("double")
                / (F.col("n_ref") * F.col("n_cur")).cast("double"),
            ).alias("ks_stat"),
        )
    )
