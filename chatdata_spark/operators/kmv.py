"""KMV (k-minimum-values) distinct sketches + pairwise set-overlap
estimation — the corpus overlap matrix without pairwise joins.

"How much does source A overlap source B?" is a standing question in
training-data curation (shared boilerplate, mirrored sites, cross-source
contamination) and in dataset documentation (the redundancy matrix of a
corpus card). Computing exact pairwise n-gram overlap needs an all-pairs
element join — O(sources² · grams) at 100 TB. The KMV sketch (Bar-Yossef
et al. 2002; the theta-sketch family's simplest member) answers it with
BOUNDED state: keep the k smallest hash values per group; then for any
pair,

  union_est      = (k - 1) / r_k          (r_k = k-th smallest of the
                                           merged sketch, mapped to (0,1])
  jaccard_est    = |merged ∩ A ∩ B| / k   (fraction of the union sample
                                           present in both sketches)
  intersect_est  = jaccard_est · union_est

with ~1/sqrt(k) relative error. When a group has FEWER than k distinct
values its sketch IS the set, and the estimates collapse to exact counts —
the operator switches per-pair (saturated vs exact mode).

Determinism: the hash is the repo's md5-prefix bucket (operators/
sampling.py::hash_bucket — identical hex parse on DuckDB), the sketch is
the k smallest DISTINCT values (no RNG, no ties), and every estimate is a
fixed-operand-order float64 expression rounded at 6 — so unlike a classic
randomized sketch, the whole output is bit-reproducible across engines and
the driver oracle can recompute it EXACTLY in SQL.

Scale shape (100 TB):
- element extraction + hashing is scan-stage JVM; the only corpus-sized
  shuffle is the (group, hash) distinct.
- per-group pruning to the k smallest is row_number + count over the SAME
  group-keyed window partition — one exchange, bounded (k rows/group)
  output. The groupBy that forms sketch arrays touches ≤ k rows per group.
- the pairwise stage self-joins an s-row sketch table (s = #groups) under
  ``a.group < b.group`` — a broadcast nested-loop over s rows, the benign
  tiny-side pattern (operators/classifier.py note), never a corpus join.
- sketches are MERGEABLE (min of unions = union of mins): per-shard
  sketches can be ORed upward exactly like the HLL registers in
  operators/rollup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from chatdata_spark.operators.sampling import BUCKETS, hash_bucket


def kmv_sketch_by_group(
    df: DataFrame,
    group_col: str,
    elem_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group KMV sketch: ``(group_col, sketch array<bigint> — the k
    smallest distinct md5-bucket hashes ascending, n_distinct bigint —
    the EXACT per-group distinct count, carried for exact-mode pairs)``."""
    hashed = df.select(
        F.col(group_col), hash_bucket(F.col(elem_col), salt).alias("__h")
    ).distinct()
    w = Window.partitionBy(group_col)
    ranked = hashed.select(
        group_col,
        "__h",
        F.row_number().over(w.orderBy(F.col("__h").asc())).alias("__rn"),
        F.count(F.lit(1)).over(w).alias("__n"),
    )
    return (
        ranked.filter(F.col("__rn") <= k)
        .groupBy(group_col)
        .agg(
            F.array_sort(F.collect_list("__h")).alias("sketch"),
            F.first("__n").alias("n_distinct"),
        )
    )


def _estimates(a_sk: Column, b_sk: Column, saturated: Column, k: int) -> dict[str, Column]:
    """The three overlap estimates for one sketch pair. Operand order is
    FIXED and mirrored verbatim by the SQL oracle (queries/text.py)."""
    merged_all = F.array_sort(F.array_union(a_sk, b_sk))
    # saturated: estimate from the k smallest of the union; else exact sets
    merged = F.slice(merged_all, 1, k)
    # try_element_at: in exact mode merged is shorter than k and ANSI
    # element_at would throw even in the untaken CASE branch (CLAUDE.md)
    kth = F.try_element_at(merged, F.lit(k)).cast("double") / F.lit(float(BUCKETS))
    union_est = F.lit(float(k - 1)) / kth
    shared = F.size(F.array_intersect(F.array_intersect(merged, a_sk), b_sk))
    j_est = shared.cast("double") / F.lit(float(k))
    union_exact = F.size(merged_all).cast("double")
    inter_exact = F.size(F.array_intersect(a_sk, b_sk)).cast("double")
    j_exact = inter_exact / union_exact
    return {
        "est_union": F.round(F.when(saturated, union_est).otherwise(union_exact), 6),
        "est_jaccard": F.round(F.when(saturated, j_est).otherwise(j_exact), 6),
        "est_intersection": F.round(
            F.when(saturated, j_est * union_est).otherwise(inter_exact), 6
        ),
    }


def kmv_pairwise_overlap(sketches: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """All group pairs (a < b) with their overlap estimates:
    ``(group_a, group_b, est_union, est_jaccard, est_intersection)``.
    The join is an s-row broadcast nested loop (s = #groups) — the
    pairwise math never touches the corpus."""
    a = sketches.select(
        F.col(group_col).alias("group_a"),
        F.col("sketch").alias("__ska"),
        F.col("n_distinct").alias("__na"),
    )
    b = sketches.select(
        F.col(group_col).alias("group_b"),
        F.col("sketch").alias("__skb"),
        F.col("n_distinct").alias("__nb"),
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    saturated = (F.col("__na") >= k) | (F.col("__nb") >= k)
    ests = _estimates(F.col("__ska"), F.col("__skb"), saturated, k)
    return pairs.select(
        "group_a", "group_b", *[expr.alias(name) for name, expr in ests.items()]
    )
