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

from pyspark.sql import DataFrame, Window
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
    the exact count of DISTINCT 32-BIT HASH VALUES in the group (an
    undercount of distinct elements once cardinality approaches 2^16,
    by birthday collision — it exists to gate exact-vs-estimate mode,
    not as a cardinality statistic), sketch_k int — the build k, carried
    so the pairwise stage derives its truncation point from the data)``."""
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
            F.lit(k).cast("int").alias("sketch_k"),
        )
    )


def kmv_pairwise_overlap(sketches: DataFrame, group_col: str) -> DataFrame:
    """All group pairs (a < b) with their overlap estimates:
    ``(group_a, group_b, est_union, est_jaccard, est_intersection)``.

    The sketch table is PERSISTED before the self-join (s rows — without
    it both branches would re-run the corpus-sized sketch pipeline; only
    exchanges are deduplicated by ReuseExchange), and the join is an s-row
    broadcast nested loop — the pairwise math never touches the corpus.

    The effective k per pair is ``least(sketch_k_a, sketch_k_b)`` (the
    theta-sketch merge rule — sketches built at different k combine
    correctly at the smaller truncation point), a pair is estimate-mode
    only when a side has MORE distinct hashes than that k (at exactly k
    the sketch IS the set and the answer is exact), and the k-th value
    maps to (0, 1] via (h + 1) / 2^32 (the sampling.py convention).
    Every sub-expression is materialized once per layered select —
    the CASE chain below would otherwise re-evaluate the sort/union/
    intersect arrays per output column (CLAUDE.md inlining rule)."""
    sketches = sketches.persist()
    a = sketches.select(
        F.col(group_col).alias("group_a"),
        F.col("sketch").alias("__ska"),
        F.col("n_distinct").alias("__na"),
        F.col("sketch_k").alias("__kka"),
    )
    b = sketches.select(
        F.col(group_col).alias("group_b"),
        F.col("sketch").alias("__skb"),
        F.col("n_distinct").alias("__nb"),
        F.col("sketch_k").alias("__kkb"),
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    s1 = pairs.select(
        "group_a",
        "group_b",
        "__ska",
        "__skb",
        F.least("__kka", "__kkb").alias("__k"),
        F.array_sort(F.array_union("__ska", "__skb")).alias("__merged_all"),
        "__na",
        "__nb",
    )
    s2 = s1.select(
        "group_a",
        "group_b",
        "__ska",
        "__skb",
        "__k",
        ((F.col("__na") > F.col("__k")) | (F.col("__nb") > F.col("__k"))).alias("__sat"),
        F.slice("__merged_all", F.lit(1), F.col("__k")).alias("__merged"),
        F.size("__merged_all").alias("__ulen"),
    )
    s3 = s2.select(
        "group_a",
        "group_b",
        "__k",
        "__sat",
        "__ulen",
        # try_element_at: in exact mode merged is shorter than k and ANSI
        # element_at would throw even in the untaken CASE branch (CLAUDE.md);
        # (h + 1) / 2^32 maps the k-th hash to (0, 1]
        (
            (F.try_element_at("__merged", F.col("__k")) + F.lit(1)).cast("double")
            / F.lit(float(BUCKETS))
        ).alias("__rk"),
        F.size(
            F.array_intersect(F.array_intersect("__merged", "__ska"), F.col("__skb"))
        ).alias("__shared"),
        F.size(F.array_intersect("__ska", "__skb")).alias("__inter_exact"),
    )
    s4 = s3.select(
        "group_a",
        "group_b",
        "__sat",
        "__ulen",
        "__inter_exact",
        ((F.col("__k") - F.lit(1)).cast("double") / F.col("__rk")).alias("__union_est"),
        (F.col("__shared").cast("double") / F.col("__k").cast("double")).alias("__j_est"),
    )
    return s4.select(
        "group_a",
        "group_b",
        F.round(
            F.when(F.col("__sat"), F.col("__union_est")).otherwise(
                F.col("__ulen").cast("double")
            ),
            6,
        ).alias("est_union"),
        F.round(
            F.when(F.col("__sat"), F.col("__j_est")).otherwise(
                F.col("__inter_exact").cast("double") / F.col("__ulen").cast("double")
            ),
            6,
        ).alias("est_jaccard"),
        F.round(
            F.when(F.col("__sat"), F.col("__j_est") * F.col("__union_est")).otherwise(
                F.col("__inter_exact").cast("double")
            ),
            6,
        ).alias("est_intersection"),
    )
