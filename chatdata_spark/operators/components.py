"""Connected components over near-duplicate pairs → dedup clusters.

The pairwise dedup operators (operators/dedup.py) emit (i, j) near-dup
pairs; turning pairs into KEEP/DROP decisions needs the transitive closure
— e.g. A~B and B~C must collapse to one canonical document even when A~C
was never emitted. This is the standard last stage of a corpus-dedup
pipeline (the reference's entity_id upsert, tools.py:35-37, is the k=1
special case of exact groups).

Algorithm: iterative min-label propagation. labels(v) starts at v; each
round every vertex takes the min of its own label and its neighbors'
labels; fixpoint = every vertex labeled with the min vertex id of its
component. Rounds needed = graph diameter — near-dup components are
small and dense (dup clusters), so this converges in a handful of rounds;
for adversarially long chains switch to large-star/small-star (O(log n)
rounds) — not needed for dedup workloads and kept out to stay simple.

Scale posture: each round is one shuffle of (vertex, label) pairs keyed by
vertex plus an edge join keyed by vertex — no per-component serialization,
no driver-side graph. The only driver-side values are one scalar per round
(the decimal label-sum used as the convergence metric — it strictly
decreases until fixpoint since labels only ever decrease). Lineage is
truncated every round with localCheckpoint so the iterative plan doesn't
grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "i",
    dst: str = "j",
    max_iter: int = 25,
) -> DataFrame:
    """(src, dst) undirected edges → (v, component) where ``component`` is
    the minimum vertex id in v's connected component. Raises if the
    propagation hasn't converged after ``max_iter`` rounds (diameter-bound;
    see module docstring)."""
    half = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = (
        half.union(half.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("a").alias("v")).distinct().withColumn("c", F.col("v"))
    prev_sum = None
    for _ in range(max_iter):
        prop = edges.join(labels.withColumnRenamed("v", "a"), "a").select(
            F.col("b").alias("v"), "c"
        )
        labels = (
            labels.union(prop).groupBy("v").agg(F.min("c").alias("c")).localCheckpoint()
        )
        # decimal sum: exact, and ANSI-safe against long overflow at corpus
        # scale (ids up to 2^63 × trillions of rows exceeds long range)
        cur = labels.agg(F.sum(F.col("c").cast("decimal(38,0)"))).collect()[0][0]
        if prev_sum is not None and cur == prev_sum:
            return labels
        prev_sum = cur
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iter} rounds "
        "(component diameter exceeds max_iter; raise max_iter or use a "
        "star-contraction variant)"
    )


def canonical_assignment(
    df: DataFrame, id_col: str, pairs: DataFrame, src: str = "i", dst: str = "j"
) -> DataFrame:
    """Every document mapped to its canonical id: the component minimum for
    near-dup cluster members, itself for singletons. ``keep = canonical_id
    == id`` marks the rows that survive dedup."""
    comp = connected_components(pairs, src, dst)
    return (
        df.select(F.col(id_col).alias("v"))
        .join(comp, "v", "left")
        .select(
            F.col("v").alias(id_col),
            F.coalesce(F.col("c"), F.col("v")).alias("canonical_id"),
        )
        .withColumn("keep", F.col("canonical_id") == F.col(id_col))
    )
