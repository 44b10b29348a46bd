"""Connected components over near-duplicate pairs → dedup clusters.

The pairwise dedup operators (operators/dedup.py) emit (i, j) near-dup
pairs; turning pairs into KEEP/DROP decisions needs the transitive closure
— e.g. A~B and B~C must collapse to one canonical document even when A~C
was never emitted. This is the standard last stage of a corpus-dedup
pipeline (the reference's entity_id upsert, tools.py:35-37, is the k=1
special case of exact groups).

Algorithms:
- ``min-label`` (default): labels(v) starts at v; each round every vertex
  takes the min of its own label and its neighbors' labels; fixpoint =
  every vertex labeled with the min vertex id of its component. Rounds
  needed = graph diameter — near-dup components are small and dense (dup
  clusters), so this converges in a handful of rounds.
- ``star`` (:func:`connected_components_star`): alternating large-star /
  small-star contraction (Kiveris et al. 2014, "Connected Components in
  MapReduce and Beyond") — O(log n) rounds regardless of diameter, the
  scale-robust choice for adversarially long chains (a 10⁶-node path
  graph converges in ~20 rounds where min-label would need 10⁶). Same
  output contract: every vertex labeled with its component minimum.

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


def connected_components_star(
    pairs: DataFrame,
    src: str = "i",
    dst: str = "j",
    max_iter: int = 50,
) -> DataFrame:
    """(src, dst) undirected edges → (v, c) with ``c`` the component
    minimum — the O(log n)-round alternating large-star/small-star
    contraction (Kiveris et al. 2014), for graphs whose DIAMETER makes
    min-label propagation impractical (long chains; min-label needs
    diameter rounds, this needs ~log rounds on any shape).

    One round:
    - large-star: per node u with full neighborhood Γ(u), m = min(Γ(u) ∪
      {u}); every STRICTLY LARGER neighbor re-attaches to m;
    - small-star: per node u over its smaller-neighbors N = {v ∈ Γ(u),
      v < u}, every v ∈ N ∪ {u} re-attaches to min(N).

    Both steps are one groupBy(min) + one equi-join — no per-component
    serialization, no driver-side graph; the edge set only shrinks toward
    star graphs (fixpoints of both steps), detected by an exact
    (count, decimal hash-sum, decimal u+v sum) checksum — two independent
    aggregates so a false fixpoint needs a simultaneous collision (one
    tiny scalar row per round, the same convergence recipe as min-label's
    label-sum). At the fixpoint
    every non-center node carries exactly one edge to its component
    minimum."""
    e = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    singles = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") == F.col("b")
    ).select(F.col("a").alias("v")).distinct()
    # canonical undirected storage: (u > v)
    edges = (
        e.select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    prev = None
    for _ in range(max_iter):
        # -- large-star over the full neighborhoods
        nbr = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = nbr.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
        ls = (
            nbr.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
        )
        e1 = (
            ls.filter(F.col("x") != F.col("y"))
            .select(F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v"))
            .distinct()
        )
        # -- small-star over the smaller-neighbor lists (storage is (u > v),
        # so per u the v-side IS the smaller neighborhood)
        sm = e1.groupBy("u").agg(F.min("v").alias("mn"))
        ss = (
            e1.join(sm, "u")
            .select(F.col("v").alias("x"), F.col("mn").alias("y"))
            .union(sm.select(F.col("u").alias("x"), F.col("mn").alias("y")))
        )
        edges2 = (
            ss.filter(F.col("x") != F.col("y"))
            .select(F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        # Convergence checksum: (count, exact xxhash64 sum, exact u+v sum).
        # The third component is independent of the hash — a false fixpoint
        # now needs a simultaneous collision in two unrelated aggregates
        # over the same edge set (same scan, negligible extra cost).
        row = edges2.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
            F.sum((F.col("u") + F.col("v")).cast("decimal(38,0)")).alias("s"),
        ).collect()[0]
        cur = (row["n"], row["h"], row["s"])
        edges = edges2
        if prev is not None and cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components_star: no fixpoint after {max_iter} rounds"
        )
    centers = edges.select(F.col("v").alias("vtx")).distinct()
    labels = (
        edges.select(F.col("u").alias("v"), F.col("v").alias("c"))
        .unionByName(centers.select(F.col("vtx").alias("v"), F.col("vtx").alias("c")))
    )
    # self-loop-only vertices never enter the contraction — label themselves
    lone = singles.join(labels.select("v"), "v", "left_anti").select(
        "v", F.col("v").alias("c")
    )
    return labels.unionByName(lone)


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
