"""Edit-distance similarity self-join with q-gram count filtering
(Gravano et al., VLDB 2001 — the classic SQL-native approximate string
join): all pairs of strings within Levenshtein distance k, without the
O(n²) cross join. The entity-resolution / fuzzy-matching primitive next
to the token-set joins here (Jaccard+prefix, containment): those match
WORD overlap, this matches CHARACTER-level typo distance.

Exactness argument (no false negatives, so the brute-force oracle is an
equality check, not a recall bound):
- one edit operation destroys at most q of a string's positional
  q-grams, and a string of length L has L − q + 1 of them, so
  ed(s, t) ≤ k ⟹ multiset-common q-grams ≥ max(|s|,|t|) − q + 1 − k·q
  (the count-filter theorem). Candidates = gram-join pairs meeting the
  bound; survivors are VERIFIED with the built-in levenshtein.
- multiset semantics come from occurrence-indexed grams ((gram, 1),
  (gram, 2), …): the equi-join on (gram, occ) yields exactly
  Σ_g min(count_s(g), count_t(g)) matches.
- strings short enough that the bound can be ≤ 0 (len ≤ k·q + q − 1)
  can be within distance k while sharing ZERO grams, so they take a
  SHORT ROUTE: a broadcast band join against every string within the
  length window (length difference > k is impossible at ed ≤ k). Both
  routes emit (a < b, dist); union + distinct merges them.

Spark-first / 100 TB shape: the join runs on DISTINCT strings
(vocab-collapse — fuzzy entity resolution matches the vocabulary, not
the corpus; callers broadcast results back); the gram join shuffles
(gram, occ) keys with map-side combine on the pair count; the verify is
a scan-stage JVM levenshtein on candidates only. q is the selectivity
knob — raise it for longer strings so frequent grams don't fan out. The
short-route band is broadcast (tiny for realistic length distributions;
it is ONLY strings of length ≤ k·q + q − 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_self_join(
    df: DataFrame,
    str_col: str,
    k: int = 1,
    q: int = 2,
) -> DataFrame:
    """(name_a, name_b, dist): every unordered pair of DISTINCT values
    of ``str_col`` with levenshtein ≤ ``k`` (name_a < name_b). Exact —
    the q-gram count filter plus the short-string band route admit no
    false negatives; every candidate is levenshtein-verified."""
    short_max = k * q + q - 1
    s = (
        df.select(F.col(str_col).alias("s"))
        .filter(F.col("s").isNotNull())
        .distinct()
        .select("s", F.length("s").alias("ln"))
        .persist()
    )
    try:
        # ---- long route: occurrence-indexed q-grams ----
        grams = s.filter(F.col("ln") >= q).select(
            "s",
            "ln",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("ln") - q + 1),
                    lambda i: F.col("s").substr(i, F.lit(q)),
                )
            ).alias("g"),
        )
        # occurrence index within (s, g): multiset semantics
        occ = grams.groupBy("s", "ln", "g").agg(
            F.count(F.lit(1)).alias("c")
        ).select(
            "s", "ln", "g", F.explode(F.sequence(F.lit(1), F.col("c"))).alias("occ")
        )
        a = occ.select(
            F.col("s").alias("a"), F.col("ln").alias("la"),
            "g", "occ",
        )
        b = occ.select(
            F.col("s").alias("b"), F.col("ln").alias("lb"),
            "g", "occ",
        )
        cand = (
            a.join(b, ["g", "occ"])
            .filter(
                (F.col("a") < F.col("b"))
                & (F.abs(F.col("la") - F.col("lb")) <= k)
            )
            .groupBy("a", "b", "la", "lb")
            .agg(F.count(F.lit(1)).alias("common"))
            .filter(
                F.col("common")
                >= F.greatest(F.col("la"), F.col("lb")) - q + 1 - k * q
            )
        )
        long_pairs = cand.select(
            "a", "b", F.levenshtein("a", "b").alias("dist")
        ).filter(F.col("dist") <= k)

        # ---- short route: the bound is <= 0 only when max(|s|,|t|) <=
        # short_max, i.e. BOTH strings are short (this also covers
        # len < q strings, which emit no grams at all: any ed<=k partner
        # of one has max length < q + k <= short_max + 1) ----
        shorts = s.filter(F.col("ln") <= short_max).select(
            F.col("s").alias("a"), F.col("ln").alias("la")
        )
        near = s.filter(F.col("ln") <= short_max).select(
            F.col("s").alias("b"), F.col("ln").alias("lb")
        )
        short_pairs = (
            shorts.crossJoin(F.broadcast(near))
            .filter(
                (F.col("a") < F.col("b"))
                & (F.abs(F.col("la") - F.col("lb")) <= k)
            )
            .select("a", "b", F.levenshtein("a", "b").alias("dist"))
            .filter(F.col("dist") <= k)
        )
        return (
            long_pairs.unionByName(short_pairs)
            .distinct()
            .select(
                F.col("a").alias("name_a"),
                F.col("b").alias("name_b"),
                F.col("dist").cast("int").alias("dist"),
            )
        )
    finally:
        s.unpersist()
