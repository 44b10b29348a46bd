"""Edit-distance (fuzzy) self-join without the O(n²) cross product — the
typo/variant-collapsing primitive of entity resolution and catalog dedup.

Candidate generation is the **deletion-neighborhood signature** scheme
(FastSS family): each string s emits {s} ∪ {s with one char deleted}.
Two strings with levenshtein(a, b) <= 1 ALWAYS share a signature
(substitution at i → both del_i's equal; insertion/deletion → one equals
a deletion of the other; equality → s itself), so an equi-join on the
signature is a complete candidate generator for d=1 and the final
``levenshtein <= 1`` check makes the result exact.

Scale shape: signatures are built JVM-side (one transform over a
character sequence, no UDF), the join is a plain equi-shuffle on short
signature strings whose bucket sizes are bounded by how many strings in
the corpus are one deletion apart (corpus-dependent, but never the n²
product; a `max candidate bucket` guard like jaccard's max_df can be
added for adversarial corpora). Verification cost is |candidates|
levenshtein calls, JVM built-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_signatures(col: str) -> Column:
    """{s} ∪ single-char deletions of s, as array<string> (JVM expr)."""
    return F.expr(
        f"array_union(array({col}), transform(sequence(1, length({col})),"
        f" i -> concat(substring({col}, 1, i-1), substring({col}, i+1, length({col})))))"
    )


def fuzzy_self_join(df: DataFrame, col: str, max_dist: int = 1) -> DataFrame:
    """All DISTINCT value pairs (left_{col} < right_{col}) within
    levenshtein distance ``max_dist`` (only 1 supported — the signature
    scheme is d=1; chain the output's connected components for broader
    clusters). Output: left_{col}, right_{col}, dist."""
    assert max_dist == 1, "deletion-neighborhood signatures cover d=1"
    vals = df.select(F.col(col)).distinct()
    sigs = vals.select(F.col(col), F.explode(deletion_signatures(col)).alias("__sig"))
    a = sigs.select(F.col(col).alias("__l"), "__sig")
    b = sigs.select(F.col(col).alias("__r"), "__sig")
    pairs = (
        a.join(b, "__sig")
        .filter(F.col("__l") < F.col("__r"))
        .select("__l", "__r")
        .distinct()
        .withColumn("dist", F.levenshtein("__l", "__r"))
        .filter(F.col("dist") <= max_dist)
    )
    return pairs.select(
        F.col("__l").alias(f"left_{col}"), F.col("__r").alias(f"right_{col}"), "dist"
    )


# ---------------------------------------------------------------------------
# General-k scheme (r11): q-gram count filtering (Gravano et al., VLDB
# 2001). The deletion-neighborhood signatures above are complete ONLY for
# d = 1; for arbitrary k the count-filter theorem applies instead:
# one edit destroys at most q positional q-grams and a length-L string
# has L - q + 1 of them, so ed(s, t) <= k implies multiset-common
# q-grams >= max(|s|,|t|) - q + 1 - k*q. Candidates = occurrence-indexed
# gram equi-join pairs meeting the bound ((gram, occ) keys give exactly
# sum_g min(count_s, count_t) matches); strings short enough that the
# bound can reach 0 (len <= k*q + q - 1 — these can be within k while
# sharing ZERO grams, and len < q strings emit no grams at all) take a
# broadcast band route. Both routes are levenshtein-verified, so the
# result is EXACT (the brute-force oracle is an equality check).
# q is the selectivity knob — raise it for longer strings.


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
