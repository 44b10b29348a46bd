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
