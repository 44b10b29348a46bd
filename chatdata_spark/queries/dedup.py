"""Driver queries for the dedup operator family (north-star extension).

DuckDB oracles recompute shingles/jaccard/cosine from scratch with plain
SQL; the MinHash-LSH entry is intentionally given the **exact** join's
oracle — at the default parameters its recall at the 0.4 threshold is
1 - O(1e-5), and the data is fixed, so verified-LSH output ≡ exact output
(asserted in tests/test_dedup.py too). SimHash has no oracle (DuckDB lacks
xxhash64) — rows-only check + unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from chatdata_spark.operators.dedup import (
    embedding_near_dup,
    exact_dedup,
    jaccard_similarity_join,
    minhash_lsh_pairs,
    simhash_pairs,
)
from chatdata_spark.registry import query

# DuckDB: distinct word-3-gram shingles of lower(text)
_DUCK_SHINGLES = """
SELECT doc_id,
       list_distinct([array_to_string(w[i:i+2], ' ')
                      for i in generate_series(1, greatest(len(w)-2, 1))]) AS sh
FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents)
"""

_DUCK_JACCARD_PAIRS = f"""
WITH sh AS ({_DUCK_SHINGLES})
SELECT a.doc_id AS i, b.doc_id AS j,
       ROUND(len(list_intersect(a.sh, b.sh)) * 1.0 /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
FROM sh a, sh b
WHERE a.doc_id < b.doc_id
  AND len(list_intersect(a.sh, b.sh)) * 1.0 /
      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.4
ORDER BY i, j
"""


@query(
    "dedup_exact",
    oracle="""
    WITH u AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50
    )
    SELECT doc_id FROM u
    QUALIFY row_number() OVER (PARTITION BY lower(text) ORDER BY doc_id) = 1
    ORDER BY doc_id
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup (hash-groupBy keep-first): re-ingested copies collapse to
    the original rows — the reference's entity_id=sha256(file+text) upsert
    semantics (tools.py:35-37) generalized to content keys."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") < 50).withColumn("doc_id", F.col("doc_id") + 100000)
    u = d.unionByName(dup).withColumn("norm_text", F.lower("text"))
    return exact_dedup(u, ["norm_text"], "doc_id", keep="min").select("doc_id").orderBy("doc_id")


@query("dedup_jaccard_exact", oracle=_DUCK_JACCARD_PAIRS)
def dedup_jaccard_exact(spark, sf_dir):
    """Exact n-gram-Jaccard near-dup pairs via inverted-index token join
    (shuffle on shingle, no all-pairs compare)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return jaccard_similarity_join(d, "doc_id", "text", k=3, threshold=0.4).orderBy("i", "j")


@query("dedup_minhash_lsh", oracle=_DUCK_JACCARD_PAIRS)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(126) + 42-band LSH candidates, exact-Jaccard verified — same
    result set as the exact join at recall ≈ 1 for this corpus (all its
    ≥0.4 pairs are ≥0.9; see operator docstring for the banding math)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(d, "doc_id", "text", k=3, threshold=0.4).orderBy("i", "j")


@query("dedup_simhash")  # no oracle: DuckDB lacks xxhash64 (rows-only check)
def dedup_simhash(spark, sf_dir):
    """SimHash-64 near-dup pairs (hamming ≤ 3) via 4×16-bit chunk pigeonhole.
    Verified against a planted near-dup pair and monotonicity in tests."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_pairs(d, "doc_id", "text", max_hamming=3).orderBy("i", "j")


@query(
    "dedup_embedding",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS i, b.vec_id AS j,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM e a, e b
    WHERE a.vec_id < b.vec_id AND ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.4
    ORDER BY i, j
    """,
)
def dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact); at scale runs per IVF
    cluster instead of globally."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dup(e, "vec_id", "embedding", threshold=0.4).orderBy("i", "j")
