"""Hyperplane-LSH ANN: recall at a real operating point, exactness of the
degenerate configuration, and soundness (returned distances are exact)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chatdata_spark.functions.vector import hash_embed
from chatdata_spark.operators.knn import knn
from chatdata_spark.operators.lsh import lsh_search, query_keys, with_lsh_keys
from tests.conftest import SF_ORACLE

DIM = 64
Q = hash_embed("lsh-test-q", DIM)


def _indexed(spark, n_tables, n_bits):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    return with_lsh_keys(emb, "embedding", DIM, n_tables=n_tables, n_bits=n_bits)


def test_lsh_zero_bits_equals_exact_scan(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    exact = [r["vec_id"] for r in knn(emb, "embedding", Q, k=15, select=["vec_id"]).collect()]
    got = [
        r["vec_id"]
        for r in lsh_search(
            _indexed(spark, 4, 0), "embedding", Q, k=15, n_tables=4, n_bits=0, select=["vec_id"]
        ).collect()
    ]
    assert got == exact


def test_lsh_recovers_planted_near_duplicates(spark):
    # The corpus embeddings are near-uniform on the sphere (true top-10
    # sits at ~70° — LSH's theoretical worst case; any hash scheme scans
    # ~40% for recall 0.7 there). The operator's actual job is finding
    # GENUINELY close vectors, so plant 6 noisy copies of the query at
    # ~15-25° and require the 8×10 operating point to recover ≥5 of them
    # while scanning a small candidate fraction.
    import numpy as np

    rng = np.random.RandomState(3)
    q = np.asarray(Q, dtype=np.float64)
    planted = [
        (1_000_000 + i, (q / np.linalg.norm(q) + rng.standard_normal(DIM) * 0.06).tolist(), -1)
        for i in range(6)
    ]
    emb = (
        spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label")
        .unionByName(spark.createDataFrame(planted, "vec_id long, embedding array<double>, label int"))
    )
    idx = with_lsh_keys(emb, "embedding", DIM, n_tables=8, n_bits=10)
    got = {
        r["vec_id"]
        for r in lsh_search(
            idx, "embedding", Q, k=10, n_tables=8, n_bits=10, select=["vec_id"]
        ).collect()
    }
    assert len(got & {p[0] for p in planted}) >= 5, f"planted recovery: {got}"
    # selectivity: the probe predicate must prune, not rescan the corpus
    from chatdata_spark.operators.lsh import query_keys

    qk = query_keys(Q, 8, 10)
    n_cand = idx.filter(
        F.arrays_overlap("lsh_keys", F.array(*[F.lit(x).cast("long") for x in qk]))
    ).count()
    assert n_cand < emb.count() * 0.05, f"candidates {n_cand} not selective"


def test_lsh_distances_are_exact_on_candidates(spark):
    # soundness: every returned (id, dist) must equal the exact scan's
    # distance for that id — LSH may miss neighbors, never mis-score them.
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    exact = {
        r["vec_id"]: r["dist"]
        for r in knn(emb, "embedding", Q, k=500, select=["vec_id"]).collect()
    }
    for r in lsh_search(
        _indexed(spark, 8, 10), "embedding", Q, k=10, n_tables=8, n_bits=10, select=["vec_id"]
    ).collect():
        assert exact[r["vec_id"]] == r["dist"]


def test_query_keys_deterministic_and_table_tagged(spark):
    k1 = query_keys(Q, n_tables=8, n_bits=10)
    k2 = query_keys(list(Q), n_tables=8, n_bits=10)
    assert k1 == k2 and len(k1) == 8
    assert [k >> 48 for k in k1] == list(range(8))
    # keys on the indexed side carry the same table tags
    row = _indexed(spark, 8, 10).select("lsh_keys").first()
    assert [k >> 48 for k in row["lsh_keys"]] == list(range(8))
