"""Dedup-family unit tests beyond the oracle comparisons:
LSH recall vs the exact join, simhash sanity, operator edge cases."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from chatdata_spark.operators.dedup import (
    exact_dedup,
    jaccard_similarity_join,
    minhash_lsh_pairs,
    simhash_pairs,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def _docs(spark, sf=SF_ORACLE):
    return spark.read.parquet(f"{sf}/documents.parquet")


def test_lsh_recall_equals_exact(spark):
    """At default params the verified LSH pair set must equal the exact
    inverted-index join's — this is what licenses the shared oracle."""
    d = _docs(spark)
    exact = {(r.i, r.j) for r in jaccard_similarity_join(d, "doc_id", threshold=0.4).collect()}
    lsh = {(r.i, r.j) for r in minhash_lsh_pairs(d, "doc_id", threshold=0.4).collect()}
    assert exact, "expected planted near-dup pairs in test data"
    assert lsh == exact


def test_lsh_jaccard_values_match_exact(spark):
    d = _docs(spark)
    exact = {(r.i, r.j): r.jaccard for r in jaccard_similarity_join(d, "doc_id", threshold=0.4).collect()}
    lsh = {(r.i, r.j): r.jaccard for r in minhash_lsh_pairs(d, "doc_id", threshold=0.4).collect()}
    assert lsh == exact


def test_simhash_finds_exact_copies(spark):
    """Re-ingested copies (identical token sets) have hamming 0 and must all
    surface even at max_hamming=0. (True near-dups of ~20-token docs can
    legitimately land at hamming >3: one changed word flips every bit whose
    ±1 vote sum sat at the tie boundary — SimHash is a long-document tool.)"""
    d = _docs(spark, SF_SMOKE).select("doc_id", "text")
    copies = d.filter(F.col("doc_id") < 50).withColumn("doc_id", F.col("doc_id") + 100000)
    u = d.unionByName(copies)
    found = {(r.i, r.j) for r in simhash_pairs(u, "doc_id", max_hamming=0).collect()}
    expected = {(i, i + 100000) for i in range(50)}
    assert expected <= found


def test_simhash_monotonic_in_hamming(spark):
    d = _docs(spark, SF_SMOKE)
    p1 = {(r.i, r.j) for r in simhash_pairs(d, "doc_id", max_hamming=1).collect()}
    p3 = {(r.i, r.j) for r in simhash_pairs(d, "doc_id", max_hamming=3).collect()}
    assert p1 <= p3


def test_exact_dedup_keeps_latest_when_asked(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "id int, key string, v int"
    )
    kept_min = exact_dedup(df, ["key"], "id", keep="min").select("id").collect()
    kept_max = exact_dedup(df, ["key"], "id", keep="max").select("id").collect()
    assert {r.id for r in kept_min} == {1, 3}
    assert {r.id for r in kept_max} == {2, 3}


def test_jaccard_join_max_df_pruning_keeps_high_pairs(spark):
    """Doc-frequency pruning may drop low-sim pairs but must keep the
    planted high-sim ones (their rare shingles survive)."""
    d = _docs(spark)
    full = {(r.i, r.j) for r in jaccard_similarity_join(d, "doc_id", threshold=0.9).collect()}
    pruned = {
        (r.i, r.j)
        for r in jaccard_similarity_join(d, "doc_id", threshold=0.9, max_df=50).collect()
    }
    assert full <= pruned | full  # pruning never invents pairs
    assert full == pruned  # high-sim pairs share rare shingles → survive
