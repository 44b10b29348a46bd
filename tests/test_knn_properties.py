"""Property-based kNN invariants (SURVEY §5.3): prefix-monotonicity in k,
sortedness, and stability under repartition."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chatdata_spark.functions.vector import hash_embed
from chatdata_spark.operators.knn import knn
from tests.conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.text(alphabet="abcdef", min_size=1, max_size=6), k=st.integers(2, 20))
def test_topk_prefix_monotone_and_sorted(spark, seed, k):
    q = hash_embed(seed, 64)
    small = [(r.vec_id, r.dist) for r in knn(_emb(spark), "embedding", q, k=k, select=["vec_id"], id_col="vec_id").collect()]
    big = [(r.vec_id, r.dist) for r in knn(_emb(spark), "embedding", q, k=k + 5, select=["vec_id"], id_col="vec_id").collect()]
    assert big[:k] == small  # result(k) is a prefix of result(k+5)
    dists = [d for _, d in big]
    assert dists == sorted(dists)


def test_topk_stable_under_repartition(spark):
    q = hash_embed("stability", 64)
    base = _emb(spark)
    a = [(r.vec_id, r.dist) for r in knn(base, "embedding", q, k=15, select=["vec_id"], id_col="vec_id").collect()]
    b = [
        (r.vec_id, r.dist)
        for r in knn(base.repartition(17), "embedding", q, k=15, select=["vec_id"], id_col="vec_id").collect()
    ]
    assert a == b


def test_knn_batch_equals_per_query_knn(spark):
    """Each query's slice of the batched answer must equal its
    single-query knn() answer exactly (same distance convention and
    tie-break) — the amortized scan changes cost, never results."""
    from chatdata_spark.functions.vector import hash_embed
    from chatdata_spark.operators.knn import knn, knn_batch

    from tests.conftest import SF_ORACLE

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qs = [hash_embed(f"bq-prop{i}", 64) for i in range(3)]
    batched = knn_batch(emb, "embedding", qs, k=6, select=["vec_id"], id_col="vec_id")
    got = {}
    for r in batched.collect():
        got.setdefault(r.query_id, []).append((r.vec_id, r.dist))
    for i, q in enumerate(qs):
        single = [
            (r.vec_id, r.dist)
            for r in knn(emb, "embedding", q, k=6, select=["vec_id"], id_col="vec_id").collect()
        ]
        assert got[i] == single, f"query {i} diverged"


def test_knn_batch_large_q_guard():
    """Q guard (r9 verdict item 4): query vectors are inlined as plan
    literals, so plan size grows O(Q·d) — above MAX_BATCH_QUERIES the
    call must refuse with a pointer at the knn_join GEMM path instead of
    building a pathological driver-side plan."""
    import pytest

    from chatdata_spark.operators.knn import MAX_BATCH_QUERIES, knn_batch

    too_many = [[0.0] * 4] * (MAX_BATCH_QUERIES + 1)
    with pytest.raises(ValueError, match="knn_join"):
        knn_batch(None, "embedding", too_many, k=3)


def test_knn_batch_output_contract_without_id(spark):
    """ADVICE r9: with `select` given and the id column NOT in it, the
    output must be exactly (query_id, select..., dist) — the tie-break
    id stays internal. Values must still match the id-selected run."""
    from chatdata_spark.functions.vector import hash_embed
    from chatdata_spark.operators.knn import knn_batch

    from tests.conftest import SF_ORACLE

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qs = [hash_embed(f"bq-contract{i}", 64) for i in range(2)]
    noid = knn_batch(emb, "embedding", qs, k=5, select=["label"], id_col="vec_id")
    assert noid.columns == ["query_id", "label", "dist"]
    withid = knn_batch(
        emb, "embedding", qs, k=5, select=["label", "vec_id"], id_col="vec_id"
    )
    assert [(r.query_id, r.label, r.dist) for r in noid.collect()] == [
        (r.query_id, r.label, r.dist) for r in withid.collect()
    ]
