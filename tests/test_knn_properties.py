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
