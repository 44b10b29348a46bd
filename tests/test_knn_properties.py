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
