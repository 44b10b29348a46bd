"""Binary sign-quantization: packing correctness vs numpy, Hamming funnel
recall, and the all-integer plan shape."""

from __future__ import annotations

import numpy as np

from chatdata_spark.operators.binquant import _pack_query, binary_knn, binary_signature
from chatdata_spark.operators.knn import knn
from chatdata_spark.queries.vector import DIM, Q1
from tests.conftest import SF_ORACLE


def test_signature_packing_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").limit(50)
    rows = emb.select("vec_id", "embedding", binary_signature("embedding", DIM).alias("sig")).collect()
    for r in rows:
        v = np.asarray(r.embedding)
        want = _pack_query([float(x) for x in v])
        assert list(r.sig) == want, r.vec_id
        # round-trip: each packed bit is the sign test of its dimension
        for i, x in enumerate(v):
            w, b = divmod(i, 32)
            assert ((r.sig[w] >> b) & 1) == (1 if x > 0 else 0)


def test_hamming_rerank_funnel_recall(spark):
    """Sign quantization preserves cosine neighborhoods well enough that a
    200-candidate Hamming screen recovers >=80% of the exact top-12 (at
    64 dims; real 768-dim embeddings quantize far better)."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    exact = {r.vec_id for r in knn(emb, "embedding", Q1, k=12, select=["vec_id"], id_col="vec_id").collect()}
    got = {r.vec_id for r in binary_knn(emb, "embedding", Q1, DIM, k=12, id_col="vec_id", rerank=200).collect()}
    assert len(got & exact) / 12 >= 0.8
    # reranked distances are the exact cosine values
    rr = binary_knn(emb, "embedding", Q1, DIM, k=12, id_col="vec_id", rerank=200).collect()
    ex = {r.vec_id: r.dist for r in knn(emb, "embedding", Q1, k=500, select=["vec_id"], id_col="vec_id").collect()}
    for r in rr:
        assert ex[r.vec_id] == r.dist


def test_binary_ranking_is_integer_only_plan(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    plan = (
        binary_knn(emb, "embedding", Q1, DIM, k=12, id_col="vec_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # heap, not global sort
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_mmr_diversifies_against_near_duplicates(spark):
    """Plant two near-identical vectors at the top: plain kNN returns
    both; MMR (lambda=0.5) must keep the first and defer its twin in
    favor of something diverse. Also: lambda=1 degrades to plain
    relevance order."""
    import numpy as np

    from chatdata_spark.operators.mmr import mmr_greedy

    rng = np.random.RandomState(7)
    base = rng.standard_normal((20, 8))
    q = base[0] + 0.01 * rng.standard_normal(8)
    twin = base[0] + 1e-6 * rng.standard_normal(8)
    vecs = np.vstack([base, twin])
    ids = list(range(21))
    sel = [i for i, _ in mmr_greedy(ids, vecs, q, k=5, lam=0.5)]
    assert (0 in sel) != (20 in sel) or not (sel[:2] == [0, 20] or sel[:2] == [20, 0]), (
        f"twins ranked adjacently: {sel}"
    )
    rel_order = [i for i, _ in mmr_greedy(ids, vecs, q, k=5, lam=1.0)]
    v = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = v @ (q / np.linalg.norm(q))
    want = sorted(ids, key=lambda i: (-sims[i], i))[:5]
    assert rel_order == want
