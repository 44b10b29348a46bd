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
