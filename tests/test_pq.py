"""PQ/ADC compressed ANN: recall against the brute-force scan, the
compression contract (codes are m smallints), determinism of the build,
and the codes-only scan property."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chatdata_spark.operators.pq import build_or_load_pq
from tests.conftest import SF_ORACLE

from chatdata_spark.functions.vector import hash_embed

DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")


@pytest.fixture(scope="module")
def idx(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pq") / "idx")
    return build_or_load_pq(spark, emb, path, "vec_id", "embedding", m=8)


def _brute_topk(emb, q, k):
    rows = emb.select("vec_id", "embedding").collect()
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    d = np.round(1.0 - (m @ np.asarray(q)) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q)), 6)
    return [int(ids[i]) for i in np.lexsort((ids, d))[:k]]


def test_pq_recall_at_10(spark, emb, idx):
    hits = total = 0
    for seed in ("q1", "q2", "qx", "qy"):
        q = hash_embed(seed, DIM)
        truth = set(_brute_topk(emb, q, 10))
        got = {r["vec_id"] for r in idx.search(emb, q, k=10, refine=4).collect()}
        hits += len(truth & got)
        total += 10
    assert hits / total >= 0.8, f"recall@10 {hits/total:.2f}"


def test_pq_codes_are_m_smallints(spark, idx):
    codes = spark.read.parquet(f"{idx.path}/codes")
    assert dict(codes.dtypes)["codes"] == "array<smallint>"
    sizes = codes.select(F.size("codes").alias("s")).distinct().collect()
    assert [r["s"] for r in sizes] == [8]  # 8 bytes of payload vs 256 raw


def test_pq_build_is_deterministic(spark, emb, tmp_path):
    from chatdata_spark.operators.pq import PQIndex

    a = PQIndex.build(emb, str(tmp_path / "a"), "vec_id", "embedding", m=8)
    b = PQIndex.build(emb, str(tmp_path / "b"), "vec_id", "embedding", m=8)
    assert np.array_equal(a.codebooks, b.codebooks)


def test_pq_scan_reads_codes_only(spark, emb, idx):
    df = idx.search(emb, hash_embed("q1", DIM), k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the ADC candidate scan must project only (id, codes) — the raw
    # vector column appears solely in the rerank branch's scan
    for line in plan.splitlines():
        if "codes" in line and "ReadSchema" in line:
            assert "embedding" not in line


# --- OPQ rotation (Ge et al. CVPR'13) ----------------------------------------

def test_opq_rotation_orthonormal_and_deterministic():
    """The learned R must be orthonormal (search-transparency depends on
    norm/inner-product preservation) and bit-identical across trains
    (the replay-derived oracle depends on it)."""
    import pyarrow.parquet as pa_pq

    from chatdata_spark.operators.pq import opq_train

    t = pa_pq.read_table(f"{SF_ORACLE}/embeddings.parquet", columns=["embedding"])
    x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)[:1024]
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    r1, b1 = opq_train(x, 8, iters=6, seed=42, opq_iters=3)
    r2, b2 = opq_train(x, 8, iters=6, seed=42, opq_iters=3)
    assert np.allclose(r1 @ r1.T, np.eye(r1.shape[0]), atol=1e-10)
    assert np.array_equal(r1, r2) and np.array_equal(b1, b2)


def test_opq_reduces_quantization_error():
    """The rotation's whole point: on the real (correlated) embeddings
    the rotated per-subspace quantization error must land strictly below
    plain PQ's at the same code budget (observed ~24% lower)."""
    import pyarrow.parquet as pa_pq

    from chatdata_spark.operators.pq import _encode_np, _train_books, opq_train

    t = pa_pq.read_table(f"{SF_ORACLE}/embeddings.parquet", columns=["embedding"])
    x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)[:2048]
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    m = 8

    def err(y, books):
        codes = _encode_np(y, books)
        recon = np.concatenate([books[j][codes[:, j]] for j in range(m)], axis=1)
        return float(((y - recon) ** 2).sum(axis=1).mean())

    plain = err(x, _train_books(x, m, 12, 42))
    rot, books = opq_train(x, m, iters=12, seed=42, opq_iters=6)
    rotated = err(x @ rot, books)
    assert rotated < plain * 0.95, (rotated, plain)


def test_opq_index_roundtrip_and_search(spark, emb, tmp_path):
    """An OPQ-built index persists/reloads its rotation and the search
    funnel returns k exact-reranked rows containing the true NN (the
    rotation preserves cosine ranking; the rerank is in original space)."""
    from chatdata_spark.operators.pq import PQIndex

    path = str(tmp_path / "opq")
    built = PQIndex.build(emb, path, "vec_id", "embedding", m=8, opq_iters=3)
    loaded = PQIndex(spark, path)
    assert loaded.rotation is not None
    assert np.array_equal(built.rotation, loaded.rotation)
    q = hash_embed("q1", 64)
    got = loaded.search(emb, q, k=10, refine=4, select=["vec_id"]).collect()
    assert len(got) == 10
    assert [r.dist for r in got] == sorted(r.dist for r in got)
    # true NN by brute force
    import pyarrow.parquet as pa_pq

    t = pa_pq.read_table(f"{SF_ORACLE}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    qn = np.asarray(q, dtype=np.float64)
    qn /= np.linalg.norm(qn)
    true_nn = int(ids[np.lexsort((ids, 1.0 - x @ qn))[0]])
    assert got[0].vec_id == true_nn
