"""IVF-PQ composed index: layout, routing, recall, idempotency."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from chatdata_spark.operators.ivfpq import IVFPQIndex, build_or_load_ivfpq
from chatdata_spark.operators.knn import knn
from chatdata_spark.queries.vector import _ivf_index, IVFPQ_RANK_MARGIN, Q2
from tests.conftest import SF_ORACLE


def _index(spark, tmp_path=None):
    from chatdata_spark.catalog import shared_cache_path

    ivf = _ivf_index(spark, SF_ORACLE)
    path = (
        str(tmp_path / "ivfpq") if tmp_path is not None
        else shared_cache_path("ivfpq", SF_ORACLE, "k8m8")
    )
    return ivf, build_or_load_ivfpq(ivf, path, m=8)


def test_codes_partitioned_by_ivf_cluster(spark):
    """The code table must be laid out under the SAME cluster_id dirs as
    the IVF data — that directory equality is what lets centroid routing
    prune code partitions without any join."""
    ivf, idx = _index(spark)
    code_dirs = {
        d for d in os.listdir(os.path.join(idx.path, "codes")) if d.startswith("cluster_id=")
    }
    assert code_dirs == {f"cluster_id={c}" for c in ivf.cluster_ids}
    # every row coded, none duplicated
    n_codes = spark.read.parquet(os.path.join(idx.path, "codes")).count()
    n_rows = spark.read.parquet(ivf._data_path()).count()
    assert n_codes == n_rows


def test_search_reads_only_probed_partitions(spark):
    """The probed-cluster filter must reach the parquet source as a
    partition filter (directory pruning), not a post-scan filter."""
    ivf, idx = _index(spark)
    probes = ivf.rank_centroids(Q2)[:4]
    codes = spark.read.parquet(os.path.join(idx.path, "codes")).filter(
        F.col("cluster_id").isin(probes)
    )
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cluster_id#" in plan.replace("\n", " ") or "PartitionFilters: [" in plan
    assert codes.select("cluster_id").distinct().count() == len(set(probes))


def test_routed_adc_recall_and_true_nn(spark):
    """n_probe=4 of 8 + ADC screen + exact rerank: every result inside the
    exact top-IVFPQ_RANK_MARGIN, true NN found (the registered query's
    soundness invariants, asserted here against ids not just counts)."""
    ivf, idx = _index(spark)
    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    res = idx.search(Q2, k=15, n_probe=4, refine=4, select=["vec_id"]).collect()
    assert len(res) == 15
    exact = [r.vec_id for r in knn(
        e, "embedding", Q2, k=IVFPQ_RANK_MARGIN, select=["vec_id"], id_col="vec_id"
    ).collect()]
    assert {r.vec_id for r in res} <= set(exact)
    assert res[0].vec_id == exact[0]  # true NN survives the funnel
    # distances exact and sorted (rerank sort key IS the exact distance)
    ds = [r.dist for r in res]
    assert ds == sorted(ds)


def test_full_probe_with_deep_refine_equals_exact(spark):
    """With every cluster probed and a refine deep enough to cover the ADC
    screen's mis-ranking, the funnel must reproduce the exact top-k — the
    oracle-checkable configuration (ann_ivf_full_probe's analogue)."""
    ivf, idx = _index(spark)
    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    got = [
        r.vec_id
        for r in idx.search(
            Q2, k=10, n_probe=ivf.n_clusters, refine=50, select=["vec_id"]
        ).collect()
    ]
    want = [r.vec_id for r in knn(e, "embedding", Q2, k=10, select=["vec_id"], id_col="vec_id").collect()]
    assert got == want


def test_build_or_load_idempotent(spark, tmp_path):
    ivf, idx = _index(spark, tmp_path)
    again = build_or_load_ivfpq(ivf, str(tmp_path / "ivfpq"), m=8)
    assert isinstance(again, IVFPQIndex)
    assert (again.codebooks == idx.codebooks).all()


def test_opq_ivfpq_rotation_roundtrip_and_full_probe_exact(spark, tmp_path):
    """OPQ-composed IVF-PQ: the rotation persists through the meta, the
    routing stays in the ORIGINAL space (centroids unrotated), and the
    full-probe + deep-refine configuration still reproduces the exact
    top-k (the rotation is search-transparent)."""
    import numpy as np

    ivf = _ivf_index(spark, SF_ORACLE)
    built = build_or_load_ivfpq(ivf, str(tmp_path / "opq"), m=8, opq_iters=3)
    assert built.rotation is not None
    loaded = IVFPQIndex(spark, str(tmp_path / "opq"))
    assert np.array_equal(built.rotation, loaded.rotation)
    assert np.allclose(
        loaded.rotation @ loaded.rotation.T, np.eye(64), atol=1e-10
    )
    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    got = [
        r.vec_id
        for r in loaded.search(
            Q2, k=10, n_probe=ivf.n_clusters, refine=50, select=["vec_id"]
        ).collect()
    ]
    want = [
        r.vec_id
        for r in knn(e, "embedding", Q2, k=10, select=["vec_id"], id_col="vec_id").collect()
    ]
    assert got == want


def _recon_err(x, cid, lut, books):
    import numpy as np

    from chatdata_spark.operators.pq import _encode_np

    target = x if lut is None else x - lut[cid]
    codes = _encode_np(target, books)
    recon = np.concatenate([books[j][codes[:, j]] for j in range(8)], axis=1)
    return float(((target - recon) ** 2).sum(axis=1).mean())


def test_residual_ivfpq_quantization_error_below_plain(spark, tmp_path):
    """Residual codes must reconstruct the corpus more finely than
    raw-vector codes at the same 256-entry budget — the point of
    quantizing the within-cluster displacement (FAISS IVFPQ default).
    The fixture's hash embeddings are near-uniform on the sphere, so the
    gain there is small (0.100 vs 0.107) — asserted directionally; the
    clustered-corpus test below pins the ~10x mechanism."""
    import numpy as np

    from chatdata_spark.operators.ivfpq import _centroid_lookup

    ivf = _ivf_index(spark, SF_ORACLE)
    plain = build_or_load_ivfpq(ivf, str(tmp_path / "plain"), m=8)
    resid = build_or_load_ivfpq(ivf, str(tmp_path / "resid"), m=8, residual=True)
    assert resid.residual and not plain.residual

    data = spark.read.parquet(ivf._data_path()).select("embedding", "cluster_id").collect()
    x = np.array([r[0] for r in data], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cid = np.array([r[1] for r in data], dtype=np.int64)
    lut = _centroid_lookup(ivf)
    e_plain = _recon_err(x, None, None, plain.codebooks)
    e_resid = _recon_err(x, cid, lut, resid.codebooks)
    assert e_resid < e_plain, (e_resid, e_plain)


def test_residual_ivfpq_strong_gain_on_clustered_corpus(spark, tmp_path):
    """On a corpus with REAL cluster structure (64 tight clusters, noise
    sigma 0.05) the residual codebooks must beat plain decisively: plain
    must spread 256 entries per subspace over 64 blobs while residual
    covers one zero-centered blob (probed ratio 0.34 with ideal routing;
    asserted at 0.5 to absorb KMeans routing imperfection)."""
    import numpy as np

    from chatdata_spark.operators.ivf import IVFIndex
    from chatdata_spark.operators.ivfpq import IVFPQIndex, _centroid_lookup

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((64, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[np.arange(1600) % 64] + 0.05 * rng.standard_normal((1600, 64))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(pts)],
        "vec_id: long, embedding: array<float>",
    )
    ivf = IVFIndex.build(df, str(tmp_path / "civf"), "vec_id", "embedding", n_clusters=64)
    plain = IVFPQIndex.build(ivf, str(tmp_path / "cp"), m=8)
    resid = IVFPQIndex.build(ivf, str(tmp_path / "cr"), m=8, residual=True)
    data = spark.read.parquet(ivf._data_path()).select("embedding", "cluster_id").collect()
    x = np.array([r[0] for r in data], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cid = np.array([r[1] for r in data], dtype=np.int64)
    lut = _centroid_lookup(ivf)
    e_plain = _recon_err(x, None, None, plain.codebooks)
    e_resid = _recon_err(x, cid, lut, resid.codebooks)
    assert e_resid < e_plain * 0.5, (e_resid, e_plain)


def test_residual_ivfpq_full_probe_deep_refine_equals_exact(spark, tmp_path):
    """Residual (and residual+OPQ) funnels must reproduce the exact
    top-k at full probe + deep refine — the rerank is in original space,
    so only the screen changed."""
    ivf = _ivf_index(spark, SF_ORACLE)
    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    want = [
        r.vec_id
        for r in knn(e, "embedding", Q2, k=10, select=["vec_id"], id_col="vec_id").collect()
    ]
    for name, kw in (("r", dict(residual=True)),
                     ("ro", dict(residual=True, opq_iters=3))):
        idx = build_or_load_ivfpq(ivf, str(tmp_path / name), m=8, **kw)
        got = [
            r.vec_id
            for r in idx.search(
                Q2, k=10, n_probe=ivf.n_clusters, refine=50, select=["vec_id"]
            ).collect()
        ]
        assert got == want, name
