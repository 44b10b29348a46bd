"""Distributed PCA: fit-vs-replay bitwise equality, partition invariance,
eigen-structure sanity vs numpy's float covariance, fixed-point projection
reproducibility. (Driver-scale oracle check runs in test_correctness.py
via pca_embedding_knn.)"""

from __future__ import annotations

import numpy as np
import pytest

from chatdata_spark.operators.pca import (
    pca_fit,
    pca_project,
    pca_project_rows,
    pca_replay_model,
)


def _vecs(n=120, d=12, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: variance concentrated in a few directions
    basis = rng.standard_normal((d, d))
    scales = np.linspace(2.0, 0.05, d)
    return (rng.standard_normal((n, d)) * scales) @ basis * 0.05


def _df(spark, x, parts=5):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(parts)


def test_fit_matches_replay_bitwise(spark):
    x = _vecs()
    m_dist = pca_fit(_df(spark, x), "embedding", r=4)
    m_rep = pca_replay_model(x, r=4)
    assert m_dist.n == m_rep.n == len(x)
    assert m_dist.mean.tobytes() == m_rep.mean.tobytes()
    assert m_dist.components.tobytes() == m_rep.components.tobytes()
    assert m_dist.eigvals.tobytes() == m_rep.eigvals.tobytes()


def test_fit_is_partition_invariant(spark):
    x = _vecs(seed=11)
    a = pca_fit(_df(spark, x, parts=2), "embedding", r=3)
    b = pca_fit(_df(spark, x, parts=9), "embedding", r=3)
    assert a.components.tobytes() == b.components.tobytes()
    assert a.mean.tobytes() == b.mean.tobytes()


def test_eigenstructure_matches_numpy_cov():
    x = _vecs(seed=3)
    m = pca_replay_model(x, r=4)
    w_np = np.sort(np.linalg.eigvalsh(np.cov(x.T, bias=True)))[::-1][:4]
    # quantization at 2^-20 perturbs the covariance at ~1e-6 scale
    assert np.allclose(m.eigvals, w_np, rtol=1e-3, atol=1e-6)
    assert np.all(np.diff(m.eigvals) <= 0)  # descending variance
    g = m.components.T @ m.components
    assert np.allclose(g, np.eye(4), atol=1e-9)  # orthonormal columns


def test_sign_convention_largest_coefficient_positive():
    m = pca_replay_model(_vecs(seed=5), r=4)
    for c in range(4):
        col = m.components[:, c]
        assert col[int(np.argmax(np.abs(col)))] > 0


def test_fixed_point_projection_bitwise_roundtrip(spark):
    x = _vecs(seed=9)
    df = _df(spark, x, parts=4)
    m = pca_fit(df, "embedding", r=3)
    got = {
        r.vec_id: np.array(r.pca)
        for r in pca_project(df, "embedding", m, fixed_point=True).collect()
    }
    want = pca_project_rows(x, m, fixed_point=True)
    for i in range(len(x)):
        assert got[i].tobytes() == want[i].tobytes()


def test_float_projection_close_to_fixed_point():
    x = _vecs(seed=13)
    m = pca_replay_model(x, r=3)
    yf = pca_project_rows(x, m, fixed_point=False)
    yq = pca_project_rows(x, m, fixed_point=True)
    # component quantization at 2^-20 over |x|<~1 and d=12
    assert np.abs(yf - yq).max() < 1e-4


def test_projection_centers_the_data():
    x = _vecs(seed=17)
    m = pca_replay_model(x, r=3)
    y = pca_project_rows(x, m, fixed_point=False)
    # the model mean is the QUANTIZED mean (floor at 2^-20), so residual
    # centering error is bounded by 2^-20 per coordinate, not float eps
    assert np.abs(y.mean(axis=0)).max() < 5e-6


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="empty input"):
        pca_fit(df, "embedding", r=2)
