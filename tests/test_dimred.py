"""Random-projection (JL) reduction: numpy parity, determinism across
calls, and the distance-preservation property that justifies searching in
the reduced space."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from chatdata_spark.operators.dimred import (
    project_query_vector,
    projection_matrix,
    random_projection,
)
from tests.conftest import SF_ORACLE


def test_projection_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").limit(50)
    rows = emb.select("vec_id", "embedding").collect()
    out = {
        r["vec_id"]: r["proj"]
        for r in random_projection(emb, "embedding", 64, 16, seed=7).select("vec_id", "proj").collect()
    }
    mat = projection_matrix(64, 16, seed=7)
    for r in rows:
        expected = np.asarray(r["embedding"], dtype=np.float64) @ mat
        np.testing.assert_allclose(out[r["vec_id"]], expected, rtol=1e-12)


def test_projection_deterministic_and_memoized(spark):
    from chatdata_spark.operators.dimred import _proj_udf

    assert _proj_udf(64, 16, 7) is _proj_udf(64, 16, 7)  # plan-equality / cache reuse
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").limit(20)
    a = random_projection(emb, "embedding", 64, 16, seed=7).select("proj").collect()
    b = random_projection(emb, "embedding", 64, 16, seed=7).select("proj").collect()
    assert [r["proj"] for r in a] == [r["proj"] for r in b]


def test_jl_distance_preservation(spark):
    """Pairwise L2 distances survive the projection in expectation; with
    out_dim=32 the typical distortion is well under 50% — a loose bound
    that still catches a wrong scale factor or a broken matrix."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").limit(40)
    proj = random_projection(emb, "embedding", 64, 32, seed=11)
    rows = proj.select("embedding", "proj").collect()
    orig = np.array([r["embedding"] for r in rows])
    red = np.array([r["proj"] for r in rows])
    ratios = []
    for i in range(0, 40, 3):
        for j in range(i + 1, 40, 7):
            d0 = np.linalg.norm(orig[i] - orig[j])
            d1 = np.linalg.norm(red[i] - red[j])
            if d0 > 1e-9:
                ratios.append(d1 / d0)
    r = np.array(ratios)
    assert 0.5 < r.mean() < 1.5
    assert (np.abs(r - 1.0) < 0.8).mean() > 0.9


def test_query_vector_projection_matches(spark):
    from chatdata_spark.functions.vector import hash_embed

    q = hash_embed("q1", 64)
    q16 = project_query_vector(q, 64, 16, seed=7)
    assert np.allclose(q16, np.asarray(q) @ projection_matrix(64, 16, 7))
