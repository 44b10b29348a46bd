"""Margin-based bitext mining (operators/bitext.py) — structural
properties beyond the registered query's full SQL-replay oracle."""

from __future__ import annotations

import pyspark.sql.functions as F

from chatdata_spark.operators.bitext import margin_mine
from tests.conftest import SF_ORACLE


def _sides(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    return emb.filter(F.col("label") == 0), emb.filter(F.col("label") == 1)


def test_mutual_argmax_is_a_partial_matching(spark, tmp_path):
    """Intersection strategy ⇒ the output is a partial matching: every
    a_id and every b_id appears at most once, and every margin clears
    the threshold."""
    a, b = _sides(spark)
    out = margin_mine(a, b, "vec_id", "embedding", k=4, threshold=1.0,
                      index_root=str(tmp_path / "idx")).collect()
    assert len(out) > 0
    a_ids = [r.a_id for r in out]
    b_ids = [r.b_id for r in out]
    assert len(a_ids) == len(set(a_ids))
    assert len(b_ids) == len(set(b_ids))
    assert all(r.margin >= 1.0 for r in out)


def test_threshold_monotonic_and_index_reuse(spark, tmp_path):
    """A higher threshold returns a subset; re-calling with the same
    index_root reuses the side indexes (the shared-cache pattern) and
    returns identical pairs."""
    a, b = _sides(spark)
    root = str(tmp_path / "idx2")
    lo = {(r.a_id, r.b_id) for r in margin_mine(
        a, b, "vec_id", "embedding", k=4, threshold=1.0, index_root=root).collect()}
    hi = {(r.a_id, r.b_id) for r in margin_mine(
        a, b, "vec_id", "embedding", k=4, threshold=1.05, index_root=root).collect()}
    assert hi <= lo
    again = {(r.a_id, r.b_id) for r in margin_mine(
        a, b, "vec_id", "embedding", k=4, threshold=1.0, index_root=root).collect()}
    assert again == lo


def test_hub_vector_is_demoted(spark):
    """The margin's whole point: a synthetic HUB vector (near everything
    on side B) must not win pairs that plain cosine would hand it — its
    high neighborhood average cancels its high raw sims. Construct A with
    one hub-ish duplicate of a B centroid; its margin stays ~1 while a
    genuinely isolated near-duplicate pair scores above it."""
    import numpy as np

    rng = np.random.default_rng(7)
    d = 8

    def unit(v):
        v = np.asarray(v, dtype=np.float64)
        return (v / np.linalg.norm(v)).tolist()

    base = [unit(rng.normal(size=d)) for _ in range(6)]
    centroid = unit(np.mean(base, axis=0))
    iso = unit(rng.normal(size=d))
    # A: the hub (B's centroid) + an isolated vector's near-twin
    a_rows = [(1, [float(x) for x in centroid]), (2, [float(x) for x in unit(np.asarray(iso) + 0.01 * rng.normal(size=d))])]
    b_rows = [(10 + i, [float(x) for x in v]) for i, v in enumerate(base)]
    b_rows.append((99, [float(x) for x in iso]))
    a = spark.createDataFrame(a_rows, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(b_rows, "vec_id long, embedding array<double>")
    out = {r.a_id: (r.b_id, r.margin) for r in margin_mine(
        a, b, "vec_id", "embedding", k=3, threshold=0.0, n_clusters=2).collect()}
    assert out[2][0] == 99, "isolated near-dup pair must survive mutual argmax"
    assert out[2][1] > out.get(1, (None, 0.0))[1], (
        "the isolated pair must out-margin the hub"
    )


def test_stale_index_cache_rejected(spark, tmp_path):
    """A cached index built from a DIFFERENT corpus must raise, not
    silently mine wrong pairs (r10 ADVICE): the side fingerprint
    (row count + order-free id XOR hash) is validated before reuse."""
    import pytest

    a, b = _sides(spark)
    root = str(tmp_path / "idx3")
    margin_mine(a, b, "vec_id", "embedding", k=4, threshold=1.0,
                index_root=root).collect()
    # same corpora revalidate fine
    margin_mine(a, b, "vec_id", "embedding", k=4, threshold=1.0,
                index_root=root).collect()
    # a subsetted side A against the cached full-A index must be rejected
    a_sub = a.limit(5)
    with pytest.raises(ValueError, match="DIFFERENT corpus"):
        margin_mine(a_sub, b, "vec_id", "embedding", k=4, threshold=1.0,
                    index_root=root).collect()
