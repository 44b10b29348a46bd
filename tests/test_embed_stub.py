"""Pin the batched embed-stub UDF to the per-row reference, bit for bit.

r11 optimization: ``make_embed_text_udf``'s closure was rewritten from a
per-row ``RandomState(seed).standard_normal(dim)`` + ``[float(x) ...]``
list build to a batch-buffered form (one reused RandomState re-seeded per
row, ndarray rows). The driver-side ``hash_embed`` keeps the ORIGINAL
per-row implementation, so equality here proves the rewrite changed
nothing observable — including the Arrow float64→float32 cast.
"""
import hashlib

import numpy as np
import pytest

from chatdata_spark.functions.vector import hash_embed, make_embed_text_udf


def _reference_rows(texts, dim):
    # the pre-r11 closure, verbatim
    rows = []
    for t in texts:
        seed = int.from_bytes(
            hashlib.sha256((t if t is not None else "").encode("utf-8")).digest()[:4], "big"
        )
        v = np.random.RandomState(seed).standard_normal(dim)
        v = v / np.linalg.norm(v)
        rows.append([float(x) for x in v])
    return rows


@pytest.mark.parametrize("dim", [64, 7])  # even (gauss cache empty) AND odd (cache reset by seed())
def test_batched_stub_bit_identical_to_per_row(dim):
    texts = [f"doc {i} — lorem ipsum {i % 13}" for i in range(500)] + ["", None, "dup", "dup"]
    ref = np.array(
        _reference_rows(texts, dim), dtype=np.float64
    ).astype(np.float32)

    # replicate the batched closure body without Spark
    rs = np.random.RandomState(0)
    out = np.empty((len(texts), dim))
    for i, t in enumerate(texts):
        seed = int.from_bytes(
            hashlib.sha256((t if t is not None else "").encode("utf-8")).digest()[:4], "big"
        )
        rs.seed(seed)
        v = rs.standard_normal(dim)
        out[i] = v / np.linalg.norm(v)
    assert np.array_equal(ref, out.astype(np.float32))


def test_udf_matches_driver_hash_embed(spark):
    texts = [f"t{i}" for i in range(200)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    emb = make_embed_text_udf(64)
    got = {r["text"]: np.array(r["v"], dtype=np.float32) for r in
           df.select("text", emb("text").alias("v")).collect()}
    for t in texts:
        want = np.array(hash_embed(t, 64), dtype=np.float64).astype(np.float32)
        assert np.array_equal(got[t], want), t
