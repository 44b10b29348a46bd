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
