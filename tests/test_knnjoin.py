"""Batch kNN join: exactness of the full-probe configuration under
salting (beyond the sf0.01 oracle row), pruned-probe recall at a real
operating point, and the no-cartesian plan property."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chatdata_spark.operators.knnjoin import knn_join
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def idx(spark):
    from chatdata_spark.queries.vector import _ivf_index

    return _ivf_index(spark, SF_ORACLE)


@pytest.fixture(scope="module")
def queries(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").filter(
        F.col("vec_id") % 7 == 0
    )


def _brute(spark, queries, k):
    qs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in queries.collect()}
    base = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").collect()
    bm = np.array([r["embedding"] for r in base], dtype=np.float64)
    bid = np.array([r["vec_id"] for r in base])
    bn = np.linalg.norm(bm, axis=1)
    out = {}
    for qid, qv in qs.items():
        d = np.round(1.0 - (bm @ qv) / (bn * np.linalg.norm(qv)), 6)
        order = np.lexsort((bid, d))[:k]
        out[qid] = {(int(bid[i])) for i in order}
    return out


def test_full_probe_equals_brute_force_across_salts(spark, idx, queries):
    truth = _brute(spark, queries, k=4)
    for n_salt in (1, 3):
        got = knn_join(
            queries, idx, "vec_id", "embedding", k=4, n_probe=idx.n_clusters, n_salt=n_salt
        ).collect()
        by_q: dict[int, set[int]] = {}
        for r in got:
            by_q.setdefault(r["q_id"], set()).add(r["b_id"])
        assert by_q == truth, f"n_salt={n_salt}"


def test_pruned_probe_recall(spark, idx, queries):
    truth = _brute(spark, queries, k=4)
    got = knn_join(queries, idx, "vec_id", "embedding", k=4, n_probe=2).collect()
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(r["q_id"], set()).add(r["b_id"])
    hits = sum(len(truth[q] & by_q.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.6, f"recall {hits/total:.2f}"


def test_plan_is_cogrouped_not_cartesian(spark, idx, queries):
    df = knn_join(queries, idx, "vec_id", "embedding", k=4, n_probe=2)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "FlatMapCoGroupsInPandas" in p


def test_knn_join_and_near_dup_follow_compacted_data_dir(spark, tmp_path):
    """Regression (r6 review): knn_join and embedding_near_dup_clustered
    hardcoded '{path}/data', bypassing the versioned data_dir pointer
    compact() maintains — post-compaction they crashed (dir swept) or,
    in the crash-orphan window, silently scanned a stale tree containing
    tombstoned rows. Both readers must follow _data_path()."""
    import pyspark.sql.functions as F

    from chatdata_spark.operators.dedup import embedding_near_dup_clustered
    from chatdata_spark.operators.ivf import IVFIndex
    from chatdata_spark.operators.knnjoin import knn_join

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    idx = IVFIndex.build(emb, str(tmp_path / "ivf"), "vec_id", "embedding", n_clusters=4)
    victims = emb.limit(7).select("vec_id")
    victim_ids = {r.vec_id for r in victims.collect()}
    idx.delete(victims)
    idx = idx.compact()
    assert idx.data_dir != "data"  # the compaction actually swapped

    q = emb.filter(F.col("vec_id") % 25 == 0)
    pairs = knn_join(q, idx, "vec_id", "embedding", k=3, n_probe=idx.n_clusters)
    rows = pairs.collect()
    assert rows
    assert not ({r.b_id for r in rows} & victim_ids)

    nd = embedding_near_dup_clustered(idx, threshold=0.4, n_probe=idx.n_clusters)
    nd_rows = nd.collect()
    assert not any(r.i in victim_ids or r.j in victim_ids for r in nd_rows)
